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
  device.

The reference has no counterpart (it is single-address-space,
/root/reference/triflow/core/compilers.py:76-86 pads one global array); the
design target is BASELINE-scale grids that exceed one chip's HBM.

No hooks in sharded mode yet: boundary conditions are the periodic/edge
closures (Dirichlet-style hooks need global-index-aware scatters — planned).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core import schemes as schemes_mod
from ..ops.banded import (
    BandedFactorization,
    _assemble_blocks,
    _extract_wrap,
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
    neighbors; global edges are edge-padded in non-periodic mode."""
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


class SpikeFactorization:
    """Distributed factorization: local PCR factor + spikes + the reduced
    interface inverse (replicated)."""

    def __init__(self, local_fact, Z, Rinv, h, P, ndev, axis_name):
        self.local_fact = local_fact
        self.Z = Z            # (2P, nvar, Nl) spikes [W | V]
        self.Rinv = Rinv      # (2P*ndev, 2P*ndev)
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
        yred = jax.lax.all_gather(mine, self.axis_name).reshape(-1)
        z = self.Rinv @ yred                                     # (2P*ndev,)
        idx = jax.lax.axis_index(self.axis_name)
        im1 = (idx - 1) % ndev
        ip1 = (idx + 1) % ndev
        xm1_bot = jax.lax.dynamic_slice(z, (im1 * 2 * P + P,), (P,))
        xp1_top = jax.lax.dynamic_slice(z, (ip1 * 2 * P,), (P,))
        corr = (
            jnp.einsum("cni,c->ni", self.Z[:P], xm1_bot)
            + jnp.einsum("cni,c->ni", self.Z[P:], xp1_top)
        )
        return y - corr

    __call__ = solve


def spike_factor(A_bands, axis_name: str, ndev: int) -> SpikeFactorization:
    """Factor the global banded matrix from its local shard bands.

    The entries of the local bands that reach outside the shard are exactly
    the same index pattern as periodic wrap entries, so the Woodbury
    extraction is reused to peel them into neighbor-coupling blocks T
    (rows: first h nodes -> left neighbor's last h columns) and B (last h
    -> right neighbor's first h)."""
    W, nvar, _, Nl = A_bands.shape[-4:]
    h = W // 2
    P = nvar * h
    bands_tri, T, B = _extract_wrap(A_bands, periodic=True)
    L, D, U, g, s, M, Np = _assemble_blocks(bands_tri)
    tri = _tri_factor(L, D, U)  # chunked/pallas for large local grids
    local_fact = BandedFactorization(tri, g, s, Nl, nvar, False, halo=h)
    if h == 0 or ndev == 1:
        return SpikeFactorization(local_fact, None, None, h, P, ndev, axis_name)

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

    n2P = 2 * P * ndev
    R = jnp.eye(n2P, dtype=A_bands.dtype)
    for i in range(ndev):
        Wt_i, Wb_i, Vt_i, Vb_i = (allq[i, q] for q in range(4))
        top = 2 * P * i
        bot = top + P
        im1_bot = 2 * P * ((i - 1) % ndev) + P
        ip1_top = 2 * P * ((i + 1) % ndev)
        R = R.at[top:top + P, im1_bot:im1_bot + P].add(Wt_i)
        R = R.at[top:top + P, ip1_top:ip1_top + P].add(Vt_i)
        R = R.at[bot:bot + P, im1_bot:im1_bot + P].add(Wb_i)
        R = R.at[bot:bot + P, ip1_top:ip1_top + P].add(Vb_i)
    Rinv = jnp.linalg.inv(R)
    return SpikeFactorization(local_fact, Z, Rinv, h, P, ndev, axis_name)


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
    periodic : bool — global boundary closure

    Usage
    -----
    >>> sm = SpatialModel(model, mesh, periodic=True)
    >>> step = sm.rodaspr_stepper(dt=0.05)   # jitted, sharded
    >>> u = sm.shard(u0); x = sm.shard(x_global)
    >>> t, u = step(0.0, u, helpers, pstack, x)
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
        arr = jnp.asarray(arr, dtype=self.backend.dtype)
        if arr.shape[-1] % self.ndev:
            raise ValueError(
                f"grid size {arr.shape[-1]} must divide the mesh axis "
                f"({self.ndev})"
            )
        return jax.device_put(arr, self.sharding(arr.ndim))

    # -- per-shard physics ---------------------------------------------------
    def _local_F(self, u, helpers, pstack, x):
        h, ndev, periodic = self.h, self.ndev, self.periodic
        u_ext = halo_extend(u, h, self.axis, ndev, periodic)
        helpers_ext = halo_extend(helpers, h, self.axis, ndev, periodic)
        dx = x[..., 1] - x[..., 0]
        return self.backend.F_ext_impl(u_ext, helpers_ext, pstack, x, dx)

    def _local_J(self, u, helpers, pstack, x):
        h, ndev, periodic = self.h, self.ndev, self.periodic
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

    # -- steppers -------------------------------------------------------------
    def _wrap(self, local_step):
        spec_state = PartitionSpec(None, self.axis)
        spec_x = PartitionSpec(self.axis)
        wrapped = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(PartitionSpec(), spec_state, spec_state, spec_state,
                      spec_x, PartitionSpec()),
            out_specs=(PartitionSpec(), spec_state),
        )
        return jax.jit(wrapped)

    def theta_stepper(self, theta=1.0):
        """Sharded linearized theta step (reference Theta semantics,
        schemes.py:502-559, with the SuperLU solve replaced by SPIKE)."""
        periodic = self.periodic
        ndev, axis, h = self.ndev, self.axis, self.h

        def local_step(t, u, helpers, pstack, x, dt):
            J, u_ext, helpers_ext = self._local_J(u, helpers, pstack, x)
            F = self.backend.F_ext_impl(
                u_ext, helpers_ext, pstack, x, x[..., 1] - x[..., 0]
            )
            B = dt * (F - theta * banded_matvec_ext(J, u_ext)) + u
            A = axpy_bands(1.0, -theta * dt, J)
            fact = spike_factor(A, axis, ndev)
            return t + dt, fact.solve(B)

        return self._wrap(local_step)

    def row_stepper(self, scheme_cls=None, **scheme_kwargs):
        """Sharded fixed-dt Rosenbrock-Wanner step: one SPIKE factorization
        reused for all stages; halo exchange per stage."""
        scheme_cls = scheme_cls or schemes_mod.RODASPR
        scheme = scheme_cls(self.model, time_stepping=False, tol=None,
                            **scheme_kwargs)
        a_t, c_t, m_t, _m_pred_t, g00 = scheme._tables
        s = scheme._s
        ndev, axis, h = self.ndev, self.axis, self.h
        periodic = self.periodic

        def local_step(t, u, helpers, pstack, x, dt):
            # Hairer-Wanner transformed stages (core/schemes.py): no banded
            # matvec and no extra halo exchange for the gamma-sum — one
            # ppermute ring per stage (for u_i) instead of two.
            J, u_ext, helpers_ext = self._local_J(u, helpers, pstack, x)
            A = axpy_bands(1.0, -g00 * dt, J)
            fact = spike_factor(A, axis, ndev)
            dx = x[..., 1] - x[..., 0]
            gdt = g00 * dt
            us = []
            for i in range(s):
                u_i = u
                for j in range(i):
                    if a_t[i, j]:
                        u_i = u_i + a_t[i, j] * us[j]
                u_i_ext = halo_extend(u_i, h, axis, ndev, periodic)
                F_i = self.backend.F_ext_impl(
                    u_i_ext, helpers_ext, pstack, x, dx
                )
                rhs = gdt * F_i
                for j in range(i):
                    if c_t[i, j]:
                        rhs = rhs + (g00 * c_t[i, j]) * us[j]
                us.append(fact.solve(rhs))
            u_new = u
            for i in range(s):
                u_new = u_new + m_t[i] * us[i]
            return t + dt, u_new

        return self._wrap(local_step)

    # convenience: global F for tests/diagnostics
    def F(self):
        def local_F(t, u, helpers, pstack, x, dt):
            return t, self._local_F(u, helpers, pstack, x)

        return self._wrap(local_F)
