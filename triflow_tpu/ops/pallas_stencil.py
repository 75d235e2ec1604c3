"""Pallas TPU kernels for the stencil hot path: F(u), the banded Jacobian
fill, and the banded matvec.

The XLA lowering of the lambdified stencil expressions builds each shifted
operand with ``jnp.roll`` (a full-array copy) and fuses imperfectly across
the many small expressions; these kernels evaluate the same lambdified
functions on VMEM-resident windows instead — each grid step loads a tile
plus its halo from the neighboring tiles and computes every expression
in-registers (SURVEY.md §7 phase 9: "fuse pad+stencil+J-band-fill into one
kernel").

Tiling: grid over N/T tiles; the halo is assembled from the left/right
neighbor tiles, passed as additional inputs whose index maps are shifted by
±1 (with modular wrap, which equals the periodic closure when N % T == 0).
The edge closure clamps the ghost cells in-kernel on the boundary tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tile length along the grid (lane-dim multiple)
TILE = 8192


def stencil_applicable(backend, u, N):
    import os

    if os.environ.get("TRIFLOW_NO_PALLAS"):
        return False
    if u.ndim != 2:
        return False
    if N % TILE or N // TILE < 2:
        return False
    if backend.halo >= TILE:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _row_specs(rows, ntiles, shift):
    """BlockSpec of a (rows, N) array tiled along N with a tile-index shift
    (modular: equals periodic wrap when the grid covers the array)."""
    return pl.BlockSpec(
        (rows, TILE),
        lambda i, s=shift: (0, (i + s) % ntiles),
        memory_space=pltpu.VMEM,
    )


class _StencilCall:
    """Shared operand plumbing for the F / J kernels: assembles the haloed
    windows of u (and helpers, when present) plus per-tile parameter and x
    blocks, handing the kernel body a ready argument list."""

    def __init__(self, backend, periodic, N):
        self.backend = backend
        self.system = backend.system
        self.periodic = periodic
        self.N = N
        self.ntiles = N // TILE
        self.h = backend.halo
        self.nvar = self.system.nvar
        self.nhelp = len(self.system.help_funcs)
        self.npar = len(self.system.pars)
        self.dtype = backend.dtype

    def operands(self, u, helpers, pstack, x):
        nt = self.ntiles
        ops = [u, u, u]
        specs = [_row_specs(self.nvar, nt, -1),
                 _row_specs(self.nvar, nt, 0),
                 _row_specs(self.nvar, nt, 1)]
        if self.nhelp:
            ops += [helpers, helpers, helpers]
            specs += [_row_specs(self.nhelp, nt, -1),
                      _row_specs(self.nhelp, nt, 0),
                      _row_specs(self.nhelp, nt, 1)]
        if self.npar:
            ops.append(pstack)
            specs.append(_row_specs(self.npar, nt, 0))
        ops.append(x)
        specs.append(pl.BlockSpec((TILE,), lambda i: (i,),
                                  memory_space=pltpu.VMEM))
        dx = ((x[-1] - x[0]) / (self.N - 1)).astype(self.dtype).reshape(1, 1)
        ops.append(dx)
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        return ops, specs

    def _window(self, left, center, right):
        h = self.h
        if h == 0:
            return center
        i = pl.program_id(0)
        left_tail = left[..., -h:]
        right_head = right[..., :h]
        if not self.periodic:
            edge_l = jnp.broadcast_to(center[..., :1], left_tail.shape)
            edge_r = jnp.broadcast_to(center[..., -1:], right_head.shape)
            left_tail = jnp.where(i == 0, edge_l, left_tail)
            right_head = jnp.where(i == self.ntiles - 1, edge_r, right_head)
        return jnp.concatenate([left_tail, center, right_head], axis=-1)

    def build_args(self, refs):
        """Unpack kernel refs -> lambdified-expression argument list."""
        it = iter(refs)
        u_l, u_c, u_r = next(it)[...], next(it)[...], next(it)[...]
        u_win = self._window(u_l, u_c, u_r)
        if self.nhelp:
            he_l, he_c, he_r = next(it)[...], next(it)[...], next(it)[...]
            he_win = self._window(he_l, he_c, he_r)
        else:
            he_win = None
        ps = next(it)[...] if self.npar else None
        x_blk = next(it)[...]
        dx = next(it)[0, 0]

        named = {}
        for idx, name in enumerate(self.system.dep_vars):
            named[name] = u_win[idx]
        for idx, name in enumerate(self.system.help_funcs):
            named[name] = he_win[idx]
        h = self.h
        args = [x_blk]
        for var, off in self.backend._offset_args:
            args.append(named[var][h + off: h + off + TILE])
        for idx in range(self.npar):
            args.append(ps[idx])
        args.append(dx)
        return args


def eval_F(backend, u, helpers, pstack, x, periodic: bool):
    """F(u) as a tiled Pallas kernel; mirrors ArrayBackend.F_impl."""
    call = _StencilCall(backend, periodic, u.shape[-1])
    nvar, dtype = call.nvar, call.dtype

    def kernel(*refs):
        out_ref = refs[-1]
        args = call.build_args(refs[:-1])
        rows = [jnp.broadcast_to(jnp.asarray(fn(*args), dtype), (TILE,))
                for fn in backend._F_fns]
        out_ref[...] = jnp.stack(rows)

    ops, specs = call.operands(u, helpers, pstack, x)
    return pl.pallas_call(
        kernel,
        grid=(call.ntiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nvar, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, call.N), dtype),
    )(*ops)


def _iota_tile():
    return jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)[0]


def eval_J_bands(backend, u, helpers, pstack, x, periodic: bool,
                 split: bool = False):
    """Banded Jacobian fill as a tiled Pallas kernel.

    Edge folding (non-periodic ghost dependencies onto the boundary columns)
    happens in-kernel on the boundary tiles.

    With ``split=True`` the kernel also emits a **phase-split** copy of the
    bands, ``Jg[a, k, m, n, I] = J[k, m, n, I*g + a]`` with the periodic wrap
    entries zeroed — exactly the layout the supernode block assembly of the
    solver consumes.  Doing the deinterleave in-registers at tile scale costs
    ~nothing; as an HBM-level strided gather it costs tens of ms at N=1e6.
    Returns J or (J, Jg)."""
    call = _StencilCall(backend, periodic, u.shape[-1])
    nvar, dtype = call.nvar, call.dtype
    W = backend.window
    h = call.h
    g = max(h, 1)
    ntiles = call.ntiles
    Mt = TILE // g

    # static wrap-entry lists at node granularity (mirrors
    # ops.banded._wrapped_indices for the first/last tile)
    top_entries = [(k, i) for i in range(h) for k in range(h - i)]
    bottom_entries = [
        (k, TILE - 1 - di)
        for di in range(h)
        for k in range(W - 1, W - 1 - (h - di), -1)
    ]

    def kernel(*refs):
        if split:
            out_ref, outg_ref = refs[-2], refs[-1]
            args = call.build_args(refs[:-2])
        else:
            out_ref = refs[-1]
            args = call.build_args(refs[:-1])
        tid = pl.program_id(0)
        iota = _iota_tile()
        zero = jnp.zeros((TILE,), dtype)
        rows = {}
        for (m, n, k), fn in backend._J_fns.items():
            rows[(k, m, n)] = jnp.broadcast_to(
                jnp.asarray(fn(*args), dtype), (TILE,)
            )

        def get(k, m, n):
            return rows.get((k, m, n), zero)

        if not periodic:
            # fold ghost contributions onto the boundary columns (only the
            # first/last tile has any)
            for m in range(nvar):
                for n in range(nvar):
                    for i in range(h):
                        for k in range(h - i):
                            mask = (tid == 0) & (iota == i)
                            src = get(k, m, n)
                            rows[(h - i, m, n)] = jnp.where(
                                mask, get(h - i, m, n) + src, get(h - i, m, n)
                            )
                            rows[(k, m, n)] = jnp.where(mask, 0.0, src)
                    for i in range(h):
                        for k in range(h - i):
                            koff = W - 1 - k
                            loc = TILE - 1 - i
                            mask = (tid == ntiles - 1) & (iota == loc)
                            src = get(koff, m, n)
                            rows[(h + i, m, n)] = jnp.where(
                                mask, get(h + i, m, n) + src, get(h + i, m, n)
                            )
                            rows[(koff, m, n)] = jnp.where(mask, 0.0, src)

        out_ref[...] = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack([get(k, m, n) for n in range(nvar)])
                        for m in range(nvar)
                    ]
                )
                for k in range(W)
            ]
        )

        if split:
            # zero the periodic wrap entries (they belong to the Woodbury
            # correction, not the block-tridiagonal part)
            def get_tri(k, m, n):
                row = get(k, m, n)
                if periodic:
                    for (kk, ii) in top_entries:
                        if kk == k:
                            row = jnp.where((tid == 0) & (iota == ii), 0.0, row)
                    for (kk, ii) in bottom_entries:
                        if kk == k:
                            row = jnp.where(
                                (tid == ntiles - 1) & (iota == ii), 0.0, row
                            )
                return row

            outg_ref[...] = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    jnp.stack(
                                        [
                                            get_tri(k, m, n)
                                            .reshape(Mt, g)[:, a]
                                            for n in range(nvar)
                                        ]
                                    )
                                    for m in range(nvar)
                                ]
                            )
                            for k in range(W)
                        ]
                    )
                    for a in range(g)
                ]
            )

    ops, specs = call.operands(u, helpers, pstack, x)
    out_specs = [
        pl.BlockSpec((W, nvar, nvar, TILE), lambda i: (0, 0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((W, nvar, nvar, call.N), dtype)]
    if split:
        out_specs.append(
            pl.BlockSpec((g, W, nvar, nvar, Mt), lambda i: (0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((g, W, nvar, nvar, call.N // g), dtype)
        )
    result = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=specs,
        out_specs=out_specs if split else out_specs[0],
        out_shape=out_shape if split else out_shape[0],
    )(*ops)
    return result


def matvec_applicable(bands, v):
    import os

    if os.environ.get("TRIFLOW_NO_PALLAS"):
        return False
    if v.ndim != 2 or bands.ndim != 4:
        return False
    N = v.shape[-1]
    if N % TILE or N // TILE < 2:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def banded_matvec_pallas(bands, v, periodic: bool):
    """A @ v for banded A — tiled kernel version of ops.banded.banded_matvec
    (zero ghost contribution in edge mode: the caller's bands are folded)."""
    W, nvar, _, N = bands.shape
    h = W // 2
    ntiles = N // TILE
    dtype = v.dtype

    bspec = pl.BlockSpec((W, nvar, nvar, TILE), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    vspecs = [_row_specs(nvar, ntiles, s) for s in (-1, 0, 1)]

    def kernel(b_ref, v_l, v_c, v_r, out_ref):
        i = pl.program_id(0)
        if h == 0:
            v_win = v_c[...]
            out_ref[...] = jnp.stack([
                sum(b_ref[0, m, n, :] * v_win[n] for n in range(nvar))
                for m in range(nvar)
            ])
            return
        left_tail = v_l[..., -h:]
        right_head = v_r[..., :h]
        if not periodic:
            # out-of-domain columns contribute zero
            zero = jnp.zeros_like(left_tail)
            left_tail = jnp.where(i == 0, zero, left_tail)
            right_head = jnp.where(i == ntiles - 1, zero, right_head)
        v_win = jnp.concatenate([left_tail, v_c[...], right_head], axis=-1)
        rows = []
        for m in range(nvar):
            acc = None
            for k in range(W):
                for n in range(nvar):
                    term = b_ref[k, m, n, :] * v_win[n, k: k + TILE]
                    acc = term if acc is None else acc + term
            rows.append(acc)
        out_ref[...] = jnp.stack(rows)

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[bspec] + vspecs,
        out_specs=pl.BlockSpec((nvar, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, N), dtype),
    )(bands, v, v, v)
