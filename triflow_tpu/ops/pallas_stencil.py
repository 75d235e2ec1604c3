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
The tile is chosen PER N (``pick_tile``): the kernels are bound by
per-grid-step overhead (~10us each), so the fewer, fatter tiles the better —
the only limits are VMEM and divisibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: tile-length search bounds (lane-dim)
TILE_MAX = 1 << 16
TILE_MIN = 512


def pick_tile(N: int, halo: int = 0, max_tile: int = TILE_MAX):
    """Largest divisor of N in [TILE_MIN, max_tile] (preferring lane-aligned
    candidates), or None when N has no usable tiling.  ntiles >= 2 so the
    ±1-shifted neighbor blocks are really distinct."""
    if N < 2 * TILE_MIN:
        return None
    best = None
    d = 1
    while d * d <= N:
        if N % d == 0:
            for t in (d, N // d):
                if (TILE_MIN <= t <= max_tile and N // t >= 2
                        and t > 2 * max(halo, 1) and t % 128 == 0):
                    # Mosaic requires lane-dim blocks divisible by 128
                    if best is None or t > best:
                        best = t
        d += 1
    return best


def _tile_cap(backend) -> int:
    """VMEM-driven tile cap: one grid step's blocks (J + split copy + the
    haloed operand windows, double-buffered by pallas) must stay within a
    ~8 MB budget."""
    nvar = backend.system.nvar
    W = backend.window
    item = jnp.dtype(backend.dtype).itemsize
    per_lane = 2 * W * nvar * nvar * item + 8 * nvar * item
    return max(TILE_MIN, min(TILE_MAX, (4 << 20) // per_lane))


def _backend_tile(backend, N):
    return pick_tile(N, backend.halo, _tile_cap(backend))


def stencil_applicable(backend, u, N):
    import os

    if os.environ.get("TRIFLOW_NO_PALLAS"):
        return False
    if u.ndim != 2:
        return False
    if jnp.dtype(backend.dtype) != jnp.float32:
        return False  # Mosaic f64: route doubles onto the XLA path
    if _backend_tile(backend, N) is None:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _row_specs(rows, tile, ntiles, shift):
    """BlockSpec of a (rows, N) array tiled along N with a tile-index shift
    (modular: equals periodic wrap when the grid covers the array)."""
    return pl.BlockSpec(
        (rows, tile),
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
        self.tile = _backend_tile(backend, N)
        self.ntiles = N // self.tile
        self.h = backend.halo
        self.nvar = self.system.nvar
        self.nhelp = len(self.system.help_funcs)
        self.npar = len(self.system.pars)
        self.dtype = backend.dtype

    def operands(self, u, helpers, pstack, x):
        nt, tile = self.ntiles, self.tile
        ops = [u, u, u]
        specs = [_row_specs(self.nvar, tile, nt, -1),
                 _row_specs(self.nvar, tile, nt, 0),
                 _row_specs(self.nvar, tile, nt, 1)]
        if self.nhelp:
            ops += [helpers, helpers, helpers]
            specs += [_row_specs(self.nhelp, tile, nt, -1),
                      _row_specs(self.nhelp, tile, nt, 0),
                      _row_specs(self.nhelp, tile, nt, 1)]
        if self.npar:
            ops.append(pstack)
            specs.append(_row_specs(self.npar, tile, nt, 0))
        ops.append(x)
        specs.append(pl.BlockSpec((tile,), lambda i: (i,),
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
        tile = self.tile
        args = [x_blk]
        for var, off in self.backend._offset_args:
            args.append(named[var][h + off: h + off + tile])
        for idx in range(self.npar):
            args.append(ps[idx])
        args.append(dx)
        return args


def eval_F(backend, u, helpers, pstack, x, periodic: bool):
    """F(u) as a tiled Pallas kernel; mirrors ArrayBackend.F_impl."""
    call = _StencilCall(backend, periodic, u.shape[-1])
    nvar, dtype, tile = call.nvar, call.dtype, call.tile

    def kernel(*refs):
        out_ref = refs[-1]
        args = call.build_args(refs[:-1])
        rows = [jnp.broadcast_to(jnp.asarray(fn(*args), dtype), (tile,))
                for fn in backend._F_fns]
        out_ref[...] = jnp.stack(rows)

    ops, specs = call.operands(u, helpers, pstack, x)
    return pl.pallas_call(
        kernel,
        grid=(call.ntiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nvar, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, call.N), dtype),
    )(*ops)


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
    nvar, dtype, tile = call.nvar, call.dtype, call.tile
    W = backend.window
    h = call.h
    g = max(h, 1)
    ntiles = call.ntiles
    if split and tile % g:
        split = False
    Mt = tile // g if split else None

    def _iota_tile():
        return jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)[0]

    # static wrap-entry lists at node granularity (mirrors
    # ops.banded._wrapped_indices for the first/last tile)
    top_entries = [(k, i) for i in range(h) for k in range(h - i)]
    bottom_entries = [
        (k, tile - 1 - di)
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
        zero = jnp.zeros((tile,), dtype)
        rows = {}
        for (m, n, k), fn in backend._J_fns.items():
            rows[(k, m, n)] = jnp.broadcast_to(
                jnp.asarray(fn(*args), dtype), (tile,)
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
                            loc = tile - 1 - i
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
        pl.BlockSpec((W, nvar, nvar, tile), lambda i: (0, 0, 0, i),
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
    if jnp.dtype(v.dtype) != jnp.float32:
        return False
    if _matvec_tile(bands, v) is None:
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _matvec_tile(bands, v):
    W, nvar, _, N = bands.shape
    item = jnp.dtype(v.dtype).itemsize
    per_lane = W * nvar * nvar * item + 8 * nvar * item
    cap = max(TILE_MIN, min(TILE_MAX, (4 << 20) // per_lane))
    return pick_tile(N, W // 2, cap)


def banded_matvec_pallas(bands, v, periodic: bool):
    """A @ v for banded A — tiled kernel version of ops.banded.banded_matvec
    (zero ghost contribution in edge mode: the caller's bands are folded)."""
    W, nvar, _, N = bands.shape
    h = W // 2
    tile = _matvec_tile(bands, v)
    ntiles = N // tile
    dtype = v.dtype

    bspec = pl.BlockSpec((W, nvar, nvar, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM)
    vspecs = [_row_specs(nvar, tile, ntiles, s) for s in (-1, 0, 1)]

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
                    term = b_ref[k, m, n, :] * v_win[n, k: k + tile]
                    acc = term if acc is None else acc + term
            rows.append(acc)
        out_ref[...] = jnp.stack(rows)

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[bspec] + vspecs,
        out_specs=pl.BlockSpec((nvar, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, N), dtype),
    )(bands, v, v, v)
