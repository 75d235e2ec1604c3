"""Pallas TPU kernels for the chunked-Thomas (Wang/SPIKE) sweeps.

The XLA ``lax.scan`` implementation of the chunk sweeps (ops/banded.py,
``_chunked_factor``/``_chunked_solve``) pays per-iteration dispatch overhead
for every one of the Mc sequential steps; these kernels run the whole sweep
inside one ``pallas_call`` with a sequential grid over Mc — carries live in
VMEM scratch across grid steps and Pallas double-buffers the (s, s, C) block
DMA automatically, so the sweep runs at HBM bandwidth.

Array convention (shared with ops/banded.py): chunk index C in the lane
dimension, sweep index Mc as the (sequential) grid dimension, block dims
(s, s) leading.  All kernels assume the caller already zeroed the cross-chunk
couplings (L[0] and U[Mc-1]) and passes them separately as Tl / Tr.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    s = a.shape[-3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[..., i, k, :] * b[..., k, j, :] for k in range(s))
                    for j in range(s)
                ],
                axis=-2,
            )
            for i in range(s)
        ],
        axis=-3,
    )


def _mv(a, b):
    s = a.shape[-3]
    return jnp.stack(
        [
            sum(a[..., i, k, :] * b[..., k, :] for k in range(s))
            for i in range(s)
        ],
        axis=-2,
    )


def _inv(D):
    """Closed-form / block-Schur inverse of (s, s, C) blocks (mirrors
    ops/banded.py _small_inv; duplicated here so the kernel has no module
    interdependency at trace time)."""
    s = D.shape[-3]
    if s == 1:
        return 1.0 / D
    if s == 2:
        a = D[..., 0, 0, :]
        b = D[..., 0, 1, :]
        c = D[..., 1, 0, :]
        d = D[..., 1, 1, :]
        inv_det = 1.0 / (a * d - b * c)
        r0 = jnp.stack([d * inv_det, -b * inv_det], axis=-2)
        r1 = jnp.stack([-c * inv_det, a * inv_det], axis=-2)
        return jnp.stack([r0, r1], axis=-3)
    p = s // 2
    if s % 2 == 0:
        A = D[..., :p, :p, :]
        B = D[..., :p, p:, :]
        C = D[..., p:, :p, :]
        Dd = D[..., p:, p:, :]
        Ainv = _inv(A)
        Sinv = _inv(Dd - _mm(C, _mm(Ainv, B)))
        AinvB = _mm(Ainv, B)
        CAinv = _mm(C, Ainv)
        top = jnp.concatenate(
            [Ainv + _mm(AinvB, _mm(Sinv, CAinv)), -_mm(AinvB, Sinv)], axis=-2
        )
        bot = jnp.concatenate([-_mm(Sinv, CAinv), Sinv], axis=-2)
        return jnp.concatenate([top, bot], axis=-3)
    raise NotImplementedError(f"odd block size {s} not supported in kernel")


# ---------------------------------------------------------------------------
# factor kernels
# ---------------------------------------------------------------------------

def _fwd_factor_kernel(L_ref, D_ref, U_ref, Tl_ref,
                       fac_ref, Dhinv_ref, wt_ref,
                       dhinv_c, uprev_c, wt_c):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dhinv_c[...] = jnp.zeros_like(dhinv_c)
        uprev_c[...] = jnp.zeros_like(uprev_c)
        wt_c[...] = jnp.zeros_like(wt_c)

    L_j = L_ref[0]
    fac = _mm(L_j, dhinv_c[...])
    Dhat = D_ref[0] - _mm(fac, uprev_c[...])
    Dhinv = _inv(Dhat)
    wt = jnp.where(j == 0, Tl_ref[...], -_mm(fac, wt_c[...]))

    fac_ref[0] = fac
    Dhinv_ref[0] = Dhinv
    wt_ref[0] = wt
    dhinv_c[...] = Dhinv
    uprev_c[...] = U_ref[0]
    wt_c[...] = wt


def _bwd_factor_kernel(Dhinv_ref, U_ref, wt_ref, Tr_ref,
                       W_ref, V_ref, DU_ref,
                       w_c, v_c):
    j = pl.program_id(0)  # 0 = last sweep row (reversed index map)

    @pl.when(j == 0)
    def _():
        w_c[...] = jnp.zeros_like(w_c)
        v_c[...] = jnp.zeros_like(v_c)

    Dhinv = Dhinv_ref[0]
    DU = _mm(Dhinv, U_ref[0])
    bV = jnp.where(j == 0, Tr_ref[...], jnp.zeros_like(Tr_ref[...]))
    W = _mm(Dhinv, wt_ref[0]) - _mm(DU, w_c[...])
    V = _mm(Dhinv, bV) - _mm(DU, v_c[...])

    W_ref[0] = W
    V_ref[0] = V
    DU_ref[0] = DU
    w_c[...] = W
    v_c[...] = V


def chunked_factor_sweeps(Lc, Dc, Uc, Tl, Tr):
    """Run the factor sweeps (forward Thomas elimination + backward spike
    construction) as two pallas_calls.

    Inputs: (Mc, s, s, C) arrays with L[0] and U[Mc-1] already zeroed; Tl/Tr
    the cross-chunk couplings (s, s, C).
    Returns fac, Dhinv, W, V, DU — all (Mc, s, s, C)."""
    Mc, s, _, C = Lc.shape
    blk = (1, s, s, C)
    dtype = Dc.dtype

    def fwd_spec(j):
        return (j, 0, 0, 0)

    fac, Dhinv, wt = pl.pallas_call(
        _fwd_factor_kernel,
        grid=(Mc,),
        in_specs=[
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
        ],
    )(Lc, Dc, Uc, Tl)

    def bwd_spec(j):
        return (Mc - 1 - j, 0, 0, 0)

    W, V, DU = pl.pallas_call(
        _bwd_factor_kernel,
        grid=(Mc,),
        in_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
        ],
    )(Dhinv, Uc, wt, Tr)
    return fac, Dhinv, W, V, DU


# ---------------------------------------------------------------------------
# fused assembly + factor sweeps
# ---------------------------------------------------------------------------
#
# Building the (s, s, M) block arrays in XLA costs ~28ms at N=1e6: the
# stack-of-strided-slices composition defeats the fusion heuristics even
# though every piece is fast in isolation.  Instead the forward sweep kernel
# reads RAW band tiles in chunk layout — bands_c[j, k, m, n, a, c] =
# (alpha*I + beta*J)[k, m, n, ((c*Mc + j)*g + a)] — and assembles each
# supernode row with pure static indexing in registers.

def _row_from_bands(b_blk, alpha, beta, g, nvar, h, W, dblock, C, dtype):
    """One supernode block row (s, s, C) from a (W, nvar, nvar, g, C) band
    tile: entry [a*nvar+m, b*nvar+n] = beta * band[h + (b-a) + dblock*g]
    at local node a (+ alpha on the diagonal for dblock == 0)."""
    rows = []
    for a in range(g):
        for m in range(nvar):
            row = []
            for bb in range(g):
                for n in range(nvar):
                    delta = (bb - a) + dblock * g
                    if abs(delta) > h:
                        row.append(jnp.zeros((C,), dtype))
                    else:
                        val = beta * b_blk[h + delta, m, n, a, :]
                        if dblock == 0 and a == bb and m == n:
                            val = val + alpha
                        row.append(val)
            rows.append(jnp.stack(row))
    return jnp.stack(rows)


def fused_factor_sweeps(bands_c, alpha, beta):
    """Factor sweeps reading raw band tiles (fused assembly).

    bands_c: (Mc, W, nvar, nvar, g, C) with chunk c owning the contiguous
    block rows [c*Mc, (c+1)*Mc); alpha/beta fold ``alpha*I + beta*J`` into
    the assembly.  Cross-chunk couplings (Tl from row 0, Tr from the last
    row) are captured in-kernel, with chunk 0 / C-1 masked (they have no
    tri-part neighbor; any global wrap lives in the Woodbury correction).

    Returns fac, Dhinv, Uc, W, V, DU (all (Mc, s, s, C)) plus Tl, Tr."""
    Mc, W, nvar, _, g, C = bands_c.shape
    h = W // 2
    s = nvar * g
    dtype = bands_c.dtype
    band_blk = (1, W, nvar, nvar, g, C)
    blk = (1, s, s, C)

    def fwd_band(j):
        return (j, 0, 0, 0, 0, 0)

    def fwd_blk(j):
        return (j, 0, 0, 0)

    def const3(j):
        return (0, 0, 0)

    def fwd_kernel(ab_ref, b_ref, fac_ref, Dhinv_ref, wt_ref, U_ref,
                   Tl_ref, Tr_ref, dhinv_c, uprev_c, wt_c):
        j = pl.program_id(0)
        Mc_n = pl.num_programs(0)
        alpha = ab_ref[0, 0]
        beta = ab_ref[0, 1]
        b_blk = b_ref[0]
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]

        L_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W, -1, C, dtype)
        D_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W, 0, C, dtype)
        U_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W, 1, C, dtype)

        # cross-chunk couplings: captured at the boundary rows, masked for
        # the boundary chunks, zeroed out of the tri part
        Tl = jnp.where(iota_c == 0, 0.0, L_row)
        Tr = jnp.where(iota_c == C - 1, 0.0, U_row)
        L_row = jnp.where(j == 0, 0.0, L_row)
        U_row = jnp.where(j == Mc_n - 1, 0.0, U_row)

        @pl.when(j == 0)
        def _():
            dhinv_c[...] = jnp.zeros_like(dhinv_c)
            uprev_c[...] = jnp.zeros_like(uprev_c)
            wt_c[...] = jnp.zeros_like(wt_c)
            Tl_ref[...] = Tl

        @pl.when(j == Mc_n - 1)
        def _():
            Tr_ref[...] = Tr

        fac = _mm(L_row, dhinv_c[...])
        Dhinv = _inv(D_row - _mm(fac, uprev_c[...]))
        wt = jnp.where(j == 0, Tl, -_mm(fac, wt_c[...]))

        fac_ref[0] = fac
        Dhinv_ref[0] = Dhinv
        wt_ref[0] = wt
        U_ref[0] = U_row
        dhinv_c[...] = Dhinv
        uprev_c[...] = U_row
        wt_c[...] = wt

    ab = jnp.stack([jnp.asarray(alpha, dtype),
                    jnp.asarray(beta, dtype)]).reshape(1, 2)
    fac, Dhinv, wt, Uc, Tl, Tr = pl.pallas_call(
        fwd_kernel,
        grid=(Mc,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(band_blk, fwd_band, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, fwd_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), const3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((s, s, C), dtype),
            jax.ShapeDtypeStruct((s, s, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
        ],
    )(ab, bands_c)

    def bwd_spec(j):
        return (Mc - 1 - j, 0, 0, 0)

    W_, V_, DU = pl.pallas_call(
        _bwd_factor_kernel,
        grid=(Mc,),
        in_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
            jax.ShapeDtypeStruct((Mc, s, s, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s, C), dtype),
            pltpu.VMEM((s, s, C), dtype),
        ],
    )(Dhinv, Uc, wt, Tr)
    return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr


# ---------------------------------------------------------------------------
# solve kernels
# ---------------------------------------------------------------------------

def _fwd_solve_kernel(fac_ref, b_ref, bt_ref, bt_c):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        bt_c[...] = jnp.zeros_like(bt_c)

    bt = b_ref[0] - _mv(fac_ref[0], bt_c[...])
    bt_ref[0] = bt
    bt_c[...] = bt


def _bwd_solve_kernel(Dhinv_ref, DU_ref, bt_ref, y_ref, y_c):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        y_c[...] = jnp.zeros_like(y_c)

    y = _mv(Dhinv_ref[0], bt_ref[0]) - _mv(DU_ref[0], y_c[...])
    y_ref[0] = y
    y_c[...] = y


def _solve_kernel(fac_ref, Dhinv_ref, DU_ref, b_ref, y_ref, bt_c, bt_all):
    """Both Thomas solve sweeps in ONE sequential grid of 2*Mc steps: the
    forward pass stores the reduced RHS in a VMEM scratch spanning the whole
    chunk depth; the backward pass reads it back — one kernel launch, no HBM
    round-trip for the intermediate."""
    jj = pl.program_id(0)
    Mc2 = pl.num_programs(0)
    Mc = Mc2 // 2

    @pl.when(jj == 0)
    def _():
        bt_c[...] = jnp.zeros_like(bt_c)

    @pl.when(jj < Mc)
    def _():
        bt = b_ref[0] - _mv(fac_ref[0], bt_c[...])
        bt_all[jj] = bt
        bt_c[...] = bt

    @pl.when(jj == Mc)
    def _():
        bt_c[...] = jnp.zeros_like(bt_c)

    @pl.when(jj >= Mc)
    def _():
        j = 2 * Mc - 1 - jj  # Mc-1 ... 0
        y = _mv(Dhinv_ref[0], bt_all[j]) - _mv(DU_ref[0], bt_c[...])
        y_ref[0] = y
        bt_c[...] = y


def chunked_solve_sweeps(fac, Dhinv, DU, bc):
    """Thomas solve (forward + backward) as one fused pallas_call.

    bc has shape (Mc, s, C) or (Mc, R, s, C) for R simultaneous right-hand
    sides (the Woodbury / SPIKE coupling columns) — the kernels broadcast
    over the extra axis."""
    Mc = bc.shape[0]
    s, C = bc.shape[-2:]
    dtype = bc.dtype
    mat_blk = (1, s, s, C)
    vec_shape = bc.shape[1:]
    vec_blk = (1,) + vec_shape

    # the fused single-launch variant keeps the intermediate in VMEM: only
    # usable when it fits alongside the pipeline buffers
    import numpy as _np
    bt_bytes = Mc * int(_np.prod(vec_shape)) * bc.dtype.itemsize
    if bt_bytes > 6 * 1024 * 1024:
        def fwd_mat(j):
            return (j, 0, 0, 0)

        def fwd_vec(j):
            return (j,) + (0,) * len(vec_shape)

        bt = pl.pallas_call(
            _fwd_solve_kernel,
            grid=(Mc,),
            in_specs=[
                pl.BlockSpec(mat_blk, fwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, fwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, fwd_vec, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc,) + vec_shape, dtype),
            scratch_shapes=[pltpu.VMEM(vec_shape, dtype)],
        )(fac, bc)

        def bwd_mat(j):
            return (Mc - 1 - j, 0, 0, 0)

        def bwd_vec(j):
            return (Mc - 1 - j,) + (0,) * len(vec_shape)

        return pl.pallas_call(
            _bwd_solve_kernel,
            grid=(Mc,),
            in_specs=[
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, bwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, bwd_vec, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc,) + vec_shape, dtype),
            scratch_shapes=[pltpu.VMEM(vec_shape, dtype)],
        )(Dhinv, DU, bt)

    # grid step jj: forward row jj for jj < Mc, backward row 2Mc-1-jj after
    def fwd_row(jj):
        return jnp.minimum(jj, Mc - 1)

    def bwd_row(jj):
        # during the forward phase (jj < Mc) this parks on row Mc-1; the
        # block is only flushed once its index changes, by which time the
        # backward phase has written the real value
        return jnp.clip(2 * Mc - 1 - jj, 0, Mc - 1)

    def mat_fwd(jj):
        return (fwd_row(jj), 0, 0, 0)

    def mat_bwd(jj):
        return (bwd_row(jj), 0, 0, 0)

    def vec_fwd(jj):
        return (fwd_row(jj),) + (0,) * len(vec_shape)

    def vec_bwd(jj):
        return (bwd_row(jj),) + (0,) * len(vec_shape)

    y = pl.pallas_call(
        _solve_kernel,
        grid=(2 * Mc,),
        in_specs=[
            pl.BlockSpec(mat_blk, mat_fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_blk, mat_bwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_blk, mat_bwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(vec_blk, vec_fwd, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vec_blk, vec_bwd, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mc,) + vec_shape, dtype),
        scratch_shapes=[
            pltpu.VMEM(vec_shape, dtype),
            pltpu.VMEM((Mc,) + vec_shape, dtype),
        ],
    )(fac, Dhinv, DU, bc)
    return y
