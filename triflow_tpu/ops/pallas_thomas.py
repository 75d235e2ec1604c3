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


def chunked_solve_sweeps(fac, Dhinv, DU, bc):
    """Forward + backward Thomas solve sweeps.

    bc has shape (Mc, s, C) or (Mc, R, s, C) for R simultaneous right-hand
    sides (the Woodbury / SPIKE coupling columns) — the kernels broadcast
    over the extra axis."""
    Mc = bc.shape[0]
    s, C = bc.shape[-2:]
    dtype = bc.dtype
    mat_blk = (1, s, s, C)
    vec_shape = bc.shape[1:]
    vec_blk = (1,) + vec_shape

    def fwd_mat(j):
        return (j,) + (0,) * 3

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
        return (Mc - 1 - j,) + (0,) * 3

    def bwd_vec(j):
        return (Mc - 1 - j,) + (0,) * len(vec_shape)

    y = pl.pallas_call(
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
    return y
