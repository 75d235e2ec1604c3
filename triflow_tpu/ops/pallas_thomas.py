"""Pallas TPU kernels for the chunked-Thomas (Wang/SPIKE) sweeps.

The XLA ``lax.scan`` implementation of the chunk sweeps (ops/banded.py,
``_chunked_factor``/``_chunked_solve``) pays per-iteration dispatch overhead
for every one of the Mc sequential steps; these kernels run the whole sweep
inside one ``pallas_call`` with a sequential grid — carries live in VMEM
scratch across grid steps and Pallas double-buffers the block DMA
automatically, so the sweep runs at HBM bandwidth.

The sweeps are bound by per-grid-step latency (~3-10us each), not compute or
bandwidth, so every kernel is ROW-BLOCKED: one grid step loads ``r``
consecutive sweep rows and runs the recurrence over them as an unrolled
in-register loop, cutting the sequential depth from Mc to Mc/r.

Array convention (shared with ops/banded.py): chunk index C in the lane
dimension, sweep index Mc as the (sequential) grid dimension, block dims
(s, s) leading.  All kernels assume the caller already zeroed the cross-chunk
couplings (L[0] and U[Mc-1]) and passes them separately as Tl / Tr.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: Optional Mosaic scoped-VMEM ceiling override for the Pallas kernels
#: (bytes; 0 = leave Mosaic's default).  Raising it was tried as a way to
#: let deep-sweep plans use bigger row blocks, but measured a 3.7x
#: REGRESSION on the KS N=1e6 headline (3.1e9 -> 0.84e9 cells/s): granting
#: the kernels a 100MB scoped window evicts the XLA-managed VMEM residency
#: of the ~100MB working set that the headline depends on.  Keep 0 unless
#: experimenting.
_VMEM_LIMIT = int(os.environ.get("TRIFLOW_VMEM_LIMIT", 0))


def _pcall(*args, **kw):
    """pallas_call with an env-controlled interpret switch (CPU testing)."""
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    elif _VMEM_LIMIT:
        kw.setdefault("compiler_params",
                      pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    return pl.pallas_call(*args, **kw)


def _mm_t(a, b, tail):
    """Block matmul with ``tail`` trailing space dims: block dims sit at
    (-2-tail, -1-tail); tail=1 for a lanes-only chunk axis (..., m, k, C),
    tail=2 for the sublane-packed chunk axis (..., m, k, 8, C8).
    Rectangular operands arise in the odd-size Schur splits."""
    m, k = a.shape[-2 - tail], a.shape[-1 - tail]
    n = b.shape[-1 - tail]
    sp = (slice(None),) * tail
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[(..., i, q) + sp] * b[(..., q, j) + sp]
                        for q in range(k))
                    for j in range(n)
                ],
                axis=-1 - tail,
            )
            for i in range(m)
        ],
        axis=-2 - tail,
    )


def _mv_t(a, b, tail):
    m, k = a.shape[-2 - tail], a.shape[-1 - tail]
    sp = (slice(None),) * tail
    return jnp.stack(
        [
            sum(a[(..., i, q) + sp] * b[(..., q) + sp] for q in range(k))
            for i in range(m)
        ],
        axis=-1 - tail,
    )


def _inv_t(D, tail):
    """Closed-form / block-Schur inverse of small blocks with ``tail``
    trailing space dims (mirrors ops/banded.py _small_inv)."""
    s = D.shape[-2 - tail]
    sp = (slice(None),) * tail
    if s == 1:
        return 1.0 / D
    if s == 2:
        a = D[(..., 0, 0) + sp]
        b = D[(..., 0, 1) + sp]
        c = D[(..., 1, 0) + sp]
        d = D[(..., 1, 1) + sp]
        inv_det = 1.0 / (a * d - b * c)
        r0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1 - tail)
        r1 = jnp.stack([-c * inv_det, a * inv_det], axis=-1 - tail)
        return jnp.stack([r0, r1], axis=-2 - tail)
    if s <= 8:
        # block-Schur with an uneven split for odd s (rectangular _mm_t)
        p = s // 2
        A = D[(..., slice(None, p), slice(None, p)) + sp]
        B = D[(..., slice(None, p), slice(p, None)) + sp]
        C = D[(..., slice(p, None), slice(None, p)) + sp]
        Dd = D[(..., slice(p, None), slice(p, None)) + sp]
        Ainv = _inv_t(A, tail)
        Sinv = _inv_t(Dd - _mm_t(C, _mm_t(Ainv, B, tail), tail), tail)
        AinvB = _mm_t(Ainv, B, tail)
        CAinv = _mm_t(C, Ainv, tail)
        top = jnp.concatenate(
            [Ainv + _mm_t(AinvB, _mm_t(Sinv, CAinv, tail), tail),
             -_mm_t(AinvB, Sinv, tail)], axis=-1 - tail
        )
        bot = jnp.concatenate([-_mm_t(Sinv, CAinv, tail), Sinv],
                              axis=-1 - tail)
        return jnp.concatenate([top, bot], axis=-2 - tail)
    raise NotImplementedError(f"block size {s} > 8 not supported in kernel")


def _mm(a, b):
    return _mm_t(a, b, 1)


def _mv(a, b):
    return _mv_t(a, b, 1)


def _inv(D):
    return _inv_t(D, 1)


#: tuning overrides for the sweep kernels' per-grid-step blocks: when set,
#: they replace every call site's VMEM byte budget / row cap (deep-sweep
#: plans amortize per-grid-step cost with larger row blocks as long as the
#: blocks still fit in VMEM)
_ROWBLOCK_BUDGET = int(os.environ.get("TRIFLOW_ROWBLOCK_BUDGET", 0))
_ROWBLOCK_CAP = int(os.environ.get("TRIFLOW_ROWBLOCK_CAP", 0))


def row_block(Mc: int, row_bytes: int, budget: int = 4 * 1024 * 1024,
              cap: int = 16, sub_unit: int = 0) -> int:
    """Largest divisor of Mc that is <= cap and keeps one grid step's blocks
    (row_bytes per row, double-buffered by pallas) within the VMEM budget.

    With ``sub_unit`` the kernel blocks a (Mc*sub_unit, C) array with
    (r*sub_unit, C) tiles, so Mosaic needs r*sub_unit to be a multiple of 8
    (or the whole dimension, r == Mc)."""
    budget = _ROWBLOCK_BUDGET or budget
    cap = _ROWBLOCK_CAP or cap
    cap = max(1, min(cap, budget // max(row_bytes, 1), Mc))
    for cand in range(cap, 0, -1):
        if Mc % cand:
            continue
        if sub_unit and (cand * sub_unit) % 8 and cand != Mc:
            continue
        return cand
    return 1 if not sub_unit else 0


# ---------------------------------------------------------------------------
# factor kernels
# ---------------------------------------------------------------------------

def _fwd_factor_kernel(r):
    """Forward Thomas elimination over r-row blocks."""

    def kernel(L_ref, D_ref, U_ref, Tl_ref,
               fac_ref, Dhinv_ref, wt_ref,
               dhinv_c, uprev_c, wt_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dhinv_c[...] = jnp.zeros_like(dhinv_c)
            uprev_c[...] = jnp.zeros_like(uprev_c)
            wt_c[...] = jnp.zeros_like(wt_c)

        dhinv = dhinv_c[...]
        uprev = uprev_c[...]
        wt = wt_c[...]
        for i in range(r):
            fac = _mm(L_ref[i], dhinv)
            dhinv = _inv(D_ref[i] - _mm(fac, uprev))
            if i == 0:
                wt = jnp.where(j == 0, Tl_ref[...], -_mm(fac, wt))
            else:
                wt = -_mm(fac, wt)
            fac_ref[i] = fac
            Dhinv_ref[i] = dhinv
            wt_ref[i] = wt
            uprev = U_ref[i]
        dhinv_c[...] = dhinv
        uprev_c[...] = uprev
        wt_c[...] = wt

    return kernel


def _bwd_factor_kernel(r, tail=1):
    """Backward spike-construction sweep over r-row blocks (block index map
    is reversed; rows are processed descending inside the block, so grid step
    j == 0 / row i == r-1 is the globally LAST sweep row)."""

    def kernel(Dhinv_ref, U_ref, wt_ref, Tr_ref,
               W_ref, V_ref, DU_ref,
               w_c, v_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            w_c[...] = jnp.zeros_like(w_c)
            v_c[...] = jnp.zeros_like(v_c)

        w = w_c[...]
        v = v_c[...]
        for i in reversed(range(r)):
            Dhinv = Dhinv_ref[i]
            DU = _mm_t(Dhinv, U_ref[i], tail)
            if i == r - 1:
                bV = jnp.where(j == 0, Tr_ref[...],
                               jnp.zeros_like(Tr_ref[...]))
            else:
                bV = jnp.zeros_like(Tr_ref[...])
            w_new = _mm_t(Dhinv, wt_ref[i], tail) - _mm_t(DU, w, tail)
            v_new = _mm_t(Dhinv, bV, tail) - _mm_t(DU, v, tail)
            W_ref[i] = w_new
            V_ref[i] = v_new
            DU_ref[i] = DU
            w = w_new
            v = v_new
        w_c[...] = w
        v_c[...] = v

    return kernel


def _bwd_factor_call(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r):
    space = Dhinv.shape[3:]
    tail = len(space)
    Nb = Mc // r
    blk = (r, s, s) + space
    z = (0,) * tail

    def bwd_spec(j):
        return (Nb - 1 - j, 0, 0) + z

    def const3(j):
        return (0, 0) + z

    return _pcall(
        _bwd_factor_kernel(r, tail),
        grid=(Nb,),
        in_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s) + space, const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s) + space, dtype),
            pltpu.VMEM((s, s) + space, dtype),
        ],
    )(Dhinv, Uc, wt, Tr)


def _bwd_factor_kernel_cols(r, s, tail=1):
    """Backward spike sweep writing W/V **column-split**: W_ref[b] is the
    b-th spike column as a flat (Mc*s, *space) array (row k = m*s + a holds
    W[m, a, b]).  This is the layout the flat-RHS solve consumes, so the
    spike correction runs on (K, *space) tiles with no (Mc, s, …) relayout."""

    def kernel(Dhinv_ref, U_ref, wt_ref, Tr_ref,
               W_ref, V_ref, DU_ref,
               w_c, v_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            w_c[...] = jnp.zeros_like(w_c)
            v_c[...] = jnp.zeros_like(v_c)

        w = w_c[...]
        v = v_c[...]
        sp = (slice(None),) * tail
        for i in reversed(range(r)):
            Dhinv = Dhinv_ref[i]
            DU = _mm_t(Dhinv, U_ref[i], tail)
            if i == r - 1:
                bV = jnp.where(j == 0, Tr_ref[...],
                               jnp.zeros_like(Tr_ref[...]))
            else:
                bV = jnp.zeros_like(Tr_ref[...])
            w_new = _mm_t(Dhinv, wt_ref[i], tail) - _mm_t(DU, w, tail)
            v_new = _mm_t(Dhinv, bV, tail) - _mm_t(DU, v, tail)
            for b in range(s):
                W_ref[(b, slice(i * s, (i + 1) * s))] = w_new[(slice(None), b) + sp]
                V_ref[(b, slice(i * s, (i + 1) * s))] = v_new[(slice(None), b) + sp]
            DU_ref[i] = DU
            w = w_new
            v = v_new
        w_c[...] = w
        v_c[...] = v

    return kernel


def _bwd_factor_call_cols(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r):
    """Column-split spike construction: returns Wc, Vc (s, Mc*s, *space) and
    DU (Mc, s, s, *space)."""
    space = Dhinv.shape[3:]
    tail = len(space)
    Nb = Mc // r
    blk = (r, s, s) + space
    z = (0,) * tail

    def bwd_spec(j):
        return (Nb - 1 - j, 0, 0) + z

    def bwd_flat(j):
        return (0, Nb - 1 - j) + z

    def const3(j):
        return (0, 0) + z

    return _pcall(
        _bwd_factor_kernel_cols(r, s, tail),
        grid=(Nb,),
        in_specs=[
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s) + space, const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, r * s) + space, bwd_flat,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, r * s) + space, bwd_flat,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, bwd_spec, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, Mc * s) + space, dtype),
            jax.ShapeDtypeStruct((s, Mc * s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s) + space, dtype),
            pltpu.VMEM((s, s) + space, dtype),
        ],
    )(Dhinv, Uc, wt, Tr)


def chunked_factor_sweeps(Lc, Dc, Uc, Tl, Tr):
    """Run the factor sweeps (forward Thomas elimination + backward spike
    construction) as two row-blocked pallas_calls.

    Inputs: (Mc, s, s, C) arrays with L[0] and U[Mc-1] already zeroed; Tl/Tr
    the cross-chunk couplings (s, s, C).
    Returns fac, Dhinv, W, V, DU — all (Mc, s, s, C)."""
    Mc, s, _, C = Lc.shape
    dtype = Dc.dtype
    blk_bytes = s * s * C * Dc.dtype.itemsize
    r = row_block(Mc, 7 * blk_bytes)
    Nb = Mc // r
    blk = (r, s, s, C)

    def fwd_spec(j):
        return (j, 0, 0, 0)

    def const3(j):
        return (0, 0, 0)

    fac, Dhinv, wt = _pcall(
        _fwd_factor_kernel(r),
        grid=(Nb,),
        in_specs=[
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, fwd_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), const3, memory_space=pltpu.VMEM),
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

    W, V, DU = _bwd_factor_call(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r)
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
    band_bytes = W * nvar * nvar * g * C * bands_c.dtype.itemsize
    blk_bytes = s * s * C * bands_c.dtype.itemsize
    r = row_block(Mc, band_bytes + 4 * blk_bytes)
    Nb = Mc // r
    band_blk = (r, W, nvar, nvar, g, C)
    blk = (r, s, s, C)

    def fwd_band(j):
        return (j, 0, 0, 0, 0, 0)

    def fwd_blk(j):
        return (j, 0, 0, 0)

    def const3(j):
        return (0, 0, 0)

    def fwd_kernel(ab_ref, b_ref, fac_ref, Dhinv_ref, wt_ref, U_ref,
                   Tl_ref, Tr_ref, dhinv_c, uprev_c, wt_c):
        j = pl.program_id(0)
        Nb_n = pl.num_programs(0)
        alpha = ab_ref[0, 0]
        beta = ab_ref[0, 1]
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]

        @pl.when(j == 0)
        def _():
            dhinv_c[...] = jnp.zeros_like(dhinv_c)
            uprev_c[...] = jnp.zeros_like(uprev_c)
            wt_c[...] = jnp.zeros_like(wt_c)

        dhinv = dhinv_c[...]
        uprev = uprev_c[...]
        wt = wt_c[...]
        for i in range(r):
            b_blk = b_ref[i]
            L_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W,
                                    -1, C, dtype)
            D_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W,
                                    0, C, dtype)
            U_row = _row_from_bands(b_blk, alpha, beta, g, nvar, h, W,
                                    1, C, dtype)
            # cross-chunk couplings: captured at the boundary rows, masked
            # for the boundary chunks, zeroed out of the tri part
            if i == 0:
                Tl = jnp.where(iota_c == 0, 0.0, L_row)

                @pl.when(j == 0)
                def _(Tl=Tl):
                    Tl_ref[...] = Tl

                L_row = jnp.where(j == 0, 0.0, L_row)
            if i == r - 1:
                Tr = jnp.where(iota_c == C - 1, 0.0, U_row)

                @pl.when(j == Nb_n - 1)
                def _(Tr=Tr):
                    Tr_ref[...] = Tr

                U_row = jnp.where(j == Nb_n - 1, 0.0, U_row)

            fac = _mm(L_row, dhinv)
            dhinv = _inv(D_row - _mm(fac, uprev))
            if i == 0:
                wt = jnp.where(j == 0, Tl, -_mm(fac, wt))
            else:
                wt = -_mm(fac, wt)
            fac_ref[i] = fac
            Dhinv_ref[i] = dhinv
            wt_ref[i] = wt
            U_ref[i] = U_row
            uprev = U_row
        dhinv_c[...] = dhinv
        uprev_c[...] = uprev
        wt_c[...] = wt

    ab = jnp.stack([jnp.asarray(alpha, dtype),
                    jnp.asarray(beta, dtype)]).reshape(1, 2)
    fac, Dhinv, wt, Uc, Tl, Tr = _pcall(
        fwd_kernel,
        grid=(Nb,),
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

    W_, V_, DU = _bwd_factor_call(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r)
    return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr


# ---------------------------------------------------------------------------
# solve kernels
# ---------------------------------------------------------------------------

def _fwd_solve_kernel(r, tail=1):
    def kernel(fac_ref, b_ref, bt_ref, bt_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        bt = bt_c[...]
        for i in range(r):
            bt = b_ref[i] - _mv_t(fac_ref[i], bt, tail)
            bt_ref[i] = bt
        bt_c[...] = bt

    return kernel


def _bwd_solve_kernel(r, tail=1):
    def kernel(Dhinv_ref, DU_ref, bt_ref, y_ref, y_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            y_c[...] = jnp.zeros_like(y_c)

        y = y_c[...]
        for i in reversed(range(r)):
            y = (_mv_t(Dhinv_ref[i], bt_ref[i], tail)
                 - _mv_t(DU_ref[i], y, tail))
            y_ref[i] = y
        y_c[...] = y

    return kernel


def _solve_kernel(r, tail=1):
    """Both Thomas solve sweeps in ONE sequential grid of 2*Nb steps: the
    forward pass stores the reduced RHS in a VMEM scratch spanning the whole
    chunk depth; the backward pass reads it back — one kernel launch, no HBM
    round-trip for the intermediate."""

    def kernel(fac_ref, Dhinv_ref, DU_ref, b_ref, y_ref, bt_c, bt_all):
        jj = pl.program_id(0)
        Nb2 = pl.num_programs(0)
        Nb = Nb2 // 2

        @pl.when(jj == 0)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        @pl.when(jj < Nb)
        def _():
            bt = bt_c[...]
            for i in range(r):
                bt = b_ref[i] - _mv_t(fac_ref[i], bt, tail)
                bt_all[jj * r + i] = bt
            bt_c[...] = bt

        @pl.when(jj == Nb)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        @pl.when(jj >= Nb)
        def _():
            j = 2 * Nb - 1 - jj  # block Nb-1 ... 0
            y = bt_c[...]
            for i in reversed(range(r)):
                y = (_mv_t(Dhinv_ref[i], bt_all[j * r + i], tail)
                     - _mv_t(DU_ref[i], y, tail))
                y_ref[i] = y
            bt_c[...] = y

    return kernel


def _fwd_solve_kernel_flat(r, s, tail=1):
    def kernel(fac_ref, b_ref, bt_ref, bt_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        bt = bt_c[...]
        for i in range(r):
            bt = b_ref[i * s:(i + 1) * s] - _mv_t(fac_ref[i], bt, tail)
            bt_ref[i * s:(i + 1) * s] = bt
        bt_c[...] = bt

    return kernel


def _bwd_solve_kernel_flat(r, s, tail=1):
    def kernel(Dhinv_ref, DU_ref, bt_ref, y_ref, y_c):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            y_c[...] = jnp.zeros_like(y_c)

        y = y_c[...]
        for i in reversed(range(r)):
            y = (_mv_t(Dhinv_ref[i], bt_ref[i * s:(i + 1) * s], tail)
                 - _mv_t(DU_ref[i], y, tail))
            y_ref[i * s:(i + 1) * s] = y
        y_c[...] = y

    return kernel


def _solve_kernel_flat(r, s, tail=1):
    """Single-launch fwd+bwd Thomas solve with FLAT (r*s, *space) vector
    blocks on (K = Mc*s, *space) arrays — the folded nvar==1 state layout,
    so the RHS and solution never pass through a per-supernode relayout."""

    def kernel(fac_ref, Dhinv_ref, DU_ref, b_ref, y_ref, bt_c, bt_all):
        jj = pl.program_id(0)
        Nb2 = pl.num_programs(0)
        Nb = Nb2 // 2

        @pl.when(jj == 0)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        @pl.when(jj < Nb)
        def _():
            bt = bt_c[...]
            for i in range(r):
                bt = b_ref[i * s:(i + 1) * s] - _mv_t(fac_ref[i], bt, tail)
                bt_all[jj * r + i] = bt
            bt_c[...] = bt

        @pl.when(jj == Nb)
        def _():
            bt_c[...] = jnp.zeros_like(bt_c)

        @pl.when(jj >= Nb)
        def _():
            j = 2 * Nb - 1 - jj
            y = bt_c[...]
            for i in reversed(range(r)):
                y = (_mv_t(Dhinv_ref[i], bt_all[j * r + i], tail)
                     - _mv_t(DU_ref[i], y, tail))
                y_ref[i * s:(i + 1) * s] = y
            bt_c[...] = y

    return kernel


def chunked_solve_flat(fac, Dhinv, DU, bK):
    """Thomas solve with a flat (Mc*s, *space) right-hand side -> same shape.

    Single-launch when the forward intermediate fits a VMEM scratch (~6MB);
    otherwise two launches with the intermediate round-tripped through HBM
    in the SAME flat layout (still no per-supernode relayout).  Returns
    None only when no row block exists."""
    import numpy as _np

    Mc, s = fac.shape[:2]
    space = fac.shape[3:]
    tail = len(space)
    dtype = bK.dtype
    space_n = int(_np.prod(space))
    blk_bytes = s * s * space_n * dtype.itemsize
    vec_bytes = s * space_n * dtype.itemsize
    r = row_block(Mc, 3 * blk_bytes + 2 * vec_bytes,
                  sub_unit=s if tail == 1 else 0)
    if not r:
        return None
    Nb = Mc // r
    mat_blk = (r, s, s) + space
    vec_blk = (r * s,) + space
    z = (0,) * tail

    if Mc * vec_bytes > 6 * 1024 * 1024:
        def fwd_mat(j):
            return (j, 0, 0) + z

        def fwd_vec(j):
            return (j,) + z

        bt = _pcall(
            _fwd_solve_kernel_flat(r, s, tail),
            grid=(Nb,),
            in_specs=[
                pl.BlockSpec(mat_blk, fwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, fwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, fwd_vec,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc * s,) + space, dtype),
            scratch_shapes=[pltpu.VMEM((s,) + space, dtype)],
        )(fac, bK)

        def bwd_mat(j):
            return (Nb - 1 - j, 0, 0) + z

        def bwd_vec(j):
            return (Nb - 1 - j,) + z

        return _pcall(
            _bwd_solve_kernel_flat(r, s, tail),
            grid=(Nb,),
            in_specs=[
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, bwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, bwd_vec,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc * s,) + space, dtype),
            scratch_shapes=[pltpu.VMEM((s,) + space, dtype)],
        )(Dhinv, DU, bt)

    def fwd_blk_idx(jj):
        return jnp.minimum(jj, Nb - 1)

    def bwd_blk_idx(jj):
        return jnp.clip(2 * Nb - 1 - jj, 0, Nb - 1)

    def mat_fwd(jj):
        return (fwd_blk_idx(jj), 0, 0) + z

    def mat_bwd(jj):
        return (bwd_blk_idx(jj), 0, 0) + z

    def vec_fwd(jj):
        return (fwd_blk_idx(jj),) + z

    def vec_bwd(jj):
        return (bwd_blk_idx(jj),) + z

    return _pcall(
        _solve_kernel_flat(r, s, tail),
        grid=(2 * Nb,),
        in_specs=[
            pl.BlockSpec(mat_blk, mat_fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_blk, mat_bwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_blk, mat_bwd, memory_space=pltpu.VMEM),
            pl.BlockSpec(vec_blk, vec_fwd, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vec_blk, vec_bwd, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mc * s,) + space, dtype),
        scratch_shapes=[
            pltpu.VMEM((s,) + space, dtype),
            pltpu.VMEM((Mc, s) + space, dtype),
        ],
    )(fac, Dhinv, DU, bK)


def chunked_solve_sweeps(fac, Dhinv, DU, bc):
    """Thomas solve (forward + backward) as one fused pallas_call.

    bc has shape (Mc, …, s, *space) with optional extra leading batch axes
    for R simultaneous right-hand sides (the Woodbury / SPIKE coupling
    columns) — the kernels broadcast over the extra axes.  *space is (C,)
    or the sublane-packed (8, C8)."""
    import numpy as _np

    Mc, s = fac.shape[:2]
    space = fac.shape[3:]
    tail = len(space)
    dtype = bc.dtype
    vec_shape = bc.shape[1:]
    vec_bytes = int(_np.prod(vec_shape)) * bc.dtype.itemsize
    blk_bytes = s * s * int(_np.prod(space)) * bc.dtype.itemsize
    r = row_block(Mc, 3 * blk_bytes + 2 * vec_bytes)
    Nb = Mc // r
    mat_blk = (r, s, s) + space
    vec_blk = (r,) + vec_shape
    mz = (0,) * tail

    # the fused single-launch variant keeps the intermediate in VMEM: only
    # usable when it fits alongside the pipeline buffers
    bt_bytes = Mc * vec_bytes
    if bt_bytes > 6 * 1024 * 1024:
        def fwd_mat(j):
            return (j, 0, 0) + mz

        def fwd_vec(j):
            return (j,) + (0,) * len(vec_shape)

        bt = _pcall(
            _fwd_solve_kernel(r, tail),
            grid=(Nb,),
            in_specs=[
                pl.BlockSpec(mat_blk, fwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, fwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, fwd_vec, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc,) + vec_shape, dtype),
            scratch_shapes=[pltpu.VMEM(vec_shape, dtype)],
        )(fac, bc)

        def bwd_mat(j):
            return (Nb - 1 - j, 0, 0) + mz

        def bwd_vec(j):
            return (Nb - 1 - j,) + (0,) * len(vec_shape)

        return _pcall(
            _bwd_solve_kernel(r, tail),
            grid=(Nb,),
            in_specs=[
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(mat_blk, bwd_mat, memory_space=pltpu.VMEM),
                pl.BlockSpec(vec_blk, bwd_vec, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(vec_blk, bwd_vec, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mc,) + vec_shape, dtype),
            scratch_shapes=[pltpu.VMEM(vec_shape, dtype)],
        )(Dhinv, DU, bt)

    # grid step jj: forward block jj for jj < Nb, backward block 2Nb-1-jj
    def fwd_blk_idx(jj):
        return jnp.minimum(jj, Nb - 1)

    def bwd_blk_idx(jj):
        # during the forward phase (jj < Nb) this parks on block Nb-1; the
        # block is only flushed once its index changes, by which time the
        # backward phase has written the real values
        return jnp.clip(2 * Nb - 1 - jj, 0, Nb - 1)

    def mat_fwd(jj):
        return (fwd_blk_idx(jj), 0, 0) + mz

    def mat_bwd(jj):
        return (bwd_blk_idx(jj), 0, 0) + mz

    def vec_fwd(jj):
        return (fwd_blk_idx(jj),) + (0,) * len(vec_shape)

    def vec_bwd(jj):
        return (bwd_blk_idx(jj),) + (0,) * len(vec_shape)

    y = _pcall(
        _solve_kernel(r, tail),
        grid=(2 * Nb,),
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
