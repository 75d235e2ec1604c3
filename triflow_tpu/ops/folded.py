"""Folded (chunk-native) state layout: the TPU-first hot path.

The device trace of the RODASPR step showed that the Thomas-sweep kernels
are cheap while ~2/3 of the step went to XLA ``copy``/``reshape`` ops (the
node->chunk layout transposes around every stage solve) plus sublane-padded
``(1, N)`` elementwise traffic.  This module eliminates that cost CLASS by
keeping the whole step in a **folded layout**

    uf[v, k, c] = u[v, c*K + k]      (nvar, K, C),  K = Mc * g

where ``C`` (the solver's chunk count) lives in the lane dimension and the
node-within-chunk index ``k`` in sublanes.  In this layout:

- elementwise stage algebra runs on dense (K, C) tiles (no sublane padding),
- the banded Jacobian is produced directly in the layout the factor kernel
  consumes (no ``bands_c`` HBM transpose),
- the chunked-Thomas solve reads/writes the state natively: chunk-layout
  block rows are plain sublane slices (no ``(C, Mc)`` lane-major transposes),
- stencil halos are sublane shifts, plus ONE lane roll at chunk boundaries
  (which equals the periodic closure at lane 0 / C-1).

Reference semantics mirrored from /root/reference/triflow/core/compilers.py
(wrap vs edge padding, compilers.py:76-86) — re-architected for the TPU
memory system rather than translated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pcall(*args, **kw):
    """pallas_call with an env-controlled interpret switch (CPU testing)."""
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)

from .pallas_thomas import _inv, _mm, _mv, row_block


class FoldPlan(NamedTuple):
    N: int
    nvar: int
    halo: int
    g: int          # nodes per supernode = max(halo, 1)
    W: int          # band window
    C: int          # chunks (lane dim)
    Mc: int         # supernode rows per chunk
    K: int          # nodes per chunk = Mc * g
    cyclic_ok: bool  # C is a power of two -> periodic via cyclic reduced PCR

    @property
    def s(self):
        return self.nvar * self.g


def make_plan(N: int, nvar: int, halo: int, window: int):
    """Choose (C, Mc) for the folded layout, or None when N doesn't fold."""
    from .banded import _fused_chunk_plan, _CHUNK_MIN_M

    g = max(halo, 1)
    if N % g or nvar * g not in (1, 2, 4, 8):
        return None
    M = N // g
    if M < _CHUNK_MIN_M:
        return None
    plan = _fused_chunk_plan(M)
    if plan is None:
        return None
    C, Mc = plan
    return FoldPlan(N, nvar, halo, g, window, C, Mc, Mc * g,
                    C & (C - 1) == 0)


def fold(a, plan: FoldPlan):
    """(..., N) -> (..., K, C): lane dim = chunk index."""
    a = jnp.asarray(a)
    new = a.reshape(a.shape[:-1] + (plan.C, plan.K))
    return jnp.swapaxes(new, -1, -2)


def unfold(af, plan: FoldPlan):
    """(..., K, C) -> (..., N)."""
    af = jnp.asarray(af)
    a = jnp.swapaxes(af, -1, -2)
    return a.reshape(a.shape[:-2] + (plan.N,))


# ---------------------------------------------------------------------------
# stencil window machinery (shared by the folded F / J / matvec kernels)
# ---------------------------------------------------------------------------

def _pick_kb(K: int, per_row_bytes: int, budget: int = 2 << 20) -> int:
    """Largest divisor of K that is a multiple of 8 (or K itself) within the
    VMEM budget."""
    cap = max(8, budget // max(per_row_bytes, 1))
    if K <= cap:
        return K
    best = None
    for d in range(8, cap + 1, 8):
        if K % d == 0:
            best = d
    return best


def _lane_halo_window(cur, prev, nxt, h, periodic, tid, ntiles, C):
    """Assemble the (rows, Kb + 2h, C) haloed window of a (rows, Kb, C) tile.

    prev/nxt are the +-1 K-tiles (modular index maps).  On the first/last
    tile the out-of-chunk rows come from the neighboring LANE (the chunk
    boundary): roll the slab by one lane, which is exactly the periodic
    closure at the domain ends; edge mode clamps lane 0 / C-1 instead."""
    if h == 0:
        return cur
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]

    prev_tail = prev[..., -h:, :]
    # chunk-boundary variant: lane c reads lane c-1's last rows
    prev_wrap = jnp.roll(prev_tail, 1, axis=-1)
    if not periodic:
        # sublane-only broadcast of the first row; the where() reads it only
        # at lane 0, where it equals global node 0 (Mosaic cannot broadcast
        # in sublanes and lanes at once)
        edge = jnp.broadcast_to(cur[..., :1, :], prev_wrap.shape)
        prev_wrap = jnp.where(lane == 0, edge, prev_wrap)
    prev_tail = jnp.where(tid == 0, prev_wrap, prev_tail)

    nxt_head = nxt[..., :h, :]
    nxt_wrap = jnp.roll(nxt_head, -1, axis=-1)
    if not periodic:
        edge = jnp.broadcast_to(cur[..., -1:, :], nxt_wrap.shape)
        nxt_wrap = jnp.where(lane == C - 1, edge, nxt_wrap)
    nxt_head = jnp.where(tid == ntiles - 1, nxt_wrap, nxt_head)

    return jnp.concatenate([prev_tail, cur, nxt_head], axis=-2)


class _FoldedStencilCall:
    """Operand plumbing for the folded F / J / matvec kernels."""

    def __init__(self, backend, periodic, plan: FoldPlan, per_row_extra=0):
        self.backend = backend
        self.system = backend.system
        self.periodic = periodic
        self.plan = plan
        self.h = backend.halo
        self.nvar = self.system.nvar
        self.nhelp = len(self.system.help_funcs)
        self.npar = len(self.system.pars)
        self.dtype = backend.dtype
        item = jnp.dtype(self.dtype).itemsize
        rows = 4 * self.nvar + 3 * self.nhelp + self.npar + 1 + per_row_extra
        self.Kb = _pick_kb(plan.K, rows * plan.C * item)
        self.ntiles = None if self.Kb is None else plan.K // self.Kb

    def applicable(self):
        return self.Kb is not None and self.h < self.Kb

    def operands(self, uf, helpersf, pstackf, xf, dx):
        Kb, C = self.Kb, self.plan.C
        nt = self.ntiles

        def shifted(rows, s):
            return pl.BlockSpec(
                (rows, Kb, C),
                lambda i, s=s: (0, (i + s) % nt, 0),
                memory_space=pltpu.VMEM,
            )

        ops = [uf, uf, uf]
        specs = [shifted(self.nvar, -1), shifted(self.nvar, 0),
                 shifted(self.nvar, 1)]
        if self.nhelp:
            ops += [helpersf, helpersf, helpersf]
            specs += [shifted(self.nhelp, -1), shifted(self.nhelp, 0),
                      shifted(self.nhelp, 1)]
        if self.npar:
            ops.append(pstackf)
            specs.append(shifted(self.npar, 0))
        ops.append(xf)
        specs.append(pl.BlockSpec((Kb, C), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        ops.append(jnp.asarray(dx, self.dtype).reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        return ops, specs

    def build_args(self, refs):
        it = iter(refs)
        tid = pl.program_id(0)
        h, C, nt = self.h, self.plan.C, self.ntiles
        u_l, u_c, u_r = next(it)[...], next(it)[...], next(it)[...]
        u_win = _lane_halo_window(u_c, u_l, u_r, h, self.periodic, tid, nt, C)
        if self.nhelp:
            he_l, he_c, he_r = next(it)[...], next(it)[...], next(it)[...]
            he_win = _lane_halo_window(he_c, he_l, he_r, h, self.periodic,
                                       tid, nt, C)
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
        Kb = self.Kb
        args = [x_blk]
        for var, off in self.backend._offset_args:
            args.append(named[var][h + off: h + off + Kb, :])
        for idx in range(self.npar):
            args.append(ps[idx])
        args.append(dx)
        return args


def eval_F_folded(backend, uf, helpersf, pstackf, xf, dx, periodic, plan,
                  scale=None, bias=None):
    """F(u) in folded layout -> (nvar, K, C).

    With ``scale``/``bias`` the kernel emits ``scale * F(u) + bias``
    directly (the ROW stage RHS), fusing the stage-algebra axpy that would
    otherwise re-read F from HBM."""
    call = _FoldedStencilCall(backend, periodic, plan)
    nvar, dtype, Kb, C = call.nvar, call.dtype, call.Kb, plan.C
    has_scale = scale is not None
    has_bias = bias is not None

    def kernel(*refs):
        refs = list(refs)
        out_ref = refs.pop()
        bias_ref = refs.pop() if has_bias else None
        scale_ref = refs.pop() if has_scale else None
        args = call.build_args(refs)
        rows = [jnp.broadcast_to(jnp.asarray(fn(*args), dtype), (Kb, C))
                for fn in backend._F_fns]
        out = jnp.stack(rows)
        if has_scale:
            out = scale_ref[0, 0] * out
        if has_bias:
            out = out + bias_ref[...]
        out_ref[...] = out

    ops, specs = call.operands(uf, helpersf, pstackf, xf, dx)
    if has_scale:
        ops.append(jnp.asarray(scale, dtype).reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
    if has_bias:
        ops.append(bias)
        specs.append(pl.BlockSpec((nvar, Kb, C), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM))
    return _pcall(
        kernel,
        grid=(call.ntiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nvar, Kb, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, plan.K, C), dtype),
    )(*ops)


def eval_J_folded(backend, uf, helpersf, pstackf, xf, dx, periodic, plan):
    """Banded Jacobian in folded layout -> (W, nvar, nvar, K, C).

    ``bands[kb, m, n, k, c] = dF_m(node c*K+k)/du_n(node c*K+k + kb - h)``.
    Edge mode folds out-of-domain dependencies onto the boundary columns
    (global nodes live at (rows 0..h-1, lane 0) and (rows K-h.., lane C-1))."""
    call = _FoldedStencilCall(backend, periodic, plan,
                              per_row_extra=plan.W * backend.system.nvar ** 2)
    nvar, dtype, Kb, C = call.nvar, call.dtype, call.Kb, plan.C
    W = plan.W
    h = plan.halo
    nt = call.ntiles

    def kernel(*refs):
        out_ref = refs[-1]
        args = call.build_args(refs[:-1])
        tid = pl.program_id(0)
        krow = jax.lax.broadcasted_iota(jnp.int32, (Kb, C), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Kb, C), 1)
        zero = jnp.zeros((Kb, C), dtype)
        rows = {}
        for (m, n, kb), fn in backend._J_fns.items():
            rows[(kb, m, n)] = jnp.broadcast_to(
                jnp.asarray(fn(*args), dtype), (Kb, C))

        def get(kb, m, n):
            return rows.get((kb, m, n), zero)

        if not periodic:
            # left edge: global node i = k (row i, lane 0) on tile 0
            for m in range(nvar):
                for n in range(nvar):
                    for i in range(h):
                        for kb in range(h - i):
                            mask = (tid == 0) & (krow == i) & (lane == 0)
                            src = get(kb, m, n)
                            rows[(h - i, m, n)] = jnp.where(
                                mask, get(h - i, m, n) + src,
                                get(h - i, m, n))
                            rows[(kb, m, n)] = jnp.where(mask, 0.0, src)
                    for i in range(h):
                        for kb in range(h - i):
                            koff = W - 1 - kb
                            mask = ((tid == nt - 1) & (krow == Kb - 1 - i)
                                    & (lane == C - 1))
                            src = get(koff, m, n)
                            rows[(h + i, m, n)] = jnp.where(
                                mask, get(h + i, m, n) + src,
                                get(h + i, m, n))
                            rows[(koff, m, n)] = jnp.where(mask, 0.0, src)

        out_ref[...] = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack([get(kb, m, n) for n in range(nvar)])
                        for m in range(nvar)
                    ]
                )
                for kb in range(W)
            ]
        )

    ops, specs = call.operands(uf, helpersf, pstackf, xf, dx)
    return _pcall(
        kernel,
        grid=(nt,),
        in_specs=specs,
        out_specs=pl.BlockSpec((W, nvar, nvar, Kb, C),
                               lambda i: (0, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, nvar, nvar, plan.K, C), dtype),
    )(*ops)


def matvec_folded(bands_f, vf, periodic, plan):
    """(J @ v) with both operands in folded layout."""
    W, nvar = plan.W, plan.nvar
    h = plan.halo
    C = plan.C
    dtype = vf.dtype
    item = jnp.dtype(dtype).itemsize
    Kb = _pick_kb(plan.K, (4 * nvar + W * nvar * nvar) * C * item)
    nt = plan.K // Kb

    def shifted(rows, s):
        return pl.BlockSpec((rows, Kb, C), lambda i, s=s: (0, (i + s) % nt, 0),
                            memory_space=pltpu.VMEM)

    bspec = pl.BlockSpec((W, nvar, nvar, Kb, C), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM)

    def kernel(b_ref, v_l, v_c, v_r, out_ref):
        tid = pl.program_id(0)
        if h == 0:
            v_win = v_c[...]
        else:
            v_win = _lane_halo_window(v_c[...], v_l[...], v_r[...], h,
                                      periodic, tid, nt, C)
            if not periodic:
                # ghost columns contribute zero (edge-folded bands), so mask
                # the clamped window copies back to zero
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]
                head = jnp.where((tid == 0) & (lane == 0), 0.0,
                                 v_win[..., :h, :])
                tail = jnp.where((tid == nt - 1) & (lane == C - 1), 0.0,
                                 v_win[..., -h:, :])
                v_win = jnp.concatenate(
                    [head, v_win[..., h:-h, :], tail], axis=-2)
        rows = []
        for m in range(nvar):
            acc = None
            for kb in range(W):
                for n in range(nvar):
                    term = b_ref[kb, m, n] * v_win[n, kb: kb + Kb, :]
                    acc = term if acc is None else acc + term
            rows.append(acc)
        out_ref[...] = jnp.stack(rows)

    return _pcall(
        kernel,
        grid=(nt,),
        in_specs=[bspec, shifted(nvar, -1), shifted(nvar, 0),
                  shifted(nvar, 1)],
        out_specs=pl.BlockSpec((nvar, Kb, C), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, plan.K, C), dtype),
    )(bands_f, vf, vf, vf)


# ---------------------------------------------------------------------------
# fused assembly + factor sweeps reading folded bands
# ---------------------------------------------------------------------------

def _row_from_folded_bands(b_blk, alpha, beta, g, nvar, h, W, i, dblock,
                           C, dtype):
    """One supernode block row (s, s, C) from a (W, nvar, nvar, r*g, C) band
    tile at in-block row i: entry [a*nvar+m, b*nvar+n] =
    beta * band[h + (b-a) + dblock*g, m, n, i*g + a] (+ alpha on the diagonal
    for dblock == 0)."""
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
                        val = beta * b_blk[h + delta, m, n, i * g + a, :]
                        if dblock == 0 and a == bb and m == n:
                            val = val + alpha
                        row.append(val)
            rows.append(jnp.stack(row))
    return jnp.stack(rows)


def factor_sweeps_folded(bands_f, alpha, beta, plan: FoldPlan, cyclic: bool):
    """Factor sweeps reading the folded band array directly (no HBM-level
    chunk transpose).  With ``cyclic`` the wrap couplings of lane 0 / C-1
    stay in Tl/Tr so the reduced interface system is block-cyclic (periodic
    closure without any Woodbury correction; requires power-of-two C).

    Returns fac, Dhinv, Uc, W, V, DU (all (Mc, s, s, C)) plus Tl, Tr."""
    from .pallas_thomas import _bwd_factor_call

    W, nvar, g, C, Mc = plan.W, plan.nvar, plan.g, plan.C, plan.Mc
    h = plan.halo
    s = plan.s
    dtype = bands_f.dtype
    item = jnp.dtype(dtype).itemsize
    band_bytes = W * nvar * nvar * g * C * item
    blk_bytes = s * s * C * item
    # generous VMEM budget: the factor sweep is launch/latency-bound, so
    # bigger row blocks (fewer sequential grid steps) win as long as the
    # double-buffered blocks still fit VMEM (~16MB)
    r = row_block(Mc, band_bytes + 4 * blk_bytes, budget=6 * 1024 * 1024,
                  sub_unit=g)
    if not r:
        raise ValueError(
            f"no Mosaic-alignable row block for Mc={Mc}, g={g}")
    Nb = Mc // r
    band_blk = (W, nvar, nvar, r * g, C)
    blk = (r, s, s, C)

    def fwd_kernel(ab_ref, b_ref, fac_ref, Dhinv_ref, wt_ref, U_ref,
                   Tl_ref, Tr_ref, dhinv_c, uprev_c, wt_c):
        j = pl.program_id(0)
        Nb_n = pl.num_programs(0)
        alpha_v = ab_ref[0, 0]
        beta_v = ab_ref[0, 1]
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]

        @pl.when(j == 0)
        def _():
            dhinv_c[...] = jnp.zeros_like(dhinv_c)
            uprev_c[...] = jnp.zeros_like(uprev_c)
            wt_c[...] = jnp.zeros_like(wt_c)

        b_blk = b_ref[...]
        dhinv = dhinv_c[...]
        uprev = uprev_c[...]
        wt = wt_c[...]
        for i in range(r):
            L_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, -1, C, dtype)
            D_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, 0, C, dtype)
            U_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, 1, C, dtype)
            if i == 0:
                Tl = L_row if cyclic else jnp.where(iota_c == 0, 0.0, L_row)

                @pl.when(j == 0)
                def _(Tl=Tl):
                    Tl_ref[...] = Tl

                L_row = jnp.where(j == 0, 0.0, L_row)
            if i == r - 1:
                Tr = U_row if cyclic else jnp.where(iota_c == C - 1, 0.0,
                                                    U_row)

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
            pl.BlockSpec(band_blk, lambda j: (0, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s, C), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(ab, bands_f)

    if flat_solve_ok(plan, dtype):
        from .pallas_thomas import _bwd_factor_call_cols

        W_, V_, DU = _bwd_factor_call_cols(Dhinv, Uc, wt, Tr, Mc, s, C,
                                           dtype, r)
        return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr
    W_, V_, DU = _bwd_factor_call(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r)
    return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr


def flat_solve_ok(plan: FoldPlan, dtype) -> bool:
    """True when the nvar==1 flat-RHS solve path applies: spikes are stored
    column-split (s, K, C) and the per-stage solves run on (K, C) arrays
    with no relayout (pallas_thomas.chunked_solve_flat)."""
    if plan.nvar != 1:
        return False
    item = jnp.dtype(dtype).itemsize
    if plan.Mc * plan.s * plan.C * item > 6 * 1024 * 1024:
        return False
    blk_bytes = plan.s * plan.s * plan.C * item
    vec_bytes = plan.s * plan.C * item
    return bool(row_block(plan.Mc, 3 * blk_bytes + 2 * vec_bytes,
                          sub_unit=plan.s))


# ---------------------------------------------------------------------------
# folded factorization object + solve
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class FoldedFactorization:
    """Factorization of ``alpha*I + beta*J`` operating on folded-state RHS.
    ``wrap`` records whether the reduced interface system carries the
    periodic closure (ring rolls in the interface gather)."""

    def __init__(self, fac, Dhinv, DU, Wsp, Vsp, red, plan, wrap,
                 col_split=False):
        self.fac = fac
        self.Dhinv = Dhinv
        self.DU = DU
        self.Wsp = Wsp                # (Mc,s,s,C), or (s,K,C) if col_split
        self.Vsp = Vsp
        self.red = red
        self.plan = plan
        self.wrap = wrap
        self.col_split = col_split

    # kept for older call sites that still read .cyclic
    @property
    def cyclic(self):
        return self.wrap

    def tree_flatten(self):
        return ((self.fac, self.Dhinv, self.DU, self.Wsp, self.Vsp,
                 self.red), (self.plan, self.wrap, self.col_split))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    def solve(self, rhs_f):
        return solve_folded(self, rhs_f)


@jax.tree_util.register_pytree_node_class
class WrappedPcr:
    """Acyclic PCR factorization of the reduced interface system plus a
    rank-2s Woodbury correction restoring the periodic corner couplings —
    the periodic closure for NON-power-of-two chunk counts, applied to the
    (2s, C) interface system instead of the full (nvar, K, C) state (the
    wrap couples only interface unknowns, so correcting the tiny reduced
    system is equivalent to correcting the full one at ~Mc times less
    work)."""

    def __init__(self, red0, Z, cap_inv, s):
        self.red0 = red0
        self.Z = Z                    # (2s, 2s, C): A0^-1 @ Uw columns
        self.cap_inv = cap_inv        # (2s, 2s)
        self.s = s

    def tree_flatten(self):
        return ((self.red0, self.Z, self.cap_inv), (self.s,))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    def _vt(self, y):
        # v_i^T y: i < s selects y[s+i] at lane C-1, i >= s selects y[i-s]
        # at lane 0
        s = self.s
        return jnp.concatenate([y[..., s:, -1], y[..., :s, 0]], axis=-1)

    def solve(self, b):
        from .banded import _pcr_solve

        y = _pcr_solve(self.red0, b)
        coef = jnp.einsum("ij,...j->...i", self.cap_inv, self._vt(y))
        return y - jnp.tensordot(coef, self.Z, axes=([-1], [0]))


def _reduced_LU(Wsp, Vsp, plan: FoldPlan, col_split: bool):
    """Assemble the reduced-system L/U blocks (2s, 2s, C) by stacking lane
    rows straight off the spike arrays.  No transposes, no scatter updates:
    transpose-fed dynamic-update-slices made XLA pick a lanes-last layout
    for these tiny arrays, costing ~2.6ms/step in relayouts."""
    s, C, K = plan.s, plan.C, plan.K
    d2 = 2 * s
    dtype = Wsp.dtype
    zero = jnp.zeros((C,), dtype)

    def w_entry(first, a, b):
        if col_split:
            return Wsp[b, a] if first else Wsp[b, K - s + a]
        return Wsp[0, a, b] if first else Wsp[-1, a, b]

    def v_entry(first, a, b):
        if col_split:
            return Vsp[b, a] if first else Vsp[b, K - s + a]
        return Vsp[0, a, b] if first else Vsp[-1, a, b]

    Lred = jnp.stack([
        jnp.stack([w_entry(a < s, a % s, b - s) if b >= s else zero
                   for b in range(d2)])
        for a in range(d2)
    ])
    Ured = jnp.stack([
        jnp.stack([v_entry(a < s, a % s, b) if b < s else zero
                   for b in range(d2)])
        for a in range(d2)
    ])
    return Lred, Ured


def _reduced_factor(Lred, Ured, C, s, cyclic, wrap=False):
    """PCR factorization of the chunk-interface system (supernode c =
    (x_c^top, x_c^bot), size 2s) from the assembled L/U blocks.  With
    ``cyclic`` the ring couplings stay (block-cyclic PCR over power-of-two
    C).  With ``wrap`` (and not cyclic, i.e. periodic closure at
    non-power-of-two C) the ring couplings are restored by a rank-2s
    Woodbury correction on this reduced system."""
    from .banded import _pcr_factor, _pcr_solve, _small_inv

    d2 = 2 * s
    dtype = Lred.dtype
    Dred = jnp.broadcast_to(jnp.eye(d2, dtype=dtype)[..., None], Lred.shape)
    if cyclic:
        return _pcr_factor(Lred, Dred, Ured, cyclic=True)
    lane = jnp.arange(C)
    corner_L = Lred[..., 0]                      # only columns s: nonzero
    corner_U = Ured[..., C - 1]                  # only columns :s nonzero
    Lred = jnp.where(lane == 0, 0.0, Lred)
    Ured = jnp.where(lane == C - 1, 0.0, Ured)
    red0 = _pcr_factor(Lred, Dred, Ured, cyclic=False)
    if not wrap:
        return red0
    # Woodbury columns: u_j = e_lane0 (x) corner_L[:, s+j]  (j <  s)
    #                   u_j = e_laneE (x) corner_U[:, j-s]  (j >= s)
    top = jnp.concatenate(
        [jnp.moveaxis(corner_L[:, s:], -1, 0),            # (s, d2)
         jnp.zeros((s, d2), dtype)], axis=0)              # -> (d2, d2)
    bot = jnp.concatenate(
        [jnp.zeros((s, d2), dtype),
         jnp.moveaxis(corner_U[:, :s], -1, 0)], axis=0)
    rhs = (jnp.where(lane == 0, top[:, :, None], 0.0)
           + jnp.where(lane == C - 1, bot[:, :, None], 0.0))
    Z = _pcr_solve(red0, rhs)                    # (2s, 2s, C)
    # cap[i, j] = delta_ij + v_i^T Z_j
    vtz = jnp.concatenate([Z[..., s:, -1], Z[..., :s, 0]], axis=-1)  # (j, i)
    cap = jnp.eye(d2, dtype=dtype) + vtz.T
    cap_inv = (_small_inv(cap[..., None])[..., 0]
               if d2 in (2, 4, 8) else jnp.linalg.inv(cap))
    return WrappedPcr(red0, Z, cap_inv, s)


def factor_folded(alpha, beta, bands_f, periodic, plan: FoldPlan):
    """Factor ``alpha*I + beta*J`` from folded bands.

    Periodic closure lives entirely in the reduced interface system (the
    wrap couples only interface unknowns): block-cyclic reduced PCR when C
    is a power of two, else acyclic reduced PCR + rank-2s Woodbury on the
    reduced system (WrappedPcr).  No full-state correction is ever needed."""
    wrap = bool(periodic) and plan.halo > 0
    fac, Dhinv, Uc, Wsp, Vsp, DU, Tl, Tr = factor_sweeps_folded(
        bands_f, alpha, beta, plan, wrap)
    cyclic = wrap and plan.cyclic_ok
    col_split = flat_solve_ok(plan, bands_f.dtype)
    Lred, Ured = _reduced_LU(Wsp, Vsp, plan, col_split)
    red = _reduced_factor(Lred, Ured, plan.C, plan.s, cyclic, wrap=wrap)
    return FoldedFactorization(fac, Dhinv, DU, Wsp, Vsp, red, plan, wrap,
                               col_split)


def solve_folded(fact: FoldedFactorization, bf):
    """Solve with folded RHS bf (..., nvar, K, C) -> same shape."""
    plan = fact.plan
    nvar, g, s, Mc, C, K = (plan.nvar, plan.g, plan.s, plan.Mc, plan.C,
                            plan.K)
    from .banded import _pcr_solve
    from .pallas_thomas import chunked_solve_sweeps

    batch = bf.shape[:-3]
    if fact.col_split and bf.ndim == 3:
        return _solve_folded_flat(fact, bf)
    # folded -> chunk rows: (..., nvar, Mc, g, C) -> (Mc, ..., s, C)
    bc = bf.reshape(batch + (nvar, Mc, g, C))
    if nvar == 1:
        bc = jnp.moveaxis(bc[..., 0, :, :, :], -3, 0)  # (Mc, ..., g(=s), C)
    else:
        bc = jnp.moveaxis(bc, (-3, -2, -4), (0, 1, 2))  # (Mc, g, nvar, ...)
        bc = jnp.moveaxis(bc.reshape((Mc, s) + batch + (C,)), 1, -2)
    y = chunked_solve_sweeps(fact.fac, fact.Dhinv, fact.DU, bc)

    yred = jnp.concatenate([y[0], y[-1]], axis=-2)
    if isinstance(fact.red, WrappedPcr):
        z = fact.red.solve(yred)
    else:
        z = _pcr_solve(fact.red, yred)
    ztop, zbot = z[..., :s, :], z[..., s:, :]
    if fact.wrap:
        xm1_bot = jnp.roll(zbot, 1, axis=-1)
        xp1_top = jnp.roll(ztop, -1, axis=-1)
    else:
        xm1_bot = jnp.concatenate(
            [jnp.zeros_like(zbot[..., :1]), zbot[..., :-1]], axis=-1)
        xp1_top = jnp.concatenate(
            [ztop[..., 1:], jnp.zeros_like(ztop[..., :1])], axis=-1)
    Wb, Vb = fact.Wsp, fact.Vsp
    if fact.col_split:
        # batched fallback through col-split spikes: rebuild block form
        Wb = jnp.moveaxis(Wb.reshape(s, Mc, s, C), 0, 2)
        Vb = jnp.moveaxis(Vb.reshape(s, Mc, s, C), 0, 2)
    extra = y.ndim - 3
    if extra > 0:
        expand = (slice(None),) + (None,) * extra
        Wb = Wb[expand]
        Vb = Vb[expand]
    x = y - _mv(Wb, xm1_bot) - _mv(Vb, xp1_top)

    # chunk rows -> folded
    if nvar == 1:
        xf = jnp.moveaxis(x, 0, -3).reshape(batch + (1, K, C))
    else:
        x = jnp.moveaxis(x, -2, 1).reshape((Mc, g, nvar) + batch + (C,))
        x = jnp.moveaxis(x, (0, 1, 2), (-3, -2, -4))
        xf = x.reshape(batch + (nvar, K, C))
    return xf


def _solve_folded_flat(fact: FoldedFactorization, bf):
    """nvar==1 fast path: the Thomas sweeps, interface gather and spike
    correction all run on the (K, C) folded layout directly — no
    (Mc, s, C) relayout of the RHS or solution."""
    from .banded import _pcr_solve
    from .pallas_thomas import chunked_solve_flat

    plan = fact.plan
    s = plan.s
    y = chunked_solve_flat(fact.fac, fact.Dhinv, fact.DU, bf[0])
    yred = jnp.concatenate([y[:s], y[-s:]], axis=-2)       # (2s, C)
    from . import pallas_pcr

    shifted = pallas_pcr.interface_shift_solve(fact.red, yred, fact.wrap)
    if shifted is not None:
        xm1_bot, xp1_top = shifted
    else:
        if isinstance(fact.red, WrappedPcr):
            z = fact.red.solve(yred)
        else:
            z = _pcr_solve(fact.red, yred)
        ztop, zbot = z[:s], z[s:]
        if fact.wrap:
            xm1_bot = jnp.roll(zbot, 1, axis=-1)
            xp1_top = jnp.roll(ztop, -1, axis=-1)
        else:
            xm1_bot = jnp.concatenate(
                [jnp.zeros_like(zbot[..., :1]), zbot[..., :-1]], axis=-1)
            xp1_top = jnp.concatenate(
                [ztop[..., 1:], jnp.zeros_like(ztop[..., :1])], axis=-1)
    corr = None
    for b in range(s):
        t = fact.Wsp[b] * xm1_bot[b] + fact.Vsp[b] * xp1_top[b]
        corr = t if corr is None else corr + t
    return (y - corr)[None]


# ---------------------------------------------------------------------------
# scheme integration
# ---------------------------------------------------------------------------

def folded_plan_for(backend, u, x):
    """FoldPlan when the folded hot path applies to this state, else None."""
    if u.ndim != 2 or x.ndim != 1:
        return None
    return plan_for_backend(backend, x.shape[-1])


def plan_for_backend(backend, N):
    """FoldPlan when the folded hot path applies for this backend at grid
    size N (TPU or the interpret test switch; foldable N; workable stencil
    tiling and Mosaic-alignable factor row block), else None."""
    import os

    if os.environ.get("TRIFLOW_NO_PALLAS") or os.environ.get(
            "TRIFLOW_NO_FOLDED"):
        return None
    if not os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:  # pragma: no cover
            return None
    plan = make_plan(N, backend.system.nvar, backend.halo, backend.window)
    if plan is None:
        return None
    call = _FoldedStencilCall(backend, True, plan,
                              per_row_extra=plan.W * plan.nvar ** 2)
    if not call.applicable():
        return None
    # the factor kernel blocks the folded bands with (r*g, C) tiles: an
    # 8-aligned row block must exist
    item = jnp.dtype(backend.dtype).itemsize
    band_bytes = plan.W * plan.nvar ** 2 * plan.g * plan.C * item
    blk_bytes = plan.s * plan.s * plan.C * item
    if not row_block(plan.Mc, band_bytes + 4 * blk_bytes, sub_unit=plan.g):
        return None
    return plan
