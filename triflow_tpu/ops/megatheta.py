"""Grid-blocked whole-step theta kernel: two HBM passes per implicit step.

The large-N theta step (Burgers backward-Euler at N=1e6, BASELINE config 2)
was measured at ~50% of the no-reuse HBM roofline through the grid kernels:
the remaining traffic is the step's own materialization — the factor rows
(fac/Dhinv/DU, ~24 MB written once and re-read by the sweeps), the rhs
between the F kernel and the solve, and the forward-sweep intermediate
(BASELINE.md §Roofline).  The single-launch whole-step kernel
(ops/megastep.py) removes all of it but is gated to ONE 128-lane tile
(straight-line slab code SIGABRTs Mosaic past C8 = 128), which caps it at
small N.

This module is the grid-blocked statement of the same idea (VERDICT r4
next-round #3): a Pallas grid over 128-lane chunk tiles, each tile running
the ENTIRE local solve — band evaluation, fused factor + data Thomas
sweeps, spike columns — on VMEM-resident rows, in TWO passes:

* **interface pass** — per tile: J, factor, rhs = dt*F, forward+backward
  sweeps; emits ONLY the tiny chunk-interface quantities (y first/last
  rows, spike first/last blocks) — ~2s*C values instead of the ~6 state-
  size arrays the kernel-granular path writes;
* **reduced solve** — the standard chunk-interface machinery
  (ops/folded._reduced_factor: acyclic PCR + the rank-2s Woodbury wrap)
  on the gathered (2s, 8, C8) system, outside the tiles;
* **correction pass** — per tile: RECOMPUTE J/factor/rhs/sweeps (flops
  are ~free at this arithmetic intensity; bytes are not) and apply the
  spike correction + the theta state add, emitting u2.

HBM traffic: 2x(u + x + p reads) + 1 u2 write ~ 7 state passes (~28 MB at
N=1e6) vs ~15 through the kernel-granular path (~60 MB) — the factor, rhs
and intermediate never touch HBM.

Applicability (v1): periodic closure, no helper functions, single member,
halo < K.  Anything else falls back to the grid kernels unchanged.

Reference analog: none (the reference's step is SuperLU calls,
/root/reference/triflow/core/schemes.py:553-557); this is the TPU
statement of "an implicit step should cost two memory passes".
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded import FoldPlan, _ring_shift
from .pallas_thomas import _inv_t, _mm_t, _mv_t
from .folded import _row_from_folded_bands


def _pcall(*args, **kw):
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    else:
        from .pallas_thomas import _VMEM_LIMIT
        if _VMEM_LIMIT:
            kw.setdefault("compiler_params",
                          pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    return pl.pallas_call(*args, **kw)


_LB = 128          # minimum lane-tile width (one native lane tile)


def plan_for(backend, N: int):
    """(FoldPlan, Lb) for the two-pass kernel, or None.

    The serial cost per pass is ntiles * Mc * ~17 chained vector ops =
    ~(M / (8 * Lb)) * 17 — only the lane-tile width Lb buys depth, so the
    picker maximizes Lb (and the chunk count C) subject to the per-tile
    VMEM budget; C = M/Mc real chunks with no dead padding (Cp == C keeps
    the lane ring a true periodic ring)."""
    if os.environ.get("TRIFLOW_NO_MEGATHETA") or os.environ.get(
            "TRIFLOW_NO_PALLAS"):
        return None
    if not os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:  # pragma: no cover
            return None
        if jnp.dtype(backend.dtype) != jnp.float32:
            return None
    system = backend.system
    if len(system.help_funcs):
        return None                      # v1: no helper-function models
    g = max(backend.halo, 1)
    if N % g:
        return None
    M = N // g
    item = jnp.dtype(backend.dtype).itemsize
    npar = len(system.pars)
    nvar = system.nvar
    s = nvar * g
    if s > 2:
        return None                      # per-tile block rows stay tiny
    W = backend.window
    budget = int(os.environ.get("TRIFLOW_MEGATHETA_MB", 8)) << 20
    force_lb = int(os.environ.get("TRIFLOW_MEGATHETA_LB", 0))
    force_mc = int(os.environ.get("TRIFLOW_MEGATHETA_MC", 0))
    best = None
    for Lb in ((force_lb,) if force_lb else (512, 384, 256, 128)):
        for Mc in range(4, 513):
            if force_mc and Mc != force_mc:
                continue
            if M % Mc:
                continue
            C = M // Mc
            if C % 8:
                continue                 # Cp == C: no dead chunks
            C8 = C // 8
            if C8 < Lb or C > 65536:
                continue
            K = Mc * g
            if backend.halo >= K:
                continue
            tile = 8 * Lb * item
            est = ((W * nvar ** 2 + 3 * nvar + npar + 2) * K * tile
                   + 4 * Mc * s * s * tile + 4 * Mc * s * tile)
            if est > budget:
                continue
            ntiles = -(-C8 // Lb)
            score = (ntiles * Mc, C)     # serial depth first
            if best is None or score < best[0]:
                best = (score, C, Mc, K, Lb)
    if best is None:
        return None
    _, C, Mc, K, Lb = best
    plan = FoldPlan(N, nvar, backend.halo, g, W,
                    C, Mc, K, C & (C - 1) == 0 and C >= 8)
    return plan, Lb


def applicable(backend, plan: FoldPlan | None, periodic: bool) -> bool:
    return (plan is not None and bool(periodic)
            and not len(backend.system.help_funcs))


# ---------------------------------------------------------------------------
# per-tile pieces
# ---------------------------------------------------------------------------

def _tile_args(backend, u_win, x_blk, p_blk, dx, K, h):
    """Stencil args from a pre-windowed tile (the ring shifts happened in
    XLA on thin slabs — no cross-tile logic in the kernel)."""
    named = {}
    for idx, name in enumerate(backend.system.dep_vars):
        named[name] = u_win[idx]
    args = [x_blk]
    for var, off in backend._offset_args:
        args.append(named[var][h + off: h + off + K])
    for idx in range(len(backend.system.pars)):
        args.append(p_blk[idx])
    args.append(dx)
    return args


def _tile_rows(backend, args, K, dtype, lb):
    """(F rows, band rows) for one tile from built stencil args."""
    space = (K, 8, lb)
    F = jnp.stack([jnp.broadcast_to(jnp.asarray(fn(*args), dtype), space)
                   for fn in backend._F_fns])
    bands = {}
    for (m, n, kb), fn in backend._J_fns.items():
        bands[(kb, m, n)] = jnp.broadcast_to(
            jnp.asarray(fn(*args), dtype), space)
    W, nvar = backend.window, backend.system.nvar
    zero = jnp.zeros(space, dtype)
    b = jnp.stack([
        jnp.stack([
            jnp.stack([bands.get((kb, m, n), zero) for n in range(nvar)])
            for m in range(nvar)
        ])
        for kb in range(W)
    ])
    return F, b


def _to_rows_tile(v, plan: FoldPlan):
    nvar, g, Mc = plan.nvar, plan.g, plan.Mc
    rows = []
    for i in range(Mc):
        blk = [v[m, i * g + a] for a in range(g) for m in range(nvar)]
        rows.append(jnp.stack(blk))
    return rows


def _from_rows_tile(xs, plan: FoldPlan):
    nvar, g, Mc = plan.nvar, plan.g, plan.Mc
    chans = []
    for m in range(nvar):
        parts = [xs[i][a * nvar + m] for i in range(Mc) for a in range(g)]
        chans.append(jnp.stack(parts))
    return jnp.stack(chans)


def _tile_solve(backend, plan: FoldPlan, bands, rhs, beta, dtype, lb):
    """Fused factor + data Thomas sweeps + spike columns for one tile
    (periodic: the chunk couplings Tl/Tr stay whole — the reduced
    interface system owns them).  Returns (ys, Ws, Vs) row lists."""
    Mc, g, nvar, h, W, s = (plan.Mc, plan.g, plan.nvar, plan.halo,
                            plan.W, plan.s)
    space = (8, lb)
    one = jnp.ones((), dtype)
    zero_blk = jnp.zeros((s, s) + space, dtype)
    rhs_rows = _to_rows_tile(rhs, plan)

    dhinv = zero_blk
    uprev = zero_blk
    wt = zero_blk
    bt = jnp.zeros((s,) + space, dtype)
    Dhs, Us, wts, bts = [], [], [], []
    Tl = Tr = zero_blk
    for i in range(Mc):
        L = _row_from_folded_bands(bands, one, beta, g, nvar, h, W,
                                   i, -1, space, dtype)
        D = _row_from_folded_bands(bands, one, beta, g, nvar, h, W,
                                   i, 0, space, dtype)
        U = _row_from_folded_bands(bands, one, beta, g, nvar, h, W,
                                   i, 1, space, dtype)
        if i == 0:
            Tl = L
            L = zero_blk
        if i == Mc - 1:
            Tr = U
            U = zero_blk
        fac = _mm_t(L, dhinv, 2)
        dhinv = _inv_t(D - _mm_t(fac, uprev, 2), 2)
        wt = Tl if i == 0 else -_mm_t(fac, wt, 2)
        bt = rhs_rows[i] - _mv_t(fac, bt, 2)
        Dhs.append(dhinv)
        Us.append(U)
        wts.append(wt)
        bts.append(bt)
        uprev = U

    w = zero_blk
    v = zero_blk
    y = jnp.zeros((s,) + space, dtype)
    Ws = [None] * Mc
    Vs = [None] * Mc
    ys = [None] * Mc
    for i in reversed(range(Mc)):
        DU = _mm_t(Dhs[i], Us[i], 2)
        bV = Tr if i == Mc - 1 else zero_blk
        w = _mm_t(Dhs[i], wts[i], 2) - _mm_t(DU, w, 2)
        v = _mm_t(Dhs[i], bV, 2) - _mm_t(DU, v, 2)
        y = _mv_t(Dhs[i], bts[i], 2) - _mv_t(DU, y, 2)
        Ws[i] = w
        Vs[i] = v
        ys[i] = y
    return ys, Ws, Vs


def _operands(backend, plan, uf, pf, xf, prev, nxt, scalars, lb):
    """(ops, specs) shared by both passes: lane-tiled blocks of the state,
    params, x, plus the XLA-prepared thin halo slabs and SMEM scalars."""
    nvar, K, h = plan.nvar, plan.K, plan.halo
    npar = len(backend.system.pars)

    def lane_blk(rows_shape):
        nd = len(rows_shape)
        return pl.BlockSpec(
            rows_shape + (8, lb),
            lambda t, nd=nd: (0,) * nd + (0, t),
            memory_space=pltpu.VMEM)

    ops = [uf, prev, nxt, xf]
    specs = [lane_blk((nvar, K)), lane_blk((nvar, h)), lane_blk((nvar, h)),
             lane_blk((K,))]
    if npar:
        ops.append(pf)
        specs.append(lane_blk((npar, K)))
    ops.append(scalars)
    specs.append(pl.BlockSpec((1, 3), lambda t: (0, 0),
                              memory_space=pltpu.SMEM))
    return ops, specs, lane_blk


def theta_step_tiled(backend, plan: FoldPlan, theta, periodic,
                     uf, hf, pf, xf, dx, dt, lb=_LB):
    """One linearized theta step u2 = u + (I - theta*dt*J)^-1 (dt*F) in two
    grid-blocked passes + the reduced interface solve, or None when the
    path does not apply.  ``uf``/``pf``/``xf`` are in the standard folded
    layout of ``plan``; returns uf2 (same layout)."""
    from . import folded as fl

    if not applicable(backend, plan, periodic):
        return None
    dtype = backend.dtype
    nvar, K, h, s = plan.nvar, plan.K, plan.halo, plan.s
    C8 = plan.C8
    T = -(-C8 // lb)

    # thin halo slabs, ring-shifted in XLA (the true periodic ring — the
    # kernels never reason about chunk adjacency)
    prev = _ring_shift(uf[:, K - h:], 1, plan)
    nxt = _ring_shift(uf[:, :h], -1, plan)
    scalars = jnp.stack([
        -jnp.asarray(theta, dtype) * jnp.asarray(dt, dtype),
        jnp.asarray(dx, dtype),
        jnp.asarray(dt, dtype),
    ]).reshape(1, 3)

    def tile_core(refs):
        it = iter(refs)
        u_blk = next(it)[...]
        prev_blk = next(it)[...]
        nxt_blk = next(it)[...]
        x_blk = next(it)[...]
        p_blk = next(it)[...] if len(backend.system.pars) else None
        sc = next(it)
        beta = sc[0, 0]
        dxv = sc[0, 1]
        dt_v = sc[0, 2]
        u_win = jnp.concatenate([prev_blk, u_blk, nxt_blk], axis=1)
        args = _tile_args(backend, u_win, x_blk, p_blk, dxv, K, h)
        F, bands = _tile_rows(backend, args, K, dtype, lb)
        ys, Ws, Vs = _tile_solve(backend, plan, bands, dt_v * F, beta,
                                 dtype, lb)
        return u_blk, ys, Ws, Vs

    # ---- pass 1: interface quantities only -------------------------------
    def kernel_a(*refs):
        (y0_ref, yl_ref, w0_ref, wl_ref, v0_ref, vl_ref) = refs[-6:]
        _u, ys, Ws, Vs = tile_core(refs[:-6])
        y0_ref[...] = ys[0]
        yl_ref[...] = ys[-1]
        w0_ref[...] = Ws[0]
        wl_ref[...] = Ws[-1]
        v0_ref[...] = Vs[0]
        vl_ref[...] = Vs[-1]

    ops, specs, lane_blk = _operands(backend, plan, uf, pf, xf, prev, nxt,
                                     scalars, lb)
    svec = lane_blk((s,))
    sblk = lane_blk((s, s))
    y0, yl, W0, Wl, V0, Vl = _pcall(
        kernel_a,
        grid=(T,),
        in_specs=specs,
        out_specs=[svec, svec, sblk, sblk, sblk, sblk],
        out_shape=[jax.ShapeDtypeStruct((s, 8, C8), dtype)] * 2
        + [jax.ShapeDtypeStruct((s, s, 8, C8), dtype)] * 4,
    )(*ops)

    # ---- reduced interface system (standard machinery, tiny arrays) ------
    d2 = 2 * s
    zero = jnp.zeros((8, C8), dtype)
    Lred = jnp.stack([
        jnp.stack([(W0 if a < s else Wl)[a % s, b - s] if b >= s else zero
                   for b in range(d2)])
        for a in range(d2)
    ])
    Ured = jnp.stack([
        jnp.stack([(V0 if a < s else Vl)[a % s, b] if b < s else zero
                   for b in range(d2)])
        for a in range(d2)
    ])
    wrap = bool(periodic) and h > 0
    red = fl._reduced_factor(Lred, Ured, plan,
                             cyclic=wrap and plan.cyclic_ok, wrap=wrap)
    yred = jnp.concatenate([y0, yl], axis=0)
    if isinstance(red, fl.WrappedPcr):
        z = red.solve(yred)
    else:
        z = fl._red_solve(red, yred)
    xm1 = _ring_shift(z[s:], 1, plan)
    xp1 = _ring_shift(z[:s], -1, plan)

    # ---- pass 2: recompute + correct + theta add -------------------------
    def kernel_b(*refs):
        out_ref = refs[-1]
        xm1_blk = refs[-3][...]
        xp1_blk = refs[-2][...]
        u_blk, ys, Ws, Vs = tile_core(refs[:-3])
        u_rows = _to_rows_tile(u_blk, plan)
        xs = [u_rows[i] + ys[i] - _mv_t(Ws[i], xm1_blk, 2)
              - _mv_t(Vs[i], xp1_blk, 2)
              for i in range(plan.Mc)]
        out_ref[...] = _from_rows_tile(xs, plan)

    ops_b = ops + [xm1, xp1]
    specs_b = specs + [svec, svec]
    uf2 = _pcall(
        kernel_b,
        grid=(T,),
        in_specs=specs_b,
        out_specs=lane_blk((nvar, K)),
        out_shape=jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
    )(*ops_b)
    return uf2
