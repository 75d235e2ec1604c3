"""Single-launch whole-step kernel: one implicit step = ONE ``pallas_call``.

At small grid sizes the folded step is launch-bound, not compute- or
bandwidth-bound: the N=1e4 KS RODASPR step compiles to 28 ``pallas_call``s
plus ~84 XLA fusions, ~0.7us of fixed per-op overhead each — 78us/step
measured, vs 22us through this kernel.  Measured floor (round 3, same
N=1e4 plan Mc=10/9 PCR levels): a theta step (s=1) runs 8.4us and each
ADDITIONAL Rosenbrock stage adds 2.7us — the stages are data-dependent, so
their sweep-row + PCR-level serial chains cannot overlap, and a 6-stage
RODASPR step bottoms out at ~8.4 + 5 x 2.7 = 22us.  (An earlier revision
of this docstring claimed "~10us possible" from the arithmetic count
alone; that bound ignored the per-stage serial depth and was wrong —
BASELINE.md §Small-N records the measurement.)  When the
whole working set (state, stage vectors, factorization, reduced interface
operators) fits VMEM at once, the entire Rosenbrock-Wanner (or theta) step
— banded-Jacobian evaluation, fused assembly+factor Thomas sweeps, reduced
interface PCR (cyclic, Woodbury-wrapped, or acyclic), every stage's stencil
RHS + solve, and the final stage combination with the embedded error —
runs inside a single kernel with zero HBM round-trips between phases.

This is the same algorithm as ops/folded.py (bit-comparable numerics: the
factor/solve/PCR bodies are the shared value-level helpers), re-plumbed at
value level instead of grid-blocked refs.  It extends the folded hot path
DOWN in N: the folded chunk plans gate at M >= 1024 supernodes, while the
whole-step kernel serves any foldable N whose footprint fits
(``small_plan_for``), e.g. the BASELINE config-1 advection-diffusion grid
at N=200.

Reference analog: none — the reference pays a Python -> SuperLU round trip
per stage (/root/reference/triflow/core/schemes.py:148-163); this is the
TPU statement of "a small implicit step should cost one kernel launch".
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .folded import (
    FoldPlan,
    _chunk_halo_window,
    _dead_mask,
    _j_rows_values,
    _member_masks,
    _ring_shift,
    _row_from_folded_bands,
)
from .pallas_pcr import _c_iota, _inv2, _levels, _mm2, _mv2, _roll_c
from .pallas_thomas import _inv_t, _mm_t, _mv_t


def _pcall(*args, **kw):
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    else:
        from .pallas_thomas import _VMEM_LIMIT
        if _VMEM_LIMIT:
            kw.setdefault("compiler_params",
                          pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    return pl.pallas_call(*args, **kw)


# ---------------------------------------------------------------------------
# applicability gates
# ---------------------------------------------------------------------------

#: unroll budget: every factor/solve sweep row is a Python-unrolled group of
#: small block ops; past ~32 rows the kernel's instruction count (and Mosaic
#: compile time) grows without buying anything — larger problems already run
#: at the bandwidth bound on the grid-blocked kernels.
_MC_CAP = int(os.environ.get("TRIFLOW_MEGA_MC_CAP", 32))


def _vmem_estimate(backend, plan: FoldPlan, n_stages: int) -> int:
    """Rough peak-VMEM bytes of the whole-step kernel body: the band tile,
    the factor row arrays, the live stage vectors, the reduced-PCR level
    operators and the stencil halo windows."""
    item = jnp.dtype(backend.dtype).itemsize
    nvar, W, s = plan.nvar, plan.W, plan.s
    vec = plan.K * plan.Cp * item                       # one (K, 8, C8) slab
    bands = W * nvar * nvar * vec
    factor = 7 * plan.Mc * s * s * plan.Cp * item       # fac/Dhinv/U/wt/W/V/DU
    stages = (n_stages + 4) * nvar * vec                # us + u_i/rhs temps
    nlev = len(_levels(plan.Cmm))
    red_blk = (2 * s) * (2 * s) * plan.Cp * item
    reduced = (2 * nlev + 8) * red_blk
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)
    windows = (3 * nvar + 3 * nhelp + npar + 1) * vec
    return bands + factor + stages + reduced + windows


def applicable(backend, plan: FoldPlan, n_stages: int) -> bool:
    """True when the whole-step kernel can serve this plan."""
    if os.environ.get("TRIFLOW_NO_MEGA") or os.environ.get(
            "TRIFLOW_NO_PALLAS"):
        return False
    if plan is None:
        return False
    if plan.Mc > _MC_CAP or plan.s > 4 or plan.Mc < 2:
        return False
    if plan.C8 > 128:
        # one lane tile only: straight-line (8, C8) slab code with lane
        # rolls/segment reductions trips a Mosaic internal check
        # ("limits[i] <= dim(i)") once the chunk-lane axis spans multiple
        # 128-lane tiles — measured SIGABRT at C8=132+, clean at C8<=128.
        # The planners' accept callback steers to a deeper Mc split
        # (larger Mc -> fewer chunks -> narrower lanes) when one exists.
        return False
    budget = int(os.environ.get("TRIFLOW_MEGA_BUDGET_MB", 6)) << 20
    if plan.B > 1:
        # member-partitioned kernels carry the per-member Woodbury's
        # broadcast slabs and elementwise capacitance: measured compile
        # failure (VMEM overflow SIGABRT) at ~4.5MB estimated, so gate
        # ensembles tighter than the single-member 6MB budget
        budget = min(budget,
                     int(os.environ.get("TRIFLOW_MEGA_ENS_BUDGET_MB",
                                        3)) << 20)
    return _vmem_estimate(backend, plan, n_stages) <= budget


def mega_step_cost_us(plan: FoldPlan, n_stages: int) -> float:
    """Rough wall microseconds of ONE whole-step kernel invocation (used
    by the ensemble group picker to weigh a single-launch mega group
    against the grid-kernel path).  The kernel is issue/depth-bound: cost
    scales with the sweep rows and reduced-PCR levels per stage.  Fit to
    measured points (N=1e4 single member Mc=10/9 levels: 25.9us; ensemble
    groups Mc=10/4 levels: ~17us)."""
    nlev = len(_levels(plan.Cmm))
    return 0.65 * n_stages * (1.0 + 0.25 * plan.Mc + 0.35 * nlev)


def small_plan_for(backend, N: int) -> FoldPlan | None:
    """FoldPlan for grids BELOW the chunked-solver gate (M < 1024
    supernodes), where the whole-step kernel is the only folded consumer:
    pick the divisor split with the fewest sweep rows (Mc smallest >= 2) so
    the sequential depth — the only O(Mc) cost in an all-VMEM kernel — is
    minimal.  Returns None when N doesn't fold or the kernel doesn't fit."""
    if os.environ.get("TRIFLOW_NO_FOLDED"):
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
    g = max(backend.halo, 1)
    if N % g or system.nvar * g > 8:
        return None
    M = N // g
    if M < 8:
        return None
    best = None
    for Mc in range(2, min(M // 2, _MC_CAP) + 1):
        if M % Mc == 0:
            best = Mc
            break
    if best is None:
        return None
    C = M // best
    plan = FoldPlan(N, system.nvar, backend.halo, g, backend.window,
                    C, best, best * g, C & (C - 1) == 0 and C >= 8)
    n_stages = 6  # RODASPR, the widest ROW table
    if not applicable(backend, plan, n_stages):
        return None
    return plan


# ---------------------------------------------------------------------------
# value-level step pieces (all called INSIDE the kernel)
# ---------------------------------------------------------------------------

def _build_args_values(backend, plan: FoldPlan, periodic, u, he, ps, xv, dx):
    """Stencil args from whole-array VMEM values (the value-level twin of
    _FoldedStencilCall.build_args with Kb = K, tid = 0, ntiles = 1)."""
    h, K = backend.halo, plan.K
    named = {}
    u_win = (_chunk_halo_window(u, u, u, h, periodic, 0, 1, plan)
             if h else u)
    for idx, name in enumerate(backend.system.dep_vars):
        named[name] = u_win[idx]
    if len(backend.system.help_funcs):
        he_win = (_chunk_halo_window(he, he, he, h, periodic, 0, 1, plan)
                  if h else he)
        for idx, name in enumerate(backend.system.help_funcs):
            named[name] = he_win[idx]
    args = [xv]
    for var, off in backend._offset_args:
        args.append(named[var][h + off: h + off + K])
    for idx in range(len(backend.system.pars)):
        args.append(ps[idx])
    args.append(dx)
    return args


def _f_rows_values(backend, plan: FoldPlan, args, dtype):
    """F(u) (nvar, K, 8, C8) from built stencil args; dead chunks zeroed."""
    K, C8 = plan.K, plan.C8
    rows = [jnp.broadcast_to(jnp.asarray(fn(*args), dtype), (K, 8, C8))
            for fn in backend._F_fns]
    out = jnp.stack(rows)
    dead = _dead_mask(plan)
    if dead is not None:
        out = jnp.where(dead, 0.0, out)
    return out


def _to_rows(v, plan: FoldPlan):
    """(nvar, K, 8, C8) -> list of Mc supernode rows (s, 8, C8) with the
    solver's row index a*nvar + m (node-within-supernode major)."""
    nvar, g, Mc = plan.nvar, plan.g, plan.Mc
    rows = []
    for i in range(Mc):
        blk = [v[m, i * g + a] for a in range(g) for m in range(nvar)]
        rows.append(jnp.stack(blk))
    return rows


def _from_rows(xs, plan: FoldPlan):
    """Inverse of _to_rows: Mc rows (s, 8, C8) -> (nvar, K, 8, C8)."""
    nvar, g, Mc = plan.nvar, plan.g, plan.Mc
    chans = []
    for m in range(nvar):
        parts = [xs[i][a * nvar + m] for i in range(Mc) for a in range(g)]
        chans.append(jnp.stack(parts))
    return jnp.stack(chans)


def _factor_values(bands, alpha, beta, plan: FoldPlan, cyclic):
    """Fused assembly + both factor sweeps at value level (the single-block
    twin of folded.factor_sweeps_folded): returns the per-row lists
    fac, Dhinv, wt-free spikes W/V, DU plus the boundary couplings Tl/Tr."""
    Mc, g, nvar, h, W, s = (plan.Mc, plan.g, plan.nvar, plan.halo,
                            plan.W, plan.s)
    space = (8, plan.C8)
    dtype = bands.dtype
    first, last = _member_masks(plan)
    zero_blk = jnp.zeros((s, s) + space, dtype)

    dhinv = zero_blk
    uprev = zero_blk
    wt = zero_blk
    facs, Dhs, Us, wts = [], [], [], []
    Tl = Tr = zero_blk
    for i in range(Mc):
        L_row = _row_from_folded_bands(bands, alpha, beta, g, nvar, h, W,
                                       i, -1, space, dtype)
        D_row = _row_from_folded_bands(bands, alpha, beta, g, nvar, h, W,
                                       i, 0, space, dtype)
        U_row = _row_from_folded_bands(bands, alpha, beta, g, nvar, h, W,
                                       i, 1, space, dtype)
        if i == 0:
            Tl = L_row if cyclic else jnp.where(first, 0.0, L_row)
            L_row = jnp.zeros_like(L_row)
        if i == Mc - 1:
            Tr = U_row if cyclic else jnp.where(last, 0.0, U_row)
            U_row = jnp.zeros_like(U_row)
        fac = _mm_t(L_row, dhinv, 2)
        dhinv = _inv_t(D_row - _mm_t(fac, uprev, 2), 2)
        wt = Tl if i == 0 else -_mm_t(fac, wt, 2)
        facs.append(fac)
        Dhs.append(dhinv)
        Us.append(U_row)
        wts.append(wt)
        uprev = U_row

    w = zero_blk
    v = zero_blk
    Ws = [None] * Mc
    Vs = [None] * Mc
    DUs = [None] * Mc
    for i in reversed(range(Mc)):
        DU = _mm_t(Dhs[i], Us[i], 2)
        bV = Tr if i == Mc - 1 else zero_blk
        w = _mm_t(Dhs[i], wts[i], 2) - _mm_t(DU, w, 2)
        v = _mm_t(Dhs[i], bV, 2) - _mm_t(DU, v, 2)
        Ws[i] = w
        Vs[i] = v
        DUs[i] = DU
    return facs, Dhs, DUs, Ws, Vs


def _reduced_LU_values(Ws, Vs, plan: FoldPlan):
    """Reduced interface L/U blocks (2s, 2s, 8, C8) from the spike rows
    (value-level twin of folded._reduced_LU, block form)."""
    s = plan.s
    d2 = 2 * s
    dtype = Ws[0].dtype
    zero = jnp.zeros((8, plan.C8), dtype)

    def w_entry(top, a, b):
        return (Ws[0] if top else Ws[-1])[a, b]

    def v_entry(top, a, b):
        return (Vs[0] if top else Vs[-1])[a, b]

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


def _pcr_factor_values(Lv, Dv, Uv, ds, C, C8, cyclic, Cm=0):
    """All PCR reduction levels at value level (the body of
    pallas_pcr.pcr_factor_fused_sub); returns (alphas, betas, Dinv).
    With ``Cm`` the system is block-diagonal over C/Cm members (ensemble
    plans): member-local boundary masks on ``c % Cm`` decouple neighbors
    across member boundaries (the rolled-in foreign values are multiplied
    by zeroed alpha/beta, so global rolls stay correct)."""
    cidx = _c_iota(C8)
    cmod = cidx % Cm if Cm else cidx
    top = Cm or C
    alphas, betas = [], []
    for d in ds:
        Dinv = _inv2(Dv)
        alpha = -_mm2(Lv, _roll_c(Dinv, d, C8))
        beta = -_mm2(Uv, _roll_c(Dinv, -d, C8))
        if not cyclic:
            alpha = jnp.where(cmod >= d, alpha, 0.0)
            beta = jnp.where(cmod < top - d, beta, 0.0)
        Dv = (Dv + _mm2(alpha, _roll_c(Uv, d, C8))
              + _mm2(beta, _roll_c(Lv, -d, C8)))
        Lv = _mm2(alpha, _roll_c(Lv, d, C8))
        Uv = _mm2(beta, _roll_c(Uv, -d, C8))
        alphas.append(alpha)
        betas.append(beta)
    if cyclic:
        Dv = Dv + Lv + Uv
    return alphas, betas, _inv2(Dv)


def _member_bcast(v, plan: FoldPlan, forward: bool):
    """Broadcast a one-nonzero-chunk-per-member (8, C8) slab to a
    member-constant slab (the per-member Woodbury needs each member's
    boundary value on every one of its chunks).  Log-doubling prefix
    (forward, from each member's FIRST chunk) or suffix (backward, from
    its LAST chunk) sum with member-local masks: with a single nonzero
    per member segment the running sum IS the broadcast."""
    Cm, C8 = plan.Cmm, plan.C8
    cmod = _c_iota(C8) % Cm
    d = 1
    while d < Cm:
        if forward:
            v = v + jnp.where(cmod >= d, _roll_c(v, d, C8), 0.0)
        else:
            v = v + jnp.where(cmod < Cm - d, _roll_c(v, -d, C8), 0.0)
        d *= 2
    return v


def _pcr_apply_values(alphas, betas, Dinv, b, ds, C8):
    bv = b
    for lev, d in enumerate(ds):
        bv = (bv + _mv2(alphas[lev], _roll_c(bv, d, C8))
              + _mv2(betas[lev], _roll_c(bv, -d, C8)))
    return _mv2(Dinv, bv)


def _scalar_inv(mat):
    """Unrolled Gauss-Jordan inverse of a small list-of-lists scalar matrix
    (the Woodbury capacitance, d2 <= 8; pivot-free like ops/banded's
    _small_inv — cap = I + v^T Z is well-conditioned for solver-grade dt)."""
    n = len(mat)
    a = [[mat[i][j] for j in range(n)]
         + [jnp.ones_like(mat[0][0]) if i == j
            else jnp.zeros_like(mat[0][0]) for j in range(n)]
         for i in range(n)]
    for col in range(n):
        piv = 1.0 / a[col][col]
        a[col] = [piv * e for e in a[col]]
        for row in range(n):
            if row == col:
                continue
            f = a[row][col]
            a[row] = [e - f * p for e, p in zip(a[row], a[col])]
    return [row[n:] for row in a]


class _Reduced:
    """In-kernel reduced-interface solver: PCR levels (+ optional Woodbury
    wrap correction), mirroring folded._reduced_factor / WrappedPcr."""

    def __init__(self, plan: FoldPlan, Lred, Ured, cyclic, wrap):
        s = plan.s
        d2 = 2 * s
        C, C8 = plan.C, plan.C8
        dtype = Lred.dtype
        self.plan, self.s, self.wood = plan, s, False
        # member-partitioned plans (B > 1) reduce per member: log2(Cm)
        # levels with member-local masks (pallas_pcr.pcr_factor_fused_sub)
        self.ds = _levels(plan.Cmm)
        self.Cm = plan.Cmm if plan.B > 1 else 0
        self.C8 = C8
        # identity blocks via iota (Mosaic rejects the eye[..., None, None]
        # rank-expanding shape cast inside a kernel)
        ii = jax.lax.broadcasted_iota(jnp.int32, Lred.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, Lred.shape, 1)
        eye = jnp.where(ii == jj, 1.0, 0.0).astype(dtype)
        dead = _dead_mask(plan)
        first, last = _member_masks(plan)
        if cyclic:
            self.fact = _pcr_factor_values(Lred, eye, Ured, self.ds, C, C8,
                                           True)
            return
        Lred0 = jnp.where(first, 0.0, Lred)
        Ured0 = jnp.where(last, 0.0, Ured)
        if dead is not None:
            Lred0 = jnp.where(dead, 0.0, Lred0)
            Ured0 = jnp.where(dead, 0.0, Ured0)
        self.fact = _pcr_factor_values(Lred0, eye, Ured0, self.ds, C, C8,
                                       False, Cm=self.Cm)
        if not wrap:
            return
        # Woodbury columns: the masked-out boundary values of Lred/Ured ARE
        # the wrap corner blocks (folded._reduced_factor)
        self.wood = True
        rhs = jnp.stack(
            [jnp.where(first, Lred[:, s + j], 0.0) if j < s
             else jnp.where(last, Ured[:, j - s], 0.0)
             for j in range(d2)])                       # (d2_j, d2_v, 8, C8)
        Z = _pcr_apply_values(*self.fact, rhs, self.ds, C8)
        vtz = [[None] * d2 for _ in range(d2)]          # vtz[j][i] = v_i^T Z_j
        for j in range(d2):
            for i in range(d2):
                row = Z[j, s + i] if i < s else Z[j, i - s]
                mask = last if i < s else first
                vtz[j][i] = self._vdot(jnp.where(mask, row, 0.0),
                                       forward=i >= s)
        one = jnp.ones((), dtype)
        # per member (B > 1) the vtz entries are member-constant (8, C8)
        # slabs and the Gauss-Jordan runs elementwise: each member gets its
        # own capacitance inverse (dead chunks invert I harmlessly)
        cap = [[(one if i == j else jnp.zeros((), dtype)) + vtz[j][i]
                for j in range(d2)] for i in range(d2)]
        self.cap_inv = _scalar_inv(cap)                 # [i][j]
        self.Z = Z

    def _vdot(self, masked, forward):
        """v_i^T y with a one-chunk-per-member mask already applied: a
        scalar sum for a single member, a member-constant broadcast slab
        for ensemble plans."""
        if self.plan.B == 1:
            return jnp.sum(masked)
        return _member_bcast(masked, self.plan, forward)

    def shifts(self, yred, wrap):
        """Reduced solve + neighbor shifts: yred (2s, 8, C8) ->
        (xm1_bot, xp1_top), each (s, 8, C8) — the in-kernel twin of
        pallas_pcr.interface_shift_solve."""
        plan, s, C8 = self.plan, self.s, self.C8
        d2 = 2 * s
        y = _pcr_apply_values(*self.fact, yred, self.ds, C8)
        if self.wood:
            first, last = _member_masks(plan)
            vt = [self._vdot(jnp.where(last, y[s + i], 0.0), forward=False)
                  for i in range(s)]
            vt += [self._vdot(jnp.where(first, y[i], 0.0), forward=True)
                   for i in range(s)]
            corr = None
            for j in range(d2):
                coef = sum(self.cap_inv[j][i] * vt[i] for i in range(d2))
                t = coef * self.Z[j]
                corr = t if corr is None else corr + t
            y = y - corr
        ztop, zbot = y[:s], y[s:]
        xm1 = _ring_shift(zbot, 1, plan)
        xp1 = _ring_shift(ztop, -1, plan)
        if not wrap:
            first, last = _member_masks(plan)
            xm1 = jnp.where(first, 0.0, xm1)
            xp1 = jnp.where(last, 0.0, xp1)
        return xm1, xp1


def _solve_values(facs, Dhs, DUs, Ws, Vs, red: _Reduced, rhs, plan, wrap):
    """Full distributed-chunk solve at value level: Thomas sweeps over the
    supernode rows, one reduced interface solve, spike correction."""
    Mc = plan.Mc
    rows = _to_rows(rhs, plan)
    bt = jnp.zeros_like(rows[0])
    bts = []
    for i in range(Mc):
        bt = rows[i] - _mv_t(facs[i], bt, 2)
        bts.append(bt)
    y = jnp.zeros_like(bt)
    ys = [None] * Mc
    for i in reversed(range(Mc)):
        y = _mv_t(Dhs[i], bts[i], 2) - _mv_t(DUs[i], y, 2)
        ys[i] = y
    yred = jnp.concatenate([ys[0], ys[-1]], axis=0)
    xm1, xp1 = red.shifts(yred, wrap)
    xs = [ys[i] - _mv_t(Ws[i], xm1, 2) - _mv_t(Vs[i], xp1, 2)
          for i in range(Mc)]
    return _from_rows(xs, plan)


# ---------------------------------------------------------------------------
# df64 value-level pieces (the precision twin of the step body: mixed
# f32-preconditioned solves + double-float F/J/residuals, all in-kernel)
# ---------------------------------------------------------------------------

def applicable_df(backend, plan: FoldPlan, n_stages: int) -> bool:
    """True when the df64 whole-step kernel can serve this plan: the f32
    gates plus the DF working set — state/stage/window slabs become
    (hi, lo) pairs and the band storage triples (f32 preconditioner bands
    + the DF pair), while the f32 factor rows and the reduced operators
    stay single."""
    if os.environ.get("TRIFLOW_NO_MEGA_DF"):
        return False
    if not applicable(backend, plan, n_stages):
        return False
    if plan.B > 1:
        return False          # ensemble plans: the merged DF path serves
    item = jnp.dtype(backend.dtype).itemsize
    nvar, W = plan.nvar, plan.W
    vec = plan.K * plan.Cp * item
    bands = W * nvar * nvar * vec
    stages = (n_stages + 4) * nvar * vec
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)
    windows = (3 * nvar + 3 * nhelp + npar + 1) * vec
    # extra pair components on top of the f32 estimate
    extra = 2 * bands + stages + windows + 2 * nvar * vec
    budget = int(os.environ.get("TRIFLOW_MEGA_BUDGET_MB", 6)) << 20
    return _vmem_estimate(backend, plan, n_stages) + extra <= budget


def df64_small_plan_for(backend, N: int, n_stages: int) -> FoldPlan | None:
    """Plan for the df64 whole-step kernel, chosen for VREG efficiency:
    the kernel's cost is dominated by elementwise EFT chains on
    (K, 8, C8) slabs, so maximize the lane utilization (C8 as close to
    the 128-lane tile as possible — a C8=63 plan wastes half of every
    vector op) and minimize the sweep depth second.  The grid-kernel
    gates do not apply (everything runs inside ONE kernel)."""
    system = backend.system
    g = max(backend.halo, 1)
    if N % g or system.nvar * g > 8:
        return None
    M = N // g
    best = None
    for Mc in range(2, _MC_CAP + 1):
        if M % Mc:
            continue
        C = M // Mc
        plan = FoldPlan(N, system.nvar, backend.halo, g, backend.window,
                        C, Mc, Mc * g, C & (C - 1) == 0 and C >= 8)
        if not applicable_df(backend, plan, n_stages):
            continue
        score = (-plan.C8, Mc)
        if best is None or score < best[0]:
            best = (score, plan)
    return best[1] if best else None


def _build_args_values_df(backend, plan: FoldPlan, periodic, u, he, ps,
                          xv, dx):
    """DF stencil args from whole-array VMEM DF values (the double-float
    twin of _build_args_values: windows are structural, so hi and lo
    extend componentwise and the pairs stay exact)."""
    from .df64 import DF

    h, K = backend.halo, plan.K

    def win(a):
        return (_chunk_halo_window(a, a, a, h, periodic, 0, 1, plan)
                if h else a)

    named = {}
    uwh, uwl = win(u.hi), win(u.lo)
    for idx, name in enumerate(backend.system.dep_vars):
        named[name] = DF.wrap(uwh[idx], uwl[idx])
    if len(backend.system.help_funcs):
        hwh, hwl = win(he.hi), win(he.lo)
        for idx, name in enumerate(backend.system.help_funcs):
            named[name] = DF.wrap(hwh[idx], hwl[idx])
    args = [xv]
    for var, off in backend._offset_args:
        d = named[var]
        args.append(DF.wrap(d.hi[h + off: h + off + K],
                            d.lo[h + off: h + off + K]))
    for idx in range(len(backend.system.pars)):
        args.append(DF.wrap(ps.hi[idx], ps.lo[idx]))
    args.append(dx)
    return args


def _as_df_slab(val, shape):
    """Coerce a DF-lambdified row output (DF, array or scalar constant) to
    a DF of broadcast (K, 8, C8) slabs."""
    from .df64 import DF

    if not isinstance(val, DF):
        val = DF(jnp.asarray(val, jnp.float32))
    return DF.wrap(jnp.broadcast_to(val.hi, shape),
                   jnp.broadcast_to(val.lo, shape))


def _f_rows_values_df(backend, plan: FoldPlan, args):
    """df64 F(u) -> DF (nvar, K, 8, C8); dead chunks zeroed (both
    components)."""
    from .df64 import DF, df_where

    K, C8 = plan.K, plan.C8
    F_fns, _ = backend._df64_lambdified()
    rows = [_as_df_slab(fn(*args), (K, 8, C8)) for fn in F_fns]
    out = DF.wrap(jnp.stack([r.hi for r in rows]),
                  jnp.stack([r.lo for r in rows]))
    dead = _dead_mask(plan)
    if dead is not None:
        out = df_where(dead, 0.0, out)
    return out


def _j_rows_values_df(backend, args, plan: FoldPlan, periodic):
    """df64 banded-Jacobian slab DF (W, nvar, nvar, K, 8, C8) from DF
    stencil args — the double-float twin of _j_rows_values (whole-array
    form: Kb = K, tid = 0, nt = 1).  Edge folding moves band values with
    the same masks on both components (exact)."""
    from .df64 import DF, df_where, df_zeros

    nvar, W, h = backend.system.nvar, plan.W, plan.halo
    K, C8 = plan.K, plan.C8
    _, J_fns = backend._df64_lambdified()
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, 8, C8), 0)
    first, last = _member_masks(plan)
    zero = df_zeros((K, 8, C8))
    rows = {}
    for (m, n, kb), fn in J_fns.items():
        rows[(kb, m, n)] = _as_df_slab(fn(*args), (K, 8, C8))

    def get(kb, m, n):
        return rows.get((kb, m, n), zero)

    if not periodic:
        for m in range(nvar):
            for n in range(nvar):
                for i in range(h):
                    for kb in range(h - i):
                        mask = (krow == i) & first
                        src = get(kb, m, n)
                        rows[(h - i, m, n)] = df_where(
                            mask, get(h - i, m, n) + src, get(h - i, m, n))
                        rows[(kb, m, n)] = df_where(mask, 0.0, src)
                for i in range(h):
                    for kb in range(h - i):
                        koff = W - 1 - kb
                        mask = (krow == K - 1 - i) & last
                        src = get(koff, m, n)
                        rows[(h + i, m, n)] = df_where(
                            mask, get(h + i, m, n) + src, get(h + i, m, n))
                        rows[(koff, m, n)] = df_where(mask, 0.0, src)

    dead = _dead_mask(plan)
    if dead is not None:
        rows = {k: df_where(dead, 0.0, v) for k, v in rows.items()}

    def stack(comp):
        return jnp.stack([
            jnp.stack([
                jnp.stack([getattr(get(kb, m, n), comp)
                           for n in range(nvar)])
                for m in range(nvar)
            ])
            for kb in range(W)
        ])

    return DF.wrap(stack("hi"), stack("lo"))


def _matvec_values_df(bands_df, v_df, periodic, plan: FoldPlan):
    """df64 (J @ v) at value level: DF windows + EFT accumulation chains
    (the in-kernel twin of folded.matvec_df_folded with Kb = K)."""
    from .df64 import DF, add_, mul_

    W, nvar, h, K = plan.W, plan.nvar, plan.halo, plan.K

    def window(v):
        if h == 0:
            return v
        w = _chunk_halo_window(v, v, v, h, periodic, 0, 1, plan)
        if not periodic:
            first, last = _member_masks(plan)
            head = jnp.where(first, 0.0, w[..., :h, :, :])
            tail = jnp.where(last, 0.0, w[..., -h:, :, :])
            w = jnp.concatenate([head, w[..., h:-h, :, :], tail], axis=-3)
        return w

    wh, wl = window(v_df.hi), window(v_df.lo)
    rows_h, rows_l = [], []
    for m in range(nvar):
        acc = None
        for kb in range(W):
            for n in range(nvar):
                ph, pe = mul_(bands_df.hi[kb, m, n], bands_df.lo[kb, m, n],
                              wh[n, kb: kb + K, :, :],
                              wl[n, kb: kb + K, :, :])
                acc = ((ph, pe) if acc is None
                       else add_(acc[0], acc[1], ph, pe))
        rows_h.append(acc[0])
        rows_l.append(acc[1])
    return DF.wrap(jnp.stack(rows_h), jnp.stack(rows_l))


def _row_step_values_df(backend, plan: FoldPlan, tables, s_stages,
                        periodic, u_df, he_df, ps_df, xv_df, dx_df, dt,
                        mixed, rhs_dt_scale=False):
    """One mixed-precision df64 ROW (or theta) step at value level: the f32
    factorization of the ROUNDED system preconditions ``mixed``
    df64-residual refinement passes per stage against the in-kernel DF
    banded operator — the single-launch statement of the
    ``df64_mixed_solve`` scheme (core/schemes._df64_mixed_solver), closing
    the small-N df64 gap (VERDICT r4 missing #2: 467 us/step through the
    ~28-launch scan vs the 22 us f32 megakernel floor).  Returns
    ``(u_new_df, err)`` with err an f32 scalar of the embedded estimate."""
    from .df64 import DF, df_where, from_scalar

    a_t, c_t, m_t, m_pred_t, g00 = tables
    wrap = bool(periodic) and plan.halo > 0
    cyclic = wrap and plan.cyclic_ok
    f32 = jnp.float32

    # --- f32 preconditioner of the rounded system -------------------------
    # (absent helper/param operands arrive as None — nhelp/npar gates in
    # the arg builders never read them)
    u32 = u_df.hi + u_df.lo
    he32 = None if he_df is None else he_df.hi + he_df.lo
    ps32 = None if ps_df is None else ps_df.hi + ps_df.lo
    xv32 = xv_df.hi + xv_df.lo
    dx32 = dx_df.hi + dx_df.lo
    args32 = _build_args_values(backend, plan, periodic, u32, he32, ps32,
                                xv32, dx32)
    bands32 = _j_rows_values(backend, args32, plan.K, 0, 1, periodic, plan,
                             f32)
    one = jnp.ones((), f32)
    beta32 = -float(g00) * dt
    facs, Dhs, DUs, Ws, Vs = _factor_values(bands32, one, beta32, plan,
                                            wrap)
    Lred, Ured = _reduced_LU_values(Ws, Vs, plan)
    red = _Reduced(plan, Lred, Ured, cyclic, wrap)

    def solve32(r32):
        return _solve_values(facs, Dhs, DUs, Ws, Vs, red, r32, plan, wrap)

    # --- DF operator for the residuals ------------------------------------
    args_df = _build_args_values_df(backend, plan, periodic, u_df, he_df,
                                    ps_df, xv_df, dx_df)
    bands_df = _j_rows_values_df(backend, args_df, plan, periodic)

    def c11(c):
        # DF scalar constants as (1, 1) vectors: inside the kernel trace
        # even constants are tracers (omnistaging), and the EFT split's
        # tpu.bitcast rejects rank-0 operands (probed on v5e) — (1, 1)
        # bitcasts fine and broadcasts against every slab shape
        h, l = from_scalar(float(c))
        return DF.wrap(jnp.full((1, 1), h, f32), jnp.full((1, 1), l, f32))

    dt_df = DF(jnp.reshape(dt, (1, 1)))
    gdt = c11(g00) * dt_df
    # theta (1-stage table): the system coefficient is theta*dt but the
    # RHS is dt*F — u2 = u + (I - theta*dt*J)^-1 (dt*F)
    rhs_scale = dt_df if rhs_dt_scale else gdt

    def solve_mixed(rhs):
        k = DF(solve32(rhs.hi + rhs.lo))
        for _ in range(mixed):
            jk = _matvec_values_df(bands_df, k, periodic, plan)
            r = (rhs - k) + gdt * jk
            k = k + DF(solve32(r.hi + r.lo))
        return k

    us = []
    for i in range(s_stages):
        u_i = u_df
        for j in range(i):
            if a_t[i, j]:
                u_i = u_i + c11(a_t[i, j]) * us[j]
        if i == 0:
            s_args = args_df
        else:
            s_args = _build_args_values_df(backend, plan, periodic, u_i,
                                           he_df, ps_df, xv_df, dx_df)
        rhs = rhs_scale * _f_rows_values_df(backend, plan, s_args)
        for j in range(i):
            if c_t[i, j]:
                rhs = rhs + c11(g00 * c_t[i, j]) * us[j]
        us.append(solve_mixed(rhs))

    u_new = u_df
    for i in range(s_stages):
        if m_t[i]:
            u_new = u_new + c11(m_t[i]) * us[i]
    if m_pred_t is not None:
        diff = None
        for i in range(s_stages):
            c = m_t[i] - m_pred_t[i]
            if c:
                term = c11(c) * us[i]
                diff = term if diff is None else diff + term
        err = jnp.max(jnp.abs(diff.hi + diff.lo))
        err = jnp.where(jnp.isnan(err) | jnp.isinf(err),
                        jnp.asarray(jnp.inf, f32), err)
    else:
        err = jnp.full((), jnp.inf, f32)
    return u_new, err


def row_step_df_folded(backend, plan: FoldPlan, tables, s_stages, periodic,
                       uf_df, hf_df, pf_df, xf_df, dx_df, dt, mixed,
                       nsteps=1, rhs_dt_scale=False):
    """``nsteps`` mixed-precision df64 ROW steps as ONE pallas_call ->
    (uf_new_df, err), or None when the df64 whole-step kernel does not
    apply (callers fall back to the node-layout mixed pipeline).  All
    operands are folded DF pairs; ``dt`` is the (exact) f32 step and
    ``dx_df`` the DF grid spacing."""
    from .df64 import DF

    if not applicable_df(backend, plan, s_stages):
        return None
    dtype = jnp.float32
    nvar, K, C8 = plan.nvar, plan.K, plan.C8
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)
    n = int(nsteps)

    def kernel(*refs):
        it = iter(refs)
        uh = next(it)[...]
        ul = next(it)[...]
        # zero-size slabs must never be CREATED in-kernel (Mosaic rejects
        # 0-dim vector types); absent operands thread as None and the
        # nhelp/npar gates downstream never touch them
        he = DF.wrap(next(it)[...], next(it)[...]) if nhelp else None
        ps = DF.wrap(next(it)[...], next(it)[...]) if npar else None
        xh, xl = next(it)[...], next(it)[...]
        sc_ref = next(it)
        oh_ref = next(it)
        ol_ref = next(it)
        err_ref = next(it)
        dt_v = sc_ref[0, 0]
        # traced scalars entering DF arithmetic ride as (1, 1) vectors:
        # the EFT split's tpu.bitcast rejects scalar operands (probed on
        # v5e), while (1, 1) bitcasts fine and broadcasts against every
        # slab shape
        dx_df_v = DF.wrap(sc_ref[0, 1].reshape(1, 1),
                          sc_ref[0, 2].reshape(1, 1))
        xv = DF.wrap(xh, xl)

        def one(u_):
            return _row_step_values_df(backend, plan, tables, s_stages,
                                       periodic, u_, he, ps, xv, dx_df_v,
                                       dt_v, mixed,
                                       rhs_dt_scale=rhs_dt_scale)

        u0 = DF.wrap(uh, ul)
        if n == 1:
            u_new, err = one(u0)
        else:
            u_new, err = jax.lax.fori_loop(
                0, n, lambda _i, c: one(c[0]),
                (u0, jnp.zeros((), dtype)))
        oh_ref[...] = u_new.hi
        ol_ref[...] = u_new.lo
        err_ref[0, 0] = err

    sc = jnp.stack([jnp.asarray(dt, dtype),
                    jnp.asarray(dx_df.hi, dtype),
                    jnp.asarray(dx_df.lo, dtype)]).reshape(1, 3)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ops = [uf_df.hi, uf_df.lo]
    specs = [vspec, vspec]
    if nhelp:
        ops += [hf_df.hi, hf_df.lo]
        specs += [vspec, vspec]
    if npar:
        ops += [pf_df.hi, pf_df.lo]
        specs += [vspec, vspec]
    ops += [xf_df.hi, xf_df.lo, sc]
    specs += [vspec, vspec, sspec]
    oh, ol, err = _pcall(
        kernel,
        in_specs=specs,
        out_specs=[vspec, vspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
            jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
    )(*ops)
    return DF.wrap(oh, ol), err[0, 0]


def theta_step_df_folded(backend, plan: FoldPlan, theta, periodic,
                         uf_df, hf_df, pf_df, xf_df, dx_df, dt, mixed,
                         nsteps=1):
    """``nsteps`` mixed-precision df64 linearized theta steps as ONE
    pallas_call -> (uf_new_df, err), or None.  Expressed on the 1-stage
    table: u2 = u + (I - theta*dt*J)^-1 (dt*F(u)) with the residual
    refinement against the df64 (I - theta*dt*J) operator."""
    import numpy as np

    tables = (np.zeros((1, 1)), np.zeros((1, 1)), np.array([1.0]), None,
              float(theta))
    return row_step_df_folded(backend, plan, tables, 1, periodic,
                              uf_df, hf_df, pf_df, xf_df, dx_df, dt,
                              mixed, nsteps=nsteps, rhs_dt_scale=True)


# ---------------------------------------------------------------------------
# the whole-step kernels
# ---------------------------------------------------------------------------

def _row_step_values(backend, plan: FoldPlan, tables, s_stages, periodic,
                     u, he, ps, xv, dx, beta, rhs_scale, err_slab=False):
    """One ROW (or theta, via a 1-stage table) step at value level:
    banded J, fused assembly+factor, reduced interface, all stages, final
    combination -> (u_new, err).  ``beta`` = -gamma00*dt (the factor
    shift), ``rhs_scale`` = gamma00*dt for ROW / dt for theta.

    ``beta``/``rhs_scale`` may be member-constant (8, C8) slabs instead of
    scalars (per-member dt): every band/factor/solve op is elementwise
    over the chunk plane and member boundaries are mask-decoupled, so
    each chunk simply factors its member's shifted system.  With
    ``err_slab`` the error comes back as a per-chunk (8, C8) max over
    (nvar, K) instead of a global scalar (callers member-reduce it)."""
    a_t, c_t, m_t, m_pred_t, g00 = tables
    wrap = bool(periodic) and plan.halo > 0
    cyclic = wrap and plan.cyclic_ok
    dtype = backend.dtype

    args = _build_args_values(backend, plan, periodic, u, he, ps, xv, dx)
    bands = _j_rows_values(backend, args, plan.K, 0, 1, periodic, plan,
                           dtype)
    one = jnp.ones((), dtype)
    # the factor sweep keeps the wrap couplings in Tl/Tr for ANY
    # periodic closure (folded.factor_folded passes wrap, not cyclic):
    # non-power-of-two rings recover them via the reduced Woodbury
    facs, Dhs, DUs, Ws, Vs = _factor_values(bands, one, beta, plan, wrap)
    Lred, Ured = _reduced_LU_values(Ws, Vs, plan)
    red = _Reduced(plan, Lred, Ured, cyclic, wrap)

    us = []
    for i in range(s_stages):
        u_i = u
        rhs_bias = None
        for j in range(i):
            if a_t[i, j]:
                u_i = u_i + float(a_t[i, j]) * us[j]
            cij = float(g00 * c_t[i, j])
            if cij:
                t = cij * us[j]
                rhs_bias = t if rhs_bias is None else rhs_bias + t
        if i == 0:
            s_args = args
        else:
            s_args = _build_args_values(backend, plan, periodic, u_i,
                                        he, ps, xv, dx)
        rhs = rhs_scale * _f_rows_values(backend, plan, s_args, dtype)
        if rhs_bias is not None:
            rhs = rhs + rhs_bias
        us.append(_solve_values(facs, Dhs, DUs, Ws, Vs, red, rhs,
                                plan, wrap))

    u_new = u
    for i in range(s_stages):
        u_new = u_new + float(m_t[i]) * us[i]
    if m_pred_t is not None:
        diff = None
        for i in range(s_stages):
            c = m_t[i] - m_pred_t[i]
            if c:
                diff = (float(c) * us[i] if diff is None
                        else diff + float(c) * us[i])
        adiff = jnp.abs(diff)
        err = jnp.max(adiff, axis=(0, 1)) if err_slab else jnp.max(adiff)
        err = jnp.where(jnp.isnan(err) | jnp.isinf(err),
                        jnp.asarray(jnp.inf, dtype), err)
    else:
        shape = (8, plan.C8) if err_slab else ()
        err = jnp.full(shape, jnp.inf, dtype)
    return u_new, err


def _step_kernel(backend, plan: FoldPlan, tables, s_stages, periodic,
                 nsteps=1):
    """Kernel body: ``nsteps`` ROW (or theta) steps, sequenced by an
    in-kernel ``fori_loop`` (the step body is traced ONCE, so Mosaic
    compile cost does not grow with nsteps).  SMEM scalars: beta =
    -gamma00*dt (factor), rhs_scale (gdt for ROW, dt for theta), dx."""
    dtype = backend.dtype
    nvar, K, C8 = plan.nvar, plan.K, plan.C8
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)

    def kernel(*refs):
        it = iter(refs)
        u = next(it)[...]
        he = next(it)[...] if nhelp else jnp.zeros((0, K, 8, C8), dtype)
        ps = next(it)[...] if npar else jnp.zeros((0, K, 8, C8), dtype)
        xv = next(it)[...]
        sc_ref = next(it)
        out_ref = next(it)
        err_ref = next(it)
        beta = sc_ref[0, 0]
        rhs_scale = sc_ref[0, 1]
        dx = sc_ref[0, 2]

        def one(u_):
            return _row_step_values(backend, plan, tables, s_stages,
                                    periodic, u_, he, ps, xv, dx,
                                    beta, rhs_scale)

        if nsteps == 1:
            u_new, err = one(u)
        else:
            u_new, err = jax.lax.fori_loop(
                0, nsteps, lambda _i, c: one(c[0]), (u, jnp.zeros((), dtype)))
        out_ref[...] = u_new
        err_ref[0, 0] = err

    return kernel


def row_step_folded(backend, plan: FoldPlan, tables, s_stages, periodic,
                    uf, hf, pf, xf, dx, dt):
    """One ROW step as a single pallas_call -> (uf_new, err), or None when
    the whole-step kernel doesn't apply (caller uses the grid kernels).
    Same stage algebra as schemes._row_folded_core (Hairer-Wanner
    transformed stages, one factorization for all stages)."""
    if not applicable(backend, plan, s_stages):
        return None
    g00 = tables[4]
    dt = jnp.asarray(dt, backend.dtype)
    beta = -jnp.asarray(float(g00), backend.dtype) * dt
    rhs_scale = jnp.asarray(float(g00), backend.dtype) * dt
    return _launch(backend, plan, tables, s_stages, periodic,
                   uf, hf, pf, xf, dx, beta, rhs_scale)


def theta_step_folded(backend, plan: FoldPlan, theta, periodic,
                      uf, hf, pf, xf, dx, dt):
    """One linearized theta step as a single pallas_call -> uf_new, or None.
    Expressed on the 1-stage table u2 = u + solve(I - theta*dt*J, dt*F(u))
    (see schemes.Theta._folded_core)."""
    if not applicable(backend, plan, 1):
        return None
    import numpy as np

    tables = (np.zeros((1, 1)), np.zeros((1, 1)), np.array([1.0]), None,
              float(theta))
    dt = jnp.asarray(dt, backend.dtype)
    beta = -jnp.asarray(float(theta), backend.dtype) * dt
    uf2, _err = _launch(backend, plan, tables, 1, periodic,
                        uf, hf, pf, xf, dx, beta, dt)
    return uf2


def _adaptive_retry_loop(backend, plan: FoldPlan, tables, s_stages,
                         periodic, he, ps, xv, dx, tol, safety, max_iter,
                         dt_min, compensated):
    """In-kernel accept/reject retry loop factory — bit-for-bit the
    controller of the folded-carry loop in schemes._build_stepper
    (clamp-and-recompute mode): same accept test, dt update, Kahan
    option, max_iter/dt_min status codes.  Returns
    ``run(t0, u0, c0, dt0, next_t) -> (t, u, c, dt_i, niter, status)``."""
    dtype = backend.dtype
    g00 = float(tables[4])
    tiny = float(jnp.finfo(dtype).tiny)
    feps = float(jnp.finfo(dtype).eps)

    def run(t0, u0, c0, dt0, next_t):
        eps = 1e-12 * jnp.maximum(jnp.abs(next_t), 1.0)

        def cond_f(carry):
            t_, _u, _c, _dt, _n, status = carry
            return (t_ < next_t - eps) & (status == 0)

        def body_f(carry):
            t_, u_, c_, dt_i, niter, status = carry
            remaining = next_t - t_
            clamped = dt_i >= remaining
            dt_eff = jnp.minimum(dt_i, remaining)
            beta = -g00 * dt_eff
            rhs_scale = g00 * dt_eff
            u2, err = _row_step_values(backend, plan, tables, s_stages,
                                       periodic, u_, he, ps, xv, dx,
                                       beta, rhs_scale)
            accept = err <= tol
            err_safe = jnp.maximum(err, tiny)
            dt_next = safety * dt_eff * jnp.sqrt(tol / err_safe)
            dt_next = jnp.clip(dt_next, 0.1 * dt_eff, 10.0 * dt_eff)
            dt_i_new = jnp.where(accept & clamped, dt_i, dt_next)
            t_ = jnp.where(accept, t_ + dt_eff, t_)
            if compensated:
                from .compensated import kahan_update

                uk, ck = kahan_update(u_, c_, u2)
                u_ = jnp.where(accept, uk, u_)
                c_ = jnp.where(accept, ck, c_)
            else:
                u_ = jnp.where(accept, u2, u_)
            niter = niter + jnp.int32(1)
            if max_iter is not None:
                status = jnp.where(niter > jnp.int32(max_iter),
                                   jnp.int32(1), status)
            dt_floor = dt_min if dt_min is not None else (
                1e3 * tiny + 2.0 * feps * jnp.abs(next_t))
            status = jnp.where(dt_i_new < dt_floor, jnp.int32(2), status)
            return (t_, u_, c_, dt_i_new, niter, status)

        carry = (t0, u0, c0, dt0, jnp.int32(0), jnp.int32(0))
        return jax.lax.while_loop(cond_f, body_f, carry)

    return run


def _member_max_slab(v, plan: FoldPlan):
    """Member-segmented max of a per-chunk (8, C8) slab -> member-constant
    slab (each chunk ends with the max over its OWN member's chunks).
    Log-doubling both-ways max with member-local masks, the max twin of
    _member_bcast; dead-tail chunks only ever combine within their own
    phantom segments, so real members never see padding garbage."""
    Cm, C8 = plan.Cmm, plan.C8
    cmod = _c_iota(C8) % Cm
    neg = jnp.asarray(-jnp.inf, v.dtype)
    d = 1
    while d < Cm:
        fwd = jnp.where(cmod >= d, _roll_c(v, d, C8), neg)
        bwd = jnp.where(cmod < Cm - d, _roll_c(v, -d, C8), neg)
        v = jnp.maximum(v, jnp.maximum(fwd, bwd))
        d *= 2
    return v


def _adaptive_retry_loop_members(backend, plan: FoldPlan, tables, s_stages,
                                 periodic, he, ps, xv, dx, tol, safety,
                                 max_iter, dt_min, compensated, zslab):
    """Per-member in-kernel retry loop factory — bit-for-bit the
    controller of the vmapped per-member stepper
    (parallel/ensemble._build_adaptive_per_member), but on the folded
    members-as-chunks layout: every member's clock, step size and attempt
    count live as member-constant (8, C8) slabs, converged members freeze
    under elementwise masks while stiff members keep retrying, and the
    per-member error is a member-segmented max.  ``zslab`` is a zero
    (8, C8) slab read from VMEM: while_loop slab carries must be seeded
    from a laid-out vector — Mosaic cannot relayout a replicated
    broadcast constant into the body's laid-out result.  Returns
    ``run(t0, u0, c0, dtb0, next_t) -> (tb, u, c, dtb, nb, status)``."""
    dtype = backend.dtype
    g00 = float(tables[4])
    tiny = float(jnp.finfo(dtype).tiny)
    feps = float(jnp.finfo(dtype).eps)
    real = _c_iota(plan.C8) < plan.C

    def run(t0, u0, c0, dtb0, next_t):
        eps = 1e-12 * jnp.maximum(jnp.abs(next_t), 1.0)
        tb0 = t0 + zslab

        def cond_f(carry):
            tb, _u, _c, _dtb, _nb, status = carry
            return jnp.any((tb < next_t - eps) & real) & (status == 0)

        def body_f(carry):
            tb, u_, c_, dtb, nb, status = carry
            active = tb < next_t - eps
            remaining = next_t - tb
            clamped = dtb >= remaining
            dt_eff = jnp.minimum(dtb, remaining)
            beta = -g00 * dt_eff
            rhs_scale = g00 * dt_eff
            u2, errs = _row_step_values(backend, plan, tables, s_stages,
                                        periodic, u_, he, ps, xv, dx,
                                        beta, rhs_scale, err_slab=True)
            errs = _member_max_slab(errs, plan)
            accept = (errs <= tol) & active
            err_safe = jnp.maximum(errs, tiny)
            dt_next = jnp.clip(safety * dt_eff * jnp.sqrt(tol / err_safe),
                               0.1 * dt_eff, 10.0 * dt_eff)
            dtb = jnp.where(active & ~(accept & clamped), dt_next, dtb)
            tb = jnp.where(accept, tb + dt_eff, tb)
            if compensated:
                from .compensated import kahan_update

                uk, ck = kahan_update(u_, c_, u2)
                u_ = jnp.where(accept, uk, u_)
                c_ = jnp.where(accept, ck, c_)
            else:
                u_ = jnp.where(accept, u2, u_)
            # the per-member attempt count is carried as a FLOAT slab
            # (exact for any realistic count): Mosaic cannot relayout a
            # replicated int32 broadcast into a while_loop's laid-out i32
            # carry, while float replicated carries relayout fine
            nb = nb + active.astype(dtype)
            if max_iter is not None:
                status = jnp.where(
                    jnp.any(real & active & (nb > float(max_iter))),
                    jnp.int32(1), status)
            dt_floor = dt_min if dt_min is not None else (
                1e3 * tiny + 2.0 * feps * jnp.abs(next_t))
            still = tb < next_t - eps
            status = jnp.where(jnp.any(real & still & (dtb < dt_floor)),
                               jnp.int32(2), status)
            return (tb, u_, c_, dtb, nb, status)

        carry = (tb0, u0, c0, dtb0, zslab, jnp.int32(0))
        return jax.lax.while_loop(cond_f, body_f, carry)

    return run


def member_slab(values, plan: FoldPlan, dtype):
    """Member-constant (8, C8) slab from per-member values ((B,) array or
    a scalar broadcast to every member)."""
    v = jnp.asarray(values, dtype)
    if v.ndim == 0:
        return jnp.full((8, plan.C8), v, dtype)
    mem = jnp.clip(_c_iota(plan.C8) // plan.Cmm, 0, plan.B - 1)
    return v[mem]


def slab_members(slab, plan: FoldPlan):
    """(B,) per-member values from a member-constant (8, C8) slab (reads
    each member's first chunk)."""
    c = jnp.arange(plan.B, dtype=jnp.int32) * plan.Cmm
    return slab.reshape(-1)[c]


def row_adaptive_step_folded(backend, plan: FoldPlan, tables, s_stages,
                             periodic, uf, hf, pf, xf, dx, t, dt,
                             internal_dt, tol, safety, max_iter, dt_min,
                             compensated=False):
    """One adaptive OUTPUT step — the whole accept/reject retry loop — as
    ONE pallas_call (in-kernel ``lax.while_loop``), or None when the
    whole-step kernel does not apply.  Returns
    ``(uf2, dt_i, niter, status)``."""
    if not applicable(backend, plan, s_stages):
        return None
    dtype = backend.dtype
    nvar, K, C8 = plan.nvar, plan.K, plan.C8
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)

    def kernel(*refs):
        it = iter(refs)
        u = next(it)[...]
        he = next(it)[...] if nhelp else jnp.zeros((0, K, 8, C8), dtype)
        ps = next(it)[...] if npar else jnp.zeros((0, K, 8, C8), dtype)
        xv = next(it)[...]
        sc_ref = next(it)
        out_ref = next(it)
        fl_ref = next(it)
        int_ref = next(it)
        t0 = sc_ref[0, 0]
        next_t = sc_ref[0, 1]
        dt0 = sc_ref[0, 2]
        dx = sc_ref[0, 3]
        run = _adaptive_retry_loop(backend, plan, tables, s_stages,
                                   periodic, he, ps, xv, dx, tol, safety,
                                   max_iter, dt_min, compensated)
        # the Kahan carry is a live full-size VMEM buffer only when the
        # compensated path actually reads it
        c0 = jnp.zeros_like(u) if compensated else jnp.zeros((), dtype)
        _t2, u2, _c2, dt_i, niter, status = run(t0, u, c0, dt0, next_t)
        out_ref[...] = u2
        fl_ref[0, 0] = dt_i
        int_ref[0, 0] = niter
        int_ref[0, 1] = status

    sc = jnp.stack([jnp.asarray(t, dtype),
                    jnp.asarray(t, dtype) + jnp.asarray(dt, dtype),
                    jnp.minimum(jnp.asarray(internal_dt, dtype),
                                jnp.asarray(dt, dtype)),
                    jnp.asarray(dx, dtype)]).reshape(1, 4)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ops = [uf]
    specs = [vspec]
    if nhelp:
        ops.append(hf)
        specs.append(vspec)
    if npar:
        ops.append(pf)
        specs.append(vspec)
    ops += [xf, sc]
    specs += [vspec, sspec]
    uf2, fl, ints = _pcall(
        kernel,
        in_specs=specs,
        out_specs=[vspec, sspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
    )(*ops)
    return uf2, fl[0, 0], ints[0, 0], ints[0, 1]


def row_adaptive_scan_folded(backend, plan: FoldPlan, tables, s_stages,
                             periodic, uf, hf, pf, xf, dx, t, dt,
                             internal_dt, tol, safety, max_iter, dt_min,
                             nsteps, compensated=False, per_member=False):
    """``nsteps`` adaptive OUTPUT steps — each with its full in-kernel
    accept/reject retry loop — as ONE pallas_call, or None when the
    whole-step kernel does not apply.  The outer loop early-exits when a
    step trips a status code (exactly the merged-ensemble chunk driver's
    semantics: remaining steps are NOT run on garbage state).  The Kahan
    compensation carry (``compensated=True``) persists across output
    steps inside the kernel — slightly tighter than chaining single-step
    kernels, which reset it per step.

    Shared-dt mode returns ``(uf2, steps_done, dt_i, status)``; the final
    time is ``t + steps_done * dt`` (the failing step, if any, counts —
    matching the stepper's convention of returning next_t even on
    failure).

    With ``per_member`` (ensemble plans, B > 1) every member carries its
    OWN internal clock/step/attempt count as member-constant (8, C8)
    slabs (see _adaptive_retry_loop_members); ``internal_dt`` may be a
    (B,) array, and the return is ``(uf2, steps_done, dt_b, status,
    niter_b)`` with per-member (B,) internal dts and total attempt
    counts."""
    if not applicable(backend, plan, s_stages):
        return None
    if per_member and plan.B <= 1:
        return None
    dtype = backend.dtype
    nvar, K, C8 = plan.nvar, plan.K, plan.C8
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)
    n = int(nsteps)

    def kernel(*refs):
        it = iter(refs)
        u = next(it)[...]
        he = next(it)[...] if nhelp else jnp.zeros((0, K, 8, C8), dtype)
        ps = next(it)[...] if npar else jnp.zeros((0, K, 8, C8), dtype)
        xv = next(it)[...]
        idt_ref = next(it) if per_member else None
        zs_ref = next(it) if per_member else None
        sc_ref = next(it)
        out_ref = next(it)
        fl_ref = next(it)
        int_ref = next(it)
        nb_ref = next(it) if per_member else None
        t0 = sc_ref[0, 0]
        dt_out = sc_ref[0, 1]
        dt0 = idt_ref[...] if per_member else sc_ref[0, 2]
        dx = sc_ref[0, 3]
        if per_member:
            run = _adaptive_retry_loop_members(
                backend, plan, tables, s_stages, periodic, he, ps, xv,
                dx, tol, safety, max_iter, dt_min, compensated,
                zs_ref[...])
        else:
            run = _adaptive_retry_loop(
                backend, plan, tables, s_stages, periodic, he, ps, xv,
                dx, tol, safety, max_iter, dt_min, compensated)

        def outer_cond(carry):
            i, _t, _u, _c, _dt, _nb, status = carry
            return (i < jnp.int32(n)) & (status == 0)

        def outer_body(carry):
            i, t_, u_, c_, dt_i, nb_tot, status = carry
            next_t = t_ + dt_out
            # every output step re-clamps its starting internal dt to the
            # output dt — the steppers do this on every call, so chaining
            # single-step kernels and this in-kernel scan stay bit-equal
            dt_i = jnp.minimum(dt_i, dt_out)
            _t2, u2, c2, dt_i2, niter, st2 = run(t_, u_, c_, dt_i, next_t)
            return (i + jnp.int32(1), next_t, u2, c2, dt_i2,
                    nb_tot + niter, jnp.maximum(status, st2))

        c0 = jnp.zeros_like(u) if compensated else jnp.zeros((), dtype)
        # laid-out float slab from VMEM, not a synthesized broadcast —
        # see _adaptive_retry_loop_members
        nb0 = zs_ref[...] if per_member else jnp.int32(0)
        carry = (jnp.int32(0), t0, u, c0, dt0, nb0, jnp.int32(0))
        i2, _t2, u2, _c2, dt_i, nb_tot, status = jax.lax.while_loop(
            outer_cond, outer_body, carry)
        out_ref[...] = u2
        int_ref[0, 0] = i2
        int_ref[0, 1] = status
        if per_member:
            fl_ref[...] = dt_i
            nb_ref[...] = nb_tot.astype(jnp.int32)
        else:
            fl_ref[0, 0] = dt_i

    idt = jnp.asarray(internal_dt, dtype)
    sc = jnp.stack([jnp.asarray(t, dtype),
                    jnp.asarray(dt, dtype),
                    (jnp.zeros((), dtype) if per_member
                     else jnp.minimum(idt, jnp.asarray(dt, dtype))),
                    jnp.asarray(dx, dtype)]).reshape(1, 4)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ops = [uf]
    specs = [vspec]
    if nhelp:
        ops.append(hf)
        specs.append(vspec)
    if npar:
        ops.append(pf)
        specs.append(vspec)
    ops += [xf]
    specs += [vspec]
    if per_member:
        dtb0 = jnp.minimum(member_slab(idt, plan, dtype),
                           jnp.asarray(dt, dtype))
        ops += [dtb0, jnp.zeros((8, C8), dtype)]
        specs += [vspec, vspec]
    ops.append(sc)
    specs.append(sspec)
    out_specs = [vspec, vspec if per_member else sspec, sspec]
    out_shape = [
        jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
        jax.ShapeDtypeStruct((8, C8) if per_member else (1, 1), dtype),
        jax.ShapeDtypeStruct((1, 2), jnp.int32),
    ]
    if per_member:
        out_specs.append(vspec)
        out_shape.append(jax.ShapeDtypeStruct((8, C8), jnp.int32))
    outs = _pcall(
        kernel,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*ops)
    if per_member:
        uf2, dtb, ints, nb = outs
        return (uf2, ints[0, 0], slab_members(dtb, plan), ints[0, 1],
                slab_members(nb, plan))
    uf2, fl, ints = outs
    return uf2, ints[0, 0], fl[0, 0], ints[0, 1]


def row_scan_folded(backend, plan: FoldPlan, tables, s_stages, periodic,
                    uf, hf, pf, xf, dx, dt, nsteps):
    """``nsteps`` fixed-dt ROW steps as ONE pallas_call -> uf_new, or None.
    The in-kernel fori_loop removes even the per-step XLA dispatch/fusion
    overhead of scanning single-step kernels (the launch-bound regime:
    N=200 theta steps measure 8.7us through a lax.scan of single-step
    megakernels; the scan body itself is ~3us of arithmetic)."""
    if not applicable(backend, plan, s_stages):
        return None
    # fixed-dt: no controller reads err — skip the embedded combination
    tables = tables[:3] + (None,) + tables[4:]
    g00 = tables[4]
    dt = jnp.asarray(dt, backend.dtype)
    beta = -jnp.asarray(float(g00), backend.dtype) * dt
    rhs_scale = jnp.asarray(float(g00), backend.dtype) * dt
    uf2, _err = _launch(backend, plan, tables, s_stages, periodic,
                        uf, hf, pf, xf, dx, beta, rhs_scale,
                        nsteps=int(nsteps))
    return uf2


def theta_scan_folded(backend, plan: FoldPlan, theta, periodic,
                      uf, hf, pf, xf, dx, dt, nsteps):
    """``nsteps`` fixed-dt linearized theta steps as ONE pallas_call ->
    uf_new, or None (see row_scan_folded)."""
    if not applicable(backend, plan, 1):
        return None
    import numpy as np

    tables = (np.zeros((1, 1)), np.zeros((1, 1)), np.array([1.0]), None,
              float(theta))
    dt = jnp.asarray(dt, backend.dtype)
    beta = -jnp.asarray(float(theta), backend.dtype) * dt
    uf2, _err = _launch(backend, plan, tables, 1, periodic,
                        uf, hf, pf, xf, dx, beta, dt, nsteps=int(nsteps))
    return uf2


def _launch(backend, plan, tables, s_stages, periodic, uf, hf, pf, xf, dx,
            beta, rhs_scale, nsteps=1):
    dtype = backend.dtype
    K, C8, nvar = plan.K, plan.C8, plan.nvar
    nhelp = len(backend.system.help_funcs)
    npar = len(backend.system.pars)
    sc = jnp.stack([beta, rhs_scale,
                    jnp.asarray(dx, dtype)]).reshape(1, 3)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _step_kernel(backend, plan, tables, s_stages, periodic,
                          nsteps=nsteps)
    ops = [uf]
    specs = [vspec]
    if nhelp:
        ops.append(hf)
        specs.append(vspec)
    if npar:
        ops.append(pf)
        specs.append(vspec)
    ops += [xf, sc]
    specs += [vspec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    uf2, err = _pcall(
        kernel,
        in_specs=specs,
        out_specs=[vspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, K, 8, C8), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
    )(*ops)
    return uf2, err[0, 0]
