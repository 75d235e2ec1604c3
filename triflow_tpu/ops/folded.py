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

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pcall(*args, **kw):
    """pallas_call with an env-controlled interpret switch (CPU testing)."""
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    else:
        from .pallas_thomas import _VMEM_LIMIT
        if _VMEM_LIMIT:
            kw.setdefault("compiler_params",
                          pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    return pl.pallas_call(*args, **kw)

from .pallas_thomas import _inv, _mm, _mv, row_block


class FoldPlan(NamedTuple):
    N: int          # nodes per MEMBER (= the grid size)
    nvar: int
    halo: int
    g: int          # nodes per supernode = max(halo, 1)
    W: int          # band window
    C: int          # real chunks TOTAL (= B * Cm); c = sub * C8 + lane
    Mc: int         # supernode rows per chunk
    K: int          # nodes per chunk = Mc * g
    cyclic_ok: bool  # single member, C a power of two >= 8 -> cyclic PCR
    Cm: int = 0     # chunks per member (0 -> C: single member)

    @property
    def s(self):
        return self.nvar * self.g

    @property
    def B(self):
        """Independent members folded into the chunk axis (ensembles):
        member m owns chunks [m*Cm, (m+1)*Cm)."""
        return 1 if not self.Cm else self.C // self.Cm

    @property
    def Cmm(self):
        """Chunks per member (== C for a single member)."""
        return self.Cm or self.C

    @property
    def C8(self):
        """Lane count of the sublane-packed chunk axis (C padded to 8*C8
        with dead chunks; c = sub * C8 + lane)."""
        return -(-self.C // 8)

    @property
    def Cp(self):
        return 8 * self.C8

    @property
    def last(self):
        """(sub, lane) coordinates of the last REAL chunk c = C - 1."""
        return divmod(self.C - 1, self.C8)


def make_plan(N: int, nvar: int, halo: int, window: int, cap_C=None):
    """Choose (C, Mc) for the folded layout, or None when N doesn't fold.
    ``cap_C`` bounds the chunk count (used to shrink the reduced interface
    system for large supernodes — see plan_for_backend)."""
    from .banded import _fused_chunk_plan, _CHUNK_MIN_M

    g = max(halo, 1)
    if N % g or nvar * g > 8:
        return None
    M = N // g
    if M < _CHUNK_MIN_M:
        return None
    plan = _fused_chunk_plan(M, cap_C=cap_C)
    if plan is None:
        return None
    C, Mc = plan
    return FoldPlan(N, nvar, halo, g, window, C, Mc, Mc * g,
                    C & (C - 1) == 0 and C >= 8)


def make_ensemble_plan(N: int, B: int, nvar: int, halo: int, window: int):
    """Fold B independent members (each an N-node grid) into ONE chunk
    axis: member m owns chunks [m*Cm, (m+1)*Cm).  Every kernel treats the
    members uniformly — halo rings, solver decoupling and the periodic
    closure are member-local via the plan's Cm masks — so an ensemble runs
    at single-grid efficiency instead of a vmap-serialized batch.

    Returns a FoldPlan with ``N = B*n`` total nodes and ``Cm`` chunks per
    member, or None when the shape doesn't fold."""
    g = max(halo, 1)
    if B < 2 or N % g or nvar * g > 8:
        return None
    M = N // g                       # supernode rows per member
    if M < 16:
        return None
    divs = []
    d = 1
    while d * d <= M:
        if M % d == 0:
            divs += [d, M // d]
        d += 1
    out = []
    for Cm in sorted(set(divs), reverse=True):
        if Cm < 2 or M // Cm < 2:
            continue
        C = B * Cm
        if C > 65536:
            continue
        Mc = M // Cm
        out.append(FoldPlan(B * N, nvar, halo, g, window, C, Mc, Mc * g,
                            False, Cm))
    return out or None


def plan_for_ensemble(backend, N, B, accept=None):
    """Member-merged FoldPlan when the folded ensemble path applies (same
    gates as plan_for_backend plus fused-PCR applicability for the
    member-partitioned reduced system), else None.  Candidates are tried
    largest-C first: more chunks means shallower (faster) Thomas sweeps,
    bounded above by the reduced system's VMEM budget.  ``accept`` is an
    extra per-plan predicate (e.g. the whole-step megakernel's gate); only
    plans passing BOTH the grid-kernel gates and ``accept`` are returned,
    so every consumer of the plan keeps a working fallback."""
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
        if jnp.dtype(backend.dtype) != jnp.float32:
            return None  # Mosaic f64: route doubles onto the XLA path
    plans = make_ensemble_plan(N, B, backend.system.nvar, backend.halo,
                               backend.window)
    if not plans:
        return None
    from . import pallas_pcr

    item = jnp.dtype(backend.dtype).itemsize
    for plan in plans:
        if accept is not None and not accept(plan):
            continue
        if not pallas_pcr.applicable(2 * plan.s, plan.C, backend.dtype,
                                     Cm=plan.Cm):
            continue
        call = _FoldedStencilCall(backend, True, plan,
                                  per_row_extra=plan.W * plan.nvar ** 2)
        if not call.applicable():
            continue
        band_bytes = plan.W * plan.nvar ** 2 * plan.g * plan.Cp * item
        blk_bytes = plan.s * plan.s * plan.Cp * item
        if not row_block(plan.Mc, band_bytes + 4 * blk_bytes,
                         budget=6 * 1024 * 1024):
            continue
        return plan
    return None


def fold(a, plan: FoldPlan):
    """(..., N) -> (..., K, 8, C8): the sublane-packed chunk-native layout.

    Chunk c = sub * C8 + lane owns nodes [c*K, (c+1)*K); chunks past C-1
    are dead zero padding (masked out of F/J, decoupled in the solver)."""
    a = jnp.asarray(a)
    C8, K = plan.C8, plan.K
    pad = plan.Cp * K - plan.N
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    new = a.reshape(a.shape[:-1] + (8, C8, K))
    return jnp.moveaxis(new, -1, -3)


def unfold(af, plan: FoldPlan):
    """(..., K, 8, C8) -> (..., N)."""
    af = jnp.asarray(af)
    a = jnp.moveaxis(af, -3, -1)
    flat = a.reshape(a.shape[:-3] + (plan.Cp * plan.K,))
    return flat[..., :plan.N]


# ---------------------------------------------------------------------------
# stencil window machinery (shared by the folded F / J / matvec kernels)
# ---------------------------------------------------------------------------

def _pick_kb(K: int, per_row_bytes: int, budget: int = 2 << 20) -> int:
    """Largest divisor of K within the VMEM budget (K rows sit on a
    non-minor dim in the subfolded layout, so no sublane alignment is
    required; multiples of 8 are preferred when available)."""
    cap = max(1, budget // max(per_row_bytes, 1))
    if K <= cap:
        return K
    best = None
    for d in range(8, cap + 1, 8):
        if K % d == 0:
            best = d
    if best is not None:
        return best
    for d in range(cap, 0, -1):
        if K % d == 0:
            return d
    return None


def _member_masks(plan: FoldPlan):
    """(first, last): boolean (8, C8) masks of every member's first / last
    REAL chunk (exactly chunk 0 / C-1 for a single member)."""
    C8 = plan.C8
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 1)
    if plan.B == 1:
        sub_e, lane_e = plan.last
        return ((sub == 0) & (lane == 0),
                (sub == sub_e) & (lane == lane_e))
    c = sub * C8 + lane
    cm = c % plan.Cmm
    real = c < plan.C
    return (cm == 0) & real, (cm == plan.Cmm - 1) & real


def _ring_shift(x, d, plan: FoldPlan):
    """Shift a (..., 8, C8) slab by one chunk around each member's OWN
    Cm-ring: d=+1 -> out[c] = x[c-1] (member starts read their member's
    last chunk); d=-1 -> out[c] = x[c+1] (member ends read their member's
    first chunk).  Rolls over the padded Cp ring, then patches every member
    boundary with a SECOND roll (Mosaic can't broadcast one element over
    sublanes and lanes at once, so the patch value is produced by a roll,
    not a gather).  Dead-tail chunks receive garbage; every consumer masks
    them."""
    from .pallas_pcr import _roll_c

    C8 = plan.C8
    Cm = plan.Cmm
    rolled = _roll_c(x, d, C8)
    if plan.B == 1 and plan.Cp == plan.C:
        return rolled
    first, last = _member_masks(plan)
    if d == 1:
        alt = _roll_c(x, 1 - Cm, C8)         # alt[m*Cm] = x[(m+1)*Cm - 1]
        return jnp.where(first, alt, rolled)
    alt = _roll_c(x, Cm - 1, C8)             # alt[(m+1)*Cm-1] = x[m*Cm]
    return jnp.where(last, alt, rolled)


def _chunk_halo_window(cur, prev, nxt, h, periodic, tid, ntiles,
                      plan: FoldPlan):
    """Assemble the (rows, Kb + 2h, 8, C8) haloed window of a
    (rows, Kb, 8, C8) tile.

    prev/nxt are either the +-1 K-tiles (modular index maps) or, preferably,
    h-row thin halo blocks (detected by shape): fetching full neighbor tiles
    just to use h rows triples the operand's HBM traffic, so the spec
    builders emit (rows, h, 8, C8) blocks whenever h divides Kb.  On the
    first/last K-tile the out-of-chunk rows come from the neighboring
    CHUNK: a ring shift by one chunk, which is exactly the periodic closure
    at the domain ends; edge mode clamps chunk 0 / C-1 instead."""
    if h == 0:
        return cur
    first, last = _member_masks(plan)

    prev_tail = prev if prev.shape[-3] == h else prev[..., -h:, :, :]
    # chunk-boundary variant: chunk c reads chunk c-1's last rows
    prev_wrap = _ring_shift(prev_tail, 1, plan)
    if not periodic:
        edge = jnp.broadcast_to(cur[..., :1, :, :], prev_wrap.shape)
        prev_wrap = jnp.where(first, edge, prev_wrap)
    prev_tail = jnp.where(tid == 0, prev_wrap, prev_tail)

    nxt_head = nxt if nxt.shape[-3] == h else nxt[..., :h, :, :]
    nxt_wrap = _ring_shift(nxt_head, -1, plan)
    if not periodic:
        edge = jnp.broadcast_to(cur[..., -1:, :, :], nxt_wrap.shape)
        nxt_wrap = jnp.where(last, edge, nxt_wrap)
    nxt_head = jnp.where(tid == ntiles - 1, nxt_wrap, nxt_head)

    return jnp.concatenate([prev_tail, cur, nxt_head], axis=-3)


class _FoldedStencilCall:
    """Operand plumbing for the folded F / J / matvec kernels."""

    def __init__(self, backend, periodic, plan: FoldPlan, per_row_extra=0,
                 n_u=1):
        self.backend = backend
        self.system = backend.system
        self.periodic = periodic
        self.plan = plan
        self.h = backend.halo
        self.nvar = self.system.nvar
        self.nhelp = len(self.system.help_funcs)
        self.npar = len(self.system.pars)
        self.dtype = backend.dtype
        self.n_u = n_u
        item = jnp.dtype(self.dtype).itemsize
        rows = ((3 + n_u) * self.nvar + 3 * self.nhelp + self.npar + 1
                + per_row_extra)
        # wide-operand (fused-stage) calls get a larger tile budget so the
        # K-tile doesn't collapse (Kb 8 -> 4 at n_u=7 costs more in per-
        # grid-step overhead than the fusion saves in traffic).  4MB is the
        # measured ceiling: the ``rows`` estimate below undercounts the
        # kernel's scoped-VMEM stack (halo windows appear per stage vector,
        # plus the combined window and centers kept for the bias combos), and
        # 8MB admitted tiles whose true stack hit ~18MB > the 16MB Mosaic
        # scoped limit (grouped-ensemble OOM at B_g=32); 4MB also measures
        # FASTER at the B=1024 x N=1e5 spec point (4.6 vs 3.8 G cells/s).
        if n_u > 1:
            import os as _os
            budget = int(_os.environ.get("TRIFLOW_FUSED_BUDGET_MB", 4)) << 20
        else:
            budget = 2 << 20
        self.Kb = _pick_kb(plan.K, rows * plan.Cp * item, budget=budget)
        self.ntiles = None if self.Kb is None else plan.K // self.Kb

    def applicable(self):
        return self.Kb is not None and self.h < self.Kb

    def operands(self, uf, helpersf, pstackf, xf, dx):
        """``uf`` is one folded state array, or a list of them (stage-algebra
        fusion: the kernel forms their linear combination in VMEM)."""
        Kb, C8 = self.Kb, self.plan.C8
        nt = self.ntiles

        h = self.h
        import os as _os
        thin = (h > 0 and Kb % h == 0
                and not _os.environ.get("TRIFLOW_NO_THINHALO"))

        def shifted(rows, s):
            if thin and s:
                # h-row halo block instead of the full neighbor tile:
                # fetching Kb rows to use h of them triples the operand's
                # HBM traffic.  Blocks of h rows tile the K axis into
                # K//h blocks; tile i-1's tail block is (i*Kb - h)/h,
                # tile i+1's head block is ((i+1)%nt)*Kb/h.
                kph = Kb // h
                if s < 0:
                    kmap = lambda i: (0, ((i - 1) % nt + 1) * kph - 1, 0, 0)
                else:
                    kmap = lambda i: (0, ((i + 1) % nt) * kph, 0, 0)
                return pl.BlockSpec((rows, h, 8, C8), kmap,
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(
                (rows, Kb, 8, C8),
                lambda i, s=s: (0, (i + s) % nt, 0, 0),
                memory_space=pltpu.VMEM,
            )

        ops, specs = [], []
        for u in (uf if isinstance(uf, (list, tuple)) else [uf]):
            ops += [u, u, u]
            specs += [shifted(self.nvar, -1), shifted(self.nvar, 0),
                      shifted(self.nvar, 1)]
        if self.nhelp:
            ops += [helpersf, helpersf, helpersf]
            specs += [shifted(self.nhelp, -1), shifted(self.nhelp, 0),
                      shifted(self.nhelp, 1)]
        if self.npar:
            ops.append(pstackf)
            specs.append(shifted(self.npar, 0))
        ops.append(xf)
        specs.append(pl.BlockSpec((Kb, 8, C8), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
        ops.append(jnp.asarray(dx, self.dtype).reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        return ops, specs

    def build_args(self, refs, u_coefs=None):
        """Stencil args from kernel refs.  With ``u_coefs`` (static floats,
        one per u operand) the stencil input is their linear combination —
        the center blocks are kept on ``self._u_centers`` so the caller can
        reuse them (bias combos) without re-reading HBM."""
        it = iter(refs)
        tid = pl.program_id(0)
        h, nt = self.h, self.ntiles
        if u_coefs is None:
            u_l, u_c, u_r = next(it)[...], next(it)[...], next(it)[...]
            self._u_centers = [u_c]
        else:
            u_l = u_c = u_r = None
            self._u_centers = []
            for c in u_coefs:
                l, ce, r = next(it)[...], next(it)[...], next(it)[...]
                self._u_centers.append(ce)
                if not c:
                    continue
                lw = l if c == 1.0 else c * l
                cw = ce if c == 1.0 else c * ce
                rw = r if c == 1.0 else c * r
                u_l = lw if u_l is None else u_l + lw
                u_c = cw if u_c is None else u_c + cw
                u_r = rw if u_r is None else u_r + rw
        u_win = _chunk_halo_window(u_c, u_l, u_r, h, self.periodic, tid, nt,
                                   self.plan)
        if self.nhelp:
            he_l, he_c, he_r = next(it)[...], next(it)[...], next(it)[...]
            he_win = _chunk_halo_window(he_c, he_l, he_r, h, self.periodic,
                                        tid, nt, self.plan)
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
            args.append(named[var][h + off: h + off + Kb, :, :])
        for idx in range(self.npar):
            args.append(ps[idx])
        args.append(dx)
        return args

    def dead_mask(self):
        return _dead_mask(self.plan)


def _dead_mask(plan: FoldPlan):
    """(8, C8) boolean mask of the dead padding chunks (c >= C)."""
    if plan.Cp == plan.C:
        return None
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, plan.C8), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, plan.C8), 1)
    return (sub * plan.C8 + lane) >= plan.C


def eval_F_folded(backend, uf, helpersf, pstackf, xf, dx, periodic, plan,
                  scale=None, bias=None, u_terms=None):
    """F(u) in folded layout -> (nvar, K, 8, C8); dead chunks emit 0.

    With ``scale``/``bias`` the kernel emits ``scale * F(u) + bias``
    directly (the ROW stage RHS), fusing the stage-algebra axpy that would
    otherwise re-read F from HBM.

    With ``u_terms = [(a_coef, bias_coef, array), ...]`` (static float
    coefficients) the kernel evaluates F at ``Σ a_coef·array`` and adds
    ``Σ bias_coef·array`` to the output — the full ROW stage RHS
    ``gdt·F(u + Σa·u_j) + Σc·u_j`` in ONE pass over the stage vectors,
    eliminating the materialize-then-reload of the combined stage input
    and bias (4 extra HBM passes per stage without the fusion).  ``uf``
    and ``bias`` must be None in this mode."""
    if u_terms is not None:
        a_coefs = [float(t[0]) for t in u_terms]
        b_coefs = [float(t[1]) for t in u_terms]
        u_ops = [t[2] for t in u_terms]
    else:
        a_coefs = b_coefs = None
        u_ops = uf
    call = _FoldedStencilCall(backend, periodic, plan,
                              n_u=1 if u_terms is None else len(u_terms))
    if u_terms is not None and not call.applicable():
        return None         # caller falls back to combine + biased-F passes
    nvar, dtype, Kb, C8 = call.nvar, call.dtype, call.Kb, plan.C8
    has_scale = scale is not None
    has_bias = bias is not None

    def kernel(*refs):
        refs = list(refs)
        out_ref = refs.pop()
        bias_ref = refs.pop() if has_bias else None
        scale_ref = refs.pop() if has_scale else None
        args = call.build_args(refs, u_coefs=a_coefs)
        rows = [jnp.broadcast_to(jnp.asarray(fn(*args), dtype), (Kb, 8, C8))
                for fn in backend._F_fns]
        out = jnp.stack(rows)
        if has_scale:
            out = scale_ref[0, 0] * out
        dead = call.dead_mask()
        if dead is not None:
            # dead chunks run the stencil on zero padding (which can produce
            # inf/nan for e.g. 1/h**3 terms): mask them out so the error
            # estimate and stage algebra stay finite
            out = jnp.where(dead, 0.0, out)
        if has_bias:
            out = out + bias_ref[...]
        if b_coefs is not None:
            for c, blk in zip(b_coefs, call._u_centers):
                if c:
                    out = out + (blk if c == 1.0 else c * blk)
        out_ref[...] = out

    ops, specs = call.operands(u_ops, helpersf, pstackf, xf, dx)
    if has_scale:
        ops.append(jnp.asarray(scale, dtype).reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
    if has_bias:
        ops.append(bias)
        specs.append(pl.BlockSpec((nvar, Kb, 8, C8), lambda i: (0, i, 0, 0),
                                  memory_space=pltpu.VMEM))
    return _pcall(
        kernel,
        grid=(call.ntiles,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nvar, Kb, 8, C8), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, plan.K, 8, C8), dtype),
    )(*ops)


def combine_folded(rows, arrays, plan):
    """out[k] = Σ_j rows[k][j] · arrays[j] for every coefficient row, in ONE
    memory pass: each input block is fetched once and every output written
    once.  ``rows`` are static floats (ROW stage-algebra coefficients).

    This replaces the per-combination XLA axpy chains of the stage algebra,
    which re-stream every operand for every combination — measured 37% of a
    production-size ensemble step (B=1024 x N=1e5); an einsum over a
    stacked operand was tried first and is slower (XLA materializes the
    stack)."""
    a0 = arrays[0]
    nvar, K = a0.shape[0], a0.shape[1]
    C8 = plan.C8
    item = jnp.dtype(a0.dtype).itemsize
    nio = len(arrays) + len(rows)
    Kb = _pick_kb(K, nio * nvar * 8 * C8 * item)
    import os as _os
    if _os.environ.get("TRIFLOW_NO_COMBINE"):
        Kb = None
    rows_t = tuple(tuple(float(c) for c in row) for row in rows)
    if Kb is None:
        outs = []
        for row in rows_t:
            acc = None
            for c, arr in zip(row, arrays):
                if c:
                    t = arr if c == 1.0 else c * arr
                    acc = t if acc is None else acc + t
            outs.append(acc if acc is not None else jnp.zeros_like(a0))
        return outs

    def kernel(*refs):
        ins = refs[:len(arrays)]
        outs = refs[len(arrays):]
        vals = [r[...] for r in ins]
        for k, row in enumerate(rows_t):
            acc = None
            for c, v in zip(row, vals):
                if c:
                    t = v if c == 1.0 else c * v
                    acc = t if acc is None else acc + t
            outs[k][...] = (acc if acc is not None
                            else jnp.zeros_like(vals[0]))

    spec = pl.BlockSpec((nvar, Kb, 8, C8), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return list(_pcall(
        kernel,
        grid=(K // Kb,),
        in_specs=[spec] * len(arrays),
        out_specs=[spec] * len(rows),
        out_shape=[jax.ShapeDtypeStruct(a0.shape, a0.dtype) for _ in rows],
    )(*arrays))


def _j_band_block(backend, call, refs, periodic, plan, dtype):
    """One (W, nvar, nvar, Kb, 8, C8) tile of the banded Jacobian, computed
    inside a pallas kernel from the stencil operand refs (the shared body
    of eval_J_folded and the fused J+factor sweep).  ``call.Kb`` must match
    the caller's grid tiling (grid step i covers K-rows [i*Kb, (i+1)*Kb))."""
    args = call.build_args(refs)
    return _j_rows_values(backend, args, call.Kb, pl.program_id(0),
                          call.ntiles, periodic, plan, dtype)


def _j_rows_values(backend, args, Kb, tid, nt, periodic, plan, dtype):
    """Banded-Jacobian tile (W, nvar, nvar, Kb, 8, C8) from already-built
    stencil args — the value-level body shared by the grid kernels
    (via ``_j_band_block``) and the single-launch whole-step kernel
    (ops/megastep.py), which builds its args from whole-array VMEM values
    (Kb = K, tid = 0, nt = 1)."""
    nvar, W, h = backend.system.nvar, plan.W, plan.halo
    C8 = plan.C8
    krow = jax.lax.broadcasted_iota(jnp.int32, (Kb, 8, C8), 0)
    first, last = _member_masks(plan)
    zero = jnp.zeros((Kb, 8, C8), dtype)
    rows = {}
    for (m, n, kb), fn in backend._J_fns.items():
        rows[(kb, m, n)] = jnp.broadcast_to(
            jnp.asarray(fn(*args), dtype), (Kb, 8, C8))

    def get(kb, m, n):
        return rows.get((kb, m, n), zero)

    if not periodic:
        # left edge: global node i = k (row i, chunk 0) on tile 0
        for m in range(nvar):
            for n in range(nvar):
                for i in range(h):
                    for kb in range(h - i):
                        mask = (tid == 0) & (krow == i) & first
                        src = get(kb, m, n)
                        rows[(h - i, m, n)] = jnp.where(
                            mask, get(h - i, m, n) + src,
                            get(h - i, m, n))
                        rows[(kb, m, n)] = jnp.where(mask, 0.0, src)
                for i in range(h):
                    for kb in range(h - i):
                        koff = W - 1 - kb
                        mask = ((tid == nt - 1) & (krow == Kb - 1 - i)
                                & last)
                        src = get(koff, m, n)
                        rows[(h + i, m, n)] = jnp.where(
                            mask, get(h + i, m, n) + src,
                            get(h + i, m, n))
                        rows[(koff, m, n)] = jnp.where(mask, 0.0, src)

    dead = _dead_mask(plan)
    if dead is not None:
        rows = {k: jnp.where(dead, 0.0, v) for k, v in rows.items()}

    return jnp.stack(
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


def eval_J_folded(backend, uf, helpersf, pstackf, xf, dx, periodic, plan):
    """Banded Jacobian in folded layout -> (W, nvar, nvar, K, 8, C8).

    ``bands[kb, m, n, k, (sub,lane)] = dF_m/du_n`` at the stencil offset
    kb - h; dead chunks are zeroed (their factor rows reduce to alpha*I).
    Edge mode folds out-of-domain dependencies onto the boundary columns
    (global node 0 lives at (row 0, chunk 0); node N-1 at (row K-1,
    chunk C-1))."""
    call = _FoldedStencilCall(backend, periodic, plan,
                              per_row_extra=plan.W * backend.system.nvar ** 2)
    nvar, dtype, Kb, C8 = call.nvar, call.dtype, call.Kb, plan.C8
    W = plan.W
    h = plan.halo
    nt = call.ntiles

    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[...] = _j_band_block(backend, call, refs[:-1], periodic,
                                     plan, dtype)

    ops, specs = call.operands(uf, helpersf, pstackf, xf, dx)
    return _pcall(
        kernel,
        grid=(nt,),
        in_specs=specs,
        out_specs=pl.BlockSpec((W, nvar, nvar, Kb, 8, C8),
                               lambda i: (0, 0, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, nvar, nvar, plan.K, 8, C8),
                                       dtype),
    )(*ops)


def matvec_folded(bands_f, vf, periodic, plan):
    """(J @ v) with both operands in folded layout (..., K, 8, C8)."""
    W, nvar = plan.W, plan.nvar
    h = plan.halo
    C8 = plan.C8
    dtype = vf.dtype
    item = jnp.dtype(dtype).itemsize
    Kb = _pick_kb(plan.K, (4 * nvar + W * nvar * nvar) * plan.Cp * item)
    nt = plan.K // Kb

    import os as _os
    thin = (h > 0 and Kb % h == 0
            and not _os.environ.get("TRIFLOW_NO_THINHALO"))

    def shifted(rows, s):
        if thin and s:
            kph = Kb // h
            if s < 0:
                kmap = lambda i: (0, ((i - 1) % nt + 1) * kph - 1, 0, 0)
            else:
                kmap = lambda i: (0, ((i + 1) % nt) * kph, 0, 0)
            return pl.BlockSpec((rows, h, 8, C8), kmap,
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, Kb, 8, C8),
                            lambda i, s=s: (0, (i + s) % nt, 0, 0),
                            memory_space=pltpu.VMEM)

    bspec = pl.BlockSpec((W, nvar, nvar, Kb, 8, C8),
                         lambda i: (0, 0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM)

    def kernel(b_ref, v_l, v_c, v_r, out_ref):
        tid = pl.program_id(0)
        if h == 0:
            v_win = v_c[...]
        else:
            v_win = _chunk_halo_window(v_c[...], v_l[...], v_r[...], h,
                                       periodic, tid, nt, plan)
            if not periodic:
                # ghost columns contribute zero (edge-folded bands), so mask
                # the clamped window copies back to zero
                first, last = _member_masks(plan)
                head = jnp.where((tid == 0) & first, 0.0,
                                 v_win[..., :h, :, :])
                tail = jnp.where((tid == nt - 1) & last, 0.0,
                                 v_win[..., -h:, :, :])
                v_win = jnp.concatenate(
                    [head, v_win[..., h:-h, :, :], tail], axis=-3)
        rows = []
        for m in range(nvar):
            acc = None
            for kb in range(W):
                for n in range(nvar):
                    term = b_ref[kb, m, n] * v_win[n, kb: kb + Kb, :, :]
                    acc = term if acc is None else acc + term
            rows.append(acc)
        out_ref[...] = jnp.stack(rows)

    return _pcall(
        kernel,
        grid=(nt,),
        in_specs=[bspec, shifted(nvar, -1), shifted(nvar, 0),
                  shifted(nvar, 1)],
        out_specs=pl.BlockSpec((nvar, Kb, 8, C8), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nvar, plan.K, 8, C8), dtype),
    )(bands_f, vf, vf, vf)


def matvec_df_ok(plan) -> bool:
    """True when matvec_df_folded has a workable tile for this plan."""
    Kb = _pick_kb(plan.K,
                  2 * (4 * plan.nvar + plan.W * plan.nvar ** 2)
                  * plan.Cp * 4)
    return Kb is not None and plan.halo < Kb


def matvec_df_folded(bands_df, vf_df, periodic, plan):
    """df64 (J @ v) with both operands as DF pairs in folded layout.

    The precision twin of matvec_folded: same window/ring plumbing, but
    every product is an error-free-transform chain (ops/df64.mul_/add_ —
    mantissa-mask splits, contraction-immune on every backend) on (hi, lo)
    slabs held in VMEM.  This is the hot op of the mixed df64 stage solve:
    the XLA node-layout banded_matvec_df measured 2.8 ms at N=1e6 on the
    v5e (6 calls = 64% of the 26 ms RODASPR step); in-VMEM EFT chains cut
    the intermediate traffic.  Returns a DF of folded shape.
    """
    from .df64 import DF, add_, mul_

    W, nvar = plan.W, plan.nvar
    h = plan.halo
    C8 = plan.C8
    dtype = jnp.float32
    item = 4
    Kb = _pick_kb(plan.K,
                  2 * (4 * nvar + W * nvar * nvar) * plan.Cp * item)
    if Kb is None or h >= Kb:
        return None                   # caller falls back to the XLA matvec
    nt = plan.K // Kb

    import os as _os
    thin = (h > 0 and Kb % h == 0
            and not _os.environ.get("TRIFLOW_NO_THINHALO"))

    def shifted(rows, s):
        if thin and s:
            kph = Kb // h
            if s < 0:
                kmap = lambda i: (0, ((i - 1) % nt + 1) * kph - 1, 0, 0)
            else:
                kmap = lambda i: (0, ((i + 1) % nt) * kph, 0, 0)
            return pl.BlockSpec((rows, h, 8, C8), kmap,
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, Kb, 8, C8),
                            lambda i, s=s: (0, (i + s) % nt, 0, 0),
                            memory_space=pltpu.VMEM)

    bspec = pl.BlockSpec((W, nvar, nvar, Kb, 8, C8),
                         lambda i: (0, 0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM)

    def window(v_l, v_c, v_r, tid):
        if h == 0:
            return v_c[...]
        v_win = _chunk_halo_window(v_c[...], v_l[...], v_r[...], h,
                                   periodic, tid, nt, plan)
        if not periodic:
            # ghost columns contribute zero (edge-folded bands): mask the
            # clamped window copies back to zero
            first, last = _member_masks(plan)
            head = jnp.where((tid == 0) & first, 0.0, v_win[..., :h, :, :])
            tail = jnp.where((tid == nt - 1) & last, 0.0,
                             v_win[..., -h:, :, :])
            v_win = jnp.concatenate(
                [head, v_win[..., h:-h, :, :], tail], axis=-3)
        return v_win

    def kernel(bh_ref, bl_ref, vh_l, vh_c, vh_r, vl_l, vl_c, vl_r,
               oh_ref, ol_ref):
        tid = pl.program_id(0)
        wh = window(vh_l, vh_c, vh_r, tid)
        wl = window(vl_l, vl_c, vl_r, tid)
        rows_h, rows_l = [], []
        for m in range(nvar):
            acc = None
            for kb in range(W):
                for n in range(nvar):
                    ph, pe = mul_(bh_ref[kb, m, n], bl_ref[kb, m, n],
                                  wh[n, kb: kb + Kb, :, :],
                                  wl[n, kb: kb + Kb, :, :])
                    acc = ((ph, pe) if acc is None
                           else add_(acc[0], acc[1], ph, pe))
            rows_h.append(acc[0])
            rows_l.append(acc[1])
        oh_ref[...] = jnp.stack(rows_h)
        ol_ref[...] = jnp.stack(rows_l)

    out_spec = pl.BlockSpec((nvar, Kb, 8, C8), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    oh, ol = _pcall(
        kernel,
        grid=(nt,),
        in_specs=[bspec, bspec, shifted(nvar, -1), shifted(nvar, 0),
                  shifted(nvar, 1), shifted(nvar, -1), shifted(nvar, 0),
                  shifted(nvar, 1)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nvar, plan.K, 8, C8), dtype),
                   jax.ShapeDtypeStruct((nvar, plan.K, 8, C8), dtype)),
    )(bands_df.hi, bands_df.lo, vf_df.hi, vf_df.hi, vf_df.hi,
      vf_df.lo, vf_df.lo, vf_df.lo)
    return DF.wrap(oh, ol)


# ---------------------------------------------------------------------------
# fused assembly + factor sweeps reading folded bands
# ---------------------------------------------------------------------------

def _row_from_folded_bands(b_blk, alpha, beta, g, nvar, h, W, i, dblock,
                           space, dtype):
    """One supernode block row (s, s, 8, C8) from a
    (W, nvar, nvar, r*g, 8, C8) band tile at in-block row i: entry
    [a*nvar+m, b*nvar+n] = beta * band[h + (b-a) + dblock*g, m, n, i*g + a]
    (+ alpha on the diagonal for dblock == 0)."""
    rows = []
    for a in range(g):
        for m in range(nvar):
            row = []
            for bb in range(g):
                for n in range(nvar):
                    delta = (bb - a) + dblock * g
                    if abs(delta) > h:
                        row.append(jnp.zeros(space, dtype))
                    else:
                        val = beta * b_blk[h + delta, m, n, i * g + a]
                        if dblock == 0 and a == bb and m == n:
                            val = val + alpha
                        row.append(val)
            rows.append(jnp.stack(row))
    return jnp.stack(rows)


def factor_sweeps_folded(bands_f, alpha, beta, plan: FoldPlan, cyclic: bool,
                         stencil=None):
    """Factor sweeps reading the folded band array directly (no HBM-level
    chunk transpose).  With ``cyclic`` the wrap couplings of chunk 0 / C-1
    stay in Tl/Tr so the reduced interface system is block-cyclic (periodic
    closure without any Woodbury correction; requires power-of-two C).

    Dead padding chunks have zero bands (eval_J_folded masks them), so
    their factor rows reduce to alpha*I — decoupled and invertible.

    With ``stencil = (backend, uf, helpersf, pstackf, xf, dx, periodic)``
    the band rows are computed INSIDE the forward sweep from the state
    (``bands_f`` must be None): the J array is never materialized in HBM,
    saving its write + read (4.1GB per step on the B=1024 ensemble).
    Falls back to the two-pass form when the fused tile doesn't apply.

    Returns fac, Dhinv, Uc, W, V, DU (all (Mc, s, s, 8, C8)) plus Tl, Tr."""
    from .pallas_thomas import _bwd_factor_call, _inv_t, _mm_t

    W, nvar, g, C, Mc = plan.W, plan.nvar, plan.g, plan.C, plan.Mc
    C8 = plan.C8
    h = plan.halo
    s = plan.s
    dtype = (bands_f.dtype if bands_f is not None
             else stencil[0].dtype)
    item = jnp.dtype(dtype).itemsize
    band_bytes = W * nvar * nvar * g * plan.Cp * item
    blk_bytes = s * s * plan.Cp * item
    # generous VMEM budget: the factor sweep is launch/latency-bound, so
    # bigger row blocks (fewer sequential grid steps) win as long as the
    # double-buffered blocks still fit VMEM (~16MB)
    r = row_block(Mc, band_bytes + 4 * blk_bytes, budget=6 * 1024 * 1024)
    if not r:
        raise ValueError(
            f"no workable row block for Mc={Mc}, g={g}")
    Nb = Mc // r
    band_blk = (W, nvar, nvar, r * g, 8, C8)
    blk = (r, s, s, 8, C8)
    space = (8, C8)

    call = None
    if stencil is not None:
        backend, uf, hf, pf, xf, dx, periodic = stencil
        call = _FoldedStencilCall(backend, periodic, plan)
        # align the stencil tiling with the sweep's row blocks: grid step j
        # covers K-rows [j*r*g, (j+1)*r*g)
        call.Kb = r * g
        call.ntiles = Nb
        if not (h < call.Kb):
            raise ValueError("fused J+factor tile smaller than the halo")
        # helper/param-heavy models can blow the sweep's VMEM with their
        # stencil operands (Kb here is fixed by the row block, not by
        # _pick_kb's budget): bail to the two-pass form instead
        rows_est = 3 * call.nvar + 3 * call.nhelp + call.npar + 1
        if rows_est * call.Kb * plan.Cp * item > (8 << 20):
            raise ValueError("fused J+factor stencil operands exceed VMEM")
        sten_ops, sten_specs = call.operands(uf, hf, pf, xf, dx)
        n_sten = len(sten_ops)

    def fwd_kernel(*krefs):
        if call is None:
            ab_ref, b_ref = krefs[0], krefs[1]
            sten_refs = None
        else:
            ab_ref = krefs[0]
            sten_refs = krefs[1:1 + n_sten]
        (fac_ref, Dhinv_ref, wt_ref, U_ref, Tl_ref, Tr_ref,
         dhinv_c, uprev_c, wt_c) = krefs[-9:]
        j = pl.program_id(0)
        Nb_n = pl.num_programs(0)
        alpha_v = ab_ref[0, 0]
        beta_v = ab_ref[0, 1]
        first, last = _member_masks(plan)

        @pl.when(j == 0)
        def _():
            dhinv_c[...] = jnp.zeros_like(dhinv_c)
            uprev_c[...] = jnp.zeros_like(uprev_c)
            wt_c[...] = jnp.zeros_like(wt_c)

        if call is None:
            b_blk = b_ref[...]
        else:
            b_blk = _j_band_block(backend, call, sten_refs,
                                  periodic, plan, dtype)
        dhinv = dhinv_c[...]
        uprev = uprev_c[...]
        wt = wt_c[...]
        for i in range(r):
            L_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, -1, space, dtype)
            D_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, 0, space, dtype)
            U_row = _row_from_folded_bands(b_blk, alpha_v, beta_v, g, nvar,
                                           h, W, i, 1, space, dtype)
            if i == 0:
                Tl = L_row if cyclic else jnp.where(first, 0.0, L_row)

                @pl.when(j == 0)
                def _(Tl=Tl):
                    Tl_ref[...] = Tl

                L_row = jnp.where(j == 0, 0.0, L_row)
            if i == r - 1:
                Tr = U_row if cyclic else jnp.where(last, 0.0, U_row)

                @pl.when(j == Nb_n - 1)
                def _(Tr=Tr):
                    Tr_ref[...] = Tr

                U_row = jnp.where(j == Nb_n - 1, 0.0, U_row)

            fac = _mm_t(L_row, dhinv, 2)
            dhinv = _inv_t(D_row - _mm_t(fac, uprev, 2), 2)
            if i == 0:
                wt = jnp.where(j == 0, Tl, -_mm_t(fac, wt, 2))
            else:
                wt = -_mm_t(fac, wt, 2)
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
    ab_spec = pl.BlockSpec((1, 2), lambda j: (0, 0),
                           memory_space=pltpu.SMEM)
    if call is None:
        in_ops = [ab, bands_f]
        in_specs = [ab_spec,
                    pl.BlockSpec(band_blk, lambda j: (0, 0, 0, j, 0, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        in_ops = [ab] + list(sten_ops)
        in_specs = [ab_spec] + list(sten_specs)
    fac, Dhinv, wt, Uc, Tl, Tr = _pcall(
        fwd_kernel,
        grid=(Nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda j: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s) + space, lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s) + space, lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((Mc, s, s) + space, dtype),
            jax.ShapeDtypeStruct((s, s) + space, dtype),
            jax.ShapeDtypeStruct((s, s) + space, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, s) + space, dtype),
            pltpu.VMEM((s, s) + space, dtype),
            pltpu.VMEM((s, s) + space, dtype),
        ],
    )(*in_ops)

    if flat_solve_ok(plan, dtype):
        from .pallas_thomas import _bwd_factor_call_cols

        W_, V_, DU = _bwd_factor_call_cols(Dhinv, Uc, wt, Tr, Mc, s, C,
                                           dtype, r)
        return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr
    W_, V_, DU = _bwd_factor_call(Dhinv, Uc, wt, Tr, Mc, s, C, dtype, r)
    return fac, Dhinv, Uc, W_, V_, DU, Tl, Tr


def flat_solve_ok(plan: FoldPlan, dtype) -> bool:
    """True when the nvar==1 flat-RHS solve path applies: spikes are stored
    column-split (s, K, 8, C8) and the per-stage solves run on (K, 8, C8)
    arrays with no relayout (pallas_thomas.chunked_solve_flat — single
    launch when the intermediate fits VMEM, two launches otherwise)."""
    import os

    if os.environ.get("TRIFLOW_NO_FLAT"):
        return False
    if plan.nvar != 1:
        return False
    item = jnp.dtype(dtype).itemsize
    blk_bytes = plan.s * plan.s * plan.Cp * item
    vec_bytes = plan.s * plan.Cp * item
    return bool(row_block(plan.Mc, 3 * blk_bytes + 2 * vec_bytes))


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

    def solve(self, rhs_f, add_to=None):
        return solve_folded(self, rhs_f, add_to=add_to)


@jax.tree_util.register_pytree_node_class
class WrappedPcr:
    """Acyclic PCR factorization of the reduced interface system plus a
    rank-2s Woodbury correction restoring the periodic corner couplings —
    the periodic closure for NON-power-of-two chunk counts, applied to the
    sublane-packed (2s, 8, C8) interface system instead of the full state
    (the wrap couples only interface unknowns, so correcting the tiny
    reduced system is equivalent to correcting the full one at ~Mc times
    less work)."""

    def __init__(self, red0, Z, cap_inv, s, C, Cm=0):
        self.red0 = red0
        self.Z = Z                    # (2s, 2s, 8, C8): A0^-1 @ Uw columns
        self.cap_inv = cap_inv        # (2s, 2s), or (B, 2s, 2s) per member
        self.s = s
        self.C = C
        self.Cm = Cm

    def tree_flatten(self):
        return ((self.red0, self.Z, self.cap_inv),
                (self.s, self.C, self.Cm))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    def _vt(self, y):
        # v_i^T y: i < s selects y[s+i] at chunk C-1, i >= s selects y[i-s]
        # at chunk 0
        s = self.s
        C8 = self.Z.shape[-1]
        sub_e, lane_e = divmod(self.C - 1, C8)
        return jnp.concatenate(
            [y[..., s:, sub_e, lane_e], y[..., :s, 0, 0]], axis=-1)

    def solve(self, b):
        from .pallas_pcr import _subfold, _subunfold

        y = _red_solve(self.red0, b)
        if self.Cm in (0, self.C):
            coef = jnp.einsum("ij,...j->...i", self.cap_inv, self._vt(y))
            return y - jnp.tensordot(coef, self.Z, axes=([-1], [0]))
        # per-member wrap: one rank-2s correction per member, applied on
        # that member's chunk range (the reduced matrix is block-diagonal
        # over members, so Z_j's columns have per-member support)
        s, C, Cm = self.s, self.C, self.Cm
        B = C // Cm
        C8 = self.Z.shape[-1]
        yf = _subunfold(y, C)                    # (..., 2s, C)
        seg = yf.reshape(yf.shape[:-1] + (B, Cm))
        vt = jnp.concatenate(
            [jnp.moveaxis(seg[..., s:, :, -1], -2, -1),
             jnp.moveaxis(seg[..., :s, :, 0], -2, -1)], axis=-1)
        coef = jnp.einsum("bij,...bj->...bi", self.cap_inv, vt)
        coef_c = jnp.repeat(coef, Cm, axis=-2)   # (..., C, 2s)
        Zf = _subunfold(self.Z, C)               # (2s_j, 2s_v, C)
        corr = jnp.einsum("...cj,jvc->...vc", coef_c, Zf)
        return y - _subfold(corr, C8)


@jax.tree_util.register_pytree_node_class
class _RedXla:
    """XLA level-loop fallback for the reduced factorization when the fused
    PCR kernel doesn't apply (e.g. supernode size 16): unfolds the
    sublane-packed operands, runs banded's XLA PCR, refolds."""

    def __init__(self, fact, C):
        self.fact = fact
        self.C = C

    def tree_flatten(self):
        return (self.fact,), (self.C,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], aux[0])


def _red_factor_sub(Lp, Dp, Up, C, cyclic, Cm=0):
    """Factor the subfolded reduced system: fused PCR kernel, or the XLA
    fallback behind an unfold/refold shim (single member only — ensemble
    plans require the fused kernel and are gated on its applicability)."""
    from . import pallas_pcr
    from .banded import _pcr_factor_xla

    s2 = Lp.shape[-4]
    if pallas_pcr.applicable(s2, C, Lp.dtype, cyclic=cyclic, Cm=Cm):
        return pallas_pcr.pcr_factor_fused_sub(Lp, Dp, Up, C, cyclic, Cm=Cm)
    if Cm and Cm != C:
        raise ValueError(
            "member-partitioned reduced system requires the fused PCR "
            "kernel (gate ensemble plans on pallas_pcr.applicable)")
    unf = lambda a: pallas_pcr._subunfold(a, C)
    return _RedXla(_pcr_factor_xla(unf(Lp), unf(Dp), unf(Up), cyclic), C)


def _red_solve(red, b):
    """Solve the subfolded reduced system with b (..., s2, 8, C8)."""
    from . import pallas_pcr
    from .banded import _pcr_solve_xla

    if isinstance(red, _RedXla):
        C8 = b.shape[-1]
        y = _pcr_solve_xla(red.fact, pallas_pcr._subunfold(b, red.C))
        return pallas_pcr._subfold(y, C8)
    return pallas_pcr.pcr_solve_fused_sub(red, b)


def _reduced_LU(Wsp, Vsp, plan: FoldPlan, col_split: bool):
    """Assemble the reduced-system L/U blocks (2s, 2s, 8, C8) by stacking
    tile rows straight off the spike arrays.  No transposes, no scatter
    updates: transpose-fed dynamic-update-slices once made XLA pick a
    lanes-last layout for these tiny arrays, costing ~2.6ms/step in
    relayouts."""
    s, K = plan.s, plan.K
    d2 = 2 * s
    dtype = Wsp.dtype
    zero = jnp.zeros((8, plan.C8), dtype)

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


def _reduced_factor(Lred, Ured, plan: FoldPlan, cyclic, wrap=False):
    """PCR factorization of the chunk-interface system (supernode c =
    (x_c^top, x_c^bot), size 2s) from the assembled subfolded L/U blocks.
    With ``cyclic`` the ring couplings stay (block-cyclic PCR over
    power-of-two C, single member only).  With ``wrap`` (and not cyclic)
    every member's ring is restored by a rank-2s Woodbury correction on
    this reduced system (one correction per member, factored jointly —
    the reduced matrix is block-diagonal over members)."""
    from .banded import _small_inv

    C, C8, s = plan.C, plan.C8, plan.s
    Cm = plan.Cmm
    d2 = 2 * s
    dtype = Lred.dtype
    Dred = jnp.broadcast_to(jnp.eye(d2, dtype=dtype)[..., None, None],
                            Lred.shape)
    if cyclic:
        return _red_factor_sub(Lred, Dred, Ured, C, True)
    first, last = _member_masks(plan)
    Lred0 = jnp.where(first, 0.0, Lred)
    Ured0 = jnp.where(last, 0.0, Ured)
    red0 = _red_factor_sub(Lred0, Dred, Ured0, C, False,
                           Cm=(Cm if plan.B > 1 else 0))
    if not wrap:
        return red0
    # Woodbury columns: u_j = e_(member start) (x) Lred[:, s+j]  (j <  s)
    #                   u_j = e_(member end)   (x) Ured[:, j-s]  (j >= s)
    # (the masked Lred/Ured values AT the member boundary ARE that member's
    # wrap corner blocks, so no per-member gathering is needed)
    zero = jnp.zeros_like(Lred[:, 0])
    rhs = jnp.stack(
        [jnp.where(first, Lred[:, s + j], 0.0) if j < s
         else jnp.where(last, Ured[:, j - s], 0.0)
         for j in range(d2)]
    )                                            # (2s_j, 2s_v, 8, C8)
    del zero
    Z = _red_solve(red0, rhs)                    # (2s_j, 2s_v, 8, C8)
    if plan.B == 1:
        sub_e, lane_e = plan.last
        # cap[i, j] = delta_ij + v_i^T Z_j
        vtz = jnp.concatenate(
            [Z[..., s:, sub_e, lane_e], Z[..., :s, 0, 0]], axis=-1)
        cap = jnp.eye(d2, dtype=dtype) + vtz.T
        cap_inv = (_small_inv(cap[..., None])[..., 0]
                   if d2 <= 8 else jnp.linalg.inv(cap))
        return WrappedPcr(red0, Z, cap_inv, s, C)
    # per-member capacitance: vtz[m, j, i] = v_i^T Z_j on member m
    from .pallas_pcr import _subunfold

    B = plan.B
    Zf = _subunfold(Z, C)                        # (2s_j, 2s_v, C)
    seg = Zf.reshape(d2, d2, B, Cm)
    vtz = jnp.concatenate([seg[:, s:, :, -1], seg[:, :s, :, 0]],
                          axis=1)                # (2s_j, 2s_i, B)
    cap = jnp.eye(d2, dtype=dtype)[None] + jnp.transpose(vtz, (2, 1, 0))
    if d2 <= 8:
        cap_inv = jnp.moveaxis(
            _small_inv(jnp.moveaxis(cap, 0, -1)), -1, 0)
    else:
        cap_inv = jnp.linalg.inv(cap)
    return WrappedPcr(red0, Z, cap_inv, s, C, Cm)


def factor_folded(alpha, beta, bands_f, periodic, plan: FoldPlan,
                  stencil=None):
    """Factor ``alpha*I + beta*J`` from folded bands.

    Periodic closure lives entirely in the reduced interface system (the
    wrap couples only interface unknowns): block-cyclic reduced PCR when C
    is a power of two, else acyclic reduced PCR + rank-2s Woodbury on the
    reduced system (WrappedPcr).  No full-state correction is ever needed."""
    wrap = bool(periodic) and plan.halo > 0
    fac, Dhinv, Uc, Wsp, Vsp, DU, Tl, Tr = factor_sweeps_folded(
        bands_f, alpha, beta, plan, wrap, stencil=stencil)
    cyclic = wrap and plan.cyclic_ok and plan.B == 1
    col_split = flat_solve_ok(plan, fac.dtype)
    Lred, Ured = _reduced_LU(Wsp, Vsp, plan, col_split)
    red = _reduced_factor(Lred, Ured, plan, cyclic, wrap=wrap)
    return FoldedFactorization(fac, Dhinv, DU, Wsp, Vsp, red, plan, wrap,
                               col_split)


def factor_folded_direct(alpha, beta, backend, uf, helpersf, pstackf, xf,
                         dx, periodic, plan: FoldPlan):
    """Fused J+factor: band rows are evaluated from the state INSIDE the
    forward factor sweep, so the (W, nvar, nvar, K, 8, C8) band array is
    never written to (or re-read from) HBM — its write+read is ~4GB per
    step on the B=1024 x N=1e5 ensemble.  Returns None when the fused tile
    doesn't apply (caller falls back to eval_J_folded + factor_folded)."""
    import os

    if os.environ.get("TRIFLOW_NO_FUSED_FACTOR"):
        return None
    try:
        return factor_folded(
            alpha, beta, None, periodic, plan,
            stencil=(backend, uf, helpersf, pstackf, xf, dx, periodic))
    except ValueError:
        return None


def _interface_shifts(fact, yred):
    """Reduced solve + neighbor shifts from the subfolded interface RHS
    yred (..., 2s, 8, C8) -> (xm1_bot, xp1_top), each (..., s, 8, C8)."""
    from . import pallas_pcr

    plan = fact.plan
    s = plan.s
    if yred.ndim == 3:
        shifted = pallas_pcr.interface_shift_solve(fact.red, yred, fact.wrap)
        if shifted is not None:
            return shifted
    if isinstance(fact.red, WrappedPcr):
        z = fact.red.solve(yred)
    else:
        z = _red_solve(fact.red, yred)
    sp = (slice(None),) * 2
    ztop, zbot = z[(..., slice(None, s)) + sp], z[(..., slice(s, None)) + sp]
    xm1_bot = _ring_shift(zbot, 1, plan)
    xp1_top = _ring_shift(ztop, -1, plan)
    if not fact.wrap:
        first, last = _member_masks(plan)
        xm1_bot = jnp.where(first, 0.0, xm1_bot)
        xp1_top = jnp.where(last, 0.0, xp1_top)
    return xm1_bot, xp1_top


def solve_folded(fact: FoldedFactorization, bf, add_to=None):
    """Solve with folded RHS bf (..., nvar, K, 8, C8) -> same shape.

    ``add_to`` (optional, same folded shape) fuses ``add_to + x`` into the
    final spike-correction expression — the one-solve schemes
    (theta: u2 = u + A^-1(dt F)) would otherwise write the solve output to
    HBM and re-read it plus the state for a separate add pass; fusing
    saves 2 full state passes per step (VERDICT r3 weak #4: burgers-theta
    at 51% of its bandwidth bound)."""
    plan = fact.plan
    nvar, g, s, Mc, K = plan.nvar, plan.g, plan.s, plan.Mc, plan.K
    C8 = plan.C8
    from .pallas_thomas import _mv_t, chunked_solve_sweeps

    batch = bf.shape[:-4]
    if fact.col_split and bf.ndim == 4:
        return _solve_folded_flat(fact, bf, add_to=add_to)
    # folded -> chunk rows: (..., nvar, Mc, g, 8, C8) -> (Mc, ..., s, 8, C8)
    bc = bf.reshape(batch + (nvar, Mc, g, 8, C8))
    if nvar == 1:
        bc = jnp.moveaxis(bc[..., 0, :, :, :, :], -4, 0)
    else:
        # (Mc, g, nvar, ..., 8, C8) -> (Mc, ..., s, 8, C8)
        bc = jnp.moveaxis(bc, (-4, -3, -5), (0, 1, 2))
        bc = jnp.moveaxis(bc.reshape((Mc, s) + batch + (8, C8)), 1, -3)
    y = chunked_solve_sweeps(fact.fac, fact.Dhinv, fact.DU, bc)

    yred = jnp.concatenate([y[0], y[-1]], axis=-3)
    xm1_bot, xp1_top = _interface_shifts(fact, yred)
    Wb, Vb = fact.Wsp, fact.Vsp
    if fact.col_split:
        # batched fallback through col-split spikes: rebuild block form
        Wb = jnp.moveaxis(Wb.reshape(s, Mc, s, 8, C8), 0, 2)
        Vb = jnp.moveaxis(Vb.reshape(s, Mc, s, 8, C8), 0, 2)
    extra = y.ndim - 4
    if extra > 0:
        expand = (slice(None),) + (None,) * extra
        Wb = Wb[expand]
        Vb = Vb[expand]
    x = y - _mv_t(Wb, xm1_bot, 2) - _mv_t(Vb, xp1_top, 2)

    # chunk rows -> folded
    if nvar == 1:
        xf = jnp.moveaxis(x, 0, -4).reshape(batch + (1, K, 8, C8))
    else:
        x = jnp.moveaxis(x, -3, 1).reshape((Mc, g, nvar) + batch + (8, C8))
        x = jnp.moveaxis(x, (0, 1, 2), (-4, -3, -5))
        xf = x.reshape(batch + (nvar, K, 8, C8))
    return xf if add_to is None else add_to + xf


def _solve_folded_flat(fact: FoldedFactorization, bf, add_to=None):
    """nvar==1 fast path: the Thomas sweeps, interface gather and spike
    correction all run on the (K, 8, C8) folded layout directly — no
    per-supernode relayout of the RHS or solution.

    The spike correction stays an XLA expression ON PURPOSE: it fuses at
    full HBM rate (672GiB/s measured on the B=1024 ensemble trace), and a
    dedicated pallas kernel was measured FLAT there and -9% on the KS
    N=1e6 headline (the kernel boundary broke XLA's VMEM residency of the
    working set).  ``add_to`` fuses a state add into the same expression
    (see solve_folded)."""
    from .pallas_thomas import chunked_solve_flat

    plan = fact.plan
    s = plan.s
    y = chunked_solve_flat(fact.fac, fact.Dhinv, fact.DU, bf[0])
    yred = jnp.concatenate([y[:s], y[-s:]], axis=-3)       # (2s, 8, C8)
    xm1_bot, xp1_top = _interface_shifts(fact, yred)
    corr = None
    for b in range(s):
        t = fact.Wsp[b] * xm1_bot[b] + fact.Vsp[b] * xp1_top[b]
        corr = t if corr is None else corr + t
    x = (y - corr)[None]
    return x if add_to is None else add_to + x


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
        if jnp.dtype(backend.dtype) != jnp.float32:
            return None  # Mosaic f64: route doubles onto the XLA path
    from . import pallas_pcr

    item = jnp.dtype(backend.dtype).itemsize
    cap = None
    while True:
        plan = make_plan(N, backend.system.nvar, backend.halo,
                         backend.window, cap_C=cap)
        if plan is None:
            # below the chunked-solver gate (M < _CHUNK_MIN_M): the
            # single-launch whole-step kernel serves small grids alone
            from . import megastep

            return megastep.small_plan_for(backend, N)
        call = _FoldedStencilCall(backend, True, plan,
                                  per_row_extra=plan.W * plan.nvar ** 2)
        # the factor kernel blocks the folded bands with (r*g, 8, C8)
        # tiles: a workable row block must exist (rows sit on a non-minor
        # dim, so no sublane-alignment constraint)
        band_bytes = plan.W * plan.nvar ** 2 * plan.g * plan.Cp * item
        blk_bytes = plan.s * plan.s * plan.Cp * item
        ok = (call.applicable()
              and row_block(plan.Mc, band_bytes + 4 * blk_bytes,
                            budget=6 * 1024 * 1024))
        if ok and pallas_pcr.applicable(2 * plan.s, plan.C, backend.dtype,
                                        cyclic=plan.cyclic_ok):
            return plan
        # shrink the chunk count: big-supernode models (s = nvar*g > 2)
        # overflow the fused reduced-PCR VMEM budget at the default chunk
        # plan, and the XLA reduced fallback costs more than the whole
        # rest of the step (measured 85% of the falling-film step at
        # s=4, C=4096: thousands of unrolled 8x8 block ops)
        if plan.C <= 8:
            return None
        cap = plan.C // 2


def plan_for_local_bands(nvar, halo, window, N, dtype):
    """FoldPlan for factor/solve-only use on an N-node pre-assembled banded
    system (no stencil kernels) — the sharded SPIKE local solve.  Same
    gates as plan_for_backend minus the stencil-call check; the reduced
    interface system is acyclic (the shard couplings are peeled out)."""
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
        if jnp.dtype(dtype) != jnp.float32:
            return None
    from . import pallas_pcr

    item = jnp.dtype(dtype).itemsize
    cap = None
    while True:
        plan = make_plan(N, nvar, halo, window, cap_C=cap)
        if plan is None:
            return None
        band_bytes = plan.W * plan.nvar ** 2 * plan.g * plan.Cp * item
        blk_bytes = plan.s * plan.s * plan.Cp * item
        if (row_block(plan.Mc, band_bytes + 4 * blk_bytes,
                      budget=6 * 1024 * 1024)
                and pallas_pcr.applicable(2 * plan.s, plan.C, dtype,
                                          cyclic=False)):
            return plan
        if plan.C <= 8:
            return None
        cap = plan.C // 2


class FoldedBandedLocal:
    """Folded factor/solve for a pre-assembled ACYCLIC banded system: the
    chunk-native sweeps without the per-solve node<->block transposes of
    the generic BandedFactorization.  Used as the local factorization of
    the sharded SPIKE solve (parallel/spatial.py), where every stage pays
    the local solve and the relayouts were the dominant cost class the
    folded layout removed on one chip.

    The bands are folded as ``A = I + (A - I)`` (alpha=1, beta=1 on the
    diagonal-shifted bands) so the dead padding chunks factor as identity
    rows instead of singular zeros."""

    def __init__(self, bands, plan: FoldPlan):
        self.N = int(bands.shape[-1])
        self.nvar = plan.nvar
        self.plan = plan
        h = plan.W // 2
        shifted = bands
        for m in range(plan.nvar):
            shifted = shifted.at[h, m, m, :].add(-1.0)
        self.fact = factor_folded(1.0, 1.0, fold(shifted, plan),
                                  False, plan)

    def solve(self, rhs):
        """rhs (..., nvar, N) -> x (..., nvar, N)."""
        xf = solve_folded(self.fact, fold(rhs, self.plan))
        return unfold(xf, self.plan)

    # duck-type the BandedFactorization surface used by SpikeFactorization
    _tri_solve_nodes = solve
