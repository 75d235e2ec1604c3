"""Single-launch, sublane-packed Pallas PCR for the reduced interface system.

The chunked-Thomas solvers (ops/banded.py, ops/folded.py) end each factor /
solve with a block-tridiagonal *reduced* system over the C chunk interfaces
(supernode size s2 = 2s).  Two problems with the XLA level-loop
(banded._pcr_factor_xla / _pcr_solve_xla):

1. ~log2(C) levels of small fused ops = launch-bound (measured ~285us of a
   1.2ms RODASPR step at N=1e6, more than the O(N) sweeps it coordinates).
2. every block op slices (s2, s2, C) down to single (C,) rows — one VPU
   sublane out of eight.

These kernels fix both: the ENTIRE reduction (every level, the masks, the
final block inverse) runs inside one ``pallas_call`` with all operands in
VMEM, and the chunk axis is **sublane-packed** — c = sub * C8 + lane on a
(…, 8, C8) tile (C padded to a multiple of 8 with decoupled identity rows),
so each block op covers all eight sublanes.  Level-d rolls become one lane
roll plus two sublane rolls and a select.  Numerics are identical to the
XLA path.

Reference analog: none (the reference's SuperLU factorizes the full CSC
matrix in one C call, /root/reference/triflow/core/schemes.py:148-150); this
is the TPU-side equivalent of "the coupling solve must not dominate the
sweeps it couples".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pcall(*args, **kw):
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    else:
        from .pallas_thomas import _VMEM_LIMIT
        if _VMEM_LIMIT:
            kw.setdefault("compiler_params",
                          pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT))
    return pl.pallas_call(*args, **kw)


# ---- block helpers on (..., s2, s2, 8, C8) subfolded operands -------------

def _mm2(a, b):
    m, k = a.shape[-4], a.shape[-3]
    n = b.shape[-3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    sum(a[..., i, q, :, :] * b[..., q, j, :, :]
                        for q in range(k))
                    for j in range(n)
                ],
                axis=-3,
            )
            for i in range(m)
        ],
        axis=-4,
    )


def _mv2(a, b):
    m, k = a.shape[-4], a.shape[-3]
    return jnp.stack(
        [
            sum(a[..., i, q, :, :] * b[..., q, :, :] for q in range(k))
            for i in range(m)
        ],
        axis=-3,
    )


def _inv2(D):
    s = D.shape[-4]
    if s == 1:
        return 1.0 / D
    if s == 2:
        a = D[..., 0, 0, :, :]
        b = D[..., 0, 1, :, :]
        c = D[..., 1, 0, :, :]
        d = D[..., 1, 1, :, :]
        inv_det = 1.0 / (a * d - b * c)
        r0 = jnp.stack([d * inv_det, -b * inv_det], axis=-3)
        r1 = jnp.stack([-c * inv_det, a * inv_det], axis=-3)
        return jnp.stack([r0, r1], axis=-4)
    if s <= 16:
        # block-Schur with an uneven split for odd s (rectangular _mm2)
        p = s // 2
        A = D[..., :p, :p, :, :]
        B = D[..., :p, p:, :, :]
        C = D[..., p:, :p, :, :]
        Dd = D[..., p:, p:, :, :]
        Ainv = _inv2(A)
        Sinv = _inv2(Dd - _mm2(C, _mm2(Ainv, B)))
        AinvB = _mm2(Ainv, B)
        CAinv = _mm2(C, Ainv)
        top = jnp.concatenate(
            [Ainv + _mm2(AinvB, _mm2(Sinv, CAinv)), -_mm2(AinvB, Sinv)],
            axis=-3,
        )
        bot = jnp.concatenate([-_mm2(Sinv, CAinv), Sinv], axis=-3)
        return jnp.concatenate([top, bot], axis=-4)
    raise NotImplementedError(f"block size {s} > 16 not supported")


def _roll_axis(x, d, axis):
    import os
    if d == 0:
        return x
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        return jnp.roll(x, d, axis=axis)
    ax = axis % x.ndim
    # int32 shift: under jax_enable_x64 a bare Python int weak-types to
    # i64, which tpu.dynamic_rotate rejects at Mosaic verification
    return pltpu.roll(x, jnp.int32(d % x.shape[ax]), ax)


def _roll_c(x, d, C8):
    """jnp.roll by d over the flattened, sub-major chunk index
    c = sub * C8 + lane of a (..., 8, C8) tile (wraps mod 8*C8)."""
    Cp = 8 * C8
    d = d % Cp
    if d == 0:
        return x
    dq, dr = divmod(d, C8)
    a = _roll_axis(x, dr, -1)                     # lane roll by dr
    lo = _roll_axis(a, dq, -2)                    # sublane roll
    if dr == 0:
        return lo
    hi = _roll_axis(a, (dq + 1) % 8, -2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C8), 1)
    return jnp.where(lane >= dr, lo, hi)


def _c_iota(C8):
    """Real chunk index c = sub * C8 + lane as an (8, C8) int32 grid."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 1)
    return sub * C8 + lane


def _levels(C):
    ds = []
    d = 1
    while d < C:
        ds.append(d)
        d *= 2
    return tuple(ds)


def _subfold(x, C8):
    """(..., C) -> (..., 8, C8) with zero tail padding (sub-major c)."""
    C = x.shape[-1]
    pad = 8 * C8 - C
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x.reshape(x.shape[:-1] + (8, C8))


def _subunfold(x, C):
    """(..., 8, C8) -> (..., C)."""
    flat = x.reshape(x.shape[:-2] + (-1,))
    return flat[..., :C]


@jax.tree_util.register_pytree_node_class
class FusedPcrFactor:
    """PCR factorization with per-level operators stacked and sublane-packed
    (nlev, s2, s2, 8, C8); solved by the single-launch kernel below.  With
    ``Cm`` the system is block-diagonal over C/Cm members (ensemble plans):
    fewer levels (log2(Cm)), member-local masks."""

    def __init__(self, alphas, betas, Dinv, ds, C, Cm=0):
        self.alphas = alphas
        self.betas = betas
        self.Dinv = Dinv
        self.ds = tuple(ds)
        self.C = C
        self.Cm = Cm

    def tree_flatten(self):
        return ((self.alphas, self.betas, self.Dinv),
                (self.ds, self.C, self.Cm))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0], aux[1], aux[2])


def applicable(s2: int, C: int, dtype, nrhs: int = 1,
               cyclic: bool = False, Cm: int = 0) -> bool:
    """Fused PCR fits when every per-level operand sits in VMEM at once."""
    import os

    if os.environ.get("TRIFLOW_NO_PALLAS"):
        return False
    if not os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:  # pragma: no cover
            return False
        if jnp.dtype(dtype) != jnp.float32:
            return False  # Mosaic f64: route doubles onto the XLA path
    if s2 < 2 or s2 > 16:
        return False
    if C < 2 or (cyclic and C % 8):
        return False
    if Cm and (Cm < 2 or C % Cm):
        return False
    item = jnp.dtype(dtype).itemsize
    nlev = len(_levels(Cm or C))
    blk = s2 * s2 * 8 * (-(-C // 8)) * item
    budget = int(os.environ.get("TRIFLOW_PCR_BUDGET_MB", 10)) << 20
    if (2 * nlev + 8) * blk > budget:
        return False
    return True


def pcr_factor_fused(L, D, U, cyclic: bool = False):
    """Pallas twin of banded._pcr_factor_xla on (s2, s2, C) blocks.

    One kernel launch; all ~log2(C) reduction levels run in VMEM on
    sublane-packed (8, C8) tiles.  C is padded to a multiple of 8 with
    identity rows — fully decoupled, so the real sub-system is untouched
    (cyclic C is a power of two >= 8, hence never padded)."""
    s2, C = L.shape[-3], L.shape[-1]
    dtype = L.dtype
    C8 = -(-C // 8)
    Lp = _subfold(L, C8)
    Up = _subfold(U, C8)
    Dp = _subfold(D, C8)
    if 8 * C8 != C:
        # decoupled identity padding keeps every padded block invertible
        eye = jnp.eye(s2, dtype=dtype)[..., None, None]
        Dp = jnp.where(_c_iota(C8) >= C, eye, Dp)
    return pcr_factor_fused_sub(Lp, Dp, Up, C, cyclic)


def pcr_factor_fused_sub(Lp, Dp, Up, C, cyclic: bool = False, Cm: int = 0):
    """Fused PCR factor on PRE-subfolded (s2, s2, 8, C8) operands (the
    folded solver's native layout); dead chunks must carry identity D and
    zero L/U.  With ``Cm`` the system is block-diagonal over C/Cm members:
    only log2(Cm) levels, with member-local boundary masks."""
    s2, C8 = Lp.shape[-4], Lp.shape[-1]
    dtype = Lp.dtype
    members = bool(Cm) and Cm != C
    ds = _levels(Cm if members else C)
    nlev = len(ds)
    if cyclic and C % 8:
        raise ValueError("cyclic fused PCR requires C % 8 == 0")
    if cyclic and members:
        raise ValueError("cyclic closure is single-member only")

    def kernel(L_ref, D_ref, U_ref, alphas_ref, betas_ref, Dinv_ref):
        Lv, Dv, Uv = L_ref[...], D_ref[...], U_ref[...]
        cidx = _c_iota(C8)
        cmod = cidx % Cm if members else cidx
        top = Cm if members else C
        for lev, d in enumerate(ds):
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
            alphas_ref[lev] = alpha
            betas_ref[lev] = beta
        if cyclic:
            Dv = Dv + Lv + Uv
        Dinv_ref[...] = _inv2(Dv)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    alphas, betas, Dinv = _pcall(
        kernel,
        in_specs=[vspec, vspec, vspec],
        out_specs=[vspec, vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, s2, s2, 8, C8), dtype),
            jax.ShapeDtypeStruct((nlev, s2, s2, 8, C8), dtype),
            jax.ShapeDtypeStruct((s2, s2, 8, C8), dtype),
        ],
    )(Lp, Dp, Up)
    return FusedPcrFactor(alphas, betas, Dinv, ds, C,
                          Cm if members else 0)


def interface_shift_solve(red, yred, wrap):
    """Per-stage interface work in ONE kernel: reduced PCR solve, optional
    Woodbury wrap correction, and the neighbor shifts of the interface
    unknowns.  yred is the subfolded interface RHS (2s, 8, C8); returns
    (xm1_bot, xp1_top), each (s, 8, C8) — the constants the spike
    correction broadcasts over each chunk.

    ``red`` is a FusedPcrFactor (acyclic or block-cyclic), or a
    folded.WrappedPcr whose ``red0`` is a FusedPcrFactor.  Returns None when
    the representation doesn't match (caller falls back to the op-chain)."""
    wood = hasattr(red, "red0")
    fact = red.red0 if wood else red
    if not isinstance(fact, FusedPcrFactor):
        return None
    if fact.Cm not in (0, fact.C):
        return None        # member-partitioned: the op-chain path handles it
    if wood and getattr(red, "Cm", 0) not in (0, red.C):
        return None
    s2, C8 = fact.Dinv.shape[-4], fact.Dinv.shape[-1]
    C = fact.C
    s = s2 // 2
    dtype = yred.dtype
    ds = fact.ds
    yb = yred                                     # (2s, 8, C8)
    sub_e, lane_e = divmod(C - 1, C8)

    if wood:
        extra = [red.Z, red.cap_inv]              # (2s, 2s, 8, C8), (2s, 2s)
    else:
        extra = []

    def kernel(*refs):
        it = iter(refs)
        alphas_ref = next(it)
        betas_ref = next(it)
        Dinv_ref = next(it)
        y_ref = next(it)
        Z_ref = next(it) if wood else None
        cap_ref = next(it) if wood else None
        xm1_ref, xp1_ref = next(it), next(it)

        sub = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, C8), 1)
        first = (sub == 0) & (lane == 0)
        last = (sub == sub_e) & (lane == lane_e)

        bv = y_ref[...]
        for lev, d in enumerate(ds):
            bv = (bv + _mv2(alphas_ref[lev], _roll_c(bv, d, C8))
                  + _mv2(betas_ref[lev], _roll_c(bv, -d, C8)))
        y = _mv2(Dinv_ref[...], bv)               # (2s, 8, C8)

        if wood:
            # v_i^T y: i < s reads y[s+i] at c=C-1, i >= s reads y[i-s]
            # at c=0 (masked reductions; the tails are zero-padded)
            vt = [jnp.sum(jnp.where(last, y[s + i], 0.0)) for i in range(s)]
            vt += [jnp.sum(jnp.where(first, y[i], 0.0)) for i in range(s)]
            corr = None
            for j in range(s2):
                coef = sum(cap_ref[j, i] * vt[i] for i in range(s2))
                t = coef * Z_ref[j]
                corr = t if corr is None else corr + t
            y = y - corr

        ztop, zbot = y[:s], y[s:]
        xm1 = _roll_c(zbot, 1, C8)
        xp1 = _roll_c(ztop, -1, C8)
        if wrap and 8 * C8 != C:
            # padded ring: the roll wraps through the dead tail, so patch
            # the two real-boundary lanes from the true ring neighbors
            zb_last = [jnp.sum(jnp.where(last, zbot[i], 0.0))
                       for i in range(s)]
            zt_first = [jnp.sum(jnp.where(first, ztop[i], 0.0))
                        for i in range(s)]
            xm1 = jnp.stack([jnp.where(first, zb_last[i], xm1[i])
                             for i in range(s)])
            xp1 = jnp.stack([jnp.where(last, zt_first[i], xp1[i])
                             for i in range(s)])
        if not wrap:
            xm1 = jnp.where(first, 0.0, xm1)
            xp1 = jnp.where(last, 0.0, xp1)
        xm1_ref[...] = xm1
        xp1_ref[...] = xp1

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vspec] * 4
    if wood:
        in_specs += [vspec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    xm1, xp1 = _pcall(
        kernel,
        in_specs=in_specs,
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((s, 8, C8), dtype),
            jax.ShapeDtypeStruct((s, 8, C8), dtype),
        ],
    )(fact.alphas, fact.betas, fact.Dinv, yb, *extra)
    return xm1, xp1


def pcr_solve_fused(fact: FusedPcrFactor, b):
    """Pallas twin of banded._pcr_solve_xla; b is (..., s2, C)."""
    s2, C8 = fact.Dinv.shape[-4], fact.Dinv.shape[-1]
    C = fact.C
    batch = b.shape[:-2]
    bsub = _subfold(b.reshape((-1, s2, C)), C8)
    out = pcr_solve_fused_sub(fact, bsub)
    return _subunfold(out, C).reshape(batch + (s2, C))


def pcr_solve_fused_sub(fact: FusedPcrFactor, b):
    """Fused PCR solve on PRE-subfolded b (..., s2, 8, C8) -> same shape."""
    s2, C8 = fact.Dinv.shape[-4], fact.Dinv.shape[-1]
    dtype = b.dtype
    batch = b.shape[:-3]
    bflat = b.reshape((-1, s2, 8, C8))
    B = bflat.shape[0]
    ds = fact.ds

    def kernel(alphas_ref, betas_ref, Dinv_ref, b_ref, out_ref):
        for r in range(B):
            bv = b_ref[r]
            for lev, d in enumerate(ds):
                bv = (bv + _mv2(alphas_ref[lev], _roll_c(bv, d, C8))
                      + _mv2(betas_ref[lev], _roll_c(bv, -d, C8)))
            out_ref[r] = _mv2(Dinv_ref[...], bv)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = _pcall(
        kernel,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((B, s2, 8, C8), dtype),
    )(fact.alphas, fact.betas, fact.Dinv, bflat)
    return out.reshape(batch + (s2, 8, C8))
