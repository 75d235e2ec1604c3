"""Single-launch Pallas PCR for the reduced chunk-interface system.

The chunked-Thomas solvers (ops/banded.py, ops/folded.py) end each factor /
solve with a block-tridiagonal *reduced* system over the C chunk interfaces
(supernode size s2 = 2s, C in lanes).  The XLA implementation
(banded._pcr_factor / _pcr_solve) runs ~log2(C) levels of small fused
elementwise ops on (s2, s2, C) arrays — each a few microseconds of work but
a separate kernel launch, so at C ~ 3e3 the reduced machinery costs more
wall-clock than the O(N) Thomas sweeps it coordinates (measured ~285us of
a 1.2ms RODASPR step at N=1e6).

These kernels run the ENTIRE reduction — every level, the masks, the final
block inverse — inside one ``pallas_call`` with all operands resident in
VMEM (the whole reduced system is < 1 MB), eliminating the launch-bound
level loop.  Numerics are identical to banded._pcr_factor/_pcr_solve.

Reference analog: none (the reference's SuperLU factorizes the full CSC
matrix in one C call, /root/reference/triflow/core/schemes.py:148-150); this
is the TPU-side equivalent of "the coupling solve is not allowed to dominate
the sweep it couples".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_thomas import _inv, _mm, _mv


def _pcall(*args, **kw):
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        kw.setdefault("interpret", True)
    return pl.pallas_call(*args, **kw)


def _roll(x, d):
    """Circular shift along the lane (last) axis, jnp.roll semantics."""
    import os
    if os.environ.get("TRIFLOW_PALLAS_INTERPRET"):
        return jnp.roll(x, d, axis=-1)
    C = x.shape[-1]
    return pltpu.roll(x, d % C, x.ndim - 1)


def _levels(C):
    ds = []
    d = 1
    while d < C:
        ds.append(d)
        d *= 2
    return tuple(ds)


@jax.tree_util.register_pytree_node_class
class FusedPcrFactor:
    """PCR factorization with per-level operators stacked (nlev, s2, s2, C);
    solved by the single-launch kernel below.  Interchangeable with
    banded.PcrFactor at the .solve level."""

    def __init__(self, alphas, betas, Dinv, ds):
        self.alphas = alphas          # (nlev, s2, s2, C)
        self.betas = betas            # (nlev, s2, s2, C)
        self.Dinv = Dinv              # (s2, s2, C)
        self.ds = tuple(ds)

    def tree_flatten(self):
        return (self.alphas, self.betas, self.Dinv), self.ds

    @classmethod
    def tree_unflatten(cls, ds, leaves):
        return cls(*leaves, ds)


def applicable(s2: int, C: int, dtype, nrhs: int = 1) -> bool:
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
    if s2 not in (2, 4, 8):
        return False
    if C < 2:
        return False
    item = jnp.dtype(dtype).itemsize
    nlev = len(_levels(C))
    blk = s2 * s2 * C * item
    # factor kernel: L/D/U in + alphas/betas (nlev) + Dinv out + live temps
    if (2 * nlev + 8) * blk > 10 * 1024 * 1024:
        return False
    return True


def pcr_factor_fused(L, D, U, cyclic: bool = False):
    """Pallas twin of banded._pcr_factor: (s2, s2, C) block tridiagonal.

    One kernel launch; all ~log2(C) reduction levels run in VMEM."""
    s2, C = L.shape[-3], L.shape[-1]
    dtype = L.dtype
    ds = _levels(C)
    nlev = len(ds)

    def kernel(L_ref, D_ref, U_ref, alphas_ref, betas_ref, Dinv_ref):
        Lv, Dv, Uv = L_ref[...], D_ref[...], U_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)[0]
        for lev, d in enumerate(ds):
            Dinv = _inv(Dv)
            alpha = -_mm(Lv, _roll(Dinv, d))
            beta = -_mm(Uv, _roll(Dinv, -d))
            if not cyclic:
                alpha = jnp.where(lane >= d, alpha, 0.0)
                beta = jnp.where(lane < C - d, beta, 0.0)
            Dv = (Dv + _mm(alpha, _roll(Uv, d))
                  + _mm(beta, _roll(Lv, -d)))
            Lv = _mm(alpha, _roll(Lv, d))
            Uv = _mm(beta, _roll(Uv, -d))
            alphas_ref[lev] = alpha
            betas_ref[lev] = beta
        if cyclic:
            Dv = Dv + Lv + Uv
        Dinv_ref[...] = _inv(Dv)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    alphas, betas, Dinv = _pcall(
        kernel,
        in_specs=[vspec, vspec, vspec],
        out_specs=[vspec, vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((nlev, s2, s2, C), dtype),
            jax.ShapeDtypeStruct((nlev, s2, s2, C), dtype),
            jax.ShapeDtypeStruct((s2, s2, C), dtype),
        ],
    )(L, D, U)
    return FusedPcrFactor(alphas, betas, Dinv, ds)


def pcr_solve_fused(fact: FusedPcrFactor, b):
    """Pallas twin of banded._pcr_solve; b is (..., s2, C)."""
    s2, C = fact.Dinv.shape[-3], fact.Dinv.shape[-1]
    dtype = b.dtype
    batch = b.shape[:-2]
    bflat = b.reshape((-1, s2, C))
    B = bflat.shape[0]
    ds = fact.ds

    def kernel(alphas_ref, betas_ref, Dinv_ref, b_ref, out_ref):
        for r in range(B):
            bv = b_ref[r]
            for lev, d in enumerate(ds):
                bv = (bv + _mv(alphas_ref[lev], _roll(bv, d))
                      + _mv(betas_ref[lev], _roll(bv, -d)))
            out_ref[r] = _mv(Dinv_ref[...], bv)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = _pcall(
        kernel,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((B, s2, C), dtype),
    )(fact.alphas, fact.betas, fact.Dinv, bflat)
    return out.reshape(batch + (s2, C))
