"""TPU-resident linear algebra for block-banded systems.

The implicit schemes repeatedly solve ``(alpha*I - beta*J) x = b`` where J is
the structurally banded Jacobian emitted by the compiler
(shape ``(window, nvar, nvar, N)``).  The reference hands the equivalent CSC
matrix to SuperLU on the host (/root/reference/triflow/core/schemes.py:148-163
and :553-557); here the solve itself runs on the device:

1. the scalar banded system is grouped into **supernodes** of ``g = max(h, 1)``
   grid nodes, turning it into a block-tridiagonal system with dense
   ``s = nvar*g`` blocks;
2. the block-tridiagonal system is factored by **block cyclic reduction**
   (BCR): log2(M) levels of batched small-matrix algebra, each level fully
   parallel over blocks — this is the TPU-friendly substitute for a
   sequential Thomas/LU sweep (O(N s^3) total work, O(log N) depth);
3. periodic boundaries add wrap-around entries confined to the first/last
   ``h`` nodes; they are peeled off as a rank-``2*nvar*h`` correction and
   reinstated with the **Sherman–Morrison–Woodbury** identity, so a single
   non-cyclic factorization serves both boundary modes.

Like SuperLU in the reference ROW scheme, the factorization is computed once
per step and reused for every stage solve (``factor_banded`` /
``solve_banded`` mirror scipy's ``factorized`` split).

All entry points support arbitrary leading batch dimensions (vmap-free
ensembles) and are pure jit-friendly functions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.compiler import shift


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def identity_bands(window: int, nvar: int, N: int, dtype=jnp.float64):
    """Banded representation of the identity matrix."""
    bands = jnp.zeros((window, nvar, nvar, N), dtype=dtype)
    h = window // 2
    eye = jnp.eye(nvar, dtype=dtype)[:, :, None]
    return bands.at[h].set(jnp.broadcast_to(eye, (nvar, nvar, N)))


def axpy_bands(alpha, beta, J_bands):
    """``alpha * I + beta * J`` in banded form (used to build the implicit
    system matrices of the Theta and ROW schemes)."""
    J_bands = jnp.asarray(J_bands)
    W, nvar = J_bands.shape[-4], J_bands.shape[-3]
    h = W // 2
    A = beta * J_bands
    diag_idx = jnp.arange(nvar)
    return A.at[..., h, diag_idx, diag_idx, :].add(alpha)


def banded_matvec(bands, u, periodic: bool):
    """``(A @ u)`` for A in banded layout; u has shape (..., nvar, N).

    Out-of-range columns contribute zero in edge mode (the compiler already
    folded ghost dependencies onto the boundary columns)."""
    W, nvar, _, N = bands.shape[-4:]
    h = W // 2
    bands = jnp.asarray(bands); u = jnp.asarray(u)
    out = jnp.zeros_like(u)
    for k in range(W):
        off = k - h
        if periodic:
            u_shift = jnp.roll(u, -off, axis=-1) if off else u
        else:
            # zero-padded shift: columns outside the domain do not exist
            u_shift = jnp.zeros_like(u)
            if off == 0:
                u_shift = u
            elif off > 0:
                u_shift = u_shift.at[..., : N - off].set(u[..., off:])
            else:
                u_shift = u_shift.at[..., -off:].set(u[..., : N + off])
        out = out + jnp.einsum("...mni,...ni->...mi", bands[..., k, :, :, :], u_shift)
    return out


# ---------------------------------------------------------------------------
# supernode assembly
# ---------------------------------------------------------------------------

def _wrapped_indices(W: int, nvar: int, N: int):
    """Static index lists of the periodic wrap-around entries.

    Returns (top, bottom) lists of tuples
    ``(k, i, local_row_node, local_col_node)`` at node granularity."""
    h = W // 2
    top, bottom = [], []
    for i in range(h):
        for k in range(h - i):  # i + k - h < 0
            top.append((k, i, i, i + k))  # col node = (i+k-h) % N -> local i+k
    for di in range(h):  # i = N-1-di
        i = N - 1 - di
        for k in range(W - 1, W - 1 - (h - di), -1):  # i + k - h > N-1
            j = i + k - h - N  # in [0, h)
            bottom.append((k, i, h - 1 - di, j))
    return top, bottom


def _extract_wrap(bands, periodic: bool):
    """Split periodic wrap entries out of the bands.

    Returns (bands_tri, T, B): T is (..., P, P) coupling the first h nodes to
    the last h nodes (P = nvar*h); B couples last h to first h.  For the edge
    mode both are None and bands are returned unchanged."""
    bands = jnp.asarray(bands)
    W, nvar, _, N = bands.shape[-4:]
    h = W // 2
    if not periodic or h == 0:
        return bands, None, None
    P = nvar * h
    batch = bands.shape[:-4]
    T = jnp.zeros(batch + (P, P), dtype=bands.dtype)
    B = jnp.zeros(batch + (P, P), dtype=bands.dtype)
    top, bottom = _wrapped_indices(W, nvar, N)
    for (k, i, r, c) in top:
        T = T.at[..., r * nvar:(r + 1) * nvar, c * nvar:(c + 1) * nvar].set(
            bands[..., k, :, :, i]
        )
        bands = bands.at[..., k, :, :, i].set(0.0)
    for (k, i, r, c) in bottom:
        B = B.at[..., r * nvar:(r + 1) * nvar, c * nvar:(c + 1) * nvar].set(
            bands[..., k, :, :, i]
        )
        bands = bands.at[..., k, :, :, i].set(0.0)
    return bands, T, B


def _assemble_blocks(bands):
    """Assemble block-tridiagonal (L, D, U) of shape (..., M, s, s) from the
    (already wrap-free) bands.  N is padded to a multiple of g with identity
    rows; M = ceil(N/g)."""
    bands = jnp.asarray(bands)
    W, nvar, _, N = bands.shape[-4:]
    h = W // 2
    g = max(h, 1)
    s = nvar * g
    M = -(-N // g)
    Np = M * g
    batch = bands.shape[:-4]
    if Np != N:
        pad_width = [(0, 0)] * (bands.ndim - 1) + [(0, Np - N)]
        bands = jnp.pad(bands, pad_width)
        diag_idx = jnp.arange(nvar)
        bands = bands.at[..., h, diag_idx, diag_idx, N:].set(1.0)

    L = jnp.zeros(batch + (M, s, s), dtype=bands.dtype)
    D = jnp.zeros(batch + (M, s, s), dtype=bands.dtype)
    U = jnp.zeros(batch + (M, s, s), dtype=bands.dtype)
    for a in range(g):
        # node i = I*g + a ; slice [..., a::g] -> (..., nvar, nvar, M)
        for b in range(g):
            for name, dblock in (("L", -g), ("D", 0), ("U", g)):
                delta = (b - a) + dblock
                if abs(delta) > h:
                    continue
                blk = jnp.moveaxis(bands[..., h + delta, :, :, a::g], -1, -3)
                sl = (...,
                      slice(a * nvar, (a + 1) * nvar),
                      slice(b * nvar, (b + 1) * nvar))
                if name == "L":
                    L = L.at[sl].set(blk)
                elif name == "D":
                    D = D.at[sl].set(blk)
                else:
                    U = U.at[sl].set(blk)
    # couplings that would reach outside the block range are structurally
    # zero already (edge folding / wrap extraction), but enforce the BCR
    # invariants L[0] = 0, U[M-1] = 0 defensively:
    L = L.at[..., 0, :, :].set(0.0)
    U = U.at[..., M - 1, :, :].set(0.0)
    return L, D, U, g, s, M, Np


# ---------------------------------------------------------------------------
# block cyclic reduction
# ---------------------------------------------------------------------------

def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b)


def _mv(a, b):
    return jnp.einsum("...ij,...j->...i", a, b)


def _roll_blocks(arr, shiftn):
    return jnp.roll(arr, shiftn, axis=-3)


def _bcr_factor(L, D, U):
    """Cyclic-reduction factorization of a block-tridiagonal system.

    M (the number of blocks) is padded to a power of two with identity
    blocks.  Returns the per-level reduction operators needed to reduce a
    RHS and back-substitute."""
    M = L.shape[-3]
    Mp = 1 << max(0, (M - 1).bit_length())
    if Mp != M:
        batch = L.shape[:-3]
        s = L.shape[-1]
        padn = Mp - M
        eye = jnp.broadcast_to(jnp.eye(s, dtype=D.dtype), batch + (padn, s, s))
        zero = jnp.zeros(batch + (padn, s, s), dtype=D.dtype)
        L = jnp.concatenate([L, zero], axis=-3)
        D = jnp.concatenate([D, eye], axis=-3)
        U = jnp.concatenate([U, zero], axis=-3)
    levels = []
    m = Mp
    while m > 1:
        L_odd, D_odd, U_odd = L[..., 1::2, :, :], D[..., 1::2, :, :], U[..., 1::2, :, :]
        L_evn, D_evn, U_evn = L[..., 0::2, :, :], D[..., 0::2, :, :], U[..., 0::2, :, :]
        Dinv_odd = jnp.linalg.inv(D_odd)
        # CL[t] = L[2t] @ Dinv[odd t-1] ; CU[t] = U[2t] @ Dinv[odd t]
        CL = _mm(L_evn, _roll_blocks(Dinv_odd, 1))
        CU = _mm(U_evn, Dinv_odd)
        newL = -_mm(CL, _roll_blocks(L_odd, 1))
        newD = D_evn - _mm(CL, _roll_blocks(U_odd, 1)) - _mm(CU, L_odd)
        newU = -_mm(CU, U_odd)
        # invariants: no left neighbor for block 0, no right neighbor for last
        newL = newL.at[..., 0, :, :].set(0.0)
        newU = newU.at[..., -1, :, :].set(0.0)
        levels.append((CL, CU, Dinv_odd, L_odd, U_odd))
        L, D, U = newL, newD, newU
        m //= 2
    D0inv = jnp.linalg.inv(D[..., 0, :, :])
    return {"levels": levels, "D0inv": D0inv, "M": M, "Mp": Mp}


def _bcr_solve(fact, b):
    """Solve with a _bcr_factor result; b has shape (..., M, s)."""
    M, Mp = fact["M"], fact["Mp"]
    if Mp != M:
        pad = [(0, 0)] * (b.ndim - 2) + [(0, Mp - M), (0, 0)]
        b = jnp.pad(b, pad)
    stack = []
    for (CL, CU, Dinv_odd, L_odd, U_odd) in fact["levels"]:
        b_odd = b[..., 1::2, :]
        b_evn = b[..., 0::2, :]
        stack.append(b_odd)
        b = b_evn - _mv(CL, jnp.roll(b_odd, 1, axis=-2)) - _mv(CU, b_odd)
    x = _mv(fact["D0inv"], b[..., 0, :])[..., None, :]
    for (CL, CU, Dinv_odd, L_odd, U_odd), b_odd in zip(
        reversed(fact["levels"]), reversed(stack)
    ):
        # odd j = 2t+1: neighbors even 2t (x[t]) and even 2t+2 (x[t+1] or 0)
        x_right = jnp.concatenate(
            [x[..., 1:, :], jnp.zeros_like(x[..., :1, :])], axis=-2
        )
        x_odd = _mv(Dinv_odd, b_odd - _mv(L_odd, x) - _mv(U_odd, x_right))
        m2 = x.shape[-2] * 2
        xs = jnp.stack([x, x_odd], axis=-2)  # (..., m, 2, s)
        x = xs.reshape(xs.shape[:-3] + (m2, x.shape[-1]))
    if Mp != M:
        x = x[..., :M, :]
    return x


# ---------------------------------------------------------------------------
# public interface
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class BandedFactorization:
    """Reusable factorization of ``A`` given in banded layout (the analog of
    ``scipy.sparse.linalg.factorized`` in the reference ROW scheme,
    schemes.py:148-150)."""

    def __init__(self, tri_fact, g, s, N, nvar, periodic, wood_Z=None,
                 wood_cap_inv=None, halo=0):
        self.tri_fact = tri_fact
        self.g = g
        self.s = s
        self.N = N
        self.nvar = nvar
        self.periodic = periodic
        self.wood_Z = wood_Z              # (..., 2P, nvar, N) pre-solved A^-1 Uw
        self.wood_cap_inv = wood_cap_inv  # (..., 2P, 2P)
        self.halo = halo

    # pytree plumbing -------------------------------------------------------
    def tree_flatten(self):
        leaves = (self.tri_fact, self.wood_Z, self.wood_cap_inv)
        aux = (self.g, self.s, self.N, self.nvar, self.periodic, self.halo)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        tri_fact, wood_Z, wood_cap_inv = leaves
        g, s, N, nvar, periodic, halo = aux
        return cls(tri_fact, g, s, N, nvar, periodic, wood_Z, wood_cap_inv, halo)

    # solve -----------------------------------------------------------------
    def _tri_solve_nodes(self, rhs):
        """rhs (..., nvar, N) -> x (..., nvar, N) via the tridiagonal part."""
        nvar, N, g, s = self.nvar, self.N, self.g, self.s
        M = -(-N // g)
        Np = M * g
        b = jnp.moveaxis(rhs, -2, -1)  # (..., N, nvar)
        if Np != N:
            pad = [(0, 0)] * (b.ndim - 2) + [(0, Np - N), (0, 0)]
            b = jnp.pad(b, pad)
        b = b.reshape(b.shape[:-2] + (M, s))
        x = _bcr_solve(self.tri_fact, b)
        x = x.reshape(x.shape[:-2] + (Np, nvar))[..., :N, :]
        return jnp.moveaxis(x, -1, -2)

    def solve(self, rhs):
        """Solve ``A x = rhs`` with rhs of shape (..., nvar, N)."""
        y = self._tri_solve_nodes(rhs)
        if not self.periodic or self.wood_Z is None:
            return y
        h, nvar, N = self.halo, self.nvar, self.N
        P = nvar * h
        # Vw^T y = [last-h-node entries ; first-h-node entries]
        y_end = jnp.moveaxis(y[..., N - h:], -2, -1).reshape(y.shape[:-2] + (P,))
        y_top = jnp.moveaxis(y[..., :h], -2, -1).reshape(y.shape[:-2] + (P,))
        vty = jnp.concatenate([y_end, y_top], axis=-1)  # (..., 2P)
        coef = _mv(self.wood_cap_inv, vty)              # (..., 2P)
        corr = jnp.einsum("...cni,...c->...ni", self.wood_Z, coef)
        return y - corr

    __call__ = solve


def factor_banded(A_bands, periodic: bool) -> BandedFactorization:
    """Factor a block-banded matrix given as (..., window, nvar, nvar, N).

    One factorization serves any number of ``solve`` calls (Theta: one per
    step; ROW: one per step, s stage solves — mirroring the reference's
    reuse of the SuperLU factorization across stages, schemes.py:148-163)."""
    W, nvar, _, N = A_bands.shape[-4:]
    h = W // 2
    if N < 2 * max(h, 1):
        raise ValueError(f"banded solver requires N >= {2*max(h,1)} (got {N})")
    bands_tri, T, B = _extract_wrap(A_bands, periodic)
    L, D, U, g, s, M, Np = _assemble_blocks(bands_tri)
    tri = _bcr_factor(L, D, U)
    fact = BandedFactorization(tri, g, s, N, nvar, periodic, halo=h)
    if not periodic or h == 0:
        return fact

    # ---- Woodbury correction for the periodic corners ---------------------
    # A_cyc = A_tri + E_top @ T @ E_end^T + E_end @ B @ E_top^T
    #       = A_tri + Uw @ Vw^T,
    #   Uw = [E_top @ T | E_end @ B]  (Ntot x 2P),  Vw = [E_end | E_top]
    P = nvar * h
    batch = A_bands.shape[:-4]
    # RHS columns of Uw as (2P, nvar, N) node-layout vectors
    cols = jnp.zeros(batch + (2 * P, nvar, N), dtype=A_bands.dtype)
    # first block: E_top @ T -> column c has T[:, c] scattered on first h nodes
    # T rows are scalar indices r = node*nvar + m over the first h nodes
    Tmat = T  # (..., P, P)
    Bmat = B
    # build with vectorized reshapes: scatter (..., P, P) into node layout
    T_cols = jnp.moveaxis(Tmat, -1, -2)  # (..., P_col, P_row)
    T_cols = T_cols.reshape(batch + (P, h, nvar))  # row index -> (node, var)
    T_cols = jnp.moveaxis(T_cols, -1, -2)  # (..., P, nvar, h)
    cols = cols.at[..., :P, :, :h].set(T_cols)
    B_cols = jnp.moveaxis(Bmat, -1, -2).reshape(batch + (P, h, nvar))
    B_cols = jnp.moveaxis(B_cols, -1, -2)
    cols = cols.at[..., P:, :, N - h:].set(B_cols)
    # Z = A_tri^-1 Uw : vmap the tridiagonal solve over the 2P columns (the
    # factorization's own batch dims, if any, stay aligned underneath)
    Z = jax.vmap(fact._tri_solve_nodes, in_axes=-3, out_axes=-3)(cols)
    # capacity = I + Vw^T Z ; Vw^T selects [last h nodes ; first h nodes]
    Z_end = jnp.moveaxis(Z[..., N - h:], -2, -1).reshape(batch + (2 * P, P))
    Z_top = jnp.moveaxis(Z[..., :h], -2, -1).reshape(batch + (2 * P, P))
    VtZ = jnp.concatenate([Z_end, Z_top], axis=-1)  # (..., 2P, 2P)
    cap = jnp.eye(2 * P, dtype=A_bands.dtype) + jnp.moveaxis(VtZ, -1, -2)
    fact.wood_Z = Z
    fact.wood_cap_inv = jnp.linalg.inv(cap)
    return fact


def solve_banded(A_bands, rhs, periodic: bool):
    """One-shot solve (factor + solve)."""
    return factor_banded(A_bands, periodic).solve(rhs)
