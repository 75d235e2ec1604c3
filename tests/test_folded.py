"""Folded (chunk-native) hot-path equivalence vs the node-layout reference
path, run through pallas interpret mode on the CPU mesh (ops/folded.py).

The folded layout is the TPU production path (bench.py); these tests pin its
numerics to the generic ArrayBackend implementation for every closure mode:
cyclic reduced system (power-of-two C), folded Woodbury (non-power-of-two C),
and the edge (non-periodic) clamp."""

import numpy as np
import pytest

import jax.numpy as jnp

from triflow_tpu import Model, schemes
from triflow_tpu.ops import folded


# whole-module slow tier: interpret-mode kernel equivalence / physics
# workloads are minutes-long on the virtual CPU mesh (CI fast lane skips
# them; the full matrix runs nightly)
pytestmark = pytest.mark.slow



@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setenv("TRIFLOW_PALLAS_INTERPRET", "1")


def _fixed_step_pair(model, N, periodic, monkeypatch):
    be = model.backend
    dtype = be.dtype
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(1)
    u0 = np.stack(
        [np.cos(2 * np.pi * np.arange(N) / N * 7 + i) + 0.05 * rng.randn(N)
         for i in range(be.system.nvar)])
    pstack = be.pack_pars({p: 0.7 for p in be.system.pars}, x)
    helpers = jnp.zeros((0, N), dtype)
    args = (jnp.asarray(0.0, dtype), jnp.asarray(u0, dtype), helpers,
            jnp.asarray(pstack, dtype), jnp.asarray(x, dtype), 0.02)

    scheme = schemes.RODASPR(model, time_stepping=False, tol=None)
    assert folded.folded_plan_for(be, np.asarray(u0), x) is not None
    u_fold = scheme.device_fixed_step(periodic=periodic)(*args)[0]

    monkeypatch.setenv("TRIFLOW_NO_FOLDED", "1")
    scheme2 = schemes.RODASPR(model, time_stepping=False, tol=None)
    u_node = scheme2.device_fixed_step(periodic=periodic)(*args)[0]
    monkeypatch.delenv("TRIFLOW_NO_FOLDED")
    return np.asarray(u_fold), np.asarray(u_node)


@pytest.mark.parametrize("N,periodic", [
    (4096, True),    # power-of-two C -> cyclic reduced PCR
    (4096, False),   # edge clamp
    (6144, True),    # C = 192 -> folded Woodbury correction
])
def test_folded_row_step_matches_node_path(interpret_pallas, monkeypatch,
                                           N, periodic):
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    u_fold, u_node = _fixed_step_pair(model, N, periodic, monkeypatch)
    assert np.allclose(u_fold, u_node, rtol=1e-11, atol=1e-11)


def test_folded_two_variable_system(interpret_pallas, monkeypatch):
    model = Model(["c2 * dxxu", "v"], ["v", "u"], ["c2"])
    u_fold, u_node = _fixed_step_pair(model, 4096, True, monkeypatch)
    assert np.allclose(u_fold, u_node, rtol=1e-11, atol=1e-11)


def test_fold_unfold_roundtrip():
    plan = folded.make_plan(4096, 1, 2, 5)
    assert plan is not None
    a = np.arange(3 * 4096, dtype=np.float64).reshape(3, 4096)
    af = folded.fold(jnp.asarray(a), plan)
    assert af.shape == (3, plan.K, 8, plan.C8)
    # folded element (k, sub, lane) is node (sub*C8 + lane)*K + k
    if plan.C8 > 5:
        assert float(af[1, 3, 2, 5]) == a[1, (2 * plan.C8 + 5) * plan.K + 3]
    assert np.array_equal(np.asarray(folded.unfold(af, plan)), a)


def test_cyclic_pcr_matches_dense():
    from triflow_tpu.ops.banded import _pcr_factor, _pcr_solve

    rng = np.random.RandomState(0)
    M, s = 16, 2
    L = rng.randn(s, s, M) * 0.2
    U = rng.randn(s, s, M) * 0.2
    D = rng.randn(s, s, M) * 0.2 + np.eye(s)[:, :, None] * 3
    b = rng.randn(s, M)
    fact = _pcr_factor(jnp.asarray(L), jnp.asarray(D), jnp.asarray(U),
                       cyclic=True)
    x = np.asarray(_pcr_solve(fact, jnp.asarray(b)))
    A = np.zeros((s * M, s * M))
    for i in range(M):
        A[i*s:(i+1)*s, i*s:(i+1)*s] = D[:, :, i]
        A[i*s:(i+1)*s, ((i-1) % M)*s:((i-1) % M + 1)*s] += L[:, :, i]
        A[i*s:(i+1)*s, ((i+1) % M)*s:((i+1) % M + 1)*s] += U[:, :, i]
    bflat = np.concatenate([b[:, i] for i in range(M)])
    xr = np.linalg.solve(A, bflat)
    xr = np.stack([xr[i*s:(i+1)*s] for i in range(M)], axis=-1)
    assert np.allclose(x, xr, rtol=1e-10, atol=1e-12)


def test_folded_adaptive_loop_matches_node_path(interpret_pallas,
                                                monkeypatch):
    """The adaptive while_loop carries folded state when no hook is set;
    the trajectory must match the node-layout adaptive path."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    be = model.backend
    N = 2048
    dtype = be.dtype
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(5)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 7)
          + 0.05 * rng.randn(N))[None]
    helpers = jnp.zeros((0, N), dtype)
    pstack = jnp.zeros((0, N), dtype)
    args = (jnp.asarray(0.0, dtype), jnp.asarray(u0, dtype), helpers,
            pstack, jnp.asarray(x, dtype), jnp.asarray(0.3, dtype),
            jnp.asarray(0.05, dtype))

    scheme = schemes.RODASPR(model, tol=1e-5)
    out_f = scheme.device_stepper(periodic=True)(*args)

    monkeypatch.setenv("TRIFLOW_NO_FOLDED", "1")
    scheme2 = schemes.RODASPR(model, tol=1e-5)
    out_n = scheme2.device_stepper(periodic=True)(*args)
    monkeypatch.delenv("TRIFLOW_NO_FOLDED")

    # same final time, same accepted-step count, same state
    assert np.isclose(float(out_f[0]), float(out_n[0]))
    assert int(out_f[6]) == int(out_n[6])          # niter
    assert int(out_f[7]) == int(out_n[7]) == 0     # status
    assert np.allclose(np.asarray(out_f[1]), np.asarray(out_n[1]),
                       rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("periodic", [True, False])
def test_folded_three_variable_system(interpret_pallas, monkeypatch,
                                      periodic):
    """VERDICT r1 item 9: odd supernode sizes (nvar=3, halo=1 -> s=3) run
    through the folded Pallas path (uneven block-Schur inverses) instead of
    silently falling back to the XLA node path."""
    model = Model(["k1 * dxxA - B", "k2 * dxxB + A - C", "k3 * dxxC + B"],
                  ["A", "B", "C"], ["k1", "k2", "k3"])
    assert model.backend.system.nvar == 3 and model.halo == 1
    # N=1536 -> C=96 (non-power-of-two: periodic goes through the Woodbury
    # closure) at ~3x less interpret-mode cost than N=4096
    N = 1536
    u_fold, u_node = _fixed_step_pair(model, N, periodic, monkeypatch)
    assert np.allclose(u_fold, u_node, rtol=1e-10, atol=1e-10)


def test_small_inv_odd_sizes():
    """Closed-path batched inverses for s = 3, 5, 7 (previously the slow
    generic linalg.inv fallback)."""
    from triflow_tpu.ops.banded import _small_inv

    rng = np.random.RandomState(3)
    for s in (3, 5, 6, 7):
        D = rng.randn(s, s, 17) + 4.0 * np.eye(s)[..., None]
        Dinv = np.asarray(_small_inv(jnp.asarray(D)))
        prod = np.einsum("ikm,kjm->ijm", D, Dinv)
        eye = np.eye(s)[..., None] * np.ones((1, 1, 17))
        assert np.allclose(prod, eye, atol=1e-10), s


def test_fused_stage_algebra_matches_default(interpret_pallas, monkeypatch):
    """Fused stage RHS (combos + bias evaluated inside the F kernel,
    ops/folded.eval_F_folded u_terms mode; default on member-merged plans,
    forced here via TRIFLOW_FUSED_STAGES=1) matches the combine-pass
    path."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    be = model.backend
    N = 4096
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(5)
    u0 = np.cos(2 * np.pi * np.arange(N) / N * 7)[None] + 0.05 * rng.randn(1, N)
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)
    args = (jnp.asarray(0.0, be.dtype), jnp.asarray(u0, be.dtype), helpers,
            pstack, jnp.asarray(x, be.dtype), 0.02)

    scheme = schemes.RODASPR(model, time_stepping=False, tol=None)
    u_default = np.asarray(scheme.device_fixed_step(periodic=True)(*args)[0])

    monkeypatch.setenv("TRIFLOW_FUSED_STAGES", "1")
    scheme2 = schemes.RODASPR(model, time_stepping=False, tol=None)
    u_fused = np.asarray(scheme2.device_fixed_step(periodic=True)(*args)[0])
    assert np.allclose(u_fused, u_default, rtol=1e-6, atol=1e-8)


def test_folded_theta_matches_node_path(interpret_pallas, monkeypatch):
    """Theta's folded route (u2 = u + A^-1(dt F), fused J+factor) matches
    the node-layout banded step."""
    model = Model("-U * dxU + nu * dxxU", "U", "nu")
    be = model.backend
    N = 4096
    x = np.arange(N) * 0.5
    u0 = np.cos(2 * np.pi * np.arange(N) / N * 4)[None]
    pstack = be.pack_pars(dict(nu=0.5, periodic=True), x)
    helpers = jnp.zeros((0, N), be.dtype)
    args = (jnp.asarray(0.0, be.dtype), jnp.asarray(u0, be.dtype), helpers,
            jnp.asarray(pstack, be.dtype), jnp.asarray(x, be.dtype), 0.05)

    for theta in (1.0, 0.5):
        sch = schemes.Theta(model, theta=theta)
        u_fold = np.asarray(sch.device_fixed_step(periodic=True)(*args)[0])
        monkeypatch.setenv("TRIFLOW_NO_FOLDED", "1")
        sch2 = schemes.Theta(model, theta=theta)
        u_node = np.asarray(sch2.device_fixed_step(periodic=True)(*args)[0])
        monkeypatch.delenv("TRIFLOW_NO_FOLDED")
        assert np.allclose(u_fold, u_node, rtol=1e-9, atol=1e-11), theta
        # folded-native scan API agrees too
        api = sch.device_fixed_step_folded(N, periodic=True)
        assert api is not None
        from triflow_tpu.ops import folded as fl
        plan, fixed_f = api
        uf2, _ = fixed_f(0.0, fl.fold(jnp.asarray(u0, be.dtype), plan),
                         fl.fold(helpers, plan), fl.fold(pstack, plan),
                         fl.fold(jnp.asarray(x, be.dtype), plan),
                         jnp.asarray(0.5, be.dtype), 0.05)
        assert np.allclose(np.asarray(fl.unfold(uf2, plan)), u_fold,
                           rtol=1e-9, atol=1e-11)


def test_plan_reduced_system_fits_pcr(interpret_pallas):
    """plan_for_backend caps the chunk count until the reduced interface
    system (2s blocks over C chunks) passes the fused-PCR VMEM gate — a
    big-supernode model must NOT land on the XLA reduced fallback (which
    measured 85% of the falling-film step at s=4, C=4096)."""
    from triflow_tpu.ops import pallas_pcr

    model = Model(
        ["-dxq",
         "9/7 * q**2 / h**2 * dxh - upwind(17/7 * q / h, q, 2)"
         " + (h - q / h**2) / delta"],
        ["h", "q"], ["delta"])
    be = model.backend
    assert be.system.nvar == 2 and be.halo == 2
    plan = folded.plan_for_backend(be, 262144)
    assert plan is not None and plan.s == 4
    assert pallas_pcr.applicable(2 * plan.s, plan.C, be.dtype,
                                 cyclic=plan.cyclic_ok), plan


def test_device_time_stepping_folded_carry(interpret_pallas, monkeypatch):
    """DeviceTimeStepping carries FOLDED state through its whole
    coarse-vs-fine Richardson loop when the inner scheme exposes a folded
    core (one fold/unfold per output step instead of 2(m+1) relayouts per
    attempt); trajectory must match the node-layout controller."""
    from triflow_tpu.core.schemes import DeviceTimeStepping

    model = Model("k * dxxU", "U", parameters=["k"])
    N = 4096
    be = model.backend
    assert folded.plan_for_backend(be, N) is not None
    x = np.linspace(0, 10, N, endpoint=False)
    U = np.cos(2 * np.pi * x / 10) + 0.3 * np.sin(6 * np.pi * x / 10)
    pars = {"k": 0.5, "periodic": True}

    def run():
        sch = DeviceTimeStepping(schemes.Theta(model, theta=0.5), tol=1e-6)
        t, f = 0.0, model.fields_template(x=x, U=U)
        for _ in range(3):
            t, f = sch(t, f, 0.1, pars)
        return np.asarray(f["U"]), sch._internal_iter

    u_fold, it_fold = run()
    monkeypatch.setenv("TRIFLOW_NO_FOLDED", "1")
    u_node, _ = run()
    monkeypatch.delenv("TRIFLOW_NO_FOLDED")
    assert it_fold >= 1
    assert np.allclose(u_fold, u_node, rtol=1e-10, atol=1e-12)


def test_matvec_df_folded_matches_node_layout(interpret_pallas):
    """The Pallas df64 banded matvec (EFT chains on VMEM slabs) must equal
    the node-layout banded_matvec_df bit-for-near-bit: both compute the
    same error-free-transform chains, so agreement is at double-float
    round-off, far below f32."""
    import jax

    from triflow_tpu import Model
    from triflow_tpu.ops import folded as fl
    from triflow_tpu.ops.banded_df import banded_matvec_df
    from triflow_tpu.ops.df64 import DF

    model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
    be = model.backend
    N = 256
    plan = fl.plan_for_backend(be, N)
    assert plan is not None
    rng = np.random.RandomState(0)
    x = np.arange(N, dtype=np.float64) * 0.5
    u = DF.from_float64((np.cos(0.1 * x) + 0.05 * rng.randn(N))[None])
    h = DF.from_float64(np.zeros((0, N)))
    p = DF.from_float64(np.zeros((0, N)))
    xx = DF.from_float64(x)
    J = jax.jit(lambda u: be.J_bands_df64(u, h, p, xx, periodic=True))(u)
    v = DF.from_float64(rng.randn(1, N))

    ref = banded_matvec_df(J, v, True)

    Jf = DF.wrap(fl.fold(J.hi, plan), fl.fold(J.lo, plan))
    vf = DF.wrap(fl.fold(v.hi, plan), fl.fold(v.lo, plan))
    out = jax.jit(
        lambda Jf, vf: fl.matvec_df_folded(Jf, vf, True, plan))(Jf, vf)
    got = DF.wrap(fl.unfold(out.hi, plan), fl.unfold(out.lo, plan))
    d = np.abs(got.to_float64() - ref.to_float64()).max()
    rel = d / np.abs(ref.to_float64()).max()
    assert rel < 1e-13, rel
