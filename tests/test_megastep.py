"""Single-launch whole-step kernel (ops/megastep.py) equivalence vs the
grid-blocked folded path, in pallas interpret mode.

The megastep kernel serves the launch-bound small-N regime (e.g. the
BASELINE config-1 advection-diffusion grid at N=200): one implicit ROW or
theta step = ONE pallas_call.  These tests pin its numerics to the
multi-kernel folded path (itself pinned to the generic backend by
tests/test_folded.py) for every reduced-interface closure mode: cyclic
(power-of-two C), Woodbury wrap (non-power-of-two C), and edge clamp."""

import numpy as np
import pytest

import jax.numpy as jnp

from triflow_tpu import Model, schemes
from triflow_tpu.ops import folded, megastep


# whole-module slow tier: interpret-mode kernel equivalence / physics
# workloads are minutes-long on the virtual CPU mesh (CI fast lane skips
# them; the full matrix runs nightly)
pytestmark = pytest.mark.slow



@pytest.fixture()
def interpret_pallas(monkeypatch):
    monkeypatch.setenv("TRIFLOW_PALLAS_INTERPRET", "1")


def _setup(model, N):
    be = model.backend
    dtype = be.dtype
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(3)
    u0 = np.stack(
        [1.2 + 0.1 * np.cos(2 * np.pi * np.arange(N) / N * 5 + i)
         + 0.01 * rng.randn(N) for i in range(be.system.nvar)])
    pstack = be.pack_pars({p: 0.7 for p in be.system.pars}, x)
    plan = folded.plan_for_backend(be, N)
    assert plan is not None, "no fold plan for this N"
    uf = folded.fold(jnp.asarray(u0, dtype), plan)
    hf = folded.fold(jnp.zeros((0, N), dtype), plan)
    pf = folded.fold(jnp.asarray(pstack, dtype), plan)
    xf = folded.fold(jnp.asarray(x, dtype), plan)
    return be, plan, uf, hf, pf, xf, jnp.asarray(0.5, dtype)


def _row_pair(model, N, periodic, monkeypatch):
    be, plan, uf, hf, pf, xf, dx = _setup(model, N)
    scheme = schemes.RODASPR(model, time_stepping=False, tol=None)
    tables, s = scheme._tables, scheme._s
    out = megastep.row_step_folded(be, plan, tables, s, periodic,
                                   uf, hf, pf, xf, dx, 0.02)
    assert out is not None, f"megastep not applicable: {plan}"
    from triflow_tpu.core.schemes import _row_folded_core
    monkeypatch.setenv("TRIFLOW_NO_MEGA", "1")
    ref = _row_folded_core(be, plan, tables, s, periodic,
                           uf, hf, pf, xf, dx, 0.02)
    monkeypatch.delenv("TRIFLOW_NO_MEGA")
    return out, ref


@pytest.mark.parametrize("N,periodic", [
    (200, True),     # C = 50 -> folded Woodbury wrap correction
    (200, False),    # edge clamp
    (256, True),     # C = 64 power-of-two -> cyclic reduced PCR
])
def test_megastep_row_matches_folded(interpret_pallas, monkeypatch,
                                     N, periodic):
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    (u_mega, err_mega), (u_ref, err_ref) = _row_pair(model, N, periodic,
                                                     monkeypatch)
    assert np.allclose(np.asarray(u_mega), np.asarray(u_ref),
                       rtol=1e-10, atol=1e-10)
    assert np.isclose(float(err_mega), float(err_ref), rtol=1e-9)


@pytest.mark.parametrize("periodic", [True, False])
def test_megastep_with_parameters(interpret_pallas, monkeypatch, periodic):
    model = Model("k * dxxU - c * dxU", "U", ["k", "c"])
    (u_mega, _), (u_ref, _) = _row_pair(model, 200, periodic, monkeypatch)
    assert np.allclose(np.asarray(u_mega), np.asarray(u_ref),
                       rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("periodic", [True, False])
def test_megastep_two_variable_system(interpret_pallas, monkeypatch,
                                      periodic):
    model = Model(["-dxq", "-dx(q**2/h) - h * dxxxh + q / h"],
                  ["h", "q"])
    (u_mega, _), (u_ref, _) = _row_pair(model, 512, periodic, monkeypatch)
    assert np.allclose(np.asarray(u_mega), np.asarray(u_ref),
                       rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("periodic,theta", [
    (True, 1.0),
    (False, 0.5),
])
def test_megastep_theta_matches_folded(interpret_pallas, monkeypatch,
                                       periodic, theta):
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    be, plan, uf, hf, pf, xf, dx = _setup(model, 200)
    u2 = megastep.theta_step_folded(be, plan, theta, periodic,
                                    uf, hf, pf, xf, dx, 0.02)
    assert u2 is not None
    sch = schemes.Theta(model, theta=theta)
    from triflow_tpu.core.schemes import _DeviceProblem, null_hook
    monkeypatch.setenv("TRIFLOW_NO_MEGA", "1")
    prob = _DeviceProblem(model, null_hook, periodic)
    core = sch._folded_core(prob, plan, periodic)
    u_ref = core(0.0, uf, hf, pf, xf, dx, 0.02)
    monkeypatch.delenv("TRIFLOW_NO_MEGA")
    assert np.allclose(np.asarray(u2), np.asarray(u_ref),
                       rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("scheme_f", [
    lambda m: schemes.RODASPR(m, time_stepping=False, tol=None),
    lambda m: schemes.Theta(m, theta=1.0),
])
def test_megascan_matches_sequential_steps(interpret_pallas, scheme_f):
    """nsteps in ONE kernel (in-kernel fori_loop) == nsteps single-step
    kernel launches, bit-exactly (same traced step body)."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    be, plan, uf, hf, pf, xf, dx = _setup(model, 200)
    sch = scheme_f(model)
    api = sch.device_fixed_scan_folded(200, periodic=True)
    assert api is not None
    plan2, scan_f = api
    assert plan2 == plan
    u_scan = scan_f(0.0, uf, hf, pf, xf, dx, 0.02, 3)
    _plan3, fixed_f = sch.device_fixed_step_folded(200, periodic=True)
    u_ref = uf
    for _ in range(3):
        u_ref = fixed_f(0.0, u_ref, hf, pf, xf, dx, 0.02)[0]
    assert np.array_equal(np.asarray(u_scan), np.asarray(u_ref))


@pytest.mark.parametrize("periodic", [True, False])
def test_megastep_ensemble_members(interpret_pallas, monkeypatch, periodic):
    """B>1 member-partitioned plans: member-local PCR masks and the
    per-member Woodbury wrap must match the grid-kernel ensemble path."""
    model = Model("k * dxxU - c * dxU", "U", ["k", "c"])
    be = model.backend
    dtype = be.dtype
    N, B = 40, 8
    plans = folded.make_ensemble_plan(N, B, be.system.nvar, be.halo,
                                      be.window)
    plan = next(p for p in plans if megastep.applicable(be, p, 6))
    scheme = schemes.RODASPR(model, time_stepping=False, tol=1e-3)
    tables, s = scheme._tables, scheme._s
    rng = np.random.RandomState(5)
    x1 = np.arange(N) * 0.5
    u0 = np.concatenate(
        [1.0 + 0.2 * np.cos(2 * np.pi * np.arange(N) / N * (3 + b))
         + 0.02 * rng.randn(N) for b in range(B)])[None]
    x = np.concatenate([x1] * B)
    # per-member parameter values (the reference's sweep use-case)
    pstack = np.concatenate(
        [be.pack_pars({p: 0.5 + 0.3 * b / B for p in be.system.pars}, x1)
         for b in range(B)], axis=-1)
    uf = folded.fold(jnp.asarray(u0, dtype), plan)
    hf = folded.fold(jnp.zeros((0, B * N), dtype), plan)
    pf = folded.fold(jnp.asarray(pstack, dtype), plan)
    xf = folded.fold(jnp.asarray(x, dtype), plan)
    dx = jnp.asarray(0.5, dtype)
    out = megastep.row_step_folded(be, plan, tables, s, periodic,
                                   uf, hf, pf, xf, dx, 0.02)
    assert out is not None
    from triflow_tpu.core.schemes import _row_folded_core
    monkeypatch.setenv("TRIFLOW_NO_MEGA", "1")
    u_ref, err_ref = _row_folded_core(be, plan, tables, s, periodic,
                                      uf, hf, pf, xf, dx, 0.02)
    monkeypatch.delenv("TRIFLOW_NO_MEGA")
    assert np.allclose(np.asarray(out[0]), np.asarray(u_ref),
                       rtol=1e-10, atol=1e-10)
    assert np.isclose(float(out[1]), float(err_ref), rtol=1e-9)


def _adaptive_pair(N, periodic, monkeypatch, tol=1e-4, compensated=False,
                   max_iter=None):
    """One adaptive OUTPUT step via the whole-loop kernel vs the folded
    while_loop controller (TRIFLOW_NO_MEGA)."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U", double=True)
    be = model.backend
    dtype = be.dtype
    from triflow_tpu.core.schemes import null_hook
    x = jnp.asarray(np.arange(N) * 0.5, dtype)
    rng = np.random.RandomState(0)
    u0 = jnp.asarray((np.cos(2 * np.pi * np.arange(N) / N * 5)
                      + 0.1 * rng.randn(N))[None], dtype)
    helpers = jnp.zeros((0, N), dtype)
    pstack = jnp.zeros((0, N), dtype)
    args = (jnp.asarray(0.0, dtype), u0, helpers, pstack, x,
            jnp.asarray(0.5, dtype), jnp.asarray(0.1, dtype))
    sch = schemes.RODASPR(model, tol=tol, compensated=compensated,
                          max_iter=max_iter)
    out_mega = sch.device_stepper(hook=null_hook, periodic=periodic)(*args)
    monkeypatch.setenv("TRIFLOW_NO_MEGA", "1")
    sch2 = schemes.RODASPR(model, tol=tol, compensated=compensated,
                           max_iter=max_iter)
    out_ref = sch2.device_stepper(hook=null_hook, periodic=periodic)(*args)
    monkeypatch.delenv("TRIFLOW_NO_MEGA")
    return out_mega, out_ref


@pytest.mark.parametrize("N,periodic,compensated", [
    (200, True, False),   # Woodbury wrap closure
    (200, False, False),  # edge clamp
    (256, True, False),   # cyclic reduced PCR
    (200, True, True),    # Kahan-compensated accumulation
])
def test_mega_adaptive_matches_folded_loop(interpret_pallas, monkeypatch,
                                           N, periodic, compensated):
    """The in-kernel adaptive retry loop (accept/reject, dt control,
    status codes in ONE pallas_call) makes the same decisions as the
    folded-carry lax.while_loop controller."""
    out_m, out_r = _adaptive_pair(N, periodic, monkeypatch,
                                  compensated=compensated)
    _t, u_m, _h, _p, _x, dti_m, ni_m, st_m = out_m
    _t2, u_r, _h2, _p2, _x2, dti_r, ni_r, st_r = out_r
    assert int(ni_m) > 1, "test should exercise several internal attempts"
    assert int(ni_m) == int(ni_r)
    assert int(st_m) == int(st_r) == 0
    assert np.allclose(np.asarray(u_m), np.asarray(u_r),
                       rtol=1e-12, atol=1e-12)
    # dt_i may differ in the last ulps (differently-fused error norms
    # compound through the controller) but must agree to ~1e-8 rel
    assert np.isclose(float(dti_m), float(dti_r), rtol=1e-7)


def test_mega_adaptive_failure_status(interpret_pallas, monkeypatch):
    """max_iter exhaustion inside the kernel raises status 1 like the
    folded controller does."""
    out_m, out_r = _adaptive_pair(200, True, monkeypatch, tol=1e-30,
                                  max_iter=3)
    assert int(out_m[-1]) == int(out_r[-1]) == 1


def test_small_plan_gates(interpret_pallas):
    """small_plan_for serves only foldable small grids within budget."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U")
    be = model.backend
    plan = megastep.small_plan_for(be, 200)
    assert plan is not None and plan.Mc <= megastep._MC_CAP
    # unfoldable N (not a multiple of the halo grouping)
    assert megastep.small_plan_for(be, 201) is None
    # too small to split into >= 8 chunks
    assert megastep.small_plan_for(be, 8) is None


def test_mega_rejects_multi_lane_tile_plans(interpret_pallas):
    """Regression (measured SIGABRT on real TPU): straight-line (8, C8)
    slab kernels trip a Mosaic internal check once the chunk-lane axis
    spans more than one 128-lane tile, so ``applicable`` must reject
    C8 > 128 plans and the ensemble planner must steer to a deeper-Mc
    one-tile split instead."""
    model = Model("k * dxxU - U * dxU", "U", "k")  # halo 1 -> g = 1
    be = model.backend
    # B=16 x N=256, Mc=2 -> C = 16*128 = 2048 chunks -> C8 = 256: the
    # exact shape that crashed the TPU compiler before the gate
    bad = folded.FoldPlan(256, 1, 1, 1, be.window, 2048, 2, 2, False,
                          Cm=128)
    assert bad.C8 == 256
    assert not megastep.applicable(be, bad, 6)
    # the planner's accept callback steers to a one-tile plan
    plan = folded.plan_for_ensemble(
        be, 256, 16, accept=lambda p: megastep.applicable(be, p, 6))
    assert plan is not None and plan.C8 <= 128


def test_megastep_df64_matches_node_layout(interpret_pallas, monkeypatch):
    """The df64 whole-step kernel (row_step_df_folded: mixed-precision
    step — f32 factor of the rounded system, DF stages, in-kernel df64
    residual refinement — as ONE pallas_call) matches the node-layout
    mixed pipeline bit-for-bit in structure and to the df64 accuracy
    class in value, and both land at ~1e-13 of the f64 step."""
    from triflow_tpu.ops.df64 import DF

    N, dt = 64, 0.0625
    model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
    plan = folded.plan_for_backend(model.backend, N)
    assert plan is not None
    assert megastep.applicable_df(model.backend, plan, 3)

    x = np.arange(N, dtype=np.float64) * 0.5
    rng = np.random.RandomState(0)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 3)
          + 0.1 * rng.randn(N))[None]
    u = DF.from_float64(u0)
    h = DF.from_float64(np.zeros((0, N)))
    p = DF.from_float64(np.zeros((0, N)))
    xx = DF.from_float64(x)

    def one_step(**env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        try:
            sch = schemes.ROS3PRw(model, time_stepping=False, tol=None,
                                  df64_mixed_solve=1)
            fixed = sch.device_fixed_step(periodic=True)
            out, *_ = fixed(jnp.float32(0.0), u, h, p, xx,
                            jnp.float32(dt))
            return out.to_float64()
        finally:
            for k in env:
                monkeypatch.delenv(k)

    ref = one_step(TRIFLOW_NO_MEGA_DF="1")     # node-layout mixed path
    mega = one_step()                          # the whole-step kernel
    assert np.abs(mega - ref).max() < 1e-12

    m64 = Model("-dxxU - dxxxxU - U * dxU", "U", double=True)
    s64 = schemes.ROS3PRw(m64, time_stepping=False, tol=None)
    f64s = s64.device_fixed_step(periodic=True)
    r64, *_ = f64s(0.0, jnp.asarray(u0), jnp.zeros((0, N)),
                   jnp.zeros((0, N)), jnp.asarray(x), jnp.float64(dt))
    assert np.abs(mega - np.asarray(r64)).max() < 1e-11


def test_megatheta_tiled_matches_grid_path(interpret_pallas, monkeypatch):
    """The two-pass grid-blocked theta kernel (ops/megatheta, opt-in via
    TRIFLOW_MEGATHETA=1) matches the kernel-granular folded theta step:
    per-tile fused factor/data sweeps + the standard reduced interface
    machinery reproduce the same solve."""
    from triflow_tpu.ops import megatheta

    N, dt = 8192, 0.05
    model = Model("-U * dxU + nu * dxxU", "U", "nu", double=False)
    be = model.backend
    monkeypatch.setenv("TRIFLOW_MEGATHETA", "1")
    picked = megatheta.plan_for(be, N)
    assert picked is not None
    tplan, lb = picked
    assert tplan.C >= 1024 and tplan.Cp == tplan.C

    sch = schemes.Theta(model, theta=1.0)
    api_t = sch.device_fixed_step_folded(N, periodic=True)
    assert api_t is not None
    plan_t, fixed_t = api_t
    assert plan_t.C == tplan.C          # the tiled plan was selected

    monkeypatch.setenv("TRIFLOW_NO_MEGATHETA", "1")
    plan_r, fixed_r = schemes.Theta(model, theta=1.0).\
        device_fixed_step_folded(N, periodic=True)
    monkeypatch.delenv("TRIFLOW_NO_MEGATHETA")

    import jax.numpy as jnp

    x = np.arange(N, dtype=np.float64) * 0.5
    rng = np.random.RandomState(0)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 4)
          + 0.05 * rng.randn(N)).astype(np.float32)[None]
    pst = be.pack_pars(dict(nu=0.5, periodic=True),
                       jnp.asarray(x, jnp.float32))
    hf = jnp.zeros((0, N), jnp.float32)

    def run(plan, fixed):
        uf = folded.fold(jnp.asarray(u0), plan)
        out, _ = fixed(jnp.float32(0.0), uf,
                       folded.fold(hf, plan), folded.fold(pst, plan),
                       folded.fold(jnp.asarray(x, jnp.float32), plan),
                       jnp.float32(0.5), jnp.float32(dt))
        return np.asarray(folded.unfold(out, plan))

    a = run(plan_r, fixed_r)
    b = run(plan_t, fixed_t)
    assert np.abs(a - b).max() < 2e-5


def test_megastep_theta_df64_matches_node_layout(interpret_pallas,
                                                 monkeypatch):
    """The df64 theta whole-step kernel (1-stage table, rhs = dt*F with
    the theta*dt system coefficient) matches the node-layout mixed theta
    step and the f64 step."""
    from triflow_tpu.ops.df64 import DF

    N, dt = 64, 0.25
    x = np.linspace(0, 10, N, endpoint=False)
    u0 = np.cos(2 * np.pi * x / 10)[None]
    mdf = Model("k * dxxU - U * dxU", "U", "k", double="df64")
    u = DF.from_float64(u0)
    h = DF.from_float64(np.zeros((0, N)))
    p = DF.from_float64(np.broadcast_to(0.5, (1, N)).astype(np.float64))
    xx = DF.from_float64(x)

    def one(**env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        try:
            sch = schemes.Theta(mdf, theta=1.0, df64_mixed_solve=1)
            out, *_ = sch.device_fixed_step(periodic=True)(
                jnp.float32(0.0), u, h, p, xx, jnp.float32(dt))
            return out.to_float64()
        finally:
            for k in env:
                monkeypatch.delenv(k)

    ref = one(TRIFLOW_NO_MEGA_DF="1")
    mega = one()
    assert np.abs(mega - ref).max() < 1e-12

    m64 = Model("k * dxxU - U * dxU", "U", "k", double=True)
    s64 = schemes.Theta(m64, theta=1.0)
    p64 = m64.backend.pack_pars(dict(k=0.5, periodic=True),
                                jnp.asarray(x))
    r64, *_ = s64.device_fixed_step(periodic=True)(
        0.0, jnp.asarray(u0), jnp.zeros((0, N)), p64, jnp.asarray(x),
        jnp.float64(dt))
    assert np.abs(mega - np.asarray(r64)).max() < 1e-11
