"""Spatial sharding (SP analog): halo-exchange F/J and the distributed SPIKE
banded solve over an 8-device CPU mesh must reproduce the single-device
results exactly (SURVEY.md §4 multi-device test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from triflow_tpu import Model, schemes
from triflow_tpu.parallel.spatial import SpatialModel


def make_mesh(n=8, axis="space"):
    devices = np.array(jax.devices()[:n])
    return Mesh(devices, (axis,))


@pytest.fixture(scope="module")
def ks_model():
    return Model("-dxxU - dxxxxU - U * dxU", "U")


@pytest.fixture(scope="module")
def wave_model():
    return Model(["c**2 * dxxu", "v"], ["v", "u"], ["c"])


def _states(model, N, seed=0):
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(seed)
    nvar = len(model._dep_vars)
    u = np.stack([np.cos(0.1 * x + i) + 0.05 * rng.randn(N) for i in range(nvar)])
    fields = model.fields_template(
        x=x, **{v: u[i] for i, v in enumerate(model._dep_vars)}
    )
    return x, u, fields


@pytest.mark.parametrize("periodic", [True, False])
def test_sharded_F_matches_single_device(ks_model, periodic):
    N = 256
    x, u, fields = _states(ks_model, N)
    sm = SpatialModel(ks_model, make_mesh(), periodic=periodic)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    F_ref = be.F(jnp.asarray(u, be.dtype), helpers, pstack,
                 jnp.asarray(x, be.dtype), periodic=periodic)

    F_fn = sm.F()
    _t, F_sharded = F_fn(0.0, sm.shard(u), sm.shard(helpers), sm.shard(pstack),
                         sm.shard(x), 0.0)
    assert np.allclose(np.asarray(F_sharded), np.asarray(F_ref),
                       rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("model_name,periodic", [
    ("ks", True), ("ks", False), ("wave", False),
    # wave x periodic is the lane's single slowest theta compile (~14 s
    # warm); the 2-var periodic reduced closure it adds on top of the
    # three params above moves to nightly (lane budget, BASELINE.md
    # "Fast lane").
    pytest.param("wave", True, marks=pytest.mark.slow),
])
def test_sharded_theta_matches_single_device(ks_model, wave_model,
                                             model_name, periodic):
    model = ks_model if model_name == "ks" else wave_model
    N = 512
    x, u, fields = _states(model, N)
    pars = {"periodic": periodic}
    if "c" in model._pars:
        pars["c"] = 0.8
    be = model.backend
    u_dev = jnp.asarray(u, be.dtype)
    x_dev = jnp.asarray(x, be.dtype)
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = be.pack_pars(pars, x_dev)

    # single-device reference step
    theta = schemes.Theta(model, theta=1.0)
    fixed = theta.device_fixed_step(periodic=periodic)
    u_ref, *_ = fixed(0.0, u_dev, helpers, pstack, x_dev, 0.01)

    sm = SpatialModel(model, make_mesh(), periodic=periodic)
    step = sm.theta_stepper(theta=1.0)
    t2, u_sh = step(0.0, sm.shard(u), sm.shard(helpers), sm.shard(pstack),
                    sm.shard(x), 0.01)
    assert float(t2) == pytest.approx(0.01)
    assert np.allclose(np.asarray(u_sh), np.asarray(u_ref),
                       rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("periodic", [True, False])
def test_sharded_rodaspr_matches_single_device(ks_model, periodic):
    N = 512
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    u_dev = jnp.asarray(u, be.dtype)
    x_dev = jnp.asarray(x, be.dtype)
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    scheme = schemes.RODASPR(ks_model, time_stepping=False, tol=None)
    fixed = scheme.device_fixed_step(periodic=periodic)
    u_ref, *_ = fixed(0.0, u_dev, helpers, pstack, x_dev, 0.02)

    sm = SpatialModel(ks_model, make_mesh(), periodic=periodic)
    step = sm.row_stepper(schemes.RODASPR)
    t2, u_sh = step(0.0, sm.shard(u), sm.shard(helpers), sm.shard(pstack),
                    sm.shard(x), 0.02)
    assert np.allclose(np.asarray(u_sh), np.asarray(u_ref),
                       rtol=1e-8, atol=1e-9)
    # the state must stay sharded over all 8 devices
    assert len(u_sh.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_multistep_trajectory(ks_model):
    """Several sharded RODASPR steps vs single-device trajectory."""
    N = 256
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)
    scheme = schemes.RODASPR(ks_model, time_stepping=False, tol=None)
    fixed = scheme.device_fixed_step(periodic=True)

    u_ref = jnp.asarray(u, be.dtype)
    t = 0.0
    for _ in range(5):
        u_ref, *_ = fixed(t, u_ref, helpers, pstack,
                          jnp.asarray(x, be.dtype), 0.05)
        t += 0.05

    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    step = sm.row_stepper(schemes.RODASPR)
    u_sh = sm.shard(u)
    hs, ps, xs = sm.shard(helpers), sm.shard(pstack), sm.shard(x)
    t2 = 0.0
    for _ in range(5):
        t2, u_sh = step(t2, u_sh, hs, ps, xs, 0.05)
    assert np.allclose(np.asarray(u_sh), np.asarray(u_ref),
                       rtol=1e-8, atol=1e-8)


def test_grid_must_divide_mesh(ks_model):
    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    with pytest.raises(ValueError):
        sm.shard(np.zeros(130))


# ---------------------------------------------------------------------------
# scheme integration: hooks + adaptive dt + the Simulation surface
# ---------------------------------------------------------------------------

from triflow_tpu import Simulation  # noqa: E402


def _run(model, fields0, pars, mesh=None, **kw):
    data = {k: np.asarray(fields0[k]) for k in fields0.keys()}
    sim = Simulation(model, model.fields_template(**data), dict(pars),
                     mesh=mesh, **kw)
    for t, fields in sim:
        pass
    return sim, t, fields


@pytest.mark.slow
def test_sharded_adaptive_matches_single_device(ks_model):
    """VERDICT r1 item 2: the lax.while_loop dt controller on the sharded
    grid (error pmax-reduced across shards) must reproduce the single-device
    adaptive trajectory to 1e-8."""
    N = 256
    x, u, fields = _states(ks_model, N)
    pars = dict(periodic=True)
    _, t_ref, f_ref = _run(ks_model, fields, pars, dt=0.25, tmax=1.0,
                           tol=1e-5)
    _, t_sh, f_sh = _run(ks_model, fields, pars, mesh=make_mesh(), dt=0.25,
                         tmax=1.0, tol=1e-5)
    assert t_sh == pytest.approx(t_ref)
    assert np.allclose(np.asarray(f_sh["U"]), np.asarray(f_ref["U"]),
                       rtol=1e-8, atol=1e-8)


def test_sharded_time_stepping_wrapper_plan_gate(ks_model, monkeypatch):
    """Regression: DeviceTimeStepping's folded-carry gate must route
    through the INNER scheme's _folded_plan_for — the sharded mixin
    overrides it to None, and bypassing that would fold mesh-sharded
    global state through single-address-space kernels."""
    monkeypatch.setenv("TRIFLOW_PALLAS_INTERPRET", "1")
    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    cls = sm.scheme_class(schemes.Theta)
    inner = cls(ks_model, theta=1.0)
    wrapped = schemes.time_stepping(inner, tol=1e-2, m=4)
    assert isinstance(wrapped, schemes.DeviceTimeStepping)
    problem = schemes._DeviceProblem(ks_model, schemes.null_hook, True)
    N = 2048  # large enough that a fold plan exists in interpret mode
    x = np.arange(N) * 0.5
    u = jnp.asarray(np.cos(0.1 * x)[None], ks_model.backend.dtype)
    # a plain Theta in interpret mode DOES yield a plan — the override,
    # not the environment, is what disables the folded path here
    plain = schemes.Theta(ks_model, theta=1.0)
    assert plain._folded_plan_for(
        problem, u, jnp.asarray(x, ks_model.backend.dtype)) is not None
    # the wrapper's gate resolves the plan via the inner (sharded) scheme
    assert wrapped._inner._folded_plan_for(
        problem, u, jnp.asarray(x, ks_model.backend.dtype)) is None


def test_sharded_refine_matches_single_device(ks_model):
    """VERDICT r2 item 5: sharded ``refine=1`` runs the residual matvec
    through the halo-extended bands and corrects through the same SPIKE
    factorization — it must match the single-device refine=1 step."""
    N = 512
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    scheme = schemes.RODASPR(ks_model, time_stepping=False, tol=None,
                             refine=1)
    fixed = scheme.device_fixed_step(periodic=True)
    u_ref, *_ = fixed(0.0, jnp.asarray(u, be.dtype), helpers, pstack,
                      jnp.asarray(x, be.dtype), 0.02)

    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    step = sm.row_stepper(schemes.RODASPR, refine=1)
    _t2, u_sh = step(0.0, sm.shard(u), sm.shard(helpers), sm.shard(pstack),
                     sm.shard(x), 0.02)
    assert np.allclose(np.asarray(u_sh), np.asarray(u_ref),
                       rtol=1e-8, atol=1e-9)


def test_sharded_periodic_nonpow2_ndev(ks_model):
    """VERDICT r2 item 3: a periodic ring on a NON-power-of-two device
    count (6 — a real pod subshape) closes through the acyclic-PCR +
    rank-2P Woodbury interface path (no dense inverse of the gathered
    system) and matches the single device step to 1e-8."""
    N = 510  # divides 6, not a power of two
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    scheme = schemes.RODASPR(ks_model, time_stepping=False, tol=None)
    fixed = scheme.device_fixed_step(periodic=True)
    u_ref, *_ = fixed(0.0, jnp.asarray(u, be.dtype), helpers, pstack,
                      jnp.asarray(x, be.dtype), 0.02)

    sm = SpatialModel(ks_model, make_mesh(6), periodic=True)
    step = sm.row_stepper(schemes.RODASPR)
    _t2, u_sh = step(0.0, sm.shard(u), sm.shard(helpers), sm.shard(pstack),
                     sm.shard(x), 0.02)
    assert np.allclose(np.asarray(u_sh), np.asarray(u_ref),
                       rtol=1e-8, atol=1e-9)
    assert len(u_sh.sharding.device_set) == 6


def test_sharded_erk_matches_single_device():
    """Explicit adaptive RK (DOPRI5) on the sharded grid: stages are halo
    rings + local F, error pmax-reduced; must match the single-device
    adaptive trajectory to 1e-8."""
    model = Model("k * dxxU - c * dxU", "U", ["k", "c"])
    N = 256
    x = np.linspace(0, 10, N, endpoint=False)
    fields0 = model.fields_template(x=x, U=np.cos(2 * np.pi * x / 10))
    pars = dict(periodic=True, k=1e-2, c=0.5)
    kw = dict(dt=0.25, tmax=1.0, scheme=schemes.DOPRI5, tol=1e-8)
    _, t_ref, f_ref = _run(model, fields0, pars, **kw)
    _, t_sh, f_sh = _run(model, fields0, pars, mesh=make_mesh(), **kw)
    assert t_sh == pytest.approx(t_ref)
    assert np.allclose(np.asarray(f_sh["U"]), np.asarray(f_ref["U"]),
                       rtol=1e-8, atol=1e-8)


def test_sharded_dirichlet_hook_matches_single_device():
    """VERDICT r1 item 3: the README advection-diffusion workload (BASELINE
    config 1, Dirichlet hook, edge BC) runs sharded through Simulation and
    matches the single-device run to 1e-8."""
    model = Model("k * dxxU - c * dxU", "U", ["k", "c"])
    x = np.linspace(0, 1, 200)
    U = np.cos(2 * np.pi * x * 5)
    pars = dict(periodic=False, k=1e-3, c=3e-3)

    def dirichlet(t, fields, pars):
        fields["U"] = fields["U"].at[0].set(1.0).at[-1].set(0.0)
        return fields, pars

    fields0 = model.fields_template(x=x, U=U)
    kw = dict(hook=dirichlet, dt=5.0, tmax=50.0, scheme=schemes.Theta,
              theta=1.0, time_stepping=False)
    _, t_ref, f_ref = _run(model, fields0, pars, **kw)
    _, t_sh, f_sh = _run(model, fields0, pars, mesh=make_mesh(), **kw)
    U_sh = np.asarray(f_sh["U"])
    assert U_sh[0] == pytest.approx(1.0)
    assert U_sh[-1] == pytest.approx(0.0, abs=1e-12)
    assert np.allclose(U_sh, np.asarray(f_ref["U"]), rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_sharded_simulation_run_with_container(ks_model, tmpdir):
    """VERDICT r1 item 4: the L5 surface (run/container/persistence) drives
    a distributed adaptive run."""
    N = 128
    x, u, fields = _states(ks_model, N)
    pars = dict(periodic=True)
    sim = Simulation(ks_model, fields, dict(pars), mesh=make_mesh(),
                     dt=0.5, tmax=1.5, tol=1e-4, id="sharded_ks")
    sim.attach_container(str(tmpdir))
    t, f = sim.run(progress=False)
    assert t == pytest.approx(1.5)
    assert sim.status == "finished"
    from triflow_tpu import retrieve_container

    data = retrieve_container(str(tmpdir.join("sharded_ks"))).data
    assert len(np.asarray(data["t"])) == 4  # t = 0, .5, 1., 1.5
    assert np.allclose(np.asarray(data["U"])[-1], np.asarray(f["U"]))


@pytest.mark.slow
def test_sharded_adaptive_raw_stepper(ks_model):
    """row_stepper(time_stepping=True) exposes the device-resident adaptive
    controller over raw arrays."""
    N = 256
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    step = sm.row_stepper(schemes.RODASPR, time_stepping=True, tol=1e-5)
    t, u_sh, idt = 0.0, sm.shard(u), 1e-6
    for _ in range(2):
        t, u_sh, idt, status = step(t, u_sh, sm.shard(helpers),
                                    sm.shard(pstack), sm.shard(x), 0.25, idt)
        assert int(status) == 0
    assert t == pytest.approx(0.5)

    # single-device adaptive reference through the scheme surface
    scheme = schemes.RODASPR(ks_model, time_stepping=True, tol=1e-5)
    t_ref, f = 0.0, fields
    for _ in range(2):
        t_ref, f = scheme(t_ref, f, 0.25, dict(periodic=True))
    assert np.allclose(np.asarray(u_sh), np.asarray(f["U"])[None],
                       rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_sharded_checkpoint_resume(ks_model, tmpdir):
    """Checkpoint/resume works with a sharded (mesh=) simulation: the
    resumed sharded trajectory matches the uninterrupted one."""
    N = 128
    x, u, fields = _states(ks_model, N)
    pars = dict(periodic=True)
    kw = dict(dt=0.5, tmax=2.0, tol=1e-6)

    ref = Simulation(ks_model, fields, dict(pars), mesh=make_mesh(), **kw)
    t_ref, f_ref = ref.run(progress=False)

    first = Simulation(ks_model, fields, dict(pars), mesh=make_mesh(), **kw)
    for t, _f in first:
        if t >= 1.0:
            break
    ckpt = str(tmpdir.join("sharded.ckpt.h5"))
    first.save_checkpoint(ckpt)
    resumed = Simulation.from_checkpoint(ckpt, ks_model, mesh=make_mesh(),
                                         tol=1e-6)
    assert resumed.t == pytest.approx(1.0)
    t2, f2 = resumed.run(progress=False)
    assert t2 == pytest.approx(2.0)
    assert np.allclose(np.asarray(f2["U"]), np.asarray(f_ref["U"]),
                       rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_sharded_folded_local_solve_matches(ks_model, monkeypatch):
    """The folded-layout local SPIKE factor/solve (interpret mode; engages
    when each shard's grid is big enough to fold, Nl >= 2048) matches the
    node-layout local path on the same sharded step."""
    monkeypatch.setenv("TRIFLOW_PALLAS_INTERPRET", "1")
    from triflow_tpu.ops import folded

    N = 16384                       # 2048 nodes per shard -> plan applies
    assert folded.plan_for_local_bands(1, 2, 5, N // 8,
                                       jnp.float32) is not None
    x, u, fields = _states(ks_model, N)
    be = ks_model.backend
    helpers = jnp.zeros((0, N), be.dtype)
    pstack = jnp.zeros((0, N), be.dtype)

    sm = SpatialModel(ks_model, make_mesh(), periodic=True)
    step = sm.row_stepper(schemes.RODASPR)
    _, u_folded = step(0.0, sm.shard(u), sm.shard(helpers),
                       sm.shard(pstack), sm.shard(x), 0.02)

    monkeypatch.setenv("TRIFLOW_NO_FOLDED_SPATIAL", "1")
    sm2 = SpatialModel(ks_model, make_mesh(), periodic=True)
    step2 = sm2.row_stepper(schemes.RODASPR)
    _, u_node = step2(0.0, sm2.shard(u), sm2.shard(helpers),
                      sm2.shard(pstack), sm2.shard(x), 0.02)
    monkeypatch.delenv("TRIFLOW_NO_FOLDED_SPATIAL")

    assert np.allclose(np.asarray(u_folded), np.asarray(u_node),
                       rtol=1e-9, atol=1e-10)


# ---------------------------------------------------------------------------
# df64 spatial sharding (VERDICT r3 missing #1/#2: precision x parallelism).
# DF halo rings + mixed-precision SPIKE stage solves (f32 factorization of
# the rounded system + df64 residual refinement against the df64
# distributed operator — spatial._row_core docstring).
# ---------------------------------------------------------------------------

def _df64_state(N, seed=0):
    from triflow_tpu.ops.df64 import DF

    x = np.arange(N) * 0.5
    rng = np.random.RandomState(seed)
    u = (np.cos(0.1 * x) + 0.05 * rng.randn(N))[None]
    return (x, u, DF.from_float64(u), DF.from_float64(np.zeros((0, N))),
            DF.from_float64(np.zeros((0, N))), DF.from_float64(x))


@pytest.mark.parametrize(
    "periodic",
    [True,
     # the edge-mode variant compiles a second full df64 shard_map trace
     # for ~15 s on the 1-core harness — nightly (the periodic variant
     # keeps the df64 sharded step in the fast lane, VERDICT r4 weak #6)
     pytest.param(False, marks=pytest.mark.slow)])
def test_sharded_df64_row_step_matches_single_device(periodic):
    """One fixed df64 ROW step sharded over 8 devices matches the
    single-device df64 step to <= 1e-12 (the r3 'done' bar): DF state
    shards componentwise, halo rings carry exact pairs, and the mixed
    SPIKE solves land in the full-df64 solver's accuracy class."""
    model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
    N = 256
    x, u_np, u, h, p, xx = _df64_state(N)

    # ROS2 (2 stages): the DF-halo/mixed-SPIKE property is
    # scheme-independent and the df64 shard_map traces are compile-bound
    # on the CPU harness (was ROS3PRw at 52 s for the two params)
    scheme = schemes.ROS2(model)
    fixed = scheme.device_fixed_step(periodic=periodic)
    ref, *_ = fixed(jnp.float32(0.0), u, h, p, xx, jnp.float32(0.02))

    sm = SpatialModel(model, make_mesh(), periodic=periodic)
    step = sm.row_stepper(schemes.ROS2)
    _t2, u_sh = step(jnp.float32(0.0), sm.shard(u), sm.shard(h),
                     sm.shard(p), sm.shard(xx), jnp.float32(0.02))
    d = np.abs(u_sh.to_float64() - ref.to_float64()).max()
    assert d < 1e-12, (periodic, d)
    assert len(u_sh.hi.sharding.device_set) == 8


def test_sharded_df64_theta_step_matches_single_device():
    model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
    N = 256
    x, u_np, u, h, p, xx = _df64_state(N)
    th = schemes.Theta(model, theta=1.0)
    fixed = th.device_fixed_step(periodic=True)
    ref, *_ = fixed(jnp.float32(0.0), u, h, p, xx, jnp.float32(0.01))

    sm = SpatialModel(model, make_mesh(), periodic=True)
    step = sm.theta_stepper(theta=1.0)
    _t2, u_sh = step(jnp.float32(0.0), sm.shard(u), sm.shard(h),
                     sm.shard(p), sm.shard(xx), jnp.float32(0.01))
    d = np.abs(u_sh.to_float64() - ref.to_float64()).max()
    assert d < 1e-12, d


@pytest.mark.slow
def test_sharded_df64_simulation_trajectory(ks_model):
    """The r3 'done' condition end to end: a df64 KS trajectory through
    Simulation(mesh=...) (fixed-dt ROS2, 4 output steps) matches the
    single-device df64 Simulation to <= 1e-12 — and mesh= no longer
    crashes on a df64 model (r3: ValueError in SpatialModel.shard)."""
    from triflow_tpu import Simulation

    model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
    N = 256
    x = np.arange(N) * 0.5
    rng = np.random.RandomState(0)
    u0 = np.cos(0.1 * x) + 0.05 * rng.randn(N)

    def run(mesh):
        kw = dict(mesh=mesh) if mesh is not None else {}
        sim = Simulation(model, model.fields_template(x=x, U=u0),
                         dict(periodic=True), dt=0.125, tmax=0.5,
                         scheme=schemes.ROS2, time_stepping=False, **kw)
        for t, fields in sim:
            pass
        return np.asarray(fields["U"])

    ref = run(None)
    sh = run(make_mesh())
    assert np.abs(sh - ref).max() < 1e-12


@pytest.mark.slow
def test_sharded_df64_erk_step_matches_single_device():
    """df64 explicit RK sharding: stages are DF halo rings + df64 local F
    (no solve) — one fixed DOPRI5 step over 8 devices matches the
    single-device df64 step to double-float round-off."""
    model = Model("-dxxU - U * dxU", "U", double="df64")
    N = 256
    x, u_np, u, h, p, xx = _df64_state(N)
    scheme = schemes.DOPRI5(model, time_stepping=False, tol=None)
    fixed = scheme.device_fixed_step(periodic=True)
    ref, *_ = fixed(jnp.float32(0.0), u, h, p, xx, jnp.float32(0.005))

    sm = SpatialModel(model, make_mesh(), periodic=True)
    cls = sm.scheme_class(schemes.DOPRI5)
    sch = cls(model, time_stepping=False, tol=None)
    fixed_sh = sch.device_fixed_step(periodic=True)
    u2, *_ = fixed_sh(jnp.float32(0.0), sm.shard(u), sm.shard(h),
                      sm.shard(p), sm.shard(xx), jnp.float32(0.005))
    d = np.abs(u2.to_float64() - ref.to_float64()).max()
    assert d < 1e-13, d
