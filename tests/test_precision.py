"""Precision envelope (SURVEY.md §7 hard part 5, BASELINE 1e-8 target).

Measured decomposition of the f32 trajectory error (documented in
BASELINE.md "Precision"): per-step representation/F-eval rounding
random-walks to ~5e-6 over 2000 steps on a smooth problem and is
Lyapunov-amplified on chaotic ones; it is NOT dominated by state-addition
rounding (Kahan: no change) nor by solve inaccuracy (iterative refinement:
no change) — both measured.  The 1e-8 target therefore requires f64, which
the framework reaches on BOTH CPU and TPU: `double=True` routes the solver
onto the XLA sweeps (the Pallas kernels are f32-gated) and the TPU f64
trajectory matches CPU f64 to ~1e-12.

These tests pin (a) the f32 envelope magnitude, (b) that the optional
``compensated``/``refine`` knobs run and stay inside the envelope, and
(c) that f64 meets the 1e-8 target against an independent oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from triflow_tpu import Model, schemes


def _advdiff_trajectory(double, steps=2000, N=1024, **scheme_kwargs):
    import jax

    model = Model("k * dxxU - c * dxU", "U", ["k", "c"], double=double)
    scheme = schemes.RODASPR(model, time_stepping=False, tol=None,
                             **scheme_kwargs)
    fixed = scheme.device_fixed_step(periodic=True)
    dtype = model.backend.dtype
    dt = jnp.asarray(0.01, dtype)
    xs = np.linspace(0, 10, N, endpoint=False)
    x = jnp.asarray(xs, dtype)
    u0 = jnp.asarray(np.cos(xs * 2 * np.pi / 10)[None] + 2.0, dtype)
    helpers = jnp.zeros((0, N), dtype)
    pstack = model.backend.pack_pars(dict(k=0.05, c=0.3, periodic=True), x)

    def chain(carry, _):
        t, u = carry
        u2, *_ = fixed(t, u, helpers, pstack, x, dt)
        return (t + dt, u2), ()

    @jax.jit
    def go(t, u):
        return jax.lax.scan(chain, (t, u), length=steps)[0]

    _t, u = go(jnp.asarray(0.0, dtype), u0)
    return np.asarray(u, np.float64)


@pytest.fixture(scope="module")
def f64_reference():
    return _advdiff_trajectory(double=True)


def test_f32_envelope(f64_reference):
    """The f32 trajectory envelope after 2000 implicit steps is a few 1e-6
    (random-walk of per-step rounding) — far above 1e-8, documenting why
    the correctness target requires double=True."""
    err = np.abs(_advdiff_trajectory(double=False) - f64_reference).max()
    assert 1e-8 < err < 5e-5, err


def test_f32_options_stay_in_envelope(f64_reference):
    """compensated / refine knobs compile and do not degrade beyond the
    envelope (they cannot improve it: the error is representation-bound,
    measured — see module docstring)."""
    for kw in (dict(compensated=True), dict(refine=1)):
        err = np.abs(
            _advdiff_trajectory(double=False, steps=500, **kw)
            - _advdiff_trajectory(double=True, steps=500)
        ).max()
        assert err < 5e-5, (kw, err)


def test_f64_meets_1e8_target():
    """double=True meets the BASELINE 1e-8 trajectory target against the
    EXACT solution of the discrete operator (advection-diffusion cosine
    mode: decay k*(2cos(om dx)-2)/dx^2, phase speed c*sin(om dx)/dx).

    Measured here: RODASPR at tol=1e-12 lands ~8e-10 from exact — tighter
    than scipy/vode at atol=rtol=1e-13, which only reaches ~3e-7 on the
    same problem (so vode cannot serve as the 1e-8 oracle).  On chaotic
    KS the like-for-like f64 check is TPU-vs-CPU at ~1e-12 (BASELINE.md)."""
    from triflow_tpu import Simulation

    model = Model("k * dxxU - c * dxU", "U", ["k", "c"])
    N = 256
    x, dx = np.linspace(0, 10, N, endpoint=False, retstep=True)
    om = 2 * np.pi / 10
    U0 = np.cos(om * x)
    k, c = 0.05, 0.3
    T = 2.0
    sim = Simulation(model, model.fields_template(x=x, U=U0),
                     dict(periodic=True, k=k, c=c), dt=0.5, tmax=T,
                     tol=1e-12)
    for t, fields in sim:
        pass
    lam = k * (2 * np.cos(om * dx) - 2) / dx ** 2
    mu = c * np.sin(om * dx) / dx
    exact = np.exp(lam * T) * np.cos(om * x - mu * T)
    assert np.abs(np.asarray(fields["U"]) - exact).max() < 1e-8


# ---------------------------------------------------------------------------
# df64 (double-float): the 1e-8 target at f32-hardware speed (VERDICT r2
# item 1 — ops/df64.py / ops/banded_df.py)
# ---------------------------------------------------------------------------

def test_df64_arithmetic_under_jit():
    """The error-free transforms must survive jit compilation: XLA:CPU's
    LLVM lowering FMA-contracts multiplies into consumers, which silently
    broke the classical Dekker product (7 decimal digits lost, measured);
    the shipped two_prod assembles the product from exact 12-bit partials
    and is rewrite-immune by construction.  This test pins that property —
    it fails with ~1e-7 errors if two_prod regresses to a contraction-prone
    form."""
    import jax

    from triflow_tpu.ops.df64 import DF

    rng = np.random.RandomState(0)
    k = DF.from_float64(0.05 * rng.randn(1, 96))
    u = DF.from_float64(rng.randn(1, 96))
    coeffs = (28.64361161, -3.07211773, -57.71212046, -0.99116566)

    def combo(u, k):
        out = u
        for c in coeffs:
            out = out + c * k
        return out

    ref = u.to_float64() + sum(c * k.to_float64() for c in coeffs)
    jitted = jax.jit(combo)(u, k)
    assert np.max(np.abs(jitted.to_float64() - ref)) < 1e-12
    # division and sqrt too
    q = jax.jit(lambda u, k: u / k)(u, k)
    assert np.max(np.abs(q.to_float64() - u.to_float64() / k.to_float64())
                  / np.abs(u.to_float64() / k.to_float64())) < 1e-13


@pytest.mark.parametrize(
    "W,nvar,N,periodic",
    [(5, 1, 160, True),
     # the block (nvar=2) case compiles a much larger df64 trace — nightly
     pytest.param(5, 2, 200, False, marks=pytest.mark.slow)])
def test_df64_banded_solver_vs_scipy(W, nvar, N, periodic):
    """df64 factor+solve matches the scipy f64 sparse solve to ~1e-13."""
    import jax
    import scipy.sparse.linalg as spla

    from triflow_tpu.core.compiler import bands_to_csc
    from triflow_tpu.ops import banded_df as bdf
    from triflow_tpu.ops.df64 import DF

    rng = np.random.RandomState(0)
    for (W, nvar, N, periodic) in [(W, nvar, N, periodic)]:
        h = W // 2
        bands64 = rng.randn(W, nvar, nvar, N) * 0.1
        di = np.arange(nvar)
        bands64[h, di, di, :] += 5.0
        rhs64 = rng.randn(nvar, N)
        A = bands_to_csc(bands64, periodic)
        x_ref = spla.spsolve(A, np.moveaxis(rhs64, 0, 1).reshape(-1))
        x_ref = x_ref.reshape(N, nvar).T

        solve = jax.jit(
            lambda b, r, p=periodic: bdf.factor_banded_df(b, p).solve(r))
        x = solve(DF.from_float64(bands64), DF.from_float64(rhs64))
        rel = np.max(np.abs(x.to_float64() - x_ref)) / np.max(np.abs(x_ref))
        assert rel < 1e-12, (W, nvar, N, periodic, rel)


@pytest.mark.slow
def test_df64_meets_1e8_target_ks():
    """VERDICT r2 item 1 'done' condition: a df64 KS trajectory matches the
    CPU-f64 trajectory to <= 1e-8 (measured ~1e-13 over 40 steps) while
    computing exclusively in paired-f32 arithmetic — reference-grade
    precision (model.py:148 double=True) on f32-only hardware.  The same
    pipeline measured 1.5e-13 vs CPU f64 on the REAL TPU chip (BASELINE.md
    §Precision, round 3)."""
    import jax

    from triflow_tpu.ops.df64 import DF

    N, steps = 96, 40
    dt = 0.0625  # exactly representable in f32: both paths use the same dt
    x = np.arange(N, dtype=np.float64) * 0.5
    rng = np.random.RandomState(0)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 3)
          + 0.1 * rng.randn(N))[None]

    def run(double):
        model = Model("-dxxU - dxxxxU - U * dxU", "U", double=double)
        scheme = schemes.RODASPR(model, time_stepping=False, tol=None)
        fixed = scheme.device_fixed_step(periodic=True)
        if double == "df64":
            u = DF.from_float64(u0)
            h = DF.from_float64(np.zeros((0, N)))
            p = DF.from_float64(np.zeros((0, N)))
            xx = DF.from_float64(x)
            step = jax.jit(
                lambda t, u: fixed(t, u, h, p, xx, jnp.float32(dt))[0])
            u_ = u
            for i in range(steps):
                u_ = step(jnp.float32(i * dt), u_)
            return u_.to_float64()[0]
        dtype = model.backend.dtype
        u = jnp.asarray(u0, dtype)
        h = jnp.zeros((0, N), dtype)
        p = jnp.zeros((0, N), dtype)
        xx = jnp.asarray(x, dtype)
        step = jax.jit(
            lambda t, u: fixed(t, u, h, p, xx, jnp.asarray(dt, dtype))[0])
        u_ = u
        for i in range(steps):
            u_ = step(jnp.asarray(i * dt, dtype), u_)
        return np.asarray(u_[0], np.float64)

    ref = run(True)       # native f64 (x64 is on in the test harness)
    vdf = run("df64")
    err = np.max(np.abs(vdf - ref))
    assert err < 1e-8, err      # the BASELINE target
    assert err < 1e-11, err     # the measured headroom (documented 1e-13)


def test_df64_simulation_end_to_end():
    """Model(double='df64') through the full Simulation driver: host fields
    stay float64, device stepping runs on (hi, lo) f32 pairs, and the
    trajectory matches the exact discrete-operator solution to 1e-8 (same
    workload as test_f64_meets_1e8_target)."""
    from triflow_tpu import Simulation

    model = Model("k * dxxU - c * dxU", "U", ["k", "c"], double="df64")
    assert model.precision == "df64"
    N = 256
    x, dx = np.linspace(0, 10, N, endpoint=False, retstep=True)
    om = 2 * np.pi / 10
    U0 = np.cos(om * x)
    k, c = 0.05, 0.3
    T = 2.0
    sim = Simulation(model, model.fields_template(x=x, U=U0),
                     dict(periodic=True, k=k, c=c), dt=0.5, tmax=T,
                     tol=1e-12)
    for t, fields in sim:
        pass
    lam = k * (2 * np.cos(om * dx) - 2) / dx ** 2
    mu = c * np.sin(om * dx) / dx
    exact = np.exp(lam * T) * np.cos(om * x - mu * T)
    assert np.asarray(fields["U"]).dtype == np.float64
    assert np.abs(np.asarray(fields["U"]) - exact).max() < 1e-8


def test_df64_mixed_solve_accuracy():
    """df64_mixed_solve=n replaces the full-df64 stage solves with an
    f32-factorization preconditioner + n df64-residual refinement passes
    (Higham-style mixed precision).  On the well-conditioned KS system one
    pass already reaches the full-df64 accuracy class (~1e-13 vs f64)."""
    import jax

    from triflow_tpu.ops.df64 import DF

    N, steps, dt = 96, 20, 0.0625
    x = np.arange(N, dtype=np.float64) * 0.5
    rng = np.random.RandomState(0)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 3)
          + 0.1 * rng.randn(N))[None]

    def run(double, **kw):
        model = Model("-dxxU - dxxxxU - U * dxU", "U", double=double)
        # ROS3PRw (3 stages): the mixed-solve property is
        # scheme-independent; the RODASPR df64 trace costs 2x the compile
        scheme = schemes.ROS3PRw(model, time_stepping=False, tol=None,
                                 **kw)
        fixed = scheme.device_fixed_step(periodic=True)
        if double == "df64":
            u = DF.from_float64(u0)
            h = DF.from_float64(np.zeros((0, N)))
            p = DF.from_float64(np.zeros((0, N)))
            xx = DF.from_float64(x)
            step = jax.jit(
                lambda t, u: fixed(t, u, h, p, xx, jnp.float32(dt))[0])
            for i in range(steps):
                u = step(jnp.float32(i * dt), u)
            return u.to_float64()[0]
        dtype = model.backend.dtype
        u = jnp.asarray(u0, dtype)
        h = jnp.zeros((0, N), dtype)
        p = jnp.zeros((0, N), dtype)
        xx = jnp.asarray(x, dtype)
        step = jax.jit(
            lambda t, u: fixed(t, u, h, p, xx, jnp.asarray(dt, dtype))[0])
        for i in range(steps):
            u = step(jnp.asarray(i * dt, dtype), u)
        return np.asarray(u[0], np.float64)

    ref = run(True)
    v = run("df64", df64_mixed_solve=1)
    assert np.max(np.abs(v - ref)) < 1e-10


@pytest.mark.slow
def test_df64_mixed_solve_folded_preconditioner(monkeypatch):
    """On TPU the mixed solve's f32 preconditioner routes through the
    folded fast path (r4: the node-layout generic solve was the dominant
    line of the df64 step — 12x 4.6 ms of a 71 ms step measured on the
    v5e).  Interpret mode exercises that exact routing on CPU: the folded
    preconditioner factors J32 from the ROUNDED state, and the df64
    residual refinement must still land in the full-df64 accuracy class."""
    import jax

    from triflow_tpu.ops.df64 import DF

    monkeypatch.setenv("TRIFLOW_PALLAS_INTERPRET", "1")
    N, steps, dt = 64, 2, 0.0625
    x = np.arange(N, dtype=np.float64) * 0.5
    rng = np.random.RandomState(0)
    u0 = (np.cos(2 * np.pi * np.arange(N) / N * 3)
          + 0.1 * rng.randn(N))[None]

    from triflow_tpu.ops import folded as fl

    def run(double, **kw):
        model = Model("-dxxU - dxxxxU - U * dxU", "U", double=double)
        if double == "df64":
            # the folded preconditioner must actually be selectable here
            assert fl.plan_for_backend(model.backend, N) is not None
        # ROS2 (2 stages, a third of the RODASPR trace): the routing
        # property is scheme-independent and the interpret-mode pallas
        # TRACING dominates this test every run (it is not XLA-cacheable)
        scheme = schemes.ROS2(model, **kw)
        fixed = scheme.device_fixed_step(periodic=True)
        if double == "df64":
            u = DF.from_float64(u0)
            h = DF.from_float64(np.zeros((0, N)))
            p = DF.from_float64(np.zeros((0, N)))
            xx = DF.from_float64(x)
            step = jax.jit(
                lambda t, u: fixed(t, u, h, p, xx, jnp.float32(dt))[0])
            for i in range(steps):
                u = step(jnp.float32(i * dt), u)
            return u.to_float64()[0]
        dtype = model.backend.dtype
        u = jnp.asarray(u0, dtype)
        h = jnp.zeros((0, N), dtype)
        p = jnp.zeros((0, N), dtype)
        xx = jnp.asarray(x, dtype)
        monkeypatch.setenv("TRIFLOW_NO_FOLDED", "1")   # f64 ref: XLA path
        try:
            step = jax.jit(
                lambda t, u: fixed(t, u, h, p, xx, jnp.asarray(dt, dtype))[0])
            for i in range(steps):
                u = step(jnp.asarray(i * dt, dtype), u)
        finally:
            monkeypatch.delenv("TRIFLOW_NO_FOLDED")
        return np.asarray(u[0], np.float64)

    ref = run(True)
    v = run("df64", df64_mixed_solve=1)
    assert np.max(np.abs(v - ref)) < 1e-10


def test_df64_dirichlet_hook():
    """Hooks on double-float state: the hook sees the hi component; entries
    it CHANGES get lo zeroed (exact Dirichlet scatter), unchanged entries
    keep their full pair (_DeviceProblem._apply_hook_df64)."""
    from triflow_tpu import Simulation

    model = Model("k * dxxU", "U", "k", double="df64")
    N = 64
    x = np.linspace(0, 1, N)
    U0 = np.cos(2 * np.pi * x * 3)

    def dirichlet(t, fields, pars):
        fields["U"] = fields["U"].at[0].set(1.0).at[-1].set(0.0)
        return fields, pars

    # hook-imposed Dirichlet values propagate inward at the SMALL-step
    # rate (at dt -> inf a backward-Euler step relaxes toward the
    # edge-folded operator's Neumann steady state and the hook only
    # resets two nodes, ~(1 - 2/N) contraction — measured), so the
    # adaptive ROW controller with a moderate tolerance is actually the
    # cheap way to the steady profile; k=4e-2 shortens the diffusion
    # time 4x vs r4 and tol=1e-6 keeps the internal-step count low
    # (boundary EXACTNESS is independent of tol — the hook enforces it
    # bit-exactly, pinned by the lo-drift unit test above)
    sim = Simulation(model, model.fields_template(x=x, U=U0),
                     dict(periodic=False, k=4e-2), hook=dirichlet,
                     scheme=schemes.ROS3PRL,
                     dt=6.0, tmax=60.0, tol=1e-6)
    for t, fields in sim:
        pass
    U = np.asarray(fields["U"])
    assert U.dtype == np.float64
    assert U[0] == pytest.approx(1.0, abs=1e-12)
    assert U[-1] == pytest.approx(0.0, abs=1e-12)
    # steady state ~ linear profile between the boundary values (the
    # remaining ~5e-4 deviation is the DISCRETE steady solution of the
    # edge-folded operator, not a transient or a precision artifact)
    assert np.abs(U - np.linspace(1.0, 0.0, N)).max() < 1e-3


def test_df64_hook_exact_enforcement_after_lo_drift():
    """Enforced boundary values are bit-exact even when the solver drifted
    ONLY the lo component (r4 left a ~ulp(hi)/2 ~ 6e-8 hole: change
    detection by hi inequality missed a re-imposed target whose hi was
    already there).  The perturbed-probe detection zeroes lo for every
    state-independent enforced entry; untouched entries keep their full
    (hi, lo) pair unchanged (core/schemes._apply_hook_df64)."""
    from triflow_tpu.core import schemes as schemes_mod
    from triflow_tpu.ops.df64 import DF

    model = Model("k * dxxU", "U", "k", double="df64")

    def dirichlet(t, fields, pars):
        fields["U"] = fields["U"].at[0].set(1.0).at[-1].set(0.25)
        return fields, pars

    problem = schemes_mod._DeviceProblem(model, dirichlet, False, df64=True)
    N = 32
    x = DF.from_float64(np.linspace(0, 1, N))
    u0 = np.cos(np.linspace(0, 3, N))[None]
    u0[0, 0], u0[0, -1] = 1.0, 0.25          # hi already AT the targets
    u = DF.from_float64(u0)
    # drift only lo at the boundaries (what a df64 solver update can do)
    u = DF.wrap(u.hi, u.lo.at[0, 0].add(3e-9).at[0, -1].add(-2e-9))
    h = DF.from_float64(np.zeros((0, N)))
    p = DF.from_float64(np.full((1, N), 0.01))
    u2, h2, p2, x2 = problem.apply_hook(0.0, u, h, p, x)
    # boundary pairs are exactly the enforced values: lo zeroed
    assert float(u2.lo[0, 0]) == 0.0 and float(u2.lo[0, -1]) == 0.0
    assert u2.to_float64()[0, 0] == 1.0
    assert u2.to_float64()[0, -1] == 0.25
    # interior pairs pass through bit-exactly (hi AND lo)
    assert np.array_equal(np.asarray(u2.hi)[0, 1:-1],
                          np.asarray(u.hi)[0, 1:-1])
    assert np.array_equal(np.asarray(u2.lo)[0, 1:-1],
                          np.asarray(u.lo)[0, 1:-1])
    # parameters keep their pairs (unchanged by the hook)
    assert np.array_equal(np.asarray(p2.lo), np.asarray(p.lo))


def test_df64_theta_step():
    """Theta's df64 branch: a backward-Euler df64 step matches the f64
    step to the df64 class."""
    import jax

    from triflow_tpu.ops.df64 import DF

    N, dt = 128, 0.25
    x = np.linspace(0, 10, N, endpoint=False)
    u0 = np.cos(2 * np.pi * x / 10)[None]

    m64 = Model("k * dxxU - U * dxU", "U", "k", double=True)
    s64 = schemes.Theta(m64, theta=1.0)
    f64s = s64.device_fixed_step(periodic=True)
    p64 = m64.backend.pack_pars(dict(k=0.5, periodic=True), jnp.asarray(x))
    ref, *_ = f64s(0.0, jnp.asarray(u0), jnp.zeros((0, N)), p64,
                   jnp.asarray(x), jnp.float64(dt))

    mdf = Model("k * dxxU - U * dxU", "U", "k", double="df64")
    u = DF.from_float64(u0)
    h = DF.from_float64(np.zeros((0, N)))
    p = DF.from_float64(np.broadcast_to(0.5, (1, N)).astype(np.float64))
    xx = DF.from_float64(x)
    for kw in ({}, dict(df64_mixed_solve=1)):
        # both the full-df64 solve (the default) and the mixed
        # f32-preconditioned refinement land in the df64 accuracy class
        sdf = schemes.Theta(mdf, theta=1.0, **kw)
        fdf = sdf.device_fixed_step(periodic=True)
        out, *_ = jax.jit(lambda u: fdf(jnp.float32(0.0), u, h, p, xx,
                                        jnp.float32(dt)))(u)
        d = np.max(np.abs(out.to_float64() - np.asarray(ref)))
        assert d < 1e-11, (kw, d)


@pytest.mark.slow
def test_df64_erk_dopri5():
    """The explicit RK family is df64-capable: stage coefficients c*dt are
    formed in double-float (a pre-rounded f32 product would quantize every
    stage) and DOPRI5 fixed steps match native f64 to the df64 class.
    dt is f32-representable so both paths integrate the same time grid."""
    import jax

    from triflow_tpu.ops.df64 import DF

    N, dt, steps = 128, 0.00390625, 60   # dt = 1/256: exact in f32
    # AND inside the explicit stability bound dx^2/(2k) ~ 0.006
    x = np.linspace(0, 10, N, endpoint=False)
    u0 = np.cos(2 * np.pi * x / 10)[None]

    def run(double):
        m = Model("k * dxxU - U * dxU", "U", "k", double=double)
        s = schemes.DOPRI5(m, time_stepping=False, tol=None)
        f = s.device_fixed_step(periodic=True)
        if double == "df64":
            u = DF.from_float64(u0)
            h = DF.from_float64(np.zeros((0, N)))
            p = DF.from_float64(
                np.broadcast_to(0.5, (1, N)).astype(np.float64))
            xx = DF.from_float64(x)
            step = jax.jit(lambda u: f(jnp.float32(0.0), u, h, p, xx,
                                       jnp.float32(dt))[0])
            for _ in range(steps):
                u = step(u)
            return u.to_float64()
        u = jnp.asarray(u0)
        h = jnp.zeros((0, N))
        p = m.backend.pack_pars(dict(k=0.5, periodic=True), jnp.asarray(x))
        step = jax.jit(lambda u: f(0.0, u, h, p, jnp.asarray(x),
                                   jnp.float64(dt))[0])
        for _ in range(steps):
            u = step(u)
        return np.asarray(u)

    ref = run(True)
    v = run("df64")
    assert np.max(np.abs(v - ref)) < 1e-11


def test_df64_erk_adaptive_simulation():
    """ADVICE r3 items 1+2: the adaptive ERK path must (a) disable Kahan
    compensation under df64 (the f32 track is DF-incompatible — the r3
    crash), and (b) carry the df64 compensated internal clock
    (precise_time), else the f32 clock accumulation quantizes the time
    grid at ~ulp(t)/2 per accepted step (~1e-7 phase error here, swamping
    the 1e-8 target).  Adaptive df64 DOPRI5 with compensated=True through
    the full Simulation driver, checked against the exact
    discrete-operator solution."""
    from triflow_tpu import Simulation

    model = Model("k * dxxU - c * dxU", "U", ["k", "c"], double="df64")
    N = 128
    x, dx = np.linspace(0, 10, N, endpoint=False, retstep=True)
    om = 2 * np.pi / 10
    U0 = np.cos(om * x)
    k, c = 0.01, 1.0
    T = 1.0
    sim = Simulation(model, model.fields_template(x=x, U=U0),
                     dict(periodic=True, k=k, c=c), dt=0.25, tmax=T,
                     scheme=schemes.DOPRI5, tol=1e-10, compensated=True)
    for t, fields in sim:
        pass
    lam = k * (2 * np.cos(om * dx) - 2) / dx ** 2
    mu = c * np.sin(om * dx) / dx
    exact = np.exp(lam * T) * np.cos(om * x - mu * T)
    assert np.abs(np.asarray(fields["U"]) - exact).max() < 1e-8
