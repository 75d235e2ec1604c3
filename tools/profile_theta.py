"""Burgers theta-step decomposition on the attached device (VERDICT r4
item: fuse burgers-theta toward its bandwidth bound, or measure why the
remaining traffic is irreducible).

Times each folded kernel of the linearized theta step at N=1e6 and prints
one JSON line per component with its modeled HBM traffic and implied GB/s,
so the step's pct_roofline can be attributed per piece.  Completion is
proven by a value fetch (block_until_ready returns early through the axon
tunnel) and the fixed per-call cost cancels via two scan lengths.

Run from the repo root: python tools/profile_theta.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from triflow_tpu import Model, schemes
    from triflow_tpu.ops import folded as fl

    N = int(os.environ.get("PROF_N", 1_000_000))
    IT1 = int(os.environ.get("PROF_IT1", 20))
    IT2 = int(os.environ.get("PROF_IT2", 80))
    dt = 0.05

    model = Model("-U * dxU + nu * dxxU", "U", "nu", double=False)
    be = model.backend
    scheme = schemes.Theta(model, theta=1.0)
    dtype = be.dtype
    x = jnp.asarray(np.arange(N, dtype=np.float64) * 0.5, dtype)
    u0 = jnp.asarray(np.cos(2 * np.pi * np.arange(N) / N * 4,
                            dtype=np.float64)[None], dtype)
    helpers = jnp.zeros((0, N), dtype)
    pstack = be.pack_pars(dict(nu=0.5, periodic=True), x)
    plan = fl.plan_for_backend(be, N)
    assert plan is not None, "folded plan required on this device"
    uf = fl.fold(u0, plan)
    hf = fl.fold(helpers, plan)
    pf = fl.fold(pstack, plan)
    xf = fl.fold(x, plan)
    dxv = jnp.asarray((x[-1] - x[0]) / (N - 1), dtype)

    def timed(name, make_run, bytes_per_iter):
        r1, r2 = make_run(IT1), make_run(IT2)
        o = r1(uf)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        o = r2(uf)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            o = r1(uf)
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            o = r2(uf)
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
            t2 = time.perf_counter() - t0
            if t2 > t1:
                best = min(best, (t2 - t1) / (IT2 - IT1))
        gbs = bytes_per_iter / best / 1e9
        print(json.dumps({"component": name, "ms": round(best * 1e3, 3),
                          "modeled_bytes": int(bytes_per_iter),
                          "implied_gbs": round(gbs, 1)}), flush=True)
        return best

    item = 4

    # 1. fused J+factor sweep (factor_folded_direct): reads u + p windows,
    # writes fac/Dhinv/DU/Wsp/Vsp (5 x s^2 x M floats at s=1)
    def make_factor(iters):
        @jax.jit
        def run(uf):
            def body(c, _):
                f = fl.factor_folded_direct(1.0, -dt, be, c, hf, pf, xf,
                                            dxv, True, plan)
                return c + 1e-30 * f.Dhinv[0], ()
            return jax.lax.scan(body, uf, length=iters)[0]
        return run

    t_fac = timed("factor_folded_direct", make_factor,
                  item * (2 * N + 5 * N))

    # 2. stencil F eval (scale=dt): reads u + p windows, writes rhs
    def make_F(iters):
        @jax.jit
        def run(uf):
            def body(c, _):
                r = fl.eval_F_folded(be, c, hf, pf, xf, dxv, True, plan,
                                     scale=dt)
                return c + 1e-30 * r, ()
            return jax.lax.scan(body, uf, length=iters)[0]
        return run

    t_F = timed("eval_F_folded", make_F, item * (2 * N + N))

    # 3. solve (flat Thomas sweeps + interface + spike correction, with the
    # state add fused): reads fac/Dhinv/DU (3N) + rhs (N) + spikes (2N) +
    # u (N), writes bt (N) + y (N) + out (N)
    fact = jax.jit(lambda uf: fl.factor_folded_direct(
        1.0, -dt, be, uf, hf, pf, xf, dxv, True, plan))(uf)
    np.asarray(fact.Dhinv.ravel()[:1])

    def make_solve(iters):
        @jax.jit
        def run(rf):
            def body(c, _):
                return fact.solve(c, add_to=uf), ()
            return jax.lax.scan(body, rf, length=iters)[0]
        return run

    t_solve = timed("solve+add", make_solve, item * 10 * N)

    # 4. the whole fixed theta step (folded-native)
    api = scheme.device_fixed_step_folded(N, periodic=True)
    assert api is not None
    _plan2, fixed_f = api

    def make_step(iters):
        @jax.jit
        def run(uf):
            def body(c, _):
                c2, _err = fixed_f(0.0, c, hf, pf, xf, dxv, dt)
                return c2, ()
            return jax.lax.scan(body, uf, length=iters)[0]
        return run

    t_step = timed("theta_step", make_step, item * 15 * N)

    print(json.dumps({
        "component": "decomposition",
        "step_ms": round(t_step * 1e3, 3),
        "sum_of_parts_ms": round((t_fac + t_F + t_solve) * 1e3, 3),
        "parts_ms": {"factor": round(t_fac * 1e3, 3),
                     "F": round(t_F * 1e3, 3),
                     "solve+add": round(t_solve * 1e3, 3)},
    }), flush=True)


if __name__ == "__main__":
    main()
