#!/usr/bin/env python
"""Measure the two-pass grid-blocked theta kernel (ops/megatheta) against
the kernel-granular folded path on the attached device, sweeping the
lane-tile width / chunk-depth plan (TRIFLOW_MEGATHETA_LB / _MC force a
point; default sweeps a small grid).  Emits one line per config:
config, us/step, cells/s.

Usage: python tools/profile_megatheta.py [N] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from triflow_tpu import Model, schemes
    from triflow_tpu.ops import folded as fl
    from triflow_tpu.ops import megatheta

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    DT = 0.05

    model = Model("-U * dxU + nu * dxxU", "U", "nu", double=False)
    be = model.backend
    dtype = be.dtype
    x = jnp.asarray(np.arange(N, dtype=np.float64) * 0.5, dtype)
    u0 = jnp.asarray(np.cos(2 * np.pi * np.arange(N) / N * 4)[None], dtype)
    helpers = jnp.zeros((0, N), dtype)
    pstack = be.pack_pars(dict(nu=0.5, periodic=True), x)
    dxv = jnp.asarray(0.5, dtype)

    def timed(plan, fixed_f, label):
        hf = fl.fold(helpers, plan)
        pf = fl.fold(pstack, plan)
        xf = fl.fold(x, plan)

        def chain(carry, _):
            t, uf = carry
            # DT as a python float = a compile-time constant, matching
            # bench_burgers' conditions exactly
            uf2, _e = fixed_f(t, uf, hf, pf, xf, dxv, DT)
            return (t + DT, uf2), ()

        @jax.jit
        def run(t, uf):
            return jax.lax.scan(chain, (t, uf), length=STEPS)[0]

        uf = fl.fold(u0, plan)
        t, uf = run(jnp.asarray(0.0, dtype), uf)   # compile/warm
        jax.block_until_ready(uf)
        best = np.inf
        for _ in range(3):
            s0 = time.perf_counter()
            t, uf = run(t, uf)
            jax.block_until_ready(uf)
            best = min(best, (time.perf_counter() - s0) / STEPS)
        ok = bool(jnp.isfinite(uf).all())
        print(f"{label}: {best*1e6:8.1f} us/step  {N/best/1e9:6.2f} G cells/s"
              f"  finite={ok}", flush=True)
        return best

    # kernel-granular reference
    os.environ["TRIFLOW_NO_MEGATHETA"] = "1"
    sch = schemes.Theta(model, theta=1.0)
    plan_ref, fixed_ref = sch.device_fixed_step_folded(N, periodic=True)
    del os.environ["TRIFLOW_NO_MEGATHETA"]
    timed(plan_ref, fixed_ref,
          f"grid-kernel path (C={plan_ref.C} Mc={plan_ref.Mc})")

    configs = [(0, 0)]                 # default pick
    for lb in (512, 256, 128):
        for mc in (0,):
            if (lb, mc) not in configs:
                configs.append((lb, mc))
    extra = os.environ.get("MEGATHETA_SWEEP")
    if extra:
        for part in extra.split(";"):
            lb, mc = part.split(",")
            configs.append((int(lb), int(mc)))

    for lb, mc in configs:
        if lb:
            os.environ["TRIFLOW_MEGATHETA_LB"] = str(lb)
        if mc:
            os.environ["TRIFLOW_MEGATHETA_MC"] = str(mc)
        try:
            picked = megatheta.plan_for(be, N)
            if picked is None:
                print(f"lb={lb} mc={mc}: no plan", flush=True)
                continue
            tplan, lbv = picked
            theta = 1.0

            def fixed_t(t, uf, hf, pf, xf, dx, dt, _p=tplan, _l=lbv):
                uf2 = megatheta.theta_step_tiled(
                    be, _p, theta, True, uf, hf, pf, xf, dx, dt, lb=_l)
                return uf2, jnp.zeros((), dtype)

            timed(tplan, fixed_t,
                  f"tiled lb={lbv} C={tplan.C} Mc={tplan.Mc} "
                  f"T={-(-tplan.C8 // lbv)}")
        except Exception as e:
            print(f"lb={lb} mc={mc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            os.environ.pop("TRIFLOW_MEGATHETA_LB", None)
            os.environ.pop("TRIFLOW_MEGATHETA_MC", None)


if __name__ == "__main__":
    main()
