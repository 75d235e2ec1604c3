#!/usr/bin/env python
"""Headline benchmark: Kuramoto-Sivashinsky implicit stepping throughput.

Runs the BASELINE.json metric — cell-updates/sec for RODASPR implicit steps
(banded J eval + BCR factorization + 6 stage solves each) on the KS equation
at N=1e6 — on whatever device JAX picks (the real TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1e9 (the >1e9 cell-updates/sec target from
BASELINE.json on a single chip).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = int(os.environ.get("BENCH_N", 1_000_000))
    # enough steps per device scan to amortize the per-call dispatch (the
    # production Simulation also scans many internal steps between outputs;
    # measured ~25ms fixed dispatch cost per call through the device tunnel,
    # so 100-step chunks understate sustained throughput by ~30%)
    STEPS_PER_CHUNK = int(os.environ.get("BENCH_STEPS", 500))
    REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
    DT = 0.05

    from triflow_tpu import Model, schemes

    # KS: stiff, 4th-order stencil, halo 2 (BASELINE config 3)
    model = Model("-dxxU - dxxxxU - U * dxU", "U", double=False)
    scheme = schemes.RODASPR(model, time_stepping=False, tol=None)
    fixed = scheme.device_fixed_step(periodic=True)

    dtype = model.backend.dtype
    # production-scale KS: fixed resolution dx = 0.5, domain grows with N
    # (resolving a small domain at dx ~ 1e-4 would make I - gamma*dt*J
    # condition ~1e15 -- not a meaningful workload at any precision)
    dx_grid = 0.5
    x = jnp.asarray(np.arange(N, dtype=np.float64) * dx_grid, dtype)
    rng = np.random.RandomState(0)
    u0 = jnp.asarray(
        (np.cos(2 * np.pi * np.arange(N) / N * 10)
         + 0.1 * rng.randn(N)).astype(np.float32)[None],
        dtype,
    )
    helpers = jnp.zeros((0, N), dtype)
    pstack = jnp.zeros((0, N), dtype)

    # folded-native stepping when available: the scan carries the state in
    # the chunk-native layout, paying the fold/unfold transpose once per
    # chunk instead of per step (ops/folded.py)
    folded_api = scheme.device_fixed_step_folded(N, periodic=True)
    if folded_api is not None:
        from triflow_tpu.ops import folded as fl

        plan, fixed_f = folded_api
        hf = fl.fold(helpers, plan)
        pf = fl.fold(pstack, plan)
        xf = fl.fold(x, plan)
        dx_val = jnp.asarray((x[-1] - x[0]) / (N - 1), dtype)

        def chain(carry, _):
            t, uf = carry
            uf2, _err = fixed_f(t, uf, hf, pf, xf, dx_val, DT)
            return (t + DT, uf2), ()

        @jax.jit
        def run_chunk(t, u):
            uf = fl.fold(u, plan)
            (t2, uf2), _ = jax.lax.scan(chain, (t, uf),
                                        length=STEPS_PER_CHUNK)
            return t2, fl.unfold(uf2, plan)
    else:
        def chain(carry, _):
            t, u = carry
            u2, _h, _p, _x, _err = fixed(t, u, helpers, pstack, x, DT)
            return (t + DT, u2), ()

        @jax.jit
        def run_chunk(t, u):
            (t2, u2), _ = jax.lax.scan(chain, (t, u),
                                       length=STEPS_PER_CHUNK)
            return t2, u2

    # warmup (compile)
    t = jnp.asarray(0.0, dtype)
    t, u = run_chunk(t, u0)
    jax.block_until_ready(u)

    best = 0.0
    for _ in range(REPEATS):
        start = time.perf_counter()
        t, u = run_chunk(t, u)
        jax.block_until_ready(u)
        elapsed = time.perf_counter() - start
        best = max(best, N * STEPS_PER_CHUNK / elapsed)

    if not bool(jnp.isfinite(u).all()):
        print(json.dumps({"metric": "ks-implicit-cell-updates",
                          "value": 0.0, "unit": "cells/s",
                          "vs_baseline": 0.0, "error": "non-finite state"}))
        return 1

    result = {
        "metric": "ks-implicit-cell-updates",
        "value": round(best, 1),
        "unit": "cells/s",
        "vs_baseline": round(best / 1e9, 4),
        "N": N,
        "steps_timed": STEPS_PER_CHUNK,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
