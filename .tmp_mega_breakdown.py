import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from triflow_tpu import Model, schemes
from triflow_tpu.ops import folded as fl

def mega_rate(model, scheme, N, steps):
    scan_api = scheme.device_fixed_scan_folded(N, periodic=True)
    if scan_api is None:
        return None
    plan, scan_f = scan_api
    dtype = model.backend.dtype
    x = jnp.asarray(np.arange(N) * 0.5, dtype)
    rng = np.random.RandomState(0)
    u0 = jnp.asarray((np.cos(2*np.pi*np.arange(N)/N*10) + 0.1*rng.randn(N))[None], dtype)
    hf = fl.fold(jnp.zeros((0, N), dtype), plan)
    pf = fl.fold(model.backend.pack_pars({k: 0.5 for k in model.backend.system.pars} | {"periodic": True}, x) if model.backend.system.pars else jnp.zeros((0, N), dtype), plan)
    xf = fl.fold(x, plan)
    dx = jnp.asarray(0.5, dtype)
    @jax.jit
    def run(u):
        uf = fl.fold(u, plan)
        uf2 = scan_f(0.0, uf, hf, pf, xf, dx, 0.05, steps)
        return fl.unfold(uf2, plan)
    u = run(u0); jax.block_until_ready(u)
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); u = run(u)
        jax.block_until_ready(u)
        best = min(best, (time.perf_counter()-t0)/steps*1e6)
    print(f"  plan: Mc={plan.Mc} C={plan.C} nlev={len(__import__('triflow_tpu.ops.pallas_pcr', fromlist=['_levels'])._levels(plan.Cmm))}")
    return best

ks = Model("-dxxU - dxxxxU - U * dxU", "U", double=False)
for N, steps in ((10_000, 20_000), (100_000, 4_000)):
    r6 = mega_rate(ks, schemes.RODASPR(ks, time_stepping=False, tol=None), N, steps)
    print(f"RODASPR (s=6) N={N}: {r6:.2f} us/step", flush=True)
    r1 = mega_rate(ks, schemes.Theta(ks, theta=1.0), N, steps)
    print(f"Theta   (s=1) N={N}: {r1:.2f} us/step", flush=True)
    if r1 and r6:
        print(f"  -> per-extra-stage slope: {(r6-r1)/5:.2f} us; s=1 intercept {r1:.2f} us", flush=True)
