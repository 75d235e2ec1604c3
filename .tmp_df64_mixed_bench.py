import time, os, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from triflow_tpu import Model, schemes
from triflow_tpu.ops.df64 import DF

N = 1_000_000
STEPS = 20
n_mixed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
x = np.arange(N, dtype=np.float64) * 0.5
rng = np.random.RandomState(0)
u0 = (np.cos(2*np.pi*np.arange(N)/N*10) + 0.1*rng.randn(N))[None]
DT = 0.0625

model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
scheme = schemes.RODASPR(model, time_stepping=False, tol=None,
                         df64_mixed_solve=n_mixed)
fixed = scheme.device_fixed_step(periodic=True)
u = DF.from_float64(u0); h = DF.from_float64(np.zeros((0,N)))
p = DF.from_float64(np.zeros((0,N))); xx = DF.from_float64(x)

def chain(carry, _):
    t, u = carry
    u2, *_ = fixed(t, u, h, p, xx, jnp.float32(DT))
    return (t + DT, u2), ()

@jax.jit
def run_chunk(t, u):
    return jax.lax.scan(chain, (t, u), length=STEPS)[0]

t0=time.time()
t, u = run_chunk(jnp.float32(0.0), u)
jax.block_until_ready(u.hi)
print("compile+first:", round(time.time()-t0,1), "s", flush=True)
best = 0
for _ in range(3):
    t0=time.time()
    t, u = run_chunk(t, u)
    jax.block_until_ready(u.hi)
    best = max(best, N*STEPS/(time.time()-t0))
print(f"df64 mixed n={n_mixed} N=1e6: {best:.3e} cells/s ({N/best*1e6:.0f} us/step)")
print("finite:", bool(jnp.isfinite(u.hi).all()))
