import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from triflow_tpu import Model
from triflow_tpu.ops.df64 import DF, from_scalar
from triflow_tpu.ops import banded_df as bdf

N = 1_000_000
x = np.arange(N, dtype=np.float64) * 0.5
rng = np.random.RandomState(0)
u0 = (np.cos(2*np.pi*np.arange(N)/N*10) + 0.1*rng.randn(N))[None]
model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
b = model.backend
u = DF.from_float64(u0); h = DF.from_float64(np.zeros((0,N)))
p = DF.from_float64(np.zeros((0,N))); xx = DF.from_float64(x)
gdt = DF.wrap(*from_scalar(0.25)) * DF(jnp.float32(0.0625))

F_fn = jax.jit(lambda u: b.F_df64(u, h, p, xx, periodic=True))
J_fn = jax.jit(lambda u: b.J_bands_df64(u, h, p, xx, periodic=True))
factor_fn = jax.jit(lambda J: bdf.factor_banded_df(bdf.axpy_bands_df(1.0, -gdt, J), True))
def tm(name, fn, *args, reps=3):
    out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(reps):
        t0=time.time(); out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time()-t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return out

F = tm("F eval", F_fn, u)
J = tm("J eval", J_fn, u)
fact = tm("factor", factor_fn, J)
solve_fn = jax.jit(lambda fact, r: fact.solve(r))
k = tm("solve", solve_fn, fact, gdt * F)
comb = jax.jit(lambda u, k: u + 28.64361161 * k)
tm("combine", comb, u, k)
