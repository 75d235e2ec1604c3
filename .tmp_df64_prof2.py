import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from triflow_tpu import Model
from triflow_tpu.ops.df64 import DF, from_scalar
from triflow_tpu.ops import banded_df as bdf

N = 1_000_000
REP = 10
x = np.arange(N, dtype=np.float64) * 0.5
rng = np.random.RandomState(0)
u0 = (np.cos(2*np.pi*np.arange(N)/N*10) + 0.1*rng.randn(N))[None]
model = Model("-dxxU - dxxxxU - U * dxU", "U", double="df64")
b = model.backend
u = DF.from_float64(u0); h = DF.from_float64(np.zeros((0,N)))
p = DF.from_float64(np.zeros((0,N))); xx = DF.from_float64(x)
gdt = DF.wrap(*from_scalar(0.25)) * DF(jnp.float32(0.0625))

def rep(fn):
    # scan REP dependent iterations so dispatch is amortized
    def body(c, _):
        out = fn(c)
        return out, ()
    return jax.jit(lambda u0_: jax.lax.scan(body, u0_, length=REP)[0])

F_rep = rep(lambda u_: df_scale(b.F_df64(u_, h, p, xx, periodic=True)))
def df_scale(F):  # keep shapes: F same shape as u
    return F
J = jax.jit(lambda u_: b.J_bands_df64(u_, h, p, xx, periodic=True))(u)
jax.block_until_ready(J.hi)
fact = jax.jit(lambda J_: bdf.factor_banded_df(bdf.axpy_bands_df(1.0, -gdt, J_), True))(J)
jax.block_until_ready(jax.tree_util.tree_leaves(fact)[0])

def tm(name, fn, arg):
    out = fn(arg); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0=time.time(); out = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    el = (time.time()-t0)/REP*1e3
    print(f"{name}: {el:.2f} ms/iter", flush=True)

tm("F eval x10", F_rep, u)
solve_rep = rep(lambda r: fact.solve(r))
tm("solve  x10", solve_rep, gdt * jax.jit(lambda u_: b.F_df64(u_, h, p, xx, periodic=True))(u))
J_rep = rep(lambda u_: DF.wrap(*jax.tree_util.tree_leaves(b.J_bands_df64(u_, h, p, xx, periodic=True))[:1]*2) if False else u_)
# J+factor chained: factor returns a pytree, not same shape; time with while-style chain using solve to feed back
def jfac_chain(u_):
    J_ = b.J_bands_df64(u_, h, p, xx, periodic=True)
    f_ = bdf.factor_banded_df(bdf.axpy_bands_df(1.0, -gdt, J_), True)
    return f_.solve(u_)
tm("J+factor+1solve x10", rep(jfac_chain), u)
comb_rep = rep(lambda u_: u_ + 28.64361161 * u_)
tm("combine x10", comb_rep, u)
