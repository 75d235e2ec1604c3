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


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("model_name", ["ks", "wave"])
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
