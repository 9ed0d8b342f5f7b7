"""Liu-West filter tests: both variants, covariates, forecasting.

Mirrors the reference smoke tests (``test/test_liu_west.cpp``) and goes
beyond: parameter-concentration check on a linear-Gaussian model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.filters import LiuWestFilter
from ssme_tpu.models import lgssm, svol_leverage


def _leverage_data(T=12, key=16):
    ys = 0.05 * jax.random.normal(jax.random.key(key), (T, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    return ys, zs


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_leverage_filter_runs_and_42_invariant(variant):
    # analog of test_liu_west.cpp:163-204 / :365-406 with the same model,
    # delta=.99, prior box (.8,.99)x(-.1,.1)x(.01,.1)x(-.5,-.01)
    model = svol_leverage.make_model()
    lw = LiuWestFilter(model, num_particles=32, delta=0.99, variant=variant,
                       functionals=(lambda x, z, p: jnp.full((1,), 42.0),))
    ys, zs = _leverage_data()
    res = jax.jit(lw.run)(jax.random.key(0), ys, zs)
    assert np.isfinite(float(res.log_likelihood))
    assert float(res.log_cond_likes[0]) ** 2 > 0.0
    np.testing.assert_allclose(np.asarray(res.expectations[0]), 42.0,
                               rtol=1e-4)


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_param_particles_stay_in_support(variant):
    model = svol_leverage.make_model()
    lw = LiuWestFilter(model, num_particles=64, delta=0.95, variant=variant)
    ys, zs = _leverage_data(T=25, key=17)
    res = lw.run(jax.random.key(1), ys, zs)
    params = np.asarray(lw.param_samples(res))  # (N, 4) constrained
    phi, mu, sigma, rho = params.T
    assert np.all((phi > 0) & (phi < 1))       # logit keeps (0,1)
    assert np.all(sigma > 0)                   # log keeps (0,inf)
    assert np.all((rho > -1) & (rho < 1))      # twice_fisher keeps (-1,1)
    assert np.all(np.isfinite(mu))


def test_sisr_concentrates_on_lgssm_params():
    # statistical check: with informative data the parameter cloud should
    # tighten around truth (shrinkage-kernel behavior)
    model = lgssm.make_model()
    true_params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(2), true_params, 300)
    lw = LiuWestFilter(model, num_particles=2048, delta=0.99, variant="sisr")
    res = jax.jit(lw.run)(jax.random.key(3), ys)
    params = np.asarray(lw.param_samples(res))
    a_mean = params[:, 0].mean()
    assert abs(a_mean - 0.8) < 0.25, a_mean
    assert np.isfinite(float(res.log_likelihood))


def test_future_obs_simulation():
    model = svol_leverage.make_model()
    lw = LiuWestFilter(model, num_particles=32, delta=0.99)
    ys, zs = _leverage_data()
    res = lw.run(jax.random.key(4), ys, zs)
    obs = lw.sim_future_obs(jax.random.key(5), res.last_particles,
                            res.last_trans_params, num_steps=10,
                            last_obs=ys[-1])
    assert obs.shape == (10, 32, 1)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_ess_reported():
    model = svol_leverage.make_model()
    lw = LiuWestFilter(model, num_particles=32)
    ys, zs = _leverage_data()
    res = lw.run(jax.random.key(6), ys, zs)
    e = np.asarray(res.ess)
    assert e.shape == (ys.shape[0],)
    assert np.all((e >= 1.0 - 1e-3) & (e <= 32.0 + 1e-3))
