"""Multivariate factor-SVOL model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from ssme_tpu.filters import BootstrapFilter, LiuWestFilter
from ssme_tpu.models import factor_svol

N_ASSETS, K_FACTORS = 4, 2


@pytest.fixture(scope="module")
def model():
    return factor_svol.make_model(N_ASSETS, K_FACTORS)


@pytest.fixture(scope="module")
def true_params(model):
    return model.sample_prior(jax.random.key(0))


@pytest.fixture(scope="module")
def data(model, true_params):
    _, ys = factor_svol.simulate(jax.random.key(1), true_params, 40,
                                 N_ASSETS, K_FACTORS)
    return ys


def test_log_g_matches_dense_mvn(model, true_params):
    # Woodbury form vs a dense covariance evaluation
    x = 0.3 * np.ones(K_FACTORS)
    y = np.linspace(-1, 1, N_ASSETS)
    got = float(model.log_g(true_params, jnp.asarray(y), jnp.asarray(x), None))
    p = np.asarray(true_params)
    k, n = K_FACTORS, N_ASSETS
    loadings = p[3 * k:3 * k + n * k].reshape(n, k)
    d = p[3 * k + n * k:]
    cov = loadings @ np.diag(np.exp(x)) @ loadings.T + np.diag(d)
    want = stats.multivariate_normal.logpdf(y, np.zeros(n), cov)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_transform_round_trip(model, true_params):
    z = model.transform.unconstrain(true_params)
    back = model.transform.constrain(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(true_params),
                               rtol=2e-3, atol=1e-4)


def test_bootstrap_filter_runs(model, true_params, data):
    bf = BootstrapFilter(model, num_particles=256,
                         functionals=(lambda x, p: x,))
    res = jax.jit(bf.run)(jax.random.key(2), true_params, data)
    assert np.all(np.isfinite(np.asarray(res.log_cond_likes)))
    assert res.expectations[0].shape == (40, K_FACTORS)
    assert res.last_particles.shape == (256, K_FACTORS)


def test_ess_adaptive_resampling(model, true_params, data):
    bf = BootstrapFilter(model, num_particles=128, ess_threshold=0.5)
    res = jax.jit(bf.run)(jax.random.key(3), true_params, data)
    assert np.all(np.isfinite(np.asarray(res.log_cond_likes)))
    # adaptive schedule must not destroy the estimate: compare to
    # always-resample within loose MC error
    bf2 = BootstrapFilter(model, num_particles=128)
    res2 = bf2.run(jax.random.key(3), true_params, data)
    assert abs(float(res.log_likelihood) - float(res2.log_likelihood)) < 15.0


def test_liu_west_on_factor_model(model, data):
    lw = LiuWestFilter(model, num_particles=128, delta=0.99, variant="apf")
    res = jax.jit(lw.run)(jax.random.key(4), data)
    assert np.isfinite(float(res.log_likelihood))
    params = lw.param_samples(res)
    k = K_FACTORS
    phi = np.asarray(params[:, :k])
    assert np.all((phi > -1) & (phi < 1))
