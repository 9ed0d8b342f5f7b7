"""Student-t observation SVOL: heavy-tail family, converging to the
Gaussian svol as nu -> inf."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.filters import BootstrapFilter, log_likelihood_fn
from ssme_tpu.models import svol, svol_t

PARAMS = jnp.array([1.0, 0.9, 0.04, 5.0])


def test_log_g_matches_scipy():
    import scipy.stats as st
    for y, x in [(0.5, 0.0), (-2.0, 1.0), (0.1, -1.5)]:
        ours = float(svol_t.log_g(PARAMS, jnp.array([y]),
                                  jnp.array([x]), None))
        scale = 1.0 * np.exp(0.5 * x)
        ref = st.t.logpdf(y, 5.0, scale=scale)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_nu_inf_converges_to_gaussian_svol():
    """At nu = 1e6 the t-SVOL likelihood equals the Gaussian SVOL's."""
    _, ys = svol_t.simulate(jax.random.key(0), PARAMS, 60)
    p_t = jnp.array([1.0, 0.9, 0.04, 1e6])
    p_g = jnp.array([1.0, 0.9, 0.04])
    ll_t = log_likelihood_fn(svol_t.make_model(), num_particles=512)
    ll_g = log_likelihood_fn(svol.make_model(), num_particles=512)
    vt = jax.vmap(lambda k: ll_t(k, p_t, ys))(
        jax.random.split(jax.random.key(1), 16))
    vg = jax.vmap(lambda k: ll_g(k, p_g, ys))(
        jax.random.split(jax.random.key(2), 16))
    se = (float(vt.std()) + float(vg.std())) / np.sqrt(16) * 4 + 0.3
    assert abs(float(vt.mean()) - float(vg.mean())) < se


def test_heavy_tails_fit_outliers_better():
    """On data with genuine t5 tails, the t model (true nu) must beat a
    forced near-Gaussian nu on average."""
    _, ys = svol_t.simulate(jax.random.key(3), PARAMS, 150)
    ll = log_likelihood_fn(svol_t.make_model(), num_particles=512)
    keys = jax.random.split(jax.random.key(4), 16)
    v5 = jax.vmap(lambda k: ll(k, PARAMS, ys))(keys)
    vg = jax.vmap(lambda k: ll(k, PARAMS.at[3].set(1e4), ys))(keys)
    assert float(v5.mean()) > float(vg.mean())


def test_prior_sample_matches_log_prior_support():
    draws = jax.vmap(svol_t.sample_prior)(
        jax.random.split(jax.random.key(5), 64))
    lps = jax.vmap(svol_t.log_prior)(draws)
    assert np.all(np.isfinite(np.asarray(lps)))


def test_bootstrap_runs():
    _, ys = svol_t.simulate(jax.random.key(6), PARAMS, 30)
    bf = BootstrapFilter(svol_t.make_model(), num_particles=128)
    res = bf.run(jax.random.key(7), PARAMS, ys)
    assert np.isfinite(float(res.log_likelihood))
