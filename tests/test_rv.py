"""Tests for ssme_tpu.rv against scipy and analytic identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from ssme_tpu import rv


def test_norm_logpdf_matches_scipy():
    x = np.linspace(-3, 3, 7)
    got = rv.norm_logpdf(x, 0.5, 2.0)
    np.testing.assert_allclose(np.asarray(got),
                               stats.norm.logpdf(x, 0.5, 2.0), rtol=1e-5)


def test_norm_logpdf_bad_sigma_is_neg_inf():
    assert float(rv.norm_logpdf(0.0, 0.0, -1.0)) == -np.inf


def test_uniform_logpdf():
    assert np.isclose(float(rv.uniform_logpdf(0.3, 0.0, 2.0)), -np.log(2.0))
    assert float(rv.uniform_logpdf(2.5, 0.0, 2.0)) == -np.inf


def test_invgamma_logpdf_matches_scipy():
    x = np.array([0.1, 0.5, 1.0, 3.0])
    got = rv.invgamma_logpdf(x, 2.0, 1.5)
    want = stats.invgamma.logpdf(x, a=2.0, scale=1.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3)  # f32 gammaln
    assert float(rv.invgamma_logpdf(-1.0, 2.0, 1.5)) == -np.inf


def test_beta_logpdf_matches_scipy():
    x = np.array([0.1, 0.4, 0.9])
    np.testing.assert_allclose(np.asarray(rv.beta_logpdf(x, 2.0, 3.0)),
                               stats.beta.logpdf(x, 2.0, 3.0), rtol=1e-3, atol=1e-4)


def test_twice_fisher_matches_reference_formula():
    p = 0.5
    assert np.isclose(float(rv.twice_fisher(p)), np.log(1.5 / 0.5), rtol=1e-4)


def test_mvn_logpdf_matches_scipy():
    mean = np.array([1.0, -2.0, 0.5])
    a = np.array([[2.0, 0.3, 0.1], [0.3, 1.0, 0.2], [0.1, 0.2, 0.5]])
    x = np.array([0.7, -1.5, 0.0])
    got = rv.mvn_logpdf(jnp.asarray(x), jnp.asarray(mean), cov=jnp.asarray(a))
    want = stats.multivariate_normal.logpdf(x, mean, a)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_mvn_sample_moments():
    mean = jnp.array([1.0, -1.0])
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    keys = jax.random.split(jax.random.key(3), 20000)
    samps = jax.vmap(lambda k: rv.mvn_sample(k, mean, cov=cov))(keys)
    emp_mean = np.asarray(jnp.mean(samps, axis=0))
    emp_cov = np.cov(np.asarray(samps).T)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.1)


def test_categorical_from_log_weights_distribution():
    logw = jnp.log(jnp.array([0.1, 0.2, 0.7]))
    idx = rv.categorical_from_log_weights(jax.random.key(0), logw,
                                          shape=(20000,))
    freqs = np.bincount(np.asarray(idx), minlength=3) / 20000
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.7], atol=0.02)


def test_categorical_shift_invariance():
    # log-weight shift must not change the distribution (underflow safety)
    logw = jnp.array([-1000.0, -1000.5, -999.0])
    idx = rv.categorical_from_log_weights(jax.random.key(1), logw,
                                          shape=(5000,))
    assert set(np.unique(np.asarray(idx))) <= {0, 1, 2}
    freqs = np.bincount(np.asarray(idx), minlength=3) / 5000
    want = np.exp(np.asarray(logw) - (-999.0))
    want /= want.sum()
    np.testing.assert_allclose(freqs, want, atol=0.03)
