"""Univariate stochastic-volatility model (the reference's example model).

Reference: ``example/univ_svol_bootstrap_filter.h:17-106``.

    x_t = phi * x_{t-1} + sigma * eps_t,          eps ~ N(0,1)
    y_t ~ N(0, (beta * exp(x_t / 2))^2)
    x_1 ~ N(0, sigma^2 / (1 - phi^2))             (stationary init)

Parameters (constrained space), in the reference's order
(``univ_svol_bootstrap_filter.h:54-61``): theta = (beta, phi, ss) with
sigma = sqrt(ss); transforms {null, twice_fisher, log}
(``example/estimate_univ_svol.h:155``).

Priors (``example/estimate_univ_svol.h:94-101``):
    beta ~ N(1, 1),  phi ~ U(0, 1),  ss ~ InvGamma(.001, .001)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssme_tpu import rv
from ssme_tpu.models.base import StateSpaceModel, bcol
from ssme_tpu.transforms import ParamTransform

TRANSFORMS = ("null", "twice_fisher", "log")

# chain start used by the reference driver (estimate_univ_svol.h:152-153):
# transformed theta0 = (1.0, twiceFisher(.5), log(2e-4))
START_TRANS_THETA = (1.0, 1.0986122886681098, -8.517193191416238)


def _unpack(params):
    beta = params[0]
    phi = params[1]
    sigma = jnp.sqrt(params[2])
    return beta, phi, sigma


def _stationary_sd(params):
    _, phi, sigma = _unpack(params)
    return sigma / jnp.sqrt(1.0 - phi * phi)


def log_mu(params, x1):
    # univ_svol_bootstrap_filter.h:90-96
    return rv.norm_logpdf(x1[0], 0.0, _stationary_sd(params))


def sample_q1(key, params, y1):
    # univ_svol_bootstrap_filter.h:65-70 (bootstrap: q1 = mu)
    return jax.random.normal(key, (1,)) * _stationary_sd(params)


def log_q1(params, x1, y1):
    # univ_svol_bootstrap_filter.h:100-103
    return rv.norm_logpdf(x1[0], 0.0, _stationary_sd(params))


def sample_f(key, params, x_prev, z):
    # univ_svol_bootstrap_filter.h:74-79
    _, phi, sigma = _unpack(params)
    return phi * x_prev + jax.random.normal(key, (1,)) * sigma


def log_f(params, x, x_prev, z):
    _, phi, sigma = _unpack(params)
    return rv.norm_logpdf(x[0], phi * x_prev[0], sigma)


def log_g(params, y, x, z):
    # univ_svol_bootstrap_filter.h:83-86
    beta, _, _ = _unpack(params)
    return rv.norm_logpdf(y[0], 0.0, beta * jnp.exp(0.5 * x[0]))


def sample_g(key, params, x):
    beta, _, _ = _unpack(params)
    return jax.random.normal(key, (1,)) * beta * jnp.exp(0.5 * x[0])


def prop_mu(params, x_prev, z):
    # conditional expectation of f — the recommended APF lookahead
    _, phi, _ = _unpack(params)
    return phi * x_prev


def log_prior(params):
    # estimate_univ_svol.h:94-101
    beta, phi, ss = params[0], params[1], params[2]
    return (rv.norm_logpdf(beta, 1.0, 1.0)
            + rv.uniform_logpdf(phi, 0.0, 1.0)
            + rv.invgamma_logpdf(ss, 1e-3, 1e-3))


def sample_prior(key):
    # a proper draw from the prior (the reference never samples this prior;
    # provided for LW filters / swarm use)
    kb, kp, ks = jax.random.split(key, 3)
    beta = 1.0 + jax.random.normal(kb, ())
    phi = jax.random.uniform(kp, ())
    # InvGamma(a,b) = b / Gamma(a); use inverse of gamma draw
    ss = 1e-3 / jax.random.gamma(ks, 1e-3)
    return jnp.stack([beta, phi, ss])


# --- batched fast-path samplers (one PRNG call per particle cloud) ------
# ``params`` may be (3,) or carry a leading particle axis (n, 3).

def sample_q1_batch(key, params, y1, n):
    sd = bcol(jnp.sqrt(params[..., 2]) /
               jnp.sqrt(1.0 - params[..., 1] * params[..., 1]))
    return jax.random.normal(key, (n, 1)) * sd


def sample_f_batch(key, params, xs, z):
    phi = bcol(params[..., 1])
    sigma = bcol(jnp.sqrt(params[..., 2]))
    return phi * xs + jax.random.normal(key, xs.shape) * sigma


def sample_g_batch(key, params, xs):
    beta = bcol(params[..., 0])
    return jax.random.normal(key, xs.shape[:-1] + (1,)) * beta * jnp.exp(0.5 * xs)


def make_model() -> StateSpaceModel:
    return StateSpaceModel(
        dim_state=1,
        dim_obs=1,
        dim_cov=0,
        transform=ParamTransform(TRANSFORMS),
        log_mu=log_mu,
        sample_q1=sample_q1,
        log_q1=log_q1,
        sample_f=sample_f,
        log_f=log_f,
        log_g=log_g,
        sample_g=sample_g,
        prop_mu=prop_mu,
        log_prior=log_prior,
        sample_prior=sample_prior,
        sample_q1_batch=sample_q1_batch,
        sample_f_batch=sample_f_batch,
        sample_g_batch=sample_g_batch,
        name="univ_svol",
    )


__all__ = ["make_model", "TRANSFORMS", "START_TRANS_THETA"]
