"""Poisson count state-space model with AR(1) log-intensity.

Not in the reference (which is Gaussian-observation-only in all of
``example/`` and ``test/``); included to cover non-Gaussian observation
families — the model-hook interface (SURVEY §2.3) is density-agnostic,
and this model exercises that with a discrete likelihood:

    x_t = mu + phi (x_{t-1} - mu) + sigma eps_t     (log-intensity)
    y_t ~ Poisson(e^{x_t})
    x_1 ~ N(mu, sigma^2 / (1 - phi^2))

Parameters (constrained) ordered (phi, mu, sigma) with transforms
{twice_fisher, null, log}.  Default priors (sampled AND scored):
phi ~ U(-0.99, 0.99), mu ~ N(0, 2), sigma ~ HalfNormal(0.5).

Works with every algorithm in the package: bootstrap/auxiliary PF,
PMMH, Liu-West (both variants; q = f), and the swarm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssme_tpu import rv
from ssme_tpu.models.base import StateSpaceModel, bcol
from ssme_tpu.transforms import ParamTransform

TRANSFORMS = ("twice_fisher", "null", "log")


def _unpack(params):
    return params[0], params[1], params[2]  # phi, mu, sigma


def _stationary_sd(params):
    phi, _, sigma = _unpack(params)
    return sigma / jnp.sqrt(1.0 - phi * phi)


def _trans_mean(params, x_prev):
    phi, mu, _ = _unpack(params)
    return mu + phi * (x_prev[0] - mu)


def log_mu(params, x1):
    _, mu, _ = _unpack(params)
    return rv.norm_logpdf(x1[0], mu, _stationary_sd(params))


def sample_q1(key, params, y1):
    _, mu, _ = _unpack(params)
    return (mu + jax.random.normal(key, ()) * _stationary_sd(params))[None]


def log_q1(params, x1, y1):
    return log_mu(params, x1)


def sample_f(key, params, x_prev, z):
    _, _, sigma = _unpack(params)
    return (_trans_mean(params, x_prev)
            + jax.random.normal(key, ()) * sigma)[None]


def log_f(params, x, x_prev, z):
    _, _, sigma = _unpack(params)
    return rv.norm_logpdf(x[0], _trans_mean(params, x_prev), sigma)


def sample_q(key, params, x_prev, y, z):
    return sample_f(key, params, x_prev, z)      # LW2 proposal = transition


def log_q(params, x, x_prev, y, z):
    return log_f(params, x, x_prev, z)


def prop_mu(params, x_prev, z):
    return _trans_mean(params, x_prev)[None]     # APF lookahead


def log_g(params, y, x, z):
    return rv.poisson_logpmf(y[0], x[0])


def sample_g(key, params, x):
    return jax.random.poisson(key, jnp.exp(x[0]), ()).astype(
        jnp.float32)[None]


def log_prior(params):
    phi, mu, sigma = _unpack(params)
    return (rv.uniform_logpdf(phi, -0.99, 0.99)
            + rv.norm_logpdf(mu, 0.0, 2.0)
            + rv.halfnorm_logpdf(sigma, 0.5))


def sample_prior(key):
    # draws EXACTLY the distribution log_prior scores (LW and the swarm
    # initialize parameter clouds from this with no importance
    # correction, liu_west_filter.h paramPriorSamp semantics)
    kp, km, ks = jax.random.split(key, 3)
    phi = jax.random.uniform(kp, (), minval=-0.99, maxval=0.99)
    mu = jax.random.normal(km, ()) * 2.0
    sigma = jnp.abs(jax.random.normal(ks, ())) * 0.5
    return jnp.stack([phi, mu, sigma])


# batched fast-path samplers (params (3,) or (N, 3))
def sample_q1_batch(key, params, y1, n):
    sd = bcol(params[..., 2] / jnp.sqrt(1.0 - params[..., 0] ** 2))
    mu = bcol(params[..., 1])
    return mu + jax.random.normal(key, (n, 1)) * sd


def sample_f_batch(key, params, xs, z):
    phi = bcol(params[..., 0])
    mu = bcol(params[..., 1])
    sigma = bcol(params[..., 2])
    mean = mu + phi * (xs - mu)
    return mean + jax.random.normal(key, xs.shape) * sigma


def sample_q_batch(key, params, xs, y, z):
    return sample_f_batch(key, params, xs, z)


def make_model() -> StateSpaceModel:
    return StateSpaceModel(
        dim_state=1,
        dim_obs=1,
        transform=ParamTransform(TRANSFORMS),
        log_mu=log_mu,
        sample_q1=sample_q1,
        log_q1=log_q1,
        sample_f=sample_f,
        log_f=log_f,
        sample_q=sample_q,
        log_q=log_q,
        prop_mu=prop_mu,
        log_g=log_g,
        sample_g=sample_g,
        log_prior=log_prior,
        sample_prior=sample_prior,
        sample_q1_batch=sample_q1_batch,
        sample_f_batch=sample_f_batch,
        sample_q_batch=sample_q_batch,
        name="poisson_ar",
    )


def simulate(key, params, num_steps):
    """Simulate (xs, ys) for testing."""
    model = make_model()
    k0, key = jax.random.split(key)
    x = model.sample_q1(k0, params, None)

    def step(carry, kk):
        x = carry
        kx, ky = jax.random.split(kk)
        x = model.sample_f(kx, params, x, None)
        y = model.sample_g(ky, params, x)
        return x, (x, y)

    _, (xs, ys) = jax.lax.scan(step, x, jax.random.split(key, num_steps))
    return xs, ys


__all__ = ["make_model", "simulate", "TRANSFORMS"]
