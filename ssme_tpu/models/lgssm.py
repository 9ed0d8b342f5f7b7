"""Linear-Gaussian state-space model, for exact validation against Kalman.

Not present in the reference (which has no statistical-correctness tests —
SURVEY §4 gaps); added so particle-filter log-likelihoods and filtering
means can be checked against closed form.

    x_t = a x_{t-1} + q eps_t
    y_t = c x_t     + r eta_t
    x_1 ~ N(0, q^2 / (1 - a^2))

Parameters (constrained): (a, q, r) with transforms
{twice_fisher, log, log}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssme_tpu import rv
from ssme_tpu.models.base import StateSpaceModel, bcol
from ssme_tpu.transforms import ParamTransform

TRANSFORMS = ("twice_fisher", "log", "log")
C_OBS = 1.0  # fixed observation loading


def _stationary_sd(params):
    a, q = params[0], params[1]
    return q / jnp.sqrt(1.0 - a * a)


def log_mu(params, x1):
    return rv.norm_logpdf(x1[0], 0.0, _stationary_sd(params))


def sample_q1(key, params, y1):
    return jax.random.normal(key, (1,)) * _stationary_sd(params)


def log_q1(params, x1, y1):
    return log_mu(params, x1)


def sample_f(key, params, x_prev, z):
    a, q = params[0], params[1]
    return a * x_prev + jax.random.normal(key, (1,)) * q


def log_f(params, x, x_prev, z):
    a, q = params[0], params[1]
    return rv.norm_logpdf(x[0], a * x_prev[0], q)


def sample_q(key, params, x_prev, y, z):
    return sample_f(key, params, x_prev, z)


def log_q(params, x, x_prev, y, z):
    return log_f(params, x, x_prev, z)


def prop_mu(params, x_prev, z):
    return params[0] * x_prev


def log_g(params, y, x, z):
    r = params[2]
    return rv.norm_logpdf(y[0], C_OBS * x[0], r)


def sample_g(key, params, x):
    r = params[2]
    return C_OBS * x + jax.random.normal(key, (1,)) * r


def log_prior(params):
    a, q, r = params[0], params[1], params[2]
    return (rv.uniform_logpdf(a, -1.0, 1.0)
            + rv.halfnorm_logpdf(q, 1.0)
            + rv.halfnorm_logpdf(r, 1.0))


def sample_prior(key):
    ka, kq, kr = jax.random.split(key, 3)
    a = jax.random.uniform(ka, (), minval=-1.0, maxval=1.0)
    q = jnp.abs(jax.random.normal(kq, ()))
    r = jnp.abs(jax.random.normal(kr, ()))
    return jnp.stack([a, q, r])


# --- batched fast-path samplers; params may be (3,) or (n, 3) -----------

def sample_q1_batch(key, params, y1, n):
    sd = bcol(params[..., 1] / jnp.sqrt(1.0 - params[..., 0] ** 2))
    return jax.random.normal(key, (n, 1)) * sd


def sample_f_batch(key, params, xs, z):
    a = bcol(params[..., 0])
    q = bcol(params[..., 1])
    return a * xs + jax.random.normal(key, xs.shape) * q


def sample_q_batch(key, params, xs, y, z):
    return sample_f_batch(key, params, xs, z)


def sample_g_batch(key, params, xs):
    r = bcol(params[..., 2])
    return C_OBS * xs + jax.random.normal(key, xs.shape[:-1] + (1,)) * r


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
        sample_g_batch=sample_g_batch,
        name="lgssm",
    )


def simulate(key, params, num_steps):
    """Simulate (xs, ys) from the model for test fixtures."""
    a, q, r = params[0], params[1], params[2]
    k0, key = jax.random.split(key)
    x0 = jax.random.normal(k0, ()) * _stationary_sd(params)

    def step(carry, k):
        x = carry
        kx, ky = jax.random.split(k)
        x_new = a * x + jax.random.normal(kx, ()) * q
        y = C_OBS * x_new + jax.random.normal(ky, ()) * r
        return x_new, (x_new, y)

    # first observation measures x1 = x0 (stationary draw)
    ky0, key = jax.random.split(key)
    y0 = C_OBS * x0 + jax.random.normal(ky0, ()) * r
    _, (xs, ys) = jax.lax.scan(step, x0, jax.random.split(key, num_steps - 1))
    xs = jnp.concatenate([x0[None], xs])[:, None]
    ys = jnp.concatenate([y0[None], ys])[:, None]
    return xs, ys


def kalman_filter(params, ys):
    """Exact filter: returns (log_cond_likes, filter_means, filter_vars).

    The gold standard the particle filters are validated against
    (SURVEY §4: "statistical tests against closed-form filters").
    """
    a, q, r = params[0], params[1], params[2]
    c = C_OBS
    ys = jnp.asarray(ys)[..., 0]
    p0 = q * q / (1.0 - a * a)

    def step(carry, y):
        mean_pred, var_pred = carry
        s = c * c * var_pred + r * r
        ll = rv.norm_logpdf(y, c * mean_pred, jnp.sqrt(s))
        gain = var_pred * c / s
        mean_filt = mean_pred + gain * (y - c * mean_pred)
        var_filt = (1.0 - gain * c) * var_pred
        return (a * mean_filt, a * a * var_filt + q * q), (ll, mean_filt, var_filt)

    _, (lls, means, variances) = jax.lax.scan(step, (jnp.zeros(()), p0), ys)
    return lls, means, variances


def kalman_smoother(params, ys):
    """Exact RTS smoother: returns (smoothed_means, smoothed_vars) —
    E[x_t | y_{1:T}].  Ground truth for the particle fixed-lag smoother
    (``filters/smoothing.py``)."""
    a, q, _ = params[0], params[1], params[2]
    _, means, variances = kalman_filter(params, ys)
    # backward RTS recursion
    last = (means[-1], variances[-1])

    def back(carry, inp):
        m_next_s, v_next_s = carry
        m_f, v_f = inp
        m_pred = a * m_f
        v_pred = a * a * v_f + q * q
        gain = v_f * a / v_pred
        m_s = m_f + gain * (m_next_s - m_pred)
        v_s = v_f + gain * gain * (v_next_s - v_pred)
        return (m_s, v_s), (m_s, v_s)

    _, (ms, vs) = jax.lax.scan(back, last, (means[:-1], variances[:-1]),
                               reverse=True)
    ms = jnp.concatenate([ms, means[-1:]])
    vs = jnp.concatenate([vs, variances[-1:]])
    return ms, vs


__all__ = ["make_model", "simulate", "kalman_filter", "kalman_smoother",
           "TRANSFORMS"]
