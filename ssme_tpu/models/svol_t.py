"""Stochastic volatility with Student-t observation tails.

Not in the reference (Gaussian observations only); included for the
robust/heavy-tail axis standard in production return modeling:

    x_t = phi x_{t-1} + sigma eps_t
    y_t ~ beta e^{x_t / 2} * t_nu          (Student-t, nu dof)
    x_1 ~ N(0, sigma^2 / (1 - phi^2))

i.e. the reference example SVOL (``example/univ_svol_bootstrap_filter.h``)
with the Gaussian observation replaced by a scaled Student-t; as
nu -> inf it converges to ``models.svol`` (pinned by a test).

Parameters (constrained) ordered (beta, phi, ss, nu) — the reference's
(beta, phi, ss) ordering extended with the dof — transforms
{null, twice_fisher, log, log}.  Priors (sampled AND scored):
beta ~ N(1,1), phi ~ U(0,1), ss ~ InvGamma(2, 0.2), nu ~ Exp(mean 10).
(The reference example's InvGamma(.001,.001) on ss is evaluate-only —
its draws overflow f32 — so this model uses a proper sampleable prior.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssme_tpu import rv
from ssme_tpu.models.base import StateSpaceModel, bcol
from ssme_tpu.transforms import ParamTransform

TRANSFORMS = ("null", "twice_fisher", "log", "log")


def _unpack(params):
    beta = params[0]
    phi = params[1]
    sigma = jnp.sqrt(params[2])
    nu = params[3]
    return beta, phi, sigma, nu


def _stationary_sd(params):
    _, phi, sigma, _ = _unpack(params)
    return sigma / jnp.sqrt(1.0 - phi * phi)


def log_mu(params, x1):
    return rv.norm_logpdf(x1[0], 0.0, _stationary_sd(params))


def sample_q1(key, params, y1):
    return (jax.random.normal(key, ()) * _stationary_sd(params))[None]


def log_q1(params, x1, y1):
    return log_mu(params, x1)


def sample_f(key, params, x_prev, z):
    _, phi, sigma, _ = _unpack(params)
    return (phi * x_prev[0] + jax.random.normal(key, ()) * sigma)[None]


def log_f(params, x, x_prev, z):
    _, phi, sigma, _ = _unpack(params)
    return rv.norm_logpdf(x[0], phi * x_prev[0], sigma)


def sample_q(key, params, x_prev, y, z):
    return sample_f(key, params, x_prev, z)


def log_q(params, x, x_prev, y, z):
    return log_f(params, x, x_prev, z)


def prop_mu(params, x_prev, z):
    _, phi, _, _ = _unpack(params)
    return (phi * x_prev[0])[None]


def log_g(params, y, x, z):
    beta, _, _, nu = _unpack(params)
    scale = beta * jnp.exp(0.5 * x[0])
    return rv.t_logpdf(y[0], nu, 0.0, scale)


def sample_g(key, params, x):
    beta, _, _, nu = _unpack(params)
    scale = beta * jnp.exp(0.5 * x[0])
    return (jax.random.t(key, nu, ()) * scale)[None]


def log_prior(params):
    # proper, f32-SAMPLEABLE priors (the reference example's
    # InvGamma(.001,.001) cannot be sampled in f32 — its draws overflow;
    # PMMH only evaluates, but LW/swarm initialize clouds from
    # sample_prior, so the pair must be a consistent proper prior):
    # beta ~ HalfNormal(1)+loc0 via |N(1,1)|? -> keep beta ~ N(1,1) on
    # the scored side; negative-beta particles score -inf in log_g and
    # die immediately, matching the reference's N(1,1) convention.
    beta, phi, _, nu = _unpack(params)
    ss = params[2]
    return (rv.norm_logpdf(beta, 1.0, 1.0)
            + rv.uniform_logpdf(phi, 0.0, 1.0)
            + rv.invgamma_logpdf(ss, 2.0, 0.2)
            + jnp.where(nu > 0, -nu / 10.0 - jnp.log(10.0), -jnp.inf))


def sample_prior(key):
    # exact draws from log_prior's distribution
    kb, kp, ks, kn = jax.random.split(key, 4)
    beta = 1.0 + jax.random.normal(kb, ())
    phi = jax.random.uniform(kp, ())
    ss = 0.2 / jax.random.gamma(ks, 2.0, ())     # InvGamma(2, 0.2)
    nu = jax.random.exponential(kn, ()) * 10.0
    return jnp.stack([beta, phi, ss, nu])


# batched fast-path samplers (params (4,) or (N, 4))
def sample_q1_batch(key, params, y1, n):
    sd = bcol(jnp.sqrt(params[..., 2])
              / jnp.sqrt(1.0 - params[..., 1] ** 2))
    return jax.random.normal(key, (n, 1)) * sd


def sample_f_batch(key, params, xs, z):
    phi = bcol(params[..., 1])
    sigma = bcol(jnp.sqrt(params[..., 2]))
    return phi * xs + jax.random.normal(key, xs.shape) * sigma


def sample_q_batch(key, params, xs, y, z):
    return sample_f_batch(key, params, xs, z)


def sample_g_batch(key, params, xs):
    beta = bcol(params[..., 0])
    nu = bcol(params[..., 3])
    scale = beta * jnp.exp(0.5 * xs)
    return jax.random.t(key, nu, xs.shape) * scale


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
        sample_g_batch=sample_g_batch,
        name="svol_t",
    )


def simulate(key, params, num_steps):
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
