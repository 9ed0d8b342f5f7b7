"""Auxiliary particle filter (APF) with fixed parameters.

The lookahead machinery of the Liu-West type-1 filter
(``include/ssme/liu_west_filter.h:368-484``) specialized to a known
parameter vector — i.e. the classic Pitt-Shephard APF.  Not a class the
reference exposes standalone (its ``pf`` dependency has one; SSME uses
only the bootstrap filters), included to round out the filter family.

Per step:
  1. first-stage weights  logw_i + log g(y_t, propMu(x_i))
  2. ancestors k_i ~ Categorical(first-stage weights)
  3. propagate x'_i ~ f(. | x_{k_i})
  4. second-stage weights  log g(y_t, x'_i) - log g(y_t, propMu(x_{k_i}))
  5. conditional likelihood via the same 3-term LSE identity
     (``liu_west_filter.h:449-452``)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ssme_tpu import resampling, rv
from ssme_tpu.filters.bootstrap import FilterResult, apply_functionals
from ssme_tpu.models.base import StateSpaceModel
from ssme_tpu.utils import ess, logsumexp, weighted_expectation


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class AuxiliaryParticleFilter:
    model: StateSpaceModel
    num_particles: int
    resampler: str = "systematic"
    resample_every: int = 1
    functionals: Tuple[Callable, ...] = ()

    def __post_init__(self):
        self.model.require("sample_q1", "log_q1", "log_mu", "log_g",
                           "sample_f", "prop_mu")

    def _apply_functionals(self, particles, z, params, log_w):
        return apply_functionals(self.model, self.functionals, particles,
                                 z, params, log_w)

    def init(self, key, params, y1, z1=None):
        m = self.model
        n = self.num_particles
        if m.sample_q1_batch is not None:
            particles = m.sample_q1_batch(key, params, y1, n)
        else:
            keys = jax.random.split(key, n)
            particles = jax.vmap(lambda k: m.sample_q1(k, params, y1))(keys)
        log_w = jax.vmap(
            lambda x: m.log_mu(params, x) + m.log_g(params, y1, x, z1)
            - m.log_q1(params, x, y1))(particles)
        lcl = logsumexp(log_w) - jnp.log(float(n))
        return particles, log_w, lcl

    def step(self, key, params, particles, log_w, t, y, z=None):
        m = self.model
        n = self.num_particles
        k_idx, k_prop, k_res = jax.random.split(key, 3)

        lookahead = jax.vmap(lambda x: m.prop_mu(params, x, z))(particles)
        log_fsw = log_w + jax.vmap(
            lambda mu_x: m.log_g(params, y, mu_x, z))(lookahead)

        # sorted-spacings multinomial ancestors (exchangeable; see
        # liu_west.py note) — avoids N^2 gumbels
        ks = resampling.multinomial_indices(k_idx, log_fsw)
        x_anc = jnp.take(particles, ks, axis=0)
        lookahead_anc = jnp.take(lookahead, ks, axis=0)

        if m.sample_f_batch is not None:
            new_particles = m.sample_f_batch(k_prop, params, x_anc, z)
        else:
            new_particles = jax.vmap(
                lambda k, x: m.sample_f(k, params, x, z))(
                jax.random.split(k_prop, n), x_anc)
        log_num = jax.vmap(lambda x: m.log_g(params, y, x, z))(new_particles)
        log_den = jax.vmap(lambda mu_x: m.log_g(params, y, mu_x, z))(
            lookahead_anc)
        new_log_w = log_num - log_den

        lcl = (logsumexp(new_log_w) + logsumexp(log_fsw)
               - 2.0 * logsumexp(log_w))

        do_rs = ((t + 1) % self.resample_every) == 0
        (new_particles,), new_log_w = resampling.maybe_resample(
            k_res, new_log_w, (new_particles,), do_rs, kind=self.resampler)
        return new_particles, new_log_w, lcl

    def run(self, key, params, ys, zs=None) -> FilterResult:
        m = self.model
        ys = jnp.asarray(ys)
        if m.has_covariates:
            if zs is None:
                raise ValueError(f"model {m.name!r} requires covariates zs")
            zs = jnp.asarray(zs)
        z1 = zs[0] if m.has_covariates else None

        k_init, k_scan = jax.random.split(key)
        particles, log_w, lcl0 = self.init(k_init, params, ys[0], z1)
        exp0 = self._apply_functionals(particles, z1, params, log_w)
        ess0 = ess(log_w)
        (particles,), log_w = resampling.maybe_resample(
            jax.random.fold_in(k_init, 1), log_w, (particles,),
            jnp.asarray(self.resample_every == 1), kind=self.resampler)

        ts = jnp.arange(1, ys.shape[0])
        rest = (ys[1:], zs[1:]) if m.has_covariates else (ys[1:],)

        def scan_step(carry, inp):
            particles, log_w, key = carry
            if m.has_covariates:
                t, y, z = inp
            else:
                t, y = inp
                z = None
            key, k_t = jax.random.split(key)
            particles, log_w, lcl = self.step(k_t, params, particles, log_w,
                                              t, y, z)
            exps = self._apply_functionals(particles, z, params, log_w)
            return (particles, log_w, key), (lcl, exps, ess(log_w))

        (particles, log_w, _), (lcls, exps, esss) = jax.lax.scan(
            scan_step, (particles, log_w, k_scan), (ts,) + rest)

        lcls = jnp.concatenate([lcl0[None], lcls])
        esss = jnp.concatenate([ess0[None], esss])
        expectations = tuple(
            jnp.concatenate([e0[None], etraj])
            for e0, etraj in zip(exp0, exps))
        return FilterResult(
            log_likelihood=jnp.sum(lcls),
            log_cond_likes=lcls,
            expectations=expectations,
            ess=esss,
            last_particles=particles,
            last_log_weights=log_w,
        )


__all__ = ["AuxiliaryParticleFilter"]
