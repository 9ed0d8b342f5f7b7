"""Particle-axis-sharded bootstrap filter via ``shard_map`` collectives.

Scales a SINGLE filter's particle cloud across chips over ICI (SURVEY §5.7
scaling axes; BASELINE sharding plan).  Propagation and weighting are
embarrassingly parallel per shard; the two cross-particle communication
points become explicit collectives:

- conditional-likelihood reductions: global log-sum-exp =
  ``pmax`` (shift) + ``psum`` (sum of shifted exps);
- resampling: global systematic resampling where each shard computes the
  ancestors of its OWN output slots against the global weight CDF.  Weight
  totals travel via an all-gather of per-shard sums (one scalar per shard);
  ancestor *states* travel via an all-gather of the (N, dim_state) cloud —
  for the state dimensions of this model class (1-8 floats) that is
  bandwidth-trivial compared to the propagation compute it unlocks.

Usable standalone (``shard_map`` over the particle axis only) or inside a
chain+particle shard_map (see ``ssme_tpu.parallel.multichip``): all
collectives are keyed by ``axis_name`` only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ssme_tpu.models.base import StateSpaceModel


def _axis_size(axis_name):
    return jax.lax.axis_size(axis_name)


def _axis_index(axis_name):
    return jax.lax.axis_index(axis_name)


def global_logsumexp(log_x_local, axis_name):
    """LSE over both the local axis and the mesh axis."""
    m_local = jnp.max(log_x_local)
    m = jax.lax.pmax(m_local, axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(log_x_local - m)), axis_name)
    return m + jnp.log(s)


def sharded_systematic_ancestors(key, log_w_local, axis_name):
    """Global systematic resampling, shard-local output slots.

    Every shard must pass the SAME ``key`` (it indexes the shared uniform
    offset).  Returns global ancestor indices for this shard's slots, plus
    the all-gathered flat index base needed to gather from the gathered
    cloud.
    """
    n_local = log_w_local.shape[0]
    n_shards = _axis_size(axis_name)
    me = _axis_index(axis_name)
    n_global = n_local * n_shards

    # stabilize weights globally
    m = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w_local = jnp.exp(log_w_local - m)
    total = jax.lax.psum(jnp.sum(w_local), axis_name)
    w_local = w_local / total

    # global CDF = local prefix + sum of preceding shards' masses
    shard_sums = jax.lax.all_gather(jnp.sum(w_local), axis_name)  # (S,)
    prefix = jnp.cumsum(shard_sums) - shard_sums  # exclusive
    cdf_local = jnp.cumsum(w_local) + prefix[me]
    cdf_global = jax.lax.all_gather(cdf_local, axis_name).reshape(-1)
    cdf_global = cdf_global / cdf_global[-1]

    # systematic grid over the *global* output slots; mine are
    # [me*n_local, (me+1)*n_local)
    u0 = jax.random.uniform(key, ())
    slots = me * n_local + jnp.arange(n_local)
    grid = (slots.astype(cdf_global.dtype) + u0) / n_global
    from ssme_tpu.resampling import searchsorted_cdf
    return searchsorted_cdf(cdf_global, grid)


def global_ess(log_w_local, axis_name):
    """Global effective sample size (sum w)^2 / sum w^2 across shards."""
    mx = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w = jnp.exp(log_w_local - mx)
    s1 = jax.lax.psum(jnp.sum(w), axis_name)
    s2 = jax.lax.psum(jnp.sum(w * w), axis_name)
    return s1 * s1 / s2


def sharded_log_likelihood_fn(model: StateSpaceModel, num_particles: int,
                              axis_name: str = "particle",
                              resample_every: int = 1,
                              ess_threshold: float = 0.0):
    """Bootstrap-filter log-likelihood with the particle axis sharded.

    Returns ``ll(key, params, ys[, zs]) -> scalar`` that MUST be called
    inside a ``shard_map`` over ``axis_name``; every shard passes identical
    arguments (data replicated) and receives the identical global
    log-likelihood (a ``psum``-closed value).  Semantics match the
    unsharded :func:`ssme_tpu.filters.log_likelihood_fn`.

    ``ess_threshold > 0`` switches to ESS-adaptive resampling (fire when
    the GLOBAL ESS drops below that fraction of num_particles — matching
    the megakernels' gate, with the ESS reduced by collectives).
    """
    m = model
    m.require("sample_q1", "log_q1", "log_mu", "log_g", "sample_f")

    def ll(key, params, ys, zs=None):
        n_shards = _axis_size(axis_name)
        me = _axis_index(axis_name)
        n_local = num_particles // n_shards
        ys_arr = jnp.asarray(ys)

        # every shard derives the same per-step keys; particle streams
        # differ by a fold-in of the shard index where needed
        k_init, k_scan = jax.random.split(key)
        shard_key = jax.random.fold_in(k_init, me)

        z1 = zs[0] if m.has_covariates else None
        keys = jax.random.split(shard_key, n_local)
        particles = jax.vmap(lambda k: m.sample_q1(k, params, ys_arr[0]))(keys)
        log_w = jax.vmap(
            lambda x: m.log_mu(params, x) + m.log_g(params, ys_arr[0], x, z1)
            - m.log_q1(params, x, ys_arr[0])
        )(particles)
        lcl0 = (global_logsumexp(log_w, axis_name)
                - jnp.log(float(num_particles)))

        def resample(k_res, particles, log_w, do_rs):
            anc = sharded_systematic_ancestors(k_res, log_w, axis_name)
            slots = me * n_local + jnp.arange(n_local)
            anc = jnp.where(do_rs, anc, slots)
            cloud = jax.lax.all_gather(particles, axis_name)
            cloud = cloud.reshape((-1,) + particles.shape[1:])
            new_particles = jnp.take(cloud, anc, axis=0)
            new_log_w = jnp.where(do_rs, jnp.zeros_like(log_w), log_w)
            return new_particles, new_log_w

        if ess_threshold > 0.0:
            do0 = (global_ess(log_w, axis_name)
                   < ess_threshold * num_particles)
        else:
            do0 = jnp.asarray(resample_every == 1)
        particles, log_w = resample(
            jax.random.fold_in(k_init, 12345), particles, log_w, do0)

        ts = jnp.arange(1, ys_arr.shape[0])
        xs = (ts, ys_arr[1:], zs[1:]) if m.has_covariates else (ts, ys_arr[1:])

        def step(carry, inp):
            particles, log_w, key = carry
            if m.has_covariates:
                t, y, z = inp
            else:
                t, y = inp
                z = None
            key, k_res, k_prop = jax.random.split(key, 3)
            if ess_threshold > 0.0:
                do_rs = (global_ess(log_w, axis_name)
                         < ess_threshold * num_particles)
            else:
                do_rs = (t % resample_every) == 0
            particles, log_w = resample(k_res, particles, log_w, do_rs)
            old_lse = global_logsumexp(log_w, axis_name)
            pkeys = jax.random.split(jax.random.fold_in(k_prop, me), n_local)
            particles = jax.vmap(lambda k, x: m.sample_f(k, params, x, z))(
                pkeys, particles)
            log_w = log_w + jax.vmap(lambda x: m.log_g(params, y, x, z))(
                particles)
            lcl = global_logsumexp(log_w, axis_name) - old_lse
            return (particles, log_w, key), lcl

        (_, _, _), lcls = jax.lax.scan(step, (particles, log_w, k_scan), xs)
        return lcl0 + jnp.sum(lcls)

    return ll


def make_sharded_ll_callable(model, num_particles, mesh,
                             axis_name: str = "particle",
                             resample_every: int = 1,
                             ess_threshold: float = 0.0):
    """Wrap the sharded likelihood in its own ``shard_map`` so it can be
    called from un-sharded code: ``f(key, params, ys)`` or — for
    covariate models — ``f(key, params, ys, zs)``; returns a scalar.
    """
    from jax import shard_map

    inner = sharded_log_likelihood_fn(model, num_particles, axis_name,
                                      resample_every, ess_threshold)

    if model.has_covariates:
        return shard_map(
            lambda key, params, ys, zs: inner(key, params, ys, zs),
            mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
            check_vma=False)
    return shard_map(
        lambda key, params, ys: inner(key, params, ys),
        mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False)


__all__ = [
    "global_logsumexp", "global_ess", "sharded_systematic_ancestors",
    "sharded_log_likelihood_fn", "make_sharded_ll_callable",
]
