"""Shared numerics: stable log-sum-exp reductions, ESS, weight helpers.

The reference hand-rolls the log-sum-exp trick at every use site
(``include/ssme/thread_pool.h:259-273``, ``liu_west_filter.h:449-452``,
``:515-520``); here it is a single fused primitive.  Effective sample size
is the reference's declared-but-never-implemented TODO
(``liu_west_filter.h:1568-1571``) — implemented here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logsumexp(log_x, axis=-1, keepdims=False):
    """Numerically-stable log(sum(exp(log_x))); -inf-safe."""
    log_x = jnp.asarray(log_x)
    m = jnp.max(log_x, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all -inf -> log(0) = -inf cleanly
    s = jnp.sum(jnp.exp(log_x - m), axis=axis, keepdims=True)
    out = m + jnp.log(s)
    return out if keepdims else jnp.squeeze(out, axis=axis)


def logmeanexp(log_x, axis=-1, keepdims=False):
    """log of the mean of exp(log_x): the reduction the reference's
    averaging thread pool computes over particle-filter replicates
    (``thread_pool.h:259-273``, minus log(n) at ``:268``)."""
    log_x = jnp.asarray(log_x)
    n = log_x.shape[axis]
    return logsumexp(log_x, axis=axis, keepdims=keepdims) - jnp.log(float(n))


def normalize_log_weights(log_w, axis=-1):
    """Self-normalized weights from log-unnormalized weights."""
    log_w = jnp.asarray(log_w)
    return jax.nn.softmax(log_w, axis=axis)


def ess(log_w, axis=-1):
    """Effective sample size 1 / sum(w_i^2) of normalized weights.

    Implements the reference's TODO (``liu_west_filter.h:1568-1571``).
    """
    w = normalize_log_weights(log_w, axis=axis)
    return 1.0 / jnp.sum(w * w, axis=axis)


def weighted_expectation(values, log_w):
    """Sum_i h_i * w~_i over the leading (particle) axis of ``values``.

    ``values``: (N, ...) per-particle functional outputs; ``log_w``: (N,).
    Matches the expectation estimator in the reference filters
    (``liu_west_filter.h:457-477``): numerator and denominator share the
    exp(logw - max) shift, so a constant functional h == c returns exactly
    c (the "42 invariant" of ``test/test_liu_west.cpp:191-199``).
    """
    values = jnp.asarray(values)
    w = normalize_log_weights(jnp.asarray(log_w), axis=-1)
    w = jnp.reshape(w, w.shape + (1,) * (values.ndim - 1))
    return jnp.sum(values * w, axis=0)


__all__ = ["logsumexp", "logmeanexp", "normalize_log_weights", "ess",
           "weighted_expectation"]
