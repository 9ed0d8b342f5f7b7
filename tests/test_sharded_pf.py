"""Particle-axis-sharded filter tests: collectives vs single-device truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ssme_tpu.filters import log_likelihood_fn
from ssme_tpu.models import lgssm
from ssme_tpu.parallel.sharded_pf import (
    global_logsumexp,
    make_sharded_ll_callable,
    sharded_log_likelihood_fn,
    sharded_systematic_ancestors,
)
from ssme_tpu.utils import logsumexp

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _particle_mesh(n):
    import numpy as onp
    return Mesh(onp.asarray(jax.devices()[:n]), ("particle",))


def test_global_logsumexp_matches_local():
    mesh = _particle_mesh(4)
    x = jax.random.normal(jax.random.key(0), (64,))

    f = shard_map(lambda xs: global_logsumexp(xs, "particle"),
                  mesh=mesh, in_specs=P("particle"), out_specs=P(),
                  check_vma=False)
    got = f(x)
    np.testing.assert_allclose(float(got), float(logsumexp(x)), rtol=1e-5)


def test_sharded_ancestors_match_weights_distribution():
    mesh = _particle_mesh(4)
    n = 64
    w = jnp.log(jnp.arange(1.0, n + 1))  # increasing weights

    def anc(logw, key):
        return sharded_systematic_ancestors(key, logw, "particle")

    f = shard_map(anc, mesh=mesh, in_specs=(P("particle"), P()),
                  out_specs=P("particle"), check_vma=False)
    counts = np.zeros(n)
    for i in range(50):
        idx = np.asarray(f(w, jax.random.key(i)))
        counts += np.bincount(idx, minlength=n)
    freqs = counts / counts.sum()
    want = np.arange(1.0, n + 1)
    want /= want.sum()
    np.testing.assert_allclose(freqs, want, atol=0.01)


def test_sharded_ll_close_to_unsharded():
    # same estimator family: values agree to MC error across PRNG schemes
    model = lgssm.make_model()
    params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(1), params, 60)
    lls, _, _ = lgssm.kalman_filter(params, ys)
    exact = float(jnp.sum(lls))

    mesh = _particle_mesh(4)
    sharded = make_sharded_ll_callable(model, 1024, mesh)
    got = float(jax.jit(sharded)(jax.random.key(2), params, jnp.asarray(ys)))
    assert abs(got - exact) < 2.5, (got, exact)

    plain = log_likelihood_fn(model, 1024)
    ref = float(plain(jax.random.key(2), params, jnp.asarray(ys)))
    assert abs(got - ref) < 3.0


def test_sharded_ll_identical_across_shard_counts_in_expectation():
    model = lgssm.make_model()
    params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(3), params, 40)
    lls, _, _ = lgssm.kalman_filter(params, ys)
    exact = float(jnp.sum(lls))
    for shards in (2, 8):
        mesh = _particle_mesh(shards)
        f = make_sharded_ll_callable(model, 512, mesh)
        vals = [float(f(jax.random.key(10 + i), params, jnp.asarray(ys)))
                for i in range(4)]
        assert abs(np.mean(vals) - exact) < 2.0, (shards, vals, exact)


def test_sharded_ess_adaptive_matches_every_step():
    """ESS-gated sharded likelihood agrees with the every-step schedule
    in expectation (both unbiased for the same evidence)."""
    from ssme_tpu import parallel
    from ssme_tpu.parallel.sharded_pf import make_sharded_ll_callable

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = parallel.make_mesh(1, 8)
    model = lgssm.make_model()
    params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(0), params, 40)
    ys = jnp.asarray(ys)

    f_every = make_sharded_ll_callable(model, 128, mesh)
    f_ess = make_sharded_ll_callable(model, 128, mesh, ess_threshold=0.5)
    keys = jax.random.split(jax.random.key(1), 24)
    ll_e = jnp.stack([f_every(k, params, ys) for k in keys[:12]])
    ll_a = jnp.stack([f_ess(k, params, ys) for k in keys[12:]])
    assert np.all(np.isfinite(np.asarray(ll_e)))
    assert np.all(np.isfinite(np.asarray(ll_a)))
    se = (float(ll_e.std()) + float(ll_a.std())) / np.sqrt(12) * 4 + 0.5
    assert abs(float(ll_e.mean()) - float(ll_a.mean())) < se

    # and both match the exact Kalman likelihood within MC error
    exact = float(jnp.sum(lgssm.kalman_filter(params, ys)[0]))
    assert abs(float(ll_a.mean()) - exact) < 4 * float(ll_a.std()) + 1.0
