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
    ring_resample,
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

    f = jax.jit(shard_map(anc, mesh=mesh, in_specs=(P("particle"), P()),
                          out_specs=P("particle"), check_vma=False))
    counts = np.zeros(n)
    for i in range(50):
        idx = np.asarray(f(w, jax.random.key(i)))
        counts += np.bincount(idx, minlength=n)
    freqs = counts / counts.sum()
    want = np.arange(1.0, n + 1)
    want /= want.sum()
    np.testing.assert_allclose(freqs, want, atol=0.01)


def test_ring_resample_matches_allgather_bitwise():
    """The ring exchange must reproduce the all-gather reference
    assignment EXACTLY (same shared partition positions, same compares):
    resampled clouds agree bit-for-bit across weights and keys."""
    for shards in (2, 4, 8):
        mesh = _particle_mesh(shards)
        n = 64

        def via_ring(logw, xs, key):
            return ring_resample(key, logw, (xs,), "particle")[0]

        def via_gather(logw, xs, key):
            anc = sharded_systematic_ancestors(key, logw, "particle")
            cloud = jax.lax.all_gather(xs, "particle")
            cloud = cloud.reshape((-1,) + xs.shape[1:])
            return jnp.take(cloud, anc, axis=0)

        f_ring = jax.jit(shard_map(
            via_ring, mesh=mesh,
            in_specs=(P("particle"), P("particle"), P()),
            out_specs=P("particle"), check_vma=False))
        f_gather = jax.jit(shard_map(
            via_gather, mesh=mesh,
            in_specs=(P("particle"), P("particle"), P()),
            out_specs=P("particle"), check_vma=False))
        for seed in range(6):
            kw, kx, kr = jax.random.split(jax.random.key(seed), 3)
            # heavy-tailed weights: exercises imbalanced shard masses
            logw = 3.0 * jax.random.normal(kw, (n,))
            xs = jax.random.normal(kx, (n, 2))
            a = np.asarray(f_ring(logw, xs, kr))
            b = np.asarray(f_gather(logw, xs, kr))
            np.testing.assert_array_equal(a, b)


def test_ring_resample_extreme_imbalance():
    """All mass on one shard: every output slot must still be claimed
    exactly once (the pinned boundary positions leave no holes), and all
    ancestors come from the heavy shard."""
    mesh = _particle_mesh(8)
    n = 64

    def via_ring(logw, xs, key):
        return ring_resample(key, logw, (xs,), "particle")[0]

    f = shard_map(via_ring, mesh=mesh,
                  in_specs=(P("particle"), P("particle"), P()),
                  out_specs=P("particle"), check_vma=False)
    # shard 3 holds essentially all the weight
    logw = jnp.full((n,), -1e30).at[3 * 8:4 * 8].set(0.0)
    xs = jnp.arange(n, dtype=jnp.float32)[:, None]
    out = np.asarray(f(logw, xs, jax.random.key(0)))[:, 0]
    assert np.all((out >= 24) & (out < 32)), out
    # systematic resampling of 8 uniform weights into 64 slots: each
    # ancestor appears exactly 8 times
    _, counts = np.unique(out, return_counts=True)
    np.testing.assert_array_equal(counts, np.full(8, 8))


def _shardmap_max_intermediate(fn, *args):
    """Largest array (in elements) created INSIDE the shard_map body."""
    jaxpr = jax.make_jaxpr(fn)(*args)

    def walk(jx):
        mx = 0
        for eqn in jx.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    mx = max(mx, int(np.prod(aval.shape, dtype=np.int64)))
            for val in eqn.params.values():
                for sub in jax.tree_util.tree_leaves(
                        val, is_leaf=lambda x: hasattr(x, "eqns")):
                    if hasattr(sub, "eqns"):
                        mx = max(mx, walk(sub))
                    elif hasattr(sub, "jaxpr"):
                        mx = max(mx, walk(sub.jaxpr))
        return mx

    for eqn in jaxpr.eqns:
        if "shard_map" in str(eqn.primitive):
            body = eqn.params.get("jaxpr")
            return walk(body if hasattr(body, "eqns") else body.jaxpr)
    raise AssertionError("no shard_map eqn found")


def test_ring_resample_memory_is_o_n_local():
    """SURVEY §7 hard part: the sharded resampler must not materialize
    global N on one chip.  The largest per-shard intermediate of the
    ring exchange must stay O(n_local) — CONSTANT as the shard count
    (hence global N) grows — while the all-gather variant's grows
    linearly with N."""
    n_local = 2048  # large enough that searchsorted uses bisection
    ring_sizes, gather_sizes = {}, {}
    for shards in (2, 8):
        mesh = _particle_mesh(shards)
        n = n_local * shards

        def via_ring(logw, xs, key):
            return ring_resample(key, logw, (xs,), "particle")[0]

        def via_gather(logw, xs, key):
            anc = sharded_systematic_ancestors(key, logw, "particle")
            cloud = jax.lax.all_gather(xs, "particle")
            cloud = cloud.reshape((-1,) + xs.shape[1:])
            return jnp.take(cloud, anc, axis=0)

        args = (jnp.zeros(n), jnp.zeros((n, 1)), jax.random.key(0))
        specs = dict(in_specs=(P("particle"), P("particle"), P()),
                     out_specs=P("particle"), check_vma=False)
        ring_sizes[shards] = _shardmap_max_intermediate(
            shard_map(via_ring, mesh=mesh, **specs), *args)
        gather_sizes[shards] = _shardmap_max_intermediate(
            shard_map(via_gather, mesh=mesh, **specs), *args)

    # ring: no intermediate grows with the shard count, and everything
    # is a small multiple of n_local
    assert ring_sizes[8] == ring_sizes[2], ring_sizes
    assert ring_sizes[8] <= 4 * n_local, ring_sizes
    # all-gather reference: the gathered cloud is O(N) per chip
    assert gather_sizes[8] >= 8 * n_local, gather_sizes
    assert gather_sizes[8] > ring_sizes[8]


def test_sharded_ll_ring_equals_allgather():
    """Full filter likelihood: identical for both exchanges (the
    resampled clouds are bitwise equal, so the whole scan is)."""
    model = lgssm.make_model()
    params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(5), params, 30)
    mesh = _particle_mesh(8)
    f_ring = jax.jit(make_sharded_ll_callable(model, 256, mesh,
                                              exchange="ring"))
    f_ag = jax.jit(make_sharded_ll_callable(model, 256, mesh,
                                            exchange="allgather"))
    for seed in (0, 1):
        a = float(f_ring(jax.random.key(seed), params, jnp.asarray(ys)))
        b = float(f_ag(jax.random.key(seed), params, jnp.asarray(ys)))
        assert a == b, (a, b)


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
        f = jax.jit(make_sharded_ll_callable(model, 512, mesh))
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

    f_every = jax.jit(make_sharded_ll_callable(model, 128, mesh))
    f_ess = jax.jit(make_sharded_ll_callable(model, 128, mesh,
                                             ess_threshold=0.5))
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


def test_ring_matches_allgather_on_bisection_path(monkeypatch):
    """ring_resample's searchsorted switches to log2(N) bisection above
    resampling._MATRIX_SEARCH_LIMIT, which requires the q positions to
    be sorted — _partition_positions enforces exact monotonicity
    (prefix-max) because tree-reassociated prefix sums and the
    independently-rounded pinned tails are not bitwise monotone.  Force
    the bisection path at a small size and pin ring == allgather,
    including near-degenerate trailing weights that stress the pinned
    boundary."""
    from ssme_tpu import resampling

    monkeypatch.setattr(resampling, "_MATRIX_SEARCH_LIMIT", 1)
    mesh = _particle_mesh(4)
    n = 64

    def via_ring(logw, xs, key):
        return ring_resample(key, logw, (xs,), "particle")[0]

    def via_gather(logw, xs, key):
        anc = sharded_systematic_ancestors(key, logw, "particle")
        cloud = jax.lax.all_gather(xs, "particle")
        cloud = cloud.reshape((-1,) + xs.shape[1:])
        return jnp.take(cloud, anc, axis=0)

    f_ring = jax.jit(shard_map(
        via_ring, mesh=mesh,
        in_specs=(P("particle"), P("particle"), P()),
        out_specs=P("particle"), check_vma=False))
    f_gather = jax.jit(shard_map(
        via_gather, mesh=mesh,
        in_specs=(P("particle"), P("particle"), P()),
        out_specs=P("particle"), check_vma=False))
    for seed in range(4):
        kw, kx, kr = jax.random.split(jax.random.key(seed), 3)
        logw = 3.0 * jax.random.normal(kw, (n,))
        # crush the tail of the last shard toward zero weight so the
        # pinned boundary and the interior q values nearly coincide
        logw = logw.at[-12:].set(-80.0)
        xs = jax.random.normal(kx, (n, 2))
        a = np.asarray(f_ring(logw, xs, kr))
        b = np.asarray(f_gather(logw, xs, kr))
        np.testing.assert_array_equal(a, b)
        # every output slot claimed: no row left at its zeros init
        assert not np.any(np.all(a == 0.0, axis=-1))
