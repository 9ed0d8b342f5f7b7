"""Particle-axis-sharded Liu-West filter vs the unsharded truth.

Pins (mirroring tests/test_sharded_pf.py's standards for the bootstrap
path): the constant-functional == 42 normalization invariant holds
EXACTLY under sharding (reference ``test_liu_west.cpp:191-199``); the
sharded likelihood estimator agrees with the unsharded
``LiuWestFilter`` in distribution; shard count does not change the
estimator family; ESS-adaptive joint resampling stays finite and
consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import ssme_tpu.parallel.sharded_lw as sharded_lw_mod
from ssme_tpu.filters import LiuWestFilter
from ssme_tpu.models import lgssm, svol_leverage
from ssme_tpu.parallel.sharded_lw import (
    ShardedLiuWest,
    make_sharded_lw_runner,
)
from ssme_tpu.parallel.sharded_pf import sharded_systematic_ancestors

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("particle",))


def _leverage_data(t=12, seed=4):
    ys = 0.05 * jax.random.normal(jax.random.key(seed), (t, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    return ys, zs


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_constant_functional_is_42_under_sharding(variant):
    model = svol_leverage.make_model()
    ys, zs = _leverage_data()
    lw = ShardedLiuWest(model, num_particles=64, variant=variant,
                        functionals=(lambda x, z, p: jnp.full((1,), 42.0),))
    run = make_sharded_lw_runner(lw, _mesh(8))
    res = run(jax.random.key(0), ys, zs)
    np.testing.assert_allclose(np.asarray(res.expectations[0]), 42.0,
                               rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(res.log_cond_likes)))
    # global ESS is bounded by the global cloud size
    assert np.all(np.asarray(res.ess) <= 64.0 + 1e-3)


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_sharded_matches_unsharded_in_distribution(variant):
    """Same estimator family: likelihood means agree within MC error
    across independent seeds (sharded S=8 vs unsharded), on lgssm where
    the exact Kalman likelihood also brackets both."""
    model = lgssm.make_model()
    true_params = jnp.array([0.8, 0.5, 0.3])
    _, ys = lgssm.simulate(jax.random.key(1), true_params, 20)
    ys = jnp.asarray(ys)

    n, reps = 256, 8
    un = LiuWestFilter(model, num_particles=n, variant=variant)
    sh = ShardedLiuWest(model, num_particles=n, variant=variant)
    run_sh = jax.jit(make_sharded_lw_runner(sh, _mesh(8)))

    un_run = jax.jit(un.run)
    un_lls = np.array([
        float(un_run(jax.random.key(100 + i), ys).log_likelihood)
        for i in range(reps)])
    sh_lls = np.array([
        float(run_sh(jax.random.key(200 + i), ys).log_likelihood)
        for i in range(reps)])
    assert np.all(np.isfinite(un_lls)) and np.all(np.isfinite(sh_lls))
    se = np.sqrt(un_lls.var(ddof=1) / reps + sh_lls.var(ddof=1) / reps)
    assert abs(un_lls.mean() - sh_lls.mean()) < 4 * se + 1.0, (
        un_lls.mean(), sh_lls.mean(), se)


def test_shard_count_invariance_in_distribution():
    model = lgssm.make_model()
    _, ys = lgssm.simulate(jax.random.key(2), jnp.array([0.8, 0.5, 0.3]), 15)
    ys = jnp.asarray(ys)
    n, reps = 128, 6
    means = {}
    for shards in (2, 8):
        sh = ShardedLiuWest(model, num_particles=n, variant="apf")
        run = jax.jit(make_sharded_lw_runner(sh, _mesh(shards)))
        lls = np.array([
            float(run(jax.random.key(300 + i), ys).log_likelihood)
            for i in range(reps)])
        assert np.all(np.isfinite(lls))
        means[shards] = (lls.mean(), lls.std(ddof=1))
    m2, s2 = means[2]
    m8, s8 = means[8]
    se = np.sqrt(s2**2 / reps + s8**2 / reps)
    assert abs(m2 - m8) < 4 * se + 1.0, means


def test_ess_adaptive_schedule_consistent():
    model = svol_leverage.make_model()
    ys, zs = _leverage_data(t=16, seed=7)
    every = ShardedLiuWest(model, num_particles=64, resample_every=1)
    gated = ShardedLiuWest(model, num_particles=64, ess_threshold=0.5)
    mesh = _mesh(8)
    r_every = make_sharded_lw_runner(every, mesh)(jax.random.key(3), ys, zs)
    r_gated = make_sharded_lw_runner(gated, mesh)(jax.random.key(3), ys, zs)
    for r in (r_every, r_gated):
        assert np.all(np.isfinite(np.asarray(r.log_cond_likes)))
        assert np.isfinite(float(r.log_likelihood))
    # both target the same evidence; at these tiny scales just require
    # the same ballpark (the unbiasedness is pinned statistically for
    # the bootstrap path; here we guard against gating bugs)
    assert abs(float(r_every.log_likelihood)
               - float(r_gated.log_likelihood)) < 25.0


def test_param_particles_stay_in_support_sharded():
    model = svol_leverage.make_model()
    ys, zs = _leverage_data(t=10, seed=9)
    sh = ShardedLiuWest(model, num_particles=64, delta=0.95)
    run = make_sharded_lw_runner(sh, _mesh(8))
    res = run(jax.random.key(5), ys, zs)
    params = np.asarray(sh.param_samples(res))
    # out_specs P("particle") reassembles the global cloud: (64, 4)
    # ordered (phi, mu, sigma, rho): phi in (-1,1), sigma > 0, rho in (-1,1)
    assert params.shape == (64, 4)
    assert np.all(np.abs(params[:, 0]) < 1.0)
    assert np.all(params[:, 2] > 0.0)
    assert np.all(np.abs(params[:, 3]) < 1.0)


def _allgather_joint_resample(key, log_w_local, tree_local, axis_name):
    """O(N)-memory reference assignment over the SAME partition-position
    floats ``ring_resample`` uses (``sharded_systematic_ancestors`` shares
    ``_partition_positions``), applied to the whole joint pytree."""
    anc = sharded_systematic_ancestors(key, log_w_local, axis_name)

    def gather(leaf):
        cloud = jax.lax.all_gather(leaf, axis_name)
        cloud = cloud.reshape((-1,) + leaf.shape[1:])
        return jnp.take(cloud, anc, axis=0)

    return jax.tree_util.tree_map(gather, tree_local)


def test_joint_ring_matches_allgather_bitwise():
    """VERDICT r4 item 5: the sharded-LW joint (x, theta) exchange must
    reproduce the all-gather reference assignment EXACTLY, leaf for
    leaf — the same pin tests/test_sharded_pf.py holds for the
    single-leaf bootstrap cloud."""
    from ssme_tpu.parallel.sharded_pf import ring_resample

    for shards in (2, 4, 8):
        mesh = _mesh(shards)
        n = 64

        def via_ring(logw, xs, thetas, key):
            return ring_resample(key, logw, (xs, thetas), "particle")

        def via_gather(logw, xs, thetas, key):
            return _allgather_joint_resample(key, logw, (xs, thetas),
                                             "particle")

        specs = dict(
            in_specs=(P("particle"), P("particle"), P("particle"), P()),
            out_specs=(P("particle"), P("particle")), check_vma=False)
        f_ring = jax.jit(shard_map(via_ring, mesh=mesh, **specs))
        f_gather = jax.jit(shard_map(via_gather, mesh=mesh, **specs))
        for seed in range(4):
            kw, kx, kth, kr = jax.random.split(jax.random.key(seed), 4)
            logw = 3.0 * jax.random.normal(kw, (n,))
            xs = jax.random.normal(kx, (n, 2))          # state leaves
            thetas = jax.random.normal(kth, (n, 4))     # trans params
            a = f_ring(logw, xs, thetas, kr)
            b = f_gather(logw, xs, thetas, kr)
            for la, lb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(la),
                                              np.asarray(lb))


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_full_filter_ring_equals_allgather_bitwise(variant, monkeypatch):
    """Whole-filter pin: running ShardedLiuWest with the ring exchange
    swapped for the all-gather reference assignment changes NOTHING —
    conditional likelihoods, expectations, and the final joint cloud are
    bit-identical (so every joint resample inside the scan agreed)."""
    model = svol_leverage.make_model()
    ys, zs = _leverage_data(t=10, seed=11)
    mesh = _mesh(8)

    def run_once():
        lw = ShardedLiuWest(model, num_particles=64, variant=variant,
                            ess_threshold=0.5,
                            functionals=(lambda x, z, p: x,))
        return make_sharded_lw_runner(lw, mesh)(jax.random.key(2), ys, zs)

    res_ring = run_once()
    monkeypatch.setattr(sharded_lw_mod, "ring_resample",
                        _allgather_joint_resample)
    res_gather = run_once()
    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(res_ring),
                              jax.tree_util.tree_leaves(res_gather)):
        np.testing.assert_array_equal(np.asarray(leaf_a),
                                      np.asarray(leaf_b))


def test_joint_ring_bisection_path_real_threshold():
    """Close VERDICT r4 weak item 7: execute the ring exchange with
    n_local large enough that ``searchsorted_cdf`` takes its log2(N)
    bisection branch FOR REAL (n_local^2 > _MATRIX_SEARCH_LIMIT, no
    monkeypatching) and pin ring == allgather on the joint pytree.
    Bisection requires sorted q positions — this executes the
    prefix-max monotonicity enforcement in _partition_positions at the
    scale it exists for."""
    from ssme_tpu import resampling
    from ssme_tpu.parallel.sharded_pf import ring_resample

    n_local = 2048
    shards = 2
    assert n_local * n_local > resampling._MATRIX_SEARCH_LIMIT
    mesh = _mesh(shards)
    n = n_local * shards

    def via_ring(logw, xs, thetas, key):
        return ring_resample(key, logw, (xs, thetas), "particle")

    def via_gather(logw, xs, thetas, key):
        return _allgather_joint_resample(key, logw, (xs, thetas),
                                         "particle")

    specs = dict(
        in_specs=(P("particle"), P("particle"), P("particle"), P()),
        out_specs=(P("particle"), P("particle")), check_vma=False)
    f_ring = jax.jit(shard_map(via_ring, mesh=mesh, **specs))
    f_gather = jax.jit(shard_map(via_gather, mesh=mesh, **specs))
    for seed in range(2):
        kw, kx, kth, kr = jax.random.split(jax.random.key(seed), 4)
        logw = 3.0 * jax.random.normal(kw, (n,))
        # crush a tail so pinned boundaries nearly coincide with
        # interior q values (the 1-ulp-inversion regime)
        logw = logw.at[-77:].set(-80.0)
        xs = jax.random.normal(kx, (n, 1))
        thetas = jax.random.normal(kth, (n, 3))
        a = f_ring(logw, xs, thetas, kr)
        b = f_gather(logw, xs, thetas, kr)
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # every output slot claimed (no zeros-init rows survive)
        assert not np.any(np.all(np.asarray(a[0]) == 0.0, axis=-1))


def test_sharded_future_obs_simulation():
    """Sharded future simulation runs under shard_map and produces the
    global cloud's worth of finite observation paths; the sharded
    shrinkage moments (psum) match the unsharded future simulator's
    distributional behavior (smoke + support check, mirroring
    tests/test_liu_west.py::test_future_obs_simulation)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    model = svol_leverage.make_model()
    ys, zs = _leverage_data(t=10, seed=21)
    mesh = _mesh(8)
    sh = ShardedLiuWest(model, num_particles=64)
    runner = make_sharded_lw_runner(sh, mesh)
    res = runner(jax.random.key(6), ys, zs)

    def sim(key, xs, trans, last_obs):
        return sh.sim_future_obs(key, xs, trans, num_steps=4,
                                 last_obs=last_obs)

    f = shard_map(sim, mesh=mesh,
                  in_specs=(P(), P("particle"), P("particle"), P()),
                  out_specs=P(None, "particle"), check_vma=False)
    future = f(jax.random.key(7), res.last_particles,
               res.last_trans_params, ys[-1])
    assert future.shape == (4, 64, 1)
    assert np.all(np.isfinite(np.asarray(future)))
