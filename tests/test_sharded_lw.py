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
from jax.sharding import Mesh

from ssme_tpu.filters import LiuWestFilter
from ssme_tpu.models import lgssm, svol_leverage
from ssme_tpu.parallel.sharded_lw import (
    ShardedLiuWest,
    make_sharded_lw_runner,
)

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
    run_sh = make_sharded_lw_runner(sh, _mesh(8))

    un_lls = np.array([
        float(un.run(jax.random.key(100 + i), ys).log_likelihood)
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
        run = make_sharded_lw_runner(sh, _mesh(shards))
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
