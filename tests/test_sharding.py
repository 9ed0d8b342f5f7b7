"""Multi-device tests on the 8-virtual-device CPU mesh.

Validates the distributed backend (SURVEY §5.8): chain-axis sharding of
PMMH and model-axis sharding of the swarm run correctly under GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssme_tpu.inference import AdaptivePMMH, SwarmFilter
from ssme_tpu.models import lgssm, svol_leverage
from ssme_tpu import parallel


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def test_make_mesh_shapes(eight_devices):
    mesh = parallel.make_mesh(4, 2)
    assert mesh.shape == {"chain": 4, "particle": 2}
    mesh2 = parallel.make_mesh()
    assert mesh2.shape == {"chain": 8, "particle": 1}
    with pytest.raises(ValueError):
        parallel.make_mesh(3, 2)


def test_sharded_pmmh_chains(eight_devices):
    model = lgssm.make_model()
    _, ys = lgssm.simulate(jax.random.key(0), jnp.array([0.8, 0.5, 0.3]), 20)
    pmmh = AdaptivePMMH(model, num_particles=64, num_replicates=2,
                        t0=2, t1=50)
    start = model.transform.unconstrain(jnp.array([0.5, 0.7, 0.5]))

    mesh = parallel.make_mesh(8, 1)
    state = pmmh.init(jax.random.key(1), start, ys, num_chains=8)
    state = parallel.shard_chain_state(state, mesh)
    # chain leaves are actually sharded over 8 devices
    assert len(state.trans_theta.sharding.device_set) == 8

    run = parallel.jit_sharded_pmmh(pmmh, mesh, num_iters=5)
    res = run(state, jnp.asarray(ys))
    assert res.samples.shape == (5, 8, 3)
    assert np.all(np.isfinite(np.asarray(res.log_likes)))


def test_sharded_pmmh_matches_unsharded(eight_devices):
    # GSPMD partitioning must not change the computed chain trajectories
    model = lgssm.make_model()
    _, ys = lgssm.simulate(jax.random.key(2), jnp.array([0.8, 0.5, 0.3]), 15)
    pmmh = AdaptivePMMH(model, num_particles=32, num_replicates=1,
                        t0=2, t1=50)
    start = model.transform.unconstrain(jnp.array([0.5, 0.7, 0.5]))
    state = pmmh.init(jax.random.key(3), start, ys, num_chains=8)

    plain = pmmh.run_from(state, 4, ys)

    mesh = parallel.make_mesh(8, 1)
    sharded_state = parallel.shard_chain_state(state, mesh)
    run = parallel.jit_sharded_pmmh(pmmh, mesh, num_iters=4)
    sharded = run(sharded_state, jnp.asarray(ys))

    np.testing.assert_allclose(np.asarray(plain.samples),
                               np.asarray(sharded.samples),
                               rtol=2e-4, atol=1e-5)


def test_sharded_swarm_models(eight_devices):
    # swarm filter bank sharded over its model axis via the PUBLIC API
    # (parallel.shard_swarm_state / jit_sharded_swarm) — the split-data
    # thread pool replacement (thread_pool.h:295-590)
    model = svol_leverage.make_model()
    sw = SwarmFilter(model, num_state_particles=8, num_param_particles=16)
    ys = 0.05 * jax.random.normal(jax.random.key(4), (6, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])

    state = sw.init(jax.random.key(5))
    # unsharded truth first (same state, plain eval)
    _, plain = jax.lax.scan(
        lambda s, inp: sw.update(s, inp[0], inp[1]), state, (ys, zs))

    mesh = parallel.make_mesh(8, 1)
    sharded_state = parallel.shard_swarm_state(state, mesh)
    assert len(sharded_state.params.sharding.device_set) == 8
    run = parallel.jit_sharded_swarm(sw, mesh)
    final, results = run(sharded_state, ys, zs)
    assert np.all(np.isfinite(np.asarray(results.log_cond_like)))
    # GSPMD partitioning must not change the aggregates
    np.testing.assert_allclose(np.asarray(results.log_cond_like),
                               np.asarray(plain.log_cond_like),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(results.mean_log_cond_like),
                               np.asarray(plain.mean_log_cond_like),
                               rtol=2e-4, atol=1e-5)
