"""Particle-swarm filter tests (mirrors test/test_pswarm.cpp and extends)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.inference import SwarmFilter
from ssme_tpu.io.csv import ParamSampler
from ssme_tpu.models import svol_leverage


@pytest.fixture(scope="module")
def leverage_model():
    return svol_leverage.make_model()


def _data(T=8, key=0):
    ys = 0.05 * jax.random.normal(jax.random.key(key), (T, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    return ys, zs


def test_swarm_prior_draws_and_42_invariant(leverage_model):
    # analog of test_pswarm.cpp:230-254 (uniform-prior swarm, h == 42)
    sw = SwarmFilter(leverage_model, num_state_particles=10,
                     num_param_particles=10,
                     functionals=(lambda x, z, p: jnp.full((1,), 42.0),))
    ys, zs = _data()
    state, results = jax.jit(lambda k: sw.run(k, ys, zs))(jax.random.key(1))
    lcl = np.asarray(results.log_cond_like)
    assert lcl.shape == (8,)
    assert np.all(np.isfinite(lcl))
    assert float(lcl[0]) ** 2 > 0.0
    np.testing.assert_allclose(np.asarray(results.expectations[0]), 42.0,
                               rtol=1e-4)
    # reference aggregation (arithmetic mean of logs) also reported
    assert np.all(np.isfinite(np.asarray(results.mean_log_cond_like)))


def test_swarm_from_posterior_samples(leverage_model, tmp_path):
    # analog of test_pswarm.cpp:326-348: draws from a fixed sample file
    # (test_svol_leverage_samples.csv semantics: rows of .9,0,1,-.1)
    csv = tmp_path / "samples.csv"
    csv.write_text("".join(".9,0.0,1.0,-.1\n" for _ in range(33)))
    sampler = ParamSampler(str(csv), dim_param=4)
    draws = sampler.samp(jax.random.key(2), num=16)
    sw = SwarmFilter(leverage_model, num_state_particles=10,
                     num_param_particles=10,
                     functionals=(lambda x, z, p: jnp.full((1,), 42.0),))
    ys, zs = _data(key=3)
    state, results = sw.run(jax.random.key(4), ys, zs, param_draws=draws)
    # every model got the same params
    np.testing.assert_allclose(np.asarray(state.params),
                               np.tile([0.9, 0.0, 1.0, -0.1], (10, 1)),
                               rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(results.log_cond_like)))
    np.testing.assert_allclose(np.asarray(results.expectations[0]), 42.0,
                               rtol=1e-4)


def test_swarm_stepwise_update_matches_run(leverage_model):
    sw = SwarmFilter(leverage_model, num_state_particles=8,
                     num_param_particles=6)
    ys, zs = _data(T=5, key=5)
    state, results = sw.run(jax.random.key(6), ys, zs)
    # stepwise with identical keys reproduces the scan
    state2 = sw.init(jax.random.key(6))
    lcls = []
    for t in range(5):
        state2, res = sw.update(state2, ys[t], zs[t])
        lcls.append(float(res.log_cond_like))
    np.testing.assert_allclose(np.asarray(lcls),
                               np.asarray(results.log_cond_like), rtol=1e-3)


def test_swarm_future_obs_index_order(leverage_model):
    sw = SwarmFilter(leverage_model, num_state_particles=8,
                     num_param_particles=6)
    ys, zs = _data(T=5, key=7)
    state, _ = sw.run(jax.random.key(8), ys, zs)
    obs = sw.sim_future_obs(jax.random.key(9), state, num_steps=4,
                            last_obs=ys[-1])
    # (param, time, particle, dim_obs) — pswarm_filter.h:50 ordering
    assert obs.shape == (6, 4, 8, 1)
    assert np.all(np.isfinite(np.asarray(obs)))
