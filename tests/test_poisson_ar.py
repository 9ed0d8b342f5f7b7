"""Poisson AR(1) count model: non-Gaussian observation family through
every algorithm (the reference is Gaussian-only; the hook interface is
density-agnostic and this pins that)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu import rv
from ssme_tpu.filters import (AuxiliaryParticleFilter, BootstrapFilter,
                              LiuWestFilter)
from ssme_tpu.inference import AdaptivePMMH, SwarmFilter
from ssme_tpu.models import poisson_ar

PARAMS = jnp.array([0.9, 1.0, 0.3])


@pytest.fixture(scope="module")
def sim():
    xs, ys = poisson_ar.simulate(jax.random.key(0), PARAMS, 60)
    return xs, ys


def test_log_g_matches_scipy():
    import scipy.stats as st
    for k, lograte in [(0, 0.0), (3, 0.9), (10, 2.0)]:
        ours = float(poisson_ar.log_g(PARAMS, jnp.array([float(k)]),
                                      jnp.array([lograte]), None))
        ref = st.poisson.logpmf(k, np.exp(lograte))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_simulate_counts(sim):
    _, ys = sim
    y = np.asarray(ys)
    assert np.all(y >= 0)
    assert np.allclose(y, np.round(y))       # integer counts


def test_bootstrap_and_apf_loglik_agree(sim):
    _, ys = sim
    bf = BootstrapFilter(poisson_ar.make_model(), num_particles=512)
    apf = AuxiliaryParticleFilter(poisson_ar.make_model(),
                                  num_particles=512)
    ll_b = jax.vmap(lambda k: bf.run(k, PARAMS, ys).log_likelihood)(
        jax.random.split(jax.random.key(1), 16))
    ll_a = jax.vmap(lambda k: apf.run(k, PARAMS, ys).log_likelihood)(
        jax.random.split(jax.random.key(2), 16))
    se = (float(ll_b.std()) + float(ll_a.std())) / np.sqrt(16) * 4 + 0.5
    assert abs(float(ll_b.mean()) - float(ll_a.mean())) < se


def test_liu_west_runs(sim):
    _, ys = sim
    lw = LiuWestFilter(poisson_ar.make_model(), num_particles=256,
                       delta=0.99, variant="sisr")
    res = lw.run(jax.random.key(3), ys)
    assert np.isfinite(float(res.log_likelihood))
    p = np.asarray(lw.param_samples(res))
    assert p.shape == (256, 3)
    assert np.all(np.abs(p[:, 0]) < 1.0)      # phi constrained to (-1,1)
    assert np.all(p[:, 2] > 0)                # sigma positive


def test_pmmh_posterior_covers_truth(sim):
    _, ys = sim
    model = poisson_ar.make_model()
    pmmh = AdaptivePMMH(model, num_particles=128, num_replicates=2,
                        t0=10, t1=200)
    start = model.transform.unconstrain(jnp.array([0.5, 0.5, 0.5]))
    res = pmmh.run(jax.random.key(4), start, 150, ys, num_chains=2)
    draws = np.asarray(res.samples)[50:].reshape(-1, 3)
    # crude coverage: truth within (min, max) of the sampled range
    for i, true in enumerate(np.asarray(PARAMS)):
        lo, hi = draws[:, i].min(), draws[:, i].max()
        assert lo - 0.5 <= true <= hi + 0.5, (i, lo, hi, true)


def test_swarm_runs(sim):
    _, ys = sim
    model = poisson_ar.make_model()
    sw = SwarmFilter(model, num_state_particles=64, num_param_particles=4)
    draws = jnp.tile(PARAMS, (4, 1))
    state, out = sw.run(jax.random.key(5), ys, param_draws=draws)
    assert np.all(np.isfinite(np.asarray(out.log_cond_like)))
