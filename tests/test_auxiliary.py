"""Auxiliary PF tests: Kalman cross-check + variance advantage claim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.filters import AuxiliaryParticleFilter, BootstrapFilter
from ssme_tpu.models import lgssm

PARAMS = jnp.array([0.9, 0.3, 0.6])  # smooth state, noisy obs: APF territory


@pytest.fixture(scope="module")
def data():
    _, ys = lgssm.simulate(jax.random.key(0), PARAMS, 80)
    lls, _, _ = lgssm.kalman_filter(PARAMS, ys)
    return ys, float(jnp.sum(lls))


def test_apf_loglike_matches_kalman(data):
    ys, exact = data
    apf = AuxiliaryParticleFilter(lgssm.make_model(), num_particles=4096)
    got = float(jax.jit(apf.run)(jax.random.key(1), PARAMS, ys).log_likelihood)
    assert abs(got - exact) < 1.5, (got, exact)


def test_apf_constant_functional(data):
    ys, _ = data
    apf = AuxiliaryParticleFilter(
        lgssm.make_model(), num_particles=128,
        functionals=(lambda x, p: jnp.full((1,), 42.0),))
    res = apf.run(jax.random.key(2), PARAMS, ys)
    np.testing.assert_allclose(np.asarray(res.expectations[0]), 42.0,
                               rtol=1e-4)


def test_apf_not_worse_than_bpf(data):
    # same particle budget: APF estimator variance should be comparable or
    # lower on this well-behaved model
    ys, exact = data
    model = lgssm.make_model()
    n_rep = 12
    apf = AuxiliaryParticleFilter(model, num_particles=256)
    bpf = BootstrapFilter(model, num_particles=256)
    keys = jax.random.split(jax.random.key(3), n_rep)
    apf_vals = np.asarray(jax.jit(jax.vmap(
        lambda k: apf.run(k, PARAMS, ys).log_likelihood))(keys))
    bpf_vals = np.asarray(jax.jit(jax.vmap(
        lambda k: bpf.run(k, PARAMS, ys).log_likelihood))(keys))
    assert np.isfinite(apf_vals).all() and np.isfinite(bpf_vals).all()
    assert abs(apf_vals.mean() - exact) < 2.0
    assert apf_vals.std() < 4.0 * max(bpf_vals.std(), 0.05)
