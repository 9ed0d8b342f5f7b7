"""Statistical correctness: PMMH posterior concentrates around the truth.

The accuracy-gate analog of BASELINE.md at test scale: run a real chain on
simulated linear-Gaussian data and require the posterior to cover the true
parameters (the reference has no such test; SURVEY §4 gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.inference import AdaptivePMMH
from ssme_tpu.models import lgssm

TRUE = jnp.array([0.8, 0.5, 0.3])


@pytest.mark.slow
def test_pmmh_posterior_covers_truth():
    model = lgssm.make_model()
    _, ys = lgssm.simulate(jax.random.key(0), TRUE, 150)
    pmmh = AdaptivePMMH(model, num_particles=256, num_replicates=2,
                        t0=20, t1=300)
    start = model.transform.unconstrain(jnp.array([0.5, 0.8, 0.5]))
    res = jax.jit(
        lambda k: pmmh.run(k, start, 400, ys, num_chains=2)
    )(jax.random.key(1))

    samples = np.asarray(res.samples)[150:]  # burn-in
    flat = samples.reshape(-1, 3)
    mean = flat.mean(0)
    sd = flat.std(0)

    # posterior must move off the start and bracket the truth within ~3 sd
    for i, (m, s, t) in enumerate(zip(mean, sd, np.asarray(TRUE))):
        assert abs(m - t) < 3.0 * s + 0.15, (i, m, s, t)

    ar = float(res.accept_rate[-1].mean())
    assert 0.02 < ar < 0.9, ar
    # chains mix: both chains' posterior means agree loosely
    chain_means = samples.mean(axis=0)  # (2, 3)
    assert np.all(np.abs(chain_means[0] - chain_means[1])
                  < 4.0 * sd + 0.2)
