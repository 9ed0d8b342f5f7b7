"""Megakernel (full-filter Pallas) tests.

Statistical validation requires the real TPU (interpret-mode PRNG is a
stub); on CPU we check the wiring/validation errors.  The TPU-marked
tests replicate /tmp-scale what bench.py exercises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.ops.svol_filter_kernel import (
    svol_filter_pallas,
    svol_pallas_batched_log_like,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def test_shape_validation():
    with pytest.raises(ValueError):
        svol_filter_pallas(0, jnp.ones((6, 3)), jnp.ones(16),
                           num_particles=512, interpret=True)
    with pytest.raises(ValueError):
        svol_filter_pallas(0, jnp.ones((8, 3)), jnp.ones(16),
                           num_particles=100, interpret=True)


def test_interpret_runs_finite():
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    total, lcls, xmeans = svol_filter_pallas(3, params, ys,
                                             num_particles=128,
                                             interpret=True)
    assert total.shape == (8,)
    assert lcls.shape == (8, 16)
    assert xmeans.shape == (8, 16)
    assert np.all(np.isfinite(np.asarray(total)))
    np.testing.assert_allclose(np.asarray(lcls.sum(-1)),
                               np.asarray(total), rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_megakernel_matches_xla_filter_statistically():
    from ssme_tpu.filters import log_likelihood_fn
    from ssme_tpu.models import svol

    T, B = 200, 32
    ys = 0.5 * jax.random.normal(jax.random.key(1), (T,))
    p_ref = jnp.array([1.0, 0.5, 0.02])
    batch = jnp.broadcast_to(jnp.array([1.0, 0.5, float(np.sqrt(0.02))]),
                             (B, 3))
    vals, _, _ = svol_filter_pallas(7, batch, ys, num_particles=512)
    ll = log_likelihood_fn(svol.make_model(), num_particles=512)
    ref = jax.vmap(lambda k: ll(k, p_ref, ys[:, None]))(
        jax.random.split(jax.random.key(2), B))
    # same estimator: means within joint MC error
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(vals.mean()) - float(ref.mean())) < se


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_batched_log_like_hook():
    ll = svol_pallas_batched_log_like(num_particles=512, num_replicates=4)
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.02]]), (3, 1))
    ys = 0.5 * jax.random.normal(jax.random.key(3), (64,))
    out = ll(jax.random.key(4), params, ys)
    assert out.shape == (3,)
    assert np.all(np.isfinite(np.asarray(out)))
    # identical params rows -> near-identical replicate-averaged values
    assert float(jnp.std(out)) < 2.0


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_swarm_evidence_pallas():
    from ssme_tpu.ops.svol_filter_kernel import svol_swarm_evidence_pallas
    draws = jnp.tile(jnp.array([[1.0, 0.5, 0.02]]), (12, 1))
    ys = 0.5 * jax.random.normal(jax.random.key(5), (96,))
    out = svol_swarm_evidence_pallas(9, draws, ys, num_particles=256)
    assert out["log_cond_like"].shape == (96,)
    assert out["per_model_log_cond_likes"].shape == (12, 96)
    assert np.all(np.isfinite(np.asarray(out["log_cond_like"])))
