"""Pallas kernel tests (interpret mode on CPU; compiled path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu import rv
from ssme_tpu.ops import fused_svol_propagate_weight


B, N = 8, 256
PARAMS = np.tile(np.array([[1.3, 0.7, 0.2]], dtype=np.float32), (B, 1))


def _run(seed, y, x, lw):
    return fused_svol_propagate_weight(seed, y, jnp.asarray(PARAMS),
                                       jnp.asarray(x), jnp.asarray(lw),
                                       interpret=True)


def test_fused_step_weight_math_matches_reference_density():
    # with sigma-noise folded out we can check log_g exactly:
    # params (beta, phi, sigma=0) => x' = phi x deterministic
    params = PARAMS.copy()
    params[:, 2] = 0.0
    x = np.linspace(-1, 1, B * N).reshape(B, N).astype(np.float32)
    lw = np.zeros((B, N), np.float32)
    y = 0.37
    x_new, lw_new = fused_svol_propagate_weight(
        7, y, jnp.asarray(params), jnp.asarray(x), jnp.asarray(lw),
        interpret=True)
    np.testing.assert_allclose(np.asarray(x_new), 0.7 * x, rtol=1e-5,
                               atol=1e-6)
    want = rv.norm_logpdf(y, 0.0, 1.3 * np.exp(0.5 * 0.7 * x))
    np.testing.assert_allclose(np.asarray(lw_new), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="interpret-mode PRNG is a stub (constant bits); "
                           "noise statistics only meaningful on real TPU")
def test_fused_step_noise_moments():
    x = np.zeros((B, N), np.float32)
    lw = np.zeros((B, N), np.float32)
    xs = []
    for seed in range(8):
        x_new, _ = _run(seed, 0.0, x, lw)
        xs.append(np.asarray(x_new))
    samples = np.stack(xs).ravel()  # x' = 0.2 * eps
    assert abs(samples.mean()) < 0.01
    np.testing.assert_allclose(samples.std(), 0.2, rtol=0.05)
    # distinct seeds give distinct streams
    assert not np.allclose(xs[0], xs[1])


def test_fused_step_rejects_unaligned_shapes():
    with pytest.raises(ValueError):
        fused_svol_propagate_weight(0, 0.0, jnp.zeros((4, 3)),
                                    jnp.zeros((4, 100)), jnp.zeros((4, 100)),
                                    interpret=True)

