"""Liu-West megakernel tests (CPU interpret wiring + TPU statistical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.ops.svol_leverage_lw_kernel import (
    lw_cloud_params,
    svol_leverage_lw_pallas,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def test_interpret_shapes_and_consistency():
    ys = 0.05 * jax.random.normal(jax.random.key(0), (20,))
    out = svol_leverage_lw_pallas(3, ys, num_filters=2, num_particles=128,
                                  interpret=True)
    assert out["log_cond_likes"].shape == (2, 20)
    assert out["log_likelihood"].shape == (2,)
    assert out["cloud"].shape == (2, 8, 128)
    np.testing.assert_allclose(
        np.asarray(out["log_cond_likes"].sum(-1)),
        np.asarray(out["log_likelihood"]), rtol=1e-5)
    params = lw_cloud_params(out["cloud"])
    assert params.shape == (2, 128, 4)


def test_particle_count_validation():
    with pytest.raises(ValueError):
        svol_leverage_lw_pallas(0, jnp.ones(8), num_particles=100,
                                interpret=True)


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_lw_kernel_matches_xla_statistically():
    from ssme_tpu.filters import LiuWestFilter
    from ssme_tpu.models import svol_leverage

    model = svol_leverage.make_model()
    ys = 0.05 * jax.random.normal(jax.random.key(1), (200,))
    out = svol_leverage_lw_pallas(7, ys, num_filters=8, num_particles=512)
    vals = np.asarray(out["log_likelihood"])

    lw = LiuWestFilter(model, num_particles=512, delta=0.99, variant="apf")
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1, None]])
    ref = float(lw.run(jax.random.key(2), ys[:, None], zs).log_likelihood)
    assert abs(vals.mean() - ref) < 8.0, (vals.mean(), ref)

    params = np.asarray(lw_cloud_params(out["cloud"])).reshape(-1, 4)
    phi, mu, sigma, rho = params.T
    assert np.all((phi > 0) & (phi < 1))
    assert np.all(sigma > 0)
    assert np.all((rho > -1) & (rho < 1))


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_interpret_variants(variant):
    ys = 0.05 * jax.random.normal(jax.random.key(2), (16,))
    out = svol_leverage_lw_pallas(5, ys, num_filters=1, num_particles=128,
                                  variant=variant, interpret=True)
    assert np.isfinite(np.asarray(out["log_cond_likes"])).all()


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_lw_kernel_sisr_matches_xla():
    from ssme_tpu.filters import LiuWestFilter
    from ssme_tpu.models import svol_leverage

    model = svol_leverage.make_model()
    ys = 0.05 * jax.random.normal(jax.random.key(3), (200,))
    out = svol_leverage_lw_pallas(11, ys, num_filters=8, num_particles=512,
                                  variant="sisr")
    vals = np.asarray(out["log_likelihood"])
    lw = LiuWestFilter(model, num_particles=512, delta=0.99, variant="sisr")
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1, None]])
    ref = float(lw.run(jax.random.key(4), ys[:, None], zs).log_likelihood)
    assert abs(vals.mean() - ref) < 8.0, (vals.mean(), ref)
