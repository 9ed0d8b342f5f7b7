"""Liu-West megakernel FACTORY tests (``ops/liu_west_megakernel.py``).

Coverage model: the hand kernel (``ops/svol_leverage_lw_kernel.py``)
carries the TPU statistical validation against the XLA LiuWestFilter;
here the factory instance for the same model is checked BIT-COMPATIBLE
with the hand kernel (same hooks arithmetic, same PRNG draw order), so
those statistical guarantees transfer, plus a new model (svol_t)
exercises the factory end to end (liu_west_filter.h:149-2528 surface).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ssme_tpu.ops.liu_west_megakernel as lwm
from ssme_tpu.ops.svol_leverage_lw_kernel import svol_leverage_lw_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


def _lagged(ys):
    return jnp.concatenate([jnp.zeros((1,)), ys[:-1]])


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_factory_bit_compatible_with_hand_kernel(variant):
    """Same seed -> identical per-step conditional likelihoods AND an
    identical final joint cloud (the factory reproduces the hand
    kernel's draw order exactly)."""
    ys = 0.05 * jax.random.normal(jax.random.key(0), (20,))
    hand = svol_leverage_lw_pallas(
        13, ys, num_filters=2, num_particles=128, variant=variant,
        interpret=True)
    km = lwm.svol_leverage_lw_kernel_model()
    fac = lwm.lw_megakernel(
        km, 13, ys, zs=_lagged(ys), num_filters=2, num_particles=128,
        variant=variant, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(hand["log_cond_likes"]),
        np.asarray(fac["log_cond_likes"]))
    np.testing.assert_array_equal(
        np.asarray(hand["cloud"]), np.asarray(fac["cloud"]))


def test_factory_bit_compat_ess_schedule():
    ys = 0.05 * jax.random.normal(jax.random.key(5), (24,))
    hand = svol_leverage_lw_pallas(
        3, ys, num_filters=1, num_particles=128, ess_threshold=0.5,
        interpret=True)
    km = lwm.svol_leverage_lw_kernel_model()
    fac = lwm.lw_megakernel(
        km, 3, ys, zs=_lagged(ys), num_filters=1, num_particles=128,
        ess_threshold=0.5, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(hand["log_cond_likes"]),
        np.asarray(fac["log_cond_likes"]))
    np.testing.assert_array_equal(
        np.asarray(hand["cloud"]), np.asarray(fac["cloud"]))


def test_svol_t_instance_interpret():
    """New model through the factory: shapes, lcl/ll consistency,
    functional path, cloud decoding with the generic helpers."""
    km = lwm.svol_t_lw_kernel_model(nu=5.0)
    ys = 0.3 * jax.random.normal(jax.random.key(1), (20,))
    out = lwm.lw_megakernel(km, 7, ys, num_filters=2, num_particles=128,
                            interpret=True)
    assert out["log_cond_likes"].shape == (2, 20)
    np.testing.assert_allclose(
        np.asarray(out["log_cond_likes"]).sum(-1),
        np.asarray(out["log_likelihood"]), rtol=1e-5)
    assert np.isfinite(np.asarray(out["log_cond_likes"])).all()
    # rows: state(1) + logw(1) + theta(3), padded to 8
    assert out["cloud"].shape == (2, 8, 128)
    paths = out["functional_paths"]
    assert len(paths) == 1 and paths[0].shape == (2, 20)
    assert np.isfinite(np.asarray(paths[0])).all()

    params = np.asarray(lwm.lw_cloud_params(km, out["cloud"]))
    beta, phi, sigma = params[..., 0], params[..., 1], params[..., 2]
    assert np.all(beta > 0) and np.all(sigma > 0)
    assert np.all((phi > -1) & (phi < 1))
    w = np.asarray(lwm.lw_cloud_weights(km, out["cloud"]))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert lwm.lw_cloud_states(km, out["cloud"]).shape == (2, 1, 128)


@pytest.mark.parametrize("variant", ["apf", "sisr"])
def test_svol_t_variants_and_schedules(variant):
    km = lwm.svol_t_lw_kernel_model(nu=5.0)
    ys = 0.3 * jax.random.normal(jax.random.key(2), (16,))
    out = lwm.lw_megakernel(km, 9, ys, num_filters=1, num_particles=128,
                            variant=variant, resample_every=4,
                            interpret=True)
    assert np.isfinite(np.asarray(out["log_cond_likes"])).all()


def test_constant_functional_is_exactly_42():
    """The reference's normalization invariant (test_liu_west.cpp:191-199):
    a constant functional h = 42 must average to exactly 42 at every
    step regardless of the weights — validates the self-normalized
    functional path without controlling the RNG."""
    base = lwm.svol_t_lw_kernel_model(nu=5.0)
    km = lwm.LWKernelModel(
        num_params=base.num_params,
        transform_codes=base.transform_codes,
        sample_prior=base.sample_prior, init=base.init,
        propagate=base.propagate, log_weight=base.log_weight,
        prop_mu=base.prop_mu,
        functionals=(lambda cp, st: jnp.full_like(st[0], 42.0),),
        name="svol_t_lw_const42")
    ys = 0.3 * jax.random.normal(jax.random.key(4), (20,))
    out = lwm.lw_megakernel(km, 17, ys, num_filters=2, num_particles=128,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(out["functional_paths"][0]), 42.0, rtol=1e-5)


def test_validation_errors():
    km = lwm.svol_t_lw_kernel_model(nu=5.0)
    ys = jnp.ones(8)
    with pytest.raises(ValueError, match="multiple of 128"):
        lwm.lw_megakernel(km, 0, ys, num_particles=100, interpret=True)
    with pytest.raises(ValueError, match="dim_cov=0"):
        lwm.lw_megakernel(km, 0, ys, zs=jnp.ones((8, 1)),
                          num_particles=128, interpret=True)
    km_lev = lwm.svol_leverage_lw_kernel_model()
    with pytest.raises(ValueError, match="needs covariates"):
        lwm.lw_megakernel(km_lev, 0, ys, num_particles=128,
                          interpret=True)
    no_look = lwm.LWKernelModel(
        num_params=1, transform_codes=("null",),
        sample_prior=lambda rng, n: rng.uniform((1, n)),
        init=lambda rng, cp, y, n: (rng.normal((1, n)),),
        propagate=lambda rng, cp, st, y, z: st,
        log_weight=lambda cp, st, y, z: jnp.zeros_like(st[0]))
    with pytest.raises(ValueError, match="prop_mu"):
        lwm.lw_megakernel(no_look, 0, ys, num_particles=128,
                          interpret=True)
    with pytest.raises(ValueError, match="transform_codes"):
        lwm.LWKernelModel(
            num_params=2, transform_codes=("null",),
            sample_prior=None, init=None, propagate=None,
            log_weight=None)


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_svol_t_lw_posterior_recovery_tpu():
    """Joint online estimation on simulated svol_t data: the weighted
    posterior means must move toward the truth (weak, reference-style
    statistical assertions; cf. test_liu_west.cpp:172-199)."""
    from ssme_tpu.models import svol_t

    true_params = jnp.array([1.0, 0.9, 0.09, 5.0])   # beta, phi, ss, nu
    _, ys = svol_t.simulate(jax.random.key(3), true_params, 400)
    km = lwm.svol_t_lw_kernel_model(nu=5.0)
    out = lwm.lw_megakernel(km, 21, ys.reshape(-1), num_filters=8,
                            num_particles=512, delta=0.99)
    assert np.isfinite(np.asarray(out["log_likelihood"])).all()
    params = np.asarray(lwm.lw_cloud_params(km, out["cloud"]))
    w = np.asarray(lwm.lw_cloud_weights(km, out["cloud"]))
    post_mean = (params * w[..., None]).sum(axis=1).mean(axis=0)
    beta_hat, phi_hat, sigma_hat = post_mean
    # falsifiable vs the prior: the uniform-box prior means are
    # (1.25, 0.795, 0.525); a filter that learns nothing sits there.
    # beta and sigma must have moved toward the truth (1.0, 0.3)
    # strictly past the prior mean; phi is weakly identified at this T
    # (t-tails mask the AR signal), so it only gets a sanity range.
    assert 0.8 < beta_hat < 1.2, post_mean
    assert 0.1 < sigma_hat < 0.45, post_mean
    assert 0.6 < phi_hat < 0.99, post_mean


def test_lw_kernel_sim_future_obs_bridge():
    """The future-simulation bridge (liu_west_filter.h:693-738 surface)
    decodes the kernel's final cloud and continues on the XLA path:
    shapes, finiteness, and covariate feedback (last_obs required)."""
    from ssme_tpu.models import svol_leverage
    from ssme_tpu.ops.liu_west_megakernel import lw_kernel_sim_future_obs

    km = lwm.svol_leverage_lw_kernel_model()
    ys = 0.05 * jax.random.normal(jax.random.key(0), (16,))
    zs = jnp.concatenate([jnp.zeros((1,)), ys[:-1]])
    out = lwm.lw_megakernel(km, 3, ys, zs=zs, num_filters=2,
                            num_particles=128, interpret=True)
    fut = lw_kernel_sim_future_obs(
        km, svol_leverage.make_model(), out["cloud"], jax.random.key(1),
        num_steps=4, last_obs=jnp.asarray([float(ys[-1])]))
    assert fut.shape == (2, 4, 128, 1)
    assert np.isfinite(np.asarray(fut)).all()
    # covariate model without last_obs must refuse (the enforced
    # lagged-observation convention, liu_west_filter.h:1255,2419)
    with pytest.raises(ValueError, match="last_obs"):
        lw_kernel_sim_future_obs(km, svol_leverage.make_model(),
                                 out["cloud"], jax.random.key(1),
                                 num_steps=2)
