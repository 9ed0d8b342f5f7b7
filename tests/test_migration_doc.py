"""Executable checks of the docs/migration.md code snippets.

Every API call shown in the migration guide must actually run; this test
pins the documented surface (small sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_transform_snippet():
    from ssme_tpu.transforms import ParamPack, ParamTransform

    tf = ParamTransform(("null", "twice_fisher", "log"))
    trans = tf.unconstrain(jnp.array([1.0, 0.5, 2e-4]))
    cons = tf.constrain(trans)
    ldj = tf.log_det_jacobian(trans)
    np.testing.assert_allclose(np.asarray(cons),
                               [1.0, 0.5, 2e-4], rtol=1e-5)
    assert np.isfinite(float(ldj))

    pack = ParamPack(jnp.array([1.0, 0.5, 2e-4]), tf)
    assert pack.get_trans_params().shape == (3,)
    assert np.isfinite(float(pack.get_log_jacobian()))

    pp = ParamPack.empty(3)
    pp.add_param_and_transform(1.0, "null")
    pp.add_param_and_transform(0.5, "twice_fisher", is_transformed=False)
    pp.add_param_and_transform(2e-4, "log", is_transformed=False)
    np.testing.assert_allclose(np.asarray(pp.get_untrans_params()),
                               [1.0, 0.5, 2e-4], rtol=1e-4)


def test_io_snippet(tmp_path):
    from ssme_tpu.io import ParamSampler, read_data

    p = tmp_path / "post.csv"
    p.write_text("0.9,0.0,1.0,-0.1\n0.8,0.1,0.9,-0.2\n")
    sampler = ParamSampler(str(p), dim_param=4)
    draw = sampler.samp(jax.random.key(0))
    assert draw.shape == (4,)
    draws = sampler.samp(jax.random.key(0), num=8)
    assert draws.shape == (8, 4)

    d = tmp_path / "data.csv"
    d.write_text("0.1\n-0.2\n0.3\n")
    ys = read_data(str(d), num_cols=1)
    assert np.asarray(ys).shape == (3, 1)


def test_bootstrap_snippet():
    from ssme_tpu.filters import BootstrapFilter
    from ssme_tpu.models import svol

    ys = 0.5 * jax.random.normal(jax.random.key(1), (12, 1))
    bf = BootstrapFilter(svol.make_model(), num_particles=64)
    res = bf.run(jax.random.key(0), jnp.array([1.0, 0.5, 0.04]), ys)
    assert np.isfinite(float(res.log_likelihood))
    assert res.log_cond_likes.shape == (12,)
    assert res.ess.shape == (12,)


def test_liu_west_snippet():
    from ssme_tpu.filters import LiuWestFilter
    from ssme_tpu.models import svol_leverage

    model = svol_leverage.make_model()
    ys = 0.1 * jax.random.normal(jax.random.key(1), (10, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    lw = LiuWestFilter(model, num_particles=64, delta=0.99, variant="apf")
    res = lw.run(jax.random.key(0), ys, zs)
    assert lw.param_samples(res).shape == (64, 4)
    future = lw.sim_future_obs(jax.random.key(2), res.last_particles,
                               res.last_trans_params, num_steps=3,
                               last_obs=ys[-1])
    assert future.shape[0] == 3


def test_swarm_snippet(tmp_path):
    from ssme_tpu.inference import SwarmFilter
    from ssme_tpu.io import ParamSampler
    from ssme_tpu.models import svol_leverage

    p = tmp_path / "post.csv"
    p.write_text("0.9,0.0,0.05,-0.1\n" * 5)
    sampler = ParamSampler(str(p), dim_param=4)

    model = svol_leverage.make_model()
    ys = 0.1 * jax.random.normal(jax.random.key(1), (8, 1))
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    sw = SwarmFilter(model, num_state_particles=32, num_param_particles=4)
    state, out = sw.run(jax.random.key(0), ys, zs,
                        param_draws=sampler.samp(jax.random.key(2), num=4))
    assert out.log_cond_like.shape == (8,)
    assert np.all(np.isfinite(np.asarray(out.log_cond_like)))
    future = sw.sim_future_obs(jax.random.key(3), state, 3, last_obs=ys[-1])
    assert future.shape[:2] == (4, 3)


def test_pmmh_snippet():
    from ssme_tpu.inference import AdaptivePMMH
    from ssme_tpu.models import svol

    ys = 0.5 * jax.random.normal(jax.random.key(1), (10, 1))
    pmmh = AdaptivePMMH(svol.make_model(), num_particles=32,
                        num_replicates=2, t0=2, t1=50)
    res = pmmh.run(jax.random.key(0), jnp.asarray(svol.START_TRANS_THETA),
                   5, ys, num_chains=2)
    assert res.samples.shape == (5, 2, 3)


def test_diagnostics_snippet():
    from ssme_tpu.diagnostics import summarize

    draws = np.random.default_rng(0).normal(size=(200, 4, 3))
    out = summarize(draws, names=["beta", "phi", "sigma_sq"])
    assert set(out) == {"beta", "phi", "sigma_sq"}
