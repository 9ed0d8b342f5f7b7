"""Executable checks of the README.md quick-start snippets.

Every API call shown in the README must actually run as written
(tiny sizes, CPU) — the docs-rot guard, same idea as
``test_migration_doc.py`` for the migration guide."""

import jax
import jax.numpy as jnp
import numpy as np


def _spy_head(t=12):
    from ssme_tpu.io import read_data
    ys = jnp.asarray(read_data("data/spy_returns.csv", num_cols=1))
    return ys[:t]


def test_quick_start_pmmh_snippet():
    from ssme_tpu.models import svol
    from ssme_tpu.inference import AdaptivePMMH

    ys = _spy_head()
    model = svol.make_model()
    pmmh = AdaptivePMMH(model, num_particles=32, num_replicates=2,
                        t0=2, t1=4)
    res = pmmh.run(jax.random.key(0),
                   jnp.asarray(svol.START_TRANS_THETA),
                   num_iters=3, ys=ys, num_chains=2)
    assert res.samples.shape == (3, 2, 3)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_quick_start_liu_west_snippet():
    from ssme_tpu.filters import LiuWestFilter
    from ssme_tpu.models import svol_leverage

    ys = _spy_head()
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])  # lagged obs
    model = svol_leverage.make_model()
    lw = LiuWestFilter(model, num_particles=64, delta=0.99, variant="apf")
    res = lw.run(jax.random.key(0), ys, zs)
    future = lw.sim_future_obs(jax.random.key(1), res.last_particles,
                               res.last_trans_params, num_steps=3,
                               last_obs=ys[-1])
    assert future.shape[0] == 3
    assert np.isfinite(np.asarray(future)).all()


def test_quick_start_swarm_snippet():
    from ssme_tpu.inference import SwarmFilter
    from ssme_tpu.models import svol_leverage

    ys = _spy_head()
    zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])
    model = svol_leverage.make_model()
    # param_draws are constrained values (the model-hook convention)
    posterior_samples = jnp.tile(jnp.array([0.9, 0.0, 1.0, -0.1]), (5, 1))
    sw = SwarmFilter(model, num_state_particles=32, num_param_particles=4)
    state, out = sw.run(jax.random.key(0), ys, zs,
                        param_draws=posterior_samples)
    assert np.isfinite(np.asarray(out.log_cond_like)).all()


def test_quick_start_multichip_snippet():
    from ssme_tpu.models import svol
    from ssme_tpu.inference import AdaptivePMMH
    from ssme_tpu import parallel

    ys = _spy_head()
    model = svol.make_model()
    pmmh = AdaptivePMMH(model, num_particles=32, num_replicates=2,
                        t0=2, t1=4)
    mesh = parallel.make_mesh()            # all (virtual) chips, chain axis
    state = pmmh.init(jax.random.key(0),
                      jnp.asarray(svol.START_TRANS_THETA), ys,
                      num_chains=2 * mesh.devices.size)
    state = parallel.shard_chain_state(state, mesh)
    run = parallel.jit_sharded_pmmh(pmmh, mesh, num_iters=2)
    res = run(state, ys)
    assert np.isfinite(np.asarray(res.samples)).all()
