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
    # schedule knobs mirror the factory: adaptive + cross-cell stride
    out_g = svol_swarm_evidence_pallas(9, draws, ys, num_particles=256,
                                       ess_threshold=0.5, gate_stride=16)
    lcl_g = np.asarray(out_g["per_model_log_cond_likes"])
    assert np.all(np.isfinite(lcl_g.sum(-1)))
    # per-model totals agree with stride 1 within generous MC error
    tot1 = np.asarray(out["per_model_log_cond_likes"]).sum(-1)
    assert np.all(np.abs(lcl_g.sum(-1) - tot1) < 25.0)


def test_gate_stride_sis_equivalence_interpret():
    """gate_stride coarsens the LSE/ESS checks (the transcendental
    lever).  With a gate that never fires, both strides run the SAME
    pure-SIS filter, so totals must agree to renormalization rounding;
    staged lcls must be zero off the check columns and telescope to the
    total; a ragged tail (T % stride != 0) must still check at T-1."""
    import numpy as np
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(19)                  # 19 % 4 != 0: ragged tail
    kw = dict(num_particles=128, interpret=True, steps_per_cell=8,
              ess_threshold=1e-6)            # ESS >= 1 > 128e-6: no fire
    tot1, lcls1, _ = svol_filter_pallas(3, params, ys, **kw)
    tot4, lcls4, xm4 = svol_filter_pallas(3, params, ys, gate_stride=4,
                                          **kw)
    np.testing.assert_allclose(np.asarray(tot4), np.asarray(tot1),
                               rtol=2e-4, atol=2e-4)
    l4 = np.asarray(lcls4)
    np.testing.assert_allclose(l4.sum(-1), np.asarray(tot4), rtol=1e-5)
    # checks at t = 3, 7, 11, 15 and the tail t = 18; zeros elsewhere
    check_cols = [3, 7, 11, 15, 18]
    mask = np.ones(19, bool)
    mask[check_cols] = False
    assert np.all(l4[:, mask] == 0.0), l4[0]
    assert np.all(l4[:, check_cols] != 0.0)
    # block-accumulated lcls == sums of the per-step ones (same SIS run)
    l1 = np.asarray(lcls1)
    np.testing.assert_allclose(l4[:, 3], l1[:, :4].sum(-1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(l4[:, 18], l1[:, 16:].sum(-1),
                               rtol=2e-4, atol=2e-4)
    # filtered mean at a check column matches the per-step run's
    np.testing.assert_allclose(
        np.asarray(xm4)[:, 7],
        np.asarray(svol_filter_pallas(3, params, ys, **kw)[2])[:, 7],
        rtol=2e-4, atol=2e-4)


def test_gate_stride_cross_cell_interpret():
    """gate_stride LARGER than steps_per_cell (cross-cell accumulation:
    the check fires on a runtime predicate every g-th step, the carried
    scratch persisting across grid cells).  Same pure-SIS contract as
    the in-cell case: totals match stride 1, staged lcls land only on
    check columns (≡ g-1 mod g) plus the ragged tail, and telescope."""
    import numpy as np
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(35)      # spans 5 cells at spc=8; 35 % 16 != 0
    kw = dict(num_particles=128, interpret=True, steps_per_cell=8,
              ess_threshold=1e-6)            # gate never fires
    tot1, lcls1, _ = svol_filter_pallas(3, params, ys, **kw)
    tot16, lcls16, _ = svol_filter_pallas(3, params, ys, gate_stride=16,
                                          **kw)
    np.testing.assert_allclose(np.asarray(tot16), np.asarray(tot1),
                               rtol=2e-4, atol=2e-4)
    l16 = np.asarray(lcls16)
    np.testing.assert_allclose(l16.sum(-1), np.asarray(tot16), rtol=1e-5)
    check_cols = [15, 31, 34]    # every 16th step + the ragged tail
    mask = np.ones(35, bool)
    mask[check_cols] = False
    assert np.all(l16[:, mask] == 0.0), l16[0]
    assert np.all(l16[:, check_cols] != 0.0)
    l1 = np.asarray(lcls1)
    np.testing.assert_allclose(l16[:, 15], l1[:, :16].sum(-1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(l16[:, 34], l1[:, 32:].sum(-1),
                               rtol=2e-4, atol=2e-4)

    # padded-step check guard: at T=12 the PADDED step t=15 satisfies
    # t % 16 == 15 — without the t < num_steps conjunct its staging
    # write (col 15 < g) would zero the block and WIPE the ragged
    # tail's value at col 11 (+14-nat evidence corruption measured on
    # chip at T=3084; data/probe_ceiling.jsonl)
    ys12 = 0.3 * jnp.ones(12)
    tot1s, _, _ = svol_filter_pallas(3, params, ys12, **kw)
    tot16s, lcls16s, _ = svol_filter_pallas(3, params, ys12,
                                            gate_stride=16, **kw)
    np.testing.assert_allclose(np.asarray(tot16s), np.asarray(tot1s),
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(lcls16s)[:, 11] != 0.0)


def test_gate_stride_validation():
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        svol_filter_pallas(3, params, ys, num_particles=128,
                           interpret=True, ess_threshold=0.5,
                           steps_per_cell=8, gate_stride=3)
    # cross-cell strides must be multiples of steps_per_cell AND divide
    # 128 (the output-block freshness rule)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        svol_filter_pallas(3, params, ys, num_particles=128,
                           interpret=True, ess_threshold=0.5,
                           steps_per_cell=8, gate_stride=12)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        svol_filter_pallas(3, params, ys, num_particles=128,
                           interpret=True, ess_threshold=0.5,
                           steps_per_cell=8, gate_stride=256)
    with pytest.raises(ValueError, match="parity"):
        svol_filter_pallas(3, params, ys, num_particles=128,
                           interpret=True, gate_stride=4)
