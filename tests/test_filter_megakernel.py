"""Generic megakernel factory tests (CPU interpret wiring + TPU
statistical).  Mirrors tests/test_svol_megakernel.py: interpret-mode
PRNG is a stub, so CPU checks wiring/validation; statistical agreement
with the XLA filters runs on the real TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.ops.filter_megakernel import (
    KernelModel,
    filter_megakernel,
    megakernel_log_like,
    megakernel_swarm_evidence,
    svol_kernel_model,
    svol_leverage_kernel_model,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def test_shape_validation():
    km = svol_kernel_model()
    with pytest.raises(ValueError):
        filter_megakernel(km, 0, jnp.ones((6, 3)), jnp.ones(16),
                          num_particles=512, interpret=True)
    with pytest.raises(ValueError):
        filter_megakernel(km, 0, jnp.ones((8, 3)), jnp.ones(16),
                          num_particles=100, interpret=True)
    with pytest.raises(ValueError):
        filter_megakernel(km, 0, jnp.ones((8, 4)), jnp.ones(16),
                          num_particles=128, interpret=True)
    # covariate model requires zs
    with pytest.raises(ValueError):
        filter_megakernel(svol_leverage_kernel_model(), 0,
                          jnp.ones((8, 4)), jnp.ones(16),
                          num_particles=128, interpret=True)
    # and the converse: zs supplied to a model built without dim_cov is
    # a wiring mistake, not something to silently zero out
    with pytest.raises(ValueError, match="dim_cov=0"):
        filter_megakernel(km, 0, jnp.ones((8, 3)), jnp.ones(16),
                          zs=jnp.ones(16), num_particles=128,
                          interpret=True)


def test_tile_seeds_threefry_derivation():
    """Per-tile kernel seeds are threefry-derived (VERDICT r1 #8): two
    words per tile (VERDICT r2 #6), all distinct, seed-sensitive, and
    not an affine function of the tile index (the old
    ``seed + b * 1000003`` fold was)."""
    from ssme_tpu.ops._prng import tile_seeds

    s = np.asarray(tile_seeds(42, 64)).astype(np.int64)
    assert s.shape == (128,)              # TWO seed words per tile
    assert len(np.unique(s)) == 128
    assert not np.array_equal(s, np.asarray(tile_seeds(43, 64)))
    diffs = np.diff(s)
    assert len(np.unique(diffs)) > 1  # not affine in the index


def test_tile_seeds_accepts_key_and_iteration_streams_distinct():
    """A jax.random key passes straight through, and the (word0, word1)
    pairs of >= 1e4 distinct iteration keys never collide — the 64-bit
    stream separation of VERDICT r2 #6 (a single 31-bit word had ~2%
    birthday collision probability at this scale)."""
    import jax

    from ssme_tpu.ops._prng import tile_seeds

    keys = jax.random.split(jax.random.key(0), 10_000)
    words = jax.vmap(lambda k: tile_seeds(k, 1))(keys)   # (1e4, 2)
    w = np.asarray(words).astype(np.int64)
    packed = (w[:, 0] << 32) ^ (w[:, 1] & 0xFFFFFFFF)
    assert len(np.unique(packed)) == len(packed)
    # int seeds still work and differ from each other
    assert not np.array_equal(np.asarray(tile_seeds(1, 4)),
                              np.asarray(tile_seeds(2, 4)))


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_cross_row_stream_independence():
    """PMMH's replicate averaging assumes independent likelihood streams
    across batched kernel rows (thread_pool.h:259-273 semantics).  With
    IDENTICAL parameters in every row, per-row log-likelihood estimates
    over repeated seeds must be uncorrelated across rows (VERDICT r1 #8:
    correlation of likelihood estimates across rows ~ 0)."""
    km = svol_kernel_model()
    t_len, b, s_reps = 64, 16, 32
    ys = 0.5 * jax.random.normal(jax.random.key(1), (t_len,))
    rows = jnp.broadcast_to(jnp.array([1.0, 0.9, 0.2]), (b, 3))
    run = jax.jit(lambda s: filter_megakernel(
        km, s, rows, ys, num_particles=256)[0])
    m = np.stack([np.asarray(run(s)) for s in range(s_reps)])  # (S, B)
    # within one launch every row draws a distinct stream
    assert len(np.unique(m[0])) == b
    c = np.corrcoef(m.T)                                       # (B, B)
    off = c[~np.eye(b, dtype=bool)]
    # Fisher-z SE = 1/sqrt(S-3) ~ .19; max |corr| over 240 pairs stays
    # well under .8 for independent streams
    assert np.max(np.abs(off)) < 0.8
    assert abs(np.mean(off)) < 0.25


def test_builtin_kernel_models_are_memoized():
    # KernelModel is register_static with eq=False (identity caching in
    # jit) — repeated factory calls must return the SAME object or every
    # call site recompiles.
    assert svol_kernel_model() is svol_kernel_model()
    assert svol_leverage_kernel_model() is svol_leverage_kernel_model()
    from ssme_tpu.ops.filter_megakernel import (
        factor_svol_kernel_model, poisson_ar_kernel_model,
        svol_t_kernel_model)
    assert factor_svol_kernel_model(5) is factor_svol_kernel_model(5)
    assert poisson_ar_kernel_model() is poisson_ar_kernel_model()
    assert svol_t_kernel_model() is svol_t_kernel_model()


def test_interpret_runs_finite_svol():
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    total, lcls, fmeans = filter_megakernel(km, 3, params, ys,
                                            num_particles=128,
                                            interpret=True)
    assert total.shape == (8,)
    assert lcls.shape == (8, 16)
    assert fmeans.shape == (8, 16)
    assert np.all(np.isfinite(np.asarray(total)))
    np.testing.assert_allclose(np.asarray(lcls.sum(-1)),
                               np.asarray(total), rtol=1e-5)


def test_interpret_runs_finite_leverage():
    km = svol_leverage_kernel_model()
    params = jnp.tile(jnp.array([[0.9, 0.0, 0.1, -0.3]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    zs = jnp.concatenate([jnp.zeros((1,)), ys[:-1]])
    total, lcls, _ = filter_megakernel(km, 3, params, ys, zs,
                                       num_particles=128, interpret=True)
    assert np.all(np.isfinite(np.asarray(total)))


def test_multi_leaf_state_interpret():
    """A 2-leaf (bivariate) state exercises the joint multi-leaf
    resampling path: two independent AR(1) components observed in sum."""

    def init(rng, p, y, z, shape):
        return (rng.normal(shape), rng.normal(shape))

    def propagate(rng, p, state, y, z):
        a = p[:, 0:1]
        x1, x2 = state
        return (a * x1 + rng.normal(x1.shape),
                a * x2 + rng.normal(x2.shape))

    def log_weight(p, state, y, z):
        x1, x2 = state
        resid = y[0] - (x1 + x2)
        return -0.5 * resid * resid

    km = KernelModel(num_params=1, init=init, propagate=propagate,
                     log_weight=log_weight, num_state=2, name="biv")
    params = jnp.full((8, 1), 0.7)
    total, lcls, _ = filter_megakernel(km, 5, params, jnp.ones(10),
                                       num_particles=128, interpret=True)
    assert total.shape == (8,)
    assert np.all(np.isfinite(np.asarray(total)))


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_factory_matches_specialized_svol_kernel():
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    T, B = 200, 32
    ys = 0.5 * jax.random.normal(jax.random.key(1), (T,))
    batch = jnp.broadcast_to(jnp.array([1.0, 0.5, float(np.sqrt(0.02))]),
                             (B, 3))
    tot_f, _, _ = filter_megakernel(svol_kernel_model(), 7, batch, ys,
                                    num_particles=512)
    tot_s, _, _ = svol_filter_pallas(9, batch, ys, num_particles=512)
    se = float(tot_s.std()) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot_f.mean()) - float(tot_s.mean())) < se


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_leverage_kernel_matches_xla_statistically():
    from ssme_tpu.filters import log_likelihood_fn
    from ssme_tpu.models import svol_leverage

    T, B = 200, 32
    ys = 0.1 * jax.random.normal(jax.random.key(1), (T,))
    zs = jnp.concatenate([jnp.zeros((1,)), ys[:-1]])
    p = jnp.array([0.9, 0.0, 0.15, -0.3])
    batch = jnp.broadcast_to(p, (B, 4))
    tot, _, _ = filter_megakernel(svol_leverage_kernel_model(), 11,
                                  batch, ys, zs, num_particles=512)
    ll = log_likelihood_fn(svol_leverage.make_model(), num_particles=512)
    ref = jax.vmap(lambda k: ll(k, p, ys[:, None], zs[:, None]))(
        jax.random.split(jax.random.key(2), B))
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot.mean()) - float(ref.mean())) < se


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_megakernel_log_like_and_swarm_adapters():
    ys = 0.1 * jax.random.normal(jax.random.key(1), (64,))
    zs = jnp.concatenate([jnp.zeros((1,)), ys[:-1]])
    km = svol_leverage_kernel_model()
    ll = megakernel_log_like(km, num_particles=256, num_replicates=4)
    params = jnp.tile(jnp.array([[0.9, 0.0, 0.15, -0.3]]), (3, 1))
    out = ll(jax.random.key(0), params, ys, zs)
    assert out.shape == (3,)
    assert np.all(np.isfinite(np.asarray(out)))

    draws = jnp.tile(jnp.array([[0.9, 0.0, 0.15, -0.3]]), (12, 1))
    ev = megakernel_swarm_evidence(km, 3, draws, ys, zs,
                                   num_particles=256)
    assert ev["log_cond_like"].shape == (64,)
    assert ev["per_model_log_cond_likes"].shape == (12, 64)
    assert np.all(np.isfinite(np.asarray(ev["log_cond_like"])))


def test_factor_svol_kernel_log_weight_matches_model():
    """The kernel's 2x2 explicit Woodbury must equal the model's
    general log_g exactly (hooks are pure jnp functions — testable
    outside pallas)."""
    from ssme_tpu.models import factor_svol
    from ssme_tpu.ops.filter_megakernel import factor_svol_kernel_model

    na = 4
    model = factor_svol.make_model(na, 2)
    km = factor_svol_kernel_model(na)
    params = model.sample_prior(jax.random.key(0))
    assert params.shape == (km.num_params,)

    n = 16
    x1 = jax.random.normal(jax.random.key(1), (8, n))
    x2 = jax.random.normal(jax.random.key(2), (8, n))
    y = jax.random.normal(jax.random.key(3), (na,))
    p_rows = jnp.broadcast_to(params, (8, km.num_params))

    lw_kernel = km.log_weight(p_rows, (x1, x2), tuple(y), ())

    def ref_one(x1s, x2s):
        return model.log_g(params, y, jnp.stack([x1s, x2s]), None)

    lw_ref = jax.vmap(jax.vmap(ref_one))(x1, x2)
    np.testing.assert_allclose(np.asarray(lw_kernel), np.asarray(lw_ref),
                               rtol=2e-4, atol=2e-4)


def test_factor_svol_kernel_interpret():
    from ssme_tpu.models import factor_svol
    from ssme_tpu.ops.filter_megakernel import factor_svol_kernel_model

    na = 3
    model = factor_svol.make_model(na, 2)
    km = factor_svol_kernel_model(na)
    params = model.sample_prior(jax.random.key(0))
    _, ys = factor_svol.simulate(jax.random.key(1), params, 10, na, 2)
    batch = jnp.broadcast_to(params, (8, km.num_params))
    total, lcls, fm = filter_megakernel(km, 5, batch, ys,
                                        num_particles=128, interpret=True)
    assert total.shape == (8,)
    assert lcls.shape == (8, 10)
    assert np.all(np.isfinite(np.asarray(total)))


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_factor_svol_kernel_matches_xla_statistically():
    from ssme_tpu.filters import log_likelihood_fn
    from ssme_tpu.models import factor_svol
    from ssme_tpu.ops.filter_megakernel import factor_svol_kernel_model

    na, B = 4, 32
    model = factor_svol.make_model(na, 2)
    km = factor_svol_kernel_model(na)
    params = model.sample_prior(jax.random.key(0))
    _, ys = factor_svol.simulate(jax.random.key(1), params, 150, na, 2)
    batch = jnp.broadcast_to(params, (B, km.num_params))
    tot, _, _ = filter_megakernel(km, 11, batch, ys, num_particles=512)
    ll = log_likelihood_fn(model, num_particles=512)
    ref = jax.vmap(lambda k: ll(k, params, ys))(
        jax.random.split(jax.random.key(2), B))
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot.mean()) - float(ref.mean())) < se


def test_apf_mode_interpret():
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    total, lcls, _ = filter_megakernel(km, 3, params, ys,
                                       num_particles=128, interpret=True,
                                       mode="apf")
    assert total.shape == (8,)
    assert np.all(np.isfinite(np.asarray(total)))
    # apf mode without a prop_mu hook must error
    km_np = KernelModel(num_params=3, init=km.init,
                        propagate=km.propagate, log_weight=km.log_weight)
    with pytest.raises(ValueError):
        filter_megakernel(km_np, 3, params, ys, num_particles=128,
                          interpret=True, mode="apf")


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_apf_mode_matches_xla_auxiliary():
    from ssme_tpu.filters import AuxiliaryParticleFilter
    from ssme_tpu.models import svol

    T, B = 200, 32
    ys = 0.5 * jax.random.normal(jax.random.key(1), (T,))
    p_ref = jnp.array([1.0, 0.9, 0.04])
    rows = jnp.broadcast_to(jnp.array([1.0, 0.9, 0.2]), (B, 3))
    tot, _, _ = filter_megakernel(svol_kernel_model(), 7, rows, ys,
                                  num_particles=512, mode="apf")
    apf = AuxiliaryParticleFilter(svol.make_model(), num_particles=512)
    ref = jax.vmap(lambda k: apf.run(k, p_ref, ys[:, None]).log_likelihood)(
        jax.random.split(jax.random.key(2), B))
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot.mean()) - float(ref.mean())) < se


def test_poisson_kernel_log_weight_matches_model():
    from ssme_tpu.models import poisson_ar
    from ssme_tpu.ops.filter_megakernel import (poisson_ar_kernel_model,
                                                poisson_obs_rows)

    km = poisson_ar_kernel_model()
    x = jax.random.normal(jax.random.key(1), (8, 16))
    counts = jnp.array([4.0])
    row = poisson_obs_rows(counts)[0]
    lw = km.log_weight(None, (x,), tuple(row), ())

    def ref_one(xs):
        return poisson_ar.log_g(None, counts, xs[None], None)

    ref = jax.vmap(jax.vmap(lambda v: ref_one(v)))(x)
    np.testing.assert_allclose(np.asarray(lw), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_poisson_kernel_interpret():
    from ssme_tpu.models import poisson_ar
    from ssme_tpu.ops.filter_megakernel import (poisson_ar_kernel_model,
                                                poisson_obs_rows)

    km = poisson_ar_kernel_model()
    params = jnp.tile(jnp.array([[0.9, 1.0, 0.3]]), (8, 1))
    _, ys = poisson_ar.simulate(jax.random.key(0), jnp.array([0.9, 1.0, 0.3]), 12)
    rows = poisson_obs_rows(ys[:, 0])
    for mode in ("bootstrap", "apf"):
        total, lcls, _ = filter_megakernel(km, 5, params, rows,
                                           num_particles=128,
                                           interpret=True, mode=mode)
        assert np.all(np.isfinite(np.asarray(total))), mode


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_poisson_kernel_matches_xla_statistically():
    from ssme_tpu.filters import log_likelihood_fn
    from ssme_tpu.models import poisson_ar
    from ssme_tpu.ops.filter_megakernel import (poisson_ar_kernel_model,
                                                poisson_obs_rows)

    B = 32
    p = jnp.array([0.9, 1.0, 0.3])
    _, ys = poisson_ar.simulate(jax.random.key(0), p, 200)
    rows = poisson_obs_rows(ys[:, 0])
    batch = jnp.broadcast_to(p, (B, 3))
    tot, _, _ = filter_megakernel(poisson_ar_kernel_model(), 7, batch,
                                  rows, num_particles=512)
    ll = log_likelihood_fn(poisson_ar.make_model(), num_particles=512)
    ref = jax.vmap(lambda k: ll(k, p, ys))(
        jax.random.split(jax.random.key(2), B))
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot.mean()) - float(ref.mean())) < se


def test_kernel_systematic_resampling_law():
    """Direct law check of the in-kernel selection: with identity
    propagation and weights only at t=0, the t=1 cloud mean must equal
    the weighted mean of the t=0 cloud within the systematic-resampling
    deterministic bound (each offspring count is within 1 of N*w). Valid
    for ANY u0, so it holds under the interpret-mode PRNG stub too."""
    n = 256

    def init(rng, p, y, z, shape):
        # deterministic cloud: x_i = i / n in [0, 1)
        return (jax.lax.broadcasted_iota(
            jnp.float32, shape, 1) / float(n),)

    def propagate(rng, p, state, y, z):
        return state  # identity

    def log_weight(p, state, y, z):
        (x,) = state
        # t=0 (y=1): geometric weights in the lane value; t=1 (y=0): flat
        return jnp.where(y[0] > 0.5, 3.0 * x, jnp.zeros_like(x))

    km = KernelModel(num_params=1, init=init, propagate=propagate,
                     log_weight=log_weight, name="law")
    ys = jnp.array([1.0, 0.0])
    params = jnp.zeros((8, 1), jnp.float32)
    _, _, fmeans = filter_megakernel(km, 9, params, ys,
                                     num_particles=n, interpret=True)
    # expected: sum_i w_i x_i with w ~ exp(3 x), x = i/n
    x = np.arange(n) / n
    w = np.exp(3.0 * x)
    w /= w.sum()
    expected = float((w * x).sum())
    got = np.asarray(fmeans)[:, 1]
    assert np.all(np.abs(got - expected) < 2.0 / n), (got, expected)


def test_vector_functionals_paths():
    """A ``functionals`` vector gets one per-step normalized-mean path
    each (pf_base::getExpectations parity, VERDICT r1 #6).  Deterministic
    cloud + identity propagation makes the exact values checkable under
    the interpret-mode PRNG stub, including the constant-42 invariance
    check of the reference tests (test_pswarm.cpp:239-252)."""
    n = 256

    def init(rng, p, y, z, shape):
        return (jax.lax.broadcasted_iota(
            jnp.float32, shape, 1) / float(n),)

    def propagate(rng, p, state, y, z):
        return state

    def log_weight(p, state, y, z):
        (x,) = state
        return jnp.where(y[0] > 0.5, 3.0 * x, jnp.zeros_like(x))

    km = KernelModel(
        num_params=1, init=init, propagate=propagate,
        log_weight=log_weight,
        functionals=(lambda p, st: st[0],
                     lambda p, st: st[0] * st[0],
                     lambda p, st: jnp.full_like(st[0], 42.0)),
        name="vecfn")
    ys = jnp.array([1.0, 0.0])
    params = jnp.zeros((8, 1), jnp.float32)
    _, _, fmeans = filter_megakernel(km, 9, params, ys,
                                     num_particles=n, interpret=True)
    assert isinstance(fmeans, tuple) and len(fmeans) == 3
    assert all(f.shape == (8, 2) for f in fmeans)
    x = np.arange(n) / n
    w = np.exp(3.0 * x)
    w /= w.sum()
    # t=0: exact self-normalized means under the geometric weights
    np.testing.assert_allclose(np.asarray(fmeans[0])[:, 0],
                               float((w * x).sum()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fmeans[1])[:, 0],
                               float((w * x * x).sum()), rtol=1e-5)
    # constant functional == 42 exactly, both steps (normalization check)
    np.testing.assert_allclose(np.asarray(fmeans[2]), 42.0, rtol=1e-6)
    # t=1: post-resampling cloud, within the systematic deterministic
    # bound of the weighted mean
    assert np.all(np.abs(np.asarray(fmeans[0])[:, 1]
                         - float((w * x).sum())) < 2.0 / n)


def test_vector_functionals_swarm_paths():
    def init(rng, p, y, z, shape):
        return (jnp.zeros(shape),)

    def propagate(rng, p, state, y, z):
        return state

    def log_weight(p, state, y, z):
        return jnp.zeros_like(state[0])

    km = KernelModel(
        num_params=1, init=init, propagate=propagate,
        log_weight=log_weight,
        functionals=(lambda p, st: jnp.full_like(st[0], 7.0),
                     lambda p, st: jnp.full_like(st[0], 42.0)),
        name="vecfn_swarm")
    draws = jnp.zeros((12, 1))
    ev = megakernel_swarm_evidence(km, 3, draws, jnp.ones(6),
                                   num_particles=128, interpret=True)
    assert len(ev["functional_paths"]) == 2
    np.testing.assert_allclose(np.asarray(ev["functional_paths"][0]), 7.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ev["functional_paths"][1]), 42.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ev["functional_path"]), 7.0,
                               rtol=1e-6)


def test_svol_t_kernel_log_weight_matches_model():
    from ssme_tpu.models import svol_t
    from ssme_tpu.ops.filter_megakernel import (svol_t_kernel_model,
                                                svol_t_param_rows)

    km = svol_t_kernel_model()
    params4 = jnp.array([[1.2, 0.9, 0.04, 5.0]])
    rows = svol_t_param_rows(jnp.tile(params4, (8, 1)))
    x = jax.random.normal(jax.random.key(1), (8, 16))
    y = 0.7
    lw = km.log_weight(rows, (x,), (y,), ())

    def ref_one(xs):
        return svol_t.log_g(params4[0], jnp.array([y]), xs[None], None)

    ref = jax.vmap(jax.vmap(ref_one))(x)
    np.testing.assert_allclose(np.asarray(lw), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_svol_t_kernel_interpret():
    from ssme_tpu.models import svol_t
    from ssme_tpu.ops.filter_megakernel import (svol_t_kernel_model,
                                                svol_t_param_rows)

    p = jnp.array([1.0, 0.9, 0.04, 5.0])
    _, ys = svol_t.simulate(jax.random.key(0), p, 12)
    rows = svol_t_param_rows(jnp.tile(p, (8, 1)))
    for mode in ("bootstrap", "apf"):
        total, _, _ = filter_megakernel(svol_t_kernel_model(), 5, rows,
                                        ys, num_particles=128,
                                        interpret=True, mode=mode)
        assert np.all(np.isfinite(np.asarray(total))), mode


@pytest.mark.skipif(not ON_TPU, reason="needs real TPU PRNG")
def test_svol_t_kernel_matches_xla_statistically():
    from ssme_tpu.filters import log_likelihood_fn
    from ssme_tpu.models import svol_t
    from ssme_tpu.ops.filter_megakernel import (svol_t_kernel_model,
                                                svol_t_param_rows)

    B = 32
    p = jnp.array([1.0, 0.9, 0.04, 5.0])
    _, ys = svol_t.simulate(jax.random.key(0), p, 200)
    rows = svol_t_param_rows(jnp.tile(p, (B, 1)))
    tot, _, _ = filter_megakernel(svol_t_kernel_model(), 7, rows, ys,
                                  num_particles=512)
    ll = log_likelihood_fn(svol_t.make_model(), num_particles=512)
    ref = jax.vmap(lambda k: ll(k, p, ys))(
        jax.random.split(jax.random.key(2), B))
    se = float(jnp.std(ref)) / np.sqrt(B) * 4 + 0.5
    assert abs(float(tot.mean()) - float(ref.mean())) < se


def test_return_cloud_interpret():
    """VERDICT r4 item 7: the final-cloud export must not perturb the
    filter (identical evidence — the cloud write draws no randomness),
    must hand back the state exactly after the last REAL step (pad
    substeps excluded), and must feed the Swarm::simFutureObs bridge
    (pswarm_filter.h:247-253) end-to-end."""
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(19)          # ragged vs steps_per_cell=8: pads
    base = filter_megakernel(km, 3, params, ys, num_particles=128,
                             interpret=True)
    total, lcls, fmeans, cloud, cloud_lw = filter_megakernel(
        km, 3, params, ys, num_particles=128, interpret=True,
        return_cloud=True)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(total))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(lcls))
    assert len(cloud) == 1 and cloud[0].shape == (8, 128)
    assert cloud_lw.shape == (8, 128)
    assert np.all(np.isfinite(np.asarray(cloud[0])))
    # carried log-weights are max-normalized: rowwise max == 0
    np.testing.assert_allclose(
        np.asarray(jnp.max(cloud_lw, axis=-1)), 0.0, atol=1e-5)


def test_return_cloud_excludes_padded_steps():
    """The cloud is captured at t == T-1, so appending PAD-LENGTH
    garbage observations (same cell count, same substeps) must not
    change it in straight-line mode — only real steps advance the
    exported state."""
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    # steps_per_cell=4, T=16: exactly 4 cells, no pads
    *_, cloud_a, lw_a = filter_megakernel(
        km, 3, params, ys, num_particles=128, interpret=True,
        steps_per_cell=4, return_cloud=True)
    # T=14 with steps_per_cell=4 pads 2 substeps in the last cell; the
    # first 14 observations are identical, so a cloud captured at
    # t == 13 differs from the T=16 run (two fewer real steps) but must
    # be finite and normalized — and unaffected by the pad VALUES
    *_, cloud_b1, lw_b1 = filter_megakernel(
        km, 3, params, ys[:14], num_particles=128, interpret=True,
        steps_per_cell=4, return_cloud=True)
    assert np.all(np.isfinite(np.asarray(cloud_b1[0])))
    np.testing.assert_allclose(
        np.asarray(jnp.max(lw_b1, axis=-1)), 0.0, atol=1e-5)


def test_forecast_from_cloud_bridge():
    """Kernel cloud -> generic future simulator: shapes, finiteness,
    and a distributional sanity vs the generic swarm forecast."""
    from ssme_tpu.inference import forecast_from_cloud
    from ssme_tpu.models import svol

    km = svol_kernel_model()
    model = svol.make_model()
    draws = jnp.tile(jnp.array([[1.0, 0.5, 0.01]]), (8, 1))  # (b,phi,ss)
    rows = jnp.stack([draws[:, 0], draws[:, 1],
                      jnp.sqrt(draws[:, 2])], axis=-1)
    ys = 0.3 * jnp.ones(16)
    from ssme_tpu.ops.filter_megakernel import megakernel_swarm_evidence
    ev = megakernel_swarm_evidence(km, 3, rows, ys, num_particles=128,
                                   interpret=True, return_cloud=True)
    assert ev["final_cloud"][0].shape == (8, 128)
    obs = forecast_from_cloud(model, draws, ev["final_cloud"],
                              ev["final_log_weights"],
                              jax.random.key(1), num_steps=5)
    assert obs.shape == (8, 5, 128, 1)
    assert np.all(np.isfinite(np.asarray(obs)))
    # y_t ~ N(0, beta^2 e^{x_t}) with x near its stationary law:
    # pooled sd in a sane band
    sd = float(np.std(np.asarray(obs)))
    assert 0.3 < sd < 3.0, sd


def test_rejection_resampler_wiring_interpret():
    """resampler='rejection' (VERDICT r4 item 2) wires through all
    three entry points; interpret mode checks wiring/validation only
    (the interpret PRNG is a constant stub) — the law and the cap lift
    are validated on hardware (validate_tpu checks 1d / lw rejection)."""
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(16)
    total, _, _ = filter_megakernel(km, 3, params, ys, num_particles=128,
                                    interpret=True, resampler="rejection")
    assert np.all(np.isfinite(np.asarray(total)))
    with pytest.raises(ValueError, match="power-of-two"):
        filter_megakernel(km, 3, params, ys, num_particles=384,
                          interpret=True, resampler="rejection")
    with pytest.raises(ValueError, match="cap"):
        filter_megakernel(km, 3, params, ys, num_particles=8192,
                          interpret=True, resampler="rejection")


def test_metropolis_sweep_budgeting():
    """VERDICT r4 item 6: the PMMH hook is safe-by-construction — the
    default sweep count is derived from the measured bias envelope, an
    explicit under-budget count warns with numbers, and an unmeetable
    budget raises toward the unbiased alternatives."""
    import warnings

    from ssme_tpu.ops._select import (metropolis_bias_estimate,
                                      metropolis_sweeps_for)

    # envelope reproduces the measured anchors (within the 2x safety)
    est8 = metropolis_bias_estimate(8, 3084, ess_threshold=1.0)
    assert 5.7 <= est8 / 2.0 <= 5.9          # parity anchor 5.78 nats
    est8a = metropolis_bias_estimate(8, 3084, ess_threshold=0.5)
    assert 1.5 <= est8a / 2.0 <= 1.7         # adaptive anchor 1.59
    # monotone in B and T
    assert (metropolis_bias_estimate(32, 3084, 0.5)
            < metropolis_bias_estimate(8, 3084, 0.5))
    assert (metropolis_bias_estimate(8, 300, 0.5)
            < metropolis_bias_estimate(8, 3084, 0.5))
    # inversion: the returned sweep count meets the budget, the next
    # even count down does not
    b = metropolis_sweeps_for(0.5, 3084, ess_threshold=0.5)
    assert metropolis_bias_estimate(b, 3084, 0.5) <= 0.5
    assert metropolis_bias_estimate(b - 2, 3084, 0.5) > 0.5
    with pytest.raises(ValueError, match="rejection"):
        metropolis_sweeps_for(1e-4, 3084, ess_threshold=1.0)

    # hook default derives; explicit under-budget warns
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.01]]), (4, 1))
    ys = 0.3 * jnp.ones(16)
    ll = megakernel_log_like(km, 128, 2, resampler="metropolis",
                             interpret=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # derived count: no warning
        out = ll(jax.random.key(0), params, ys)
    assert out.shape == (4,)
    ll_bad = megakernel_log_like(km, 128, 2, resampler="metropolis",
                                 metropolis_iters=4,
                                 metropolis_bias_budget=1e-3,
                                 interpret=True)
    with pytest.warns(UserWarning, match="evidence"):
        ll_bad(jax.random.key(0), params, ys)


def test_factory_gate_stride_sis_equivalence_interpret():
    """Factory port of the gate_stride lever: with a never-firing gate
    both strides run the same pure-SIS filter — totals agree to
    renormalization rounding; lcls are zero off check columns and
    telescope; ragged tails still check at T-1; validation rejects
    non-dividing strides and non-adaptive modes."""
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(19)
    kw = dict(num_particles=128, interpret=True, steps_per_cell=8,
              ess_threshold=1e-6)
    tot1, lcls1, _ = filter_megakernel(km, 3, params, ys, **kw)
    tot4, lcls4, _ = filter_megakernel(km, 3, params, ys, gate_stride=4,
                                       **kw)
    np.testing.assert_allclose(np.asarray(tot4), np.asarray(tot1),
                               rtol=2e-4, atol=2e-4)
    l4 = np.asarray(lcls4)
    np.testing.assert_allclose(l4.sum(-1), np.asarray(tot4), rtol=1e-5)
    mask = np.ones(19, bool)
    mask[[3, 7, 11, 15, 18]] = False
    assert np.all(l4[:, mask] == 0.0)
    np.testing.assert_allclose(l4[:, 18],
                               np.asarray(lcls1)[:, 16:].sum(-1),
                               rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        filter_megakernel(km, 3, params, ys, gate_stride=3, **kw)
    with pytest.raises(ValueError, match="adaptive"):
        filter_megakernel(km, 3, params, ys, num_particles=128,
                          interpret=True, gate_stride=4)
    with pytest.raises(ValueError, match="adaptive"):
        filter_megakernel(km, 3, params, ys, num_particles=128,
                          interpret=True, ess_threshold=0.5, mode="apf",
                          gate_stride=4)


def test_factory_gate_stride_cross_cell_interpret():
    """Cross-cell stride in the factory (g = 16 > steps_per_cell = 8):
    checks fire on the runtime predicate every g-th step with the
    carried scratch persisting across grid cells — same SIS contract
    as the in-cell case; invalid cross-cell strides rejected."""
    km = svol_kernel_model()
    params = jnp.tile(jnp.array([[1.0, 0.5, 0.1]]), (8, 1))
    ys = 0.3 * jnp.ones(35)
    kw = dict(num_particles=128, interpret=True, steps_per_cell=8,
              ess_threshold=1e-6)
    tot1, lcls1, _ = filter_megakernel(km, 3, params, ys, **kw)
    tot16, lcls16, _ = filter_megakernel(km, 3, params, ys,
                                         gate_stride=16, **kw)
    np.testing.assert_allclose(np.asarray(tot16), np.asarray(tot1),
                               rtol=2e-4, atol=2e-4)
    l16 = np.asarray(lcls16)
    np.testing.assert_allclose(l16.sum(-1), np.asarray(tot16), rtol=1e-5)
    mask = np.ones(35, bool)
    mask[[15, 31, 34]] = False
    assert np.all(l16[:, mask] == 0.0)
    np.testing.assert_allclose(l16[:, 15],
                               np.asarray(lcls1)[:, :16].sum(-1),
                               rtol=2e-4, atol=2e-4)
    # padded-step check guard (see test_svol_megakernel's twin): at
    # T=12 the padded t=15 would fire the stride-16 check and wipe the
    # ragged tail's staged value without the t < num_steps conjunct
    ys12 = 0.3 * jnp.ones(12)
    tot1s, _, _ = filter_megakernel(km, 3, params, ys12, **kw)
    tot16s, lcls16s, _ = filter_megakernel(km, 3, params, ys12,
                                           gate_stride=16, **kw)
    np.testing.assert_allclose(np.asarray(tot16s), np.asarray(tot1s),
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(lcls16s)[:, 11] != 0.0)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        filter_megakernel(km, 3, params, ys, gate_stride=12, **kw)
    with pytest.raises(ValueError, match="divide steps_per_cell"):
        filter_megakernel(km, 3, params, ys, gate_stride=256, **kw)


def test_swarm_evidence_gate_stride_and_cloud_interpret():
    """Swarm evidence with gate_stride + return_cloud composed: totals
    telescope, the cloud export survives the stride path, and the
    forecast bridge still runs."""
    from ssme_tpu.inference import forecast_from_cloud
    from ssme_tpu.models import svol

    km = svol_kernel_model()
    draws = jnp.tile(jnp.array([[1.0, 0.5, 0.01]]), (8, 1))
    rows = jnp.stack([draws[:, 0], draws[:, 1],
                      jnp.sqrt(draws[:, 2])], axis=-1)
    ys = 0.3 * jnp.ones(16)
    ev = megakernel_swarm_evidence(km, 3, rows, ys, num_particles=128,
                                   interpret=True, ess_threshold=1e-6,
                                   gate_stride=4, return_cloud=True)
    lcl = np.asarray(ev["per_model_log_cond_likes"])
    assert lcl.shape == (8, 16)
    # stride 4: nonzero only at check columns {3, 7, 11, 15}
    mask = np.ones(16, bool)
    mask[[3, 7, 11, 15]] = False
    assert np.all(lcl[:, mask] == 0.0)
    assert np.all(np.isfinite(np.asarray(ev["final_cloud"][0])))
    obs = forecast_from_cloud(svol.make_model(), draws,
                              ev["final_cloud"],
                              ev["final_log_weights"],
                              jax.random.key(2), num_steps=3)
    assert obs.shape == (8, 3, 128, 1)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_new_kernel_options_compose_across_model_families():
    """rejection + gate_stride wiring across the factory's model
    variety: 2-leaf state (factor-SVOL — joint multi-leaf movement
    through the roll selector) and 2-column obs (Poisson counts) in
    interpret mode."""
    from ssme_tpu.ops.filter_megakernel import (factor_svol_kernel_model,
                                                poisson_ar_kernel_model,
                                                poisson_obs_rows)

    # factor-SVOL: 2 leaves, 5 assets
    km = factor_svol_kernel_model(3)
    rng = np.random.default_rng(0)
    p_row = np.concatenate([[0.9, 0.8], [0.0, 0.1], [0.2, 0.3],
                            rng.uniform(0.2, 0.8, 6), [0.3, 0.3, 0.3]])
    params = jnp.tile(jnp.asarray(p_row, jnp.float32), (8, 1))
    ys = 0.3 * jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    tot, _, _ = filter_megakernel(km, 3, params, ys, num_particles=128,
                                  interpret=True, ess_threshold=0.5,
                                  resampler="rejection", gate_stride=4)
    assert np.all(np.isfinite(np.asarray(tot)))

    # Poisson AR: dim_obs=2 (count + host-precomputed gammaln)
    kmp = poisson_ar_kernel_model()
    counts = jnp.asarray(rng.poisson(3.0, 16), jnp.float32)
    obs = poisson_obs_rows(counts)
    pp = jnp.tile(jnp.array([[0.8, 1.0, 0.3]]), (8, 1))
    tot_p, _, _ = filter_megakernel(kmp, 5, pp, obs, num_particles=128,
                                    interpret=True, ess_threshold=0.5,
                                    resampler="rejection", gate_stride=4)
    assert np.all(np.isfinite(np.asarray(tot_p)))

    # CROSS-CELL stride (g=16 > spc=8) composed with the rejection
    # resampler on the 2-leaf family: the runtime-predicate check must
    # drive the multi-leaf roll selector correctly across grid cells,
    # and a never-firing gate must reproduce the stride-4 SIS totals
    tot_cc, _, _ = filter_megakernel(km, 3, params, ys, num_particles=128,
                                     interpret=True, ess_threshold=0.5,
                                     resampler="rejection", gate_stride=16)
    assert np.all(np.isfinite(np.asarray(tot_cc)))
    sis4, _, _ = filter_megakernel(km, 3, params, ys, num_particles=128,
                                   interpret=True, ess_threshold=1e-6,
                                   resampler="rejection", gate_stride=4)
    sis16, _, _ = filter_megakernel(km, 3, params, ys, num_particles=128,
                                    interpret=True, ess_threshold=1e-6,
                                    resampler="rejection", gate_stride=16)
    np.testing.assert_allclose(np.asarray(sis16), np.asarray(sis4),
                               rtol=2e-4, atol=2e-4)
