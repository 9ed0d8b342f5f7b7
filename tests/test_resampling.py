"""Tests for on-device resampling kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu import resampling


KINDS = ["multinomial", "systematic", "stratified"]


@pytest.mark.parametrize("kind", KINDS)
def test_indices_in_range_and_sorted_cdf(kind):
    logw = jax.random.normal(jax.random.key(0), (64,))
    idx = resampling.ancestor_indices(jax.random.key(1), logw, kind=kind)
    assert idx.shape == (64,)
    assert int(idx.min()) >= 0 and int(idx.max()) < 64


@pytest.mark.parametrize("kind", KINDS)
def test_degenerate_weight_selects_single_particle(kind):
    logw = jnp.full((32,), -jnp.inf).at[7].set(0.0)
    idx = resampling.ancestor_indices(jax.random.key(2), logw, kind=kind)
    assert np.all(np.asarray(idx) == 7)


@pytest.mark.parametrize("kind", KINDS)
def test_ancestor_frequencies_match_weights(kind):
    w = np.array([0.05, 0.1, 0.15, 0.3, 0.4])
    logw = jnp.log(jnp.asarray(w))
    counts = np.zeros(5)
    for i in range(400):
        idx = resampling.ancestor_indices(jax.random.key(i), logw, kind=kind,
                                          num_samples=50)
        counts += np.bincount(np.asarray(idx), minlength=5)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, w, atol=0.01)


def test_resample_resets_weights_and_gathers_tree():
    n = 16
    states = jnp.arange(n, dtype=jnp.float32)[:, None]
    params = jnp.stack([jnp.arange(n, dtype=jnp.float32)] * 3, axis=1)
    logw = jnp.full((n,), -jnp.inf).at[3].set(0.0)
    (new_states, new_params), new_logw = resampling.resample(
        jax.random.key(0), logw, (states, params))
    # all particles collapse onto index 3, weights reset to log(1)=0
    # (liu_west_filter.h:144 semantics)
    assert np.all(np.asarray(new_states) == 3.0)
    assert np.all(np.asarray(new_params) == 3.0)
    assert np.all(np.asarray(new_logw) == 0.0)
    # state/param gathered jointly: same ancestry
    assert new_states.shape == states.shape and new_params.shape == params.shape


def test_maybe_resample_false_is_identity():
    n = 8
    states = jax.random.normal(jax.random.key(1), (n, 2))
    logw = jax.random.normal(jax.random.key(2), (n,))
    (new_states,), new_logw = resampling.maybe_resample(
        jax.random.key(3), logw, (states,), do_resample=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(new_states), np.asarray(states))
    np.testing.assert_array_equal(np.asarray(new_logw), np.asarray(logw))


def test_maybe_resample_true_matches_resample_distributionally():
    n = 8
    states = jnp.arange(n, dtype=jnp.float32)
    logw = jnp.full((n,), -jnp.inf).at[5].set(0.0)
    (new_states,), new_logw = resampling.maybe_resample(
        jax.random.key(4), logw, (states,), do_resample=jnp.asarray(True))
    assert np.all(np.asarray(new_states) == 5.0)
    assert np.all(np.asarray(new_logw) == 0.0)


def test_works_inside_jit_and_scan():
    n = 32

    def step(carry, _):
        states, logw, key = carry
        key, k1 = jax.random.split(key)
        (states,), logw = resampling.maybe_resample(
            k1, logw, (states,), do_resample=jnp.asarray(True))
        return (states, logw, key), jnp.mean(states)

    states = jax.random.normal(jax.random.key(5), (n,))
    logw = jax.random.normal(jax.random.key(6), (n,))
    (fs, fl, _), means = jax.jit(
        lambda c: jax.lax.scan(step, c, None, length=5)
    )((states, logw, jax.random.key(7)))
    assert fs.shape == (n,) and means.shape == (5,)
    assert np.all(np.isfinite(np.asarray(means)))


def test_searchsorted_bisection_matches_numpy(monkeypatch):
    """The log2(N) bisection fallback (above _MATRIX_SEARCH_LIMIT) must
    agree exactly with numpy's side='left' searchsorted — it was one
    iteration short once (width-1 ambiguity returning lo when the true
    index was hi), caught by the ring/allgather cross-check."""
    import numpy as np

    from ssme_tpu import resampling

    monkeypatch.setattr(resampling, "_MATRIX_SEARCH_LIMIT", 1)
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(2, 70))
        cdf = np.sort(rng.normal(size=n)).astype(np.float32)
        u = rng.normal(size=9).astype(np.float32)
        u[0], u[1] = cdf[0], cdf[-1]          # boundary hits
        got = np.asarray(resampling.searchsorted_cdf(
            jnp.asarray(cdf), jnp.asarray(u)))
        want = np.clip(np.searchsorted(cdf, u, side="left"), 0, n - 1)
        np.testing.assert_array_equal(got, want)
