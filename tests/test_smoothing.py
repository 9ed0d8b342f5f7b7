"""Fixed-lag particle smoother vs the exact RTS Kalman smoother.

On the linear-Gaussian model (``models/lgssm.py``) both the filtered and
the lag-L smoothed means have closed forms; the particle fixed-lag
smoother must agree with the RTS smoother within Monte-Carlo error at a
modest lag, and must beat the filtered means as an estimate of the
full-information smoother (the whole point of lagging).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu.filters import fixed_lag_smoother
from ssme_tpu.models import lgssm

PARAMS = jnp.array([0.8, 0.5, 0.7])  # (a, q, r): mixes fast, obs informative
T = 120
LAG = 8
N = 4096


@pytest.fixture(scope="module")
def fixture():
    xs, ys = lgssm.simulate(jax.random.key(7), PARAMS, T)
    model = lgssm.make_model()
    smooth = fixed_lag_smoother(model, num_particles=N, lag=LAG)
    smoothed, filtered, ll = jax.jit(smooth)(jax.random.key(3), PARAMS, ys)
    return np.asarray(ys), np.asarray(smoothed), np.asarray(filtered), float(ll)


def test_shapes_and_finiteness(fixture):
    ys, smoothed, filtered, ll = fixture
    assert smoothed.shape == (T, 1)
    assert filtered.shape == (T, 1)
    assert np.all(np.isfinite(smoothed))
    assert np.all(np.isfinite(filtered))
    assert np.isfinite(ll)


def test_filtered_means_match_kalman(fixture):
    ys, _, filtered, _ = fixture
    _, kf_means, _ = lgssm.kalman_filter(PARAMS, jnp.asarray(ys))
    err = np.abs(filtered[:, 0] - np.asarray(kf_means))
    # MC error of a 4096-particle weighted mean on an O(1)-variance state
    assert float(np.max(err)) < 0.12
    assert float(np.mean(err)) < 0.03


def test_smoothed_means_match_rts(fixture):
    """Lag-8 at a=0.8 retains a^L ~ 0.17 of the missing future info —
    interior estimates (full lag available) must sit on the RTS curve
    within MC + truncation tolerance, and closer than the filtered
    means are."""
    ys, smoothed, filtered, _ = fixture
    rts_means, _ = lgssm.kalman_smoother(PARAMS, jnp.asarray(ys))
    rts = np.asarray(rts_means)
    interior = slice(0, T - LAG)  # entries with the full lag of future obs
    err_sm = np.abs(smoothed[interior, 0] - rts[interior])
    err_filt = np.abs(filtered[interior, 0] - rts[interior])
    assert float(np.mean(err_sm)) < 0.05
    assert float(np.max(err_sm)) < 0.25
    assert float(np.mean(err_sm)) < 0.5 * float(np.mean(err_filt))


def test_tail_uses_available_future(fixture):
    """The last entry has no future: it must equal the filtered mean
    (same weights, same particles), and the tail must interpolate toward
    the filter."""
    ys, smoothed, filtered, _ = fixture
    np.testing.assert_allclose(smoothed[-1], filtered[-1], rtol=1e-5,
                               atol=1e-6)


def test_short_series_lag_exceeds_t():
    """T <= lag exercises the all-tail assembly branch."""
    xs, ys = lgssm.simulate(jax.random.key(11), PARAMS, 5)
    smooth = fixed_lag_smoother(lgssm.make_model(), num_particles=512,
                                lag=8)
    smoothed, filtered, ll = smooth(jax.random.key(1), PARAMS, ys)
    assert smoothed.shape == (5, 1)
    assert filtered.shape == (5, 1)
    assert np.all(np.isfinite(np.asarray(smoothed)))
    rts, _ = lgssm.kalman_smoother(PARAMS, ys)
    err = np.abs(np.asarray(smoothed)[:, 0] - np.asarray(rts))
    assert float(np.max(err)) < 0.3


def test_log_likelihood_matches_kalman(fixture):
    ys, _, _, ll = fixture
    kf_lls, _, _ = lgssm.kalman_filter(PARAMS, jnp.asarray(ys))
    assert abs(ll - float(jnp.sum(kf_lls))) < 1.5


def test_lag_validation():
    with pytest.raises(ValueError, match="lag"):
        fixed_lag_smoother(lgssm.make_model(), num_particles=64, lag=0)
