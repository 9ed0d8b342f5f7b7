"""MCMC diagnostics tests: R-hat and ESS against known-truth chains."""

import numpy as np

from ssme_tpu.diagnostics import ess, split_rhat, summarize


def test_rhat_iid_chains_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 8))
    r = split_rhat(x)
    assert r.shape == (1,)
    assert abs(float(r[0]) - 1.0) < 0.02


def test_rhat_detects_divergent_means():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 4))
    x[:, 2:] += 5.0  # two chains sampling a different mode
    assert float(split_rhat(x)[0]) > 1.5


def test_rhat_detects_within_chain_trend():
    # split-R-hat flags a trending (non-stationary) chain even when all
    # chains trend identically
    t = np.linspace(0, 3, 1000)[:, None]
    rng = np.random.default_rng(2)
    x = t + 0.1 * rng.normal(size=(1000, 4))
    assert float(split_rhat(x)[0]) > 1.5


def test_ess_iid_near_total():
    rng = np.random.default_rng(3)
    n, m = 2000, 4
    x = rng.normal(size=(n, m))
    e = float(ess(x)[0])
    assert 0.5 * n * m < e  # iid: ESS should be near (or above) n*m


def test_ess_ar1_matches_theory():
    # AR(1) with coefficient a has tau = (1+a)/(1-a)
    rng = np.random.default_rng(4)
    a = 0.9
    n, m = 20000, 4
    eps = rng.normal(size=(n, m)) * np.sqrt(1 - a * a)
    x = np.zeros((n, m))
    for t in range(1, n):
        x[t] = a * x[t - 1] + eps[t]
    e = float(ess(x)[0])
    expected = n * m * (1 - a) / (1 + a)
    assert 0.6 * expected < e < 1.6 * expected


def test_summarize_keys_and_values():
    rng = np.random.default_rng(5)
    s = rng.normal(size=(500, 4, 2))
    s[:, :, 1] = 3.0 + 0.5 * s[:, :, 1]
    out = summarize(s, names=["alpha", "beta"])
    assert set(out) == {"alpha", "beta"}
    assert abs(out["beta"]["mean"] - 3.0) < 0.1
    assert abs(out["beta"]["sd"] - 0.5) < 0.05
    assert out["alpha"]["q5"] < out["alpha"]["median"] < out["alpha"]["q95"]
    assert out["alpha"]["rhat"] < 1.02
    assert out["alpha"]["ess"] > 500


def test_shapes_1d_2d_3d():
    rng = np.random.default_rng(6)
    assert split_rhat(rng.normal(size=(400,))).shape == (1,)
    assert split_rhat(rng.normal(size=(400, 2))).shape == (1,)
    assert split_rhat(rng.normal(size=(400, 2, 3))).shape == (3,)
    assert ess(rng.normal(size=(400, 2, 3))).shape == (3,)
