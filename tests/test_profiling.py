"""Profiling utilities tests."""

import jax.numpy as jnp

from ssme_tpu.profiling import PhaseTimer, throughput


def test_phase_timer_accumulates():
    pt = PhaseTimer()
    with pt.phase("a") as h:
        h["result"] = jnp.arange(8).sum()
    with pt.phase("a"):
        pass
    with pt.phase("b"):
        pass
    assert pt.counts["a"] == 2 and pt.counts["b"] == 1
    assert pt.totals["a"] >= 0.0
    rep = pt.report()
    assert "a" in rep and "x2" in rep


def test_throughput_metric():
    out = throughput(1_000_000, 0.5, num_devices=2)
    assert out["propagations_per_sec"] == 2_000_000
    assert out["propagations_per_sec_per_chip"] == 1_000_000
