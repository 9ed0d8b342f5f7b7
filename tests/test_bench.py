"""bench.py contract tests: one valid JSON line on stdout (CPU, tiny),
including with an injected Pallas-path fault (the subprocess-isolation
fallback of VERDICT r2 item 2)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update({
        "BENCH_PARTICLES": "64",
        "BENCH_REPLICATES": "2",
        "BENCH_CHAINS": "1",
        "BENCH_ITERS": "2",
        # bench honors BENCH_PLATFORM itself (and propagates it to its
        # worker subprocesses), overriding any sitecustomize platform
        "BENCH_PLATFORM": "cpu",
    })
    env.update(extra_env)
    return subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=900)


def _payload(out):
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.strip().split("\n")
                  if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    return json.loads(json_lines[0])


def test_bench_emits_json_line():
    payload = _payload(_run_bench({"BENCH_IMPL": "xla"}))
    assert payload["metric"] == "pmmh_particle_propagations_per_sec_per_chip"
    assert payload["value"] > 0
    assert payload["unit"] == "propagations/s/chip"
    assert payload["vs_baseline"] == payload["value"] / 1e8
    # VERDICT r1: the artifact must carry BOTH schedules
    assert payload["parity"] > 0
    assert payload["adaptive"] == payload["value"]
    assert payload["impl"] == {"parity": "xla", "adaptive": "xla"}


def test_bench_survives_pallas_fault():
    """Killing the Pallas measurement process artificially still yields
    a valid JSON artifact from the XLA path (BENCH_r02 post-mortem: the
    old in-process fallback died with the TPU worker)."""
    payload = _payload(_run_bench({"BENCH_IMPL": "pallas",
                                   "BENCH_FAULT": "pallas"}))
    assert payload["value"] > 0 and payload["parity"] > 0
    assert payload["impl"] == {"parity": "xla", "adaptive": "xla"}


def test_bench_scaling_mode():
    out = _run_bench({
        "BENCH_MODE": "scaling",
        "BENCH_PARTICLES": "32",
        "BENCH_REPLICATES": "1",
        "BENCH_ITERS": "2",
        "BENCH_T": "16",
        "BENCH_CPU_DEVICES": "4",
    })
    payload = _payload(out)
    assert payload["metric"] == "pmmh_chain_scaling"
    rows = payload["rows"]
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert all(r["props_per_sec"] > 0 for r in rows)
    assert rows[0]["parallel_efficiency"] == 1.0
