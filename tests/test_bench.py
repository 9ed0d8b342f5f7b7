"""bench.py contract test: one valid JSON line on stdout (CPU, tiny)."""

import json
import os
import subprocess
import sys


def test_bench_emits_json_line():
    env = dict(os.environ)
    env.update({
        "BENCH_PARTICLES": "64",
        "BENCH_REPLICATES": "2",
        "BENCH_CHAINS": "1",
        "BENCH_ITERS": "2",
        "BENCH_IMPL": "xla",
        # force CPU before the axon sitecustomize pins the tunnel: bench
        # itself runs on whatever platform is live
        "JAX_PLATFORMS": "cpu",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # sitecustomize clobbers JAX_PLATFORMS; strip .axon_site so the env
    # var holds (the driver's TPU run keeps it, which is what we want)
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy; runpy.run_path(r'%s', run_name='__main__')"
        % os.path.join(repo, "bench.py"))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.strip().split("\n")
                  if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "pmmh_particle_propagations_per_sec_per_chip"
    assert payload["value"] > 0
    assert payload["unit"] == "propagations/s/chip"
    assert payload["vs_baseline"] == payload["value"] / 1e8
    # VERDICT r1: the artifact must carry BOTH schedules
    assert payload["parity"] > 0
    assert payload["adaptive"] == payload["value"]


def test_bench_scaling_mode():
    env = dict(os.environ)
    env.update({
        "BENCH_MODE": "scaling",
        "BENCH_PARTICLES": "32",
        "BENCH_REPLICATES": "1",
        "BENCH_CHAINS": "1",
        "BENCH_ITERS": "2",
        "BENCH_T": "16",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 4);"
        "import runpy; runpy.run_path(r'%s', run_name='__main__')"
        % os.path.join(repo, "bench.py"))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.strip().split("\n")
                  if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    payload = json.loads(json_lines[0])
    assert payload["metric"] == "pmmh_chain_scaling"
    rows = payload["rows"]
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert all(r["props_per_sec"] > 0 for r in rows)
    assert rows[0]["parallel_efficiency"] == 1.0
