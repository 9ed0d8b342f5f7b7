"""Multi-host (multi-process) scaffolding test: the localhost 2-process
chain-sharded PMMH dryrun (examples/dryrun_multihost.py) must PASS —
each worker joins via jax.distributed, builds a global 4-device mesh
from 2 CPU devices per process, runs sharded PMMH, and the fetched
samples bit-match a single-process run of the same program (BASELINE.md
">= 2 hosts" row; VERDICT r2 missing item 3)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun_bit_matches_single_process():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # distinct port per run to dodge TIME_WAIT collisions on re-runs
    env["DRYRUN_PORT"] = str(12000 + (os.getpid() % 2000))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "dryrun_multihost.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "PASS" in out.stdout, out.stdout
