#!/usr/bin/env python
"""Standalone megakernel timing: per-grid-cell cost at several
(schedule, steps_per_cell) points.  Used for A/B across checkouts
(dense vs blocked selector, region-scoped vs straight-line substeps).

Env: SPEED_T (default 3084), SPEED_B (16), SPEED_N (512),
SPEED_CONFIGS ("8:0.5,8:1.0,1:0.5,1:1.0" = spc:ess pairs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    t_len = int(os.environ.get("SPEED_T", 3084))
    b = int(os.environ.get("SPEED_B", 16))
    n = int(os.environ.get("SPEED_N", 512))
    configs = [
        (int(s.split(":")[0]), float(s.split(":")[1]))
        for s in os.environ.get(
            "SPEED_CONFIGS", "8:0.5,8:1.0,1:0.5,1:1.0").split(",")]

    ys = 0.5 * jax.random.normal(jax.random.key(1), (t_len,))
    rows = jnp.broadcast_to(jnp.array([1.0, 0.97, 0.2]), (b, 3))

    for spc, ess in configs:
        try:
            def run(seed):
                tot, _, _ = svol_filter_pallas(
                    seed, rows, ys, num_particles=n, ess_threshold=ess,
                    steps_per_cell=spc)
                return tot
            t0 = time.time()
            float(jnp.sum(run(7)))          # compile + warm
            compile_s = time.time() - t0
            best = float("inf")
            for i in range(5):
                t0 = time.perf_counter()
                float(jnp.sum(run(i)))
                best = min(best, time.perf_counter() - t0)
            cells = (b // 8) * ((t_len + spc - 1) // spc)
            props = b * n * t_len
            print(f"spc={spc} ess={ess}: {best*1e3:8.2f} ms  "
                  f"{best/cells*1e6:6.2f} us/cell  "
                  f"{props/best:.3e} props/s  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"spc={spc} ess={ess}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
