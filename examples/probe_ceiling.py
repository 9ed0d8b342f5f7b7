#!/usr/bin/env python
"""Ceiling probes for the adaptive engine's two remaining levers
(docs/kernels.md "Roofline"):

1. gate_stride 16/32 — the round-5 cross-cell extension (checks fire on
   a runtime predicate across grid cells, so the stride is no longer
   capped at steps_per_cell=8).  Timing + evidence mean/sd vs stride 8.
2. The "cheaper bits->normal conversion" upper bound: monkeypatch the
   kernel's Box-Muller ``_normal_bits`` with a transcendental-free
   uniform stand-in (1 PRNG draw + 1 multiply, sd 1 — statistically
   WRONG, timing only).  If the stand-in is no faster, the BM
   transcendentals are fully hidden by VPU pipe overlap and the lever
   is dead; if it is much faster, a distributionally-accurate cheap
   normal is worth building.

Appends one JSON line per configuration to data/probe_ceiling.jsonl.

Run (on the chip):  python examples/probe_ceiling.py [--rows 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SVOL_THETA_STAR = (0.849, 0.9744, 0.0659)          # (beta, phi, ss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--strides", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--noise", nargs="*",
                    default=["bm", "uniform", "uniform2"])
    ap.add_argument("--out", default="data/probe_ceiling.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import ssme_tpu.ops.svol_filter_kernel as K
    from ssme_tpu.io import read_data

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ys = jnp.asarray(read_data(os.path.join(repo, "data",
                                            "spy_returns.csv"),
                               num_cols=1)).reshape(-1)
    beta, phi, ss = SVOL_THETA_STAR
    p = jnp.broadcast_to(
        jnp.asarray([beta, phi, np.sqrt(ss)], jnp.float32),
        (args.rows, 3))

    bm_normal = K._normal_bits
    # U[-1, 1) scaled to sd 1: one hardware draw + one multiply,
    # ZERO transcendentals.  Timing stand-in only.
    scale = float(np.sqrt(3.0) / 2147483648.0)

    def uniform_normal(shape):
        return pltpu.prng_random_bits(shape).astype(jnp.float32) * scale

    # triangular stand-in with TWO draws (same draw count as paired
    # Box-Muller): separates transcendental cost from PRNG-draw cost
    scale2 = float(np.sqrt(3.0) / 2.0 / 2147483648.0)

    def uniform2_normal(shape):
        b1 = pltpu.prng_random_bits(shape).astype(jnp.float32)
        b2 = pltpu.prng_random_bits(shape).astype(jnp.float32)
        return (b1 + b2) * scale2

    out_f = open(os.path.join(repo, args.out), "a")

    stand_ins = {"bm": bm_normal, "uniform": uniform_normal,
                 "uniform2": uniform2_normal}
    for noise in args.noise:
        K._normal_bits = stand_ins[noise]
        for g in args.strides:
            K.svol_filter_pallas.clear_cache()

            def launch(seed):
                total, _, _ = K.svol_filter_pallas(
                    seed, p, ys, num_particles=512, ess_threshold=0.5,
                    gate_stride=g)
                return total

            try:
                t0 = time.perf_counter()
                vals = np.asarray(launch(jnp.uint32(1000)))
                compile_s = time.perf_counter() - t0
                singles, times = [vals], []
                for k in range(args.launches):
                    t0 = time.perf_counter()
                    vals = np.asarray(launch(jnp.uint32(2000 + k)))
                    times.append(time.perf_counter() - t0)
                    singles.append(vals)
                s = np.concatenate(singles[1:])
                rec = {
                    "noise": noise, "gate_stride": g, "rows": args.rows,
                    "N": 512, "T": int(ys.shape[0]),
                    "mean": float(s.mean()), "sd": float(s.std(ddof=1)),
                    "se": float(s.std(ddof=1) / np.sqrt(s.shape[0])),
                    "us_per_row": 1e6 * float(np.min(times)) / args.rows,
                    "props_per_s": args.rows * 512 * int(ys.shape[0])
                    / float(np.min(times)),
                    "compile_s": round(compile_s, 1),
                }
            except Exception as e:  # noqa: BLE001 — record, keep probing
                rec = {"noise": noise, "gate_stride": g,
                       "fail": f"{type(e).__name__}: {str(e)[:200]}"}
            rec_line = json.dumps(rec)
            print(rec_line, flush=True)
            out_f.write(rec_line + "\n")
            out_f.flush()

    K._normal_bits = bm_normal
    out_f.close()


if __name__ == "__main__":
    main()
