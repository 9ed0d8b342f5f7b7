#!/usr/bin/env python
"""A/B the O(n) Metropolis in-kernel resampler against the dense
systematic selector (VERDICT r3 item 4).

Measures, on the chip, at the SPY posterior mode (theta*):

1. evidence-estimator MEAN and SD per (resampler, schedule, B sweeps)
   over many independent kernel rows — Metropolis resampling is biased
   at finite sweep count; the bias shows up directly as a shift of the
   mean log-evidence vs the unbiased systematic baseline (resolution
   ~0.05 nats at 1024 rows);
2. throughput (sec per row) per configuration;
3. the particle-cap question: whether N = 2048 / 4096 compile and run
   under the Metropolis path (the dense selector's (n, n) matrices cap
   it at 1024).

Run:  python examples/probe_metropolis.py --out data/probe_metropolis.jsonl
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THETA_STAR = (0.849, 0.9744, 0.0659)


def run_config(n, resampler, ess, iters_b, rows, ys, seed0, launches):
    import jax
    import jax.numpy as jnp

    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    beta, phi, ss = THETA_STAR
    p = jnp.broadcast_to(
        jnp.asarray([beta, phi, np.sqrt(ss)], jnp.float32), (rows, 3))

    @jax.jit
    def launch(seed):
        total, _, _ = svol_filter_pallas(
            seed, p, ys, num_particles=n, ess_threshold=ess,
            resampler=resampler, metropolis_iters=iters_b)
        return total

    singles, times = [], []
    for k in range(launches):
        t0 = time.perf_counter()
        vals = np.asarray(launch(jnp.uint32(seed0 + k)))
        times.append(time.perf_counter() - t0)
        if not np.all(np.isfinite(vals)):
            raise RuntimeError(f"non-finite at n={n} {resampler}")
        singles.append(vals)
    s = np.concatenate(singles)
    warm = times[1:] if len(times) > 1 else times
    return {
        "N": n, "resampler": resampler, "ess": ess,
        "metropolis_iters": (iters_b if resampler == "metropolis" else None),
        "rows": int(s.shape[0]),
        "mean": float(s.mean()),
        "se": float(s.std(ddof=1) / np.sqrt(s.shape[0])),
        "sd": float(s.std(ddof=1)),
        "sec_per_row": float(np.mean(warm)) / rows,
        "compile_s": times[0],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--launches", type=int, default=2)
    ap.add_argument("--t-len", type=int, default=0)
    ap.add_argument("--out", default="data/probe_metropolis.jsonl")
    ap.add_argument("--caps", type=int, nargs="*", default=[2048, 4096],
                    help="metropolis-only N values to compile-check")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssme_tpu.io import read_data

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    data_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "data", "spy_returns.csv")
    ys = jnp.asarray(read_data(data_path, num_cols=1)).reshape(-1)
    if args.t_len:
        ys = ys[: args.t_len]

    out_f = open(args.out, "a")

    def emit(rec):
        rec["T"] = int(ys.shape[0])
        print(json.dumps(rec))
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()

    # 1+2: bias + throughput at N=512, both schedules
    for ess in (1.0, 0.5):
        emit(run_config(512, "systematic", ess, 0, args.rows, ys,
                        1000, args.launches))
        for b in (8, 16, 32):
            emit(run_config(512, "metropolis", ess, b, args.rows, ys,
                            2000 + b, args.launches))

    # 3: cap probe (metropolis only; systematic fails compile above 1024)
    for n in args.caps:
        try:
            rec = run_config(n, "metropolis", 0.5, 16, 64, ys, 3000, 2)
            rec["cap_check"] = "ok"
        except Exception as e:  # noqa: BLE001 — report, keep probing
            rec = {"N": n, "resampler": "metropolis", "cap_check":
                   f"FAIL: {type(e).__name__}: {str(e)[:200]}"}
        emit(rec)
    out_f.close()


if __name__ == "__main__":
    main()
