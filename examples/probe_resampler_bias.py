#!/usr/bin/env python
"""Resampler A/B on the chip: rejection (unbiased, VERDICT r4 item 2)
vs Metropolis-at-B vs the dense systematic selector — evidence mean/sd
and wall clock per row, on TWO models (VERDICT r4 item 6's two-model
bias fit):

- univ-SVOL at the SPY posterior mode (hand kernel, the flagship);
- SVOL-with-leverage at its SPY posterior means (factory megakernel,
  covariate path).

Also times the rejection resampler at the PARITY schedule (it is
unbiased, so if it beats the dense selector per row it can lift the
honest reference-parity number — VERDICT r4 weak item 5) and at the
N=2048/4096 cap-lift sizes.

Appends one JSON line per configuration to data/probe_resampler.jsonl:
  {"model": ..., "N": ..., "resampler": ..., "ess": ..., "B": ...,
   "rows": ..., "mean": ..., "se": ..., "sd": ..., "sec_per_row": ...}

Run:  python examples/probe_resampler_bias.py [--rows 512] [--launches 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SVOL_THETA_STAR = (0.849, 0.9744, 0.0659)          # (beta, phi, ss)
LEV_THETA_STAR = (0.9578, -0.0914, 0.3109, -0.7501)  # (phi, mu, sigma, rho)


def run_config(model, n, resampler, ess, iters_b, rows, ys, zs, seed0,
               launches, gate_stride=1):
    import jax
    import jax.numpy as jnp

    if model == "svol":
        from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

        beta, phi, ss = SVOL_THETA_STAR
        p = jnp.broadcast_to(
            jnp.asarray([beta, phi, np.sqrt(ss)], jnp.float32), (rows, 3))

        @jax.jit
        def launch(seed):
            total, _, _ = svol_filter_pallas(
                seed, p, ys, num_particles=n, ess_threshold=ess,
                resampler=resampler, metropolis_iters=iters_b or 16,
                gate_stride=gate_stride)
            return total
    else:
        from ssme_tpu.ops.filter_megakernel import (
            filter_megakernel, svol_leverage_kernel_model)

        km = svol_leverage_kernel_model()
        p = jnp.broadcast_to(jnp.asarray(LEV_THETA_STAR, jnp.float32),
                             (rows, 4))

        @jax.jit
        def launch(seed):
            total, _, _ = filter_megakernel(
                km, seed, p, ys, zs, num_particles=n, ess_threshold=ess,
                resampler=resampler, metropolis_iters=iters_b or 16)
            return total

    singles, times = [], []
    for k in range(launches):
        t0 = time.perf_counter()
        vals = np.asarray(launch(jnp.uint32(seed0 + k)))
        times.append(time.perf_counter() - t0)
        if not np.all(np.isfinite(vals)):
            raise RuntimeError(f"non-finite at {model} n={n} {resampler}")
        singles.append(vals)
    s = np.concatenate(singles)
    warm = times[1:] if len(times) > 1 else times
    return {
        "model": model, "N": n, "resampler": resampler, "ess": ess,
        "gate_stride": gate_stride,
        "B": (iters_b if resampler == "metropolis" else None),
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
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--out", default="data/probe_resampler.jsonl")
    ap.add_argument("--skip-caps", action="store_true")
    ap.add_argument("--models", nargs="*", default=["svol", "leverage"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssme_tpu.io import read_data

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ys = jnp.asarray(read_data(os.path.join(repo, "data",
                                            "spy_returns.csv"),
                               num_cols=1)).reshape(-1)
    zs = jnp.concatenate([jnp.zeros((1,)), ys[:-1]]).reshape(-1, 1)

    out_f = open(os.path.join(repo, args.out), "a")

    def emit(rec):
        rec["T"] = int(ys.shape[0])
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()

    for model in args.models:
        zz = zs if model == "leverage" else None
        # adaptive: baseline + Metropolis bias curve + rejection
        emit(run_config(model, 512, "systematic", 0.5, 0, args.rows,
                        ys, zz, 1000, args.launches))
        for b in (4, 8, 16, 32):
            emit(run_config(model, 512, "metropolis", 0.5, b, args.rows,
                            ys, zz, 2000 + b, args.launches))
        emit(run_config(model, 512, "rejection", 0.5, 0, args.rows,
                        ys, zz, 4000, args.launches))
        # parity: the unbiased-alternative speed question (weak item 5)
        emit(run_config(model, 512, "systematic", 1.0, 0, args.rows,
                        ys, zz, 5000, args.launches))
        emit(run_config(model, 512, "rejection", 1.0, 0, args.rows,
                        ys, zz, 6000, args.launches))
        # metropolis parity B=4 extends the round-4 bias curve downward
        if model == "svol":
            emit(run_config(model, 512, "metropolis", 1.0, 4, args.rows,
                            ys, zz, 7000, args.launches))
            # gate_stride sweep (the transcendental-ceiling lever):
            # timing + distributional agreement with stride 1
            for g in (4, 8):
                emit(run_config(model, 512, "systematic", 0.5, 0,
                                args.rows, ys, zz, 9000 + g,
                                args.launches, gate_stride=g))

    if not args.skip_caps:
        for n in (2048, 4096):
            try:
                rec = run_config("svol", n, "rejection", 0.5, 0, 64, ys,
                                 None, 8000 + n, 2)
                rec["cap_check"] = "ok"
            except Exception as e:  # noqa: BLE001 — report, keep probing
                rec = {"model": "svol", "N": n, "resampler": "rejection",
                       "cap_check":
                       f"FAIL: {type(e).__name__}: {str(e)[:200]}"}
            emit(rec)
    out_f.close()


if __name__ == "__main__":
    main()
