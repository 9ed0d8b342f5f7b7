#!/usr/bin/env python
"""Benchmark: the reference PMMH workload on TPU.

Workload definition (BASELINE.md): univariate-SVOL adaptive PMMH over
T=3083 SPY daily returns (data/spy_returns.csv), 500+ particles per
filter, multiple independent PF replicates per MCMC iteration — the
reference's `./ssme_example ... 100 100` configuration
(reference example/main.cpp:9-13, README.md:30).

Metric: particle-propagations per second per chip =
iters * chains * replicates * particles * T / wall_time.
North star (BASELINE.json): >= 1e8 props/s/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(impl, num_particles, num_replicates, num_chains, num_iters, ys):
    from ssme_tpu.inference import AdaptivePMMH
    from ssme_tpu.models import svol

    model = svol.make_model()
    batched_ll = None
    if impl == "pallas" and jax.devices()[0].platform == "tpu":
        from ssme_tpu.ops.svol_filter_kernel import (
            svol_pallas_batched_log_like)
        # BENCH_ESS: resampling gate (0.5 = adaptive default; 1.0 =
        # every-step, the reference's exact schedule)
        ess_threshold = float(os.environ.get("BENCH_ESS", 0.5))
        batched_ll = svol_pallas_batched_log_like(
            num_particles, num_replicates, ess_threshold=ess_threshold)
    pmmh = AdaptivePMMH(model, num_particles=num_particles,
                        num_replicates=num_replicates, t0=150, t1=1000,
                        batched_log_like=batched_ll)
    start = jnp.asarray(svol.START_TRANS_THETA)

    state = pmmh.init(jax.random.key(0), start, ys, num_chains=num_chains)
    run = jax.jit(lambda st: pmmh.run_from(st, num_iters, ys))

    # compile + warm up.  NOTE: block_until_ready does not actually block
    # on the remote-tunnel platform; a host scalar fetch is the only
    # reliable synchronization point.
    res = run(state)
    float(jnp.sum(res.samples))
    state = res.final_state

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = run(state)
        float(jnp.sum(res.samples))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from ssme_tpu.io import read_data

    # persistent compile cache: the first compile via the remote service
    # is slow and occasionally flaky — cache across invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    # workload scale (env-overridable for quick runs)
    num_particles = int(os.environ.get("BENCH_PARTICLES", 512))
    num_replicates = int(os.environ.get("BENCH_REPLICATES", 16))
    num_chains = int(os.environ.get("BENCH_CHAINS", 8))
    num_iters = int(os.environ.get("BENCH_ITERS", 4))
    impl = os.environ.get("BENCH_IMPL", "pallas")  # pallas | xla
    baseline = 1e8  # north-star props/s/chip (BASELINE.json)

    data_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "spy_returns.csv")
    ys = jnp.asarray(read_data(data_path, num_cols=1))
    t_len = ys.shape[0]

    try:
        elapsed = _measure(impl, num_particles, num_replicates, num_chains,
                           num_iters, ys)
    except Exception as e:  # pallas path failed: fall back to generic XLA
        print(f"bench impl {impl!r} failed ({type(e).__name__}: {e}); "
              f"falling back to xla", file=sys.stderr)
        impl = "xla"
        elapsed = _measure(impl, num_particles, num_replicates, num_chains,
                           num_iters, ys)

    props = (num_iters * num_chains * num_replicates
             * num_particles * t_len)
    props_per_sec = props / elapsed
    n_chips = max(1, len(jax.devices()))
    value = props_per_sec / n_chips

    print(json.dumps({
        "metric": "pmmh_particle_propagations_per_sec_per_chip",
        "value": value,
        "unit": "propagations/s/chip",
        "vs_baseline": value / baseline,
    }))

    # supporting detail on stderr (not part of the contract)
    print(f"config: T={t_len} N={num_particles} R={num_replicates} "
          f"C={num_chains} iters={num_iters} impl={impl} "
          f"elapsed={elapsed:.3f}s devices={n_chips}", file=sys.stderr)


if __name__ == "__main__":
    main()
