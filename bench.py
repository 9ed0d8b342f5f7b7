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

Two schedules are measured and reported (VERDICT r1 "honest bench"):

- ``parity``: resample EVERY step (ess_threshold=1.0) — the reference's
  exact schedule (liu_west_filter.h:480-481 with rs=1, and pf's
  bootstrap filter default).  Apples-to-apples.
- ``adaptive``: ESS-gated resampling at threshold 0.5 — the standard
  modern schedule (evidence estimator stays unbiased); the headline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "parity": N, "adaptive": N}

Modes (env BENCH_MODE):
  flagship (default) — the two-schedule single-chip number above.  Each
                       (impl, schedule) measurement runs in its OWN
                       SUBPROCESS: a Mosaic kernel fault kills the TPU
                       worker process, so only process isolation lets
                       the XLA fallback survive a Pallas failure
                       (VERDICT r2 item 2 / BENCH_r02 post-mortem).
  scaling            — sweep the chain axis over 1..D devices of the
                       current platform and print per-device-count
                       throughput + parallel efficiency (BASELINE.md
                       north-star row: scaling efficiency at 1 chip /
                       1 host / >= 2 hosts; on this rig: the 8-virtual-
                       device CPU mesh or the single real chip).
  worker             — internal: one measurement (used by flagship).
"""

import json
import os
import subprocess
import sys
import time


def _sync(x):
    """Reliable device sync: block_until_ready does not actually block
    on the remote-tunnel platform; a host scalar fetch does."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def _time_best(run, state, windows=2):
    """Compile + warm once, then best-of-``windows`` timing (see _sync
    for the remote-tunnel synchronization caveat)."""
    res = run(state)
    _sync(res.samples)
    state = res.final_state
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        res = run(state)
        _sync(res.samples)
        best = min(best, time.perf_counter() - t0)
    return best


def _measure(impl, num_particles, num_replicates, num_chains, num_iters,
             ys, ess_threshold, windows=2, gate_stride=1):
    # BENCH_SPC: steps_per_cell A/B knob (pallas path only)
    import jax
    import jax.numpy as jnp

    from ssme_tpu.inference import AdaptivePMMH
    from ssme_tpu.models import svol

    model = svol.make_model()
    if impl == "pallas" and jax.devices()[0].platform == "tpu":
        from ssme_tpu.ops.svol_filter_kernel import (
            svol_pallas_batched_log_like)
        batched_ll = svol_pallas_batched_log_like(
            num_particles, num_replicates, ess_threshold=ess_threshold,
            gate_stride=(gate_stride if ess_threshold < 1.0 else 1),
            steps_per_cell=int(os.environ.get("BENCH_SPC", 8)))
    else:
        # generic XLA filter bank with the SAME schedule semantics:
        # ess_threshold must reach this path too, or the "adaptive"
        # schedule would silently re-measure the parity configuration
        from ssme_tpu.filters import replicated_log_like_fn
        batched_ll = replicated_log_like_fn(
            model, num_particles, num_replicates, resample_every=1,
            ess_threshold=(None if ess_threshold >= 1.0
                           else float(ess_threshold)))
    pmmh = AdaptivePMMH(model, num_particles=num_particles,
                        num_replicates=num_replicates, t0=150, t1=1000,
                        batched_log_like=batched_ll,
                        resample_every=1)
    start = jnp.asarray(svol.START_TRANS_THETA)

    state = pmmh.init(jax.random.key(0), start, ys, num_chains=num_chains)
    run = jax.jit(lambda st: pmmh.run_from(st, num_iters, ys))
    return _time_best(run, state, windows)


def _worker():
    """Measure ONE (impl, schedule) configuration and print its elapsed
    seconds as a JSON line.  Runs in a SUBPROCESS of the flagship mode:
    a Mosaic kernel fault crashes the whole TPU worker process, so an
    in-process fallback can never survive the failure mode it exists
    for (BENCH_r02: the parity-schedule compile failure poisoned the
    XLA fallback too).  Process isolation makes each configuration's
    failure independent."""
    import jax
    import jax.numpy as jnp

    from ssme_tpu.io import read_data

    impl = os.environ["BENCH_WORKER_IMPL"]
    ess = float(os.environ["BENCH_WORKER_ESS"])
    if os.environ.get("BENCH_FAULT") == impl:
        # test hook: simulate the round-2 failure mode (a kernel fault
        # killing this worker process) to prove the fallback survives
        raise RuntimeError(f"injected {impl} fault (BENCH_FAULT)")
    num_particles = int(os.environ.get("BENCH_PARTICLES", 512))
    num_replicates = int(os.environ.get("BENCH_REPLICATES", 16))
    num_chains = int(os.environ.get("BENCH_CHAINS", 8))
    num_iters = int(os.environ.get("BENCH_ITERS", 30))
    # gate_stride=8 is the round-5 adaptive default: LSE/ESS checks
    # every 8 steps (weights accumulate un-renormalized between) —
    # measured 2.1x adaptive throughput at an exactly-telescoping
    # evidence, with the SPY accuracy gate passing at stride 8
    # (docs/kernels.md "gate_stride"; data/accuracy_gate_stride8.json).
    # Cross-cell strides 16/32 run faster per iteration (194/148 vs
    # 231 us/row) but were REJECTED as the default: their higher
    # estimator sd collapses PMMH acceptance (3.4 vs 18.8 ESS/s on the
    # 10k flagship at stride 16) — the Doucet-Pitt variance optimum
    # binds before the throughput gain pays.  The parity schedule
    # always runs stride 1.
    gate_stride = int(os.environ.get("BENCH_GATE_STRIDE", 8))

    data_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "spy_returns.csv")
    ys = jnp.asarray(read_data(data_path, num_cols=1))
    elapsed = _measure(impl, num_particles, num_replicates, num_chains,
                       num_iters, ys, ess, gate_stride=gate_stride)
    print(json.dumps({"elapsed": elapsed, "impl": impl,
                      "t_len": int(ys.shape[0]),
                      "devices": max(1, len(jax.devices()))}))


def _run_worker(impl, ess):
    """Launch one measurement subprocess; returns its parsed JSON dict
    or None on any failure (nonzero rc, crash, unparseable output)."""
    env = dict(os.environ)
    env["BENCH_MODE"] = "worker"
    env["BENCH_WORKER_IMPL"] = impl
    env["BENCH_WORKER_ESS"] = repr(ess)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True,
            timeout=int(os.environ.get("BENCH_WORKER_TIMEOUT", 3600)))
    except subprocess.TimeoutExpired:
        print(f"bench worker impl={impl!r} ess={ess} timed out",
              file=sys.stderr)
        return None
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        tail = proc.stdout.strip().split("\n")[-1][:400]
        print(f"bench worker impl={impl!r} ess={ess} exited "
              f"rc={proc.returncode}: {tail}", file=sys.stderr)
        return None
    for line in reversed(proc.stdout.strip().split("\n")):
        try:
            out = json.loads(line)
            if "elapsed" in out:
                return out
        except ValueError:
            continue
    print(f"bench worker impl={impl!r} ess={ess}: no JSON line in output",
          file=sys.stderr)
    return None


def _roofline(props_per_sec, num_particles, schedule, gate_stride=1):
    """Analytic per-propagation op budget vs the chip's MEASURED
    per-resource rates (examples/probe_roofline.py ->
    data/roofline.jsonl).  Returns {resource: utilization} + the
    binding resource, or None when no roofline measurements exist.

    Counts per particle-step (docs/kernels.md "Roofline"):
    - transcendentals: a paired Box-Muller half-share (log + sqrt +
      cos + sqrt per TWO normals — the sine comes from the
      sgn*sqrt(1-cos^2) identity since cos/sin measure ~2.5x slower
      than exp/log/sqrt on this chip), one weight exp, and one LSE/ESS
      exp per gate_stride steps;
    - VPU f32: ~12 FMA-equivalents after fusion (fewer under
      gate_stride, kept as an upper count);
    - MXU (parity schedule only): dense-selector matmuls ~20 n flops
      per particle.

    The utilizations are SERIAL-SUM lower bounds per unit: the VPU
    overlaps its transcendental and FMA pipes, so totals above 1.0
    indicate cross-pipe overlap rather than measurement error (the
    round-5 gate_stride result exceeded the exp-only model; the
    per-op probe exists because of it).
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "roofline.jsonl")
    if not os.path.exists(path):
        return None
    peaks = {}
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get("platform") == "tpu":
                peaks[r["resource"]] = r
    if not {"vpu_fma_f32", "vpu_exp_f32", "mxu_f32_default"} <= set(peaks):
        return None

    def rate(name, fallback):
        return peaks.get(name, {"elems_per_s": fallback})["elems_per_s"]

    exp_r = peaks["vpu_exp_f32"]["elems_per_s"]
    log_r = rate("vpu_log_f32", exp_r)
    sqrt_r = rate("vpu_sqrt_f32", exp_r)
    cos_r = rate("vpu_cos_f32", exp_r)
    # per-prop transcendental time: half a BM pair + weight exp +
    # gate-stride-amortized LSE exp
    t_bm_pair = 1.0 / log_r + 2.0 / sqrt_r + 1.0 / cos_r
    t_transc = (t_bm_pair / 2.0
                + (1.0 + 1.0 / max(1, gate_stride)) / exp_r)
    util = {
        "transcendental": props_per_sec * t_transc,
        "vpu": (12.0 * props_per_sec
                / peaks["vpu_fma_f32"]["elems_per_s"]),
    }
    if schedule == "parity":
        util["mxu"] = (20.0 * num_particles * props_per_sec
                       / peaks["mxu_f32_default"]["flops_per_s"])
    binding = max(util, key=util.get)
    return {"utilization": {k: round(v, 4) for k, v in util.items()},
            "binding_resource": binding,
            "binding_utilization": round(util[binding], 4),
            "note": "serial-sum lower bounds per unit; >1 means "
                    "cross-pipe overlap"}


def _flagship():
    # workload scale (env-overridable for quick runs).  BENCH_ITERS=30:
    # a >= 30-iteration timing window per VERDICT r1 (stable best-of-2).
    # Defaults C=64 x R=4 (256 kernel rows/iteration vs the round-3
    # 8 x 16 = 128): R=4 sits INSIDE the measured Doucet-Pitt variance
    # optimum (Var[log L-hat] = 1.02 at N=512 vs 0.43 over-provisioned
    # at R=16 — examples/tune_variance.py) and 64 chains multiply
    # independent samples; the doubled row count amortizes fixed
    # per-cell overhead (measured superlinear: 256 rows ~4x the
    # props/s of 128).  C=128 at the parity schedule crashes the TPU
    # worker (reproduced twice) — 64 is the validated chain width.
    # For max ESS/s specifically, R=2 measured best (data/tune_pmmh
    # .jsonl); the CLI's --tuned preset uses that.
    num_particles = int(os.environ.get("BENCH_PARTICLES", 512))
    num_replicates = int(os.environ.get("BENCH_REPLICATES", 4))
    num_chains = int(os.environ.get("BENCH_CHAINS", 64))
    num_iters = int(os.environ.get("BENCH_ITERS", 30))
    impl = os.environ.get("BENCH_IMPL", "pallas")  # pallas | xla
    baseline = 1e8  # north-star props/s/chip (BASELINE.json)

    def run_schedule(ess):
        nonlocal impl
        out = _run_worker(impl, ess)
        if out is None and impl != "xla":
            # pallas path failed IN ITS OWN PROCESS: the XLA fallback
            # starts from a fresh TPU client, immune to the crash
            print(f"bench impl {impl!r} failed; falling back to xla in a "
                  "fresh process", file=sys.stderr)
            impl = "xla"
            out = _run_worker(impl, ess)
        if out is None:
            raise SystemExit(f"bench: no implementation survived "
                             f"schedule ess={ess}")
        return out

    out_parity = run_schedule(1.0)
    # (t_len/devices resolved by the workers; both see the same data)
    t_len = out_parity["t_len"]
    n_chips = out_parity["devices"]
    props = (num_iters * num_chains * num_replicates
             * num_particles * t_len)

    def throughput(out):
        return props / out["elapsed"] / n_chips

    # reference-parity schedule ran first (resample every step); now the
    # adaptive headline
    parity, t_parity, impl_parity = (throughput(out_parity),
                                     out_parity["elapsed"],
                                     out_parity["impl"])
    out_adaptive = run_schedule(float(os.environ.get("BENCH_ESS", 0.5)))
    adaptive, t_adaptive, impl_adaptive = (throughput(out_adaptive),
                                           out_adaptive["elapsed"],
                                           out_adaptive["impl"])
    if impl_parity != impl_adaptive:
        # a mid-run fallback mixed implementations: the two schedule
        # numbers are no longer comparable to each other
        print(f"WARNING: parity measured on {impl_parity!r} but adaptive "
              f"on {impl_adaptive!r} (fallback mid-run) — the schedule "
              "comparison is cross-implementation", file=sys.stderr)

    print(json.dumps({
        "metric": "pmmh_particle_propagations_per_sec_per_chip",
        "value": adaptive,
        "unit": "propagations/s/chip",
        "vs_baseline": adaptive / baseline,
        "parity": parity,
        "adaptive": adaptive,
        "impl": {"parity": impl_parity, "adaptive": impl_adaptive},
        "mfu_estimate": {
            "parity": _roofline(parity, num_particles, "parity"),
            "adaptive": _roofline(adaptive, num_particles, "adaptive",
                                  gate_stride=int(os.environ.get(
                                      "BENCH_GATE_STRIDE", 8))),
        },
    }))

    # supporting detail on stderr (not part of the contract)
    print(f"config: T={t_len} N={num_particles} R={num_replicates} "
          f"C={num_chains} iters={num_iters} "
          f"impl={impl_parity}/{impl_adaptive} "
          f"devices={n_chips} parity={parity:.3e} ({t_parity:.3f}s) "
          f"adaptive={adaptive:.3e} ({t_adaptive:.3f}s)", file=sys.stderr)


def _scaling():
    """Chain-axis scaling sweep: throughput and parallel efficiency at
    1..D devices (the thread-scaling envelope of thread_pool.h:131-137,
    measured the TPU way: GSPMD-sharded chains over a mesh)."""
    import jax
    import jax.numpy as jnp

    from ssme_tpu import parallel
    from ssme_tpu.inference import AdaptivePMMH
    from ssme_tpu.io import read_data
    from ssme_tpu.models import svol

    num_particles = int(os.environ.get("BENCH_PARTICLES", 256))
    num_replicates = int(os.environ.get("BENCH_REPLICATES", 2))
    chains_per_dev = int(os.environ.get("BENCH_CHAINS", 2))
    num_iters = int(os.environ.get("BENCH_ITERS", 10))
    t_sub = int(os.environ.get("BENCH_T", 512))

    data_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "spy_returns.csv")
    ys = jnp.asarray(read_data(data_path, num_cols=1))[:t_sub]
    t_len = ys.shape[0]

    devices = jax.devices()
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    model = svol.make_model()
    pmmh = AdaptivePMMH(model, num_particles=num_particles,
                        num_replicates=num_replicates, t0=150, t1=1000)
    start = jnp.asarray(svol.START_TRANS_THETA)

    rows = []
    base_per_dev = None
    for d in counts:
        c = chains_per_dev * d
        mesh = parallel.make_mesh(d, 1, devices=devices[:d])
        state = pmmh.init(jax.random.key(0), start, ys, num_chains=c)
        state = parallel.shard_chain_state(state, mesh)
        run_d = parallel.jit_sharded_pmmh(pmmh, mesh, num_iters=num_iters)
        best = _time_best(lambda st: run_d(st, ys), state)
        props = num_iters * c * num_replicates * num_particles * t_len
        thr = props / best
        if base_per_dev is None:
            base_per_dev = thr
        eff = thr / (base_per_dev * d)
        rows.append({"devices": d, "chains": c,
                     "props_per_sec": thr, "parallel_efficiency": eff})
        print(f"devices={d:3d} chains={c:4d} props/s={thr:.3e} "
              f"efficiency={eff:.3f}", file=sys.stderr)

    print(json.dumps({
        "metric": "pmmh_chain_scaling",
        "value": rows[-1]["parallel_efficiency"],
        "unit": "parallel_efficiency_at_max_devices",
        "vs_baseline": rows[-1]["parallel_efficiency"],
        "platform": devices[0].platform,
        "rows": rows,
    }))


def main():
    import jax

    # test/CI hook: BENCH_PLATFORM=cpu pins the benchmark (and its
    # worker subprocesses, which inherit the env) to CPU even where a
    # sitecustomize pre-selects a TPU platform at interpreter boot
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        ndev = os.environ.get("BENCH_CPU_DEVICES")
        if ndev and plat.startswith("cpu"):
            jax.config.update("jax_num_cpu_devices", int(ndev))

    # persistent compile cache: the first compile via the remote service
    # is slow and occasionally flaky — cache across invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    mode = os.environ.get("BENCH_MODE", "flagship")
    if mode == "scaling":
        _scaling()
    elif mode == "worker":
        _worker()
    else:
        _flagship()


if __name__ == "__main__":
    main()
