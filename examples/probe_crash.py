#!/usr/bin/env python
"""Root-cause probes for the two documented TPU-worker crashes
(VERDICT r4 item 1), plus steady-state chunk-size sweeps.

Round-5 findings (docs/kernels.md "Worker-crash envelope"):

  A. Long single-jit PMMH scans: 500/750/1000 iterations kill the
     worker AT RUN (compiles always succeed); 100/250/400 run clean.
     Per-iteration wall time GROWS with scan length — per-process
     bookkeeping accumulation, not wall clock or launch count.
     Calibrates ``ssme_tpu.inference.pmmh.MAX_SCAN_ITERS`` (the
     run_from/sample auto-chunk guard) — the reference never crashes
     on legal configs (``ada_pmmh_mvn.h:326-372``), so neither may we.
  B. C=128 chains x R=4 (512 rows) at parity: single 30-iteration
     scans pass, but repeated executions in one process (the bench's
     warm+windows pattern) still crash — the per-process budget
     shrinks with row width.  No library row guard (standalone big
     launches are fine); C=64 is the validated bench width.

Each probe runs in its OWN subprocess (a Mosaic/worker fault kills the
whole process; isolation keeps the sweep alive — same rationale as
bench.py's workers) and separates the COMPILE stage from the RUN stage:

  phase="compile": jax.jit(...).lower(...).compile() only
  phase="run":     compile + execute + fetch

Results append to data/probe_crash.jsonl as one JSON line per probe.

Usage:
  python examples/probe_crash.py                 # rows + scan sweeps
  python examples/probe_crash.py --probe short   # safe-floor bisection
  python examples/probe_crash.py --probe chunks  # chunk-size sweep
  python examples/probe_crash.py --probe chunkvar  # mitigation A/B
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)   # runnable by path, incl. worker subprocesses


# ---------------------------------------------------------------------------
# worker: one (probe, config, phase) in this process
# ---------------------------------------------------------------------------

def _worker():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ssme_tpu.io import read_data

    probe = os.environ["PROBE_KIND"]
    phase = os.environ["PROBE_PHASE"]
    ess = float(os.environ.get("PROBE_ESS", "1.0"))
    ys = jnp.asarray(read_data(os.path.join(REPO, "data",
                                            "spy_returns.csv"),
                               num_cols=1))

    if probe == "rows":
        # one kernel launch with the requested ROW count (chains x reps
        # collapsed — the kernel only sees rows), full SPY T, requested
        # schedule.  No PMMH scan: isolates the launch itself.
        from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas
        rows = int(os.environ["PROBE_ROWS"])
        params = jnp.broadcast_to(
            jnp.asarray([1.0, 0.9, 0.35], jnp.float32), (rows, 3))

        fn = jax.jit(lambda key, p: svol_filter_pallas(
            key, p, ys, num_particles=512, ess_threshold=ess)[0])
        t0 = time.time()
        lowered = fn.lower(jax.random.key(0), params)
        compiled = lowered.compile()
        t_compile = time.time() - t0
        if phase == "compile":
            print(json.dumps({"ok": True, "t_compile": t_compile}))
            return
        t0 = time.time()
        out = compiled(jax.random.key(0), params)
        val = float(jnp.sum(out))
        print(json.dumps({"ok": bool(val == val), "t_compile": t_compile,
                          "t_run": time.time() - t0, "sum": val}))
        return

    if probe == "chunks":
        # total wall clock for a FIXED 500-iteration budget at varying
        # host-level chunk sizes: per-iteration cost grows superlinearly
        # WITHIN one device execution (52/90/114 ms/iter at 100/250/400
        # — see docs/kernels.md crash envelope), so smaller chunks may
        # be faster end-to-end despite per-execution overhead.
        from ssme_tpu.inference import AdaptivePMMH
        from ssme_tpu.models import svol
        from ssme_tpu.ops.svol_filter_kernel import (
            svol_pallas_batched_log_like)

        total_iters = int(os.environ.get("PROBE_TOTAL", "500"))
        chunk = int(os.environ["PROBE_CHUNK"])
        chains = int(os.environ.get("PROBE_CHAINS", "64"))
        reps = int(os.environ.get("PROBE_REPS", "4"))
        pmmh = AdaptivePMMH(
            svol.make_model(), num_particles=512, num_replicates=reps,
            t0=150, t1=1000,
            batched_log_like=svol_pallas_batched_log_like(
                512, reps, ess_threshold=ess))
        state = pmmh.init(jax.random.key(0),
                          jnp.asarray(svol.START_TRANS_THETA), ys,
                          num_chains=chains)
        variant = os.environ.get("PROBE_VARIANT", "base")
        if variant == "discard":
            # return ONLY the final state (no stacked per-iteration
            # outputs cross the tunnel / live on device)
            fn = jax.jit(
                lambda st: pmmh._scan_chunk(st, chunk, ys).final_state)

            def step(st):
                return fn(st)
        elif variant == "hostrt":
            # round-trip the carry through HOST numpy between chunks:
            # each chunk starts from freshly-uploaded device buffers,
            # severing all client-side buffer lineage — tests whether
            # the per-process steady-state degradation tracks buffer
            # history rather than rig-internal execution bookkeeping
            import numpy as _np
            fn = jax.jit(
                lambda st: pmmh._scan_chunk(st, chunk, ys).final_state)

            def _rt(a):
                if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
                    return jax.random.wrap_key_data(jnp.asarray(
                        _np.asarray(jax.random.key_data(a))))
                return jnp.asarray(_np.asarray(a))

            def step(st):
                return jax.tree_util.tree_map(_rt, fn(st))
        else:
            fn = jax.jit(lambda st: pmmh._scan_chunk(st, chunk, ys))

            def step(st):
                res = fn(st)
                if variant == "sync":
                    # force completion + host fetch between chunks
                    # (drains any queued-dispatch backlog)
                    float(jnp.sum(res.samples))
                return res.final_state
        state = step(state)                  # compile + warm
        float(jnp.sum(state.trans_theta))
        t0 = time.time()
        done = 0
        while done < total_iters:
            state = step(state)
            done += chunk
        val = float(jnp.sum(state.trans_theta))   # sync
        dt = time.time() - t0
        print(json.dumps({"ok": val == val, "total_iters": done,
                          "chunk": chunk, "variant": variant,
                          "wall": dt,
                          "ms_per_iter": 1e3 * dt / done}))
        return

    if probe == "scan":
        # one PMMH run_from scan of the requested length in ONE jit at
        # C chains x R replicates (the flagship path).  split=k runs
        # each iteration's kernel rows as k sequential launches of
        # rows/k (the candidate row-width guard mechanism).
        import jax.numpy as jnp  # noqa: F811

        from ssme_tpu.inference import AdaptivePMMH
        from ssme_tpu.models import svol
        from ssme_tpu.ops.svol_filter_kernel import (
            svol_pallas_batched_log_like)

        iters = int(os.environ["PROBE_ITERS"])
        chains = int(os.environ.get("PROBE_CHAINS", "64"))
        reps = int(os.environ.get("PROBE_REPS", "4"))
        split = int(os.environ.get("PROBE_SPLIT", "1"))
        if split > 1:
            base = svol_pallas_batched_log_like(512, reps,
                                                ess_threshold=ess)

            def batched_ll(key, params, ys_in):
                import jax as _jax
                c = params.shape[0]
                outs = [base(_jax.random.fold_in(key, i),
                             params[i * (c // split):
                                    (i + 1) * (c // split)], ys_in)
                        for i in range(split)]
                return jnp.concatenate(outs)
        else:
            batched_ll = svol_pallas_batched_log_like(
                512, reps, ess_threshold=ess)
        model = svol.make_model()
        pmmh = AdaptivePMMH(
            model, num_particles=512, num_replicates=reps,
            t0=150, t1=1000, batched_log_like=batched_ll)
        state = pmmh.init(jax.random.key(0),
                          jnp.asarray(svol.START_TRANS_THETA), ys,
                          num_chains=chains)
        fn = jax.jit(lambda st: pmmh.run_from(st, iters, ys))
        t0 = time.time()
        compiled = fn.lower(state).compile()
        t_compile = time.time() - t0
        if phase == "compile":
            print(json.dumps({"ok": True, "t_compile": t_compile}))
            return
        t0 = time.time()
        res = compiled(state)
        val = float(jnp.sum(res.samples))
        print(json.dumps({"ok": bool(val == val), "t_compile": t_compile,
                          "t_run": time.time() - t0, "sum": val}))
        return

    raise SystemExit(f"unknown probe {probe!r}")


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _launch(probe, phase, timeout, **cfg):
    env = dict(os.environ)
    env["PROBE_MODE"] = "worker"
    env["PROBE_KIND"] = probe
    env["PROBE_PHASE"] = phase
    for k, v in cfg.items():
        env[f"PROBE_{k.upper()}"] = str(v)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=timeout)
        rc = proc.returncode
        note = (proc.stdout.strip().split("\n") or [""])[-1][:300]
        err = (proc.stderr.strip().split("\n") or [""])[-1][:300]
    except subprocess.TimeoutExpired:
        rc, note, err = -9, "TIMEOUT", ""
    rec = {"probe": probe, "phase": phase, **cfg, "rc": rc,
           "elapsed": round(time.time() - t0, 1), "note": note,
           "stderr_tail": err}
    line = json.dumps(rec)
    print(line, flush=True)
    with open(os.path.join(REPO, "data", "probe_crash.jsonl"), "a") as f:
        f.write(line + "\n")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe",
                    choices=["rows", "scan", "all", "short", "all2",
                             "chunks", "chunkvar"],
                    default="all")
    ap.add_argument("--timeout", type=int, default=2400)
    args = ap.parse_args()

    if args.probe in ("rows", "all"):
        # 256 = validated control; 512 = documented crash.  Bisect 384,
        # and check whether the ADAPTIVE schedule crashes at 512 too.
        for rows, ess in ((256, 1.0), (512, 1.0), (384, 1.0),
                          (512, 0.5)):
            rec = _launch("rows", "compile", args.timeout,
                          rows=rows, ess=ess)
            if rec["rc"] == 0:
                _launch("rows", "run", args.timeout, rows=rows, ess=ess)

    if args.probe in ("scan", "all"):
        # 500 = validated control; 1000 = documented crash; bisect 750.
        for iters, ess in ((500, 0.5), (1000, 0.5), (750, 0.5)):
            rec = _launch("scan", "compile", args.timeout,
                          iters=iters, ess=ess)
            if rec["rc"] == 0:
                _launch("scan", "run", args.timeout, iters=iters,
                        ess=ess)

    if args.probe == "chunks":
        for chunk in (25, 50, 100, 250):
            _launch("chunks", "run", args.timeout, chunk=chunk, ess=0.5)

    if args.probe == "chunkvar":
        for variant in ("base", "sync", "discard", "hostrt"):
            _launch("chunks", "run", args.timeout, chunk=100, ess=0.5,
                    variant=variant)

    if args.probe in ("short", "all2"):
        # round-5 finding: 500 ALSO crashes at run — find the safe
        # floor (250 = sample()'s long-validated chunk) and repro the
        # C=128-parity crash in its original scan context, plus
        # repetition to probe nondeterminism
        for iters, ess, chains, reps, split in (
                (250, 0.5, 64, 4, 1),
                (250, 0.5, 64, 4, 1),
                (100, 0.5, 64, 4, 1),
                (400, 0.5, 64, 4, 1),
                (30, 1.0, 128, 4, 1),
                (30, 1.0, 128, 4, 1),
                (30, 1.0, 128, 4, 2),   # candidate guard: 2 x 256-row
                (250, 0.5, 128, 4, 2)):  # guard at depth too
            _launch("scan", "run", args.timeout, iters=iters, ess=ess,
                    chains=chains, reps=reps, split=split)


if __name__ == "__main__":
    if os.environ.get("PROBE_MODE") == "worker":
        _worker()
    else:
        main()
