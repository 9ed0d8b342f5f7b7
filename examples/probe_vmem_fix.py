#!/usr/bin/env python
"""Hardware probe for the round-3 parity-schedule VMEM fix.

Round 2 shipped a regression: `svol_filter_pallas(..., ess_threshold=1.0)`
(the reference-parity resample-every-step schedule) failed TPU compilation
with a scoped-VMEM overflow because the blocked selector's transients were
straight-line inlined `steps_per_cell` times per grid cell (BENCH_r02).
The fix wraps every substep advance in its own pl.when region so Mosaic
stack-allocates each region's transients separately.

This probe, on the real chip:
  1. compiles + runs the parity schedule at spc=8 and spc=4, n=512
  2. compiles + runs the adaptive schedule (regression check)
  3. statistically compares parity vs adaptive likelihoods (unbiasedness)
  4. probes the REAL particle cap: n in (1024, 2048, 4096) at both
     schedules (sets MAX_KERNEL_PARTICLES honestly)
  5. compiles + runs APF mode at spc=8 (same straight-line structure)
  6. LW megakernel at its cap n=1024 (dense LT design)

Each check prints one line; a compile failure is caught per check so the
probe reports everything it can before a worker crash (run checks in
order of increasing risk).
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

    if jax.devices()[0].platform != "tpu":
        print("needs TPU", file=sys.stderr)
        return 2

    from ssme_tpu.ops.filter_megakernel import (filter_megakernel,
                                                svol_kernel_model)
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas

    T = 384
    ys = 0.5 * jax.random.normal(jax.random.key(1), (T,))
    B = 16
    rows512 = jnp.broadcast_to(jnp.array([1.0, 0.9, 0.2]), (B, 3))

    def run(name, fn):
        t0 = time.time()
        try:
            out = fn()
            val = float(np.asarray(out).mean())
            print(f"OK   {name}: mean={val:.3f} ({time.time()-t0:.1f}s)",
                  flush=True)
            return val
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"FAIL {name}: {type(e).__name__}: {msg} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            return None

    # 1. parity schedule, the round-2 regression
    p8 = run("parity n=512 spc=8",
             lambda: svol_filter_pallas(7, rows512, ys, num_particles=512,
                                        ess_threshold=1.0,
                                        steps_per_cell=8)[0])
    run("parity n=512 spc=4",
        lambda: svol_filter_pallas(7, rows512, ys, num_particles=512,
                                   ess_threshold=1.0, steps_per_cell=4)[0])

    # 2. adaptive regression check
    a8 = run("adaptive n=512 spc=8",
             lambda: svol_filter_pallas(7, rows512, ys, num_particles=512,
                                        ess_threshold=0.5,
                                        steps_per_cell=8)[0])

    # 3. unbiasedness: parity vs adaptive should agree in mean
    if p8 is not None and a8 is not None:
        gap = abs(p8 - a8)
        print(f"{'OK  ' if gap < 2.0 else 'WARN'} parity-vs-adaptive "
              f"gap={gap:.3f}", flush=True)

    # 4. particle cap sweep (both schedules)
    for n in (1024, 2048, 4096):
        rn = jnp.broadcast_to(jnp.array([1.0, 0.9, 0.2]), (8, 3))
        run(f"parity n={n} spc=8",
            lambda n=n, rn=rn: svol_filter_pallas(
                7, rn, ys, num_particles=n, ess_threshold=1.0,
                steps_per_cell=8)[0])
        run(f"adaptive n={n} spc=8",
            lambda n=n, rn=rn: svol_filter_pallas(
                7, rn, ys, num_particles=n, ess_threshold=0.5,
                steps_per_cell=8)[0])

    # 5. APF mode (same straight-line inlining structure pre-fix)
    run("apf factory n=512 spc=8",
        lambda: filter_megakernel(svol_kernel_model(), 7, rows512, ys,
                                  num_particles=512, mode="apf")[0])

    # 6. LW megakernel at its dense-LT cap
    from ssme_tpu.ops.liu_west_megakernel import (
        lw_megakernel, svol_leverage_lw_kernel_model)
    ysl = 0.1 * jax.random.normal(jax.random.key(3), (T,))
    zsl = jnp.concatenate([jnp.zeros((1,)), ysl[:-1]])
    run("lw factory n=1024 (cap)",
        lambda: lw_megakernel(svol_leverage_lw_kernel_model(), 31, ysl,
                              zs=zsl, num_filters=2, num_particles=1024,
                              variant="apf")["log_likelihood"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
