#!/usr/bin/env python
"""Measure the chip's per-resource speed-of-light for the ops the
megakernels actually use (VERDICT r3 weak item 4: roofline grounding).

Three Pallas microbenchmarks, each a long dependency chain in VMEM so
the measured rate is the sustained per-element issue rate, not HBM:

- vpu:    fused multiply-add chain on an (8, n) f32 register set
- transc: exp() chain on the same shape (the kernels' dominant
          transcendental; Box-Muller's log/cos land in the same unit)
- mxu:    repeated (n, n) @ (n, n) f32 matmul accumulation (the dense
          selector's resource; DEFAULT precision = bf16-input passes,
          exactly what the kernels' CDF/selection matmuls pay)

Prints one JSON line per resource with achieved ops/s.  The bench's
`mfu_estimate` (bench.py) divides the flagship workload's analytic op
counts by these rates; docs/kernels.md records the numbers.

Run:  python examples/probe_roofline.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))  # sync (remote tunnel: block_until_ready lies)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def vpu_rate(rows=8, lanes=512, inner=256, grid=256, streams=24):
    """Sustained f32 FMA elements/s on the VPU.

    ``streams`` INDEPENDENT accumulators interleave so the measurement
    exposes pipelined throughput, not one dependency chain's latency
    (a single chain measured 44 cycles/step — latency-bound)."""
    def kernel(x_ref, o_ref):
        xs = [x_ref[:] * jnp.float32(1.0 + 0.1 * i)
              for i in range(streams)]
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)
        for _ in range(inner):
            xs = [a * x + b for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    x = jnp.ones((rows, lanes), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )(x))
    secs = _time(f, x)
    fmas = rows * lanes * inner * grid * streams
    return {"resource": "vpu_fma_f32", "elems_per_s": fmas / secs,
            "flops_per_s": 2 * fmas / secs, "secs": secs}


def transc_rate(rows=8, lanes=512, inner=64, grid=256, streams=24):
    """Sustained exp() elements/s (independent streams, as vpu_rate)."""
    def kernel(x_ref, o_ref):
        xs = [x_ref[:] * jnp.float32(1.0 + 0.1 * i)
              for i in range(streams)]
        for _ in range(inner):
            xs = [jnp.exp(-x) + jnp.float32(0.5) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    x = jnp.ones((rows, lanes), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )(x))
    secs = _time(f, x)
    n_exp = rows * lanes * inner * grid * streams
    return {"resource": "vpu_exp_f32", "elems_per_s": n_exp / secs,
            "secs": secs}


def unary_rate(name, fn, rows=8, lanes=512, inner=64, grid=256,
               streams=24):
    """Sustained elements/s of an arbitrary unary VPU op (same harness
    as transc_rate) — measures each transcendental's OWN rate: the
    round-5 gate_stride bench exceeded the exp()-only roofline, implying
    log/sqrt/cos are cheaper than exp on this chip."""
    def kernel(x_ref, o_ref):
        xs = [x_ref[:] * jnp.float32(1.0 + 0.1 * i)
              for i in range(streams)]
        for _ in range(inner):
            xs = [fn(x) + jnp.float32(1.5) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    x = jnp.full((rows, lanes), 1.7, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )(x))
    secs = _time(f, x)
    n_ops = rows * lanes * inner * grid * streams
    return {"resource": name, "elems_per_s": n_ops / secs, "secs": secs}


def mxu_rate(n=512, inner=64, grid=64, streams=4):
    """Sustained f32 DEFAULT-precision (n, n) matmul flops/s
    (independent accumulators keep the systolic array fed)."""
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        accs = [a * jnp.float32(1.0 + i) for i in range(streams)]
        for _ in range(inner):
            # the matmul input depends (weakly) on each stream's own
            # accumulator so nothing hoists, while the streams stay
            # independent of EACH OTHER and pipeline through the MXU
            accs = [acc + jax.lax.dot_general(
                a + acc * jnp.float32(1e-7), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * jnp.float32(1e-3)
                for acc in accs]
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:] = out

    a = jnp.full((n, n), 0.001, jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((n, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )(a, b))
    secs = _time(f, a, a)
    flops = 2 * n * n * n * inner * grid * streams
    return {"resource": "mxu_f32_default", "flops_per_s": flops / secs,
            "secs": secs, "n": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/roofline.jsonl")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    out_f = open(args.out, "a")
    import functools as _ft
    per_op = [
        _ft.partial(unary_rate, "vpu_log_f32", jnp.log),
        _ft.partial(unary_rate, "vpu_sqrt_f32", jnp.sqrt),
        _ft.partial(unary_rate, "vpu_cos_f32", jnp.cos),
        _ft.partial(unary_rate, "vpu_sin_f32", jnp.sin),
        _ft.partial(unary_rate, "vpu_tanh_f32", jnp.tanh),
    ]
    for fn in [vpu_rate, transc_rate, mxu_rate] + per_op:
        rec = fn()
        rec["platform"] = jax.devices()[0].platform
        print(json.dumps(rec))
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()
    out_f.close()


if __name__ == "__main__":
    main()
