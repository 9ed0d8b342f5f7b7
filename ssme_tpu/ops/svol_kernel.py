"""Pallas TPU kernel: fused SVOL particle propagate + weight.

The hot inner loop of the flagship PMMH workload is, per time step and per
(chain x replicate) filter, for every particle:

    x'  = phi x + sigma eps,        eps ~ N(0,1)
    lw' = lw + log N(y; 0, beta e^{x'/2})

(reference example/univ_svol_bootstrap_filter.h:74-86 driven from
estimate_univ_svol.h:119-127).  Under XLA this is several fused elementwise
ops PLUS a threefry random-bits computation that dominates at these sizes.
This kernel does the whole step in one VMEM pass using the TPU's hardware
PRNG (pltpu.prng_random_bits + Box-Muller), one tile per (batch, particle)
grid cell.

Shapes: x, logw are (B, N) with B a multiple of 8 and N a multiple of 128
(pad at the call site); params is (B, 3) [beta, phi, sigma]; y is scalar
per call (all filters see the same observation at a step); seed is a
scalar int32 that MUST differ across calls (fold the time index in).

Correctness note: the normals here come from a different PRNG stream than
``jax.random`` — estimates agree in distribution, not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas may be unavailable on some backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ssme_tpu.ops._prng import HALF_LOG_2PI, normal_bits, tile_seeds
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    pl = None
    pltpu = None
    _PALLAS_OK = False

TILE_B = 8
TILE_N = 128


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(seed_ref, y_ref, params_ref, x_ref, lw_ref, out_x_ref,
            out_lw_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # distinct stream per grid cell and per call: two threefry-derived
    # seed words per batch tile (_prng.tile_seeds), particle-tile index
    # XOR-mixed into the second word
    pltpu.prng_seed(seed_ref[2 * i], seed_ref[2 * i + 1] ^ j)

    eps = normal_bits(x_ref.shape)

    beta = params_ref[:, 0:1]   # (TILE_B, 1) broadcasts over lanes
    phi = params_ref[:, 1:2]
    sigma = params_ref[:, 2:3]

    x_new = phi * x_ref[:] + sigma * eps
    sd = beta * jnp.exp(0.5 * x_new)
    y = y_ref[0]
    z = y / sd
    log_g = -HALF_LOG_2PI - jnp.log(sd) - 0.5 * z * z

    out_x_ref[:] = x_new
    out_lw_ref[:] = lw_ref[:] + log_g


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_svol_propagate_weight(seed, y, params, x, logw, interpret=False):
    """One fused propagate+weight step for a (B, N) SVOL particle batch.

    seed: int32 scalar (vary per time step); y: scalar observation;
    params: (B, 3) constrained [beta, phi, sigma]; x, logw: (B, N).
    Returns (x_new, logw_new).
    """
    b, n = x.shape
    if b % TILE_B or n % TILE_N:
        raise ValueError(f"(B, N)=({b}, {n}) must tile to "
                         f"({TILE_B}, {TILE_N})")
    grid = (b // TILE_B, n // TILE_N)
    seed_arr = tile_seeds(seed, b // TILE_B)
    y_arr = jnp.asarray([y], dtype=jnp.float32).reshape(1)

    out_x, out_lw = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seed, y
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, 3), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, TILE_N), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, TILE_N), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_B, TILE_N), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, TILE_N), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ],
        # plain interpret=True lacks pltpu.prng_* on CPU; the TPU
        # interpreter (InterpretParams) emulates them
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, y_arr, params.astype(jnp.float32),
      x.astype(jnp.float32), logw.astype(jnp.float32))
    return out_x, out_lw


__all__ = ["fused_svol_propagate_weight", "pallas_available", "TILE_B",
           "TILE_N"]
