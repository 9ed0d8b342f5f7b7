"""Pallas TPU kernel: the ENTIRE univ-SVOL bootstrap filter in VMEM.

The flagship workload (reference ``example/estimate_univ_svol.h:108-131``:
run a bootstrap filter over all T observations and sum the conditional
log-likelihoods) executed as ONE ``pallas_call``:

- grid = (B/8 filter-tiles, T time steps); for a fixed tile the T cells
  run sequentially and the particle state (x, logw) persists in VMEM
  scratch — the filter state NEVER touches HBM during the scan;
- propagation + weighting use the TPU hardware PRNG (Box-Muller) fused
  with the SVOL recursions (``univ_svol_bootstrap_filter.h:74-86``);
- systematic resampling is gather-free dense one-hot selection on the
  MXU (``ops/_select.select_leaves_dense``): CDF = one matmul with the
  (n, n) lower-triangular ones matrix, ancestors as per-row one-hot
  selection matmuls.  XLA's alternatives measured on this chip:
  dynamic lane gathers ~450us each, cumsum ~260us, dense compare
  materialized to HBM ~690us — all avoided (a two-level blocked
  variant measured 4x slower; see ``_select.py``'s history note);
- observations stream through SMEM (scalar prefetch); per-step
  conditional log-likelihoods are staged in the revisited output block
  (flushed to HBM once per 128 steps).

Model hardcoded: univariate SVOL x' = phi x + sigma eps,
y ~ N(0, (beta e^{x'/2})^2), stationary init (the reference example
model); parameters (beta, phi, sigma) per filter row.

Restrictions: dim_state = 1; N (particles) multiple of 128; B multiple
of 8; resampling every step with the systematic scheme.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssme_tpu.ops._prng import (HALF_LOG_2PI as _HALF_LOG_2PI,
                                normal_bits as _normal_bits,
                                tile_seeds as _tile_seeds,
                                uniform_bits as _uniform_bits,
                                uniform_offset as _uniform_offset)
from ssme_tpu.ops._select import (metropolis_select_leaves,
                                  rejection_select_leaves,
                                  select_leaves_dense)
from ssme_tpu.utils import logmeanexp

TILE_B = 8


def _make_kernel(num_particles: int, ess_frac: float,
                 steps_per_cell: int = 1, num_tiles: int = 1,
                 num_steps: int = 0, substep_regions: bool = False,
                 resampler: str = "systematic", metropolis_iters: int = 16,
                 gate_stride: int = 1):
    n = num_particles
    k_steps = steps_per_cell
    always = ess_frac >= 1.0
    log_n = float(np.log(float(n)))
    use_lt = resampler == "systematic"
    g = int(gate_stride)

    def kernel(seed_ref, ys_ref, params_ref, *refs):
        if use_lt:
            (lt_ref, out_ref, xmean_ref, x_scr, lw_scr, carry_scr) = refs
        else:
            (out_ref, xmean_ref, x_scr, lw_scr, carry_scr) = refs
            lt_ref = None
        b = pl.program_id(0)
        tc = pl.program_id(1)
        # two threefry-derived seed words per tile (_prng.tile_seeds);
        # the grid cell and tile index are XOR-mixed into the second
        # word so every cell reseeds with a distinct 64-bit-derived
        # stream (two streams collide with prob ~2^-64 per pair)
        pltpu.prng_seed(seed_ref[2 * b],
                        seed_ref[2 * b + 1] ^ (tc * num_tiles + b))

        beta = params_ref[:, 0:1]
        phi = params_ref[:, 1:2]
        sigma = params_ref[:, 2:3]

        def maybe_resample_and_propagate():
            # lw_scr carries max-normalized log-weights ACROSS steps
            # (proper SIS weighting); resampling fires only when the
            # worst row's ESS drops below ess_frac * n (always, when
            # ess_frac >= 1).  The ablation-measured cost of the
            # resample block is ~3.3us of the 4.3us cell at n=512 —
            # gating it is the main throughput lever.
            w = jnp.exp(lw_scr[:])                           # (8, n)

            def resample():
                if use_lt:
                    # dense one-hot systematic selection on the MXU
                    # (_select.select_leaves_dense — measured 4x faster
                    # per resample than the round-2 blocked form)
                    u0 = _uniform_offset((TILE_B, 1))         # (8, 1)
                    (picked,) = select_leaves_dense(w, [x_scr[:]], u0,
                                                    lt_ref[:])
                elif resampler == "metropolis":
                    # O(n log n) gather-free Metropolis chains (see
                    # _select.metropolis_select_leaves) — no CDF, no
                    # (n, n) matrices, so no MXU and no n^2 VMEM
                    (picked,) = metropolis_select_leaves(
                        w, [x_scr[:]], pltpu.prng_random_bits,
                        num_iters=metropolis_iters)
                else:
                    # roll-based REJECTION resampler: same O(n) memory
                    # profile, UNBIASED (runs to termination; see
                    # _select.rejection_select_leaves)
                    (picked,) = rejection_select_leaves(
                        w, [x_scr[:]], pltpu.prng_random_bits)
                x_scr[:] = picked
                # weights reset to uniform: log W = 0, LSE = log n
                lw_scr[:] = jnp.zeros_like(lw_scr)
                carry_scr[:] = jnp.full_like(carry_scr, log_n)

            if always:
                resample()
            else:
                s1 = jnp.sum(w, axis=-1, keepdims=True)
                s2 = jnp.sum(w * w, axis=-1, keepdims=True)
                ess = s1 * s1 / s2                            # (8, 1)
                pl.when(jnp.min(ess) < ess_frac * n)(resample)
            # propagate (resampled or weight-carrying) particles
            x_scr[:] = phi * x_scr[:] + sigma * _normal_bits((TILE_B, n))

        def init_cloud():
            # stationary draw, uniform weights
            sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
            x_scr[:] = _normal_bits((TILE_B, n)) * sd0
            lw_scr[:] = jnp.zeros_like(lw_scr)
            carry_scr[:] = jnp.full_like(carry_scr, log_n)

        def weight_and_stage(t):
            y = ys_ref[t]
            # ---- weight: log-free form of log N(y; 0, (b e^{x/2})^2)
            #   = -log(2pi)/2 - log(b) - x/2 - (y e^{-x/2} / b)^2 / 2
            # one exp per element (vs exp+log+div); the per-row
            # constants (log b, y/b) cost 8 lanes each
            x = x_scr[:]
            zval = (y / beta) * jnp.exp(-0.5 * x)
            lg = ((-_HALF_LOG_2PI - jnp.log(beta))
                  - 0.5 * x - 0.5 * zval * zval)
            lw = lw_scr[:] + lg

            # ---- conditional log-likelihood, ratio form (reference
            # LWFilter2 accounting, liu_west_filter.h:1651-1659):
            # LSE(log W + log g) - LSE(log W); with every-step
            # resampling this reduces to LSE(log g) - log n
            m = jnp.max(lw, axis=-1, keepdims=True)
            wnorm = jnp.exp(lw - m)
            s = jnp.sum(wnorm, axis=-1, keepdims=True)
            lcl = (m + jnp.log(s)) - carry_scr[:, 0:1]        # (8, 1)
            lw_scr[:] = lw - m
            carry_scr[:] = jnp.broadcast_to(jnp.log(s), carry_scr.shape)

            # filtered mean E[x_t | y_{1:t}] under the FULL carried wts
            xmean = jnp.sum(x * wnorm, axis=-1, keepdims=True) / s

            # stage into the current (8, 128) output blocks; pallas
            # keeps a block in VMEM while (t*K)//128 is unchanged and
            # flushes on change.  Mosaic cannot store a single dynamic
            # lane column, so write the whole block through a lane mask
            # (zeroing at col 0 covers the final partial block's pad).
            stage_outputs(t, lcl, xmean)

        def stage_outputs(t, lcl, xmean):
            # stage into the current (8, 128) output blocks; pallas
            # keeps a block in VMEM while (t*K)//128 is unchanged and
            # flushes on change.  Mosaic cannot store a single dynamic
            # lane column, so write the whole block through a lane mask.
            # Freshness rule: zero the block at its FIRST write — with
            # gate_stride g, writes land at cols ≡ g-1 (mod g) plus a
            # possible tail check at t == T-1, so the first write of a
            # 128-block always has col < g (g divides 128); at g == 1
            # this is the original col == 0 rule, bit-compatibly.
            col = jax.lax.rem(t, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 128), 1)
            base = jnp.where(col < g, jnp.zeros_like(out_ref),
                             out_ref[:])
            out_ref[:] = jnp.where(lane == col, lcl, base)
            base_x = jnp.where(col < g, jnp.zeros_like(xmean_ref),
                               xmean_ref[:])
            xmean_ref[:] = jnp.where(lane == col, xmean, base_x)

        # ---- gate_stride > 1: the transcendental-ceiling lever -------
        # (VERDICT r5 work item; docs/kernels.md "Roofline"): between
        # ESS checks the carried log-weights ACCUMULATE un-renormalized
        # — no per-step exp(lw)/LSE pass — cutting the per-propagation
        # transcendental count from 4 to 3 + 1/g.  At a check the block
        # lcl is the same telescoping ratio LSE(lw_new) - LSE(lw_old),
        # so sum(outputs) is EXACTLY the evidence for any stride; the
        # per-step decomposition coarsens to per-check columns (zeros
        # elsewhere) and the filtered-mean path is emitted at checks
        # only.  The ESS gate fires at most g-1 steps late — a valid
        # adapted schedule, evidence stays unbiased.

        def propagate_only():
            x_scr[:] = phi * x_scr[:] + sigma * _normal_bits((TILE_B, n))

        def accumulate_weight(t):
            y = ys_ref[t]
            x = x_scr[:]
            zval = (y / beta) * jnp.exp(-0.5 * x)
            lw_scr[:] = (lw_scr[:] + (-_HALF_LOG_2PI - jnp.log(beta))
                         - 0.5 * x - 0.5 * zval * zval)

        def check_and_stage(t):
            lw = lw_scr[:]
            x = x_scr[:]
            m = jnp.max(lw, axis=-1, keepdims=True)
            wnorm = jnp.exp(lw - m)
            s = jnp.sum(wnorm, axis=-1, keepdims=True)
            lcl = (m + jnp.log(s)) - carry_scr[:, 0:1]
            xmean = jnp.sum(x * wnorm, axis=-1, keepdims=True) / s
            stage_outputs(t, lcl, xmean)
            # renormalize, then let the gate overwrite on fire
            lw_scr[:] = lw - m
            carry_scr[:] = jnp.broadcast_to(jnp.log(s), carry_scr.shape)

            def resample():
                if use_lt:
                    u0 = _uniform_offset((TILE_B, 1))
                    (picked,) = select_leaves_dense(wnorm, [x_scr[:]], u0,
                                                    lt_ref[:])
                elif resampler == "metropolis":
                    (picked,) = metropolis_select_leaves(
                        wnorm, [x_scr[:]], pltpu.prng_random_bits,
                        num_iters=metropolis_iters)
                else:
                    (picked,) = rejection_select_leaves(
                        wnorm, [x_scr[:]], pltpu.prng_random_bits)
                x_scr[:] = picked
                lw_scr[:] = jnp.zeros_like(lw_scr)
                carry_scr[:] = jnp.full_like(carry_scr, log_n)

            s2 = jnp.sum(wnorm * wnorm, axis=-1, keepdims=True)
            pl.when(jnp.min(s * s / s2) < ess_frac * n)(resample)

        # K time steps per grid cell: amortizes the fixed per-cell
        # overhead (~0.8us measured), which dominates non-resampling
        # cells under the ESS-adaptive schedule.  Substeps k >= 1 run
        # straight-line by default (fastest — measured: wrapping every
        # substep in a pl.when region cost ~4us/step at the adaptive
        # schedule).  With substep_regions=True each advance runs in
        # its own pl.when REGION instead: Mosaic stack-allocates a
        # region's transients separately but ACCUMULATES straight-line
        # live ranges, so the region form is the compile fallback if a
        # config's inlined selector transients overflow the 16MB scoped
        # VMEM (the round-2 blocked-resampler parity regression,
        # BENCH_r02).  The t < num_steps predicate is runtime-true for
        # every real step (the padded tail beyond T is the only skip,
        # and its outputs are sliced away anyway).
        for k in range(k_steps):
            t = tc * k_steps + k
            advance = (maybe_resample_and_propagate if g == 1
                       else propagate_only)
            if k == 0:
                @pl.when(tc == 0)
                def _():
                    init_cloud()

                @pl.when(tc > 0)
                def _():
                    advance()
            elif substep_regions:
                pl.when(t < num_steps)(advance)
            else:
                advance()
            if g == 1:
                weight_and_stage(t)
            else:
                accumulate_weight(t)
                if g <= k_steps and k % g == g - 1:
                    check_and_stage(t)
                elif g > k_steps and k == k_steps - 1:
                    # cross-cell stride (g a multiple of steps_per_cell
                    # dividing 128): the (x, lw, carry) scratch persists
                    # across grid cells, so the check fires on a RUNTIME
                    # predicate every g-th step — or at the final real
                    # step (ragged tail), whichever comes first; the
                    # staging freshness rule (first write of a 128-col
                    # block has col < g) still holds because check
                    # columns are ≡ g-1 (mod g) with g | 128.  The
                    # t < num_steps conjunct is load-bearing: a PADDED
                    # step past T can satisfy t ≡ g-1 (mod g), and its
                    # staging write would land at col g-1 < g in a block
                    # whose only real write is the ragged tail at a
                    # smaller column — the freshness zeroing would WIPE
                    # the tail's staged value (measured on chip as a
                    # +14-nat evidence corruption at stride 16 on SPY
                    # before this guard; data/probe_ceiling.jsonl)
                    pl.when(((jax.lax.rem(t, g) == g - 1)
                             & (t < num_steps))
                            | (t == num_steps - 1))(
                        functools.partial(check_and_stage, t))
                else:
                    # ragged tail: the final real step always checks so
                    # the staged lcls telescope to the full evidence
                    pl.when(t == num_steps - 1)(
                        functools.partial(check_and_stage, t))

    return kernel


@functools.partial(jax.jit, static_argnames=("num_particles", "interpret",
                                             "ess_threshold",
                                             "steps_per_cell",
                                             "substep_regions",
                                             "resampler",
                                             "metropolis_iters",
                                             "gate_stride"))
def svol_filter_pallas(seed, params, ys, num_particles=512, interpret=False,
                       ess_threshold=1.0, steps_per_cell=8,
                       substep_regions=None, resampler="systematic",
                       metropolis_iters=16, gate_stride=1):
    """Full-sequence SVOL bootstrap filtering for B filters at once.

    seed: int32 scalar or a ``jax.random`` key (the PMMH hooks pass
    their iteration key — see ``_prng.tile_seeds`` on why);
    params: (B, 3) constrained [beta, phi, sigma]
    (note: sigma, NOT sigma^2 — precompute sqrt); ys: (T,) or (T, 1).
    Returns (total (B,), per_step_lcl (B, T), filtered_x_mean (B, T)):
    total = sum_t log p(y_t | y_{1:t-1}); filtered_x_mean is the
    self-normalized E[x_t | y_{1:t}] per filter per step (the volatility
    path).

    ess_threshold: resample when the tile's worst-row ESS falls below
    this fraction of n (1.0 = every step, the reference default;
    0.5 = the standard adaptive schedule, ~3x faster — the evidence
    estimator stays unbiased, cf. ``resampling.maybe_resample``).

    substep_regions: wrap each substep's advance in its own pl.when
    region (compile fallback for scoped-VMEM pressure; slower —
    see the kernel-body comment).  Default None = auto: straight-line
    at n <= 512, regions above (n=1024 parity needs them).

    resampler: "systematic" (dense MXU one-hot selection, the default),
    "metropolis" (O(n log n) roll-based Metropolis chains — no (n, n)
    matrices, so it lifts the dense form's VMEM particle cap; biased
    ancestor law at finite ``metropolis_iters``, see
    ``_select.metropolis_select_leaves`` and docs/kernels.md for the
    measured evidence bias), or "rejection" (same roll mechanics and
    memory profile but UNBIASED — runs to termination with a
    data-dependent sweep count, ``_select.rejection_select_leaves``).

    gate_stride: run the LSE/ESS check every this many steps instead of
    every step (must divide steps_per_cell, or be a multiple of it that
    divides 128 — the check then fires across grid cells on a runtime
    predicate; ESS-adaptive schedules only).  Between checks the
    carried log-weights accumulate
    un-renormalized — no per-step exp(lw) pass — cutting the
    per-propagation transcendental count from 4 to 3 + 1/stride (the
    measured roofline ceiling, docs/kernels.md).  ``sum(lcls)`` stays
    EXACTLY the evidence (telescoping ratio at checks); the per-step
    decomposition coarsens to per-check columns (zeros elsewhere) and
    ``filtered_x_mean`` is emitted at check columns only.
    """
    if resampler not in ("systematic", "metropolis", "rejection"):
        raise ValueError(f"unknown resampler {resampler!r}")
    gate_stride = int(gate_stride)
    _spc = int(steps_per_cell)
    if gate_stride < 1 or ((_spc % gate_stride) and
                           (gate_stride % _spc or 128 % gate_stride)):
        raise ValueError(
            "gate_stride must divide steps_per_cell, or be a multiple of "
            "it that divides 128 (cross-cell weight accumulation)")
    if gate_stride > 1 and ess_threshold >= 1.0:
        raise ValueError(
            "gate_stride > 1 is the ESS-adaptive transcendental lever "
            "(weights accumulate between checks); the every-step parity "
            "schedule requires gate_stride=1")
    ys = jnp.asarray(ys).reshape(-1).astype(jnp.float32)
    t_len = ys.shape[0]
    b = params.shape[0]
    n = num_particles
    k_steps = int(steps_per_cell)
    if b % TILE_B:
        raise ValueError(f"B={b} must be a multiple of {TILE_B}")
    if n % 128:
        raise ValueError(f"num_particles={n} must be a multiple of 128")
    if resampler != "systematic" and (n & (n - 1)):
        raise ValueError(
            f"num_particles={n}: resampler='metropolis' needs a "
            "power-of-two particle count (its roll decomposition masks "
            "the shift to [0, n))")
    if k_steps < 1 or 128 % k_steps:
        raise ValueError("steps_per_cell must divide 128")

    # pad the series so every grid cell has k_steps observations; the
    # padded tail's outputs land beyond t_len and are sliced away
    t_cells = (t_len + k_steps - 1) // k_steps
    ys = jnp.concatenate(
        [ys, jnp.zeros((t_cells * k_steps - t_len,), ys.dtype)])

    seed_arr = _tile_seeds(seed, b // TILE_B)
    t_pad = ((t_cells * k_steps + 127) // 128) * 128
    if substep_regions is None:
        substep_regions = n > 512
    use_lt = resampler == "systematic"
    in_specs = [
        pl.BlockSpec((TILE_B, 3), lambda i, t, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [params.astype(jnp.float32)]
    if use_lt:
        in_specs.append(pl.BlockSpec((n, n), lambda i, t, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(np.tril(np.ones((n, n), np.float32)).T))

    lcls = pl.pallas_call(
        _make_kernel(n, float(ess_threshold), k_steps, b // TILE_B,
                     t_len, bool(substep_regions), resampler,
                     int(metropolis_iters), gate_stride),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # seed, ys (SMEM)
            grid=(b // TILE_B, t_cells),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((TILE_B, 128),
                             lambda i, t, *_: (i, (t * k_steps) // 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B, 128),
                             lambda i, t, *_: (i, (t * k_steps) // 128),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE_B, n), jnp.float32),    # particles
                pltpu.VMEM((TILE_B, n), jnp.float32),    # log-weights
                pltpu.VMEM((TILE_B, 128), jnp.float32),  # LSE carry
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, ys, *inputs)
    lcls, xmeans = lcls
    lcls = lcls[:, :t_len]
    return jnp.sum(lcls, axis=-1), lcls, xmeans[:, :t_len]


def svol_pallas_replicated_log_like(num_particles: int, num_replicates: int,
                                    ess_threshold: float = 0.5,
                                    gate_stride: int = 1):
    """PMMH likelihood hook: replicate-averaged pallas filter.

    Returns ``ll(key, params, ys) -> scalar`` where ``params`` is the
    constrained (beta, phi, ss) vector (reference ordering; ss = sigma^2,
    ``univ_svol_bootstrap_filter.h:54-61``).  Runs ``num_replicates``
    filters in one kernel launch and log-mean-exps them
    (``thread_pool.h:259-273`` semantics).  ESS-adaptive resampling by
    default (unbiased, ~3x faster; pass 1.0 for every-step parity).
    """
    r = num_replicates
    b = ((r + TILE_B - 1) // TILE_B) * TILE_B

    def ll(key, params, ys):
        # the key goes straight through to tile_seeds: full 64-bit
        # per-iteration stream separation (VERDICT r2 item 6; the old
        # 31-bit randint had a ~2% birthday collision over 1e4 iters)
        p = jnp.stack([params[0], params[1], jnp.sqrt(params[2])])
        batch = jnp.broadcast_to(p, (b, 3))
        vals, _, _ = svol_filter_pallas(key, batch, ys,
                                        num_particles=num_particles,
                                        ess_threshold=ess_threshold,
                                        gate_stride=gate_stride)
        return logmeanexp(vals[:r])

    return ll


def svol_pallas_batched_log_like(num_particles: int, num_replicates: int,
                                 ess_threshold: float = 0.5,
                                 gate_stride: int = 1,
                                 steps_per_cell: int = 8):
    """PMMH ``batched_log_like`` hook: ALL chains x replicates in one
    kernel launch.

    Returns ``ll(key, params (C, 3), ys) -> (C,)`` with ``params`` the
    constrained (beta, phi, ss) rows.  The kernel's row axis is laid out
    chain-major: row c*R + r is replicate r of chain c; the per-chain
    log-mean-exp reduction replaces the averaging thread pool
    (``thread_pool.h:259-273``).  ESS-adaptive resampling by default
    (unbiased, ~3x faster; pass 1.0 for every-step parity).
    """
    r = num_replicates

    def ll(key, params, ys):
        c = params.shape[0]
        b_needed = c * r
        b = ((b_needed + TILE_B - 1) // TILE_B) * TILE_B
        # key straight through to tile_seeds (64-bit per-iteration
        # stream separation; see svol_pallas_replicated_log_like)
        p = jnp.stack([params[:, 0], params[:, 1],
                       jnp.sqrt(params[:, 2])], axis=-1)     # (C, 3)
        batch = jnp.repeat(p, r, axis=0)                      # (C*R, 3)
        # pad with a REAL row: made-up padding (e.g. phi=1) yields NaN
        # log-weights, and a NaN in any tile row disables that tile's
        # ESS resampling gate for every real filter sharing it
        pad = jnp.broadcast_to(p[:1], (b - b_needed, 3))
        batch = jnp.concatenate([batch, pad], axis=0)
        vals, _, _ = svol_filter_pallas(key, batch, ys,
                                        num_particles=num_particles,
                                        ess_threshold=ess_threshold,
                                        gate_stride=gate_stride,
                                        steps_per_cell=steps_per_cell)
        return logmeanexp(vals[:b_needed].reshape(c, r), axis=-1)

    return ll


def svol_swarm_evidence_pallas(seed, param_draws, ys, num_particles=512,
                               ess_threshold: float = 1.0,
                               gate_stride: int = 1):
    """Particle-swarm conditional evidence at megakernel speed.

    The swarm (``pswarm_filter.h:22-305``) runs one bootstrap filter per
    parameter draw and averages per-step conditional likelihoods across
    models.  Here the filter bank IS the kernel's row axis.

    ``param_draws``: (M, 3) constrained (beta, phi, ss) rows (e.g. from
    ``ssme_tpu.io.ParamSampler``).  Returns a dict with the per-step
    aggregates: ``log_cond_like`` (T,) = logmeanexp over models (the
    conditional evidence) and ``mean_log_cond_like`` (T,) = the
    reference's arithmetic-mean-of-logs aggregation
    (``pswarm_filter.h:103,136``), plus the per-model matrix.

    ``ess_threshold``/``gate_stride`` mirror the factory's
    :func:`~ssme_tpu.ops.filter_megakernel.megakernel_swarm_evidence`
    knobs; with ``gate_stride > 1`` the mixture aggregate coarsens to a
    per-check-block factorization (see that function's note) while the
    per-model totals stay exactly telescoped.
    """
    p = jnp.asarray(param_draws)
    m_models = p.shape[0]
    b = ((m_models + TILE_B - 1) // TILE_B) * TILE_B
    batch = jnp.stack([p[:, 0], p[:, 1], jnp.sqrt(p[:, 2])], axis=-1)
    # pad with a real row (see svol_pallas_batched_log_like note)
    batch = jnp.concatenate(
        [batch, jnp.broadcast_to(batch[:1], (b - m_models, 3))], axis=0)
    _, lcls, xmeans = svol_filter_pallas(seed, batch, ys,
                                         num_particles=num_particles,
                                         ess_threshold=ess_threshold,
                                         gate_stride=gate_stride)
    lcls = lcls[:m_models]                                   # (M, T)
    xmeans = xmeans[:m_models]
    log_cond_like = logmeanexp(lcls, axis=0)
    return {
        "log_cond_like": log_cond_like,
        "mean_log_cond_like": jnp.mean(lcls, axis=0),
        "per_model_log_cond_likes": lcls,
        "volatility_path": jnp.mean(xmeans, axis=0),  # swarm E[x_t]
    }


__all__ = ["svol_filter_pallas", "svol_pallas_replicated_log_like",
           "svol_pallas_batched_log_like", "svol_swarm_evidence_pallas",
           "TILE_B"]
