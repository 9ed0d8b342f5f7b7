"""Shared in-kernel systematic ancestor selection for the Pallas TPU
megakernels.

Replaces the reference's O(N) sequential sorted-uniforms walk
(``liu_west_filter.h:101-139``) with a gather-free dense one-hot
formulation on the MXU (dynamic lane gathers cost ~450us at n=512;
this costs ~3.3us):

1. inclusive CDF via one matmul with the (n, n) lower-triangular ones
   matrix ``lt`` (``cdf = w @ lt``); the EXCLUSIVE cdf is the same
   rounded values shifted one lane (``pltpu.roll``), NOT ``cdf - w``,
   which re-rounds and can leave 1-ulp gaps/overlaps at interval
   boundaries (selecting 0 or 2 ancestors);
2. per output row, the systematic points u_j = (j + u0) * total / n are
   synthesized as an iota column (clamped to ``total``: f32 rounding
   can push u_{n-1} past it, which would select NO ancestor and zero
   that output particle); the one-hot ancestor matrix
   S[j, i] = [cdf_ex_i < u_j <= cdf_i] comes from two broadcast
   compares, and ``S @ x^T`` performs the gather on the MXU.  All
   leaves stack their transposed columns side by side so ONE selection
   matmul per row moves every leaf by the same ancestors
   (``liu_west_filter.h:90-145`` joint-gather semantics).

Precision: the CDF matmul runs as a two-pass compensated split
(:func:`compensated_cdf` — single-pass-bf16-rounded weights would bias
the resampling LAW itself, i.e. which particles get selected, while
HIGHEST costs six passes); the selection gather runs at the DEFAULT
precision, so gathered VALUES pass through bf16 (~0.4%% relative noise
on particle positions — statistically a harmless jitter, and 6x
cheaper on the dominant matmul; densities that must be exact are
re-evaluated after selection rather than gathered, cf.
``ops/liu_west_megakernel.py``).

History (round 3, measured on v5e — ``examples/probe_kernel_speed.py``):
a two-level blocked variant with O(n * 128) transients replaced this
dense form in round 2 to lift the particle cap, but measured ~4x
SLOWER per resample (14.5 vs ~3.9 us/step at the parity schedule,
n=512) and its fetch buffers still capped n at 1024 — the same cap the
dense form's (n, n) one-hots impose.  Dense won on every axis that
matters; the blocked implementation lives in git history
(ssme_tpu/ops/_select.py @ 34f2780) if a >1024 in-kernel cloud is ever
needed.

Also A/B'd and rejected (round 3, same probe, B=16 N=512 spc=8):

- an Abel (suffix-difference) selection — S[j, i] = [u_j <= cdf_i]
  from ONE compare, ``S @ dxt`` with compensated-bf16 suffix
  differences telescoping to the gather: ~8% SLOWER at the parity
  schedule (50.7 vs 47.1 ms; the doubled matmul width + sublane roll
  cost more than the saved (n, n) compare pass — the compare passes
  are NOT the resample block's bottleneck), ~even at the adaptive
  schedule;
- the same one-hot below emitted directly in bf16 (with a bf16 xt):
  fails Mosaic compilation outright (remote tpu_compile_helper
  crash), at both schedules;
- f32 one-hot/xt explicitly ``.astype(bfloat16)`` at the selection
  dot (casts compile fine, unlike direct bf16 emission): ~3% SLOWER
  at the parity schedule (46.6 vs 45.4 ms) — the two extra cast
  passes over (n, n) outweigh the halved MXU feed, so the selection
  matmul is not the bottleneck either;
- a fully TRANSPOSED selection — ancestors down sublanes,
  ``x_row @ sel^T`` as an (L, n) @ (n, n) narrow dot landing outputs
  on lanes with no column slicing and no final transpose (16x fewer
  MXU slot-cycles at L=1): ~20% SLOWER at BOTH schedules (54.3/34.5
  vs 45.4/27.2 ms) — sublane-broadcast compares and sublane rolls
  are the VPU's slow axis, and they dominate the narrow dot's
  savings.  The lane-major dense form below wins every A/B to date;
  the resample block's remaining cost is spread across compare,
  select, and relayout passes with no single dominant term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def compensated_cdf(w, lt):
    """Inclusive per-row weight CDF ``w @ lt`` as a two-pass compensated
    matmul at DEFAULT precision: w = w_hi + w_lo with w_hi = bf16(w)
    (the split is exact in f32 — Sterbenz), so the only rounding is
    w_lo's bf16 pass: |err| <= 2^-16 |w| vs a single DEFAULT pass's
    2^-8 (which perturbs the resampling LAW: selection boundaries move
    ~2 inter-point spacings at n=512) and HIGHEST's ~2^-21 at SIX
    passes (Mosaic rejects Precision.HIGH).  Two passes; boundary shift
    ~2^-7 of one spacing — statistically invisible, and measured ~6%
    faster per parity-schedule step than HIGHEST (probe_kernel_speed,
    v5e round 3)."""
    w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    w_lo = w - w_hi
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return dot(w_hi, lt) + dot(w_lo, lt)


def select_leaves_dense(w, leaves, u0, lt):
    """Systematic ancestor selection of every leaf row by per-row weights.

    w: (TILE_B, n) nonnegative weights; leaves: list of (TILE_B, n)
    arrays gathered jointly (liu_west_filter.h:90-145 semantics);
    u0: (TILE_B, 1) uniforms in (0, 1) — use ``_prng.uniform_offset``
    (never exactly 0, or ancestor slot 0 selects nothing); lt: (n, n)
    with lt[k, i] = [k <= i].  Returns the selected leaves.
    """
    tile_b, n = w.shape
    n_l = len(leaves)
    cdf = compensated_cdf(w, lt)
    total = cdf[:, n - 1:n]
    lane0 = _iota((tile_b, n), 1)
    cdf_ex = jnp.where(lane0 == 0, 0.0, pltpu.roll(cdf, shift=1, axis=1))
    # leaf columns side by side: ONE selection matmul per row moves all
    xt = jnp.concatenate([jnp.transpose(leaf) for leaf in leaves], axis=1)
    jcol = _iota((n, 1), 0).astype(jnp.float32)
    cols = [[] for _ in range(n_l)]
    for row in range(tile_b):
        # clamp: see module docstring (rounding can push u_{n-1} > total)
        u_col = jnp.minimum((jcol + u0[row, 0]) * (total[row, 0] / n),
                            total[row, 0])
        sel = jnp.where((cdf[row:row + 1, :] >= u_col)
                        & (cdf_ex[row:row + 1, :] < u_col), 1.0, 0.0)
        picked = jax.lax.dot_general(sel, xt, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        for leaf in range(n_l):
            cols[leaf].append(
                picked[:, leaf * tile_b + row:leaf * tile_b + row + 1])
    return [jnp.transpose(jnp.concatenate(cols[leaf], axis=1))
            for leaf in range(n_l)]


def metropolis_select_leaves(w, leaves, draw_bits, num_iters=16):
    """O(n)-class GATHER-FREE Metropolis resampling (VERDICT r3 item 4).

    The dense systematic selector above is measured-optimal within its
    family but costs two (n, n) MXU matmuls and an (n, n)-resident CDF
    matrix — O(n^2) work and the source of the 1024-particle in-kernel
    cap.  This is the O(n * num_iters) alternative, the TPU-native form
    of Metropolis resampling (Murray, Lee & Jacob 2016, "Parallel
    resampling in the particle filter" — the GPU algorithm the paper
    proposes for exactly this no-global-communication setting; replaces
    the same sequential walk, ``liu_west_filter.h:101-139``):

    Each output slot j runs an independent Metropolis chain on the
    ancestor index, initialized at j.  Per sweep, EVERY chain proposes
    the particle a shared random lane-offset away — ``c_t = sum of iid
    uniform shifts`` so the proposal index ``(j - c_t) mod n`` is
    marginally Uniform{0..n-1} and independent of the chain state
    (a symmetric proposal; the shared offset couples the chains no
    worse than systematic resampling's shared u0 couples its slots) —
    and accepts with probability ``w_cand / w_cur``.  Chains carry
    their ancestor's VALUES (weight + every leaf), so a sweep is one
    cumulative ``pltpu.roll`` of the originals per array plus
    elementwise compare/select: no gathers, no CDF, no (n, n) anything.

    Bias: Metropolis resampling is exact only as num_iters -> inf; the
    ancestor law converges geometrically (uniform proposal  =>  total
    variation decays at least like (1 - 1/kappa)^B with kappa =
    n * max w / sum w).  MEASURED (round 4, v5e, SPY at theta*, 1024
    rows — examples/probe_metropolis.py): evidence bias -5.8 / -3.6 /
    -2.1 nats at the parity schedule with B = 8 / 16 / 32, and -1.6 /
    -0.9 / -0.4 at the ESS-adaptive schedule; only adaptive/B=8 beat
    the dense selector's wall clock (314 vs 392 us/row).  REJECTED as
    the default resampler on those numbers; RETAINED as the only
    in-kernel path above the dense selector's 1024-particle cap —
    N=2048/4096 compile and run (sd 0.59 nats at N=4096 vs 1.60 at
    N=512).  Full table: docs/kernels.md.

    w: (TILE_B, n) nonnegative weights, n a power of two (the shift is
    masked to [0, n)); leaves: list of (TILE_B, n) moved jointly;
    draw_bits: ``shape -> SIGNED int32 bits`` (``pltpu.prng_random_bits``
    in-kernel, which returns int32 per the _prng.py convention; any
    deterministic stand-in under test must match — the +2^31 shift in
    the accept-uniform conversion below maps int32 to (0, 1] and would
    map a uint32 source to (0.5, 1.5], skewing the accept law).
    Returns the selected leaves.
    """
    tile_b, n = w.shape
    if n & (n - 1):
        raise ValueError(f"metropolis selector needs power-of-two n, got {n}")
    log2n = int(n.bit_length() - 1)

    w_cur = w
    cur = list(leaves)
    # one word per sweep supplies the shift (signed int32 from the HW
    # PRNG; astype wraps to uint32); per-element accept uniforms are
    # fresh (TILE_B, n) draws each sweep
    shift_bits = draw_bits((num_iters, 1)).astype(jnp.uint32)

    def roll_to(x, c):
        # roll by the traced amount c via power-of-two decomposition:
        # log2(n) static rolls with scalar bit-selects — cheap VPU
        # passes at (TILE_B, n), no dynamic-shift lowering needed
        out = x
        for b in range(log2n):
            take = (c & jnp.uint32(1 << b)) != jnp.uint32(0)
            out = jnp.where(take, pltpu.roll(out, shift=1 << b, axis=1), out)
        return out

    c = jnp.uint32(0)
    for t in range(num_iters):
        c = c + shift_bits[t, 0]          # cumulative => fresh uniform shift
        # uniform in (0, 1]: a 0 draw would accept a zero-weight candidate
        u_bits = draw_bits((tile_b, n))
        u = ((u_bits.astype(jnp.float32) + 2147483648.0 + 1.0)
             * jnp.float32(2.0**-32))
        w_cand = roll_to(w, c)
        acc = u * w_cur < w_cand
        w_cur = jnp.where(acc, w_cand, w_cur)
        cur = [jnp.where(acc, roll_to(leaf, c), leaf_cur)
               for leaf, leaf_cur in zip(leaves, cur)]
    return cur


def rejection_select_leaves(w, leaves, draw_bits, max_iters=4096,
                            draw_bits_at=None):
    """UNBIASED O(n)-class gather-free REJECTION resampling (VERDICT r4
    item 2 — the other half of the r3 Metropolis A/B; replaces the same
    sequential walk, ``liu_west_filter.h:101-139``; Murray, Lee & Jacob
    2016's rejection resampler in TPU roll form).

    Law: output slot j first proposes ITSELF, accepting with
    probability w_j / w_max; while rejected, it proposes the particle a
    shared fresh uniform lane-offset away (cumulative ``pltpu.roll``,
    exactly the Metropolis proposal mechanics above) and accepts with
    probability w_cand / w_max.  Run to termination this is an exact
    rejection sampler per slot: accepted ancestors are Categorical(w),
    and the identity-first start gives offspring counts
    E[#offspring of i] = w_i/w_max + (w_i/sum w) * (n - sum w / w_max)
    = n w_i / sum w — UNBIASED, with the heaviest particles keeping
    their own slot (lower ancestor variance than pure multinomial).
    Unlike ``metropolis_select_leaves`` there is NO finite-sweep
    ancestor-law bias: the loop runs until every slot has accepted
    (``lax.while_loop`` on the all-accepted scalar), with ``max_iters``
    as a safety net only — P(any slot unaccepted after B sweeps)
    <= n (1 - 1/kappa)^B with kappa = n max w / sum w, i.e. ~1e-300
    territory at the cap for any non-degenerate weight vector (a capped
    slot keeps its identity ancestor).

    Cost per sweep: one traced-amount roll of ``w`` plus one per leaf
    (log2 n static rolls each), a fresh (TILE_B, n) uniform, and
    compare/selects — no CDF, no (n, n) residents, so the VMEM particle
    cap is the same as the Metropolis path's, NOT the dense selector's.
    The sweep count is data-dependent: E[sweeps to drain all n slots]
    ~= kappa * (ln n + 0.58) (max of n geometrics).

    w: (TILE_B, n) nonnegative weights, n a power of two; leaves: list
    of (TILE_B, n) moved jointly; draw_bits: ``shape -> SIGNED int32
    bits``, called INSIDE the ``while_loop`` body — on hardware
    ``pltpu.prng_random_bits`` is a stateful instruction, so each
    runtime sweep reads fresh bits even though the body traces once.
    A pure stand-in would freeze the stream across sweeps, so tests
    pass ``draw_bits_at(t, shape)`` instead (sweep-indexed; e.g. a
    ref-dslice read of a pre-drawn tape), which also caps
    ``max_iters`` at the tape length.  Returns the selected leaves.
    """
    tile_b, n = w.shape
    if n & (n - 1):
        raise ValueError(f"rejection selector needs power-of-two n, got {n}")
    log2n = int(n.bit_length() - 1)

    if draw_bits_at is None:
        def draw_bits_at(t, shape):
            return draw_bits(shape)

    def to_uniform(bits):
        # (0, 1]: a 0 draw would accept a zero-weight candidate
        return ((bits.astype(jnp.float32) + 2147483648.0 + 1.0)
                * jnp.float32(2.0**-32))

    def roll_to(x, c):
        out = x
        for b in range(log2n):
            take = (c & jnp.uint32(1 << b)) != jnp.uint32(0)
            out = jnp.where(take, pltpu.roll(out, shift=1 << b, axis=1), out)
        return out

    w_max = jnp.max(w, axis=-1, keepdims=True)
    # sweep 0: identity proposal (roll by c=0).  The accept mask is
    # carried as f32 0/1, not bool: Mosaic cannot yield vector<i1>
    # through a while_loop (scf.yield legalization failure, measured).
    acc0 = jnp.where(
        (to_uniform(draw_bits_at(jnp.zeros((), jnp.int32),
                                 (tile_b, n))) * w_max) < w, 1.0, 0.0)
    cur0 = list(leaves)

    def cond(carry):
        t, c, acc, *_ = carry
        return (t < max_iters) & (jnp.min(acc) < 0.5)

    def body(carry):
        t, c, acc, *cur = carry
        c = c + draw_bits_at(t, (1, 1))[0, 0].astype(jnp.uint32)
        u = to_uniform(draw_bits_at(t, (tile_b, n)))
        w_cand = roll_to(w, c)
        take = jnp.where((acc < 0.5) & (u * w_max < w_cand), 1.0, 0.0)
        cur = [jnp.where(take > 0.5, roll_to(leaf, c), leaf_cur)
               for leaf, leaf_cur in zip(leaves, cur)]
        return (t + 1, c, acc + take, *cur)

    out = jax.lax.while_loop(
        cond, body,
        (jnp.ones((), jnp.int32), jnp.zeros((), jnp.uint32), acc0, *cur0))
    return list(out[3:])


# ---------------------------------------------------------------------------
# Metropolis sweep budgeting (VERDICT r4 item 6: safe-by-construction)
# ---------------------------------------------------------------------------

# Measured total-evidence |bias| envelope of the finite-sweep
# Metropolis ancestor law, fitted as
# |bias|(B) <= SAFETY * A_sched * (t_len / 3084) * (B / 8)^-P
# (SPY workload, N=512, theta*, 1024-4608 rows;
# data/probe_metropolis.jsonl + data/probe_resampler.jsonl, BOTH
# models; docs/kernels.md tables):
#
# - univ-SVOL, parity: 10.33/5.78/3.55/2.11 nats at B=4/8/16/32
#   (decay B^-0.76); adaptive(0.5): 3.13/1.47/0.83/0.41 (B^-0.98);
# - SVOL-leverage, adaptive: +3.11/+2.19/+1.30/+0.76 — POSITIVE bias
#   (the sign is model- and theta-dependent, which is exactly why a
#   biased evidence corrupts a pseudo-marginal posterior), decay
#   B^-0.68 (the slowest measured).
#
# A_parity=5.8, A_adaptive=1.6 anchor the SVOL B=8 points; P=0.73 with
# SAFETY=2 verifiably dominates EVERY measured point on both models
# (the 1.46x prefactor margin over leverage outweighs its slightly
# slower 0.68 decay until B ~ 15000, far past max_sweeps).  The
# envelope scales linearly in t_len (bias accumulates per resampling
# event) and is measured n-INSENSITIVE from 512 to 4096 (kappa =
# n max w / sum w is roughly n-free for non-degenerate weights).
_METROPOLIS_BIAS_A = {"parity": 5.8, "adaptive": 1.6}
_METROPOLIS_BIAS_P = 0.73
_BIAS_FIT_T = 3084.0
_BIAS_SAFETY = 2.0


def metropolis_bias_estimate(num_iters, t_len, ess_threshold=0.5):
    """Conservative predicted |evidence bias| (nats) of the Metropolis
    resampler at ``num_iters`` sweeps on a T=``t_len`` series (fit note
    above; schedule = parity when ``ess_threshold >= 1``, else the
    adaptive envelope — thresholds above 0.5 resample more often, so
    the parity envelope is used for them too)."""
    sched = "parity" if ess_threshold > 0.5 else "adaptive"
    a = _METROPOLIS_BIAS_A[sched] * _BIAS_SAFETY
    return (a * (float(t_len) / _BIAS_FIT_T)
            * (float(num_iters) / 8.0) ** (-_METROPOLIS_BIAS_P))


def metropolis_sweeps_for(bias_budget, t_len, ess_threshold=0.5,
                          max_sweeps=256):
    """Smallest sweep count whose predicted evidence bias (see
    :func:`metropolis_bias_estimate`) is within ``bias_budget`` nats.

    The PMMH hook (``filter_megakernel.megakernel_log_like``) defaults
    ``metropolis_iters`` to this, so a pseudo-marginal run cannot
    silently adopt a sweep count whose theta-dependent bias would
    distort the posterior (``ada_pmmh_mvn.h:22-28``'s unbiasedness
    requirement).  Raises when no count within ``max_sweeps`` meets the
    budget — at that point use the unbiased alternatives
    (resampler="rejection", the XLA bank, or parallel.sharded_pf).
    """
    if bias_budget <= 0:
        raise ValueError("bias_budget must be positive (nats)")
    sched = "parity" if ess_threshold > 0.5 else "adaptive"
    a = _METROPOLIS_BIAS_A[sched] * _BIAS_SAFETY
    b = 8.0 * (a * (float(t_len) / _BIAS_FIT_T)
               / float(bias_budget)) ** (1.0 / _METROPOLIS_BIAS_P)
    sweeps = max(4, int(-(-b // 2) * 2))          # round up to even
    if sweeps > max_sweeps:
        raise ValueError(
            f"metropolis bias budget {bias_budget} nats needs ~{sweeps} "
            f"sweeps (> max_sweeps={max_sweeps}) at T={t_len}, "
            f"ess_threshold={ess_threshold}: use resampler='rejection' "
            "(unbiased, same memory profile), the XLA bank, or "
            "parallel.sharded_pf instead")
    return sweeps


__all__ = ["compensated_cdf", "select_leaves_dense",
           "metropolis_select_leaves", "rejection_select_leaves",
           "metropolis_bias_estimate", "metropolis_sweeps_for"]
