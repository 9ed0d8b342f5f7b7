"""Generic Pallas TPU Liu-West megakernel factory: the whole-sequence
joint state+parameter filter in VMEM for ANY model expressed as
in-kernel hooks.

``ops/svol_leverage_lw_kernel.py`` proved the design on the reference's
Liu-West flagship model (``test/test_liu_west.cpp:25-157``): one filter
per grid row, the joint (state, log-weights, transformed-theta) cloud
persisting in a VMEM scratch tile whose ROWS are channels, all
cross-particle work (weight CDFs, ancestor selection, the shrinkage
Gram matrix) as MXU matmuls.  This module lifts that design into a
*factory*, the way ``ops/filter_megakernel.py`` generalized the
bootstrap kernel: a model plugs in traceable hooks + per-parameter
transform codes and gets the same megakernel performance — covering the
8-class Liu-West surface of the reference
(``include/ssme/liu_west_filter.h:149-2528``: APF/SISR forms x
covariates x future-sim; future simulation stays on the XLA path,
``filters/liu_west.py::sim_future_obs``).

An :class:`LWKernelModel` supplies, over one filter's ``(1, n)``
particle rows (parameters are PER-PARTICLE ``(P, n)`` blocks — unlike
the bootstrap factory's per-filter scalar rows, Liu-West filters the
parameters jointly with the state, ``liu_west_filter.h:25-145``):

- ``sample_prior(rng, n) -> (P, n)``   CONSTRAINED prior draws
  (paramPriorSamp, ``liu_west_filter.h:291-295``)
- ``init(rng, cp, y, n) -> state``     time-1 proposal (q1Samp); ``cp``
  is the ``(P, n)`` constrained parameter block
- ``propagate(rng, cp, state, y, z) -> state``  transition draw (fSamp)
- ``log_weight(cp, state, y, z) -> (1, n)``     obs log-density (logGEv)
- ``prop_mu(cp, state, y, z) -> state``  APF lookahead (propMu);
  required for ``variant="apf"``; evaluated at the pre-shrinkage
  constrained parameters (its density at the shrunk ones — the
  reference's ``logGEv(y, propMu(x), m)``, ``liu_west_filter.h:379-401``)
- optional ``sample_q`` / ``log_fq`` for the SISR form's general
  proposal (LWFilter2 ``qSamp``/``logFEv - logQEv``,
  ``liu_west_filter.h:1495-1516``); defaults: propagate / 0
- optional ``functionals``: tuple of ``h_k(cp, state) -> (1, n)`` whose
  self-normalized filtered means are emitted per step
  (``liu_west_filter.h:457-477`` expectations surface)

``transform_codes`` gives each parameter's bijection
('null'|'log'|'logit'|'twice_fisher', ``parameters.h:317-457``): the
cloud stores theta in TRANSFORMED space so the kernel-shrinkage MVN
perturbation stays in an unconstrained space (the documented fix of the
reference's space mixing at ``liu_west_filter.h:385-388``), and hooks
always receive CONSTRAINED values.

Restrictions (same as the hand kernel): particles a multiple of 128
(at most ``MAX_LW_KERNEL_PARTICLES`` — smaller than the bootstrap
factory's cap; see the constant's note), f32, static shapes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssme_tpu.ops import _prng
from ssme_tpu.ops._select import (compensated_cdf,
                                  metropolis_select_leaves,
                                  rejection_select_leaves)

TILE = 8
_EPS_CHOL = 1e-9

# Hard ceiling for the LW kernels' in-VMEM particle axis: the joint
# state+parameter selection keeps the dense (n, n) lower-triangular CDF
# matrix resident in VMEM (``lt`` operand below) plus (n, n) one-hot
# transients in ``select_matmul`` — 4MB resident + 4MB transient at
# n=1024, does not compile above that (docs/kernels.md "Particle
# caps"; same dense design and same measured ceiling as the bootstrap
# factory's MAX_KERNEL_PARTICLES, kept as a separate constant so the
# two caps can move independently if either selector changes).  Above
# this, use the XLA path (filters.LiuWestFilter) or shard the particle
# axis (parallel.sharded_pf).
MAX_LW_KERNEL_PARTICLES = 1024

# resampler="metropolis": no (n, n) residents (roll-based joint column
# selection), lifting the LW cap; power-of-two n, measured on chip.
# Documented ancestor-law bias at finite sweeps (docs/kernels.md).
MAX_LW_METROPOLIS_PARTICLES = 4096

_CODES = ("null", "log", "logit", "twice_fisher")


def _to_transformed(code, row):
    """Constrained -> unconstrained, matching ``parameters.h:317-457``
    forward maps (and bit-for-bit the hand kernel's ``lw_init``)."""
    if code == "null":
        return row
    if code == "log":
        return jnp.log(row)
    if code == "logit":
        return jnp.log(row) - jnp.log1p(-row)
    if code == "twice_fisher":
        return jnp.log1p(row) - jnp.log1p(-row)
    raise ValueError(f"unknown transform code {code!r}")


def _to_constrained(code, row):
    """Unconstrained -> constrained (``_constrain_rows`` of the hand
    kernel; inverse maps of ``parameters.h:317-457``)."""
    if code == "null":
        return row
    if code == "log":
        return jnp.exp(row)
    if code == "logit":
        return 1.0 / (1.0 + jnp.exp(-row))
    if code == "twice_fisher":
        return jnp.tanh(0.5 * row)
    raise ValueError(f"unknown transform code {code!r}")


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class LWKernelModel:
    """A Liu-West model as traceable in-kernel hooks (module docstring).

    Instances are compared by identity for jit caching — build them
    through memoized factories (like the built-ins below), never fresh
    per call."""

    num_params: int
    transform_codes: tuple
    sample_prior: Callable
    init: Callable
    propagate: Callable
    log_weight: Callable
    prop_mu: Callable = None
    sample_q: Callable = None       # SISR proposal; default = propagate
    log_fq: Callable = None         # SISR logF - logQ; default = 0
    functionals: tuple = None       # optional h_k(cp, state) -> (1, n)
    num_state: int = 1
    dim_obs: int = 1
    dim_cov: int = 0
    name: str = "lw_kernel_model"

    def __post_init__(self):
        if len(self.transform_codes) != self.num_params:
            raise ValueError("transform_codes must have one code per "
                             "parameter")
        for c in self.transform_codes:
            if c not in _CODES:
                raise ValueError(f"unknown transform code {c!r}")
        if (self.sample_q is None) != (self.log_fq is None):
            # a non-transition SISR proposal needs BOTH the draw and its
            # logF - logQ correction (liu_west_filter.h:1633-1636);
            # exactly one of them silently biases the weights
            raise ValueError(
                "sample_q and log_fq must be supplied together: a "
                "custom SISR proposal (qSamp) requires its logF - logQ "
                "weight correction, and vice versa")

    @property
    def tile_rows(self):
        """Cloud tile height: state + log-weight row + theta, padded to
        a sublane multiple (hand-kernel layout: rows
        [x*S, logw, theta*P, 0-pad])."""
        need = self.num_state + 1 + self.num_params
        return ((need + TILE - 1) // TILE) * TILE

    def constrain(self, th):
        """(P, n) transformed block -> (P, n) constrained block."""
        return jnp.concatenate(
            [_to_constrained(c, th[i:i + 1, :])
             for i, c in enumerate(self.transform_codes)], axis=0)

    def transform(self, cp):
        """(P, n) constrained block -> (P, n) transformed block."""
        return jnp.concatenate(
            [_to_transformed(c, cp[i:i + 1, :])
             for i, c in enumerate(self.transform_codes)], axis=0)


class _Rng:
    normal = staticmethod(_prng.normal_bits)
    uniform = staticmethod(_prng.uniform_bits)
    HALF_LOG_2PI = _prng.HALF_LOG_2PI


def _lse_row(row):
    m = jnp.max(row, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(row - m), axis=-1, keepdims=True))


def _build_kernel(kmodel: LWKernelModel, num_particles, num_steps,
                  shrink_a, resample_every, variant, ess_threshold,
                  steps_per_cell, num_tiles=1,
                  resampler="systematic", metropolis_iters=16):
    n = num_particles
    use_lt = resampler == "systematic"
    k_steps = steps_per_cell
    t_cells = (num_steps + k_steps - 1) // k_steps
    a = shrink_a
    h2 = 1.0 - a * a
    s_rows = kmodel.num_state
    p_rows = kmodel.num_params
    r8 = kmodel.tile_rows
    wrow = s_rows                     # log-weight row index
    throw0 = s_rows + 1               # first theta row index
    fns = tuple(kmodel.functionals or ())
    n_fns = len(fns)
    # APF joint-gather block: state + lookahead points + shrunk theta.
    # The lookahead DENSITY is re-evaluated at the gathered points
    # rather than carried through the selection: the one-hot selection
    # matmul is not an exact f32 gather on the MXU (inputs pass through
    # bf16, docs/kernels.md "Precision"), so gather(f(x)) !=
    # f(gather(x)) on hardware —
    # re-evaluating keeps the factory bit-identical to the hand kernel
    # (measured: carrying the density broke APF bit-compat by ~0.8 in
    # total log-likelihood at T=300 while interpret mode agreed).
    g_rows = 2 * s_rows + p_rows
    g8 = ((g_rows + TILE - 1) // TILE) * TILE

    def kernel(seed_ref, ys_ref, zs_ref, *refs):
        if use_lt:
            lt_ref, lcl_ref, *rest = refs
        else:
            lt_ref = None
            lcl_ref, *rest = refs
        fmean_refs = rest[:n_fns]
        cloud_ref = rest[n_fns]
        s_scr, gram_scr = rest[n_fns + 1:]
        f = pl.program_id(0)
        tc = pl.program_id(1)
        # two threefry-derived seed words per tile (_prng.tile_seeds);
        # the grid cell and tile index are XOR-mixed into the second
        # word so every cell reseeds with a distinct 64-bit-derived
        # stream (two streams collide with prob ~2^-64 per pair)
        pltpu.prng_seed(seed_ref[2 * f],
                        seed_ref[2 * f + 1] ^ (tc * num_tiles + f))

        def obs_at(t):
            # flattened row-major SMEM series (see filter_megakernel's
            # lane-padding note)
            y = tuple(ys_ref[t * kmodel.dim_obs + j]
                      for j in range(kmodel.dim_obs))
            z = tuple(zs_ref[t * kmodel.dim_cov + j]
                      for j in range(kmodel.dim_cov))
            return y, z

        def stage_scalar(ref, t, val):
            col = jax.lax.rem(t, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
            base = jnp.where(col == 0, jnp.zeros_like(ref), ref[:])
            ref[:] = jnp.where(lane == col, val, base)

        def stage_functionals(t, cp, state, lw_row):
            if not n_fns:
                return
            m = jnp.max(lw_row, axis=-1, keepdims=True)
            w = jnp.exp(lw_row - m)
            s = jnp.sum(w, axis=-1, keepdims=True)
            for ref, fn in zip(fmean_refs, fns):
                val = jnp.sum(fn(cp, state) * w, axis=-1,
                              keepdims=True)[0, 0] / s[0, 0]
                stage_scalar(ref, t, val)

        def select_matmul(weights_row, u0_scalar, src):
            """src (R, n); systematic ancestor selection of every row by
            the (1, n) weights, gather-free (one-hot MXU matmuls; joint
            semantics of liu_west_filter.h:90-145)."""
            wtile = jnp.broadcast_to(weights_row, (TILE, n))
            # two-pass compensated CDF (_select.compensated_cdf): ~2^-16
            # relative error vs a single bf16 pass's 2^-8, which would
            # perturb the joint (state, theta) resampling law itself
            cdf8 = compensated_cdf(wtile, lt_ref[:])
            cdf = cdf8[0:1, :]
            total = cdf8[0, n - 1]
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            cdf_ex = jnp.where(lane0 == 0, 0.0,
                               pltpu.roll(cdf, shift=1, axis=1))
            jcol = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(
                jnp.float32)
            # clamp: f32 rounding can push the last systematic point
            # above total (when total/n rounds up), which would match
            # NO lane and silently zero that output particle
            u_col = jnp.minimum((jcol + u0_scalar) * (total / n), total)
            sel = jnp.where((cdf >= u_col) & (cdf_ex < u_col), 1.0, 0.0)
            picked = jax.lax.dot_general(
                sel, jnp.transpose(src), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.transpose(picked)

        def select_particles(weights_row, src):
            """Joint column selection of ``src`` (R, n) by the (1, n)
            weights.  Dense systematic by default (drawing its own u0
            at the exact stream position the call sites used to, so
            the hand-kernel bit-compat is preserved); "metropolis"
            runs per-LANE roll-based chains whose accept mask
            broadcasts over the channel rows — the whole joint
            (state, logw, theta) column moves together, no (n, n)
            residents (the LW cap lift; docs/kernels.md)."""
            if use_lt:
                u0 = _prng.uniform_offset((1, 1))[0, 0]
                return select_matmul(weights_row, u0, src)
            if resampler == "metropolis":
                (picked,) = metropolis_select_leaves(
                    weights_row, [src], pltpu.prng_random_bits,
                    num_iters=metropolis_iters)
                return picked
            # rejection: same per-LANE mask broadcast over channel
            # rows, UNBIASED (runs to termination;
            # _select.rejection_select_leaves)
            (picked,) = rejection_select_leaves(
                weights_row, [src], pltpu.prng_random_bits)
            return picked

        def store_maybe_resampled(t, tile, lw_row):
            """Write ``tile`` to scratch; joint (state, theta)
            systematic resample on schedule / under the ESS gate
            (liu_west_filter.h:480-481,90-145)."""
            s_scr[:] = tile

            def do_resample():
                m = jnp.max(lw_row, axis=-1, keepdims=True)
                w = jnp.exp(lw_row - m)
                picked = select_particles(w, tile)
                lane_row = jax.lax.broadcasted_iota(
                    jnp.int32, (r8, n), 0)
                s_scr[:] = jnp.where(lane_row == wrow,
                                     jnp.zeros_like(picked), picked)

            if ess_threshold > 0.0:
                m = jnp.max(lw_row, axis=-1, keepdims=True)
                w = jnp.exp(lw_row - m)
                s1 = jnp.sum(w)
                s2 = jnp.sum(w * w)
                pl.when(s1 * s1 / s2 < ess_threshold * n)(do_resample)
            elif resample_every == 1:
                do_resample()
            else:
                pl.when(jax.lax.rem(t + 1, resample_every) == 0)(
                    do_resample)

        def lw_init(t, y, z):
            cp0 = kmodel.sample_prior(_Rng, n)              # (P, n)
            th = kmodel.transform(cp0)
            state = kmodel.init(_Rng, cp0, y, n)            # S x (1, n)
            lw = kmodel.log_weight(cp0, state, y, z)
            tile = jnp.concatenate(
                list(state) + [lw, th]
                + ([jnp.zeros((r8 - s_rows - 1 - p_rows, n), jnp.float32)]
                   if r8 > s_rows + 1 + p_rows else []), axis=0)
            lcl_val = _lse_row(lw)[0, 0] - np.log(float(n))
            stage_scalar(lcl_ref, t, lcl_val)
            stage_functionals(t, cp0, state, lw)
            store_maybe_resampled(t, tile, lw)

        def lw_step(t, y, z):
            state = tuple(s_scr[i:i + 1, :] for i in range(s_rows))
            lw = s_scr[wrow:wrow + 1, :]
            th = s_scr[throw0:throw0 + p_rows, :]

            # weighted shrinkage moments (liu_west_filter.h:569-583;
            # weighted form stays correct under rs > 1 / ESS schedules)
            mw = jnp.max(lw, axis=-1, keepdims=True)
            ww = jnp.exp(lw - mw)                            # (1, n)
            wsum = jnp.sum(ww, axis=-1, keepdims=True)
            theta_bar = (jnp.sum(th * ww, axis=-1, keepdims=True)
                         / wsum)                             # (P, 1)
            pads = [jnp.zeros((throw0, 1), jnp.float32), theta_bar]
            if r8 > throw0 + p_rows:
                pads.append(
                    jnp.zeros((r8 - throw0 - p_rows, 1), jnp.float32))
            centered = s_scr[:] - jnp.concatenate(pads, axis=0)
            gram = jax.lax.dot_general(
                centered * ww, jnp.transpose(centered),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / wsum[0, 0]
            gram_scr[:, 0:r8] = gram

            shrunk = a * th + (1.0 - a) * theta_bar          # (P, n)

            if variant == "apf":
                # lookahead at the pre-shrinkage params, density at the
                # shrunk ones (liu_west_filter.h:379-404)
                cp_o = kmodel.constrain(th)
                look = kmodel.prop_mu(cp_o, state, y, z)
                cp_sh = kmodel.constrain(shrunk)
                lg_look = kmodel.log_weight(cp_sh, look, y, z)
                log_fsw = lw + lg_look
                mfs = jnp.max(log_fsw, axis=-1, keepdims=True)
                w_fs = jnp.exp(log_fsw - mfs)
                parts = list(state) + list(look) + [shrunk]
                if g8 > g_rows:
                    parts.append(jnp.zeros((g8 - g_rows, n), jnp.float32))
                anc = select_particles(w_fs, jnp.concatenate(parts, axis=0))
                state_anc = tuple(anc[i:i + 1, :] for i in range(s_rows))
                look_anc = tuple(anc[s_rows + i:s_rows + i + 1, :]
                                 for i in range(s_rows))
                shrunk_anc = anc[2 * s_rows:2 * s_rows + p_rows, :]
            else:
                # SISR form (LWFilter2, liu_west_filter.h:1608-1649):
                # no lookahead; every particle keeps its own shrunk mean
                state_anc = state
                look_anc = None
                shrunk_anc = shrunk
                log_fsw = None

            # unrolled P x P scalar Cholesky of h^2 Vt
            # (liu_west_filter.h:426-427,569-583)
            def g(i, j):
                return h2 * gram_scr[throw0 + i, throw0 + j]
            lmat = [[None] * p_rows for _ in range(p_rows)]
            for jj in range(p_rows):
                s = g(jj, jj)
                for k in range(jj):
                    s = s - lmat[jj][k] * lmat[jj][k]
                lmat[jj][jj] = jnp.sqrt(jnp.maximum(s, _EPS_CHOL))
                for i in range(jj + 1, p_rows):
                    s = g(i, jj)
                    for k in range(jj):
                        s = s - lmat[i][k] * lmat[jj][k]
                    lmat[i][jj] = s / lmat[jj][jj]

            e = _prng.normal_bits((p_rows, n))
            th_rows = []
            for i in range(p_rows):
                acc = shrunk_anc[i:i + 1, :]
                for k in range(i + 1):
                    acc = acc + lmat[i][k] * e[k:k + 1, :]
                th_rows.append(acc)
            th_new = jnp.concatenate(th_rows, axis=0)

            cp_new = kmodel.constrain(th_new)
            prop = (kmodel.sample_q if (variant == "sisr"
                                        and kmodel.sample_q is not None)
                    else kmodel.propagate)
            new_state = prop(_Rng, cp_new, state_anc, y, z)

            if variant == "apf":
                # obs-density ratio (lw:433); carried-weight 3-term
                # conditional likelihood (lw:449-452)
                cp_sh_anc = kmodel.constrain(shrunk_anc)
                lw_new = (kmodel.log_weight(cp_new, new_state, y, z)
                          - kmodel.log_weight(cp_sh_anc, look_anc, y, z))
                lcl_val = (_lse_row(log_fsw)[0, 0]
                           - _lse_row(lw)[0, 0]
                           + _lse_row(lw_new)[0, 0]
                           - np.log(float(n)))
            else:
                # +logG (+ logF - logQ when the proposal is not the
                # transition, lw:1634-1636); cond-like = LSE ratio
                # (lw:1651-1659)
                inc = kmodel.log_weight(cp_new, new_state, y, z)
                if kmodel.log_fq is not None:
                    inc = inc + kmodel.log_fq(cp_new, new_state,
                                              state_anc, y, z)
                lw_new = lw + inc
                lcl_val = (_lse_row(lw_new)[0, 0] - _lse_row(lw)[0, 0])
            stage_scalar(lcl_ref, t, lcl_val)
            stage_functionals(t, cp_new, new_state, lw_new)

            tile = jnp.concatenate(
                list(new_state) + [lw_new, th_new]
                + ([jnp.zeros((r8 - s_rows - 1 - p_rows, n), jnp.float32)]
                   if r8 > s_rows + 1 + p_rows else []), axis=0)
            store_maybe_resampled(t, tile, lw_new)

        # K time steps per grid cell; substeps beyond the series length
        # are skipped (the exposed final cloud must not be filtered on
        # the zero-padded tail)
        for k in range(k_steps):
            t = tc * k_steps + k
            y, z = obs_at(t)
            if k == 0:
                @pl.when(tc == 0)
                def _(t=t, y=y, z=z):
                    lw_init(t, y, z)

                @pl.when(tc > 0)
                def _(t=t, y=y, z=z):
                    lw_step(t, y, z)
            else:
                @pl.when(t < num_steps)
                def _(t=t, y=y, z=z):
                    lw_step(t, y, z)

        @pl.when(tc == t_cells - 1)
        def _():
            cloud_ref[:] = s_scr[:]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "kmodel", "num_filters", "num_particles", "delta", "resample_every",
    "variant", "interpret", "ess_threshold", "steps_per_cell",
    "resampler", "metropolis_iters"))
def lw_megakernel(kmodel: LWKernelModel, seed, ys, zs=None,
                  num_filters: int = 1, num_particles: int = 512,
                  delta: float = 0.99, resample_every: int = 1,
                  variant: str = "apf", interpret: bool = False,
                  ess_threshold: float = 0.0, steps_per_cell: int = 4,
                  resampler: str = "systematic",
                  metropolis_iters: int = 16):
    """Run ``num_filters`` whole-sequence Liu-West filters in one
    ``pallas_call`` for any :class:`LWKernelModel`.

    seed: int32 scalar; ys: (T,) or (T, dim_obs); zs: (T, dim_cov)
    covariates (``LWFilterWithCovs`` surface,
    ``liu_west_filter.h:756-1197``) or None.

    Returns dict with ``log_cond_likes`` (F, T), ``log_likelihood``
    (F,), ``cloud`` (F, tile_rows, N) — rows
    [state x S, logw, theta_trans x P, 0-pad]; decode with
    :func:`lw_cloud_params` / :func:`lw_cloud_weights` /
    :func:`lw_cloud_states` — and, when the model declares
    ``functionals``, ``functional_paths``: a tuple of (F, T)
    self-normalized filtered-mean paths (lw:457-477).
    """
    ys = jnp.asarray(ys, jnp.float32).reshape(-1, kmodel.dim_obs)
    t_len = ys.shape[0]
    if kmodel.dim_cov:
        if zs is None:
            raise ValueError(f"model {kmodel.name!r} needs covariates zs")
        zs = jnp.asarray(zs, jnp.float32).reshape(t_len, kmodel.dim_cov)
    else:
        if zs is not None:
            raise ValueError(
                f"model {kmodel.name!r} has dim_cov=0 but covariates zs "
                "were supplied — build the kernel model with dim_cov set "
                "if the model should see them")
        zs = jnp.zeros((t_len, 1), jnp.float32)
    ys = ys.reshape(-1)
    zs = zs.reshape(-1)

    n = num_particles
    if n % 128:
        raise ValueError(f"num_particles={n} must be a multiple of 128")
    if resampler not in ("systematic", "metropolis", "rejection"):
        raise ValueError(f"unknown resampler {resampler!r}")
    use_lt = resampler == "systematic"
    if use_lt and n > MAX_LW_KERNEL_PARTICLES:
        raise ValueError(
            f"num_particles={n}: the in-VMEM lower-triangular CDF matrix "
            f"is n^2 floats; above {MAX_LW_KERNEL_PARTICLES} it exceeds "
            "scoped VMEM. Use resampler='metropolis' (schedule/sweep-"
            "dependent evidence bias per the docs/kernels.md table, cap "
            f"{MAX_LW_METROPOLIS_PARTICLES}), the XLA path "
            "(filters.LiuWestFilter), or shard the particle axis "
            "(parallel.sharded_lw).")
    if not use_lt and n > MAX_LW_METROPOLIS_PARTICLES:
        raise ValueError(
            f"num_particles={n} exceeds the metropolis cap "
            f"{MAX_LW_METROPOLIS_PARTICLES}; use filters.LiuWestFilter "
            "or parallel.sharded_lw")
    if not use_lt and (n & (n - 1)):
        raise ValueError(
            f"num_particles={n}: resampler='metropolis' needs a "
            "power-of-two particle count (its roll decomposition masks "
            "the shift to [0, n))")
    if kmodel.tile_rows > 128:
        raise ValueError("num_state + 1 + num_params must fit in 128 "
                         "tile rows")
    if variant not in ("apf", "sisr"):
        raise ValueError("variant must be 'apf' or 'sisr'")
    if variant == "apf" and kmodel.prop_mu is None:
        raise ValueError(f"model {kmodel.name!r} has no prop_mu hook "
                         "(required for the APF form)")
    if int(resample_every) < 1:
        raise ValueError("resample_every must be >= 1 (1 = the reference "
                         "schedule, liu_west_filter.h:480-481)")
    k_steps = int(steps_per_cell)
    if k_steps < 1 or 128 % k_steps:
        raise ValueError("steps_per_cell must divide 128")
    shrink_a = (3.0 * delta - 1.0) / (2.0 * delta)   # lw:354

    t_cells = (t_len + k_steps - 1) // k_steps
    pad_steps = t_cells * k_steps - t_len
    ys = jnp.concatenate(
        [ys, jnp.zeros((pad_steps * kmodel.dim_obs,), ys.dtype)])
    zs = jnp.concatenate(
        [zs, jnp.zeros((pad_steps * max(1, kmodel.dim_cov),), zs.dtype)])

    seed_arr = _prng.tile_seeds(seed, num_filters)
    t_pad = ((t_cells * k_steps + 127) // 128) * 128
    r8 = kmodel.tile_rows
    n_fns = len(kmodel.functionals or ())
    in_specs = []
    inputs = []
    if use_lt:
        in_specs.append(pl.BlockSpec((n, n), lambda fidx, t, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(np.tril(np.ones((n, n), np.float32)).T))

    outs = pl.pallas_call(
        _build_kernel(kmodel, n, t_len, shrink_a, int(resample_every),
                      variant, float(ess_threshold), k_steps, num_filters,
                      resampler, int(metropolis_iters)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,   # seed, ys, zs (SMEM)
            grid=(num_filters, t_cells),
            in_specs=in_specs,
            out_specs=(
                [pl.BlockSpec((TILE, 128),
                              lambda fidx, t, *_: (fidx,
                                                   (t * k_steps) // 128),
                              memory_space=pltpu.VMEM)
                 for _ in range(1 + n_fns)]          # lcl + functionals
                + [pl.BlockSpec((r8, n), lambda fidx, t, *_: (fidx, 0),
                                memory_space=pltpu.VMEM)]
            ),
            scratch_shapes=[
                pltpu.VMEM((r8, n), jnp.float32),     # cloud tile
                pltpu.VMEM((r8, 128), jnp.float32),   # gram staging
            ],
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((num_filters * TILE, t_pad), jnp.float32)
             for _ in range(1 + n_fns)]
            + [jax.ShapeDtypeStruct((num_filters * r8, n), jnp.float32)]
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, ys, zs, *inputs)

    # scalar outputs were broadcast to all 8 staging rows; take row 0
    lcls = outs[0].reshape(num_filters, TILE, t_pad)[:, 0, :t_len]
    out = {
        "log_cond_likes": lcls,
        "log_likelihood": jnp.sum(lcls, axis=-1),
        "cloud": outs[-1].reshape(num_filters, r8, n),
    }
    if n_fns:
        out["functional_paths"] = tuple(
            o.reshape(num_filters, TILE, t_pad)[:, 0, :t_len]
            for o in outs[1:1 + n_fns])
    return out


def lw_cloud_params(kmodel: LWKernelModel, cloud):
    """(F, tile_rows, N) kernel cloud -> (F, N, P) CONSTRAINED parameter
    particles (getParamSamples surface, liu_west_filter.h:1170-1173).

    Plain means are valid only right after a resample (uniform
    weights); combine with :func:`lw_cloud_weights` otherwise."""
    th0 = kmodel.num_state + 1
    th = cloud[:, th0:th0 + kmodel.num_params, :]
    rows = [_to_constrained(c, th[:, i])
            for i, c in enumerate(kmodel.transform_codes)]
    return jnp.stack(rows, axis=-1)


def lw_cloud_weights(kmodel: LWKernelModel, cloud):
    """(F, tile_rows, N) -> (F, N) normalized particle weights."""
    lw = cloud[:, kmodel.num_state, :]
    mx = jnp.max(lw, axis=-1, keepdims=True)
    w = jnp.exp(lw - mx)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def lw_cloud_states(kmodel: LWKernelModel, cloud):
    """(F, tile_rows, N) -> (F, S, N) state particle rows."""
    return cloud[:, :kmodel.num_state, :]


def lw_kernel_sim_future_obs(kmodel: LWKernelModel, model, cloud, key,
                             num_steps: int, delta: float = 0.99,
                             variant: str = "apf", last_obs=None):
    """Future simulation FROM a megakernel run's exposed final cloud.

    The future-simulator surface (``liu_west_filter.h:693-738`` and the
    covariate variant ``:1315-1363``) is not inside the Pallas kernel —
    forecasting is a tiny post-pass, not a hot loop — so this bridge
    decodes the kernel's final cloud and delegates to the XLA
    ``filters.LiuWestFilter.sim_future_obs`` (which also fixes the
    reference's latent ``m_delta`` bug, ``:719``).

    kmodel/cloud: the :func:`lw_megakernel` model and its ``cloud``
    output (F, tile_rows, N).  ``model``: the matching
    :class:`~ssme_tpu.models.base.StateSpaceModel` (the same pairing as
    ``megakernel_log_like``'s large-N bridge) supplying ``sample_f`` /
    ``sample_g`` / transforms.  ``delta``/``variant`` as passed to the
    kernel.  ``last_obs``: required for covariate models (observations
    feed back as covariates, the enforced convention of ``:1255,2419``).

    Returns (F, num_steps, N, dim_obs) simulated observation paths.

    Note: the cloud's carried weights are IGNORED (the reference
    simulators also continue from the raw particle set).  Under the
    canonical resample-every-step schedule the final cloud is uniform;
    with ``resample_every > 1`` / ESS-gated schedules, resample the
    cloud by :func:`lw_cloud_weights` first if uniform-weight paths are
    wanted.
    """
    from ssme_tpu.filters.liu_west import LiuWestFilter

    cloud = jnp.asarray(cloud)
    n = cloud.shape[-1]
    states = jnp.swapaxes(lw_cloud_states(kmodel, cloud), 1, 2)  # (F,N,S)
    th0 = kmodel.num_state + 1
    trans = jnp.swapaxes(
        cloud[:, th0:th0 + kmodel.num_params, :], 1, 2)          # (F,N,P)
    filt = LiuWestFilter(model, num_particles=n, delta=delta,
                         variant=variant)
    keys = jax.random.split(key, cloud.shape[0])
    return jax.vmap(
        lambda st, th, k: filt.sim_future_obs(k, st, th, num_steps,
                                              last_obs=last_obs)
    )(states, trans, keys)


# ---------------------------------------------------------------------------
# Built-in Liu-West kernel models (memoized: LWKernelModel registers
# static with eq=False, so jit caches by object identity)
# ---------------------------------------------------------------------------

def _uniform_box_prior(prior_bounds):
    """(rng, n) hook drawing each parameter row from an independent
    uniform box (paramPriorSamp of the reference tests,
    ``test_liu_west.cpp:39-45``), bit-matching the hand kernel's
    ``lw_init`` draw order (one (P, n) uniform block)."""
    lo = np.asarray([b[0] for b in prior_bounds], np.float32)
    hi = np.asarray([b[1] for b in prior_bounds], np.float32)
    p = len(prior_bounds)
    base = [float(lo[i]) for i in range(p)]
    scale = [float(hi[i] - lo[i]) for i in range(p)]

    def sample_prior(rng, n):
        u = rng.uniform((p, n))
        return jnp.concatenate(
            [base[i] + scale[i] * u[i:i + 1, :] for i in range(p)],
            axis=0)

    return sample_prior


@functools.lru_cache(maxsize=None)
def svol_leverage_lw_kernel_model(prior_bounds=None) -> LWKernelModel:
    """SVOL-with-leverage (``test/test_liu_west.cpp:25-157``) as an LW
    kernel model: parameters (phi, mu, sigma, rho), transforms
    {logit, null, log, twice_fisher}, covariate z = lagged observation.
    Bit-compatible with the hand kernel
    ``ops/svol_leverage_lw_kernel.svol_leverage_lw_pallas`` (same hook
    arithmetic and PRNG draw order) — tested in
    ``tests/test_lw_factory.py``."""
    from ssme_tpu.models.svol_leverage import DEFAULT_PRIOR_BOUNDS
    if prior_bounds is None:
        prior_bounds = DEFAULT_PRIOR_BOUNDS

    def init(rng, cp, y, n):
        phi, sig = cp[0:1, :], cp[2:3, :]
        sd0 = sig / jnp.sqrt(1.0 - phi * phi)
        return (rng.normal((1, n)) * sd0,)

    def propagate(rng, cp, state, y, z):
        phi, mu, sig, rho = (cp[0:1, :], cp[1:2, :], cp[2:3, :],
                             cp[3:4, :])
        (x,) = state
        # mean clamp = models/svol_leverage.STATE_CLAMP (f32 runaway
        # guard for the explosive leverage feedback; see model note)
        mean = jnp.clip(mu + phi * (x - mu)
                        + z[0] * rho * sig * jnp.exp(-0.5 * x),
                        -40.0, 40.0)
        sd = sig * jnp.sqrt(1.0 - rho * rho)
        return (mean + sd * rng.normal(x.shape),)

    def prop_mu(cp, state, y, z):
        phi, mu, sig, rho = (cp[0:1, :], cp[1:2, :], cp[2:3, :],
                             cp[3:4, :])
        (x,) = state
        return (jnp.clip(mu + phi * (x - mu)
                         + z[0] * rho * sig * jnp.exp(-0.5 * x),
                         -40.0, 40.0),)

    def log_weight(cp, state, y, z):
        # y ~ N(0, e^{x/2}); parameter-free (test_liu_west.cpp:133-136)
        (x,) = state
        sd = jnp.exp(0.5 * x)
        zz = y[0] / sd
        return -_prng.HALF_LOG_2PI - 0.5 * x - 0.5 * zz * zz

    return LWKernelModel(
        num_params=4,
        transform_codes=("logit", "null", "log", "twice_fisher"),
        sample_prior=_uniform_box_prior(prior_bounds),
        init=init, propagate=propagate, log_weight=log_weight,
        prop_mu=prop_mu, dim_cov=1, name="svol_leverage_lw")


@functools.lru_cache(maxsize=None)
def svol_t_lw_kernel_model(
        nu: float = 5.0,
        prior_bounds=((0.5, 2.0), (0.6, 0.99), (0.05, 1.0)),
) -> LWKernelModel:
    """Student-t observation SVOL (``models/svol_t.py``) through the LW
    factory: joint online estimation of (beta, phi, sigma) at fixed dof
    ``nu`` — the "new model at kernel speed" the factory exists for.

    Transforms {log, twice_fisher, log}: beta uses 'log' (not the PMMH
    example's 'null', ``estimate_univ_svol.h:153``) because the
    kernel-shrinkage MVN perturbs theta in transformed space and beta
    must stay positive.  The t normalizing constant depends only on the
    fixed nu, so it is baked in as a trace-time float
    (cf. ``filter_megakernel.svol_t_param_rows``)."""
    nu = float(nu)
    c_nu = (math.lgamma(0.5 * (nu + 1.0)) - math.lgamma(0.5 * nu)
            - 0.5 * math.log(nu * math.pi))

    def init(rng, cp, y, n):
        phi, sig = cp[1:2, :], cp[2:3, :]
        sd0 = sig / jnp.sqrt(1.0 - phi * phi)
        return (rng.normal((1, n)) * sd0,)

    def propagate(rng, cp, state, y, z):
        phi, sig = cp[1:2, :], cp[2:3, :]
        (x,) = state
        return (phi * x + sig * rng.normal(x.shape),)

    def prop_mu(cp, state, y, z):
        (x,) = state
        return (cp[1:2, :] * x,)

    def log_weight(cp, state, y, z):
        beta = cp[0:1, :]
        (x,) = state
        zval = (y[0] / beta) * jnp.exp(-0.5 * x)
        return (c_nu - jnp.log(beta) - 0.5 * x
                - 0.5 * (nu + 1.0) * jnp.log1p(zval * zval / nu))

    return LWKernelModel(
        num_params=3,
        transform_codes=("log", "twice_fisher", "log"),
        sample_prior=_uniform_box_prior(prior_bounds),
        init=init, propagate=propagate, log_weight=log_weight,
        prop_mu=prop_mu,
        functionals=(lambda cp, st: st[0],),    # filtered mean log-vol
        name="svol_t_lw")


__all__ = ["LWKernelModel", "lw_megakernel", "lw_cloud_params",
           "lw_cloud_weights", "lw_cloud_states",
           "lw_kernel_sim_future_obs",
           "svol_leverage_lw_kernel_model", "svol_t_lw_kernel_model",
           "MAX_LW_KERNEL_PARTICLES", "MAX_LW_METROPOLIS_PARTICLES",
           "TILE"]
