"""Generic Pallas TPU megakernel factory: a whole-sequence bootstrap
particle filter in VMEM for ANY model expressed as in-kernel hooks.

``ops/svol_filter_kernel.py`` proved the design on the flagship model
(reference ``example/estimate_univ_svol.h:108-131`` semantics: run a
bootstrap filter over all T observations, sum conditional
log-likelihoods) — grid = (filter tiles, T), particle state persisting in
VMEM scratch, hardware-PRNG propagation, gather-free dense one-hot
systematic resampling on the MXU (``ops/_select.py``).  This module lifts that design into a *factory*:
a model plugs in three traceable cloud-level hooks and gets the same
megakernel performance, the way the reference lets any model subclass
``BSFilter`` (``pf/bootstrap_filter.h`` hook set, SURVEY §2.3) and reuse
the filter loop.

A :class:`KernelModel` supplies, over ``(TILE_B, n)`` particle blocks:

- ``init(rng, p, y, z, shape) -> state``  time-1 proposal (q1Samp);
  ``shape`` is the ``(TILE_B, n)`` cloud shape to draw at
- ``propagate(rng, p, state, y, z) -> state``   transition draw (fSamp)
- ``log_weight(p, state, y, z) -> (TILE_B, n)`` obs log-density (logGEv)
- optional ``functional(p, state) -> (TILE_B, n)``  per-particle h(x)
  whose filtered (self-normalized) mean is emitted per step
  (``getExpectations``, ``pf/bootstrap_filter.h`` / ``pswarm_filter.h``)

where ``p`` is the ``(TILE_B, num_params)`` constrained-parameter block
(one row per filter), ``y``/``z`` are tuples of SMEM scalars for the
current step, ``state`` is a tuple of ``num_state`` ``(TILE_B, n)``
float32 arrays (multi-dimensional states = multiple leaves), and ``rng``
draws from the TPU hardware PRNG (`rng.normal(shape)` /
`rng.uniform(shape)`).

Two filtering modes: ``mode="bootstrap"`` (propagate through the
transition, weight by the observation density, ESS-gated systematic
resampling with carried weights) and ``mode="apf"`` (Pitt-Shephard
auxiliary PF via a ``prop_mu`` lookahead hook).  Multiple time steps
run per grid cell (``steps_per_cell``) to amortize fixed cell overhead.

Restrictions (same as the hand-written kernels): particles a multiple
of 128 (and at most :data:`MAX_KERNEL_PARTICLES`), filter batch a
multiple of 8, f32 state.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssme_tpu.ops import _prng
from ssme_tpu.ops._select import (metropolis_bias_estimate,
                                  metropolis_select_leaves,
                                  metropolis_sweeps_for,
                                  rejection_select_leaves,
                                  select_leaves_dense)
from ssme_tpu.utils import logmeanexp

TILE_B = 8

# Hard ceiling for the in-kernel particle axis, MEASURED on TPU v5e
# (examples/probe_vmem_fix.py, round 3): n=1024 compiles and runs at
# both schedules (with per-substep regions — substep_regions auto);
# n=2048 fails TPU compilation under the dense selector ((n, n) CDF +
# one-hot transients) AND under the round-2 blocked selector (per-row
# (n, 128*(1+L)) fetch buffers) — 16MB scoped VMEM either way.  Above
# this, use the XLA path (filters.BootstrapFilter / the automatic
# dispatch in megakernel_log_like) or shard the particle axis
# (parallel.sharded_pf) — and prefer replicates anyway: R independent
# n=512 filters log-mean-exp'd cost the same FLOPs and parallelize
# perfectly across the row axis (docs/kernels.md "Particle caps").
MAX_KERNEL_PARTICLES = 1024

# resampler="metropolis" carries no (n, n) residents; n=2048 and n=4096
# measured compiling and running on v5e (examples/probe_metropolis.py).
# Power-of-two n required (roll decomposition).  Ancestor-law bias at
# finite sweeps is documented in docs/kernels.md — the unbiased paths
# above the dense cap remain the XLA bank and parallel.sharded_pf.
MAX_METROPOLIS_PARTICLES = 4096


class _Rng:
    """In-kernel PRNG namespace handed to model hooks."""

    normal = staticmethod(_prng.normal_bits)
    uniform = staticmethod(_prng.uniform_bits)
    HALF_LOG_2PI = _prng.HALF_LOG_2PI


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class KernelModel:
    """A model as traceable in-kernel hooks (see module docstring)."""

    num_params: int
    init: Callable
    propagate: Callable
    log_weight: Callable
    num_state: int = 1
    dim_obs: int = 1
    dim_cov: int = 0
    functional: Callable = None   # default: first state leaf
    # vector of per-particle filter functionals h_k(p, state) ->
    # (TILE_B, n); each gets its own per-step normalized-mean output
    # path (parity with the reference's vector of filter functions,
    # pf_base::getExpectations driven at pswarm_filter.h:86-92).
    # Overrides ``functional`` when set.
    functionals: tuple = None
    # APF lookahead (propMu): (p, state, y, z) -> state-shaped tuple of
    # per-particle lookahead points; required for mode="apf"
    prop_mu: Callable = None
    name: str = "kernel_model"

    @property
    def functional_list(self):
        if self.functionals is not None:
            return tuple(self.functionals)
        return (self.functional or (lambda p_, st: st[0]),)


def _make_kernel(kmodel: KernelModel, num_particles: int, ess_frac: float,
                 mode: str = "bootstrap", steps_per_cell: int = 1,
                 num_tiles: int = 1, num_steps: int = 0,
                 substep_regions: bool = False,
                 resampler: str = "systematic", metropolis_iters: int = 16,
                 return_cloud: bool = False, gate_stride: int = 1):
    n = num_particles
    n_leaves = kmodel.num_state
    k_steps = steps_per_cell
    always = ess_frac >= 1.0
    log_n = float(np.log(float(n)))
    use_lt = resampler == "systematic"
    g = int(gate_stride)

    fns = kmodel.functional_list
    n_fns = len(fns)

    def kernel(seed_ref, ys_ref, zs_ref, params_ref, *refs):
        if use_lt:
            lt_ref, out_ref, *rest = refs
        else:
            lt_ref = None
            out_ref, *rest = refs
        fmean_refs = rest[:n_fns]
        rest = rest[n_fns:]
        if return_cloud:
            cloud_refs = rest[:n_leaves]
            cloud_lw_ref = rest[n_leaves]
            rest = rest[n_leaves + 1:]
        scratch = rest
        state_scr = scratch[:n_leaves]
        lw_scr = scratch[n_leaves]      # carried max-normalized log-wts
        carry_scr = scratch[n_leaves + 1]   # LSE(lw_scr) in every lane
        b = pl.program_id(0)
        tc = pl.program_id(1)
        # two threefry-derived seed words per tile (_prng.tile_seeds);
        # the grid cell and tile index are XOR-mixed into the second
        # word so every cell reseeds with a distinct 64-bit-derived
        # stream (two streams collide with prob ~2^-64 per pair)
        pltpu.prng_seed(seed_ref[2 * b],
                        seed_ref[2 * b + 1] ^ (tc * num_tiles + b))

        p = params_ref[:]                                    # (8, P)

        def obs_at(t):
            # ys/zs are flattened row-major to 1-D for SMEM prefetch: a
            # 2-D SMEM operand is lane-padded to 128 columns (T x 128 x
            # 4B blows the 1MB SMEM budget for long series)
            y = tuple(ys_ref[t * kmodel.dim_obs + j]
                      for j in range(kmodel.dim_obs))
            z = tuple(zs_ref[t * kmodel.dim_cov + j]
                      for j in range(kmodel.dim_cov))
            return y, z

        def select_leaves(w, leaves):
            """Ancestor selection of every (8, n) leaf by the per-row
            weights ``w``; leaf rows move jointly by the same ancestors
            (liu_west_filter.h:90-145 joint-gather semantics).

            "systematic" (default): gather-free dense one-hot on the
            MXU (``_select.select_leaves_dense``); the gather matmul
            runs at the MXU default precision, so gathered VALUES pass
            through bf16 — which is why densities are RE-EVALUATED
            after selection rather than carried through it (see
            apf_step / docs/kernels.md "Precision").

            "metropolis": O(n log n) roll-based Metropolis chains
            (``_select.metropolis_select_leaves``) — no (n, n)
            residents, so it lifts the VMEM particle cap; finite-sweep
            ancestor-law bias (docs/kernels.md table).

            "rejection": roll-based rejection resampler
            (``_select.rejection_select_leaves``) — no (n, n)
            residents either, and UNBIASED (runs to termination;
            data-dependent sweep count)."""
            if use_lt:
                u0 = _prng.uniform_offset((TILE_B, 1))       # (8, 1)
                return select_leaves_dense(w, leaves, u0, lt_ref[:])
            if resampler == "metropolis":
                return metropolis_select_leaves(
                    w, leaves, pltpu.prng_random_bits,
                    num_iters=metropolis_iters)
            return rejection_select_leaves(
                w, leaves, pltpu.prng_random_bits)

        def stage_outputs(t, lcl, fmeans):
            # stage into the revisited (8, 128) output blocks (flushed
            # to HBM once per 128 steps); masked full-block write.
            # Freshness rule: zero the block at its FIRST write — with
            # gate_stride g writes land at cols ≡ g-1 (mod g) plus a
            # possible tail check, so the first write of a 128-block
            # always has col < g (g divides 128); g == 1 reduces to the
            # original col == 0 rule bit-compatibly.
            col = jax.lax.rem(t, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, 128), 1)
            base = jnp.where(col < g, jnp.zeros_like(out_ref),
                             out_ref[:])
            out_ref[:] = jnp.where(lane == col, lcl, base)
            for fref, fmean in zip(fmean_refs, fmeans):
                base_f = jnp.where(col < g, jnp.zeros_like(fref),
                                   fref[:])
                fref[:] = jnp.where(lane == col, fmean, base_f)

        # ---- gate_stride > 1 (bootstrap mode): the transcendental
        # lever (docs/kernels.md "gate_stride") — accumulate
        # un-renormalized log-weights between LSE/ESS checks; staged
        # per-check lcls telescope exactly to the evidence; functional
        # means are emitted at check columns only.

        def propagate_only(y, z):
            cur = tuple(s_[:] for s_ in state_scr)
            new_state = kmodel.propagate(_Rng, p, cur, y, z)
            for leaf in range(n_leaves):
                state_scr[leaf][:] = new_state[leaf]

        def accumulate_weight(t, y, z):
            cur = tuple(s_[:] for s_ in state_scr)
            lw_scr[:] = lw_scr[:] + kmodel.log_weight(p, cur, y, z)

        def check_and_stage(t):
            cur = tuple(s_[:] for s_ in state_scr)
            lw = lw_scr[:]
            m = jnp.max(lw, axis=-1, keepdims=True)
            wnorm = jnp.exp(lw - m)
            ssum = jnp.sum(wnorm, axis=-1, keepdims=True)
            lcl = (m + jnp.log(ssum)) - carry_scr[:, 0:1]
            fmeans = [jnp.sum(fn(p, cur) * wnorm, axis=-1,
                              keepdims=True) / ssum
                      for fn in fns]
            stage_outputs(t, lcl, fmeans)
            lw_scr[:] = lw - m
            carry_scr[:] = jnp.broadcast_to(jnp.log(ssum),
                                            carry_scr.shape)

            def resample():
                picked = select_leaves(wnorm, [s_[:] for s_ in state_scr])
                for leaf in range(n_leaves):
                    state_scr[leaf][:] = picked[leaf]
                lw_scr[:] = jnp.zeros_like(lw_scr)
                carry_scr[:] = jnp.full_like(carry_scr, log_n)

            s2 = jnp.sum(wnorm * wnorm, axis=-1, keepdims=True)
            pl.when(jnp.min(ssum * ssum / s2) < ess_frac * n)(resample)

        def weight_and_stage(t, y, z):
            """Shared tail: add this step's log_g to the carried
            weights, emit the ratio-form conditional log-likelihood,
            renormalize the carry."""
            cur_state = tuple(s[:] for s in state_scr)
            lw = lw_scr[:] + kmodel.log_weight(p, cur_state, y, z)
            m = jnp.max(lw, axis=-1, keepdims=True)
            wnorm = jnp.exp(lw - m)
            s = jnp.sum(wnorm, axis=-1, keepdims=True)
            lcl = (m + jnp.log(s)) - carry_scr[:, 0:1]
            lw_scr[:] = lw - m
            carry_scr[:] = jnp.broadcast_to(jnp.log(s), carry_scr.shape)
            fmeans = [jnp.sum(fn(p, cur_state) * wnorm, axis=-1,
                              keepdims=True) / s              # (8, 1)
                      for fn in fns]
            stage_outputs(t, lcl, fmeans)

        def init_t0(y, z):
            st0 = kmodel.init(_Rng, p, y, z, (TILE_B, n))
            for leaf in range(n_leaves):
                state_scr[leaf][:] = st0[leaf]
            lw_scr[:] = jnp.zeros_like(lw_scr)
            carry_scr[:] = jnp.full_like(carry_scr, log_n)

        def bootstrap_advance(y, z):
            # ---- maybe resample, then propagate ------------------------
            # ESS-gated resampling with proper carried weights (see
            # svol_filter_kernel.py for the cost rationale and the
            # ratio-form conditional-likelihood accounting)
            w = jnp.exp(lw_scr[:])                           # (8, n)

            def resample():
                picked = select_leaves(w, [s[:] for s in state_scr])
                for leaf in range(n_leaves):
                    state_scr[leaf][:] = picked[leaf]
                lw_scr[:] = jnp.zeros_like(lw_scr)
                carry_scr[:] = jnp.full_like(carry_scr, log_n)

            if always:
                resample()
            else:
                s1 = jnp.sum(w, axis=-1, keepdims=True)
                s2 = jnp.sum(w * w, axis=-1, keepdims=True)
                pl.when(jnp.min(s1 * s1 / s2) < ess_frac * n)(resample)

            cur = tuple(s[:] for s in state_scr)
            new_state = kmodel.propagate(_Rng, p, cur, y, z)
            for leaf in range(n_leaves):
                state_scr[leaf][:] = new_state[leaf]

        def apf_step(t, y, z):
            # first-stage lookahead weights fsw = lw + logG(look);
            # select ancestors of (state, look) jointly; propagate;
            # second-stage weights = logG(new) - logG(look_anc).
            # Conditional likelihood with carried weights:
            #   [LSE(fsw) - LSE(lw)] + [LSE(w_new) - log n]
            # (cf. liu_west_filter.h:449-452 corrected for carry)
            cur = tuple(s[:] for s in state_scr)
            look = kmodel.prop_mu(p, cur, y, z)
            lg_look = kmodel.log_weight(p, look, y, z)
            fsw = lw_scr[:] + lg_look
            m_fs = jnp.max(fsw, axis=-1, keepdims=True)
            w_fs = jnp.exp(fsw - m_fs)
            s_fs = jnp.sum(w_fs, axis=-1, keepdims=True)

            # select the (state, lookahead) leaves jointly, then
            # RE-EVALUATE the lookahead density at the selected points:
            # the selection gather runs at the MXU default precision
            # (values pass through bf16), and carrying a rounded
            # density alongside exact-er points biases the second-stage
            # ratio (the LW factory measured ~0.8 nats over T=300 from
            # exactly this; liu_west_megakernel.py's precision note) —
            # one extra elementwise log_weight is cheaper than an exact
            # HIGHEST-precision gather
            picked = select_leaves(w_fs, list(cur) + list(look))
            state_sel = tuple(picked[:n_leaves])
            look_sel = tuple(picked[n_leaves:])
            lg_look_sel = kmodel.log_weight(p, look_sel, y, z)

            new_state = kmodel.propagate(_Rng, p, state_sel, y, z)
            for leaf in range(n_leaves):
                state_scr[leaf][:] = new_state[leaf]
            lg_new = kmodel.log_weight(p, new_state, y, z)
            lw_new = lg_new - lg_look_sel

            m2 = jnp.max(lw_new, axis=-1, keepdims=True)
            w2 = jnp.exp(lw_new - m2)
            s2 = jnp.sum(w2, axis=-1, keepdims=True)
            lcl = ((m_fs + jnp.log(s_fs)) - carry_scr[:, 0:1]
                   + (m2 + jnp.log(s2)) - log_n)
            lw_scr[:] = lw_new - m2
            carry_scr[:] = jnp.broadcast_to(jnp.log(s2), carry_scr.shape)
            cur_new = tuple(s[:] for s in state_scr)
            fmeans = [jnp.sum(fn(p, cur_new) * w2, axis=-1,
                              keepdims=True) / s2
                      for fn in fns]
            stage_outputs(t, lcl, fmeans)

        # K time steps per grid cell (amortizes the fixed per-cell
        # overhead, which dominates non-resampling cells under the
        # ESS-adaptive schedule).  Substeps k >= 1 run straight-line by
        # default (fastest); substep_regions=True wraps each advance in
        # its own pl.when region — the compile fallback when inlined
        # selector transients overflow the 16MB scoped VMEM (Mosaic
        # scopes a region's stack but accumulates straight-line live
        # ranges; the round-2 parity regression, BENCH_r02).  The
        # t < num_steps predicate is runtime-true for every real step.
        for k in range(k_steps):
            t = tc * k_steps + k
            y, z = obs_at(t)
            if mode == "bootstrap":
                advance = bootstrap_advance if g == 1 else propagate_only
                if k == 0:
                    @pl.when(tc == 0)
                    def _(y=y, z=z):
                        init_t0(y, z)

                    @pl.when(tc > 0)
                    def _(y=y, z=z, advance=advance):
                        advance(y, z)
                elif substep_regions:
                    @pl.when(t < num_steps)
                    def _(y=y, z=z, advance=advance):
                        advance(y, z)
                else:
                    advance(y, z)
                if g == 1:
                    weight_and_stage(t, y, z)
                else:
                    accumulate_weight(t, y, z)
                    if g <= k_steps and k % g == g - 1:
                        check_and_stage(t)
                    elif g > k_steps and k == k_steps - 1:
                        # cross-cell stride (g a multiple of
                        # steps_per_cell dividing 128): the check fires
                        # on a RUNTIME predicate every g-th step — or
                        # at the final real step — with the carried
                        # scratch persisting across grid cells (same
                        # design as svol_filter_kernel; staging
                        # freshness holds because check columns are
                        # ≡ g-1 (mod g) with g | 128).  t < num_steps
                        # is load-bearing: a PADDED step past T can hit
                        # t ≡ g-1 (mod g) and its col-(g-1) staging
                        # write would zero a block whose only real
                        # write is the ragged tail at a smaller column
                        # (see svol_filter_kernel and
                        # data/probe_ceiling.jsonl for the measured
                        # corruption this guards against)
                        pl.when(((jax.lax.rem(t, g) == g - 1)
                                 & (t < num_steps))
                                | (t == num_steps - 1))(
                            functools.partial(check_and_stage, t))
                    else:
                        # ragged tail: the last real step always checks
                        pl.when(t == num_steps - 1)(
                            functools.partial(check_and_stage, t))
            else:  # apf
                if k == 0:
                    @pl.when(tc == 0)
                    def _(t=t, y=y, z=z):
                        init_t0(y, z)
                        weight_and_stage(t, y, z)

                    @pl.when(tc > 0)
                    def _(t=t, y=y, z=z):
                        apf_step(t, y, z)
                elif substep_regions:
                    @pl.when(t < num_steps)
                    def _(t=t, y=y, z=z):
                        apf_step(t, y, z)
                else:
                    apf_step(t, y, z)
            if return_cloud:
                # final-cloud export (Swarm::simFutureObs bridge,
                # pswarm_filter.h:247-253): copy the particle state and
                # carried log-weights exactly after the LAST REAL step —
                # correct in straight-line mode too, where padded
                # substeps past t_len would otherwise keep advancing
                # the state through zero observations
                @pl.when(t == num_steps - 1)
                def _():
                    for leaf in range(n_leaves):
                        cloud_refs[leaf][:] = state_scr[leaf][:]
                    cloud_lw_ref[:] = lw_scr[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("kmodel", "num_particles",
                                             "interpret", "ess_threshold",
                                             "mode", "steps_per_cell",
                                             "substep_regions",
                                             "resampler",
                                             "metropolis_iters",
                                             "return_cloud",
                                             "gate_stride"))
def filter_megakernel(kmodel: KernelModel, seed, params, ys, zs=None,
                      num_particles: int = 512, interpret: bool = False,
                      ess_threshold: float = 1.0, mode: str = "bootstrap",
                      steps_per_cell: int = 8, substep_regions=None,
                      resampler: str = "systematic",
                      metropolis_iters: int = 16,
                      return_cloud: bool = False,
                      gate_stride: int = 1):
    """Run B whole-sequence particle filters in one ``pallas_call``.

    seed: int32 scalar or a ``jax.random`` key (see ``_prng.tile_seeds``);
    params: (B, num_params) constrained rows;
    ys: (T,) or (T, dim_obs); zs: (T, dim_cov) covariates (or None).
    Returns ``(total (B,), per_step_lcl (B, T), functional_mean)``
    where ``functional_mean`` is ``(B, T)`` for a single functional or
    a tuple of ``(B, T)`` paths when the model declares a
    ``functionals`` vector (``pf_base::getExpectations`` parity).

    ess_threshold: resample when the tile's worst-row ESS falls below
    this fraction of n (1.0 = every step; 0.5 = standard adaptive
    schedule, ~3x faster, evidence estimator stays unbiased).

    mode: "bootstrap" (propagate through the transition, weight by the
    observation density) or "apf" (Pitt-Shephard auxiliary PF: requires
    the model's ``prop_mu`` hook; first-stage lookahead selection every
    step; ``ess_threshold`` is ignored).

    substep_regions: wrap each substep's advance in its own pl.when
    region (compile fallback for scoped-VMEM pressure; slower).
    Default None = auto: straight-line at n <= 512, regions above.

    resampler: "systematic" (dense MXU selector, the default; particle
    cap :data:`MAX_KERNEL_PARTICLES`) or "metropolis" (O(n log n)
    roll-based chains, power-of-two n up to
    :data:`MAX_METROPOLIS_PARTICLES`; finite-sweep ancestor-law bias,
    measured schedule/sweep-dependent up to several nats of evidence —
    see the table in docs/kernels.md before using it anywhere the
    evidence feeds an accept ratio).

    gate_stride: run the LSE/ESS check every this many steps
    (bootstrap + ESS-adaptive only; must divide steps_per_cell).
    Between checks the carried log-weights accumulate un-renormalized —
    no per-step exp/LSE pass (4 -> 3 + 1/stride transcendentals per
    propagation; the measured 2.1x adaptive-throughput lever,
    docs/kernels.md "gate_stride").  ``sum(lcls)`` remains EXACTLY the
    evidence; per-step lcls coarsen to per-check columns (zeros
    elsewhere) and functional means are emitted at check columns only.

    return_cloud: also return the FINAL particle cloud — appends
    ``(cloud, cloud_log_weights)`` to the result tuple, where ``cloud``
    is a tuple of ``num_state`` ``(B, n)`` arrays (the state exactly
    after the last observation) and ``cloud_log_weights`` is ``(B, n)``
    max-normalized carried log-weights.  This is the
    ``Swarm::simFutureObs`` bridge (``pswarm_filter.h:247-253``): feed
    it to :func:`ssme_tpu.inference.swarm.forecast_from_cloud`.
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
    # flatten for SMEM (see kernel note on lane padding)
    ys = ys.reshape(-1)
    zs = zs.reshape(-1)
    params = jnp.asarray(params, jnp.float32)
    b = params.shape[0]
    n = num_particles
    if b % TILE_B:
        raise ValueError(f"B={b} must be a multiple of {TILE_B}")
    if n % 128:
        raise ValueError(f"num_particles={n} must be a multiple of 128")
    if resampler not in ("systematic", "metropolis", "rejection"):
        raise ValueError(f"unknown resampler {resampler!r}")
    use_lt = resampler == "systematic"
    if use_lt and n > MAX_KERNEL_PARTICLES:
        raise ValueError(
            f"num_particles={n}: the resident (n, n) CDF matrix and the "
            f"selector's one-hot transients exceed scoped VMEM above "
            f"{MAX_KERNEL_PARTICLES} (measured on v5e). Use "
            "resampler='metropolis' (schedule/sweep-dependent evidence "
            "bias, measured up to several nats — see the bias table in "
            f"docs/kernels.md; cap {MAX_METROPOLIS_PARTICLES}), the XLA "
            "path "
            "(filters.BootstrapFilter, or megakernel_log_like's "
            "automatic dispatch via model=), or shard the particle axis "
            "(parallel.sharded_pf).")
    if not use_lt and n > MAX_METROPOLIS_PARTICLES:
        raise ValueError(
            f"num_particles={n} exceeds the measured roll-resampler cap "
            f"{MAX_METROPOLIS_PARTICLES} ({resampler}); use the XLA "
            "path or parallel.sharded_pf")
    if not use_lt and (n & (n - 1)):
        raise ValueError(
            f"num_particles={n}: resampler='metropolis' needs a "
            "power-of-two particle count (its roll decomposition masks "
            "the shift to [0, n))")
    if params.shape[1] != kmodel.num_params:
        raise ValueError(f"params rows must have {kmodel.num_params} cols")
    if mode not in ("bootstrap", "apf"):
        raise ValueError("mode must be 'bootstrap' or 'apf'")
    if mode == "apf" and kmodel.prop_mu is None:
        raise ValueError(
            f"model {kmodel.name!r} has no prop_mu hook (required for "
            "the auxiliary-PF mode)")
    k_steps = int(steps_per_cell)
    if k_steps < 1 or 128 % k_steps:
        raise ValueError("steps_per_cell must divide 128")
    gate_stride = int(gate_stride)
    if gate_stride < 1 or ((k_steps % gate_stride) and
                           (gate_stride % k_steps or 128 % gate_stride)):
        raise ValueError(
            "gate_stride must divide steps_per_cell, or be a multiple of "
            "it that divides 128 (cross-cell weight accumulation)")
    if gate_stride > 1 and (mode != "bootstrap"
                            or ess_threshold >= 1.0):
        raise ValueError(
            "gate_stride > 1 applies to the ESS-adaptive bootstrap "
            "mode only (APF selects every step by construction; the "
            "every-step parity schedule needs gate_stride=1)")

    # pad the series so every grid cell has k_steps observations; the
    # padded tail's outputs land beyond t_len and are sliced away
    t_cells = (t_len + k_steps - 1) // k_steps
    pad_steps = t_cells * k_steps - t_len
    ys = jnp.concatenate(
        [ys, jnp.zeros((pad_steps * kmodel.dim_obs,), ys.dtype)])
    zs = jnp.concatenate(
        [zs, jnp.zeros((pad_steps * max(1, kmodel.dim_cov),), zs.dtype)])

    seed_arr = _prng.tile_seeds(seed, b // TILE_B)
    t_pad = ((t_cells * k_steps + 127) // 128) * 128
    n_fns = len(kmodel.functional_list)
    if substep_regions is None:
        substep_regions = n > 512
    in_specs = [
        pl.BlockSpec((TILE_B, kmodel.num_params),
                     lambda i, t, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [params]
    if use_lt:
        in_specs.append(pl.BlockSpec((n, n), lambda i, t, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(np.tril(np.ones((n, n), np.float32)).T))

    n_cloud = (kmodel.num_state + 1) if return_cloud else 0
    outs = pl.pallas_call(
        _make_kernel(kmodel, n, float(ess_threshold), mode, k_steps,
                     b // TILE_B, t_len, bool(substep_regions),
                     resampler, int(metropolis_iters), bool(return_cloud),
                     gate_stride),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,   # seed, ys, zs (SMEM)
            grid=(b // TILE_B, t_cells),
            in_specs=in_specs,
            out_specs=([
                pl.BlockSpec((TILE_B, 128),
                             lambda i, t, *_: (i, (t * k_steps) // 128),
                             memory_space=pltpu.VMEM)
                for _ in range(1 + n_fns)      # lcl + one per functional
            ] + [
                # final-cloud exports: one (TILE_B, n) block per tile,
                # revisited across all t cells, written at the last
                # real step and flushed once per tile
                pl.BlockSpec((TILE_B, n), lambda i, t, *_: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_cloud)
            ]),
            scratch_shapes=(
                [pltpu.VMEM((TILE_B, n), jnp.float32)
                 for _ in range(kmodel.num_state)]
                + [pltpu.VMEM((TILE_B, n), jnp.float32),     # log-weights
                   pltpu.VMEM((TILE_B, 128), jnp.float32)]),  # LSE carry
        ),
        out_shape=([
            jax.ShapeDtypeStruct((b, t_pad), jnp.float32)
            for _ in range(1 + n_fns)
        ] + [
            jax.ShapeDtypeStruct((b, n), jnp.float32)
            for _ in range(n_cloud)
        ]),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, ys, zs, *inputs)
    lcls = outs[0][:, :t_len]
    fmeans = tuple(f[:, :t_len] for f in outs[1:1 + n_fns])
    if n_fns == 1:
        fmeans = fmeans[0]
    if return_cloud:
        cloud = tuple(outs[1 + n_fns:1 + n_fns + kmodel.num_state])
        cloud_lw = outs[1 + n_fns + kmodel.num_state]
        return jnp.sum(lcls, axis=-1), lcls, fmeans, cloud, cloud_lw
    return jnp.sum(lcls, axis=-1), lcls, fmeans


def megakernel_log_like(kmodel: KernelModel, num_particles: int,
                        num_replicates: int, constrain=None,
                        ess_threshold: float = 0.5, model=None,
                        interpret: bool = False,
                        resampler: str = "systematic",
                        metropolis_iters: int = None,
                        metropolis_bias_budget: float = 0.5,
                        gate_stride: int = 1):
    """PMMH ``batched_log_like`` hook for any kernel model: all chains x
    replicates in one launch, per-chain log-mean-exp over replicates
    (``thread_pool.h:259-273`` semantics).

    ``constrain``: optional (C, P)->(C, P') map from the PMMH parameter
    vector to kernel parameter rows (e.g. sigma^2 -> sigma).
    Returns ``ll(key, params (C, P), ys[, zs]) -> (C,)``.

    Large-N bridge: above :data:`MAX_KERNEL_PARTICLES` the in-VMEM
    kernel cannot run; pass the matching :class:`StateSpaceModel` as
    ``model`` and the returned hook transparently dispatches to the
    generic XLA filter bank (``vmap`` over chains x replicates) at the
    same statistical config — PMMH code needs no changes when the cloud
    outgrows VMEM.  (The generic path consumes the PMMH parameter
    vector directly; ``constrain`` is kernel-row plumbing and ignored.)

    PMMH caveat for ``resampler="metropolis"``: the finite-sweep
    ancestor law biases the evidence estimator (measured up to several
    nats depending on schedule and ``metropolis_iters`` — table in
    docs/kernels.md), and the bias is theta-dependent, so it distorts
    the pseudo-marginal POSTERIOR itself, not just its variance.  This
    hook is therefore SAFE-BY-CONSTRUCTION (VERDICT r4 item 6): with
    ``metropolis_iters=None`` (the default) the sweep count is derived
    per call from the measured bias envelope so the predicted evidence
    bias stays within ``metropolis_bias_budget`` nats
    (``_select.metropolis_sweeps_for`` — raises when no sweep count
    can meet the budget); an EXPLICIT ``metropolis_iters`` whose
    predicted bias exceeds the budget emits a UserWarning with the
    numbers.  ``resampler="rejection"`` needs none of this — it is
    unbiased at the same memory profile.
    """
    r = num_replicates

    cap = (MAX_KERNEL_PARTICLES if resampler == "systematic"
           else MAX_METROPOLIS_PARTICLES)
    if num_particles > cap:
        if model is None:
            raise ValueError(
                f"num_particles={num_particles} exceeds the megakernel "
                f"cap ({cap}); pass the matching "
                "StateSpaceModel as model= to dispatch to the generic "
                "XLA path, use resampler='metropolis' (cap "
                f"{MAX_METROPOLIS_PARTICLES}; schedule/sweep-dependent "
                "evidence bias per docs/kernels.md — theta-dependent, so "
                "it distorts a pseudo-marginal posterior, not just its "
                "variance), or shard the particle axis "
                "(parallel.sharded_pf)")
        from ssme_tpu.filters.bootstrap import replicated_log_like_fn
        return replicated_log_like_fn(
            model, num_particles, r,
            ess_threshold=(None if ess_threshold >= 1.0
                           else float(ess_threshold)))

    def ll(key, params, ys, zs=None):
        c = params.shape[0]
        p = constrain(params) if constrain is not None else params
        b_needed = c * r
        b = ((b_needed + TILE_B - 1) // TILE_B) * TILE_B
        # key straight through to tile_seeds (64-bit per-iteration
        # stream separation, VERDICT r2 item 6)
        batch = jnp.repeat(p, r, axis=0)
        pad = jnp.broadcast_to(p[:1], (b - b_needed, p.shape[1]))
        batch = jnp.concatenate([batch, pad], axis=0)
        eff_iters = metropolis_iters
        if resampler == "metropolis":
            t_len = int(ys.shape[0])        # static under jit
            if eff_iters is None:
                eff_iters = metropolis_sweeps_for(
                    metropolis_bias_budget, t_len, ess_threshold)
            else:
                est = metropolis_bias_estimate(eff_iters, t_len,
                                               ess_threshold)
                if est > metropolis_bias_budget:
                    import warnings
                    warnings.warn(
                        f"metropolis_iters={eff_iters} predicts "
                        f"~{est:.2f} nats of theta-dependent evidence "
                        f"bias at T={t_len} (budget "
                        f"{metropolis_bias_budget}); a biased evidence "
                        "distorts the pseudo-marginal posterior — use "
                        f"metropolis_iters="
                        f"{metropolis_sweeps_for(metropolis_bias_budget, t_len, ess_threshold, max_sweeps=1 << 20)}"
                        ", resampler='rejection' (unbiased), or raise "
                        "the budget deliberately (docs/kernels.md)",
                        stacklevel=2)
        elif eff_iters is None:
            eff_iters = 16
        vals, _, _ = filter_megakernel(kmodel, key, batch, ys, zs,
                                       num_particles=num_particles,
                                       ess_threshold=ess_threshold,
                                       interpret=interpret,
                                       resampler=resampler,
                                       metropolis_iters=int(eff_iters),
                                       gate_stride=gate_stride)
        return logmeanexp(vals[:b_needed].reshape(c, r), axis=-1)

    return ll


def megakernel_swarm_evidence(kmodel: KernelModel, seed, param_draws, ys,
                              zs=None, num_particles: int = 512,
                              ess_threshold: float = 1.0,
                              interpret: bool = False,
                              return_cloud: bool = False,
                              gate_stride: int = 1):
    """Swarm conditional evidence for any kernel model: one filter per
    parameter draw, per-step aggregation across models
    (``pswarm_filter.h:86-160`` semantics; cf.
    ``svol_filter_kernel.svol_swarm_evidence_pallas``).

    ``functional_paths`` carries one swarm-averaged (T,) path PER
    functional in the model's ``functionals`` vector
    (``pf_base::getExpectations`` driven at ``pswarm_filter.h:86-92``);
    ``functional_path`` remains the first for the common scalar case.

    ``return_cloud``: include each model's FINAL particle cloud in the
    result — ``final_cloud`` (tuple of ``num_state`` ``(M, n)`` arrays)
    and ``final_log_weights`` ``(M, n)`` — the kernel-speed input to
    ``Swarm::simFutureObs`` forecasting
    (:func:`ssme_tpu.inference.swarm.forecast_from_cloud`).

    ``gate_stride`` note: each model's per-step lcls coarsen to
    per-check BLOCK sums (sum over columns unchanged), so
    ``per_model_log_cond_likes`` totals and ``mean_log_cond_like``
    (linear in lcls) are stride-invariant — but the mixture aggregate
    ``log_cond_like`` = logmeanexp over models PER COLUMN becomes a
    per-block mixture factorization: prod_blocks mean_m
    p_m(y_block | past) instead of the reference's per-step
    prod_t mean_m p_m(y_t | past) (``pswarm_filter.h:103,136``).  Both
    are valid mixture predictives at different granularity; use
    stride 1 when the per-STEP mixture decomposition itself is the
    quantity of interest."""
    p = jnp.asarray(param_draws, jnp.float32)
    m_models = p.shape[0]
    b = ((m_models + TILE_B - 1) // TILE_B) * TILE_B
    pad = jnp.broadcast_to(p[:1], (b - m_models, p.shape[1]))
    batch = jnp.concatenate([p, pad], axis=0)
    outs = filter_megakernel(kmodel, seed, batch, ys, zs,
                             num_particles=num_particles,
                             ess_threshold=ess_threshold,
                             interpret=interpret,
                             return_cloud=return_cloud,
                             gate_stride=gate_stride)
    _, lcls, fmeans = outs[:3]
    lcls = lcls[:m_models]
    if not isinstance(fmeans, tuple):
        fmeans = (fmeans,)
    paths = tuple(jnp.mean(f[:m_models], axis=0) for f in fmeans)
    result = {
        "log_cond_like": logmeanexp(lcls, axis=0),
        "mean_log_cond_like": jnp.mean(lcls, axis=0),
        "per_model_log_cond_likes": lcls,
        "functional_path": paths[0],
        "functional_paths": paths,
    }
    if return_cloud:
        cloud, cloud_lw = outs[3], outs[4]
        result["final_cloud"] = tuple(c[:m_models] for c in cloud)
        result["final_log_weights"] = cloud_lw[:m_models]
    return result


# ---------------------------------------------------------------------------
# Kernel models for the built-in model families
# ---------------------------------------------------------------------------

# The built-in factories are memoized: KernelModel registers static with
# eq=False, so jit caches by object identity — a fresh instance per call
# would silently trigger a full recompile (1-10 min on TPU via the remote
# compile service).

@functools.lru_cache(maxsize=None)
def svol_kernel_model() -> KernelModel:
    """Univariate SVOL (reference ``example/univ_svol_bootstrap_filter.h``)
    as a kernel model; parameter rows (beta, phi, sigma).  The hand-fused
    ``svol_filter_kernel.svol_filter_pallas`` remains the flagship path;
    this instance cross-validates the factory against it."""

    def init(rng, p, y, z, shape):
        phi, sigma = p[:, 1:2], p[:, 2:3]
        sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
        return (rng.normal(shape) * sd0,)

    def propagate(rng, p, state, y, z):
        phi, sigma = p[:, 1:2], p[:, 2:3]
        (x,) = state
        return (phi * x + sigma * rng.normal(x.shape),)

    def log_weight(p, state, y, z):
        beta = p[:, 0:1]
        (x,) = state
        # log-free form (cf. svol_filter_kernel.py): one exp per element
        zval = (y[0] / beta) * jnp.exp(-0.5 * x)
        return ((-_prng.HALF_LOG_2PI - jnp.log(beta))
                - 0.5 * x - 0.5 * zval * zval)

    def prop_mu(p, state, y, z):
        # APF lookahead = transition conditional mean
        (x,) = state
        return (p[:, 1:2] * x,)

    return KernelModel(num_params=3, init=init, propagate=propagate,
                       log_weight=log_weight, prop_mu=prop_mu,
                       name="svol")


@functools.lru_cache(maxsize=None)
def svol_leverage_kernel_model() -> KernelModel:
    """SVOL with leverage (reference ``test/test_pswarm.cpp:28-141``,
    LW parameterization per ``models/svol_leverage.py``); parameter rows
    (phi, mu, sigma, rho); covariate z = lagged observation."""

    def init(rng, p, y, z, shape):
        phi, sigma = p[:, 0:1], p[:, 2:3]
        sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
        return (rng.normal(shape) * sd0,)

    def propagate(rng, p, state, y, z):
        phi, mu, sigma, rho = (p[:, 0:1], p[:, 1:2], p[:, 2:3], p[:, 3:4])
        (x,) = state
        # mean clamp = models/svol_leverage.STATE_CLAMP (f32 runaway
        # guard for the explosive leverage feedback term; see the
        # model's note — identity on all physical paths)
        mean = jnp.clip(mu + phi * (x - mu)
                        + z[0] * rho * sigma * jnp.exp(-0.5 * x),
                        -40.0, 40.0)
        sd = sigma * jnp.sqrt(1.0 - rho * rho)
        return (mean + sd * rng.normal(x.shape),)

    def log_weight(p, state, y, z):
        (x,) = state
        # y ~ N(0, e^x): log-density = -c - x/2 - y^2 e^{-x} / 2
        zval = y[0] * jnp.exp(-0.5 * x)
        return -_prng.HALF_LOG_2PI - 0.5 * x - 0.5 * zval * zval

    def prop_mu(p, state, y, z):
        # APF lookahead = transition conditional mean
        # (test_liu_west.cpp:92-99); same clamp as propagate
        phi, mu, sigma, rho = (p[:, 0:1], p[:, 1:2], p[:, 2:3], p[:, 3:4])
        (x,) = state
        return (jnp.clip(mu + phi * (x - mu)
                         + z[0] * rho * sigma * jnp.exp(-0.5 * x),
                         -40.0, 40.0),)

    return KernelModel(num_params=4, init=init, propagate=propagate,
                       log_weight=log_weight, prop_mu=prop_mu, dim_cov=1,
                       name="svol_leverage")


@functools.lru_cache(maxsize=None)
def factor_svol_kernel_model(n_assets: int = 5) -> KernelModel:
    """Multivariate factor SVOL (``models/factor_svol.py``) with k=2
    factors as a TWO-LEAF kernel model: the state is (x1, x2), each a
    ``(TILE_B, n)`` cloud, resampled jointly.

    The Woodbury observation density y ~ N(0, L diag(e^x) L' + diag(d))
    specializes to explicit 2x2 formulas per particle: the k x k matrix
    M = diag(e^-x) + L' D^-1 L has a per-row constant part
    A = L' D^-1 L (computed from the parameter columns with a static
    loop over assets) and a per-particle diagonal, so det/inverse are a
    handful of elementwise ops — no per-particle linear algebra.

    Parameter rows: [phi(2), mu(2), sigma(2), vec(L)(2n), d(n)]
    (constrained, the model's ordering).
    """
    na = n_assets
    num_params = 6 + 2 * na + na

    def _unpack(p):
        phi = (p[:, 0:1], p[:, 1:2])
        mu = (p[:, 2:3], p[:, 3:4])
        sigma = (p[:, 4:5], p[:, 5:6])
        # loadings stored row-major: L[i, j] = p[6 + i*2 + j]
        ell = [(p[:, 6 + 2 * i:7 + 2 * i], p[:, 7 + 2 * i:8 + 2 * i])
               for i in range(na)]
        d = [p[:, 6 + 2 * na + i:7 + 2 * na + i] for i in range(na)]
        return phi, mu, sigma, ell, d

    def init(rng, p, y, z, shape):
        phi, mu, sigma, _, _ = _unpack(p)
        out = []
        for j in range(2):
            sd0 = sigma[j] / jnp.sqrt(1.0 - phi[j] * phi[j])
            out.append(mu[j] + rng.normal(shape) * sd0)
        return tuple(out)

    def propagate(rng, p, state, y, z):
        phi, mu, sigma, _, _ = _unpack(p)
        return tuple(
            mu[j] + phi[j] * (state[j] - mu[j])
            + sigma[j] * rng.normal(state[j].shape)
            for j in range(2))

    def log_weight(p, state, y, z):
        _, _, _, ell, d = _unpack(p)
        x1, x2 = state
        # per-row constants: A = L' D^-1 L, v = L' D^-1 y, y' D^-1 y,
        # sum log d  (static loop over assets; each term is (TILE_B, 1))
        a11 = a12 = a22 = 0.0
        v1 = v2 = yy = sum_log_d = 0.0
        for i in range(na):
            l1, l2 = ell[i]
            dinv = 1.0 / d[i]
            a11 = a11 + l1 * l1 * dinv
            a12 = a12 + l1 * l2 * dinv
            a22 = a22 + l2 * l2 * dinv
            v1 = v1 + l1 * dinv * y[i]
            v2 = v2 + l2 * dinv * y[i]
            yy = yy + y[i] * y[i] * dinv
            sum_log_d = sum_log_d + jnp.log(d[i])
        # per-particle 2x2 Woodbury
        e1 = jnp.exp(-x1)
        e2 = jnp.exp(-x2)
        m11 = e1 + a11
        m22 = e2 + a22
        det = m11 * m22 - a12 * a12
        # v' M^-1 v
        quad_corr = (m22 * v1 * v1 - 2.0 * a12 * v1 * v2
                     + m11 * v2 * v2) / det
        # logdet(Sigma) = logdet(M) + sum(x) + sum(log d)
        logdet = jnp.log(det) + x1 + x2 + sum_log_d
        return (-na * _prng.HALF_LOG_2PI - 0.5 * logdet
                - 0.5 * (yy - quad_corr))

    return KernelModel(num_params=num_params, init=init,
                       propagate=propagate, log_weight=log_weight,
                       num_state=2, dim_obs=na,
                       functional=lambda p, st: st[0],
                       name=f"factor_svol_{na}x2")


@functools.lru_cache(maxsize=None)
def poisson_ar_kernel_model() -> KernelModel:
    """Poisson AR(1) count model (``models/poisson_ar.py``) as a kernel
    model; parameter rows (phi, mu, sigma).

    The Poisson log-pmf needs log(y!) = gammaln(y+1), which has no
    in-kernel primitive — but it depends only on the DATA, so it is
    precomputed on the host and streamed as a second observation
    column: pass ``ys`` rows ``[y, gammaln(y+1)]`` (dim_obs=2), e.g.
    via :func:`poisson_obs_rows`.
    """

    def init(rng, p, y, z, shape):
        phi, mu, sigma = p[:, 0:1], p[:, 1:2], p[:, 2:3]
        sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
        return (mu + rng.normal(shape) * sd0,)

    def propagate(rng, p, state, y, z):
        phi, mu, sigma = p[:, 0:1], p[:, 1:2], p[:, 2:3]
        (x,) = state
        return (mu + phi * (x - mu) + sigma * rng.normal(x.shape),)

    def prop_mu(p, state, y, z):
        phi, mu = p[:, 0:1], p[:, 1:2]
        (x,) = state
        return (mu + phi * (x - mu),)

    def log_weight(p, state, y, z):
        (x,) = state
        # y[0] = count, y[1] = gammaln(count + 1) (host-precomputed)
        return y[0] * x - jnp.exp(x) - y[1]

    return KernelModel(num_params=3, init=init, propagate=propagate,
                       log_weight=log_weight, prop_mu=prop_mu,
                       dim_obs=2, name="poisson_ar")


def poisson_obs_rows(counts):
    """(T,) counts -> (T, 2) kernel observation rows
    ``[y, gammaln(y+1)]`` for :func:`poisson_ar_kernel_model`."""
    from jax.scipy.special import gammaln
    y = jnp.asarray(counts, jnp.float32).reshape(-1)
    return jnp.stack([y, gammaln(y + 1.0)], axis=-1)


@functools.lru_cache(maxsize=None)
def svol_t_kernel_model() -> KernelModel:
    """Student-t observation SVOL (``models/svol_t.py``) as a kernel
    model.  The t normalizing constant needs gammaln, which has no
    in-kernel primitive — but it depends only on the PARAMETER nu
    (fixed per filter row), so it is precomputed outside and carried as
    a derived parameter column: rows are
    ``[beta, phi, sigma, nu, c_nu]`` (see :func:`svol_t_param_rows`).
    """

    def init(rng, p, y, z, shape):
        phi, sigma = p[:, 1:2], p[:, 2:3]
        sd0 = sigma / jnp.sqrt(1.0 - phi * phi)
        return (rng.normal(shape) * sd0,)

    def propagate(rng, p, state, y, z):
        phi, sigma = p[:, 1:2], p[:, 2:3]
        (x,) = state
        return (phi * x + sigma * rng.normal(x.shape),)

    def prop_mu(p, state, y, z):
        (x,) = state
        return (p[:, 1:2] * x,)

    def log_weight(p, state, y, z):
        beta, nu, c_nu = p[:, 0:1], p[:, 3:4], p[:, 4:5]
        (x,) = state
        # scale = beta e^{x/2}; log t_nu(y/scale) - log scale, with the
        # nu-dependent constant c_nu precomputed per row
        zval = (y[0] / beta) * jnp.exp(-0.5 * x)
        return (c_nu - jnp.log(beta) - 0.5 * x
                - 0.5 * (nu + 1.0) * jnp.log1p(zval * zval / nu))

    return KernelModel(num_params=5, init=init, propagate=propagate,
                       log_weight=log_weight, prop_mu=prop_mu,
                       name="svol_t")


def svol_t_param_rows(params):
    """(B, 4) constrained (beta, phi, ss, nu) rows -> (B, 5) kernel rows
    ``[beta, phi, sigma, nu, c_nu]`` with the t normalizing constant
    precomputed via :func:`ssme_tpu.rv.t_logpdf`'s machinery."""
    from jax.scipy.special import gammaln
    p = jnp.asarray(params, jnp.float32)
    beta, phi, ss, nu = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    a = 0.5 * nu
    c_exact = gammaln(a + 0.5) - gammaln(a) - 0.5 * jnp.log(nu * jnp.pi)
    c_asym = (0.5 * jnp.log(a) - 0.5 * jnp.log(nu * jnp.pi)
              + jnp.log1p(-1.0 / (8.0 * a) + 1.0 / (128.0 * a * a)))
    c_nu = jnp.where(nu > 200.0, c_asym, c_exact)
    return jnp.stack([beta, phi, jnp.sqrt(ss), nu, c_nu], axis=-1)


__all__ = ["KernelModel", "filter_megakernel", "megakernel_log_like",
           "metropolis_bias_estimate", "metropolis_sweeps_for",
           "megakernel_swarm_evidence", "svol_kernel_model",
           "svol_leverage_kernel_model", "factor_svol_kernel_model",
           "poisson_ar_kernel_model", "poisson_obs_rows",
           "svol_t_kernel_model", "svol_t_param_rows", "TILE_B",
           "MAX_KERNEL_PARTICLES", "MAX_METROPOLIS_PARTICLES"]
