"""Pallas TPU kernel: entire Liu-West (APF) filter for SVOL-with-leverage.

The reference's Liu-West flagship model (``test/test_liu_west.cpp:25-157``,
parameters (phi, mu, sigma, rho) with transforms {logit, null, log,
twice_fisher}) filtered jointly over states AND parameters in one
``pallas_call`` — the full ``LWFilter::filter`` loop
(``include/ssme/liu_west_filter.h:365-552``) in VMEM.

Layout: one filter per (8, N) tile; ROWS are channels:
  row 0: x (log-vol state)        row 2-5: transformed theta
  row 1: log-weights              rows 6-7: zero padding
All cross-particle operations reuse the gather-free machinery of the
bootstrap megakernel: prefix sums and ancestor selection as MXU matmuls;
the parameter-kernel covariance is a (8, N) x (N, 8) Gram matmul staged
through VMEM scratch, with the 4x4 Cholesky unrolled in scalars.

Algorithm per t>0 cell (reference lines in liu_west_filter.h):
  1. theta_bar, Vt from the particle cloud          [:569-583]
  2. shrink m_i = a theta_i + (1-a) theta_bar       [:424]
  3. first-stage weights lw_i + logG(y, propMu(x_i), m_i)  [:379-401]
     (shrinkage done in transformed space — the documented fix of the
      reference's space mixing at :385-388)
  4. systematic ancestor selection on first-stage weights   [:404]
  5. theta' = m_anc + chol(h^2 Vt) eps              [:426-427]
  6. x' = fSamp(x_anc, z, theta')                   [:431]
  7. lw' = logG(y, x') - logG(y, propMu_anc)        [:433-434]
     (logG of this model is parameter-free, test_liu_west.cpp:133-136)
  8. lcl = LSE(lw') + LSE(fsw) - 2 LSE(lw)          [:449-452]
  9. joint (x, theta) systematic resample           [:480-481]

The covariate z_t is the previous observation (leverage), read from the
SMEM-prefetched series.  Joint (x, theta) resampling fires on the
``resample_every`` schedule (reference ``rs``) or, with
``ess_threshold > 0``, only when the weight ESS drops below that
fraction of N — skipping the whole selection block on other steps.
Restrictions: N multiple of 128; prior = uniform box over
(phi, mu, sigma, rho).
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
from ssme_tpu.ops._select import compensated_cdf

TILE = 8
N_PARAM = 4  # phi, mu, sigma, rho


def _constrain_rows(theta):
    """(4, n) transformed -> constrained (phi, mu, sigma, rho) rows."""
    phi = 1.0 / (1.0 + jnp.exp(-theta[0:1, :]))        # logit^-1
    mu = theta[1:2, :]
    sigma = jnp.exp(theta[2:3, :])
    rho = jnp.tanh(0.5 * theta[3:4, :])                # twice_fisher^-1
    return phi, mu, sigma, rho


def _log_g(y, x):
    # N(y; 0, e^{x/2}) — parameter-free (test_liu_west.cpp:133-136)
    sd = jnp.exp(0.5 * x)
    z = y / sd
    return -_HALF_LOG_2PI - 0.5 * x - 0.5 * z * z


def _lse_row(row):
    m = jnp.max(row, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(row - m), axis=-1, keepdims=True))


def _build_kernel(num_particles, num_steps, shrink_a, prior_lo, prior_hi,
                  resample_every=1, variant="apf", ess_threshold=0.0,
                  steps_per_cell=1, num_tiles=1):
    n = num_particles
    k_steps = steps_per_cell
    t_cells = (num_steps + k_steps - 1) // k_steps
    a = shrink_a
    lo = np.asarray(prior_lo, np.float32)
    hi = np.asarray(prior_hi, np.float32)
    h2 = 1.0 - a * a

    def kernel(seed_ref, ys_ref, lt_ref, lcl_ref, cloud_ref,
               s_scr, gram_scr):
        f = pl.program_id(0)
        tc = pl.program_id(1)
        # two threefry-derived seed words per tile (_prng.tile_seeds);
        # the grid cell and tile index are XOR-mixed into the second
        # word so every cell reseeds with a distinct 64-bit-derived
        # stream (two streams collide with prob ~2^-64 per pair)
        pltpu.prng_seed(seed_ref[2 * f],
                        seed_ref[2 * f + 1] ^ (tc * num_tiles + f))

        def stage_lcl(t, lcl_val):
            col = jax.lax.rem(t, 128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
            base = jnp.where(col == 0, jnp.zeros_like(lcl_ref),
                             lcl_ref[:])
            lcl_ref[:] = jnp.where(lane == col, lcl_val, base)

        def select_matmul(weights_row, u0_scalar, src):
            """src (8, n); returns the (8, n) of systematically-selected
            ancestor columns, via one-hot matmul (no gathers)."""
            wtile = jnp.broadcast_to(weights_row, (TILE, n))
            # two-pass compensated CDF (_select.compensated_cdf): ~2^-16
            # relative error vs a single bf16 pass's 2^-8, which would
            # perturb the joint (x, theta) resampling law itself
            cdf8 = compensated_cdf(wtile, lt_ref[:])
            cdf = cdf8[0:1, :]
            total = cdf8[0, n - 1]
            # exact-partition exclusive CDF (see svol_filter_kernel note)
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

        def store_maybe_resampled(t, tile, lw_row):
            """Write ``tile`` to scratch; joint (x, theta) systematic
            resample (liu_west_filter.h:90-145 semantics) fires only on
            schedule — or, with ess_threshold > 0, only when the ESS of
            ``lw_row`` drops below that fraction of n (the resample
            block is skipped entirely on non-firing steps)."""
            s_scr[:] = tile

            def do_resample():
                m = jnp.max(lw_row, axis=-1, keepdims=True)
                w = jnp.exp(lw_row - m)
                u0 = _uniform_offset((1, 1))[0, 0]
                picked = select_matmul(w, u0, tile)
                # zero the log-weight row (weights reset to uniform)
                lane_row = jax.lax.broadcasted_iota(
                    jnp.int32, (TILE, n), 0)
                s_scr[:] = jnp.where(lane_row == 1,
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

        def lw_init(t, y):
            u = _uniform_bits((N_PARAM, n))
            # python-float bounds (array constants can't be captured)
            phi_c = float(lo[0]) + float(hi[0] - lo[0]) * u[0:1]
            mu_c = float(lo[1]) + float(hi[1] - lo[1]) * u[1:2]
            sig_c = float(lo[2]) + float(hi[2] - lo[2]) * u[2:3]
            rho_c = float(lo[3]) + float(hi[3] - lo[3]) * u[3:4]
            th = jnp.concatenate([
                jnp.log(phi_c) - jnp.log1p(-phi_c),
                mu_c,
                jnp.log(sig_c),
                jnp.log1p(rho_c) - jnp.log1p(-rho_c),
            ], axis=0)
            sd0 = sig_c / jnp.sqrt(1.0 - phi_c * phi_c)
            x = _normal_bits((1, n)) * sd0
            lw = _log_g(y, x)
            tile = jnp.concatenate(
                [x, lw, th, jnp.zeros((2, n), jnp.float32)], axis=0)
            lcl_val = _lse_row(lw)[0, 0] - np.log(float(n))
            stage_lcl(t, lcl_val)
            store_maybe_resampled(t, tile, lw)

        def lw_step(t, y):
            x = s_scr[0:1, :]
            lw = s_scr[1:2, :]
            th = s_scr[2:6, :]
            z = ys_ref[t - 1]

            # weighted shrinkage moments (lw:569-583 computes them
            # unweighted — identical when weights are uniform after an
            # every-step resample; the weighted form stays correct under
            # rs > 1 / ESS-adaptive schedules)
            mw = jnp.max(lw, axis=-1, keepdims=True)
            ww = jnp.exp(lw - mw)                             # (1, n)
            wsum = jnp.sum(ww, axis=-1, keepdims=True)
            theta_bar = (jnp.sum(th * ww, axis=-1, keepdims=True)
                         / wsum)                              # (4, 1)
            pad21 = jnp.zeros((2, 1), jnp.float32)
            centered = s_scr[:] - jnp.concatenate(
                [pad21, theta_bar, pad21], axis=0)
            gram = jax.lax.dot_general(
                centered * ww, jnp.transpose(centered),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / wsum[0, 0]
            gram_scr[:, 0:8] = gram

            shrunk = a * th + (1.0 - a) * theta_bar

            if variant == "apf":
                # first-stage lookahead + ancestor selection (lw:379-404)
                phi_o, mu_o, sig_o, rho_o = _constrain_rows(th)
                # mean clamp: see models/svol_leverage.STATE_CLAMP
                look = jnp.clip(mu_o + phi_o * (x - mu_o)
                                + z * rho_o * sig_o * jnp.exp(-0.5 * x),
                                -40.0, 40.0)
                log_fsw = lw + _log_g(y, look)
                mfs = jnp.max(log_fsw, axis=-1, keepdims=True)
                w_fs = jnp.exp(log_fsw - mfs)
                u0 = _uniform_offset((1, 1))[0, 0]
                gather_src = jnp.concatenate(
                    [x, look, shrunk, jnp.zeros((2, n), jnp.float32)],
                    axis=0)
                anc = select_matmul(w_fs, u0, gather_src)
                x_anc = anc[0:1, :]
                look_anc = anc[1:2, :]
                shrunk_anc = anc[2:6, :]
            else:
                # SISR form (LWFilter2, lw:1608-1649): no lookahead —
                # every particle keeps its own shrunk mean and state
                x_anc = x
                look_anc = None
                shrunk_anc = shrunk
                log_fsw = None

            def g(i, j):
                return h2 * gram_scr[2 + i, 2 + j]
            eps_r = 1e-9
            l00 = jnp.sqrt(jnp.maximum(g(0, 0), eps_r))
            l10 = g(1, 0) / l00
            l20 = g(2, 0) / l00
            l30 = g(3, 0) / l00
            l11 = jnp.sqrt(jnp.maximum(g(1, 1) - l10 * l10, eps_r))
            l21 = (g(2, 1) - l20 * l10) / l11
            l31 = (g(3, 1) - l30 * l10) / l11
            l22 = jnp.sqrt(jnp.maximum(g(2, 2) - l20 * l20 - l21 * l21,
                                       eps_r))
            l32 = (g(3, 2) - l30 * l20 - l31 * l21) / l22
            l33 = jnp.sqrt(jnp.maximum(
                g(3, 3) - l30 * l30 - l31 * l31 - l32 * l32, eps_r))

            e = _normal_bits((N_PARAM, n))
            th_new = jnp.concatenate([
                shrunk_anc[0:1] + l00 * e[0:1],
                shrunk_anc[1:2] + l10 * e[0:1] + l11 * e[1:2],
                shrunk_anc[2:3] + l20 * e[0:1] + l21 * e[1:2]
                + l22 * e[2:3],
                shrunk_anc[3:4] + l30 * e[0:1] + l31 * e[1:2]
                + l32 * e[2:3] + l33 * e[3:4],
            ], axis=0)

            phi_n, mu_n, sig_n, rho_n = _constrain_rows(th_new)
            mean = jnp.clip(mu_n + phi_n * (x_anc - mu_n)
                            + z * rho_n * sig_n * jnp.exp(-0.5 * x_anc),
                            -40.0, 40.0)
            sd = sig_n * jnp.sqrt(1.0 - rho_n * rho_n)
            x_new = mean + sd * _normal_bits((1, n))

            if variant == "apf":
                # obs-density ratio (lw:433); conditional likelihood in
                # the carried-weight form LSE(fsw) - LSE(w_old) +
                # LSE(w_new) - log n — equal to the reference's 3-term
                # identity (lw:449-452) when the previous step resampled
                # (rs=1), and exact under the ESS-gated schedule too
                lw_new = _log_g(y, x_new) - _log_g(y, look_anc)
                lcl_val = (_lse_row(log_fsw)[0, 0]
                           - _lse_row(lw)[0, 0]
                           + _lse_row(lw_new)[0, 0]
                           - np.log(float(n)))
            else:
                # q == f for this model, so logF - logQ cancels and the
                # increment is logG alone (lw:1634-1636); cond-like is
                # the ratio of LSEs (lw:1651-1659)
                lw_new = lw + _log_g(y, x_new)
                lcl_val = (_lse_row(lw_new)[0, 0] - _lse_row(lw)[0, 0])
            stage_lcl(t, lcl_val)

            tile = jnp.concatenate(
                [x_new, lw_new, th_new, jnp.zeros((2, n), jnp.float32)],
                axis=0)
            store_maybe_resampled(t, tile, lw_new)

        # K time steps per grid cell (amortizes fixed per-cell
        # overhead).  Substeps beyond the true series length are
        # skipped: unlike the sliced lcl outputs, the final cloud is
        # exposed and must not be filtered on the zero-padded tail.
        for k in range(k_steps):
            t = tc * k_steps + k
            y = ys_ref[t]
            if k == 0:
                # t = tc*k_steps < num_steps always (tc < t_cells)
                @pl.when(tc == 0)
                def _(t=t, y=y):
                    lw_init(t, y)

                @pl.when(tc > 0)
                def _(t=t, y=y):
                    lw_step(t, y)
            else:
                @pl.when(t < num_steps)
                def _(t=t, y=y):
                    lw_step(t, y)

        @pl.when(tc == t_cells - 1)
        def _():
            cloud_ref[:] = s_scr[:]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_filters", "num_particles", "delta", "resample_every", "variant",
    "interpret", "ess_threshold", "steps_per_cell"))
def svol_leverage_lw_pallas(seed, ys, num_filters=1, num_particles=512,
                            delta=0.99, prior_bounds=None,
                            resample_every=1, variant="apf",
                            interpret=False, ess_threshold=0.0,
                            steps_per_cell=4):
    """Full-sequence Liu-West (APF) filtering of the leverage model.

    seed: int32; ys: (T,) or (T, 1) observations (z_t = y_{t-1} feeds back
    automatically; z_0 = 0 is approximated by y_{-1} := y_0's predecessor
    being absent — the t=0 step does not use a covariate).

    ``variant``: "apf" (LWFilter, lookahead ancestors) or "sisr"
    (LWFilter2; for this model the proposal equals the transition so the
    weight increment reduces to logG).

    Returns dict with ``log_cond_likes`` (F, T), ``log_likelihood`` (F,),
    and ``cloud`` (F, 8, N): rows [x, logw, theta_trans x4, 0, 0] — the
    final joint particle cloud (constrain theta rows with the model's
    transforms for posterior summaries).
    """
    from ssme_tpu.models.svol_leverage import DEFAULT_PRIOR_BOUNDS
    if prior_bounds is None:
        prior_bounds = DEFAULT_PRIOR_BOUNDS
    lo = [b[0] for b in prior_bounds]
    hi = [b[1] for b in prior_bounds]

    ys = jnp.asarray(ys).reshape(-1).astype(jnp.float32)
    t_len = ys.shape[0]
    n = num_particles
    if n % 128:
        raise ValueError(f"num_particles={n} must be a multiple of 128")
    from ssme_tpu.ops.liu_west_megakernel import MAX_LW_KERNEL_PARTICLES
    if n > MAX_LW_KERNEL_PARTICLES:
        raise ValueError(
            f"num_particles={n}: the in-VMEM lower-triangular CDF matrix "
            f"is n^2 floats; above {MAX_LW_KERNEL_PARTICLES} it exceeds "
            "scoped VMEM. Use the XLA path (filters.LiuWestFilter) or "
            "shard the particle axis (parallel.sharded_pf).")
    k_steps = int(steps_per_cell)
    if k_steps < 1 or 128 % k_steps:
        raise ValueError("steps_per_cell must divide 128")
    shrink_a = (3.0 * delta - 1.0) / (2.0 * delta)

    # pad the series so every grid cell has k_steps observations
    t_cells = (t_len + k_steps - 1) // k_steps
    ys = jnp.concatenate(
        [ys, jnp.zeros((t_cells * k_steps - t_len,), ys.dtype)])

    lt = jnp.asarray(np.tril(np.ones((n, n), np.float32)).T)
    seed_arr = _tile_seeds(seed, num_filters)
    t_pad = ((t_cells * k_steps + 127) // 128) * 128

    if variant not in ("apf", "sisr"):
        raise ValueError("variant must be 'apf' or 'sisr'")
    if int(resample_every) < 1:
        raise ValueError("resample_every must be >= 1 (1 = the reference "
                         "schedule, liu_west_filter.h:480-481)")
    lcls, cloud = pl.pallas_call(
        _build_kernel(n, t_len, shrink_a, lo, hi, resample_every, variant,
                      float(ess_threshold), k_steps, num_filters),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # seed, ys
            grid=(num_filters, t_cells),
            in_specs=[
                pl.BlockSpec((n, n), lambda f, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE, 128),
                             lambda f, t, *_: (f, (t * k_steps) // 128),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, n), lambda f, t, *_: (f, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE, n), jnp.float32),    # state tile
                pltpu.VMEM((TILE, 128), jnp.float32),  # gram staging
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_filters * TILE, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_filters * TILE, n), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, ys, lt)

    # lcl was broadcast to all 8 rows of its tile; take row 0 of each
    lcls = lcls.reshape(num_filters, TILE, t_pad)[:, 0, :t_len]
    cloud = cloud.reshape(num_filters, TILE, n)
    return {
        "log_cond_likes": lcls,
        "log_likelihood": jnp.sum(lcls, axis=-1),
        "cloud": cloud,
    }


def lw_cloud_params(cloud):
    """Constrained (phi, mu, sigma, rho) particles from a kernel cloud.

    ``cloud``: (F, 8, N) -> (F, N, 4) constrained parameter particles.

    NOTE: with ``resample_every == 1`` (default) the final cloud is
    uniformly weighted and plain means of these particles are valid.
    Under ``resample_every > 1`` or ``ess_threshold > 0`` the cloud may
    carry non-uniform weights — combine with
    :func:`lw_cloud_weights` for self-normalized summaries.
    """
    th = cloud[:, 2:6, :]
    phi = jax.nn.sigmoid(th[:, 0])
    mu = th[:, 1]
    sigma = jnp.exp(th[:, 2])
    rho = jnp.tanh(0.5 * th[:, 3])
    return jnp.stack([phi, mu, sigma, rho], axis=-1)


def lw_cloud_weights(cloud):
    """Normalized particle weights from a kernel cloud.

    ``cloud``: (F, 8, N) -> (F, N) weights summing to 1 per filter
    (row 1 of the tile holds the carried log-weights; all-zero right
    after a resample, in which case these are uniform 1/N).
    """
    lw = cloud[:, 1, :]
    mx = jnp.max(lw, axis=-1, keepdims=True)
    w = jnp.exp(lw - mx)
    return w / jnp.sum(w, axis=-1, keepdims=True)


__all__ = ["svol_leverage_lw_pallas", "lw_cloud_params",
           "lw_cloud_weights", "TILE", "N_PARAM"]
