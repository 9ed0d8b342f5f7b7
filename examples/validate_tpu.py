#!/usr/bin/env python
"""On-hardware validation harness: cross-checks every Pallas megakernel
against the generic XLA path (and exact references where they exist) on
the real TPU, printing one PASS/FAIL line per check.

The CPU test suite (tests/) runs the same statistical gates in interpret
mode where possible, but interpret-mode PRNG is a stub — this script is
the hardware ground truth. Run it after kernel changes:

    python examples/validate_tpu.py          # ~3-6 min (cached compiles)
    python examples/validate_tpu.py --quick  # smaller configs

Checks:
  1. SVOL megakernel vs XLA bootstrap likelihood (statistical)
  2. Generic-factory SVOL instance vs hand-written kernel (bit-exact)
  3. SVOL-leverage factory kernel vs XLA (statistical)
  4. Factor-SVOL factory kernel vs XLA (statistical; both use the
     Precision.HIGHEST density path)
  5. ESS-adaptive (tau=0.5) vs every-step resampling likelihoods agree
     in mean within joint MC error (unbiasedness)
  6. LW megakernel APF parity (rs=1) reproduces the LiuWestFilter
     log-likelihood scale on simulated leverage data
  7. Linear-Gaussian 2-leaf factory kernel vs exact Kalman filter
     (within Jensen bias + MC tolerance)
  8. Factory APF mode vs the XLA AuxiliaryParticleFilter (statistical)
  9. LW FACTORY instance vs the hand-written LW kernel (bit-exact on
     hardware PRNG, both variants)
 10. svol_t through the LW factory: joint posterior recovery on
     simulated data (weak reference-style bounds)
 11. chain-sharded megakernel hook (shard_map + pallas) on a 1-device
     mesh — the combination the CPU tests cannot exercise
 12. particle caps compile AND run at the documented maxima:
     bootstrap megakernel at MAX_KERNEL_PARTICLES (both schedules),
     LW megakernel at MAX_LW_KERNEL_PARTICLES
 13. LW future-simulation bridge from the kernel's exposed cloud
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, ok, detail):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}: {detail}")
    if not ok:
        FAILURES.append(name)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    if jax.devices()[0].platform != "tpu":
        print("ERROR: needs a real TPU (interpret-mode PRNG is a stub); "
              f"got platform {jax.devices()[0].platform!r}", file=sys.stderr)
        return 2

    from ssme_tpu.filters import LiuWestFilter, log_likelihood_fn
    from ssme_tpu.models import factor_svol, svol, svol_leverage
    from ssme_tpu.ops.filter_megakernel import (
        KernelModel, factor_svol_kernel_model, filter_megakernel,
        svol_kernel_model, svol_leverage_kernel_model)
    from ssme_tpu.ops.svol_filter_kernel import svol_filter_pallas
    from ssme_tpu.ops.svol_leverage_lw_kernel import svol_leverage_lw_pallas

    T = 120 if args.quick else 300
    B = 16 if args.quick else 32
    N = 256 if args.quick else 512

    # ---- 1. SVOL megakernel vs XLA --------------------------------------
    ys = 0.5 * jax.random.normal(jax.random.key(1), (T,))
    p_svol = jnp.array([1.0, 0.9, 0.04])          # (beta, phi, ss)
    rows = jnp.broadcast_to(
        jnp.array([1.0, 0.9, float(np.sqrt(0.04))]), (B, 3))
    tot_s, _, _ = svol_filter_pallas(7, rows, ys, num_particles=N)
    ll = log_likelihood_fn(svol.make_model(), num_particles=N)
    ref = jax.vmap(lambda k: ll(k, p_svol, ys[:, None]))(
        jax.random.split(jax.random.key(2), B))
    gap = abs(float(tot_s.mean()) - float(ref.mean()))
    tol = 4 * float(ref.std()) / np.sqrt(B) + 0.5
    check("svol kernel vs xla", gap < tol,
          f"kernel {float(tot_s.mean()):.2f} xla {float(ref.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol:.2f}")

    # ---- 1b. metropolis resampler path compiles, runs, stays close ----
    # (documented small bias — docs/kernels.md; at this T it is well
    # inside the MC tolerance.  This is the only hardware exercise of
    # the roll-based selector: CPU tests run it in interpret mode only.)
    tot_m, _, _ = svol_filter_pallas(7, rows, ys, num_particles=N,
                                     ess_threshold=0.5,
                                     resampler="metropolis",
                                     metropolis_iters=16)
    gap_m = abs(float(tot_m.mean()) - float(ref.mean()))
    tol_m = tol + 1.0
    check("svol metropolis resampler",
          bool(np.isfinite(np.asarray(tot_m)).all()) and gap_m < tol_m,
          f"kernel {float(tot_m.mean()):.2f} xla {float(ref.mean()):.2f} "
          f"gap {gap_m:.2f} < tol {tol_m:.2f}")

    # ---- 1c. factory metropolis ABOVE the dense cap (n=2048) ----------
    # the cap-lift claim: no (n, n) residents, so the factory compiles
    # and runs where the dense selector cannot (docs/kernels.md)
    rows8 = rows[:8]
    tot_mc, _, _ = filter_megakernel(svol_kernel_model(), 9, rows8, ys,
                                     num_particles=2048,
                                     ess_threshold=0.5,
                                     resampler="metropolis")
    gap_c = abs(float(tot_mc.mean()) - float(ref.mean()))
    check("factory metropolis n=2048 (cap lift)",
          bool(np.isfinite(np.asarray(tot_mc)).all()) and gap_c < tol_m,
          f"kernel {float(tot_mc.mean()):.2f} xla(n={N}) "
          f"{float(ref.mean()):.2f} gap {gap_c:.2f} < tol {tol_m:.2f}")

    # ---- 1d. rejection resampler: UNBIASED roll-based path ------------
    # (VERDICT r4 item 2: run-to-termination rejection — no finite-sweep
    # bias, so it must sit within the plain MC tolerance, and it is the
    # unbiased in-kernel path above the dense cap)
    try:
        tot_r, _, _ = svol_filter_pallas(7, rows, ys, num_particles=N,
                                         ess_threshold=0.5,
                                         resampler="rejection")
        gap_r = abs(float(tot_r.mean()) - float(ref.mean()))
        ok = bool(np.isfinite(np.asarray(tot_r)).all()) and gap_r < tol
        detail = (f"kernel {float(tot_r.mean()):.2f} xla "
                  f"{float(ref.mean()):.2f} gap {gap_r:.2f} < tol "
                  f"{tol:.2f}")
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
    check("svol rejection resampler", ok, detail)
    try:
        tot_rc, _, _ = filter_megakernel(svol_kernel_model(), 9,
                                         rows[:8], ys,
                                         num_particles=2048,
                                         ess_threshold=0.5,
                                         resampler="rejection")
        gap_rc = abs(float(tot_rc.mean()) - float(ref.mean()))
        ok = (bool(np.isfinite(np.asarray(tot_rc)).all())
              and gap_rc < tol_m)
        detail = (f"kernel {float(tot_rc.mean()):.2f} xla(n={N}) "
                  f"{float(ref.mean()):.2f} gap {gap_rc:.2f} < tol "
                  f"{tol_m:.2f}")
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
    check("factory rejection n=2048 (unbiased cap lift)", ok, detail)

    # ---- 2. factory SVOL vs hand-written kernel (same seed: bit-exact) --
    tot_f, _, _ = filter_megakernel(svol_kernel_model(), 7, rows, ys,
                                    num_particles=N)
    bitgap = float(jnp.max(jnp.abs(tot_f - tot_s)))
    check("factory svol bit-exact", bitgap == 0.0,
          f"max |factory - specialized| = {bitgap}")

    # ---- 3. leverage factory kernel vs XLA -------------------------------
    ysl = 0.1 * jax.random.normal(jax.random.key(3), (T,))
    zsl = jnp.concatenate([jnp.zeros((1,)), ysl[:-1]])
    p_lev = jnp.array([0.9, 0.0, 0.15, -0.3])
    rows_l = jnp.broadcast_to(p_lev, (B, 4))
    tot_l, _, _ = filter_megakernel(svol_leverage_kernel_model(), 11,
                                    rows_l, ysl, zsl, num_particles=N)
    ll_l = log_likelihood_fn(svol_leverage.make_model(), num_particles=N)
    ref_l = jax.vmap(lambda k: ll_l(k, p_lev, ysl[:, None], zsl[:, None]))(
        jax.random.split(jax.random.key(4), B))
    gap = abs(float(tot_l.mean()) - float(ref_l.mean()))
    tol = 4 * float(ref_l.std()) / np.sqrt(B) + 0.5
    check("leverage kernel vs xla", gap < tol,
          f"kernel {float(tot_l.mean()):.2f} xla {float(ref_l.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol:.2f}")

    # ---- 4. factor kernel vs XLA -----------------------------------------
    na = 4
    fmodel = factor_svol.make_model(na, 2)
    p_fac = fmodel.sample_prior(jax.random.key(0))
    _, ysf = factor_svol.simulate(jax.random.key(1), p_fac, T, na, 2)
    rows_f = jnp.broadcast_to(p_fac, (B, 6 + 3 * na))
    tot_fk, _, _ = filter_megakernel(factor_svol_kernel_model(na), 13,
                                     rows_f, ysf, num_particles=N)
    ll_f = log_likelihood_fn(fmodel, num_particles=N)
    ref_f = jax.vmap(lambda k: ll_f(k, p_fac, ysf))(
        jax.random.split(jax.random.key(5), B))
    gap = abs(float(tot_fk.mean()) - float(ref_f.mean()))
    tol = 4 * float(ref_f.std()) / np.sqrt(B) + 0.5
    check("factor kernel vs xla", gap < tol,
          f"kernel {float(tot_fk.mean()):.2f} xla {float(ref_f.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol:.2f}")

    # ---- 5. ESS-adaptive unbiasedness ------------------------------------
    tot_a, _, _ = svol_filter_pallas(17, rows, ys, num_particles=N,
                                     ess_threshold=0.5)
    gap = abs(float(tot_a.mean()) - float(tot_s.mean()))
    tol = 4 * (float(tot_s.std()) + float(tot_a.std())) / np.sqrt(B) + 0.5
    check("ess-adaptive unbiased", gap < tol,
          f"tau=.5 {float(tot_a.mean()):.2f} tau=1 "
          f"{float(tot_s.mean()):.2f} gap {gap:.2f} < tol {tol:.2f}")

    # ---- 5a. gate_stride: coarsened LSE/ESS checks stay unbiased ------
    # (round-5 transcendental lever, docs/kernels.md "gate_stride": the
    # staged per-check lcls telescope exactly, so totals must agree
    # with the per-step-gated schedule within MC error — both kernels)
    tot_g8, _, _ = svol_filter_pallas(17, rows, ys, num_particles=N,
                                      ess_threshold=0.5, gate_stride=8)
    gap = abs(float(tot_g8.mean()) - float(tot_a.mean()))
    tol_g = 4 * (float(tot_a.std()) + float(tot_g8.std())) / np.sqrt(B) + 0.5
    check("gate_stride=8 unbiased (hand kernel)", gap < tol_g,
          f"g8 {float(tot_g8.mean()):.2f} g1 {float(tot_a.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol_g:.2f}")
    tot_fg8, _, _ = filter_megakernel(svol_kernel_model(), 17, rows, ys,
                                      num_particles=N,
                                      ess_threshold=0.5, gate_stride=8)
    gap = abs(float(tot_fg8.mean()) - float(tot_a.mean()))
    check("gate_stride=8 unbiased (factory)", gap < tol_g,
          f"g8 {float(tot_fg8.mean()):.2f} g1 {float(tot_a.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol_g:.2f}")
    # cross-cell stride (g=16 > steps_per_cell=8, runtime-predicate
    # checks; exercises the padded-step guard on chip — the staged
    # ragged tail would be wiped without it, shifting the mean by
    # +several nats, far outside tol)
    tot_g16, _, _ = svol_filter_pallas(17, rows, ys, num_particles=N,
                                       ess_threshold=0.5, gate_stride=16)
    gap = abs(float(tot_g16.mean()) - float(tot_a.mean()))
    tol_g16 = (4 * (float(tot_a.std()) + float(tot_g16.std()))
               / np.sqrt(B) + 0.5)
    check("gate_stride=16 cross-cell unbiased (hand kernel)",
          gap < tol_g16,
          f"g16 {float(tot_g16.mean()):.2f} g1 {float(tot_a.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol_g16:.2f}")
    tot_fg16, _, _ = filter_megakernel(svol_kernel_model(), 17, rows, ys,
                                       num_particles=N,
                                       ess_threshold=0.5, gate_stride=16)
    gap = abs(float(tot_fg16.mean()) - float(tot_a.mean()))
    check("gate_stride=16 cross-cell unbiased (factory)", gap < tol_g16,
          f"g16 {float(tot_fg16.mean()):.2f} g1 {float(tot_a.mean()):.2f} "
          f"gap {gap:.2f} < tol {tol_g16:.2f}")

    # ---- 5b. worker-crash guard: long PMMH requests auto-chunk --------
    # (VERDICT r4 item 1: >= 500-launch single executions kill the TPU
    # worker — data/probe_crash.jsonl; the guard splits run_from into
    # <= MAX_SCAN_ITERS host-level chunks, so a 500-iteration request
    # must now run clean.  Truncated T keeps each chunk a few seconds.)
    try:
        from ssme_tpu.inference import AdaptivePMMH
        from ssme_tpu.inference.pmmh import MAX_SCAN_ITERS
        from ssme_tpu.models import svol as svol_mod
        from ssme_tpu.ops.svol_filter_kernel import (
            svol_pallas_batched_log_like)

        guard_iters = 2 * MAX_SCAN_ITERS
        pmmh_g = AdaptivePMMH(
            svol_mod.make_model(), num_particles=256, num_replicates=2,
            t0=50, t1=400,
            batched_log_like=svol_pallas_batched_log_like(
                256, 2, ess_threshold=0.5))
        res_g = pmmh_g.run(jax.random.key(23),
                           jnp.asarray(svol_mod.START_TRANS_THETA),
                           guard_iters, ys[:512, None], num_chains=16)
        ok = (res_g.samples.shape[0] == guard_iters
              and bool(np.isfinite(np.asarray(res_g.samples)).all()))
        detail = (f"{guard_iters} iters via {MAX_SCAN_ITERS}-chunks, "
                  f"accept={float(res_g.accept_rate[-1].mean()):.3f}")
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
    check("pmmh long-scan guard (500 iters)", ok, detail)

    # ---- 6. LW megakernel vs LiuWestFilter scale -------------------------
    lw_out = svol_leverage_lw_pallas(19, ysl, num_filters=8,
                                     num_particles=N, variant="apf")
    lwf = LiuWestFilter(svol_leverage.make_model(), num_particles=N,
                        delta=0.99, variant="apf")
    res = jax.jit(lwf.run)(jax.random.key(6), ysl[:, None], zsl[:, None])
    kmean = float(lw_out["log_likelihood"].mean())
    ksd = float(lw_out["log_likelihood"].std())
    gref = float(res.log_likelihood)
    # LW is adaptive (parameter cloud shrinks differently per run);
    # require same scale, not tight statistical agreement
    tol = 6 * ksd + 10.0
    check("lw kernel vs generic scale", abs(kmean - gref) < tol,
          f"kernel {kmean:.1f}+-{ksd:.1f} generic {gref:.1f} tol {tol:.1f}")

    # ---- 7. linear-Gaussian 2-leaf kernel vs exact Kalman ----------------
    a_coef, obs_sd = 0.7, 0.5
    half_log_2pi = 0.9189385332046727

    def lg_init(rng, pp, y, z, shape):
        sd0 = 1.0 / jnp.sqrt(1.0 - a_coef * a_coef)
        return (rng.normal(shape) * sd0, rng.normal(shape) * sd0)

    def lg_prop(rng, pp, state, y, z):
        x1, x2 = state
        return (a_coef * x1 + rng.normal(x1.shape),
                a_coef * x2 + rng.normal(x2.shape))

    def lg_weight(pp, state, y, z):
        x1, x2 = state
        r = (y[0] - (x1 + x2)) / obs_sd
        return -half_log_2pi - np.log(obs_sd) - 0.5 * r * r

    km_lg = KernelModel(num_params=1, init=lg_init, propagate=lg_prop,
                        log_weight=lg_weight, num_state=2, name="lg2")

    rng = np.random.default_rng(0)
    x1 = np.zeros(T); x2 = np.zeros(T)
    x1[0] = rng.normal() / np.sqrt(1 - a_coef ** 2)
    x2[0] = rng.normal() / np.sqrt(1 - a_coef ** 2)
    for t in range(1, T):
        x1[t] = a_coef * x1[t - 1] + rng.normal()
        x2[t] = a_coef * x2[t - 1] + rng.normal()
    ys_lg = x1 + x2 + obs_sd * rng.normal(size=T)

    # exact Kalman
    P = np.eye(2) / (1 - a_coef * a_coef)
    mvec = np.zeros(2)
    H = np.array([1.0, 1.0])
    R = obs_sd ** 2
    exact = 0.0
    for t, yv in enumerate(ys_lg):
        if t > 0:
            mvec = a_coef * mvec
            P = a_coef * a_coef * P + np.eye(2)
        S = H @ P @ H + R
        v = yv - H @ mvec
        exact += -0.5 * np.log(2 * np.pi * S) - 0.5 * v * v / S
        K = P @ H / S
        mvec = mvec + K * v
        P = P - np.outer(K, H @ P)

    tot_lg, _, _ = filter_megakernel(
        km_lg, 23, jnp.zeros((B, 1), jnp.float32),
        jnp.asarray(ys_lg, jnp.float32), num_particles=N)
    v = np.asarray(tot_lg, np.float64)
    # PF log-evidence is Jensen-biased DOWN by ~var/2 (lognormal approx)
    jensen = v.var() / 2
    gap = exact - v.mean()          # expected ~ jensen >= 0
    tol = jensen + 4 * v.std() / np.sqrt(B) + 0.5
    check("2-leaf kernel vs kalman", 0 - tol / 2 < gap < tol + 1.0,
          f"kernel {v.mean():.2f} exact {exact:.2f} gap {gap:.2f} "
          f"(jensen ~{jensen:.2f}, tol {tol:.2f})")

    # ---- 8. factory APF mode vs XLA auxiliary filter ---------------------
    from ssme_tpu.filters import AuxiliaryParticleFilter
    tot_apf, _, _ = filter_megakernel(svol_kernel_model(), 29, rows, ys,
                                      num_particles=N, mode="apf")
    apf = AuxiliaryParticleFilter(svol.make_model(), num_particles=N)
    ref_apf = jax.vmap(
        lambda k: apf.run(k, p_svol, ys[:, None]).log_likelihood)(
        jax.random.split(jax.random.key(7), B))
    gap = abs(float(tot_apf.mean()) - float(ref_apf.mean()))
    tol = 4 * float(ref_apf.std()) / np.sqrt(B) + 0.5
    check("apf kernel vs xla", gap < tol,
          f"kernel {float(tot_apf.mean()):.2f} xla "
          f"{float(ref_apf.mean()):.2f} gap {gap:.2f} < tol {tol:.2f}")

    # ---- 9. LW factory vs hand kernel (bit-exact, hardware PRNG) ---------
    import ssme_tpu.ops.liu_west_megakernel as lwm
    km_lev_lw = lwm.svol_leverage_lw_kernel_model()
    fac_apf_cloud = None
    for variant in ("apf", "sisr"):
        hand = svol_leverage_lw_pallas(31, ysl, num_filters=4,
                                       num_particles=N, variant=variant)
        fac = lwm.lw_megakernel(km_lev_lw, 31, ysl, zs=zsl, num_filters=4,
                                num_particles=N, variant=variant)
        if variant == "apf":
            fac_apf_cloud = fac["cloud"]
        bitgap = float(jnp.max(jnp.abs(hand["log_cond_likes"]
                                       - fac["log_cond_likes"])))
        cloudgap = float(jnp.max(jnp.abs(hand["cloud"] - fac["cloud"])))
        check(f"lw factory bit-exact ({variant})",
              bitgap == 0.0 and cloudgap == 0.0,
              f"max |lcl gap| = {bitgap}, max |cloud gap| = {cloudgap}")

    # ---- 10. svol_t through the LW factory: posterior recovery -----------
    from ssme_tpu.models import svol_t
    true_t = jnp.array([1.0, 0.9, 0.09, 5.0])     # beta, phi, ss, nu
    _, ys_t = svol_t.simulate(jax.random.key(9), true_t, max(T, 300))
    km_t = lwm.svol_t_lw_kernel_model(nu=5.0)
    out_t = lwm.lw_megakernel(km_t, 37, ys_t.reshape(-1), num_filters=8,
                              num_particles=N)
    params_t = lwm.lw_cloud_params(km_t, out_t["cloud"])
    w_t = lwm.lw_cloud_weights(km_t, out_t["cloud"])
    post = np.asarray((params_t * w_t[..., None]).sum(axis=1).mean(axis=0))
    ll_ok = bool(np.isfinite(np.asarray(out_t["log_likelihood"])).all())
    # falsifiable vs the prior means (1.25, 0.795, 0.525): beta and
    # sigma must land strictly truth-side of the prior mean; phi is
    # weakly identified at this T (t-tails mask the AR signal)
    ok = (ll_ok and 0.8 < post[0] < 1.2 and 0.6 < post[1] < 0.99
          and 0.1 < post[2] < 0.45)
    check("svol_t lw factory recovery", ok,
          f"post mean (beta, phi, sigma) = {np.round(post, 3)} "
          f"(truth (1.0, 0.9, 0.3); prior means (1.25, 0.795, 0.525)), "
          f"ll finite = {ll_ok}")

    # ---- 11. chain-sharded megakernel hook on a 1-device mesh ------------
    # tests/test_kernel_sharded.py validates the shard_map wrapper's
    # semantics on the CPU mesh with an XLA inner (interpret-mode pallas
    # under shard_map deadlocks the CPU client); this is the one place
    # the REAL megakernel inner runs under shard_map (VERDICT r2 weak 7)
    from ssme_tpu.parallel import make_mesh, sharded_megakernel_log_like
    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    sh_ll = sharded_megakernel_log_like(
        svol_kernel_model(), num_particles=N, num_replicates=4, mesh=mesh1,
        constrain=lambda p: jnp.stack(
            [p[:, 0], p[:, 1], jnp.sqrt(p[:, 2])], axis=-1))
    vals_sh = sh_ll(jax.random.key(41), jnp.broadcast_to(p_svol, (8, 3)), ys)
    ok = bool(np.isfinite(np.asarray(vals_sh)).all())
    gap = abs(float(vals_sh.mean()) - float(ref.mean()))
    tol = 4 * float(ref.std()) / np.sqrt(8) + 1.0
    check("sharded megakernel 1x1 mesh", ok and gap < tol,
          f"finite={ok}, mean {float(vals_sh.mean()):.2f} vs xla "
          f"{float(ref.mean()):.2f} (tol {tol:.2f})")

    # ---- 12. particle caps: documented maxima compile and run ------------
    from ssme_tpu.ops.filter_megakernel import MAX_KERNEL_PARTICLES
    from ssme_tpu.ops.liu_west_megakernel import MAX_LW_KERNEL_PARTICLES
    t_cap = 120 if args.quick else 256
    for ess_cap in (1.0, 0.5):
        try:
            tot_cap, _, _ = filter_megakernel(
                svol_kernel_model(), 43, rows[:8], ys[:t_cap],
                num_particles=MAX_KERNEL_PARTICLES, ess_threshold=ess_cap)
            ok = bool(np.isfinite(np.asarray(tot_cap)).all())
            detail = f"n={MAX_KERNEL_PARTICLES} ran, finite={ok}"
        except Exception as e:
            ok, detail = False, f"{type(e).__name__}: {str(e)[:120]}"
        check(f"bootstrap cap ess={ess_cap}", ok, detail)
    try:
        out_cap = lwm.lw_megakernel(
            km_lev_lw, 47, ysl[:t_cap], zs=zsl[:t_cap], num_filters=2,
            num_particles=MAX_LW_KERNEL_PARTICLES, variant="apf")
        ok = bool(np.isfinite(
            np.asarray(out_cap["log_likelihood"])).all())
        detail = f"n={MAX_LW_KERNEL_PARTICLES} ran, finite={ok}"
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:120]}"
    check("lw cap", ok, detail)
    try:
        out_cap = lwm.lw_megakernel(
            km_lev_lw, 49, ysl[:t_cap], zs=zsl[:t_cap], num_filters=2,
            num_particles=2048, variant="apf", ess_threshold=0.5,
            resampler="metropolis")
        ok = bool(np.isfinite(
            np.asarray(out_cap["log_likelihood"])).all())
        detail = f"n=2048 ran, finite={ok}"
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:120]}"
    check("lw metropolis cap lift", ok, detail)
    try:
        out_cap = lwm.lw_megakernel(
            km_lev_lw, 51, ysl[:t_cap], zs=zsl[:t_cap], num_filters=2,
            num_particles=2048, variant="apf", ess_threshold=0.5,
            resampler="rejection")
        ok = bool(np.isfinite(
            np.asarray(out_cap["log_likelihood"])).all())
        detail = f"n=2048 ran, finite={ok}"
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:120]}"
    check("lw rejection cap lift (unbiased)", ok, detail)

    # ---- 12b. bootstrap-kernel final-cloud export + swarm forecast -------
    # (VERDICT r4 item 7: Swarm::simFutureObs from the megakernel cloud,
    # pswarm_filter.h:247-253)
    try:
        from ssme_tpu.inference import forecast_from_cloud
        from ssme_tpu.ops.filter_megakernel import (
            megakernel_swarm_evidence)
        draws_sw = jnp.broadcast_to(jnp.asarray([1.0, 0.9, 0.04]), (8, 3))
        rows_sw = jnp.stack([draws_sw[:, 0], draws_sw[:, 1],
                             jnp.sqrt(draws_sw[:, 2])], axis=-1)
        ev = megakernel_swarm_evidence(
            svol_kernel_model(), 55, rows_sw, ys, num_particles=N,
            ess_threshold=0.5, return_cloud=True)
        fut_sw = forecast_from_cloud(
            svol.make_model(), draws_sw, ev["final_cloud"],
            ev["final_log_weights"], jax.random.key(56), num_steps=5)
        sd_sw = float(np.std(np.asarray(fut_sw)))
        ok = (fut_sw.shape == (8, 5, N, 1)
              and bool(np.isfinite(np.asarray(fut_sw)).all())
              and 0.2 < sd_sw < 10.0)
        detail = f"shape {tuple(fut_sw.shape)}, pooled obs sd {sd_sw:.3f}"
    except Exception as e:
        ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
    check("swarm kernel-cloud forecast bridge", ok, detail)

    # ---- 13. LW future-sim bridge from the kernel cloud -------------------
    fut = lwm.lw_kernel_sim_future_obs(
        km_lev_lw, svol_leverage.make_model(), fac_apf_cloud,
        jax.random.key(53), num_steps=5, last_obs=jnp.asarray([0.0]))
    ok = (fut.shape == (4, 5, N, 1)
          and bool(np.isfinite(np.asarray(fut)).all()))
    check("lw kernel future-sim bridge", ok,
          f"shape {tuple(fut.shape)}, finite={ok}")

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILED: {FAILURES}")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
