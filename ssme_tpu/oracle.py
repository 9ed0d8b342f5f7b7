"""Float64 numpy PMMH oracle: the reference's exact algorithm.

The C++ reference cannot be built here (its ``pf`` dependency is not
vendored) and is unseeded, so the closest feasible stand-in for
"posterior means within 2 MC-SE of the C++ reference" (BASELINE.md) is
this from-scratch float64 implementation of the same algorithm:

- adaptive MVN random-walk on the transformed space
  (``ada_pmmh_mvn.h:326-372``) with the Haario moment recursion
  (``:213-250``), sd = 2.4^2/d, eps = .01 (``:185-186``);
- log-Jacobian of {null, twice_fisher, log} in the MH ratio
  (``:343,364``; ``parameters.h:334-338,376-380,447-448``);
- univ-SVOL bootstrap PF likelihood with EVERY-STEP multinomial
  resampling (``estimate_univ_svol.h:108-131`` driving pf's
  ``BSFilter`` with ``mn_resampler``);
- replicate log-mean-exp (``thread_pool.h:259-273``);
- NaN acceptance rejects (``:349``).

Used by ``tests/test_pmmh_oracle.py`` (simulated data, test scale) and
``examples/accuracy_gate.py`` (real SPY data, workload scale — the
VERDICT r3 full-scale accuracy gate).
"""

from __future__ import annotations

import numpy as np

SD = 2.4 * 2.4 / 3.0   # ada_pmmh_mvn.h:185
EPS = 0.01             # ada_pmmh_mvn.h:186


def constrain(z):
    """transforms {null, twice_fisher, log} (estimate_univ_svol.h:155)."""
    return np.array([z[0], np.tanh(0.5 * z[1]), np.exp(z[2])])


def log_jacobian(z):
    """parameters.h:334-338 (null), :376-380 (twice_fisher), :447-448
    (log)."""
    return (np.log(2.0) + z[1] - 2.0 * np.log1p(np.exp(z[1]))) + z[2]


def log_prior(theta_c):
    """beta~N(1,1), phi~U(0,1), ss~InvGamma(1e-3,1e-3)
    (estimate_univ_svol.h:94-101)."""
    beta, phi, ss = theta_c
    lp_beta = -0.5 * np.log(2 * np.pi) - 0.5 * (beta - 1.0) ** 2
    lp_phi = 0.0 if 0.0 < phi < 1.0 else -np.inf
    a = b = 1e-3
    if ss <= 0:
        lp_ss = -np.inf
    else:
        from scipy.special import gammaln
        lp_ss = a * np.log(b) - gammaln(a) - (a + 1.0) * np.log(ss) - b / ss
    return lp_beta + lp_phi + lp_ss


def pf_loglike(rng, theta_c, ys, n_particles):
    """Bootstrap PF, every-step multinomial resampling, float64.

    Mirrors estimate_univ_svol.h:108-131 driving pf's BSFilter with
    mn_resampler; log cond-like per step = log mean weight.
    """
    beta, phi, ss = theta_c
    with np.errstate(all="ignore"):
        sigma = np.sqrt(ss)
        sd0 = sigma / np.sqrt(1.0 - phi * phi)
        x = rng.normal(0.0, 1.0, n_particles) * sd0
        total = 0.0
        for t in range(len(ys)):
            if t > 0:
                x = phi * x + sigma * rng.normal(0.0, 1.0, n_particles)
            sd = beta * np.exp(0.5 * x)
            lw = (-0.5 * np.log(2 * np.pi) - np.log(sd)
                  - 0.5 * (ys[t] / sd) ** 2)
            m = np.max(lw)
            w = np.exp(lw - m)
            total += m + np.log(np.mean(w))
            if not np.isfinite(total):
                return total   # nan/-inf: dead proposal, reject upstream
            p = w / np.sum(w)
            x = x[rng.choice(n_particles, n_particles, p=p)]
    return total


def loglike_reps(rng, z, ys, n_particles, n_replicates):
    """Replicate log-mean-exp (thread_pool.h:259-273)."""
    theta_c = constrain(z)
    vals = np.array([pf_loglike(rng, theta_c, ys, n_particles)
                     for _ in range(n_replicates)])
    m = np.max(vals)
    if not np.isfinite(m):
        return m
    return m + np.log(np.mean(np.exp(vals - m)))


def oracle_pmmh(seed, ys, start_z, n_iters, n_particles, n_replicates,
                t0, t1, c0_scale=0.15, progress_every=0):
    """The reference's commence_sampling loop (ada_pmmh_mvn.h:326-372),
    float64 numpy.  Returns (n_iters, 3) CONSTRAINED samples."""
    rng = np.random.default_rng(seed)
    d = 3
    z = np.asarray(start_z, np.float64).copy()
    mean = np.zeros(d)
    sig = np.zeros((d, d))
    ct = c0_scale * np.eye(d)
    old_lp = log_prior(constrain(z)) + log_jacobian(z)
    old_ll = loglike_reps(rng, z, ys, n_particles, n_replicates)
    out = np.empty((n_iters, d))
    n_acc = 0
    for i in range(1, n_iters + 1):
        # update_moments_and_Ct with the CURRENT position (:338,:213-250)
        if i >= 2:
            sig = (sig * (max(i - 2, 0) / (i - 1))
                   + np.outer(z - mean, z - mean) / i)
        mean = ((i - 1) * mean + z) / i
        if t0 < i < t1:
            ct = SD * (sig + EPS * np.eye(d))
        # MVN proposal on the transformed space (:341,:260-269)
        chol = np.linalg.cholesky(ct)
        z_new = z + chol @ rng.normal(0.0, 1.0, d)
        new_lp = log_prior(constrain(z_new)) + log_jacobian(z_new)
        if np.isfinite(new_lp):
            new_ll = loglike_reps(rng, z_new, ys, n_particles,
                                  n_replicates)
        else:
            new_ll = -np.inf
        log_accept = new_lp + new_ll - old_lp - old_ll
        log_u = np.log(rng.uniform())
        if log_u < log_accept:   # NaN -> False, reference :349
            z, old_lp, old_ll = z_new, new_lp, new_ll
            n_acc += 1
        out[i - 1] = constrain(z)
        if progress_every and i % progress_every == 0:
            import sys
            print(f"oracle iter {i}/{n_iters} accept={n_acc / i:.3f} "
                  f"theta={out[i - 1]}", file=sys.stderr, flush=True)
    return out


def batch_means_se(x, n_batches=20):
    """MC standard error of the mean via batch means (handles the heavy
    autocorrelation of an MCMC chain)."""
    n = (len(x) // n_batches) * n_batches
    bm = x[:n].reshape(n_batches, -1).mean(axis=1)
    return bm.std(ddof=1) / np.sqrt(n_batches)


__all__ = ["constrain", "log_jacobian", "log_prior", "pf_loglike",
           "loglike_reps", "oracle_pmmh", "batch_means_se", "SD", "EPS"]
