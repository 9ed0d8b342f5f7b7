#!/usr/bin/env python
"""Particle-swarm filtering + forecasting from posterior samples.

The reference's swarm workflow (``test/test_pswarm.cpp:267-348``): load
posterior parameter samples (e.g. PMMH output from
``examples/estimate_univ_svol.py``), run a bank of bootstrap filters —
one per sampled parameter — over the observations, report the
parameter-marginalized conditional evidence, and simulate future
observation paths:

    python examples/swarm_forecast.py <datafile> <param_samples_csv> \
        [--model svol|svol_leverage] [--forecast K]
"""

import argparse
import os
import sys

# allow running by path without installation: put the repo root first
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datafile")
    p.add_argument("param_samples")
    p.add_argument("--model", choices=["svol", "svol_leverage"],
                   default="svol")
    p.add_argument("--state-particles", type=int, default=1024)
    p.add_argument("--param-particles", type=int, default=32)
    p.add_argument("--forecast", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", choices=["generic", "pallas"],
                   default="generic",
                   help="pallas: run the whole filter bank in ONE "
                        "megakernel launch (TPU; svol and svol_leverage)")
    p.add_argument("--ess", type=float, default=1.0,
                   help="pallas resampling schedule (1.0 = every step; "
                        "0.5 = ESS-adaptive, faster)")
    p.add_argument("--gate-stride", type=int, default=1,
                   help="pallas LSE/ESS check stride (requires --ess < "
                        "1.0).  Filter-bank knob: strides 8/16/32 "
                        "measured up to 1.7x (2.8x net of dispatch) at "
                        "higher evidence-estimator sd — see "
                        "docs/kernels.md 'gate_stride'")
    args = p.parse_args(argv)

    from ssme_tpu.inference import SwarmFilter
    from ssme_tpu.io import ParamSampler, read_data
    from ssme_tpu.models import svol, svol_leverage

    ys = jnp.asarray(read_data(args.datafile, num_cols=1))
    if args.model == "svol":
        model = svol.make_model()
        zs = None
    else:
        model = svol_leverage.make_model()
        zs = jnp.concatenate([jnp.zeros((1, 1)), ys[:-1]])

    sampler = ParamSampler(args.param_samples,
                           dim_param=model.dim_param)
    draws = sampler.samp(jax.random.key(args.seed),
                         num=args.param_particles)

    if args.engine == "pallas":
        # whole swarm filter bank in one pallas_call (the split-data
        # thread pool of pswarm_filter.h as a kernel row axis)
        from ssme_tpu.ops.filter_megakernel import (
            megakernel_swarm_evidence, svol_kernel_model,
            svol_leverage_kernel_model)
        if args.model == "svol":
            km = svol_kernel_model()
            rows = np.asarray(draws)
            rows = np.stack([rows[:, 0], rows[:, 1],
                             np.sqrt(rows[:, 2])], axis=-1)  # ss -> sigma
            zrows = None
        else:
            km = svol_leverage_kernel_model()
            rows = np.asarray(draws)
            zrows = np.asarray(zs).reshape(-1, 1)
        if (args.state_particles % 128 != 0
                or args.state_particles > 1024):
            p.error("--engine pallas requires --state-particles to be a "
                    "multiple of 128 and at most 1024 "
                    f"(got {args.state_particles}); use the generic "
                    "engine for other sizes")
        ev = megakernel_swarm_evidence(
            km, args.seed + 1, jnp.asarray(rows), ys, zrows,
            num_particles=args.state_particles,
            ess_threshold=args.ess, gate_stride=args.gate_stride,
            return_cloud=bool(args.forecast))
        lcl = np.asarray(ev["log_cond_like"])
        print(f"total conditional evidence: {lcl.sum():.2f} "
              f"(reference mean-of-logs aggregation: "
              f"{np.asarray(ev['mean_log_cond_like']).sum():.2f})")
        vol = np.asarray(ev["functional_path"])
        print(f"filtered state (last 5): "
              f"{np.array2string(vol[-5:], precision=3)}")
        if args.forecast:
            # Swarm::simFutureObs from the kernel-exported final cloud
            # (pswarm_filter.h:247-253): equal-weight each model's cloud
            # and run the generic future simulator over it
            from ssme_tpu.inference import forecast_from_cloud
            obs = forecast_from_cloud(
                model, draws, ev["final_cloud"], ev["final_log_weights"],
                jax.random.key(args.seed + 2), num_steps=args.forecast,
                last_obs=(ys[-1] if model.has_covariates else None))
            flat = np.asarray(obs)[..., 0].reshape(
                args.param_particles, args.forecast, -1)
            q = np.quantile(flat, [0.05, 0.5, 0.95], axis=(0, 2))
            print(f"forecast ({args.forecast} steps, pooled over "
                  f"{args.param_particles} models, kernel cloud):",
                  file=sys.stderr)
            for t in range(args.forecast):
                print(f"  t+{t+1}: {q[0, t]:+.4f} {q[1, t]:+.4f} "
                      f"{q[2, t]:+.4f}", file=sys.stderr)
        return

    sw = SwarmFilter(model, num_state_particles=args.state_particles,
                     num_param_particles=args.param_particles,
                     functionals=((lambda x, z, pp: x)
                                  if model.has_covariates
                                  else (lambda x, pp: x),))
    state, results = jax.jit(
        lambda k: sw.run(k, ys, zs, param_draws=draws)
    )(jax.random.key(args.seed + 1))

    lcl = np.asarray(results.log_cond_like)
    print(f"total conditional evidence: {lcl.sum():.2f} "
          f"(reference mean-of-logs aggregation: "
          f"{np.asarray(results.mean_log_cond_like).sum():.2f})")
    vol = np.asarray(results.expectations[0])[:, 0]
    print(f"filtered state (last 5): {np.array2string(vol[-5:], precision=3)}")

    if args.forecast:
        obs = sw.sim_future_obs(jax.random.key(args.seed + 2), state,
                                num_steps=args.forecast,
                                last_obs=(ys[-1] if model.has_covariates
                                          else None))
        flat = np.asarray(obs)[..., 0].reshape(
            args.param_particles, args.forecast, -1)
        q = np.quantile(flat, [0.05, 0.5, 0.95], axis=(0, 2))
        print(f"forecast ({args.forecast} steps, pooled over "
              f"{args.param_particles} models):", file=sys.stderr)
        for t in range(args.forecast):
            print(f"  t+{t+1}: {q[0, t]:+.4f} {q[1, t]:+.4f} "
                  f"{q[2, t]:+.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
