"""Direct unit tests for the shared in-kernel systematic selector
(``ssme_tpu/ops/_select.py``) against a float64 numpy oracle.

The selector is otherwise exercised only end-to-end through the
megakernels; these pin its LAW in isolation — which ancestors get
picked (reference joint-gather semantics,
``liu_west_filter.h:90-145``), the systematic count invariant, the
compensated CDF's error bound, and the boundary-clamp edge cases —
via a minimal interpret-mode ``pallas_call`` harness on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

from ssme_tpu.ops._select import (compensated_cdf,
                                  metropolis_select_leaves,
                                  select_leaves_dense)

B = 8
N = 256


def _run_select(w, leaves, u0):
    n = w.shape[1]
    n_l = len(leaves)
    lt = np.tril(np.ones((n, n), np.float32)).T

    def kernel(w_ref, u0_ref, lt_ref, *refs):
        leaf_refs, out_refs = refs[:n_l], refs[n_l:]
        picked = select_leaves_dense(w_ref[:], [r[:] for r in leaf_refs],
                                     u0_ref[:], lt_ref[:])
        for o, p in zip(out_refs, picked):
            o[:] = p

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((w.shape[0], n), jnp.float32)
                   for _ in range(n_l)],
        interpret=True,
    )(jnp.asarray(w, jnp.float32), jnp.asarray(u0, jnp.float32),
      jnp.asarray(lt), *[jnp.asarray(l, jnp.float32) for l in leaves])
    return [np.asarray(o) for o in outs]


def _oracle_indices(w_row, u0_row):
    """f64 systematic ancestors: k_j = first i with cdf_i >= u_j."""
    cdf = np.cumsum(np.asarray(w_row, np.float64))
    total = cdf[-1]
    n = w_row.shape[0]
    u = (np.arange(n) + float(u0_row)) * total / n
    return np.searchsorted(cdf, u, side="left"), cdf, u, total


def test_matches_f64_oracle_away_from_boundaries():
    rng = np.random.default_rng(0)
    w = rng.gamma(1.0, 1.0, (B, N)).astype(np.float32)
    x = rng.normal(size=(B, N)).astype(np.float32)
    u0 = rng.uniform(0.05, 0.95, (B, 1)).astype(np.float32)
    (picked,) = _run_select(w, [x], u0)
    checked = 0
    for r in range(B):
        idx, cdf, u, total = _oracle_indices(w[r], u0[r, 0])
        # the kernel's f32 compensated CDF can move a selection boundary
        # by ~2^-16 * total; only assert where every u_j clears all f64
        # boundaries by a safely larger margin
        # (margin 2e-4 * total is ~13x the documented 2^-16 CDF error
        # while still keeping ~90% of the equally-spaced u_j, whose
        # inter-point gap is total/n ~ 4e-3 * total)
        margin = np.min(np.abs(cdf[None, :] - u[:, None]), axis=1)
        safe = margin > 2e-4 * total
        assert safe.mean() > 0.7
        np.testing.assert_array_equal(picked[r, safe], x[r, idx[safe]])
        checked += int(safe.sum())
    assert checked > B * N // 2


def test_systematic_count_invariant():
    # systematic resampling guarantees |count_i - n * p_i| < 1 + rounding
    rng = np.random.default_rng(1)
    w = rng.gamma(0.5, 1.0, (B, N)).astype(np.float32)
    ids = np.tile(np.arange(N, dtype=np.float32), (B, 1))  # bf16-exact
    u0 = np.full((B, 1), 0.37, np.float32)
    (picked,) = _run_select(w, [ids], u0)
    for r in range(B):
        counts = np.bincount(picked[r].astype(int), minlength=N)
        expect = N * w[r].astype(np.float64) / w[r].astype(np.float64).sum()
        # slack derived from the kernel's documented guarantee, not from
        # interpret-mode precision: the compensated CDF carries ~2^-16 *
        # total of error (see compensated_cdf), which can shift each of a
        # particle's two selection boundaries by ~2^-16 of the full range
        # = N * 2^-16 equally-spaced u_j spacings, so the count bound the
        # kernel actually makes is |count - n*p| < 1 + 2 * N * 2^-16
        assert np.abs(counts - expect).max() < 1.0 + 2 * N * 2.0**-16


def test_joint_gather_moves_all_leaves_by_same_ancestors():
    rng = np.random.default_rng(2)
    w = rng.gamma(1.0, 1.0, (B, N)).astype(np.float32)
    ids = np.tile(np.arange(N, dtype=np.float32), (B, 1))
    vals = rng.normal(size=(B, N)).astype(np.float32)
    u0 = rng.uniform(0.1, 0.9, (B, 1)).astype(np.float32)
    picked_ids, picked_vals = _run_select(w, [ids, vals], u0)
    for r in range(B):
        anc = picked_ids[r].astype(int)
        np.testing.assert_array_equal(picked_vals[r], vals[r, anc])


def test_degenerate_weight_selects_only_the_heavy_particle():
    w = np.full((B, N), 1e-8, np.float32)
    heavy = 100
    w[:, heavy] = 1e6
    x = np.tile(np.arange(N, dtype=np.float32), (B, 1))
    (picked,) = _run_select(w, [x], np.full((B, 1), 0.5, np.float32))
    assert (picked == heavy).all()


def test_extreme_u0_never_zeroes_an_output():
    # the docstring's clamp case: f32 rounding can push u_{n-1} past the
    # CDF total, which without the clamp selects NO ancestor (output 0)
    rng = np.random.default_rng(3)
    w = rng.gamma(1.0, 1.0, (B, N)).astype(np.float32)
    x = rng.uniform(1.0, 2.0, (B, N)).astype(np.float32)  # never 0.0
    for u0v in (1e-7, 0.5, 1.0 - 1e-7):
        (picked,) = _run_select(w, [x], np.full((B, 1), u0v, np.float32))
        assert (picked >= 1.0).all() and (picked <= 2.0).all()
        # every picked value is an actual particle of the same row
        for r in range(B):
            assert np.isin(picked[r], x[r]).all()


import functools


@functools.lru_cache(maxsize=None)
def _metropolis_runner(b, n, n_l, num_iters):
    """Jitted interpret-mode harness, cached by shape so repeated-trial
    tests pay ONE trace instead of one per call (the suite-cold-start
    audit found per-call retracing dominated; VERDICT r4 item 8)."""

    def kernel(w_ref, bits_ref, *refs):
        leaf_refs, out_refs = refs[:n_l], refs[n_l:]
        counter = [0]

        def draw_bits(shape):
            k = int(np.prod(shape))
            flat = bits_ref[0, counter[0]:counter[0] + k]
            counter[0] += k
            return flat.reshape(shape)

        picked = metropolis_select_leaves(
            w_ref[:], [r[:] for r in leaf_refs], draw_bits,
            num_iters=num_iters)
        for o, p in zip(out_refs, picked):
            o[:] = p

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)
                   for _ in range(n_l)],
        interpret=True,
    )
    return jax.jit(lambda w, bits, *leaves: call(w, bits, *leaves))


def _run_metropolis(w, leaves, bits, num_iters):
    """Interpret-mode harness for the O(n) Metropolis selector with a
    DETERMINISTIC bit stream standing in for the hardware PRNG."""
    n = w.shape[1]
    n_l = len(leaves)
    runner = _metropolis_runner(w.shape[0], n, n_l, num_iters)
    outs = runner(jnp.asarray(w, jnp.float32), jnp.asarray(bits),
                  *[jnp.asarray(l, jnp.float32) for l in leaves])
    return [np.asarray(o) for o in outs]


def _bits_for(rng, num_iters, b, n):
    total = num_iters * (1 + b * n)
    return rng.integers(-2**31, 2**31, size=(1, total), dtype=np.int64
                        ).astype(np.int32)


def test_metropolis_frequency_matches_weights():
    """Each output slot's Metropolis chain targets the weight law; with
    mild weights the chains mix in a handful of sweeps, so empirical
    ancestor frequencies over many independent runs must match the
    normalized weights."""
    rng = np.random.default_rng(10)
    n, iters, trials = 256, 32, 24
    w_row = np.linspace(1.0, 2.0, n).astype(np.float32)  # mild variation
    w = np.tile(w_row, (B, 1))
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    counts = np.zeros(n)
    for _ in range(trials):
        (picked,) = _run_metropolis(w, [ids],
                                    _bits_for(rng, iters, B, n), iters)
        counts += np.bincount(picked.astype(int).ravel(), minlength=n)
    freqs = counts / counts.sum()
    want = w_row / w_row.sum()
    # 49k samples => se(freq) ~ sqrt(p/49152) ~ 2.8e-4 at p ~ 1/256;
    # 4 sigma. A law bug would be off at the p ~ 4e-3 scale itself.
    np.testing.assert_allclose(freqs, want, atol=1.1e-3)


def test_metropolis_moves_leaves_jointly():
    rng = np.random.default_rng(11)
    n, iters = 256, 8
    w = rng.gamma(1.0, 1.0, (B, n)).astype(np.float32)
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    vals = rng.normal(size=(B, n)).astype(np.float32)
    picked_ids, picked_vals = _run_metropolis(
        w, [ids, vals], _bits_for(rng, iters, B, n), iters)
    for r in range(B):
        anc = picked_ids[r].astype(int)
        np.testing.assert_array_equal(picked_vals[r], vals[r, anc])


def test_metropolis_outputs_are_real_particles():
    rng = np.random.default_rng(12)
    n, iters = 256, 4
    w = rng.gamma(0.3, 1.0, (B, n)).astype(np.float32)
    x = rng.uniform(1.0, 2.0, (B, n)).astype(np.float32)
    (picked,) = _run_metropolis(w, [x], _bits_for(rng, iters, B, n), iters)
    for r in range(B):
        assert np.isin(picked[r], x[r]).all()


def test_metropolis_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        metropolis_select_leaves(jnp.zeros((8, 384)), [jnp.zeros((8, 384))],
                                 lambda s: jnp.zeros(s, jnp.int32))


def test_compensated_cdf_error_bound():
    rng = np.random.default_rng(4)
    w = rng.gamma(0.3, 1.0, (B, N)).astype(np.float32)
    lt = np.tril(np.ones((N, N), np.float32)).T

    def kernel(w_ref, lt_ref, out_ref):
        out_ref[:] = compensated_cdf(w_ref[:], lt_ref[:])

    cdf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=True,
    )(jnp.asarray(w), jnp.asarray(lt))
    cdf64 = np.cumsum(w.astype(np.float64), axis=1)
    total = cdf64[:, -1:]
    # documented bound: |err| <= ~2^-16 |total| (w_lo's bf16 pass); in
    # interpret mode the dots run f32 so this is loose, but the bound is
    # what the kernels rely on ON HARDWARE — assert it with 4x slack
    assert (np.abs(np.asarray(cdf) - cdf64) <= 4 * 2.0**-16 * total).all()


def _run_rejection(w, leaves, tape, max_iters):
    """Interpret-mode harness for the rejection selector: a pre-drawn
    bits TAPE indexed by sweep (``draw_bits_at``) stands in for the
    per-sweep-fresh hardware PRNG (a plain stand-in would freeze the
    stream across ``while_loop`` iterations)."""
    from ssme_tpu.ops._select import rejection_select_leaves

    b, n = w.shape
    n_l = len(leaves)

    def kernel(w_ref, tape_ref, *refs):
        leaf_refs, out_refs = refs[:n_l], refs[n_l:]

        def draw_bits_at(t, shape):
            if shape == (1, 1):
                return tape_ref[t, pl.dslice(0, 1)][None, :]
            k = int(np.prod(shape))
            return tape_ref[t, pl.dslice(1, k)].reshape(shape)

        picked = rejection_select_leaves(
            w_ref[:], [r[:] for r in leaf_refs], None,
            max_iters=max_iters, draw_bits_at=draw_bits_at)
        for o, p in zip(out_refs, picked):
            o[:] = p

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)
                   for _ in range(n_l)],
        interpret=True,
    )(jnp.asarray(w, jnp.float32), jnp.asarray(tape),
      *[jnp.asarray(l, jnp.float32) for l in leaves])
    return [np.asarray(o) for o in outs]


def _rejection_tape(rng, max_iters, b, n):
    return rng.integers(-2**31, 2**31, size=(max_iters, 1 + b * n),
                        dtype=np.int64).astype(np.int32)


def test_rejection_offspring_counts_unbiased():
    """The whole point of the rejection selector (VERDICT r4 item 2):
    E[#offspring of i] = n w_i / sum w EXACTLY (identity-first
    proposals + run-to-termination), unlike Metropolis' finite-sweep
    bias.  Pin empirically over many independent tapes."""
    rng = np.random.default_rng(20)
    n, trials, iters = 128, 60, 256
    w_row = np.linspace(0.5, 2.0, n).astype(np.float32)
    w = np.tile(w_row, (B, 1))
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    counts = np.zeros(n)
    for _ in range(trials):
        (picked,) = _run_rejection(w, [ids],
                                   _rejection_tape(rng, iters, B, n),
                                   iters)
        counts += np.bincount(picked.astype(int).ravel(), minlength=n)
    freqs = counts / counts.sum()
    want = w_row / w_row.sum()
    # 60 * 8 * 128 = 61440 slots; se(freq) ~ sqrt(p/61440) ~ 3.6e-4
    np.testing.assert_allclose(freqs, want, atol=1.4e-3)


def test_rejection_heaviest_keeps_own_slot():
    # slot argmax(w) accepts its identity proposal with prob 1 - 2^-32
    rng = np.random.default_rng(21)
    n, iters = 128, 64
    w = np.full((B, n), 0.1, np.float32)
    w[:, 37] = 5.0
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    for _ in range(5):
        (picked,) = _run_rejection(w, [ids],
                                   _rejection_tape(rng, iters, B, n),
                                   iters)
        assert (picked[:, 37] == 37).all()


def test_rejection_moves_leaves_jointly_and_real_particles():
    rng = np.random.default_rng(22)
    n, iters = 128, 256
    w = rng.gamma(1.0, 1.0, (B, n)).astype(np.float32)
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    vals = rng.normal(size=(B, n)).astype(np.float32)
    picked_ids, picked_vals = _run_rejection(
        w, [ids, vals], _rejection_tape(rng, iters, B, n), iters)
    for r in range(B):
        anc = picked_ids[r].astype(int)
        np.testing.assert_array_equal(picked_vals[r], vals[r, anc])
        assert np.isin(picked_ids[r], ids[r]).all()


def test_rejection_degenerate_weights_terminate():
    """All mass on one particle: every slot must drain to it (the
    worst-case sweep count regime — exercises run-to-termination)."""
    rng = np.random.default_rng(23)
    n, iters = 128, 2048
    w = np.zeros((B, n), np.float32)
    w[:, 100] = 1.0
    ids = np.tile(np.arange(n, dtype=np.float32), (B, 1))
    (picked,) = _run_rejection(w, [ids],
                               _rejection_tape(rng, iters, B, n), iters)
    assert (picked == 100).all()


def test_rejection_rejects_non_power_of_two():
    from ssme_tpu.ops._select import rejection_select_leaves

    with pytest.raises(ValueError):
        rejection_select_leaves(jnp.zeros((8, 384)), [jnp.zeros((8, 384))],
                                lambda s: jnp.zeros(s, jnp.int32))
