"""Golden-value and round-trip tests for ssme_tpu.transforms.

Golden constants are lifted from the reference's deterministic unit tests
(``test/test_parameters.cpp:112-165``): transformed values
(1.0, -1.3, 9.5, .89) under (null, log, logit, twice_fisher) constrain to
(1.0, 0.2725318, 0.9999252, 0.4177803) and the summed log-Jacobian is
-11.6851.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssme_tpu import transforms as tr

NAMES = ("null", "log", "logit", "twice_fisher")
TRANS_VALS = np.array([1.0, -1.3, 9.5, 0.89], dtype=np.float32)
GOLDEN_CONSTRAINED = np.array([1.0, 0.2725318, 0.9999252, 0.4177803])
GOLDEN_LOG_JAC = -11.6851


def test_golden_constrained_values():
    pt = tr.ParamTransform(NAMES)
    got = pt.constrain(jnp.asarray(TRANS_VALS))
    np.testing.assert_allclose(np.asarray(got), GOLDEN_CONSTRAINED, atol=1e-4)


def test_golden_summed_log_jacobian():
    pt = tr.ParamTransform(NAMES)
    lj = pt.log_det_jacobian(jnp.asarray(TRANS_VALS))
    assert abs(float(lj) - GOLDEN_LOG_JAC) < 1e-3


def test_round_trip_all_transforms():
    pt = tr.ParamTransform(NAMES)
    constrained = jnp.array([2.5, 0.7, 0.25, -0.6], dtype=jnp.float32)
    z = pt.unconstrain(constrained)
    back = pt.constrain(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(constrained),
                               rtol=5e-4, atol=1e-4)


def test_round_trip_from_transformed_space():
    pt = tr.ParamTransform(NAMES)
    z = jnp.array([-0.3, 1.2, -2.0, 3.0], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pt.unconstrain(pt.constrain(z))),
                               np.asarray(z), rtol=5e-4, atol=1e-4)


def test_batched_constrain_under_vmap():
    pt = tr.ParamTransform(NAMES)
    zs = jax.random.normal(jax.random.key(1), (16, 4))
    batched = jax.vmap(pt.constrain)(zs)
    loop = jnp.stack([pt.constrain(z) for z in zs])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(loop), rtol=1e-6)


def test_log_jacobian_matches_autodiff():
    # |d constrained / d unconstrained| via jacfwd, elementwise transforms
    pt = tr.ParamTransform(NAMES)
    z = jnp.array([0.4, -0.9, 1.7, -0.2], dtype=jnp.float32)
    jac = jax.jacfwd(pt.constrain)(z)
    auto = jnp.sum(jnp.log(jnp.abs(jnp.diag(jac))))
    np.testing.assert_allclose(float(pt.log_det_jacobian(z)), float(auto),
                               rtol=1e-4)


def test_param_pack_subset_and_jacobian():
    # mirrors pack subsetting semantics (parameters.h:598-618, inclusive end)
    pp = tr.ParamPack(jnp.asarray(TRANS_VALS), NAMES, from_transformed=True)
    full = pp.get_untrans_params()
    sub = pp.get_untrans_params(1, 2)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full[1:3]))
    assert abs(float(pp.get_log_jacobian()) - GOLDEN_LOG_JAC) < 1e-3


def test_param_pack_from_untransformed():
    pp = tr.ParamPack(jnp.array([1.0, 2.0, 0.5, 0.3]), NAMES,
                      from_transformed=False)
    np.testing.assert_allclose(np.asarray(pp.get_untrans_params()),
                               [1.0, 2.0, 0.5, 0.3], rtol=5e-4, atol=1e-4)


def test_param_pack_incremental_construction():
    # add_param_and_transform semantics (parameters.h:511-537): values
    # stored transformed, converting when is_transformed=False; golden
    # constrained values and log-Jacobian match the one-shot ctor.
    pp = tr.ParamPack.empty(4)
    pp.add_param_and_transform(TRANS_VALS[0], "null")
    pp.add_param_and_transform(TRANS_VALS[1], "log", is_transformed=True)
    # feed the remaining two in the CONSTRAINED space
    pp.add_param_and_transform(GOLDEN_CONSTRAINED[2], "logit",
                               is_transformed=False)
    pp.add_param_and_transform(GOLDEN_CONSTRAINED[3], "twice_fisher",
                               is_transformed=False)
    np.testing.assert_allclose(np.asarray(pp.get_untrans_params()),
                               GOLDEN_CONSTRAINED, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pp.get_trans_params()),
                               TRANS_VALS, rtol=5e-3, atol=1e-4)
    assert abs(float(pp.get_log_jacobian()) - GOLDEN_LOG_JAC) < 2e-2
    assert pp.dim == 4


def test_param_pack_incremental_overflow_and_underfill():
    pp = tr.ParamPack.empty(1)
    pp.add_param_and_transform(0.5, "log")
    # capacity exceeded throws, matching std::length_error
    # ("can't add any more transformations", parameters.h:521)
    with pytest.raises(ValueError, match="can't add any more"):
        pp.add_param_and_transform(0.1, "null")
    half = tr.ParamPack.empty(2).add_param_and_transform(0.5, "log")
    with pytest.raises(ValueError, match="not fully constructed"):
        half.get_untrans_params()


def test_unknown_transform_raises():
    with pytest.raises(ValueError):
        tr.ParamTransform(("null", "sqrt"))


def test_param_transform_is_static_hashable():
    a = tr.ParamTransform(NAMES)
    b = tr.ParamTransform(list(NAMES))
    assert a == b and hash(a) == hash(b)

    @jax.jit
    def f(z):
        return a.constrain(z)

    f(jnp.zeros(4))  # closes over the static transform without error
