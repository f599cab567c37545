"""Tests for the deprecated legacy wrapper layer.

Mirrors the reference's legacy smoke coverage
(tests/framework/test_stochastic.py exercised the per-distribution node
creation; legacy/framework/stochastic.py:47-1219 defined the wrappers):
every wrapper constructs inside a ``with BayesianNet()`` context, warns
FutureWarning, registers under its name, picks up observations, and
produces correctly shaped samples/log-probs.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import BayesianNet
from zhusuan_tpu.legacy.framework import stochastic as legacy


F = jnp.float32


def _eye(n):
    return jnp.eye(n, dtype=F)


# name -> (args, kwargs, can_sample)
WRAPPER_CASES = {
    "Normal": ((), {"mean": F(0.0), "std": F(1.0)}, True),
    "FoldNormal": ((), {"mean": F(0.0), "std": F(1.0)}, True),
    "Bernoulli": ((F(0.0),), {}, True),
    "Categorical": ((jnp.zeros(3, F),), {}, True),
    "Uniform": ((), {"minval": F(0.0), "maxval": F(1.0)}, True),
    "Gamma": ((F(1.0), F(1.0)), {}, True),
    "Beta": ((F(1.0), F(1.0)), {}, True),
    "Poisson": ((F(1.0),), {}, True),
    "Binomial": ((F(0.0), 5), {}, True),
    "InverseGamma": ((F(2.0), F(1.0)), {}, True),
    "Laplace": ((F(0.0), F(1.0)), {}, True),
    "BinConcrete": ((F(0.5), F(0.0)), {}, True),
    "MultivariateNormalCholesky": ((jnp.zeros(2, F), _eye(2)), {}, True),
    "MatrixVariateNormalCholesky": (
        (jnp.zeros((2, 3), F), _eye(2), _eye(3)), {}, True,
    ),
    "Multinomial": ((jnp.zeros(3, F), 4), {}, True),
    "UnnormalizedMultinomial": ((jnp.zeros(3, F),), {}, False),
    "OnehotCategorical": ((jnp.zeros(3, F),), {}, True),
    "Dirichlet": ((jnp.ones(3, F),), {}, True),
    "ExpConcrete": ((F(0.5), jnp.zeros(3, F)), {}, True),
    "Concrete": ((F(0.5), jnp.zeros(3, F)), {}, True),
}


@pytest.mark.parametrize("name", sorted(WRAPPER_CASES))
def test_wrapper_registers_and_samples(name):
    args, kwargs, can_sample = WRAPPER_CASES[name]
    cls = getattr(legacy, name)
    with pytest.warns(FutureWarning):
        with BayesianNet(key=jax.random.PRNGKey(7)) as bn:
            node = cls("a", *args, **kwargs)
    assert bn.nodes["a"] is node
    assert node.name == "a"
    if can_sample:
        sample = node.tensor
        expected = tuple(node.dist.batch_shape) + tuple(node.dist.value_shape)
        assert sample.shape == expected
        lp = node.cond_log_p
        assert np.all(np.isfinite(np.asarray(lp, np.float64)))
    else:
        with pytest.raises(NotImplementedError):
            _ = node.tensor


@pytest.mark.parametrize("name", sorted(WRAPPER_CASES))
def test_wrapper_standalone_with_key(name):
    args, kwargs, can_sample = WRAPPER_CASES[name]
    if not can_sample:
        pytest.skip("sampling unsupported for this distribution")
    cls = getattr(legacy, name)
    with pytest.warns(FutureWarning):
        node = cls("a", *args, n_samples=2, key=jax.random.PRNGKey(0),
                   **kwargs)
    assert node.bn is None
    assert node.tensor.shape[0] == 2


def test_aliases_are_identical():
    assert legacy.Discrete is legacy.Categorical
    assert legacy.OnehotDiscrete is legacy.OnehotCategorical
    assert legacy.BagofCategoricals is legacy.UnnormalizedMultinomial
    assert legacy.BinGumbelSoftmax is legacy.BinConcrete
    assert legacy.ExpGumbelSoftmax is legacy.ExpConcrete
    assert legacy.GumbelSoftmax is legacy.Concrete


def test_top_level_flat_export():
    # Parity: reference zhusuan/__init__.py:10-13 re-exports legacy flat.
    assert zs.Normal is legacy.Normal
    assert zs.Implicit is legacy.Implicit
    assert zs.legacy.distributions.Empirical \
        is zs.distributions.special.Empirical


def test_bayesian_net_as_context_warns():
    with pytest.warns(FutureWarning, match="deprecated"):
        with BayesianNet() as bn:
            pass
    assert BayesianNet.try_get_context() is None
    assert bn.nodes == {}


def test_observation_pickup_and_log_joint():
    x_obs = jnp.ones((3,), F)
    with pytest.warns(FutureWarning):
        with BayesianNet(observed={"x": x_obs},
                         key=jax.random.PRNGKey(3)) as bn:
            mu = legacy.Normal("mu", mean=F(0.0), std=F(1.0))
            legacy.Normal("x", mean=mu, std=F(1.0))
    assert bn["x"].is_observed
    np.testing.assert_allclose(np.asarray(bn["x"].tensor), np.ones(3))
    # log_joint through legacy nodes equals the hand-built value.
    from scipy import stats

    mu_v = np.asarray(bn["mu"].tensor, np.float64)
    expected = stats.norm.logpdf(mu_v) + stats.norm.logpdf(1.0, loc=mu_v)
    np.testing.assert_allclose(
        np.asarray(bn.log_joint(), np.float64), expected, rtol=1e-5
    )


def test_duplicate_name_raises():
    with pytest.warns(FutureWarning):
        with BayesianNet(key=jax.random.PRNGKey(0)):
            legacy.Normal("a", mean=F(0.0), std=F(1.0))
            with pytest.raises(ValueError, match="exists a node"):
                legacy.Normal("a", mean=F(0.0), std=F(1.0))


def test_standalone_without_key_raises():
    with pytest.warns(FutureWarning):
        node = legacy.Normal("a", mean=F(0.0), std=F(1.0))
    with pytest.raises(ValueError, match="no explicit key"):
        _ = node.tensor


def test_empirical_wrapper():
    with pytest.warns(FutureWarning):
        node = legacy.Empirical("e", np.float32, batch_shape=(2, 3))
    assert tuple(node.dist.batch_shape) == (2, 3)
    with pytest.raises(ValueError, match="can not sample"):
        _ = node.tensor
    # Observed Empirical works inside a net (the GAN data-node pattern).
    data = jnp.ones((2, 3), F)
    with pytest.warns(FutureWarning):
        with BayesianNet(observed={"e": data}) as bn:
            legacy.Empirical("e", np.float32, batch_shape=(2, 3))
    np.testing.assert_array_equal(np.asarray(bn["e"].tensor), np.ones((2, 3)))


def test_implicit_wrapper():
    samples = jnp.arange(3.0, dtype=F)
    with pytest.warns(FutureWarning):
        node = legacy.Implicit("i", samples)
    np.testing.assert_array_equal(np.asarray(node.tensor), np.arange(3.0))
    # Continuous implicit density is a point mass: +inf at the sample,
    # -inf elsewhere (reference legacy/distributions/special.py:164-169:
    # ``(2*equal - 1) * inf``).
    np.testing.assert_array_equal(
        np.asarray(node.dist.prob(samples)), np.full(3, np.inf)
    )
    np.testing.assert_array_equal(
        np.asarray(node.dist.prob(samples + 1.0)), np.full(3, -np.inf)
    )


def test_legacy_node_in_arithmetic():
    # Wrappers inherit the arithmetic mixin through StochasticTensor.
    with pytest.warns(FutureWarning):
        node = legacy.Normal("a", mean=F(0.0), std=F(1.0),
                             key=jax.random.PRNGKey(0))
    out = node + 1.0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(node.tensor) + 1.0
    )


def test_all_exports_present():
    # All 28 reference names (23 wrappers + aliases + special pair).
    for name in legacy.__all__:
        assert hasattr(zs, name), name
    assert len(legacy.__all__) == 28


def test_reuse_deprecated_alias():
    # Reference framework/utils.py:109-117: ``reuse`` stays exported as a
    # deprecated alias of ``reuse_variables``.
    with pytest.warns(DeprecationWarning):
        @zs.reuse("model")
        def build():
            return 7

    assert build() == 7
    assert "reuse" in zs.framework.__all__
    assert "reuse_variables" in zs.framework.__all__
