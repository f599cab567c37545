"""Shared property-test harness for distributions.

Port of the contract defined by reference ``tests/distributions/utils.py``
(528 LoC of parameterized shape/dtype helpers, e.g. test_dtype_2parameter
at :13, test_batch_shape_2parameter_univariate at :186,
test_2parameter_sample_shape_same at :232,
test_1parameter_log_prob_shape_one_rank_less at :480): every distribution
must satisfy the ``([n_samples]+)batch_shape+value_shape`` sample-shape
contract and the ``(...)+batch_shape[:-group_ndims]`` log-prob-shape
contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


KEY = jax.random.PRNGKey(42)


def check_dtype_2parameter(DistClass):
    """Parameter dtype propagation contract (reference tests utils.py:13-66)."""
    for dtype in (jnp.float32, jnp.float64):
        p1 = jnp.asarray(0.5, dtype)
        p2 = jnp.asarray(0.5, dtype)
        try:
            dist = DistClass(p1, p2)
        except TypeError:
            return
        assert np.dtype(dist.param_dtype) == np.dtype(dtype)

    with pytest.raises(TypeError):
        DistClass(jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float64))


def check_batch_shape_2parameter_univariate(make_dist):
    """Batch shape = broadcast of the two parameter shapes
    (reference tests utils.py:186-229)."""
    for shape1, shape2, target in [
        ((), (), ()),
        ((2,), (), (2,)),
        ((), (3, 2), (3, 2)),
        ((4, 1), (4, 3), (4, 3)),
        ((2, 1, 5), (3, 5), (2, 3, 5)),
    ]:
        dist = make_dist(jnp.zeros(shape1) + 0.5, jnp.ones(shape2) * 0.5)
        assert tuple(dist.batch_shape) == target

    with pytest.raises(ValueError):
        make_dist(jnp.ones((2,)) * 0.5, jnp.ones((3,)) * 0.5)


def check_sample_shape(make_dist, param_shapes, value_shape=()):
    """Sample shape contract: ([n_samples]+)batch_shape+value_shape
    (reference tests utils.py:232-292)."""
    for shapes, n_samples in [
        (param_shapes[0], None),
        (param_shapes[0], 1),
        (param_shapes[-1], 7),
    ]:
        dist = make_dist(*shapes)
        batch = tuple(dist.batch_shape)
        samples = dist.sample(KEY, n_samples=n_samples)
        if n_samples is None:
            assert samples.shape == batch + value_shape
        else:
            assert samples.shape == (n_samples,) + batch + value_shape


def check_log_prob_shape(make_dist, param_shapes, given_maker, value_shape=()):
    """Log-prob shape contract: (...)+batch_shape[:-group_ndims]
    (reference tests utils.py:480-528)."""
    for shapes in param_shapes:
        dist = make_dist(*shapes)
        batch = tuple(dist.batch_shape)
        given = given_maker(batch + value_shape, dist)
        log_p = dist.log_prob(given)
        assert log_p.shape == batch

        # Extra leading axes broadcast through.
        given2 = given_maker((5,) + batch + value_shape, dist)
        log_p2 = dist.log_prob(given2)
        assert log_p2.shape == (5,) + batch


def check_group_ndims(make_dist_with_group, given_maker, value_shape=()):
    """group_ndims sums the trailing batch axes
    (reference distributions/base.py:291-303 contract)."""
    for group_ndims in (0, 1, 2):
        dist = make_dist_with_group(group_ndims)
        batch = tuple(dist.batch_shape)
        given = given_maker(batch + value_shape, dist)
        log_p = dist.log_prob(given)
        expected = batch[: len(batch) - group_ndims]
        assert log_p.shape == expected

    with pytest.raises(ValueError):
        make_dist_with_group(-1)
