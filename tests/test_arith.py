"""Full operator-matrix test of TensorArithmeticMixin.

Port of reference ``tests/test_utils.py:18-255``, which drives every
overloaded operator on a ``_SimpleTensor`` carrying the mixin and compares
against the plain-tensor result. Here the mixin is
``zhusuan_tpu/framework/arith.py``; we exercise it both on a minimal
carrier class and on a real ``StochasticTensor``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.framework import BayesianNet
from zhusuan_tpu.framework.arith import TensorArithmeticMixin


class _SimpleTensor(TensorArithmeticMixin):
    def __init__(self, value):
        self._value = jnp.asarray(value)

    @property
    def tensor(self):
        return self._value


def _node(value):
    """A real StochasticTensor observed at `value` (mixin user #1)."""
    bn = BayesianNet(observed={"x": jnp.asarray(value)})
    bn.normal(
        "x",
        jnp.zeros(jnp.shape(jnp.asarray(value))),
        std=jnp.ones(jnp.shape(jnp.asarray(value))),
    )
    return bn["x"]


CARRIERS = [_SimpleTensor, _node]
CARRIER_IDS = ["simple", "stochastic_tensor"]

A = np.asarray([[1.0, 2.0], [3.0, 4.0]])
B = np.asarray([[5.0, 6.0], [7.0, 8.0]])


@pytest.mark.parametrize("carrier", CARRIERS, ids=CARRIER_IDS)
class TestUnaryOps:
    def test_neg(self, carrier):
        np.testing.assert_allclose(np.asarray(-carrier(A)), -A)

    def test_pos(self, carrier):
        np.testing.assert_allclose(np.asarray(+carrier(A)), A)

    def test_abs(self, carrier):
        np.testing.assert_allclose(np.asarray(abs(carrier(-A))), A)


@pytest.mark.parametrize("carrier", CARRIERS, ids=CARRIER_IDS)
class TestBinaryOps:
    """Each operator in both directions: node OP tensor, tensor OP node,
    node OP scalar, scalar OP node (reference :60-199)."""

    @pytest.mark.parametrize(
        "op",
        [
            lambda x, y: x + y,
            lambda x, y: x - y,
            lambda x, y: x * y,
            lambda x, y: x / y,
            lambda x, y: x // y,
            lambda x, y: x % y,
            lambda x, y: x ** y,
        ],
        ids=["add", "sub", "mul", "truediv", "floordiv", "mod", "pow"],
    )
    def test_both_directions(self, carrier, op):
        expected = op(A, B)
        np.testing.assert_allclose(
            np.asarray(op(carrier(A), jnp.asarray(B))), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(op(jnp.asarray(A), carrier(B))), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(op(carrier(A), 2.0)), op(A, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(op(2.0, carrier(B))), op(2.0, B), rtol=1e-6
        )

    def test_matmul(self, carrier):
        np.testing.assert_allclose(
            np.asarray(carrier(A) @ jnp.asarray(B)), A @ B, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(A) @ carrier(B)), A @ B, rtol=1e-6
        )

    def test_node_op_node(self, carrier):
        np.testing.assert_allclose(
            np.asarray(carrier(A) + carrier(B)), A + B, rtol=1e-6
        )


@pytest.mark.parametrize("carrier", CARRIERS, ids=CARRIER_IDS)
class TestComparisons:
    @pytest.mark.parametrize(
        "op",
        [
            lambda x, y: x < y,
            lambda x, y: x <= y,
            lambda x, y: x > y,
            lambda x, y: x >= y,
        ],
        ids=["lt", "le", "gt", "ge"],
    )
    def test_compare(self, carrier, op):
        np.testing.assert_array_equal(
            np.asarray(op(carrier(A), 2.5)), op(A, 2.5)
        )

    def test_eq_is_identity(self, carrier):
        # Reference zhusuan/utils.py:118-127 keeps __eq__ as object identity
        # so nodes stay hashable (dict/feed-dict membership).
        node = carrier(A)
        assert (node == node) is True
        assert (node == carrier(A)) is False
        assert hash(node) == hash(node)
        assert {node: 1}[node] == 1


@pytest.mark.parametrize("carrier", CARRIERS, ids=CARRIER_IDS)
class TestIndexingAndProtocol:
    def test_getitem(self, carrier):
        np.testing.assert_allclose(np.asarray(carrier(A)[0]), A[0])
        np.testing.assert_allclose(np.asarray(carrier(A)[:, 1]), A[:, 1])
        np.testing.assert_allclose(np.asarray(carrier(A)[1, 1]), A[1, 1])

    def test_shape_ndim_len(self, carrier):
        node = carrier(A)
        assert tuple(node.shape) == A.shape
        assert node.ndim == A.ndim
        assert len(node) == len(A)

    def test_explicit_conversion(self, carrier):
        # __jax_array__ protocol via explicit jnp.asarray (replacing the
        # reference's register_tensor_conversion_function,
        # zhusuan/framework/bn.py:306-316). Implicit conversion inside jnp
        # ops is no longer supported by JAX — pinned as a divergence in
        # framework/arith.py's docstring.
        node = carrier(A)
        np.testing.assert_allclose(np.asarray(jnp.asarray(node)), A)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.asarray(node))), A.sum()
        )
        with pytest.raises(Exception):
            jnp.sum(node)  # implicit abstractification: removed in JAX

    def test_iter_raises(self, carrier):
        with pytest.raises(TypeError, match="iterable"):
            iter(carrier(A))

    def test_bool_raises(self, carrier):
        with pytest.raises(TypeError, match="bool"):
            bool(carrier(A))


class TestUnderJit:
    def test_mixin_ops_trace_under_jit(self):
        @jax.jit
        def f(x):
            node = _SimpleTensor(x)
            return node * 2.0 + 1.0

        np.testing.assert_allclose(
            np.asarray(f(jnp.asarray(A))), A * 2.0 + 1.0
        )
