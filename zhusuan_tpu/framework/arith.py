"""Arithmetic mixin making graph nodes behave like JAX arrays.

Parity: reference ``zhusuan/utils.py:18-150`` (``TensorArithmeticMixin``)
registered StochasticTensor as convertible-to-tensor with full operator
overloading. Here the explicit operators below cover Python-level
expressions like ``z + 1``, and ``jnp.asarray(node)`` converts explicitly
via the ``__jax_array__`` protocol. [TPU divergence] JAX no longer triggers
``__jax_array__`` implicitly during abstractification, so ``jnp.sum(node)``
requires ``jnp.sum(node.tensor)`` or ``jnp.sum(jnp.asarray(node))`` —
unlike the reference where any ``tf.*`` op accepted the node directly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["TensorArithmeticMixin"]


class TensorArithmeticMixin:
    """Mixin delegating arithmetic/indexing to ``self.tensor``."""

    # -- conversion ---------------------------------------------------- #
    def __jax_array__(self):
        return self.tensor

    @property
    def shape(self):
        return jnp.shape(self.tensor)

    @property
    def ndim(self):
        return jnp.ndim(self.tensor)

    def __len__(self):
        return len(self.tensor)

    # -- unary --------------------------------------------------------- #
    def __abs__(self):
        return jnp.abs(self.tensor)

    def __neg__(self):
        return -self.tensor

    def __pos__(self):
        return +self.tensor

    # -- binary (forward and reflected) -------------------------------- #
    def __add__(self, other):
        return self.tensor + other

    def __radd__(self, other):
        return other + self.tensor

    def __sub__(self, other):
        return self.tensor - other

    def __rsub__(self, other):
        return other - self.tensor

    def __mul__(self, other):
        return self.tensor * other

    def __rmul__(self, other):
        return other * self.tensor

    def __truediv__(self, other):
        return self.tensor / other

    def __rtruediv__(self, other):
        return other / self.tensor

    def __floordiv__(self, other):
        return self.tensor // other

    def __rfloordiv__(self, other):
        return other // self.tensor

    def __mod__(self, other):
        return self.tensor % other

    def __rmod__(self, other):
        return other % self.tensor

    def __pow__(self, other):
        return self.tensor ** other

    def __rpow__(self, other):
        return other ** self.tensor

    def __matmul__(self, other):
        return self.tensor @ other

    def __rmatmul__(self, other):
        return other @ self.tensor

    # -- comparisons --------------------------------------------------- #
    def __lt__(self, other):
        return self.tensor < other

    def __le__(self, other):
        return self.tensor <= other

    def __gt__(self, other):
        return self.tensor > other

    def __ge__(self, other):
        return self.tensor >= other

    # NOTE: __eq__/__ne__ are left as object identity (matching the
    # reference, which disables tensor equality to keep nodes hashable for
    # dict membership; see zhusuan/utils.py:118-127).

    # -- indexing ------------------------------------------------------ #
    def __getitem__(self, item):
        return self.tensor[item]

    def __iter__(self):
        raise TypeError(
            "{} object is not iterable.".format(type(self).__name__)
        )

    def __bool__(self):
        raise TypeError(
            "Using a `{}` as a Python `bool` is not allowed (it is "
            "trace-time symbolic).".format(type(self).__name__)
        )
