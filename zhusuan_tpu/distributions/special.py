"""Special distributions: Empirical and Implicit.

Capability parity with reference ``zhusuan/legacy/distributions/special.py``
(Empirical at special.py:19-93, Implicit at special.py:96-171). These support
GAN-style models where a node carries externally produced samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution

__all__ = ["Empirical", "Implicit"]


class Empirical(Distribution):
    """A distribution with declared shape/dtype but no sampler or density.

    Used for nodes that are always observed (e.g. GAN data nodes). Parity:
    reference ``legacy/distributions/special.py:19-93``.

    :param batch_shape: static batch shape of the node.
    :param dtype: sample dtype.
    :param value_shape: static value shape (default scalar).
    """

    def __init__(
        self,
        dtype,
        batch_shape=(),
        value_shape=(),
        is_continuous=None,
        group_ndims: int = 0,
        **kwargs,
    ):
        # The legacy wrappers pass value_shape=None (reference
        # legacy/framework/stochastic.py:1167-1171); treat as scalar.
        self._explicit_batch_shape = tuple(int(s) for s in batch_shape or ())
        self._explicit_value_shape = tuple(int(s) for s in value_shape or ())
        dtype = np.dtype(dtype)
        if is_continuous is None:
            is_continuous = np.issubdtype(dtype, np.floating)
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=is_continuous,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    def _batch_shape(self):
        return self._explicit_batch_shape

    def _value_shape(self):
        return self._explicit_value_shape

    def _sample(self, key, n_samples):
        raise ValueError("You can not sample from an Empirical distribution.")

    def _log_prob(self, given):
        raise ValueError(
            "An empirical distribution has no log-probability density."
        )

    def _prob(self, given):
        raise ValueError("An empirical distribution has no probability density.")


class Implicit(Distribution):
    """A distribution wrapping externally produced samples with a delta-like
    density.

    Parity: reference ``legacy/distributions/special.py:96-171``: ``prob`` is
    1 where ``given == samples`` and 0 elsewhere (continuous case: 0
    everywhere in the reference; we keep the indicator form).

    :param samples: the wrapped samples.
    :param value_shape: trailing value shape of one sample event.
    """

    def __init__(self, samples, value_shape=(), group_ndims: int = 0, **kwargs):
        self._samples = jnp.asarray(samples)
        self._explicit_value_shape = tuple(int(s) for s in value_shape or ())
        dtype = self._samples.dtype
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=np.issubdtype(np.dtype(dtype), np.floating),
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    samples = property(lambda self: self._samples)

    def _batch_shape(self):
        nv = len(self._explicit_value_shape)
        shape = jnp.shape(self._samples)
        return shape[: len(shape) - nv] if nv else shape

    def _value_shape(self):
        return self._explicit_value_shape

    def _sample(self, key, n_samples):
        # The "sample" is the wrapped tensor, tiled along a new leading axis.
        return jnp.broadcast_to(
            self._samples, (n_samples,) + jnp.shape(self._samples)
        )

    def _log_prob(self, given):
        return jnp.log(self._prob(given))

    def _prob(self, given):
        prob = (given == self._samples).astype(self.param_dtype)
        if self.is_continuous:
            # Continuous implicit density is a point mass: +inf at the
            # sample, -inf elsewhere (reference convention
            # legacy/distributions/special.py:164-169:
            # ``(2*equal - 1) * inf``).
            return (2.0 * prob - 1.0) * jnp.asarray(
                jnp.inf, self.param_dtype
            )
        return prob
