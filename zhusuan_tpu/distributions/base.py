"""Distribution abstract base class.

Capability parity with reference ``zhusuan/distributions/base.py`` (shape
contract at base.py:23-46, ``sample`` at base.py:237-263, ``log_prob``/``prob``
with ``group_ndims`` reduction at base.py:291-320, ``path_param`` at
base.py:150-157).

TPU-native divergences:
  * ``sample`` takes an explicit PRNG ``key`` (JAX functional RNG) instead of
    relying on a hidden global seed.
  * JAX shapes are always static, so the reference's static/dynamic shape
    duality (base.py:179-234) collapses into single ``batch_shape`` /
    ``value_shape`` tuple properties.
  * ``group_ndims`` must be a Python int (shape arithmetic is trace-static).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Distribution"]


class Distribution:
    """Base class for probability distributions with batch semantics.

    Samples have shape ``([n_samples] +) batch_shape + value_shape``; the
    leading axis is present iff ``n_samples`` is not None. ``log_prob(given)``
    accepts values broadcastable to ``(... +) batch_shape + value_shape`` and
    returns shape ``(... +) batch_shape[:-group_ndims]``: the last
    ``group_ndims`` batch axes are grouped into a single event whose
    log-probabilities are summed. (Contract mirrors reference
    ``distributions/base.py:23-46``.)

    :param dtype: dtype of samples.
    :param param_dtype: dtype of parameters (and of log_prob outputs).
    :param is_continuous: whether the distribution is continuous.
    :param is_reparameterized: whether sample gradients propagate into
        parameters via the reparameterization trick.
    :param use_path_derivative: if True, ``path_param`` stops gradients
        through distribution parameters inside ``log_prob`` ("sticking the
        landing", Roeder et al. 2017; reference base.py:150-157).
    :param group_ndims: non-negative int; number of trailing batch axes
        folded into one event in ``log_prob``/``prob``.
    """

    def __init__(
        self,
        dtype,
        param_dtype,
        is_continuous: bool,
        is_reparameterized: bool,
        use_path_derivative: bool = False,
        group_ndims: int = 0,
        **kwargs,
    ):
        if "group_event_ndims" in kwargs:
            raise ValueError(
                "The argument `group_event_ndims` has been deprecated. "
                "Please use `group_ndims` instead."
            )
        if not isinstance(group_ndims, (int, np.integer)):
            raise TypeError(
                "group_ndims must be a Python int in zhusuan_tpu "
                "(JAX shapes are static); got {!r}.".format(group_ndims)
            )
        if group_ndims < 0:
            raise ValueError("group_ndims must be non-negative.")
        self._dtype = np.dtype(dtype)
        self._param_dtype = np.dtype(param_dtype)
        self._is_continuous = bool(is_continuous)
        self._is_reparameterized = bool(is_reparameterized)
        self._use_path_derivative = bool(use_path_derivative)
        self._group_ndims = int(group_ndims)

    # ------------------------------------------------------------------ #
    # metadata properties                                                #
    # ------------------------------------------------------------------ #
    @property
    def dtype(self):
        """The sample dtype."""
        return self._dtype

    @property
    def param_dtype(self):
        """The parameter dtype."""
        return self._param_dtype

    @property
    def is_continuous(self) -> bool:
        """Whether the distribution is continuous."""
        return self._is_continuous

    @property
    def is_reparameterized(self) -> bool:
        """Whether sample gradients flow into parameters."""
        return self._is_reparameterized

    @property
    def use_path_derivative(self) -> bool:
        """Whether log_prob stops gradients through params (STL estimator)."""
        return self._use_path_derivative

    @property
    def group_ndims(self) -> int:
        """Number of trailing batch axes grouped into one event."""
        return self._group_ndims

    def path_param(self, param):
        """Stop gradient on ``param`` when ``use_path_derivative`` is set.

        Parity: reference ``base.py:150-157``.
        """
        if self._use_path_derivative:
            return jax.lax.stop_gradient(param)
        return param

    # ------------------------------------------------------------------ #
    # shapes                                                             #
    # ------------------------------------------------------------------ #
    @property
    def batch_shape(self) -> Tuple[int, ...]:
        """Static batch shape (broadcast of parameter shapes)."""
        return self._batch_shape()

    @property
    def value_shape(self) -> Tuple[int, ...]:
        """Static per-sample value shape ([] for univariate)."""
        return self._value_shape()

    # Parity aliases for the reference's get_batch_shape/get_value_shape.
    def get_batch_shape(self):
        return self.batch_shape

    def get_value_shape(self):
        return self.value_shape

    def _batch_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError()

    def _value_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError()

    # ------------------------------------------------------------------ #
    # sampling                                                           #
    # ------------------------------------------------------------------ #
    def sample(self, key, n_samples: Optional[int] = None):
        """Draw samples.

        ``n_samples=None`` draws a single sample of shape
        ``batch_shape + value_shape`` (leading axis squeezed); an int draws
        ``[n_samples] + batch_shape + value_shape``. Parity: reference
        ``base.py:237-263``; the PRNG key is explicit here.
        """
        if n_samples is None:
            return jnp.squeeze(self._sample(key, 1), axis=0)
        if not isinstance(n_samples, (int, np.integer)):
            raise TypeError(
                "n_samples must be None or a Python int in zhusuan_tpu "
                "(static shapes); got {!r}.".format(n_samples)
            )
        if n_samples < 1:
            raise ValueError("n_samples must be >= 1.")
        return self._sample(key, int(n_samples))

    def _sample(self, key, n_samples: int):
        raise NotImplementedError()

    # ------------------------------------------------------------------ #
    # densities                                                          #
    # ------------------------------------------------------------------ #
    def _check_input_shape(self, given):
        given = jnp.asarray(given)
        if self.is_continuous or not jnp.issubdtype(
            given.dtype, jnp.floating
        ):
            # Continuous heads score in their sample dtype; integer input
            # to a discrete head likewise.
            given = given.astype(self.dtype)
        else:
            # FLOAT input to a discrete head: cast to param_dtype so
            # fractional values (soft labels, dequantized counts) score
            # exactly — the reference casts `given` to param_dtype inside
            # each _log_prob (e.g. univariate.py:1047-1064); casting to
            # the integer sample dtype here would silently truncate
            # Bernoulli(0.5) to Bernoulli(0.0).
            given = given.astype(self.param_dtype)
        static_sample_shape = tuple(self.batch_shape) + tuple(self.value_shape)
        try:
            np.broadcast_shapes(jnp.shape(given), static_sample_shape)
        except ValueError:
            raise ValueError(
                "The given argument should be able to broadcast to "
                "match batch_shape + value_shape of the distribution. "
                "({} vs. {} + {})".format(
                    jnp.shape(given), self.batch_shape, self.value_shape
                )
            )
        return given

    def log_prob(self, given):
        """Log density/mass at ``given``.

        Returns shape ``(... +) batch_shape[:-group_ndims]`` — the last
        ``group_ndims`` axes are sum-reduced. Parity: reference
        ``base.py:291-303``.
        """
        given = self._check_input_shape(given)
        log_p = self._log_prob(given)
        return self._reduce_group(log_p, jnp.sum)

    def prob(self, given):
        """Density/mass at ``given``; trailing ``group_ndims`` axes
        product-reduced. Parity: reference ``base.py:305-320``."""
        given = self._check_input_shape(given)
        p = self._prob(given)
        return self._reduce_group(p, jnp.prod)

    def _reduce_group(self, x, reducer):
        if self._group_ndims == 0:
            return x
        if self._group_ndims > jnp.ndim(x):
            raise ValueError(
                "group_ndims ({}) exceeds the rank of the per-element "
                "log-probability ({}); it must not exceed the number of "
                "batch dimensions.".format(self._group_ndims, jnp.ndim(x))
            )
        axes = tuple(range(-self._group_ndims, 0))
        return reducer(x, axis=axes)

    def log_survival(self, given):
        """``log P(X > given)`` elementwise, trailing ``group_ndims``
        axes sum-reduced (independent components: the joint survival is
        the product of marginals). Beyond reference — implemented by the
        heads used in survival models (Exponential, Weibull, Normal,
        LogNormal); needed by
        :class:`~zhusuan_tpu.distributions.extra.RightCensored`.
        """
        given = self._check_input_shape(given)
        log_s = self._log_survival(given)
        return self._reduce_group(log_s, jnp.sum)

    def _log_survival(self, given):
        raise NotImplementedError(
            "{} does not implement log_survival.".format(
                type(self).__name__)
        )

    def _log_prob(self, given):
        raise NotImplementedError()

    def _prob(self, given):
        # Default: exp(log_prob); subclasses may override with an exact form.
        return jnp.exp(self._log_prob(given))

    def __repr__(self):
        return "<{} batch_shape={} value_shape={} dtype={}>".format(
            type(self).__name__, self.batch_shape, self.value_shape, self.dtype
        )
