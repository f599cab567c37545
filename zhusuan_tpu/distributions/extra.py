"""Beyond-reference univariate heads: StudentT, Exponential, Cauchy,
HalfCauchy, LogNormal.

The reference zoo (``zhusuan/distributions/univariate.py``, 14 classes)
lacks several heads that are standard in contemporary PPLs — heavy-tailed
likelihoods (StudentT, Cauchy), the canonical scale priors (HalfCauchy,
LogNormal, Exponential). They follow the exact same contract and style as
:mod:`zhusuan_tpu.distributions.univariate` and participate in the same
property sweeps (``tests/distributions/test_contract.py``) and
scipy-verified value tests.

All samplers are reparameterized where a differentiable path exists:
inverse-CDF for Exponential/Cauchy/HalfCauchy, location-scale transforms
of native draws for StudentT/LogNormal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution
from zhusuan_tpu.distributions.univariate import _maybe_stop
from zhusuan_tpu.distributions.utils import (
    assert_same_float_dtype,
    broadcast_shapes,
    open_interval_standard_uniform,
)
from zhusuan_tpu.ops.checks import check_numerics

__all__ = ["StudentT", "Exponential", "Cauchy", "HalfCauchy", "LogNormal"]

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))


class _LocScaleContinuous(Distribution):
    """Shared plumbing for loc/scale continuous heads."""

    _loc_name = "loc"
    _scale_name = "scale"

    def __init__(self, loc, scale, group_ndims=0, is_reparameterized=True,
                 use_path_derivative=False, check_numerics=False,
                 dtype=None, **kwargs):
        # Subclasses with extra parameters (StudentT's df) pass the JOINT
        # dtype in; otherwise it derives from loc/scale alone.
        if dtype is None:
            dtype = assert_same_float_dtype(
                [(loc, self._loc_name), (scale, self._scale_name)]
            )
        self._loc = jnp.asarray(loc, dtype)
        self._scale = jnp.asarray(scale, dtype)
        self._check_numerics = check_numerics
        broadcast_shapes(jnp.shape(self._loc), jnp.shape(self._scale))
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            group_ndims=group_ndims,
            **kwargs,
        )

    loc = property(lambda self: self._loc)
    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return broadcast_shapes(jnp.shape(self._loc), jnp.shape(self._scale))

    def _value_shape(self):
        return ()

    def _log_scale(self):
        log_scale = jnp.log(self.path_param(self._scale))
        if self._check_numerics:
            log_scale = check_numerics(
                log_scale, "log({})".format(self._scale_name)
            )
        return log_scale


class StudentT(_LocScaleContinuous):
    """Student's t with ``df`` degrees of freedom, location and scale.

    Beyond reference (univariate.py has no heavy-tailed location family).
    Sampler: ``loc + scale * t``, ``t ~ jax.random.t(df)`` — the
    location-scale path is reparameterized in ``loc``/``scale``. Density:
    the standard t density shifted/scaled.

    ``reparameterize_df=True`` additionally carries gradients through
    ``df`` via the construction ``t = z / sqrt(g / (df/2))`` with
    ``z ~ N(0,1)`` and ``g ~ Gamma(df/2, 1)`` — the Gamma draw uses
    JAX's implicit reparameterization (Figurnov et al. 2018), so the
    tail weight itself becomes learnable by SGVB. Off by default (the
    plain path matches ``jax.random.t``'s stream).
    """

    def __init__(self, df, loc=0.0, scale=1.0, group_ndims=0,
                 is_reparameterized=True, reparameterize_df=False,
                 use_path_derivative=False,
                 check_numerics=False, **kwargs):
        self._reparameterize_df = bool(reparameterize_df)
        # df participates in the SAME dtype contract as loc/scale: mixed
        # parameter dtypes must raise (as in Normal), and sample/log_prob
        # dtypes must agree.
        dtype = assert_same_float_dtype(
            [(df, "df"), (loc, "loc"), (scale, "scale")]
        )
        self._df = jnp.asarray(df, dtype)
        super().__init__(
            loc, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, dtype=dtype, **kwargs,
        )

    df = property(lambda self: self._df)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._df), jnp.shape(self._loc),
            jnp.shape(self._scale),
        )

    def _sample(self, key, n_samples):
        df, loc, scale = _maybe_stop(
            (self._df, self._loc, self._scale), self.is_reparameterized
        )
        shape = (n_samples,) + self.batch_shape
        if self.is_reparameterized and self._reparameterize_df:
            # z / sqrt(g / (df/2)): the Gamma draw carries the implicit
            # df-gradient; z is reparameterized trivially.
            kz, kg = jax.random.split(key)
            half_df = jnp.broadcast_to(
                jnp.asarray(0.5, self.dtype) * df, shape
            )
            z = jax.random.normal(kz, shape, self.dtype)
            g = jax.random.gamma(kg, half_df, dtype=self.dtype)
            t = z * jnp.sqrt(half_df / g)
        else:
            # df never carries gradients on this path.
            t = jax.random.t(
                key, jax.lax.stop_gradient(df), shape, self.dtype
            )
        return loc + scale * t

    def _log_prob(self, given):
        df = self.path_param(self._df)
        loc = self.path_param(self._loc)
        z = (given - loc) / self.path_param(self._scale)
        half = jnp.asarray(0.5, self.param_dtype)
        return (
            jax.lax.lgamma(half * (df + 1.0))
            - jax.lax.lgamma(half * df)
            - half * jnp.log(df * jnp.pi)
            - self._log_scale()
            - half * (df + 1.0) * jnp.log1p(z * z / df)
        )


class Exponential(Distribution):
    """Exponential with rate ``rate`` (mean ``1/rate``).

    Beyond reference. Reparameterized inverse-CDF sampler
    ``-log(U)/rate``; density ``log(rate) - rate*x`` for ``x >= 0``
    (``-inf`` below the support, matching scipy).
    """

    def __init__(self, rate, group_ndims=0, is_reparameterized=True,
                 use_path_derivative=False, check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype([(rate, "rate")])
        self._rate = jnp.asarray(rate, dtype)
        self._check_numerics = check_numerics
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            group_ndims=group_ndims,
            **kwargs,
        )

    rate = property(lambda self: self._rate)

    def _batch_shape(self):
        return jnp.shape(self._rate)

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        (rate,) = _maybe_stop((self._rate,), self.is_reparameterized)
        shape = (n_samples,) + self.batch_shape
        u = open_interval_standard_uniform(key, shape, self.dtype)
        return -jnp.log(u) / rate

    def _log_prob(self, given):
        rate = self.path_param(self._rate)
        log_rate = jnp.log(rate)
        if self._check_numerics:
            log_rate = check_numerics(log_rate, "log(rate)")
        lp = log_rate - rate * given
        return jnp.where(
            given >= 0, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )


class Cauchy(_LocScaleContinuous):
    """Cauchy with location and scale.

    Beyond reference. Reparameterized inverse-CDF sampler
    ``loc + scale * tan(pi*(U - 1/2))``; density
    ``-log(pi) - log(scale) - log1p(z^2)``.
    """

    def _sample(self, key, n_samples):
        loc, scale = _maybe_stop(
            (self._loc, self._scale), self.is_reparameterized
        )
        shape = (n_samples,) + self.batch_shape
        u = open_interval_standard_uniform(key, shape, self.dtype)
        return loc + scale * jnp.tan(jnp.pi * (u - 0.5))

    def _log_prob(self, given):
        z = (given - self.path_param(self._loc)) / self.path_param(
            self._scale
        )
        return (
            -float(np.log(np.pi)) - self._log_scale() - jnp.log1p(z * z)
        )


class HalfCauchy(Distribution):
    """Half-Cauchy on ``[0, inf)`` with scale ``scale`` — the standard
    weakly-informative scale prior (Gelman 2006).

    Beyond reference. Reparameterized inverse-CDF sampler
    ``scale * tan(pi*U/2)``; density ``log(2/pi) - log(scale) -
    log1p(z^2)`` for ``x >= 0``.
    """

    def __init__(self, scale, group_ndims=0, is_reparameterized=True,
                 use_path_derivative=False, check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype([(scale, "scale")])
        self._scale = jnp.asarray(scale, dtype)
        self._check_numerics = check_numerics
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            group_ndims=group_ndims,
            **kwargs,
        )

    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return jnp.shape(self._scale)

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        (scale,) = _maybe_stop((self._scale,), self.is_reparameterized)
        shape = (n_samples,) + self.batch_shape
        u = open_interval_standard_uniform(key, shape, self.dtype)
        return scale * jnp.tan(0.5 * jnp.pi * u)

    def _log_prob(self, given):
        scale = self.path_param(self._scale)
        log_scale = jnp.log(scale)
        if self._check_numerics:
            log_scale = check_numerics(log_scale, "log(scale)")
        z = given / scale
        lp = (
            float(np.log(2.0 / np.pi)) - log_scale - jnp.log1p(z * z)
        )
        return jnp.where(
            given >= 0, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )


class LogNormal(_LocScaleContinuous):
    """Log-normal: ``exp(N(loc, scale))``.

    Beyond reference. Reparameterized sampler ``exp(loc + scale*eps)``;
    density ``N(log x; loc, scale) - log x`` for ``x > 0``.
    """

    _loc_name = "mean"

    def _sample(self, key, n_samples):
        loc, scale = _maybe_stop(
            (self._loc, self._scale), self.is_reparameterized
        )
        shape = (n_samples,) + self.batch_shape
        eps = jax.random.normal(key, shape, self.dtype)
        return jnp.exp(loc + scale * eps)

    def _log_prob(self, given):
        loc = self.path_param(self._loc)
        scale = self.path_param(self._scale)
        safe = jnp.maximum(
            given, jnp.asarray(jnp.finfo(self.param_dtype).tiny,
                               self.param_dtype)
        )
        log_x = jnp.log(safe)
        z = (log_x - loc) / scale
        lp = -_HALF_LOG_2PI - self._log_scale() - log_x - 0.5 * z * z
        return jnp.where(
            given > 0, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )
