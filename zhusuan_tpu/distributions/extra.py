"""Beyond-reference univariate heads: StudentT, Exponential, Cauchy,
HalfCauchy, LogNormal, NegativeBinomial, TruncatedNormal.

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

__all__ = [
    "StudentT",
    "Exponential",
    "Cauchy",
    "HalfCauchy",
    "LogNormal",
    "NegativeBinomial",
    "TruncatedNormal",
    "OrderedLogistic",
    "ZeroInflated",
    "Weibull",
    "RightCensored",
    "BetaBinomial",
    "VonMises",
]

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))


def _wrapper_batch(base, param_shape, param_name):
    """Validate and return the batch shape of a wrapper distribution
    whose parameter may EXTEND the base's batch with leading axes.

    Extension must be by leading axes only: a parameter that widens a
    size-1 batch axis of the base would force correlated base draws
    (one draw broadcast across the widened axis) — reject it and tell
    the user to give the base the full batch shape instead."""
    base_b = tuple(base.batch_shape)
    full = tuple(broadcast_shapes(base_b, tuple(param_shape)))
    if base_b and full[len(full) - len(base_b):] != base_b:
        raise ValueError(
            "{} (shape {}) widens a size-1 batch axis of the base "
            "(batch shape {}); broadcast the BASE's parameters to the "
            "full batch shape instead so its samples stay "
            "independent.".format(param_name, tuple(param_shape), base_b)
        )
    return full


def _sample_extended_batch(base, key, n_samples, full_batch):
    """Independent base draws of shape ``(n_samples,) + full_batch``
    when ``full_batch`` extends ``base.batch_shape`` by leading axes
    (one draw per extended batch element — NEVER a broadcast copy)."""
    base_b = tuple(base.batch_shape)
    lead = tuple(full_batch)[: len(full_batch) - len(base_b)]
    k = int(np.prod(lead, dtype=np.int64)) if lead else 1
    draws = base.sample(key, n_samples=n_samples * k)
    return draws.reshape((n_samples,) + lead + base_b)


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

    def _log_survival(self, given):
        rate = self.path_param(self._rate)
        return jnp.where(
            given >= 0, -rate * given, jnp.zeros((), self.param_dtype)
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

    def _log_survival(self, given):
        loc = self.path_param(self._loc)
        scale = self.path_param(self._scale)
        safe = jnp.maximum(
            given, jnp.asarray(jnp.finfo(self.param_dtype).tiny,
                               self.param_dtype)
        )
        z = (jnp.log(safe) - loc) / scale
        return jnp.where(
            given > 0,
            jax.scipy.special.log_ndtr(-z),
            jnp.zeros((), self.param_dtype),
        )


class NegativeBinomial(Distribution):
    """Negative binomial: counts with overdispersion (Gamma-Poisson).

    Beyond reference (the reference's only count heads are Poisson and
    Binomial, ``univariate.py:857,939`` — neither models overdispersed
    counts). Convention: number of "successes" ``x`` observed before
    ``total_count`` failures, success probability ``sigmoid(logits)``::

        pmf(x) = C(x + r - 1, x) * (1-p)^r * p^x,   mean = r p / (1-p)

    Sampler: the Gamma-Poisson mixture ``x ~ Poisson(lam)``,
    ``lam ~ Gamma(r, rate=e^{-logits})`` (exact; both draws native JAX).
    Density via lgamma in the logit parameterization —
    ``log sigmoid(±logits)`` terms use softplus for stability.

    :param logits: log-odds of success, any float shape.
    :param total_count: positive float ``r`` (need not be an integer),
        broadcastable against logits.
    """

    def __init__(self, logits, total_count, dtype=jnp.int32,
                 group_ndims: int = 0, check_numerics=False, **kwargs):
        param_dtype = assert_same_float_dtype(
            [(logits, "logits"), (total_count, "total_count")]
        )
        self._logits = jnp.asarray(logits, param_dtype)
        self._total_count = jnp.asarray(total_count, param_dtype)
        self._check_numerics = check_numerics
        broadcast_shapes(
            jnp.shape(self._logits), jnp.shape(self._total_count)
        )
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    logits = property(lambda self: self._logits)
    total_count = property(lambda self: self._total_count)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._logits), jnp.shape(self._total_count)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        logits = jax.lax.stop_gradient(self._logits)
        r = jax.lax.stop_gradient(self._total_count)
        shape = (n_samples,) + self.batch_shape
        kg, kp = jax.random.split(key)
        # lam ~ Gamma(r, rate = (1-p)/p = e^{-logits}) => mean r e^{logits}
        lam = jax.random.gamma(
            kg, jnp.broadcast_to(r, shape), dtype=self.param_dtype
        ) * jnp.exp(logits)
        return jax.random.poisson(kp, lam).astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        r = self._total_count
        logits = self._logits
        log_p = -jax.nn.softplus(-logits)  # log sigmoid(logits)
        log_1mp = -jax.nn.softplus(logits)
        log_comb = (
            jax.lax.lgamma(x + r)
            - jax.lax.lgamma(r)
            - jax.lax.lgamma(x + 1.0)
        )
        if self._check_numerics:
            log_comb = check_numerics(log_comb, "log_combination")
        return log_comb + r * log_1mp + x * log_p


class TruncatedNormal(_LocScaleContinuous):
    """Normal truncated to ``[low, high]``.

    Beyond reference. Fully reparameterized: the sampler is
    ``loc + scale * tn(a, b)`` with standardized bounds
    ``a = (low - loc)/scale``, ``b = (high - loc)/scale`` and
    ``jax.random.truncated_normal`` (inverse-CDF — differentiable in the
    bounds, so gradients flow into loc/scale AND low/high). Density:
    standard normal logpdf minus ``log(Phi(b) - Phi(a))``, computed from
    ``log_ndtr`` for tail stability; ``-inf`` outside the support.

    :param low: lower bound (may be ``-inf``).
    :param high: upper bound (may be ``+inf``); must exceed ``low``.
    """

    def __init__(self, loc, scale, low, high, group_ndims=0,
                 is_reparameterized=True, use_path_derivative=False,
                 check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype(
            [(loc, "loc"), (scale, "scale"), (low, "low"), (high, "high")]
        )
        self._low = jnp.asarray(low, dtype)
        self._high = jnp.asarray(high, dtype)
        super().__init__(
            loc, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, dtype=dtype, **kwargs,
        )
        broadcast_shapes(
            jnp.shape(self._low), jnp.shape(self._high), self.batch_shape
        )

    low = property(lambda self: self._low)
    high = property(lambda self: self._high)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._loc), jnp.shape(self._scale),
            jnp.shape(self._low), jnp.shape(self._high),
        )

    def _sample(self, key, n_samples):
        loc, scale, low, high = _maybe_stop(
            (self._loc, self._scale, self._low, self._high),
            self.is_reparameterized,
        )
        a = (low - loc) / scale
        b = (high - loc) / scale
        shape = (n_samples,) + self.batch_shape
        tn = jax.random.truncated_normal(
            key, jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape),
            shape, self.dtype,
        )
        # Clamp: inverse-CDF can graze the bounds in float.
        return jnp.clip(loc + scale * tn, low, high)

    def _log_norm_const(self, a, b):
        """log(Phi(b) - Phi(a)), stable in both tails: reflect so the
        larger-mass side anchors the log1p(-exp(.)) expansion."""
        log_ndtr = jax.scipy.special.log_ndtr
        # Work on the side where |mass| computations are well-conditioned:
        # if the interval sits in the right tail (a > 0), reflect.
        reflect = a > -b
        lo = jnp.where(reflect, -b, a)
        hi = jnp.where(reflect, -a, b)
        big, small = log_ndtr(hi), log_ndtr(lo)
        return big + jnp.log1p(-jnp.exp(small - big))

    def _log_prob(self, given):
        loc = self.path_param(self._loc)
        scale = self.path_param(self._scale)
        low = self.path_param(self._low)
        high = self.path_param(self._high)
        z = (given - loc) / scale
        a = (low - loc) / scale
        b = (high - loc) / scale
        log_norm = self._log_norm_const(a, b)
        if self._check_numerics:
            log_norm = check_numerics(log_norm, "log_normalizer")
        lp = (-_HALF_LOG_2PI - 0.5 * z * z - self._log_scale()
              - log_norm)
        in_support = (given >= low) & (given <= high)
        return jnp.where(
            in_support, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )


class OrderedLogistic(Distribution):
    """Cumulative-logit (proportional-odds) categorical head.

    Beyond reference (upstream ZhuSuan has no ordinal likelihood at all).
    The standard model for rating/Likert outcomes::

        P(y <= k) = sigmoid(c_k - eta),   k = 0..K-2,
        pmf(k)    = sigmoid(c_k - eta) - sigmoid(c_{k-1} - eta)

    with ``c_{-1} = -inf``, ``c_{K-1} = +inf``. Adjacent CDF differences
    are computed in log space via the stable identity
    ``sigmoid(a) - sigmoid(b) = sigmoid(a) sigmoid(-b) (1 - e^{b-a})``.
    Pair the ``cutpoints`` latent with
    :class:`zhusuan_tpu.bijectors.Ordered` when inferring them
    (monotonicity is the caller's contract — an unordered vector gives
    NaN log-probs, surfacing the mistake).

    :param eta: linear predictor, any float shape.
    :param cutpoints: ``[..., K-1]`` increasing thresholds; leading axes
        broadcast against ``eta``.
    """

    def __init__(self, eta, cutpoints, dtype=jnp.int32,
                 group_ndims: int = 0, **kwargs):
        param_dtype = assert_same_float_dtype(
            [(eta, "eta"), (cutpoints, "cutpoints")]
        )
        self._eta = jnp.asarray(eta, param_dtype)
        self._cutpoints = jnp.asarray(cutpoints, param_dtype)
        if self._cutpoints.ndim < 1 or self._cutpoints.shape[-1] < 1:
            raise ValueError(
                "cutpoints must have a trailing axis of >= 1 thresholds."
            )
        broadcast_shapes(
            jnp.shape(self._eta), jnp.shape(self._cutpoints)[:-1]
        )
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    eta = property(lambda self: self._eta)
    cutpoints = property(lambda self: self._cutpoints)

    @property
    def n_categories(self):
        return self._cutpoints.shape[-1] + 1

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._eta), jnp.shape(self._cutpoints)[:-1]
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        # Latent-logistic representation: y = #{k: eta + noise > c_k}.
        eta = jax.lax.stop_gradient(self._eta)
        cuts = jax.lax.stop_gradient(self._cutpoints)
        shape = (n_samples,) + self.batch_shape
        u = open_interval_standard_uniform(key, shape, self.param_dtype)
        latent = eta + jnp.log(u) - jnp.log1p(-u)
        return jnp.sum(
            latent[..., None] > cuts, axis=-1
        ).astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given)
        eta = self._eta
        cuts = jnp.broadcast_to(
            self._cutpoints,
            broadcast_shapes(
                jnp.shape(eta) + (1,),
                jnp.shape(self._cutpoints),
            ),
        )
        big = jnp.asarray(
            np.finfo(np.dtype(self.param_dtype)).max / 2, self.param_dtype
        )
        padded = jnp.concatenate(
            [-big * jnp.ones_like(cuts[..., :1]), cuts,
             big * jnp.ones_like(cuts[..., :1])], axis=-1,
        )
        idx = jnp.broadcast_to(
            x, broadcast_shapes(jnp.shape(x), jnp.shape(eta))
        ).astype(jnp.int32)
        hi = jnp.take_along_axis(
            jnp.broadcast_to(padded, idx.shape + padded.shape[-1:]),
            idx[..., None] + 1, axis=-1,
        )[..., 0]
        lo = jnp.take_along_axis(
            jnp.broadcast_to(padded, idx.shape + padded.shape[-1:]),
            idx[..., None], axis=-1,
        )[..., 0]
        a, b = hi - eta, lo - eta
        lp = (
            jax.nn.log_sigmoid(a)
            + jax.nn.log_sigmoid(-b)
            + jnp.log(-jnp.expm1(jnp.minimum(b - a, -1e-12)))
        )
        # Inverted cutpoints (b >= a) would be silently clamped by the
        # stable form above; surface the caller's ordering violation.
        return jnp.where(
            b < a, lp, jnp.asarray(jnp.nan, self.param_dtype)
        )


class ZeroInflated(Distribution):
    """Zero-inflated wrapper over a scalar count distribution.

    Beyond reference. With structural-zero probability
    ``pi = sigmoid(pi_logits)``::

        pmf(x) = pi * 1[x = 0] + (1 - pi) * base.pmf(x)

    — the standard model for count data with excess zeros (ZIP/ZINB via
    a :class:`~zhusuan_tpu.distributions.univariate.Poisson` or
    :class:`NegativeBinomial` base).

    :param base: a scalar-event discrete Distribution whose support
        includes 0, with ``group_ndims == 0`` (group reduction belongs to
        the wrapper).
    :param pi_logits: log-odds of a structural zero, broadcastable
        against the base's batch shape.
    """

    def __init__(self, base: Distribution, pi_logits,
                 group_ndims: int = 0, **kwargs):
        if not isinstance(base, Distribution):
            raise TypeError(
                "base must be a Distribution; got {!r}.".format(type(base))
            )
        if base.is_continuous:
            raise ValueError(
                "ZeroInflated wraps DISCRETE count distributions; for "
                "continuous zero-inflation use a Mixture with an "
                "Implicit point mass."
            )
        if base.value_shape != ():
            raise ValueError(
                "base must have a scalar event (value_shape ()); got "
                "{}.".format(base.value_shape)
            )
        if base.group_ndims != 0:
            raise ValueError(
                "base.group_ndims must be 0 (apply group_ndims on the "
                "ZeroInflated wrapper instead)."
            )
        self._base = base
        self._pi_logits = jnp.asarray(pi_logits, base.param_dtype)
        _wrapper_batch(base, jnp.shape(self._pi_logits), "pi_logits")
        super().__init__(
            dtype=base.dtype,
            param_dtype=base.param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    base = property(lambda self: self._base)
    pi_logits = property(lambda self: self._pi_logits)

    def _batch_shape(self):
        return broadcast_shapes(
            self._base.batch_shape, jnp.shape(self._pi_logits)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        k_mask, k_base = jax.random.split(key)
        shape = (n_samples,) + self.batch_shape
        # One INDEPENDENT base draw per batch element, even when
        # pi_logits extends the base's batch (never a broadcast copy).
        draws = _sample_extended_batch(
            self._base, k_base, n_samples, self.batch_shape
        )
        pi = jax.nn.sigmoid(jax.lax.stop_gradient(self._pi_logits))
        zero_mask = (
            jax.random.uniform(k_mask, shape, self.param_dtype) < pi
        )
        return jnp.where(
            zero_mask, jnp.zeros((), self.dtype), draws
        ).astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given)
        log_pi = -jax.nn.softplus(-self._pi_logits)
        log_1mpi = -jax.nn.softplus(self._pi_logits)
        lp_base = self._base.log_prob(x)
        lp_zero = self._base.log_prob(jnp.zeros_like(x))
        is_zero = (x == 0)
        return jnp.where(
            is_zero,
            jnp.logaddexp(log_pi, log_1mpi + lp_zero),
            log_1mpi + lp_base,
        )


class Weibull(Distribution):
    """Weibull with concentration ``k`` and scale ``lam``.

    Beyond reference — the workhorse survival/reliability likelihood::

        pdf(x) = (k/lam) (x/lam)^{k-1} exp(-(x/lam)^k),
        S(x)   = exp(-(x/lam)^k)

    Reparameterized inverse-CDF sampler ``lam * (-log U)^{1/k}``
    (pathwise in BOTH parameters). Implements ``log_survival`` for
    :class:`RightCensored`.

    :param concentration: shape ``k > 0``.
    :param scale: scale ``lam > 0``, broadcastable against it.
    """

    def __init__(self, concentration, scale, group_ndims=0,
                 is_reparameterized=True, use_path_derivative=False,
                 check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype(
            [(concentration, "concentration"), (scale, "scale")]
        )
        self._concentration = jnp.asarray(concentration, dtype)
        self._scale = jnp.asarray(scale, dtype)
        self._check_numerics = check_numerics
        broadcast_shapes(
            jnp.shape(self._concentration), jnp.shape(self._scale)
        )
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            group_ndims=group_ndims,
            **kwargs,
        )

    concentration = property(lambda self: self._concentration)
    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._concentration), jnp.shape(self._scale)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        k, lam = _maybe_stop(
            (self._concentration, self._scale), self.is_reparameterized
        )
        shape = (n_samples,) + self.batch_shape
        u = open_interval_standard_uniform(key, shape, self.dtype)
        return lam * jnp.power(-jnp.log(u), 1.0 / k)

    def _log_prob(self, given):
        k = self.path_param(self._concentration)
        lam = self.path_param(self._scale)
        safe = jnp.maximum(
            given, jnp.asarray(jnp.finfo(self.param_dtype).tiny,
                               self.param_dtype)
        )
        log_z = jnp.log(safe) - jnp.log(lam)
        log_k = jnp.log(k)
        if self._check_numerics:
            log_k = check_numerics(log_k, "log(concentration)")
        lp = log_k - jnp.log(lam) + (k - 1.0) * log_z - jnp.exp(k * log_z)
        return jnp.where(
            given > 0, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )

    def _log_survival(self, given):
        k = self.path_param(self._concentration)
        lam = self.path_param(self._scale)
        safe = jnp.maximum(
            given, jnp.asarray(jnp.finfo(self.param_dtype).tiny,
                               self.param_dtype)
        )
        return jnp.where(
            given > 0,
            -jnp.exp(k * (jnp.log(safe) - jnp.log(lam))),
            jnp.zeros((), self.param_dtype),
        )


class RightCensored(Distribution):
    """Right-censoring wrapper: the law of ``y = min(T, upper)`` for
    ``T ~ base``.

    Beyond reference — the survival-analysis observation model. The
    density (w.r.t. the mixed Lebesgue+atom measure) is::

        p(y) = base.pdf(y)          for y < upper   (observed event)
        p(y) = base.S(upper)        for y = upper   (censored)

    so observing ``y_i = min(T_i, c_i)`` with per-datapoint censor times
    ``upper = c`` gives exactly the standard censored log-likelihood.
    Requires ``base`` to implement ``log_survival``.

    :param base: a scalar-event continuous Distribution with
        ``group_ndims == 0``.
    :param upper: censor times, broadcastable against the base's batch
        shape.
    """

    def __init__(self, base: Distribution, upper, group_ndims=0, **kwargs):
        if not isinstance(base, Distribution):
            raise TypeError(
                "base must be a Distribution; got {!r}.".format(type(base))
            )
        if base.value_shape != () or base.group_ndims != 0:
            raise ValueError(
                "base must have a scalar event and group_ndims == 0 "
                "(apply group_ndims on the RightCensored wrapper)."
            )
        self._base = base
        self._upper = jnp.asarray(upper, base.param_dtype)
        _wrapper_batch(base, jnp.shape(self._upper), "upper")
        super().__init__(
            dtype=base.dtype,
            param_dtype=base.param_dtype,
            is_continuous=base.is_continuous,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    base = property(lambda self: self._base)
    upper = property(lambda self: self._upper)

    def _batch_shape(self):
        return broadcast_shapes(
            self._base.batch_shape, jnp.shape(self._upper)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        # Independent base draw per batch element (see ZeroInflated).
        draws = _sample_extended_batch(
            self._base, key, n_samples, self.batch_shape
        )
        return jnp.minimum(draws, self._upper)

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        lp_event = self._base.log_prob(x)
        lp_censored = self._base.log_survival(self._upper)
        return jnp.where(x < self._upper, lp_event, lp_censored)


class BetaBinomial(Distribution):
    """Beta-binomial: overdispersed counts of successes in ``n`` trials.

    Beyond reference — the bounded-count analogue of
    :class:`NegativeBinomial` (the reference's Binomial cannot model
    extra-binomial variation)::

        pmf(x) = C(n, x) B(x + a, n - x + b) / B(a, b)

    Sampler: the exact mixture ``p ~ Beta(a, b)``, ``x ~ Binomial(n, p)``
    (both draws native JAX; the Binomial uses the same O(1)-memory
    inversion/BTRS rejection path as the Binomial head).

    :param n_experiments: positive Python int trial count.
    :param alpha: positive Beta pseudo-count of successes.
    :param beta: positive Beta pseudo-count of failures (broadcastable
        against ``alpha``).
    """

    def __init__(self, n_experiments, alpha, beta, dtype=jnp.int32,
                 group_ndims: int = 0, check_numerics=False, **kwargs):
        param_dtype = assert_same_float_dtype(
            [(alpha, "alpha"), (beta, "beta")]
        )
        if not isinstance(n_experiments, (int, np.integer)) or \
                isinstance(n_experiments, bool) or n_experiments < 1:
            raise ValueError(
                "n_experiments must be a positive int; got {!r}.".format(
                    n_experiments)
            )
        self._n_experiments = int(n_experiments)
        self._alpha = jnp.asarray(alpha, param_dtype)
        self._beta = jnp.asarray(beta, param_dtype)
        self._check_numerics = check_numerics
        broadcast_shapes(jnp.shape(self._alpha), jnp.shape(self._beta))
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    n_experiments = property(lambda self: self._n_experiments)
    alpha = property(lambda self: self._alpha)
    beta = property(lambda self: self._beta)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._alpha), jnp.shape(self._beta)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        a = jax.lax.stop_gradient(self._alpha)
        b = jax.lax.stop_gradient(self._beta)
        shape = (n_samples,) + self.batch_shape
        kp, kx = jax.random.split(key)
        p = jax.random.beta(
            kp, jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape),
            dtype=self.param_dtype,
        )
        draw = jax.random.binomial(
            kx, jnp.asarray(self._n_experiments, self.param_dtype), p,
            dtype=self.param_dtype,
        )
        return draw.astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        a, b = self._alpha, self._beta
        n = jnp.asarray(self._n_experiments, self.param_dtype)

        def lbeta(u, v):
            return (jax.lax.lgamma(u) + jax.lax.lgamma(v)
                    - jax.lax.lgamma(u + v))

        log_comb = (
            jax.lax.lgamma(n + 1.0)
            - jax.lax.lgamma(x + 1.0)
            - jax.lax.lgamma(n - x + 1.0)
        )
        if self._check_numerics:
            log_comb = check_numerics(log_comb, "log_combination")
        return log_comb + lbeta(x + a, n - x + b) - lbeta(a, b)


class VonMises(Distribution):
    """Von Mises (circular normal) on ``(-pi, pi]``.

    Beyond reference — the standard head for angular/phase data::

        pdf(x) = exp(kappa cos(x - loc)) / (2 pi I0(kappa))

    Sampler: Best & Fisher (1979) wrapped-Cauchy rejection, vectorized
    as one chain-masked ``lax.while_loop`` (bounded in expectation at
    < 1.4 proposals per draw for any ``kappa``); gradient-stopped (use
    the density for parameter learning).

    :param loc: mean direction (radians), any float shape.
    :param concentration: ``kappa > 0``, broadcastable against it.
    """

    def __init__(self, loc, concentration, group_ndims=0,
                 check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype(
            [(loc, "loc"), (concentration, "concentration")]
        )
        self._loc = jnp.asarray(loc, dtype)
        self._concentration = jnp.asarray(concentration, dtype)
        self._check_numerics = check_numerics
        broadcast_shapes(
            jnp.shape(self._loc), jnp.shape(self._concentration)
        )
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    loc = property(lambda self: self._loc)
    concentration = property(lambda self: self._concentration)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._loc), jnp.shape(self._concentration)
        )

    def _value_shape(self):
        return ()

    def _sample(self, key, n_samples):
        loc = jax.lax.stop_gradient(self._loc)
        kappa = jax.lax.stop_gradient(self._concentration)
        shape = (n_samples,) + self.batch_shape
        dtype = self.param_dtype
        kappa_b = jnp.broadcast_to(kappa, shape)
        # Best-Fisher: envelope parameters from kappa.
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa_b * kappa_b)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa_b)
        r = (1.0 + rho * rho) / (2.0 * rho)

        def cond(val):
            _, accepted, _ = val
            return jnp.logical_not(jnp.all(accepted))

        def body(val):
            draw, accepted, k = val
            k, k1, k2, k3 = jax.random.split(k, 4)
            u1 = open_interval_standard_uniform(k1, shape, dtype)
            u2 = open_interval_standard_uniform(k2, shape, dtype)
            u3 = open_interval_standard_uniform(k3, shape, dtype)
            z = jnp.cos(jnp.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c = kappa_b * (r - f)
            ok = jnp.logical_or(
                c * (2.0 - c) - u2 > 0.0,
                jnp.log(c / u2) + 1.0 - c >= 0.0,
            )
            angle = jnp.where(u3 > 0.5, jnp.arccos(f), -jnp.arccos(f))
            newly = jnp.logical_and(ok, jnp.logical_not(accepted))
            draw = jnp.where(newly, angle, draw)
            return draw, jnp.logical_or(accepted, ok), k

        draw0 = jnp.zeros(shape, dtype)
        draw, _, _ = jax.lax.while_loop(
            cond, body, (draw0, jnp.zeros(shape, bool), key)
        )
        # Shift by loc and wrap back to (-pi, pi].
        out = draw + loc
        return out - 2.0 * jnp.pi * jnp.round(out / (2.0 * jnp.pi))

    def _log_prob(self, given):
        loc = self.path_param(self._loc)
        kappa = self.path_param(self._concentration)
        log_i0 = jnp.log(jax.scipy.special.i0e(kappa)) + kappa
        if self._check_numerics:
            log_i0 = check_numerics(log_i0, "log(I0(kappa))")
        return (
            kappa * jnp.cos(given - loc)
            - jnp.log(2.0 * jnp.asarray(jnp.pi, self.param_dtype))
            - log_i0
        )
