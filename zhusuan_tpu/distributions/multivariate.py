"""Multivariate distributions.

Capability parity with reference ``zhusuan/distributions/multivariate.py``
(12 classes, multivariate.py:25-38). Citations per class document the
reference parameterization/sampler/density.

TPU-native notes: Cholesky-parameterized Gaussians ride the MXU via batched
``L @ eps`` matmuls and XLA's fused batched ``triangular_solve``; simplex
distributions use native ``jax.random`` samplers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution
from zhusuan_tpu.distributions.univariate import _DIRECT_SAMPLE_MAX_N
from zhusuan_tpu.distributions.utils import (
    assert_same_float_dtype,
    broadcast_shapes,
    log_combination,
    open_interval_standard_uniform,
)
from zhusuan_tpu.ops.checks import check_numerics

__all__ = [
    "MultivariateNormalCholesky",
    "Multinomial",
    "UnnormalizedMultinomial",
    "BagofCategoricals",
    "OnehotCategorical",
    "OnehotDiscrete",
    "Dirichlet",
    "ExpConcrete",
    "ExpGumbelSoftmax",
    "Concrete",
    "GumbelSoftmax",
    "MatrixVariateNormalCholesky",
    "MultivariateStudentTCholesky",
]

_LOG_2PI = float(np.log(2.0) + np.log(np.pi))


class MultivariateNormalCholesky(Distribution):
    """Multivariate Normal parameterized by mean and Cholesky factor of the
    covariance.

    Parity: reference ``multivariate.py:41-192``. ``mean``: ``[..., d]``;
    ``cov_tril``: ``[..., d, d]`` lower-triangular. Sampler ``mean + L @ eps``
    (multivariate.py:145-167, a batched MXU matmul here); density via a
    batched triangular solve with ``logdet = 2*sum(log(diag(L)))``
    (multivariate.py:169-189). Reparameterized.

    Own-sample fast path caveats: ``sample()`` caches (sample, eps) on the
    instance so ``log_prob`` of the distribution's OWN latest sample skips
    the triangular solve (exact value/gradients; see :meth:`log_prob`).
    The cache is SINGLE-LIVE-SAMPLE (a second ``sample()`` call evicts the
    first sample's fast path — it then takes the solve path, which is
    exact too), is not thread-safe under concurrent traces of the same
    instance, and retains the last trace's arrays until the next call
    (harmless, but visible to ``jax.check_tracer_leaks`` debug mode).
    Every cache miss falls back to the exact solve path, so behavior is
    always correct — only the shortcut is affected.

    :param cov_tril_inv: optional precomputed ``L^{-1}`` with the same
        shape as ``cov_tril`` (e.g. from
        :func:`zhusuan_tpu.ops.linalg.cholesky_inverse`). When given,
        ``log_prob`` whitens by an MXU matmul (full f32 accumulation)
        instead of a blocked triangular solve — the latency cure for
        small-``d`` pipelines that already factorize the covariance
        (sparse GPs). Values/gradients match the solve path to f32
        round-off; the caller is responsible for ``cov_tril_inv``
        actually inverting ``cov_tril``.
    """

    def __init__(
        self,
        mean,
        cov_tril,
        group_ndims: int = 0,
        is_reparameterized: bool = True,
        use_path_derivative: bool = False,
        check_numerics: bool = False,
        cov_tril_inv=None,
        **kwargs,
    ):
        dtype = assert_same_float_dtype([(mean, "mean"), (cov_tril, "cov_tril")])
        self._mean = jnp.asarray(mean, dtype)
        self._cov_tril = jnp.asarray(cov_tril, dtype)
        if self._mean.ndim < 1:
            raise ValueError("mean must be at least 1-D ([..., d]).")
        if self._cov_tril.ndim < 2:
            raise ValueError("cov_tril must be at least 2-D ([..., d, d]).")
        d = self._mean.shape[-1]
        if self._cov_tril.shape[-2:] != (d, d):
            raise ValueError(
                "cov_tril trailing dims must be [d, d] with d matching mean "
                "({} vs. {}).".format(self._cov_tril.shape, self._mean.shape)
            )
        self._n_dim = d
        self._check_numerics = check_numerics
        if cov_tril_inv is not None:
            cov_tril_inv = jnp.asarray(cov_tril_inv, dtype)
            if cov_tril_inv.shape != self._cov_tril.shape:
                raise ValueError(
                    "cov_tril_inv must match cov_tril's shape ({} vs. "
                    "{}).".format(cov_tril_inv.shape, self._cov_tril.shape)
                )
        self._cov_tril_inv = cov_tril_inv
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            group_ndims=group_ndims,
            **kwargs,
        )

    mean = property(lambda self: self._mean)
    cov_tril = property(lambda self: self._cov_tril)

    def _batch_shape(self):
        return broadcast_shapes(
            self._mean.shape[:-1], self._cov_tril.shape[:-2]
        )

    def _value_shape(self):
        return (self._n_dim,)

    def _sample(self, key, n_samples):
        mean, cov_tril = self._mean, self._cov_tril
        if not self.is_reparameterized:
            mean = jax.lax.stop_gradient(mean)
            cov_tril = jax.lax.stop_gradient(cov_tril)
        shape = (n_samples,) + self.batch_shape + (self._n_dim,)
        eps = jax.random.normal(key, shape, dtype=self.dtype)
        self._pending_eps = eps
        # [..., d, d] @ [..., d, 1] -> [..., d]; batched over chains on MXU.
        transformed = jnp.squeeze(
            jnp.matmul(cov_tril, eps[..., None]), axis=-1
        )
        return mean + transformed

    def sample(self, key, n_samples=None):
        self._pending_eps = None
        out = super().sample(key, n_samples)
        eps = self._pending_eps
        if eps is not None and n_samples is None:
            eps = jnp.squeeze(eps, axis=0)
        # Cache (sample, its white noise) so scoring the distribution's OWN
        # reparameterized sample — the ubiquitous q-entropy term of every
        # variational objective — can skip the triangular solve (see
        # log_prob). Identity-checked, so it can only hit within the same
        # trace that drew the sample.
        self._own_sample = out
        self._own_eps = eps
        return out

    def log_prob(self, given):
        """Log density; when ``given`` IS this object's own reparameterized
        sample (object identity), uses ``L^{-1}(z - mean) == eps`` to score
        as ``-||eps||^2/2 - sum(log diag L) - d/2 log 2pi`` with no
        triangular solve. Values agree exactly; gradients agree too because
        with ``z = mean + L eps`` substituted symbolically, eps carries no
        parameter dependence (the path term absorbs the score term — the
        standard reparameterized-entropy identity). The identity holds on
        the lower-triangular manifold: gradients wrt the strictly-upper
        entries of ``cov_tril`` (ignored by the density, masked by any
        ``jnp.tril`` parameterization) are 0 here, where the solve path
        leaks a spurious sampling-path term. Falls back to the solve
        path for observed values, non-reparameterized samples, and
        ``use_path_derivative`` (STL stops params only in scoring, so the
        substitution does not hold there).
        """
        if (
            given is getattr(self, "_own_sample", None)
            and self._own_eps is not None
            and self.is_reparameterized
            and not self.use_path_derivative
        ):
            eps = self._own_eps
            log_diag = jnp.log(
                jnp.diagonal(self._cov_tril, axis1=-2, axis2=-1)
            )
            log_diag = check_numerics(
                log_diag, "log(diag(cov_tril))", self._check_numerics
            )
            log_det = 2.0 * jnp.sum(log_diag, axis=-1)
            maha = jnp.sum(eps * eps, axis=-1)
            lp = -0.5 * (self._n_dim * _LOG_2PI + maha + log_det)
            return self._reduce_group(lp, jnp.sum)
        return super().log_prob(given)

    def _log_prob(self, given):
        mean = self.path_param(self._mean)
        cov_tril = self.path_param(self._cov_tril)
        log_diag = jnp.log(jnp.diagonal(cov_tril, axis1=-2, axis2=-1))
        log_diag = check_numerics(log_diag, "log(diag(cov_tril))", self._check_numerics)
        log_det = 2.0 * jnp.sum(log_diag, axis=-1)
        y = given - mean
        target_shape = jnp.broadcast_shapes(
            jnp.shape(y), self.batch_shape + (self._n_dim,)
        )
        y = jnp.broadcast_to(y, target_shape)
        if self._cov_tril_inv is not None:
            # Whiten by the precomputed inverse factor: one MXU matmul
            # (full f32 accumulation — bf16 default precision would leak
            # O(2^-8) noise into Hamiltonians/ELBOs) instead of a blocked
            # triangular solve.
            linv = self.path_param(self._cov_tril_inv)
            z = jnp.matmul(linv, y[..., None], precision="highest")
        else:
            # Solve L z = y for z; Mahalanobis = ||z||^2. Batched
            # triangular solve — XLA lowers this to a blocked routine.
            z = jax.scipy.linalg.solve_triangular(
                jnp.broadcast_to(
                    cov_tril,
                    target_shape[:-1] + (self._n_dim, self._n_dim),
                ),
                y[..., None],
                lower=True,
            )
        maha = jnp.sum(jnp.squeeze(z, axis=-1) ** 2, axis=-1)
        return -0.5 * (self._n_dim * _LOG_2PI + maha + log_det)


class Multinomial(Distribution):
    """Multinomial counts over K categories.

    Parity: reference ``multivariate.py:195-336``. ``logits``: ``[..., K]``
    unnormalized log-probabilities; ``n_experiments``: positive int, or None
    meaning sampling is unsupported and the trial count is inferred from
    ``given`` at scoring time (multivariate.py:207-213,327-330).
    ``normalize_logits`` subtracts the logsumexp (multivariate.py:324-326);
    density adds ``log_combination`` (multivariate.py:331-333).

    Beyond reference: ``n_experiments`` may also be a 0-D integer array /
    traced scalar — both scoring and sampling work (the trial count only
    affects sample *values*, so shapes stay static). Sampling with a
    traced or large static ``n`` uses the conditional-binomial
    decomposition (``jax.random.multinomial``: K sequential binomial
    splits, each a stateless inversion/BTRS rejection draw) instead of
    materializing the O(n) per-trial categorical buffer.
    """

    def __init__(
        self,
        logits,
        n_experiments: Optional[int],
        normalize_logits: bool = True,
        dtype=jnp.int32,
        group_ndims: int = 0,
        **kwargs,
    ):
        param_dtype = assert_same_float_dtype([(logits, "logits")])
        self._logits = jnp.asarray(logits, param_dtype)
        if self._logits.ndim < 1:
            raise ValueError("logits must be at least 1-D (..., n_categories).")
        self._n_categories = self._logits.shape[-1]
        if n_experiments is None:
            pass
        elif isinstance(n_experiments, (int, np.integer)) and not isinstance(
            n_experiments, bool
        ):
            if n_experiments < 1:
                raise ValueError(
                    "n_experiments must be None or a positive int; got "
                    "{!r}.".format(n_experiments)
                )
            n_experiments = int(n_experiments)
        elif hasattr(n_experiments, "ndim") and hasattr(n_experiments, "dtype"):
            if n_experiments.ndim != 0:
                raise ValueError(
                    "n_experiments should be a scalar (0-D array)."
                )
            if not jnp.issubdtype(n_experiments.dtype, jnp.integer):
                raise ValueError("n_experiments must be an int scalar.")
            # Tensor mode: positivity can't be checked at trace time.
        else:
            raise ValueError(
                "n_experiments must be None, a positive int, or a 0-D int "
                "array; got {!r}.".format(n_experiments)
            )
        self._n_experiments = n_experiments
        self._normalize_logits = normalize_logits
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    logits = property(lambda self: self._logits)
    n_categories = property(lambda self: self._n_categories)
    n_experiments = property(lambda self: self._n_experiments)

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        if self._n_experiments is None:
            raise ValueError(
                "Cannot sample when `n_experiments` is None (parity with "
                "reference multivariate.py:327-330)."
            )
        logits = jax.lax.stop_gradient(self._logits)
        n = self._n_experiments
        if isinstance(n, int) and n <= _DIRECT_SAMPLE_MAX_N:
            draw_shape = (n_samples, n) + self.batch_shape
            cats = jax.random.categorical(
                key, logits, axis=-1, shape=draw_shape
            )
            counts = jnp.sum(
                jax.nn.one_hot(
                    cats, self._n_categories, dtype=self.param_dtype
                ),
                axis=1,
            )
            return counts.astype(self.dtype)
        # Traced 0-D n, or large static n: conditional-binomial splits —
        # O(K) memory instead of O(n) (see class docstring).
        counts = jax.random.multinomial(
            key,
            jnp.asarray(n, self.param_dtype),
            jax.nn.softmax(logits, axis=-1),
            shape=(n_samples,) + self.batch_shape + (self._n_categories,),
            dtype=self.param_dtype,
        )
        return counts.astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        logits = self._logits
        if self._normalize_logits:
            logits = logits - jax.scipy.special.logsumexp(
                logits, axis=-1, keepdims=True
            )
        if self._n_experiments is None:
            n = jnp.sum(x, axis=-1)
        else:
            n = jnp.asarray(self._n_experiments, self.param_dtype)
        return log_combination(n, x) + jnp.sum(x * logits, axis=-1)


class UnnormalizedMultinomial(Distribution):
    """Bag-of-categoricals scoring (multinomial without the coefficient).

    Parity: reference ``multivariate.py:339-449``. Sampling raises
    (multivariate.py:429-433); density is ``sum(given * logits)`` with
    optional logit normalization.
    """

    def __init__(
        self,
        logits,
        normalize_logits: bool = True,
        dtype=jnp.int32,
        group_ndims: int = 0,
        **kwargs,
    ):
        param_dtype = assert_same_float_dtype([(logits, "logits")])
        self._logits = jnp.asarray(logits, param_dtype)
        if self._logits.ndim < 1:
            raise ValueError("logits must be at least 1-D (..., n_categories).")
        self._n_categories = self._logits.shape[-1]
        self._normalize_logits = normalize_logits
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    logits = property(lambda self: self._logits)
    n_categories = property(lambda self: self._n_categories)

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        raise NotImplementedError(
            "UnnormalizedMultinomial distribution does not support sampling "
            "(parity with reference multivariate.py:429-433)."
        )

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        logits = self._logits
        if self._normalize_logits:
            logits = logits - jax.scipy.special.logsumexp(
                logits, axis=-1, keepdims=True
            )
        return jnp.sum(x * logits, axis=-1)


BagofCategoricals = UnnormalizedMultinomial


class OnehotCategorical(Distribution):
    """One-hot coded Categorical.

    Parity: reference ``multivariate.py:452-567``. Sampler: categorical draw
    then one-hot (multivariate.py:522-540); density
    ``sum(given * log_softmax(logits))`` (multivariate.py:542-561).
    """

    def __init__(self, logits, dtype=jnp.int32, group_ndims: int = 0, **kwargs):
        param_dtype = assert_same_float_dtype([(logits, "logits")])
        self._logits = jnp.asarray(logits, param_dtype)
        if self._logits.ndim < 1:
            raise ValueError("logits must be at least 1-D (..., n_categories).")
        self._n_categories = self._logits.shape[-1]
        super().__init__(
            dtype=np.dtype(dtype),
            param_dtype=param_dtype,
            is_continuous=False,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    logits = property(lambda self: self._logits)
    n_categories = property(lambda self: self._n_categories)

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        logits = jax.lax.stop_gradient(self._logits)
        cats = jax.random.categorical(
            key, logits, axis=-1, shape=(n_samples,) + self.batch_shape
        )
        return jax.nn.one_hot(cats, self._n_categories).astype(self.dtype)

    def _log_prob(self, given):
        x = jnp.asarray(given, self.param_dtype)
        log_p = jax.nn.log_softmax(self._logits, axis=-1)
        return jnp.sum(x * log_p, axis=-1)


OnehotDiscrete = OnehotCategorical


class Dirichlet(Distribution):
    """Dirichlet on the (K-1)-simplex.

    Parity: reference ``multivariate.py:570-680``. ``alpha``: ``[..., K]``,
    K >= 2 (multivariate.py:602-623). Sampler: normalized Gammas via the
    native ``jax.random.dirichlet`` (multivariate.py:660-663); density
    ``-lbeta(alpha) + sum((alpha-1)*log(x))`` (multivariate.py:665-677).

    Beyond reference: ``is_reparameterized=True`` samples through the
    normalized-Gamma construction with JAX's implicitly differentiable
    ``random.gamma`` (Figurnov et al. 2018), so SGVB trains Dirichlet
    posteriors (e.g. Dirichlet-VAE / LNTM document-topic latents)
    directly — the reference marked Dirichlet non-reparameterized.
    Default ``False`` for estimator parity.
    """

    def __init__(self, alpha, group_ndims: int = 0,
                 is_reparameterized: bool = False,
                 use_path_derivative: bool = False,
                 check_numerics=False, **kwargs):
        dtype = assert_same_float_dtype([(alpha, "alpha")])
        self._alpha = jnp.asarray(alpha, dtype)
        if self._alpha.ndim < 1:
            raise ValueError("alpha must be at least 1-D (..., n_categories).")
        self._n_categories = self._alpha.shape[-1]
        if self._n_categories < 2:
            raise ValueError(
                "n_categories (last axis of alpha) must be at least 2."
            )
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

    alpha = property(lambda self: self._alpha)
    n_categories = property(lambda self: self._n_categories)

    def _batch_shape(self):
        return self._alpha.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        shape = (n_samples,) + self.batch_shape + (self._n_categories,)
        if self.is_reparameterized:
            # Normalized-Gamma construction; random.gamma carries the
            # implicit reparameterization gradient w.r.t. alpha.
            g = jax.random.gamma(
                key, jnp.broadcast_to(self._alpha, shape), dtype=self.dtype
            )
            return g / jnp.sum(g, axis=-1, keepdims=True)
        alpha = jax.lax.stop_gradient(self._alpha)
        return jax.random.dirichlet(
            key, jnp.broadcast_to(alpha, shape), dtype=self.dtype
        )

    def _log_prob(self, given):
        alpha = self.path_param(self._alpha)
        lbeta = jnp.sum(jax.lax.lgamma(alpha), axis=-1) - jax.lax.lgamma(
            jnp.sum(alpha, axis=-1)
        )
        log_given = jnp.log(given)
        if self._check_numerics:
            log_given = check_numerics(log_given, "log(given)")
            lbeta = check_numerics(lbeta, "lbeta(alpha)")
        return jnp.sum((alpha - 1.0) * log_given, axis=-1) - lbeta


class ExpConcrete(Distribution):
    """ExpConcrete (Maddison et al. 2017) — log-space Concrete, values in
    log-simplex coordinates (non-positive, logsumexp = 0).

    Parity: reference ``multivariate.py:683-817``. Sampler:
    ``log_softmax((logits + Gumbel) / temperature)``
    (multivariate.py:781-795); density with ``t = logits - temperature*y``:
    ``lgamma(K) + (K-1)*log(temperature) + sum(t) - K*logsumexp(t)``
    (multivariate.py:797-811). Reparameterized; supports path derivatives.
    """

    def __init__(
        self,
        temperature,
        logits,
        group_ndims: int = 0,
        is_reparameterized: bool = True,
        use_path_derivative: bool = False,
        check_numerics: bool = False,
        **kwargs,
    ):
        dtype = assert_same_float_dtype(
            [(temperature, "temperature"), (logits, "logits")]
        )
        self._temperature = jnp.asarray(temperature, dtype)
        self._logits = jnp.asarray(logits, dtype)
        if self._temperature.ndim != 0:
            raise ValueError("temperature must be a scalar.")
        if self._logits.ndim < 1:
            raise ValueError("logits must be at least 1-D (..., n_categories).")
        self._n_categories = self._logits.shape[-1]
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

    temperature = property(lambda self: self._temperature)
    logits = property(lambda self: self._logits)
    n_categories = property(lambda self: self._n_categories)

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        logits, temperature = self._logits, self._temperature
        if not self.is_reparameterized:
            logits = jax.lax.stop_gradient(logits)
            temperature = jax.lax.stop_gradient(temperature)
        shape = (n_samples,) + self.batch_shape + (self._n_categories,)
        u = open_interval_standard_uniform(key, shape, self.dtype)
        gumbel = -jnp.log(-jnp.log(u))
        return jax.nn.log_softmax((logits + gumbel) / temperature, axis=-1)

    def _log_prob(self, given):
        temperature = self.path_param(self._temperature)
        logits = self.path_param(self._logits)
        n = self._n_categories
        log_temperature = jnp.log(temperature)
        if self._check_numerics:
            log_temperature = check_numerics(log_temperature, "log(temperature)")
        t = logits - temperature * given
        return (
            jax.lax.lgamma(jnp.asarray(float(n), self.param_dtype))
            + (n - 1) * log_temperature
            + jnp.sum(t, axis=-1)
            - n * jax.scipy.special.logsumexp(t, axis=-1)
        )


ExpGumbelSoftmax = ExpConcrete


class Concrete(Distribution):
    """Concrete / Gumbel-Softmax on the open simplex.

    Parity: reference ``multivariate.py:820-958``. Sampler:
    ``softmax((logits + Gumbel) / temperature)`` (multivariate.py:919-934);
    density on the simplex with ``t = logits - (temperature+1)*log(x)`` ...
    precisely: ``lgamma(K) + (K-1)*log(temperature)
    + sum(logits - (temperature+1)*log(x))
    - K*logsumexp(logits - temperature*log(x))`` (multivariate.py:936-952).
    """

    def __init__(
        self,
        temperature,
        logits,
        group_ndims: int = 0,
        is_reparameterized: bool = True,
        use_path_derivative: bool = False,
        check_numerics: bool = False,
        **kwargs,
    ):
        dtype = assert_same_float_dtype(
            [(temperature, "temperature"), (logits, "logits")]
        )
        self._temperature = jnp.asarray(temperature, dtype)
        self._logits = jnp.asarray(logits, dtype)
        if self._temperature.ndim != 0:
            raise ValueError("temperature must be a scalar.")
        if self._logits.ndim < 1:
            raise ValueError("logits must be at least 1-D (..., n_categories).")
        self._n_categories = self._logits.shape[-1]
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

    temperature = property(lambda self: self._temperature)
    logits = property(lambda self: self._logits)
    n_categories = property(lambda self: self._n_categories)

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _value_shape(self):
        return (self._n_categories,)

    def _sample(self, key, n_samples):
        logits, temperature = self._logits, self._temperature
        if not self.is_reparameterized:
            logits = jax.lax.stop_gradient(logits)
            temperature = jax.lax.stop_gradient(temperature)
        shape = (n_samples,) + self.batch_shape + (self._n_categories,)
        u = open_interval_standard_uniform(key, shape, self.dtype)
        gumbel = -jnp.log(-jnp.log(u))
        return jax.nn.softmax((logits + gumbel) / temperature, axis=-1)

    def _log_prob(self, given):
        temperature = self.path_param(self._temperature)
        logits = self.path_param(self._logits)
        n = self._n_categories
        log_given = jnp.log(given)
        log_temperature = jnp.log(temperature)
        if self._check_numerics:
            log_given = check_numerics(log_given, "log(given)")
            log_temperature = check_numerics(log_temperature, "log(temperature)")
        t = logits - temperature * log_given
        return (
            jax.lax.lgamma(jnp.asarray(float(n), self.param_dtype))
            + (n - 1) * log_temperature
            + jnp.sum(t - log_given, axis=-1)
            - n * jax.scipy.special.logsumexp(t, axis=-1)
        )


GumbelSoftmax = Concrete


class MatrixVariateNormalCholesky(Distribution):
    """Matrix-variate Normal with Cholesky-factored row and column
    covariances.

    Parity: reference ``multivariate.py:961-1160``. ``mean``: ``[..., n, m]``;
    ``u_tril``: ``[..., n, n]`` (row cov Cholesky); ``v_tril``: ``[..., m, m]``
    (column cov Cholesky). Sampler ``mean + Lu @ eps @ Lv^T``
    (multivariate.py:1099-1122); density via two batched triangular solves
    (multivariate.py:1124-1157). Reparameterized.
    """

    def __init__(
        self,
        mean,
        u_tril,
        v_tril,
        group_ndims: int = 0,
        is_reparameterized: bool = True,
        use_path_derivative: bool = False,
        check_numerics: bool = False,
        **kwargs,
    ):
        dtype = assert_same_float_dtype(
            [(mean, "mean"), (u_tril, "u_tril"), (v_tril, "v_tril")]
        )
        self._mean = jnp.asarray(mean, dtype)
        self._u_tril = jnp.asarray(u_tril, dtype)
        self._v_tril = jnp.asarray(v_tril, dtype)
        if self._mean.ndim < 2:
            raise ValueError("mean must be at least 2-D ([..., n, m]).")
        n, m = self._mean.shape[-2:]
        if self._u_tril.shape[-2:] != (n, n):
            raise ValueError(
                "u_tril trailing dims must be [n, n] matching mean rows "
                "({} vs. {}).".format(self._u_tril.shape, self._mean.shape)
            )
        if self._v_tril.shape[-2:] != (m, m):
            raise ValueError(
                "v_tril trailing dims must be [m, m] matching mean cols "
                "({} vs. {}).".format(self._v_tril.shape, self._mean.shape)
            )
        self._n_row, self._n_col = n, m
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

    mean = property(lambda self: self._mean)
    u_tril = property(lambda self: self._u_tril)
    v_tril = property(lambda self: self._v_tril)

    def _batch_shape(self):
        return broadcast_shapes(
            self._mean.shape[:-2],
            self._u_tril.shape[:-2],
            self._v_tril.shape[:-2],
        )

    def _value_shape(self):
        return (self._n_row, self._n_col)

    def _sample(self, key, n_samples):
        mean, u_tril, v_tril = self._mean, self._u_tril, self._v_tril
        if not self.is_reparameterized:
            mean = jax.lax.stop_gradient(mean)
            u_tril = jax.lax.stop_gradient(u_tril)
            v_tril = jax.lax.stop_gradient(v_tril)
        shape = (n_samples,) + self.batch_shape + (self._n_row, self._n_col)
        eps = jax.random.normal(key, shape, dtype=self.dtype)
        return mean + u_tril @ eps @ jnp.swapaxes(v_tril, -1, -2)

    def _log_prob(self, given):
        mean = self.path_param(self._mean)
        u_tril = self.path_param(self._u_tril)
        v_tril = self.path_param(self._v_tril)
        n, m = self._n_row, self._n_col
        log_det_u = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(u_tril, axis1=-2, axis2=-1)), axis=-1
        )
        log_det_v = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(v_tril, axis1=-2, axis2=-1)), axis=-1
        )
        if self._check_numerics:
            log_det_u = check_numerics(log_det_u, "log_det(u_tril)")
            log_det_v = check_numerics(log_det_v, "log_det(v_tril)")
        y = given - mean
        target_shape = jnp.broadcast_shapes(
            jnp.shape(y), self.batch_shape + (n, m)
        )
        y = jnp.broadcast_to(y, target_shape)
        u_b = jnp.broadcast_to(u_tril, target_shape[:-2] + (n, n))
        v_b = jnp.broadcast_to(v_tril, target_shape[:-2] + (m, m))
        # z = Lu^{-1} (X - M) Lv^{-T}; Frobenius norm gives the Mahalanobis
        # term. Two batched triangular solves (XLA fuses these on TPU).
        z = jax.scipy.linalg.solve_triangular(u_b, y, lower=True)
        z = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(
                v_b, jnp.swapaxes(z, -1, -2), lower=True
            ),
            -1,
            -2,
        )
        maha = jnp.sum(z ** 2, axis=(-1, -2))
        return -0.5 * (
            n * m * _LOG_2PI + maha
        ) - 0.5 * (m * log_det_u + n * log_det_v)


class MultivariateStudentTCholesky(Distribution):
    """Multivariate Student's t parameterized by df, location and the
    Cholesky factor of the scale matrix.

    Beyond reference — the robust (heavy-tailed) counterpart of
    :class:`MultivariateNormalCholesky` (same ``[..., d]`` loc /
    ``[..., d, d]`` lower-triangular layout and MXU-shaped linear
    algebra)::

        pdf(x) = G((v+d)/2) / [G(v/2) (v pi)^{d/2} |L|]
                 * (1 + maha(x)/v)^{-(v+d)/2}

    Sampler: ``loc + (L z) * sqrt(v / g)`` with ``z ~ N(0, I)``,
    ``g ~ chi2(v)`` — reparameterized in loc/scale (the df is
    gradient-stopped; its density gradient remains exact).

    :param df: degrees of freedom ``v > 0``, broadcastable over the
        batch shape.
    :param loc: ``[..., d]`` location.
    :param scale_tril: ``[..., d, d]`` lower-triangular scale factor.
    """

    def __init__(
        self,
        df,
        loc,
        scale_tril,
        group_ndims: int = 0,
        is_reparameterized: bool = True,
        use_path_derivative: bool = False,
        check_numerics: bool = False,
        **kwargs,
    ):
        dtype = assert_same_float_dtype(
            [(df, "df"), (loc, "loc"), (scale_tril, "scale_tril")]
        )
        self._df = jnp.asarray(df, dtype)
        self._loc = jnp.asarray(loc, dtype)
        self._scale_tril = jnp.asarray(scale_tril, dtype)
        if self._loc.ndim < 1:
            raise ValueError("loc must be at least 1-D ([..., d]).")
        if self._scale_tril.ndim < 2:
            raise ValueError(
                "scale_tril must be at least 2-D ([..., d, d])."
            )
        d = self._loc.shape[-1]
        if self._scale_tril.shape[-2:] != (d, d):
            raise ValueError(
                "scale_tril trailing dims must be [d, d] with d matching "
                "loc ({} vs. {}).".format(
                    self._scale_tril.shape, self._loc.shape
                )
            )
        self._n_dim = d
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

    df = property(lambda self: self._df)
    loc = property(lambda self: self._loc)
    scale_tril = property(lambda self: self._scale_tril)

    def _batch_shape(self):
        return broadcast_shapes(
            jnp.shape(self._df),
            self._loc.shape[:-1],
            self._scale_tril.shape[:-2],
        )

    def _value_shape(self):
        return (self._n_dim,)

    def _sample(self, key, n_samples):
        loc, scale_tril = self._loc, self._scale_tril
        if not self.is_reparameterized:
            loc = jax.lax.stop_gradient(loc)
            scale_tril = jax.lax.stop_gradient(scale_tril)
        df = jax.lax.stop_gradient(self._df)
        shape = (n_samples,) + self.batch_shape + (self._n_dim,)
        kz, kg = jax.random.split(key)
        z = jax.random.normal(kz, shape, dtype=self.dtype)
        gauss = jnp.squeeze(
            jnp.matmul(scale_tril, z[..., None]), axis=-1
        )
        half_df = jnp.broadcast_to(0.5 * df, shape[:-1])
        g = 2.0 * jax.random.gamma(kg, half_df, dtype=self.dtype)
        return loc + gauss * jnp.sqrt(df / g)[..., None]

    def _log_prob(self, given):
        df = self.path_param(self._df)
        loc = self.path_param(self._loc)
        scale_tril = self.path_param(self._scale_tril)
        d = self._n_dim
        log_diag = jnp.log(
            jnp.diagonal(scale_tril, axis1=-2, axis2=-1)
        )
        log_diag = check_numerics(
            log_diag, "log(diag(scale_tril))", self._check_numerics
        )
        half_log_det = jnp.sum(log_diag, axis=-1)
        y = given - loc
        target_shape = jnp.broadcast_shapes(
            jnp.shape(y), self.batch_shape + (d,)
        )
        y = jnp.broadcast_to(y, target_shape)
        z = jax.scipy.linalg.solve_triangular(
            jnp.broadcast_to(scale_tril, target_shape[:-1] + (d, d)),
            y[..., None],
            lower=True,
        )
        maha = jnp.sum(jnp.squeeze(z, axis=-1) ** 2, axis=-1)
        half = jnp.asarray(0.5, self.param_dtype)
        return (
            jax.lax.lgamma(half * (df + d))
            - jax.lax.lgamma(half * df)
            - half * d * jnp.log(df * jnp.pi)
            - half_log_det
            - half * (df + d) * jnp.log1p(maha / df)
        )
