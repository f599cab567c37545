"""Wishart distribution over positive-definite matrices.

Beyond the reference: the conjugate prior for multivariate-normal
precision matrices (the reference zoo has InverseGamma for scalar
variances and MatrixVariateNormal, but no PD-matrix law). Together with
:class:`~zhusuan_tpu.distributions.LKJCholesky` this completes the
covariance-modeling toolbox.

Sampler: the Bartlett decomposition — ``W = L A A^T L^T`` with ``L`` the
scale's Cholesky and ``A`` lower-triangular with
``A_ii = sqrt(chi2(df - i))``, ``A_ij ~ N(0, 1)`` for ``i > j`` — all
batched draws plus two triangular matmuls, no per-sample loops.

Density (for PD ``X``, ``df >= d``):
``log p(X) = ((df - d - 1)/2) logdet X - tr(S^{-1} X)/2
- (df d/2) log 2 - (df/2) logdet S - log Gamma_d(df/2)``,
verified against ``scipy.stats.wishart`` in
tests/distributions/test_wishart.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution
from zhusuan_tpu.distributions.utils import assert_same_float_dtype

__all__ = ["Wishart"]


class Wishart(Distribution):
    """Wishart ``W(df, scale)`` over ``[d, d]`` positive-definite matrices.

    :param df: degrees of freedom (scalar, must satisfy ``df >= d``;
        a Python number or 0-d array — it parameterizes chi-square shapes,
        so it is trace-static).
    :param scale: ``[d, d]`` positive-definite scale matrix ``S``
        (``E[W] = df * S``).
    :param group_ndims: trailing batch axes to sum in ``log_prob``.
    """

    def __init__(self, df, scale, group_ndims: int = 0, **kwargs):
        dtype = assert_same_float_dtype([(scale, "scale")])
        self._scale = jnp.asarray(scale, dtype)
        if self._scale.ndim != 2 or (
            self._scale.shape[0] != self._scale.shape[1]
        ):
            raise ValueError(
                "scale must be a square [d, d] matrix; got shape {}."
                .format(self._scale.shape)
            )
        d = self._scale.shape[0]
        df_f = float(df)
        if df_f < d:
            raise ValueError(
                "df ({}) must be >= the matrix dimension ({}).".format(
                    df_f, d)
            )
        self._df = df_f
        self._d = d
        # Cholesky once at construction; NaNs here surface immediately in
        # any sample/log_prob rather than deep inside a scan.
        self._chol = jnp.linalg.cholesky(self._scale)
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    df = property(lambda self: self._df)
    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return ()

    def _value_shape(self):
        return (self._d, self._d)

    def _sample(self, key, n_samples):
        d, df = self._d, self._df
        k_diag, k_off = jax.random.split(key)
        # Bartlett: A_ii^2 ~ chi2(df - i) = Gamma((df-i)/2, scale 2).
        shapes = jnp.asarray(
            [(df - i) / 2.0 for i in range(d)], self.dtype
        )
        g = jax.random.gamma(
            k_diag, jnp.broadcast_to(shapes, (n_samples, d)), dtype=self.dtype
        )
        diag = jnp.sqrt(2.0 * g)
        off = jax.random.normal(k_off, (n_samples, d, d), self.dtype)
        tril = jnp.tril(off, k=-1)
        a = tril + jax.vmap(jnp.diag)(diag)
        la = jnp.einsum("ij,njk->nik", self._chol, a)
        return jnp.einsum("nik,njk->nij", la, la)

    def _log_prob(self, given):
        d = self._d
        df = jnp.asarray(self._df, self.param_dtype)
        x = jnp.asarray(given, self.param_dtype)
        chol_x = jnp.linalg.cholesky(x)
        logdet_x = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol_x, axis1=-2, axis2=-1)), axis=-1
        )
        # tr(S^{-1} X) = ||L^{-1} C||_F^2 with X = C C^T.
        flat = chol_x.reshape((-1, d, d))
        solved = jax.vmap(
            lambda c: jax.scipy.linalg.solve_triangular(
                self._chol, c, lower=True
            )
        )(flat)
        trace = jnp.sum(solved * solved, axis=(-2, -1)).reshape(
            x.shape[:-2]
        )
        logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self._chol)))
        lp = (
            0.5 * (df - d - 1.0) * logdet_x
            - 0.5 * trace
            - 0.5 * df * d * float(np.log(2.0))
            - 0.5 * df * logdet_s
            - jax.scipy.special.multigammaln(0.5 * df, d)
        )
        # Outside the PD cone the Cholesky is NaN: score -inf like the
        # rest of the zoo's support semantics.
        finite = jnp.all(
            jnp.isfinite(
                jnp.diagonal(chol_x, axis1=-2, axis2=-1)
            ), axis=-1,
        )
        return jnp.where(
            finite, lp, jnp.asarray(-jnp.inf, self.param_dtype)
        )
