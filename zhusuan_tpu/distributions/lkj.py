"""LKJ correlation-Cholesky prior (Lewandowski, Kurowicka & Joe 2009).

Beyond the reference: the standard prior over correlation matrices for
hierarchical covariance models (the reference zoo stops at
MatrixVariateNormalCholesky). ``LKJCholesky(d, eta)`` is a distribution
over LOWER Cholesky factors ``L`` of correlation matrices
(``C = L @ L.T``, unit diagonal), with density
``p(C) ∝ det(C)^(eta-1)``.

Construction (the C-vine / canonical-partial-correlation form used by
Stan): the free coordinates are CPCs ``z_ij`` (one per strictly-lower
entry), independently ``2*Beta(a_j, a_j) - 1`` with column-wise
``a_j = eta + (d - 2 - j)/2`` (0-indexed column ``j``); rows of ``L``
fill as ``L_ij = z_ij * w_ij`` with the remaining-norm recursion
``w_i0 = 1``, ``w_{i,j+1}^2 = w_ij^2 - L_ij^2``, and ``L_ii = w_ii``.

``log_prob`` inverts that map in closed form and sums the scaled-Beta
log-densities plus the exact log-Jacobian ``-sum log w_ij`` — the
normalizing constant therefore comes from the Beta factors themselves
rather than a transcribed formula, and sampling/log-density are
self-consistent by construction (verified against the d=2 closed form
``(1-r^2)^(eta-1) / (2^(2eta-1) B(eta, eta))`` and the known
off-diagonal marginal ``2*Beta(eta+(d-2)/2, ·) - 1`` in
tests/distributions/test_lkj.py).

TPU notes: the column loop is a static Python loop over ``d`` (shapes
static, fully unrolled/fused by XLA); all draws are batched Betas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution
from zhusuan_tpu.distributions.utils import assert_same_float_dtype

__all__ = ["LKJCholesky"]


def _scaled_beta_logpdf(z, a):
    """log pdf of ``z = 2*Beta(a, a) - 1`` on (-1, 1)."""
    log_beta_fn = (
        jax.lax.lgamma(a) + jax.lax.lgamma(a)
        - jax.lax.lgamma(2.0 * a)
    )
    return (
        (a - 1.0) * jnp.log1p(-z * z)
        - (2.0 * a - 1.0) * float(np.log(2.0))
        - log_beta_fn
    )


class LKJCholesky(Distribution):
    """LKJ prior over lower-Cholesky factors of correlation matrices.

    :param d: matrix dimension (Python int >= 2).
    :param eta: concentration (> 0): ``eta = 1`` is uniform over
        correlation matrices; ``eta > 1`` concentrates near identity;
        ``eta < 1`` favors strong correlations. Scalar.
    :param group_ndims: trailing batch axes to sum in ``log_prob``.
    """

    def __init__(self, d: int, eta, group_ndims: int = 0, **kwargs):
        if not isinstance(d, (int, np.integer)) or d < 2:
            raise ValueError(
                "d must be a Python int >= 2, got {!r}.".format(d)
            )
        dtype = assert_same_float_dtype([(eta, "eta")])
        self._d = int(d)
        self._eta = jnp.asarray(eta, dtype)
        if self._eta.ndim != 0:
            raise ValueError("eta must be a scalar.")
        super().__init__(
            dtype=dtype,
            param_dtype=dtype,
            is_continuous=True,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    d = property(lambda self: self._d)
    eta = property(lambda self: self._eta)

    def _batch_shape(self):
        return ()

    def _value_shape(self):
        return (self._d, self._d)

    def _col_concentration(self, j: int):
        """CPC Beta shape for 0-indexed column ``j``."""
        return self._eta + 0.5 * (self._d - 2 - j)

    def _sample(self, key, n_samples):
        d = self._d
        eta = jax.lax.stop_gradient(self._eta)
        w = jnp.ones((n_samples, d), self.dtype)
        keys = jax.random.split(key, d - 1)
        # Columns 0..d-2 carry CPC draws; the diagonal closes each row.
        L = jnp.zeros((n_samples, d, d), self.dtype)
        for j in range(d - 1):
            a = eta + 0.5 * (d - 2 - j)
            z = 2.0 * jax.random.beta(
                keys[j], a, a, (n_samples, d), self.dtype
            ) - 1.0
            row_idx = jnp.arange(d)
            is_diag = row_idx == j
            is_below = row_idx > j
            col = jnp.where(
                is_diag, w, jnp.where(is_below, z * w, 0.0)
            )
            L = L.at[:, :, j].set(col)
            # Remaining norm update only matters for rows below j.
            w = jnp.where(
                is_below, jnp.sqrt(jnp.maximum(w * w - col * col, 0.0)), w
            )
        L = L.at[:, d - 1, d - 1].set(w[:, d - 1])
        return L

    def _support_mask(self, L):
        """True where ``L`` is a valid correlation Cholesky factor:
        lower-triangular, positive diagonal, unit row norms. Tolerances
        sized for f32 round-trips."""
        d = self._d
        upper_zero = jnp.all(
            jnp.abs(jnp.triu(L, k=1)) < 1e-5, axis=(-2, -1)
        )
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        diag_pos = jnp.all(diag > 0, axis=-1)
        row_norms = jnp.sum(L * L, axis=-1)
        unit_rows = jnp.all(jnp.abs(row_norms - 1.0) < 1e-4, axis=-1)
        return jnp.logical_and(
            jnp.logical_and(upper_zero, diag_pos), unit_rows
        )

    def _log_prob(self, given):
        d = self._d
        L = jnp.asarray(given, self.param_dtype)
        eta = self._eta
        lp = jnp.zeros(L.shape[:-2], self.param_dtype)
        w = jnp.ones(L.shape[:-1], self.param_dtype)  # [..., d]
        row_idx = jnp.arange(d)
        tiny = jnp.asarray(jnp.finfo(self.param_dtype).tiny,
                           self.param_dtype)
        for j in range(d - 1):
            a = eta + 0.5 * (d - 2 - j)
            below = row_idx > j  # [d]
            w_safe = jnp.maximum(w, tiny)
            z = jnp.where(below, L[..., :, j] / w_safe, 0.0)
            # Scaled-Beta density of each CPC minus the log-Jacobian
            # (dL_ij/dz_ij = w_ij), summed over rows below the diagonal.
            term = jnp.where(
                below,
                _scaled_beta_logpdf(jnp.clip(z, -1.0 + 1e-12, 1.0 - 1e-12),
                                    a)
                - jnp.log(w_safe),
                0.0,
            )
            lp = lp + jnp.sum(term, axis=-1)
            w = jnp.where(
                below,
                jnp.sqrt(jnp.maximum(w * w - L[..., :, j] ** 2, 0.0)),
                w,
            )
        # Out-of-support inputs (non-triangular, bad diagonal, non-unit
        # rows — where the clip/tiny guards above would otherwise yield a
        # plausible finite value) score -inf, matching the rest of the
        # zoo's support semantics.
        return jnp.where(
            self._support_mask(L), lp,
            jnp.asarray(-jnp.inf, self.param_dtype),
        )
