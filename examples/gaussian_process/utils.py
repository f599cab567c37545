"""GP utilities: RBF kernel and sparse GP conditional.

Parity: reference ``examples/gaussian_process/utils.py:10-91``
(``RBFKernel`` with per-dimension softplus length-scales, and
``gp_conditional`` computing f(x) | f(z) with the symmetric
Cholesky-solve-based inverse).

TPU-native: the Gram matrix construction and triangular solves are batched
MXU matmuls; ELBO training uses the diagonal (``full_cov=False``) branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import zhusuan_tpu as zs

__all__ = ["RBFKernel", "gp_conditional"]


class RBFKernel:
    """RBF kernel with per-covariate length-scales
    ``K(x, y) = exp(-0.5 * sum((x - y)^2 / scale))``.

    :param k_raw_scale: raw (pre-softplus) scale parameters ``[n_covariates]``
        — explicit, where the reference used ``tf.get_variable``.
    """

    def __init__(self, k_raw_scale):
        self.k_scale = jax.nn.softplus(k_raw_scale)

    @staticmethod
    def init_params(n_covariates, dtype=jnp.float32):
        return jnp.zeros((n_covariates,), dtype)

    def __call__(self, x, y):
        """K(x, y): ``[..., n_x, d] x [..., n_y, d] -> [..., n_x, n_y]``."""
        x = jnp.expand_dims(x, -2)  # [..., n_x, 1, d]
        y = jnp.expand_dims(y, -3)  # [..., 1, n_y, d]
        return jnp.exp(
            -0.5 * jnp.sum(jnp.square(x - y) / self.k_scale, axis=-1)
        )

    def Kdiag(self, x):
        """diag(K(x, x)) without forming the Gram matrix."""
        return jnp.ones(x.shape[:-1], x.dtype)


def gp_conditional(z, fz, x, full_cov, kernel, Kzz_chol=None,
                   Kzz_chol_inv=None):
    """The GP conditional distribution f(x) | f(z) = fz.

    Parity: reference ``utils.py:52-91`` — symmetric inverse via triangular
    solve of the identity; diagonal variance via the row-norm shortcut.

    :param z: inducing inputs ``[n_z, d]``.
    :param fz: inducing function values ``[n_particles, n_z]``.
    :param x: query inputs ``[n_x, d]``.
    :param Kzz_chol, Kzz_chol_inv: optional precomputed Cholesky factor
        (and its inverse) of the inducing Gram matrix — pass both from
        :func:`zhusuan_tpu.ops.linalg.cholesky_inverse` to skip every
        sequential factorization/solve in this conditional (the op-count
        cure on TPU; PERF.md).
    :return: a Distribution over ``[n_particles, n_x]``.
    """
    n_z = z.shape[0]
    if Kzz_chol is None:
        Kzz_chol = jnp.linalg.cholesky(kernel(z, z))

    if Kzz_chol_inv is None:
        Kzz_chol_inv = jax.scipy.linalg.solve_triangular(
            Kzz_chol, jnp.eye(n_z, dtype=z.dtype), lower=True
        )
    Kzz_inv = Kzz_chol_inv.T @ Kzz_chol_inv
    Kxz = kernel(x, z)  # [n_x, n_z]
    Kxziz = Kxz @ Kzz_inv
    mean_fx_given_fz = fz @ Kxziz.T  # [n_particles, n_x]

    if full_cov:
        cov = kernel(x, x) - Kxziz @ Kxz.T
        cov_chol = jnp.linalg.cholesky(
            cov + 1e-6 * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        )
        cov_chol = jnp.broadcast_to(
            cov_chol[None], (fz.shape[0],) + cov_chol.shape
        )
        return zs.distributions.MultivariateNormalCholesky(
            mean_fx_given_fz, cov_chol
        )
    var = kernel.Kdiag(x) - jnp.sum((Kxz @ Kzz_chol_inv.T) ** 2, axis=-1)
    std = jnp.sqrt(jnp.maximum(var, 1e-8))
    return zs.distributions.Normal(
        mean_fx_given_fz, std=std, group_ndims=1
    )
