"""Importance-weighted (multi-sample Monte Carlo) objective.

Capability parity with reference ``zhusuan/variational/monte_carlo.py``:
``ImportanceWeightedObjective`` (:24-227) with ``sgvb`` (IWAE, :143-164) and
``vimco`` (:166-227), factories ``importance_weighted_objective`` /
``iw_objective`` (:230-268).

TPU-native: VIMCO's leave-one-out control variate is built with static-shape
``jnp.where`` on a K x K matrix instead of the reference's dynamic
transpose/tile/matrix_diag surgery (monte_carlo.py:197-218) — XLA fuses this
into a handful of VPU ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zhusuan_tpu.utils import log_mean_exp
from zhusuan_tpu.variational.base import VariationalObjective

__all__ = [
    "ImportanceWeightedObjective",
    "importance_weighted_objective",
    "iw_objective",
]


class ImportanceWeightedObjective(VariationalObjective):
    """The multi-sample importance-weighted lower bound (Burda 2015); also
    the self-normalized IS estimate of the marginal log-likelihood used by
    :func:`zhusuan_tpu.evaluation.is_loglikelihood`.
    """

    def __init__(self, meta_bn, observed, latent=None, axis=None,
                 variational=None):
        if axis is None:
            raise ValueError(
                "ImportanceWeightedObjective is a multi-sample objective; "
                "the `axis` argument must be specified."
            )
        self._axis = axis
        super().__init__(
            meta_bn, observed, latent=latent, variational=variational
        )

    def _objective(self):
        """``log_mean_exp(log_joint + entropy, axis)``
        (reference monte_carlo.py:137-141)."""
        log_w = self._log_joint_term() + self._entropy_term()
        return log_mean_exp(log_w, axis=self._axis)

    def sgvb(self):
        """IWAE estimator: reparameterized gradient of the IW bound
        (reference monte_carlo.py:143-164)."""
        return -self.tensor

    def vimco(self):
        """VIMCO multi-sample score-function estimator (Mnih & Rezende 2016).

        Parity: reference ``monte_carlo.py:166-227``; requires the size along
        ``axis`` to be at least 2 (checked statically here).
        """
        log_w = self._log_joint_term() + self._entropy_term()
        axis = self._axis
        k = log_w.shape[axis]
        if k < 2:
            raise ValueError(
                "VIMCO is a multi-sample gradient estimator, size along "
                "`axis` in the objective should be larger than 1."
            )

        # Leave-one-out geometric-mean control variate: for each sample j,
        # replace log_w_j by the mean of the others and log-mean-exp.
        l_signal = jnp.moveaxis(log_w, axis, -1)  # [..., K]
        sub = (jnp.sum(l_signal, axis=-1, keepdims=True) - l_signal) / (k - 1)
        eye = jnp.eye(k, dtype=bool)
        # x_ex[..., j, i] = l_i for i != j, sub_j for i == j.
        x_ex = jnp.where(eye, sub[..., :, None], l_signal[..., None, :])
        control_variate = log_mean_exp(x_ex, axis=-1)  # [..., K]
        control_variate = jnp.moveaxis(control_variate, -1, axis)

        # Variance-reduced learning signal, then surrogate cost
        # (reference monte_carlo.py:220-227).
        l_sig = log_mean_exp(log_w, axis=axis, keepdims=True) - control_variate
        fake_term = jnp.sum(
            -self._entropy_term() * jax.lax.stop_gradient(l_sig), axis=axis
        )
        cost = -fake_term - log_mean_exp(log_w, axis=axis)
        return cost


def importance_weighted_objective(meta_bn, observed, latent=None, axis=None,
                                  variational=None):
    """Factory for :class:`ImportanceWeightedObjective`
    (reference monte_carlo.py:230-264)."""
    return ImportanceWeightedObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=variational
    )


iw_objective = importance_weighted_objective
