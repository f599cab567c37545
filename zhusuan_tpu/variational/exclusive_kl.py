"""ELBO (exclusive KL divergence) objective and its gradient estimators.

Capability parity with reference ``zhusuan/variational/exclusive_kl.py``:
``EvidenceLowerBoundObjective`` (exclusive_kl.py:24-231) with ``sgvb``
(:139-159) and ``reinforce`` (:161-231), and the ``elbo`` factory
(:234-267).

TPU-native: the REINFORCE moving-average baseline becomes explicit state
threaded by the caller (``moving_mean`` argument), instead of a hidden
``tf.Variable`` (reference exclusive_kl.py:207-215).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zhusuan_tpu.variational.base import VariationalObjective

__all__ = ["EvidenceLowerBoundObjective", "elbo"]


class EvidenceLowerBoundObjective(VariationalObjective):
    """The evidence lower bound (ELBO) objective: the negative exclusive
    KL divergence up to a constant.

    :param axis: the sample axis (or axes) to average over in the outer
        expectation; None keeps per-sample values.
    """

    def __init__(self, meta_bn, observed, latent=None, axis=None,
                 variational=None):
        self._axis = axis
        super().__init__(
            meta_bn, observed, latent=latent, variational=variational
        )

    def _objective(self):
        """log_joint + entropy, averaged over ``axis``
        (reference exclusive_kl.py:131-137)."""
        lower_bound = self._log_joint_term()
        if self._entropy_term() is not None:
            lower_bound = lower_bound + self._entropy_term()
        if self._axis is not None:
            lower_bound = jnp.mean(lower_bound, axis=self._axis)
        return lower_bound

    def sgvb(self):
        """SGVB / reparameterization-trick estimator (Kingma 2013).

        Requires reparameterized latent nodes. Returns the surrogate cost to
        minimize (reference exclusive_kl.py:139-159).
        """
        return -self.tensor

    def reinforce(
        self,
        variance_reduction: bool = True,
        baseline=None,
        decay: float = 0.8,
        moving_mean=None,
    ):
        """Score-function (REINFORCE / NVIL / likelihood-ratio) estimator.

        Parity: reference ``exclusive_kl.py:161-231``. Differences forced by
        purity: the centering moving average is explicit state.

        :param variance_reduction: center the learning signal.
        :param baseline: optional input-dependent baseline array
            broadcastable to the learning signal; when given, an auxiliary
            ``baseline_cost`` for training the baseline is also returned.
        :param decay: moving-average decay for the center.
        :param moving_mean: optional scalar array carrying the moving-average
            center across steps. When given, the updated value is returned as
            the last element; when None, the (stop-gradient) batch mean is
            used as an instantaneous center.
        :return: ``cost`` — or a tuple ``(cost[, baseline_cost]
            [, new_moving_mean])`` when those are requested.
        """
        l_signal = self._log_joint_term() + self._entropy_term()
        baseline_cost = None
        new_moving_mean = None

        if variance_reduction:
            if baseline is not None:
                baseline = jnp.asarray(baseline)
                baseline_cost = 0.5 * jnp.square(
                    jax.lax.stop_gradient(l_signal) - baseline
                )
                if self._axis is not None:
                    baseline_cost = jnp.mean(baseline_cost, axis=self._axis)
                l_signal = l_signal - baseline

            bc = jnp.mean(l_signal)
            if moving_mean is not None:
                moving_mean = jnp.asarray(moving_mean)
                new_moving_mean = decay * moving_mean + (1.0 - decay) * \
                    jax.lax.stop_gradient(bc)
                # Center with the PRE-update mean (reference
                # exclusive_kl.py:215-217 subtracts the moving_mean
                # variable read, not the assign result): the post-update
                # value contains (1-decay) of THIS batch's own signal,
                # which would correlate the baseline with the samples and
                # bias the score-function gradient.
                l_signal = l_signal - moving_mean
            else:
                l_signal = l_signal - jax.lax.stop_gradient(bc)

        cost = -self._log_joint_term()
        if self._entropy_term() is not None:
            cost = cost + jax.lax.stop_gradient(l_signal) * self._entropy_term()
        if self._axis is not None:
            cost = jnp.mean(cost, axis=self._axis)

        outputs = (cost,)
        if baseline_cost is not None:
            outputs = outputs + (baseline_cost,)
        if new_moving_mean is not None:
            outputs = outputs + (new_moving_mean,)
        return outputs if len(outputs) > 1 else cost


def elbo(meta_bn, observed, latent=None, axis=None, variational=None):
    """Factory for :class:`EvidenceLowerBoundObjective`.

    Parity: reference ``exclusive_kl.py:234-267``.

    :param meta_bn: MetaBayesianNet or log-joint callable.
    :param observed: dict of observations.
    :param latent: ``{name: (samples, log_probs)}`` (exclusive with
        ``variational``).
    :param axis: sample axis to average over.
    :param variational: a BayesianNet variational family.
    """
    return EvidenceLowerBoundObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=variational
    )
