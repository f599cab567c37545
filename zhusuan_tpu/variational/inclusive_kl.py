"""Inclusive KL divergence objective (KL(p || q)).

Capability parity with reference ``zhusuan/variational/inclusive_kl.py``:
``InclusiveKLObjective`` (:24-151) whose value cannot be evaluated
(:101-104), the self-normalized IS gradient ``importance`` (RWS wake-phase
proposal update, :116-151), and the ``klpq`` factory (:154-187).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from zhusuan_tpu.variational.base import VariationalObjective

__all__ = ["InclusiveKLObjective", "klpq"]


class InclusiveKLObjective(VariationalObjective):
    """The inclusive KL objective KL(p || q); minimizing it drives the
    variational posterior to cover the true posterior's mass. It can only be
    optimized, not evaluated.
    """

    def __init__(self, meta_bn, observed, latent=None, axis=None,
                 variational=None):
        self._axis = axis
        super().__init__(
            meta_bn, observed, latent=latent, variational=variational
        )

    def _objective(self):
        raise NotImplementedError(
            "The inclusive KL objective (klpq) can only be optimized instead "
            "of being evaluated. (Parity: reference inclusive_kl.py:101-104.)"
        )

    def rws(self):
        """(Deprecated) alias of :meth:`importance`
        (reference inclusive_kl.py:106-114)."""
        warnings.warn(
            "The `rws()` method has been renamed to `importance()`; "
            "`rws()` is kept only for reference compatibility.",
            FutureWarning,
        )
        return self.importance()

    def importance(self):
        """Self-normalized importance-sampling gradient estimator for the
        proposal (Reweighted Wake-Sleep wake-phase q update, Bornschein 2015).

        Parity: reference ``inclusive_kl.py:116-151``, including the
        single-sample bias warning when ``axis`` is None.
        """
        log_w = self._log_joint_term() + self._entropy_term()
        if self._axis is not None:
            log_w_max = jnp.max(log_w, axis=self._axis, keepdims=True)
            w_u = jnp.exp(log_w - jax.lax.stop_gradient(log_w_max))
            w_tilde = jax.lax.stop_gradient(
                w_u / jnp.sum(w_u, axis=self._axis, keepdims=True)
            )
            cost = jnp.sum(
                w_tilde * self._entropy_term(), axis=self._axis
            )
        else:
            warnings.warn(
                "The gradient estimator is using self-normalized importance "
                "sampling, which is heavily biased and inaccurate when "
                "you're using only a single sample (`axis=None`)."
            )
            cost = self._entropy_term()
        return cost


def klpq(meta_bn, observed, latent=None, axis=None, variational=None):
    """Factory for :class:`InclusiveKLObjective`
    (reference inclusive_kl.py:154-187)."""
    return InclusiveKLObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=variational
    )
