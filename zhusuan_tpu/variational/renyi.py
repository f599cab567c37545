"""Renyi-divergence (VR) and chi-square (CUBO) variational objectives.

Beyond reference parity (the reference stops at ELBO / IWAE / inclusive
KL): this module completes the divergence family so log Z can be
*sandwiched* — a VR/ELBO lower bound from below, CUBO from above.

* ``RenyiDivergenceObjective`` — the K-sample variational Renyi bound
  (Li & Turner, "Renyi Divergence Variational Inference", NeurIPS 2016):

  .. math::
      \\mathcal{L}_\\alpha = \\tfrac{1}{1-\\alpha}
      \\log \\tfrac{1}{K} \\sum_i w_i^{\\,1-\\alpha},

  continuous and non-increasing in :math:`\\alpha`; :math:`\\alpha = 1`
  recovers the (multi-sample) ELBO, :math:`\\alpha = 0` is exactly the
  IWAE bound, :math:`0 < \\alpha < 1` interpolates mass-covering vs
  mode-seeking behavior.

* ``ChiSquareObjective`` — the chi upper bound (Dieng, Tran, Ranganath,
  Paisley & Blei, "Variational Inference via chi Upper Bound
  Minimization", NeurIPS 2017):

  .. math::
      \\mathrm{CUBO}_n = \\tfrac{1}{n} \\log \\mathbb{E}_q[w^n],
      \\qquad n \\ge 1,

  an upper bound on :math:`\\log Z` by the power-mean inequality
  (equivalently the VR bound at :math:`\\alpha = 1 - n`). Note the
  Monte-Carlo estimate of a log-of-mean is downward-biased, so finite-K
  estimates can dip below :math:`\\log Z`; the bound holds in
  expectation of :math:`\\mathbb{E}[w^n]`.

Shapes follow :class:`ImportanceWeightedObjective`: ``axis`` indexes the
K-sample axis of ``log w = log p(x, z) + entropy``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zhusuan_tpu.utils import log_mean_exp
from zhusuan_tpu.variational.base import VariationalObjective

__all__ = [
    "RenyiDivergenceObjective",
    "ChiSquareObjective",
    "vr_objective",
    "cubo_objective",
]


class RenyiDivergenceObjective(VariationalObjective):
    """K-sample variational Renyi (VR) bound :math:`\\mathcal{L}_\\alpha`
    (Li & Turner 2016). ``alpha`` is a static Python float; ``alpha < 1``
    uses the log-mean-exp form, ``alpha == 1`` the ELBO limit.

    For ``alpha >= 0`` this is a lower bound on ``log Z`` (in expectation
    for ``alpha`` in (0, 1); pathwise for the ELBO/IWAE endpoints);
    :meth:`sgvb` returns ``-bound`` as the cost to minimize.
    """

    def __init__(self, meta_bn, observed, latent=None, axis=None,
                 variational=None, alpha=0.5):
        if axis is None:
            raise ValueError(
                "RenyiDivergenceObjective is a multi-sample objective; "
                "the `axis` argument must be specified."
            )
        alpha = float(alpha)
        self._axis = axis
        self._alpha = alpha
        super().__init__(
            meta_bn, observed, latent=latent, variational=variational
        )

    @property
    def alpha(self) -> float:
        return self._alpha

    def _objective(self):
        log_w = self._log_joint_term() + self._entropy_term()
        if self._alpha == 1.0:
            # lim_{alpha->1} L_alpha = E_q[log w]  (the ELBO).
            return jnp.mean(log_w, axis=self._axis)
        one_m_alpha = 1.0 - self._alpha
        return log_mean_exp(one_m_alpha * log_w, axis=self._axis) / one_m_alpha

    def sgvb(self):
        """Reparameterized gradient of the VR bound; cost = ``-bound``.

        This is the (biased for finite K, consistent) VR-alpha estimator of
        Li & Turner 2016 eq. (7) — the importance weights are implicit in
        the autodiff of the log-mean-exp.
        """
        return -self.tensor


class ChiSquareObjective(VariationalObjective):
    """The chi upper bound CUBO_n on ``log Z`` (Dieng et al. 2017);
    minimizing it minimizes the chi^n divergence from q to the posterior.
    ``n`` is a static float >= 1 (default 2: the chi-square case).
    """

    def __init__(self, meta_bn, observed, latent=None, axis=None,
                 variational=None, n=2.0):
        if axis is None:
            raise ValueError(
                "ChiSquareObjective is a multi-sample objective; the `axis` "
                "argument must be specified."
            )
        n = float(n)
        if n < 1.0:
            raise ValueError(
                "CUBO_n requires n >= 1 for an upper bound; got n="
                + repr(n)
            )
        self._axis = axis
        self._n = n
        super().__init__(
            meta_bn, observed, latent=latent, variational=variational
        )

    @property
    def n(self) -> float:
        return self._n

    def _objective(self):
        log_w = self._log_joint_term() + self._entropy_term()
        return log_mean_exp(self._n * log_w, axis=self._axis) / self._n

    def sgvb(self):
        """Reparameterized gradient of CUBO_n itself; the cost IS the bound
        (minimize the upper bound). High-variance when q is far from the
        posterior — prefer :meth:`exp_sgvb` for optimization.
        """
        return self.tensor

    def exp_sgvb(self):
        """The exponentiated surrogate of Dieng et al. 2017 sec. 2.3:
        minimizing ``E_q[w^n] = exp(n * CUBO)`` has the same minimizer and
        an *unbiased* reparameterized gradient (no log-of-mean bias).

        Stabilized by a single GLOBAL stopped log-shift: the returned cost
        is ``mean(exp(n log_w - sg(max_all(n log_w))))``, whose gradient is
        the exact surrogate gradient scaled by ONE positive constant
        ``exp(-sg(max_all))`` — so with extra batch dims the aggregate
        minibatch gradient stays *proportional* to the true surrogate
        gradient (a per-element shift would reweight batch elements).
        Computed in two stages (per-element shift inside the mean, global
        correction outside) so each element's exp stays in range; elements
        whose weights sit far below the global max underflow toward zero,
        which is their true (negligible) share of the global surrogate.
        """
        log_w = self._log_joint_term() + self._entropy_term()
        n_log_w = self._n * log_w
        shift = jax.lax.stop_gradient(
            jnp.max(n_log_w, axis=self._axis, keepdims=True)
        )
        global_shift = jax.lax.stop_gradient(jnp.max(shift))
        scale = jnp.exp(
            jnp.squeeze(shift, axis=self._axis) - global_shift
        )
        return jnp.mean(jnp.exp(n_log_w - shift), axis=self._axis) * scale


def vr_objective(meta_bn, observed, latent=None, axis=None, variational=None,
                 alpha=0.5):
    """Factory for :class:`RenyiDivergenceObjective`."""
    return RenyiDivergenceObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=variational,
        alpha=alpha,
    )


def cubo_objective(meta_bn, observed, latent=None, axis=None,
                   variational=None, n=2.0):
    """Factory for :class:`ChiSquareObjective`."""
    return ChiSquareObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=variational,
        n=n,
    )
