"""FlowDistribution: normalizing flows as first-class distributions.

Beyond the reference: upstream ``zhusuan/transform.py`` exposes flows only
as standalone ``(samples, log_probs) -> (samples, log_probs)`` functions,
so flow posteriors could never be BayesianNet nodes. Here a flow pushed
forward from a base distribution IS a :class:`Distribution`, so it plugs
into every consumer of the distribution contract — ``bn.stochastic``
nodes, ``elbo``/``importance_weighted_objective`` variational families,
HMC/SGMCMC log-joints, and ``is_loglikelihood``/AIS.

Density semantics (change of variables): for ``x = f(z)``, ``z ~ base``,

    log p(x) = base.log_prob(f^{-1}(x)) + log|det J_{f^{-1}}(x)|

``sample`` pushes base draws through ``forward``; ``log_prob`` requires
the exact ``inverse`` (affine couplings have one — see
:func:`zhusuan_tpu.transform.coupling_flow_pair`). Forward-only flows
(planar, IAF) may still be wrapped for ancestral sampling, but scoring
raises; use the ``latent={name: (samples, log_probs)}`` objective path for
those (docs/flows_and_evaluation.md).

TPU notes: both directions are a fixed stack of dense matmuls +
elementwise ops — fully fusable by XLA, no data-dependent control flow;
``sample``'s unused forward log-det is dead-code-eliminated under jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from zhusuan_tpu.distributions.base import Distribution

__all__ = ["FlowDistribution"]

# flow callables map (samples [..., d], log_probs [...]) -> same-shaped pair.
FlowFn = Callable


class FlowDistribution(Distribution):
    """Distribution of ``x = forward(z)`` with ``z ~ base``.

    :param base: a continuous :class:`Distribution` whose ``log_prob``
        reduces exactly the last sample axis — e.g. ``Normal(zeros(d),
        std=1., group_ndims=1)`` or ``MultivariateNormalCholesky``. The
        flow acts on that last axis.
    :param forward: ``(z [..., d], log_p [...]) -> (x, log_p - log|det J_f|)``
        — the convention shared by every flow in
        :mod:`zhusuan_tpu.transform`.
    :param inverse: exact inverse with the same convention applied to the
        inverse map: ``(x, log_p) -> (z, log_p + log|det J_f^{-1}|)`` …
        i.e. exactly ``affine_coupling_flow(..., inverse=True)``. ``None``
        makes the distribution sample-only (``log_prob`` raises).
    :param group_ndims: extra trailing *batch* axes of this distribution
        to sum into one event (on top of the flow's own last-axis event).
    """

    def __init__(
        self,
        base: Distribution,
        forward: FlowFn,
        inverse: Optional[FlowFn] = None,
        group_ndims: int = 0,
    ):
        if not isinstance(base, Distribution):
            raise TypeError(
                "base should be a Distribution, got {!r}.".format(type(base))
            )
        if not base.is_continuous:
            raise ValueError(
                "FlowDistribution requires a continuous base distribution "
                "(change of variables needs a density)."
            )
        full = tuple(base.batch_shape) + tuple(base.value_shape)
        if len(full) < 1 or full[-1] < 1:
            raise ValueError(
                "The base distribution must have at least one sample axis "
                "for the flow to act on; got batch_shape={} value_shape={}."
                .format(base.batch_shape, base.value_shape)
            )
        # The contract needs base.log_prob to reduce exactly the last axis
        # (so flow log-dets, summed over that axis, add consistently).
        probe = jax.eval_shape(
            base.log_prob, jax.ShapeDtypeStruct(full, base.dtype)
        )
        if tuple(probe.shape) != full[:-1]:
            raise ValueError(
                "base.log_prob must reduce exactly the last sample axis: "
                "for samples of shape {} it returned shape {} (expected {})."
                " Use e.g. Normal(..., group_ndims=1) or a multivariate "
                "base.".format(full, tuple(probe.shape), full[:-1])
            )
        super().__init__(
            dtype=base.dtype,
            param_dtype=base.param_dtype,
            is_continuous=True,
            is_reparameterized=base.is_reparameterized,
            group_ndims=group_ndims,
        )
        self._base = base
        self._forward = forward
        self._inverse = inverse
        self._full_shape = full

    @classmethod
    def coupling(cls, base, params, **kwargs):
        """Affine-coupling (RealNVP) flow over ``base`` — the invertible
        default. ``params`` from
        :func:`zhusuan_tpu.transform.init_affine_coupling`."""
        from zhusuan_tpu.transform import coupling_flow_pair

        fwd, inv = coupling_flow_pair(params)
        return cls(base, fwd, inv, **kwargs)

    @property
    def base(self) -> Distribution:
        """The base (pre-flow) distribution."""
        return self._base

    def _batch_shape(self):
        return self._full_shape[:-1]

    def _value_shape(self):
        return self._full_shape[-1:]

    def _sample(self, key, n_samples: int):
        z = self._base.sample(key, n_samples)  # [n] + full_shape
        zeros = jnp.zeros(z.shape[:-1], self.param_dtype)
        x, _ = self._forward(z, zeros)  # log-det output is DCE'd under jit
        return x

    def _log_prob(self, given):
        if self._inverse is None:
            raise NotImplementedError(
                "This FlowDistribution was built without an inverse, so it "
                "is sample-only. Provide inverse= (affine couplings have an "
                "exact one) or score via the latent={name: (samples, "
                "log_probs)} objective path."
            )
        # Rank-1 input means "one d-vector" ONLY when the distribution has
        # no batch axes; with a batched base a rank-1 `given` is a
        # broadcast against batch_shape and must NOT be squeezed (the
        # flow functions themselves require rank >= 2, so lift instead).
        squeeze = given.ndim == 1 and len(self._full_shape) == 1
        if given.ndim == 1 and not squeeze:
            given = jnp.broadcast_to(
                given, self._full_shape[:-1] + given.shape
            )
        g = given[None] if squeeze else given
        zeros = jnp.zeros(g.shape[:-1], self.param_dtype)
        z0, delta = self._inverse(g, zeros)
        lp = self._base.log_prob(z0) + delta
        return lp[0] if squeeze else lp
