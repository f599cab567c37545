"""Bijectors: run unconstrained samplers over constrained latents.

Beyond the reference: upstream ZhuSuan's HMC assumes unconstrained
latents (its examples hand-reparameterize, e.g. sampling ``logstd``
instead of ``std``). These helpers make that mechanical and
Jacobian-correct: declare each constrained latent's support once and
sample the unconstrained coordinates with ANY kernel (HMC, ChEES, MALA,
SMC rejuvenation, ...):

    ulj, to_u, to_c = transform_log_joint(log_joint, {"sigma": Softplus()})
    state = hmc.init(to_u({"sigma": sigma0, "w": w0}), n_chain_dims=1)
    state, out = hmc.run(ulj, {}, state, key, n_iters)
    sigma_draws = to_c(out["samples"])["sigma"]

Same interface family as :func:`zhusuan_tpu.mcmc.whiten_log_joint`
(precondition.py): a transformed density plus coordinate maps. The
change-of-variables term ``log|d forward/dy|`` is summed over each
latent's DATA axes (everything beyond the chain axes, inferred from the
log-joint's output rank at trace time), so arbitrary chain/batch layouts
work unchanged.

All maps are elementwise and fuse into the surrounding XLA program.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "Bijector",
    "Exp",
    "Softplus",
    "Sigmoid",
    "transform_log_joint",
]


class Bijector:
    """Elementwise map ``forward: unconstrained -> constrained``."""

    def forward(self, y):
        raise NotImplementedError()

    def inverse(self, x):
        raise NotImplementedError()

    def forward_log_det(self, y):
        """Elementwise ``log|d forward(y) / dy|``."""
        raise NotImplementedError()


class Exp(Bijector):
    """``x = exp(y)``: positive supports (scales, rates)."""

    def forward(self, y):
        return jnp.exp(y)

    def inverse(self, x):
        return jnp.log(x)

    def forward_log_det(self, y):
        return y


class Softplus(Bijector):
    """``x = softplus(y)``: positive supports with linear tails (less
    overflow-prone than Exp for heavy-tailed posteriors)."""

    def forward(self, y):
        return jax.nn.softplus(y)

    def inverse(self, x):
        # softplus^{-1}(x) = x + log(1 - exp(-x)), stable for large x.
        return x + jnp.log(-jnp.expm1(-x))

    def forward_log_det(self, y):
        return jax.nn.log_sigmoid(y)


class Sigmoid(Bijector):
    """``x = lo + (hi - lo) * sigmoid(y)``: interval supports."""

    def __init__(self, lo=0.0, hi=1.0):
        if not float(hi) > float(lo):
            raise ValueError("Sigmoid bijector needs hi > lo.")
        self._lo = float(lo)
        self._hi = float(hi)

    def forward(self, y):
        return self._lo + (self._hi - self._lo) * jax.nn.sigmoid(y)

    def inverse(self, x):
        u = (x - self._lo) / (self._hi - self._lo)
        return jnp.log(u) - jnp.log1p(-u)

    def forward_log_det(self, y):
        return (
            jnp.log(jnp.asarray(self._hi - self._lo, jnp.result_type(y)))
            + jax.nn.log_sigmoid(y)
            + jax.nn.log_sigmoid(-y)
        )


def transform_log_joint(log_joint, bijectors: Dict[str, Bijector]):
    """Build the unconstrained density and the coordinate maps.

    :param log_joint: ``log_joint(obs_dict)`` callable or a
        :class:`~zhusuan_tpu.framework.meta_bn.MetaBayesianNet`.
    :param bijectors: ``{latent_name: Bijector}`` for every constrained
        latent; unnamed latents pass through untouched.
    :return: ``(unconstrained_log_joint, to_unconstrained,
        to_constrained)`` — the density over the unconstrained
        coordinates (change-of-variables term included) plus dict maps
        in both directions.
    """
    from zhusuan_tpu.mcmc.base import make_log_joint_fn

    log_joint = make_log_joint_fn(log_joint, {})
    bijectors = dict(bijectors)

    def to_constrained(latent):
        return {
            k: (bijectors[k].forward(v) if k in bijectors else v)
            for k, v in latent.items()
        }

    def to_unconstrained(latent):
        return {
            k: (bijectors[k].inverse(jnp.asarray(v)) if k in bijectors
                else v)
            for k, v in latent.items()
        }

    def unconstrained_log_joint(obs):
        lp = log_joint(to_constrained(dict(obs)))
        for name, bij in bijectors.items():
            ldj = bij.forward_log_det(obs[name])
            # Sum over data axes: everything beyond the chain rank, which
            # is the log-joint output's rank (static at trace time).
            axes = tuple(range(lp.ndim, ldj.ndim))
            lp = lp + (jnp.sum(ldj, axis=axes) if axes else ldj)
        return lp

    return unconstrained_log_joint, to_unconstrained, to_constrained
