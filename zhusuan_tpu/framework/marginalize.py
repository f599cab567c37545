"""Automatic enumeration of finite discrete latents.

Beyond the reference: upstream ZhuSuan handles discrete latents either by
REINFORCE (``variational/exclusive_kl.py:196``) or by hand-written
marginalization (the semi-supervised VAE sums the unlabeled ELBO over
classes manually, ``examples/semi_supervised_vae/vae_ssl.py:95-133``).
:func:`marginalize` packages the sum-out: given any model (or raw
log-joint) and the supports of its finite discrete sites, it returns a
new log-joint over the REMAINING variables with those sites exactly
summed out::

    log p(rest) = logsumexp over the cartesian product of support values
                  of log p(sites = values, rest)

The result is an ordinary differentiable log-joint — feed it to HMC/NUTS
(marginalized samplers mix far better than ones that carry the discrete
state), to ``elbo`` (exact discrete handling instead of REINFORCE), or to
AIS.

TPU-native: the product support is enumerated with ONE ``vmap`` over a
flattened index grid (static size M = K1 * K2 * ...), so the enumeration
compiles to a single batched evaluation — no Python loops over values.
Cost is M model evaluations; intended for small finite supports (labels,
mixture assignments, model indicators).
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.framework.meta_bn import MetaBayesianNet
from zhusuan_tpu.utils import merge_dicts

__all__ = ["marginalize"]


def marginalize(meta_bn_or_log_joint, supports: Dict[str, Union[int, object]]):
    """Sum finite discrete sites out of a model's log-joint.

    :param meta_bn_or_log_joint: a :class:`MetaBayesianNet` or a raw
        ``log_joint(obs_dict)`` callable (the same duality every sampler
        accepts).
    :param supports: ``{site_name: support}`` where support is an int K
        (meaning ``jnp.arange(K)``) or an array whose LEADING axis
        enumerates the values (so vector-valued sites — one-hots, index
        tuples — work: shape ``[K] + value_shape``).
    :return: ``log_joint(obs_dict)`` over the remaining variables;
        passing one of the enumerated names in ``obs_dict`` raises.

    Example — exact mixture-assignment marginalization::

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            z = bn.categorical("z", logits)          # K classes
            bn.normal("x", mu[z.tensor], std=sd[z.tensor])
            return bn

        log_marginal = zs.marginalize(model(), {"z": K})
        # log_marginal({"x": x, **other_latents}) == Mixture density
    """
    if not supports:
        raise ValueError("supports must name at least one site.")
    if isinstance(meta_bn_or_log_joint, MetaBayesianNet):
        meta_bn = meta_bn_or_log_joint
        base = lambda obs: meta_bn.observe(**obs).log_joint()
    elif callable(meta_bn_or_log_joint):
        base = meta_bn_or_log_joint
    else:
        raise TypeError(
            "Expected a MetaBayesianNet or a callable log-joint, got "
            "{!r}.".format(type(meta_bn_or_log_joint))
        )

    names = list(supports)
    values = []
    for n in names:
        s = supports[n]
        if isinstance(s, (int, np.integer)):
            if s < 1:
                raise ValueError(
                    "support size for {!r} must be >= 1; got {}."
                    .format(n, s)
                )
            values.append(jnp.arange(int(s)))
        else:
            v = jnp.asarray(s)
            if v.ndim < 1 or v.shape[0] < 1:
                raise ValueError(
                    "support array for {!r} needs a leading enumeration "
                    "axis; got shape {}.".format(n, v.shape)
                )
            values.append(v)
    sizes = [int(v.shape[0]) for v in values]

    # Cartesian product as a flat index grid: one vmap, static size M.
    idx = np.stack(
        [g.reshape(-1) for g in np.meshgrid(
            *[np.arange(s) for s in sizes], indexing="ij")],
        axis=0,
    )  # [n_sites, M]
    idx = jnp.asarray(idx)

    def marginalized(observed):
        clash = sorted(set(observed) & set(names))
        if clash:
            raise ValueError(
                "Variables {} are marginalized out; do not pass them as "
                "observed/latent.".format(clash)
            )

        def at(site_idx):  # site_idx: [n_sites] scalars
            assign = {
                n: v[site_idx[i]] for i, (n, v) in
                enumerate(zip(names, values))
            }
            return base(merge_dicts(observed, assign))

        lp = jax.vmap(at, in_axes=1)(idx)  # [M, ...chain shape]
        return jax.scipy.special.logsumexp(lp, axis=0)

    return marginalized
