"""Posterior-predictive sampling over a draws pytree.

Beyond the reference: every reference example hand-rolls the same loop —
observe the generative net at each posterior draw, sample the data nodes,
stack. ``posterior_predictive`` packages it as one ``vmap`` over the
draws axis (a single compiled program; no Python loop over draws), using
the library's standard conventions: a :class:`MetaBayesianNet`, a draws
dict ``{latent_name: [n_draws, ...]}`` (e.g. burned-in ``run`` output
reshaped to one draw axis), and an explicit PRNG key.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from zhusuan_tpu.framework.bn import StochasticTensor
from zhusuan_tpu.framework.meta_bn import MetaBayesianNet

__all__ = ["posterior_predictive"]


def posterior_predictive(
    meta_bn: MetaBayesianNet,
    draws: Dict,
    key,
    outputs: Optional[List[str]] = None,
):
    """Sample the model's remaining stochastic nodes at each posterior draw.

    :param meta_bn: the generative model.
    :param draws: dict ``{latent_name: [n_draws, ...]}`` of posterior
        draws — every array must share the leading draws axis.
    :param key: PRNG key (split per draw).
    :param outputs: node names to return. Default: every stochastic node
        NOT fixed by ``draws`` (the data nodes).
    :return: dict ``{name: [n_draws, ...]}`` of predictive samples.
    """
    if not isinstance(meta_bn, MetaBayesianNet):
        raise TypeError(
            "meta_bn must be a MetaBayesianNet, got {!r}.".format(
                type(meta_bn))
        )
    if not draws:
        raise ValueError("draws must contain at least one latent.")
    n_set = {jnp.shape(v)[0] if jnp.ndim(v) else None
             for v in draws.values()}
    if None in n_set or len(n_set) != 1:
        raise ValueError(
            "All draws arrays must share a leading n_draws axis; got "
            "shapes {}.".format({k: jnp.shape(v) for k, v in draws.items()})
        )
    n_draws = n_set.pop()

    if outputs is None:
        # Trace-only probe (jax.eval_shape): enumerates the stochastic
        # nodes the draws do not pin down with ZERO device work — a real
        # observe+sample here would compile and execute the whole model
        # once just to read node names (~30-300s per new program shape on
        # the remote-compile runtime, CLAUDE.md).
        one = {k: jnp.asarray(v)[0] for k, v in draws.items()}
        found: list = []

        def probe(key, d):
            bn = meta_bn.observe(key=key, **d)
            found.extend(
                name for name, node in bn.nodes.items()
                if isinstance(node, StochasticTensor) and name not in draws
            )
            return 0

        jax.eval_shape(probe, jax.random.PRNGKey(0), one)
        outputs = found
        if not outputs:
            raise ValueError(
                "No stochastic nodes remain once draws are observed; "
                "pass outputs= explicitly."
            )

    def one_draw(k, d):
        bn = meta_bn.observe(key=k, **d)
        # _node_value: StochasticTensor -> .tensor; deterministic nodes
        # are raw arrays (outputs= may name either kind).
        return {name: bn._node_value(bn.nodes[name]) for name in outputs}

    keys = jax.random.split(key, n_draws)
    return jax.vmap(one_draw)(keys, {k: jnp.asarray(v)
                                     for k, v in draws.items()})
