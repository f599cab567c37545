"""Minimal explicit-parameter neural-net helpers for the examples.

The reference examples used ``tf.layers.dense`` with implicit variable
scoping (e.g. examples/variational_autoencoders/vae.py:20-29). Here
parameters are explicit pytrees — the JAX-native equivalent — kept
dependency-free so examples read standalone. Weights default to bfloat16-
friendly float32; matmuls hit the MXU when batched.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

__all__ = ["init_mlp", "mlp_apply", "init_linear", "linear_apply"]


def init_linear(key, n_in: int, n_out: int, dtype=jnp.float32):
    """He-initialized dense layer parameters ``{"w": [in, out], "b": [out]}``."""
    w_key, _ = jax.random.split(key)
    scale = jnp.sqrt(2.0 / n_in).astype(dtype)
    return {
        "w": scale * jax.random.normal(w_key, (n_in, n_out), dtype),
        "b": jnp.zeros((n_out,), dtype),
    }


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> List:
    """Initialize an MLP with layer widths ``sizes`` (input first)."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        init_linear(k, n_in, n_out, dtype)
        for k, n_in, n_out in zip(keys, sizes[:-1], sizes[1:])
    ]


def mlp_apply(params: List, x, activation: Callable = jax.nn.relu,
              final_activation=None):
    """Apply an MLP; hidden layers use ``activation``, the last layer uses
    ``final_activation`` (None = linear)."""
    for i, layer in enumerate(params):
        x = linear_apply(layer, x)
        if i + 1 < len(params):
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x
