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

__all__ = [
    "init_mlp",
    "mlp_apply",
    "init_linear",
    "linear_apply",
    "init_conv",
    "conv_apply",
    "deconv_apply",
]


def init_linear(key, n_in: int, n_out: int, dtype=jnp.float32):
    """He-initialized dense layer parameters ``{"w": [in, out], "b": [out]}``."""
    w_key, _ = jax.random.split(key)
    scale = jnp.sqrt(2.0 / n_in).astype(dtype)
    return {
        "w": scale * jax.random.normal(w_key, (n_in, n_out), dtype),
        "b": jnp.zeros((n_out,), dtype),
    }


def linear_apply(params, x, compute_dtype=None):
    """Dense layer. ``compute_dtype`` (e.g. ``jnp.bfloat16``) casts the
    input and the f32 master weights for the matmul — the standard
    mixed-precision recipe (params/optimizer state stay f32; the cast's
    VJP upcasts the gradients back). On TPU this halves the HBM bytes of
    every activation and weight read, which is the binding constraint on
    wide-batch MLP steps (PERF.md round 5: VAE batch-8192 hbm_frac ~1.0)."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        return x @ params["w"].astype(compute_dtype) \
            + params["b"].astype(compute_dtype)
    return x @ params["w"] + params["b"]


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> List:
    """Initialize an MLP with layer widths ``sizes`` (input first)."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        init_linear(k, n_in, n_out, dtype)
        for k, n_in, n_out in zip(keys, sizes[:-1], sizes[1:])
    ]


def mlp_apply(params: List, x, activation: Callable = jax.nn.relu,
              final_activation=None, compute_dtype=None):
    """Apply an MLP; hidden layers use ``activation``, the last layer uses
    ``final_activation`` (None = linear). ``compute_dtype`` runs every
    layer's matmul+activation in that dtype (see :func:`linear_apply`);
    the OUTPUT is cast back to the input's dtype so downstream
    distribution heads (log-probs, samplers) keep full precision."""
    out_dtype = x.dtype
    for i, layer in enumerate(params):
        x = linear_apply(layer, x, compute_dtype=compute_dtype)
        if i + 1 < len(params):
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    if compute_dtype is not None:
        x = x.astype(out_dtype)
    return x


def init_conv(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    """Conv kernel params in HWIO layout plus bias."""
    w_key, _ = jax.random.split(key)
    scale = jnp.sqrt(2.0 / (kh * kw * c_in)).astype(dtype)
    return {
        "w": scale * jax.random.normal(w_key, (kh, kw, c_in, c_out), dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def conv_apply(params, x, stride=1, padding="SAME"):
    """2-D convolution; x: [..., H, W, C] (leading axes are batched)."""
    lead = x.shape[:-3]
    x2 = x.reshape((-1,) + x.shape[-3:]).astype(params["w"].dtype)
    out = jax.lax.conv_general_dilated(
        x2, params["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b"]
    return out.reshape(lead + out.shape[1:])


def deconv_apply(params, x, stride=2, padding="SAME"):
    """2-D transposed convolution (fractionally-strided); x: [..., H, W, C].

    Parity target: reference ``examples/utils/utils.py:74``
    (``conv2d_transpose``).
    """
    lead = x.shape[:-3]
    x2 = x.reshape((-1,) + x.shape[-3:]).astype(params["w"].dtype)
    out = jax.lax.conv_transpose(
        x2, params["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b"]
    return out.reshape(lead + out.shape[1:])
