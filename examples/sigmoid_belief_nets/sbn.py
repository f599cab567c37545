"""Shared model/variational builders for the sigmoid belief net examples.

Parity: reference ``examples/sigmoid_belief_nets/sbn_vimco.py:17-43`` — a
3-layer stochastic Bernoulli generative stack and a mirrored bottom-up
Bernoulli inference net.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import zhusuan_tpu as zs
from examples.utils.nn import init_linear, linear_apply


def init_sbn_params(key, x_dim, h_dim):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        # generative: h3 -> h2 -> h1 -> x
        "g_h3_h2": init_linear(k1, h_dim, h_dim),
        "g_h2_h1": init_linear(k2, h_dim, h_dim),
        "g_h1_x": init_linear(k3, h_dim, x_dim),
        # inference: x -> h1 -> h2 -> h3
        "q_x_h1": init_linear(k4, x_dim, h_dim),
        "q_h1_h2": init_linear(k5, h_dim, h_dim),
        "q_h2_h3": init_linear(k6, h_dim, h_dim),
    }


def build_sbn(params, n, x_dim, h_dim, n_particles):
    @zs.meta_bayesian_net()
    def sbn():
        bn = zs.BayesianNet()
        h3 = bn.bernoulli(
            "h3", jnp.zeros([n, h_dim]), group_ndims=1,
            n_samples=n_particles, dtype=jnp.float32,
        )
        h2 = bn.bernoulli(
            "h2", linear_apply(params["g_h3_h2"], h3.tensor),
            group_ndims=1, dtype=jnp.float32,
        )
        h1 = bn.bernoulli(
            "h1", linear_apply(params["g_h2_h1"], h2.tensor),
            group_ndims=1, dtype=jnp.float32,
        )
        bn.bernoulli(
            "x", linear_apply(params["g_h1_x"], h1.tensor),
            group_ndims=1, dtype=jnp.float32,
        )
        return bn

    return sbn()


def build_q_net(params, x, h_dim, n_particles, key):
    bn = zs.BayesianNet(key=key)
    h1 = bn.bernoulli(
        "h1", linear_apply(params["q_x_h1"], x), group_ndims=1,
        n_samples=n_particles, dtype=jnp.float32,
    )
    h2 = bn.bernoulli(
        "h2", linear_apply(params["q_h1_h2"], h1.tensor),
        group_ndims=1, dtype=jnp.float32,
    )
    bn.bernoulli(
        "h3", linear_apply(params["q_h2_h3"], h2.tensor),
        group_ndims=1, dtype=jnp.float32,
    )
    return bn
