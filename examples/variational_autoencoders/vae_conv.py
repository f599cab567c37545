"""Convolutional VAE on binarized MNIST.

Parity: reference ``examples/variational_autoencoders/vae_conv.py``:
conv encoder / deconv decoder (reference :56-91), ``elbo(...).sgvb()``
(reference :120-122). Convolutions are MXU-friendly NHWC
``lax.conv_general_dilated`` calls.
Run: ``python -m examples.variational_autoencoders.vae_conv``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import elbo
from examples.utils.nn import (
    conv_apply,
    deconv_apply,
    init_conv,
    init_linear,
    linear_apply,
)


def init_params(key, z_dim=40):
    keys = jax.random.split(key, 8)
    return {
        # encoder: 28x28x1 -> conv s2 -> 14x14x32 -> conv s2 -> 7x7x64 -> fc
        "e_conv1": init_conv(keys[0], 4, 4, 1, 32),
        "e_conv2": init_conv(keys[1], 4, 4, 32, 64),
        "e_fc": init_linear(keys[2], 7 * 7 * 64, 500),
        "z_mean": init_linear(keys[3], 500, z_dim),
        "z_logstd": init_linear(keys[4], 500, z_dim),
        # decoder: z -> fc -> 7x7x64 -> deconv s2 -> 14x14x32 -> deconv s2
        "d_fc": init_linear(keys[5], z_dim, 7 * 7 * 64),
        "d_deconv1": init_conv(keys[6], 4, 4, 64, 32),
        "d_deconv2": init_conv(keys[7], 4, 4, 32, 1),
    }


def decoder_logits(params, z):
    h = jax.nn.relu(linear_apply(params["d_fc"], z))
    h = h.reshape(h.shape[:-1] + (7, 7, 64))
    h = jax.nn.relu(deconv_apply(params["d_deconv1"], h, stride=2))
    h = deconv_apply(params["d_deconv2"], h, stride=2)
    return h.reshape(h.shape[:-3] + (784,))


def build_gen(params, n, z_dim, n_particles):
    @zs.meta_bayesian_net()
    def gen():
        bn = zs.BayesianNet()
        z = bn.normal(
            "z", jnp.zeros([n, z_dim]), std=1.0, group_ndims=1,
            n_samples=n_particles,
        )
        x_logits = decoder_logits(params, z.tensor)
        bn.deterministic("x_mean", jax.nn.sigmoid(x_logits))
        bn.bernoulli("x", x_logits, group_ndims=1, dtype=jnp.float32)
        return bn

    return gen()


def build_q(params, x, z_dim, n_particles, key):
    bn = zs.BayesianNet(key=key)
    h = x.reshape(x.shape[:-1] + (28, 28, 1))
    h = jax.nn.relu(conv_apply(params["e_conv1"], h, stride=2))
    h = jax.nn.relu(conv_apply(params["e_conv2"], h, stride=2))
    h = h.reshape(h.shape[:-3] + (7 * 7 * 64,))
    h = jax.nn.relu(linear_apply(params["e_fc"], h))
    z_mean = linear_apply(params["z_mean"], h)
    z_logstd = linear_apply(params["z_logstd"], h)
    bn.normal(
        "z", z_mean, logstd=z_logstd, group_ndims=1, n_samples=n_particles
    )
    return bn


def elbo_loss(params, x, key, z_dim, n_particles=1):
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key)
    model = build_gen(params, n, z_dim, n_particles)
    lower_bound = elbo(model, {"x": x}, variational=variational, axis=0)
    return jnp.mean(lower_bound.sgvb())


def main(epochs=10, batch_size=128, z_dim=40):
    from examples.utils.dataset import load_binary_mnist

    x_train, _, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        loss, grads = jax.value_and_grad(elbo_loss)(params, x, key, z_dim)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, -loss

    n_batches = x_train.shape[0] // batch_size
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        perm = np.random.RandomState(epoch).permutation(x_train.shape[0])
        lbs = []
        for i in range(min(n_batches, 300)):
            batch = jnp.asarray(
                x_train[perm[i * batch_size:(i + 1) * batch_size]]
            )
            key, sub = jax.random.split(key)
            params, opt_state, lb = train_step(params, opt_state, batch, sub)
            lbs.append(lb)
        print("Epoch {} ({:.1f}s): Lower bound = {:.4f}".format(
            epoch, time.time() - t0, float(jnp.mean(jnp.stack(lbs)))
        ))


if __name__ == "__main__":
    main()
