"""Importance-weighted autoencoder (IWAE) on binarized MNIST.

Parity: reference ``examples/variational_autoencoders/iwae.py`` (BASELINE
config #3 part 2): same 2x500 nets as the VAE;
``importance_weighted_objective(...).sgvb()`` with k=50.
Run: ``python -m examples.variational_autoencoders.iwae``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import importance_weighted_objective
from examples.variational_autoencoders.vae import (
    build_gen,
    build_q,
    eval_is_loglikelihood,
    init_params,
)


def iwae_loss(params, x, key, z_dim, n_particles=50):
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key)
    model = build_gen(params, x.shape[-1], z_dim, n, n_particles)
    lower_bound = importance_weighted_objective(
        model, {"x": x}, variational=variational, axis=0
    )
    return jnp.mean(lower_bound.sgvb())


def make_train_step(optimizer, z_dim, n_particles=50):
    @jax.jit
    def train_step(params, opt_state, x, key):
        loss, grads = jax.value_and_grad(iwae_loss)(
            params, x, key, z_dim, n_particles
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, -loss

    return train_step


def main():
    from examples.utils.dataset import load_binary_mnist

    x_train, x_valid, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim, z_dim, k = 784, 40, 50
    batch_size, epochs = 64, 10

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_dim, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(optimizer, z_dim, k)

    n_batches = x_train.shape[0] // batch_size
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        perm = np.random.RandomState(epoch).permutation(x_train.shape[0])
        lbs = []
        for i in range(n_batches):
            batch = jnp.asarray(
                x_train[perm[i * batch_size:(i + 1) * batch_size]]
            )
            key, sub = jax.random.split(key)
            params, opt_state, lb = train_step(params, opt_state, batch, sub)
            lbs.append(lb)
        print("Epoch {} ({:.1f}s): IW bound (k={}) = {:.4f}".format(
            epoch, time.time() - t0, k, float(jnp.mean(jnp.stack(lbs)))
        ))
        if epoch % 5 == 0:
            key, sub = jax.random.split(key)
            test_ll = eval_is_loglikelihood(
                params, jnp.asarray(x_test[:1000]), sub, z_dim, 1000
            )
            print(">>> TEST LOG LIKELIHOOD (IS, k=1000) = {:.4f}".format(
                test_ll
            ))


if __name__ == "__main__":
    main()
