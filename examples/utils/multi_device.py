"""Data-parallel training over a device mesh.

Parity target: reference ``examples/utils/multi_gpu.py`` (in-graph tower
replication with CPU-side ``average_gradients``, :24-60). The TPU-native
replacement is :func:`zhusuan_tpu.parallel.data_parallel_grad`: the batch is
sharded over the mesh, per-shard gradients are ``pmean``-reduced over ICI
inside ``shard_map``, parameters stay replicated. This module demonstrates
it on the flagship VAE.

Run (uses all visible devices; with one chip it degenerates gracefully):
``python -m examples.utils.multi_device``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zhusuan_tpu.parallel import chain_mesh, data_parallel_grad


def main(steps=100, z_dim=40, per_device_batch=64):
    from examples.variational_autoencoders.vae import elbo_loss, init_params
    from examples.utils.dataset import load_binary_mnist

    n_dev = len(jax.devices())
    mesh = chain_mesh(axis_name="dp")
    print("Devices: {} -> mesh {}".format(n_dev, mesh))

    x_train, _, _, synthetic = load_binary_mnist()
    batch_size = per_device_batch * n_dev

    key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, 784, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, batch, key):
        return elbo_loss(params, batch, key, z_dim)

    dp_value_and_grad = data_parallel_grad(loss_fn, mesh, axis_name="dp")

    @jax.jit
    def apply(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    t0 = time.time()
    with mesh:
        for i in range(steps):
            idx = np.random.RandomState(i).randint(
                0, x_train.shape[0], batch_size
            )
            key, sub = jax.random.split(key)
            loss, grads = dp_value_and_grad(
                params, jnp.asarray(x_train[idx]), sub
            )
            params, opt_state = apply(params, opt_state, grads)
            if i % 20 == 0:
                print("step {}: -elbo = {:.2f}".format(i, float(loss)))
    print("{} steps on {} devices in {:.1f}s".format(
        steps, n_dev, time.time() - t0
    ))
    return params


if __name__ == "__main__":
    main()
