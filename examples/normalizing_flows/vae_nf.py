"""VAE with a planar-normalizing-flow-enriched posterior.

Parity: reference ``examples/normalizing_flows/vae_nf.py``: planar flows
applied to the q samples, plugged into the ELBO via the
``latent={name: (samples, log_probs)}`` interface (reference :70-77).
Run: ``python -m examples.normalizing_flows.vae_nf``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.transform import init_planar_flow, planar_normalizing_flow
from zhusuan_tpu.variational import elbo
from examples.variational_autoencoders.vae import build_gen, build_q, init_params


def nf_elbo_loss(params, x, key, z_dim, n_particles=1, n_flows=10):
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key)
    z_node = variational["z"]
    z_samples = z_node.tensor  # [K, n, z_dim]
    log_qz = z_node.cond_log_p  # [K, n]
    # Enrich q with planar flows (reference vae_nf.py:70-77).
    z_flowed, log_qz_flowed = planar_normalizing_flow(
        z_samples, log_qz, params["flow"]
    )
    model = build_gen(params, x.shape[-1], z_dim, n, n_particles)
    lower_bound = elbo(
        model, {"x": x}, latent={"z": (z_flowed, log_qz_flowed)}, axis=0
    )
    return jnp.mean(lower_bound.sgvb())


def main():
    from examples.utils.dataset import load_binary_mnist

    x_train, _, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim, z_dim, n_flows = 784, 40, 10
    batch_size, epochs = 128, 10

    key = jax.random.PRNGKey(1234)
    key, k_init, k_flow = jax.random.split(key, 3)
    params = init_params(k_init, x_dim, z_dim)
    params["flow"] = init_planar_flow(k_flow, n_flows, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        loss, grads = jax.value_and_grad(nf_elbo_loss)(
            params, x, key, z_dim
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, -loss

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
        print("Epoch {} ({:.1f}s): Lower bound = {:.4f}".format(
            epoch, time.time() - t0, float(jnp.mean(jnp.stack(lbs)))
        ))


if __name__ == "__main__":
    main()
