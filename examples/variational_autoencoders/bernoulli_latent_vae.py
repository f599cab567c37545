"""VAE with discrete Bernoulli latent, trained with REINFORCE + NN baseline.

Parity: reference
``examples/variational_autoencoders/bernoulli_latent_vae.py``: binary
latent code, score-function estimator ``elbo(...).reinforce(baseline=cx)``
with an input-dependent neural baseline (reference :82-90).

TPU-native: the moving-average center is explicit optimizer-side state
threaded through the jitted step.
Run: ``python -m examples.variational_autoencoders.bernoulli_latent_vae``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import elbo
from examples.utils.nn import init_linear, init_mlp, linear_apply, mlp_apply


def build_gen(params, x_dim, z_dim, n, n_particles):
    @zs.meta_bayesian_net()
    def gen():
        bn = zs.BayesianNet()
        z = bn.bernoulli(
            "z", jnp.zeros([n, z_dim]), group_ndims=1,
            n_samples=n_particles, dtype=jnp.float32,
        )
        h = mlp_apply(params["decoder"], z.tensor)
        bn.bernoulli("x", h, group_ndims=1, dtype=jnp.float32)
        return bn

    return gen()


def build_q(params, x, z_dim, n_particles, key):
    bn = zs.BayesianNet(key=key)
    h = mlp_apply(params["encoder"], x, final_activation=jax.nn.relu)
    z_logits = mlp_apply([params["z_logits"]], h)
    bn.bernoulli(
        "z", z_logits, group_ndims=1, n_samples=n_particles,
        dtype=jnp.float32,
    )
    return bn


def baseline_net(params, x):
    """Input-dependent baseline c(x) (reference :76-80)."""
    return jnp.squeeze(mlp_apply(params["baseline"], x), -1)


def init_params(key, x_dim=784, z_dim=40, hidden=500):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "decoder": init_mlp(k1, [z_dim, hidden, hidden, x_dim]),
        "encoder": init_mlp(k2, [x_dim, hidden, hidden]),
        "z_logits": init_linear(k3, hidden, z_dim),
        "baseline": init_mlp(k4, [x_dim, 100, 1]),
    }


def loss_fn(params, moving_mean, x, key, z_dim, n_particles=1):
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key)
    model = build_gen(params, x.shape[-1], z_dim, n, n_particles)
    lower_bound = elbo(model, {"x": x}, variational=variational, axis=0)
    cx = baseline_net(params, x)
    cost, baseline_cost, new_mm = lower_bound.reinforce(
        baseline=cx, moving_mean=moving_mean
    )
    return jnp.mean(cost + baseline_cost), (jnp.mean(lower_bound.tensor),
                                            new_mm)


def main():
    from examples.utils.dataset import load_binary_mnist

    x_train, _, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim, z_dim = 784, 40
    batch_size, epochs = 128, 10

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_dim, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    moving_mean = jnp.asarray(0.0)

    @jax.jit
    def train_step(params, opt_state, moving_mean, x, key):
        (loss, (lb, new_mm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, moving_mean, x, key, z_dim)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, new_mm, lb

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
            params, opt_state, moving_mean, lb = train_step(
                params, opt_state, moving_mean, batch, sub
            )
            lbs.append(lb)
        print("Epoch {} ({:.1f}s): Lower bound = {:.4f}".format(
            epoch, time.time() - t0, float(jnp.mean(jnp.stack(lbs)))
        ))


if __name__ == "__main__":
    main()
