"""Categorical-latent VAE trained with the Gumbel-softmax (ExpConcrete)
relaxation (Maddison et al. 2017; Jang et al. 2017).

Beyond the reference's zoo: upstream ZhuSuan ships the Concrete
distribution family (reference ``multivariate.py:683-960``) but no example
using it — its discrete-latent VAE trains with REINFORCE
(``bernoulli_latent_vae.py``). Here both prior and posterior are relaxed
in LOG-simplex space (ExpConcrete — numerically stabler than Concrete:
no log of near-zero simplex coordinates), so the whole objective is
reparameterized and trains with plain SGVB — no score-function variance,
no baseline network.

Latent code: ``n_vars`` categorical variables with ``n_classes`` classes
each, the standard Gumbel-softmax VAE configuration. The decoder consumes
``exp(z)`` (soft one-hots; hard one-hots in the zero-temperature limit).

Run: ``python -m examples.variational_autoencoders.gumbel_softmax_vae``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from examples.utils.nn import init_linear, init_mlp, linear_apply, mlp_apply
from zhusuan_tpu.variational import elbo


def build_gen(params, n_vars, n_classes, n, temperature, n_particles):
    @zs.meta_bayesian_net()
    def gen():
        bn = zs.BayesianNet()
        z = bn.exp_concrete(
            "z", temperature,
            # uniform relaxed prior; dtype follows the temperature so the
            # example is clean under the x64 test config.
            jnp.zeros([n, n_vars, n_classes],
                      jnp.asarray(temperature).dtype),
            group_ndims=2, n_samples=n_particles,
        )
        flat = jnp.exp(z.tensor).reshape(
            z.tensor.shape[:-2] + (n_vars * n_classes,)
        )
        h = mlp_apply(params["decoder"], flat)
        bn.bernoulli("x", h, group_ndims=1, dtype=jnp.float32)
        return bn

    return gen()


def build_q(params, x, n_vars, n_classes, temperature, n_particles, key):
    bn = zs.BayesianNet(key=key)
    h = mlp_apply(params["encoder"], x, final_activation=jax.nn.relu)
    logits = linear_apply(params["z_logits"], h).reshape(
        x.shape[:-1] + (n_vars, n_classes)
    )
    bn.exp_concrete(
        "z", temperature, logits, group_ndims=2, n_samples=n_particles
    )
    return bn


def init_params(key, x_dim=784, n_vars=20, n_classes=10, hidden=400):
    k1, k2, k3 = jax.random.split(key, 3)
    code = n_vars * n_classes
    return {
        "decoder": init_mlp(k1, [code, hidden, x_dim]),
        "encoder": init_mlp(k2, [x_dim, hidden]),
        "z_logits": init_linear(k3, hidden, code),
    }


def loss_fn(params, x, key, n_vars, n_classes, temperature,
            n_particles=1):
    n = x.shape[0]
    variational = build_q(
        params, x, n_vars, n_classes, temperature, n_particles, key
    )
    model = build_gen(
        params, n_vars, n_classes, n, temperature, n_particles
    )
    lower_bound = elbo(model, {"x": x}, variational=variational, axis=0)
    return jnp.mean(lower_bound.sgvb()), jnp.mean(lower_bound.tensor)


def main(epochs=10, batch_size=128, n_vars=20, n_classes=10):
    from examples.utils.dataset import load_binary_mnist

    x_train, _, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim = x_train.shape[-1]

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_dim, n_vars, n_classes)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key, temperature):
        (loss, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, key, n_vars, n_classes, temperature
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, lb

    n = x_train.shape[0]
    for epoch in range(epochs):
        # Anneal the relaxation temperature 1.0 -> 0.5 over training.
        tau = jnp.asarray(1.0 - 0.5 * epoch / max(epochs - 1, 1),
                          jnp.float32)
        perm = np.random.RandomState(epoch).permutation(n)
        lbs = []
        for i in range(0, n - batch_size + 1, batch_size):
            x = jnp.asarray(x_train[perm[i:i + batch_size]])
            key, sub = jax.random.split(key)
            params, opt_state, lb = train_step(
                params, opt_state, x, sub, tau
            )
            lbs.append(float(lb))
        print("Epoch {}: tau {:.2f}, relaxed lower bound = {:.2f}".format(
            epoch + 1, float(tau), float(np.mean(lbs))))
    return params


if __name__ == "__main__":
    main()
