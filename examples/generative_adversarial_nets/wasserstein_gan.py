"""Wasserstein GAN with weight clipping.

Parity: reference
``examples/generative_adversarial_nets/wasserstein_gan.py``: same
generator-as-BayesianNet as DCGAN, critic loss = mean(f(fake)) -
mean(f(real)), RMSProp optimizers, weight clipping to [-0.01, 0.01],
n_critic updates per generator update.
Run: ``python -m examples.generative_adversarial_nets.wasserstein_gan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from examples.generative_adversarial_nets.dcgan import (
    discriminator,
    generator,
    init_disc_params,
    init_gen_params,
    synthetic_cifar,
)


def critic_loss(disc_params, gen_params, x_real, key, z_dim):
    n = x_real.shape[0]
    bn = generator(gen_params, n, z_dim, key)
    x_gen = bn["x_gen"]
    return jnp.mean(discriminator(disc_params, x_gen)) - jnp.mean(
        discriminator(disc_params, x_real)
    )


def gen_loss(gen_params, disc_params, x_real, key, z_dim):
    n = x_real.shape[0]
    bn = generator(gen_params, n, z_dim, key)
    return -jnp.mean(discriminator(disc_params, bn["x_gen"]))


def main(epochs=5, batch_size=64, z_dim=40, n_critic=5, clip=0.01,
         ngf=64, ndf=32, lr=5e-5, x_train=None, iters_per_epoch=50):
    """Full WGAN training loop (reference wasserstein_gan.py:72-117).
    Returns ``(gen_params, disc_params, history)`` with per-epoch mean
    W-distance estimates and generator losses so callers (and the
    training-dynamics tests) can assert the W-distance estimate shrinks."""
    if x_train is None:
        from examples.utils.dataset import load_cifar10

        x_train, _, _, _, synthetic = load_cifar10(normalize=True)
        x_train = x_train[:10000]
        if synthetic:
            print("[note] CIFAR-10 not found; using synthetic "
                  "CIFAR-shaped data (zero-egress env).")

    key = jax.random.PRNGKey(1234)
    key, kg, kd = jax.random.split(key, 3)
    gen_params = init_gen_params(kg, z_dim, ngf=ngf)
    disc_params = init_disc_params(kd, ndf=ndf)
    g_opt = optax.rmsprop(lr)
    d_opt = optax.rmsprop(lr)
    g_state = g_opt.init(gen_params)
    d_state = d_opt.init(disc_params)

    @jax.jit
    def critic_step(disc_params, d_state, gen_params, x, key):
        loss, grads = jax.value_and_grad(critic_loss)(
            disc_params, gen_params, x, key, z_dim
        )
        updates, d_state = d_opt.update(grads, d_state)
        disc_params = optax.apply_updates(disc_params, updates)
        # Weight clipping enforces the Lipschitz constraint.
        disc_params = jax.tree.map(
            lambda w: jnp.clip(w, -clip, clip), disc_params
        )
        return disc_params, d_state, loss

    @jax.jit
    def gen_step(gen_params, g_state, disc_params, x, key):
        loss, grads = jax.value_and_grad(gen_loss)(
            gen_params, disc_params, x, key, z_dim
        )
        updates, g_state = g_opt.update(grads, g_state)
        return optax.apply_updates(gen_params, updates), g_state, loss

    iters = x_train.shape[0] // batch_size
    history = {"w_dist": [], "gen_loss": []}
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(x_train.shape[0])
        w_dists, gls = [], []
        for t in range(min(iters, iters_per_epoch)):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            x = jnp.asarray(x_train[idx])
            for _ in range(n_critic):
                key, sub = jax.random.split(key)
                disc_params, d_state, closs = critic_step(
                    disc_params, d_state, gen_params, x, sub
                )
            key, sub = jax.random.split(key)
            gen_params, g_state, gl = gen_step(
                gen_params, g_state, disc_params, x, sub
            )
            w_dists.append(-float(closs))
            gls.append(float(gl))
        history["w_dist"].append(float(np.mean(w_dists)))
        history["gen_loss"].append(float(np.mean(gls)))
        print("Epoch {}: W-distance est = {:.4f}, gen loss = {:.4f}".format(
            epoch, np.mean(w_dists), np.mean(gls)
        ))
    return gen_params, disc_params, history


if __name__ == "__main__":
    main()
