"""Semi-supervised VAE (Kingma M2 model).

Parity: reference ``examples/semi_supervised_vae/vae_ssl.py``: labeled ELBO
+ unlabeled ELBO marginalizing y over all classes + scaled classifier cost
(reference :95-133; beta = 1200 * labeled fraction semantics preserved).
Run: ``python -m examples.semi_supervised_vae.vae_ssl``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import elbo
from examples.utils.nn import init_linear, init_mlp, linear_apply, mlp_apply


def build_gen(params, n, x_dim, n_class, z_dim, n_particles):
    """p(z) p(y) p(x | z, y) (reference vae_ssl.py:20-33)."""

    @zs.meta_bayesian_net()
    def gen():
        bn = zs.BayesianNet()
        z = bn.normal(
            "z", jnp.zeros([n, z_dim]), std=1.0, group_ndims=1,
            n_samples=n_particles,
        )
        h_from_z = linear_apply(params["gen_z_h"], z.tensor)
        y = bn.onehot_categorical(
            "y", jnp.zeros([n, n_class]), dtype=jnp.float32
        )
        h_from_y = linear_apply(params["gen_y_h"], y.tensor)
        h = jax.nn.relu(h_from_z + h_from_y)
        h = jax.nn.relu(linear_apply(params["gen_h_h"], h))
        x_logits = linear_apply(params["gen_h_x"], h)
        bn.bernoulli("x", x_logits, group_ndims=1, dtype=jnp.float32)
        return bn

    return gen()


def qz_xy(params, x, y, z_dim, n_particles, key):
    """q(z | x, y) (reference vae_ssl.py:36-46)."""
    bn = zs.BayesianNet(key=key)
    h = jnp.concatenate([x, y], -1)
    h = mlp_apply(params["qz_net"], h, final_activation=jax.nn.relu)
    z_mean = linear_apply(params["qz_mean"], h)
    z_logstd = linear_apply(params["qz_logstd"], h)
    bn.normal(
        "z", z_mean, logstd=z_logstd, group_ndims=1, n_samples=n_particles
    )
    return bn


def qy_x(params, x, n_class):
    """Classifier logits q(y | x) (reference vae_ssl.py:49-54)."""
    return mlp_apply(params["classifier"], x)


def init_params(key, x_dim, n_class, z_dim, hidden=500):
    keys = jax.random.split(key, 8)
    return {
        "gen_z_h": init_linear(keys[0], z_dim, hidden),
        "gen_y_h": init_linear(keys[1], n_class, hidden),
        "gen_h_h": init_linear(keys[2], hidden, hidden),
        "gen_h_x": init_linear(keys[3], hidden, x_dim),
        "qz_net": init_mlp(keys[4], [x_dim + n_class, hidden, hidden]),
        "qz_mean": init_linear(keys[5], hidden, z_dim),
        "qz_logstd": init_linear(keys[6], hidden, z_dim),
        "classifier": init_mlp(keys[7], [x_dim, hidden, hidden, n_class]),
    }


def ssl_cost(params, x_l, y_l, x_u, key, n_class, z_dim, n_particles, beta):
    """Labeled ELBO + unlabeled marginalized ELBO + classifier cost
    (reference vae_ssl.py:95-133)."""
    k_l, k_u = jax.random.split(key)

    # Labeled term.
    n_l = x_l.shape[0]
    variational_l = qz_xy(params, x_l, y_l, z_dim, n_particles, k_l)
    model_l = build_gen(params, n_l, x_l.shape[-1], n_class, z_dim,
                        n_particles)
    labeled_lb = jnp.mean(
        elbo(model_l, {"x": x_l, "y": y_l}, variational=variational_l,
             axis=0).tensor
    )

    # Unlabeled term: tile x over every possible class.
    n_u = x_u.shape[0]
    y_diag = jnp.eye(n_class, dtype=x_u.dtype)
    y_u = jnp.reshape(
        jnp.tile(y_diag[None], (n_u, 1, 1)), (-1, n_class)
    )
    x_tiled = jnp.reshape(
        jnp.tile(x_u[:, None, :], (1, n_class, 1)), (-1, x_u.shape[-1])
    )
    variational_u = qz_xy(params, x_tiled, y_u, z_dim, n_particles, k_u)
    model_u = build_gen(params, n_u * n_class, x_u.shape[-1], n_class,
                        z_dim, n_particles)
    lb_z = elbo(model_u, {"x": x_tiled, "y": y_u},
                variational=variational_u, axis=0).tensor
    lb_z = jnp.reshape(lb_z, (-1, n_class))
    qy_logits_u = qy_x(params, x_u, n_class)
    qy_u = jax.nn.softmax(qy_logits_u) + 1e-8
    qy_u = qy_u / jnp.sum(qy_u, -1, keepdims=True)
    log_qy_u = jnp.log(qy_u)
    unlabeled_lb = jnp.mean(jnp.sum(qy_u * (lb_z - log_qy_u), -1))

    # Classifier cost on labeled data.
    qy_logits_l = qy_x(params, x_l, n_class)
    log_qy_x = zs.distributions.OnehotCategorical(
        qy_logits_l, dtype=x_l.dtype
    ).log_prob(y_l)
    classifier_cost = -beta * jnp.mean(log_qy_x)

    acc = jnp.mean(
        (jnp.argmax(qy_logits_l, -1) == jnp.argmax(y_l, -1)).astype(
            jnp.float32
        )
    )
    cost = -(labeled_lb + unlabeled_lb) + classifier_cost
    return cost, (labeled_lb, unlabeled_lb, acc)


def main(epochs=10, batch_size=100, lb_samples=10, z_dim=100, beta=1200.0):
    from examples.utils.dataset import load_mnist_semi_supervised

    n_class = 10
    # 100 labeled examples (10 per class), rest unlabeled (M2 protocol).
    x_labeled, t_labeled, x_unlabeled, x_test, t_test, synthetic = (
        load_mnist_semi_supervised(n_labeled=100)
    )
    t_labeled = t_labeled.astype(np.float32)
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim = x_labeled.shape[1]

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_dim, n_class, z_dim)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x_l, y_l, x_u, key):
        (cost, aux), grads = jax.value_and_grad(ssl_cost, has_aux=True)(
            params, x_l, y_l, x_u, key, n_class, z_dim, lb_samples, beta
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, aux

    iters = x_unlabeled.shape[0] // batch_size
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(x_unlabeled.shape[0])
        stats = []
        for t in range(min(iters, 200)):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, k_bin, sub = jax.random.split(key, 3)
            x_l = (jax.random.uniform(k_bin, x_labeled.shape)
                   < x_labeled).astype(jnp.float32)
            x_u = jnp.asarray(
                (np.random.RandomState(epoch * 1000 + t).rand(
                    *x_unlabeled[idx].shape) < x_unlabeled[idx]
                 ).astype(np.float32)
            )
            params, opt_state, aux = train_step(
                params, opt_state, x_l, jnp.asarray(t_labeled), x_u, sub
            )
            stats.append([float(a) for a in aux])
        lb_l, lb_u, acc = np.mean(stats, axis=0)
        print(
            "Epoch {}: labeled lb = {:.2f}, unlabeled lb = {:.2f}, "
            "train acc = {:.4f}".format(epoch, lb_l, lb_u, acc)
        )
    return params


if __name__ == "__main__":
    main()
