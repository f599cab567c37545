"""Semi-supervised VAE with adaptive importance sampling (RWS proposals).

Parity: reference ``examples/semi_supervised_vae/vae_ssl_adaptive_is.py``:
non-reparameterized proposals adapted with ``klpq(...).importance()``
(reference :101-143); model trained on the IW bound; the unlabeled proposal
samples y from the classifier then z | x, y (reference :61-69); combined
classifier cost.
Run: ``python -m examples.semi_supervised_vae.vae_ssl_adaptive_is``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import importance_weighted_objective, klpq
from examples.semi_supervised_vae.vae_ssl import (
    build_gen,
    init_params,
    qy_x,
)
from examples.utils.nn import linear_apply, mlp_apply

MODEL_KEYS = ("gen_z_h", "gen_y_h", "gen_h_h", "gen_h_x")


def _qz_params(params, x, y, z_dim):
    h = jnp.concatenate([x, y], -1)
    h = mlp_apply(params["qz_net"], h, final_activation=jax.nn.relu)
    return (
        linear_apply(params["qz_mean"], h),
        linear_apply(params["qz_logstd"], h),
    )


def labeled_proposal(params, x, y, z_dim, n_particles, key):
    bn = zs.BayesianNet(key=key)
    z_mean, z_logstd = _qz_params(params, x, y, z_dim)
    bn.normal(
        "z", z_mean, logstd=z_logstd, n_samples=n_particles,
        group_ndims=1, is_reparameterized=False,
    )
    return bn


def unlabeled_proposal(params, x, n_class, z_dim, n_particles, key):
    bn = zs.BayesianNet(key=key)
    y_logits = qy_x(params, x, n_class)
    y = bn.onehot_categorical("y", y_logits, dtype=jnp.float32)
    z_mean, z_logstd = _qz_params(params, x, y.tensor, z_dim)
    bn.normal(
        "z", z_mean, logstd=z_logstd, group_ndims=1,
        is_reparameterized=False, n_samples=n_particles,
    )
    return bn


def adaptive_is_cost(params, x_l, y_l, x_u, key, n_class, z_dim,
                     n_particles, beta):
    k_l, k_u = jax.random.split(key)
    n_l, n_u = x_l.shape[0], x_u.shape[0]
    x_dim = x_l.shape[-1]

    def split_params(keep_model):
        return {
            k: (v if (k in MODEL_KEYS) == keep_model
                else jax.lax.stop_gradient(v))
            for k, v in params.items()
        }

    # ---- model update: IW bounds with proposal grads stopped ----------- #
    pm = split_params(True)
    prop_l = labeled_proposal(pm, x_l, y_l, z_dim, n_particles, k_l)
    model_l = build_gen(pm, n_l, x_dim, n_class, z_dim, n_particles)
    labeled_lb = jnp.mean(
        importance_weighted_objective(
            model_l, {"x": x_l, "y": y_l}, variational=prop_l, axis=0
        ).tensor
    )
    prop_u = unlabeled_proposal(pm, x_u, n_class, z_dim, n_particles, k_u)
    model_u = build_gen(pm, n_u, x_dim, n_class, z_dim, n_particles)
    unlabeled_lb = jnp.mean(
        importance_weighted_objective(
            model_u, {"x": x_u}, variational=prop_u, axis=0
        ).tensor
    )
    model_cost = -labeled_lb - unlabeled_lb

    # ---- proposal update: klpq with model grads stopped ---------------- #
    pq = split_params(False)
    prop_l2 = labeled_proposal(pq, x_l, y_l, z_dim, n_particles, k_l)
    model_l2 = build_gen(pq, n_l, x_dim, n_class, z_dim, n_particles)
    labeled_q_cost = jnp.mean(
        klpq(model_l2, {"x": x_l, "y": y_l}, variational=prop_l2,
             axis=0).importance()
    )
    prop_u2 = unlabeled_proposal(pq, x_u, n_class, z_dim, n_particles, k_u)
    model_u2 = build_gen(pq, n_u, x_dim, n_class, z_dim, n_particles)
    unlabeled_q_cost = jnp.mean(
        klpq(model_u2, {"x": x_u}, variational=prop_u2, axis=0).importance()
    )

    # ---- classifier cost ----------------------------------------------- #
    qy_logits_l = qy_x(pq, x_l, n_class)
    log_qy_x = zs.distributions.OnehotCategorical(
        qy_logits_l, dtype=x_l.dtype
    ).log_prob(y_l)
    classifier_cost = -beta * jnp.mean(log_qy_x)
    acc = jnp.mean(
        (jnp.argmax(qy_logits_l, -1) == jnp.argmax(y_l, -1)).astype(
            jnp.float32
        )
    )

    total = model_cost + labeled_q_cost + unlabeled_q_cost + classifier_cost
    return total, (labeled_lb, unlabeled_lb, acc)


def main(epochs=10, batch_size=100, n_particles=10, z_dim=100, beta=1200.0):
    from examples.utils.dataset import load_mnist_semi_supervised

    n_class = 10
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
        (cost, aux), grads = jax.value_and_grad(
            adaptive_is_cost, has_aux=True
        )(params, x_l, y_l, x_u, key, n_class, z_dim, n_particles, beta)
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
            "Epoch {}: labeled IW bound = {:.2f}, unlabeled IW bound = "
            "{:.2f}, train acc = {:.4f}".format(epoch, lb_l, lb_u, acc)
        )
    return params


if __name__ == "__main__":
    main()
