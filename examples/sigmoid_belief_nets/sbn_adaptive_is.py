"""Deep sigmoid belief net with adaptive importance sampling (RWS-style).

Parity: reference ``examples/sigmoid_belief_nets/sbn_adaptive_is.py``: the
model is trained on the importance-weighted bound while the proposal is
adapted with the self-normalized IS gradient of KL(p||q)
(``klpq(...).importance()``, reference :75-87); both parameter groups are
updated in one step.
Run: ``python -m examples.sigmoid_belief_nets.sbn_adaptive_is``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zhusuan_tpu.variational import importance_weighted_objective, klpq
from examples.sigmoid_belief_nets.sbn import (
    build_q_net,
    build_sbn,
    init_sbn_params,
)
from examples.utils.dataset import load_binary_mnist

MODEL_KEYS = ("g_h3_h2", "g_h2_h1", "g_h1_x")
PROPOSAL_KEYS = ("q_x_h1", "q_h1_h2", "q_h2_h3")


def combined_cost(params, x, key, h_dim, n_particles):
    """Model cost (-IW bound) + proposal cost (klpq importance), with each
    gradient flowing only into its own parameter group (reference :75-87)."""
    n, x_dim = x.shape
    # Model update: stop proposal grads through the bound.
    params_model = {
        k: (v if k in MODEL_KEYS else jax.lax.stop_gradient(v))
        for k, v in params.items()
    }
    variational = build_q_net(params_model, x, h_dim, n_particles, key)
    model = build_sbn(params_model, n, x_dim, h_dim, n_particles)
    lower_bound = importance_weighted_objective(
        model, observed={"x": x}, variational=variational, axis=0
    )
    model_cost = -jnp.mean(lower_bound.tensor)

    # Proposal update: stop model grads through the klpq cost.
    params_prop = {
        k: (v if k in PROPOSAL_KEYS else jax.lax.stop_gradient(v))
        for k, v in params.items()
    }
    variational2 = build_q_net(params_prop, x, h_dim, n_particles, key)
    model2 = build_sbn(params_prop, n, x_dim, h_dim, n_particles)
    klpq_obj = klpq(
        model2, observed={"x": x}, variational=variational2, axis=0
    )
    klpq_cost = jnp.mean(klpq_obj.importance())
    return model_cost + klpq_cost, jnp.mean(lower_bound.tensor)


def main(epochs=10, batch_size=24, lb_samples=10, h_dim=200):
    x_train, x_valid, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_dim = x_train.shape[1]

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_sbn_params(init_key, x_dim, h_dim)
    optimizer = optax.adam(1e-3, eps=1e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        (cost, lb), grads = jax.value_and_grad(
            combined_cost, has_aux=True
        )(params, x, key, h_dim, lb_samples)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, lb

    iters = x_train.shape[0] // batch_size
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        perm = np.random.RandomState(epoch).permutation(x_train.shape[0])
        lbs = []
        for t in range(min(iters, 500)):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, lb = train_step(
                params, opt_state, jnp.asarray(x_train[idx]), sub
            )
            lbs.append(lb)
        print("Epoch {} ({:.1f}s): IW bound = {:.4f}".format(
            epoch, time.time() - t0, float(jnp.mean(jnp.stack(lbs)))
        ))
    return params


if __name__ == "__main__":
    main()
