"""Deep sigmoid belief net trained with VIMCO.

Parity: reference ``examples/sigmoid_belief_nets/sbn_vimco.py`` (BASELINE
config #5 part 1): 3 stochastic Bernoulli layers (h_dim 200),
``importance_weighted_objective(...).vimco()`` with k=10.
Run: ``python -m examples.sigmoid_belief_nets.sbn_vimco``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import importance_weighted_objective
from examples.sigmoid_belief_nets.sbn import (
    build_q_net,
    build_sbn,
    init_sbn_params,
)
from examples.utils.dataset import load_binary_mnist


def vimco_loss(params, x, key, h_dim, n_particles):
    n, x_dim = x.shape
    variational = build_q_net(params, x, h_dim, n_particles, key)
    model = build_sbn(params, n, x_dim, h_dim, n_particles)
    lower_bound = importance_weighted_objective(
        model, observed={"x": x}, variational=variational, axis=0
    )
    return jnp.mean(lower_bound.vimco()), jnp.mean(lower_bound.tensor)


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
        (cost, lb), grads = jax.value_and_grad(vimco_loss, has_aux=True)(
            params, x, key, h_dim, lb_samples
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, lb

    @jax.jit
    def test_ll(params, x, key):
        n = x.shape[0]
        variational = build_q_net(params, x, h_dim, 1000, key)
        model = build_sbn(params, n, x.shape[1], h_dim, 1000)
        return jnp.mean(
            zs.evaluation.is_loglikelihood(
                model, {"x": x}, proposal=variational, axis=0
            )
        )

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
        if epoch % 5 == 0:
            key, sub = jax.random.split(key)
            ll = test_ll(params, jnp.asarray(x_test[:500]), sub)
            print(">>> TEST LOG LIKELIHOOD (IS, k=1000) = {:.4f}".format(
                float(ll)
            ))
    return params


if __name__ == "__main__":
    main()
