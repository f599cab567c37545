"""Bayesian neural network regression with SGHMC + EM on prior scales.

Parity: reference ``examples/bayesian_neural_nets/bnn_sgmcmc.py`` (BASELINE
config #4 part 2): SGHMC over the weights (20 particles as parallel
chains), M-step re-estimating the per-weight prior logstds from the
particle second moments (reference :82-100), minibatch-rescaled log_joint.
Run: ``python -m examples.bayesian_neural_nets.bnn_sgmcmc``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from examples.utils import dataset


def build_bnn(x, layer_sizes, logstds, n_particles):
    """p(W | logstds) p(y | x, W) (reference bnn_sgmcmc.py:19-36)."""

    @zs.meta_bayesian_net()
    def bnn():
        bn = zs.BayesianNet()
        h = jnp.tile(x[None, ...], (n_particles, 1, 1))
        for i, (n_in, n_out) in enumerate(
            zip(layer_sizes[:-1], layer_sizes[1:])
        ):
            w = bn.normal(
                "w" + str(i), jnp.zeros([n_out, n_in + 1]),
                logstd=logstds[i], group_ndims=2, n_samples=n_particles,
            )
            h = jnp.concatenate([h, jnp.ones(h.shape[:-1] + (1,))], -1)
            h = jnp.einsum("imk,ijk->ijm", w.tensor, h) / jnp.sqrt(
                jnp.asarray(h.shape[-1], h.dtype)
            )
            if i < len(layer_sizes) - 2:
                h = jax.nn.relu(h)
        bn.deterministic("y_mean", jnp.squeeze(h, -1))
        bn.normal("y", bn.get("y_mean"), logstd=-0.95)
        return bn

    return bnn()


def main(epochs=500, batch_size=100, n_particles=20):
    x_train, y_train, x_valid, y_valid, x_test, y_test, synthetic = (
        dataset.load_uci_protein_data()
    )
    if synthetic:
        print("[note] UCI protein not found; using synthetic regression "
              "data (zero-egress env).")
    x_train = np.vstack([x_train, x_valid])
    y_train = np.hstack([y_train, y_valid])
    n_train, x_dim = x_train.shape
    x_train, x_test, _, _ = dataset.standardize(x_train, x_test)
    y_train, y_test, mean_y_train, std_y_train = dataset.standardize(
        y_train, y_test
    )

    layer_sizes = [x_dim, 50, 1]
    w_names = ["w" + str(i) for i in range(len(layer_sizes) - 1)]

    key = jax.random.PRNGKey(1237)
    key, k_init = jax.random.split(key)
    w_init = {}
    for i, (n_in, n_out) in enumerate(zip(layer_sizes[:-1], layer_sizes[1:])):
        k_init, sub = jax.random.split(k_init)
        w_init[w_names[i]] = (
            jax.random.uniform(sub, (n_particles, n_out, n_in + 1)) * 4 - 2
        )
    logstds = [jnp.zeros([n_out, n_in + 1])
               for n_in, n_out in zip(layer_sizes[:-1], layer_sizes[1:])]

    sgmcmc = zs.SGHMC(
        learning_rate=2e-6, friction=0.2, n_iter_resample_v=1000,
        second_order=True,
    )
    key, k_momentum = jax.random.split(key)
    state = sgmcmc.init(w_init, key=k_momentum)

    def make_model(x, logstds):
        model = build_bnn(x, layer_sizes, logstds, n_particles)

        def log_joint(bn):
            log_pws = bn.cond_log_prob(w_names)
            log_py_xw = bn.cond_log_prob("y")
            return sum(log_pws) + jnp.mean(log_py_xw, 1) * n_train

        model.log_joint = log_joint
        return model

    @jax.jit
    def e_step(state, logstds, x, y, key):
        """One SGHMC transition on a minibatch."""
        model = make_model(x, logstds)
        state, info = sgmcmc.sample(model, {"y": y}, state, key)
        return state, info.mean_k

    @jax.jit
    def m_step(state):
        """Re-estimate prior logstds from particle second moments
        (reference :97-100)."""
        return [
            0.5 * jnp.log(jnp.mean(state.q[name] ** 2, axis=0))
            for name in w_names
        ]

    @jax.jit
    def predict(state, logstds, x):
        model = make_model(x, logstds)
        bn = model.observe(**state.q)
        return jnp.mean(bn["y_mean"], 0)

    iters = (n_train - 1) // batch_size + 1
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(n_train)
        for t in range(iters):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, sub = jax.random.split(key)
            state, mean_k = e_step(
                state, logstds, jnp.asarray(x_train[idx]),
                jnp.asarray(y_train[idx]), sub,
            )
        logstds = m_step(state)
        if epoch % 50 == 0:
            y_pred = predict(state, logstds, jnp.asarray(x_test))
            rmse = float(
                jnp.sqrt(jnp.mean((y_pred - y_test) ** 2)) * std_y_train
            )
            print("Epoch {}: test rmse = {:.4f}".format(epoch, rmse))
    return state, logstds


if __name__ == "__main__":
    main()
