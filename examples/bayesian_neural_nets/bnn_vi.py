"""Bayesian neural network regression with mean-field SGVB.

Parity: reference ``examples/bayesian_neural_nets/bnn_vi.py`` (BASELINE
config #4 part 1): weight-space Normal priors with ``group_ndims=2``,
mean-field Normal posterior, custom minibatch-rescaled ``log_joint``
(reference :83-88), posterior-predictive RMSE and test log-likelihood.
Run: ``python -m examples.bayesian_neural_nets.bnn_vi``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.utils import log_mean_exp
from examples.utils import dataset


def build_bnn(x, layer_sizes, n_particles, y_logstd):
    """The model p(W) p(y | x, W) (reference bnn_vi.py:18-36)."""

    @zs.meta_bayesian_net()
    def bnn():
        bn = zs.BayesianNet()
        h = jnp.tile(x[None, ...], (n_particles, 1, 1))
        for i, (n_in, n_out) in enumerate(
            zip(layer_sizes[:-1], layer_sizes[1:])
        ):
            w = bn.normal(
                "w" + str(i), jnp.zeros([n_out, n_in + 1]), std=1.0,
                group_ndims=2, n_samples=n_particles,
            )
            h = jnp.concatenate(
                [h, jnp.ones(h.shape[:-1] + (1,))], axis=-1
            )
            h = jnp.einsum("imk,ijk->ijm", w.tensor, h) / jnp.sqrt(
                jnp.asarray(h.shape[-1], h.dtype)
            )
            if i < len(layer_sizes) - 2:
                h = jax.nn.relu(h)
        y_mean = bn.deterministic("y_mean", jnp.squeeze(h, -1))
        bn.normal("y", y_mean, logstd=y_logstd)
        return bn

    return bnn()


def build_variational(params, layer_sizes, n_particles, key):
    """Mean-field Normal posterior over weights (reference :38-50)."""
    bn = zs.BayesianNet(key=key)
    for i in range(len(layer_sizes) - 1):
        bn.normal(
            "w" + str(i), params["w_means"][i],
            logstd=params["w_logstds"][i],
            n_samples=n_particles, group_ndims=2,
        )
    return bn


def init_params(layer_sizes):
    w_means, w_logstds = [], []
    for n_in, n_out in zip(layer_sizes[:-1], layer_sizes[1:]):
        w_means.append(jnp.zeros([n_out, n_in + 1]))
        w_logstds.append(jnp.zeros([n_out, n_in + 1]))
    return {
        "w_means": w_means,
        "w_logstds": w_logstds,
        "y_logstd": jnp.asarray(0.0),
    }


def make_loss(layer_sizes, n_train, n_particles):
    w_names = ["w" + str(i) for i in range(len(layer_sizes) - 1)]

    def loss_fn(params, x, y, key):
        model = build_bnn(x, layer_sizes, n_particles, params["y_logstd"])

        def log_joint(bn):
            log_pws = bn.cond_log_prob(w_names)
            log_py_xw = bn.cond_log_prob("y")
            return sum(log_pws) + jnp.mean(log_py_xw, 1) * n_train

        model.log_joint = log_joint
        variational = build_variational(params, layer_sizes, n_particles, key)
        lower_bound = zs.variational.elbo(
            model, {"y": y}, variational=variational, axis=0
        )
        return jnp.mean(lower_bound.sgvb())

    return loss_fn


def predict(params, x, y, layer_sizes, n_particles, key, std_y_train):
    """Posterior-predictive RMSE and log-likelihood (reference :98-106)."""
    model = build_bnn(x, layer_sizes, n_particles, params["y_logstd"])
    variational = build_variational(params, layer_sizes, n_particles, key)
    lower_bound = zs.variational.elbo(
        model, {"y": y}, variational=variational, axis=0
    )
    bn = lower_bound.bn
    y_mean = bn["y_mean"]  # [n_particles, n]
    y_pred = jnp.mean(y_mean, 0)
    rmse = jnp.sqrt(jnp.mean((y_pred - y) ** 2)) * std_y_train
    log_py_xw = bn.cond_log_prob("y")
    log_likelihood = jnp.mean(log_mean_exp(log_py_xw, 0)) - jnp.log(
        std_y_train
    )
    return rmse, log_likelihood


def main(epochs=500, batch_size=10, lb_samples=10, ll_samples=5000):
    x_train, y_train, x_valid, y_valid, x_test, y_test, synthetic = (
        dataset.load_uci_boston_housing()
    )
    if synthetic:
        print("[note] UCI housing not found; using synthetic regression "
              "data (zero-egress env).")
    x_train = np.vstack([x_train, x_valid])
    y_train = np.hstack([y_train, y_valid])
    n_train, x_dim = x_train.shape
    x_train, x_test, _, _ = dataset.standardize(x_train, x_test)
    y_train, y_test, mean_y_train, std_y_train = dataset.standardize(
        y_train, y_test
    )

    layer_sizes = [x_dim, 50, 1]
    params = init_params(layer_sizes)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    loss_fn = make_loss(layer_sizes, n_train, lb_samples)

    @jax.jit
    def train_step(params, opt_state, x, y, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, -loss

    pred = jax.jit(
        lambda p, x, y, k: predict(
            p, x, y, layer_sizes, ll_samples, k, std_y_train
        )
    )

    key = jax.random.PRNGKey(1237)
    iters = (n_train - 1) // batch_size + 1
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(n_train)
        lbs = []
        for t in range(iters):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, lb = train_step(
                params, opt_state, jnp.asarray(x_train[idx]),
                jnp.asarray(y_train[idx]), sub,
            )
            lbs.append(lb)
        if epoch % 50 == 0:
            key, sub = jax.random.split(key)
            rmse, ll = pred(
                params, jnp.asarray(x_test), jnp.asarray(y_test), sub
            )
            print(
                "Epoch {}: Lower bound = {:.4f}, test rmse = {:.4f}, "
                "test ll = {:.4f}".format(
                    epoch, float(jnp.mean(jnp.stack(lbs))), float(rmse),
                    float(ll),
                )
            )
    return params


if __name__ == "__main__":
    main()
