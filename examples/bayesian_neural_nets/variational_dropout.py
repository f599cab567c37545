"""Variational dropout: multiplicative-noise Bayesian MLP classifier.

Parity: reference ``examples/bayesian_neural_nets/variational_dropout.py``:
per-layer multiplicative noise variables ``eps ~ N(1, alpha)`` with
``alpha = sigmoid(logit_alpha)`` learned per input unit, dataset-rescaled
log-joint, ``elbo(...).sgvb()`` (reference :103-110). The reference's batch
norm is replaced by a plain affine+relu stack (orthogonal to the method).
Run: ``python -m examples.bayesian_neural_nets.variational_dropout``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from examples.utils import dataset
from examples.utils.nn import init_linear, linear_apply


def var_dropout(params, x, n, net_size, n_particles):
    """Model: eps noise on each layer's inputs, Categorical head
    (reference variational_dropout.py:18-37)."""

    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        h = jnp.tile(x[None], (n_particles, 1, 1))
        for i, (n_in, n_out) in enumerate(zip(net_size[:-1], net_size[1:])):
            eps = bn.normal(
                "layer{}/eps".format(i), jnp.ones([n, n_in]), std=1.0,
                n_samples=n_particles, group_ndims=1,
            )
            h = linear_apply(params["layers"][i], h * eps.tensor)
            if i < len(net_size) - 2:
                h = jax.nn.relu(h)
        bn.categorical("y", h)
        bn.deterministic("y_logit", h)
        return bn

    return model()


def build_q(params, n, net_size, n_particles, key):
    """q: eps ~ N(1, sqrt(sigmoid(logit_alpha))) per input unit
    (reference :40-51)."""
    bn = zs.BayesianNet(key=key)
    for i, (n_in, n_out) in enumerate(zip(net_size[:-1], net_size[1:])):
        std = jnp.sqrt(jax.nn.sigmoid(params["logit_alphas"][i]) + 1e-10)
        std = jnp.tile(std[None], (n, 1))
        bn.normal(
            "layer{}/eps".format(i), 1.0, std=std,
            n_samples=n_particles, group_ndims=1,
        )
    return bn


def init_params(key, net_size):
    layers, logit_alphas = [], []
    for n_in, n_out in zip(net_size[:-1], net_size[1:]):
        key, sub = jax.random.split(key)
        layers.append(init_linear(sub, n_in, n_out))
        logit_alphas.append(jnp.zeros([n_in]) - 3.0)
    return {"layers": layers, "logit_alphas": logit_alphas}


def main(epochs=30, batch_size=1000, lb_samples=10, net_hidden=(100, 100, 100)):
    x_train, y_train, x_valid, y_valid, x_test, y_test, synthetic = (
        dataset.load_mnist_realval()
    )
    if synthetic:
        print("[note] using synthetic MNIST-shaped data (zero-egress env).")
    x_train = np.vstack([x_train, x_valid]).astype(np.float32)
    y_train = np.concatenate([y_train, y_valid]).astype(np.int32)
    x_train, x_test, _, _ = dataset.standardize(x_train, x_test)
    n_x = x_train.shape[1]
    n_train = x_train.shape[0]
    net_size = [n_x, *net_hidden, 10]
    e_names = ["layer{}/eps".format(i) for i in range(len(net_size) - 1)]

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, net_size)
    optimizer = optax.adam(1e-3, eps=1e-4)
    opt_state = optimizer.init(params)

    def loss_fn(params, x, y, key, n_particles):
        n = x.shape[0]
        y_obs = jnp.tile(y[None], (n_particles, 1))
        model = var_dropout(params, x, n, net_size, n_particles)

        def log_joint(bn):
            log_pe = bn.cond_log_prob(e_names)
            log_py_xe = bn.cond_log_prob("y")
            return sum(log_pe) + log_py_xe * n_train

        model.log_joint = log_joint
        variational = build_q(params, n, net_size, n_particles, key)
        lower_bound = zs.variational.elbo(
            model, {"y": y_obs}, variational=variational, axis=0
        )
        y_logit = lower_bound.bn["y_logit"]
        h_pred = jnp.mean(jax.nn.softmax(y_logit), 0)
        acc = jnp.mean((jnp.argmax(h_pred, -1) == y).astype(jnp.float32))
        cost = jnp.mean(lower_bound.sgvb()) / n_train
        return cost, acc

    @jax.jit
    def train_step(params, opt_state, x, y, key):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, y, key, lb_samples
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    eval_acc = jax.jit(
        lambda p, x, y, k: loss_fn(p, x, y, k, 100)[1]
    )

    iters = n_train // batch_size
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(epoch).permutation(n_train)
        accs = []
        for t in range(iters):
            idx = perm[t * batch_size:(t + 1) * batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(x_train[idx]),
                jnp.asarray(y_train[idx]), sub,
            )
            accs.append(acc)
        if epoch % 3 == 0:
            key, sub = jax.random.split(key)
            test_acc = eval_acc(
                params, jnp.asarray(x_test[:2000]),
                jnp.asarray(y_test[:2000]), sub,
            )
            print("Epoch {}: train acc = {:.4f}, test acc = {:.4f}".format(
                epoch, float(jnp.mean(jnp.stack(accs))), float(test_acc)
            ))
    return params


if __name__ == "__main__":
    main()
