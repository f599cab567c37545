"""VAE on binarized MNIST — the flagship end-to-end example.

Parity: reference ``examples/variational_autoencoders/vae.py`` — 2x500-unit
MLP encoder/decoder, z_dim 40, Bernoulli likelihood, SGVB ELBO training and
1000-particle IS log-likelihood evaluation (vae.py:65-75; BASELINE config
#3 part 1).

TPU-native: the whole train step (model build + ELBO + grads + Adam update)
is ONE jitted function; evaluation batches particles on the leading axis.
Run: ``python -m examples.variational_autoencoders.vae``.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.variational import elbo, importance_weighted_objective
from examples.utils.nn import init_mlp, mlp_apply


def build_gen(params, x_dim, z_dim, n, n_particles=1, compute_dtype=None):
    """The generative model p(z) p(x|z) (reference vae.py:18-30).

    ``compute_dtype=jnp.bfloat16`` runs the decoder MLP mixed-precision
    (f32 master params, bf16 matmuls/activations); the Bernoulli logits
    and every log-prob stay f32 — mlp_apply casts its output back.
    """

    @zs.meta_bayesian_net()
    def gen():
        bn = zs.BayesianNet()
        z = bn.normal(
            "z", jnp.zeros([n, z_dim]), std=1.0, group_ndims=1,
            n_samples=n_particles,
        )
        h = mlp_apply(params["decoder"], z.tensor,
                      compute_dtype=compute_dtype)
        bn.deterministic("x_mean", jax.nn.sigmoid(h))
        bn.bernoulli("x", h, group_ndims=1, dtype=jnp.float32)
        return bn

    return gen()


def build_q(params, x, z_dim, n_particles, key, compute_dtype=None):
    """The variational posterior q(z|x) (reference vae.py:33-41: BOTH
    500-unit layers are relu-activated)."""
    bn = zs.BayesianNet(key=key)
    h = mlp_apply(params["encoder"], x, final_activation=jax.nn.relu,
                  compute_dtype=compute_dtype)
    z_mean = mlp_apply([params["z_mean"]], h)
    z_logstd = mlp_apply([params["z_logstd"]], h)
    bn.normal(
        "z", z_mean, logstd=z_logstd, group_ndims=1, n_samples=n_particles
    )
    return bn


def init_params(key, x_dim=784, z_dim=40, hidden=500):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    from examples.utils.nn import init_linear

    return {
        "decoder": init_mlp(k1, [z_dim, hidden, hidden, x_dim]),
        "encoder": init_mlp(k2, [x_dim, hidden, hidden]),
        "z_mean": init_linear(k3, hidden, z_dim),
        "z_logstd": init_linear(k4, hidden, z_dim),
    }


def elbo_loss(params, x, key, z_dim, n_particles=1, compute_dtype=None):
    """Negative ELBO, mean over the batch — one fused computation.

    ``compute_dtype=jnp.bfloat16`` opts the encoder/decoder MLPs into
    mixed precision (halves the HBM bytes that bound wide batches —
    PERF.md round 5); sampling, log-probs, and the ELBO stay f32.
    """
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key,
                          compute_dtype=compute_dtype)
    model = build_gen(params, x.shape[-1], z_dim, n, n_particles,
                      compute_dtype=compute_dtype)
    lower_bound = elbo(
        model, {"x": x}, variational=variational, axis=0
    )
    return jnp.mean(lower_bound.sgvb())


def iw_log_likelihood(params, x, key, z_dim, n_particles=1000):
    """IS estimate of log p(x) with k particles (reference vae.py:70-75).

    Evaluates one batch; use :func:`eval_is_loglikelihood` for whole test
    sets (it chunks + jits — [n, k, 784] intermediates get large fast).
    """
    n = x.shape[0]
    variational = build_q(params, x, z_dim, n_particles, key)
    model = build_gen(params, x.shape[-1], z_dim, n, n_particles)
    return jnp.mean(
        zs.evaluation.is_loglikelihood(
            model, {"x": x}, proposal=variational, axis=0
        )
    )


def eval_is_loglikelihood(params, x, key, z_dim, n_particles=1000,
                          batch_size=128):
    """Test-set IS log-likelihood, evaluated in jitted batches (the
    reference evaluates the test set in batches too, vae.py:98-107)."""
    n = x.shape[0]
    n_batches = (n + batch_size - 1) // batch_size
    eval_fn = jax.jit(
        lambda p, xb, k: iw_log_likelihood(p, xb, k, z_dim, n_particles)
    )
    total, count = 0.0, 0
    for i in range(n_batches):
        xb = x[i * batch_size:(i + 1) * batch_size]
        key, sub = jax.random.split(key)
        total += float(eval_fn(params, xb, sub)) * xb.shape[0]
        count += xb.shape[0]
    return total / count


def make_train_step(optimizer, z_dim, n_particles=1):
    """One jitted SGVB train step: (params, opt_state, x, key) ->
    (params, opt_state, elbo_value)."""

    @jax.jit
    def train_step(params, opt_state, x, key):
        loss, grads = jax.value_and_grad(elbo_loss)(
            params, x, key, z_dim, n_particles
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, -loss

    return train_step


def main():
    from examples.utils.dataset import load_binary_mnist

    x_train, x_valid, x_test, synthetic = load_binary_mnist()
    if synthetic:
        print("[note] MNIST files not found; using synthetic MNIST-shaped "
              "data (zero-egress environment).")
    x_dim, z_dim = 784, 40
    batch_size, epochs = 128, 10

    key = jax.random.PRNGKey(1234)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_dim, z_dim)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    # Scanned epochs via the packaged loop (zs.fit_scan): each epoch is
    # ONE on-device lax.scan program — no per-step host dispatch (the
    # reference's sess.run-per-batch pattern costs 7.7x here, PERF.md).
    t0 = time.time()

    def on_epoch(epoch, neg_lb):
        nonlocal t0
        print("Epoch {} ({:.1f}s): Lower bound = {:.4f}".format(
            epoch + 1, time.time() - t0, -neg_lb))
        t0 = time.time()

    # Train in eval-punctuated stages of <= 5 epochs, covering ALL
    # `epochs` (a trailing remainder stage trains the leftover epochs).
    # One loss-fn OBJECT across stages so fit_scan's memoized epoch
    # program is compiled once and reused every stage.
    def loss_fn(p, xb, k):
        return elbo_loss(p, xb, k, z_dim)

    done = 0
    while done < epochs:
        stage_epochs = min(5, epochs - done)
        key, k_fit, k_eval = jax.random.split(key, 3)
        params, opt_state, _ = zs.fit_scan(
            loss_fn, params, optimizer, x_train,
            key=k_fit, epochs=stage_epochs, batch_size=batch_size,
            opt_state=opt_state,
            callback=lambda e, l, s=done: on_epoch(s + e, l),
        )
        done += stage_epochs
        test_ll = eval_is_loglikelihood(
            params, jnp.asarray(x_test[:1000]), k_eval, z_dim,
            n_particles=1000,
        )
        print(">>> TEST LOG LIKELIHOOD (IS, k=1000) = {:.4f}".format(
            test_ll
        ))


if __name__ == "__main__":
    main()
