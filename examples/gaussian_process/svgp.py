"""Sparse variational Gaussian process regression (SVGP, Hensman 2013).

Parity: reference ``examples/gaussian_process/svgp.py`` (BASELINE config #5
part 2): 100 inducing points, MultivariateNormalCholesky posterior over
f(Z), whitened-free formulation cancelling p(fx|fz) between the model and
the variational by zeroing its latent log-prob (reference :123-139).
Published reference results (svgp.py:12-18): Boston RMSE 2.90 / NLL 2.52;
Protein RMSE 4.49 / NLL 2.93 (on the real UCI data).
Run: ``python -m examples.gaussian_process.svgp [-dataset boston_housing]``.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.utils import log_mean_exp
from examples.gaussian_process.utils import RBFKernel, gp_conditional
from examples.utils import dataset

parser = argparse.ArgumentParser()
parser.add_argument("-n_z", default=100, type=int)
parser.add_argument("-n_particles", default=20, type=int)
parser.add_argument("-n_particles_test", default=100, type=int)
parser.add_argument("-batch_size", default=5000, type=int)
parser.add_argument("-n_epoch", default=2000, type=int)
parser.add_argument("-dataset", default="boston_housing", type=str,
                    choices=["boston_housing", "protein_data", "diabetes"])
parser.add_argument("-lr", default=1e-2, type=float)


def kzz_cholesky(params, n_z):
    """Jittered Cholesky of the inducing Gram matrix — computed ONCE per
    step and shared between the model and the variational (they otherwise
    each pay a sequential 100x100 Cholesky + inversion on TPU for the
    same matrix)."""
    kernel = RBFKernel(params["k_raw_scale"])
    Kzz = kernel(params["z_pos"], params["z_pos"])
    return jnp.linalg.cholesky(Kzz + 1e-6 * jnp.eye(n_z, dtype=Kzz.dtype))


def kzz_factors(params, n_z):
    """``(L, L^{-1})`` of the jittered inducing Gram matrix via the fused
    single-kernel factorization (zhusuan_tpu.ops.linalg.cholesky_inverse):
    on TPU this replaces XLA's ~hundred-launch blocked Cholesky + solve
    loops — the op-count bottleneck of the whole SVGP step (PERF.md) —
    and turns every downstream whitening into an MXU matmul."""
    from zhusuan_tpu.ops.linalg import cholesky_inverse

    kernel = RBFKernel(params["k_raw_scale"])
    Kzz = kernel(params["z_pos"], params["z_pos"])
    return cholesky_inverse(
        Kzz + 1e-6 * jnp.eye(n_z, dtype=Kzz.dtype)
    )


def build_model(params, x, n_z, n_particles, kzz_chol=None,
                kzz_chol_inv=None):
    """p(fz) p(fx | fz) p(y | fx) (reference svgp.py:49-73).

    Pass ``kzz_chol``/``kzz_chol_inv`` (see :func:`kzz_factors`) to share
    one fused factorization across the model and variational and score
    the p(fz) prior by matmul instead of a triangular solve."""
    kernel = RBFKernel(params["k_raw_scale"])
    z_pos = params["z_pos"]

    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        if kzz_chol is None:
            Kzz = kernel(z_pos, z_pos)
            Kzz_chol = jnp.linalg.cholesky(
                Kzz + 1e-6 * jnp.eye(n_z, dtype=Kzz.dtype)
            )
        else:
            Kzz_chol = kzz_chol
        fz = bn.multivariate_normal_cholesky(
            "fz", jnp.zeros([n_z], Kzz_chol.dtype), Kzz_chol,
            n_samples=n_particles, cov_tril_inv=kzz_chol_inv,
        )
        fx = bn.stochastic(
            "fx",
            gp_conditional(z_pos, fz.tensor, x, False, kernel, Kzz_chol,
                           Kzz_chol_inv=kzz_chol_inv),
        )
        noise_level = jax.nn.softplus(params["noise_raw"])
        bn.normal("y", fx.tensor, std=noise_level, group_ndims=1)
        return bn

    return model()


def build_variational_samples(params, x, n_z, n_particles, key,
                              kzz_chol=None, kzz_chol_inv=None):
    """q(fz) q(fx|fz): returns the latent dict with p(fx|fz) log-prob
    zeroed (whitened-free cancellation, reference svgp.py:123-139).
    Pass ``kzz_chol`` (+ optionally ``kzz_chol_inv``; see
    :func:`kzz_factors`) to share one inducing-Gram factorization with
    the model instead of recomputing it here."""
    kernel = RBFKernel(params["k_raw_scale"])
    z_pos = params["z_pos"]
    bn = zs.BayesianNet(key=key)
    z_cov_raw = params["z_cov_raw"]
    z_cov_tril = jnp.tril(z_cov_raw, -1) + jnp.diag(
        jax.nn.softplus(jnp.diagonal(z_cov_raw))
    )
    fz = bn.multivariate_normal_cholesky(
        "fz", params["z_mean"], z_cov_tril, n_samples=n_particles
    )
    fx_dist = gp_conditional(z_pos, fz.tensor, x, False, kernel, kzz_chol,
                             Kzz_chol_inv=kzz_chol_inv)
    bn.stochastic("fx", fx_dist)
    # Same query pattern as the reference (svgp.py:129-133): fetch samples
    # and log-probs, then zero fx's log-prob so p(fx|fz) cancels between
    # the model and the variational.
    var_fz, var_fx = bn.query(
        ["fz", "fx"], outputs=True, local_log_prob=True
    )
    var_fx = (var_fx[0], jnp.zeros_like(var_fx[1]))
    return {"fz": var_fz, "fx": var_fx}


def init_params(key, n_z, n_covariates, x_train):
    k1 = key
    rng = np.random.RandomState(1234)
    # Initialize inducing positions from DISTINCT training inputs plus a
    # small jitter: duplicated inducing points make Kzz singular, and the
    # gradient through its Cholesky is NaN even when the jittered forward
    # pass is finite (the reference avoided this with a Uniform(-1,1)
    # initializer, svgp.py:113-115).
    n_train = x_train.shape[0]
    idx = rng.choice(n_train, size=n_z, replace=n_train < n_z)
    dtype = jnp.asarray(x_train).dtype
    z_init = x_train[idx] + 0.01 * rng.randn(n_z, n_covariates)
    return {
        "k_raw_scale": RBFKernel.init_params(n_covariates, dtype),
        "z_pos": jnp.asarray(z_init, dtype),
        "z_mean": jnp.zeros([n_z], dtype),
        "z_cov_raw": jnp.eye(n_z, dtype=dtype),
        "noise_raw": jnp.asarray(0.05, dtype),
    }


def main():
    hps = parser.parse_args()
    data_func = getattr(dataset, "load_uci_" + hps.dataset)
    x_train, y_train, x_valid, y_valid, x_test, y_test, synthetic = (
        data_func()
    )
    if synthetic:
        print("[note] UCI data not found; using synthetic regression data "
              "(zero-egress env) — published RMSE targets do not apply.")
    x_train = np.vstack([x_train, x_valid])
    y_train = np.hstack([y_train, y_valid])
    n_train, n_covariates = x_train.shape
    x_train, x_test, _, _ = dataset.standardize(x_train, x_test)
    y_train, y_test, mean_y_train, std_y_train = dataset.standardize(
        y_train, y_test
    )

    key = jax.random.PRNGKey(1234)
    params = init_params(key, hps.n_z, n_covariates, x_train)
    optimizer = optax.adam(hps.lr)
    opt_state = optimizer.init(params)

    def loss_fn(params, x, y, key):
        batch_size = x.shape[0]
        chol, chol_inv = kzz_factors(params, hps.n_z)
        model = build_model(params, x, hps.n_z, hps.n_particles,
                            kzz_chol=chol, kzz_chol_inv=chol_inv)

        def log_joint(bn):
            prior, log_py_given_fx = bn.cond_log_prob(["fz", "y"])
            return prior + log_py_given_fx / batch_size * n_train

        model.log_joint = log_joint
        latent = build_variational_samples(
            params, x, hps.n_z, hps.n_particles, key, kzz_chol=chol,
            kzz_chol_inv=chol_inv,
        )
        lower_bound = zs.variational.elbo(
            model, observed={"y": y}, latent=latent, axis=0
        )
        return jnp.mean(lower_bound.sgvb()), jnp.mean(lower_bound.tensor)

    @jax.jit
    def train_step(params, opt_state, x, y, key):
        (loss, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, y, key
        )
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, lb

    @jax.jit
    def predict(params, x, y, key):
        """Posterior-predictive RMSE and test NLL (reference :147-153)."""
        batch_size = x.shape[0]
        k_q, k_m = jax.random.split(key)
        latent = build_variational_samples(
            params, x, hps.n_z, hps.n_particles_test, k_q
        )
        fx_samples = latent["fx"][0]
        model = build_model(params, x, hps.n_z, hps.n_particles_test)
        # fz stays unobserved in the prediction net (the builder touches it
        # to form the conditional), so a key is required.
        bn = model.observe(k_m, fx=fx_samples, y=y)
        log_likelihood = bn.cond_log_prob("y")
        ll = jnp.mean(
            log_mean_exp(log_likelihood, 0) / batch_size
        ) - jnp.log(std_y_train)
        y_pred = jnp.mean(bn["y"].dist.mean, axis=0)
        rmse = jnp.sqrt(jnp.mean((y_pred - y) ** 2)) * std_y_train
        return rmse, ll

    batch_size = min(hps.batch_size, n_train)
    iters = (n_train - 1) // batch_size + 1
    for epoch in range(1, hps.n_epoch + 1):
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
        if epoch % 100 == 0:
            key, sub = jax.random.split(key)
            rmse, ll = predict(
                params, jnp.asarray(x_test), jnp.asarray(y_test), sub
            )
            print(
                "Epoch {}: lower bound = {:.4f}, test rmse = {:.4f}, "
                "test ll = {:.4f}".format(
                    epoch, float(jnp.mean(jnp.stack(lbs))), float(rmse),
                    float(ll),
                )
            )
    return params


if __name__ == "__main__":
    main()
