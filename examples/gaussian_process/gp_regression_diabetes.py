"""Library-level GP API on real data: exact GP vs SGPR vs SVGP on the
sklearn-bundled diabetes regression set (the real dataset available in
this zero-egress environment; see RESULTS.md).

Counterpart to the model-zoo SVGP example
(``examples/gaussian_process/svgp.py``, reference
``examples/gaussian_process/svgp.py``): here the GP lives at the library
level (:mod:`zhusuan_tpu.gp`) — exact type-II ML regression (n=442 is
tiny), the collapsed Titsias bound with learned inducing inputs, and the
whitened SVGP bound — all fit by one jitted optax loop each.

Run: ``python -m examples.gaussian_process.gp_regression_diabetes``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zhusuan_tpu import gp


def load_diabetes(seed=0):
    from sklearn import datasets

    d = datasets.load_diabetes()
    x, y = d.data.astype(np.float64), d.target.astype(np.float64)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y))
    x, y = x[perm], y[perm]
    n_train = int(0.9 * len(y))
    x_tr, x_te = x[:n_train], x[n_train:]
    y_tr, y_te = y[:n_train], y[n_train:]
    # Standardize by train stats (reference svgp.py protocol).
    xm, xs = x_tr.mean(0), x_tr.std(0) + 1e-8
    ym, ys = y_tr.mean(), y_tr.std()
    return ((x_tr - xm) / xs, (y_tr - ym) / ys,
            (x_te - xm) / xs, (y_te - ym) / ys, ys)


def _fit(loss_fn, params, n_iters=800, lr=0.03):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, val

    for _ in range(n_iters):
        params, state, val = step(params, state)
    return params, float(val)


def _metrics(post, y_te, y_scale, noise_var):
    mean = np.asarray(post.mean)
    var = np.asarray(post.var) + noise_var  # predictive-y variance
    rmse = float(np.sqrt(np.mean((mean - y_te) ** 2))) * y_scale
    nll = float(np.mean(
        0.5 * np.log(2 * np.pi * var) + (y_te - mean) ** 2 / (2 * var)
    ) + np.log(y_scale))
    return rmse, nll


def main(n_iters=800, m_inducing=50, seed=0, verbose=True,
         svgp_n_iters=None):
    x_tr, y_tr, x_te, y_te, y_scale = load_diabetes(seed)
    d = x_tr.shape[1]

    def kern(p):
        return gp.RBF(lengthscale=jnp.exp(p["log_ell"]),
                      variance=jnp.exp(p["log_var"]))

    # --- exact GP, type-II ML --------------------------------------- #
    p0 = {"log_ell": jnp.zeros(d), "log_var": jnp.asarray(0.0),
          "log_noise": jnp.asarray(-1.0)}
    p_ex, _ = _fit(
        lambda p: -gp.gp_log_marginal(kern(p), x_tr, y_tr,
                                      jnp.exp(p["log_noise"])),
        p0, n_iters=n_iters,
    )
    noise = float(jnp.exp(p_ex["log_noise"]))
    post = gp.gp_regression(kern(p_ex), x_tr, y_tr, x_te, noise)
    r_ex = _metrics(post, y_te, y_scale, noise)

    # --- SGPR: collapsed bound, learned inducing inputs -------------- #
    rng = np.random.default_rng(seed)
    z0 = x_tr[rng.choice(len(y_tr), m_inducing, replace=False)]
    p0 = {"log_ell": jnp.zeros(d), "log_var": jnp.asarray(0.0),
          "log_noise": jnp.asarray(-1.0), "z": jnp.asarray(z0)}
    p_sg, _ = _fit(
        lambda p: -gp.sgpr_elbo(kern(p), x_tr, y_tr, p["z"],
                                jnp.exp(p["log_noise"])),
        p0, n_iters=n_iters,
    )
    noise_sg = float(jnp.exp(p_sg["log_noise"]))
    post = gp.sgpr_predict(kern(p_sg), x_tr, y_tr, p_sg["z"], x_te,
                           noise_sg)
    r_sg = _metrics(post, y_te, y_scale, noise_sg)

    # --- SVGP: uncollapsed whitened bound ---------------------------- #
    st = gp.svgp_init(z0)
    p0 = {"log_ell": jnp.zeros(d), "log_var": jnp.asarray(0.0),
          "log_noise": jnp.asarray(-1.0), "state": st}
    p_sv, _ = _fit(
        lambda p: -gp.svgp_elbo(
            kern(p), p["state"], x_tr, y_tr,
            gp.GaussianLikelihood(jnp.exp(p["log_noise"])),
        ),
        p0, n_iters=svgp_n_iters or max(n_iters, 1500), lr=0.02,
    )
    noise_sv = float(jnp.exp(p_sv["log_noise"]))
    post = gp.svgp_predict(kern(p_sv), p_sv["state"], x_te)
    r_sv = _metrics(post, y_te, y_scale, noise_sv)

    if verbose:
        print(f"exact GP  : test RMSE {r_ex[0]:6.1f}  NLL {r_ex[1]:.3f}")
        print(f"SGPR m={m_inducing}: test RMSE {r_sg[0]:6.1f}  "
              f"NLL {r_sg[1]:.3f}")
        print(f"SVGP m={m_inducing}: test RMSE {r_sv[0]:6.1f}  "
              f"NLL {r_sv[1]:.3f}")
    return r_ex, r_sg, r_sv


if __name__ == "__main__":
    main()
