"""Bayesian logistic regression with SVGD (Liu & Wang 2016, Sec. 5).

Beyond the reference's example zoo (SURVEY.md §2.12): the SVGD paper's
benchmark workload — a logistic-regression posterior over UCI German
credits, inferred by transporting a particle ensemble along the Stein
direction. The posterior-predictive test accuracy averages the
per-particle predictions (a real ensemble, not a point estimate).

TPU notes: particles are a leading axis; the per-step cost is one batched
``[p, n, d] x [p, d]`` likelihood einsum plus the two MXU-shaped
``[p, p] @ [p, D]`` kernel matmuls inside SVGD. The whole run is one
``lax.scan`` program.

Run: ``python -m examples.stein_variational.blr_svgd``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from examples.utils import dataset
from zhusuan_tpu.variational import SVGD


def make_log_joint(x, y, prior_std=1.0):
    """log p(w) + log p(y | x, w) over [n_particles, d] weight particles."""
    x = jnp.asarray(x)
    y = jnp.asarray(y, jnp.float32)

    def log_joint(obs):
        w = obs["w"]  # [p, d]
        logits = jnp.einsum("nd,pd->pn", x, w)
        log_lik = jnp.sum(
            y * jax.nn.log_sigmoid(logits)
            + (1.0 - y) * jax.nn.log_sigmoid(-logits),
            axis=-1,
        )
        log_prior = jnp.sum(
            -0.5 * (w / prior_std) ** 2, axis=-1
        )
        return log_prior + log_lik

    return log_joint


def predict_proba(w_particles, x):
    """Posterior-predictive p(y=1|x): mean of per-particle sigmoids."""
    logits = jnp.einsum("nd,pd->pn", jnp.asarray(x), w_particles)
    return jnp.mean(jax.nn.sigmoid(logits), axis=0)


def main(n_particles=100, n_iters=2000, learning_rate=0.05):
    x_train, y_train, x_test, y_test, synthetic = (
        dataset.load_uci_german_credits()
    )
    x_train, x_test, _, _ = dataset.standardize(
        x_train.astype(np.float32), x_test.astype(np.float32)
    )
    # Bias column (the reference BLR examples fold the intercept into w).
    x_train = np.concatenate(
        [x_train, np.ones((x_train.shape[0], 1), np.float32)], axis=1
    )
    x_test = np.concatenate(
        [x_test, np.ones((x_test.shape[0], 1), np.float32)], axis=1
    )
    d = x_train.shape[1]

    log_joint = make_log_joint(x_train, y_train)
    svgd = SVGD(learning_rate=learning_rate)
    w0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n_particles, d))
    state = svgd.init({"w": w0})
    state, diag = jax.jit(
        lambda s: svgd.run(log_joint, {}, s, n_iters=n_iters, collect=True)
    )(state)

    w = state.particles["w"]
    p_test = predict_proba(w, x_test)
    acc = float(jnp.mean((p_test > 0.5) == (jnp.asarray(y_test) > 0.5)))
    base = float(max(np.mean(y_test), 1.0 - np.mean(y_test)))
    print(
        "SVGD BLR{}: test acc {:.3f} (majority-class baseline {:.3f}), "
        "final grad_norm {:.2e}".format(
            " [synthetic]" if synthetic else "", acc, base,
            float(diag["grad_norm"][-1]),
        )
    )
    return acc, base


if __name__ == "__main__":
    main()
