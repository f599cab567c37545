"""Ordinal (cumulative-logit) regression with Ordered cutpoints.

Beyond the reference: upstream ZhuSuan has no ordered-support machinery,
so cumulative-link models — the standard tool for rating/Likert
outcomes — are not expressible there. Here the K-1 cutpoints are one
latent vector constrained by :class:`zs.bijectors.Ordered` and sampled
jointly with the regression weights by NUTS in the unconstrained space:

.. math::
    P(y_i \\le k) = \\sigma(c_k - x_i^T \\beta), \\quad
    c_1 < c_2 < \\dots < c_{K-1},\\quad
    \\beta \\sim N(0, 1),\\; c \\sim N(0, 2^2) \\text{ (ordered)}.

Zero-egress: synthetic covariates/outcomes from known parameters
(flagged ``synthetic``) so recovery is checkable against the truth.
Run: ``python -m examples.robust_models.ordinal_regression``.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.bijectors import Ordered, transform_log_joint

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=400)
parser.add_argument("--n-chains", type=int, default=32)
parser.add_argument("--n-iters", type=int, default=1200)
parser.add_argument("--burnin", type=int, default=400)

TRUE_BETA = np.asarray([1.2, -0.8])
TRUE_CUTS = np.asarray([-1.0, 0.3, 1.5])  # K = 4 categories


def make_data(n, key):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, 2))
    eta = x @ jnp.asarray(TRUE_BETA)
    # P(y <= k) = sigmoid(c_k - eta): draw by inverting the CDF.
    cum = jax.nn.sigmoid(jnp.asarray(TRUE_CUTS)[None, :] - eta[:, None])
    u = jax.random.uniform(ky, (n,))
    y = jnp.sum(u[:, None] > cum, axis=-1)  # category index in 0..K-1
    return np.asarray(x), np.asarray(y), True  # synthetic


def build_log_joint(x, y):
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def log_joint(obs):
        beta, cuts = obs["beta"], obs["cuts"]  # [..., 2], [..., K-1]
        prior = (
            jnp.sum(-0.5 * beta**2, axis=-1)
            + jnp.sum(-0.5 * (cuts / 2.0) ** 2, axis=-1)
        )
        eta = beta @ xj.T  # [..., n]
        # The library's cumulative-logit head scores all n outcomes at
        # once (stable adjacent-CDF differences inside).
        lik = zs.distributions.OrderedLogistic(
            eta, cuts[..., None, :]
        ).log_prob(yj)
        return prior + jnp.sum(lik, axis=-1)

    return log_joint


def run(n=400, n_chains=32, n_iters=1200, burnin=400, seed=1):
    key = jax.random.PRNGKey(seed)
    x, y, synthetic = make_data(n, key)
    log_joint = build_log_joint(x, y)
    ulj, to_u, to_c = transform_log_joint(log_joint, {"cuts": Ordered()})

    nuts = zs.NUTS(step_size=0.2, max_tree_depth=6, adapt_step_size=True)
    init = {
        "beta": jnp.zeros((n_chains, 2)),
        "cuts": jnp.tile(jnp.asarray([-1.0, 0.0, 1.0]), (n_chains, 1)),
    }
    state = nuts.init(to_u(init), n_chain_dims=1)
    state, out = jax.jit(
        lambda s, k: nuts.run(ulj, {}, s, k, n_iters=n_iters,
                              n_adapt=burnin)
    )(state, jax.random.fold_in(key, 2))
    draws = to_c({k: v[burnin:] for k, v in out["samples"].items()})
    beta = np.asarray(draws["beta"]).reshape(-1, 2)
    cuts = np.asarray(draws["cuts"]).reshape(-1, 3)
    return {
        "synthetic": synthetic,
        "beta_mean": beta.mean(0),
        "beta_sd": beta.std(0),
        "cuts_mean": cuts.mean(0),
        "cuts_sd": cuts.std(0),
        "cuts_draws": cuts,
    }


def main():
    args = parser.parse_args()
    res = run(args.n, args.n_chains, args.n_iters, args.burnin)
    print(
        "ordinal regression: beta={} (true {}), cuts={} (true {})".format(
            np.round(res["beta_mean"], 2), TRUE_BETA,
            np.round(res["cuts_mean"], 2), TRUE_CUTS,
        )
    )


if __name__ == "__main__":
    main()
