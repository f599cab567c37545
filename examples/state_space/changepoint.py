"""Poisson change-point detection by compound Gibbs sampling.

Beyond the reference: the coal-mining-disasters-style model — the classic
showcase for exact discrete conditionals — is impossible in upstream
ZhuSuan (its HMC cannot touch the discrete change point; no Gibbs
machinery exists, ``/root/reference/zhusuan/hmc.py`` samples continuous
latents only). Here the change point is one :class:`zs.DiscreteGibbs`
site and the two Poisson log-rates one HMC block, composed by
:class:`zs.Gibbs`:

.. math::
    \\tau \\sim \\mathrm{Uniform}\\{1..T-1\\},\\quad
    \\log\\lambda_k \\sim N(0, 2^2),\\quad
    y_t \\sim \\mathrm{Poisson}(\\lambda_1\\,[t<\\tau] +
                                \\lambda_2\\,[t\\ge\\tau]).

Everything runs as one jitted program over vectorized chains; the
per-sweep discrete update enumerates all T-1 candidate change points
exactly (no proposals to tune).

Zero-egress: synthetic counts from known parameters (flagged
``synthetic``), so recovery is checkable against the truth.
Run: ``python -m examples.state_space.changepoint``.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs

parser = argparse.ArgumentParser()
parser.add_argument("--t", type=int, default=60, help="series length")
parser.add_argument("--n-chains", type=int, default=64)
parser.add_argument("--n-iters", type=int, default=2000)
parser.add_argument("--burnin", type=int, default=500)

TRUE = {"tau": 24, "lam1": 3.0, "lam2": 0.8}


def make_data(t, key):
    """Synthetic Poisson counts with a rate drop at TRUE['tau']."""
    rates = np.where(np.arange(t) < TRUE["tau"], TRUE["lam1"],
                     TRUE["lam2"])
    y = jax.random.poisson(key, jnp.asarray(rates)).astype(jnp.float64)
    return y, True  # (counts, synthetic)


def build_log_joint(y):
    t = y.shape[0]
    grid = jnp.arange(t, dtype=y.dtype)

    def log_joint(obs):
        tau = obs["tau"][..., 0]  # [..., 1] -> [...]
        log_lam = obs["log_lam"]  # [..., 2]
        prior = jnp.sum(-0.5 * (log_lam / 2.0) ** 2, axis=-1)
        # Piecewise rate; tau is a VALUE in {1..T-1} so the indicator is
        # data, not a traced shape.
        before = grid < tau[..., None]
        log_rate = jnp.where(before, log_lam[..., :1], log_lam[..., 1:])
        lik = jnp.sum(y * log_rate - jnp.exp(log_rate), axis=-1)
        return prior + lik

    return log_joint


def run(t=60, n_chains=64, n_iters=2000, burnin=500, seed=0):
    key = jax.random.PRNGKey(seed)
    y, synthetic = make_data(t, key)
    log_joint = build_log_joint(y)

    sampler = zs.Gibbs([
        (zs.DiscreteGibbs(
            {"tau": jnp.arange(1, t, dtype=y.dtype)}), ["tau"]),
        (zs.HMC(step_size=0.1, n_leapfrogs=6, adapt_step_size=True),
         ["log_lam"]),
    ])
    state = sampler.init(
        {"tau": jnp.full((n_chains, 1), float(t // 2), y.dtype),
         "log_lam": jnp.zeros((n_chains, 2), y.dtype)},
        n_chain_dims=1,
    )
    state, out = jax.jit(
        lambda s, k: sampler.run(
            log_joint, {}, s, k, n_iters=n_iters, n_adapt=burnin
        )
    )(state, jax.random.fold_in(key, 1))

    tau = np.asarray(out["samples"]["tau"][burnin:]).reshape(-1)
    lam = np.exp(np.asarray(out["samples"]["log_lam"][burnin:])
                 ).reshape(-1, 2)
    return {
        "synthetic": synthetic,
        "tau_mode": int(np.bincount(tau.astype(np.int64)).argmax()),
        "tau_mean": float(tau.mean()),
        "lam_mean": lam.mean(0),
        "tau_draws": tau,
    }


def main():
    args = parser.parse_args()
    res = run(args.t, args.n_chains, args.n_iters, args.burnin)
    print(
        "changepoint: tau_mode={} (true {}), tau_mean={:.1f}, "
        "lambda=({:.2f}, {:.2f}) (true ({}, {}))".format(
            res["tau_mode"], TRUE["tau"], res["tau_mean"],
            res["lam_mean"][0], res["lam_mean"][1],
            TRUE["lam1"], TRUE["lam2"],
        )
    )


if __name__ == "__main__":
    main()
