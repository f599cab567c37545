"""Eight schools: hierarchical partial pooling (Rubin 1981; BDA §5.5).

Beyond the reference's zoo: the canonical hierarchical-Bayes benchmark —
school effects theta_j partially pooled through a population (mu, tau)
with a HalfCauchy(5) prior on tau (Gelman 2006). The funnel geometry in
(theta, tau) is the standard hard case; the example uses the
NON-CENTERED parameterization ``theta = mu + tau * theta_tilde`` (the
known fix) plus :mod:`zhusuan_tpu.bijectors` for the positive ``tau``,
and reports the :func:`zhusuan_tpu.diagnostics.summary` table.

Ground truth: with theta integrated out analytically
(``y_j ~ N(mu, sigma_j^2 + tau^2)``), the (mu, tau) posterior is a 2-D
quadrature — under these priors it gives ``E[mu] = 7.79``,
``E[tau] = 3.62`` (the test pins the sampler against exactly this), with
school effects shrunk strongly toward ``mu`` relative to the raw
estimates.

Run: ``python -m examples.hierarchical.eight_schools``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.bijectors import Softplus, transform_log_joint
from zhusuan_tpu.diagnostics import summary

# The classic data: estimated effects and standard errors per school.
Y = np.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = np.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def make_log_joint():
    y, sig = jnp.asarray(Y), jnp.asarray(SIGMA)

    def log_joint(obs):
        mu, tau = obs["mu"], obs["tau"]
        theta_t = obs["theta_tilde"]  # [..., 8] standardized effects
        lp = -0.5 * (mu / 100.0) ** 2  # mu ~ N(0, 100): effectively flat
        lp += zs.distributions.HalfCauchy(jnp.asarray(5.0)).log_prob(tau)
        lp += jnp.sum(-0.5 * theta_t**2, axis=-1)  # theta_tilde ~ N(0,1)
        theta = mu[..., None] + tau[..., None] * theta_t  # non-centered
        lp += jnp.sum(-0.5 * ((y - theta) / sig) ** 2, axis=-1)
        return lp

    return log_joint


def make_centered_log_joint():
    """CENTERED parameterization ``theta_j ~ N(mu, tau)`` — the funnel
    geometry NUTS diagnoses: as ``tau -> 0`` the posterior necks down and
    trajectories diverge, flagged per transition in
    ``NUTSInfo.divergent``. Kept as the didactic foil for
    :func:`funnel_diagnosis`."""
    y, sig = jnp.asarray(Y), jnp.asarray(SIGMA)

    def log_joint(obs):
        mu, tau, theta = obs["mu"], obs["tau"], obs["theta"]
        lp = -0.5 * (mu / 100.0) ** 2
        lp += zs.distributions.HalfCauchy(jnp.asarray(5.0)).log_prob(tau)
        lp += jnp.sum(
            -0.5 * ((theta - mu[..., None]) / tau[..., None]) ** 2
            - jnp.log(tau)[..., None],
            axis=-1,
        )
        lp += jnp.sum(-0.5 * ((y - theta) / sig) ** 2, axis=-1)
        return lp

    return log_joint


def funnel_diagnosis(n_chains=32, n_iters=1000, n_adapt=500,
                     verbose=True, key=None):
    """The canonical NUTS workflow on the funnel: the CENTERED model
    produces divergent transitions concentrated at small ``tau`` (the
    geometric pathology, not noise), the NON-CENTERED model removes
    them. Returns ``(centered_div_rate, noncentered_div_rate,
    centered_small_tau_frac)``."""
    key = jax.random.PRNGKey(7) if key is None else key

    def run(log_joint, init_c, k):
        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"tau": Softplus()}
        )
        nuts = zs.NUTS(step_size=0.2, max_tree_depth=8,
                       adapt_step_size=True)
        state = nuts.init(to_u(init_c), n_chain_dims=1)
        state, out = jax.jit(
            lambda s, kk: nuts.run(
                ulj, {}, s, kk, n_iters, n_adapt=n_adapt,
                collect_fields=("samples", "divergent"),
            )
        )(state, k)
        draws = to_c({kk: v[n_adapt:] for kk, v in out["samples"].items()})
        div = np.asarray(out["divergent"][n_adapt:])
        return draws, div

    k1, k2 = jax.random.split(key)
    c_draws, c_div = run(
        make_centered_log_joint(),
        {"mu": jnp.zeros(n_chains), "tau": jnp.ones(n_chains) * 5.0,
         "theta": jnp.zeros((n_chains, 8))},
        k1,
    )
    nc_draws, nc_div = run(
        make_log_joint(),
        {"mu": jnp.zeros(n_chains), "tau": jnp.ones(n_chains) * 5.0,
         "theta_tilde": jnp.zeros((n_chains, 8))},
        k2,
    )
    c_rate = float(c_div.mean())
    nc_rate = float(nc_div.mean())
    # Divergences are INFORMATIVE: they cluster where the funnel necks.
    tau_at = np.asarray(c_draws["tau"])[c_div.astype(bool)]
    tau_all = np.asarray(c_draws["tau"]).ravel()
    med = float(np.median(tau_all))
    small_frac = (
        float(np.mean(tau_at < med)) if tau_at.size else float("nan")
    )
    if verbose:
        print("centered divergence rate     : %.3f" % c_rate)
        print("non-centered divergence rate : %.3f" % nc_rate)
        print("centered divergences at tau < median: %.2f" % small_frac)
    return c_rate, nc_rate, small_frac


def main(n_chains=64, n_iters=3000, n_adapt=1500, verbose=True):
    log_joint = make_log_joint()
    ulj, to_u, to_c = transform_log_joint(log_joint, {"tau": Softplus()})

    hmc = zs.HMC(step_size=0.1, n_leapfrogs=10, adapt_step_size=True,
                 adapt_mass=True)
    init = to_u({
        "mu": jnp.zeros(n_chains),
        "tau": jnp.ones(n_chains) * 5.0,
        "theta_tilde": jnp.zeros((n_chains, 8)),
    })
    state = hmc.init(init, n_chain_dims=1)
    state, out = jax.jit(
        lambda s, k: hmc.run(ulj, {}, s, k, n_iters, n_adapt=n_adapt)
    )(state, jax.random.PRNGKey(0))

    draws = to_c({k: v[n_adapt:] for k, v in out["samples"].items()})
    mu = np.asarray(draws["mu"])
    tau = np.asarray(draws["tau"])
    theta = (mu[..., None]
             + tau[..., None] * np.asarray(draws["theta_tilde"]))

    stats, table = summary({
        "mu": draws["mu"], "tau": draws["tau"], "theta": jnp.asarray(theta)
    })
    if verbose:
        print(table)
        # Partial pooling: posterior effects shrink toward mu.
        print("raw effects:", Y.round(1))
        print("posterior  :", theta.reshape(-1, 8).mean(0).round(1))
    return stats, theta


if __name__ == "__main__":
    main()
