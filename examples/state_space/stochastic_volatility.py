"""Stochastic volatility via particle filtering + PMMH.

Beyond the reference: upstream ZhuSuan's example zoo
(``/root/reference/examples``) has no sequential model at all; this adds
the canonical nonlinear/non-Gaussian SSM workload (Kim, Shephard & Chib
1998) on the ``zhusuan_tpu.ssm`` stack:

.. math::
    h_0 \\sim N(\\mu, \\sigma^2/(1-\\phi^2)), \\quad
    h_t = \\mu + \\phi (h_{t-1} - \\mu) + \\sigma \\eta_t, \\quad
    y_t = \\exp(h_t / 2)\\, \\epsilon_t.

The emission is non-Gaussian in the state, so the Kalman filter does not
apply — the particle filter is the real tool, and PMMH infers
``(mu, phi, sigma)`` from returns with phi/sigma proposed on
unconstrained scales (arctanh / log).

Zero-egress: synthetic returns generated from known parameters (flagged
``synthetic``), so recovery can be checked against the truth.
Run: ``python -m examples.state_space.stochastic_volatility``.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs

parser = argparse.ArgumentParser()
parser.add_argument("--t", type=int, default=200, help="series length")
parser.add_argument("--n-particles", type=int, default=512)
parser.add_argument("--n-chains", type=int, default=8)
parser.add_argument("--n-iters", type=int, default=1500)
parser.add_argument("--burnin", type=int, default=300)

TRUE = {"mu": -1.0, "phi": 0.95, "sigma": 0.25}


def simulate(T, seed=0):
    """Synthetic log-volatility path + returns (flagged synthetic)."""
    rng = np.random.default_rng(seed)
    mu, phi, sigma = TRUE["mu"], TRUE["phi"], TRUE["sigma"]
    h = mu + sigma / np.sqrt(1.0 - phi ** 2) * rng.standard_normal()
    hs, ys = [], []
    for _ in range(T):
        hs.append(h)
        ys.append(np.exp(h / 2.0) * rng.standard_normal())
        h = mu + phi * (h - mu) + sigma * rng.standard_normal()
    return np.array(hs), np.array(ys), True  # synthetic=True


def make_filter(theta, ys, n_particles):
    """Bootstrap filter for one (mu, arctanh-phi, log-sigma) setting."""
    mu = theta["mu"]
    phi = jnp.tanh(theta["phi_u"])
    sigma = jnp.exp(theta["log_sigma"])

    def init_fn(key, n):
        scale = sigma / jnp.sqrt(1.0 - phi ** 2)
        return mu + scale * jax.random.normal(key, (n,), mu.dtype)

    def transition_fn(key, h, t):
        return (mu + phi * (h - mu)
                + sigma * jax.random.normal(key, h.shape, h.dtype))

    def emission_log_prob(h, y, t):
        # y_t | h_t ~ N(0, exp(h_t))
        return (-0.5 * y ** 2 * jnp.exp(-h) - 0.5 * h
                - 0.5 * jnp.log(2.0 * jnp.pi))

    return zs.ParticleFilter(init_fn, transition_fn, emission_log_prob,
                             n_particles=n_particles)


def log_prior(theta):
    """mu ~ N(0, 2^2); phi_u ~ N(2, 1) (mass near persistence);
    log_sigma ~ N(-1.5, 1)."""
    return (-0.5 * (theta["mu"] / 2.0) ** 2
            - 0.5 * (theta["phi_u"] - 2.0) ** 2
            - 0.5 * (theta["log_sigma"] + 1.5) ** 2)


def run_pmmh(ys, n_particles=512, n_chains=8, n_iters=1500, seed=0):
    ys = jnp.asarray(ys)

    def log_z_fn(theta, key):
        return make_filter(theta, ys, n_particles).run(key, ys).log_z

    kern = zs.PseudoMarginalMH(
        log_z_fn, log_prior, step_size=0.08,
        proposal_scales={"mu": 2.0, "phi_u": 1.0, "log_sigma": 1.0},
    )
    k_init, k_run = jax.random.split(jax.random.PRNGKey(seed))
    spread = jax.random.normal(
        k_init, (n_chains,), jnp.result_type(float))
    state = kern.init({
        "mu": -1.0 + 0.5 * spread,
        "phi_u": jnp.full((n_chains,), 1.5, spread.dtype),
        "log_sigma": jnp.full((n_chains,), -1.4, spread.dtype),
    })
    final, out = jax.jit(
        lambda s, k: kern.run(s, k, n_iters)
    )(state, k_run)
    return final, out


def main():
    hps, _ = parser.parse_known_args()
    hs_true, ys, synthetic = simulate(hps.t)
    print("synthetic={} T={}".format(synthetic, len(ys)))

    # Filtering at the TRUE parameters: posterior-mean volatility path.
    theta_true = {
        "mu": jnp.asarray(TRUE["mu"]),
        "phi_u": jnp.arctanh(jnp.asarray(TRUE["phi"])),
        "log_sigma": jnp.log(jnp.asarray(TRUE["sigma"])),
    }
    pf = make_filter(theta_true, jnp.asarray(ys), hps.n_particles)
    res = pf.run(jax.random.PRNGKey(1), jnp.asarray(ys))
    rmse = float(jnp.sqrt(jnp.mean(
        (res.filter_means - jnp.asarray(hs_true)) ** 2)))
    print("filter log_z={:.2f} rmse(h)={:.3f} resamples={}".format(
        float(res.log_z), rmse, int(res.n_resamples)))

    final, out = run_pmmh(ys, hps.n_particles, hps.n_chains, hps.n_iters)
    draws = {k: np.asarray(v)[hps.burnin:]
             for k, v in out["samples"].items()}
    mu_hat = draws["mu"].mean()
    phi_hat = np.tanh(draws["phi_u"]).mean()
    sigma_hat = np.exp(draws["log_sigma"]).mean()
    acc = float(np.asarray(out["acceptance_rate"]).mean())
    print("PMMH acc={:.2f} mu={:.2f} phi={:.3f} sigma={:.3f} "
          "(true {:.2f}/{:.2f}/{:.2f})".format(
              acc, mu_hat, phi_hat, sigma_hat,
              TRUE["mu"], TRUE["phi"], TRUE["sigma"]))
    return {"mu": mu_hat, "phi": phi_hat, "sigma": sigma_hat, "acc": acc,
            "rmse": rmse}


if __name__ == "__main__":
    main()
