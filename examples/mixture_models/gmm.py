"""Bayesian Gaussian mixture model with marginalized assignments.

Beyond the reference's zoo (its only mixture workload is the fixed
two-mode toy density of ``examples/toy_examples/mixture_sgnht.py``): a
FULL Bayesian GMM — unknown weights, locations and scales — using the
:class:`zhusuan_tpu.distributions.Mixture` head, which marginalizes the
discrete assignment out of ``log_prob``. That makes the posterior density
differentiable, so gradient MCMC (HMC) applies directly — no Gibbs sweep
over labels, no REINFORCE. All parameters are sampled in unconstrained
space (softmax weights, log scales).

TPU notes: the whole posterior is one fused logsumexp-over-K density;
chains are a leading axis (vectorized); the run is a single ``lax.scan``
program.

Run: ``python -m examples.mixture_models.gmm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu import distributions as zd
from zhusuan_tpu.diagnostics import summary

# Ground truth for the synthetic data.
TRUE_W = np.asarray([0.25, 0.45, 0.30])
TRUE_MU = np.asarray([-4.0, 0.0, 5.0])
TRUE_SD = np.asarray([0.7, 1.0, 1.2])


def make_data(n=600, seed=0):
    rng = np.random.default_rng(seed)
    comp = rng.choice(3, size=n, p=TRUE_W)
    return (TRUE_MU[comp] + TRUE_SD[comp] * rng.normal(size=n)), comp


def make_log_joint(data, k=3):
    """log p(logits, mu, log_sd, data): weakly-informative priors on the
    unconstrained parameters; the Mixture head supplies the marginalized
    likelihood. Latents carry arbitrary leading chain axes ``[..., k]``."""
    x = jnp.asarray(data)

    def log_joint(obs):
        logits, mu, log_sd = obs["logits"], obs["mu"], obs["log_sd"]
        lp = jnp.sum(-0.5 * (logits / 2.0) ** 2, axis=-1)  # N(0, 2)
        lp += jnp.sum(-0.5 * (mu / 10.0) ** 2, axis=-1)  # N(0, 10)
        lp += jnp.sum(-0.5 * log_sd**2, axis=-1)  # LogNormal(0, 1) scales
        mix = zd.Mixture(
            logits, zd.Normal(mu, logstd=log_sd), group_ndims=0
        )
        # x: [n]; mixture batch = chain axes [...]. Reshape the data to
        # [n, 1, ..., 1] so log_prob returns [n, ...]; sum over n.
        xb = x.reshape((x.shape[0],) + (1,) * (mu.ndim - 1))
        lp += jnp.sum(mix.log_prob(xb), axis=0)
        return lp

    return log_joint


def responsibilities(x, logits, mu, log_sd):
    """Posterior assignment probabilities r[n, k] at one parameter set."""
    lw = jax.nn.log_softmax(logits, -1)
    comp_lp = zd.Normal(mu, logstd=log_sd).log_prob(x[:, None])
    r = lw + comp_lp
    return jax.nn.softmax(r, axis=-1)


def main(n_chains=16, n_iters=1500, n_adapt=800, n_data=600,
         verbose=True, key=None):
    key = jax.random.PRNGKey(42) if key is None else key
    x, true_comp = make_data(n_data)
    log_joint = make_log_joint(x)

    k_init, k_warm, k_run = jax.random.split(key, 3)
    init = {
        "logits": jnp.zeros((n_chains, 3)),
        "mu": jnp.asarray(
            np.random.default_rng(1).normal(0, 3, size=(n_chains, 3))
        ),
        "log_sd": jnp.zeros((n_chains, 3)),
    }
    hmc = zs.HMC(step_size=0.05, n_leapfrogs=20, adapt_step_size=True)
    state = hmc.init(init, n_chain_dims=1)
    state = jax.jit(
        lambda s, kk: hmc.warmup_run(log_joint, {}, s, kk,
                                     n_warmup=n_adapt)
    )(state, k_warm)
    state, info = jax.jit(
        lambda s, kk: hmc.run(log_joint, {}, s, kk, n_iters=n_iters)
    )(state, k_run)

    samples = {name: np.asarray(v) for name, v in info["samples"].items()}
    # Undo label switching per draw: order components by their mean.
    order = np.argsort(samples["mu"], axis=-1)
    mu_s = np.take_along_axis(samples["mu"], order, -1)
    sd_s = np.exp(np.take_along_axis(samples["log_sd"], order, -1))
    w_s = np.take_along_axis(
        np.asarray(jax.nn.softmax(jnp.asarray(samples["logits"]), -1)),
        order, -1,
    )

    stats = summary({"mu": jnp.asarray(mu_s)})
    post_mu = mu_s.reshape(-1, 3).mean(0)
    post_sd = sd_s.reshape(-1, 3).mean(0)
    post_w = w_s.reshape(-1, 3).mean(0)

    # MAP-style cluster assignment from the posterior-mean parameters.
    r = np.asarray(
        responsibilities(
            jnp.asarray(x),
            jnp.log(jnp.asarray(post_w)),
            jnp.asarray(post_mu),
            jnp.log(jnp.asarray(post_sd)),
        )
    )
    acc = float(np.mean(np.argmax(r, -1) == true_comp))

    if verbose:
        print("posterior weights:", np.round(post_w, 3),
              "(true", TRUE_W, ")")
        print("posterior means:  ", np.round(post_mu, 3),
              "(true", TRUE_MU, ")")
        print("posterior sds:    ", np.round(post_sd, 3),
              "(true", TRUE_SD, ")")
        print("clustering accuracy vs true labels:", acc)
        print("acceptance:",
              float(np.mean(np.asarray(info["acceptance_rate"]))))
    return (post_w, post_mu, post_sd), acc, stats


if __name__ == "__main__":
    main()
