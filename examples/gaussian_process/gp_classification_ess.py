"""GP binary classification via elliptical slice sampling.

Beyond the reference's zoo (SURVEY.md §2.12 has only the variational
svgp.py): full MCMC over the GP latent function with
:class:`~zhusuan_tpu.mcmc.EllipticalSlice` — the standard exact-inference
baseline for non-Gaussian GP likelihoods. The prior covariance enters as
a Cholesky factor; the likelihood is a logit link; no tuning parameters
anywhere.

Run: ``python -m examples.gaussian_process.gp_classification_ess``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc import EllipticalSlice


def make_data(n=60, seed=0):
    """1-D two-band labels with a few stochastic flips."""
    rng = np.random.RandomState(seed)
    x = np.sort(rng.uniform(-1.0, 1.0, n)).astype(np.float64)
    p = 1.0 / (1.0 + np.exp(-4.0 * np.sin(3.0 * x)))
    y = np.where(rng.rand(n) < p, 1.0, -1.0)
    return x, y


def main(n_chains=64, n_iters=2000, burn_in=800, scale=3.0):
    x, y = make_data()
    # Gram matrix in host f64 (the f32 RBF Gram at this lengthscale is not
    # numerically PD); same form as examples/gaussian_process/utils.RBFKernel
    # with softplus(raw) = lengthscale^2 = 0.09.
    sq = (x[:, None] - x[None, :]) ** 2
    k_mat = np.exp(-0.5 * sq / 0.09) + 1e-8 * np.eye(len(x))
    chol = jnp.asarray(np.linalg.cholesky(k_mat))
    y_j = jnp.asarray(y)

    def log_lik(obs):
        return jnp.sum(
            jax.nn.log_sigmoid(scale * y_j * obs["f"]), axis=-1
        )

    ess = EllipticalSlice(prior_chol={"f": chol})
    state = ess.init({"f": jnp.zeros((n_chains, len(x)))}, n_chain_dims=1)
    state, out = jax.jit(
        lambda s, k: ess.run(log_lik, {}, s, k, n_iters=n_iters)
    )(state, jax.random.PRNGKey(1))

    f = np.asarray(out["samples"]["f"][burn_in:]).reshape(-1, len(x))
    p_pred = 1.0 / (1.0 + np.exp(-scale * f))  # per-draw probabilities
    p_mean = p_pred.mean(axis=0)
    acc = float(((p_mean > 0.5) == (y > 0)).mean())
    base = float(max((y > 0).mean(), (y < 0).mean()))
    print(
        "GP-ESS classification: train acc {:.3f} (majority baseline "
        "{:.3f}); mean shrink steps {:.1f}".format(
            acc, base, float(np.asarray(out["n_shrinks"]).mean())
        )
    )
    return acc, base


if __name__ == "__main__":
    main()
