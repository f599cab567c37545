"""Robust Bayesian regression: StudentT likelihood + HalfCauchy scale,
HMC over bijector-unconstrained coordinates.

Beyond the reference's zoo: ties together three beyond-reference pieces —
the heavy-tailed heads (``distributions/extra.py``), the HalfCauchy scale
prior, and ``zhusuan_tpu.bijectors`` for Jacobian-correct sampling of the
positive noise scale. On data with gross outliers the StudentT posterior
slope stays near the truth where ordinary least squares is dragged away
— the example asserts exactly that comparison.

Run: ``python -m examples.robust_models.robust_regression``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.bijectors import Softplus, transform_log_joint


def make_data(n=40, slope=2.0, noise=0.3, outlier=4.0, seed=0):
    rng = np.random.RandomState(seed)
    x = np.linspace(-1.0, 1.0, n)
    y = slope * x + noise * rng.randn(n)
    y[::9] += outlier  # gross positive outliers
    return x, y


def make_log_joint(x, y, df=3.0):
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    t = zs.distributions.StudentT(
        jnp.asarray(float(df)), jnp.asarray(0.0), jnp.asarray(1.0)
    )

    def log_joint(obs):
        w, sigma = obs["w"], obs["sigma"]
        lp = zs.distributions.Normal(
            jnp.asarray(0.0), std=jnp.asarray(5.0)
        ).log_prob(w)
        lp += zs.distributions.HalfCauchy(jnp.asarray(1.0)).log_prob(sigma)
        resid = yj - w[..., None] * xj
        # StudentT(0, sigma) via the standard location-scale shift.
        lp += jnp.sum(
            t.log_prob(resid / sigma[..., None])
            - jnp.log(sigma)[..., None],
            axis=-1,
        )
        return lp

    return log_joint


def main(n_chains=64, n_iters=1500, n_adapt=700):
    x, y = make_data()
    log_joint = make_log_joint(x, y)

    ulj, to_u, to_c = transform_log_joint(log_joint, {"sigma": Softplus()})
    hmc = zs.HMC(step_size=0.05, n_leapfrogs=10, adapt_step_size=True)
    state = hmc.init(
        to_u({"w": jnp.zeros(n_chains), "sigma": jnp.ones(n_chains)}),
        n_chain_dims=1,
    )
    state, out = jax.jit(
        lambda s, k: hmc.run(ulj, {}, s, k, n_iters, n_adapt=n_adapt)
    )(state, jax.random.PRNGKey(0))
    cons = to_c({k: v[n_adapt:] for k, v in out["samples"].items()})
    w = np.asarray(cons["w"]).ravel()
    sigma = np.asarray(cons["sigma"]).ravel()

    ols = float(np.sum(x * y) / np.sum(x * x))
    print(
        "robust slope {:.3f} +- {:.3f} | sigma {:.3f} | OLS slope {:.3f} "
        "(true 2.0)".format(w.mean(), w.std(), sigma.mean(), ols)
    )
    return float(w.mean()), ols


if __name__ == "__main__":
    main()
