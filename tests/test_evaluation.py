"""Evaluation tests.

The reference's ``tests/test_evaluation.py`` is an empty TODO placeholder;
here both ``is_loglikelihood`` and ``AIS`` are verified against a conjugate
model with a closed-form marginal likelihood:
z ~ N(0, 1), x | z ~ N(z, sigma)  =>  x ~ N(0, sqrt(1 + sigma^2)).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.evaluation import AIS, is_loglikelihood

SIGMA = 0.6
X_OBS = 1.3
TRUE_LOG_ML = (
    -0.5 * math.log(2 * math.pi * (1 + SIGMA ** 2))
    - 0.5 * X_OBS ** 2 / (1 + SIGMA ** 2)
)


@zs.meta_bayesian_net()
def build_model(n_chains):
    bn = zs.BayesianNet()
    z = bn.normal("z", jnp.zeros(n_chains), std=1.0)
    bn.normal("x", z.tensor, std=SIGMA)
    return bn


def test_is_loglikelihood_matches_truth():
    n = 100_000
    proposal = zs.BayesianNet(key=jax.random.PRNGKey(0))
    proposal.normal("z", 0.5, std=1.0, n_samples=n)

    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        z = bn.normal("z", 0.0, std=1.0)
        bn.normal("x", z.tensor, std=SIGMA)
        return bn

    ll = is_loglikelihood(
        model(), {"x": jnp.asarray(X_OBS)}, proposal=proposal, axis=0
    )
    np.testing.assert_allclose(float(ll), TRUE_LOG_ML, atol=0.01)


def test_ais_matches_truth():
    n_chains = 200

    @zs.meta_bayesian_net()
    def proposal():
        bn = zs.BayesianNet()
        bn.normal("z", jnp.zeros(n_chains), std=1.0)
        return bn

    model = build_model(n_chains)
    hmc = zs.HMC(step_size=0.3, n_leapfrogs=5, adapt_step_size=True)
    ais = AIS(
        model,
        proposal(),
        hmc,
        observed={"x": jnp.full((n_chains,), X_OBS)},
        latent=["z"],
        n_temperatures=100,
        n_adapt=20,
    )
    est = jax.jit(ais.run)(jax.random.PRNGKey(7))
    # AIS gives a stochastic lower bound converging to the true value.
    np.testing.assert_allclose(float(est), TRUE_LOG_ML, atol=0.05)
