"""posterior_predictive helper (beyond-reference; framework/predictive.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import posterior_predictive


def _model(n_data=6):
    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        mu = bn.normal("mu", 0.0, std=jnp.asarray(10.0))
        bn.normal("x", mu.tensor * jnp.ones(n_data), std=jnp.asarray(0.5),
                  group_ndims=1)
        return bn

    return model()


class TestPosteriorPredictive:
    def test_shapes_and_default_outputs(self):
        draws = {"mu": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
        pred = posterior_predictive(_model(), draws, jax.random.PRNGKey(0))
        assert set(pred) == {"x"}
        assert pred["x"].shape == (4, 6)

    def test_predictive_distribution_statistics(self):
        # x | mu ~ N(mu, 0.5): conditional mean per draw ~= its mu, and
        # pooled std over many draws of a FIXED mu ~= 0.5.
        mu = jnp.full(4000, 2.0)
        pred = posterior_predictive(
            _model(n_data=8), {"mu": mu}, jax.random.PRNGKey(1)
        )
        x = np.asarray(pred["x"])
        assert abs(x.mean() - 2.0) < 0.02
        assert abs(x.std() - 0.5) < 0.02

    def test_mixes_posterior_uncertainty(self):
        # With mu draws spread out, the predictive variance must include
        # the posterior variance: Var(x) = Var(mu) + 0.25.
        rng = np.random.RandomState(0)
        mu = jnp.asarray(rng.randn(5000) * 1.5)
        pred = posterior_predictive(
            _model(n_data=2), {"mu": mu}, jax.random.PRNGKey(2)
        )
        x = np.asarray(pred["x"])
        expect_var = 1.5**2 + 0.25
        assert abs(x.var() - expect_var) < 0.15, (x.var(), expect_var)

    def test_explicit_outputs_and_validation(self):
        draws = {"mu": jnp.zeros(3)}
        pred = posterior_predictive(
            _model(), draws, jax.random.PRNGKey(0), outputs=["x"]
        )
        assert pred["x"].shape[0] == 3
        with pytest.raises(TypeError, match="MetaBayesianNet"):
            posterior_predictive(lambda o: 0.0, draws,
                                 jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="at least one"):
            posterior_predictive(_model(), {}, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="No stochastic nodes"):
            posterior_predictive(
                _model(), {"mu": jnp.zeros(3), "x": jnp.zeros((3, 6))},
                jax.random.PRNGKey(0),
            )

    def test_end_to_end_with_hmc(self):
        # Full loop: HMC posterior -> predictive -> coverage of held-out
        # data generated from the same process.
        model = _model(n_data=10)
        x_obs = jnp.asarray(np.full(10, 1.8) +
                            0.5 * np.random.RandomState(3).randn(10))

        def log_joint(obs):
            mu = obs["mu"]
            lp = -0.5 * (mu / 10.0) ** 2
            lp += jnp.sum(
                -0.5 * ((x_obs - mu[..., None]) / 0.5) ** 2, axis=-1
            )
            return lp

        hmc = zs.HMC(step_size=0.1, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init({"mu": jnp.zeros(16)}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: hmc.run(log_joint, {}, s, k, 800, n_adapt=400)
        )(state, jax.random.PRNGKey(4))
        mu_draws = out["samples"]["mu"][400:].reshape(-1)
        pred = posterior_predictive(
            model, {"mu": mu_draws}, jax.random.PRNGKey(5)
        )
        x = np.asarray(pred["x"])
        assert abs(x.mean() - float(jnp.mean(x_obs))) < 0.1
