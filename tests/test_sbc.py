"""Simulation-based calibration harness (zs.testing.sbc_test):
rank-uniformity on a conjugate model where inference is provably
calibrated, plus a sensitivity check that an autocorrelated
(unthinned, sticky) chain is flagged. Beyond the reference (whose
sampler tests are moment checks; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.testing import sbc_test

N_OBS = 5


@zs.meta_bayesian_net()
def conjugate_model():
    bn = zs.BayesianNet()
    mu = bn.normal("mu", jnp.asarray(0.0), std=jnp.asarray(1.0))
    mean = jnp.broadcast_to(
        mu.tensor[..., None], mu.tensor.shape + (N_OBS,)
    )
    bn.normal("y", mean, std=jnp.asarray(1.0), group_ndims=1)
    return bn


class TestSBC:
    def test_calibrated_hmc_passes(self):
        res = sbc_test(
            conjugate_model(),
            zs.HMC(step_size=0.3, n_leapfrogs=8, adapt_step_size=True),
            latent=["mu"], data=["y"], key=jax.random.PRNGKey(3),
            n_sims=256, n_draws=63, thinning=8, n_warmup=200,
        )
        # Correct model + correct kernel + thinning: ranks uniform.
        assert res.min_p_value > 1e-3, res.p_values
        assert set(res.ranks) == {"mean[mu]", "m2[mu]"}
        assert res.ranks["mean[mu]"].shape == (256,)
        assert res.ranks["mean[mu]"].min() >= 0
        assert res.ranks["mean[mu]"].max() <= 63
        assert res.histograms["mean[mu]"].sum() == 256
        assert res.expected_per_bin == 16.0

    def test_sticky_chain_is_flagged(self):
        # A frozen, tiny-step unthinned chain barely moves off theta_s;
        # ranks pile into a few bins and the chi-square test fires.
        res = sbc_test(
            conjugate_model(),
            zs.HMC(step_size=1e-4, n_leapfrogs=1),
            latent=["mu"], data=["y"], key=jax.random.PRNGKey(4),
            n_sims=256, n_draws=63, thinning=1, n_warmup=0,
        )
        assert res.min_p_value < 1e-6, res.p_values

    def test_node_coverage_validated(self):
        with pytest.raises(ValueError, match="cover"):
            sbc_test(
                conjugate_model(), zs.HMC(step_size=0.1, n_leapfrogs=2),
                latent=["mu"], data=[], key=jax.random.PRNGKey(0),
                n_sims=8, n_draws=7, n_bins=8,
            )

    def test_bin_divisibility_validated(self):
        with pytest.raises(ValueError, match="divisible"):
            sbc_test(
                conjugate_model(), zs.HMC(step_size=0.1, n_leapfrogs=2),
                latent=["mu"], data=["y"], key=jax.random.PRNGKey(0),
                n_sims=8, n_draws=10, n_bins=16,
            )

    def test_custom_statistic_and_nuts(self):
        res = sbc_test(
            conjugate_model(),
            zs.NUTS(step_size=0.3, max_tree_depth=5,
                    adapt_step_size=True),
            latent=["mu"], data=["y"], key=jax.random.PRNGKey(5),
            n_sims=128, n_draws=31, thinning=4, n_warmup=150,
            n_bins=8,
            statistics={"mu": lambda v: jnp.asarray(v["mu"])},
        )
        assert set(res.ranks) == {"mu"}
        assert res.min_p_value > 1e-3, res.p_values
