"""Geweke (2004) joint-distribution tests of the sampler kernels.

The conjugate test model is mu ~ N(0, 1), y | mu ~ N(mu, sigma) with 3
data points — small enough that 2000x64 successive-conditional steps run
in seconds, informative enough that a detailed-balance bug shifts the
joint moments by many standard errors (the ULA sensitivity case below
demonstrates the detection power).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.testing import geweke_test

SIGMA = 0.7


@zs.meta_bayesian_net()
def conjugate_model():
    bn = zs.BayesianNet()
    mu = bn.normal("mu", 0.0, std=1.0)
    # Three conditionally-iid observations; broadcasts over a leading
    # chain axis fed through mu.
    bn.normal("y", mu.tensor[..., None] * jnp.ones(3), std=SIGMA,
              group_ndims=1)
    return bn


KEY = jax.random.PRNGKey(2024)


class TestGewekeCorrectKernels:
    def test_hmc_passes(self):
        res = geweke_test(
            conjugate_model(),
            zs.HMC(step_size=0.25, n_leapfrogs=5),
            latent=["mu"], data=["y"], key=KEY,
            n_iters=2000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores
        # Sanity: the statistics battery covers moments + cross terms.
        assert set(res.z_scores) == {
            "mean[mu]", "m2[mu]", "cross[mu,y]"
        }

    def test_nuts_passes(self):
        res = geweke_test(
            conjugate_model(),
            zs.NUTS(step_size=0.4, max_tree_depth=5),
            latent=["mu"], data=["y"], key=jax.random.fold_in(KEY, 7),
            n_iters=2000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores

    def test_rwm_passes(self):
        res = geweke_test(
            conjugate_model(),
            zs.RandomWalkMetropolis(step_size=0.6),
            latent=["mu"], data=["y"], key=jax.random.fold_in(KEY, 1),
            n_iters=3000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores

    def test_slice_passes(self):
        res = geweke_test(
            conjugate_model(),
            zs.SliceSampler(width=2.0),
            latent=["mu"], data=["y"], key=jax.random.fold_in(KEY, 11),
            n_iters=2000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores

    def test_mala_passes(self):
        res = geweke_test(
            conjugate_model(),
            zs.MALA(step_size=0.3),
            latent=["mu"], data=["y"], key=jax.random.fold_in(KEY, 2),
            n_iters=3000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores


class TestGewekeSensitivity:
    def test_detects_unadjusted_langevin(self):
        """ULA (MALA without the MH correction) at a coarse step size is
        a biased kernel; the test must flag it loudly."""
        eps = 0.8

        def ula(meta_bn, observed, latent, key):
            from zhusuan_tpu.mcmc.base import (
                make_log_joint_fn, tree_normal_like,
            )

            log_post = make_log_joint_fn(meta_bn, observed)
            grads = jax.grad(
                lambda q: jnp.sum(log_post(q))
            )(latent)
            noise = tree_normal_like(key, latent)
            return {
                k: latent[k] + 0.5 * eps**2 * grads[k] + eps * noise[k]
                for k in latent
            }

        res = geweke_test(
            conjugate_model(), ula, latent=["mu"], data=["y"],
            key=jax.random.fold_in(KEY, 3),
            n_iters=2000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z > 8.0, res.z_scores

    def test_rejects_wrong_node_split(self):
        with pytest.raises(ValueError, match="cover"):
            geweke_test(
                conjugate_model(), zs.HMC(step_size=0.2),
                latent=["mu", "ghost"], data=[], key=KEY,
            )
