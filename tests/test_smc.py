"""Annealed SMC (beyond-reference; smc.py).

Conjugate model with a closed-form evidence and posterior:
z ~ N(0, 1), x | z ~ N(z, sigma)  =>  log Z = log N(x; 0, sqrt(1+sigma^2)),
posterior N(x/(1+sigma^2), sigma^2/(1+sigma^2))."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import MALA, RandomWalkMetropolis
from zhusuan_tpu.smc import AnnealedSMC

SIGMA = 0.6
X_OBS = 1.3
TRUE_LOG_Z = (
    -0.5 * math.log(2 * math.pi * (1 + SIGMA**2))
    - 0.5 * X_OBS**2 / (1 + SIGMA**2)
)
POST_MEAN = X_OBS / (1 + SIGMA**2)
POST_STD = math.sqrt(SIGMA**2 / (1 + SIGMA**2))


def _proposal(n_particles):
    @zs.meta_bayesian_net()
    def proposal():
        bn = zs.BayesianNet()
        bn.normal("z", jnp.zeros(n_particles), std=1.0)
        return bn

    return proposal()


def _model():
    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        z = bn.normal("z", 0.0, std=1.0)
        bn.normal("x", z.tensor, std=SIGMA)
        return bn

    return model()


class TestConjugate:
    def _run(self, kernel, n_particles=4000, n_temperatures=50, seed=0):
        smc = AnnealedSMC(
            _model(), _proposal(n_particles), kernel,
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
            n_temperatures=n_temperatures, n_moves=2,
        )
        return jax.jit(smc.run)(jax.random.PRNGKey(seed))

    def test_evidence_and_posterior_mala(self):
        res = self._run(MALA(step_size=0.5))
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.03, (
            float(res.log_z), TRUE_LOG_Z)
        z = np.asarray(res.particles["z"])
        assert abs(z.mean() - POST_MEAN) < 0.05
        assert abs(z.std() - POST_STD) < 0.05
        assert res.ess.shape == (50,)
        assert res.acceptance_rate.shape == (50,)
        # MH rejuvenation must actually move particles.
        assert float(res.acceptance_rate[-1]) > 0.2

    def test_evidence_rwm_kernel(self):
        res = self._run(RandomWalkMetropolis(step_size=0.8), seed=1)
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.05

    def test_low_variance_across_seeds(self):
        # The population estimator should be tight: 3 independent runs
        # within a small band around the truth.
        vals = [
            float(self._run(MALA(step_size=0.5), n_particles=1000,
                            seed=s).log_z)  # round-5 thin: max err
            for s in range(3)               # 0.031 vs the 0.06 bound
        ]
        assert max(abs(v - TRUE_LOG_Z) for v in vals) < 0.06, vals

    def test_resampling_triggers_on_peaked_likelihood(self):
        # A far observation with small sigma collapses the ESS at the
        # first bridge steps -> resampling must fire at least once, and
        # the evidence must still be recovered.
        sigma, x_obs = 0.2, 2.5
        true_log_z = (
            -0.5 * math.log(2 * math.pi * (1 + sigma**2))
            - 0.5 * x_obs**2 / (1 + sigma**2)
        )

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            z = bn.normal("z", 0.0, std=1.0)
            bn.normal("x", z.tensor, std=sigma)
            return bn

        smc = AnnealedSMC(
            model(), _proposal(4000), MALA(step_size=0.3),
            observed={"x": jnp.asarray(x_obs)}, latent=["z"],
            n_temperatures=80, n_moves=3,
        )
        res = jax.jit(smc.run)(jax.random.PRNGKey(2))
        assert int(res.n_resamples) >= 1
        assert abs(float(res.log_z) - true_log_z) < 0.08, (
            float(res.log_z), true_log_z)
        z = np.asarray(res.particles["z"])
        post_mean = x_obs / (1 + sigma**2)
        assert abs(z.mean() - post_mean) < 0.05


class TestMultiLatent:
    def test_two_latents(self):
        # Independent conjugate pairs: evidence adds, posteriors factor.
        sig_a, sig_b, xa, xb = 0.5, 1.0, 0.7, -1.1
        true_log_z = sum(
            -0.5 * math.log(2 * math.pi * (1 + s**2))
            - 0.5 * x**2 / (1 + s**2)
            for s, x in [(sig_a, xa), (sig_b, xb)]
        )
        n = 4000

        @zs.meta_bayesian_net()
        def proposal():
            bn = zs.BayesianNet()
            bn.normal("a", jnp.zeros(n), std=1.0)
            bn.normal("b", jnp.zeros(n), std=1.0)
            return bn

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            a = bn.normal("a", 0.0, std=1.0)
            b = bn.normal("b", 0.0, std=1.0)
            bn.normal("xa", a.tensor, std=sig_a)
            bn.normal("xb", b.tensor, std=sig_b)
            return bn

        smc = AnnealedSMC(
            model(), proposal(), MALA(step_size=0.5),
            observed={"xa": jnp.asarray(xa), "xb": jnp.asarray(xb)},
            latent=["a", "b"], n_temperatures=60, n_moves=2,
        )
        res = jax.jit(smc.run)(jax.random.PRNGKey(3))
        assert abs(float(res.log_z) - true_log_z) < 0.05
        a = np.asarray(res.particles["a"])
        assert abs(a.mean() - xa / (1 + sig_a**2)) < 0.05


class TestValidation:
    def test_bad_kernel(self):
        with pytest.raises(TypeError, match="RandomWalkMetropolis, MALA"):
            AnnealedSMC(_model(), _proposal(8), zs.SGLD(1e-3),
                        observed={}, latent=["z"])

    def test_bad_args(self):
        k = MALA(step_size=0.1)
        with pytest.raises(ValueError, match="n_temperatures"):
            AnnealedSMC(_model(), _proposal(8), k, {}, ["z"],
                        n_temperatures=0)
        with pytest.raises(ValueError, match="n_moves"):
            AnnealedSMC(_model(), _proposal(8), k, {}, ["z"], n_moves=-1)
        with pytest.raises(ValueError, match="resample_threshold"):
            AnnealedSMC(_model(), _proposal(8), k, {}, ["z"],
                        resample_threshold=1.5)

    def test_multi_axis_chain_shape_rejected(self):
        @zs.meta_bayesian_net()
        def proposal():
            bn = zs.BayesianNet()
            bn.normal("z", jnp.zeros((4, 4)), std=1.0)
            return bn

        smc = AnnealedSMC(
            _model(), proposal(), MALA(step_size=0.1),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
        )
        with pytest.raises(ValueError, match="single particle axis"):
            smc.run(jax.random.PRNGKey(0))


class TestAdaptive:
    def test_adaptive_matches_truth_with_fewer_steps(self):
        smc = AnnealedSMC(
            _model(), _proposal(4000), MALA(step_size=0.5),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
            n_moves=2,
        )
        res = jax.jit(lambda k: smc.run_adaptive(k, target_cess=0.9))(
            jax.random.PRNGKey(0)
        )
        n_steps = int(res.n_steps)
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.03, (
            float(res.log_z), TRUE_LOG_Z)
        z = np.asarray(res.particles["z"])
        assert abs(z.mean() - POST_MEAN) < 0.05
        assert abs(z.std() - POST_STD) < 0.05
        # The adaptive ladder on this easy bridge needs far fewer than
        # the 50-step fixed default.
        assert 1 <= n_steps < 40, n_steps
        betas = np.asarray(res.betas)
        assert abs(betas[n_steps - 1] - 1.0) < 1e-6
        assert np.all(np.isnan(betas[n_steps:]))
        assert np.all(np.diff(betas[:n_steps]) > 0)

    def test_adaptive_peaked_likelihood(self):
        # The hard bridge from the resampling test: adaptive tempering
        # must still land on the right evidence.
        sigma, x_obs = 0.2, 2.5
        true_log_z = (
            -0.5 * math.log(2 * math.pi * (1 + sigma**2))
            - 0.5 * x_obs**2 / (1 + sigma**2)
        )

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            z = bn.normal("z", 0.0, std=1.0)
            bn.normal("x", z.tensor, std=sigma)
            return bn

        smc = AnnealedSMC(
            model(), _proposal(4000), MALA(step_size=0.3),
            observed={"x": jnp.asarray(x_obs)}, latent=["z"], n_moves=3,
        )
        res = jax.jit(lambda k: smc.run_adaptive(k, target_cess=0.95))(
            jax.random.PRNGKey(1)
        )
        assert abs(float(res.log_z) - true_log_z) < 0.08, (
            float(res.log_z), true_log_z)

    def test_bad_target_cess(self):
        smc = AnnealedSMC(
            _model(), _proposal(8), MALA(step_size=0.1),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
        )
        with pytest.raises(ValueError, match="target_cess"):
            smc.run_adaptive(jax.random.PRNGKey(0), target_cess=1.5)

    def test_max_steps_exhaustion_closes_bridge(self):
        # Regression: when max_steps runs out before beta reaches 1, a
        # forced closing jump must land the ladder exactly at 1 (the
        # result describes the POSTERIOR, with honest extra variance) —
        # not silently return a half-tempered target.
        smc = AnnealedSMC(
            _model(), _proposal(4000), MALA(step_size=0.5),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"], n_moves=2,
        )
        res = jax.jit(
            lambda k: smc.run_adaptive(k, target_cess=0.999, max_steps=3)
        )(jax.random.PRNGKey(7))
        n_steps = int(res.n_steps)
        betas = np.asarray(res.betas)
        assert abs(betas[n_steps - 1] - 1.0) < 1e-9
        # This easy bridge stays accurate even through the forced jump.
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.1

    def test_target_cess_one_rejected(self):
        smc = AnnealedSMC(
            _model(), _proposal(8), MALA(step_size=0.1),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
        )
        with pytest.raises(ValueError, match="target_cess"):
            smc.run_adaptive(jax.random.PRNGKey(0), target_cess=1.0)


class TestHMCKernel:
    def test_hmc_rejuvenation_matches_truth(self):
        # HMC as the rejuvenation kernel (gradient-based moves — the
        # right choice in higher dimensions).
        smc = AnnealedSMC(
            _model(), _proposal(4000),
            zs.HMC(step_size=0.3, n_leapfrogs=5),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"],
            n_temperatures=50, n_moves=2,
        )
        res = jax.jit(smc.run)(jax.random.PRNGKey(4))
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.03, (
            float(res.log_z), TRUE_LOG_Z)
        z = np.asarray(res.particles["z"])
        assert abs(z.mean() - POST_MEAN) < 0.05
        assert abs(z.std() - POST_STD) < 0.05
        assert float(res.acceptance_rate[-1]) > 0.5  # HMC moves well

    def test_hmc_kernel_adaptive_ladder(self):
        smc = AnnealedSMC(
            _model(), _proposal(2000),
            zs.HMC(step_size=0.3, n_leapfrogs=5),
            observed={"x": jnp.asarray(X_OBS)}, latent=["z"], n_moves=2,
        )
        res = jax.jit(
            lambda k: smc.run_adaptive(k, target_cess=0.9)
        )(jax.random.PRNGKey(5))
        assert abs(float(res.log_z) - TRUE_LOG_Z) < 0.05
