"""Pathfinder VI (beyond-reference; variational/pathfinder.py).

The Gaussian-target tests are exacting: for a Gaussian posterior the
L-BFGS inverse-Hessian estimate converges to the true covariance, so the
selected approximation must reproduce mean AND covariance (not just
marginal scales). The non-Gaussian test checks the multipath PSIS
machinery end to end against closed-form moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu as zs
from zhusuan_tpu.variational import multipath_pathfinder, pathfinder


def _mvn_target(dim=5, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(dim, dim)
    cov = a @ a.T + dim * np.eye(dim)
    cov = cov / np.diag(cov).mean()
    mean = rng.randn(dim) * 2.0
    prec = np.linalg.inv(cov)

    def log_joint(obs):
        z = obs["z"] - jnp.asarray(mean)
        return -0.5 * jnp.einsum("...i,ij,...j->...", z, jnp.asarray(prec), z)

    return log_joint, mean, cov


class TestSinglePath:
    def test_gaussian_mean_and_covariance(self):
        log_joint, mean, cov = _mvn_target(dim=5)
        res = pathfinder(
            log_joint, {}, {"z": jnp.zeros(5)}, jax.random.PRNGKey(0),
            n_draws=4000, max_iters=60,
        )
        draws = np.asarray(res.draws["z"])
        assert draws.shape == (4000, 5)
        np.testing.assert_allclose(draws.mean(0), mean, atol=0.08)
        got_cov = np.cov(draws.T)
        np.testing.assert_allclose(got_cov, cov, atol=0.12)
        # For an exactly-Gaussian target the selected approximation is
        # (near-)exact, so the ELBO of the unnormalized density equals
        # log Z = d/2 log 2pi + 1/2 logdet cov.
        want = 2.5 * np.log(2 * np.pi) + 0.5 * np.linalg.slogdet(cov)[1]
        assert abs(float(res.elbo) - want) < 0.05, (float(res.elbo), want)

    def test_jittable_and_mode_near_optimum(self):
        log_joint, mean, _ = _mvn_target(dim=3, seed=1)
        fn = jax.jit(
            lambda k: pathfinder(
                log_joint, {}, {"z": jnp.zeros(3)}, k,
                n_draws=100, max_iters=40,
            )
        )
        res = fn(jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(res.mode["z"]), mean, atol=0.02
        )
        assert int(res.best_iter) >= 0
        assert np.isfinite(np.asarray(res.log_q)).all()

    def test_multi_latent_dict_and_meta_bn(self):
        y = jnp.asarray([1.1, 0.9, 1.3])

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            mu = bn.normal("mu", 0.0, std=2.0)
            b = bn.normal("b", 0.0, std=1.0)
            bn.normal("y", (mu.tensor + 0.5 * b.tensor) * jnp.ones(3),
                      std=0.5, group_ndims=1)
            return bn

        res = pathfinder(
            model(), {"y": y}, {"mu": jnp.asarray(0.0), "b": jnp.asarray(0.0)},
            jax.random.PRNGKey(2), n_draws=2000, max_iters=50,
        )
        # theta = mu + 0.5 b ~ N(0, 4.25) prior; posterior of theta from
        # 3 obs with noise var 0.25.
        post_var = 1.0 / (1.0 / 4.25 + 3.0 / 0.25)
        post_mean = float(y.sum() / 0.25 * post_var)
        theta = (
            np.asarray(res.draws["mu"]) + 0.5 * np.asarray(res.draws["b"])
        )
        assert abs(theta.mean() - post_mean) < 0.05
        assert abs(theta.std() - np.sqrt(post_var)) < 0.03

    def test_scalar_latent(self):
        # D=1 < 2*history exercises the thin-QR K < 2m branch.
        def log_joint(obs):
            return -0.5 * ((obs["z"] - 3.0) / 0.5) ** 2

        res = pathfinder(
            log_joint, {}, {"z": jnp.asarray(0.0)}, jax.random.PRNGKey(3),
            n_draws=4000, max_iters=30,
        )
        z = np.asarray(res.draws["z"])
        assert abs(z.mean() - 3.0) < 0.03
        assert abs(z.std() - 0.5) < 0.03

    def test_batched_init_raises(self):
        log_joint, _, _ = _mvn_target(dim=3)
        with pytest.raises(ValueError, match="UNBATCHED"):
            pathfinder(
                log_joint, {}, {"z": jnp.zeros((4, 3))},
                jax.random.PRNGKey(0),
            )


class TestMultiPath:
    def test_gaussian_pooled_moments_and_khat(self):
        log_joint, mean, cov = _mvn_target(dim=4, seed=2)
        inits = {"z": jax.random.normal(jax.random.PRNGKey(9), (4, 4)) * 3.0}
        # Round-5 thin: measured margins at 1000/500/30 are mean err
        # 0.063 / cov err 0.076 / khat 0.46 vs bounds 0.1 / 0.15 / 0.7.
        res = multipath_pathfinder(
            log_joint, {}, inits, jax.random.PRNGKey(4),
            n_draws=1000, n_draws_per_path=500, max_iters=30,
        )
        draws = np.asarray(res.draws["z"])
        assert draws.shape == (1000, 4)
        np.testing.assert_allclose(draws.mean(0), mean, atol=0.1)
        np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.15)
        # Gaussian target -> the approximation is near-exact -> flat
        # importance ratios -> excellent Pareto-k.
        assert res.khat < 0.7, res.khat
        assert np.asarray(res.path_elbos).shape == (4,)

    def test_skewed_target_moment_correction(self):
        # log-Gamma(3) latent: log p(z) = 3 z - e^z (+const). Skewed, so
        # a single Gaussian is biased; PSIS resampling must pull the
        # pooled draws toward the exact moments E[z] = digamma(3),
        # Var[z] = trigamma(3).
        from scipy.special import digamma, polygamma

        def log_joint(obs):
            z = obs["z"]
            return jnp.squeeze(3.0 * z - jnp.exp(z), -1)

        inits = {"z": jnp.linspace(-1.0, 2.0, 6)[:, None]}
        res = multipath_pathfinder(
            log_joint, {}, inits, jax.random.PRNGKey(5),
            n_draws=3000, n_draws_per_path=2000, max_iters=40,
        )
        z = np.asarray(res.draws["z"]).ravel()
        want_mean = float(digamma(3.0))
        want_std = float(np.sqrt(polygamma(1, 3.0)))
        assert abs(z.mean() - want_mean) < 0.06, (z.mean(), want_mean)
        assert abs(z.std() - want_std) < 0.06, (z.std(), want_std)
        assert res.khat < 0.7, res.khat
        # The resampling must CORRECT the Gaussian approximation: the
        # mode of this target is log 3 ~ 1.0986, well above the true
        # mean; a mode-centered Gaussian leaves the mean near the mode.
        mode = float(np.log(3.0))
        assert abs(z.mean() - want_mean) < 0.5 * abs(mode - want_mean)

    def test_n_draws_exceeding_pool_raises(self):
        log_joint, _, _ = _mvn_target(dim=2)
        inits = {"z": jnp.zeros((2, 2))}
        with pytest.raises(ValueError, match="pooled"):
            multipath_pathfinder(
                log_joint, {}, inits, jax.random.PRNGKey(0),
                n_draws=1000, n_draws_per_path=100, max_iters=10,
            )


class TestMCMCWarmStart:
    def test_init_and_mass_feed_hmc(self):
        """pathfinder_mcmc_init: draws become chain starts, inverse
        variances the diagonal mass; a short no-adapt HMC run from them
        is immediately in the typical set of an anisotropic target."""
        from zhusuan_tpu.variational import pathfinder_mcmc_init

        stds = np.array([0.3, 3.0])

        def log_joint(obs):
            return jnp.sum(
                -0.5 * ((obs["z"] - 1.0) / jnp.asarray(stds)) ** 2, -1
            )

        res = pathfinder(
            log_joint, {}, {"z": jnp.zeros(2)}, jax.random.PRNGKey(0),
            n_draws=512, max_iters=50,
        )
        init, mass = pathfinder_mcmc_init(res, n_chains=256)
        assert init["z"].shape == (256, 2)
        assert mass["z"].shape == (1, 2)
        # Mass approximates the posterior precision 1/std^2.
        np.testing.assert_allclose(
            np.asarray(mass["z"][0]), 1.0 / stds**2, rtol=0.3
        )
        hmc = zs.HMC(step_size=0.5, n_leapfrogs=5)
        state = hmc.init(init, n_chain_dims=1)._replace(mass=mass)
        state, out = jax.jit(
            lambda s, k: hmc.run(log_joint, {}, s, k, n_iters=300)
        )(state, jax.random.PRNGKey(1))
        s = np.asarray(out["samples"]["z"]).reshape(-1, 2)
        # NO burn-in discarded: the warm start must already be correct.
        np.testing.assert_allclose(s.mean(0), [1.0, 1.0], atol=0.05)
        np.testing.assert_allclose(s.std(0), stds, rtol=0.1)
        acc = float(np.asarray(out["acceptance_rate"]).mean())
        assert acc > 0.5, acc

    def test_too_few_draws_raises(self):
        from zhusuan_tpu.variational import pathfinder_mcmc_init

        def log_joint(obs):
            return -0.5 * jnp.sum(obs["z"] ** 2, -1)

        res = pathfinder(
            log_joint, {}, {"z": jnp.zeros(2)}, jax.random.PRNGKey(0),
            n_draws=8, max_iters=10,
        )
        with pytest.raises(ValueError, match="exceeds"):
            pathfinder_mcmc_init(res, n_chains=64)
