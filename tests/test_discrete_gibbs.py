"""Exact-conditional discrete Gibbs (beyond-reference; mcmc/discrete.py).

The GMM test is the canonical use: labels by exact conditionals, means
by HMC, validated against BRUTE-FORCE enumeration of all label
configurations (conjugate evidence per configuration) — the strongest
check available for a label sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import HMC, DiscreteGibbs, Gibbs
from zhusuan_tpu.testing import geweke_test

SIGMA_Y = 0.8


def _bern_emission(obs):
    """x in {0,1} with p(x=1)=0.3; y | x ~ N(x, SIGMA_Y)."""
    x = obs["x"]
    prior = x * jnp.log(0.3) + (1.0 - x) * jnp.log(0.7)
    return prior - 0.5 * ((obs["y"] - x) / SIGMA_Y) ** 2


class TestExactConditionals:
    def test_bernoulli_posterior_frequency(self):
        y = 0.9
        sampler = DiscreteGibbs({"x": jnp.asarray([0.0, 1.0])})
        state = sampler.init({"x": jnp.zeros(512)}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: sampler.run(
                _bern_emission, {"y": jnp.asarray(y)}, s, k, n_iters=300
            )
        )(state, jax.random.PRNGKey(0))
        # Exact: p(x=1|y) from the two-way enumeration.
        l1 = 0.3 * stats.norm.pdf(y, 1.0, SIGMA_Y)
        l0 = 0.7 * stats.norm.pdf(y, 0.0, SIGMA_Y)
        want = l1 / (l0 + l1)
        got = float(np.asarray(out["samples"]["x"]).mean())
        se = np.sqrt(want * (1 - want) / (512 * 300))
        # Draws are exact conditional => iid across sweeps here (single
        # site, fixed conditional); allow 6 sigma.
        assert abs(got - want) < max(6 * se, 0.01), (got, want)

    def test_multi_coordinate_latent(self):
        # 3 sites with DIFFERENT observations -> different posteriors;
        # the coordinate sweep must hit each one with its own conditional.
        ys = jnp.asarray([0.9, -0.4, 0.5])

        def log_joint(obs):
            x = obs["x"]  # [..., 3]
            prior = jnp.sum(
                x * jnp.log(0.3) + (1.0 - x) * jnp.log(0.7), axis=-1
            )
            return prior - 0.5 * jnp.sum(
                ((obs["y"] - x) / SIGMA_Y) ** 2, axis=-1
            )

        sampler = DiscreteGibbs({"x": jnp.asarray([0.0, 1.0])})
        state = sampler.init({"x": jnp.zeros((256, 3))}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: sampler.run(log_joint, {"y": ys}, s, k, n_iters=300)
        )(state, jax.random.PRNGKey(1))
        got = np.asarray(out["samples"]["x"]).reshape(-1, 3).mean(0)
        for j, y in enumerate(np.asarray(ys)):
            l1 = 0.3 * stats.norm.pdf(y, 1.0, SIGMA_Y)
            l0 = 0.7 * stats.norm.pdf(y, 0.0, SIGMA_Y)
            want = l1 / (l0 + l1)
            assert abs(got[j] - want) < 0.01, (j, got[j], want)

    def test_geweke_discrete_kernel(self):
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            x = bn.bernoulli("x", jnp.log(0.3 / 0.7))
            bn.normal("y", x.tensor * 1.0, std=SIGMA_Y)
            return bn

        res = geweke_test(
            model(), DiscreteGibbs({"x": jnp.asarray([0.0, 1.0])}),
            latent=["x"], data=["y"], key=jax.random.PRNGKey(3),
            n_iters=2000, n_chains=64, n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores


class TestGMMLabelsByGibbs:
    def test_matches_exact_enumeration(self):
        """2-component GMM, 5 points: labels via DiscreteGibbs, means via
        HMC; posterior mean of each component mean must match the exact
        answer from enumerating all 2^5 label configurations (conjugate
        normal evidence per configuration)."""
        x_data = np.asarray([-2.1, -1.7, 0.3, 1.9, 2.4])
        tau = 1.5  # prior std of each component mean
        prior_means = np.asarray([-2.0, 2.0])  # asymmetric: no switching
        sig = 0.7  # observation noise
        w1 = 0.5  # mixing weight (fixed)

        # ---- exact enumeration -------------------------------------- #
        def config_stats(cfg):
            log_ev = 0.0
            post_mu = np.zeros(2)
            for k in (0, 1):
                pts = x_data[np.asarray(cfg) == k]
                n = len(pts)
                prec = 1.0 / tau**2 + n / sig**2
                mean = (prior_means[k] / tau**2 + pts.sum() / sig**2) / prec
                post_mu[k] = mean
                # Marginal evidence of this component's points.
                if n:
                    cov = np.full((n, n), tau**2) + sig**2 * np.eye(n)
                    log_ev += stats.multivariate_normal.logpdf(
                        pts, np.full(n, prior_means[k]), cov
                    )
            log_prior_c = np.log(w1) * 5  # uniform labels
            return log_ev + log_prior_c, post_mu

        import itertools

        log_ws, mus = [], []
        for cfg in itertools.product((0, 1), repeat=5):
            lw, mu = config_stats(cfg)
            log_ws.append(lw)
            mus.append(mu)
        log_ws = np.asarray(log_ws)
        w = np.exp(log_ws - log_ws.max())
        w /= w.sum()
        exact_mu = (w[:, None] * np.asarray(mus)).sum(0)

        # ---- Gibbs: labels exact-conditional, means HMC -------------- #
        xj = jnp.asarray(x_data)

        def log_joint(obs):
            mu, c = obs["mu"], obs["c"]  # [C,2], [C,5]
            prior_mu = -0.5 * jnp.sum(
                ((mu - jnp.asarray(prior_means)) / tau) ** 2, axis=-1
            )
            chosen = jnp.take_along_axis(mu, c.astype(jnp.int32), axis=-1)
            lik = -0.5 * jnp.sum(((xj - chosen) / sig) ** 2, axis=-1)
            return prior_mu + lik  # uniform label prior is constant

        sampler = Gibbs([
            (DiscreteGibbs({"c": jnp.asarray([0.0, 1.0])}), ["c"]),
            (HMC(step_size=0.15, n_leapfrogs=6, adapt_step_size=True),
             ["mu"]),
        ])
        state = sampler.init(
            {"mu": jnp.tile(jnp.asarray(prior_means), (128, 1)),
             "c": jnp.zeros((128, 5))},
            n_chain_dims=1,
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(
                log_joint, {}, s, k, n_iters=3000, n_adapt=1000
            )
        )(state, jax.random.PRNGKey(4))
        mu_draws = np.asarray(out["samples"]["mu"][1000:]).reshape(-1, 2)
        got_mu = mu_draws.mean(0)
        np.testing.assert_allclose(got_mu, exact_mu, atol=0.05)
        # Label posterior for the most separated point must also match.
        c_draws = np.asarray(out["samples"]["c"][1000:]).reshape(-1, 5)
        p_right = c_draws.mean(0)  # P(c_i = 1)
        exact_p = (w[:, None] * np.asarray(
            list(itertools.product((0, 1), repeat=5)))).sum(0)
        np.testing.assert_allclose(p_right, exact_p, atol=0.03)


class TestContract:
    def test_validation_errors(self):
        with pytest.raises(ValueError, match="at least one"):
            DiscreteGibbs({})
        with pytest.raises(ValueError, match=">= 2"):
            DiscreteGibbs({"x": jnp.asarray([1.0])})
        with pytest.raises(ValueError, match="1-D"):
            DiscreteGibbs({"x": jnp.zeros((2, 2))})
        g = DiscreteGibbs({"x": jnp.asarray([0.0, 1.0])})
        with pytest.raises(ValueError, match="cover"):
            g.init({"x": jnp.zeros(4), "z": jnp.zeros(4)}, n_chain_dims=1)
        s0 = g.init({"x": jnp.zeros(4)}, n_chain_dims=1)
        with pytest.raises(ValueError, match="collect field"):
            g.run(_bern_emission, {"y": jnp.asarray(0.1)}, s0,
                  jax.random.PRNGKey(0), n_iters=2, collect_fields=("no",))

    def test_thinning_matches_sliced_full_run(self):
        g = DiscreteGibbs({"x": jnp.asarray([0.0, 1.0])})
        s0 = g.init({"x": jnp.zeros(8)}, n_chain_dims=1)
        obs = {"y": jnp.asarray(0.4)}
        key = jax.random.PRNGKey(5)
        fs, full = g.run(_bern_emission, obs, s0, key, n_iters=12)
        ts, thin = g.run(_bern_emission, obs, s0, key, n_iters=12,
                         thinning=4)
        np.testing.assert_array_equal(
            np.asarray(thin["samples"]["x"]),
            np.asarray(full["samples"]["x"][3::4]),
        )
        np.testing.assert_array_equal(
            np.asarray(ts.q["x"]), np.asarray(fs.q["x"])
        )
