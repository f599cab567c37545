"""Bijectors for constrained-latent sampling (beyond-reference;
bijectors.py). Posterior checks compare sampler output to dense
quadrature over the constrained coordinate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.bijectors import (
    Exp,
    Sigmoid,
    Softplus,
    transform_log_joint,
)


class TestBijectorMaps:
    @pytest.mark.parametrize("bij,lo", [
        (Exp(), 0.0), (Softplus(), 0.0), (Sigmoid(), 0.0),
        (Sigmoid(-2.0, 3.0), -2.0),
    ])
    def test_roundtrip_and_log_det(self, bij, lo):
        y = jnp.linspace(-4.0, 4.0, 41, dtype=jnp.float64)
        x = bij.forward(y)
        np.testing.assert_allclose(np.asarray(bij.inverse(x)),
                                   np.asarray(y), rtol=1e-8, atol=1e-8)
        # log-det vs autodiff derivative.
        d = jax.vmap(jax.grad(lambda t: bij.forward(t)))(y)
        np.testing.assert_allclose(
            np.asarray(bij.forward_log_det(y)),
            np.asarray(jnp.log(d)), rtol=1e-6, atol=1e-12,
        )

    def test_sigmoid_validation(self):
        with pytest.raises(ValueError, match="hi > lo"):
            Sigmoid(1.0, 1.0)


def _quadrature_posterior(log_post_1d, lo, hi, n=40001):
    grid = np.linspace(lo, hi, n)
    lp = np.asarray(jax.vmap(log_post_1d)(jnp.asarray(grid)))
    w = np.exp(lp - lp.max())
    w /= w.sum()
    mean = float((grid * w).sum())
    std = float(np.sqrt(((grid - mean) ** 2 * w).sum()))
    return mean, std


class TestConstrainedHMC:
    def test_half_cauchy_scale_posterior(self):
        # sigma ~ HalfCauchy(1), x_i ~ N(0, sigma): HMC over softplus^-1
        # coordinates must match quadrature over sigma.
        rng = np.random.RandomState(0)
        x = jnp.asarray(0.8 * rng.randn(50))

        def log_joint(obs):
            sigma = obs["sigma"]
            lp = zs.distributions.HalfCauchy(jnp.float64(1.0)).log_prob(
                sigma)
            lp += jnp.sum(
                -0.5 * (x / sigma[..., None]) ** 2
                - jnp.log(sigma)[..., None]
                - 0.5 * jnp.log(2 * jnp.pi),
                axis=-1,
            )
            return lp

        mean_q, std_q = _quadrature_posterior(
            lambda s: log_joint({"sigma": s}), 1e-3, 5.0
        )

        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"sigma": Softplus()}
        )
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=10, adapt_step_size=True)
        state = hmc.init(
            to_u({"sigma": jnp.ones(128, jnp.float64)}), n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, 2000, n_adapt=1000)
        )(state, jax.random.PRNGKey(1))
        sigma = np.asarray(
            to_c({"sigma": out["samples"]["sigma"][1000:]})["sigma"]
        ).ravel()
        assert sigma.min() > 0
        assert abs(sigma.mean() - mean_q) < 0.03, (sigma.mean(), mean_q)
        assert abs(sigma.std() - std_q) < 0.03, (sigma.std(), std_q)

    def test_interval_latent_with_mala(self):
        # p ~ Beta-like posterior on (0, 1) via the Sigmoid bijector.
        k_heads, n_tot = 7, 20

        def log_joint(obs):
            p = obs["p"]
            # Beta(2, 2) prior + binomial likelihood (unnormalized).
            return (
                jnp.log(p) + jnp.log1p(-p)
                + k_heads * jnp.log(p) + (n_tot - k_heads) * jnp.log1p(-p)
            )

        mean_q, std_q = _quadrature_posterior(
            lambda p: log_joint({"p": p}), 1e-4, 1 - 1e-4
        )
        ulj, to_u, to_c = transform_log_joint(log_joint, {"p": Sigmoid()})
        mala = zs.MALA(step_size=0.3, adapt_step_size=True)
        state = mala.init(
            to_u({"p": 0.5 * jnp.ones(256, jnp.float64)}), n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: mala.run(ulj, {}, s, k, 2500, n_adapt=1200)
        )(state, jax.random.PRNGKey(2))
        p = np.asarray(
            to_c({"p": out["samples"]["p"][1200:]})["p"]
        ).ravel()
        assert p.min() > 0 and p.max() < 1
        assert abs(p.mean() - mean_q) < 0.02, (p.mean(), mean_q)
        assert abs(p.std() - std_q) < 0.02

    def test_mixed_constrained_and_free_latents(self):
        # Free w plus positive sigma in one model; both recovered.
        def log_joint(obs):
            w, sigma = obs["w"], obs["sigma"]
            lp = -0.5 * w**2
            lp += zs.distributions.Exponential(jnp.float64(1.0)).log_prob(
                sigma)
            lp += -0.5 * ((1.5 - w) / sigma) ** 2 - jnp.log(sigma)
            return lp

        ulj, to_u, to_c = transform_log_joint(log_joint,
                                              {"sigma": Exp()})
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=8, adapt_step_size=True)
        init = to_u({"w": jnp.zeros(128, jnp.float64),
                     "sigma": jnp.ones(128, jnp.float64)})
        state = hmc.init(init, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, 2000, n_adapt=1000)
        )(state, jax.random.PRNGKey(3))
        cons = to_c({k: v[1000:] for k, v in out["samples"].items()})
        assert np.asarray(cons["sigma"]).min() > 0
        assert 0.2 < float(np.mean(np.asarray(cons["w"]))) < 1.5
        assert np.all(np.isfinite(np.asarray(cons["sigma"])))

    def test_meta_bn_accepted(self):
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.exponential("s", jnp.float64(2.0), n_samples=None)
            return bn

        ulj, to_u, to_c = transform_log_joint(model(), {"s": Exp()})
        y = to_u({"s": jnp.asarray([0.5, 1.0])})["s"]
        lp = ulj({"s": y})
        assert np.all(np.isfinite(np.asarray(lp)))


class TestVectorBijectors:
    def test_stick_breaking_roundtrip_and_log_det(self):
        from zhusuan_tpu.bijectors import StickBreaking

        sb = StickBreaking()
        y = jnp.asarray(np.random.RandomState(0).randn(4))
        x = sb.forward(y)
        assert abs(float(x.sum()) - 1.0) < 1e-12 and float(x.min()) > 0
        np.testing.assert_allclose(np.asarray(sb.inverse(x)),
                                   np.asarray(y), atol=1e-12)
        # y = 0 is the uniform simplex (Stan's offset convention).
        np.testing.assert_allclose(
            np.asarray(sb.forward(jnp.zeros(4))), np.full(5, 0.2),
            atol=1e-14,
        )
        # Log-det vs the autodiff Jacobian of the first K-1 coordinates
        # (the last is determined by the simplex constraint).
        jac = jax.jacobian(lambda t: sb.forward(t)[:4])(y)
        want = float(np.linalg.slogdet(np.asarray(jac))[1])
        np.testing.assert_allclose(float(sb.forward_log_det(y)), want,
                                   rtol=1e-10)
        assert sb.unconstrained_shape((7, 5)) == (7, 4)

    def test_ordered_roundtrip_and_log_det(self):
        from zhusuan_tpu.bijectors import Ordered

        od = Ordered()
        y = jnp.asarray(np.random.RandomState(1).randn(5))
        x = od.forward(y)
        assert (np.diff(np.asarray(x)) > 0).all()
        np.testing.assert_allclose(np.asarray(od.inverse(x)),
                                   np.asarray(y), atol=1e-12)
        jac = jax.jacobian(od.forward)(y)
        want = float(np.linalg.slogdet(np.asarray(jac))[1])
        np.testing.assert_allclose(float(od.forward_log_det(y)), want,
                                   rtol=1e-10)

    def test_correlation_cholesky_roundtrip_and_log_det(self):
        from zhusuan_tpu.bijectors import CorrelationCholesky

        cc = CorrelationCholesky()
        y = jnp.asarray(np.random.RandomState(2).randn(6))  # K = 4
        L = np.asarray(cc.forward(y))
        corr = L @ L.T
        np.testing.assert_allclose(np.diag(corr), 1.0, atol=1e-12)
        assert np.linalg.eigvalsh(corr).min() > 0
        np.testing.assert_allclose(np.asarray(cc.inverse(jnp.asarray(L))),
                                   np.asarray(y), atol=1e-10)
        rows, cols = np.tril_indices(4, -1)
        jac = jax.jacobian(lambda t: cc.forward(t)[rows, cols])(y)
        want = float(np.linalg.slogdet(np.asarray(jac))[1])
        np.testing.assert_allclose(float(cc.forward_log_det(y)), want,
                                   rtol=1e-9)
        assert cc.unconstrained_shape((4, 4)) == (6,)
        with pytest.raises(ValueError, match="K\\(K-1\\)/2"):
            cc.forward(jnp.zeros(5))

    def test_dirichlet_multinomial_posterior_by_hmc(self):
        """Conjugate check: Dirichlet(2,3,4) prior + counts (5,1,2) ->
        Dirichlet(7,4,6) posterior; HMC over stick-breaking coordinates
        must reproduce its exact mean and variance."""
        from zhusuan_tpu.bijectors import StickBreaking

        alpha = np.asarray([2.0, 3.0, 4.0])
        counts = jnp.asarray([5.0, 1.0, 2.0])

        def log_joint(obs):
            p = obs["p"]
            return jnp.sum(
                (jnp.asarray(alpha) - 1.0) * jnp.log(p) +
                counts * jnp.log(p), axis=-1,
            )

        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"p": StickBreaking()}
        )
        hmc = zs.HMC(step_size=0.2, n_leapfrogs=6, adapt_step_size=True)
        p0 = jnp.full((256, 3), 1.0 / 3.0)
        state = hmc.init(to_u({"p": p0}), n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, n_iters=1500, n_adapt=600)
        )(state, jax.random.PRNGKey(0))
        draws = np.asarray(
            to_c({"p": out["samples"]["p"]})["p"][600:]
        ).reshape(-1, 3)
        post = alpha + np.asarray(counts)
        a0 = post.sum()
        want_mean = post / a0
        want_var = post * (a0 - post) / (a0**2 * (a0 + 1.0))
        np.testing.assert_allclose(draws.mean(0), want_mean, atol=0.01)
        np.testing.assert_allclose(draws.var(0), want_var, rtol=0.1)

    def test_lkj_prior_by_hmc(self):
        """K=2 LKJ(eta): the off-diagonal correlation r has
        (r+1)/2 ~ Beta(eta, eta), so Var(r) = 1/(2 eta + 1)."""
        from zhusuan_tpu.bijectors import CorrelationCholesky
        from zhusuan_tpu.distributions import LKJCholesky

        eta = 2.0
        dist = LKJCholesky(2, eta)

        def log_joint(obs):
            return dist.log_prob(obs["L"])

        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"L": CorrelationCholesky()}
        )
        hmc = zs.HMC(step_size=0.5, n_leapfrogs=5, adapt_step_size=True)
        L0 = jnp.tile(jnp.eye(2), (512, 1, 1))
        state = hmc.init(to_u({"L": L0}), n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, n_iters=800, n_adapt=300)
        )(state, jax.random.PRNGKey(1))  # round-5 thin: measured |mean|
        # 0.002 and var-ratio err 0.002 vs bounds 0.02 / 0.08.
        L = np.asarray(to_c({"L": out["samples"]["L"]})["L"][300:])
        r = (L @ np.swapaxes(L, -1, -2))[..., 1, 0].ravel()
        assert abs(r.mean()) < 0.02, r.mean()
        want_var = 1.0 / (2.0 * eta + 1.0)
        assert abs(r.var() / want_var - 1.0) < 0.08, (r.var(), want_var)

    def test_ordered_prior_is_order_statistics(self):
        """p(x) ~ prod phi(x_k) on x_1 < x_2 < x_3 IS the law of sorted
        iid normals; slice sampling over Ordered coordinates must match
        the order-statistic means."""
        from zhusuan_tpu.bijectors import Ordered
        from zhusuan_tpu.mcmc import SliceSampler

        def log_joint(obs):
            return -0.5 * jnp.sum(obs["x"] ** 2, axis=-1)

        ulj, to_u, to_c = transform_log_joint(log_joint, {"x": Ordered()})
        slc = SliceSampler(width=1.5)
        x0 = jnp.tile(jnp.asarray([-1.0, 0.0, 1.0]), (256, 1))
        state = slc.init(to_u({"x": x0}), n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: slc.run(ulj, {}, s, k, n_iters=1200)
        )(state, jax.random.PRNGKey(2))
        x = np.asarray(to_c({"x": out["samples"]["x"]})["x"][400:])
        x = x.reshape(-1, 3)
        assert (np.diff(x, axis=-1) > 0).all()
        ref = np.sort(
            np.random.RandomState(3).randn(200000, 3), axis=-1
        )
        np.testing.assert_allclose(x.mean(0), ref.mean(0), atol=0.03)
        np.testing.assert_allclose(x.std(0), ref.std(0), atol=0.03)


class TestAutoguideStructuredSupports:
    def test_advi_dirichlet_latent(self):
        """ADVI with the auto-selected StickBreaking bijector recovers a
        Dirichlet-multinomial posterior's mean."""
        import zhusuan_tpu.variational as zsv

        counts = jnp.asarray([5, 1, 2], jnp.int32)

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            p = bn.stochastic(
                "p", zs.distributions.Dirichlet(jnp.asarray([2., 3., 4.]))
            )
            bn.stochastic(
                "x",
                zs.distributions.Multinomial(
                    jnp.log(p.tensor), n_experiments=8,
                    normalize_logits=True,
                ),
            )
            return bn

        res = zsv.advi(
            model(), {"x": counts}, key=jax.random.PRNGKey(0),
            n_iters=1500, n_samples=64, learning_rate=2e-2,
        )
        draws = res.guide.sample_posterior(
            res.params, jax.random.PRNGKey(1), 4000
        )["p"]
        post = np.asarray([7.0, 4.0, 6.0])
        want_mean = post / post.sum()
        got = np.asarray(draws).reshape(-1, 3).mean(0)
        np.testing.assert_allclose(got, want_mean, atol=0.02)
