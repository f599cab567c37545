"""Beyond-reference univariate heads (distributions/extra.py):
scipy-verified densities, sampler statistics, reparameterization
gradients, support boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu.distributions import (
    Cauchy,
    Exponential,
    HalfCauchy,
    LogNormal,
    StudentT,
)

KEY = jax.random.PRNGKey(7)


class TestLogProbVsScipy:
    def _check(self, dist, sp, xs, rtol=1e-5):
        xs = jnp.asarray(xs, jnp.float64)
        got = np.asarray(dist.log_prob(xs))
        want = sp.logpdf(np.asarray(xs))
        np.testing.assert_allclose(got, want, rtol=rtol)

    def test_student_t(self):
        self._check(
            StudentT(jnp.float64(4.0), jnp.float64(1.5), jnp.float64(2.0)),
            stats.t(4.0, loc=1.5, scale=2.0),
            [-3.0, -0.5, 1.5, 4.0, 10.0],
        )

    def test_exponential(self):
        self._check(
            Exponential(jnp.float64(2.5)), stats.expon(scale=1 / 2.5),
            [0.01, 0.5, 1.0, 3.0],
        )

    def test_cauchy(self):
        self._check(
            Cauchy(jnp.float64(-1.0), jnp.float64(0.7)),
            stats.cauchy(loc=-1.0, scale=0.7),
            [-5.0, -1.0, 0.0, 2.0, 30.0],
        )

    def test_half_cauchy(self):
        self._check(
            HalfCauchy(jnp.float64(1.3)), stats.halfcauchy(scale=1.3),
            [0.05, 0.5, 1.3, 8.0],
        )

    def test_log_normal(self):
        self._check(
            LogNormal(jnp.float64(0.4), jnp.float64(0.8)),
            stats.lognorm(0.8, scale=np.exp(0.4)),
            [0.05, 0.5, 1.0, 2.0, 9.0],
        )

    def test_out_of_support_is_neg_inf(self):
        assert float(Exponential(jnp.float64(1.0)).log_prob(
            jnp.float64(-0.5))) == -np.inf
        assert float(HalfCauchy(jnp.float64(1.0)).log_prob(
            jnp.float64(-0.1))) == -np.inf
        assert float(LogNormal(jnp.float64(0.0), jnp.float64(1.0)).log_prob(
            jnp.float64(0.0))) == -np.inf


class TestSamplerStats:
    def test_student_t_ks(self):
        d = StudentT(jnp.float64(5.0), jnp.float64(1.0), jnp.float64(2.0))
        s = np.asarray(d.sample(KEY, n_samples=100_000))
        _, p = stats.kstest(s, stats.t(5.0, loc=1.0, scale=2.0).cdf)
        assert p > 0.01, p

    def test_exponential_ks(self):
        d = Exponential(jnp.float64(3.0))
        s = np.asarray(d.sample(KEY, n_samples=100_000))
        _, p = stats.kstest(s, stats.expon(scale=1 / 3.0).cdf)
        assert p > 0.01, p
        assert s.min() >= 0

    def test_cauchy_ks(self):
        d = Cauchy(jnp.float64(0.5), jnp.float64(1.2))
        s = np.asarray(d.sample(KEY, n_samples=100_000))
        _, p = stats.kstest(s, stats.cauchy(loc=0.5, scale=1.2).cdf)
        assert p > 0.01, p

    def test_half_cauchy_ks(self):
        d = HalfCauchy(jnp.float64(2.0))
        s = np.asarray(d.sample(KEY, n_samples=100_000))
        _, p = stats.kstest(s, stats.halfcauchy(scale=2.0).cdf)
        assert p > 0.01, p
        assert s.min() >= 0

    def test_log_normal_ks(self):
        d = LogNormal(jnp.float64(-0.2), jnp.float64(0.5))
        s = np.asarray(d.sample(KEY, n_samples=100_000))
        _, p = stats.kstest(s, stats.lognorm(0.5,
                                             scale=np.exp(-0.2)).cdf)
        assert p > 0.01, p
        assert s.min() > 0


class TestReparameterization:
    @pytest.mark.parametrize("make,params", [
        (lambda loc, scale: StudentT(jnp.float64(4.0), loc, scale),
         (jnp.float64(0.5), jnp.float64(1.5))),
        (lambda loc, scale: Cauchy(loc, scale),
         (jnp.float64(0.5), jnp.float64(1.5))),
        (lambda loc, scale: LogNormal(loc, scale),
         (jnp.float64(0.2), jnp.float64(0.6))),
    ])
    def test_loc_scale_gradients_flow(self, make, params):
        def mean_sample(loc, scale):
            return jnp.mean(make(loc, scale).sample(KEY, n_samples=64))

        g = jax.grad(mean_sample, argnums=(0, 1))(*params)
        assert all(np.isfinite(float(x)) and float(x) != 0.0 for x in g)

    def test_exponential_rate_gradient(self):
        def mean_sample(rate):
            return jnp.mean(
                Exponential(rate).sample(KEY, n_samples=4096)
            )

        g = float(jax.grad(mean_sample)(jnp.float64(2.0)))
        # d/d rate E[x] = -1/rate^2 = -0.25.
        assert abs(g + 0.25) < 0.02, g

    def test_stop_gradient_when_not_reparameterized(self):
        def mean_sample(scale):
            d = HalfCauchy(scale, is_reparameterized=False)
            return jnp.mean(d.sample(KEY, n_samples=32))

        assert float(jax.grad(mean_sample)(jnp.float64(1.0))) == 0.0


class TestBayesianNetSugar:
    def test_sugar_methods(self):
        import zhusuan_tpu as zs

        bn = zs.BayesianNet(key=jax.random.PRNGKey(0))
        bn.student_t("t", jnp.float64(4.0), jnp.float64(0.0),
                     jnp.float64(1.0), n_samples=3)
        bn.exponential("e", jnp.float64(1.0), n_samples=3)
        bn.cauchy("c", jnp.float64(0.0), jnp.float64(1.0), n_samples=3)
        bn.half_cauchy("h", jnp.float64(1.0), n_samples=3)
        bn.log_normal("l", jnp.float64(0.0), jnp.float64(1.0), n_samples=3)
        for name in ["t", "e", "c", "h", "l"]:
            assert bn[name].tensor.shape == (3,)
            assert np.all(np.isfinite(np.asarray(bn[name].cond_log_p)))

    def test_half_cauchy_prior_in_model(self):
        # The canonical use: HalfCauchy scale prior on a Normal's std,
        # sampled with HMC over log-sigma... keep it VI-simple here: the
        # log-joint evaluates finitely under positive sigma.
        import zhusuan_tpu as zs

        def log_joint(obs):
            sigma = obs["sigma"]
            lp_prior = HalfCauchy(jnp.float64(1.0)).log_prob(sigma)
            x = jnp.float64(0.7)
            lp_lik = (
                -0.5 * (x / sigma) ** 2 - jnp.log(sigma)
                - 0.5 * jnp.log(2 * jnp.pi)
            )
            return lp_prior + lp_lik

        val = log_joint({"sigma": jnp.float64(0.9)})
        assert np.isfinite(float(val))


class TestDtypeContract:
    def test_student_t_mixed_dtypes_rejected(self):
        with pytest.raises(TypeError, match="same dtype"):
            StudentT(jnp.asarray(4.0, jnp.float32),
                     jnp.float64(0.0), jnp.float64(1.0))

    def test_student_t_weak_scalars_share_df_dtype(self):
        d = StudentT(jnp.float64(4.0), 0.0, 1.0)
        x = d.sample(KEY, n_samples=3)
        assert x.dtype == jnp.float64
        assert d.log_prob(x).dtype == jnp.float64


class TestNegativeBinomial:
    from zhusuan_tpu.distributions import NegativeBinomial as _NB

    def test_log_prob_matches_scipy(self):
        from zhusuan_tpu.distributions import NegativeBinomial
        r, p = 3.5, 0.6  # p = success prob = sigmoid(logits)
        d = NegativeBinomial(
            jnp.float64(np.log(p / (1 - p))), jnp.float64(r)
        )
        x = np.arange(0, 25)
        # scipy nbinom(n, q): pmf(k) = C(k+n-1, k) q^n (1-q)^k -> q = 1-p
        np.testing.assert_allclose(
            np.asarray(d.log_prob(x)),
            stats.nbinom.logpmf(x, r, 1 - p), rtol=1e-10,
        )

    def test_sampler_moments(self):
        from zhusuan_tpu.distributions import NegativeBinomial
        r, p = 5.0, 0.4
        d = NegativeBinomial(
            jnp.float64(np.log(p / (1 - p))), jnp.float64(r)
        )
        s = np.asarray(d.sample(KEY, 200_000))
        mean = r * p / (1 - p)
        var = r * p / (1 - p) ** 2
        assert abs(s.mean() - mean) < 0.05
        assert abs(s.var() / var - 1.0) < 0.05

    def test_poisson_limit(self):
        """r -> inf with mean fixed approaches Poisson."""
        from zhusuan_tpu.distributions import NegativeBinomial
        mean = 4.0
        r = 1e5
        p = mean / (mean + r)
        d = NegativeBinomial(
            jnp.float64(np.log(p / (1 - p))), jnp.float64(r)
        )
        x = np.arange(0, 15)
        np.testing.assert_allclose(
            np.asarray(d.log_prob(x)), stats.poisson.logpmf(x, mean),
            atol=2e-3,
        )

    def test_batched_and_not_reparameterized(self):
        from zhusuan_tpu.distributions import NegativeBinomial
        d = NegativeBinomial(jnp.zeros((4, 3), jnp.float32), jnp.float32(2.0))
        assert d.batch_shape == (4, 3)
        assert not d.is_reparameterized
        assert d.sample(KEY, 5).shape == (5, 4, 3)
        assert d.sample(KEY, 5).dtype == jnp.int32


class TestTruncatedNormal:
    def _make(self, loc=1.0, scale=2.0, low=-1.0, high=4.0):
        from zhusuan_tpu.distributions import TruncatedNormal
        return TruncatedNormal(
            jnp.float64(loc), jnp.float64(scale), jnp.float64(low),
            jnp.float64(high),
        ), stats.truncnorm(
            (low - loc) / scale, (high - loc) / scale, loc=loc, scale=scale
        )

    def test_log_prob_matches_scipy(self):
        d, sp = self._make()
        xs = np.linspace(-0.99, 3.99, 21)
        np.testing.assert_allclose(
            np.asarray(d.log_prob(xs)), sp.logpdf(xs), rtol=1e-10
        )

    def test_right_tail_stable(self):
        """Interval far in the right tail: log_ndtr reflection keeps the
        normalizer finite where naive Phi(b) - Phi(a) underflows."""
        d, sp = self._make(loc=0.0, scale=1.0, low=8.0, high=9.0)
        xs = np.asarray([8.1, 8.5])
        np.testing.assert_allclose(
            np.asarray(d.log_prob(xs)), sp.logpdf(xs), rtol=1e-8
        )

    def test_outside_support_neg_inf(self):
        d, _ = self._make()
        lp = np.asarray(d.log_prob(np.asarray([-1.5, 4.5])))
        assert np.all(np.isneginf(lp))

    def test_sampler_ks(self):
        d, sp = self._make()
        s = np.asarray(d.sample(KEY, 100_000))
        assert s.min() >= -1.0 and s.max() <= 4.0
        _, pval = stats.kstest(s[:5000], sp.cdf)
        assert pval > 1e-3

    def test_reparameterized_gradients_match_finite_diff(self):
        """Pathwise gradient of E[x] wrt loc/scale/bounds vs central
        finite differences of the analytic truncated-normal mean."""
        from zhusuan_tpu.distributions import TruncatedNormal

        def mean_est(params, key):
            d = TruncatedNormal(params[0], params[1], params[2], params[3])
            return jnp.mean(d.sample(key, 4096))

        params = jnp.asarray([1.0, 2.0, -1.0, 4.0], jnp.float64)
        key = jax.random.PRNGKey(11)
        g = np.asarray(jax.grad(mean_est)(params, key))

        def true_mean(v):
            loc, scale, low, high = v
            return stats.truncnorm.mean(
                (low - loc) / scale, (high - loc) / scale,
                loc=loc, scale=scale,
            )

        eps = 1e-5
        for i in range(4):
            vp = np.asarray(params).copy(); vp[i] += eps
            vm = np.asarray(params).copy(); vm[i] -= eps
            fd = (true_mean(vp) - true_mean(vm)) / (2 * eps)
            assert abs(g[i] - fd) < 0.05, (i, g[i], fd)

    def test_sugar_methods(self):
        import zhusuan_tpu as zs
        bn = zs.BayesianNet(key=KEY)
        t = bn.truncated_normal(
            "t", jnp.float32(0.0), jnp.float32(1.0), jnp.float32(-1.0),
            jnp.float32(1.0), n_samples=16,
        )
        assert t.tensor.shape == (16,)
        assert float(jnp.max(jnp.abs(t.tensor))) <= 1.0
        nb = bn.negative_binomial(
            "nb", jnp.float32(0.0), jnp.float32(3.0), n_samples=16
        )
        assert nb.tensor.shape == (16,)
        assert np.asarray(bn.cond_log_prob("nb")).shape == (16,)
