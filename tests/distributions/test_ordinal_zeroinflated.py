"""OrderedLogistic and ZeroInflated heads (beyond-reference; extra.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu.distributions as d


def _ordinal_pmf(eta, cuts):
    """Reference pmf by direct CDF differences (numpy, f64)."""
    cdf = 1.0 / (1.0 + np.exp(-(np.asarray(cuts) - eta)))
    cdf = np.concatenate([[0.0], cdf, [1.0]])
    return np.diff(cdf)


class TestOrderedLogistic:
    def test_log_prob_matches_cdf_differences(self):
        eta, cuts = 0.4, np.asarray([-1.0, 0.2, 1.3])
        dist = d.OrderedLogistic(
            jnp.asarray(eta, jnp.float64), jnp.asarray(cuts, jnp.float64)
        )
        want = _ordinal_pmf(eta, cuts)
        got = np.exp([
            float(dist.log_prob(jnp.asarray(k))) for k in range(4)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-10)
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-12)

    def test_batched_eta_and_cutpoints(self):
        etas = jnp.asarray(np.linspace(-2, 2, 5), jnp.float64)
        cuts = jnp.asarray([-0.5, 0.5], jnp.float64)
        dist = d.OrderedLogistic(etas, cuts)
        assert dist.batch_shape == (5,)
        lp = np.asarray(dist.log_prob(jnp.ones(5)))
        for i, e in enumerate(np.asarray(etas)):
            want = np.log(_ordinal_pmf(float(e), [-0.5, 0.5])[1])
            np.testing.assert_allclose(lp[i], want, rtol=1e-10)

    def test_sampling_gof(self):
        eta, cuts = -0.3, np.asarray([-1.0, 0.0, 0.8])
        dist = d.OrderedLogistic(
            jnp.asarray(eta, jnp.float64), jnp.asarray(cuts, jnp.float64)
        )
        x = np.asarray(dist.sample(jax.random.PRNGKey(0), 40000))
        counts = np.bincount(x.astype(np.int64), minlength=4)
        expected = _ordinal_pmf(eta, cuts) * x.size
        chi2 = ((counts - expected) ** 2 / expected).sum()
        assert chi2 < 16.3, chi2  # P(chi2_3 > 16.3) ~ 1e-3
        assert x.min() >= 0 and x.max() <= 3

    def test_unordered_cutpoints_give_nan(self):
        dist = d.OrderedLogistic(
            jnp.asarray(0.0, jnp.float64),
            jnp.asarray([1.0, -1.0], jnp.float64),
        )
        assert np.isnan(float(dist.log_prob(jnp.asarray(1))))

    def test_validation(self):
        with pytest.raises(ValueError, match="trailing"):
            d.OrderedLogistic(jnp.asarray(0.0), jnp.asarray(1.0))


class TestZeroInflated:
    def test_log_prob_matches_manual_pmf(self):
        lam, pi = 2.5, 0.3
        base = d.Poisson(jnp.asarray(lam, jnp.float64))
        dist = d.ZeroInflated(
            base, jnp.asarray(np.log(pi / (1 - pi)), jnp.float64)
        )
        ks = np.arange(30)
        got = np.exp([float(dist.log_prob(jnp.asarray(k))) for k in ks])
        want = (1 - pi) * stats.poisson.pmf(ks, lam)
        want[0] += pi
        np.testing.assert_allclose(got, want, rtol=1e-9)
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-8)

    def test_sampling_moments(self):
        lam, pi = 4.0, 0.25
        base = d.Poisson(jnp.asarray(lam, jnp.float64))
        dist = d.ZeroInflated(
            base, jnp.asarray(np.log(pi / (1 - pi)), jnp.float64)
        )
        x = np.asarray(dist.sample(jax.random.PRNGKey(1), 40000))
        mean = (1 - pi) * lam
        var = (1 - pi) * lam * (1 + pi * lam)
        assert abs(x.mean() - mean) < 4 * np.sqrt(var / x.size)
        assert abs(x.var() / var - 1.0) < 0.05
        # The excess-zero fraction is visible.
        p0 = pi + (1 - pi) * stats.poisson.pmf(0, lam)
        frac0 = (x == 0).mean()
        assert abs(frac0 - p0) < 4 * np.sqrt(p0 * (1 - p0) / x.size)

    def test_zinb(self):
        r, p_succ, pi = 3.0, 0.4, 0.4
        logits = float(np.log(p_succ / (1 - p_succ)))
        base = d.NegativeBinomial(
            jnp.asarray(logits, jnp.float64), jnp.asarray(r, jnp.float64)
        )
        dist = d.ZeroInflated(
            base, jnp.asarray(np.log(pi / (1 - pi)), jnp.float64)
        )
        ks = np.arange(40)
        got = np.exp([float(dist.log_prob(jnp.asarray(k))) for k in ks])
        want = (1 - pi) * stats.nbinom.pmf(ks, r, 1 - p_succ)
        want[0] += pi
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_gradients_flow_to_pi_and_base(self):
        def nll(params):
            base = d.Poisson(jnp.exp(params["log_rate"]))
            dist = d.ZeroInflated(base, params["pi_logits"])
            xs = jnp.asarray([0.0, 0.0, 3.0, 1.0, 0.0])
            return -jnp.sum(dist.log_prob(xs))

        g = jax.grad(nll)({
            "log_rate": jnp.asarray(1.0, jnp.float64),
            "pi_logits": jnp.asarray(0.0, jnp.float64),
        })
        assert np.isfinite(float(g["log_rate"]))
        assert np.isfinite(float(g["pi_logits"]))
        assert float(g["pi_logits"]) != 0.0

    def test_validation(self):
        with pytest.raises(ValueError, match="DISCRETE"):
            d.ZeroInflated(d.Normal(0.0, std=1.0), 0.0)
        with pytest.raises(ValueError, match="group_ndims"):
            d.ZeroInflated(d.Poisson(jnp.zeros(3), group_ndims=1), 0.0)
        with pytest.raises(TypeError, match="Distribution"):
            d.ZeroInflated(object(), 0.0)


class TestBayesianNetSugar:
    def test_bn_nodes(self):
        import zhusuan_tpu as zs

        bn = zs.BayesianNet(key=jax.random.PRNGKey(0))
        y = bn.ordered_logistic(
            "y", jnp.asarray(0.3, jnp.float64),
            jnp.asarray([-1.0, 1.0], jnp.float64), n_samples=64,
        )
        assert y.tensor.shape == (64,)
        assert int(np.asarray(y.tensor).max()) <= 2
        z = bn.zero_inflated(
            "z", d.Poisson(jnp.asarray(3.0, jnp.float64)),
            jnp.asarray(0.0, jnp.float64), n_samples=64,
        )
        assert z.tensor.shape == (64,)
        lp = bn.cond_log_prob("z")
        assert np.isfinite(np.asarray(lp)).all()


class TestBetaBinomial:
    def test_pmf_matches_scipy(self):
        a, b, n = 2.5, 4.0, 12
        dist = d.BetaBinomial(n, jnp.asarray(a, jnp.float64),
                              jnp.asarray(b, jnp.float64))
        ks = np.arange(n + 1)
        got = np.exp([float(dist.log_prob(jnp.asarray(k))) for k in ks])
        want = stats.betabinom.pmf(ks, n, a, b)
        np.testing.assert_allclose(got, want, rtol=1e-10)
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-12)

    def test_sampling_moments_and_overdispersion(self):
        a, b, n = 2.0, 3.0, 20
        dist = d.BetaBinomial(n, jnp.asarray(a, jnp.float64),
                              jnp.asarray(b, jnp.float64))
        x = np.asarray(dist.sample(jax.random.PRNGKey(0), 100000))
        mean = n * a / (a + b)
        var = n * a * b * (a + b + n) / ((a + b) ** 2 * (a + b + 1))
        assert abs(x.mean() - mean) < 5 * np.sqrt(var / x.size)
        assert abs(x.var() / var - 1.0) < 0.03
        # Strictly overdispersed vs the matched Binomial.
        p = a / (a + b)
        assert x.var() > 1.5 * n * p * (1 - p)

    def test_batched_params(self):
        alphas = jnp.asarray([1.0, 5.0], jnp.float64)
        dist = d.BetaBinomial(8, alphas, jnp.asarray(2.0, jnp.float64))
        assert dist.batch_shape == (2,)
        lp = np.asarray(dist.log_prob(jnp.asarray([3.0, 3.0])))
        for i, a in enumerate([1.0, 5.0]):
            np.testing.assert_allclose(
                lp[i], stats.betabinom.logpmf(3, 8, a, 2.0), rtol=1e-10
            )

    def test_validation(self):
        with pytest.raises(ValueError, match="positive int"):
            d.BetaBinomial(0, 1.0, 1.0)


class TestVonMises:
    def test_log_prob_matches_scipy(self):
        loc, kappa = 0.7, 2.5
        dist = d.VonMises(jnp.asarray(loc, jnp.float64),
                          jnp.asarray(kappa, jnp.float64))
        xs = np.linspace(-3.0, 3.0, 13)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(jnp.asarray(xs))),
            stats.vonmises.logpdf(xs, kappa, loc=loc), rtol=1e-12,
        )

    @pytest.mark.parametrize("kappa", [0.1, 2.5, 50.0])
    def test_sampling_ks_vs_scipy(self, kappa):
        from scipy.special import i0, i1

        dist = d.VonMises(jnp.asarray(0.0, jnp.float64),
                          jnp.asarray(kappa, jnp.float64))
        x = np.asarray(dist.sample(jax.random.PRNGKey(3), 50000))
        assert x.min() > -np.pi - 1e-9 and x.max() <= np.pi + 1e-9
        ks = stats.kstest(x, lambda t: stats.vonmises.cdf(t, kappa))
        assert ks.pvalue > 1e-4, (kappa, ks)
        # Resultant length matches I1/I0.
        r_hat = np.hypot(np.cos(x).mean(), np.sin(x).mean())
        np.testing.assert_allclose(
            r_hat, i1(kappa) / i0(kappa), atol=0.01
        )

    def test_loc_wrapping(self):
        # loc near the boundary: samples still land in (-pi, pi] with
        # the right circular mean.
        dist = d.VonMises(jnp.asarray(3.0, jnp.float64),
                          jnp.asarray(5.0, jnp.float64))
        x = np.asarray(dist.sample(jax.random.PRNGKey(4), 50000))
        assert x.min() > -np.pi - 1e-9 and x.max() <= np.pi + 1e-9
        circ_mean = np.arctan2(np.sin(x).mean(), np.cos(x).mean())
        assert abs(circ_mean - 3.0) < 0.02, circ_mean
