"""Weibull + RightCensored survival stack (beyond-reference; extra.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu.distributions as d


class TestWeibull:
    def test_log_prob_matches_scipy(self):
        k, lam = 1.7, 2.3
        dist = d.Weibull(jnp.asarray(k, jnp.float64),
                         jnp.asarray(lam, jnp.float64))
        xs = np.asarray([0.1, 0.5, 1.0, 2.0, 5.0, 10.0])
        got = np.asarray(dist.log_prob(jnp.asarray(xs)))
        want = stats.weibull_min.logpdf(xs, k, scale=lam)
        np.testing.assert_allclose(got, want, rtol=1e-10)
        assert float(dist.log_prob(jnp.asarray(-1.0))) == -np.inf

    def test_log_survival_matches_scipy(self):
        k, lam = 0.8, 1.4
        dist = d.Weibull(jnp.asarray(k, jnp.float64),
                         jnp.asarray(lam, jnp.float64))
        xs = np.asarray([0.2, 1.0, 3.0, 8.0])
        got = np.asarray(dist.log_survival(jnp.asarray(xs)))
        want = stats.weibull_min.logsf(xs, k, scale=lam)
        np.testing.assert_allclose(got, want, rtol=1e-10)
        # S(x) = 1 for x <= 0.
        assert float(dist.log_survival(jnp.asarray(-2.0))) == 0.0

    def test_sampling_moments(self):
        from scipy.special import gamma as gamma_fn

        k, lam = 2.0, 3.0
        dist = d.Weibull(jnp.asarray(k, jnp.float64),
                         jnp.asarray(lam, jnp.float64))
        x = np.asarray(dist.sample(jax.random.PRNGKey(0), 100000))
        mean = lam * gamma_fn(1 + 1 / k)
        var = lam**2 * (gamma_fn(1 + 2 / k) - gamma_fn(1 + 1 / k) ** 2)
        assert abs(x.mean() - mean) < 5 * np.sqrt(var / x.size)
        assert abs(x.var() / var - 1.0) < 0.03

    def test_reparameterized_gradient(self):
        # d E[x] / d lam = Gamma(1 + 1/k) exactly.
        from scipy.special import gamma as gamma_fn

        k = 1.5

        def mean_draw(lam):
            dist = d.Weibull(jnp.asarray(k, jnp.float64), lam)
            return jnp.mean(dist.sample(jax.random.PRNGKey(1), 200000))

        g = float(jax.grad(mean_draw)(jnp.asarray(2.0, jnp.float64)))
        np.testing.assert_allclose(g, gamma_fn(1 + 1 / k), rtol=0.02)


class TestOtherSurvivalFunctions:
    @pytest.mark.parametrize("make,ref", [
        (lambda: d.Exponential(jnp.asarray(1.3, jnp.float64)),
         lambda xs: stats.expon.logsf(xs, scale=1 / 1.3)),
        (lambda: d.Normal(jnp.asarray(0.5, jnp.float64),
                          std=jnp.asarray(2.0, jnp.float64)),
         lambda xs: stats.norm.logsf(xs, 0.5, 2.0)),
        (lambda: d.LogNormal(jnp.asarray(0.2, jnp.float64),
                             jnp.asarray(0.7, jnp.float64)),
         lambda xs: stats.lognorm.logsf(xs, 0.7, scale=np.exp(0.2))),
    ])
    def test_log_survival_matches_scipy(self, make, ref):
        dist = make()
        xs = np.asarray([0.1, 0.8, 2.0, 6.0])
        np.testing.assert_allclose(
            np.asarray(dist.log_survival(jnp.asarray(xs))), ref(xs),
            rtol=1e-9,
        )

    def test_deep_tail_stability(self):
        dist = d.Normal(jnp.asarray(0.0, jnp.float64),
                        std=jnp.asarray(1.0, jnp.float64))
        ls = float(dist.log_survival(jnp.asarray(10.0)))
        np.testing.assert_allclose(ls, stats.norm.logsf(10.0), rtol=1e-9)

    def test_unimplemented_raises(self):
        with pytest.raises(NotImplementedError, match="log_survival"):
            d.Cauchy(jnp.asarray(0.0), jnp.asarray(1.0)).log_survival(
                jnp.asarray(1.0)
            )


class TestRightCensored:
    def test_log_prob_event_and_censored(self):
        k, lam, c = 1.5, 2.0, 1.8
        base = d.Weibull(jnp.asarray(k, jnp.float64),
                         jnp.asarray(lam, jnp.float64))
        dist = d.RightCensored(base, jnp.asarray(c, jnp.float64))
        # Event (y < c): the base density.
        np.testing.assert_allclose(
            float(dist.log_prob(jnp.asarray(1.0))),
            stats.weibull_min.logpdf(1.0, k, scale=lam), rtol=1e-10,
        )
        # Censored (y = c): the survival mass.
        np.testing.assert_allclose(
            float(dist.log_prob(jnp.asarray(c))),
            stats.weibull_min.logsf(c, k, scale=lam), rtol=1e-10,
        )

    def test_sampling_is_min(self):
        base = d.Exponential(jnp.asarray(1.0, jnp.float64))
        c = 0.7
        dist = d.RightCensored(base, jnp.asarray(c, jnp.float64))
        x = np.asarray(dist.sample(jax.random.PRNGKey(2), 50000))
        assert x.max() <= c
        # Censored fraction = S(c) = e^{-c}.
        frac = (x == c).mean()
        p = np.exp(-c)
        assert abs(frac - p) < 4 * np.sqrt(p * (1 - p) / x.size)
        # Uncensored part has the truncated-exponential mean.
        ev = x[x < c]
        want = 1.0 - c * np.exp(-c) / (1 - np.exp(-c))
        assert abs(ev.mean() - want) < 0.01

    def test_per_observation_censor_times(self):
        base = d.Exponential(jnp.asarray(2.0, jnp.float64))
        cs = jnp.asarray([0.5, 1.0, 2.0], jnp.float64)
        dist = d.RightCensored(base, cs)
        assert dist.batch_shape == (3,)
        lp = np.asarray(dist.log_prob(jnp.asarray([0.2, 1.0, 1.5])))
        np.testing.assert_allclose(
            lp,
            [stats.expon.logpdf(0.2, scale=0.5),
             stats.expon.logsf(1.0, scale=0.5),
             stats.expon.logpdf(1.5, scale=0.5)],
            rtol=1e-10,
        )

    def test_censored_mle_recovers_parameters(self):
        """The acid test: fit a Weibull to ~35%-censored data by MLE on
        the wrapper's log_prob; ignoring censoring would bias the scale
        DOWN by far more than the tolerance."""
        import optax

        k_true, lam_true = 1.4, 2.0
        key = jax.random.PRNGKey(3)
        t = np.asarray(
            d.Weibull(jnp.asarray(k_true, jnp.float64),
                      jnp.asarray(lam_true, jnp.float64))
            .sample(key, 4000)
        )
        c = 2.2  # censors ~1/3 of draws
        y = jnp.asarray(np.minimum(t, c))

        def nll(params):
            base = d.Weibull(jnp.exp(params["log_k"]),
                             jnp.exp(params["log_lam"]))
            dist = d.RightCensored(base, jnp.asarray(c, jnp.float64))
            return -jnp.mean(dist.log_prob(y))

        params = {"log_k": jnp.asarray(0.0, jnp.float64),
                  "log_lam": jnp.asarray(0.0, jnp.float64)}
        opt = optax.adam(5e-2)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            g = jax.grad(nll)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s

        for _ in range(600):
            params, state = step(params, state)
        k_hat = float(jnp.exp(params["log_k"]))
        lam_hat = float(jnp.exp(params["log_lam"]))
        assert abs(k_hat - k_true) < 0.1, k_hat
        assert abs(lam_hat - lam_true) < 0.1, lam_hat

    def test_validation(self):
        with pytest.raises(TypeError, match="Distribution"):
            d.RightCensored(object(), 1.0)
        with pytest.raises(ValueError, match="group_ndims"):
            d.RightCensored(
                d.Exponential(jnp.ones(3), group_ndims=1), 1.0
            )


class TestWrapperSampleIndependence:
    def test_right_censored_extended_batch_draws_independent(self):
        # Scalar base + vector censor times: every column must be an
        # INDEPENDENT base draw (regression: a broadcast copy made all
        # uncensored entries identical across the batch).
        base = d.Exponential(jnp.asarray(1.0, jnp.float64))
        cs = jnp.full(50, 100.0, jnp.float64)  # effectively uncensored
        dist = d.RightCensored(base, cs)
        x = np.asarray(dist.sample(jax.random.PRNGKey(0), 200))
        assert x.shape == (200, 50)
        # Columns must differ (a broadcast bug gives zero variance).
        assert np.std(x, axis=1).min() > 0.1
        corr = np.corrcoef(x[:, 0], x[:, 1])[0, 1]
        assert abs(corr) < 0.2, corr

    def test_zero_inflated_extended_batch_draws_independent(self):
        base = d.Poisson(jnp.asarray(6.0, jnp.float64))
        pi = jnp.full(50, -10.0, jnp.float64)  # pi ~ 0: pure base
        dist = d.ZeroInflated(base, pi)
        x = np.asarray(dist.sample(jax.random.PRNGKey(1), 200))
        assert np.std(x, axis=1).min() > 0.5
        corr = np.corrcoef(x[:, 0], x[:, 1])[0, 1]
        assert abs(corr) < 0.2, corr

    def test_size_one_axis_widening_rejected(self):
        base = d.Exponential(jnp.ones((1, 3), jnp.float64))
        with pytest.raises(ValueError, match="size-1 batch axis"):
            d.RightCensored(base, jnp.ones((5, 3), jnp.float64))
