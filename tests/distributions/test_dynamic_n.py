"""Dynamic-``n_experiments`` semantics parity tests.

Reference behaviors mirrored here:
- ``Binomial`` accepts a scalar-tensor ``n_experiments``
  (reference univariate.py:975-992): scoring AND sampling work,
  including under jit with a traced n — the trial count only affects
  sample values, never shapes, so the stateless inversion/BTRS rejection
  sampler jits cleanly.
- ``Multinomial`` with ``n_experiments=None`` infers n from ``given`` at
  scoring time (reference multivariate.py:207-213,327-330); a 0-D
  integer ``n_experiments`` samples via conditional-binomial splits
  (beyond reference, which only took a Python int there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu import distributions as d


class TestBinomialTensorN:
    def test_scoring_matches_scipy_per_n(self):
        logits = jnp.asarray(0.3, jnp.float64)
        p = 1.0 / (1.0 + np.exp(-0.3))
        for n in [1, 4, 10]:
            dist = d.Binomial(logits, n_experiments=jnp.asarray(n, jnp.int32))
            xs = np.arange(n + 1, dtype=np.float64)
            got = np.asarray(dist.log_prob(jnp.asarray(xs)))
            want = stats.binom.logpmf(xs, n, p)
            np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_scoring_with_traced_n_under_jit(self):
        logits = jnp.asarray(0.0, jnp.float64)

        @jax.jit
        def score(n, x):
            return d.Binomial(logits, n_experiments=n).log_prob(x)

        got = float(score(jnp.asarray(6, jnp.int32), jnp.asarray(3.0)))
        want = stats.binom.logpmf(3, 6, 0.5)
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_sampling_with_tensor_n_matches_scipy(self):
        """Traced-n sampling: chi-square GOF against the exact pmf."""
        logits = jnp.asarray(0.4, jnp.float64)
        p = 1.0 / (1.0 + np.exp(-0.4))
        n = 8

        @jax.jit
        def draw(key, n):
            dist = d.Binomial(logits, n_experiments=n)
            return dist.sample(key, n_samples=20000)

        x = np.asarray(draw(jax.random.PRNGKey(7), jnp.asarray(n, jnp.int32)))
        assert x.shape == (20000,)
        assert x.min() >= 0 and x.max() <= n
        counts = np.bincount(x.astype(np.int64), minlength=n + 1)
        expected = stats.binom.pmf(np.arange(n + 1), n, p) * x.size
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        # dof = 8; P(chi2_8 > 26.1) ~ 1e-3
        assert chi2 < 26.1, chi2

    def test_sampling_values_follow_traced_n(self):
        """Same compiled program, different n values at runtime."""
        logits = jnp.asarray(3.0, jnp.float64)  # p ~ 0.953

        @jax.jit
        def draw(key, n):
            return d.Binomial(logits, n_experiments=n).sample(key, 1000)

        lo = np.asarray(draw(jax.random.PRNGKey(0), jnp.asarray(3, jnp.int32)))
        hi = np.asarray(
            draw(jax.random.PRNGKey(0), jnp.asarray(300, jnp.int32))
        )
        assert lo.max() <= 3
        assert 250 < hi.mean() < 300

    def test_large_static_n_moments(self):
        """Static n above the direct-sampler threshold exercises the
        rejection path: moments match n*p, n*p*(1-p)."""
        n, p = 4000, 0.37
        logits = float(np.log(p / (1 - p)))
        dist = d.Binomial(jnp.asarray(logits, jnp.float64), n_experiments=n)
        x = np.asarray(dist.sample(jax.random.PRNGKey(3), 20000))
        mean, var = x.mean(), x.var()
        se_mean = np.sqrt(n * p * (1 - p) / x.size)
        assert abs(mean - n * p) < 6 * se_mean
        assert abs(var / (n * p * (1 - p)) - 1.0) < 0.05

    def test_tensor_n_validation(self):
        with pytest.raises(ValueError, match="scalar"):
            d.Binomial(jnp.zeros(3), n_experiments=jnp.asarray([1, 2]))
        with pytest.raises(ValueError, match="int"):
            d.Binomial(jnp.zeros(3), n_experiments=jnp.asarray(2.0))


class TestMultinomialNFromGiven:
    def test_scoring_infers_per_row_n(self):
        """n_experiments=None: each given row's total is its own n
        (reference multivariate.py:327-330 computes n = reduce_sum(given))."""
        logits = jnp.asarray(np.log([0.2, 0.3, 0.5]), jnp.float64)
        dist = d.Multinomial(logits, n_experiments=None)
        rows = np.asarray(
            [[1.0, 0.0, 0.0], [2.0, 1.0, 1.0], [0.0, 5.0, 5.0]]
        )
        got = np.asarray(dist.log_prob(jnp.asarray(rows)))
        want = np.asarray(
            [
                stats.multinomial.logpmf(r, int(r.sum()), [0.2, 0.3, 0.5])
                for r in rows
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_matches_fixed_n_when_totals_agree(self):
        logits = jnp.asarray(np.log([0.25, 0.75]), jnp.float64)
        fixed = d.Multinomial(logits, n_experiments=4)
        inferred = d.Multinomial(logits, n_experiments=None)
        x = jnp.asarray([[4.0, 0.0], [2.0, 2.0], [0.0, 4.0]])
        np.testing.assert_allclose(
            np.asarray(inferred.log_prob(x)),
            np.asarray(fixed.log_prob(x)),
            rtol=1e-10,
        )

    def test_sampling_with_tensor_n(self):
        """0-D integer n_experiments samples via conditional-binomial
        splits; per-category means match n * softmax(logits)."""
        probs = np.asarray([0.2, 0.3, 0.5])
        logits = jnp.asarray(np.log(probs), jnp.float64)

        @jax.jit
        def draw(key, n):
            dist = d.Multinomial(logits, n_experiments=n)
            return dist.sample(key, n_samples=20000)

        n = 40
        x = np.asarray(draw(jax.random.PRNGKey(5), jnp.asarray(n, jnp.int32)))
        assert x.shape == (20000, 3)
        np.testing.assert_array_equal(x.sum(-1), n)
        se = np.sqrt(n * probs * (1 - probs) / x.shape[0])
        np.testing.assert_allclose(x.mean(0), n * probs, atol=6 * se.max())

    def test_large_static_n_sampling(self):
        """Large static n goes through the O(K) conditional-binomial path."""
        probs = np.asarray([0.6, 0.4])
        dist = d.Multinomial(
            jnp.asarray(np.log(probs), jnp.float64), n_experiments=10_000
        )
        x = np.asarray(dist.sample(jax.random.PRNGKey(11), 5000))
        np.testing.assert_array_equal(x.sum(-1), 10_000)
        se = np.sqrt(10_000 * 0.6 * 0.4 / 5000)
        assert abs(x[:, 0].mean() - 6000.0) < 6 * se

    def test_tensor_n_scoring(self):
        logits = jnp.asarray(np.log([0.2, 0.8]), jnp.float64)
        dist = d.Multinomial(
            logits, n_experiments=jnp.asarray(4, jnp.int32)
        )
        got = float(dist.log_prob(jnp.asarray([1.0, 3.0])))
        want = stats.multinomial.logpmf([1, 3], 4, [0.2, 0.8])
        np.testing.assert_allclose(got, float(want), rtol=1e-8)

    def test_tensor_n_validation(self):
        with pytest.raises(ValueError, match="scalar"):
            d.Multinomial(jnp.zeros(3), n_experiments=jnp.asarray([1, 2]))
        with pytest.raises(ValueError, match="int"):
            d.Multinomial(jnp.zeros(3), n_experiments=jnp.asarray(2.0))

    def test_unnormalized_logits_mode(self):
        """normalize_logits=False scores raw logits as log-probs
        (reference multivariate.py:324-326)."""
        log_p = np.log([0.2, 0.8])
        dist = d.Multinomial(
            jnp.asarray(log_p, jnp.float64),
            n_experiments=None,
            normalize_logits=False,
        )
        x = jnp.asarray([1.0, 3.0])
        want = stats.multinomial.logpmf([1, 3], 4, [0.2, 0.8])
        np.testing.assert_allclose(
            float(dist.log_prob(x)), float(want), rtol=1e-8
        )
