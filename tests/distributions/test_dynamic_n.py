"""Dynamic-``n_experiments`` semantics parity tests.

Reference behaviors mirrored here:
- ``Binomial`` accepts a scalar-tensor ``n_experiments``
  (reference univariate.py:975-992): scoring works (including under jit
  with a traced n); sampling raises ([TPU] divergence, documented in
  PARITY.md — XLA shapes are static).
- ``Multinomial`` with ``n_experiments=None`` infers n from ``given`` at
  scoring time (reference multivariate.py:207-213,327-330).
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

    def test_sampling_with_tensor_n_raises(self):
        dist = d.Binomial(
            jnp.zeros(3), n_experiments=jnp.asarray(5, jnp.int32)
        )
        with pytest.raises(ValueError, match="static"):
            dist.sample(jax.random.PRNGKey(0))

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
