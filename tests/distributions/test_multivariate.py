"""Multivariate distribution tests.

Port of the contract in reference ``tests/distributions/test_multivariate.py``
(shape contracts + scipy.stats numerical agreement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as stats

from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(7)


def _f64(x):
    return jnp.asarray(x, jnp.float64)


class TestMultivariateNormalCholesky:
    def _random_spd(self, d, seed=0):
        rng = np.random.RandomState(seed)
        a = rng.randn(d, d)
        cov = a @ a.T + d * np.eye(d)
        return cov

    def test_init_errors(self):
        with pytest.raises(ValueError, match="at least 1-D"):
            zd.MultivariateNormalCholesky(_f64(0.0), _f64(np.eye(2)))
        with pytest.raises(ValueError, match=r"\[d, d\]"):
            zd.MultivariateNormalCholesky(_f64(np.zeros(3)), _f64(np.eye(2)))

    def test_shapes(self):
        d = 4
        dist = zd.MultivariateNormalCholesky(
            _f64(np.zeros((5, d))), _f64(np.tile(np.eye(d), (5, 1, 1)))
        )
        assert dist.batch_shape == (5,)
        assert dist.value_shape == (d,)
        assert dist.sample(KEY, 3).shape == (3, 5, d)
        assert dist.log_prob(jnp.zeros((3, 5, d))).shape == (3, 5)

    def test_log_prob_vs_scipy(self):
        d = 5
        cov = self._random_spd(d)
        L = np.linalg.cholesky(cov)
        mean = np.arange(d, dtype=np.float64)
        x = np.random.RandomState(1).randn(7, d) + mean
        dist = zd.MultivariateNormalCholesky(_f64(mean), _f64(L))
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(_f64(x))),
            stats.multivariate_normal.logpdf(x, mean, cov),
            rtol=1e-8,
        )

    def test_sample_moments(self):
        d = 3
        cov = self._random_spd(d, seed=3)
        L = np.linalg.cholesky(cov)
        mean = np.array([1.0, -2.0, 0.5])
        dist = zd.MultivariateNormalCholesky(_f64(mean), _f64(L))
        samples = np.asarray(dist.sample(KEY, 200_000))
        np.testing.assert_allclose(samples.mean(0), mean, atol=0.05)
        np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.1)

    def test_reparameterized(self):
        d = 2

        def f(mean):
            dist = zd.MultivariateNormalCholesky(mean, _f64(np.eye(d)))
            return jnp.sum(dist.sample(KEY, 4)) / 4

        g = jax.grad(f)(_f64(np.zeros(d)))
        np.testing.assert_allclose(np.asarray(g), np.ones(d), rtol=1e-6)


class TestMultinomial:
    def test_log_prob_vs_scipy(self):
        logits = _f64([0.3, -0.2, 1.1])
        p = np.asarray(jax.nn.softmax(logits))
        dist = zd.Multinomial(logits, n_experiments=10)
        x = jnp.asarray([2, 3, 5], jnp.int32)
        np.testing.assert_allclose(
            float(dist.log_prob(x)),
            stats.multinomial.logpmf([2, 3, 5], 10, p),
            rtol=1e-8,
        )

    def test_infer_n_from_given(self):
        logits = _f64([0.3, -0.2, 1.1])
        p = np.asarray(jax.nn.softmax(logits))
        dist = zd.Multinomial(logits, n_experiments=None)
        x = jnp.asarray([1, 0, 4], jnp.int32)
        np.testing.assert_allclose(
            float(dist.log_prob(x)),
            stats.multinomial.logpmf([1, 0, 4], 5, p),
            rtol=1e-8,
        )
        with pytest.raises(ValueError, match="n_experiments"):
            dist.sample(KEY, 2)

    def test_sample_counts(self):
        dist = zd.Multinomial(_f64([0.0, 1.0]), n_experiments=7)
        samples = dist.sample(KEY, 1000)
        assert samples.shape == (1000, 2)
        assert bool(jnp.all(jnp.sum(samples, -1) == 7))


class TestUnnormalizedMultinomial:
    def test_log_prob(self):
        logits = _f64([0.3, -0.2, 1.1])
        p = np.asarray(jax.nn.softmax(logits))
        dist = zd.UnnormalizedMultinomial(logits)
        x = jnp.asarray([2, 3, 5], jnp.int32)
        expected = np.sum(np.array([2, 3, 5]) * np.log(p))
        np.testing.assert_allclose(float(dist.log_prob(x)), expected, rtol=1e-8)

    def test_sample_raises(self):
        dist = zd.UnnormalizedMultinomial(_f64([0.0, 1.0]))
        with pytest.raises(NotImplementedError):
            dist.sample(KEY, 1)


class TestOnehotCategorical:
    def test_log_prob(self):
        logits = _f64([[0.5, -1.0, 2.0]])
        dist = zd.OnehotCategorical(logits)
        x = jax.nn.one_hot(jnp.asarray([2]), 3).astype(jnp.int32)
        logp = np.asarray(jax.nn.log_softmax(logits))[0, 2]
        np.testing.assert_allclose(np.asarray(dist.log_prob(x)), [logp], rtol=1e-8)

    def test_sample_onehot(self):
        dist = zd.OnehotCategorical(_f64([0.0, 1.0, -0.5]))
        samples = dist.sample(KEY, 500)
        assert samples.shape == (500, 3)
        assert bool(jnp.all(jnp.sum(samples, -1) == 1))


class TestDirichlet:
    def test_init(self):
        with pytest.raises(ValueError, match="at least 2"):
            zd.Dirichlet(_f64([1.0]))

    def test_log_prob_vs_scipy(self):
        alpha = np.array([0.5, 2.0, 1.5])
        x = np.array([0.2, 0.5, 0.3])
        dist = zd.Dirichlet(_f64(alpha))
        np.testing.assert_allclose(
            float(dist.log_prob(_f64(x))),
            stats.dirichlet.logpdf(x, alpha),
            rtol=1e-8,
        )

    def test_sample_simplex(self):
        dist = zd.Dirichlet(_f64([2.0, 3.0, 4.0]))
        samples = dist.sample(KEY, 50_000)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(samples, -1)), 1.0, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jnp.mean(samples, 0)),
            np.array([2, 3, 4]) / 9,
            atol=0.01,
        )


class TestConcreteFamily:
    def test_exp_concrete_matches_concrete(self):
        # exp(ExpConcrete sample) should be distributed as Concrete; and
        # densities should be related by the log-map Jacobian sum(y).
        temp, logits = _f64(0.8), _f64([0.2, -0.5, 1.0])
        exp_dist = zd.ExpConcrete(temp, logits)
        con_dist = zd.Concrete(temp, logits)
        y = np.log(np.array([0.3, 0.45, 0.25]))
        lp_exp = float(exp_dist.log_prob(_f64(y)))
        lp_con = float(con_dist.log_prob(_f64(np.exp(y))))
        np.testing.assert_allclose(lp_exp - np.sum(y), lp_con, rtol=1e-8)

    def test_concrete_sample_simplex(self):
        dist = zd.Concrete(_f64(0.5), _f64([0.0, 1.0, 2.0]))
        samples = dist.sample(KEY, 10_000)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(samples, -1)), 1.0, rtol=1e-5
        )

    def test_concrete_low_temp_limit(self):
        dist = zd.Concrete(_f64(0.01), _f64([0.0, 1.0]))
        samples = dist.sample(KEY, 100_000)
        frac = float(jnp.mean((samples[:, 1] > 0.5).astype(jnp.float64)))
        np.testing.assert_allclose(
            frac, float(jax.nn.softmax(_f64([0.0, 1.0]))[1]), atol=0.01
        )

    def test_exp_concrete_sample_domain(self):
        dist = zd.ExpConcrete(_f64(0.7), _f64([0.0, 1.0, -1.0]))
        samples = dist.sample(KEY, 1000)
        assert bool(jnp.all(samples <= 0))
        np.testing.assert_allclose(
            np.asarray(jax.scipy.special.logsumexp(samples, -1)), 0.0,
            atol=1e-5,
        )


class TestMatrixVariateNormalCholesky:
    def test_log_prob_vs_kron_mvn(self):
        # MatrixNormal(M, U, V) == MVN(vec(M), V kron U) on vec(X) with
        # column-major (Fortran) vectorization.
        n, m = 3, 2
        rng = np.random.RandomState(0)
        a = rng.randn(n, n)
        u = a @ a.T + n * np.eye(n)
        b = rng.randn(m, m)
        v = b @ b.T + m * np.eye(m)
        mean = rng.randn(n, m)
        x = rng.randn(n, m)
        dist = zd.MatrixVariateNormalCholesky(
            _f64(mean), _f64(np.linalg.cholesky(u)), _f64(np.linalg.cholesky(v))
        )
        expected = stats.multivariate_normal.logpdf(
            x.flatten(order="F"), mean.flatten(order="F"), np.kron(v, u)
        )
        np.testing.assert_allclose(
            float(dist.log_prob(_f64(x))), expected, rtol=1e-8
        )

    def test_sample_moments(self):
        n, m = 2, 2
        u = np.array([[2.0, 0.5], [0.5, 1.0]])
        v = np.array([[1.5, -0.3], [-0.3, 0.8]])
        mean = np.zeros((n, m))
        dist = zd.MatrixVariateNormalCholesky(
            _f64(mean), _f64(np.linalg.cholesky(u)), _f64(np.linalg.cholesky(v))
        )
        samples = np.asarray(dist.sample(KEY, 200_000))  # [S, n, m]
        # E[X X^T] = U * tr(V); E[X^T X] = V * tr(U).
        exxt = np.einsum("sij,skj->ik", samples, samples) / samples.shape[0]
        np.testing.assert_allclose(exxt, u * np.trace(v), atol=0.05)


class TestSpecial:
    def test_empirical(self):
        dist = zd.Empirical(jnp.float64, batch_shape=(3,))
        with pytest.raises(ValueError):
            dist.sample(KEY, 1)
        with pytest.raises(ValueError):
            dist.log_prob(jnp.zeros(3))
        assert dist.batch_shape == (3,)

    def test_implicit(self):
        samples = _f64([1.0, 2.0])
        dist = zd.Implicit(samples)
        out = dist.sample(KEY, 3)
        assert out.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, 2.0])
        # Continuous implicit density is a point mass: +inf at the sample,
        # -inf elsewhere (reference legacy/distributions/special.py:164-169).
        np.testing.assert_array_equal(
            np.asarray(dist.prob(_f64([1.0, 0.0]))), [np.inf, -np.inf]
        )


class TestMultivariateStudentTCholesky:
    def _setup(self, df=4.5, seed=0):
        rng = np.random.RandomState(seed)
        a = rng.randn(3, 3)
        scale = a @ a.T + 3 * np.eye(3)
        tril = np.linalg.cholesky(scale)
        loc = rng.randn(3)
        dist = zd.MultivariateStudentTCholesky(
            jnp.asarray(df, jnp.float64), jnp.asarray(loc),
            jnp.asarray(tril),
        )
        return dist, loc, scale, df

    def test_log_prob_matches_scipy(self):
        from scipy import stats

        dist, loc, scale, df = self._setup()
        xs = np.random.RandomState(1).randn(7, 3) * 2
        got = np.asarray(dist.log_prob(jnp.asarray(xs)))
        want = stats.multivariate_t.logpdf(xs, loc, scale, df)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_sampling_moments(self):
        dist, loc, scale, df = self._setup()
        x = np.asarray(dist.sample(jax.random.PRNGKey(0), 200000))
        np.testing.assert_allclose(x.mean(0), loc, atol=0.03)
        # Cov = scale * df/(df-2).
        np.testing.assert_allclose(
            np.cov(x.T), scale * df / (df - 2.0), rtol=0.08
        )

    def test_heavy_tails_vs_gaussian(self):
        dist, loc, scale, df = self._setup(df=3.0)
        x = np.asarray(dist.sample(jax.random.PRNGKey(1), 100000))
        # Standardized 4th moment of each margin diverges from 3.
        z = (x - loc) / np.sqrt(np.diag(scale) * df / (df - 2.0))
        kurt = (z**4).mean(0)
        assert (kurt > 5.0).all(), kurt

    def test_reparameterized_gradient(self):
        # d E[x_0] / d loc_0 = 1 exactly.
        def mean_draw(loc0):
            dist = zd.MultivariateStudentTCholesky(
                jnp.asarray(5.0, jnp.float64),
                jnp.asarray([loc0, 0.0]),
                jnp.eye(2, dtype=jnp.float64),
            )
            return jnp.mean(dist.sample(jax.random.PRNGKey(2), 50000)[:, 0])

        g = float(jax.grad(mean_draw)(jnp.asarray(1.0, jnp.float64)))
        np.testing.assert_allclose(g, 1.0, rtol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError, match="at least 1-D"):
            zd.MultivariateStudentTCholesky(
                jnp.asarray(3.0), jnp.asarray(0.0), jnp.eye(2)
            )
        with pytest.raises(ValueError, match="trailing dims"):
            zd.MultivariateStudentTCholesky(
                jnp.asarray(3.0), jnp.zeros(3), jnp.eye(2)
            )

    def test_bn_sugar(self):
        import zhusuan_tpu as zs

        bn = zs.BayesianNet(key=jax.random.PRNGKey(0))
        x = bn.multivariate_student_t_cholesky(
            "x", jnp.asarray(5.0, jnp.float64),
            jnp.zeros(2, jnp.float64), jnp.eye(2, dtype=jnp.float64),
            n_samples=16,
        )
        assert x.tensor.shape == (16, 2)
        assert np.isfinite(np.asarray(bn.cond_log_prob("x"))).all()
