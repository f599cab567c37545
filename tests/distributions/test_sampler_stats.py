"""Systematic sampler-statistics sweep: every sampleable distribution's
draws are checked against analytic moments and (continuous univariates)
a Kolmogorov-Smirnov test against the scipy CDF.

This complements the shape/dtype contract sweep (test_contract.py) and the
per-class scipy *log-prob* checks (test_univariate.py / test_multivariate.py)
with the class of bug neither can catch: a sampler that draws from the
WRONG distribution while keeping shapes and densities right (e.g. a
rate-vs-scale mixup, a missing reparameterization term). The reference
suite relied on TF's tested samplers; here every sampler is our own code
(reference tests/distributions/test_univariate.py scipy comparisons are
the model for the tolerances).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from zhusuan_tpu import distributions as zd

KEY = jax.random.PRNGKey(42)
N = 40000  # draws per check; bounds below are ~6 sigma at this N


def _draws(dist, n=N, key=KEY):
    return np.asarray(dist.sample(key, n_samples=n), np.float64)


# ---------------------------------------------------------------- #
# Moment sweep: (name, dist factory, analytic mean, analytic var)  #
# ---------------------------------------------------------------- #
MOMENT_CASES = [
    ("Normal", lambda: zd.Normal(mean=1.5, std=0.7), 1.5, 0.49),
    (
        "FoldNormal",
        # The reference sampler famously does NOT fold its draws
        # (univariate.py:306-317, an upstream quirk); this rebuild fixes
        # the sampler (documented divergence, distributions/univariate.py),
        # so the draws must match the folded-normal moments.
        lambda: zd.FoldNormal(mean=2.0, std=3.0),
        float(stats.foldnorm(c=2.0 / 3.0, scale=3.0).mean()),
        float(stats.foldnorm(c=2.0 / 3.0, scale=3.0).var()),
    ),
    ("Bernoulli", lambda: zd.Bernoulli(logits=0.8), None, None),  # below
    ("Uniform", lambda: zd.Uniform(minval=-2.0, maxval=3.0), 0.5, 25 / 12),
    ("Gamma", lambda: zd.Gamma(alpha=3.0, beta=2.0), 1.5, 0.75),
    ("Beta", lambda: zd.Beta(alpha=2.0, beta=5.0), 2 / 7, 10 / (49 * 8)),
    ("Poisson", lambda: zd.Poisson(rate=3.5), 3.5, 3.5),
    (
        "Binomial",
        lambda: zd.Binomial(logits=0.4, n_experiments=10),
        None,
        None,
    ),  # below
    (
        "InverseGamma",
        lambda: zd.InverseGamma(alpha=5.0, beta=2.0),
        0.5,
        0.25 / 3,
    ),
    ("Laplace", lambda: zd.Laplace(loc=-1.0, scale=0.5), -1.0, 0.5),
]


@pytest.mark.parametrize(
    "name,make,mean,var",
    [c for c in MOMENT_CASES if c[2] is not None],
    ids=[c[0] for c in MOMENT_CASES if c[2] is not None],
)
def test_univariate_moments(name, make, mean, var):
    x = _draws(make())
    se_mean = np.sqrt(var / N)
    assert abs(x.mean() - mean) < 6 * se_mean, (x.mean(), mean)
    # Var of the sample variance ~ (m4 - var^2)/N; 20% rel. bound is ~10x
    # looser than that for every case here.
    np.testing.assert_allclose(x.var(), var, rtol=0.2)


def test_bernoulli_rate():
    p = float(jax.nn.sigmoid(0.8))
    x = _draws(zd.Bernoulli(logits=0.8, dtype=jnp.float64))
    assert abs(x.mean() - p) < 6 * np.sqrt(p * (1 - p) / N)


def test_binomial_moments():
    p = float(jax.nn.sigmoid(0.4))
    n_exp = 10
    x = _draws(zd.Binomial(logits=0.4, n_experiments=n_exp,
                           dtype=jnp.float64))
    assert abs(x.mean() - n_exp * p) < 6 * np.sqrt(n_exp * p * (1 - p) / N)
    np.testing.assert_allclose(x.var(), n_exp * p * (1 - p), rtol=0.15)


def test_categorical_pmf():
    logits = jnp.asarray([0.0, 1.0, -0.5, 2.0])
    probs = np.asarray(jax.nn.softmax(logits), np.float64)
    x = _draws(zd.Categorical(logits)).astype(int)
    freq = np.bincount(x, minlength=4) / N
    np.testing.assert_allclose(freq, probs, atol=6 * np.sqrt(0.25 / N))


# ---------------------------------------------------------------- #
# KS tests vs scipy CDFs (continuous univariates)                   #
# ---------------------------------------------------------------- #
KS_CASES = [
    ("Normal", lambda: zd.Normal(mean=1.5, std=0.7),
     stats.norm(1.5, 0.7)),
    ("Uniform", lambda: zd.Uniform(minval=-2.0, maxval=3.0),
     stats.uniform(-2.0, 5.0)),
    ("Gamma", lambda: zd.Gamma(alpha=3.0, beta=2.0),
     stats.gamma(3.0, scale=0.5)),
    ("Beta", lambda: zd.Beta(alpha=2.0, beta=5.0), stats.beta(2.0, 5.0)),
    ("Laplace", lambda: zd.Laplace(loc=-1.0, scale=0.5),
     stats.laplace(-1.0, 0.5)),
    ("InverseGamma", lambda: zd.InverseGamma(alpha=5.0, beta=2.0),
     stats.invgamma(5.0, scale=2.0)),
    ("FoldNormal", lambda: zd.FoldNormal(mean=2.0, std=3.0),
     stats.foldnorm(c=2.0 / 3.0, scale=3.0)),
]


@pytest.mark.parametrize("name,make,ref", KS_CASES,
                         ids=[c[0] for c in KS_CASES])
def test_ks_against_scipy(name, make, ref):
    x = _draws(make(), n=10000, key=jax.random.PRNGKey(7))
    # With the null true, statistic ~ 1.63/sqrt(n) at the 1% level; use a
    # fixed seed so this is deterministic, and a 3x margin.
    stat = stats.kstest(x, ref.cdf).statistic
    assert stat < 3 * 1.63 / np.sqrt(10000), (name, stat)


def test_ks_binconcrete_limits():
    # BinConcrete at low temperature approaches Bernoulli(sigmoid(logits)):
    # mass concentrates near {0, 1} with P(x > 0.5) -> sigmoid(logits).
    x = _draws(zd.BinConcrete(temperature=0.05, logits=1.0), n=20000,
               key=jax.random.PRNGKey(3))
    p = float(jax.nn.sigmoid(1.0))
    assert abs((x > 0.5).mean() - p) < 0.02
    assert ((x < 0.05) | (x > 0.95)).mean() > 0.9


# ---------------------------------------------------------------- #
# Multivariate moment checks                                        #
# ---------------------------------------------------------------- #
def test_mvn_cholesky_mean_cov():
    mean = jnp.asarray([1.0, -2.0, 0.5])
    a = np.asarray([[1.0, 0, 0], [0.5, 0.8, 0], [-0.3, 0.2, 0.6]])
    tril = jnp.asarray(a)
    cov = a @ a.T
    x = _draws(zd.MultivariateNormalCholesky(mean, tril))
    np.testing.assert_allclose(x.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.06)


def test_multinomial_mean_cov():
    logits = jnp.asarray([0.2, -0.4, 1.0])
    probs = np.asarray(jax.nn.softmax(logits), np.float64)
    n_exp = 20
    x = _draws(zd.Multinomial(logits, n_experiments=n_exp,
                              dtype=jnp.float64))
    np.testing.assert_allclose(x.mean(0), n_exp * probs, rtol=0.03)
    # Diagonal covariance n p (1-p); off-diagonal -n p_i p_j.
    emp_cov = np.cov(x.T)
    true_cov = n_exp * (np.diag(probs) - np.outer(probs, probs))
    np.testing.assert_allclose(emp_cov, true_cov, atol=0.15)


def test_onehot_categorical_mean():
    logits = jnp.asarray([0.0, 1.0, -0.5])
    probs = np.asarray(jax.nn.softmax(logits), np.float64)
    x = _draws(zd.OnehotCategorical(logits, dtype=jnp.float64))
    np.testing.assert_allclose(x.mean(0), probs, atol=0.02)
    # Exactly one-hot rows.
    np.testing.assert_array_equal(x.sum(-1), np.ones(N))


def test_dirichlet_mean_var():
    alpha = jnp.asarray([2.0, 3.0, 5.0])
    a = np.asarray(alpha, np.float64)
    a0 = a.sum()
    x = _draws(zd.Dirichlet(alpha))
    np.testing.assert_allclose(x.mean(0), a / a0, atol=0.01)
    true_var = a * (a0 - a) / (a0 ** 2 * (a0 + 1))
    np.testing.assert_allclose(x.var(0), true_var, rtol=0.1)


def test_matrix_variate_normal_moments():
    n, m = 3, 2
    mean = jnp.zeros((n, m))
    au = np.asarray([[1.0, 0, 0], [0.4, 0.9, 0], [0.1, -0.2, 0.7]])
    av = np.asarray([[0.8, 0], [0.3, 0.5]])
    x = _draws(
        zd.MatrixVariateNormalCholesky(mean, jnp.asarray(au),
                                       jnp.asarray(av))
    ).reshape(N, n * m)
    # vec(X) ~ N(0, V (x) U) with U = au au^T, V = av av^T (row-major vec
    # interleaves as kron(U, V) for [n, m] matrices).
    cov = np.kron(au @ au.T, av @ av.T)
    np.testing.assert_allclose(x.mean(0), np.zeros(n * m), atol=0.05)
    np.testing.assert_allclose(np.cov(x.T), cov, atol=0.06)


def test_concrete_softmax_mean_limit():
    # Concrete at low temperature approaches OnehotCategorical: class
    # frequencies of the argmax match softmax(logits).
    logits = jnp.asarray([0.3, -0.8, 1.2])
    probs = np.asarray(jax.nn.softmax(logits), np.float64)
    x = _draws(zd.Concrete(temperature=0.05, logits=logits), n=20000,
               key=jax.random.PRNGKey(11))
    freq = np.bincount(x.argmax(-1), minlength=3) / 20000
    np.testing.assert_allclose(freq, probs, atol=0.02)
    np.testing.assert_allclose(x.sum(-1), np.ones(20000), rtol=1e-5)


def test_exp_concrete_is_log_of_concrete():
    # ExpConcrete samples live in log-simplex: exp sums to 1, and the
    # implied class frequencies match softmax(logits).
    logits = jnp.asarray([0.0, 0.7, -0.3])
    probs = np.asarray(jax.nn.softmax(logits), np.float64)
    x = _draws(zd.ExpConcrete(temperature=0.05, logits=logits), n=20000,
               key=jax.random.PRNGKey(13))
    np.testing.assert_allclose(np.exp(x).sum(-1), np.ones(20000),
                               rtol=1e-4)
    freq = np.bincount(x.argmax(-1), minlength=3) / 20000
    np.testing.assert_allclose(freq, probs, atol=0.02)
