"""Gaussian processes: kernel zoo, exact regression, sparse (Titsias) bound.

Beyond the reference's surface: upstream ZhuSuan ships GPs only as an
example (``/root/reference/examples/gaussian_process/svgp.py`` with an RBF
kernel in ``utils.py:11-42``); there is no library-level GP API. This
module promotes the capability to the package: a composable kernel zoo,
exact GP regression with a differentiable log-marginal likelihood (type-II
ML hyperparameter fitting is one ``jax.grad`` away), and the collapsed
Titsias (2009) sparse bound — the SGPR complement to the uncollapsed SVGP
of ``examples/gaussian_process/svgp.py``.

TPU-native design: every kernel gram is one batched matmul-shaped
expression ([n, d] @ [d, m] inside a squared-distance expansion — MXU
work); all solves are Cholesky-based (no explicit inverses); everything is
jit/vmap/grad-clean with static shapes. Predictive paths reuse one
factorization for mean and covariance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "RBF",
    "Matern12",
    "Matern32",
    "Matern52",
    "Linear",
    "Periodic",
    "RationalQuadratic",
    "Constant",
    "Sum",
    "Product",
    "GPPosterior",
    "gp_log_marginal",
    "gp_regression",
    "sgpr_elbo",
    "sgpr_predict",
    "GaussianLikelihood",
    "BernoulliLikelihood",
    "PoissonLikelihood",
    "SVGPState",
    "svgp_init",
    "svgp_marginals",
    "svgp_elbo",
    "svgp_predict",
]


def _sq_dists(x, z):
    """Pairwise squared distances [n, m] via the matmul expansion —
    ``|x|^2 + |z|^2 - 2 x z'`` puts the O(n m d) work on the MXU.
    Clamped at zero: the expansion can go slightly negative in float."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    z2 = jnp.sum(z * z, axis=-1, keepdims=True)
    d2 = x2 + z2.T - 2.0 * (x @ z.T)
    return jnp.maximum(d2, 0.0)


class _Kernel:
    """Base: ``k(x, z) -> [n, m]`` gram, ``kdiag(x) -> [n]``; ``+`` and
    ``*`` build :class:`Sum` / :class:`Product` kernels."""

    def __call__(self, x, z):
        raise NotImplementedError

    def kdiag(self, x):
        raise NotImplementedError

    def __add__(self, other):
        return Sum(self, other)

    def __mul__(self, other):
        return Product(self, other)


class _Stationary(_Kernel):
    """Stationary kernel with ARD lengthscales and output variance.

    :param lengthscale: scalar or ``[d]`` per-dimension lengthscales.
    :param variance: scalar output variance ``k(x, x)``.
    """

    def __init__(self, lengthscale=1.0, variance=1.0):
        self.lengthscale = lengthscale
        self.variance = variance

    def _r2(self, x, z):
        ell = jnp.asarray(self.lengthscale)
        return _sq_dists(x / ell, z / ell)

    def kdiag(self, x):
        v = jnp.asarray(self.variance)
        return jnp.broadcast_to(v, x.shape[:-1])


class RBF(_Stationary):
    """Squared-exponential (ARD): ``v * exp(-r^2 / 2)``. Matches the
    reference's example kernel (``examples/gaussian_process/utils.py``)."""

    def __call__(self, x, z):
        return jnp.asarray(self.variance) * jnp.exp(-0.5 * self._r2(x, z))


class Matern12(_Stationary):
    """Exponential kernel: ``v * exp(-r)`` (Matern nu=1/2)."""

    def __call__(self, x, z):
        r = jnp.sqrt(self._r2(x, z) + 1e-36)
        return jnp.asarray(self.variance) * jnp.exp(-r)


class Matern32(_Stationary):
    """Matern nu=3/2: ``v (1 + s r) exp(-s r)``, ``s = sqrt(3)``."""

    def __call__(self, x, z):
        r = jnp.sqrt(self._r2(x, z) + 1e-36)
        s = jnp.sqrt(jnp.asarray(3.0, r.dtype))
        return jnp.asarray(self.variance) * (1.0 + s * r) * jnp.exp(-s * r)


class Matern52(_Stationary):
    """Matern nu=5/2: ``v (1 + s r + s^2 r^2 / 3) exp(-s r)``,
    ``s = sqrt(5)``."""

    def __call__(self, x, z):
        r2 = self._r2(x, z)
        r = jnp.sqrt(r2 + 1e-36)
        s = jnp.sqrt(jnp.asarray(5.0, r.dtype))
        return (jnp.asarray(self.variance)
                * (1.0 + s * r + (5.0 / 3.0) * r2) * jnp.exp(-s * r))


class Periodic(_Kernel):
    """Exp-sine-squared periodic kernel (MacKay):
    ``v * exp(-2 sin^2(pi ||x - z||_1-per-dim / p) / l^2)`` summed over
    dimensions — matches sklearn's ``ExpSineSquared`` for 1-D inputs.

    :param lengthscale: scalar correlation lengthscale ``l``.
    :param period: scalar period ``p``.
    :param variance: output variance.
    """

    def __init__(self, lengthscale=1.0, period=1.0, variance=1.0):
        self.lengthscale = lengthscale
        self.period = period
        self.variance = variance

    def __call__(self, x, z):
        diff = x[..., :, None, :] - z[..., None, :, :]  # [n, m, d]
        sine = jnp.sin(
            jnp.pi * jnp.abs(diff) / jnp.asarray(self.period)
        ) / jnp.asarray(self.lengthscale)
        return jnp.asarray(self.variance) * jnp.exp(
            -2.0 * jnp.sum(sine * sine, axis=-1)
        )

    def kdiag(self, x):
        v = jnp.asarray(self.variance)
        return jnp.broadcast_to(v, x.shape[:-1])


class RationalQuadratic(_Stationary):
    """Rational quadratic: ``v (1 + r^2 / (2 a))^{-a}`` — a scale
    mixture of RBFs (sklearn's ``RationalQuadratic``); ``alpha -> inf``
    recovers the RBF.

    :param alpha: positive mixture index.
    """

    def __init__(self, lengthscale=1.0, variance=1.0, alpha=1.0):
        super().__init__(lengthscale, variance)
        self.alpha = alpha

    def __call__(self, x, z):
        a = jnp.asarray(self.alpha)
        return jnp.asarray(self.variance) * jnp.power(
            1.0 + self._r2(x, z) / (2.0 * a), -a
        )


class Linear(_Kernel):
    """Dot-product kernel ``v * (x - c) (z - c)'``."""

    def __init__(self, variance=1.0, center=0.0):
        self.variance = variance
        self.center = center

    def __call__(self, x, z):
        c = jnp.asarray(self.center)
        return jnp.asarray(self.variance) * ((x - c) @ (z - c).T)

    def kdiag(self, x):
        c = jnp.asarray(self.center)
        return jnp.asarray(self.variance) * jnp.sum((x - c) ** 2, -1)


class Constant(_Kernel):
    """Constant kernel ``k(x, z) = v`` (bias term under Sum)."""

    def __init__(self, variance=1.0):
        self.variance = variance

    def __call__(self, x, z):
        v = jnp.asarray(self.variance)
        return jnp.broadcast_to(v, (x.shape[0], z.shape[0]))

    def kdiag(self, x):
        return jnp.broadcast_to(jnp.asarray(self.variance), x.shape[:-1])


class Sum(_Kernel):
    """``k1 + k2``."""

    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, x, z):
        return self.k1(x, z) + self.k2(x, z)

    def kdiag(self, x):
        return self.k1.kdiag(x) + self.k2.kdiag(x)


class Product(_Kernel):
    """``k1 * k2``."""

    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def __call__(self, x, z):
        return self.k1(x, z) * self.k2(x, z)

    def kdiag(self, x):
        return self.k1.kdiag(x) * self.k2.kdiag(x)


class GPPosterior(NamedTuple):
    """Predictive posterior from :func:`gp_regression` /
    :func:`sgpr_predict`."""

    mean: jnp.ndarray  # [m] predictive mean at x_star
    var: jnp.ndarray  # [m] marginal predictive variance (or [m, m] cov)
    log_marginal: jnp.ndarray  # scalar log p(y | X, theta)


def _chol_jitter(K, jitter):
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    return jnp.linalg.cholesky(K + jitter * eye)


def gp_log_marginal(kernel, x, y, noise_var, jitter: float = 1e-6):
    """Exact log-marginal likelihood ``log N(y; 0, K + sigma^2 I)``.

    Differentiable in kernel hyperparameters and ``noise_var`` — type-II
    ML is ``jax.grad`` of this through any optax loop.

    :param x: ``[n, d]`` inputs. :param y: ``[n]`` targets (zero-mean;
        subtract the mean first). :param noise_var: observation noise
        variance ``sigma^2``.
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    n = x.shape[0]
    K = kernel(x, x) + (jnp.asarray(noise_var)) * jnp.eye(n, dtype=x.dtype)
    L = _chol_jitter(K, jitter)
    a = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    return (-0.5 * jnp.sum(a * a)
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, x.dtype)))


def gp_regression(kernel, x, y, x_star, noise_var,
                  full_cov: bool = False,
                  jitter: float = 1e-6) -> GPPosterior:
    """Exact GP regression posterior at test points.

    One Cholesky of ``K + sigma^2 I`` shared by mean, (co)variance and
    the log-marginal. Returned variances are for the LATENT ``f*``; add
    ``noise_var`` for predictive-``y`` variance. ``full_cov=True``
    returns the full ``[m, m]`` covariance instead of marginals.
    """
    x, y, x_star = map(jnp.asarray, (x, y, x_star))
    n = x.shape[0]
    K = kernel(x, x) + jnp.asarray(noise_var) * jnp.eye(n, dtype=x.dtype)
    L = _chol_jitter(K, jitter)
    Ks = kernel(x, x_star)  # [n, m]
    a = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    V = jax.scipy.linalg.solve_triangular(L, Ks, lower=True)  # [n, m]
    mean = V.T @ a
    lm = (-0.5 * jnp.sum(a * a)
          - jnp.sum(jnp.log(jnp.diagonal(L)))
          - 0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, x.dtype)))
    if full_cov:
        cov = kernel(x_star, x_star) - V.T @ V
        return GPPosterior(mean=mean, var=cov, log_marginal=lm)
    var = kernel.kdiag(x_star) - jnp.sum(V * V, axis=0)
    return GPPosterior(mean=mean, var=jnp.maximum(var, 0.0),
                       log_marginal=lm)


def sgpr_elbo(kernel, x, y, z, noise_var, jitter: float = 1e-6):
    """Collapsed sparse-GP lower bound (Titsias 2009, eq. 9): the SGPR
    ELBO with the optimal variational distribution integrated out —

    .. math::
        \\log N(y; 0, Q_{nn} + \\sigma^2 I)
        - \\tfrac{1}{2\\sigma^2}\\,tr(K_{nn} - Q_{nn}),

    where :math:`Q_{nn} = K_{nz} K_{zz}^{-1} K_{zn}`. Differentiable in
    hyperparameters, noise AND inducing locations ``z`` — fit everything
    jointly by gradient ascent. Cost O(n m^2), never materializes an
    [n, n] matrix.
    """
    x, y, z = map(jnp.asarray, (x, y, z))
    n, m = x.shape[0], z.shape[0]
    sigma2 = jnp.asarray(noise_var)
    Kzz = kernel(z, z)
    Kzx = kernel(z, x)  # [m, n]
    Lz = _chol_jitter(Kzz, jitter)
    A = jax.scipy.linalg.solve_triangular(Lz, Kzx, lower=True)  # [m, n]
    # B = I + A A' / sigma2  (the m x m core of the Woodbury identity).
    B = jnp.eye(m, dtype=x.dtype) + (A @ A.T) / sigma2
    Lb = jnp.linalg.cholesky(B)
    c = jax.scipy.linalg.solve_triangular(Lb, A @ y, lower=True) / sigma2
    log_det = (2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb)))
               + n * jnp.log(sigma2))
    quad = jnp.sum(y * y) / sigma2 - jnp.sum(c * c)
    trace_term = (jnp.sum(kernel.kdiag(x)) - jnp.sum(A * A)) / sigma2
    return (-0.5 * (log_det + quad
                    + n * jnp.log(2.0 * jnp.asarray(jnp.pi, x.dtype)))
            - 0.5 * trace_term)


def sgpr_predict(kernel, x, y, z, x_star, noise_var,
                 jitter: float = 1e-6) -> GPPosterior:
    """Predictive posterior of the collapsed sparse GP at ``x_star``
    (Titsias 2009): mean/variance through the optimal q(u), O(n m^2).
    ``log_marginal`` carries the ELBO (a lower bound, not the exact
    marginal)."""
    x, y, z, x_star = map(jnp.asarray, (x, y, z, x_star))
    m = z.shape[0]
    sigma2 = jnp.asarray(noise_var)
    Kzz = kernel(z, z)
    Kzx = kernel(z, x)
    Kzs = kernel(z, x_star)  # [m, s]
    Lz = _chol_jitter(Kzz, jitter)
    A = jax.scipy.linalg.solve_triangular(Lz, Kzx, lower=True)
    B = jnp.eye(m, dtype=x.dtype) + (A @ A.T) / sigma2
    Lb = jnp.linalg.cholesky(B)
    c = jax.scipy.linalg.solve_triangular(Lb, A @ y, lower=True) / sigma2
    As = jax.scipy.linalg.solve_triangular(Lz, Kzs, lower=True)  # [m, s]
    tmp = jax.scipy.linalg.solve_triangular(Lb, As, lower=True)  # [m, s]
    mean = tmp.T @ c
    var = (kernel.kdiag(x_star) - jnp.sum(As * As, axis=0)
           + jnp.sum(tmp * tmp, axis=0))
    # Assemble the ELBO from the factorization already in scope instead
    # of re-running sgpr_elbo (which would redo the O(n m^2) grams,
    # Choleskys and solves — the dominant cost — a second time).
    n = x.shape[0]
    log_det = (2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb)))
               + n * jnp.log(sigma2))
    quad = jnp.sum(y * y) / sigma2 - jnp.sum(c * c)
    trace_term = (jnp.sum(kernel.kdiag(x)) - jnp.sum(A * A)) / sigma2
    elbo = (-0.5 * (log_det + quad
                    + n * jnp.log(2.0 * jnp.asarray(jnp.pi, x.dtype)))
            - 0.5 * trace_term)
    return GPPosterior(mean=mean, var=jnp.maximum(var, 0.0),
                       log_marginal=elbo)


# ---------------------------------------------------------------------------
# Uncollapsed sparse variational GP (Hensman et al. 2013/2015): the
# library-level, analytic complement of the MC-based parity example
# (``examples/gaussian_process/svgp.py``, reference
# ``examples/gaussian_process/svgp.py:49-139``). Minibatch-scalable:
# the data term is a sum over points, so ``svgp_elbo`` on a batch scaled
# by ``n_data / batch`` is an unbiased estimator of the full bound.
# ---------------------------------------------------------------------------


class GaussianLikelihood(NamedTuple):
    """``p(y | f) = N(y; f, noise_var)``; closed-form variational
    expectation (no quadrature)."""

    noise_var: jnp.ndarray

    def variational_expectations(self, y, fmean, fvar):
        s2 = jnp.asarray(self.noise_var)
        return (-0.5 * jnp.log(2.0 * jnp.pi * s2)
                - ((y - fmean) ** 2 + fvar) / (2.0 * s2))

    def predict(self, fmean, fvar):
        """Predictive mean/variance of y given q(f) = N(fmean, fvar)."""
        return fmean, fvar + jnp.asarray(self.noise_var)


class BernoulliLikelihood(NamedTuple):
    """``p(y=1 | f) = sigmoid(f)``, y in {0, 1}; expectations via
    Gauss-Hermite quadrature (``n_quad`` static points)."""

    n_quad: int = 20

    def variational_expectations(self, y, fmean, fvar):
        # sign = +1 for y=1, -1 for y=0: log p = -softplus(-sign * f).
        sign = jnp.where(y > 0.5, 1.0, -1.0)[..., None]

        def logp(f):
            return -jax.nn.softplus(-sign * f)

        return _gauss_hermite(logp, fmean, fvar, self.n_quad)

    def predict(self, fmean, fvar):
        p = _gauss_hermite(jax.nn.sigmoid, fmean, fvar, self.n_quad)
        return p, p * (1.0 - p)


class PoissonLikelihood(NamedTuple):
    """``p(y | f) = Poisson(exp(f))``; closed-form expectation using
    ``E[exp(f)] = exp(mu + var / 2)``."""

    def variational_expectations(self, y, fmean, fvar):
        return (y * fmean - jnp.exp(fmean + 0.5 * fvar)
                - jax.lax.lgamma(y + 1.0))

    def predict(self, fmean, fvar):
        mean = jnp.exp(fmean + 0.5 * fvar)
        var = mean + (jnp.exp(fvar) - 1.0) * mean ** 2
        return mean, var


def _gauss_hermite(g, mu, var, n_quad):
    """``E_{N(mu, var)}[g(f)]`` by Gauss-Hermite quadrature, batched over
    the leading axes of ``mu`` / ``var``. Nodes are compile-time
    constants (numpy), so the whole expectation is one fused
    broadcast-evaluate-reduce."""
    import numpy as _np

    xs, ws = _np.polynomial.hermite_e.hermegauss(int(n_quad))
    # hermegauss: weight exp(-x^2/2); E[g] = sum w_i g(mu + sqrt(var) x_i)
    #                                        / sqrt(2 pi)
    xs = jnp.asarray(xs, dtype=jnp.result_type(mu))
    ws = jnp.asarray(ws / _np.sqrt(2.0 * _np.pi),
                     dtype=jnp.result_type(mu))
    f = mu[..., None] + jnp.sqrt(jnp.maximum(var, 0.0))[..., None] * xs
    return jnp.sum(g(f) * ws, axis=-1)


class SVGPState(NamedTuple):
    """Variational state of the whitened SVGP: ``q(v) = N(m, S)`` with
    ``S = tril(q_sqrt) tril(q_sqrt)'`` and ``u = chol(Kzz) v`` (whitening
    makes the KL target ``N(0, I)`` and decorrelates the optimization
    geometry). A pytree — optimize it directly with optax alongside
    kernel hyperparameters."""

    z: jnp.ndarray  # [m, d] inducing inputs
    q_mu: jnp.ndarray  # [m]
    q_sqrt: jnp.ndarray  # [m, m]; lower triangle used


def svgp_init(z, jitter_scale: float = 1.0):
    """Initial :class:`SVGPState`: q(v) = N(0, I) at inducing inputs
    ``z`` (the prior, so the initial ELBO equals the prior expected
    log-likelihood)."""
    z = jnp.asarray(z)
    m = z.shape[0]
    return SVGPState(z=z, q_mu=jnp.zeros((m,), z.dtype),
                     q_sqrt=jitter_scale * jnp.eye(m, dtype=z.dtype))


def _svgp_common(kernel, state, x, jitter):
    z = state.z
    Lz = _chol_jitter(kernel(z, z), jitter)
    Kzx = kernel(z, x)
    A = jax.scipy.linalg.solve_triangular(Lz, Kzx, lower=True)  # [m, n]
    q_sqrt = jnp.tril(state.q_sqrt)
    fmean = A.T @ state.q_mu
    SA = q_sqrt.T @ A  # [m, n]
    fvar = (kernel.kdiag(x) - jnp.sum(A * A, axis=0)
            + jnp.sum(SA * SA, axis=0))
    return fmean, jnp.maximum(fvar, 0.0), q_sqrt


def svgp_marginals(kernel, state, x, jitter: float = 1e-6):
    """Marginal ``q(f(x)) = N(fmean, fvar)`` under the whitened SVGP
    posterior; ``[n]``-shaped mean and variance."""
    fmean, fvar, _ = _svgp_common(kernel, state, jnp.asarray(x), jitter)
    return fmean, fvar


def _kl_whitened(q_mu, q_sqrt):
    """KL(N(m, LL') || N(0, I)), L = tril(q_sqrt)."""
    m = q_mu.shape[0]
    diag = jnp.diagonal(q_sqrt)
    return 0.5 * (jnp.sum(q_sqrt * q_sqrt) + jnp.sum(q_mu * q_mu)
                  - m - 2.0 * jnp.sum(jnp.log(jnp.abs(diag) + 1e-300)))


def svgp_elbo(kernel, state, x, y, likelihood, n_data: Optional[int] = None,
              jitter: float = 1e-6):
    """Uncollapsed SVGP bound (Hensman et al. 2013):

    .. math::
        \\frac{N}{|B|} \\sum_{i \\in B}
        E_{q(f_i)}[\\log p(y_i | f_i)] - KL(q(v) \\| N(0, I)).

    Works with any likelihood exposing ``variational_expectations``;
    pass ``n_data`` when ``(x, y)`` is a minibatch so the data term is
    rescaled to the full set. Differentiable in the kernel
    hyperparameters, ``state`` (including inducing inputs) and any
    likelihood parameters. O(n m^2) per batch; all matmul-shaped.
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    fmean, fvar, q_sqrt = _svgp_common(kernel, state, x, jitter)
    ve = likelihood.variational_expectations(y, fmean, fvar)
    scale = 1.0 if n_data is None else n_data / x.shape[0]
    return scale * jnp.sum(ve) - _kl_whitened(state.q_mu, q_sqrt)


def svgp_predict(kernel, state, x_star, likelihood=None,
                 jitter: float = 1e-6) -> GPPosterior:
    """Predictive posterior at ``x_star``: latent ``q(f*)`` marginals,
    pushed through ``likelihood.predict`` when one is given (e.g.
    class probabilities for :class:`BernoulliLikelihood`).
    ``log_marginal`` is NaN — the uncollapsed bound needs targets; use
    :func:`svgp_elbo`."""
    fmean, fvar = svgp_marginals(kernel, state, x_star, jitter)
    if likelihood is not None:
        fmean, fvar = likelihood.predict(fmean, fvar)
    return GPPosterior(mean=fmean, var=fvar,
                       log_marginal=jnp.asarray(jnp.nan))
