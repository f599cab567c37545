"""Automatic variational guides (ADVI): mean-field and full-rank.

Beyond the reference: ``/root/reference/zhusuan`` requires hand-writing
a variational :class:`BayesianNet` per model (every VAE/BNN example
builds its own q net). Automatic differentiation variational inference
(Kucukelbir et al. 2017) instead DERIVES the family from the model: each
free latent is mapped to an unconstrained space by a support-matching
bijector (positive -> softplus, interval -> sigmoid, simplex ->
stick-breaking, correlation Cholesky -> canonical partial correlations;
the :mod:`zhusuan_tpu.bijectors` used for MCMC reuse), a Gaussian is fit
there, and samples are pushed back through the bijector with the
log-det correction. Vector bijectors change the trailing shape, so the
guide's parameter shapes come from ``bijector.unconstrained_shape``
(e.g. a K-simplex latent gets K-1 free coordinates).

TPU-native design: a guide is a pure function of an explicit parameter
pytree — ``guide.sample(params, key, n_samples)`` traces to one fused
program (no Python loop over latents at runtime; the per-latent
structure is unrolled at trace time), and the parameters drop into any
optax optimizer. The full-rank guide samples ONE ``[D]`` Gaussian via
its Cholesky factor (a single MXU-friendly matmul for any latent
count) and attributes EXACT per-latent conditional densities using the
Cholesky's autoregressive structure — ``log q(z_i | z_{<i})`` is the
standard-normal density of the block's own ``eps`` minus its block's
log-diagonal — so the per-name ``(samples, log_prob)`` pairs it feeds
to the estimators sum to the joint log density exactly.

Typical use::

    guide = zs.variational.MeanFieldGuide(model(), observed={"x": x})
    params = guide.init_params()
    def loss(p, key):
        lat = guide.latent(p, key, n_samples=64)
        return zs.variational.elbo(
            model(), {"x": x}, latent=lat, axis=0).sgvb()
    # ... optax loop; then:
    post = guide.sample_posterior(params, key, n_samples=1000)

Guides are reparameterized by construction — use the ``sgvb`` /
``importance_weighted_objective`` estimators (score-function estimators
would need per-name stop-gradient structure these pairs don't carry).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu import bijectors as bij
from zhusuan_tpu import distributions as dist_mod
from zhusuan_tpu.framework.bn import StochasticTensor
from zhusuan_tpu.framework.meta_bn import MetaBayesianNet

__all__ = ["MeanFieldGuide", "FullRankGuide"]

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))


class _Identity(bij.Bijector):
    def forward(self, y):
        return y

    def inverse(self, x):
        return x

    def forward_log_det(self, y):
        return jnp.zeros_like(y)


def _default_bijector(d):
    """Support-matching bijector for a distribution instance, or raise
    for supports ADVI cannot handle generically."""
    positive = (
        dist_mod.Gamma, dist_mod.InverseGamma, dist_mod.FoldNormal,
    )
    unit = (dist_mod.Beta, dist_mod.BinConcrete)
    for extra_name in ("HalfCauchy", "LogNormal", "Exponential"):
        cls = getattr(dist_mod, extra_name, None)
        if cls is not None and isinstance(d, cls):
            return bij.Softplus()
    if isinstance(d, positive):
        return bij.Softplus()
    if isinstance(d, unit):
        return bij.Sigmoid()
    if isinstance(d, dist_mod.Uniform):
        lo, hi = d.minval, d.maxval
        if jnp.ndim(lo) == 0 and jnp.ndim(hi) == 0:
            return bij.Sigmoid(float(lo), float(hi))
        raise ValueError(
            "Uniform latent with non-scalar bounds needs an explicit "
            "bijector (pass bijectors={name: ...})."
        )
    if isinstance(d, dist_mod.Dirichlet):
        return bij.StickBreaking()
    if getattr(dist_mod, "LKJCholesky", None) is not None and isinstance(
        d, dist_mod.LKJCholesky
    ):
        return bij.CorrelationCholesky()
    if getattr(dist_mod, "Wishart", None) is not None and isinstance(
        d, dist_mod.Wishart
    ):
        raise ValueError(
            "Latent '{}' is a PD-matrix support with no generic ADVI "
            "bijector; pass an explicit bijector for it, fix it via "
            "`observed`, or marginalize it.".format(type(d).__name__)
        )
    return _Identity()


class _AutoGuideBase:
    """Shared model tracing: find the free latents, their shapes/dtypes,
    and support bijectors."""

    def __init__(self, meta_bn: MetaBayesianNet, observed: Optional[Dict]
                 = None, bijectors: Optional[Dict] = None):
        if not isinstance(meta_bn, MetaBayesianNet):
            raise TypeError(
                "meta_bn must be a MetaBayesianNet (decorate the model "
                "builder with @meta_bayesian_net() and CALL it), got "
                "{!r}.".format(type(meta_bn))
            )
        observed = dict(observed or {})
        overrides = dict(bijectors or {})
        # One eager forward sample exposes each node's distribution
        # instance and (chainless) shape.
        probe = meta_bn.observe(key=jax.random.PRNGKey(0), **observed)
        self._names, self._shapes, self._dtypes, self._bijectors = (
            [], {}, {}, {}
        )
        for name, node in probe.nodes.items():
            if not isinstance(node, StochasticTensor) or node.is_observed:
                continue
            d = node.dist
            if np.dtype(d.dtype).kind != "f":
                raise ValueError(
                    "Latent '{}' is discrete ({}); ADVI requires "
                    "continuous free latents — observe it, enumerate it "
                    "out, or use a score-function objective with a "
                    "hand-written variational net.".format(name, d.dtype)
                )
            self._names.append(name)
            b = (overrides[name] if name in overrides
                 else _default_bijector(d))
            self._bijectors[name] = b
            # The guide lives in the UNCONSTRAINED space; vector
            # bijectors (StickBreaking, CorrelationCholesky) change the
            # trailing shape, so parameter shapes come from the bijector.
            self._shapes[name] = tuple(
                b.unconstrained_shape(tuple(jnp.shape(node.tensor)))
            )
            self._dtypes[name] = node.tensor.dtype
        if not self._names:
            raise ValueError(
                "The model has no free latents under the given "
                "`observed`."
            )
        self._names = sorted(self._names)
        self._sizes = {
            n: int(np.prod(self._shapes[n], dtype=np.int64))
            for n in self._names
        }
        self._dim = sum(self._sizes.values())
        self._dtype = jnp.result_type(
            *[self._dtypes[n] for n in self._names]
        )

    # -- public metadata ----------------------------------------------- #
    @property
    def latent_names(self):
        """Sorted names of the free latents the guide covers."""
        return list(self._names)

    @property
    def bijectors(self):
        """The support bijector per latent (after overrides)."""
        return dict(self._bijectors)

    # -- shared pieces -------------------------------------------------- #
    def _constrain(self, z_u: Dict, lead_ndim: int):
        """Push unconstrained samples through the bijectors; return
        ``(samples, per-name -log|det J| summed over data axes)``."""
        samples, neg_ld = {}, {}
        for n in self._names:
            b = self._bijectors[n]
            y = z_u[n]
            samples[n] = b.forward(y)
            ld = b.forward_log_det(y)
            axes = tuple(range(lead_ndim, ld.ndim))
            neg_ld[n] = -jnp.sum(ld, axis=axes) if axes else -ld
        return samples, neg_ld

    def latent(self, params, key, n_samples: Optional[int] = None):
        """The dict for ``elbo(..., latent=guide.latent(...))`` —
        per-name ``(samples, log_prob)`` pairs whose log-probs sum to
        the guide's joint log density."""
        samples, log_probs = self.sample(params, key, n_samples)
        return {n: (samples[n], log_probs[n]) for n in self._names}

    def sample_posterior(self, params, key, n_samples: int):
        """Constrained posterior-approximation draws only (e.g. for
        :func:`~zhusuan_tpu.framework.posterior_predictive`)."""
        return self.sample(params, key, n_samples)[0]


class MeanFieldGuide(_AutoGuideBase):
    """Factorized Gaussian in the unconstrained space (ADVI mean-field).

    Parameters: ``{"loc": {name: arr}, "log_scale": {name: arr}}`` in
    the unconstrained space, one entry per latent, shapes matching the
    latent. ``init_scale`` follows the ADVI default of a tight initial
    fit (exp(-2.3) ~= 0.1).
    """

    def __init__(self, meta_bn, observed=None, bijectors=None,
                 init_scale: float = 0.1):
        super().__init__(meta_bn, observed, bijectors)
        if not float(init_scale) > 0.0:
            raise ValueError("init_scale must be positive.")
        self._init_log_scale = float(np.log(init_scale))

    def init_params(self):
        return {
            "loc": {
                n: jnp.zeros(self._shapes[n], self._dtypes[n])
                for n in self._names
            },
            "log_scale": {
                n: jnp.full(
                    self._shapes[n], self._init_log_scale,
                    self._dtypes[n],
                )
                for n in self._names
            },
        }

    def sample(self, params, key, n_samples: Optional[int] = None):
        """Draw from the guide.

        :return: ``(samples, log_probs)`` — constrained samples and the
            per-name log densities (data axes reduced), each with a
            leading ``[n_samples]`` axis unless ``n_samples`` is None.
        """
        lead = () if n_samples is None else (int(n_samples),)
        keys = jax.random.split(jnp.asarray(key), len(self._names))
        z_u, log_q = {}, {}
        for n, k in zip(self._names, keys):
            loc, ls = params["loc"][n], params["log_scale"][n]
            eps = jax.random.normal(
                k, lead + self._shapes[n], self._dtypes[n]
            )
            z_u[n] = loc + jnp.exp(ls) * eps
            per = -0.5 * eps * eps - _HALF_LOG_2PI - ls
            axes = tuple(range(len(lead), per.ndim))
            log_q[n] = jnp.sum(per, axis=axes) if axes else per
        samples, neg_ld = self._constrain(z_u, len(lead))
        return samples, {
            n: log_q[n] + neg_ld[n] for n in self._names
        }

    def median(self, params):
        """The guide's (constrained) componentwise median — the
        bijector-pushed location; a cheap point estimate."""
        return {
            n: self._bijectors[n].forward(params["loc"][n])
            for n in self._names
        }


class FullRankGuide(_AutoGuideBase):
    """Joint Gaussian over ALL unconstrained latents (ADVI full-rank):
    one ``[D]`` location and a Cholesky factor, sampled with a single
    matmul. Captures cross-latent posterior correlations the mean-field
    family cannot.

    Parameters: ``{"loc": [D], "chol_raw": [D, D]}`` — ``chol_raw``'s
    strict lower triangle is used as-is and its diagonal is passed
    through softplus (+1e-6) for positivity; ``init_params`` starts at
    ``diag ~= init_scale``.
    """

    def __init__(self, meta_bn, observed=None, bijectors=None,
                 init_scale: float = 0.1):
        super().__init__(meta_bn, observed, bijectors)
        if not float(init_scale) > 0.0:
            raise ValueError("init_scale must be positive.")
        self._init_scale = float(init_scale)
        # Block layout in the flat vector, sorted-name order.
        self._starts, s = {}, 0
        for n in self._names:
            self._starts[n] = s
            s += self._sizes[n]

    def init_params(self):
        # softplus(raw) = init_scale on the diagonal.
        raw_diag = float(np.log(np.expm1(self._init_scale)))
        return {
            "loc": jnp.zeros((self._dim,), self._dtype),
            "chol_raw": jnp.eye(self._dim, dtype=self._dtype) * raw_diag,
        }

    def _chol(self, params):
        raw = params["chol_raw"]
        diag = jax.nn.softplus(jnp.diagonal(raw)) + 1e-6
        return (
            jnp.tril(raw, k=-1) + jnp.diag(diag),
            jnp.log(diag),
        )

    def sample(self, params, key, n_samples: Optional[int] = None):
        """Draw from the guide; see :meth:`MeanFieldGuide.sample`.
        Per-name log-probs are the EXACT autoregressive conditionals
        ``log q(z_i | z_{<i})`` of the joint Gaussian (sorted-name
        block order), so they sum to the joint log density."""
        lead = () if n_samples is None else (int(n_samples),)
        L, log_diag = self._chol(params)
        eps = jax.random.normal(
            jnp.asarray(key), lead + (self._dim,), self._dtype
        )
        flat = params["loc"] + eps @ L.T
        # log q(z_block | previous blocks) = sum over the block's coords
        # of [ log N(eps_c) - log L_cc ]  (Cholesky autoregression).
        per_coord = -0.5 * eps * eps - _HALF_LOG_2PI - log_diag
        z_u, log_q = {}, {}
        for n in self._names:
            s, e = self._starts[n], self._starts[n] + self._sizes[n]
            z_u[n] = flat[..., s:e].reshape(
                lead + self._shapes[n]
            ).astype(self._dtypes[n])
            log_q[n] = jnp.sum(per_coord[..., s:e], axis=-1)
        samples, neg_ld = self._constrain(z_u, len(lead))
        return samples, {n: log_q[n] + neg_ld[n] for n in self._names}

    def median(self, params):
        """Bijector-pushed location (componentwise), unraveled per
        latent."""
        loc = params["loc"]
        out = {}
        for n in self._names:
            s, e = self._starts[n], self._starts[n] + self._sizes[n]
            out[n] = self._bijectors[n].forward(
                loc[s:e].reshape(self._shapes[n]).astype(self._dtypes[n])
            )
        return out

    def covariance(self, params):
        """The guide's unconstrained-space covariance ``L @ L.T`` (for
        inspection / Laplace-style reuse)."""
        L, _ = self._chol(params)
        return L @ L.T
