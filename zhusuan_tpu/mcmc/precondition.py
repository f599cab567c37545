"""Dense preconditioning for MCMC via coordinate whitening.

Beyond the reference (whose HMC has only the diagonal EW mass,
zhusuan/hmc.py:115-159): correlated posteriors need a DENSE metric. Stan
threads a dense mass matrix through the integrator; on TPU the cleaner
equivalent is to *whiten the coordinates* — estimate the posterior
covariance ``Sigma = L L^T`` from warmup draws, then sample
``y = L^{-1} q`` under the transformed density ``log p(L y)`` with
identity mass. This is mathematically identical to dense-mass HMC
(momenta transform contravariantly) but keeps every sampler unchanged:
the whitened latent is still one ``[n_chains, d]`` array, so the fused
Pallas transitions, ChEES, and chain sharding all apply verbatim.

Typical use::

    warm, draws = hmc.run(log_joint, {}, state, k1, 500, n_adapt=500)
    chol = fit_dense_preconditioner(draws["samples"]["z"], shrinkage=5.0)
    white_lj, to_white, from_white = whiten_log_joint(log_joint, "z", chol)
    wstate = hmc.init({"z": to_white(warm.q["z"])}, n_chain_dims=1)
    wstate, out = hmc.run(white_lj, {}, wstate, k2, 2000)
    q_samples = from_white(out["samples"]["z"])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_dense_preconditioner", "whiten_log_joint"]


def fit_dense_preconditioner(draws, shrinkage: float = 5.0):
    """Estimate a regularized covariance Cholesky from warmup draws.

    :param draws: ``[..., d]`` draws of ONE latent (leading axes — e.g.
        iterations x chains — are flattened; trailing data axes must
        already be flat, matching how the whitened latent will be shaped).
    :param shrinkage: Stan-style shrinkage toward a scaled identity:
        ``Sigma <- n/(n+s) * Sigma_hat + s/(n+s) * 1e-3 * I`` with
        ``s = shrinkage`` pseudo-observations (stabilizes small-sample
        estimates; reference analogue: the EW-variance regularizer).
    :return: ``chol [d, d]`` — lower Cholesky of the regularized Sigma.
    """
    x = jnp.asarray(draws)
    d = x.shape[-1]
    x = x.reshape(-1, d)
    n = x.shape[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    cov = (xc.T @ xc) / jnp.maximum(float(n - 1), 1.0)
    w = float(n) / (float(n) + float(shrinkage))
    cov = w * cov + (1.0 - w) * float(1e-3) * jnp.eye(d, dtype=x.dtype)
    return jnp.linalg.cholesky(cov)


def whiten_log_joint(log_joint, name: str, chol):
    """Build the whitened density and the coordinate maps for latent
    ``name``.

    In whitened coordinates ``y = L^{-1} q`` the density is
    ``log p(L y)`` (the constant ``log|det L|`` Jacobian drops from MCMC).
    Identity-mass HMC on ``y`` IS dense-mass HMC on ``q`` with
    ``M = (L L^T)^{-1}``.

    :param log_joint: the original ``log_joint(obs_dict)`` callable or a
        :class:`~zhusuan_tpu.framework.meta_bn.MetaBayesianNet` (unwrapped
        here to its log-joint).
    :param name: which latent to whiten (its data shape must be ``[d]``).
    :param chol: ``[d, d]`` lower Cholesky from
        :func:`fit_dense_preconditioner`.
    :return: ``(white_log_joint, to_white, from_white)`` — the transformed
        density over ``{name: y}`` plus vectorized maps ``q -> y`` and
        ``y -> q`` acting on ``[..., d]`` arrays.
    """
    chol = jnp.asarray(chol)
    from zhusuan_tpu.mcmc.base import make_log_joint_fn

    log_joint = make_log_joint_fn(log_joint, {})

    def from_white(y):
        return y @ chol.T

    def to_white(q):
        # Solve L Y^T = Q^T for all rows at once (lower-triangular).
        q = jnp.asarray(q)
        flat = q.reshape(-1, q.shape[-1])
        yt = jax.scipy.linalg.solve_triangular(chol, flat.T, lower=True)
        return yt.T.reshape(q.shape)

    def white_log_joint(obs):
        obs = dict(obs)
        obs[name] = from_white(obs[name])
        return log_joint(obs)

    return white_log_joint, to_white, from_white
