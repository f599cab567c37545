"""Laplace approximation: MAP + curvature -> Gaussian posterior and
evidence.

Beyond the reference: the fast deterministic baseline every PPL user
reaches for first — find the posterior mode with L-BFGS, take the
negative-log-density Hessian there, and read off

    q(z) = N(z_MAP, H^{-1}),
    log Z ~= log p(z_MAP, x) + (D/2) log 2pi - (1/2) log det H.

Complements the exact-but-sampled evidence of
:class:`zhusuan_tpu.smc.AnnealedSMC` (Laplace is one optimization run; the
quality degrades with posterior skew). Constrained latents go through
:func:`zhusuan_tpu.bijectors.transform_log_joint` FIRST — the Jacobian
term it adds makes the unconstrained-space Laplace evidence approximate
the same model evidence.

TPU notes: the optimization is one ``lax.scan`` of L-BFGS steps over the
FLATTENED latent vector; the Hessian is one ``jax.hessian`` call
(forward-over-reverse, D^2 work — intended for the small/medium latents
where Laplace makes sense).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import make_log_joint_fn

__all__ = ["LaplaceResult", "laplace_approximation"]


class LaplaceResult(NamedTuple):
    """Output of :func:`laplace_approximation`."""

    mode: Dict  # {name: array} — the MAP point (same structure as init)
    log_evidence: jnp.ndarray  # scalar Laplace log-evidence estimate
    chol_precision: jnp.ndarray  # [D, D] lower Cholesky of the Hessian H
    grad_norm: jnp.ndarray  # ||grad|| at the returned mode (convergence)
    log_post_mode: jnp.ndarray  # log joint at the mode
    pd_hessian: jnp.ndarray  # bool: Hessian was positive-definite at the
    #   returned point. False -> the optimizer stopped at a saddle/flat/
    #   non-log-concave region and log_evidence/chol_precision are NaN —
    #   check this (or grad_norm) before trusting the result.


def laplace_approximation(
    meta_bn,
    observed: Dict,
    init: Dict,
    n_iters: int = 500,
    optimizer=None,
) -> LaplaceResult:
    """Fit the Laplace approximation around the posterior mode.

    :param meta_bn: model (MetaBayesianNet or ``log_joint(obs_dict)``
        callable). For constrained latents, wrap with
        :func:`~zhusuan_tpu.bijectors.transform_log_joint` first and pass
        the unconstrained init.
    :param observed: observation dict.
    :param init: dict of UNBATCHED initial latent values (no chain axes —
        this is a single optimization, not a sampler).
    :param n_iters: optimization steps.
    :param optimizer: optax transformation; default ``optax.lbfgs()``.
    :return: :class:`LaplaceResult`. Draw approximate posterior samples
        via ``mode + solve(chol_precision.T, eps)`` or score with
        ``MultivariateNormalCholesky`` over the flattened coordinates.
    """
    import optax
    from jax.flatten_util import ravel_pytree

    log_posterior = make_log_joint_fn(meta_bn, observed)
    init = {k: jnp.asarray(v) for k, v in init.items()}
    x0, unflatten = ravel_pytree(init)
    probe = jax.eval_shape(log_posterior, init).shape
    if probe != ():
        raise ValueError(
            "laplace_approximation needs an UNBATCHED latent (scalar "
            "log-joint); got log-joint shape {}. Drop the chain axes "
            "from init.".format(probe)
        )

    def neg(x):
        return -log_posterior(unflatten(x))

    if optimizer is None:
        optimizer = optax.lbfgs()
    opt_state0 = optimizer.init(x0)
    # L-BFGS-style optimizers carry (value, grad) in their state and take
    # linesearch kwargs; plain transformations (adam, sgd, ...) do not.
    from optax import tree_utils as otu

    linesearch_style = otu.tree_get(opt_state0, "value") is not None

    if linesearch_style:
        value_and_grad = optax.value_and_grad_from_state(neg)

        def step(carry, _):
            x, opt_state = carry
            value, grad = value_and_grad(x, state=opt_state)
            updates, opt_state = optimizer.update(
                grad, opt_state, x, value=value, grad=grad, value_fn=neg
            )
            return (optax.apply_updates(x, updates), opt_state), None
    else:
        def step(carry, _):
            x, opt_state = carry
            grad = jax.grad(neg)(x)
            updates, opt_state = optimizer.update(grad, opt_state, x)
            return (optax.apply_updates(x, updates), opt_state), None

    (x_map, _), _ = jax.lax.scan(
        step, (x0, opt_state0), None, length=n_iters
    )

    grad_norm = jnp.linalg.norm(jax.grad(neg)(x_map))
    hess = jax.hessian(neg)(x_map)
    chol = jnp.linalg.cholesky(hess)
    # Non-positive-definite curvature (saddle / flat / non-log-concave
    # point) yields NaNs from cholesky — surface it as an explicit flag
    # rather than a silently-NaN result.
    pd = jnp.all(jnp.isfinite(chol))
    d = x_map.shape[0]
    half_log_det = jnp.sum(jnp.log(jnp.diagonal(chol)))
    lp_mode = -neg(x_map)
    log_z = jnp.where(
        pd,
        lp_mode + 0.5 * d * float(np.log(2.0 * np.pi)) - half_log_det,
        jnp.asarray(jnp.nan, x_map.dtype),
    )
    return LaplaceResult(
        mode=unflatten(x_map),
        log_evidence=log_z,
        chol_precision=chol,
        grad_norm=grad_norm,
        log_post_mode=lp_mode,
        pd_hessian=pd,
    )
