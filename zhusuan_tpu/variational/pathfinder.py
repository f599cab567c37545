"""Pathfinder: variational inference along an L-BFGS optimization path.

Beyond the reference: Pathfinder (Zhang, Carpenter, Gelman & Vehtari,
JMLR 2022) runs a quasi-Newton optimization toward the posterior mode and
fits a Gaussian ``N(theta_l, Sigma_l)`` at EVERY iterate, with
``Sigma_l`` the L-BFGS compact inverse-Hessian estimate; it returns draws
from the approximation with the highest Monte-Carlo ELBO along the path.
Multi-path Pathfinder pools draws from several optimization paths by
Pareto-smoothed importance resampling. It is the standard fast
initializer/approximator a modern PPL ships next to ADVI and Laplace:
much cheaper than MCMC, far better mode-and-scale estimates than a bare
optimizer, and a strong initializer for HMC/NUTS warmup.

TPU-native design: the optimization is one ``lax.scan`` of
``optax.lbfgs`` steps over the flattened latent (the
``laplace_approximation`` recipe); the per-iterate approximation sweep is
a SECOND ``lax.scan`` carrying a rolling ``(s, y)`` pair buffer, where
each step does one thin ``[D, 2m]`` QR + one ``[2m, 2m]`` Cholesky (the
factorization below) and a K-draw ELBO estimate — everything static-shape
and jittable end to end. Multi-path wraps the single-path core in
``vmap``; only the final PSIS smoothing/resampling diagnostics run on
host (reusing ``evaluation.psis_smooth_log_weights``).

Factorization used (compact inverse BFGS, Byrd-Nocedal-Schnabel 1994,
with ``H0 = diag(alpha)``):

    Sigma = diag(alpha) + B W B^T,          B = [S, diag(alpha) Y]
    W     = [[R^-T (D + Y^T diag(alpha) Y) R^-1,  -R^-T],
             [-R^-1,                               0   ]]

with ``R = triu(S^T Y)``, ``D = diag(S^T Y)``. Writing
``A = diag(alpha)^-1/2 B = Q Rt`` (thin QR) and ``E = Rt W Rt^T``:

    Sigma^1/2 = diag(alpha)^1/2 (I + Q (L - I) Q^T),   L L^T = I + E

so draws cost ``O(D m)`` per sample and
``log det Sigma = sum log alpha + 2 sum log diag L``.

The diagonal seed ``alpha`` follows the paper: the BFGS Hessian update
restricted to its diagonal (``_diag_update``), seeded with the classic
scalar ``gamma = s^T y / y^T y`` at the first valid pair. The per-iterate
ELBO estimates use COMMON random numbers (one base-normal draw set shared
by every iterate), so the argmax ranks approximations rather than
independent Monte-Carlo noise.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import make_log_joint_fn

__all__ = [
    "PathfinderResult",
    "MultiPathfinderResult",
    "pathfinder",
    "multipath_pathfinder",
    "pathfinder_mcmc_init",
]


class PathfinderResult(NamedTuple):
    """Output of single-path :func:`pathfinder`."""

    draws: Dict  # {name: [n_draws, ...]} approximate posterior draws
    log_p: jnp.ndarray  # [n_draws] log joint at each draw
    log_q: jnp.ndarray  # [n_draws] approximation density at each draw
    elbo: jnp.ndarray  # scalar: ELBO of the selected approximation
    elbo_trace: jnp.ndarray  # [max_iters] per-iterate ELBO estimates
    best_iter: jnp.ndarray  # argmax iterate index (int32)
    mode: Dict  # the selected iterate (approximation mean)


class MultiPathfinderResult(NamedTuple):
    """Output of :func:`multipath_pathfinder`."""

    draws: Dict  # {name: [n_draws, ...]} PSIS-resampled pooled draws
    khat: float  # Pareto-k of the pooled importance ratios (> 0.7: bad)
    path_elbos: jnp.ndarray  # [n_paths] per-path selected ELBOs
    log_p: jnp.ndarray  # [n_draws] log joint at the resampled draws


def _lbfgs_trajectory(neg, x0, max_iters):
    """Run ``optax.lbfgs`` and collect the iterate/gradient trajectory:
    returns ``(xs, gs)`` of shape ``[max_iters + 1, D]`` (position and
    gradient of ``neg`` at iterates ``theta_0 .. theta_L``)."""
    import optax
    from optax import tree_utils as otu

    optimizer = optax.lbfgs()
    opt_state0 = optimizer.init(x0)
    value_and_grad = optax.value_and_grad_from_state(neg)

    def step(carry, _):
        x, opt_state = carry
        value, grad = value_and_grad(x, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, x, value=value, grad=grad, value_fn=neg
        )
        x_new = optax.apply_updates(x, updates)
        # A non-finite step (diverged linesearch on a nasty target) would
        # poison the whole trajectory — freeze instead.
        ok = jnp.all(jnp.isfinite(x_new))
        x_new = jnp.where(ok, x_new, x)
        return (x_new, opt_state), (x, grad)

    (x_last, opt_state), (xs, gs) = jax.lax.scan(
        step, (x0, opt_state0), None, length=max_iters
    )
    g_last = jax.grad(neg)(x_last)
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    gs = jnp.concatenate([gs, g_last[None]], axis=0)
    return xs, gs


def _bfgs_factor(s_buf, y_buf, valid, alpha, jitter):
    """(Q, L, log_det_sigma, ok) for the compact inverse-Hessian at one
    iterate, from the rolling pair buffers ``[m, D]`` (rows are vectors,
    oldest first; invalid rows are zeroed) and the diagonal seed
    ``alpha [D]``."""
    m, d = s_buf.shape
    dtype = s_buf.dtype
    sm = s_buf * valid[:, None]
    ym = y_buf * valid[:, None]
    sty = sm @ ym.T  # [m, m] (S^T Y)_{ij} = s_i . y_j
    r = jnp.triu(sty)
    # Unit diagonal for invalid pairs keeps R invertible; their beta
    # columns are zero so they contribute nothing.
    r = r + jnp.diag(jnp.where(valid > 0, 0.0, 1.0).astype(dtype))
    dv = jnp.diag(jnp.where(valid > 0, jnp.diagonal(sty), 0.0))
    yay = (ym * alpha[None]) @ ym.T  # Y^T diag(alpha) Y
    eye_m = jnp.eye(m, dtype=dtype)
    r_inv = jax.scipy.linalg.solve_triangular(r, eye_m, lower=False)
    w11 = r_inv.T @ (dv + yay) @ r_inv
    w = jnp.block([[w11, -r_inv.T], [-r_inv, jnp.zeros((m, m), dtype)]])
    # A = diag(alpha)^-1/2 [S, alpha Y] as a [D, 2m] matrix.
    inv_sqrt = 1.0 / jnp.sqrt(alpha)
    a = jnp.concatenate(
        [(sm * inv_sqrt[None]).T, (ym * jnp.sqrt(alpha)[None]).T], axis=1
    )
    # Thin QR: Q is [D, K] with K = min(D, 2m) (K < 2m when the latent
    # is smaller than the pair buffer — all downstream blocks are K-sized).
    q, rt = jnp.linalg.qr(a)
    kdim = q.shape[1]
    e = rt @ w @ rt.T
    eye_k = jnp.eye(kdim, dtype=dtype)
    mmat = eye_k + 0.5 * (e + e.T) + jitter * eye_k
    chol = jnp.linalg.cholesky(mmat)
    ok = jnp.all(jnp.isfinite(chol))
    chol = jnp.where(ok, chol, eye_k)
    log_det = jnp.sum(jnp.log(alpha)) + 2.0 * jnp.sum(
        jnp.log(jnp.maximum(jnp.diagonal(chol), 1e-30))
    )
    return q, chol, log_det, ok


def _diag_update(alpha, s, y, sy, pair_ok, seeded):
    """Diagonal inverse-Hessian seed update (the Pathfinder paper's
    scheme): the BFGS HESSIAN update restricted to its diagonal,

        (1/alpha')_j = (1/alpha)_j - (s_j/alpha_j)^2 / (s^T diag(1/a) s)
                       + y_j^2 / (s^T y),

    seeded with the classic scalar ``gamma = s^T y / y^T y`` at the
    first valid pair. PD-safe: clamped away from zero."""
    gamma = sy / jnp.maximum(jnp.sum(y * y), 1e-30)
    base = jnp.where(seeded, alpha, gamma * jnp.ones_like(alpha))
    binv = 1.0 / base
    quad = jnp.maximum(jnp.sum(s * s * binv), 1e-30)
    binv_new = binv - jnp.square(s * binv) / quad + y * y / sy
    alpha_new = 1.0 / jnp.maximum(binv_new, 1e-12)
    return jnp.where(pair_ok, alpha_new, alpha)


def _draws_from_z(z, theta, alpha, q, chol, log_det):
    """Map standard-normal draws ``z [n, D]`` through the factor to
    ``N(theta, Sigma)`` draws, plus their exact log density."""
    d = theta.shape[0]
    kdim = q.shape[1]
    u = z @ q  # [n, K]
    w = z + (u @ (chol - jnp.eye(kdim, dtype=theta.dtype)).T) @ q.T
    x = theta[None] + jnp.sqrt(alpha)[None] * w
    log_q = (
        -0.5 * d * float(np.log(2.0 * np.pi))
        - 0.5 * log_det
        - 0.5 * jnp.sum(z * z, axis=-1)
    )
    return x, log_q


def _factor_draws(key, theta, alpha, q, chol, log_det, n):
    """``n`` fresh draws from ``N(theta, Sigma)`` via the factor."""
    z = jax.random.normal(key, (n, theta.shape[0]), theta.dtype)
    return _draws_from_z(z, theta, alpha, q, chol, log_det)


def _pathfinder_flat(
    log_posterior, unflatten, x0, key, n_draws, max_iters, history,
    n_elbo_draws, jitter,
):
    """Single-path core over the flattened latent. Returns flat draws."""
    d = x0.shape[0]
    dtype = x0.dtype

    def neg(x):
        return -log_posterior(unflatten(x))

    def batched_log_p(xs_flat):
        return jax.vmap(lambda xx: log_posterior(unflatten(xx)))(xs_flat)

    xs, gs = _lbfgs_trajectory(neg, x0, max_iters)
    m = history

    key, key_sweep, key_final = jax.random.split(key, 3)
    # COMMON RANDOM NUMBERS across iterates: the ELBO argmax compares
    # every q_l on the SAME base draws, so ranking differences reflect
    # the approximations, not independent MC noise (at K=30, independent
    # draws let a degenerate late iterate win by luck).
    z_elbo = jax.random.normal(key_sweep, (n_elbo_draws, d), dtype)

    def sweep(carry, inputs):
        s_buf, y_buf, valid, alpha, seeded, best = carry
        theta, s, y = inputs
        sy = jnp.sum(s * y)
        norm_ok = sy > 1e-11 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        pair_ok = jnp.logical_and(norm_ok, jnp.all(jnp.isfinite(y)))
        okf = pair_ok.astype(dtype)
        s_buf = jnp.roll(s_buf, -1, axis=0).at[-1].set(s * okf)
        y_buf = jnp.roll(y_buf, -1, axis=0).at[-1].set(y * okf)
        valid = jnp.roll(valid, -1).at[-1].set(okf)
        alpha = _diag_update(alpha, s, y, sy, pair_ok, seeded)
        seeded = jnp.logical_or(seeded, pair_ok)

        qmat, chol, log_det, fac_ok = _bfgs_factor(
            s_buf, y_buf, valid, alpha, jitter
        )
        x_draws, log_q = _draws_from_z(
            z_elbo, theta, alpha, qmat, chol, log_det
        )
        log_p = batched_log_p(x_draws)
        elbo = jnp.mean(log_p - log_q)
        elbo = jnp.where(
            jnp.logical_and(fac_ok, jnp.isfinite(elbo)), elbo, -jnp.inf
        )

        best_elbo, best_theta, best_alpha, best_q, best_chol, best_ld, \
            best_it, it = best
        better = elbo > best_elbo
        pick = lambda new, old: jnp.where(better, new, old)
        best = (
            pick(elbo, best_elbo),
            pick(theta, best_theta),
            pick(alpha, best_alpha),
            pick(qmat, best_q),
            pick(chol, best_chol),
            pick(log_det, best_ld),
            jnp.where(better, it, best_it),
            it + 1,
        )
        return (s_buf, y_buf, valid, alpha, seeded, best), elbo

    zero_buf = jnp.zeros((m, d), dtype)
    kdim = min(d, 2 * m)  # thin-QR column count (see _bfgs_factor)
    best0 = (
        jnp.asarray(-jnp.inf, dtype),  # elbo
        x0,  # theta
        jnp.ones((d,), dtype),  # alpha
        jnp.zeros((d, kdim), dtype),  # Q
        jnp.eye(kdim, dtype=dtype),  # chol
        jnp.zeros((), dtype),  # log_det
        jnp.zeros((), jnp.int32),  # best iter
        jnp.zeros((), jnp.int32),  # iter counter
    )
    inputs = (xs[1:], xs[1:] - xs[:-1], gs[1:] - gs[:-1])
    (_, _, _, _, _, best), elbo_trace = jax.lax.scan(
        sweep,
        (zero_buf, zero_buf, jnp.zeros(m, dtype), jnp.ones((d,), dtype),
         jnp.asarray(False), best0),
        inputs,
    )
    (best_elbo, theta, alpha, qmat, chol, log_det, best_it, _) = best
    x_draws, log_q = _factor_draws(
        key_final, theta, alpha, qmat, chol, log_det, n_draws
    )
    log_p = batched_log_p(x_draws)
    return x_draws, log_p, log_q, best_elbo, elbo_trace, best_it, theta


def pathfinder(
    meta_bn,
    observed: Dict,
    init: Dict,
    key,
    n_draws: int = 1000,
    max_iters: int = 100,
    history: int = 6,
    n_elbo_draws: int = 30,
    jitter: float = 1e-8,
) -> PathfinderResult:
    """Single-path Pathfinder (Zhang et al. 2022, Algorithm 1).

    :param meta_bn: model (MetaBayesianNet or ``log_joint(obs_dict)``
        callable). Constrained latents: wrap with
        :func:`~zhusuan_tpu.bijectors.transform_log_joint` first.
    :param observed: observation dict.
    :param init: dict of UNBATCHED initial latent values (one
        optimization path, no chain axes).
    :param key: PRNG key.
    :param n_draws: draws returned from the selected approximation.
    :param max_iters: L-BFGS iterations (the path length).
    :param history: number of ``(s, y)`` pairs in the inverse-Hessian
        estimate (the paper's J).
    :param n_elbo_draws: Monte-Carlo draws per iterate for the ELBO.
    :return: :class:`PathfinderResult`.
    """
    from jax.flatten_util import ravel_pytree

    log_posterior = make_log_joint_fn(meta_bn, observed)
    init = {k: jnp.asarray(v) for k, v in init.items()}
    x0, unflatten = ravel_pytree(init)
    probe = jax.eval_shape(log_posterior, init).shape
    if probe != ():
        raise ValueError(
            "pathfinder needs an UNBATCHED latent (scalar log-joint); "
            "got log-joint shape {}. Drop the chain axes from init — "
            "multiple starting points go through "
            "multipath_pathfinder.".format(probe)
        )
    x_draws, log_p, log_q, elbo, trace, best_it, theta = _pathfinder_flat(
        log_posterior, unflatten, x0, jnp.asarray(key), int(n_draws),
        int(max_iters), int(history), int(n_elbo_draws), float(jitter),
    )
    draws = jax.vmap(unflatten)(x_draws)
    return PathfinderResult(
        draws=draws,
        log_p=log_p,
        log_q=log_q,
        elbo=elbo,
        elbo_trace=trace,
        best_iter=best_it,
        mode=unflatten(theta),
    )


def pathfinder_mcmc_init(result, n_chains: int):
    """Package a Pathfinder result as an HMC/NUTS warm start: the first
    ``n_chains`` draws become chain initial positions, and the draws'
    per-coordinate inverse variance the diagonal mass (momenta
    ``p ~ N(0, M)`` mix best when ``M`` is the posterior precision).

    Usage::

        res = multipath_pathfinder(model, obs, inits, key)
        init, mass = pathfinder_mcmc_init(res, n_chains=256)
        state = hmc.init(init, n_chain_dims=1)._replace(mass=mass)

    :param result: a :class:`PathfinderResult` or
        :class:`MultiPathfinderResult`.
    :param n_chains: chains to initialize (requires ``n_draws >=
        n_chains``; draws are already shuffled/resampled, so a prefix is
        an unbiased subset).
    :return: ``(init_latent_dict, mass_dict)`` — positions shaped
        ``[n_chains, ...]``, masses shaped ``[1, ...]`` (broadcast over
        the chain axis, the ``HMCState.mass`` layout).
    """
    draws = result.draws
    first = next(iter(draws.values()))
    if int(n_chains) > first.shape[0]:
        raise ValueError(
            "n_chains ({}) exceeds the available draws ({}); rerun "
            "Pathfinder with more n_draws.".format(
                n_chains, first.shape[0])
        )
    init = {k: v[: int(n_chains)] for k, v in draws.items()}
    mass = {
        k: 1.0 / jnp.maximum(
            jnp.var(v, axis=0, keepdims=True), 1e-12
        )
        for k, v in draws.items()
    }
    return init, mass


def multipath_pathfinder(
    meta_bn,
    observed: Dict,
    inits: Dict,
    key,
    n_draws: int = 1000,
    n_draws_per_path: int = 500,
    max_iters: int = 100,
    history: int = 6,
    n_elbo_draws: int = 30,
    jitter: float = 1e-8,
) -> MultiPathfinderResult:
    """Multi-path Pathfinder (Zhang et al. 2022, Algorithm 2): run one
    path per initial point (``vmap``), pool the per-path draws, and
    importance-resample ``n_draws`` of them WITHOUT replacement (Gumbel
    top-k) under Pareto-smoothed weights ``p/q``.

    :param inits: dict of initial values with a LEADING path axis
        (``[n_paths, ...]`` per latent).
    :return: :class:`MultiPathfinderResult` (``khat > 0.7`` means the
        pooled approximation misses posterior mass — increase paths or
        fall back to MCMC).
    """
    from jax.flatten_util import ravel_pytree

    from zhusuan_tpu.evaluation import psis_smooth_log_weights

    log_posterior = make_log_joint_fn(meta_bn, observed)
    inits = {k: jnp.asarray(v) for k, v in inits.items()}
    first = next(iter(inits.values()))
    n_paths = first.shape[0]
    one_init = {k: v[0] for k, v in inits.items()}
    _, unflatten = ravel_pytree(one_init)
    probe = jax.eval_shape(log_posterior, one_init).shape
    if probe != ():
        raise ValueError(
            "multipath_pathfinder: per-path latents must be unbatched "
            "beyond the leading path axis (scalar log-joint per path); "
            "got log-joint shape {}.".format(probe)
        )
    if n_draws > n_paths * n_draws_per_path:
        # Fail before any path runs — the pool size is known up front.
        raise ValueError(
            "n_draws ({}) exceeds the pooled draw count ({}); raise "
            "n_draws_per_path or the number of paths.".format(
                n_draws, n_paths * n_draws_per_path)
        )
    x0s = jax.vmap(lambda tree: ravel_pytree(tree)[0])(inits)

    def one_path(x0, k):
        return _pathfinder_flat(
            log_posterior, unflatten, x0, k, int(n_draws_per_path),
            int(max_iters), int(history), int(n_elbo_draws), float(jitter),
        )

    keys = jax.random.split(jnp.asarray(key), n_paths + 1)
    x_draws, log_p, log_q, elbos, _, _, _ = jax.vmap(one_path)(
        x0s, keys[:n_paths]
    )
    pooled = x_draws.reshape(-1, x_draws.shape[-1])
    log_ratio = (log_p - log_q).reshape(-1)
    # PSIS-smooth the pooled ratios (host-side; one column).
    finite = np.isfinite(np.asarray(log_ratio))
    lr_host = np.where(finite, np.asarray(log_ratio, np.float64), -np.inf)
    smoothed, khat = psis_smooth_log_weights(lr_host[:, None])
    log_w = jnp.asarray(smoothed[:, 0])
    # Gumbel top-k = sampling WITHOUT replacement proportional to the
    # smoothed weights (better pooled-draw diversity than categorical
    # with replacement; the paper's recommendation).
    gumbel = jax.random.gumbel(keys[-1], log_w.shape, log_w.dtype)
    _, idx = jax.lax.top_k(log_w + gumbel, int(n_draws))
    sel = pooled[idx]
    draws = jax.vmap(unflatten)(sel)
    return MultiPathfinderResult(
        draws=draws,
        khat=float(khat[0]),
        path_elbos=elbos,
        log_p=log_p.reshape(-1)[idx],
    )
