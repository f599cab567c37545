"""Stein variational gradient descent (Liu & Wang 2016).

Beyond the reference: upstream ZhuSuan covers parametric VI
(``variational/``) and MCMC (``hmc.py``/``sgmcmc.py``) but has no
particle-based variational method. SVGD fills that gap: a set of
interacting particles is transported along the kernelized Stein
discrepancy's steepest-descent direction

    phi(x_i) = (1/n) sum_j [ k(x_j, x_i) grad_{x_j} log p(x_j)
                             + grad_{x_j} k(x_j, x_i) ],

which reduces to MAP ascent for one particle and to a sample from ``p``
as ``n`` grows. Deterministic given the initial particles — no per-step
PRNG keys.

TPU-native design: particles are a leading axis (like MCMC chains, SURVEY
§2.10 row 1); each update is two ``[n, n] @ [n, D]`` matmuls (kernel
smoothing of the score plus the repulsion term) — MXU-shaped by
construction — driven by ``lax.scan``. The RBF median-bandwidth heuristic
is an on-device ``jnp.median`` over the pairwise squared distances.

Same model interface as the samplers: ``meta_bn`` may be a
:class:`MetaBayesianNet` or a raw ``log_joint(obs_dict)`` callable
(``make_log_joint_fn``, mcmc/base.py), latents are dicts of
``[n_particles, ...]`` arrays.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from zhusuan_tpu.mcmc.base import make_log_joint_fn

__all__ = ["SVGD", "SVGDState", "SVGDInfo"]

Latent = Dict[str, jnp.ndarray]


class SVGDState(NamedTuple):
    """Explicit SVGD state pytree."""

    particles: Latent  # {name: [n_particles, ...]}
    opt_state: Any  # optax optimizer state over the particle pytree
    t: jnp.ndarray  # iteration counter (int32)


class SVGDInfo(NamedTuple):
    """Per-iteration diagnostics."""

    particles: Latent
    bandwidth: jnp.ndarray  # RBF bandwidth h used this step
    grad_norm: jnp.ndarray  # mean ||phi_i||_2 over particles
    log_prob: jnp.ndarray  # [n_particles] log joint at the PRE-update
    #                        particles (free byproduct of the score pass)


def _flatten_particles(q: Latent):
    """[n, ...] dict -> ([n, D] matrix, unflatten(mat) -> dict)."""
    names = sorted(q.keys())
    n = q[names[0]].shape[0]
    sizes = [int(jnp.size(q[k])) // n for k in names]
    mat = jnp.concatenate([q[k].reshape(n, -1) for k in names], axis=1)

    def unflatten(m):
        out, off = {}, 0
        for k, s in zip(names, sizes):
            out[k] = m[:, off:off + s].reshape(q[k].shape)
            off += s
        return out

    return mat, unflatten


def _median_bisect(x, rel_tol: float = 1e-4, max_iters: int = 64):
    """Median of a non-negative array by bisection on the empirical CDF.

    ``jnp.median`` lowers to a full sort — measured 98x the cost of the
    REST of the SVGD update at 4096 particles on a v5e (sorting the
    [n, n] distance matrix is the worst possible TPU op). Bisection is a
    handful of elementwise-compare+mean streaming passes instead.

    Convergence is RELATIVE: the loop halves the bracket until
    ``hi - lo <= rel_tol * mid`` (capped at ``max_iters``), so a single
    huge outlier distance — which inflates the initial range by orders of
    magnitude — costs a few extra halvings instead of corrupting the
    result (an absolute 2^-16-of-range criterion returned 7.6e6 for a
    true median of 1.0 with one 1e12 outlier). Typical exit: ~20 passes.
    (PERF.md "SVGD median bandwidth".)
    """
    tiny = jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype)

    def cond(carry):
        i, lo, hi = carry
        mid = jnp.maximum(0.5 * (lo + hi), tiny)
        return jnp.logical_and(
            i < max_iters, (hi - lo) > rel_tol * mid
        )

    def body(carry):
        i, lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = jnp.mean((x <= mid).astype(x.dtype))
        return (
            i + 1,
            jnp.where(below < 0.5, mid, lo),
            jnp.where(below < 0.5, hi, mid),
        )

    _, lo, hi = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), x.dtype),
                     jnp.max(x))
    )
    return 0.5 * (lo + hi)


def rbf_kernel_terms(x, bandwidth):
    """RBF kernel matrix and its summed input-gradient for SVGD.

    :param x: ``[n, D]`` flattened particles.
    :param bandwidth: "median" (h = median(sqdist)/log(n+1), the Liu &
        Wang heuristic) or a positive float.
    :return: ``(K [n, n], repulsion [n, D], h)`` where
        ``repulsion[i] = sum_j grad_{x_j} k(x_j, x_i)``.
    """
    n = x.shape[0]
    x2 = jnp.sum(x * x, axis=1)
    sqdist = jnp.maximum(x2[:, None] + x2[None, :] - 2.0 * (x @ x.T), 0.0)
    if isinstance(bandwidth, str):
        if bandwidth != "median":
            raise ValueError(
                "bandwidth should be 'median' or a positive float, got "
                "{!r}.".format(bandwidth)
            )
        h = _median_bisect(sqdist) / jnp.log(float(n) + 1.0)
        h = jnp.maximum(h, jnp.asarray(1e-8, x.dtype))
    else:
        h = jnp.asarray(bandwidth, x.dtype)
    k_mat = jnp.exp(-sqdist / h)
    # sum_j grad_{x_j} k(x_j, x_i) = (2/h) (x_i * sum_j K_ij - (K x)_i)
    repulsion = (2.0 / h) * (x * jnp.sum(k_mat, axis=1, keepdims=True)
                             - k_mat @ x)
    return k_mat, repulsion, h


class SVGD:
    """Stein variational gradient descent driver.

    :param optimizer: an optax ``GradientTransformation`` applied to the
        (negated) Stein direction. Default: ``optax.adagrad(learning_rate)``
        — the choice in Liu & Wang (2016).
    :param learning_rate: used only for the default optimizer.
    :param bandwidth: "median" heuristic (default) or a fixed float.
    """

    def __init__(
        self,
        optimizer=None,
        learning_rate: float = 0.1,
        bandwidth: Union[str, float] = "median",
    ):
        if optimizer is None:
            import optax

            optimizer = optax.adagrad(learning_rate)
        self._opt = optimizer
        if isinstance(bandwidth, str):
            if bandwidth != "median":
                raise ValueError(
                    "bandwidth should be 'median' or a positive float, got "
                    "{!r}.".format(bandwidth)
                )
        elif not float(bandwidth) > 0.0:
            raise ValueError("bandwidth must be positive.")
        self._bandwidth = bandwidth

    def init(self, latent: Latent) -> SVGDState:
        """Create the initial state from ``{name: [n_particles, ...]}``
        initial particles (e.g. prior draws)."""
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        n_set = {v.shape[0] if v.ndim else None for v in q.values()}
        if None in n_set or len(n_set) != 1:
            raise ValueError(
                "All latent arrays must share a leading n_particles axis; "
                "got shapes {}.".format({k: v.shape for k, v in q.items()})
            )
        n = n_set.pop()
        if n < 2:
            raise ValueError(
                "SVGD needs at least 2 interacting particles, got {}; use "
                "MAP optimization directly for a single point estimate."
                .format(n)
            )
        return SVGDState(
            particles=q,
            opt_state=self._opt.init(q),
            t=jnp.zeros((), jnp.int32),
        )

    def _phi(self, log_posterior, q: Latent):
        """The Stein direction as a latent dict, plus diagnostics."""
        # Gradient of the SUMMED log joint: per-particle scores land in the
        # [n, ...] leaves (particles are independent inside log_posterior;
        # they interact only through the kernel below). has_aux returns
        # the per-particle values for free — no second forward pass.
        def summed(qq):
            lp = log_posterior(qq)
            return jnp.sum(lp), lp

        (_, lp), grads = jax.value_and_grad(summed, has_aux=True)(q)
        x, unflatten = _flatten_particles(q)
        g, _ = _flatten_particles(grads)
        n = x.shape[0]
        k_mat, repulsion, h = rbf_kernel_terms(x, self._bandwidth)
        phi = (k_mat @ g + repulsion) / float(n)
        grad_norm = jnp.mean(jnp.sqrt(jnp.sum(phi * phi, axis=1)))
        return unflatten(phi), h, grad_norm, lp

    def update(self, meta_bn, observed, state: SVGDState):
        """One SVGD step. Pure; safe under ``jit``/``scan``.

        :return: ``(new_state, SVGDInfo)``.
        """
        log_posterior = make_log_joint_fn(meta_bn, observed)
        phi, h, grad_norm, lp = self._phi(log_posterior, state.particles)
        # optax minimizes; SVGD ascends the Stein direction.
        neg_phi = jax.tree.map(jnp.negative, phi)
        updates, opt_state = self._opt.update(
            neg_phi, state.opt_state, state.particles
        )
        import optax

        particles = optax.apply_updates(state.particles, updates)
        new_state = SVGDState(
            particles=particles, opt_state=opt_state, t=state.t + 1
        )
        info = SVGDInfo(
            particles=particles,
            bandwidth=h,
            grad_norm=grad_norm,
            log_prob=lp,
        )
        return new_state, info

    def run(
        self,
        meta_bn,
        observed,
        state: SVGDState,
        n_iters: int,
        collect: bool = False,
    ):
        """Run ``n_iters`` updates on-device via ``lax.scan``.

        :param collect: stack per-iteration ``(bandwidth, grad_norm)``
            diagnostics (particle trajectories are rarely useful and
            HBM-expensive; read ``final_state.particles``).
        :return: ``(final_state, diagnostics_or_None)``.
        """

        def body(st, _):
            st2, info = self.update(meta_bn, observed, st)
            out = (info.bandwidth, info.grad_norm) if collect else None
            return st2, out

        final_state, outs = jax.lax.scan(body, state, None, length=n_iters)
        if collect:
            return final_state, {
                "bandwidth": outs[0], "grad_norm": outs[1]
            }
        return final_state, None
