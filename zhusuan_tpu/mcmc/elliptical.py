"""Elliptical slice sampling (Murray, Adams & MacKay 2010).

Beyond the reference: upstream ZhuSuan has no sampler specialized for
Gaussian-prior latents, yet its own GP example (SURVEY §2.12, svgp.py)
is exactly that shape. ESS samples ``p(f) ∝ N(f; 0, Σ) L(f)`` with NO
tunable parameters and NO rejections: propose on the ellipse through the
current state and a prior draw, shrink the angle bracket until the
likelihood threshold is met. Every accepted point is a valid transition.

TPU-native design: chains are leading axes; the per-chain shrinkage loop
becomes ONE ``lax.while_loop`` over the whole batch with a per-chain
accepted mask (accepted chains freeze while stragglers keep shrinking —
SIMD-friendly, no dynamic shapes). The bracket always shrinks toward
``theta = 0`` (the current state), so the loop terminates; a
``max_shrink`` bound caps compilation-visible trip count, with the exact
``theta -> 0`` limit (stay at the current state) as the fallback.

The model interface splits the target into its Gaussian prior (given to
the constructor as per-name scales or Cholesky factors) and the
likelihood ``log L(f)`` (given to ``sample``/``run`` as a
MetaBayesianNet-or-callable, the library-wide convention).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import make_log_joint_fn, tree_normal_like

__all__ = ["EllipticalSlice", "EllipticalSliceState", "EllipticalSliceInfo"]

Latent = Dict[str, jnp.ndarray]


class EllipticalSliceState(NamedTuple):
    """Explicit sampler state.

    Cache invariant: ``log_lik`` is only valid for the likelihood the
    state was last advanced under (the MHState recipe, rwm.py). ``init``
    fills it with a NaN sentinel and ``sample`` re-evaluates on the
    sentinel; call :meth:`invalidate_cache` after re-targeting a
    restored state.
    """

    f: Latent  # position: chain_axes + data_axes
    log_lik: jnp.ndarray  # [chain_shape] cached log likelihood at f
    t: jnp.ndarray  # iteration counter (int32)

    def invalidate_cache(self) -> "EllipticalSliceState":
        """Mark the likelihood cache stale; the next ``sample`` call
        re-evaluates it against its own target."""
        return self._replace(log_lik=jnp.full_like(self.log_lik,
                                                   float("nan")))


class EllipticalSliceInfo(NamedTuple):
    """Per-iteration statistics."""

    samples: Latent
    log_lik: jnp.ndarray  # [chain_shape]
    n_shrinks: jnp.ndarray  # scalar: while-loop trips this iteration


class EllipticalSlice:
    """Elliptical slice sampler for latents with centered Gaussian priors.

    :param prior_std: scalar / per-name dict of scalars or arrays — the
        prior is ``N(0, diag(prior_std^2))`` per latent (broadcast over
        its data axes). Ignored for names present in ``prior_chol``.
    :param prior_chol: optional per-name ``[d, d]`` lower Cholesky of the
        prior covariance, applied to the LAST data axis (the GP case:
        ``chol(K)``).
    :param max_shrink: bound on bracket-shrink steps per iteration
        (Murray's loop terminates in a handful; 64 is generous).
    """

    def __init__(
        self,
        prior_std: Union[float, Dict] = 1.0,
        prior_chol: Optional[Dict] = None,
        max_shrink: int = 64,
    ):
        self._prior_std = prior_std
        self._prior_chol = dict(prior_chol or {})
        if int(max_shrink) < 1:
            raise ValueError("max_shrink must be >= 1.")
        self._max_shrink = int(max_shrink)

    def _std_for(self, name):
        if isinstance(self._prior_std, dict):
            if name not in self._prior_std:
                raise KeyError(
                    "No prior_std entry (and no prior_chol) for latent "
                    "{!r}.".format(name)
                )
            return self._prior_std[name]
        return self._prior_std

    def _prior_draw(self, key, f: Latent) -> Latent:
        unit = tree_normal_like(key, f)
        out = {}
        for name, eps in unit.items():
            if name in self._prior_chol:
                chol = jnp.asarray(self._prior_chol[name], eps.dtype)
                out[name] = jnp.einsum("ij,...j->...i", chol, eps)
            else:
                out[name] = eps * jnp.asarray(
                    self._std_for(name), eps.dtype
                )
        return out

    def init(self, latent: Latent, n_chain_dims: int) -> EllipticalSliceState:
        """Create the initial state from positions of shape
        ``chain_axes + data_axes`` (``HMC.init`` convention). The
        likelihood cache fills lazily on the first ``sample`` call."""
        f = {k: jnp.asarray(v) for k, v in latent.items()}
        if not isinstance(n_chain_dims, (int, np.integer)):
            raise TypeError("n_chain_dims must be a Python int.")
        any_leaf = next(iter(f.values()))
        chain_shape = any_leaf.shape[: int(n_chain_dims)]
        for name in f:
            if name not in self._prior_chol:
                self._std_for(name)  # validate coverage eagerly
        return EllipticalSliceState(
            f=f,
            # NaN sentinel: "cache not filled" — sample() re-evaluates on
            # it (same recipe as MHState, rwm.py), so a restored/
            # re-targeted state never slices against a stale threshold.
            log_lik=jnp.full(chain_shape, float("nan"), any_leaf.dtype),
            t=jnp.zeros((), jnp.int32),
        )

    def sample(self, meta_bn, observed, state: EllipticalSliceState, key):
        """One ESS transition over all chains. Pure; scan-safe.

        ``meta_bn`` is the LIKELIHOOD-only factor ``log L(f)`` (the
        Gaussian prior lives in the constructor).

        :return: ``(new_state, EllipticalSliceInfo)``.
        """
        log_lik_fn = make_log_joint_fn(meta_bn, observed)
        # Cache was typed from the first latent leaf at init; align it to
        # the likelihood dtype (mixed-dtype models) so the branches agree.
        ll_dtype = jax.eval_shape(log_lik_fn, state.f).dtype
        cached_ll = state.log_lik.astype(ll_dtype)
        ll0 = jax.lax.cond(
            jnp.any(jnp.isnan(cached_ll)),
            lambda: log_lik_fn(state.f),
            lambda: cached_ll,
        )
        chain_shape = ll0.shape

        key_nu, key_u, key_theta, key_shrink = jax.random.split(key, 4)
        nu = self._prior_draw(key_nu, state.f)
        # Slice threshold: log y = log L(f) + log u.
        log_y = ll0 + jnp.log(
            jax.random.uniform(key_u, chain_shape, ll0.dtype)
        )
        two_pi = 2.0 * jnp.pi
        theta = jax.random.uniform(
            key_theta, chain_shape, ll0.dtype, 0.0, two_pi
        )
        t_min, t_max = theta - two_pi, theta

        def point(th):
            """Position on the ellipse at angle ``th`` (per chain)."""
            def mix(fv, nv):
                shape = th.shape + (1,) * (fv.ndim - th.ndim)
                c = jnp.cos(th).reshape(shape)
                s = jnp.sin(th).reshape(shape)
                return fv * c + nv * s

            return jax.tree.map(mix, state.f, nu)

        def cond(carry):
            i, accepted, *_ = carry
            return jnp.logical_and(
                i < self._max_shrink, jnp.logical_not(jnp.all(accepted))
            )

        def body(carry):
            i, accepted, theta, t_min, t_max, f_out, ll_out = carry
            f_prop = point(theta)
            ll_prop = log_lik_fn(f_prop)
            ok = jnp.logical_and(jnp.logical_not(accepted),
                                 ll_prop > log_y)

            def keep(new, old):
                mask = ok.reshape(ok.shape + (1,) * (new.ndim - ok.ndim))
                return jnp.where(mask, new, old)

            f_out = jax.tree.map(keep, f_prop, f_out)
            ll_out = jnp.where(ok, ll_prop, ll_out)
            accepted = jnp.logical_or(accepted, ok)
            # Shrink the bracket toward 0 for still-rejected chains.
            t_min = jnp.where(
                jnp.logical_and(jnp.logical_not(accepted), theta < 0.0),
                theta, t_min,
            )
            t_max = jnp.where(
                jnp.logical_and(jnp.logical_not(accepted), theta >= 0.0),
                theta, t_max,
            )
            u = jax.random.uniform(
                jax.random.fold_in(key_shrink, i), chain_shape, ll0.dtype
            )
            theta = jnp.where(
                accepted, theta, t_min + u * (t_max - t_min)
            )
            return (i + 1, accepted, theta, t_min, t_max, f_out, ll_out)

        init_carry = (
            jnp.zeros((), jnp.int32),
            jnp.zeros(chain_shape, bool),
            theta, t_min, t_max,
            state.f,  # theta -> 0 fallback: stay at the current state
            ll0,
        )
        n_shrinks, _, _, _, _, f_new, ll_new = jax.lax.while_loop(
            cond, body, init_carry
        )
        new_state = EllipticalSliceState(
            f=f_new, log_lik=ll_new, t=state.t + 1
        )
        info = EllipticalSliceInfo(
            samples=f_new, log_lik=ll_new, n_shrinks=n_shrinks
        )
        return new_state, info

    def run(
        self,
        meta_bn,
        observed,
        state: EllipticalSliceState,
        key,
        n_iters: int,
        collect: bool = True,
    ):
        """Run ``n_iters`` transitions on-device via ``lax.scan``.

        :return: ``(final_state, {"samples", "log_lik", "n_shrinks"}
            or None)``.
        """

        # Carry type stability for mixed-dtype models: the cache dtype
        # follows the likelihood (matching cast in sample()).
        ll_dtype = jax.eval_shape(
            make_log_joint_fn(meta_bn, observed), state.f
        ).dtype
        state = state._replace(log_lik=state.log_lik.astype(ll_dtype))

        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st2, info = self.sample(meta_bn, observed, st, sub)
            out = (
                {
                    "samples": info.samples,
                    "log_lik": info.log_lik,
                    "n_shrinks": info.n_shrinks,
                }
                if collect
                else None
            )
            return (st2, k), out

        (final_state, _), outs = jax.lax.scan(
            body, (state, key), None, length=n_iters
        )
        return final_state, outs
