"""Exact-conditional Gibbs sampling for finite-support discrete latents.

Beyond the reference: upstream ZhuSuan has no discrete-latent sampler at
all (its HMC docstring tells users discrete latents are unsupported;
examples marginalize by hand). This library already removes small
discrete latents exactly via :func:`zhusuan_tpu.marginalize` — but
marginalization costs the PRODUCT of support sizes when several discrete
sites interact, and some models want the labels themselves (cluster
assignments, change points). :class:`DiscreteGibbs` samples each discrete
coordinate from its EXACT full conditional — enumerate the K support
values, score the joint at each, one categorical draw — which is
rejection-free, tuning-free, and the textbook move for mixture labels.
Compose with :class:`~zhusuan_tpu.mcmc.gibbs.Gibbs` to alternate with
HMC/NUTS on the continuous block.

TPU-native design (the ``slice_sampler.py`` recipe): each latent's
coordinates are updated by ONE compiled ``lax.scan`` body over a traced
column index; the K candidate evaluations are a ``vmap`` over the support
(a ``[K, chains]`` score tensor per coordinate — K and the coordinate
count are static, so the whole sweep jits once regardless of model).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import make_log_joint_fn, scan_run_driver

__all__ = ["DiscreteGibbs", "DiscreteGibbsState", "DiscreteGibbsInfo"]

Latent = Dict[str, jnp.ndarray]


class DiscreteGibbsState(NamedTuple):
    """Explicit sampler state (position + sweep counter; exact
    conditionals need no tuning state and no density cache)."""

    q: Latent  # position: chain_axes + data_axes
    t: jnp.ndarray  # sweep counter (int32)

    def invalidate_cache(self) -> "DiscreteGibbsState":
        """No-op (kept for the Gibbs component contract — there is no
        cached density to go stale)."""
        return self


class DiscreteGibbsInfo(NamedTuple):
    """Per-sweep statistics."""

    samples: Latent
    log_prob: jnp.ndarray  # [chain_shape] log joint after the sweep


class DiscreteGibbs:
    """Systematic-scan exact Gibbs over finite-support discrete latents.

    :param support: dict mapping each owned latent name to a 1-D array of
        its support values (shared by every coordinate of that latent),
        e.g. ``{"labels": jnp.arange(K, dtype=jnp.float32)}``. Values are
        cast to the latent's dtype at sample time.
    """

    def __init__(self, support: Dict[str, jnp.ndarray]):
        if not support:
            raise ValueError("support must name at least one latent.")
        self._support = {}
        for name, vals in support.items():
            vals = jnp.asarray(vals)
            if vals.ndim != 1 or vals.shape[0] < 2:
                raise ValueError(
                    "support[{!r}] must be a 1-D array of >= 2 values; "
                    "got shape {}.".format(name, vals.shape)
                )
            self._support[name] = vals

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, n_chain_dims: int) -> DiscreteGibbsState:
        """Create the initial state from positions of shape
        ``chain_axes + data_axes`` (the ``HMC.init`` convention)."""
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        if not isinstance(n_chain_dims, (int, np.integer)):
            raise TypeError("n_chain_dims must be a Python int.")
        missing = set(q) - set(self._support)
        extra = set(self._support) - set(q)
        if missing or extra:
            raise ValueError(
                "support must exactly cover the latent dict; missing "
                "support for {}, unused support {}.".format(
                    sorted(missing), sorted(extra))
            )
        return DiscreteGibbsState(q=q, t=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------ #
    def sample(self, meta_bn, observed, state: DiscreteGibbsState, key,
               adapt=None):
        """One systematic sweep: every coordinate of every owned latent
        redrawn from its exact full conditional. Pure; scan-safe.
        ``adapt`` is accepted and ignored (exact conditionals have
        nothing to adapt — the Gibbs component contract)."""
        log_posterior = make_log_joint_fn(meta_bn, observed)
        q = dict(state.q)
        chain_shape = jax.eval_shape(log_posterior, q).shape
        names = sorted(q.keys())
        keys = jax.random.split(key, len(names))
        lp_last = None
        for name, k in zip(names, keys):
            arr = q[name]
            support = self._support[name].astype(arr.dtype)
            n_coords = int(np.prod(arr.shape[len(chain_shape):],
                                   dtype=np.int64))
            flat = arr.reshape(chain_shape + (n_coords,))

            def lp_at(f):
                qq = dict(q)
                qq[name] = f.reshape(arr.shape)
                return log_posterior(qq)

            def update_coord(carry, inp):
                f = carry
                j, kj = inp
                # [K, chain_shape] conditional scores at each support
                # value for coordinate j.
                scores = jax.vmap(
                    lambda v: lp_at(f.at[..., j].set(v))
                )(support)
                idx = jax.random.categorical(kj, scores, axis=0)
                new_val = support[idx]
                f = f.at[..., j].set(new_val)
                lp = jnp.take_along_axis(
                    scores, idx[None], axis=0
                )[0]
                return f, lp

            coord_keys = jax.random.split(k, n_coords)
            flat, lps = jax.lax.scan(
                update_coord, flat, (jnp.arange(n_coords), coord_keys)
            )
            q[name] = flat.reshape(arr.shape)
            lp_last = lps[-1]

        new_state = DiscreteGibbsState(q=q, t=state.t + 1)
        return new_state, DiscreteGibbsInfo(samples=q, log_prob=lp_last)

    # ------------------------------------------------------------------ #
    _VALID_FIELDS = ("samples", "log_prob")

    def run(
        self,
        meta_bn,
        observed,
        state: DiscreteGibbsState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect: bool = True,
        collect_fields=("samples", "log_prob"),
        thinning: int = 1,
    ):
        """Run ``n_iters`` sweeps on-device via the shared scan driver
        (``n_adapt`` is accepted for interface uniformity and ignored).

        :return: ``(final_state, {field: stacked} or None)``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )

        def pick(info):
            full = {"samples": info.samples, "log_prob": info.log_prob}
            return {f: full[f] for f in collect_fields}

        def one(st, k):
            k, sub = jax.random.split(k)
            st2, info = self.sample(meta_bn, observed, st, sub)
            return st2, k, info

        return scan_run_driver(
            one, pick, state, key, n_iters, collect, thinning
        )
