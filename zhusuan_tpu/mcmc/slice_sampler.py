"""Coordinate-wise slice sampling (Neal 2003): stepping-out + shrinkage.

Beyond the reference: upstream ZhuSuan ships only HMC and the SGMCMC
family (``zhusuan/hmc.py``, ``zhusuan/sgmcmc.py``). The slice sampler
completes the gradient-free end of the kernel matrix next to
:class:`~zhusuan_tpu.mcmc.rwm.RandomWalkMetropolis`: it has no rejections,
no step-size tuning cliff (the interval adapts per draw by construction),
and works on log-joints with non-differentiable pieces — the standard
robust default for low-dimensional, cheap-density targets.

TPU-native design (the ``rwm.py`` recipe): explicit NamedTuple state, a
pure ``sample(state, key)`` kernel iterated by ``lax.scan`` via the shared
:func:`~zhusuan_tpu.mcmc.base.scan_run_driver`; parallel chains are a
leading axis and every inner loop is a bounded, chain-masked
``lax.while_loop`` (static trip bounds — no data-dependent shapes):

- the latent dict is flattened once to a ``[*, D]`` coordinate block so
  the coordinate sweep is ONE compiled ``lax.scan`` body over a traced
  column index (compile time O(1) in D, like the reference's graph-size
  discipline);
- stepping-out uses Neal's randomized budget split (Fig. 3 of Neal 2003:
  ``J ~ U{0..m-1}`` expansions left, ``m-1-J`` right), which keeps the
  procedure reversible under the ``max_stepouts`` cap;
- shrinkage is capped at ``max_shrinks``; a chain that exhausts the cap
  keeps its current coordinate (counted in ``SliceInfo.stuck_fraction`` —
  at the defaults this is a ~never event on continuous targets);
- optional width self-tuning during burn-in reuses the shared EW
  moving-variance accumulator (``mcmc/base.py``, reference hmc.py:115-159)
  to set each coordinate's width to ``width_mult * std``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.utils import open_interval_standard_uniform
from zhusuan_tpu.mcmc.base import (
    ewmv_update,
    make_log_joint_fn,
    scan_run_driver,
)

__all__ = ["SliceSampler", "SliceState", "SliceInfo"]

Latent = Dict[str, jnp.ndarray]


class SliceState(NamedTuple):
    """Explicit slice-sampler state.

    Cache invariant (the ``MHState`` contract, rwm.py): ``log_prob`` is
    only valid for the target the state was last advanced under; ``init``
    fills it with a NaN sentinel and ``sample`` re-evaluates whenever the
    sentinel is present. Call :meth:`invalidate_cache` after re-targeting
    a restored state.
    """

    q: Latent  # position: chain_axes + data_axes
    log_prob: jnp.ndarray  # [chain_shape] cached log joint at q
    t: jnp.ndarray  # iteration counter (int32)
    width: jnp.ndarray  # [D] per-coordinate interval widths
    ewmv_t: jnp.ndarray  # EW variance accumulator (width adaptation)
    ewmv_mean: jnp.ndarray  # [1, D]
    ewmv_var: jnp.ndarray  # [1, D]

    def invalidate_cache(self) -> "SliceState":
        """Mark the density cache stale (NaN sentinel)."""
        return self._replace(
            log_prob=jnp.full_like(self.log_prob, float("nan"))
        )


class SliceInfo(NamedTuple):
    """Per-iteration statistics."""

    samples: Latent
    log_prob: jnp.ndarray  # [chain_shape] log joint at the new position
    width: jnp.ndarray  # [D] (post-adaptation) widths
    stuck_fraction: jnp.ndarray  # scalar: coordinate updates that
    #                              exhausted max_shrinks this sweep


def _flat_spec(q: Latent, n_chain_dims: int):
    """(names, data_shapes, sizes, D) for the sorted-name coordinate
    layout shared by flatten/unflatten."""
    names = sorted(q.keys())
    data_shapes = [q[n].shape[n_chain_dims:] for n in names]
    sizes = [int(np.prod(s, dtype=np.int64)) for s in data_shapes]
    return names, data_shapes, sizes, int(sum(sizes))


class SliceSampler:
    """Neal (2003) coordinate-wise slice sampler with stepping-out and
    shrinkage. Gradient-free; every chain moves every sweep (no MH
    rejection). See the module docstring for the TPU mapping.

    :param width: initial interval width — a positive float shared by all
        coordinates, or a dict mapping latent names to floats/arrays
        (broadcast over that latent's data axes).
    :param max_stepouts: total interval-expansion budget ``m`` per
        coordinate update, split randomly between the two ends (Neal's
        reversibility-preserving cap).
    :param max_shrinks: shrinkage-loop bound; exhausted -> the coordinate
        keeps its current value (reported via ``stuck_fraction``).
    :param adapt_width: when True, ``sample(..., adapt=True)`` /
        ``run(..., n_adapt=k)`` self-tune per-coordinate widths to
        ``width_mult * std`` from an EW moving variance of the draws.
    :param width_decay: EW decay of the variance accumulator.
    :param width_mult: multiple of the posterior std used as the width.
    """

    def __init__(
        self,
        width: Union[float, Dict[str, jnp.ndarray]] = 1.0,
        max_stepouts: int = 8,
        max_shrinks: int = 32,
        adapt_width: bool = False,
        width_decay: float = 0.99,
        width_mult: float = 2.0,
    ):
        if isinstance(width, dict):
            for name, v in width.items():
                if not np.all(np.asarray(v) > 0.0):
                    raise ValueError(
                        "width[{!r}] must be positive everywhere (a zero "
                        "width silently freezes that coordinate)."
                        .format(name)
                    )
        elif not float(width) > 0.0:
            raise ValueError("width must be positive.")
        self._width = width
        self._max_stepouts = int(max_stepouts)
        self._max_shrinks = int(max_shrinks)
        if self._max_stepouts < 1 or self._max_shrinks < 1:
            raise ValueError("max_stepouts/max_shrinks must be >= 1.")
        self._adapt = bool(adapt_width)
        self._decay = float(width_decay)
        self._mult = float(width_mult)

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, n_chain_dims: int) -> SliceState:
        """Create the initial state from positions of shape
        ``chain_axes + data_axes`` (the ``HMC.init`` chain-shape
        convention). The density cache fills lazily on first ``sample``.
        """
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        if not isinstance(n_chain_dims, (int, np.integer)):
            raise TypeError("n_chain_dims must be a Python int.")
        n_chain_dims = int(n_chain_dims)
        names, data_shapes, sizes, total = _flat_spec(q, n_chain_dims)
        any_leaf = q[names[0]]
        chain_shape = any_leaf.shape[:n_chain_dims]
        for n in names:
            if q[n].shape[:n_chain_dims] != chain_shape:
                raise ValueError(
                    "All latents must share the chain shape; {!r} has "
                    "{} vs {}.".format(
                        n, q[n].shape[:n_chain_dims], chain_shape
                    )
                )
        dtype = jnp.result_type(*[v.dtype for v in q.values()])
        if isinstance(self._width, dict):
            missing = set(names) - set(self._width)
            if missing:
                raise ValueError(
                    "width dict is missing latents: {}.".format(
                        sorted(missing))
                )
            parts = [
                jnp.broadcast_to(
                    jnp.asarray(self._width[n], dtype), shape
                ).reshape(size)
                for n, shape, size in zip(names, data_shapes, sizes)
            ]
            width = jnp.concatenate(parts) if parts else jnp.zeros(0, dtype)
        else:
            width = jnp.full((total,), float(self._width), dtype)
        return SliceState(
            q=q,
            log_prob=jnp.full(chain_shape, float("nan"), dtype),
            t=jnp.zeros((), jnp.int32),
            width=width,
            ewmv_t=jnp.zeros((), dtype),
            ewmv_mean=jnp.zeros((1, total), dtype),
            ewmv_var=jnp.ones((1, total), dtype),
        )

    # ------------------------------------------------------------------ #
    def sample(self, meta_bn, observed, state: SliceState, key, adapt=None):
        """One full coordinate sweep over all chains. Pure; scan-safe.

        :param adapt: traced/None bool gating width adaptation (defaults
            to the constructor's ``adapt_width``).
        :return: ``(new_state, SliceInfo)``.
        """
        log_posterior = make_log_joint_fn(meta_bn, observed)
        q = state.q
        lp_dtype = jax.eval_shape(log_posterior, q).dtype
        chain_ndim = state.log_prob.ndim
        chain_shape = state.log_prob.shape
        names, data_shapes, sizes, total = _flat_spec(q, chain_ndim)
        dtype = state.width.dtype

        def flatten(qq):
            parts = [
                qq[n].astype(dtype).reshape(chain_shape + (s,))
                for n, s in zip(names, sizes)
            ]
            return jnp.concatenate(parts, axis=-1)

        def unflatten(flat):
            out, off = {}, 0
            for n, shape, s in zip(names, data_shapes, sizes):
                out[n] = (
                    flat[..., off:off + s]
                    .reshape(chain_shape + shape)
                    .astype(q[n].dtype)
                )
                off += s
            return out

        def lp_at(flat):
            return log_posterior(unflatten(flat)).astype(dtype)

        flat0 = flatten(q)
        # (Re-)fill the density cache on the NaN sentinel (MHState
        # contract; a live cache is always finite or -inf because a
        # coordinate only moves to a point ABOVE the slice height).
        cached_lp = state.log_prob.astype(lp_dtype)
        lp0 = jax.lax.cond(
            jnp.any(jnp.isnan(cached_lp)),
            lambda: log_posterior(q).astype(lp_dtype),
            lambda: cached_lp,
        ).astype(dtype)

        m = self._max_stepouts
        n_shrinks = self._max_shrinks

        def update_coord(carry, j):
            flat, lp, k = carry
            k, k_y, k_pos, k_split, k_shrink = jax.random.split(k, 5)
            w = state.width[j]
            x0 = flat[..., j]
            # Slice height: y = lp + log U  (log of a uniform under the
            # density at the current point; Neal 2003 eq. 7). Open-interval
            # uniform so y can never be exactly -inf.
            y = lp + jnp.log(
                open_interval_standard_uniform(k_y, chain_shape, dtype)
            )
            # Initial interval randomly positioned around x0.
            u = jax.random.uniform(k_pos, chain_shape, dtype=dtype)
            left = x0 - u * w
            right = left + w
            # Randomized expansion budget split (reversibility under the
            # cap): J expansions left, m-1-J right.
            j_budget = jax.random.randint(k_split, chain_shape, 0, m)
            k_budget = (m - 1) - j_budget

            def still_out(bound, budget_left):
                return jnp.logical_and(lp_at(
                    flat.at[..., j].set(bound)) > y, budget_left > 0)

            # Carried active flags: the cond tests flags computed in the
            # body (2 density evals/iteration, not 4 — lp_at dominates).
            # Once a chain stops expanding an end it never resumes, so
            # AND-ing with the previous flag preserves the semantics.
            def stepout(val):
                left, right, jb, kb, go_l, go_r = val
                left = jnp.where(go_l, left - w, left)
                right = jnp.where(go_r, right + w, right)
                jb = jb - go_l.astype(jb.dtype)
                kb = kb - go_r.astype(kb.dtype)
                go_l = jnp.logical_and(go_l, still_out(left, jb))
                go_r = jnp.logical_and(go_r, still_out(right, kb))
                return left, right, jb, kb, go_l, go_r

            def stepout_cond(val):
                go_l, go_r = val[4], val[5]
                return jnp.any(jnp.logical_or(go_l, go_r))

            left, right, _, _, _, _ = jax.lax.while_loop(
                stepout_cond, stepout,
                (left, right, j_budget, k_budget,
                 still_out(left, j_budget), still_out(right, k_budget)),
            )

            # Shrinkage: draw uniformly on (L, R); accept above the slice,
            # else shrink the violated end toward x0 (Neal 2003 Fig. 5).
            def shrink_cond(val):
                _, _, _, _, accepted, _, count = val
                return jnp.logical_and(
                    count < n_shrinks, jnp.logical_not(jnp.all(accepted))
                )

            def shrink(val):
                left, right, x, lp_x, accepted, kk, count = val
                kk, k_u = jax.random.split(kk)
                u = jax.random.uniform(k_u, chain_shape, dtype=dtype)
                cand = left + u * (right - left)
                lp_c = lp_at(flat.at[..., j].set(cand))
                ok = lp_c > y
                newly = jnp.logical_and(ok, jnp.logical_not(accepted))
                x = jnp.where(newly, cand, x)
                lp_x = jnp.where(newly, lp_c, lp_x)
                bad = jnp.logical_not(jnp.logical_or(ok, accepted))
                left = jnp.where(jnp.logical_and(bad, cand < x0), cand, left)
                right = jnp.where(
                    jnp.logical_and(bad, cand >= x0), cand, right
                )
                return (
                    left, right, x, lp_x,
                    jnp.logical_or(accepted, ok), kk, count + 1,
                )

            init = (
                left, right, x0, lp,
                jnp.zeros(chain_shape, bool), k_shrink,
                jnp.zeros((), jnp.int32),
            )
            _, _, x1, lp1, accepted, _, _ = jax.lax.while_loop(
                shrink_cond, shrink, init
            )
            flat = flat.at[..., j].set(x1)
            stuck = jnp.mean(
                jnp.logical_not(accepted).astype(dtype)
            )
            return (flat, lp1, k), stuck

        (flat1, lp1, _), stuck = jax.lax.scan(
            update_coord, (flat0, lp0, key), jnp.arange(total)
        )
        q1 = unflatten(flat1)

        gate = self._adapt if adapt is None else adapt
        flat2d = flat1.reshape((-1, total))
        ewmv_t, ewmv_mean, ewmv_var = ewmv_update(
            {"x": flat2d},
            state.ewmv_t,
            {"x": state.ewmv_mean},
            {"x": state.ewmv_var},
            jnp.asarray(gate),
            n_chain_dims=1,
            decay=self._decay,
        )
        width = jnp.where(
            jnp.asarray(gate),
            self._mult
            * jnp.sqrt(jnp.maximum(ewmv_var["x"][0], 1e-20)),
            state.width,
        ).astype(dtype)

        new_state = SliceState(
            q=q1,
            # The cache lives in the DENSITY dtype (MHState convention,
            # rwm.py): a mixed-dtype model (f32 latents, f64 likelihood)
            # must keep the scan carry type-stable.
            log_prob=lp1.astype(lp_dtype),
            t=state.t + 1,
            width=width,
            ewmv_t=ewmv_t.astype(dtype),
            ewmv_mean=ewmv_mean["x"].astype(dtype),
            ewmv_var=ewmv_var["x"].astype(dtype),
        )
        info = SliceInfo(
            samples=q1,
            log_prob=new_state.log_prob,
            width=width,
            stuck_fraction=jnp.mean(stuck) if total else jnp.zeros((), dtype),
        )
        return new_state, info

    # ------------------------------------------------------------------ #
    _VALID_FIELDS = ("samples", "log_prob", "width", "stuck_fraction")

    def run(
        self,
        meta_bn,
        observed,
        state: SliceState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect: bool = True,
        collect_fields=("samples", "log_prob"),
        thinning: int = 1,
    ):
        """Run ``n_iters`` sweeps on-device via the shared scan driver.

        Width adaptation is gated on the PERSISTED counter
        ``state.t < n_adapt`` (the ``HMC.run`` convention): a resumed
        state whose ``t`` already passed ``n_adapt`` will not re-adapt.

        :return: ``(final_state, {field: stacked} or None)``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )
        # Align the cache dtype to the model's log-joint (mixed-dtype
        # models) so the scan carry is type-stable from iteration 0.
        lp_dtype = jax.eval_shape(
            make_log_joint_fn(meta_bn, observed), state.q
        ).dtype
        state = state._replace(log_prob=state.log_prob.astype(lp_dtype))

        def pick(info):
            full = {
                "samples": info.samples,
                "log_prob": info.log_prob,
                "width": info.width,
                "stuck_fraction": info.stuck_fraction,
            }
            return {f: full[f] for f in collect_fields}

        adapt_on = self._adapt and n_adapt > 0

        def one(st, k):
            k, sub = jax.random.split(k)
            gate = st.t < n_adapt if adapt_on else jnp.asarray(False)
            st2, info = self.sample(meta_bn, observed, st, sub, adapt=gate)
            return st2, k, info

        return scan_run_driver(
            one, pick, state, key, n_iters, collect, thinning
        )
