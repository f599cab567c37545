"""No-U-Turn Sampler (NUTS) with multinomial trajectory sampling.

Beyond the reference: ``/root/reference/zhusuan`` ships only fixed-length
HMC (zhusuan/hmc.py) — trajectory length is a hyperparameter the user
must tune per model. NUTS (Hoffman & Gelman 2014) removes it by doubling
the trajectory until the momentum-sum U-turn criterion fires, with
multinomial sampling over the visited leaves (Betancourt 2017) instead
of slice sampling.

TPU-native design:

- The textbook algorithm is recursive; recursion neither traces nor
  vectorizes under XLA. This is the ITERATIVE formulation: a
  ``lax.while_loop`` over tree doublings, each doubling a
  ``lax.while_loop`` over single leapfrog leaves, with the per-level
  U-turn checks reconstructed from O(max_tree_depth) checkpoints. For a
  leaf index ``i`` inside a subtree, every complete binary subtree
  ending at ``i`` has its left edge in a stack of live checkpoints; the
  stack slot of an even leaf is ``popcount(i >> 1)`` and an odd leaf
  must check the top ``trailing_ones(i)`` slots — pure integer
  bookkeeping on ``lax.population_count``, no data-dependent shapes.
- One transition is written per-chain on a RAVELED latent vector and
  ``vmap``-ed over the flattened chain axes; XLA's batching rule turns
  the per-chain while-loops into masked lock-step execution, so chains
  that terminate early simply mask out — the TPU-vectorized semantics
  of variable-length trajectories. (For throughput-bound many-chain
  workloads where this masking tax matters, :class:`~.ChEESHMC` is the
  cross-chain-synchronous alternative; NUTS is the robustness
  workhorse for hard geometries at moderate chain counts.)
- U-turn checks against all checkpoint slots are evaluated VECTORIZED
  (a ``[max_depth, dim]`` contraction masked to the live slot range)
  rather than an inner loop — depth is ~10, so this is one small
  VPU-friendly reduction per leaf.
- On TPU with f32 state and shared mass, the whole transition runs as
  ONE fused Pallas kernel per chain-block (``ops/nuts_step.py``, default
  via ``experimental_fused_step="auto"``): edges, proposals, and the
  checkpoint stacks stay VMEM-resident for the entire tree, and
  momentum/multinomial draws come from the hardware PRNG. Two variants,
  routed on ``max_tree_depth``: fully UNROLLED at depth <= 6 (all
  checkpoint indexing becomes compile-time constants; 5.6x the vmapped
  while-loop path at 4096 chains, PERF.md round 4/5) and LOOPED at
  depths 7-12 — covering the class default 10 — where each subtree's
  leaves run under an early-exit ``lax.while_loop`` with masked
  checkpoint slots (5.0x the scan path at depth 10, PERF.md round 5).
  Same distribution, different random stream (the fused-HMC contract).

Adaptation reuses the shared machinery: Nesterov dual averaging on the
mean leaf-acceptance statistic (base.dual_averaging_update; reference
hmc.py:89-112) and EW moving-variance diagonal mass adaptation
(base.ewmv_update; reference hmc.py:115-159). The state is the same
:class:`~zhusuan_tpu.mcmc.hmc.HMCState` pytree, so checkpointing,
sharding helpers, and ``warmup_run``-style gating transfer unchanged.

Correctness is validated exactly, not just on moments: the Geweke
joint-distribution harness (zhusuan_tpu/testing.py) runs NUTS as a
frozen kernel in tests/test_geweke.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import (
    dual_averaging_update,
    ewmv_update,
    make_log_joint_fn,
)
from zhusuan_tpu.mcmc.hmc import HMCState

__all__ = ["NUTS", "NUTSInfo"]

Latent = Dict[str, jnp.ndarray]


class NUTSInfo(NamedTuple):
    """Per-iteration statistics (superset of ``HMCInfo``'s role with the
    tree diagnostics every NUTS user monitors)."""

    samples: Latent
    acceptance_rate: jnp.ndarray  # mean leaf-acceptance statistic, per chain
    updated_step_size: jnp.ndarray  # scalar
    log_prob: jnp.ndarray  # log joint at the new position, per chain
    depth: jnp.ndarray  # tree depth reached, per chain (int32)
    n_leapfrogs: jnp.ndarray  # leapfrog steps taken, per chain (int32)
    divergent: jnp.ndarray  # bool, per chain
    turning: jnp.ndarray  # bool: ended by U-turn (vs max depth), per chain
    energy: jnp.ndarray  # Hamiltonian of the selected draw, per chain


class _Flattener:
    """Ravel a latent dict's data axes into one ``[dim]`` vector per
    chain (sorted-name order — the library's reproducibility contract,
    base.tree_normal_like)."""

    def __init__(self, q: Latent, n_chain_dims: int):
        self.names = sorted(q.keys())
        self.data_shapes = {
            k: q[k].shape[n_chain_dims:] for k in self.names
        }
        self.sizes = {
            k: int(np.prod(self.data_shapes[k], dtype=np.int64))
            for k in self.names
        }
        self.dtypes = {k: q[k].dtype for k in self.names}
        self.dtype = jnp.result_type(*[q[k].dtype for k in self.names])
        self.dim = sum(self.sizes.values())

    def ravel(self, tree: Latent, lead_shape) -> jnp.ndarray:
        """``lead_shape`` is the already-flattened leading shape (e.g.
        ``(C,)`` for chain-stacked input, ``()`` per chain)."""
        parts = [
            jnp.reshape(tree[k], lead_shape + (self.sizes[k],)).astype(
                self.dtype
            )
            for k in self.names
        ]
        return jnp.concatenate(parts, axis=-1)

    def unravel(self, flat: jnp.ndarray, lead_shape) -> Latent:
        out, start = {}, 0
        for k in self.names:
            piece = flat[..., start:start + self.sizes[k]]
            out[k] = jnp.reshape(
                piece, lead_shape + self.data_shapes[k]
            ).astype(self.dtypes[k])
            start += self.sizes[k]
        return out


def _trailing_ones(i):
    """Number of trailing one-bits of int32 ``i`` (= the count of
    complete binary subtrees ending at leaf ``i``)."""
    n = i + 1
    return jax.lax.population_count((n & -n) - 1)


class _TreeCarry(NamedTuple):
    """Whole-trajectory state across doublings (one chain)."""

    key: jnp.ndarray
    q_left: jnp.ndarray
    p_left: jnp.ndarray
    g_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    g_right: jnp.ndarray
    q_prop: jnp.ndarray  # current multinomial draw from the trajectory
    lp_prop: jnp.ndarray
    h_prop: jnp.ndarray
    logw: jnp.ndarray  # logsumexp of -H over all trajectory leaves
    psum: jnp.ndarray  # momentum sum over all trajectory leaves
    depth: jnp.ndarray  # int32 doublings completed
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_alpha: jnp.ndarray  # accumulated leaf acceptance statistics
    n_alpha: jnp.ndarray  # leaves visited
    n_leap: jnp.ndarray  # leapfrog steps taken


class _SubtreeCarry(NamedTuple):
    """One subtree build (one chain, one doubling)."""

    key: jnp.ndarray
    i: jnp.ndarray  # leaf index within the subtree
    q: jnp.ndarray  # edge state being advanced
    p: jnp.ndarray
    g: jnp.ndarray
    q_prop: jnp.ndarray
    lp_prop: jnp.ndarray
    h_prop: jnp.ndarray
    logw: jnp.ndarray  # logsumexp of -H over subtree leaves so far
    psum: jnp.ndarray  # momentum sum over subtree leaves so far
    ckpt_p: jnp.ndarray  # [max_depth, dim] left-edge momenta
    ckpt_psum: jnp.ndarray  # [max_depth, dim] psum BEFORE each checkpoint
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_alpha: jnp.ndarray
    lp_last: jnp.ndarray  # log prob at the current edge (for info)


class NUTS:
    """No-U-Turn Sampler with multinomial trajectory sampling.

    Drop-in companion to :class:`~zhusuan_tpu.mcmc.hmc.HMC` (same
    ``init``/``sample``/``run`` surface, same state pytree): instead of a
    fixed ``n_leapfrogs``, each iteration doubles its leapfrog trajectory
    until the generalized U-turn criterion (Betancourt 2017: the
    trajectory's momentum sum turns against either edge velocity) or
    ``max_tree_depth`` is reached, then draws the next position
    multinomially from the visited leaves with biased progressive
    sampling toward the newer half — no trajectory-length tuning.

    :param step_size: initial leapfrog step size.
    :param max_tree_depth: maximum number of doublings per iteration
        (trajectories are at most ``2**max_tree_depth - 1`` new leaves).
    :param adapt_step_size: None disables the dual-averaging machinery;
        a bool enables it and sets the default runtime gate (override per
        call — the :class:`~zhusuan_tpu.mcmc.hmc.HMC` contract).
    :param target_acceptance_rate: dual-averaging target on the mean
        leaf-acceptance statistic (Stan's default 0.8 regime).
    :param gamma, t0, kappa: dual-averaging hyperparameters (Hoffman &
        Gelman 2014; reference hmc.py:89-112).
    :param adapt_mass: None disables mass adaptation; a bool enables the
        shared EW moving-variance machinery (requires ``adapt_step_size``;
        reference hmc.py:270-272).
    :param mass_collect_iters: iterations before the adapted mass is used.
    :param mass_decay: EW variance decay.
    :param max_delta_energy: energy-error divergence threshold
        (Stan's 1000): a leaf with ``H - H0 > max_delta_energy`` ends the
        trajectory and is flagged in ``NUTSInfo.divergent``.
    """

    def __init__(
        self,
        step_size: float = 0.1,
        max_tree_depth: int = 10,
        adapt_step_size: Optional[bool] = None,
        target_acceptance_rate: float = 0.8,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
        adapt_mass: Optional[bool] = None,
        mass_collect_iters: int = 10,
        mass_decay: float = 0.99,
        max_delta_energy: float = 1000.0,
        experimental_fused_step="auto",
    ):
        if not float(step_size) > 0.0:
            raise ValueError("step_size must be positive.")
        if int(max_tree_depth) < 1:
            raise ValueError("max_tree_depth must be >= 1.")
        if adapt_mass is not None and adapt_step_size is None:
            raise ValueError(
                "adapt_mass requires adapt_step_size (reference "
                "hmc.py:270-272)."
            )
        self.init_step_size = float(step_size)
        self.max_tree_depth = int(max_tree_depth)
        self.adapt_step_size = adapt_step_size
        self.target_acceptance_rate = float(target_acceptance_rate)
        if not 0.0 < self.target_acceptance_rate < 1.0:
            raise ValueError("target_acceptance_rate must be in (0, 1).")
        self.gamma, self.t0, self.kappa = (
            float(gamma), float(t0), float(kappa),
        )
        self.adapt_mass = adapt_mass
        self.mass_collect_iters = (
            int(mass_collect_iters) if adapt_mass is not None else 0
        )
        self.mass_decay = float(mass_decay)
        self.max_delta_energy = float(max_delta_energy)
        if experimental_fused_step not in (True, False, "auto"):
            raise ValueError(
                "experimental_fused_step must be True, False, or 'auto'.")
        self.experimental_fused_step = experimental_fused_step
        self.mu = float(np.log(10.0 * self.init_step_size))

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, n_chain_dims: Optional[int] = None,
             log_joint=None, observed=None) -> HMCState:
        """Create the initial state (an :class:`HMCState` — NUTS shares
        HMC's state pytree, so checkpoints and sharding helpers
        transfer) from initial positions of shape
        ``chain_axes + data_axes``."""
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        if n_chain_dims is None:
            if log_joint is None:
                raise ValueError(
                    "Provide either n_chain_dims or log_joint (+observed) "
                    "so the chain rank can be inferred."
                )
            log_post = make_log_joint_fn(log_joint, observed or {})
            n_chain_dims = len(jax.eval_shape(log_post, q).shape)
        n_chain_dims = int(n_chain_dims)
        dtype = jnp.result_type(*[v.dtype for v in q.values()])
        data_shapes = {
            k: (1,) * n_chain_dims + v.shape[n_chain_dims:]
            for k, v in q.items()
        }
        zeros = {k: jnp.zeros(s, dtype) for k, s in data_shapes.items()}
        ones = {k: jnp.ones(s, dtype) for k, s in data_shapes.items()}
        return HMCState(
            q=q,
            t=jnp.zeros((), jnp.int32),
            step_size=jnp.asarray(self.init_step_size, dtype),
            da_step=jnp.zeros((), dtype),
            h_bar=jnp.zeros((), dtype),
            log_epsilon_bar=jnp.zeros((), dtype),
            ewmv_t=jnp.zeros((), dtype),
            ewmv_mean=zeros,
            ewmv_var=zeros,
            mass=ones,
        )

    # ------------------------------------------------------------------ #
    # per-chain transition on the raveled latent                         #
    # ------------------------------------------------------------------ #
    def _uturn(self, psum, p_left, p_right, inv_mass):
        """Generalized U-turn criterion: the trajectory momentum sum
        turned against either edge velocity."""
        v_left = p_left * inv_mass
        v_right = p_right * inv_mass
        return jnp.logical_or(
            jnp.dot(psum, v_left) <= 0.0, jnp.dot(psum, v_right) <= 0.0
        )

    def _build_subtree(self, vag, key, q0, p0, g0, n_leaf, eps, inv_mass,
                       h0):
        """Advance ``n_leaf`` leapfrog leaves from edge ``(q0, p0, g0)``
        with SIGNED step ``eps``, running the iterative per-level U-turn
        checks, progressive multinomial sampling, and divergence guard.

        Leapfrog with a negative step is exactly the inverse of the
        positive-step map, so stored momenta stay forward-time-consistent
        and no sign flips are needed in the criterion.

        :return: ``(edge (q,p,g), (q_prop, lp_prop, h_prop), logw, psum,
            turning, diverging, sum_alpha, n_steps, lp_edge)``.
        """
        D = self.max_tree_depth
        dim = q0.shape[0]
        dt = q0.dtype
        # Density-derived quantities (lp, H, weights, alpha) live in the
        # dtype of ``h0`` — the promotion of density and latent dtypes —
        # so the while-loop carry stays type-stable for mixed-dtype
        # models (f32 density under an x64 latent and vice versa).
        ldt = h0.dtype
        neg_inf = jnp.asarray(-jnp.inf, ldt)

        def cond(c: _SubtreeCarry):
            return (c.i < n_leaf) & ~c.turning & ~c.diverging

        def body(c: _SubtreeCarry):
            # --- one leapfrog step (grad carried from the edge) -------- #
            p_half = c.p + 0.5 * eps * c.g
            q_new = c.q + eps * p_half * inv_mass
            lp_new, g_new = vag(q_new)
            lp_new = lp_new.astype(ldt)
            p_new = p_half + 0.5 * eps * g_new

            h = -lp_new + 0.5 * jnp.dot(p_new * p_new, inv_mass)
            delta = h - h0
            div = jnp.logical_or(
                jnp.isnan(delta), delta > self.max_delta_energy
            )
            # Leaf acceptance statistic (dual-averaging signal): E-FMI
            # style min(1, exp(H0 - H)); NaN -> 0.
            alpha = jnp.where(
                jnp.isnan(delta), 0.0, jnp.minimum(1.0, jnp.exp(-delta))
            )

            # --- progressive multinomial sampling within the subtree --- #
            w = jnp.where(div, neg_inf, -h)
            logw_new = jnp.logaddexp(c.logw, w)
            key, sub = jax.random.split(c.key)
            take = jnp.log(
                jax.random.uniform(sub, dtype=dt)
            ) < w - logw_new
            q_prop = jnp.where(take, q_new, c.q_prop)
            lp_prop = jnp.where(take, lp_new, c.lp_prop)
            h_prop = jnp.where(take, h, c.h_prop)

            # --- iterative U-turn bookkeeping -------------------------- #
            i = c.i
            even = (i % 2) == 0
            slot = jax.lax.population_count(i >> 1)
            # Even leaf: it is the left edge of the subtrees starting
            # here — checkpoint (momentum, psum-before) at its stack slot.
            onehot = (
                jnp.arange(D, dtype=jnp.int32) == slot
            )[:, None]
            store = even & ~div
            ckpt_p = jnp.where(store & onehot, p_new[None, :], c.ckpt_p)
            ckpt_psum = jnp.where(
                store & onehot, c.psum[None, :], c.ckpt_psum
            )
            psum_new = c.psum + p_new

            # Odd leaf: check every complete subtree ending here — the
            # top trailing_ones(i) checkpoints — vectorized over slots.
            t_ones = _trailing_ones(i)
            idx_max = slot  # popcount(i >> 1) for odd i
            idx_min = idx_max - t_ones + 1
            slots = jnp.arange(D, dtype=jnp.int32)
            live = (slots >= idx_min) & (slots <= idx_max)
            sub_psum = psum_new[None, :] - ckpt_psum  # [D, dim]
            v_new = p_new * inv_mass
            turn_s = jnp.logical_or(
                jnp.sum(sub_psum * (ckpt_p * inv_mass[None, :]), axis=1)
                <= 0.0,
                jnp.sum(sub_psum * v_new[None, :], axis=1) <= 0.0,
            )
            turning = ~even & ~div & jnp.any(live & turn_s)

            return _SubtreeCarry(
                key=key, i=i + 1, q=q_new, p=p_new, g=g_new,
                q_prop=q_prop, lp_prop=lp_prop, h_prop=h_prop,
                logw=logw_new, psum=psum_new,
                ckpt_p=ckpt_p, ckpt_psum=ckpt_psum,
                turning=turning, diverging=div,
                sum_alpha=c.sum_alpha + alpha, lp_last=lp_new,
            )

        c0 = _SubtreeCarry(
            key=key,
            i=jnp.zeros((), jnp.int32),
            q=q0, p=p0, g=g0,
            q_prop=q0, lp_prop=jnp.zeros((), ldt),
            h_prop=jnp.zeros((), ldt),
            logw=neg_inf,
            psum=jnp.zeros((dim,), dt),
            ckpt_p=jnp.zeros((D, dim), dt),
            ckpt_psum=jnp.zeros((D, dim), dt),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_alpha=jnp.zeros((), ldt),
            lp_last=jnp.zeros((), ldt),
        )
        c = jax.lax.while_loop(cond, body, c0)
        return (
            (c.q, c.p, c.g),
            (c.q_prop, c.lp_prop, c.h_prop),
            c.logw, c.psum, c.turning, c.diverging, c.sum_alpha, c.i,
            c.lp_last,
        )

    def _transition_one(self, vag, q0, key, eps, inv_mass):
        """One NUTS transition for ONE chain on the raveled latent.

        :param vag: ``q_flat -> (log_prob, grad)``.
        :return: ``(q_new, lp_new, h_new, accept_stat, depth, n_leap,
            turning, divergent)``.
        """
        dt = q0.dtype
        key, key_mom = jax.random.split(key)
        p0 = jax.random.normal(key_mom, q0.shape, dt) / jnp.sqrt(inv_mass)
        lp0, g0 = vag(q0)
        h0 = -lp0 + 0.5 * jnp.dot(p0 * p0, inv_mass)
        ldt = h0.dtype
        lp0 = lp0.astype(ldt)

        def cond(c: _TreeCarry):
            return (
                (c.depth < self.max_tree_depth) & ~c.turning & ~c.diverging
            )

        def body(c: _TreeCarry):
            key, key_dir, key_sub, key_take = jax.random.split(c.key, 4)
            go_right = jax.random.bernoulli(key_dir)
            n_leaf = jnp.int32(1) << c.depth
            eps_signed = jnp.where(go_right, eps, -eps)
            q_e = jnp.where(go_right, c.q_right, c.q_left)
            p_e = jnp.where(go_right, c.p_right, c.p_left)
            g_e = jnp.where(go_right, c.g_right, c.g_left)

            (edge, prop, logw_sub, psum_sub, sub_turn, sub_div,
             sum_alpha_inc, n_steps, _) = self._build_subtree(
                vag, key_sub, q_e, p_e, g_e, n_leaf, eps_signed,
                inv_mass, h0,
            )
            q_n, p_n, g_n = edge
            q_ps, lp_ps, h_ps = prop

            stop = jnp.logical_or(sub_turn, sub_div)
            # Biased progressive sampling toward the NEW subtree
            # (Betancourt 2017) — only when the subtree is valid.
            take = jnp.logical_and(
                ~stop,
                jnp.log(jax.random.uniform(key_take, dtype=q0.dtype))
                < logw_sub - c.logw,
            )
            q_prop = jnp.where(take, q_ps, c.q_prop)
            lp_prop = jnp.where(take, lp_ps, c.lp_prop)
            h_prop = jnp.where(take, h_ps, c.h_prop)
            logw = jnp.where(stop, c.logw, jnp.logaddexp(c.logw, logw_sub))
            psum = jnp.where(stop, c.psum, c.psum + psum_sub)

            upd = lambda new, old: jnp.where(stop, old, new)
            q_left = jnp.where(go_right, c.q_left, upd(q_n, c.q_left))
            p_left = jnp.where(go_right, c.p_left, upd(p_n, c.p_left))
            g_left = jnp.where(go_right, c.g_left, upd(g_n, c.g_left))
            q_right = jnp.where(go_right, upd(q_n, c.q_right), c.q_right)
            p_right = jnp.where(go_right, upd(p_n, c.p_right), c.p_right)
            g_right = jnp.where(go_right, upd(g_n, c.g_right), c.g_right)

            # Full-tree U-turn check after a successful merge (the one
            # new check the recursive algorithm performs at this level).
            merged_turn = jnp.logical_and(
                ~stop,
                self._uturn(psum, p_left, p_right, inv_mass),
            )
            return _TreeCarry(
                key=key,
                q_left=q_left, p_left=p_left, g_left=g_left,
                q_right=q_right, p_right=p_right, g_right=g_right,
                q_prop=q_prop, lp_prop=lp_prop, h_prop=h_prop,
                logw=logw, psum=psum,
                depth=c.depth + 1,
                turning=jnp.logical_or(sub_turn, merged_turn),
                diverging=sub_div,
                sum_alpha=c.sum_alpha + sum_alpha_inc,
                n_alpha=c.n_alpha + n_steps,
                n_leap=c.n_leap + n_steps,
            )

        c0 = _TreeCarry(
            key=key,
            q_left=q0, p_left=p0, g_left=g0,
            q_right=q0, p_right=p0, g_right=g0,
            q_prop=q0, lp_prop=lp0, h_prop=h0,
            logw=-h0,
            psum=p0,
            depth=jnp.zeros((), jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_alpha=jnp.zeros((), ldt),
            n_alpha=jnp.zeros((), jnp.int32),
            n_leap=jnp.zeros((), jnp.int32),
        )
        c = jax.lax.while_loop(cond, body, c0)
        accept_stat = c.sum_alpha / jnp.maximum(
            c.n_alpha.astype(ldt), 1.0
        )
        return (
            c.q_prop, c.lp_prop, c.h_prop, accept_stat, c.depth,
            c.n_leap, c.turning, c.diverging,
        )

    # ------------------------------------------------------------------ #
    def _use_fused(self, flat, obs_b, n_chains, meta_bn, obs_f):
        """Eligibility + variant of the fused Pallas transition
        (ops/nuts_step.py): f32 state, shared mass, no per-chain observed
        leaves, VMEM-sized blocks, non-CPU backend (the hardware-PRNG
        primitives have no CPU lowering — silent fallback to the
        interpretable paths, same distribution).

        Returns ``None`` (scan path), ``"unrolled"`` (depth <= 6: the
        fully unrolled whole-tree kernel) or ``"looped"`` (deeper trees
        incl. the default depth 10: doublings unrolled, leaves under an
        early-exit while loop)."""
        if not self.experimental_fused_step:
            return None
        from zhusuan_tpu.mcmc.base import on_cpu_backend

        if on_cpu_backend() or obs_b or flat.dtype != jnp.float32:
            return None
        from zhusuan_tpu.ops.hmc_step import consts_fit_vmem
        from zhusuan_tpu.ops.nuts_step import (
            nuts_looped_supported,
            nuts_step_supported,
        )

        if nuts_step_supported((n_chains, flat.dim), self.max_tree_depth):
            mode = "unrolled"
        elif nuts_looped_supported((n_chains, flat.dim),
                                   self.max_tree_depth):
            mode = "looped"
        else:
            return None

        def lp_one(qf_):
            return make_log_joint_fn(meta_bn, obs_f)(
                flat.unravel(qf_, ()))

        fits = consts_fit_vmem(
            (jax.vmap(jax.value_and_grad(lp_one)),),
            jax.ShapeDtypeStruct(
                (min(128, n_chains), flat.dim), jnp.float32),
        )
        return mode if fits else None

    # ------------------------------------------------------------------ #
    def sample(
        self,
        meta_bn,
        observed,
        state: HMCState,
        key,
        adapt_step_size=None,
        adapt_mass=None,
    ):
        """Run ONE NUTS iteration: pure ``(state, key) -> (state, info)``
        over all chains (jit/scan-safe; the :class:`HMC` contract).

        :param meta_bn: MetaBayesianNet or ``log_joint(obs_dict)``
            callable.
        :param observed: dict of observations.
        :param state: current :class:`HMCState`.
        :param key: PRNG key for this iteration.
        :param adapt_step_size: optional traced bool gating step-size
            adaptation this iteration (default: constructor setting).
        :param adapt_mass: optional traced bool gating mass adaptation.
        :return: ``(new_state, NUTSInfo)``.
        """
        log_post = make_log_joint_fn(meta_bn, observed)
        q = state.q
        chain_shape = jax.eval_shape(log_post, q).shape
        n_chain_dims = len(chain_shape)
        n_chains = int(np.prod(chain_shape, dtype=np.int64))
        flat = _Flattener(q, n_chain_dims)
        new_t = state.t + 1

        # --- mass adaptation (shared EWMV; reference hmc.py:283-305) --- #
        if self.adapt_mass is not None:
            gate_mass = (
                jnp.asarray(adapt_mass)
                if adapt_mass is not None
                else jnp.asarray(self.adapt_mass)
            )
            ewmv_t, ewmv_mean, ewmv_var = ewmv_update(
                state.q, state.ewmv_t, state.ewmv_mean, state.ewmv_var,
                gate_mass, n_chain_dims, self.mass_decay,
            )
            use_adapted = (new_t >= self.mass_collect_iters) & (ewmv_t > 0)
            mass = {
                k: jax.lax.stop_gradient(
                    jnp.where(
                        use_adapted,
                        1.0 / jnp.maximum(ewmv_var[k], 1e-20),
                        jnp.ones_like(ewmv_var[k]),
                    )
                )
                for k in q
            }
        else:
            ewmv_t, ewmv_mean, ewmv_var = (
                state.ewmv_t, state.ewmv_mean, state.ewmv_var
            )
            mass = state.mass

        # inv_mass as a flat [dim] vector (mass leaves are
        # (1,)*n_chain_dims + data_shape — shared across chains).
        inv_mass = 1.0 / flat.ravel(
            {k: mass[k].reshape(mass[k].shape[n_chain_dims:]) for k in q},
            (),
        )

        # Per-chain density on the raveled latent. Under vmap the model
        # sees chain-axis-free latent leaves — the library-wide
        # broadcasting convention. Observed leaves normally carry NO
        # chain axes (one dataset, all chains); when they DO (per-chain
        # conditioning — e.g. the Geweke harness redraws data per
        # chain), the density probed on a chainless latent comes out
        # chain-shaped instead of scalar, and those leaves must be
        # vmapped alongside the latent.
        q_flat = flat.ravel(q, (n_chains,)) if n_chain_dims else (
            flat.ravel(q, ())
        )
        eps = state.step_size.astype(flat.dtype)

        if n_chain_dims:
            probe_shape = jax.eval_shape(
                log_post,
                {k: jnp.zeros(v.shape[n_chain_dims:], v.dtype)
                 for k, v in q.items()},
            ).shape
            obs_b, obs_f = {}, {}
            if probe_shape == ():
                obs_f = observed
            else:
                for k, v in observed.items():
                    va = jnp.asarray(v)
                    if va.shape[:n_chain_dims] == chain_shape:
                        obs_b[k] = va.reshape(
                            (n_chains,) + va.shape[n_chain_dims:]
                        )
                    else:
                        obs_f[k] = v
                if not obs_b:
                    raise ValueError(
                        "The log joint evaluated on a chainless latent "
                        "has shape {} (expected a scalar), but no "
                        "observed leaf carries the chain shape {} to "
                        "vmap over — the model appears to mix chain "
                        "and data axes in a way NUTS cannot split per "
                        "chain.".format(probe_shape, chain_shape)
                    )

            def trans(qf, k, ob):
                log_post_c = make_log_joint_fn(
                    meta_bn, {**obs_f, **ob}
                )

                def vag(q_flat_):
                    def lp(qf_):
                        return log_post_c(flat.unravel(qf_, ()))

                    return jax.value_and_grad(lp)(q_flat_)

                return self._transition_one(vag, qf, k, eps, inv_mass)

            fused_mode = self._use_fused(flat, obs_b, n_chains, meta_bn,
                                         obs_f)
            if fused_mode:
                from zhusuan_tpu.ops.nuts_step import (
                    fused_nuts_transition,
                    fused_nuts_transition_looped,
                )

                def lp_one(qf_):
                    return make_log_joint_fn(meta_bn, obs_f)(
                        flat.unravel(qf_, ()))

                fused_fn = (fused_nuts_transition
                            if fused_mode == "unrolled"
                            else fused_nuts_transition_looped)
                outs = fused_fn(
                    jax.vmap(jax.value_and_grad(lp_one)),
                    q_flat, inv_mass[None, :], eps, key,
                    self.max_tree_depth, self.max_delta_energy,
                )
            else:
                keys = jax.random.split(key, n_chains)
                outs = jax.vmap(trans, in_axes=(0, 0, 0))(
                    q_flat, keys, obs_b)
        else:
            def vag(q_flat_):
                def lp(qf_):
                    return log_post(flat.unravel(qf_, ()))

                return jax.value_and_grad(lp)(q_flat_)

            outs = jax.tree.map(
                lambda x: x[None],
                self._transition_one(vag, q_flat, key, eps, inv_mass),
            )
        (q_new_flat, lp_new, h_new, accept_stat, depth, n_leap, turning,
         divergent) = outs

        lead = chain_shape if n_chain_dims else ()
        q_new = flat.unravel(
            q_new_flat.reshape(lead + (flat.dim,)), lead
        )
        reshape_c = lambda x: x.reshape(lead) if n_chain_dims else x[0]
        lp_new = reshape_c(lp_new)
        h_new = reshape_c(h_new)
        accept_stat = reshape_c(accept_stat)
        depth = reshape_c(depth)
        n_leap = reshape_c(n_leap)
        turning = reshape_c(turning)
        divergent = reshape_c(divergent)

        # --- step-size adaptation (shared dual averaging) -------------- #
        if self.adapt_step_size is not None:
            gate = (
                jnp.asarray(adapt_step_size)
                if adapt_step_size is not None
                else jnp.asarray(self.adapt_step_size)
            )
            step_size, da_step, h_bar, log_eps_bar = dual_averaging_update(
                state.da_step, state.h_bar, state.log_epsilon_bar,
                state.step_size, jnp.mean(accept_stat), gate,
                fresh_start=state.t == 0,
                mu=self.mu, target=self.target_acceptance_rate,
                gamma=self.gamma, t0=self.t0, kappa=self.kappa,
            )
            ss_dtype = state.step_size.dtype
            step_size = step_size.astype(ss_dtype)
            da_step = da_step.astype(state.da_step.dtype)
            h_bar = h_bar.astype(ss_dtype)
            log_eps_bar = log_eps_bar.astype(ss_dtype)
        else:
            step_size, da_step, h_bar, log_eps_bar = (
                state.step_size, state.da_step, state.h_bar,
                state.log_epsilon_bar,
            )

        new_state = HMCState(
            q=q_new,
            t=new_t,
            step_size=step_size,
            da_step=da_step,
            h_bar=h_bar,
            log_epsilon_bar=log_eps_bar,
            ewmv_t=ewmv_t,
            ewmv_mean=ewmv_mean,
            ewmv_var=ewmv_var,
            mass=mass,
        )
        info = NUTSInfo(
            samples=q_new,
            acceptance_rate=accept_stat,
            updated_step_size=step_size,
            log_prob=lp_new,
            depth=depth,
            n_leapfrogs=n_leap,
            divergent=divergent,
            turning=turning,
            energy=h_new,
        )
        return new_state, info

    # ------------------------------------------------------------------ #
    _VALID_FIELDS = (
        "samples", "acceptance_rate", "step_size", "log_prob", "depth",
        "n_leapfrogs", "divergent", "turning", "energy",
    )

    def run(
        self,
        meta_bn,
        observed,
        state: HMCState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect: bool = True,
        collect_fields=("samples", "acceptance_rate", "step_size",
                        "log_prob", "depth", "divergent"),
        thinning: int = 1,
    ):
        """Run ``n_iters`` iterations on-device via ``lax.scan``, with
        adaptation gated on the persisted counter ``state.t < n_adapt``
        and memory-bounded ``thinning`` — the :meth:`HMC.run` contract
        (see hmc.py:764 for the full field/thinning semantics).

        :return: ``(final_state, {field: stacked} or None)``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )
        if int(thinning) < 1:
            raise ValueError("thinning must be >= 1.")
        thinning = int(thinning)

        def pick(info: NUTSInfo):
            full = {
                "samples": info.samples,
                "acceptance_rate": info.acceptance_rate,
                "step_size": info.updated_step_size,
                "log_prob": info.log_prob,
                "depth": info.depth,
                "n_leapfrogs": info.n_leapfrogs,
                "divergent": info.divergent,
                "turning": info.turning,
                "energy": info.energy,
            }
            return {f: full[f] for f in collect_fields}

        adapt_on = self.adapt_step_size is not None and n_adapt > 0

        def one(st, k):
            k, sub = jax.random.split(k)
            # Compile-time-constant False when adaptation is off lets XLA
            # fold the frozen dual-averaging branch (the HMC.run trick).
            gate = st.t < n_adapt if adapt_on else False
            st2, info = self.sample(
                meta_bn, observed, st, sub,
                adapt_step_size=gate, adapt_mass=gate,
            )
            return st2, k, info

        if collect and thinning > 1:
            n_out = n_iters // thinning

            def outer(carry, _):
                st, k = carry
                st, k, info = one(st, k)

                def inner(t, c):
                    st, k, _ = c
                    return one(st, k)

                st, k, info = jax.lax.fori_loop(
                    1, thinning, inner, (st, k, info)
                )
                return (st, k), pick(info)

            (final_state, key), outs = jax.lax.scan(
                outer, (state, key), None, length=n_out
            )
            rem = n_iters - n_out * thinning
            if rem:
                def tail(carry, _):
                    st, k = carry
                    st, k, _ = one(st, k)
                    return (st, k), None

                (final_state, _), _ = jax.lax.scan(
                    tail, (final_state, key), None, length=rem
                )
            return final_state, outs

        def body(carry, _):
            st, k = carry
            st2, k, info = one(st, k)
            return (st2, k), (pick(info) if collect else None)

        (final_state, _), outs = jax.lax.scan(
            body, (state, key), None, length=n_iters
        )
        return final_state, outs
