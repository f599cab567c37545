"""ChEES-HMC: cross-chain adaptive trajectory-length HMC.

Beyond the reference (which ships fixed-``n_leapfrogs`` HMC only,
zhusuan/hmc.py:252-281): ChEES (Hoffman, Radul & Sountsov, AISTATS 2021,
"Adaptive MCMC Scheme for Setting Trajectory Lengths in Hamiltonian Monte
Carlo") tunes the TOTAL integration time by stochastic gradient ascent on
the Change in the Estimator of the Expected Square jump distance:

    ChEES = 1/4 * E[ (||q' - E q'||^2 - ||q - E q||^2)^2 ]

whose gradient w.r.t. integration time uses only per-chain quantities and
two cross-chain means — exactly the statistic a *vectorized* sampler has
for free. This is the TPU-idiomatic alternative to NUTS: NUTS needs
per-chain dynamic tree building (anathema to SIMD/SPMD execution), while
ChEES keeps every chain on the SAME jittered trajectory length, so the
whole state stays one ``[n_chains, ...]`` tensor program. Step size is
tuned by the same Nesterov dual averaging as :class:`~zhusuan_tpu.mcmc.hmc.HMC`
(reference hmc.py:89-112) toward the harmonic-mean acceptance target the
paper recommends.

Design notes (all inside one ``jit``/``scan``):
- trajectory jitter ``h_t`` is the base-2 Halton sequence of the iteration
  counter (bit-reversal of an int32 — pure bit ops), as in the paper;
  all chains share ``h_t * T``, so the leapfrog loop is one
  ``lax.while_loop`` with a traced trip count.
- the ChEES gradient weights each proposal by its MH acceptance
  probability and is clipped through Adam on ``log T`` (paper §4).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import (
    dual_averaging_update,
    get_acceptance_rate_cached,
    make_log_joint_fn,
    tree_random_momentum,
    tree_velocity,
)

__all__ = ["ChEESHMC", "ChEESState", "ChEESInfo"]

Latent = Dict[str, jnp.ndarray]


class ChEESState(NamedTuple):
    """Explicit sampler state (one chain axis: ``q[name]`` is
    ``[n_chains] + data_shape``)."""

    q: Latent
    t: jnp.ndarray  # iteration counter (int32)
    step_size: jnp.ndarray
    # Dual-averaging state for the step size (reference hmc.py:82-87).
    da_step: jnp.ndarray
    h_bar: jnp.ndarray
    log_epsilon_bar: jnp.ndarray
    # Trajectory-length adaptation: Adam on log T.
    log_traj: jnp.ndarray  # log total integration time T
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    adam_t: jnp.ndarray


class ChEESInfo(NamedTuple):
    samples: Latent
    acceptance_rate: jnp.ndarray
    step_size: jnp.ndarray
    trajectory_length: jnp.ndarray
    n_leapfrogs: jnp.ndarray
    log_prob: jnp.ndarray


def _halton2(t):
    """Base-2 radical inverse (Halton sequence) of an int32 counter: the
    bit-reversal of ``t`` as a fraction in [0, 1)."""
    t = t.astype(jnp.uint32)
    t = ((t & jnp.uint32(0x55555555)) << 1) | ((t >> 1) & jnp.uint32(0x55555555))
    t = ((t & jnp.uint32(0x33333333)) << 2) | ((t >> 2) & jnp.uint32(0x33333333))
    t = ((t & jnp.uint32(0x0F0F0F0F)) << 4) | ((t >> 4) & jnp.uint32(0x0F0F0F0F))
    t = ((t & jnp.uint32(0x00FF00FF)) << 8) | ((t >> 8) & jnp.uint32(0x00FF00FF))
    t = (t << 16) | (t >> 16)
    return t.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) * (2.0 ** -32)


class ChEESHMC:
    """Adaptive-trajectory-length HMC (ChEES; beyond-reference feature).

    :param step_size: initial leapfrog step size.
    :param trajectory_length: initial TOTAL integration time ``T`` (the
        per-iteration length is ``h_t * T`` with Halton jitter ``h_t``).
    :param target_acceptance_rate: dual-averaging target; the paper
        recommends the ~0.651 optimum for jittered HMC.
    :param traj_learning_rate: Adam learning rate on ``log T``.
    :param max_leapfrogs: hard cap on per-iteration leapfrog steps (keeps
        a mis-adapted T from running away; paper §4 uses a similar cap).
    :param gamma, t0, kappa: dual-averaging constants (reference
        hmc.py:89-112 values).
    :param experimental_fused_step: ``"auto"`` (default) runs eligible
        shapes (TPU backend, f32, one chain axis, VMEM-sized blocks,
        chain-axis-free observations) through the fused Pallas
        transition (ops/chees_step.py): the whole jittered trajectory
        stays VMEM-resident with a TRACED leapfrog count — measured
        1.3x the scan path at 4096x100 on a cheap elementwise density
        (4.58 vs 6.35 us/leapfrog; PERF.md round 5), more when the
        density is expensive enough that per-leapfrog HBM round-trips
        dominate. Same distribution, different random stream (the
        fused-kernel contract). ``False`` forces the scan path;
        ``True`` asserts eligibility semantics of ``"auto"`` (kept for
        symmetry with HMC/NUTS).
    """

    def __init__(
        self,
        step_size: float = 0.1,
        trajectory_length: float = 1.0,
        target_acceptance_rate: float = 0.651,
        traj_learning_rate: float = 0.05,
        max_leapfrogs: int = 1000,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
        experimental_fused_step="auto",
    ):
        self.init_step_size = float(step_size)
        self.init_traj = float(trajectory_length)
        self.target_acceptance_rate = float(target_acceptance_rate)
        self.traj_lr = float(traj_learning_rate)
        self.max_leapfrogs = int(max_leapfrogs)
        self.gamma = float(gamma)
        self.t0 = float(t0)
        self.kappa = float(kappa)
        if experimental_fused_step not in (True, False, "auto"):
            raise ValueError(
                "experimental_fused_step must be True, False, or 'auto'.")
        self.experimental_fused_step = experimental_fused_step
        self.mu = float(np.log(10.0 * step_size))

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent) -> ChEESState:
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        dtype = jnp.result_type(*[v.dtype for v in q.values()])
        zero = jnp.zeros((), dtype)
        return ChEESState(
            q=q,
            t=jnp.zeros((), jnp.int32),
            step_size=jnp.asarray(self.init_step_size, dtype),
            da_step=zero,
            h_bar=zero,
            log_epsilon_bar=zero,
            log_traj=jnp.asarray(np.log(self.init_traj), dtype),
            adam_m=zero,
            adam_v=zero,
            adam_t=zero,
        )

    # ------------------------------------------------------------------ #
    def _leapfrog_n(self, q, p, eps, n_steps, grad_fn, mass):
        """Standard leapfrog with a TRACED step count: half kick, then
        ``n_steps`` drift+kick pairs with the last kick halved — under
        ``lax.while_loop`` (all chains share ``n_steps``)."""
        g = grad_fn(q)
        p = {k: p[k] + 0.5 * eps * g[k] for k in p}

        def cond(c):
            i, *_ = c
            return i < n_steps - 1

        def body(c):
            i, q, p = c
            v = tree_velocity(p, mass)
            q = {k: q[k] + eps * v[k] for k in q}
            g = grad_fn(q)
            p = {k: p[k] + eps * g[k] for k in p}
            return (i + 1, q, p)

        _, q, p = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), q, p)
        )
        v = tree_velocity(p, mass)
        q = {k: q[k] + eps * v[k] for k in q}
        g = grad_fn(q)
        p = {k: p[k] + 0.5 * eps * g[k] for k in p}
        return q, p

    def _chees_grad(self, q, new_q, new_p, mass, accept_prob, jitter):
        """Per-iteration stochastic gradient of ChEES w.r.t. log T
        (paper Eq. 14): proposals weighted by acceptance probability;
        d(endpoint)/d(time) is the endpoint velocity."""
        # Flatten the latent dict to one [n_chains, D] view.
        flat_q = jnp.concatenate(
            [q[k].reshape(q[k].shape[0], -1) for k in sorted(q)], axis=1
        )
        flat_nq = jnp.concatenate(
            [new_q[k].reshape(new_q[k].shape[0], -1) for k in sorted(q)],
            axis=1,
        )
        nv = tree_velocity(new_p, mass)
        flat_nv = jnp.concatenate(
            [nv[k].reshape(nv[k].shape[0], -1) for k in sorted(q)], axis=1
        )
        w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-12)
        # Proposal-weighted means (paper uses the weighted estimator).
        mean_q = jnp.sum(w[:, None] * flat_q, axis=0, keepdims=True)
        mean_nq = jnp.sum(w[:, None] * flat_nq, axis=0, keepdims=True)
        dq = flat_nq - mean_nq
        jump = jnp.sum(dq * dq, axis=1) - jnp.sum(
            (flat_q - mean_q) ** 2, axis=1
        )
        djump_dt = 2.0 * jnp.sum(dq * flat_nv, axis=1)
        # d/d(logT): dt/dlogT = t = jitter*T; fold T into the Adam scale
        # by using the per-iteration time directly (paper tunes log T).
        grad = jnp.sum(w * jump * djump_dt) * jitter
        # A divergent trajectory puts inf in flat_nq/flat_nv; the rejected
        # chain's weight is 0 but 0 * inf = NaN, which would permanently
        # poison the Adam state. Divergences carry no usable gradient
        # signal — contribute zero instead.
        return jnp.where(jnp.isfinite(grad), grad, jnp.zeros_like(grad))

    # ------------------------------------------------------------------ #
    def sample(self, meta_bn, observed, state: ChEESState, key, adapt=True,
               cache=None):
        """One ChEES-HMC iteration: ``(state, key) -> (state, info)``
        (plus the carried evaluation cache when ``cache`` is given, as in
        :meth:`HMC.sample <zhusuan_tpu.mcmc.hmc.HMC.sample>`)."""
        log_post = make_log_joint_fn(meta_bn, observed)
        q = state.q
        n_chain_dims = len(jax.eval_shape(log_post, q).shape)
        if n_chain_dims != 1:
            raise ValueError(
                "ChEESHMC requires exactly one chain axis (log-joint "
                "output rank 1); got chain rank {}.".format(n_chain_dims)
            )

        def grad_fn(qq):
            return jax.grad(lambda v: jnp.sum(log_post(v)))(qq)

        dtype = state.step_size.dtype
        mass = {k: jnp.ones((1,) + v.shape[1:], dtype) for k, v in q.items()}

        # Jittered trajectory time and traced leapfrog count.
        jitter = _halton2(state.t).astype(dtype)
        # Keep the jitter off exact 0 (paper jitters in (0, 1]).
        jitter = jnp.maximum(jitter, jnp.asarray(1.0 / 64.0, dtype))
        traj_time = jitter * jnp.exp(state.log_traj)
        eps = state.step_size
        n_steps = jnp.clip(
            jnp.ceil(traj_time / eps).astype(jnp.int32), 1,
            self.max_leapfrogs,
        )

        # Fused-kernel eligibility (ops/chees_step.py): the HMC fused-step
        # rules — single 2-D f32 latent leaf, TPU backend, VMEM-sized
        # blocks + consts. The traced n_steps drives an in-VMEM fori_loop.
        use_fused = (
            bool(self.experimental_fused_step)
            and len(q) == 1
            and dtype == jnp.float32
        )
        if use_fused:
            from zhusuan_tpu.mcmc.base import on_cpu_backend
            from zhusuan_tpu.ops.chees_step import chees_step_supported
            from zhusuan_tpu.ops.hmc_step import consts_fit_vmem

            (fname,) = q.keys()
            use_fused = (
                not on_cpu_backend()
                and q[fname].ndim == 2
                and q[fname].dtype == jnp.float32
                and chees_step_supported(q[fname].shape)
                and consts_fit_vmem(
                    (
                        lambda x: log_post({fname: x}),
                        lambda x: grad_fn({fname: x})[fname],
                    ),
                    jax.ShapeDtypeStruct(
                        (min(256, q[fname].shape[0]), q[fname].shape[1]),
                        jnp.float32,
                    ),
                )
            )

        if use_fused:
            from zhusuan_tpu.ops.chees_step import fused_chees_step

            (out_q, prop_q, prop_p, accept_prob, old_log_prob,
             sel_log_prob) = fused_chees_step(
                lambda x: log_post({fname: x}),
                lambda x: grad_fn({fname: x})[fname],
                q[fname], mass[fname], eps, n_steps, key,
            )
            accepted_q = {fname: out_q}
            new_q = {fname: prop_q}
            new_p = {fname: prop_p}
        else:
            key_p, key_u = jax.random.split(key)
            p = tree_random_momentum(key_p, q, mass)

            new_q, new_p = self._leapfrog_n(q, p, eps, n_steps, grad_fn,
                                            mass)

            if cache is not None:
                old_lp = cache[0]
            else:
                old_lp = log_post(q)
            old_h, new_h, old_log_prob, new_log_prob, accept_prob = (
                get_acceptance_rate_cached(
                    q, p, new_q, new_p, log_post, mass, 1, old_lp
                )
            )

            u01 = jax.random.uniform(key_u, accept_prob.shape,
                                     accept_prob.dtype)
            if_accept = u01 < accept_prob
            accepted_q = {}
            for k in q:
                cond = if_accept.reshape(
                    if_accept.shape + (1,) * (q[k].ndim - 1)
                )
                accepted_q[k] = jnp.where(cond, new_q[k], q[k])
            sel_log_prob = jnp.where(if_accept, new_log_prob,
                                     old_log_prob)

        gate = jnp.asarray(adapt)

        # Pin adaptation math to the state dtype: a wider-dtype density
        # (e.g. f64 under the x64 test backend with an f32 chain state)
        # must not promote the scan-carried adaptation scalars.
        accept_prob = accept_prob.astype(dtype)

        # --- step-size dual averaging (shared helper; hmc.py:89-112) --- #
        # HARMONIC-mean acceptance across chains (Hoffman et al. 2021,
        # the module docstring's promise): dominated by the worst-mixing
        # chains, so stragglers pull the step size down where the
        # arithmetic mean would let a few accept~1 chains mask them.
        harmonic_accept = 1.0 / jnp.mean(
            1.0 / jnp.maximum(accept_prob, 1e-10)
        )
        step_size, new_da_step, new_h_bar, new_log_eps_bar = (
            dual_averaging_update(
                state.da_step, state.h_bar, state.log_epsilon_bar,
                state.step_size, harmonic_accept, gate,
                fresh_start=state.da_step == 0,
                mu=self.mu, target=self.target_acceptance_rate,
                gamma=self.gamma, t0=self.t0, kappa=self.kappa,
            )
        )

        # --- trajectory-length Adam on the ChEES gradient --------------- #
        g_traj = self._chees_grad(q, new_q, new_p, mass, accept_prob, jitter)
        # Normalize the raw gradient scale (Adam makes this mostly moot,
        # but keeps adam_v in a sane range for mixed scales).
        adam_t = state.adam_t + jnp.where(gate, 1.0, 0.0)
        b1, b2 = 0.9, 0.95
        m = jnp.where(gate, b1 * state.adam_m + (1 - b1) * g_traj,
                      state.adam_m)
        v = jnp.where(gate, b2 * state.adam_v + (1 - b2) * g_traj ** 2,
                      state.adam_v)
        safe_t = jnp.maximum(adam_t, 1.0)
        m_hat = m / (1 - b1 ** safe_t)
        v_hat = v / (1 - b2 ** safe_t)
        delta = self.traj_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
        # Ascent on ChEES; clip so one noisy iteration can't explode T.
        delta = jnp.clip(delta, -0.5, 0.5)
        log_traj = jnp.where(gate, state.log_traj + delta, state.log_traj)
        # Keep T within [eps, max_leapfrogs*eps] so n_steps stays sane.
        log_traj = jnp.clip(
            log_traj,
            jnp.log(step_size),
            jnp.log(step_size * self.max_leapfrogs),
        )

        new_state = ChEESState(
            q=accepted_q,
            t=state.t + 1,
            step_size=step_size.astype(dtype),
            da_step=new_da_step,
            h_bar=new_h_bar,
            log_epsilon_bar=new_log_eps_bar,
            log_traj=log_traj.astype(dtype),
            adam_m=m,
            adam_v=v,
            adam_t=adam_t,
        )
        info = ChEESInfo(
            samples=accepted_q,
            acceptance_rate=accept_prob,
            step_size=step_size,
            trajectory_length=jnp.exp(log_traj),
            n_leapfrogs=n_steps,
            log_prob=sel_log_prob,
        )
        if cache is not None:
            return new_state, info, (sel_log_prob, None)
        return new_state, info

    # ------------------------------------------------------------------ #
    def run(self, meta_bn, observed, state: ChEESState, key, n_iters: int,
            n_adapt: int = 0, collect: bool = True):
        """Run ``n_iters`` iterations in one ``lax.scan``; adaptation
        (step size AND trajectory length) is gated ON for the first
        ``n_adapt`` iterations and frozen after."""
        log_post = make_log_joint_fn(meta_bn, observed)

        def body(carry, _):
            st, k, cache = carry
            k, sub = jax.random.split(k)
            gate = (
                st.t < n_adapt if n_adapt > 0 else jnp.asarray(False)
            )
            st2, info, cache2 = self.sample(
                meta_bn, observed, st, sub, adapt=gate, cache=cache
            )
            out = (
                {
                    "samples": info.samples,
                    "acceptance_rate": info.acceptance_rate,
                    "trajectory_length": info.trajectory_length,
                    "n_leapfrogs": info.n_leapfrogs,
                }
                if collect
                else None
            )
            return (st2, k, cache2), out

        cache0 = (log_post(state.q), None)
        (final_state, _, _), outputs = jax.lax.scan(
            body, (state, key, cache0), None, length=n_iters
        )
        return final_state, outputs
