"""Replica-exchange (parallel-tempering) HMC.

Beyond the reference (which has no multimodal machinery beyond SGNHT's
noise): replica exchange runs the SAME posterior at a ladder of inverse
temperatures ``beta_0 = 1 > beta_1 > ... > beta_{K-1}`` and periodically
swaps configurations between adjacent rungs with the Metropolis
probability ``min(1, exp((beta_i - beta_j) (U_i - U_j)))`` where
``U = -log p``. Hot replicas cross energy barriers; swaps transport their
discoveries down to the cold (target) rung. Classic references: Swendsen
& Wang 1986; Earl & Deem 2005.

TPU-native design: the temperature ladder is just one more leading axis —
state is ``[n_temps, n_chains, ...]``, every HMC piece (momentum draw,
leapfrog, per-replica MH) is the same vectorized tree math as
:mod:`zhusuan_tpu.mcmc.hmc`, the per-rung step sizes dual-average
ELEMENTWISE (a ``[n_temps]`` vector — no lax.cond, so it vmaps/shards
cleanly), and a swap phase is two masked pairwise exchanges (even pairs,
then odd pairs on the next swap) built from ``jnp.roll`` + ``where``. The
base-density value at every replica is carried across iterations (the
same trick as ``HMC.run``'s cache), so swaps cost ZERO extra density
evaluations.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import (
    dual_averaging_update,
    kinetic_energy,
    make_log_joint_fn,
    tree_velocity,
)

__all__ = ["ReplicaExchangeHMC", "REMCState", "REMCInfo"]

Latent = Dict[str, jnp.ndarray]


class REMCState(NamedTuple):
    """q[name]: [n_temps, n_chains] + data_shape; per-rung tuner state."""

    q: Latent
    t: jnp.ndarray  # iteration counter (int32)
    base_lp: jnp.ndarray  # log p(q) at beta=1, [n_temps, n_chains]
    step_size: jnp.ndarray  # [n_temps]
    da_step: jnp.ndarray  # [n_temps]
    h_bar: jnp.ndarray  # [n_temps]
    log_epsilon_bar: jnp.ndarray  # [n_temps]


class REMCInfo(NamedTuple):
    samples: Latent  # the COLD rung's chains, [n_chains] + data_shape
    acceptance_rate: jnp.ndarray  # [n_temps] mean MH acceptance per rung
    # [n_temps-1] swap acceptance per adjacent pair; NaN on rounds where
    # the pair was not attempted (even/odd alternation) — aggregate with
    # nanmean.
    swap_rate: jnp.ndarray
    step_size: jnp.ndarray  # [n_temps]
    log_prob: jnp.ndarray  # cold-rung log p, [n_chains]


class ReplicaExchangeHMC:
    """Parallel-tempering HMC over a geometric (or custom) beta ladder.

    :param betas: 1-D inverse temperatures, decreasing from ``1.0``
        (default: geometric ladder ``1.0 .. min_beta`` over ``n_temps``).
    :param n_temps, min_beta: ladder shape when ``betas`` is None.
    :param step_size: initial COLD-rung step size; rung k starts at
        ``step_size * beta_k**-0.5`` (the Gaussian-optimal scaling) and
        each rung dual-averages independently to
        ``target_acceptance_rate``.
    :param n_leapfrogs: leapfrog steps (shared across rungs).
    :param swap_every: attempt swaps every this many iterations
        (alternating even / odd adjacent pairs).
    """

    def __init__(
        self,
        step_size: float = 0.1,
        n_leapfrogs: int = 10,
        betas=None,
        n_temps: int = 8,
        min_beta: float = 0.05,
        target_acceptance_rate: float = 0.8,
        swap_every: int = 1,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
    ):
        if betas is None:
            betas = np.geomspace(1.0, float(min_beta), int(n_temps))
        betas = np.asarray(betas, np.float64)
        if betas.ndim != 1 or betas[0] != 1.0 or np.any(np.diff(betas) >= 0):
            raise ValueError(
                "betas must be 1-D, start at 1.0, and strictly decrease "
                "(got {}).".format(betas)
            )
        self.betas = betas
        self.init_step_size = float(step_size)
        self.n_leapfrogs = int(n_leapfrogs)
        self.target_acceptance_rate = float(target_acceptance_rate)
        self.swap_every = int(swap_every)
        self.gamma = float(gamma)
        self.t0 = float(t0)
        self.kappa = float(kappa)

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, meta_bn, observed=None) -> REMCState:
        """``latent``: cold-chain initial positions ``[n_chains] + data``;
        every rung starts from a copy."""
        log_post = make_log_joint_fn(meta_bn, observed or {})
        K = len(self.betas)
        q = {
            k: jnp.broadcast_to(
                jnp.asarray(v)[None], (K,) + jnp.asarray(v).shape
            )
            for k, v in latent.items()
        }
        dtype = jnp.result_type(*[v.dtype for v in q.values()])
        betas = jnp.asarray(self.betas, dtype)
        eps0 = self.init_step_size / jnp.sqrt(betas)
        zeros = jnp.zeros((K,), dtype)
        return REMCState(
            q=q,
            t=jnp.zeros((), jnp.int32),
            base_lp=log_post(q),
            step_size=eps0.astype(dtype),
            da_step=zeros,
            h_bar=zeros,
            log_epsilon_bar=zeros,
        )

    # ------------------------------------------------------------------ #
    def _eps_tree(self, step_size, leaf):
        """Broadcast the [n_temps] step sizes against a replica leaf."""
        return step_size.reshape((-1,) + (1,) * (leaf.ndim - 1))

    def sample(self, meta_bn, observed, state: REMCState, key, adapt=True):
        """One iteration: per-rung HMC transition + (on schedule) one
        round of adjacent swaps. Pure; scan via :meth:`run`."""
        log_post = make_log_joint_fn(meta_bn, observed or {})
        q = state.q
        K = len(self.betas)
        dtype = state.step_size.dtype
        betas = jnp.asarray(self.betas, dtype)  # [K]

        def grad_fn(qq):
            return jax.grad(lambda v: jnp.sum(log_post(v)))(qq)

        key_p, key_u, key_s = jax.random.split(key, 3)

        # Momentum ~ N(0, I) per replica-chain.
        names = sorted(q.keys())
        keys = jax.random.split(key_p, len(names))
        p = {
            n: jax.random.normal(kk, q[n].shape, q[n].dtype)
            for n, kk in zip(names, keys)
        }

        # Tempered leapfrog: gradient of beta*log p is beta*grad.
        eps = {n: self._eps_tree(state.step_size, q[n]) for n in q}
        beta_t = {
            n: betas.reshape((-1,) + (1,) * (q[n].ndim - 1)) for n in q
        }

        g = grad_fn(q)
        pp = {n: p[n] + 0.5 * eps[n] * beta_t[n] * g[n] for n in q}
        qq = dict(q)

        def body(i, c):
            qq, pp = c
            v = tree_velocity(pp, {n: 1.0 for n in qq})
            qq = {n: qq[n] + eps[n] * v[n] for n in qq}
            g = grad_fn(qq)
            scale = jnp.where(i < self.n_leapfrogs - 1, 1.0, 0.5)
            pp = {n: pp[n] + scale * eps[n] * beta_t[n] * g[n] for n in qq}
            return (qq, pp)

        qq, pp = jax.lax.fori_loop(0, self.n_leapfrogs, body, (qq, pp))

        # Per-replica MH under the tempered density beta * log p.
        new_base_lp = log_post(qq)  # [K, C]
        unit_mass = {n: jnp.ones((), dtype) for n in q}
        kin = lambda mom: kinetic_energy(q, mom, unit_mass, 2)
        old_h = -betas[:, None] * state.base_lp + kin(p)
        new_h = -betas[:, None] * new_base_lp + kin(pp)
        acc = jnp.exp(jnp.minimum(old_h - new_h, 0.0))
        acc = jnp.where(
            jnp.isfinite(acc) & jnp.isfinite(new_base_lp), acc,
            jnp.zeros_like(acc),
        )
        u01 = jax.random.uniform(key_u, acc.shape, acc.dtype)
        take = u01 < acc  # [K, C]
        sel_q = {}
        for n in q:
            c = take.reshape(take.shape + (1,) * (q[n].ndim - 2))
            sel_q[n] = jnp.where(c, qq[n], q[n])
        base_lp = jnp.where(take, new_base_lp, state.base_lp)

        # --- adjacent swaps (even pairs on even swap rounds, odd on odd):
        # swap (i, i+1) w.p. min(1, exp((beta_i - beta_{i+1})(U_{i+1}-U_i)))
        # with U = -base_lp; zero extra density evaluations. ------------- #
        do_swap = (state.t % self.swap_every) == 0
        parity = (state.t // self.swap_every) % 2
        idx = jnp.arange(K)
        # pair_lead[i] True when rung i is the lower index of a swap pair.
        pair_lead = ((idx % 2) == parity) & (idx + 1 < K)
        lp_next = jnp.roll(base_lp, -1, axis=0)  # [K, C]
        dbeta = betas - jnp.roll(betas, -1)  # beta_i - beta_{i+1}
        log_ratio = dbeta[:, None] * (base_lp - lp_next)
        # accept swap: exp(-(beta_i-beta_j)(U_j-U_i)) = exp(dbeta*(lp_i-lp_j))
        # ... careful: standard PT: A = min(1, exp((beta_i-beta_j)(U_i-U_j)))
        #            = min(1, exp(dbeta * (lp_j - lp_i))).
        swap_p = jnp.exp(jnp.minimum(-log_ratio, 0.0))
        u_s = jax.random.uniform(key_s, swap_p.shape, swap_p.dtype)
        swap_lead = pair_lead[:, None] & (u_s < swap_p) & do_swap  # [K, C]
        swap_follow = jnp.roll(swap_lead, 1, axis=0)  # partner mask
        for n in q:
            x = sel_q[n]
            down = jnp.roll(x, -1, axis=0)  # value from rung i+1
            up = jnp.roll(x, 1, axis=0)  # value from rung i-1
            m_lead = swap_lead.reshape(
                swap_lead.shape + (1,) * (x.ndim - 2)
            )
            m_follow = swap_follow.reshape(
                swap_follow.shape + (1,) * (x.ndim - 2)
            )
            sel_q[n] = jnp.where(m_lead, down, jnp.where(m_follow, up, x))
        lp_down = jnp.roll(base_lp, -1, axis=0)
        lp_up = jnp.roll(base_lp, 1, axis=0)
        base_lp = jnp.where(
            swap_lead, lp_down, jnp.where(swap_follow, lp_up, base_lp)
        )

        # --- per-rung dual averaging (shared helper, elementwise over the
        # [n_temps] vector state; hmc.py:89-112) ------------------------- #
        gate = jnp.asarray(adapt)
        mu = jnp.log(10.0 * self.init_step_size / jnp.sqrt(betas))
        step_size, new_da_step, new_h_bar, new_log_eps_bar = (
            dual_averaging_update(
                state.da_step, state.h_bar, state.log_epsilon_bar,
                state.step_size, jnp.mean(acc, axis=1), gate,
                fresh_start=state.da_step == 0,
                mu=mu, target=self.target_acceptance_rate,
                gamma=self.gamma, t0=self.t0, kappa=self.kappa,
            )
        )

        new_state = REMCState(
            q=sel_q,
            t=state.t + 1,
            base_lp=base_lp,
            step_size=step_size.astype(dtype),
            da_step=new_da_step,
            h_bar=new_h_bar,
            log_epsilon_bar=new_log_eps_bar,
        )
        # Swap acceptance per adjacent pair; NaN when the pair was not
        # attempted this round (even/odd alternation), so a nanmean over
        # iterations gives the TRUE acceptance rate for ladder tuning.
        n_chains = base_lp.shape[1]
        n_pairs_acc = jnp.where(
            pair_lead & do_swap,
            jnp.sum(jnp.where(swap_lead, 1.0, 0.0), axis=1)
            / float(n_chains),
            jnp.nan,
        )
        info = REMCInfo(
            samples={n: v[0] for n, v in sel_q.items()},
            acceptance_rate=jnp.mean(acc, axis=1),
            swap_rate=n_pairs_acc[:-1],
            step_size=step_size,
            log_prob=base_lp[0],
        )
        return new_state, info

    # ------------------------------------------------------------------ #
    def run(self, meta_bn, observed, state: REMCState, key, n_iters: int,
            n_adapt: int = 0, collect: bool = True):
        """Scan ``n_iters`` iterations; step-size adaptation gated for the
        first ``n_adapt``. Collected samples are the COLD rung's."""

        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            gate = st.t < n_adapt if n_adapt > 0 else jnp.asarray(False)
            st2, info = self.sample(meta_bn, observed, st, sub, adapt=gate)
            out = (
                {
                    "samples": info.samples,
                    "acceptance_rate": info.acceptance_rate,
                    "swap_rate": info.swap_rate,
                    "log_prob": info.log_prob,
                }
                if collect
                else None
            )
            return (st2, k), out

        (final_state, _), outputs = jax.lax.scan(
            body, (state, key), None, length=n_iters
        )
        return final_state, outputs
