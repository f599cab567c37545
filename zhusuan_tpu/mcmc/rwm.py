"""Random-walk Metropolis and MALA: gradient-free and first-order
baseline samplers.

Beyond the reference: upstream ZhuSuan ships only HMC and the SGMCMC
family (``zhusuan/hmc.py``, ``zhusuan/sgmcmc.py``). RWM (gradient-free —
works on log-joints with non-differentiable pieces) and MALA (one gradient
per step — the cheap end of the Langevin/Hamiltonian spectrum) complete
the sampler matrix and give calibration baselines for the fancier kernels.

TPU-native design (same recipe as ``hmc.py``): explicit NamedTuple state,
pure ``sample(state, key)`` kernels iterated by ``lax.scan``; parallel
chains are leading axes; step sizes adapt by the shared Nesterov
dual-averaging helper (``mcmc/base.py``) toward the theory-optimal
acceptance rates (0.234 for RWM, Roberts et al. 1997; 0.574 for MALA,
Roberts & Rosenthal 1998). The current log-density (and score, for MALA)
is carried in the state, so each iteration costs ONE density (+ gradient)
evaluation — the proposal's — like the cached HMC scan path.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import (
    dual_averaging_update,
    make_log_joint_fn,
    scan_run_driver,
    tree_normal_like,
)

__all__ = ["RandomWalkMetropolis", "MALA", "MHState", "MHInfo"]

Latent = Dict[str, jnp.ndarray]


class MHState(NamedTuple):
    """Explicit Metropolis sampler state.

    Cache invariant: ``log_prob``/``grad`` are only valid for the
    (meta_bn, observed) target the state was last advanced under.
    ``init`` fills them with a NaN sentinel and ``sample`` re-evaluates
    whenever the sentinel is present (not on a ``t == 0`` gate), so a
    never-filled cache can't be silently accepted/rejected against; a
    state being re-targeted after checkpoint surgery should call
    :meth:`invalidate_cache` to force re-evaluation.
    """

    q: Latent  # position: chain_axes + data_axes
    log_prob: jnp.ndarray  # [chain_shape] cached log joint at q
    grad: Latent  # cached score at q (MALA; EMPTY dict for RWM — no
    #               dead latent-sized carry for the gradient-free kernel)
    t: jnp.ndarray  # iteration counter (int32)
    step_size: jnp.ndarray  # scalar
    da_step: jnp.ndarray
    h_bar: jnp.ndarray
    log_epsilon_bar: jnp.ndarray

    def invalidate_cache(self) -> "MHState":
        """Mark the density/score cache stale (NaN sentinel); the next
        ``sample`` call re-evaluates against its own target. Use after
        re-targeting a restored state (see the class docstring)."""
        return self._replace(log_prob=jnp.full_like(self.log_prob,
                                                    float("nan")))


class MHInfo(NamedTuple):
    """Per-iteration statistics."""

    samples: Latent
    acceptance_rate: jnp.ndarray  # [chain_shape] min(1, exp(log_alpha))
    updated_step_size: jnp.ndarray
    log_prob: jnp.ndarray  # [chain_shape] log joint at the new position


class _MetropolisBase:
    """Shared init/adaptation/run driver for RWM and MALA."""

    _uses_grad = False
    _default_target = 0.234

    def __init__(
        self,
        step_size: float = 0.1,
        adapt_step_size: bool = False,
        target_acceptance_rate: Optional[float] = None,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
    ):
        if not float(step_size) > 0.0:
            raise ValueError("step_size must be positive.")
        self._step_size = float(step_size)
        self._adapt = bool(adapt_step_size)
        self._target = float(
            self._default_target
            if target_acceptance_rate is None
            else target_acceptance_rate
        )
        if not 0.0 < self._target < 1.0:
            raise ValueError("target_acceptance_rate must be in (0, 1).")
        self._gamma, self._t0, self._kappa = gamma, t0, kappa

    def init(self, latent: Latent, n_chain_dims: int) -> MHState:
        """Create the initial state from initial positions of shape
        ``chain_axes + data_axes`` (chain-shape convention of
        ``HMC.init``). The density/score cache is filled lazily on the
        first ``sample`` call."""
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        if not isinstance(n_chain_dims, (int, np.integer)):
            raise TypeError("n_chain_dims must be a Python int.")
        any_leaf = next(iter(q.values()))
        chain_shape = any_leaf.shape[: int(n_chain_dims)]
        dtype = any_leaf.dtype
        zero = jnp.zeros((), dtype)
        return MHState(
            q=q,
            # NaN sentinel: "cache not filled" (see MHState docstring) —
            # sample() re-evaluates on it, and it can never be confused
            # with a real density (MH rejects NaN proposals, so a live
            # cache is always finite or -inf).
            log_prob=jnp.full(chain_shape, float("nan"), dtype),
            grad=jax.tree.map(jnp.zeros_like, q) if self._uses_grad else {},
            t=jnp.zeros((), jnp.int32),
            step_size=jnp.asarray(self._step_size, dtype),
            da_step=zero,
            h_bar=zero,
            log_epsilon_bar=zero,
        )

    # subclasses: propose(log_posterior, state, key) ->
    #   (q_new, lp_new, grad_new, log_alpha)
    def _propose(self, log_posterior, state, key):
        raise NotImplementedError()

    def _eval(self, log_posterior, q):
        """(log_prob, score) — score only when the kernel needs it."""
        if self._uses_grad:
            # Per-chain values AND per-chain scores in one pass: grad of
            # the summed log joint puts each chain's score in its own
            # [chain, ...] slot, and has_aux returns the unsummed values.
            def summed(qq):
                out = log_posterior(qq)
                return jnp.sum(out), out

            (_, lp), g = jax.value_and_grad(summed, has_aux=True)(q)
            return lp, g
        return log_posterior(q), {}

    def sample(self, meta_bn, observed, state: MHState, key, adapt=None):
        """One Metropolis step over all chains. Pure; scan-safe.

        :param adapt: traced/None bool gating step-size adaptation
            (defaults to the constructor's ``adapt_step_size``).
        :return: ``(new_state, MHInfo)``.
        """
        log_posterior = make_log_joint_fn(meta_bn, observed)
        # (Re-)fill the (log_prob, grad) cache whenever the NaN sentinel
        # is present — first iteration, or after invalidate_cache(). A
        # live cache is never NaN (bad proposals are rejected below), so
        # this gate cannot misfire mid-run.
        # init() typed the cache from the first latent leaf; a
        # mixed-dtype model's log-joint may differ (e.g. f32 latent, f64
        # likelihood) — align the cached value to the density dtype so
        # the cond branches agree.
        lp_dtype = jax.eval_shape(log_posterior, state.q).dtype
        cached_lp = state.log_prob.astype(lp_dtype)
        lp0, g0 = jax.lax.cond(
            jnp.any(jnp.isnan(cached_lp)),
            lambda: self._eval(log_posterior, state.q),
            lambda: (cached_lp, state.grad),
        )
        state = state._replace(log_prob=lp0, grad=g0)

        key_prop, key_mh = jax.random.split(key)
        q_new, lp_new, g_new, log_alpha = self._propose(
            log_posterior, state, key_prop
        )
        # Reject when the PROPOSAL is bad: non-finite proposal density, or
        # NaN anywhere in the ratio (e.g. a NaN score entering the
        # Hastings terms) — so one bad proposal can never poison the
        # dual-averaged step size (reference hmc.py:479-498 semantics).
        # log_alpha = +inf stays ACCEPT: that is a chain escaping a
        # zero-density position (current lp = -inf), which must succeed.
        bad = jnp.logical_or(
            jnp.isnan(log_alpha), jnp.logical_not(jnp.isfinite(lp_new))
        )
        log_alpha = jnp.where(bad, -jnp.inf, log_alpha)
        accept_rate = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_alpha, 0.0)))
        u = jax.random.uniform(key_mh, log_alpha.shape)
        accept = jnp.log(u) < log_alpha

        def pick(new, old):
            mask = accept.reshape(
                accept.shape + (1,) * (new.ndim - accept.ndim)
            )
            return jnp.where(mask, new, old)

        q = jax.tree.map(pick, q_new, state.q)
        lp = jnp.where(accept, lp_new, state.log_prob)
        g = jax.tree.map(pick, g_new, state.grad)

        gate = self._adapt if adapt is None else adapt
        step_size, da_step, h_bar, log_eps_bar = dual_averaging_update(
            state.da_step,
            state.h_bar,
            state.log_epsilon_bar,
            state.step_size,
            jnp.mean(accept_rate),
            jnp.asarray(gate),
            fresh_start=state.t == 0,
            mu=float(np.log(10.0 * self._step_size)),
            target=self._target,
            gamma=self._gamma,
            t0=self._t0,
            kappa=self._kappa,
        )
        # The update's dtype follows mean(accept_rate) (the density
        # dtype); pin the carried tuner scalars to their init dtype so
        # the scan carry stays type-stable under mixed-dtype models.
        ss_dtype = state.step_size.dtype
        step_size, da_step, h_bar, log_eps_bar = (
            step_size.astype(ss_dtype),
            da_step.astype(state.da_step.dtype),
            h_bar.astype(ss_dtype),
            log_eps_bar.astype(ss_dtype),
        )
        new_state = MHState(
            q=q,
            log_prob=lp,
            grad=g,
            t=state.t + 1,
            step_size=step_size,
            da_step=da_step,
            h_bar=h_bar,
            log_epsilon_bar=log_eps_bar,
        )
        info = MHInfo(
            samples=q,
            acceptance_rate=accept_rate,
            updated_step_size=step_size,
            log_prob=lp,
        )
        return new_state, info

    _VALID_FIELDS = ("samples", "acceptance_rate", "step_size", "log_prob")

    def run(
        self,
        meta_bn,
        observed,
        state: MHState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect: bool = True,
        collect_fields=("samples", "acceptance_rate", "step_size",
                        "log_prob"),
        thinning: int = 1,
    ):
        """Run ``n_iters`` iterations on-device via ``lax.scan``.

        Adaptation is gated on the PERSISTED counter ``state.t < n_adapt``
        — exactly the ``HMC.run`` convention (hmc.py:762-771): a resumed
        or checkpoint-restored state whose ``t`` already passed
        ``n_adapt`` will NOT re-adapt (post-burn-in draws stay
        untouched). To re-run adaptation, start from a fresh ``init()``
        state.

        :param collect_fields: which outputs to stack (fewer stacked
            outputs = less HBM traffic in the hot scan; ``HMC.run``
            convention).
        :param thinning: stack every ``thinning``-th iteration only —
            memory-bounded via an inner ``fori_loop`` (never materializes
            the unthinned trajectory; the ``SGMCMC.run`` recipe). The key
            threading is identical to the unthinned run, so the stacked
            output IS the full trajectory sliced at every
            ``thinning``-th step, for any ``n_iters``.
        :return: ``(final_state, {field: stacked} or None)``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )
        # Keep the scan carry type-stable for mixed-dtype models: the
        # cache dtype follows the density, not the first latent leaf
        # (see the matching cast in sample()).
        lp_dtype = jax.eval_shape(
            make_log_joint_fn(meta_bn, observed), state.q
        ).dtype
        state = state._replace(log_prob=state.log_prob.astype(lp_dtype))

        def pick(info):
            full = {
                "samples": info.samples,
                "acceptance_rate": info.acceptance_rate,
                "step_size": info.updated_step_size,
                "log_prob": info.log_prob,
            }
            return {f: full[f] for f in collect_fields}

        adapt_on = self._adapt and n_adapt > 0

        def one(st, k):
            k, sub = jax.random.split(k)
            # Compile-time-constant gate when adaptation is off lets XLA
            # DCE the dual-averaging update from the scan body (the
            # HMC.run trick, hmc.py:762-771).
            gate = (
                st.t < n_adapt if adapt_on else jnp.asarray(False)
            )
            st2, info = self.sample(meta_bn, observed, st, sub, adapt=gate)
            return st2, k, info

        return scan_run_driver(
            one, pick, state, key, n_iters, collect, thinning
        )


class RandomWalkMetropolis(_MetropolisBase):
    """Gaussian random-walk Metropolis: ``q' = q + eps * xi``.

    Gradient-free — the only sampler here usable on log-joints with
    non-differentiable pieces. Adaptation targets the 0.234 optimal
    acceptance rate (Roberts, Gelman & Gilks 1997).
    """

    _uses_grad = False
    _default_target = 0.234

    def _propose(self, log_posterior, state, key):
        eps = state.step_size
        xi = tree_normal_like(key, state.q)
        q_new = jax.tree.map(lambda q, x: q + eps * x, state.q, xi)
        lp_new = log_posterior(q_new)
        # Symmetric proposal: alpha = p(q')/p(q).
        log_alpha = lp_new - state.log_prob
        return q_new, lp_new, {}, log_alpha


class MALA(_MetropolisBase):
    """Metropolis-adjusted Langevin: drift toward the score, then correct.

    ``q' = q + (eps^2/2) grad log p(q) + eps * xi`` with the asymmetric
    Hastings correction; one density+gradient evaluation per iteration
    (the score at the current position is carried in the state).
    Adaptation targets 0.574 (Roberts & Rosenthal 1998).
    """

    _uses_grad = True
    _default_target = 0.574

    @staticmethod
    def _log_q(q_to, q_from, g_from, eps, chain_ndim):
        """log density of proposing ``q_to`` from ``q_from`` (up to the
        shared normal constant), summed over data axes of every latent."""
        total = None
        for name in sorted(q_to.keys()):
            mean = q_from[name] + 0.5 * eps * eps * g_from[name]
            diff = q_to[name] - mean
            axes = tuple(range(chain_ndim, diff.ndim))
            term = -jnp.sum(diff * diff, axis=axes) / (2.0 * eps * eps)
            total = term if total is None else total + term
        return total

    def _propose(self, log_posterior, state, key):
        eps = state.step_size
        chain_ndim = state.log_prob.ndim
        xi = tree_normal_like(key, state.q)
        q_new = jax.tree.map(
            lambda q, g, x: q + 0.5 * eps * eps * g + eps * x,
            state.q, state.grad, xi,
        )
        lp_new, g_new = self._eval(log_posterior, q_new)
        log_alpha = (
            lp_new
            - state.log_prob
            + self._log_q(state.q, q_new, g_new, eps, chain_ndim)
            - self._log_q(q_new, state.q, state.grad, eps, chain_ndim)
        )
        return q_new, lp_new, g_new, log_alpha
