"""Hamiltonian Monte Carlo with dual-averaging step-size and mass-matrix
adaptation.

Capability parity with reference ``zhusuan/hmc.py`` (522 LoC): the
``StepsizeTuner`` Nesterov dual averaging (hmc.py:64-112), the
``ExponentialWeightedMovingVariance`` diagonal mass adaptation
(hmc.py:115-159), the heuristic initial step-size search (hmc.py:307-345),
the boundary-aware leapfrog loop (hmc.py:347-372), the per-chain MH test
with non-finite -> reject (hmc.py:479-498), and ``HMCInfo`` statistics
(hmc.py:162-201).

TPU-native design (SURVEY.md §2.7 [TPU]): every piece of mutable
``tf.Variable`` state becomes a field of the explicit :class:`HMCState`
pytree; one iteration is the pure function ``sample(state, key) -> (state,
info)``; whole chains run on-device via ``HMC.run`` (``lax.scan``), so the
per-iteration host round-trip of the reference (one ``sess.run`` per
iteration, SURVEY.md §3.3) disappears. Parallel chains are leading batch
axes on the latent state — thousands of chains vectorize on the VPU/MXU and
shard over a device mesh (see ``zhusuan_tpu.parallel``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import (
    get_acceptance_rate,
    get_acceptance_rate_cached,
    leapfrog_step,
    make_log_joint_fn,
    tree_random_momentum,
    tree_velocity,
)

__all__ = ["HMC", "HMCState", "HMCInfo"]

Latent = Dict[str, jnp.ndarray]


class HMCState(NamedTuple):
    """Explicit sampler state (replaces the reference's tf.Variables,
    hmc.py:219-222,258-264)."""

    q: Latent  # position: chain_axes + data_axes per variable
    t: jnp.ndarray  # iteration counter (int32)
    step_size: jnp.ndarray  # current step size (scalar)
    # Dual-averaging state (hmc.py:82-87).
    da_step: jnp.ndarray
    h_bar: jnp.ndarray
    log_epsilon_bar: jnp.ndarray
    # EW moving variance state for mass adaptation (hmc.py:115-159);
    # shapes: (1,)*n_chain_dims + data_shape.
    ewmv_t: jnp.ndarray
    ewmv_mean: Latent
    ewmv_var: Latent
    mass: Latent


class HMCInfo(NamedTuple):
    """Per-iteration statistics (parity: reference ``HMCInfo``
    hmc.py:162-201)."""

    samples: Latent
    acceptance_rate: jnp.ndarray
    updated_step_size: jnp.ndarray
    init_momentum: Latent
    orig_hamiltonian: jnp.ndarray
    hamiltonian: jnp.ndarray
    orig_log_prob: jnp.ndarray
    log_prob: jnp.ndarray


class HMC:
    """Hamiltonian Monte Carlo sampler.

    :param step_size: initial leapfrog step size.
    :param n_leapfrogs: number of leapfrog steps per iteration.
    :param adapt_step_size: None disables the dual-averaging machinery
        entirely; a bool enables it and sets the default runtime gate
        (override per call via ``sample(..., adapt_step_size=flag)`` with a
        traced bool — e.g. ``i < n_burnin`` under ``scan``; adaptation
        breaks detailed balance, so gate it off after burn-in, reference
        hmc.py:224-231).
    :param target_acceptance_rate: dual-averaging target (delta).
    :param gamma, t0, kappa: dual-averaging hyperparameters (Hoffman &
        Gelman 2014; reference hmc.py:89-112).
    :param adapt_mass: None disables mass adaptation; a bool enables the EW
        variance machinery and sets the default gate. Requires
        ``adapt_step_size`` (reference hmc.py:270-272).
    :param mass_collect_iters: iterations before the adapted mass is used
        (forced to 0 when ``adapt_mass`` is None, matching the reference).
    :param mass_decay: EW variance decay.
    :param step_size_jitter: optional per-iteration multiplicative jitter
        ``eps * U(1-j, 1+j)`` (anti-resonance guard, Neal 2011 §3.2; not in
        the reference). One draw per iteration, so detailed balance holds.
    :param check_numerics: raise (host callback) when the pre-move log
        probability is non-finite, restoring the reference's
        "Try better initialization" error (hmc.py:51-53).
    :param experimental_fused_leapfrog: route the trajectory through the
        Pallas VMEM-resident kernel (:mod:`zhusuan_tpu.ops.leapfrog`) when
        the latent is a single ``[n_chains, dim]`` array. Numerically
        identical; see PERF.md for when this pays.
    :param experimental_fused_step: fuse the ENTIRE transition (momentum
        draw + trajectory + MH select) into one Pallas kernel
        (:mod:`zhusuan_tpu.ops.hmc_step`) when the latent is a single
        f32 ``[n_chains, dim]`` array with broadcast diagonal mass. Same
        distribution, different random stream (TPU hardware PRNG) — runs
        are deterministic per key but not bitwise equal to the scan
        path. The default ``"auto"`` selects the fused kernel whenever it
        is eligible AND the computation targets a non-CPU backend (1.87x
        ESS/sec at 32k chains, PERF.md), falling back to the scan path
        otherwise — so the fast path is the default path on TPU. Pass
        ``False`` to force the scan path (e.g. to keep the
        counter-based PRNG stream bitwise stable across devices), or
        ``True`` to request the kernel explicitly (still falls back when
        ineligible).
    """

    def __init__(
        self,
        step_size: float = 1.0,
        n_leapfrogs: int = 10,
        adapt_step_size: Optional[bool] = None,
        target_acceptance_rate: float = 0.8,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
        adapt_mass: Optional[bool] = None,
        mass_collect_iters: int = 10,
        mass_decay: float = 0.99,
        step_size_jitter: float = 0.0,
        check_numerics: bool = False,
        experimental_fused_leapfrog: bool = False,
        experimental_fused_step="auto",
    ):
        self.init_step_size = float(step_size)
        self.n_leapfrogs = int(n_leapfrogs)
        self.adapt_step_size = adapt_step_size
        self.target_acceptance_rate = float(target_acceptance_rate)
        self.gamma = float(gamma)
        self.t0 = float(t0)
        self.kappa = float(kappa)
        # mu = log(10 * eps0), the dual-averaging attractor
        # (reference hmc.py:80: tf.constant(10 * initial_stepsize) used as mu
        # in log space via `self.mu - sqrt(t)/gamma*h_bar`; the reference
        # stores 10*eps0 directly and mixes spaces — we follow Hoffman &
        # Gelman and use log(10*eps0), which is the published recipe).
        self.mu = float(np.log(10.0 * step_size))
        if adapt_mass is not None and adapt_step_size is None:
            raise ValueError(
                "adapt_mass requires adapt_step_size "
                "(parity: reference hmc.py:270-272)."
            )
        self.adapt_mass = adapt_mass
        # Without mass adaptation there is no second init-search trigger
        # (parity: reference hmc.py:275-277 zeroes mass_collect_iters) —
        # otherwise dual averaging would be spuriously fresh-started at
        # t == mass_collect_iters in every mass-free adaptive run.
        self.mass_collect_iters = (
            int(mass_collect_iters) if adapt_mass is not None else 0
        )
        self.mass_decay = float(mass_decay)
        if not 0.0 <= step_size_jitter < 1.0:
            raise ValueError("step_size_jitter must be in [0, 1).")
        self.step_size_jitter = float(step_size_jitter)
        self.check_numerics = bool(check_numerics)
        self.experimental_fused_leapfrog = bool(experimental_fused_leapfrog)
        if experimental_fused_step not in (True, False, "auto"):
            raise ValueError(
                "experimental_fused_step must be True, False, or 'auto'."
            )
        self.experimental_fused_step = experimental_fused_step

    # ------------------------------------------------------------------ #
    @staticmethod
    def _on_cpu() -> bool:
        """Trace-time guess of the target backend (shared helper,
        mcmc/base.py)."""
        from zhusuan_tpu.mcmc.base import on_cpu_backend

        return on_cpu_backend()

    def _fused_step_likely(self, q) -> bool:
        """Cheap predictor of whether :meth:`sample` will take the fused
        kernel for this latent — used by run()/warmup_run() to decide if
        carrying the (log_prob, grad) eval cache pays (the fused kernel
        ignores it). Mirrors the inexpensive half of the eligibility
        gate; the VMEM-fit checks are skipped (worst case: a rare
        fallback run without the cache)."""
        if not self.experimental_fused_step:
            return False
        if self.check_numerics or self._on_cpu() or len(q) != 1:
            return False
        (arr,) = q.values()
        return arr.ndim == 2 and arr.dtype in (jnp.float32, jnp.bfloat16)

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, n_chain_dims: Optional[int] = None,
             log_joint=None, observed=None) -> HMCState:
        """Create the initial :class:`HMCState` from initial positions.

        :param latent: dict of initial chain positions, each of shape
            ``chain_axes + data_axes``.
        :param n_chain_dims: number of leading chain axes. If None, it is
            inferred by tracing ``log_joint`` (which then must be given,
            optionally with ``observed``): the log-joint output shape IS the
            chain shape (parity: reference hmc.py:434-449).
        """
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        if n_chain_dims is None:
            if log_joint is None:
                raise ValueError(
                    "Provide either n_chain_dims or log_joint (+observed) "
                    "so the chain rank can be inferred."
                )
            log_post = make_log_joint_fn(log_joint, observed or {})
            out_shape = jax.eval_shape(log_post, q).shape
            n_chain_dims = len(out_shape)
        n_chain_dims = int(n_chain_dims)
        dtype = jnp.result_type(*[v.dtype for v in q.values()])
        # bf16 state keeps only the POSITIONS in bf16; the adaptation
        # accumulators (dual averaging, EW moments, mass) and step size
        # stay f32 — quantizing those would corrupt the adaptation, not
        # just the state (PERF.md round-4 bf16-state study).
        if dtype == jnp.bfloat16:
            dtype = jnp.dtype(jnp.float32)
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
    # internal pieces                                                    #
    # ------------------------------------------------------------------ #
    def _ewmv_update(self, state: HMCState, gate, n_chain_dims):
        """EW moving variance update over chain axes (reference
        hmc.py:115-159), gated by ``gate`` (traced bool) — delegates to
        the shared :func:`~zhusuan_tpu.mcmc.base.ewmv_update`."""
        from zhusuan_tpu.mcmc.base import ewmv_update

        return ewmv_update(
            state.q, state.ewmv_t, state.ewmv_mean, state.ewmv_var,
            gate, n_chain_dims, self.mass_decay,
        )

    def _init_step_size_search(
        self, q, p, mass, grad_fn, log_post, n_chain_dims, current_step_size
    ):
        """Heuristic initial step-size search: scale by 1.5 up/down until
        the mean acceptance crosses the target (reference hmc.py:307-345),
        as a ``lax.while_loop``."""
        factor = 1.5
        target = self.target_acceptance_rate

        def trial_acceptance(step_size):
            nq, np_ = leapfrog_step(q, p, 0.0, step_size / 2, grad_fn, mass)
            nq, np_ = leapfrog_step(
                nq, np_, step_size, step_size / 2, grad_fn, mass
            )
            *_, acc = get_acceptance_rate(
                q, p, nq, np_, log_post, mass, n_chain_dims
            )
            return jnp.mean(acc)

        def cond(carry):
            _, _, go = carry
            return go

        def body(carry):
            step_size, last_acc, _ = carry
            # Pin to the step-size dtype: a wider-dtype density (f64
            # under x64 with an f32 chain state) must not promote the
            # while_loop carry.
            acc = trial_acceptance(step_size).astype(step_size.dtype)
            new_step_size = jnp.where(
                acc < target, step_size / factor, step_size * factor
            )
            # Continue while we haven't crossed the target boundary.
            go = ~jnp.logical_xor(last_acc < target, acc < target)
            return (new_step_size, acc, go)

        out, _, _ = jax.lax.while_loop(
            cond, body, (current_step_size, jnp.ones_like(current_step_size),
                         jnp.asarray(True))
        )
        return out

    def _leapfrog(self, q, p, step_size, grad_fn, mass):
        """n_leapfrogs+1 boundary-aware sub-steps under ``lax.scan``
        (reference hmc.py:347-372): drift is skipped on the first iteration
        and the kick is halved on the first and last."""
        n = self.n_leapfrogs

        def body(carry, i):
            q, p = carry
            step_size1 = jnp.where(i > 0, step_size, 0.0)
            step_size2 = jnp.where(
                (i > 0) & (i < n), step_size, step_size / 2
            )
            q, p = leapfrog_step(q, p, step_size1, step_size2, grad_fn, mass)
            return (q, p), None

        (q, p), _ = jax.lax.scan(body, (q, p), jnp.arange(n + 1))
        return q, p

    def _leapfrog_cached(self, q, p, step_size, grad_fn, mass, g0):
        """Boundary-aware trajectory with the gradient at ``q`` supplied
        (``g0``) and the final-point gradient returned: ``n_leapfrogs``
        gradient evaluations instead of ``n_leapfrogs + 1``. Identical
        schedule to :meth:`_leapfrog` (reference hmc.py:347-372): the
        i=0 sub-step there is drift-free with a half kick — exactly the
        first kick below — and the last kick is halved."""
        n = self.n_leapfrogs
        half = {k: p[k] + (step_size / 2) * g0[k] for k in p}
        if n == 0:
            return q, half, g0

        def body(carry, i):
            q, p, _ = carry
            v = tree_velocity(p, mass)
            q = {k: q[k] + step_size * v[k] for k in q}
            g = grad_fn(q)
            ss2 = jnp.where(i < n, step_size, step_size / 2)
            p = {k: p[k] + ss2 * g[k] for k in p}
            return (q, p, g), None

        (q, p, g), _ = jax.lax.scan(
            body, (q, half, g0), jnp.arange(1, n + 1)
        )
        return q, p, g

    def _run_leapfrog(self, q, p, step_size, grad_fn, mass, n_chain_dims):
        """Dispatch the trajectory: Pallas fused kernel when opted in and
        applicable, otherwise the XLA scan.

        The fused path requires a SINGLE latent of shape ``[n_chains, dim]``
        with exactly one chain axis (``n_chain_dims == 1``): the kernel
        evaluates the gradient per chain-block, which is only correct when
        the density factorizes over the leading axis. Anything else falls
        back to the XLA scan.
        """
        if (
            self.experimental_fused_leapfrog
            and len(q) == 1
            and n_chain_dims == 1
        ):
            from zhusuan_tpu.ops.leapfrog import (
                fused_leapfrog, leapfrog_supported,
            )

            (name,) = q.keys()
            if (
                leapfrog_supported(
                    q[name].shape, itemsize=q[name].dtype.itemsize
                )
                and mass[name].shape == (1,) + q[name].shape[1:]
            ):
                # Reuse the exact same grad function as the scan path so the
                # two trajectories can never desynchronize.
                def single_grad(x):
                    return grad_fn({name: x})[name]

                nq, np_ = fused_leapfrog(
                    single_grad, q[name], p[name], step_size,
                    self.n_leapfrogs, mass[name],
                )
                return {name: nq}, {name: np_}
        return self._leapfrog(q, p, step_size, grad_fn, mass)

    def _tune_step_size(self, state: HMCState, acceptance_rate, gate,
                        fresh_start):
        """Nesterov dual averaging (reference hmc.py:89-112), gated —
        delegates to the shared :func:`~zhusuan_tpu.mcmc.base.dual_averaging_update`."""
        from zhusuan_tpu.mcmc.base import dual_averaging_update

        return dual_averaging_update(
            state.da_step, state.h_bar, state.log_epsilon_bar,
            state.step_size, acceptance_rate, gate, fresh_start,
            mu=self.mu, target=self.target_acceptance_rate,
            gamma=self.gamma, t0=self.t0, kappa=self.kappa,
        )

    # ------------------------------------------------------------------ #
    def sample(
        self,
        meta_bn,
        observed,
        state: HMCState,
        key,
        adapt_step_size=None,
        adapt_mass=None,
        reinit_step_size=None,
        init_step_size_search=None,
        cache=None,
    ):
        """Run ONE HMC iteration: pure ``(state, key) -> (state, info)``.

        Parity: reference ``HMC.sample`` (hmc.py:382-522) which *builds* the
        iteration graph; here the function itself is the iteration and can
        be ``jit``-ed or scanned (see :meth:`run`).

        :param meta_bn: MetaBayesianNet or ``log_joint(obs_dict)`` callable.
        :param observed: dict of observations.
        :param state: current :class:`HMCState`.
        :param key: PRNG key for this iteration.
        :param adapt_step_size: optional traced bool gating step-size
            adaptation this iteration (default: the constructor setting).
        :param adapt_mass: optional traced bool gating mass adaptation.
        :param reinit_step_size: optional traced bool forcing the heuristic
            step-size re-search and a dual-averaging fresh start this
            iteration (used by :meth:`warmup_run` at window boundaries).
        :param init_step_size_search: ONLY ``None`` (default trigger
            behavior) or the static Python ``False`` (suppress the
            t-based heuristic init-search trigger, which otherwise fires
            at ``t==1`` and ``t==mass_collect_iters``, regardless of the
            state's counter — XLA then DCEs the search ``while_loop``
            from the program). Any other value — including traced bools
            and ``True`` — raises: the gate must be a compile-time
            constant (to force a search, use ``reinit_step_size=True``).
            Used by :class:`~.AnnealedSMC` rejuvenation, whose kernel
            must be a FIXED f_beta-invariant transition independent of
            the particle cloud.
        :param cache: optional ``(log_prob, grad_dict)`` evaluated at
            ``state.q`` (build the first one with :meth:`make_cache`).
            When given, the iteration skips re-evaluating the density and
            its gradient at the current position — the previous iteration
            already produced both — saving one density + one gradient
            evaluation per step, and the return gains a third element:
            the cache for the accepted position. The trajectory math is
            identical; values agree with the uncached path to within
            ~1 ulp per step (XLA fusion differences only). Only valid
            while ``meta_bn`` / ``observed`` are unchanged between
            iterations (:meth:`run` threads this automatically).
        :return: ``(new_state, HMCInfo)``, plus ``new_cache`` when
            ``cache`` was given.
        """
        if not (init_step_size_search is None
                or init_step_size_search is False):
            # Must be a compile-time constant (the suppression relies on
            # XLA DCE); traced values or True would be silent no-ops.
            raise ValueError(
                "init_step_size_search accepts only None or the static "
                "Python False (got {!r}); use reinit_step_size=True to "
                "force a search.".format(init_step_size_search)
            )
        log_post = make_log_joint_fn(meta_bn, observed)
        q = state.q
        # bf16-state contract (ops/hmc_step.py): positions may live in
        # bfloat16; remember the carry dtypes, upcast for ALL compute
        # (trajectory + MH energies in f32), and round back only at the
        # state write below.
        state_dtypes = {k: v.dtype for k, v in q.items()}
        q = {
            k: (v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v)
            for k, v in q.items()
        }
        n_chain_dims = len(jax.eval_shape(log_post, q).shape)

        def grad_fn(qq):
            # Gradient of the summed log-posterior: chains are independent,
            # so sum-then-grad gives per-chain gradients in one pass.
            return jax.grad(lambda v: jnp.sum(log_post(v)))(qq)

        new_t = state.t + 1

        # --- mass adaptation (reference hmc.py:283-305,452-456) -------- #
        if self.adapt_mass is not None:
            gate_mass = (
                jnp.asarray(adapt_mass)
                if adapt_mass is not None
                else jnp.asarray(self.adapt_mass)
            )
            ewmv_t, ewmv_mean, ewmv_var = self._ewmv_update(
                state, gate_mass, n_chain_dims
            )
            # Adapted mass only after the collect window AND at least one
            # gated accumulator update (otherwise var==0 -> mass 1e20 and
            # frozen chains when the runtime gate never fired).
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

        # Fused-step applicability: single 2-D latent, one chain axis,
        # broadcast diagonal mass, VMEM-sized blocks (ops/hmc_step.py).
        # Hardware-PRNG primitives have no CPU lowering; silently use the
        # scan path when compiling for CPU (same distribution either way).
        # Checks both the default backend AND a `jax.default_device(cpu)`
        # override (best-effort: explicit device_put to CPU on a TPU host
        # is not detectable at trace time).
        on_cpu = self._on_cpu()
        use_fused_step = (
            bool(self.experimental_fused_step)
            and len(q) == 1
            and n_chain_dims == 1
            and not self.check_numerics
            and not on_cpu
        )
        if use_fused_step:
            from zhusuan_tpu.ops.hmc_step import (
                consts_fit_vmem, hmc_step_supported,
            )

            (fname,) = q.keys()
            use_fused_step = (
                q[fname].ndim == 2
                # f32, or bf16 STATE (HBM positions bf16, all in-VMEM
                # compute and MH energies f32 — ops/hmc_step.py). Other
                # dtypes take the scan path (documented silent fallback).
                and q[fname].dtype in (jnp.float32, jnp.bfloat16)
                # VMEM working buffers are f32 regardless of state dtype.
                and hmc_step_supported(q[fname].shape, itemsize=4)
                and mass[fname].shape == (1,) + q[fname].shape[1:]
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

        key_p, key_u, key_j = jax.random.split(key, 3)
        # In fused-step mode the momentum is drawn inside the kernel (the
        # init-step-size search below draws its own when it fires).
        p = None if use_fused_step else tree_random_momentum(key_p, q, mass)

        # --- step size (+ heuristic init search; hmc.py:458-472) ------- #
        if self.adapt_step_size is not None:
            if init_step_size_search is False:
                # Static suppression of the t-based trigger (see the
                # docstring); lax.cond with a constant-False predicate is
                # simplified away together with the search body.
                if_init_ss = jnp.asarray(False)
            else:
                if_init_ss = (
                    (new_t == 1) | (new_t == self.mass_collect_iters)
                )
            if reinit_step_size is not None:
                if_init_ss = if_init_ss | jnp.asarray(reinit_step_size)

            # The search starts from the current step size (reference
            # hmc.py:340-344 seeds the while_loop with self.step_size).
            def _search():
                p_s = (
                    tree_random_momentum(key_p, q, mass)
                    if use_fused_step
                    else p
                )
                return jax.lax.stop_gradient(
                    self._init_step_size_search(
                        q, p_s, mass, grad_fn, log_post, n_chain_dims,
                        state.step_size,
                    )
                )

            searched = jax.lax.cond(
                if_init_ss, _search, lambda: state.step_size
            )
            step_size = searched
        else:
            if_init_ss = jnp.asarray(False)
            step_size = state.step_size

        # --- leapfrog (hmc.py:474-476) --------------------------------- #
        # Optional per-iteration step-size jitter (standard anti-resonance
        # guard, e.g. Neal 2011 §3.2; not in the reference): the jittered
        # value is used for the whole trajectory, so detailed balance holds.
        if self.step_size_jitter > 0.0:
            u_j = jax.random.uniform(
                key_j, (), step_size.dtype,
                minval=1.0 - self.step_size_jitter,
                maxval=1.0 + self.step_size_jitter,
            )
            trajectory_step = step_size * u_j
        else:
            trajectory_step = step_size

        new_cache = None
        if use_fused_step:
            # Whole transition in one VMEM-resident kernel
            # (momentum + trajectory + MH select; ops/hmc_step.py).
            from zhusuan_tpu.ops.hmc_step import fused_hmc_step

            def single_grad(x):
                return grad_fn({fname: x})[fname]

            def single_logp(x):
                return log_post({fname: x})

            # The kernel is deliberately self-contained: it ignores any
            # carried cache and re-evaluates the density/gradient in VMEM,
            # where both carried variants measured SLOWER than the
            # recompute (grad: 2 extra [c, d] HBM passes; logp: per-block
            # DMA overhead on a [c, 1] input — PERF.md). The selected
            # density still comes back for free, so a cache can be
            # returned at zero cost.
            # Hand the kernel the CARRIED array (possibly bf16) — an
            # upcast copy here would re-materialize f32 in HBM and lose
            # the bf16-state traffic win; the kernel upcasts in VMEM.
            (out_q, p0, acceptance_rate, old_log_prob, new_log_prob,
             old_h, new_h) = fused_hmc_step(
                single_logp, single_grad, state.q[fname], mass[fname],
                trajectory_step, self.n_leapfrogs, key_u,
            )
            accepted_q = {fname: out_q}
            p = {fname: p0}
            new_cache = (new_log_prob, None)
        else:
            if cache is not None and cache[1] is not None:
                old_lp_in, g0 = cache
                new_q, new_p, g_new = self._leapfrog_cached(
                    q, p, trajectory_step, grad_fn, mass, g0
                )
                (old_h, new_h, old_log_prob, new_log_prob,
                 acceptance_rate) = get_acceptance_rate_cached(
                    q, p, new_q, new_p, log_post, mass, n_chain_dims,
                    old_lp_in,
                )
            elif cache is not None:
                # Density-value-only cache (grad slot None — e.g. a
                # fused-step sampler that fell back to the scan path):
                # full trajectory, but the old density is still carried.
                new_q, new_p = self._run_leapfrog(
                    q, p, trajectory_step, grad_fn, mass, n_chain_dims
                )
                (old_h, new_h, old_log_prob, new_log_prob,
                 acceptance_rate) = get_acceptance_rate_cached(
                    q, p, new_q, new_p, log_post, mass, n_chain_dims,
                    cache[0],
                )
            else:
                new_q, new_p = self._run_leapfrog(
                    q, p, trajectory_step, grad_fn, mass, n_chain_dims
                )

                # --- MH test (hmc.py:479-498) -------------------------- #
                (old_h, new_h, old_log_prob, new_log_prob,
                 acceptance_rate) = get_acceptance_rate(
                    q, p, new_q, new_p, log_post, mass, n_chain_dims
                )
            if self.check_numerics:
                # Parity: reference hmc.py:51-53 raised on a non-finite
                # pre-move log prob ("Try better initialization"); opt-in
                # host callback here (a silent chain would otherwise
                # reject forever).
                from zhusuan_tpu.ops.checks import check_numerics as _check

                old_log_prob = _check(
                    old_log_prob,
                    "HMC: old_log_prob has numeric errors! "
                    "Try better initialization.",
                )
            u01 = jax.random.uniform(key_u, acceptance_rate.shape,
                                     acceptance_rate.dtype)
            if_accept = u01 < acceptance_rate
            has_grad_cache = cache is not None and cache[1] is not None
            accepted_q = {}
            accepted_g = {} if has_grad_cache else None
            for k in q:
                cond = if_accept.reshape(
                    if_accept.shape + (1,) * (q[k].ndim - if_accept.ndim)
                )
                accepted_q[k] = jnp.where(cond, new_q[k], q[k])
                if has_grad_cache:
                    accepted_g[k] = jnp.where(cond, g_new[k], g0[k])
            new_log_prob = jnp.where(if_accept, new_log_prob, old_log_prob)
            if cache is not None:
                new_cache = (new_log_prob, accepted_g)

        # --- step-size adaptation (hmc.py:500-505) --------------------- #
        if self.adapt_step_size is not None:
            gate_ss = (
                jnp.asarray(adapt_step_size)
                if adapt_step_size is not None
                else jnp.asarray(self.adapt_step_size)
            )
            updated_step_size, da_step, h_bar, log_eps_bar = (
                self._tune_step_size(
                    state,
                    jnp.mean(acceptance_rate),
                    gate_ss,
                    if_init_ss,
                )
            )
        else:
            updated_step_size = step_size
            da_step, h_bar, log_eps_bar = (
                state.da_step, state.h_bar, state.log_epsilon_bar
            )

        new_state = HMCState(
            # Preserve the carry dtype: with bf16 state the scan-path
            # arithmetic promotes to f32; round back so lax.scan's carry
            # stays dtype-stable (the fused kernel already writes q dtype).
            q={k: accepted_q[k].astype(state_dtypes[k])
               for k in accepted_q},
            t=new_t,
            step_size=updated_step_size,
            da_step=da_step,
            h_bar=h_bar,
            log_epsilon_bar=log_eps_bar,
            ewmv_t=ewmv_t,
            ewmv_mean=ewmv_mean,
            ewmv_var=ewmv_var,
            mass=mass,
        )
        info = HMCInfo(
            samples=accepted_q,
            acceptance_rate=acceptance_rate,
            updated_step_size=updated_step_size,
            init_momentum=p,
            orig_hamiltonian=old_h,
            hamiltonian=new_h,
            orig_log_prob=old_log_prob,
            log_prob=new_log_prob,
        )
        if cache is not None:
            return new_state, info, new_cache
        return new_state, info

    # ------------------------------------------------------------------ #
    def make_cache(self, meta_bn, observed, state: HMCState,
                   with_grad: bool = True):
        """Evaluate ``(log_prob, grad_dict)`` at ``state.q`` — the carried
        cache that lets :meth:`sample` skip re-evaluating the density at
        the current position (see the ``cache`` parameter). :meth:`run`
        and :meth:`warmup_run` call this internally.

        :param with_grad: also carry the gradient (the scan path then
            saves one gradient evaluation per iteration). With
            ``with_grad=False`` the scan path still skips the old-density
            evaluation (a ``(logp, None)`` cache). The fused kernels never
            consume a cache — in-VMEM recompute measured faster than any
            carried input (PERF.md) — so :meth:`run` disables caching
            entirely when a fused flag is set.
        """
        log_post = make_log_joint_fn(meta_bn, observed)
        logp = log_post(state.q)
        if not with_grad:
            return logp, None
        grad_fn = jax.grad(lambda v: jnp.sum(log_post(v)))
        g = grad_fn(state.q)
        # bf16 state: the gradient cotangent arrives in the position dtype;
        # carry the cache at compute precision (f32) so the scan carry
        # matches the promoted in-loop gradients (bf16-state contract,
        # ops/hmc_step.py).
        g = {k: v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
             for k, v in g.items()}
        return logp, g

    # ------------------------------------------------------------------ #
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
                        "log_prob"),
        collect_dtype=None,
        thinning: int = 1,
    ):
        """Run ``n_iters`` iterations fully on-device via ``lax.scan``.

        The first ``n_adapt`` iterations have step-size/mass adaptation
        gated ON, the rest OFF (burn-in gating; reference users did this
        with a feed-dict placeholder, examples/toy_examples/gaussian.py:53-62
        — here it folds into the scan).

        :param collect: if True, stack per-iteration outputs; if False only
            the final state is returned (use for burn-in at zero memory
            cost).
        :param collect_fields: which outputs to stack (subset of
            ``samples``, ``acceptance_rate``, ``step_size``, ``log_prob``).
            Fewer stacked outputs = less HBM traffic in the hot scan.
        :param collect_dtype: optional dtype for the stacked ``samples``
            copy (e.g. ``jnp.bfloat16`` to halve trajectory HBM at a
            precision adequate for diagnostics); the chain itself always
            advances in the state dtype.
        :param thinning: stack every ``thinning``-th iteration only,
            memory-bounded via an inner ``fori_loop`` (the unthinned
            trajectory is never materialized — the ``SGMCMC.run`` recipe,
            sgmcmc.py:160-180). Key threading and adaptation gating are
            identical to the unthinned run, so the stacked output IS the
            full trajectory sliced ``thinning-1::thinning``, bit-for-bit,
            and the final state matches the unthinned run for any
            ``n_iters`` (a non-multiple remainder is advanced in a scanned
            tail). At 32k chains this is what sustains arbitrary run
            lengths at fixed HBM.
        :return: ``(final_state, outputs)`` where outputs is a dict with
            the requested fields (iteration-major) when ``collect`` else
            None.
        """
        valid_fields = ("samples", "acceptance_rate", "step_size",
                        "log_prob")
        bad = [f for f in collect_fields if f not in valid_fields]
        if bad:
            raise ValueError(
                "Unknown collect_fields {}; valid names are {}.".format(
                    bad, valid_fields
                )
            )
        if int(thinning) < 1:
            raise ValueError("thinning must be >= 1.")
        thinning = int(thinning)
        adapt_enabled = self.adapt_step_size is not None
        # Carry (log_prob, grad) at the current position across iterations:
        # each step then costs n_leapfrogs gradient + 1 density evaluations
        # instead of n_leapfrogs+1 and 2 (same math, <=1 ulp difference; see
        # PERF.md). Skipped for both fused kernels: they re-evaluate in
        # VMEM, where the recompute measured faster than any carried input.
        use_cache = not (
            self.experimental_fused_leapfrog
            or self._fused_step_likely(state.q)
        )

        def one(st, k, cache):
            k, sub = jax.random.split(k)
            i = st.t
            if not adapt_enabled:
                gate = None
            elif n_adapt <= 0:
                # t >= 0 always, so `i < 0` is identically False; making the
                # gate a compile-time constant lets XLA's select simplifier
                # dead-code-eliminate the whole EWMV/dual-averaging update
                # from the post-burn-in scan body (see PERF.md).
                gate = jnp.asarray(False)
            else:
                gate = i < n_adapt
            st2, info, *rest = self.sample(
                meta_bn, observed, st, sub,
                adapt_step_size=gate,
                adapt_mass=gate if self.adapt_mass is not None else None,
                cache=cache,
            )
            return st2, k, (rest[0] if rest else None), info

        def pick(info):
            all_fields = {
                "samples": (
                    {
                        n: v.astype(collect_dtype)
                        for n, v in info.samples.items()
                    }
                    if collect_dtype is not None
                    else info.samples
                ),
                "acceptance_rate": info.acceptance_rate,
                "step_size": info.updated_step_size,
                "log_prob": info.log_prob,
            }
            return {f: all_fields[f] for f in collect_fields}

        cache0 = (
            self.make_cache(meta_bn, observed, state) if use_cache else None
        )

        if collect and thinning > 1:
            n_out = n_iters // thinning

            # fori_loop needs a uniform carry; run the first inner step
            # outside the loop to seed an info structure (RWM recipe,
            # rwm.py:276-297).
            def outer(carry, _):
                st, k, cache = carry
                st, k, cache, info = one(st, k, cache)

                def inner(t, c):
                    st, k, cache, _ = c
                    return one(st, k, cache)

                st, k, cache, info = jax.lax.fori_loop(
                    1, thinning, inner, (st, k, cache, info)
                )
                return (st, k, cache), pick(info)

            (final_state, key, cache0), outputs = jax.lax.scan(
                outer, (state, key, cache0), None, length=n_out
            )
            rem = n_iters - n_out * thinning
            if rem:
                # Scanned remainder on the SAME key thread — final state
                # matches the unthinned run bit-for-bit.
                def tail(carry, _):
                    st, k, cache = carry
                    st, k, cache, _ = one(st, k, cache)
                    return (st, k, cache), None

                (final_state, _, _), _ = jax.lax.scan(
                    tail, (final_state, key, cache0), None, length=rem
                )
            return final_state, outputs

        def body(carry, inp):
            st, k, cache = carry
            st2, k, cache2, info = one(st, k, cache)
            return (st2, k, cache2), (pick(info) if collect else None)

        (final_state, _, _), outputs = jax.lax.scan(
            body, (state, key, cache0), None, length=n_iters
        )
        return final_state, outputs

    # ------------------------------------------------------------------ #
    def warmup_run(
        self,
        meta_bn,
        observed,
        state: HMCState,
        key,
        n_warmup: int,
        init_buffer: int = 75,
        term_buffer: int = 50,
        base_window: int = 25,
    ):
        """Stan-style three-phase windowed warmup (beyond the reference's
        single burn-in gate):

        1. ``init_buffer`` iterations: step-size adaptation only (early
           positions would poison the mass estimate).
        2. expanding windows (base_window, 2x, 4x, ...): samples accumulate
           into a Welford variance estimator; the (regularized) diagonal
           mass is installed only AT each window boundary and held fixed in
           between, and the accumulator restarts — so each window's mass
           reflects only recent, better-located samples.
        3. ``term_buffer`` iterations: step-size-only, letting dual
           averaging settle against the final mass.

        Requires ``adapt_step_size`` enabled and ``adapt_mass`` DISABLED
        (this driver owns the mass; the constructor's EW scheme is the
        reference-parity alternative). Runs as one ``lax.scan``.

        :return: the warmed-up :class:`HMCState` (nothing collected; the
            installed mass lives in ``state.mass``).
        """
        if self.adapt_step_size is None:
            raise ValueError("warmup_run requires adapt_step_size enabled.")
        if self.adapt_mass is not None:
            raise ValueError(
                "warmup_run owns the mass schedule; construct HMC with "
                "adapt_mass=None (the EW scheme and windowed warmup are "
                "alternatives)."
            )
        # The Welford reductions below assume exactly one leading chain
        # axis (shape[0], axis=0); other chain ranks must use run()'s plain
        # gated adaptation.
        log_post = make_log_joint_fn(meta_bn, observed)
        n_chain_dims = len(jax.eval_shape(log_post, state.q).shape)
        if n_chain_dims != 1:
            raise ValueError(
                "warmup_run supports exactly one chain axis (log-joint "
                "output rank 1); got chain rank {}. Use run(n_adapt=...) "
                "for other chain shapes.".format(n_chain_dims)
            )
        n_warmup = int(n_warmup)
        if n_warmup < init_buffer + term_buffer + base_window:
            # Degenerate budget: plain step-size-only adaptation.
            return self.run(
                meta_bn, observed, state, key, n_warmup, n_adapt=n_warmup,
                collect=False,
            )[0]

        # Host-side static schedule.
        slow_lo = init_buffer
        slow_hi = n_warmup - term_buffer
        accumulate = np.zeros(n_warmup, dtype=bool)
        accumulate[slow_lo:slow_hi] = True
        install = np.zeros(n_warmup, dtype=bool)
        w, pos = base_window, slow_lo
        while pos + w < slow_hi:
            pos += w
            install[pos] = True
            w *= 2
        install[slow_hi - 1] = True  # final window installs at the end
        accumulate_j = jnp.asarray(accumulate)
        install_j = jnp.asarray(install)
        # Re-search + fresh-start dual averaging right after each mass
        # install (Stan re-initializes step-size adaptation at window
        # close; stale DA statistics would otherwise dominate the final
        # frozen step size).
        reinit = np.zeros(n_warmup, dtype=bool)
        reinit[1:] = install[:-1]
        reinit_j = jnp.asarray(reinit)

        dtype = state.step_size.dtype
        zeros = {k: jnp.zeros_like(v) for k, v in state.mass.items()}

        use_cache = not (
            self.experimental_fused_leapfrog
            or self._fused_step_likely(state.q)
        )

        def body(carry, i):
            st, k, cache, count, mean, m2 = carry
            k, sub = jax.random.split(k)
            st, _, *rest = self.sample(
                meta_bn, observed, st, sub,
                adapt_step_size=jnp.asarray(True),
                reinit_step_size=reinit_j[i],
                cache=cache,
            )
            cache = rest[0] if rest else None
            # Welford update over (iteration x chains) in the slow phase.
            acc = accumulate_j[i]
            n_chains = next(iter(st.q.values())).shape[0]
            new_count = count + jnp.where(acc, float(n_chains), 0.0)
            new_mean, new_m2 = {}, {}
            for name, x in st.q.items():
                # Batched Welford: fold the whole chain batch at once.
                batch_mean = jnp.mean(x, axis=0, keepdims=True)
                batch_m2 = jnp.sum(
                    (x - batch_mean) ** 2, axis=0, keepdims=True
                )
                delta = batch_mean - mean[name]
                tot = jnp.maximum(new_count, 1.0)
                m = mean[name] + delta * jnp.where(
                    acc, float(n_chains) / tot, 0.0
                )
                m2_new = m2[name] + jnp.where(
                    acc,
                    batch_m2 + delta ** 2 * count * n_chains / tot,
                    jnp.zeros_like(batch_m2),
                )
                new_mean[name] = m
                new_m2[name] = m2_new
            # Install regularized mass at window boundaries (Stan's
            # shrinkage toward unit: var*n/(n+5) + 1e-3*5/(n+5)).
            do_install = install_j[i] & acc
            n_eff = jnp.maximum(new_count - 1.0, 1.0)
            installed_mass = {}
            for name in st.q:
                var = new_m2[name] / n_eff
                var = (
                    var * (new_count / (new_count + 5.0))
                    + 1e-3 * (5.0 / (new_count + 5.0))
                )
                precision = 1.0 / jnp.maximum(var, 1e-10)
                installed_mass[name] = jnp.where(
                    do_install, precision, st.mass[name]
                )
            st = st._replace(mass=installed_mass)
            # Restart the accumulator after an install.
            new_count = jnp.where(do_install, 0.0, new_count)
            new_mean = {
                n: jnp.where(do_install, jnp.zeros_like(v), v)
                for n, v in new_mean.items()
            }
            new_m2 = {
                n: jnp.where(do_install, jnp.zeros_like(v), v)
                for n, v in new_m2.items()
            }
            return (st, k, cache, new_count, new_mean, new_m2), None

        cache0 = (
            self.make_cache(meta_bn, observed, state) if use_cache else None
        )
        carry0 = (state, key, cache0, jnp.zeros((), dtype), dict(zeros),
                  dict(zeros))
        (final_state, *_), _ = jax.lax.scan(
            body, carry0, jnp.arange(n_warmup)
        )
        return final_state
