"""Stochastic-gradient MCMC: SGLD, PSGLD, SGHMC, SGNHT.

Capability parity with reference ``zhusuan/sgmcmc.py`` (523 LoC): the
``SGMCMC.sample`` contract (sgmcmc.py:119-161), SGLD (Welling & Teh 2011,
Eq. 3; sgmcmc.py:170-200), PSGLD with the RMSprop preconditioner (Li et al.
2015, Eq. 4-5; sgmcmc.py:203-257), SGHMC (Chen et al. 2014, Eq. 15) with the
optional 2nd-order symmetric-splitting integrator (Chen et al. 2015)
(sgmcmc.py:260-371), and SGNHT (Ding et al. 2014, Alg. 2) with scalar or
per-coordinate thermostat (sgmcmc.py:374-523).

TPU-native design (SURVEY.md §2.7 [TPU]): every sampler is a pure kernel
``sample(state, key) -> (state, info)`` iterated by ``lax.scan``; momentum,
preconditioner and thermostat variables are fields of the explicit
:class:`SGMCMCState` pytree. Minibatch gradients for data-parallel runs are
``pmean``-reduced over a device mesh (see ``zhusuan_tpu.parallel``).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from zhusuan_tpu.mcmc.base import (
    make_log_joint_fn,
    on_cpu_backend,
    tree_normal_like,
)

__all__ = ["SGMCMC", "SGMCMCState", "SGMCMCInfo", "SGLD", "PSGLD", "SGHMC", "SGNHT"]

Latent = Dict[str, jnp.ndarray]


class SGMCMCState(NamedTuple):
    """Explicit sampler state. Unused auxiliary fields are empty dicts."""

    q: Latent
    t: jnp.ndarray  # iteration counter (int32)
    v: Latent  # momentum (SGHMC/SGNHT)
    alpha: Latent  # thermostat (SGNHT)
    rms: Latent  # RMSprop accumulator (PSGLD)


class SGMCMCInfo(NamedTuple):
    """Per-iteration statistics (parity: reference ``SGMCMCInfo`` namedtuple,
    sgmcmc.py:102-117 — attrs are dicts keyed by latent name)."""

    q: Latent
    mean_k: Optional[Dict[str, jnp.ndarray]] = None
    alpha: Optional[Dict[str, jnp.ndarray]] = None


def _tree_normal(key, like: Latent, stddev):
    return {
        n: stddev * x for n, x in tree_normal_like(key, like).items()
    }


def _fused_gate(q):
    """Shared applicability gate for the fused Pallas transitions: returns
    the single latent name when the fused path can engage (single 2-D f32
    latent on a non-CPU backend), else None. The per-kernel shape/consts
    checks happen at the call site."""
    if len(q) != 1:
        return None
    (name,) = q.keys()
    arr = q[name]
    if on_cpu_backend() or arr.ndim != 2 or arr.dtype != jnp.float32:
        return None
    return name


class SGMCMC:
    """Base class: the shared ``sample``/``run`` driver.

    Subclasses implement ``_init_aux(key, q)`` and
    ``_update(state, grads_fn, key) -> (new_state_fields, info)``.
    """

    def _lr(self, t):
        lr = self.learning_rate
        if callable(lr):
            return lr(t)
        return jnp.asarray(lr)

    def init(self, latent: Latent, key=None) -> SGMCMCState:
        """Create the initial state from initial positions. Samplers with
        momentum (SGHMC/SGNHT) need a ``key`` to initialize it."""
        q = {k: jnp.asarray(v) for k, v in latent.items()}
        t = jnp.zeros((), jnp.int32)
        return self._init_state(q, t, key)

    def _init_state(self, q, t, key):
        return SGMCMCState(q=q, t=t, v={}, alpha={}, rms={})

    def _maybe_resample_v(self, state, key, lr):
        """Resample momentum every ``n_iter_resample_v`` iterations (0
        disables). Shared by SGHMC/SGNHT (reference sgmcmc.py:326-337).

        Uses ``lax.cond`` so the fresh draw only executes on resample
        iterations — a where-select would pay a full normal draw every
        iteration (~35% of an SGHMC step at 32768x100, PERF.md)."""
        if self.n_iter_resample_v == 0:
            return state.v
        resample = (state.t % self.n_iter_resample_v) == 0
        return jax.lax.cond(
            resample,
            lambda: _tree_normal(key, state.v, jnp.sqrt(lr)),
            lambda: state.v,
        )

    def sample(self, meta_bn, observed, state: SGMCMCState, key):
        """One SGMCMC iteration: pure ``(state, key) -> (state, info)``.

        Parity: the ``sample(meta_bn, observed, latent)`` contract of
        reference sgmcmc.py:119-161, with the latent dict living in
        ``state.q`` instead of tf.Variables.
        """
        log_post = make_log_joint_fn(meta_bn, observed)

        def grad_fn(qq):
            return jax.grad(lambda v: jnp.sum(log_post(v)))(qq)

        new_state, info = self._update(state, grad_fn, key)
        return new_state, info

    def run(
        self,
        meta_bn,
        observed,
        state: SGMCMCState,
        key,
        n_iters: int,
        collect: bool = True,
        thinning: int = 1,
        collect_info: bool = False,
    ):
        """Run ``n_iters`` iterations on-device via ``lax.scan``.

        :param collect: stack per-iteration ``q`` (thinned) when True.
        :param collect_info: additionally stack the full per-iteration
            :class:`SGMCMCInfo` (mean kinetic energy, thermostat values);
            composes with ``thinning`` (every ``thinning``-th info).
        :return: ``(final_state, stacked_q_or_None)`` — or
            ``(final_state, stacked_q, stacked_info)`` when
            ``collect_info``.
        """

        def one(st, k):
            k, sub = jax.random.split(k)
            st2, info = self.sample(meta_bn, observed, st, sub)
            return st2, k, info

        if collect and thinning > 1:
            # Memory-bounded thinning: inner loop of `thinning` un-collected
            # iterations per emitted draw (stacking all n_iters and slicing
            # afterwards would allocate the full trajectory). The HMC.run
            # recipe: first inner step outside the fori_loop to seed a
            # uniform info carry; the remainder advances on the SAME key
            # thread so the final state matches the unthinned run
            # bit-for-bit for any n_iters.
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
                return (st, k), ((info.q, info) if collect_info
                                 else info.q)

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
            if collect_info:
                qs, infos = outs
                return final_state, qs, infos
            return final_state, outs

        def body(carry, _):
            st, k = carry
            st2, k, info = one(st, k)
            out = info.q if collect else None
            if collect_info:
                out = (out, info)
            return (st2, k), out

        (final_state, _), outs = jax.lax.scan(
            body, (state, key), None, length=n_iters
        )
        if collect_info:
            qs, infos = outs
            return final_state, qs, infos
        return final_state, outs


class SGLD(SGMCMC):
    """Stochastic Gradient Langevin Dynamics (Welling & Teh 2011, Eq. 3).

    Update (reference sgmcmc.py:195-200):
    ``q += 0.5*lr*grad + Normal(0, sqrt(lr))``.

    :param learning_rate: float, traced scalar, or callable ``t -> lr`` for
        decaying schedules (replaces the reference's feed-dict placeholder).
    :param experimental_fused_step: run the whole update (noise + gradient
        + position) in one Pallas VMEM kernel
        (:mod:`zhusuan_tpu.ops.sgld_step`) when the latent is a single
        ``[n_chains, dim]`` array on a non-CPU backend. Same distribution,
        different random stream (hardware PRNG; deterministic per key);
        silently falls back to the scan path otherwise.
    """

    def __init__(self, learning_rate: Union[float, Callable],
                 experimental_fused_step: bool = False):
        self.learning_rate = learning_rate
        self.experimental_fused_step = bool(experimental_fused_step)

    def _update(self, state, grad_fn, key):
        lr = self._lr(state.t)
        if getattr(self, "experimental_fused_step", False) and                 type(self) is SGLD:
            fused_q = self._try_fused(state, grad_fn, key, lr)
            if fused_q is not None:
                new_state = state._replace(q=fused_q, t=state.t + 1)
                return new_state, SGMCMCInfo(q=fused_q)
        grads = grad_fn(state.q)
        noise = _tree_normal(key, state.q, jnp.sqrt(lr))
        new_q = {
            k: state.q[k] + 0.5 * lr * grads[k] + noise[k] for k in state.q
        }
        new_state = state._replace(q=new_q, t=state.t + 1)
        return new_state, SGMCMCInfo(q=new_q)

    def _try_fused(self, state, grad_fn, key, lr):
        """Fused-path applicability check mirroring HMC's (hmc.py)."""
        q = state.q
        name = _fused_gate(q)
        if name is None:
            return None
        arr = q[name]
        from zhusuan_tpu.ops.sgld_step import (
            consts_fit_vmem, fused_sgld_step, sgld_step_supported,
        )

        def single_grad(x):
            return grad_fn({name: x})[name]

        if not sgld_step_supported(arr.shape, itemsize=arr.dtype.itemsize):
            return None
        probe = jax.ShapeDtypeStruct(
            (min(256, arr.shape[0]), arr.shape[1]), arr.dtype
        )
        if not consts_fit_vmem((single_grad,), probe):
            return None
        return {name: fused_sgld_step(single_grad, arr, lr, key)}


class PSGLD(SGLD):
    """Preconditioned SGLD with the RMSprop preconditioner (Li et al. 2015,
    Eq. 4-5; reference sgmcmc.py:203-257).

    Aux: ``rms = decay*rms + (1-decay)*grad**2``;
    ``G = 1/(epsilon + sqrt(rms))``;
    update ``q += 0.5*lr*G*grad + Normal(0, sqrt(lr*G))``.

    :param experimental_fused_step: run the whole update (noise + gradient
        + preconditioner + position) in one Pallas VMEM kernel
        (:mod:`zhusuan_tpu.ops.psgld_step`) when the latent is a single
        ``[n_chains, dim]`` float32 array on a non-CPU backend. Same
        distribution, different random stream (hardware PRNG,
        deterministic per key); silently falls back otherwise.
    """

    def __init__(self, learning_rate, decay: float = 0.9,
                 epsilon: float = 1e-3,
                 experimental_fused_step: bool = False):
        super().__init__(learning_rate,
                         experimental_fused_step=experimental_fused_step)
        self.decay = float(decay)
        self.epsilon = float(epsilon)

    def _init_state(self, q, t, key):
        rms = {k: jnp.zeros_like(v) for k, v in q.items()}
        return SGMCMCState(q=q, t=t, v={}, alpha={}, rms=rms)

    def _try_fused_psgld(self, state, grad_fn, key, lr):
        """Applicability gate mirroring SGLD._try_fused."""
        name = _fused_gate(state.q)
        if name is None:
            return None
        arr = state.q[name]
        from zhusuan_tpu.ops.psgld_step import (
            consts_fit_vmem, fused_psgld_step, psgld_step_supported,
        )

        def single_grad(x):
            return grad_fn({name: x})[name]

        if not psgld_step_supported(arr.shape, itemsize=arr.dtype.itemsize):
            return None
        probe = jax.ShapeDtypeStruct(
            (min(256, arr.shape[0]), arr.shape[1]), arr.dtype
        )
        if not consts_fit_vmem((single_grad,), probe):
            return None
        new_q, new_rms = fused_psgld_step(
            single_grad, arr, state.rms[name], lr, self.decay,
            self.epsilon, key,
        )
        return {name: new_q}, {name: new_rms}

    def _update(self, state, grad_fn, key):
        lr = self._lr(state.t)
        if self.experimental_fused_step:
            fused = self._try_fused_psgld(state, grad_fn, key, lr)
            if fused is not None:
                new_q, new_rms = fused
                new_state = state._replace(
                    q=new_q, rms=new_rms, t=state.t + 1
                )
                return new_state, SGMCMCInfo(q=new_q)
        grads = grad_fn(state.q)
        new_rms = {
            k: self.decay * state.rms[k] + (1 - self.decay) * grads[k] ** 2
            for k in state.q
        }
        g = {k: 1.0 / (self.epsilon + jnp.sqrt(new_rms[k])) for k in state.q}
        names = sorted(state.q.keys())
        keys = jax.random.split(key, len(names))
        new_q = {}
        for k, kk in zip(names, keys):
            noise = jnp.sqrt(lr * g[k]) * jax.random.normal(
                kk, state.q[k].shape, state.q[k].dtype
            )
            new_q[k] = state.q[k] + 0.5 * lr * g[k] * grads[k] + noise
        new_state = state._replace(q=new_q, t=state.t + 1, rms=new_rms)
        return new_state, SGMCMCInfo(q=new_q)


class SGHMC(SGMCMC):
    """Stochastic Gradient HMC (Chen et al. 2014, Eq. 15) with optional
    2nd-order symmetric splitting integrator (Chen et al. 2015).

    Parity: reference sgmcmc.py:260-371 — momentum resampled every
    ``n_iter_resample_v`` iterations; noise stddev ``sqrt(2*(alpha-beta)*lr)``;
    1st-order: ``v' = (1-alpha)*v + lr*grad(q) + noise; q' = q + v'``;
    2nd-order: ``q1 = q + v/2;
    v' = e^{-alpha/2}(e^{-alpha/2} v + lr*grad(q1) + noise); q' = q1 + v'/2``.
    Info carries per-variable mean kinetic energy.

    :param learning_rate: eta in Eq. 15 (O(step^2)).
    :param friction: alpha.
    :param variance_estimate: beta (must be < alpha).
    :param n_iter_resample_v: momentum resample period (0/None disables).
    :param second_order: enable the 2nd-order integrator.
    :param experimental_fused_step: run the whole update (noise + gradient
        + integrator + kinetic sums) in one Pallas VMEM kernel
        (:mod:`zhusuan_tpu.ops.sghmc_step`) when the latent is a single
        ``[n_chains, dim]`` float32 array on a non-CPU backend. Same
        distribution, different random stream (hardware PRNG,
        deterministic per key); silently falls back to the scan path
        otherwise.
    """

    def __init__(self, learning_rate, friction: float = 0.25,
                 variance_estimate: float = 0.0,
                 n_iter_resample_v: Optional[int] = 20,
                 second_order: bool = True,
                 experimental_fused_step: bool = False):
        self.learning_rate = learning_rate
        self.alpha = float(friction)
        self.beta = float(variance_estimate)
        if not self.beta < self.alpha:
            raise ValueError(
                "variance_estimate (beta={}) must be < friction (alpha={}) "
                "— the injected noise variance 2*(alpha-beta)*lr must be "
                "positive.".format(self.beta, self.alpha)
            )
        self.n_iter_resample_v = int(n_iter_resample_v or 0)
        self.second_order = bool(second_order)
        # Fused Pallas transition (ops/sghmc_step.py): same contract as
        # SGLD/HMC's experimental_fused_step (silent scan fallback when
        # not applicable; hardware-PRNG stream, deterministic per key).
        self.experimental_fused_step = bool(experimental_fused_step)

    def _init_state(self, q, t, key):
        if key is None:
            raise ValueError("SGHMC.init requires a PRNG key (momentum init).")
        lr0 = self._lr(t)
        v = _tree_normal(key, q, jnp.sqrt(lr0))
        return SGMCMCState(q=q, t=t, v=v, alpha={}, rms={})

    def _update(self, state, grad_fn, key):
        key_r, key_n = jax.random.split(key)
        lr = self._lr(state.t)
        old_v = self._maybe_resample_v(state, key_r, lr)
        if self.experimental_fused_step:
            fused = self._try_fused(state, old_v, grad_fn, key_n, lr)
            if fused is not None:
                new_q, new_v, mean_k = fused
                new_state = state._replace(q=new_q, v=new_v, t=state.t + 1)
                return new_state, SGMCMCInfo(q=new_q, mean_k=mean_k)
        noise = _tree_normal(
            key_n, old_v, jnp.sqrt(2 * (self.alpha - self.beta) * lr)
        )
        if not self.second_order:
            grads = grad_fn(state.q)
            new_v = {
                k: (1 - self.alpha) * old_v[k] + lr * grads[k] + noise[k]
                for k in state.q
            }
            new_q = {k: state.q[k] + new_v[k] for k in state.q}
        else:
            decay_half = jnp.exp(-0.5 * self.alpha)
            q1 = {k: state.q[k] + 0.5 * old_v[k] for k in state.q}
            grads = grad_fn(q1)
            new_v = {
                k: decay_half
                * (decay_half * old_v[k] + lr * grads[k] + noise[k])
                for k in state.q
            }
            new_q = {k: q1[k] + 0.5 * new_v[k] for k in state.q}
        mean_k = {k: jnp.mean(new_v[k] ** 2) for k in state.q}
        new_state = state._replace(q=new_q, v=new_v, t=state.t + 1)
        return new_state, SGMCMCInfo(q=new_q, mean_k=mean_k)

    def _try_fused(self, state, old_v, grad_fn, key, lr):
        """Applicability gate mirroring SGLD._try_fused."""
        q = state.q
        name = _fused_gate(q)
        if name is None:
            return None
        arr = q[name]
        from zhusuan_tpu.ops.sghmc_step import (
            consts_fit_vmem, fused_sghmc_step, sghmc_step_supported,
        )

        def single_grad(x):
            return grad_fn({name: x})[name]

        if not sghmc_step_supported(arr.shape, itemsize=arr.dtype.itemsize):
            return None
        probe = jax.ShapeDtypeStruct(
            (min(256, arr.shape[0]), arr.shape[1]), arr.dtype
        )
        if not consts_fit_vmem((single_grad,), probe):
            return None
        new_q, new_v, vsq = fused_sghmc_step(
            single_grad, arr, old_v[name], lr, self.alpha, self.beta,
            self.second_order, key,
        )
        n_elems = arr.shape[0] * arr.shape[1]
        mean_k = {name: jnp.sum(vsq) / float(n_elems)}
        return {name: new_q}, {name: new_v}, mean_k


class SGNHT(SGMCMC):
    """Stochastic Gradient Nosé-Hoover Thermostat (Ding et al. 2014, Alg. 2)
    with auto-tuned friction, scalar or per-coordinate.

    Parity: reference sgmcmc.py:374-523 — noise stddev ``sqrt(2*a*lr)``;
    1st-order: ``v' = (1-alpha)*v + lr*grad + noise; q' = q + v';
    alpha' = alpha + tune_rate*(mean(v'^2) - lr)``; 2nd-order with half-step
    thermostat updates and ``exp(-alpha1/2)`` decay.

    :param use_vector_alpha: per-coordinate friction when True (alpha has the
        latent's shape), scalar otherwise.
    :param experimental_fused_step: run the whole update (noise + gradient
        + integrator + thermostat) in one Pallas VMEM kernel
        (:mod:`zhusuan_tpu.ops.sgnht_step`) when the latent is a single
        ``[n_chains, dim]`` float32 array on a non-CPU backend AND
        ``use_vector_alpha`` is set (the scalar thermostat needs a global
        ``mean(v^2)`` — a cross-block reduction — and always takes the
        scan path). Same distribution, different random stream (hardware
        PRNG, deterministic per key); silently falls back otherwise.
    """

    def __init__(self, learning_rate, variance_extra: float = 0.0,
                 tune_rate: float = 1.0,
                 n_iter_resample_v: Optional[int] = None,
                 second_order: bool = True, use_vector_alpha: bool = True,
                 experimental_fused_step: bool = False):
        self.learning_rate = learning_rate
        self.a = float(variance_extra)
        self.tune_rate = float(tune_rate)
        self.n_iter_resample_v = int(n_iter_resample_v or 0)
        self.second_order = bool(second_order)
        self.use_vector_alpha = bool(use_vector_alpha)
        self.experimental_fused_step = bool(experimental_fused_step)

    def _init_state(self, q, t, key):
        if key is None:
            raise ValueError("SGNHT.init requires a PRNG key (momentum init).")
        lr0 = self._lr(t)
        v = _tree_normal(key, q, jnp.sqrt(lr0))
        if self.use_vector_alpha:
            alpha = {k: self.a * jnp.ones_like(x) for k, x in q.items()}
        else:
            alpha = {k: jnp.asarray(self.a, x.dtype) for k, x in q.items()}
        return SGMCMCState(q=q, t=t, v=v, alpha=alpha, rms={})

    def _maybe_reduce_mean(self, x):
        return x if self.use_vector_alpha else jnp.mean(x)

    def _update(self, state, grad_fn, key):
        key_r, key_n = jax.random.split(key)
        lr = self._lr(state.t)
        old_v = self._maybe_resample_v(state, key_r, lr)
        if self.experimental_fused_step and self.use_vector_alpha:
            fused = self._try_fused(state, old_v, grad_fn, key_n, lr)
            if fused is not None:
                new_q, new_v, new_alpha = fused
                name = next(iter(new_q))
                mean_k = {name: new_v[name] ** 2}
                new_state = state._replace(
                    q=new_q, v=new_v, alpha=new_alpha, t=state.t + 1
                )
                return new_state, SGMCMCInfo(
                    q=new_q, mean_k=mean_k, alpha=new_alpha
                )
        noise = _tree_normal(key_n, old_v, jnp.sqrt(2 * self.a * lr))
        if not self.second_order:
            grads = grad_fn(state.q)
            new_v = {
                k: (1 - state.alpha[k]) * old_v[k] + lr * grads[k] + noise[k]
                for k in state.q
            }
            new_q = {k: state.q[k] + new_v[k] for k in state.q}
            mean_k = {
                k: self._maybe_reduce_mean(new_v[k] ** 2) for k in state.q
            }
            new_alpha = {
                k: state.alpha[k] + self.tune_rate * (mean_k[k] - lr)
                for k in state.q
            }
        else:
            q1 = {k: state.q[k] + 0.5 * old_v[k] for k in state.q}
            mean_k1 = {
                k: self._maybe_reduce_mean(old_v[k] ** 2) for k in state.q
            }
            alpha1 = {
                k: state.alpha[k] + 0.5 * self.tune_rate * (mean_k1[k] - lr)
                for k in state.q
            }
            decay_half = {k: jnp.exp(-0.5 * alpha1[k]) for k in state.q}
            grads = grad_fn(q1)
            new_v = {
                k: decay_half[k]
                * (decay_half[k] * old_v[k] + lr * grads[k] + noise[k])
                for k in state.q
            }
            new_q = {k: q1[k] + 0.5 * new_v[k] for k in state.q}
            mean_k = {
                k: self._maybe_reduce_mean(new_v[k] ** 2) for k in state.q
            }
            new_alpha = {
                k: alpha1[k] + 0.5 * self.tune_rate * (mean_k[k] - lr)
                for k in state.q
            }
        new_state = state._replace(
            q=new_q, v=new_v, alpha=new_alpha, t=state.t + 1
        )
        return new_state, SGMCMCInfo(q=new_q, mean_k=mean_k, alpha=new_alpha)

    def _try_fused(self, state, old_v, grad_fn, key, lr):
        """Applicability gate mirroring SGHMC._try_fused (vector alpha
        only — the scalar thermostat needs a cross-block reduction)."""
        q = state.q
        name = _fused_gate(q)
        if name is None:
            return None
        arr = q[name]
        from zhusuan_tpu.ops.sgnht_step import (
            consts_fit_vmem, fused_sgnht_step, sgnht_step_supported,
        )

        def single_grad(x):
            return grad_fn({name: x})[name]

        if not sgnht_step_supported(arr.shape, itemsize=arr.dtype.itemsize):
            return None
        probe = jax.ShapeDtypeStruct(
            (min(256, arr.shape[0]), arr.shape[1]), arr.dtype
        )
        if not consts_fit_vmem((single_grad,), probe):
            return None
        new_q, new_v, new_alpha = fused_sgnht_step(
            single_grad, arr, old_v[name], state.alpha[name], lr, self.a,
            self.tune_rate, self.second_order, key,
        )
        return {name: new_q}, {name: new_v}, {name: new_alpha}
