"""Shared MCMC machinery: latent-dict handling and Hamiltonian helpers.

Parity: the free helper functions of reference ``zhusuan/hmc.py:21-61``
(``random_momentum``, ``velocity``, ``hamiltonian``, ``leapfrog_integrator``,
``get_acceptance_rate``), re-expressed over latent *dicts* (pytrees) instead
of lists, fully ``vmap``/``scan``-safe.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from zhusuan_tpu.framework.meta_bn import MetaBayesianNet
from zhusuan_tpu.utils import merge_dicts

__all__ = [
    "make_log_joint_fn",
    "tree_normal_like",
    "tree_random_momentum",
    "tree_velocity",
    "kinetic_energy",
    "hamiltonian",
    "leapfrog_step",
    "get_acceptance_rate",
    "get_acceptance_rate_cached",
    "dual_averaging_update",
    "ewmv_update",
    "scan_run_driver",
]

Latent = Dict[str, jnp.ndarray]


def make_log_joint_fn(meta_bn_or_log_joint, observed):
    """Build ``log_posterior(latent_dict) -> chain-shaped array``.

    Accepts a :class:`MetaBayesianNet` or a raw ``log_joint(obs_dict)``
    callable (parity: reference hmc.py:412-416, sgmcmc.py:121-133).
    """
    if isinstance(meta_bn_or_log_joint, MetaBayesianNet):
        log_joint = lambda obs: meta_bn_or_log_joint.observe(**obs).log_joint()
    elif callable(meta_bn_or_log_joint):
        log_joint = meta_bn_or_log_joint
    else:
        raise TypeError(
            "Expected a MetaBayesianNet or a callable log-joint function, "
            "got {!r}.".format(type(meta_bn_or_log_joint))
        )

    def log_posterior(latent: Latent):
        return log_joint(merge_dicts(latent, observed))

    return log_posterior


def on_cpu_backend() -> bool:
    """Trace-time guess of whether computation targets the CPU backend
    (best-effort: an explicit device_put to CPU on a TPU host is not
    detectable). Shared by the fused-kernel gates in hmc.py/sgmcmc.py."""
    default_dev = getattr(jax.config, "jax_default_device", None)
    return jax.default_backend() == "cpu" or (
        default_dev is not None
        and getattr(default_dev, "platform", None) == "cpu"
    )


def _data_axes(q: Latent, n_chain_dims: int):
    return {k: tuple(range(n_chain_dims, v.ndim)) for k, v in q.items()}


def tree_normal_like(key, like: Latent) -> Latent:
    """Unit-normal draws matching a latent dict's shapes/dtypes.

    The sorted-name key-split order is a reproducibility contract shared
    by every sampler family (momentum draws, RWM/MALA proposals, ESS
    ellipse draws, SGMCMC noise) — keep it in this one place.
    """
    names = sorted(like.keys())
    keys = jax.random.split(key, len(names))
    return {
        n: jax.random.normal(k, like[n].shape, like[n].dtype)
        for n, k in zip(names, keys)
    }


def tree_random_momentum(key, q: Latent, mass: Latent) -> Latent:
    """p[name] = randn(shape(q[name])) * sqrt(mass[name])
    (reference hmc.py:21-23)."""
    names = sorted(q.keys())
    keys = jax.random.split(key, len(names))
    return {
        name: jax.random.normal(k, q[name].shape, q[name].dtype)
        * jnp.sqrt(mass[name])
        for name, k in zip(names, keys)
    }


def tree_velocity(p: Latent, mass: Latent) -> Latent:
    """v = p / m (reference hmc.py:26-27)."""
    return {k: p[k] / mass[k] for k in p}


def dual_averaging_update(
    da_step, h_bar, log_eps_bar, step_size, mean_acceptance, gate,
    fresh_start, *, mu, target, gamma, t0, kappa,
):
    """One Nesterov dual-averaging step-size update (Hoffman & Gelman
    2014; reference hmc.py:89-112), shared by HMC, ChEES and the
    replica-exchange sampler. Fully ELEMENTWISE: scalars for one tuner,
    ``[n_temps]`` vectors for a per-rung ladder — same code.

    :param gate: traced bool — update when True, freeze (return the
        dual-averaged ``exp(log_eps_bar)``, or the current step size if
        adaptation never ran) when False.
    :param fresh_start: traced bool/mask restarting the accumulators this
        step (HMC's init-search re-trigger; first-iteration elsewhere).
    :return: ``(step_size, da_step, h_bar, log_eps_bar)`` updated-or-held
        per ``gate``.
    """
    # Pin to the tuner-state dtype: a wider-dtype density (f64 under the
    # x64 test backend with an f32 chain state) must not promote the
    # scan/while carry through the acceptance statistic.
    mean_acceptance = jnp.asarray(
        mean_acceptance, jnp.asarray(step_size).dtype)
    fs = jnp.where(fresh_start, 1.0, 0.0)
    new_step = (1.0 - fs) * da_step + 1.0
    rate1 = 1.0 / (new_step + t0)
    new_h_bar = (1.0 - fs) * (1.0 - rate1) * h_bar + rate1 * (
        target - mean_acceptance
    )
    log_eps = mu - jnp.sqrt(new_step) / gamma * new_h_bar
    pow_ = jnp.power(new_step, -kappa)
    new_log_eps_bar = (
        pow_ * log_eps + (1.0 - fs) * (1.0 - pow_) * log_eps_bar
    )
    # If dual averaging never ran (da_step == 0), exp(log_eps_bar) would
    # be exp(0) = 1 regardless of configuration; fall back to the current
    # step size instead.
    frozen = jnp.where(da_step > 0, jnp.exp(log_eps_bar), step_size)
    return (
        jnp.where(gate, jnp.exp(log_eps), frozen),
        jnp.where(gate, new_step, da_step),
        jnp.where(gate, new_h_bar, h_bar),
        jnp.where(gate, new_log_eps_bar, log_eps_bar),
    )


def ewmv_update(q, ewmv_t, ewmv_mean, ewmv_var, gate, n_chain_dims, decay):
    """One EW moving-variance accumulator update over the chain axes
    (reference hmc.py:115-159), gated by the traced bool ``gate``.
    Shared by :class:`~zhusuan_tpu.mcmc.hmc.HMC` and
    :class:`~zhusuan_tpu.mcmc.nuts.NUTS` mass adaptation.

    :return: ``(new_t, new_mean, new_var)`` — held when ``gate`` is False.
    """
    chain_axes = tuple(range(n_chain_dims))
    new_t = ewmv_t + jnp.where(gate, 1.0, 0.0)
    safe_t = jnp.maximum(new_t, 1.0)
    weight = (1.0 - decay) / (1.0 - decay ** safe_t)
    new_mean, new_var = {}, {}
    for k, x in q.items():
        incr = weight * (x - ewmv_mean[k])
        mean_k = ewmv_mean[k] + jnp.mean(
            incr, axis=chain_axes, keepdims=True
        )
        var_k = (1.0 - weight) * ewmv_var[k] + jnp.mean(
            incr * (x - mean_k), axis=chain_axes, keepdims=True
        )
        new_mean[k] = jnp.where(gate, mean_k, ewmv_mean[k])
        new_var[k] = jnp.where(gate, var_k, ewmv_var[k])
    return new_t, new_mean, new_var


def kinetic_energy(
    q: Latent, p: Latent, mass: Latent, n_chain_dims: int
) -> jnp.ndarray:
    """0.5 * sum p^2/m over data axes (reference hmc.py:30-35),
    chain-shaped. ``q`` only supplies the data-axis layout."""
    axes = _data_axes(q, n_chain_dims)
    kinetic = None
    for k in q:
        term = 0.5 * jnp.sum(jnp.square(p[k]) / mass[k], axis=axes[k])
        kinetic = term if kinetic is None else kinetic + term
    return kinetic


def hamiltonian(
    q: Latent,
    p: Latent,
    log_posterior: Callable[[Latent], jnp.ndarray],
    mass: Latent,
    n_chain_dims: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """H = -log_post(q) + 0.5 * sum p^2/m over data axes
    (reference hmc.py:30-35). Returns ``(H, log_post)``, both chain-shaped.
    """
    log_p = log_posterior(q)
    potential = -log_p
    return potential + kinetic_energy(q, p, mass, n_chain_dims), log_p


def leapfrog_step(q, p, step_size1, step_size2, grad_fn, mass):
    """One generalized leapfrog sub-step: drift by ``step_size1``, then kick
    by ``step_size2`` (reference hmc.py:38-43)."""
    v = tree_velocity(p, mass)
    q = {k: q[k] + step_size1 * v[k] for k in q}
    grads = grad_fn(q)
    p = {k: p[k] + step_size2 * grads[k] for k in p}
    return q, p


def get_acceptance_rate(
    q, p, new_q, new_p, log_posterior, mass, n_chain_dims
):
    """MH acceptance with the non-finite -> reject guard
    (reference hmc.py:46-61: non-finite acceptance or log-prob gives rate 0
    — this IS the sampler's fault tolerance, SURVEY.md §5).

    Returns (old_hamiltonian, new_hamiltonian, old_log_prob, new_log_prob,
    acceptance_rate), all chain-shaped.
    """
    old_h, old_log_prob = hamiltonian(q, p, log_posterior, mass, n_chain_dims)
    return _finish_acceptance(
        old_h, old_log_prob, new_q, new_p, log_posterior, mass, n_chain_dims
    )


def get_acceptance_rate_cached(
    q, p, new_q, new_p, log_posterior, mass, n_chain_dims, old_log_prob
):
    """Same as :func:`get_acceptance_rate` but with ``log_posterior(q)``
    supplied by the caller (carried across iterations: the previous
    iteration already evaluated the density at the retained-or-accepted
    position, so recomputing it is pure waste — see PERF.md)."""
    old_h = -old_log_prob + kinetic_energy(q, p, mass, n_chain_dims)
    return _finish_acceptance(
        old_h, old_log_prob, new_q, new_p, log_posterior, mass, n_chain_dims
    )


def scan_run_driver(one, pick, state, key, n_iters, collect, thinning):
    """Generic on-device run loop shared by the Metropolis-family and
    slice samplers: a ``lax.scan`` over iterations with optional
    memory-bounded thinning (inner ``fori_loop``, scanned remainder on
    the SAME key thread — the ``SGMCMC.run`` recipe, sgmcmc.py:160-180).
    Key threading is identical whether thinned or not, so the stacked
    output IS the full trajectory sliced ``thinning-1::thinning``
    bit-for-bit, and the final state matches the unthinned run for any
    ``n_iters``.

    :param one: ``(state, key) -> (state, key, info)`` — one transition
        (the caller bakes adaptation gating into it).
    :param pick: ``info -> {field: value}`` — which outputs to stack.
    :param collect: stack per-iteration outputs when True; otherwise only
        the final state is returned (burn-in at zero memory cost).
    :param thinning: stack every ``thinning``-th iteration only.
    :return: ``(final_state, outs_or_None)``.
    """
    if int(thinning) < 1:
        raise ValueError("thinning must be >= 1.")
    thinning = int(thinning)

    if collect and thinning > 1:
        n_out = n_iters // thinning

        # fori_loop needs a uniform carry; run the first inner step
        # outside to seed an info structure.
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


def _finish_acceptance(
    old_h, old_log_prob, new_q, new_p, log_posterior, mass, n_chain_dims
):
    new_h, new_log_prob = hamiltonian(
        new_q, new_p, log_posterior, mass, n_chain_dims
    )
    acceptance_rate = jnp.exp(jnp.minimum(old_h - new_h, 0.0))
    is_finite = jnp.isfinite(acceptance_rate) & jnp.isfinite(new_log_prob)
    acceptance_rate = jnp.where(
        is_finite, acceptance_rate, jnp.zeros_like(acceptance_rate)
    )
    return old_h, new_h, old_log_prob, new_log_prob, acceptance_rate
