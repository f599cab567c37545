"""Neural-transport (NeuTra) preconditioning for MCMC.

Beyond the reference (whose HMC has only the diagonal EW mass,
zhusuan/hmc.py:115-159): the NONLINEAR generalization of
:mod:`zhusuan_tpu.mcmc.precondition`'s coordinate whitening. A RealNVP
coupling flow ``x = f(y)`` is fitted to the posterior by SGVB
(Hoffman et al. 2019, "NeuTra-lizing Bad Geometry in Hamiltonian Monte
Carlo Using Neural Transport", arXiv:1903.03704), then any sampler runs
in the flow's latent coordinates ``y`` under the pullback density

    log p_lat(y) = log p(f(y)) + log|det J_f(y)|,

which the trained flow has bent toward a standard normal — funnels,
bananas and other position-dependent curvature that defeat a constant
(even dense) mass matrix become near-isotropic.

TPU-first design notes:

- The flow fit is ONE ``lax.scan`` program on-device (the
  :func:`zhusuan_tpu.variational.advi` pattern — per-step host dispatch
  costs 10-40x through the tunnel, PERF.md).
- Couplings (not IAF/planar) are the right flow here: the latent density
  needs ``f`` and ``log|det J_f|`` in ONE vectorized pass per HMC
  gradient — RealNVP gives both (transform.py:176-206); planar has no
  closed inverse and IAF's density direction is sequential.
- The transported latent stays a single ``[n_chains, d]`` array and the
  flow parameters are small closure constants, so the fused Pallas HMC
  transition (ops/hmc_step.py), ChEES and chain sharding all apply to
  the NeuTra-lifted density verbatim.

Typical use::

    res = zs.mcmc.fit_neutra(log_joint, "z", d, key)
    lat_lj, to_lat, from_lat = zs.mcmc.neutra_log_joint(
        log_joint, "z", res.params)
    state = hmc.init({"z": jnp.zeros((n_chains, d))}, n_chain_dims=1)
    state, out = hmc.run(lat_lj, {}, state, key2, 1000, n_adapt=500)
    q_samples = from_lat(out["samples"]["z"])
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.transform import affine_coupling_flow, init_affine_coupling

__all__ = ["fit_neutra", "neutra_log_joint", "NeuTraResult"]


class NeuTraResult(NamedTuple):
    """Output of :func:`fit_neutra`: the fitted coupling-flow parameters
    plus the per-iteration negative-ELBO trace for convergence
    inspection."""

    params: list
    losses: jnp.ndarray  # [n_iters] negative ELBO per step


def _as_log_joint(log_joint):
    from zhusuan_tpu.mcmc.base import make_log_joint_fn

    return make_log_joint_fn(log_joint, {})


def fit_neutra(
    log_joint,
    name: str,
    d: int,
    key,
    n_flows: int = 6,
    hidden: int = 32,
    n_iters: int = 2000,
    n_particles: int = 64,
    learning_rate: float = 1e-2,
    optimizer=None,
    dtype=jnp.float32,
) -> NeuTraResult:
    """Fit a RealNVP transport ``x = f(y)`` to the posterior of latent
    ``name`` by SGVB, entirely on-device (one ``lax.scan``).

    The flow pushes ``N(0, I_d)`` forward onto the posterior; the loss is
    the negative ELBO ``E_y[log q(f(y)) - log p(f(y))]`` with the exact
    flow density from the accumulated log-det.

    :param log_joint: ``log_joint(obs_dict)`` callable or a
        MetaBayesianNet (unwrapped to its log-joint; latents other than
        ``name`` must be observed/absent).
    :param name: the latent to transport (data shape must be ``[d]``).
    :param d: latent dimension (>= 2 — couplings split the axis).
    :param key: PRNG key.
    :param n_flows: number of stacked affine couplings.
    :param hidden: coupling-MLP hidden width.
    :param n_iters: optimization steps (one scan program).
    :param n_particles: ELBO particles per step.
    :param learning_rate: Adam with cosine decay to 10% (ignored when
        ``optimizer`` is given).
    :return: :class:`NeuTraResult`.
    """
    import optax

    if int(d) < 2:
        raise ValueError(
            "NeuTra couplings need d >= 2 (got d={}); for 1-D latents "
            "use whiten_log_joint or a bijector.".format(d)
        )
    lj = _as_log_joint(log_joint)
    k_init, k_fit = jax.random.split(jnp.asarray(key))
    params = init_affine_coupling(k_init, int(n_flows), int(d),
                                  hidden=int(hidden), dtype=dtype)
    if optimizer is None:
        optimizer = optax.adam(
            optax.cosine_decay_schedule(
                learning_rate, max(int(n_iters), 1), 0.1
            )
        )
    opt_state = optimizer.init(params)
    half_log_2pi = float(0.5 * np.log(2.0 * np.pi))

    def loss_fn(p, k):
        z = jax.random.normal(k, (int(n_particles), int(d)), dtype)
        base_lp = jnp.sum(
            -0.5 * z * z - half_log_2pi, axis=-1
        )
        x, log_q = affine_coupling_flow(z, base_lp, p)
        return jnp.mean(log_q - lj({name: x}))

    def step(carry, k):
        p, s = carry
        val, grads = jax.value_and_grad(loss_fn)(p, k)
        upd, s = optimizer.update(grads, s, p)
        return (optax.apply_updates(p, upd), s), val

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state),
        jax.random.split(k_fit, int(n_iters)),
    )
    return NeuTraResult(params=params, losses=losses)


def neutra_log_joint(log_joint, name: str, params):
    """Build the NeuTra-lifted density and the coordinate maps for latent
    ``name``.

    In transported coordinates ``y`` the density is
    ``log p(f(y)) + log|det J_f(y)|`` — unlike the linear whitening case
    the Jacobian term is position-dependent and must stay in the density
    (it is one fused vectorized pass, shared with the evaluation of
    ``f``).

    :param log_joint: the original ``log_joint(obs_dict)`` callable or a
        MetaBayesianNet.
    :param name: which latent is transported (data shape ``[d]``).
    :param params: fitted coupling parameters
        (:attr:`NeuTraResult.params`).
    :return: ``(latent_log_joint, to_latent, from_latent)`` — the lifted
        density over ``{name: y}`` plus vectorized maps ``x -> y``
        (exact closed-form coupling inverse) and ``y -> x`` acting on
        ``[..., d]`` arrays.
    """
    lj = _as_log_joint(log_joint)

    def _flow(arr, inverse):
        arr = jnp.asarray(arr)
        flat = arr.reshape((-1, arr.shape[-1]))
        zeros = jnp.zeros(flat.shape[:-1], flat.dtype)
        out, delta = affine_coupling_flow(flat, zeros, params,
                                          inverse=inverse)
        return (out.reshape(arr.shape),
                delta.reshape(arr.shape[:-1]))

    def latent_log_joint(obs):
        y = jnp.asarray(obs[name])
        squeeze = y.ndim == 1
        if squeeze:
            y = y[None]
        zeros = jnp.zeros(y.shape[:-1], y.dtype)
        x, neg_log_det = affine_coupling_flow(y, zeros, params)
        # forward pass returns base_lp - log|det J|; with base_lp = 0 the
        # second output is -log|det J_f(y)|.
        out = lj({name: x}) - neg_log_det
        return out[0] if squeeze else out

    def from_latent(y):
        x, _ = _flow(y, inverse=False)
        return x

    def to_latent(x):
        y, _ = _flow(x, inverse=True)
        return y

    return latent_log_joint, to_latent, from_latent
