"""Pallas fused SGNHT transition (per-coordinate thermostat).

One kernel per chain-block runs the whole SGNHT update (Ding et al. 2014,
Alg. 2; reference sgmcmc.py:460-505) in VMEM: noise draw (TPU hardware
PRNG, split Box-Muller) + gradient + integrator + the thermostat update.
HBM sees one read and one write of (q, v, alpha) per iteration vs the
many intermediate passes of the scanned update.

Only the ``use_vector_alpha=True`` variant is fused: the per-coordinate
thermostat is elementwise, so it blocks cleanly. The scalar-alpha variant
needs ``mean(v^2)`` over ALL chains and dims — a cross-block reduction —
and stays on the scan path (the gate in ``SGNHT._try_fused`` enforces
this).

Same opt-in/fallback/different-random-stream contract as
:mod:`zhusuan_tpu.ops.hmc_step`
(``SGNHT(experimental_fused_step=True)``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from zhusuan_tpu.ops.hmc_step import (  # shared applicability contract
    consts_fit_vmem,
    hmc_step_supported as sgnht_step_supported,
)
from zhusuan_tpu.ops._pallas_utils import (
    hoist_closure_consts,
    replicated_block_spec,
    split_boxmuller_normal,
)

__all__ = ["fused_sgnht_step", "sgnht_step_supported", "consts_fit_vmem"]


def fused_sgnht_step(
    potential_grad: Callable,
    q,
    v,
    alpha,
    lr,
    a: float,
    tune_rate: float,
    second_order: bool,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """One fused SGNHT update with a per-coordinate thermostat.

    1st order (reference sgmcmc.py:460-475):
    ``v' = (1-alpha)*v + lr*grad(q) + N(0, sqrt(2*a*lr)); q' = q + v';
    alpha' = alpha + tune_rate*(v'^2 - lr)``.
    2nd order (sgmcmc.py:476-499): half-step thermostat update, then
    ``exp(-alpha1/2)`` decays around a mid-point gradient, then the
    second half-step thermostat update.

    :param potential_grad: ``q_block [bc, d] -> dlogpost/dq [bc, d]``.
    :param q, v, alpha: ``[n_chains, dim]`` position / momentum /
        per-coordinate thermostat.
    :param lr: scalar learning rate (traced ok).
    :param a: injected-noise variance_extra constant (static).
    :param tune_rate: thermostat tuning rate (static).
    :param key: JAX PRNG key (hardware-PRNG seeding; deterministic per
        key, stream differs from ``jax.random``).
    :return: ``(new_q, new_v, new_alpha)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zhusuan_tpu.ops.random import _key_to_seed

    c, d = q.shape
    bc = min(block_chains, c)
    assert c % bc == 0, "n_chains must divide by block_chains"
    assert bc % 2 == 0, "block_chains must be even (split Box-Muller)"
    grid = (c // bc,)
    dtype = q.dtype
    a = float(a)
    tune_rate = float(tune_rate)

    lr_arr = jnp.reshape(jnp.asarray(lr, dtype), (1, 1))
    seed = _key_to_seed(key)
    grad_c, grad_consts, grad_shapes = hoist_closure_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), dtype)
    )

    def kernel(seed_ref, lr_ref, q_ref, v_ref, a_ref, *refs):
        g_refs = refs[: len(grad_consts)]
        oq_ref, ov_ref, oa_ref = refs[len(grad_consts):]
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        lr_k = lr_ref[0, 0]
        csts = [jnp.reshape(r[:], s) for r, s in zip(g_refs, grad_shapes)]

        noise_std = jnp.sqrt(float(2.0 * a) * lr_k)
        eps = split_boxmuller_normal(bc, d).astype(dtype) * noise_std

        q0 = q_ref[:]
        v0 = v_ref[:]
        al0 = a_ref[:]
        if not second_order:
            g = grad_c(q0, *csts)
            new_v = (1.0 - al0) * v0 + lr_k * g + eps
            new_q = q0 + new_v
            new_al = al0 + float(tune_rate) * (new_v * new_v - lr_k)
        else:
            al1 = al0 + float(0.5 * tune_rate) * (v0 * v0 - lr_k)
            decay_half = jnp.exp(-0.5 * al1)
            q1 = q0 + float(0.5) * v0
            g = grad_c(q1, *csts)
            new_v = decay_half * (decay_half * v0 + lr_k * g + eps)
            new_q = q1 + float(0.5) * new_v
            new_al = al1 + float(0.5 * tune_rate) * (new_v * new_v - lr_k)
        oq_ref[:] = new_q
        ov_ref[:] = new_v
        oa_ref[:] = new_al

    blk = pl.BlockSpec((bc, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            blk, blk, blk,
        ] + [replicated_block_spec(x) for x in grad_consts],
        out_specs=[blk, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), dtype),
        ],
        interpret=interpret,
    )(seed, lr_arr, q, v, alpha, *grad_consts)
    return outs[0], outs[1], outs[2]
