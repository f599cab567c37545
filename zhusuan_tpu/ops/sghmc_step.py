"""Pallas fused SGHMC transition.

One kernel per chain-block runs the whole SGHMC update in VMEM: noise
draw (TPU hardware PRNG, split Box-Muller) + gradient + the 1st- or
2nd-order integrator (Chen et al. 2015; reference sgmcmc.py:343-357) +
the per-chain kinetic-energy partial sums. HBM sees one read and one
write of (q, v) per iteration vs ~10 passes for the scanned update.
Momentum resampling (every ``n_iter_resample_v`` iterations) stays in
XLA before the kernel — it is a rare branch, and keeping it outside
preserves the scan path's semantics exactly.

Same opt-in/fallback/different-random-stream contract as
:mod:`zhusuan_tpu.ops.hmc_step`
(``SGHMC(experimental_fused_step=True)``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.ops.hmc_step import (  # shared applicability contract
    consts_fit_vmem,
    hmc_step_supported as sghmc_step_supported,
)
from zhusuan_tpu.ops._pallas_utils import (
    hoist_closure_consts,
    replicated_block_spec,
    split_boxmuller_normal,
)

__all__ = ["fused_sghmc_step", "sghmc_step_supported", "consts_fit_vmem"]


def fused_sghmc_step(
    potential_grad: Callable,
    q,
    v,
    lr,
    alpha: float,
    beta: float,
    second_order: bool,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """One fused SGHMC update.

    1st order (reference sgmcmc.py:343-349):
    ``v' = (1-alpha)*v + lr*grad(q) + N(0, sqrt(2*(alpha-beta)*lr));
    q' = q + v'``.
    2nd order (symmetric splitting, sgmcmc.py:350-357): half-drift,
    mid-point gradient, ``exp(-alpha/2)`` decays.

    :param potential_grad: ``q_block [bc, d] -> dlogpost/dq [bc, d]``.
    :param q, v: ``[n_chains, dim]`` position / momentum.
    :param lr: scalar learning rate (traced ok).
    :param alpha, beta: friction / variance-estimate constants (static).
    :param key: JAX PRNG key (hardware-PRNG seeding; deterministic per
        key, stream differs from ``jax.random``).
    :return: ``(new_q, new_v, vsq_chain_sums [c])`` — the last is
        ``sum_d v'^2`` per chain for the ``mean_k`` statistic.
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
    alpha = float(alpha)
    beta = float(beta)

    lr_arr = jnp.reshape(jnp.asarray(lr, dtype), (1, 1))
    seed = _key_to_seed(key)
    grad_c, grad_consts, grad_shapes = hoist_closure_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), dtype)
    )

    def kernel(seed_ref, lr_ref, q_ref, v_ref, *refs):
        g_refs = refs[: len(grad_consts)]
        oq_ref, ov_ref, vsq_ref = refs[len(grad_consts):]
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        lr_k = lr_ref[0, 0]
        csts = [jnp.reshape(r[:], s) for r, s in zip(g_refs, grad_shapes)]

        noise_std = jnp.sqrt(
            jnp.maximum(float(2.0 * (alpha - beta)) * lr_k,
                        jnp.zeros_like(lr_k))
        )
        eps = split_boxmuller_normal(bc, d).astype(dtype) * noise_std

        q0 = q_ref[:]
        v0 = v_ref[:]
        if not second_order:
            g = grad_c(q0, *csts)
            new_v = float(1.0 - alpha) * v0 + lr_k * g + eps
            new_q = q0 + new_v
        else:
            decay_half = float(np.exp(-0.5 * alpha))
            q1 = q0 + float(0.5) * v0
            g = grad_c(q1, *csts)
            new_v = decay_half * (decay_half * v0 + lr_k * g + eps)
            new_q = q1 + float(0.5) * new_v
        oq_ref[:] = new_q
        ov_ref[:] = new_v
        vsq_ref[:] = jnp.sum(new_v * new_v, axis=1)[:, None]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [replicated_block_spec(x) for x in grad_consts],
        out_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, 1), dtype),
        ],
        interpret=interpret,
    )(seed, lr_arr, q, v, *grad_consts)
    new_q, new_v, vsq = outs
    return new_q, new_v, vsq[:, 0]
