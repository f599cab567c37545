"""Pallas fused PSGLD transition.

One kernel per chain-block runs the whole preconditioned-SGLD update
(Li et al. 2015, Eq. 4-5; reference sgmcmc.py:203-257) in VMEM: noise
draw (TPU hardware PRNG, split Box-Muller) + gradient + the RMSprop
accumulator + preconditioned Langevin step. HBM sees one read and one
write of (q, rms) per iteration vs the many intermediate passes of the
scanned update. Completes the fused family (HMC/SGLD/SGHMC/SGNHT/PSGLD).

Same opt-in/fallback/different-random-stream contract as
:mod:`zhusuan_tpu.ops.hmc_step`
(``PSGLD(experimental_fused_step=True)``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from zhusuan_tpu.ops.hmc_step import (  # shared applicability contract
    consts_fit_vmem,
    hmc_step_supported as psgld_step_supported,
)
from zhusuan_tpu.ops._pallas_utils import (
    hoist_closure_consts,
    replicated_block_spec,
    split_boxmuller_normal,
)

__all__ = ["fused_psgld_step", "psgld_step_supported", "consts_fit_vmem"]


def fused_psgld_step(
    potential_grad: Callable,
    q,
    rms,
    lr,
    decay: float,
    epsilon: float,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """One fused PSGLD update (reference sgmcmc.py:219-257):
    ``rms' = decay*rms + (1-decay)*grad(q)^2;
    G = 1/(epsilon + sqrt(rms'));
    q' = q + 0.5*lr*G*grad(q) + N(0, sqrt(lr*G))``.

    :param potential_grad: ``q_block [bc, d] -> dlogpost/dq [bc, d]``.
    :param q, rms: ``[n_chains, dim]`` position / RMSprop accumulator.
    :param lr: scalar learning rate (traced ok).
    :param decay, epsilon: preconditioner constants (static).
    :param key: JAX PRNG key (hardware-PRNG seeding; deterministic per
        key, stream differs from ``jax.random``).
    :return: ``(new_q, new_rms)``.
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
    decay = float(decay)
    epsilon = float(epsilon)

    lr_arr = jnp.reshape(jnp.asarray(lr, dtype), (1, 1))
    seed = _key_to_seed(key)
    grad_c, grad_consts, grad_shapes = hoist_closure_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), dtype)
    )

    def kernel(seed_ref, lr_ref, q_ref, rms_ref, *refs):
        g_refs = refs[: len(grad_consts)]
        oq_ref, orms_ref = refs[len(grad_consts):]
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        lr_k = lr_ref[0, 0]
        csts = [jnp.reshape(r[:], s) for r, s in zip(g_refs, grad_shapes)]

        eps = split_boxmuller_normal(bc, d).astype(dtype)

        q0 = q_ref[:]
        g = grad_c(q0, *csts)
        new_rms = float(decay) * rms_ref[:] + float(1.0 - decay) * g * g
        precond = 1.0 / (float(epsilon) + jnp.sqrt(new_rms))
        new_q = (
            q0
            + (0.5 * lr_k) * precond * g
            + jnp.sqrt(lr_k * precond) * eps
        )
        oq_ref[:] = new_q
        orms_ref[:] = new_rms

    blk = pl.BlockSpec((bc, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            blk, blk,
        ] + [replicated_block_spec(x) for x in grad_consts],
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), dtype),
        ],
        interpret=interpret,
    )(seed, lr_arr, q, rms, *grad_consts)
    return outs[0], outs[1]
