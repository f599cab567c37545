"""Pallas fused SGLD transition.

One kernel per chain-block runs the whole Langevin update in VMEM:
noise draw (TPU hardware PRNG, split Box-Muller) + gradient (user closure
traced into the kernel) + position update — HBM sees one read and one
write of the state per iteration, vs ~6 passes for the scanned update
(gradient, noise materialization, update; reference update semantics
sgmcmc.py:195-200).

Same opt-in/fallback/different-random-stream contract as
:mod:`zhusuan_tpu.ops.hmc_step` (``SGLD(experimental_fused_step=True)``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.ops.hmc_step import (  # shared applicability contract
    consts_fit_vmem,
    hmc_step_supported as sgld_step_supported,
)
from zhusuan_tpu.ops._pallas_utils import hoist_closure_consts

__all__ = ["fused_sgld_step", "sgld_step_supported", "consts_fit_vmem"]


def fused_sgld_step(
    potential_grad: Callable,
    q,
    lr,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """One fused SGLD update: ``q + 0.5*lr*grad(q) + N(0, sqrt(lr))``.

    :param potential_grad: ``q_block [bc, d] -> dlogpost/dq [bc, d]``
        (chains independent).
    :param q: ``[n_chains, dim]`` positions.
    :param lr: scalar learning rate (traced ok).
    :param key: JAX PRNG key (hardware-PRNG seeding; stream differs from
        ``jax.random``, deterministic per key).
    :return: new ``q``.
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

    lr_arr = jnp.reshape(jnp.asarray(lr, dtype), (1, 1))
    seed = _key_to_seed(key)
    grad_c, grad_consts, grad_shapes = hoist_closure_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), dtype)
    )

    def kernel(seed_ref, lr_ref, q_ref, *refs):
        from zhusuan_tpu.ops._pallas_utils import split_boxmuller_normal

        g_refs = refs[: len(grad_consts)]
        (out_ref,) = refs[len(grad_consts):]
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        lr_k = lr_ref[0, 0]
        csts = [jnp.reshape(r[:], s) for r, s in zip(g_refs, grad_shapes)]

        eps = split_boxmuller_normal(bc, d).astype(dtype)
        q0 = q_ref[:]
        g = grad_c(q0, *csts)
        out_ref[:] = q0 + 0.5 * lr_k * g + jnp.sqrt(lr_k) * eps

    from zhusuan_tpu.ops._pallas_utils import (
        replicated_block_spec as _replicated_spec,
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_replicated_spec(x) for x in grad_consts],
        out_specs=pl.BlockSpec((bc, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d), dtype),
        interpret=interpret,
    )(seed, lr_arr, q, *grad_consts)
