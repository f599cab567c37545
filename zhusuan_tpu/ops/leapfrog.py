"""Pallas fused leapfrog integrator.

Why: the scanned HMC hot loop is HBM-bandwidth-bound — every leapfrog
sub-step streams position, momentum and gradient ([n_chains, dim] each)
through HBM (~5 array passes x (n_leapfrogs+1) sub-steps per iteration;
measured ~478us/iter for 8192x100 f32 on one v5e chip, within ~10% of the
bandwidth bound). This kernel keeps a chain-block of (q, p) resident in
VMEM for the WHOLE trajectory and traces the user's gradient function
inside the kernel body, reducing HBM traffic to one read + one write of
(q, p) per iteration regardless of n_leapfrogs.

Applicability: opt-in via ``HMC(experimental_fused_leapfrog=True)``. The
path engages only for a single 2-D ``[n_chains, dim]`` latent with exactly
one chain axis — the kernel evaluates the gradient per chain-block, which
is correct only when the log-density factorizes over the leading axis —
and whose gradient is expressible with Mosaic-supported ops (standard
jnp). Everything else falls back to the XLA scan; results are numerically
identical (same order of operations).

NOTE: deliberately NOT jit-wrapped — callers pass fresh gradient closures
(static-arg identity hashing would recompile and pin memory per call);
call it under your own jit/scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["fused_leapfrog", "leapfrog_supported"]

# Per-buffer VMEM budget for one chain block: the kernel keeps q, p, mass,
# the gradient and Box/loop temporaries live (~6 block-sized buffers), so
# cap a single block at 2MB to stay well inside the ~16MB/core VMEM.
_BLOCK_BYTES_LIMIT = 2 << 20


def leapfrog_supported(q_shape, block_chains: int = 512,
                       itemsize: int = 4) -> bool:
    """Whether the fused kernel handles this state shape within VMEM."""
    if len(q_shape) != 2:
        return False
    c, d = q_shape
    bc = min(block_chains, c)
    if c % bc != 0 or d < 1:
        return False
    return bc * d * itemsize <= _BLOCK_BYTES_LIMIT


def fused_leapfrog(
    potential_grad: Callable,
    q,
    p,
    step_size,
    n_leapfrogs: int,
    mass,
    block_chains: int = 512,
    interpret: bool = False,
):
    """Run the boundary-aware leapfrog trajectory fused in VMEM.

    Matches :func:`zhusuan_tpu.mcmc.base.leapfrog_step` iterated with the
    reference schedule (drift skipped on sub-step 0; kick halved on first
    and last sub-steps; reference hmc.py:347-372).

    :param potential_grad: ``grad(q_block) -> dlogpost/dq`` for a
        ``[block, dim]`` chain block (chains independent).
    :param q, p: ``[n_chains, dim]`` position/momentum.
    :param step_size: scalar (traced ok).
    :param mass: ``[1, dim]`` or ``[n_chains, dim]`` diagonal mass.
    :param block_chains: VMEM chain-block size.
    :return: ``(new_q, new_p)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, d = q.shape
    bc = min(block_chains, c)
    assert c % bc == 0, "n_chains must divide by block_chains"
    grid = (c // bc,)
    dtype = q.dtype
    mass_rows = mass.shape[0]

    step_size_arr = jnp.reshape(jnp.asarray(step_size, dtype), (1, 1))

    # Hoist closure constants (observed data, density parameters) out of
    # the user's gradient function — Pallas kernels cannot capture arrays.
    from zhusuan_tpu.ops._pallas_utils import hoist_closure_consts

    block_example = jax.ShapeDtypeStruct((bc, d), dtype)
    converted_grad, lifted_consts, const_orig_shapes = hoist_closure_consts(
        potential_grad, block_example
    )

    def kernel(ss_ref, q_ref, p_ref, mass_ref, *refs):
        const_refs = refs[: len(lifted_consts)]
        oq_ref, op_ref = refs[len(lifted_consts):]
        ss = ss_ref[0, 0]
        m = mass_ref[:]
        csts = [
            jnp.reshape(cr[:], shp)
            for cr, shp in zip(const_refs, const_orig_shapes)
        ]

        def body(i, qp):
            qq, pp = qp
            ss1 = jnp.where(i > 0, ss, jnp.zeros_like(ss))
            ss2 = jnp.where(
                (i > 0) & (i < n_leapfrogs), ss, ss * 0.5
            )
            qq = qq + ss1 * pp / m
            g = converted_grad(qq, *csts)
            pp = pp + ss2 * g
            return (qq, pp)

        qq, pp = jax.lax.fori_loop(
            0, n_leapfrogs + 1, body, (q_ref[:], p_ref[:])
        )
        oq_ref[:] = qq
        op_ref[:] = pp

    from zhusuan_tpu.ops._pallas_utils import (
        replicated_block_spec as _replicated_spec,
    )

    out_q, out_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (mass_rows if mass_rows == 1 else bc, d),
                (lambda i: (0, 0)) if mass_rows == 1 else (lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            ),
        ] + [_replicated_spec(cst) for cst in lifted_consts],
        out_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), dtype),
        ],
        interpret=interpret,
    )(step_size_arr, q, p, mass, *lifted_consts)
    return out_q, out_p
