"""Shared helpers for the Pallas TPU kernels in this package.

Single home for two patterns that would otherwise be copy-pasted across
``ops/random.py``, ``ops/leapfrog.py`` and ``ops/hmc_step.py``:

- :func:`hoist_closure_consts` — Pallas kernels cannot capture device
  arrays, so user closures (log-densities, gradients) are jaxpr-traced and
  their constants lifted into explicit kernel inputs.
- :func:`uniform_from_bits` — the canonical uint32 -> float32 in [0, 1)
  bit-twiddle (mantissa fill, exponent 0 -> [1, 2), subtract 1) used by
  every hardware-PRNG sampling kernel.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["hoist_closure_consts", "uniform_from_bits",
           "split_boxmuller_normal", "replicated_block_spec"]


def hoist_closure_consts(fn: Callable, example):
    """Trace ``fn`` at ``example`` and lift its closure constants.

    Returns ``(converted, lifted_consts, const_shapes)`` where
    ``converted(x, *consts)`` evaluates the traced jaxpr,
    ``lifted_consts`` are the constants as >=2-D arrays (Mosaic wants 2-D
    VMEM blocks) and ``const_shapes`` their original shapes (reshape the
    kernel refs back before use). ``jax.closure_convert`` only hoists
    tracers; concrete device arrays stay embedded as jaxpr consts, which
    is why this exists.
    """
    import jax.core as jax_core

    closed = jax.make_jaxpr(fn)(example)
    consts = list(closed.consts)

    def converted(x, *csts):
        out = jax_core.eval_jaxpr(closed.jaxpr, csts, x)
        return out[0] if len(out) == 1 else tuple(out)

    lifted, shapes = [], []
    for cst in consts:
        shapes.append(cst.shape)
        lifted.append(jnp.atleast_2d(jnp.asarray(cst)))
    return converted, lifted, shapes


def uniform_from_bits(bits):
    """uint32 random bits -> float32 uniforms in [0, 1) (in-kernel).

    Sets the 23 mantissa bits with exponent 0 so the bitcast lands in
    [1, 2), then subtracts 1.
    """
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.bitcast(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    ) - 1.0


_TWO_PI = float(2.0 * 3.141592653589793)


def split_boxmuller_normal(n_rows: int, n_cols: int):
    """Draw ``(n_rows, n_cols)`` float32 standard normals in-kernel from
    the hardware PRNG, using BOTH Box-Muller outputs (r*cos fills the
    first half of the rows, r*sin the second) — half the bit draws and
    half the log/sqrt per normal. ``n_rows`` must be even. Call after
    ``pltpu.prng_seed``.
    """
    from jax.experimental.pallas import tpu as pltpu

    half = n_rows // 2
    bits1 = pltpu.bitcast(
        pltpu.prng_random_bits((half, n_cols)), jnp.uint32
    )
    bits2 = pltpu.bitcast(
        pltpu.prng_random_bits((half, n_cols)), jnp.uint32
    )
    u1 = jnp.maximum(uniform_from_bits(bits1), float(1e-7))
    u2 = uniform_from_bits(bits2)
    r = jnp.sqrt(float(-2.0) * jnp.log(u1))
    theta = _TWO_PI * u2
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                           axis=0)


def replicated_block_spec(arr):
    """BlockSpec replicating a (small) array into every grid block's VMEM
    (used for hoisted closure constants)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
