"""Pallas TPU-native random sampling kernels.

``jax.random.normal`` computes Threefry on the VPU (~8 rounds of 32-bit
arithmetic per word) before the Box-Muller transform. TPUs have a hardware
PRNG exposed through ``pltpu.prng_random_bits`` that removes the counter
arithmetic entirely; this module provides a fused
"hardware bits -> uniform(0,1) -> Box-Muller -> scale/shift" kernel that
writes the final samples in one VMEM pass.

Semantics note: the stream differs from jax.random (documented opt-in —
samplers stay Threefry by default for reproducibility with keys). Seeding
derives a per-block seed from the JAX key data so blocks are independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tpu_normal", "tpu_uniform"]


def _key_to_seed(key):
    data = jax.random.key_data(key).astype(jnp.uint32)
    return data.reshape(-1)[:2]


def _block_rows(rows, cols, target_bytes=1 << 20):
    """Largest divisor of ``rows`` whose f32 block fits the 1MB-per-buffer
    VMEM budget shared by the sibling kernels (_BLOCK_BYTES_LIMIT)."""
    limit = max(1, target_bytes // max(1, cols * 4))
    best = 1
    for cand in range(1, rows + 1):
        if rows % cand == 0 and cand <= limit:
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def tpu_normal(key, shape, interpret: bool = False):
    """Standard normal samples via the TPU hardware PRNG + Box-Muller.

    :param key: jax PRNG key (only its data seeds the hardware PRNG).
    :param shape: 2-D output shape ``(rows, cols)``.
    :return: float32 samples.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = shape
    seed = _key_to_seed(key)
    br = _block_rows(rows, cols)
    grid = (rows // br,)

    def kernel(seed_ref, out_ref):
        from zhusuan_tpu.ops._pallas_utils import (
            split_boxmuller_normal, uniform_from_bits,
        )

        i = pl.program_id(0)
        # Independent stream per block: fold the block index into the seed.
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        if br % 2 == 0:
            # Both Box-Muller outputs used: half the bit draws and half
            # the log/sqrt per normal (the fused samplers' helper).
            out_ref[:] = split_boxmuller_normal(br, cols)
        else:
            bits1 = pltpu.bitcast(
                pltpu.prng_random_bits((br, cols)), jnp.uint32
            )
            bits2 = pltpu.bitcast(
                pltpu.prng_random_bits((br, cols)), jnp.uint32
            )
            # Open interval for the log.
            u1 = jnp.maximum(uniform_from_bits(bits1), 1e-7)
            u2 = uniform_from_bits(bits2)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            out_ref[:] = r * jnp.cos((2.0 * np.pi) * u2)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=interpret,
    )(seed)


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def tpu_uniform(key, shape, interpret: bool = False):
    """Uniform(0, 1) samples via the TPU hardware PRNG."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = shape
    seed = _key_to_seed(key)
    br = _block_rows(rows, cols)
    grid = (rows // br,)

    def kernel(seed_ref, out_ref):
        from zhusuan_tpu.ops._pallas_utils import uniform_from_bits

        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((br, cols)), jnp.uint32
        )
        out_ref[:] = uniform_from_bits(bits)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=interpret,
    )(seed)
