"""Pallas fused ChEES-HMC transition (traced trajectory length).

ChEES (mcmc/chees.py) keeps every chain on the SAME jittered trajectory
length, so unlike NUTS there is no per-chain tree to mask — but the
leapfrog count changes every iteration (Halton jitter x adapted T), so
the scan path runs the trajectory as a traced-trip-count
``lax.while_loop`` whose every leapfrog round-trips the [C, D] state
through HBM. This kernel is :mod:`ops/hmc_step` with ONE change:
``n_leapfrogs`` is a traced SMEM scalar driving an in-VMEM
``fori_loop``, so the whole jittered trajectory (momentum draw, drifts,
kicks, both Hamiltonians, MH select) stays VMEM-resident at any length.
Measured 1.3x the scan path at 4096x100 on a cheap elementwise density
(4.58 vs 6.35 us/leapfrog — PERF.md round 5); the margin grows with
density cost, which is what the HBM round-trips amortize.

Extra outputs vs the HMC kernel: the PROPOSAL endpoint ``(q', p')``
regardless of acceptance — the ChEES criterion's gradient needs the
proposal jump distance and endpoint velocity (mcmc/chees.py
``_chees_grad``; Hoffman, Radul & Sountsov 2021 Eq. 14).

Same contract as every fused kernel here: identical distribution to the
scan path, different random stream (hardware PRNG), deterministic per
key; statistical equivalence is asserted on TPU (bench selfcheck +
tests/test_chees.py TPU lane).

Parity note: the reference (/root/reference/zhusuan) has no adaptive
trajectory lengths at all (fixed ``n_leapfrogs`` HMC, hmc.py:252-281);
this is a beyond-reference TPU-native component.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from zhusuan_tpu.ops.hmc_step import _BLOCK_BYTES_LIMIT

__all__ = ["fused_chees_step", "chees_step_supported"]


def chees_step_supported(q_shape, block_chains: int = 256,
                         itemsize: int = 4) -> bool:
    """Whether the fused ChEES kernel handles this state shape in VMEM
    (same geometry rules as the fused HMC kernel)."""
    if len(q_shape) != 2:
        return False
    c, d = q_shape
    bc = min(block_chains, c)
    if c % bc != 0 or d < 1 or bc % 2 != 0:
        return False
    return bc * d * itemsize <= _BLOCK_BYTES_LIMIT


def fused_chees_step(
    log_post: Callable,
    potential_grad: Callable,
    q,
    mass,
    step_size,
    n_leapfrogs,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """One full jittered-length HMC transition fused in VMEM.

    :param log_post: ``q_block [bc, d] -> log-posterior [bc]``.
    :param potential_grad: ``q_block -> dlogpost/dq [bc, d]``.
    :param q: ``[n_chains, dim]`` positions (f32).
    :param mass: ``[1, dim]`` diagonal mass (shared across chains).
    :param step_size: scalar (traced ok).
    :param n_leapfrogs: TRACED int32 scalar — the jittered leapfrog
        count shared by all chains this iteration.
    :param key: JAX PRNG key; seeds the hardware PRNG per block.
    :return: ``(accepted_q [c,d], prop_q [c,d], prop_p [c,d],
        accept_prob [c], old_log_prob [c], sel_log_prob [c])``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zhusuan_tpu.ops._pallas_utils import (
        hoist_closure_consts,
        replicated_block_spec,
        split_boxmuller_normal,
        uniform_from_bits,
    )
    from zhusuan_tpu.ops.random import _key_to_seed

    c, d = q.shape
    bc = min(block_chains, c)
    assert c % bc == 0, "n_chains must divide by block_chains"
    assert bc % 2 == 0, "block_chains must be even (split Box-Muller)"
    grid = (c // bc,)
    dtype = q.dtype
    mass = mass.astype(dtype)

    step_size_arr = jnp.reshape(jnp.asarray(step_size, dtype), (1, 1))
    n_arr = jnp.reshape(jnp.asarray(n_leapfrogs, jnp.int32), (1,))
    seed = _key_to_seed(key)

    grad_c, grad_consts, grad_shapes = hoist_closure_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), dtype)
    )
    logp_c, logp_consts, logp_shapes = hoist_closure_consts(
        log_post, jax.ShapeDtypeStruct((bc, d), dtype)
    )
    n_g, n_l = len(grad_consts), len(logp_consts)

    def kernel(seed_ref, n_ref, ss_ref, q_ref, mass_ref, *refs):
        g_refs = refs[:n_g]
        l_refs = refs[n_g:n_g + n_l]
        (oq_ref, pq_ref, pp_ref, acc_ref, olp_ref, slp_ref) = \
            refs[n_g + n_l:]
        blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + blk, seed_ref[1] + jnp.int32(29))
        ss = ss_ref[0, 0]
        n_leap = n_ref[0]
        m = mass_ref[:]
        g_csts = [jnp.reshape(r[:], s)
                  for r, s in zip(g_refs, grad_shapes)]
        l_csts = [jnp.reshape(r[:], s)
                  for r, s in zip(l_refs, logp_shapes)]

        q0 = q_ref[:]

        eps = split_boxmuller_normal(bc, d)
        p0 = eps.astype(dtype) * jnp.sqrt(m)

        bits3 = pltpu.bitcast(pltpu.prng_random_bits((bc, d)),
                              jnp.uint32)
        u_mh = uniform_from_bits(bits3)[:, 0:1].astype(dtype)

        old_lp = logp_c(q0, *l_csts)
        old_k = 0.5 * jnp.sum(p0 * p0 / m, axis=1)
        old_h = -old_lp + old_k

        # n_leap-step leapfrog with half kicks at both ends (the
        # reference boundary schedule, hmc.py:347-372; identical to
        # mcmc/chees.py _leapfrog_n) — trip count is TRACED.
        def body(it, qp):
            qq, pp = qp
            ss1 = jnp.where(it > 0, ss, jnp.zeros_like(ss))
            ss2 = jnp.where((it > 0) & (it < n_leap), ss, ss * 0.5)
            qq = qq + ss1 * pp / m
            g = grad_c(qq, *g_csts)
            pp = pp + ss2 * g
            return (qq, pp)

        qq, pp = jax.lax.fori_loop(0, n_leap + 1, body, (q0, p0))

        new_lp = logp_c(qq, *l_csts)
        new_k = 0.5 * jnp.sum(pp * pp / m, axis=1)
        new_h = -new_lp + new_k
        acc = jnp.exp(jnp.minimum(old_h - new_h, 0.0))
        finite = jnp.isfinite(acc) & jnp.isfinite(new_lp)
        acc = jnp.where(finite, acc, jnp.zeros_like(acc))
        take = u_mh[:, 0] < acc
        out_q = jnp.where(take[:, None], qq, q0)
        sel_lp = jnp.where(take, new_lp, old_lp)

        oq_ref[:] = out_q
        pq_ref[:] = qq
        pp_ref[:] = pp
        acc_ref[:] = acc[:, None]
        olp_ref[:] = old_lp[:, None]
        slp_ref[:] = sel_lp[:, None]

    vec_spec = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((bc, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((c, 1), dtype)
    mat_shape = jax.ShapeDtypeStruct((c, d), dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_leapfrogs
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # step size
            mat_spec,                               # q
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # mass
        ]
        + [replicated_block_spec(x) for x in grad_consts]
        + [replicated_block_spec(x) for x in logp_consts],
        out_specs=[mat_spec, mat_spec, mat_spec, vec_spec, vec_spec,
                   vec_spec],
        out_shape=[mat_shape, mat_shape, mat_shape, vec_shape, vec_shape,
                   vec_shape],
        interpret=interpret,
    )(seed, n_arr, step_size_arr, q, mass, *grad_consts, *logp_consts)

    out_q, prop_q, prop_p, acc, old_lp, sel_lp = outs
    sq = lambda v: v[:, 0]
    return (out_q, prop_q, prop_p, sq(acc), sq(old_lp), sq(sel_lp))
