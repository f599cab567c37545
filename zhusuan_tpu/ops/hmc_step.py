"""Pallas fully fused HMC iteration.

One kernel per chain-block does the ENTIRE HMC transition in VMEM:
momentum draw (TPU hardware PRNG + Box-Muller), the boundary-aware
leapfrog trajectory, both Hamiltonian evaluations, and the per-chain MH
accept/reject select. HBM traffic per iteration drops from ~12.5 state
passes (momentum write + trajectory + MH reads + select; see PERF.md
bytes model) to: read q + mass, write accepted q + momentum + four
per-chain vectors.

Semantics: identical *distribution* to the ``lax.scan`` path — the same
trajectory schedule (``mcmc/base.py:leapfrog_step`` with the reference
hmc.py:347-372 boundary rules), the same Hamiltonian and non-finite ->
reject guard (``mcmc/base.py:get_acceptance_rate``, reference
hmc.py:46-61) — but a DIFFERENT random stream (hardware PRNG instead of
Threefry), so runs are deterministic per key yet not bitwise equal to the
default path. Opt-in via ``HMC(experimental_fused_step=True)``; tests
assert statistical equivalence (tests/test_ops.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_hmc_step", "hmc_step_supported"]

# The kernel keeps ~10 block-sized buffers live (q0, p, qq, pp, gradient,
# two bit draws, mass, temporaries); cap one buffer at 1MB to stay inside
# the ~16MB/core VMEM with headroom for Mosaic's own temporaries.
_BLOCK_BYTES_LIMIT = 1 << 20


def hmc_step_supported(q_shape, block_chains: int = 256,
                       itemsize: int = 4) -> bool:
    """Whether the fused-step kernel handles this state shape in VMEM."""
    if len(q_shape) != 2:
        return False
    c, d = q_shape
    bc = min(block_chains, c)
    if c % bc != 0 or d < 1 or bc % 2 != 0:
        return False
    return bc * d * itemsize <= _BLOCK_BYTES_LIMIT


# Closure constants (observed data, density parameters) are replicated
# into every block's VMEM; cap their total size so a large-dataset
# log-posterior falls back to the scan path instead of blowing VMEM.
_CONST_BYTES_LIMIT = 4 << 20


def consts_fit_vmem(fns, example) -> bool:
    """Whether the closures' hoisted constants fit the VMEM budget.

    :param fns: iterable of closures whose constants will all be
        replicated into each block's VMEM (pass each closure ONCE).
    """
    total = 0
    for fn in fns:
        closed = jax.make_jaxpr(fn)(example)
        for cst in closed.consts:
            total += int(np.prod(cst.shape)) * cst.dtype.itemsize
    return total <= _CONST_BYTES_LIMIT


from zhusuan_tpu.ops._pallas_utils import hoist_closure_consts as \
    _hoist_consts


def fused_hmc_step(
    log_post: Callable,
    potential_grad: Callable,
    q,
    mass,
    step_size,
    n_leapfrogs: int,
    key,
    block_chains: int = 256,
    interpret: bool = False,
):
    """Run one full HMC transition fused in VMEM.

    :param log_post: ``q_block [bc, d] -> log-posterior [bc]`` (chains
        independent — the density must factorize over the leading axis).
    :param potential_grad: ``q_block -> dlogpost/dq [bc, d]``.
    :param q: ``[n_chains, dim]`` positions.
    :param mass: ``[1, dim]`` or ``[n_chains, dim]`` diagonal mass.
    :param step_size: scalar (traced ok).
    :param key: JAX PRNG key; seeds the hardware PRNG per block
        (deterministic per key; stream differs from ``jax.random``).
    :param block_chains: VMEM chain-block size (256 measured fastest at
        the bench config: 372/388/410 us per iter at 256/512/1024;
        >=2048 fails VMEM, PERF.md).
    :return: ``(accepted_q [c,d], init_momentum [c,d], acceptance_rate
        [c], old_log_prob [c], new_log_prob_selected [c], old_h [c],
        new_h [c])`` matching the scan path's HMCInfo fields.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zhusuan_tpu.ops.random import _key_to_seed

    c, d = q.shape
    bc = min(block_chains, c)
    assert c % bc == 0, "n_chains must divide by block_chains"
    assert bc % 2 == 0, "block_chains must be even (split Box-Muller)"
    grid = (c // bc,)
    # bf16 state support: the HBM-resident position may be bfloat16 (half
    # the q read/write bytes per iteration); ALL in-VMEM compute — the
    # trajectory, both Hamiltonians, and the MH energies — runs in f32
    # (upcast on read, round on the accepted-q write). See PERF.md round-4
    # stationarity study before relying on bf16 state for inference.
    dtype = q.dtype
    compute_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
    mass_rows = mass.shape[0]
    mass = mass.astype(compute_dtype)

    step_size_arr = jnp.reshape(
        jnp.asarray(step_size, compute_dtype), (1, 1)
    )
    seed = _key_to_seed(key)

    grad_c, grad_consts, grad_shapes = _hoist_consts(
        potential_grad, jax.ShapeDtypeStruct((bc, d), compute_dtype)
    )
    logp_c, logp_consts, logp_shapes = _hoist_consts(
        log_post, jax.ShapeDtypeStruct((bc, d), compute_dtype)
    )
    n_g, n_l = len(grad_consts), len(logp_consts)

    def kernel(seed_ref, ss_ref, q_ref, mass_ref, *refs):
        g_refs = refs[:n_g]
        l_refs = refs[n_g:n_g + n_l]
        (oq_ref, op_ref, acc_ref, olp_ref, nlp_ref, oh_ref,
         nh_ref) = refs[n_g + n_l:]
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i, seed_ref[1])
        ss = ss_ref[0, 0]
        m = mass_ref[:]
        g_csts = [jnp.reshape(r[:], s) for r, s in zip(g_refs, grad_shapes)]
        l_csts = [jnp.reshape(r[:], s) for r, s in zip(l_refs, logp_shapes)]

        q0 = q_ref[:].astype(compute_dtype)

        # --- momentum ~ N(0, m): split Box-Muller (both outputs used;
        # half the bit draws + log/sqrt per normal) ----------------------- #
        from zhusuan_tpu.ops._pallas_utils import (
            split_boxmuller_normal, uniform_from_bits,
        )

        eps = split_boxmuller_normal(bc, d)
        p0 = eps.astype(compute_dtype) * jnp.sqrt(m)

        # --- MH uniform: one per chain (first lane of a fresh draw) ------ #
        bits3 = pltpu.bitcast(pltpu.prng_random_bits((bc, d)), jnp.uint32)
        u_mh_full = uniform_from_bits(bits3)
        u_mh = u_mh_full[:, 0:1].astype(compute_dtype)  # [bc, 1]

        # --- old Hamiltonian --------------------------------------------- #
        old_lp = logp_c(q0, *l_csts)  # [bc]
        old_k = 0.5 * jnp.sum(p0 * p0 / m, axis=1)
        old_h = -old_lp + old_k

        # --- trajectory (reference boundary schedule, hmc.py:347-372) ---- #
        def body(it, qp):
            qq, pp = qp
            ss1 = jnp.where(it > 0, ss, jnp.zeros_like(ss))
            ss2 = jnp.where((it > 0) & (it < n_leapfrogs), ss, ss * 0.5)
            qq = qq + ss1 * pp / m
            g = grad_c(qq, *g_csts)
            pp = pp + ss2 * g
            return (qq, pp)

        qq, pp = jax.lax.fori_loop(0, n_leapfrogs + 1, body, (q0, p0))

        # --- new Hamiltonian + MH select (hmc.py:46-61,479-498) ---------- #
        new_lp = logp_c(qq, *l_csts)
        new_k = 0.5 * jnp.sum(pp * pp / m, axis=1)
        new_h = -new_lp + new_k
        acc = jnp.exp(jnp.minimum(old_h - new_h, 0.0))
        finite = jnp.isfinite(acc) & jnp.isfinite(new_lp)
        acc = jnp.where(finite, acc, jnp.zeros_like(acc))
        take = u_mh[:, 0] < acc  # [bc]
        out_q = jnp.where(take[:, None], qq, q0)
        out_lp = jnp.where(take, new_lp, old_lp)

        oq_ref[:] = out_q.astype(dtype)
        op_ref[:] = p0
        acc_ref[:] = acc[:, None]
        olp_ref[:] = old_lp[:, None]
        nlp_ref[:] = out_lp[:, None]
        oh_ref[:] = old_h[:, None]
        nh_ref[:] = new_h[:, None]

    from zhusuan_tpu.ops._pallas_utils import (
        replicated_block_spec as _replicated_spec,
    )

    vec_spec = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((c, 1), compute_dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # step size
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(
                (mass_rows if mass_rows == 1 else bc, d),
                (lambda i: (0, 0)) if mass_rows == 1 else (lambda i: (i, 0)),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [_replicated_spec(x) for x in grad_consts]
        + [_replicated_spec(x) for x in logp_consts],
        out_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            jax.ShapeDtypeStruct((c, d), compute_dtype),
            vec_shape, vec_shape, vec_shape, vec_shape, vec_shape,
        ],
        interpret=interpret,
    )(seed, step_size_arr, q, mass, *grad_consts, *logp_consts)

    out_q, p0, acc, old_lp, new_lp, old_h, new_h = outs
    squeeze = lambda v: v[:, 0]
    return (out_q, p0, squeeze(acc), squeeze(old_lp), squeeze(new_lp),
            squeeze(old_h), squeeze(new_h))
