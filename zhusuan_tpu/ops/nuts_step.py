"""Pallas fully fused NUTS transition (one whole tree per kernel).

One kernel per chain-block runs the ENTIRE No-U-Turn transition in VMEM:
momentum draw (TPU hardware PRNG + split Box-Muller), every leapfrog
leaf with its density gradient, the iterative per-level U-turn checks,
progressive/biased multinomial selection, and the divergence guard. HBM
traffic per iteration drops from ~25+ block-state passes per LEAF (the
vmapped while-loop path carries edges + two ``[max_depth, dim]``
checkpoint stacks through HBM and pays jax's full-carry batching select
each leaf) to: read q + inv_mass, write the selected draw + seven
per-chain vectors — per ITERATION.

Static tree: ``max_tree_depth`` is a compile-time constant, so the
doubling/leaf structure is FULLY UNROLLED. Checkpoint slots
(``popcount(i >> 1)``) and the per-level U-turn ranges become Python
constants: checkpoints live in Python lists of ``[bc, d]`` VMEM values
(no ``[max_depth, dim]`` masked writes), and each odd leaf checks
exactly its ``trailing_ones`` slots — the total check count per subtree
is ``2**k - 1`` instead of ``2**k * max_depth``. The price is a kernel
whose size grows as ``2**max_tree_depth`` (hence the ``max_tree_depth
<= 6`` support gate; deeper trees keep the scan/racing paths).

Semantics: identical *distribution* to the interpretable paths — the
same leapfrog, multinomial weights, U-turn criterion and divergence rule
as ``mcmc/nuts.py`` (nested ``_transition_one`` and ``_race_run``) — but
a DIFFERENT random stream (hardware PRNG instead of Threefry), so runs
are deterministic per key yet not bitwise equal to the default path; the
bench selfcheck and tests assert statistical equivalence.

Parity note: the reference (/root/reference/zhusuan) has no NUTS at all
(fixed-length HMC only, zhusuan/hmc.py); this kernel is a beyond-
reference TPU-native component.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_nuts_transition", "fused_nuts_transition_looped",
           "nuts_step_supported", "nuts_looped_supported"]

# The kernel keeps ~(15 + 2 * max_depth) block-sized buffers live plus
# Mosaic temporaries from the unrolled leaves; cap one buffer well below
# the HMC kernel's limit.
_BLOCK_BYTES_LIMIT = 1 << 18
_MAX_SUPPORTED_DEPTH = 6
# The looped kernel's size grows O(max_tree_depth), so it covers the
# deep-tree regime (including the class default 10); cap where the
# 2 * D checkpoint buffers still fit VMEM comfortably.
_MAX_LOOPED_DEPTH = 12


def nuts_step_supported(q_shape, max_tree_depth: int,
                        block_chains: int = 128,
                        itemsize: int = 4) -> bool:
    """Whether the fully UNROLLED fused NUTS kernel handles this state
    shape in VMEM.

    The depth gate is about KERNEL SIZE, not correctness: the tree is
    fully unrolled, so ``2**max_tree_depth - 1`` leaf bodies (each
    inlining the density gradient) are compiled. Deeper trees route to
    :func:`fused_nuts_transition_looped` (see
    :func:`nuts_looped_supported`).
    """
    if len(q_shape) != 2:
        return False
    if not 1 <= int(max_tree_depth) <= _MAX_SUPPORTED_DEPTH:
        return False
    c, d = q_shape
    bc = min(block_chains, c)
    if c % bc != 0 or d < 1 or bc % 2 != 0:
        return False
    return bc * d * itemsize <= _BLOCK_BYTES_LIMIT


def nuts_looped_supported(q_shape, max_tree_depth: int,
                          block_chains: int = 128,
                          itemsize: int = 4) -> bool:
    """Whether the LOOPED fused NUTS kernel handles this shape: same
    block geometry as the unrolled kernel, but the per-doubling leaf
    loop is a ``lax.while_loop`` (O(max_tree_depth) kernel size, early
    exit when every chain in the block has stopped), so the default
    ``max_tree_depth=10`` compiles. VMEM must additionally hold the
    ``2 * max_tree_depth`` checkpoint buffers."""
    if len(q_shape) != 2:
        return False
    if not 1 <= int(max_tree_depth) <= _MAX_LOOPED_DEPTH:
        return False
    c, d = q_shape
    bc = min(block_chains, c)
    if c % bc != 0 or d < 1 or bc % 2 != 0:
        return False
    block_bytes = bc * d * itemsize
    # ~14 block-sized live buffers + 2*D checkpoints, keep under ~8 MB.
    total = (14 + 2 * int(max_tree_depth)) * block_bytes
    return block_bytes <= _BLOCK_BYTES_LIMIT and total <= (8 << 20)


def _trailing_ones_static(i: int) -> int:
    n = i + 1
    return int.bit_count((n & -n) - 1)


def fused_nuts_transition(
    vag: Callable,
    q,
    inv_mass,
    step_size,
    key,
    max_tree_depth: int,
    max_delta_energy: float,
    block_chains: int = 128,
    interpret: bool = False,
):
    """Run one full NUTS transition fused in VMEM.

    :param vag: ``q_block [bc, d] -> (log_post [bc], grad [bc, d])``
        (chains independent: the density must factorize over the leading
        axis — build it as ``jax.vmap(jax.value_and_grad(lp_one))``).
    :param q: ``[n_chains, dim]`` positions (float32).
    :param inv_mass: ``[1, dim]`` inverse diagonal mass (shared).
    :param step_size: scalar (traced ok).
    :param key: JAX PRNG key; seeds the hardware PRNG per block.
    :param max_tree_depth: doublings per iteration (compile-time; <= 6).
    :param max_delta_energy: divergence threshold on ``H - H0``.
    :return: ``(q_new [c,d], lp_new [c], h_new [c], accept_stat [c],
        depth [c] i32, n_leap [c] i32, turning [c] bool,
        divergent [c] bool)`` — the ``_transition_one`` contract.
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
    D = int(max_tree_depth)
    assert 1 <= D <= _MAX_SUPPORTED_DEPTH
    grid = (c // bc,)
    dtype = q.dtype
    n_leaf_cols = 1 << D  # >= total leaves (2**D - 1)

    step_size_arr = jnp.reshape(jnp.asarray(step_size, dtype), (1, 1))
    seed = _key_to_seed(key)
    max_e = float(max_delta_energy)

    vag_c, vag_consts, vag_shapes = hoist_closure_consts(
        vag, jax.ShapeDtypeStruct((bc, d), dtype)
    )
    n_v = len(vag_consts)

    def kernel(seed_ref, ss_ref, q_ref, im_ref, *refs):
        v_refs = refs[:n_v]
        (oq_ref, olp_ref, oh_ref, oacc_ref, odep_ref, olf_ref,
         otrn_ref, odiv_ref) = refs[n_v:]
        blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + blk, seed_ref[1])
        ss = ss_ref[0, 0]
        inv_m = im_ref[:]  # [1, d]
        csts = [jnp.reshape(r[:], s) for r, s in zip(v_refs, vag_shapes)]

        def VAG(qb):
            return vag_c(qb, *csts)

        q0 = q_ref[:]
        neg_inf = jnp.asarray(-jnp.inf, dtype)

        # --- all random draws up front (one PRNG pass each) ------------ #
        p0 = split_boxmuller_normal(bc, d).astype(dtype) / jnp.sqrt(inv_m)
        u_leaf = uniform_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((bc, n_leaf_cols)), jnp.uint32))
        u_dir = uniform_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((bc, D)), jnp.uint32))
        u_merge = uniform_from_bits(pltpu.bitcast(
            pltpu.prng_random_bits((bc, D)), jnp.uint32))
        log_u_leaf = jnp.log(jnp.maximum(u_leaf, float(1e-12)))
        log_u_merge = jnp.log(jnp.maximum(u_merge, float(1e-12)))
        dirs = u_dir < 0.5  # [bc, D] bool

        lp0, g0 = VAG(q0)
        h0 = -lp0 + 0.5 * jnp.sum(p0 * p0 * inv_m, axis=1)

        # --- trajectory state ------------------------------------------ #
        qL = qR = q0
        pL = pR = p0
        gL = gR = g0
        q_prop, lp_prop, h_prop = q0, lp0, h0
        logw = -h0
        psum = p0

        alive = jnp.ones((bc,), jnp.bool_)
        turning = jnp.zeros((bc,), jnp.bool_)
        diverging = jnp.zeros((bc,), jnp.bool_)
        depth = jnp.zeros((bc,), jnp.int32)
        n_leap = jnp.zeros((bc,), jnp.int32)
        sum_alpha = jnp.zeros((bc,), dtype)

        leaf_idx = 0
        for k in range(D):  # --- doublings, fully unrolled ------------- #
            dir_k = dirs[:, k]
            eps_s = jnp.where(dir_k, ss, -ss)[:, None]
            qq = jnp.where(dir_k[:, None], qR, qL)
            pp = jnp.where(dir_k[:, None], pR, pL)
            gg = jnp.where(dir_k[:, None], gR, gL)

            s_logw = jnp.full((bc,), -jnp.inf, dtype)
            s_psum = jnp.zeros((bc, d), dtype)
            s_turn = jnp.zeros((bc,), jnp.bool_)
            s_div = jnp.zeros((bc,), jnp.bool_)
            sq_prop, slp_prop, sh_prop = qq, lp0, h0
            n_slots = max(1, (1 << k) // 2)
            ckpt_p = [None] * n_slots
            ckpt_ps = [None] * n_slots

            for i in range(1 << k):  # -- leaves, fully unrolled -------- #
                s_alive = alive & ~s_turn & ~s_div
                sa = s_alive[:, None]
                p_half = pp + 0.5 * eps_s * gg
                q_new = qq + eps_s * p_half * inv_m
                lp_new, g_new = VAG(q_new)
                p_new = p_half + 0.5 * eps_s * g_new
                h = -lp_new + 0.5 * jnp.sum(p_new * p_new * inv_m, axis=1)
                delta = h - h0
                div = jnp.isnan(delta) | (delta > max_e)
                alpha = jnp.where(
                    jnp.isnan(delta), 0.0,
                    jnp.minimum(1.0, jnp.exp(-delta))).astype(dtype)

                # progressive multinomial within the subtree
                w = jnp.where(div, neg_inf, -h)
                s_logw_new = jnp.logaddexp(s_logw, w)
                take = s_alive & (log_u_leaf[:, leaf_idx] < w - s_logw_new)
                sq_prop = jnp.where(take[:, None], q_new, sq_prop)
                slp_prop = jnp.where(take, lp_new, slp_prop)
                sh_prop = jnp.where(take, h, sh_prop)
                s_logw = jnp.where(s_alive, s_logw_new, s_logw)

                # static checkpoint bookkeeping
                slot = int.bit_count(i >> 1)
                if i % 2 == 0:
                    st = (s_alive & ~div)[:, None]
                    if ckpt_p[slot] is None:
                        ckpt_p[slot] = jnp.where(st, p_new,
                                                 jnp.zeros_like(p_new))
                        ckpt_ps[slot] = jnp.where(st, s_psum,
                                                  jnp.zeros_like(s_psum))
                    else:
                        ckpt_p[slot] = jnp.where(st, p_new, ckpt_p[slot])
                        ckpt_ps[slot] = jnp.where(st, s_psum,
                                                  ckpt_ps[slot])
                s_psum = jnp.where(sa, s_psum + p_new, s_psum)
                if i % 2 == 1:
                    t_ones = _trailing_ones_static(i)
                    idx_max = slot
                    v_new = p_new * inv_m
                    turn_any = jnp.zeros((bc,), jnp.bool_)
                    for sl in range(idx_max - t_ones + 1, idx_max + 1):
                        sub = s_psum - ckpt_ps[sl]
                        turn_any = turn_any | (
                            jnp.sum(sub * (ckpt_p[sl] * inv_m),
                                    axis=1) <= 0.0) | (
                            jnp.sum(sub * v_new, axis=1) <= 0.0)
                    s_turn = s_turn | (s_alive & ~div & turn_any)
                s_div = s_div | (s_alive & div)
                sum_alpha = sum_alpha + jnp.where(s_alive, alpha, 0.0)
                n_leap = n_leap + s_alive.astype(jnp.int32)
                qq = jnp.where(sa, q_new, qq)
                pp = jnp.where(sa, p_new, pp)
                gg = jnp.where(sa, g_new, gg)
                leaf_idx += 1

            # -- doubling merge (mcmc/nuts.py _transition_one body) ----- #
            stop = s_turn | s_div
            take_m = alive & ~stop & (
                log_u_merge[:, k] < s_logw - logw)
            q_prop = jnp.where(take_m[:, None], sq_prop, q_prop)
            lp_prop = jnp.where(take_m, slp_prop, lp_prop)
            h_prop = jnp.where(take_m, sh_prop, h_prop)
            merge_ok = alive & ~stop
            mo = merge_ok[:, None]
            logw = jnp.where(merge_ok, jnp.logaddexp(logw, s_logw), logw)
            psum = jnp.where(mo, psum + s_psum, psum)
            advR = mo & dir_k[:, None]
            advL = mo & ~dir_k[:, None]
            qR = jnp.where(advR, qq, qR)
            pR = jnp.where(advR, pp, pR)
            gR = jnp.where(advR, gg, gR)
            qL = jnp.where(advL, qq, qL)
            pL = jnp.where(advL, pp, pL)
            gL = jnp.where(advL, gg, gL)
            merged_turn = merge_ok & (
                (jnp.sum(psum * (pL * inv_m), axis=1) <= 0.0)
                | (jnp.sum(psum * (pR * inv_m), axis=1) <= 0.0))
            # boolean algebra instead of where: Mosaic cannot select_n
            # on i1 vectors ("unsupported target bitwidth").
            turning = (~alive & turning) | (
                alive & ((stop & s_turn) | (~stop & merged_turn)))
            diverging = diverging | (alive & s_div)
            depth = depth + alive.astype(jnp.int32)
            alive = alive & ~stop & ~merged_turn

        accept_stat = sum_alpha / jnp.maximum(
            n_leap.astype(dtype), 1.0)

        oq_ref[:] = q_prop
        olp_ref[:] = lp_prop[:, None]
        oh_ref[:] = h_prop[:, None]
        oacc_ref[:] = accept_stat[:, None]
        odep_ref[:] = depth[:, None]
        olf_ref[:] = n_leap[:, None]
        otrn_ref[:] = turning.astype(jnp.int32)[:, None]
        odiv_ref[:] = diverging.astype(jnp.int32)[:, None]

    vec_spec = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f_vec = jax.ShapeDtypeStruct((c, 1), dtype)
    i_vec = jax.ShapeDtypeStruct((c, 1), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # step size
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # inv_mass
        ]
        + [replicated_block_spec(x) for x in vag_consts],
        out_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
            vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            f_vec, f_vec, f_vec, i_vec, i_vec, i_vec, i_vec,
        ],
        interpret=interpret,
    )(seed, step_size_arr, q, inv_mass, *vag_consts)

    q_new, lp, h, acc, dep, leap, trn, div = outs
    sq = lambda v: v[:, 0]
    return (q_new, sq(lp), sq(h), sq(acc), sq(dep), sq(leap),
            sq(trn).astype(bool), sq(div).astype(bool))


def fused_nuts_transition_looped(
    vag,
    q,
    inv_mass,
    step_size,
    key,
    max_tree_depth: int,
    max_delta_energy: float,
    block_chains: int = 128,
    interpret: bool = False,
):
    """Deep-tree variant of :func:`fused_nuts_transition` (same contract).

    The unrolled kernel compiles ``2**max_tree_depth - 1`` leaf bodies —
    fine at depth <= 6, prohibitive at the class default 10. Here the
    doublings stay unrolled (O(max_tree_depth) of them) but each
    subtree's leaves run under a ``lax.while_loop`` with a traced leaf
    index: checkpoint slots (``popcount(i >> 1)``) become masked writes
    over the ``max_tree_depth`` VMEM checkpoint buffers, the per-level
    U-turn ranges become masked checks over the same slots, and the loop
    EXITS EARLY once every chain in the block has stopped — unlike the
    unrolled kernel, which always executes all leaves. Randomness is
    drawn from the hardware PRNG inside the loop, so the per-chain
    stream position is schedule-dependent (each consumed draw is still
    fresh/iid — the fused-kernel contract of same-distribution,
    different-stream holds).
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
    D = int(max_tree_depth)
    assert 1 <= D <= _MAX_LOOPED_DEPTH
    grid = (c // bc,)
    dtype = q.dtype

    step_size_arr = jnp.reshape(jnp.asarray(step_size, dtype), (1, 1))
    seed = _key_to_seed(key)
    max_e = float(max_delta_energy)

    vag_c, vag_consts, vag_shapes = hoist_closure_consts(
        vag, jax.ShapeDtypeStruct((bc, d), dtype)
    )
    n_v = len(vag_consts)

    def kernel(seed_ref, ss_ref, q_ref, im_ref, *refs):
        v_refs = refs[:n_v]
        (oq_ref, olp_ref, oh_ref, oacc_ref, odep_ref, olf_ref,
         otrn_ref, odiv_ref) = refs[n_v:]
        blk = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + blk, seed_ref[1] + jnp.int32(17))
        ss = ss_ref[0, 0]
        inv_m = im_ref[:]  # [1, d]
        csts = [jnp.reshape(r[:], s) for r, s in zip(v_refs, vag_shapes)]

        def VAG(qb):
            return vag_c(qb, *csts)

        def draw_u(cols):
            return uniform_from_bits(pltpu.bitcast(
                pltpu.prng_random_bits((bc, cols)), jnp.uint32))

        def log_u(cols):
            return jnp.log(jnp.maximum(draw_u(cols), float(1e-12)))

        def popcount_scalar(x):
            """SWAR popcount on a traced int32 SCALAR — Mosaic's
            ``population_count`` lowering rejects scalars, so spell it
            with shifts/masks (all plain scalar int ops)."""
            x = x - ((x >> 1) & jnp.int32(0x55555555))
            x = ((x & jnp.int32(0x33333333))
                 + ((x >> 2) & jnp.int32(0x33333333)))
            x = (x + (x >> 4)) & jnp.int32(0x0F0F0F0F)
            return (x * jnp.int32(0x01010101)) >> 24

        q0 = q_ref[:]
        neg_inf = jnp.asarray(-jnp.inf, dtype)

        p0 = split_boxmuller_normal(bc, d).astype(dtype) / jnp.sqrt(inv_m)
        lp0, g0 = VAG(q0)
        h0 = -lp0 + 0.5 * jnp.sum(p0 * p0 * inv_m, axis=1)

        # --- trajectory state (the unrolled kernel's) ------------------ #
        qL = qR = q0
        pL = pR = p0
        gL = gR = g0
        q_prop, lp_prop, h_prop = q0, lp0, h0
        logw = -h0
        psum = p0

        # Mosaic's scf.while lowering cannot reconcile the layouts of
        # 1-D [bc] carries (reduction results are lane-REPLICATED,
        # elementwise results are not; splat-constant inits replicate
        # too), and it rejects i1 minor-dim inserts inside loop bodies.
        # So EVERY loop-carried per-chain quantity is [bc, 1] float32
        # (concrete {0,0} layouts throughout, booleans as 0/1 floats);
        # the merge code between doublings converts back to the unrolled
        # kernel's 1-D forms in straight-line code, where relayouts work.
        zeros_bd = q0 * jnp.zeros((), dtype)
        false_b = h0 < neg_inf          # [bc] all-False, non-replicated
        lp02 = lp0[:, None]             # [bc, 1]
        h02 = h0[:, None]
        zero2 = h02 * jnp.zeros((), dtype)  # [bc, 1] zeros, non-splat
        ckpt_p = (zeros_bd,) * D
        ckpt_ps = (zeros_bd,) * D
        ones_row = jnp.ones((1, d), dtype)

        def mask2(m):
            """[bc] bool -> FULL-WIDTH [bc, d] bool (straight-line code
            only; avoids lane-replicated [bc, 1] i1 masks)."""
            return (m.astype(dtype)[:, None] * ones_row) > 0.5

        alive = ~false_b
        turning = false_b
        diverging = false_b
        depth = false_b.astype(jnp.int32)
        n_leap2 = zero2   # [bc, 1] f32 leapfrog count (i32 at the end)
        sum_alpha2 = zero2

        for k in range(D):  # --- doublings, unrolled ------------------- #
            dir_k = draw_u(1)[:, 0] < 0.5
            dir2 = mask2(dir_k)
            eps_s = jnp.where(dir_k, ss, -ss)[:, None]
            qq = jnp.where(dir2, qR, qL)
            pp = jnp.where(dir2, pR, pL)
            gg = jnp.where(dir2, gR, gL)
            alivef = alive.astype(dtype)[:, None]  # [bc, 1]

            n_leaf = 1 << k

            def cond(carry):
                (i, _qq, _pp, _gg, s_logw2, s_psum, s_turnf, s_divf,
                 *_rest) = carry
                live = alivef * (1.0 - s_turnf) * (1.0 - s_divf)
                return (i < n_leaf) & (jnp.sum(live) > 0.0)

            def body(carry):
                (i, qq, pp, gg, s_logw2, s_psum, s_turnf, s_divf,
                 sq_prop, slp2, sh2, ckpt_p, ckpt_ps,
                 sum_alpha2, n_leap2) = carry
                s_alivef = alivef * (1.0 - s_turnf) * (1.0 - s_divf)
                sa = (s_alivef * ones_row) > 0.5  # [bc, d]
                p_half = pp + 0.5 * eps_s * gg
                q_new = qq + eps_s * p_half * inv_m
                lp_new, g_new = VAG(q_new)
                p_new = p_half + 0.5 * eps_s * g_new
                h2 = -lp_new[:, None] + 0.5 * jnp.sum(
                    p_new * p_new * inv_m, axis=1, keepdims=True)
                delta2 = h2 - h02
                nan2 = jnp.isnan(delta2)
                divf = (nan2 | (delta2 > max_e)).astype(dtype)
                alpha2 = jnp.where(
                    nan2, zero2, jnp.minimum(1.0, jnp.exp(-delta2)))

                # progressive multinomial within the subtree
                w2 = jnp.where(divf > 0.5, zero2 + neg_inf, -h2)
                s_logw_new2 = jnp.logaddexp(s_logw2, w2)
                takef = s_alivef * (
                    log_u(1) < w2 - s_logw_new2).astype(dtype)
                sq_prop = jnp.where((takef * ones_row) > 0.5, q_new,
                                    sq_prop)
                slp2 = jnp.where(takef > 0.5, lp_new[:, None], slp2)
                sh2 = jnp.where(takef > 0.5, h2, sh2)
                s_logw2 = jnp.where(s_alivef > 0.5, s_logw_new2,
                                    s_logw2)

                # masked checkpoint bookkeeping at traced slot indices
                slot = popcount_scalar(i >> 1)
                evenf = ((i % 2) == 0).astype(dtype)  # scalar 0/1
                stf = s_alivef * (1.0 - divf)  # [bc, 1]
                new_p, new_ps = [], []
                for s in range(D):
                    hitf = evenf * (slot == s).astype(dtype)  # scalar
                    write = (stf * hitf * ones_row) > 0.5
                    new_p.append(jnp.where(write, p_new, ckpt_p[s]))
                    new_ps.append(jnp.where(write, s_psum, ckpt_ps[s]))
                ckpt_p = tuple(new_p)
                ckpt_ps = tuple(new_ps)
                s_psum = jnp.where(sa, s_psum + p_new, s_psum)

                # odd leaf: masked U-turn checks over live slot range
                n = i + 1
                t_ones = popcount_scalar((n & -n) - 1)
                idx_max = slot  # popcount(i >> 1) for odd i
                idx_min = idx_max - t_ones + 1
                v_new = p_new * inv_m
                oddf = 1.0 - evenf
                turn_anyf = zero2
                for s in range(D):
                    livef = oddf * ((s >= idx_min)
                                    & (s <= idx_max)).astype(dtype)
                    sub = s_psum - ckpt_ps[s]
                    turn_s2 = (
                        (jnp.sum(sub * (ckpt_p[s] * inv_m), axis=1,
                                 keepdims=True) <= 0.0)
                        | (jnp.sum(sub * v_new, axis=1,
                                   keepdims=True) <= 0.0)
                    ).astype(dtype)
                    turn_anyf = jnp.maximum(turn_anyf, turn_s2 * livef)
                s_turnf = jnp.maximum(s_turnf, stf * turn_anyf)
                s_divf = jnp.maximum(s_divf, s_alivef * divf)
                sum_alpha2 = sum_alpha2 + s_alivef * alpha2
                n_leap2 = n_leap2 + s_alivef
                qq = jnp.where(sa, q_new, qq)
                pp = jnp.where(sa, p_new, pp)
                gg = jnp.where(sa, g_new, gg)
                return (i + 1, qq, pp, gg, s_logw2, s_psum, s_turnf,
                        s_divf, sq_prop, slp2, sh2, ckpt_p,
                        ckpt_ps, sum_alpha2, n_leap2)

            init = (jnp.zeros((), jnp.int32), qq, pp, gg,
                    zero2 + neg_inf, zeros_bd, zero2, zero2,
                    qq, lp02, h02, ckpt_p, ckpt_ps, sum_alpha2, n_leap2)
            (_, qq, pp, gg, s_logw2, s_psum, s_turnf, s_divf, sq_prop,
             slp2, sh2, ckpt_p, ckpt_ps, sum_alpha2,
             n_leap2) = jax.lax.while_loop(cond, body, init)

            # back to the unrolled kernel's 1-D forms (straight-line)
            s_logw = s_logw2[:, 0]
            s_turn = s_turnf[:, 0] > 0.5
            s_div = s_divf[:, 0] > 0.5
            slp_prop = slp2[:, 0]
            sh_prop = sh2[:, 0]

            # -- doubling merge (identical to the unrolled kernel) ------ #
            stop = s_turn | s_div
            take_m = alive & ~stop & (log_u(1)[:, 0] < s_logw - logw)
            q_prop = jnp.where(mask2(take_m), sq_prop, q_prop)
            lp_prop = jnp.where(take_m, slp_prop, lp_prop)
            h_prop = jnp.where(take_m, sh_prop, h_prop)
            merge_ok = alive & ~stop
            mo = mask2(merge_ok)
            logw = jnp.where(merge_ok, jnp.logaddexp(logw, s_logw), logw)
            psum = jnp.where(mo, psum + s_psum, psum)
            advR = mask2(merge_ok & dir_k)
            advL = mask2(merge_ok & ~dir_k)
            qR = jnp.where(advR, qq, qR)
            pR = jnp.where(advR, pp, pR)
            gR = jnp.where(advR, gg, gR)
            qL = jnp.where(advL, qq, qL)
            pL = jnp.where(advL, pp, pL)
            gL = jnp.where(advL, gg, gL)
            merged_turn = merge_ok & (
                (jnp.sum(psum * (pL * inv_m), axis=1) <= 0.0)
                | (jnp.sum(psum * (pR * inv_m), axis=1) <= 0.0))
            turning = (~alive & turning) | (
                alive & ((stop & s_turn) | (~stop & merged_turn)))
            diverging = diverging | (alive & s_div)
            depth = depth + alive.astype(jnp.int32)
            alive = alive & ~stop & ~merged_turn

        accept_stat2 = sum_alpha2 / jnp.maximum(n_leap2, 1.0)

        oq_ref[:] = q_prop
        olp_ref[:] = lp_prop[:, None]
        oh_ref[:] = h_prop[:, None]
        oacc_ref[:] = accept_stat2
        odep_ref[:] = depth[:, None]
        olf_ref[:] = n_leap2.astype(jnp.int32)
        otrn_ref[:] = turning.astype(jnp.int32)[:, None]
        odiv_ref[:] = diverging.astype(jnp.int32)[:, None]

    vec_spec = pl.BlockSpec((bc, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f_vec = jax.ShapeDtypeStruct((c, 1), dtype)
    i_vec = jax.ShapeDtypeStruct((c, 1), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # step size
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # inv_mass
        ]
        + [replicated_block_spec(x) for x in vag_consts],
        out_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec, vec_spec, vec_spec,
            vec_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), dtype),
            f_vec, f_vec, f_vec, i_vec, i_vec, i_vec, i_vec,
        ],
        interpret=interpret,
    )(seed, step_size_arr, q, inv_mass, *vag_consts)

    q_new, lp, h, acc, dep, leap, trn, div = outs
    sq = lambda v: v[:, 0]
    return (q_new, sq(lp), sq(h), sq(acc), sq(dep), sq(leap),
            sq(trn).astype(bool), sq(div).astype(bool))
