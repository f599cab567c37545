"""Pallas fused mean-field ADVI trainer: the whole fit in one kernel.

One kernel launch runs the ENTIRE mean-field SGVB optimization in VMEM:
per step it draws the particle noise (TPU hardware PRNG + split
Box-Muller), evaluates the user's unconstrained log-posterior and its
z-gradient (traced into the kernel, like the density closures of
:mod:`zhusuan_tpu.ops.hmc_step`), forms the exact pathwise ELBO gradient
of the Gaussian parameters, and applies an Adam update — parameters,
Adam moments, and the particle buffer never leave VMEM. Host/HBM sees
one launch per fit instead of one dispatch (and ~60 fused XLA kernels)
per step, which is exactly what bounds small-model SGVB throughput
(PERF.md round-4/5 toy2d ablations: op-count/launch-bound at ~12us/step).

Why no autodiff of the estimator is needed: for a Gaussian
``q = N(loc, exp(log_scale)^2)`` scored at its own reparameterized
sample ``z = loc + sigma * eps``, the per-sample total derivative of the
entropy term ``-log q(z(theta); theta)`` is EXACTLY ``(0, 1)`` w.r.t.
``(loc, log_scale)`` (the score and path contributions cancel for loc
and leave the constant 1 for log_scale — the Gaussian
sticking-the-landing identity; equivalently, the library's own
``MeanFieldGuide.sample`` writes ``log q`` in its eps-form whose only
parameter dependence is the explicit ``-log_scale`` term). So the sgvb
gradient used by :func:`zhusuan_tpu.variational.elbo` reduces
per-sample to::

    d loss / d loc       = -dF/dz
    d loss / d log_scale = -dF/dz * sigma * eps - 1

with ``F(z) = log p(constrain(z)) + log|det J|`` — only the z-gradient
of the user density is required, supplied by ``jax.value_and_grad``
traced at kernel-trace time. The kernel's gradients are therefore
mathematically IDENTICAL per-sample to the scan path's autodiff
gradients given the same noise (pinned bitwise-level by
tests/test_ops_advi.py via the injected-noise path); the production
random stream is the hardware PRNG, so whole fits are statistically,
not bitwise, equivalent to the scan path — the same contract as every
other fused kernel here (``ops/hmc_step.py``).

Kernel structure: the step loop is the PALLAS GRID (sequential on TPU)
— per grid step the pipeline streams nothing but a ``[1, 1]`` loss
write; parameters and Adam moments live in VMEM scratch that persists
across grid steps. This keeps every memory access statically indexed
(no dynamic VMEM slicing for Mosaic to legalize) and lets tests inject
an explicit noise tensor as a pipelined input instead of the hardware
PRNG (``prng_random_bits`` is degenerate in interpret mode).

Adam follows optax exactly: ``m/v`` EW moments, bias correction
``1 - beta^t``, update ``lr * m_hat / (sqrt(v_hat) + eps)``; the
learning-rate schedule is any jnp-traceable ``t -> lr`` callable (optax
schedules qualify) evaluated in-kernel.

No reference counterpart (the reference has no automatic VI); this is
the TPU execution path for :func:`zhusuan_tpu.variational.advi`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.ops._pallas_utils import hoist_closure_consts

__all__ = ["fused_meanfield_advi", "advi_step_supported"]

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))

# The kernel keeps ~6 particle-sized buffers live (eps, z, grad, two
# Box-Muller halves, user-density temporaries); same per-buffer cap as
# the other fused kernels.
_BLOCK_BYTES_LIMIT = 1 << 20
# Loss trace is one [n_steps, 1] output.
_MAX_STEPS = 1 << 20


def advi_step_supported(dim: int, n_particles: int, n_steps: int,
                        itemsize: int = 4) -> bool:
    """Whether the fused trainer handles this problem size in VMEM."""
    if dim < 1 or n_steps < 1 or n_steps > _MAX_STEPS:
        return False
    if n_particles < 2 or n_particles % 2 != 0:
        return False  # split Box-Muller needs an even particle count
    return n_particles * dim * itemsize <= _BLOCK_BYTES_LIMIT


def fused_meanfield_advi(
    log_post_fn: Callable,
    loc0,
    log_scale0,
    n_steps: int,
    n_particles: int,
    key,
    lr_schedule: Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    adam_eps: float = 1e-8,
    noise: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Run the whole mean-field SGVB fit as one Pallas kernel.

    :param log_post_fn: ``z [dim] -> scalar`` unconstrained log density
        (log joint of constrained samples plus the bijector log-det),
        jnp-traceable; its ``jax.value_and_grad`` is traced into the
        kernel.
    :param loc0: ``[dim]`` float32 initial Gaussian location.
    :param log_scale0: ``[dim]`` float32 initial log standard deviation.
    :param n_steps: Adam steps to run inside the kernel.
    :param n_particles: ELBO particles per step (even).
    :param key: JAX PRNG key (hardware-PRNG seeding; stream differs from
        ``jax.random``, deterministic per key).
    :param lr_schedule: jnp-traceable ``step (f32, 0-based) -> lr``
        (optax schedules work; use ``lambda t: lr`` for a constant).
    :param noise: optional explicit standard-normal draws
        ``[n_steps, n_particles, dim]`` replacing the hardware PRNG —
        testing hook for exact-parity checks against the scan path
        (interpret mode has no real PRNG).
    :return: ``(loc [dim], log_scale [dim], losses [n_steps])`` — the
        fitted parameters and the per-step negative-ELBO estimates
        (same estimator value the scan path reports).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zhusuan_tpu.ops.random import _key_to_seed

    loc0 = jnp.asarray(loc0, jnp.float32).reshape(1, -1)
    log_scale0 = jnp.asarray(log_scale0, jnp.float32).reshape(1, -1)
    dim = loc0.shape[1]
    n_steps = int(n_steps)
    n_particles = int(n_particles)
    if not advi_step_supported(dim, n_particles, n_steps):
        raise ValueError(
            "fused_meanfield_advi: unsupported size (dim={}, "
            "n_particles={}, n_steps={}); n_particles must be even and "
            "the particle block must fit VMEM.".format(
                dim, n_particles, n_steps)
        )
    if noise is not None:
        noise = jnp.asarray(noise, jnp.float32)
        if noise.shape != (n_steps, n_particles, dim):
            raise ValueError(
                "noise must have shape [n_steps, n_particles, dim] = "
                "{}, got {}.".format((n_steps, n_particles, dim),
                                     noise.shape)
            )
        noise = noise.reshape(n_steps * n_particles, dim)

    vg = jax.vmap(jax.value_and_grad(log_post_fn))
    vg_c, vg_consts, vg_shapes = hoist_closure_consts(
        vg, jax.ShapeDtypeStruct((n_particles, dim), jnp.float32)
    )
    lr_c, lr_consts, lr_shapes = hoist_closure_consts(
        lr_schedule, jax.ShapeDtypeStruct((), jnp.float32)
    )

    seed = _key_to_seed(key)
    b1f, b2f, aef = float(b1), float(b2), float(adam_eps)
    dimf = float(dim)
    n_vg, n_lr = len(vg_consts), len(lr_consts)
    with_noise = noise is not None

    def kernel(seed_ref, loc_ref, ls_ref, *refs):
        pos = 0
        if with_noise:
            eps_ref = refs[0]
            pos = 1
        vg_refs = refs[pos:pos + n_vg]
        lr_refs = refs[pos + n_vg:pos + n_vg + n_lr]
        (loc_out, ls_out, loss_out,
         loc_sc, ls_sc, m_l, v_l, m_s, v_s) = refs[pos + n_vg + n_lr:]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            loc_sc[:] = loc_ref[:]
            ls_sc[:] = ls_ref[:]
            zeros = jnp.zeros((1, dim), jnp.float32)
            m_l[:] = zeros
            v_l[:] = zeros
            m_s[:] = zeros
            v_s[:] = zeros
            loss_out[:] = jnp.zeros((n_steps, 1), jnp.float32)

        vg_csts = [jnp.reshape(r[:], s)
                   for r, s in zip(vg_refs, vg_shapes)]
        lr_csts = [jnp.reshape(r[:], s)
                   for r, s in zip(lr_refs, lr_shapes)]

        if with_noise:
            eps = eps_ref[:]
        else:
            from zhusuan_tpu.ops._pallas_utils import (
                split_boxmuller_normal,
            )

            # Per-step stream: fold the grid step into the first seed
            # word (prng_seed takes at most 2 values; same convention as
            # ops/sgld_step.py's per-block fold).
            pltpu.prng_seed(seed_ref[0] + t, seed_ref[1])
            eps = split_boxmuller_normal(n_particles, dim)

        loc, ls = loc_sc[:], ls_sc[:]
        sigma = jnp.exp(ls)
        z = loc + sigma * eps
        f_vals, gz = vg_c(z, *vg_csts)
        # Exact per-sample sgvb gradients (module docstring).
        g_loc = -jnp.mean(gz, axis=0, keepdims=True)
        g_ls = (-jnp.mean(gz * (sigma * eps), axis=0, keepdims=True)
                - 1.0)
        # Loss estimate identical to the scan path's sgvb value:
        # -mean(F - log q(own sample)). Every reduction stays keepdims
        # [1, 1] — Mosaic cannot lower a vector reduction to a bare
        # scalar ("Offset change"). The trace is a full-array VMEM
        # block revisited every grid step (Mosaic forbids a (1, 1)
        # streamed block); the masked row write costs ~n_steps VPU
        # elements per step — noise next to the density work.
        mean_f = jnp.mean(jnp.reshape(f_vals, (n_particles, 1)),
                          axis=0, keepdims=True)
        mean_e2 = jnp.mean(
            jnp.sum(eps * eps, axis=-1, keepdims=True),
            axis=0, keepdims=True,
        )
        sum_ls = jnp.sum(ls, axis=-1, keepdims=True)
        loss = (-mean_f - 0.5 * mean_e2
                - dimf * _HALF_LOG_2PI - sum_ls)  # [1, 1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n_steps, 1), 0)
        loss_out[:] = jnp.where(row == t, loss, loss_out[:])

        tf = (t + 1).astype(jnp.float32)
        lr_t = lr_c(t.astype(jnp.float32), *lr_csts)
        c1 = 1.0 - jnp.power(b1f, tf)
        c2 = 1.0 - jnp.power(b2f, tf)

        def adam(p, g, m_ref, v_ref):
            m = b1f * m_ref[:] + (1.0 - b1f) * g
            v = b2f * v_ref[:] + (1.0 - b2f) * g * g
            m_ref[:] = m
            v_ref[:] = v
            return p - lr_t * (m / c1) / (jnp.sqrt(v / c2) + aef)

        loc_sc[:] = adam(loc, g_loc, m_l, v_l)
        ls_sc[:] = adam(ls, g_ls, m_s, v_s)
        loc_out[:] = loc_sc[:]
        ls_out[:] = ls_sc[:]

    from zhusuan_tpu.ops._pallas_utils import (
        replicated_block_spec as _replicated_spec,
    )

    param_spec = pl.BlockSpec((1, dim), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), param_spec,
                param_spec]
    operands = [seed, loc0, log_scale0]
    if with_noise:
        in_specs.append(
            pl.BlockSpec((n_particles, dim), lambda t: (t, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(noise)
    in_specs += [_replicated_spec(x) for x in vg_consts]
    in_specs += [_replicated_spec(x) for x in lr_consts]
    operands += [*vg_consts, *lr_consts]

    scratch = [pltpu.VMEM((1, dim), jnp.float32) for _ in range(6)]
    loc, ls, losses = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[
            param_spec,
            param_spec,
            pl.BlockSpec((n_steps, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, dim), jnp.float32),
            jax.ShapeDtypeStruct((1, dim), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return loc[0], ls[0], losses[:, 0]
