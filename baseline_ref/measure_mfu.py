"""MFU / roofline accounting for the headline workloads (VERDICT r4 #5).

Translates each headline number into fraction-of-chip so "fast" is
judged against silicon, not only against the sess.run-bound TF1
reference loop:

- **MXU-bound training workloads** (VAE sweep, acceptance-matrix
  configs): FLOPs per step come from XLA's own cost model
  (``compiled.cost_analysis()``) of EXACTLY the step function the
  recorded artifact timed (same builders:
  ``baseline_ref.measure_configs_ours.BUILDS``, ``examples...vae
  make_train_step``); steps/sec come from the recorded artifacts
  (ours_configs.json, vae_headroom.json, ours_vae.json), measured on the
  same chip under the work-scaling protocol. ``mfu = flops_per_step *
  steps_per_sec / peak``.
- **VPU-bound fused samplers** (the HMC kernel behind the bench
  headline): XLA cannot see inside a Pallas custom call, so the FLOP /
  transcendental counts are MODELED op-by-op from the kernel source
  (ops/hmc_step.py; model spelled out in PERF.md round 5) and the
  achieved rates are reported against an EMPIRICAL ceiling measured
  on-chip by dependent-chain VMEM-resident Pallas microkernels (no
  datasheet VPU number exists; a measured ceiling is the honest
  denominator). The HBM side reuses the bytes model already in bench.py.

Peaks (TPU v5e, 1 chip): MXU 197e12 bf16 FLOP/s — f32 matmuls at
default precision execute as bf16 MXU passes with f32 accumulation, so
they ride the same array (PERF.md round-5 mixing-bench post-mortem is
exactly this behavior); HBM 819 GB/s.

Writes baseline_ref/mfu.json. Run on the TPU:
``python -m baseline_ref.measure_mfu``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "mfu.json")

MXU_PEAK_FLOPS = 197e12  # v5e bf16 (f32-in matmuls ride the same MXU)
HBM_PEAK_GBPS = 819.0


def _read(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def flops_of(fn, *args):
    """XLA's modeled FLOPs for one call of ``fn(*args)`` (HLO cost
    analysis of the compiled program on the current backend). Pallas
    custom calls are opaque to it — counts are exact for the dense
    workloads here and an undercount wherever a fused kernel hides work
    (flagged per-row)."""
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed",
                                                     0.0))


# ------------------------------------------------------------------ #
# Empirical VPU ceilings: dependent-chain in-VMEM Pallas microkernels
# ------------------------------------------------------------------ #
def _vpu_kernel(transcendental, n_inner=512, shape=(512, 512)):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, x):
            if transcendental:
                # dependent chain of exp, stays in (0, 1]
                return jnp.exp(-x) * 0.999
            # dependent FMA chain
            return x * 1.000001 + 1e-7

        o_ref[:] = jax.lax.fori_loop(0, n_inner, body, x)

    x = jnp.full(shape, 0.5, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )(x))
    o = f(x)
    jax.block_until_ready(o)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x)  # chained: iterations are data-dependent
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    n_elems = shape[0] * shape[1]
    ops = n_elems * n_inner * reps  # 1 FMA (=2 flops) or 1 exp per elem
    return ops / dt


def measure_vpu_ceilings():
    fma_per_sec = _vpu_kernel(False)
    exp_per_sec = _vpu_kernel(True)
    return {
        "fma_flops_per_sec_T": round(2 * fma_per_sec / 1e12, 3),
        "exp_per_sec_G": round(exp_per_sec / 1e9, 2),
        "what": ("dependent-chain in-VMEM Pallas microkernels, 512x512 "
                 "f32, 512 inner iters, 50 chained reps"),
    }


# ------------------------------------------------------------------ #
# MXU workloads: cost-analysis FLOPs x recorded steps/sec
# ------------------------------------------------------------------ #
def measure_configs_mfu():
    from baseline_ref.measure_configs_ours import BUILDS

    recorded = _read("ours_configs.json")
    rows = {}
    for name, build in BUILDS.items():
        step, carry, xs, _, _ = build()
        x0 = jax.tree.map(lambda a: a[0], xs)
        flops, bytes_ = flops_of(step, carry, x0)
        sps = recorded[name]["steps_per_sec"]
        rows[name] = {
            "flops_per_step_M": round(flops / 1e6, 3),
            "hlo_bytes_per_step_M": round(bytes_ / 1e6, 3),
            "steps_per_sec": sps,
            "achieved_tflops": round(flops * sps / 1e12, 4),
            "mfu_vs_197T": round(flops * sps / MXU_PEAK_FLOPS, 5),
            "hbm_frac_vs_819GBps": round(
                bytes_ * sps / (HBM_PEAK_GBPS * 1e9), 4),
        }
        if name == "svgp":
            rows[name]["note"] = (
                "flops exclude the fused Cholesky+inverse Pallas kernel "
                "(~1.4 MFLOP/step, opaque to HLO cost analysis)")
    return rows


def measure_vae_mfu():
    import optax

    from examples.variational_autoencoders.vae import (
        init_params, make_train_step)

    headroom = _read("vae_headroom.json")
    optimizer = optax.adam(1e-3)
    params = init_params(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, 40)
    key = jax.random.PRNGKey(1)
    rows = []
    for row in headroom["rows"]:
        b = row["batch"]
        x = jnp.zeros((b, 784), jnp.float32)
        flops, bytes_ = flops_of(step, params, opt_state, x, key)
        sps = row["steps_per_sec"]
        rows.append({
            "batch": b,
            "flops_per_step_M": round(flops / 1e6, 2),
            "steps_per_sec": sps,
            "examples_per_sec_M": round(row["examples_per_sec"] / 1e6, 2),
            "achieved_tflops": round(flops * sps / 1e12, 3),
            "mfu_vs_197T": round(flops * sps / MXU_PEAK_FLOPS, 4),
            "hbm_frac_vs_819GBps": round(
                bytes_ * sps / (HBM_PEAK_GBPS * 1e9), 4),
        })
    return {"rows": rows,
            "what": "VAE 784-500-500 z40 SGVB step (vae_headroom.json "
                    "steps/sec; XLA cost-analysis flops)"}


# ------------------------------------------------------------------ #
# Fused HMC kernel: modeled VPU ops vs measured ceilings
# ------------------------------------------------------------------ #
def measure_hmc_kernel_roofline(n_chains=32768):
    import zhusuan_tpu as zs
    sys.path.insert(0, os.path.dirname(HERE))
    import bench

    state, burn, sample, _, _ = bench.build(
        jax, jnp, zs, n_chains, np.float32, fused=True,
        collect_kw=dict(collect_fields=("samples",),
                        collect_dtype=jnp.bfloat16))
    state, _ = burn(state, jax.random.PRNGKey(0))
    jax.block_until_ready(state.q["x"])
    o = sample(state, jax.random.PRNGKey(1))
    jax.block_until_ready(o[1]["samples"]["x"])
    del o
    dts = []
    for t in range(3):
        t0 = time.perf_counter()
        _, o = sample(state, jax.random.PRNGKey(2 + t))
        jax.block_until_ready(o["samples"]["x"])
        dts.append(time.perf_counter() - t0)
        del o
    dt = min(dts)
    d, L, n_iters = bench.DIM, 5, bench.N_ITERS
    iters_per_sec = n_chains * n_iters / dt
    # Op model per chain-iteration (ops/hmc_step.py, diag-Gaussian
    # target): momentum draw d Box-Muller normals (~2 transcendentals +
    # ~4 flops each), L leapfrogs x (drift FMA 2d + velocity mul d +
    # grad mul d + kick FMA 2d) = 6dL, two Hamiltonians ~6d each
    # (density 3d + kinetic 3d), MH exp ~1/chain.
    flops_per_iter = d * (6 * L + 12 + 4)
    trans_per_iter = 2 * d + 1
    return {
        "n_chains": n_chains, "dim": d, "n_leapfrogs": L,
        "chain_iters_per_sec_M": round(iters_per_sec / 1e6, 2),
        "modeled_vpu_flops_per_iter": flops_per_iter,
        "modeled_transcendentals_per_iter": trans_per_iter,
        "achieved_vpu_tflops": round(
            iters_per_sec * flops_per_iter / 1e12, 3),
        "achieved_transcendentals_G_per_sec": round(
            iters_per_sec * trans_per_iter / 1e9, 2),
        "hbm_gbps": round(3.5 * n_chains * d * 4 * n_iters / dt / 1e9, 1),
        "hbm_frac_vs_819GBps": round(
            3.5 * n_chains * d * 4 * n_iters / dt / (819e9), 3),
        "sample_sec_trials": [round(x, 3) for x in dts],
    }


def main():
    backend = jax.default_backend()
    out = {"backend": backend,
           "mxu_peak_flops_T": MXU_PEAK_FLOPS / 1e12,
           "hbm_peak_gbps": HBM_PEAK_GBPS}
    print("=== VPU ceilings", flush=True)
    out["vpu_ceiling"] = measure_vpu_ceilings()
    print(json.dumps(out["vpu_ceiling"]), flush=True)
    print("=== configs MFU", flush=True)
    out["configs"] = measure_configs_mfu()
    print(json.dumps(out["configs"]), flush=True)
    print("=== VAE MFU", flush=True)
    out["vae"] = measure_vae_mfu()
    print(json.dumps(out["vae"]), flush=True)
    print("=== fused HMC kernel roofline", flush=True)
    out["hmc_fused_kernel"] = measure_hmc_kernel_roofline()
    print(json.dumps(out["hmc_fused_kernel"]), flush=True)
    # derived utilization of the samplers vs the measured ceilings
    k = out["hmc_fused_kernel"]
    ceil = out["vpu_ceiling"]
    k["vpu_frac_vs_measured_fma_ceiling"] = round(
        k["achieved_vpu_tflops"] / ceil["fma_flops_per_sec_T"], 3)
    k["transcendental_frac_vs_measured_exp_ceiling"] = round(
        k["achieved_transcendentals_G_per_sec"] / ceil["exp_per_sec_G"],
        3)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
