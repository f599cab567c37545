"""bf16-STATE stationarity + throughput study (PERF.md round 4).

VERDICT r3 item 10: the one open fused-kernel lever — keep the
HBM-resident chain positions in bfloat16 while ALL in-VMEM compute (the
trajectory, both Hamiltonians, the MH energies) stays f32. This script
measures, on the real TPU:

1. Stationarity: long fixed-(step, mass) runs from an f32-adapted warm
   start, f32 state vs bf16 state — per-dimension mean error and std
   rel-err vs the analytic target, acceptance rate, reference-estimator
   ESS. bf16 rounding after the accept step is a non-volume-preserving
   perturbation, so exact detailed balance is broken; this bounds the
   bias empirically.
2. Throughput: 3-trial keyed A/B of the fused sample phase at the bench
   config (32768 chains x 100 dims, 500 iters, samples-only bf16
   collect).

Writes bf16_state.json next to this file and prints a summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs

HERE = os.path.dirname(os.path.abspath(__file__))
DIM = 100
STDS = np.linspace(0.5, 2.0, DIM).astype(np.float32)


def log_joint(obs):
    z = obs["x"] / jnp.asarray(STDS)
    return -0.5 * jnp.sum(z * z, axis=-1)


def warm_start(n_chains, key, n_warm=500):
    """Adapt step size + diagonal mass in f32; return the final state."""
    hmc = zs.HMC(step_size=0.1, n_leapfrogs=5, adapt_step_size=True,
                 adapt_mass=True, target_acceptance_rate=0.8)
    state = hmc.init(
        {"x": 0.1 * jax.random.normal(key, (n_chains, DIM))},
        log_joint=log_joint,
    )
    state, _ = jax.jit(lambda s, k: hmc.run(
        log_joint, {}, s, k, n_warm, n_adapt=n_warm, collect=False
    ))(state, key)
    jax.block_until_ready(state.q["x"])
    return state


def make_phase(state, q_dtype, n_iters, thinning=1):
    """Fixed-(step, mass) sample phase with the state cast to q_dtype.

    Returns ``(jitted_fn, initial_state)`` — jit ONCE and reuse across
    trials so timings measure the sample scan, not retracing.
    """
    hmc = zs.HMC(step_size=float(state.step_size), n_leapfrogs=5)
    st = hmc.init({"x": state.q["x"].astype(q_dtype)},
                  log_joint=log_joint)
    st = st._replace(mass={k: v for k, v in state.mass.items()},
                     step_size=state.step_size)
    fn = jax.jit(lambda s, k: hmc.run(
        log_joint, {}, s, k, n_iters, n_adapt=0,
        collect_fields=("samples", "acceptance_rate"),
        collect_dtype=jnp.bfloat16, thinning=thinning,
    ))
    return fn, st


def run_phase(state, q_dtype, n_iters, key, thinning=1):
    fn, st = make_phase(state, q_dtype, n_iters, thinning)
    return fn(st, key)


def stationarity(n_chains=8192, n_iters=2000, thinning=4):
    ws = warm_start(n_chains, jax.random.PRNGKey(0))
    rows = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        st, out = run_phase(ws, dt, n_iters, jax.random.PRNGKey(7),
                            thinning=thinning)
        draws = np.asarray(out["samples"]["x"], np.float32)  # [T, C, D]
        acc = float(np.mean(np.asarray(out["acceptance_rate"],
                                       np.float32)))
        flat = draws.reshape(-1, DIM)
        mean_err = float(np.max(np.abs(flat.mean(0)) / STDS))
        std_rel = float(np.max(np.abs(flat.std(0) / STDS - 1.0)))
        from zhusuan_tpu.diagnostics import ess_batch
        sub = draws[:, :256, :].reshape(draws.shape[0], -1)
        ess = float(np.sum(np.asarray(ess_batch(sub.astype(np.float64)))))
        rows[name] = dict(acceptance=acc, worst_mean_err_sigma=mean_err,
                          worst_std_rel_err=std_rel, total_ess=ess,
                          n_draws=int(flat.shape[0]))
        print(f"[stationarity {name}] acc={acc:.4f} "
              f"worst|mean|/sigma={mean_err:.5f} "
              f"worst std rel err={std_rel:.5f} ESS={ess:.0f}")
    return rows


def throughput(n_chains=32768, n_iters=500, n_trials=3):
    ws = warm_start(n_chains, jax.random.PRNGKey(1))
    rows = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn, st0 = make_phase(ws, dt, n_iters)
        # Warm the compile outside the timed region.
        st, out = fn(st0, jax.random.PRNGKey(99))
        jax.block_until_ready(st.q["x"])
        times = []
        for t in range(n_trials):
            key = jax.random.PRNGKey(100 + t)
            t0 = time.perf_counter()
            st, out = fn(st0, key)
            jax.block_until_ready(st.q["x"])
            times.append(time.perf_counter() - t0)
        best = min(times)
        rows[name] = dict(seconds=best, us_per_iter=1e6 * best / n_iters,
                          trials=[round(x, 4) for x in times])
        print(f"[throughput {name}] {best:.3f}s / {n_iters} iters "
              f"({1e6 * best / n_iters:.0f} us/iter)  trials={times}")
    rows["speedup_bf16"] = rows["f32"]["seconds"] / rows["bf16"]["seconds"]
    print(f"[throughput] bf16-state speedup: {rows['speedup_bf16']:.3f}x")
    return rows


if __name__ == "__main__":
    print("devices:", jax.devices())
    phases = sys.argv[1:] or ["stationarity", "throughput"]
    path = os.path.join(HERE, "bf16_state.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    if "stationarity" in phases:
        out["stationarity"] = stationarity()
    if "throughput" in phases:
        out["throughput"] = throughput()
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
