"""VAE chip-headroom sweep (VERDICT r3 item 9): what the TPU can do on
the north-star VAE workload beyond the protocol-matched batch-128 run.

Sweeps batch size 128 -> 8192 on the protocol architecture
(784-500-500, z_dim 40, Bernoulli likelihood, Adam 1e-3, dynamic
binarization) and records steps/sec AND examples/sec (ELBO-gradient
throughput). The protocol-matched batch-128 number stays the north-star
comparison (the reference's own config); this artifact documents where
the MLP becomes compute-bound on the v5e. Timing: jitted lax.scan over
steps, host-fetch barrier, auto-repeat to >=0.5s trials, work-scaling
ratio recorded (the measure_configs_ours.py methodology).

Run: ``python -m baseline_ref.measure_vae_headroom``.
Writes baseline_ref/vae_headroom.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from baseline_ref.vae_protocol import LR, Z_DIM, load_train

BATCHES = [128, 256, 512, 1024, 2048, 4096, 8192]
TIMED_STEPS = 200
MIN_TRIAL_SEC = 0.5
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "vae_headroom.json")


def measure_batch(x_train, batch, compute_dtype=None):
    from examples.variational_autoencoders.vae import elbo_loss, init_params

    n = x_train.shape[0]
    # The 10k-row pool stays device-resident ONCE; each step gathers its
    # batch by index on-device (shipping a tiled [steps, batch, 784]
    # array through the tunnel would be GBs at batch 8192).
    x_pool = jnp.asarray(x_train)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(
        rng.randint(0, n, size=(TIMED_STEPS, batch)), jnp.int32)

    key = jax.random.PRNGKey(7)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_train.shape[1], Z_DIM)
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)

    def body(carry, inp):
        p, o = carry
        idx_t, k = inp
        x_real = x_pool[idx_t]
        kb, kg = jax.random.split(k)
        x = (jax.random.uniform(kb, x_real.shape) < x_real).astype(
            jnp.float32)
        loss, grads = jax.value_and_grad(elbo_loss)(
            p, x, kg, Z_DIM, 1, compute_dtype)
        updates, o = optimizer.update(grads, o)
        return (optax.apply_updates(p, updates), o), -loss

    run = jax.jit(lambda c, idx, keys: jax.lax.scan(body, c, (idx, keys)))

    def keys_for(tag):
        return jax.random.split(jax.random.PRNGKey(100 + tag), TIMED_STEPS)

    carry = (params, opt_state)
    carry, lbs = run(carry, idx, keys_for(0))  # compile + warmup
    float(np.asarray(lbs)[-1])
    t0 = time.perf_counter()
    carry, lbs = run(carry, idx, keys_for(1))
    float(np.asarray(lbs)[-1])
    est = time.perf_counter() - t0
    repeats = int(min(256, max(1, np.ceil(MIN_TRIAL_SEC / max(est, 1e-3)))))

    def timed(n_rep, base):
        nonlocal carry
        t0 = time.perf_counter()
        for r in range(n_rep):
            carry, lbs = run(carry, idx, keys_for(base + r))
        last = float(np.asarray(lbs)[-1])
        return time.perf_counter() - t0, last

    best, last = np.inf, float("nan")
    for trial in range(3):
        dt, last = timed(repeats, 1000 * (trial + 1))
        best = min(best, dt)
    dt2, _ = timed(2 * repeats, 9000)
    sps = repeats * TIMED_STEPS / best
    return {
        "batch": batch,
        "steps_per_sec": round(sps, 1),
        "examples_per_sec": round(sps * batch, 0),
        "timed_sec": round(best, 3),
        "repeats": repeats,
        "work_scaling_2x": round(dt2 / best, 2),
        "final_lb": round(last, 2),
    }


BF16_BATCHES = [128, 2048, 8192]


def main():
    x_train = load_train()
    platform = jax.devices()[0].platform
    rows = []
    for batch in BATCHES:
        row = measure_batch(x_train, batch)
        rows.append(row)
        print(json.dumps(row), flush=True)
    # Mixed-precision rows (round 5): bf16 encoder/decoder matmuls with
    # f32 master params and f32 log-probs (examples/utils/nn.py). The
    # wide-batch step is HBM-bound in f32 (hbm_frac ~1.0 at 8192 per
    # mfu.json), so halving activation/weight bytes is the lever the
    # roofline points at. final_lb records training-quality parity.
    bf16_rows = []
    for batch in BF16_BATCHES:
        row = measure_batch(x_train, batch, compute_dtype=jnp.bfloat16)
        bf16_rows.append(row)
        print(json.dumps({"bf16": row}), flush=True)
    result = {
        "what": "VAE 784-500-500 z40 SGVB batch sweep ({} backend); "
                "protocol-matched batch-128 stays the north-star "
                "number".format(platform),
        "timed_steps": TIMED_STEPS,
        "rows": rows,
        "bf16_compute_rows": bf16_rows,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
