"""Our-side VAE run for the ELBO-curve comparison (north star part 2).

Identical protocol to measure_vae_ref.py by construction (shared
vae_protocol.py): same synthetic MNIST subset, same per-epoch permutations,
same architecture/init family (He-normal 784-500-500, z_dim 40), same
dynamic per-batch binarization, Adam 1e-3, batch 128, 20 epochs. Runs on
CPU — the curve is about statistical agreement, not speed (bench.py owns
the throughput numbers).

Each epoch is one jitted lax.scan over batches (the library's intended
training pattern). Writes baseline_ref/ours_vae.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from baseline_ref.vae_protocol import (
    BATCH, EPOCHS, LR, Z_DIM, load_train, permutations,
)


def main(seed=1, epochs=EPOCHS, write=True):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from examples.variational_autoencoders.vae import elbo_loss, init_params

    x_train = load_train()
    n_batches = x_train.shape[0] // BATCH

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_params(init_key, x_train.shape[1], Z_DIM)
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)

    @jax.jit
    def epoch_fn(params, opt_state, xs, key):
        def body(carry, inp):
            p, o = carry
            x_real, k = inp
            kb, kg = jax.random.split(k)
            # Dynamic binarization, mirroring the reference graph's
            # tf.less(tf.random_uniform(...), x_input) (vae.py:58).
            x = (jax.random.uniform(kb, x_real.shape) < x_real).astype(
                jnp.float32)
            loss, grads = jax.value_and_grad(elbo_loss)(p, x, kg, Z_DIM)
            updates, o = optimizer.update(grads, o)
            return (optax.apply_updates(p, updates), o), -loss

        keys = jax.random.split(key, n_batches)
        (params, opt_state), lbs = jax.lax.scan(
            body, (params, opt_state), (xs, keys))
        return params, opt_state, jnp.mean(lbs)

    perms = permutations()
    curve, epoch_secs = [], []
    for epoch in range(1, epochs + 1):
        xs = jnp.asarray(
            x_train[perms[epoch - 1]][: n_batches * BATCH].reshape(
                n_batches, BATCH, -1))
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, lb = epoch_fn(params, opt_state, xs, sub)
        lb = float(lb)
        epoch_secs.append(time.perf_counter() - t0)
        curve.append(lb)
        print("Epoch %d (%.1fs): LB = %.3f" % (epoch, epoch_secs[-1], lb))

    if not write:
        return curve
    steady = epoch_secs[2:] or epoch_secs
    result = {
        "what": "zhusuan_tpu VAE, identical protocol (scanned epochs, CPU)",
        "n_train": int(x_train.shape[0]), "batch": BATCH, "epochs": EPOCHS,
        "z_dim": Z_DIM, "lr": LR,
        "steps_per_sec_cpu": round(
            n_batches * len(steady) / sum(steady), 2),
        "epoch_sec_mean": round(float(np.mean(steady)), 2),
        "elbo_curve": [round(v, 3) for v in curve],
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ours_vae.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "elbo_curve"}))
    return curve


if __name__ == "__main__":
    main()
