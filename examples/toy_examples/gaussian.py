"""Gaussian toy posterior via HMC with 1000 vectorized parallel chains.

Parity: reference ``examples/toy_examples/gaussian.py`` (BASELINE config
#1): diagonal Normal with stds 1/(i+1), step-size + mass adaptation gated
on for the first half of burn-in, 1000 chains.

TPU-native: the adaptation gating folds into ``HMC.run(n_adapt=...)``
(lax.scan on-device) instead of per-iteration feed-dict flags.
Run: ``python -m examples.toy_examples.gaussian``.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs

parser = argparse.ArgumentParser()
parser.add_argument(
    "--fused", action="store_true",
    help="fully fused Pallas HMC transition (TPU; PERF.md)",
)


def main():
    hps, _ = parser.parse_known_args()
    n_x = 10
    stdev = (1.0 / (np.arange(n_x) + 1)).astype(np.float32)
    n_chains, n_iters, burnin, n_leapfrogs = 1000, 200, 100, 5

    @zs.meta_bayesian_net()
    def gaussian():
        bn = zs.BayesianNet()
        bn.normal(
            "x", jnp.zeros([n_chains, n_x], jnp.float32),
            std=jnp.asarray(stdev),
            group_ndims=1,
        )
        return bn

    model = gaussian()
    hmc = zs.HMC(
        step_size=1e-3, n_leapfrogs=n_leapfrogs,
        adapt_step_size=True, adapt_mass=True,
        target_acceptance_rate=0.9,
        experimental_fused_step=hps.fused,
    )
    state = hmc.init(
        {"x": jnp.zeros([n_chains, n_x], jnp.float32)}, n_chain_dims=1
    )

    print("Sampling...")
    # Burn-in with adaptation on for the first half (reference :53-58).
    state, _ = jax.jit(
        lambda s, k: hmc.run(
            model, {}, s, k, burnin, n_adapt=burnin // 2, collect=False
        )
    )(state, jax.random.PRNGKey(1))
    state, out = jax.jit(
        lambda s, k: hmc.run(model, {}, s, k, n_iters - burnin)
    )(state, jax.random.PRNGKey(2))
    print("Finished.")

    samples = np.asarray(out["samples"]["x"]).reshape(-1, n_x)
    print("Acceptance rate (mean):",
          float(np.mean(np.asarray(out["acceptance_rate"]))))
    print("Sample mean:", samples.mean(0))
    print("Sample stdev:", samples.std(0))
    print("True stdev:", stdev)
    rel_err = np.abs(samples.std(0) - stdev) / stdev
    print("Relative error of stdev:", rel_err)
    return rel_err


if __name__ == "__main__":
    main()
