"""Ill-conditioned Gaussian via ChEES-HMC (adaptive trajectory lengths).

Beyond the reference's fixed-``n_leapfrogs`` toy (reference
``examples/toy_examples/gaussian.py``): the same diagonal-Normal family,
but with stds spanning 0.1..3.0 so the optimal trajectory length is both
long and unknown a priori — the regime where hand-tuning ``n_leapfrogs``
fails and ChEES (Hoffman et al. 2021) earns its keep by learning the
integration time from cross-chain statistics.

Run: ``python -m examples.toy_examples.gaussian_chees``.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs

parser = argparse.ArgumentParser()
parser.add_argument("--n_chains", type=int, default=512)
parser.add_argument("--n_iters", type=int, default=1000)
parser.add_argument("--n_adapt", type=int, default=500)


def main():
    hps, _ = parser.parse_known_args()
    n_x = 16
    stdev = np.geomspace(0.1, 3.0, n_x).astype(np.float32)

    @zs.meta_bayesian_net()
    def gaussian():
        bn = zs.BayesianNet()
        bn.normal(
            "x", jnp.zeros([hps.n_chains, n_x], jnp.float32),
            std=jnp.asarray(stdev), group_ndims=1,
        )
        return bn

    model = gaussian()
    chees = zs.ChEESHMC(step_size=0.05, trajectory_length=0.3)
    state = chees.init({"x": jnp.zeros([hps.n_chains, n_x], jnp.float32)})

    print("Sampling (ChEES adaptive trajectories)...")
    state, out = jax.jit(
        lambda s, k: chees.run(
            model, {}, s, k, hps.n_iters, n_adapt=hps.n_adapt
        )
    )(state, jax.random.PRNGKey(0))

    keep = np.asarray(out["samples"]["x"][hps.n_adapt:]).reshape(-1, n_x)
    acc = float(np.mean(np.asarray(out["acceptance_rate"][hps.n_adapt:])))
    T = float(np.asarray(out["trajectory_length"][-1]))
    mean_L = float(np.mean(np.asarray(out["n_leapfrogs"][hps.n_adapt:])))
    rel_err = float(np.abs(keep.std(0) / stdev - 1).max())
    print(
        "acceptance {:.3f} | learned T {:.2f} (mean L {:.1f}) | "
        "worst std rel-err {:.3f}".format(acc, T, mean_L, rel_err)
    )
    print("Expected stds:", np.round(stdev, 3))
    print("Sampled  stds:", np.round(keep.std(0), 3))
    return rel_err


if __name__ == "__main__":
    main()
