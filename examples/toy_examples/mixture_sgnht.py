"""Bimodal Gaussian mixture sampled with SGNHT.

Parity: reference ``examples/toy_examples/mixture_sgnht.py``: two modes
N(-1, 0.5) and N(3, 0.5); SGNHT with scalar auto-tuned friction
(lr 0.2, variance_extra 0.1, tune_rate 0.01, 1st-order).
Run: ``python -m examples.toy_examples.mixture_sgnht``.
"""

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs


def main(n_chains=1000, n_iters=30000):
    stdev, mu1, mu2 = 0.5, -1.0, 3.0

    def log_joint(observed):
        x = observed["x"]
        a1 = -0.5 * ((x - mu1) / stdev) ** 2
        a2 = -0.5 * ((x - mu2) / stdev) ** 2
        amax = jnp.maximum(a1, a2)
        return amax + jnp.log(jnp.exp(a1 - amax) + jnp.exp(a2 - amax))

    sgmcmc = zs.SGNHT(
        learning_rate=0.2, variance_extra=0.1, tune_rate=0.01,
        second_order=False, use_vector_alpha=False,
    )
    key = jax.random.PRNGKey(1)
    k_init, k_x, k_run = jax.random.split(key, 3)
    x0 = jax.random.uniform(k_x, (n_chains,)) * 10 - 5
    state = sgmcmc.init({"x": x0}, key=k_init)

    burnin = n_iters * 2 // 3
    print("Sampling...")
    state, _ = jax.jit(
        lambda s, k: sgmcmc.run(log_joint, {}, s, k, burnin, collect=False)
    )(state, k_run)
    state, qs = jax.jit(
        lambda s, k: sgmcmc.run(log_joint, {}, s, k, n_iters - burnin,
                                thinning=100)
    )(state, jax.random.PRNGKey(2))
    samples = np.asarray(qs["x"]).ravel()
    print("Finished. alpha:", float(np.asarray(state.alpha["x"])))

    # Both modes should carry roughly half the mass.
    frac_right = float(np.mean(samples > 1.0))
    print("Fraction in right mode: {:.3f} (true 0.5)".format(frac_right))
    print("Sample mean: {:.3f} (true 1.0)".format(samples.mean()))
    return samples


if __name__ == "__main__":
    main()
