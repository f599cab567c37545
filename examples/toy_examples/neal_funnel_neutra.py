"""NeuTra-lifted HMC on Neal's funnel.

Beyond the reference (no counterpart): the canonical pathological
geometry — ``v ~ N(0, 3)``, ``x_i | v ~ N(0, e^{v/2})`` — where adapted
diagonal-mass HMC cannot enter the funnel neck and underestimates
``std(v) = 3``. A RealNVP transport fitted by SGVB
(:func:`zhusuan_tpu.mcmc.fit_neutra`) bends the geometry toward a
standard normal; HMC in the flow's latent coordinates then explores the
full funnel (Hoffman et al. 2019, arXiv:1903.03704).
Run: ``python -m examples.toy_examples.neal_funnel_neutra``.
"""

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import fit_neutra, neutra_log_joint

D = 5  # v + 4 funnel coordinates


def log_joint(obs):
    z = obs["z"]
    v = z[..., 0]
    x = z[..., 1:]
    lp_v = -0.5 * (v / 3.0) ** 2
    lp_x = jnp.sum(
        -0.5 * (x / jnp.exp(v[..., None] / 2.0)) ** 2 - v[..., None] / 2.0,
        axis=-1,
    )
    return lp_v + lp_x


def run_hmc(lj, key, n_chains=512, n_iters=1000, n_adapt=500):
    hmc = zs.HMC(step_size=0.1, n_leapfrogs=8, adapt_step_size=True,
                 adapt_mass=True, target_acceptance_rate=0.8)
    state = hmc.init({"z": jnp.zeros((n_chains, D))}, log_joint=lj)
    _, out = jax.jit(
        lambda s, k: hmc.run(lj, {}, s, k, n_iters, n_adapt=n_adapt)
    )(state, key)
    return np.asarray(out["samples"]["z"][n_adapt:], np.float64)


def main(n_flows=8, n_fit_iters=2000, seed=0, n_chains=512,
         n_iters=1000, n_adapt=500):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)

    plain = run_hmc(log_joint, k1, n_chains=n_chains, n_iters=n_iters,
                    n_adapt=n_adapt)
    v_plain = plain[..., 0].reshape(-1)
    print("plain HMC:   std(v) = {:.2f} (true 3.00), min v = {:.1f}".format(
        v_plain.std(), v_plain.min()))

    fit = fit_neutra(log_joint, "z", D, k0, n_flows=n_flows,
                     n_iters=n_fit_iters, n_particles=64,
                     learning_rate=2e-3)
    print("flow fit:    -ELBO {:.2f} -> {:.2f}".format(
        float(np.asarray(fit.losses[:100]).mean()),
        float(np.asarray(fit.losses[-100:]).mean())))
    lat_lj, _, from_lat = neutra_log_joint(log_joint, "z", fit.params)

    lat = run_hmc(lat_lj, k2, n_chains=n_chains, n_iters=n_iters,
                  n_adapt=n_adapt)
    neutra = np.asarray(
        from_lat(jnp.asarray(lat, jnp.float32)), np.float64
    )
    v_neutra = neutra[..., 0].reshape(-1)
    print("NeuTra HMC:  std(v) = {:.2f} (true 3.00), min v = {:.1f}".format(
        v_neutra.std(), v_neutra.min()))
    return v_plain.std(), v_neutra.std()


if __name__ == "__main__":
    main()
