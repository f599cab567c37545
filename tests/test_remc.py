"""Tests for replica-exchange HMC (zhusuan_tpu/mcmc/remc.py —
beyond-reference multimodal machinery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs

MU = 4.0


def bimodal_lj(obs):
    """Equal-weight mixture of N(+mu, I) and N(-mu, I) in 2-D — modes
    separated by 8 sigma, impassable for plain HMC."""
    z = obs["z"]
    a = -0.5 * jnp.sum((z - MU) ** 2, -1)
    b = -0.5 * jnp.sum((z + MU) ** 2, -1)
    return jnp.logaddexp(a, b)


class TestLadder:
    def test_bad_betas_rejected(self):
        with pytest.raises(ValueError, match="strictly decrease"):
            zs.ReplicaExchangeHMC(betas=[1.0, 0.5, 0.7])
        with pytest.raises(ValueError, match="start at 1.0"):
            zs.ReplicaExchangeHMC(betas=[0.9, 0.5])

    def test_default_geometric_ladder(self):
        re = zs.ReplicaExchangeHMC(n_temps=5, min_beta=0.1)
        np.testing.assert_allclose(re.betas[0], 1.0)
        np.testing.assert_allclose(re.betas[-1], 0.1)
        ratios = re.betas[1:] / re.betas[:-1]
        np.testing.assert_allclose(ratios, ratios[0])  # geometric


class TestBimodal:
    def test_hmc_is_stuck_but_remc_mixes(self):
        # The motivating contrast: plain HMC initialized in one mode
        # NEVER visits the other; replica exchange recovers both modes
        # with the right weights. (CI twin of the PERF.md claim.)
        hmc = zs.HMC(step_size=0.2, n_leapfrogs=10, adapt_step_size=True)
        st = hmc.init({"z": jnp.full((64, 2), MU)}, n_chain_dims=1)
        _, out = jax.jit(
            lambda s, k: hmc.run(bimodal_lj, {}, s, k, 1000, n_adapt=300)
        )(st, jax.random.PRNGKey(0))
        frac_hmc = float(
            (np.asarray(out["samples"]["z"][300:, :, 0]) < 0).mean()
        )
        assert frac_hmc == 0.0  # stuck in the + mode

        re = zs.ReplicaExchangeHMC(
            step_size=0.2, n_leapfrogs=10, n_temps=8, min_beta=0.02
        )
        rst = re.init({"z": jnp.full((64, 2), MU)}, bimodal_lj)
        rst, rout = jax.jit(
            lambda s, k: re.run(bimodal_lj, {}, s, k, 1500, n_adapt=500)
        )(rst, jax.random.PRNGKey(0))
        xs = np.asarray(rout["samples"]["z"][500:]).reshape(-1, 2)
        frac_re = float((xs[:, 0] < 0).mean())
        assert abs(frac_re - 0.5) < 0.1, frac_re
        # Both mode locations recovered.
        np.testing.assert_allclose(
            xs[xs[:, 0] > 0].mean(0), [MU, MU], atol=0.15
        )
        np.testing.assert_allclose(
            xs[xs[:, 0] < 0].mean(0), [-MU, -MU], atol=0.15
        )

    def test_swap_and_acceptance_diagnostics(self):
        re = zs.ReplicaExchangeHMC(
            step_size=0.2, n_leapfrogs=10, n_temps=6, min_beta=0.05
        )
        rst = re.init({"z": jnp.full((32, 2), MU)}, bimodal_lj)
        _, rout = jax.jit(
            lambda s, k: re.run(bimodal_lj, {}, s, k, 600, n_adapt=300)
        )(rst, jax.random.PRNGKey(1))
        acc = np.asarray(rout["acceptance_rate"][300:]).mean(0)
        # Per-rung dual averaging holds every rung near target.
        assert np.all(np.abs(acc - 0.8) < 0.12), acc
        # Swap rates: NaN on inactive rounds (even/odd alternation);
        # nanmean gives the true per-pair acceptance in (0, 1].
        swaps = np.asarray(rout["swap_rate"])
        active = ~np.isnan(swaps)
        assert 0.4 < active.mean() < 0.6  # alternation covers half
        assert np.nanmin(swaps) >= 0.0 and np.nanmax(swaps) <= 1.0
        mean_active = np.nanmean(swaps[300:], axis=0)
        assert np.all(mean_active > 0.2), mean_active

    def test_unimodal_moments_exact(self):
        # On a unimodal Gaussian the cold chain must be exactly correct
        # (swaps are a valid MCMC move, not an approximation).
        std = jnp.asarray([0.5, 2.0])

        def lj(obs):
            return jnp.sum(-0.5 * (obs["z"] / std) ** 2, -1)

        re = zs.ReplicaExchangeHMC(
            step_size=0.1, n_leapfrogs=8, n_temps=4, min_beta=0.1
        )
        rst = re.init({"z": jnp.zeros((128, 2))}, lj)
        _, rout = jax.jit(
            lambda s, k: re.run(lj, {}, s, k, 1200, n_adapt=400)
        )(rst, jax.random.PRNGKey(2))
        xs = np.asarray(rout["samples"]["z"][400:]).reshape(-1, 2)
        np.testing.assert_allclose(xs.mean(0), [0, 0], atol=0.06)
        np.testing.assert_allclose(xs.std(0), np.asarray(std), rtol=0.06)

    def test_multi_latent_dict(self):
        # Latent dicts with mixed data ranks ride the same machinery.
        def lj(obs):
            return (
                -0.5 * jnp.sum(obs["a"] ** 2, -1)
                - 0.5 * obs["b"] ** 2
            )

        re = zs.ReplicaExchangeHMC(step_size=0.3, n_leapfrogs=5,
                                   n_temps=3, min_beta=0.2)
        rst = re.init({"a": jnp.zeros((16, 3)), "b": jnp.zeros(16)}, lj)
        rst, rout = jax.jit(
            lambda s, k: re.run(lj, {}, s, k, 400, n_adapt=200)
        )(rst, jax.random.PRNGKey(3))
        a = np.asarray(rout["samples"]["a"][200:]).reshape(-1, 3)
        b = np.asarray(rout["samples"]["b"][200:]).reshape(-1)
        np.testing.assert_allclose(a.std(0), np.ones(3), rtol=0.1)
        np.testing.assert_allclose(b.std(), 1.0, rtol=0.1)
