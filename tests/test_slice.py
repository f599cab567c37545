"""Coordinate-wise slice sampler (beyond-reference; mcmc/slice_sampler.py).

Statistical bounds follow the repo's sampler-test conventions
(tests/test_mcmc.py): many vectorized chains, post-burn-in moment checks.
The thinning test doubles as the contract test for the shared
``scan_run_driver`` (mcmc/base.py) that RWM/MALA now also run through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.mcmc import SliceSampler


def _diag_gauss(mean=1.0, std=2.0):
    def log_joint(obs):
        z = obs["z"]
        return jnp.sum(-0.5 * ((z - mean) / std) ** 2, axis=-1)

    return log_joint


def _run(sampler, log_joint, shape, n_iters, n_adapt=0, seed=0, **kw):
    state = sampler.init({"z": jnp.zeros(shape)}, n_chain_dims=1)
    state, out = jax.jit(
        lambda s, k: sampler.run(
            log_joint, {}, s, k, n_iters=n_iters, n_adapt=n_adapt, **kw
        )
    )(state, jax.random.PRNGKey(seed))
    return state, out


class TestSliceStatistics:
    def test_gaussian_moments(self):
        sampler = SliceSampler(width=2.0)
        state, out = _run(sampler, _diag_gauss(), (256, 4), 1500)
        s = np.asarray(out["samples"]["z"][500:]).reshape(-1, 4)
        assert abs(s.mean() - 1.0) < 0.1, s.mean()
        assert abs(s.std() - 2.0) < 0.15, s.std()

    def test_correlated_gaussian(self):
        # rho = 0.8 bivariate normal: coordinate-wise updates still mix;
        # check the cross-correlation, not just the marginals.
        rho = 0.8
        prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))

        def log_joint(obs):
            z = obs["z"]
            return -0.5 * jnp.einsum(
                "...i,ij,...j->...", z, jnp.asarray(prec), z
            )

        sampler = SliceSampler(width=2.0)
        state, out = _run(sampler, log_joint, (256, 2), 2500, seed=1)
        s = np.asarray(out["samples"]["z"][800:]).reshape(-1, 2)
        assert abs(s[:, 0].std() - 1.0) < 0.08
        assert abs(s[:, 1].std() - 1.0) < 0.08
        got_rho = np.corrcoef(s.T)[0, 1]
        assert abs(got_rho - rho) < 0.05, got_rho

    def test_gradient_free_target(self):
        # Laplace density: |z| is non-differentiable at 0 — the slice
        # sampler never needs the gradient.
        def log_joint(obs):
            return -jnp.sum(jnp.abs(obs["z"]), axis=-1)

        sampler = SliceSampler(width=2.0)
        state, out = _run(sampler, log_joint, (512, 1), 2000, seed=2)
        s = np.asarray(out["samples"]["z"][700:]).ravel()
        assert abs(s.mean()) < 0.1, s.mean()
        assert abs(s.std() - np.sqrt(2.0)) < 0.12, s.std()

    def test_hard_constraint_support(self):
        # -inf outside |z| < 1: shrinkage must keep every draw in-support
        # (an out-of-support candidate is below ANY slice height).
        def log_joint(obs):
            z = obs["z"]
            inside = jnp.all(jnp.abs(z) < 1.0, axis=-1)
            return jnp.where(inside, 0.0, -jnp.inf)

        sampler = SliceSampler(width=1.0)
        state, out = _run(sampler, log_joint, (128, 2), 1200, seed=3)
        s = np.asarray(out["samples"]["z"])
        assert np.all(np.abs(s) < 1.0)
        tail = s[500:].reshape(-1)
        assert abs(tail.std() - 1.0 / np.sqrt(3.0)) < 0.05

    def test_multi_latent_dict(self):
        # Two latents with different data shapes advance in one sweep.
        def log_joint(obs):
            a, b = obs["a"], obs["b"]
            return (
                -0.5 * jnp.sum((a - 2.0) ** 2, axis=-1)
                - 0.5 * jnp.sum((b / 3.0) ** 2, axis=(-1, -2))
            )

        sampler = SliceSampler(width=2.0)
        state = sampler.init(
            {"a": jnp.zeros((128, 2)), "b": jnp.zeros((128, 2, 2))},
            n_chain_dims=1,
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(log_joint, {}, s, k, n_iters=1500)
        )(state, jax.random.PRNGKey(4))
        a = np.asarray(out["samples"]["a"][500:]).reshape(-1)
        b = np.asarray(out["samples"]["b"][500:]).reshape(-1)
        assert abs(a.mean() - 2.0) < 0.1, a.mean()
        assert abs(b.std() - 3.0) < 0.2, b.std()

    def test_width_adaptation(self):
        # Anisotropic target, deliberately bad initial width: adapted
        # widths must land near width_mult * per-coordinate std.
        stds = np.array([0.5, 1.0, 4.0])

        def log_joint(obs):
            z = obs["z"]
            return jnp.sum(-0.5 * (z / jnp.asarray(stds)) ** 2, axis=-1)

        sampler = SliceSampler(width=50.0, adapt_width=True, width_mult=2.0)
        state, out = _run(
            sampler, log_joint, (256, 3), 1500, n_adapt=800, seed=5,
            collect_fields=("samples", "width"),
        )
        width = np.asarray(state.width)
        np.testing.assert_allclose(width, 2.0 * stds, rtol=0.25)
        s = np.asarray(out["samples"]["z"][800:]).reshape(-1, 3)
        np.testing.assert_allclose(s.std(0), stds, rtol=0.12)
        # Post-adaptation widths are frozen (t >= n_adapt).
        assert np.allclose(
            np.asarray(out["width"][-1]), np.asarray(out["width"][900])
        )


class TestSliceContract:
    def test_thinning_matches_sliced_full_run(self):
        lj = _diag_gauss()
        sampler = SliceSampler(width=2.0)
        s0 = sampler.init({"z": jnp.zeros((8, 3))}, n_chain_dims=1)
        key = jax.random.PRNGKey(7)
        full_state, full = sampler.run(lj, {}, s0, key, n_iters=12)
        thin_state, thin = sampler.run(
            lj, {}, s0, key, n_iters=12, thinning=5
        )
        np.testing.assert_array_equal(
            np.asarray(thin["samples"]["z"]),
            np.asarray(full["samples"]["z"][4::5]),
        )
        # Remainder (12 = 2*5 + 2) still advances the final state to
        # match the unthinned run bit-for-bit.
        np.testing.assert_array_equal(
            np.asarray(thin_state.q["z"]), np.asarray(full_state.q["z"])
        )
        np.testing.assert_array_equal(
            np.asarray(thin_state.log_prob), np.asarray(full_state.log_prob)
        )

    def test_cache_sentinel_and_invalidate(self):
        lj1 = _diag_gauss(0.0, 1.0)
        lj2 = _diag_gauss(5.0, 1.0)
        sampler = SliceSampler(width=1.5)
        s0 = sampler.init({"z": jnp.ones((4, 2))}, n_chain_dims=1)
        assert np.all(np.isnan(np.asarray(s0.log_prob)))
        s1, _ = sampler.sample(lj1, {}, s0, jax.random.PRNGKey(0))
        # Live cache equals the target density at the new position.
        np.testing.assert_allclose(
            np.asarray(s1.log_prob),
            np.asarray(lj1({"z": s1.q["z"]})),
            rtol=1e-6,
        )
        # Re-targeting without invalidation would score against a stale
        # density; invalidate_cache forces re-evaluation.
        s1b = s1.invalidate_cache()
        assert np.all(np.isnan(np.asarray(s1b.log_prob)))
        s2, _ = sampler.sample(lj2, {}, s1b, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(s2.log_prob),
            np.asarray(lj2({"z": s2.q["z"]})),
            rtol=1e-6,
        )

    def test_stuck_fraction_zero_on_easy_target(self):
        sampler = SliceSampler(width=2.0)
        s0 = sampler.init({"z": jnp.zeros((16, 2))}, n_chain_dims=1)
        _, out = sampler.run(
            _diag_gauss(), {}, s0, jax.random.PRNGKey(0), n_iters=20,
            collect_fields=("stuck_fraction",),
        )
        assert float(np.asarray(out["stuck_fraction"]).max()) == 0.0

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="width"):
            SliceSampler(width=0.0)
        with pytest.raises(ValueError, match="positive everywhere"):
            SliceSampler(width={"a": 1.0, "b": 0.0})
        with pytest.raises(ValueError, match="max_stepouts"):
            SliceSampler(max_stepouts=0)
        sampler = SliceSampler()
        with pytest.raises(ValueError, match="missing"):
            SliceSampler(width={"a": 1.0}).init(
                {"a": jnp.zeros((2, 1)), "b": jnp.zeros((2, 1))},
                n_chain_dims=1,
            )
        s0 = sampler.init({"z": jnp.zeros((2, 1))}, n_chain_dims=1)
        with pytest.raises(ValueError, match="collect field"):
            sampler.run(
                _diag_gauss(), {}, s0, jax.random.PRNGKey(0), n_iters=2,
                collect_fields=("nope",),
            )
        with pytest.raises(ValueError, match="thinning"):
            sampler.run(
                _diag_gauss(), {}, s0, jax.random.PRNGKey(0), n_iters=2,
                thinning=0,
            )
        with pytest.raises(ValueError, match="chain shape"):
            sampler.init(
                {"a": jnp.zeros((2, 1)), "b": jnp.zeros((3, 1))},
                n_chain_dims=1,
            )

    def test_per_latent_width_dict(self):
        sampler = SliceSampler(width={"a": 1.0, "b": 5.0})
        s0 = sampler.init(
            {"a": jnp.zeros((4, 2)), "b": jnp.zeros((4, 3))},
            n_chain_dims=1,
        )
        np.testing.assert_allclose(
            np.asarray(s0.width), [1.0, 1.0, 5.0, 5.0, 5.0]
        )
