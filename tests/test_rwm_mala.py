"""Random-walk Metropolis and MALA (beyond-reference; mcmc/rwm.py).

Statistical bounds follow the repo's sampler-test conventions
(tests/test_mcmc.py): many vectorized chains, post-burn-in moment checks,
acceptance-rate windows around the theory-optimal targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import MALA, RandomWalkMetropolis


def _diag_gauss(mean=1.0, std=2.0):
    def log_joint(obs):
        z = obs["z"]
        return jnp.sum(-0.5 * ((z - mean) / std) ** 2, axis=-1)

    return log_joint


def _run(sampler, log_joint, shape, n_iters, n_adapt, seed=0):
    state = sampler.init({"z": jnp.zeros(shape)}, n_chain_dims=1)
    state, out = jax.jit(
        lambda s, k: sampler.run(
            log_joint, {}, s, k, n_iters=n_iters, n_adapt=n_adapt
        )
    )(state, jax.random.PRNGKey(seed))
    return state, out


class TestRWM:
    def test_gaussian_moments_and_acceptance(self):
        sampler = RandomWalkMetropolis(step_size=0.5, adapt_step_size=True)
        state, out = _run(sampler, _diag_gauss(), (256, 4), 3000, 1500)
        s = np.asarray(out["samples"]["z"][1500:]).reshape(-1, 4)
        assert abs(s.mean() - 1.0) < 0.1, s.mean()
        assert abs(s.std() - 2.0) < 0.15, s.std()
        acc = float(np.mean(np.asarray(out["acceptance_rate"][1500:])))
        assert 0.18 < acc < 0.30, acc  # adapted toward 0.234

    def test_gradient_free_target(self):
        # Laplace density: |z| is non-differentiable at 0 — HMC/MALA
        # misbehave there, RWM does not need the gradient at all.
        def log_joint(obs):
            return -jnp.sum(jnp.abs(obs["z"]), axis=-1)

        sampler = RandomWalkMetropolis(step_size=1.0, adapt_step_size=True)
        state, out = _run(sampler, log_joint, (512, 1), 4000, 2000, seed=1)
        s = np.asarray(out["samples"]["z"][2000:]).ravel()
        # Laplace(0, 1): mean 0, std sqrt(2).
        assert abs(s.mean()) < 0.1, s.mean()
        assert abs(s.std() - np.sqrt(2.0)) < 0.12, s.std()

    def test_hard_constraint_reject(self):
        # -inf outside |z| < 1: non-finite proposals must be rejected and
        # the chain must stay in-support for the whole run.
        def log_joint(obs):
            z = obs["z"]
            inside = jnp.all(jnp.abs(z) < 1.0, axis=-1)
            return jnp.where(inside, 0.0, -jnp.inf)

        sampler = RandomWalkMetropolis(step_size=0.4)
        state, out = _run(sampler, log_joint, (128, 2), 1500, 0, seed=2)
        s = np.asarray(out["samples"]["z"])
        assert np.all(np.abs(s) < 1.0)
        # Uniform on the square: mean 0, std 1/sqrt(3).
        tail = s[700:].reshape(-1)
        assert abs(tail.std() - 1.0 / np.sqrt(3.0)) < 0.05


class TestMALA:
    def test_gaussian_moments_and_acceptance(self):
        sampler = MALA(step_size=0.5, adapt_step_size=True)
        state, out = _run(sampler, _diag_gauss(), (256, 4), 2500, 1200,
                          seed=3)
        s = np.asarray(out["samples"]["z"][1200:]).reshape(-1, 4)
        assert abs(s.mean() - 1.0) < 0.1, s.mean()
        assert abs(s.std() - 2.0) < 0.15, s.std()
        acc = float(np.mean(np.asarray(out["acceptance_rate"][1200:])))
        assert 0.48 < acc < 0.68, acc  # adapted toward 0.574

    def test_hastings_correction_large_step(self):
        # With eps comparable to the target scale the unadjusted Langevin
        # chain is visibly biased; the MH correction must keep the
        # stationary distribution exact.
        sampler = MALA(step_size=1.2, adapt_step_size=False)
        state, out = _run(
            sampler, _diag_gauss(mean=0.0, std=1.0), (2048, 1), 800, 0,
            seed=4,
        )
        s = np.asarray(out["samples"]["z"][300:]).ravel()
        assert abs(s.mean()) < 0.03, s.mean()
        assert abs(s.std() - 1.0) < 0.03, s.std()

    def test_correlated_target(self):
        cov = np.asarray([[1.0, 0.8], [0.8, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov))

        def log_joint(obs):
            z = obs["z"]
            return -0.5 * jnp.einsum("...i,ij,...j->...", z, prec, z)

        sampler = MALA(step_size=0.3, adapt_step_size=True)
        state, out = _run(sampler, log_joint, (512, 2), 3000, 1500, seed=5)
        s = np.asarray(out["samples"]["z"][1500:]).reshape(-1, 2)
        emp = np.cov(s.T)
        np.testing.assert_allclose(emp, cov, atol=0.12)

    def test_multi_latent_dict(self):
        def log_joint(obs):
            a = -0.5 * jnp.sum((obs["a"] - 2.0) ** 2, axis=-1)
            b = -0.5 * jnp.sum((obs["b"] / 0.5) ** 2, axis=(-2, -1))
            return a + b

        sampler = MALA(step_size=0.2, adapt_step_size=True)
        state = sampler.init(
            {"a": jnp.zeros((128, 3)), "b": jnp.zeros((128, 2, 2))},
            n_chain_dims=1,
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(
                log_joint, {}, s, k, n_iters=3000, n_adapt=1500
            )
        )(state, jax.random.PRNGKey(6))
        a = np.asarray(out["samples"]["a"][1500:])
        b = np.asarray(out["samples"]["b"][1500:])
        assert abs(a.mean() - 2.0) < 0.1
        assert abs(b.std() - 0.5) < 0.05

    def test_meta_bn_interface(self):
        from zhusuan_tpu.framework import meta_bayesian_net

        @meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.normal("z", jnp.zeros(2), std=jnp.asarray(1.0),
                      group_ndims=1)
            bn.normal("x", bn["z"], std=jnp.asarray(0.5), group_ndims=1)
            return bn

        x_obs = jnp.asarray([1.0, -0.5])
        sampler = MALA(step_size=0.3, adapt_step_size=True)
        state = sampler.init({"z": jnp.zeros((256, 2))}, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: sampler.run(
                model(), {"x": x_obs}, s, k, n_iters=2500, n_adapt=1200
            )
        )(state, jax.random.PRNGKey(7))
        z = np.asarray(out["samples"]["z"][1200:]).reshape(-1, 2)
        post_mean = np.asarray(x_obs) / 1.25
        post_std = float(np.sqrt(0.25 / 1.25))
        np.testing.assert_allclose(z.mean(axis=0), post_mean, atol=0.05)
        np.testing.assert_allclose(z.std(axis=0), post_std, atol=0.05)


class TestValidation:
    def test_bad_step_size(self):
        with pytest.raises(ValueError, match="positive"):
            RandomWalkMetropolis(step_size=0.0)

    def test_bad_target(self):
        with pytest.raises(ValueError, match="target_acceptance_rate"):
            MALA(target_acceptance_rate=1.5)

    def test_bad_chain_dims(self):
        with pytest.raises(TypeError, match="Python int"):
            MALA().init({"z": jnp.zeros((4, 2))}, n_chain_dims=None)

    def test_collect_false(self):
        sampler = RandomWalkMetropolis(step_size=0.5)
        state = sampler.init({"z": jnp.zeros((8, 2))}, n_chain_dims=1)
        state, out = sampler.run(
            _diag_gauss(), {}, state, jax.random.PRNGKey(0), n_iters=20,
            collect=False,
        )
        assert out is None
        assert int(state.t) == 20


class TestRobustness:
    def test_mala_nan_gradient_does_not_poison_adaptation(self):
        # Regression: finite density with NaN gradient regions (the
        # where/sqrt autodiff trap) must reject the proposal, not drive
        # the dual-averaged step size to NaN and freeze all chains.
        def log_joint(obs):
            z = obs["z"]
            trap = jnp.where(z > 0.0, jnp.sqrt(jnp.abs(z)), 0.0)
            return jnp.sum(-0.5 * z**2 + 0.0 * trap, axis=-1)

        sampler = MALA(step_size=0.5, adapt_step_size=True)
        state = sampler.init({"z": jnp.full((64, 2), -1.0)},
                             n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: sampler.run(
                log_joint, {}, s, k, n_iters=300, n_adapt=300
            )
        )(state, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out["step_size"])))
        # Chains must still move (not frozen by permanent rejection).
        s = np.asarray(out["samples"]["z"])
        assert np.std(s[-1]) > 0.1

    def test_adapt_gate_follows_persisted_counter(self):
        # n_adapt counts against the PERSISTED state.t — the actual
        # HMC.run convention (hmc.py:762-771): adaptation continues
        # seamlessly across consecutive runs until t hits n_adapt, and a
        # resumed post-burn-in state never re-adapts.
        def log_joint(obs):
            return jnp.sum(-0.5 * obs["z"] ** 2, axis=-1)

        sampler = MALA(step_size=5.0, adapt_step_size=True)
        state = sampler.init({"z": jnp.zeros((64, 2))}, n_chain_dims=1)
        state, _ = sampler.run(
            log_joint, {}, state, jax.random.PRNGKey(0), n_iters=40,
            n_adapt=100,
        )
        eps_mid = float(state.step_size)
        assert eps_mid < 5.0  # adaptation engaged in run 1 (t 0..39)
        state, _ = sampler.run(
            log_joint, {}, state, jax.random.PRNGKey(1), n_iters=60,
            n_adapt=100,
        )
        eps_done = float(state.step_size)
        assert eps_done < 2.0, eps_done  # kept adapting through t=99
        # t >= 100 now: the gate closes. The shared dual-averaging helper
        # hands over exp(log_eps_bar) (the averaged step size) on the
        # first frozen iteration — exactly like HMC — and is constant
        # thereafter.
        eps_frozen = float(np.exp(np.asarray(state.log_epsilon_bar)))
        state, _ = sampler.run(
            log_joint, {}, state, jax.random.PRNGKey(2), n_iters=50,
            n_adapt=100,
        )
        np.testing.assert_allclose(float(state.step_size), eps_frozen,
                                   rtol=1e-12)
        state, _ = sampler.run(
            log_joint, {}, state, jax.random.PRNGKey(3), n_iters=20,
            n_adapt=100,
        )
        np.testing.assert_allclose(float(state.step_size), eps_frozen,
                                   rtol=1e-12)

    def test_rwm_state_has_no_grad_carry(self):
        sampler = RandomWalkMetropolis(step_size=0.5)
        state = sampler.init({"z": jnp.zeros((8, 3))}, n_chain_dims=1)
        assert state.grad == {}

    def test_chains_escape_zero_density_start(self):
        # Regression: chains initialized OUTSIDE the support (current
        # log-prob -inf) must accept the first in-support proposal
        # (log_alpha = +inf), not freeze forever.
        def log_joint(obs):
            z = obs["z"]
            inside = jnp.all(z > 0.0, axis=-1)
            return jnp.where(inside, -0.5 * jnp.sum((z - 1) ** 2, -1),
                             -jnp.inf)

        sampler = RandomWalkMetropolis(step_size=0.8)
        state = sampler.init({"z": jnp.full((64, 1), -0.5)},
                             n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: sampler.run(log_joint, {}, s, k, n_iters=400)
        )(state, jax.random.PRNGKey(8))
        s = np.asarray(out["samples"]["z"][200:])
        assert np.all(s > 0)          # escaped
        assert np.std(s) > 0.1        # and actually mixing

    def test_collect_fields_and_thinning(self):
        sampler = MALA(step_size=0.3, adapt_step_size=True)

        def lj(obs):
            return jnp.sum(-0.5 * obs["z"] ** 2, axis=-1)

        key = jax.random.PRNGKey(11)
        s0 = sampler.init({"z": jnp.zeros((8, 2))}, n_chain_dims=1)
        _, full = sampler.run(lj, {}, s0, key, n_iters=30, n_adapt=10)
        fin_t, thin = sampler.run(
            lj, {}, s0, key, n_iters=30, n_adapt=10,
            collect_fields=("samples",), thinning=5,
        )
        assert set(thin) == {"samples"}
        assert thin["samples"]["z"].shape == (6, 8, 2)
        # The key threading is identical, so thinned output IS the full
        # trajectory sliced at every thinning-th iteration.
        np.testing.assert_allclose(
            np.asarray(thin["samples"]["z"]),
            np.asarray(full["samples"]["z"][4::5]),
            rtol=1e-12,
        )
        with pytest.raises(ValueError, match="collect field"):
            sampler.run(lj, {}, s0, key, n_iters=4,
                        collect_fields=("bogus",))
        with pytest.raises(ValueError, match="thinning"):
            sampler.run(lj, {}, s0, key, n_iters=4, thinning=0)

    def test_thinning_remainder_matches_full_run(self):
        # n_iters not divisible by thinning: the remainder is scanned on
        # the SAME key thread, so the final state matches the unthinned
        # run bit-for-bit.
        sampler = RandomWalkMetropolis(step_size=0.5)

        def lj(obs):
            return jnp.sum(-0.5 * obs["z"] ** 2, axis=-1)

        key = jax.random.PRNGKey(12)
        s0 = sampler.init({"z": jnp.zeros((4, 2))}, n_chain_dims=1)
        fin_full, _ = sampler.run(lj, {}, s0, key, n_iters=32)
        fin_thin, thin = sampler.run(lj, {}, s0, key, n_iters=32,
                                     thinning=5)
        assert thin["samples"]["z"].shape[0] == 6
        np.testing.assert_array_equal(
            np.asarray(fin_thin.q["z"]), np.asarray(fin_full.q["z"])
        )
        assert int(fin_thin.t) == int(fin_full.t) == 32


class TestCacheSentinel:
    """MHState density cache: NaN sentinel + invalidate_cache (advisor
    r2 finding: a t>0 state reused against a different target silently
    carried a stale density)."""

    def test_retarget_after_invalidate(self):
        sampler = RandomWalkMetropolis(step_size=0.5)

        def lj_a(obs):
            return jnp.sum(-0.5 * obs["z"] ** 2, axis=-1)

        def lj_b(obs):  # shifted target: cached lp from lj_a is stale
            return jnp.sum(-0.5 * (obs["z"] - 10.0) ** 2, axis=-1)

        s0 = sampler.init({"z": jnp.zeros((16, 2))}, n_chain_dims=1)
        assert np.all(np.isnan(np.asarray(s0.log_prob)))
        s1, _ = sampler.run(lj_a, {}, s0, jax.random.PRNGKey(0), 5)
        assert np.all(np.isfinite(np.asarray(s1.log_prob)))
        # Re-target: invalidate forces re-evaluation under lj_b, so the
        # first step's acceptance ratio uses the TRUE current density.
        s2 = s1.invalidate_cache()
        st, info = sampler.sample(lj_b, {}, s2, jax.random.PRNGKey(1))
        lp_direct = np.asarray(lj_b({"z": np.asarray(st.q["z"])}))
        np.testing.assert_allclose(np.asarray(st.log_prob), lp_direct,
                                   rtol=1e-6)

    def test_mala_grad_cache_refills(self):
        sampler = MALA(step_size=0.2)

        def lj(obs):
            return jnp.sum(-0.5 * obs["z"] ** 2, axis=-1)

        s0 = sampler.init({"z": jnp.full((4, 3), 2.0)}, n_chain_dims=1)
        s1, _ = sampler.run(lj, {}, s0, jax.random.PRNGKey(0), 3)
        st, _ = sampler.sample(lj, {}, s1.invalidate_cache(),
                               jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(st.log_prob)))
