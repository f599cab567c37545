"""MCMC statistical tests.

Port of reference ``tests/test_mcmc.py``: sample the double-well density
``p(x) ∝ exp(2x^2 - x^4)`` (SGHMC-paper Fig. 1 setup) with 100 chains, KDE
the samples, and bound the mean absolute error of the estimated pdf
(HMC ≤ 0.030 at :55-62; SGLD ≤ 0.023, SGHMC 1st/2nd ≤ 0.016 at :67-88).

Note: the reference adds x-independent Gaussian noise to the log-joint value
(test_mcmc.py:22-26); that noise never reaches the gradients (it is constant
in x), so for the gradient-driven SGMCMC samplers the setup below is
identical; for HMC it only perturbed the MH test, making the clean version
slightly easier — the bound is kept.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

import zhusuan_tpu as zs

N_CHAINS = 100


def log_joint(observed):
    x = observed["x"]
    return 2 * (x ** 2) - x ** 4


def double_well_error(samples):
    """KDE mean-abs-error vs the true double-well pdf
    (reference test_mcmc.py:43-50)."""
    samples = np.asarray(samples).reshape(-1)
    assert not np.isnan(samples.sum()), "nan encountered"
    A = 3
    xs = np.linspace(-A, A, 1000)
    pdfs = np.exp(2 * (xs ** 2) - xs ** 4)
    pdfs = pdfs / pdfs.mean() / A / 2
    est_pdfs = stats.gaussian_kde(samples)(xs)
    return np.abs(est_pdfs - pdfs).mean()


def run_sgmcmc(sampler, n_iters, thinning=50, seed=0):
    burnin = n_iters * 2 // 3
    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    state = sampler.init(
        {"x": jnp.zeros(N_CHAINS, jnp.float64)}, key=k_init
    )
    state, _ = jax.jit(
        lambda s, k: sampler.run(log_joint, {}, s, k, burnin, collect=False)
    )(state, k_run)
    _, qs = jax.jit(
        lambda s, k: sampler.run(log_joint, {}, s, k, n_iters - burnin)
    )(state, jax.random.PRNGKey(seed + 1))
    return qs["x"][::thinning]


class TestHMC:
    def test_double_well(self):
        hmc = zs.HMC(step_size=0.01, n_leapfrogs=10)
        key = jax.random.PRNGKey(0)
        state = hmc.init(
            {"x": jnp.zeros(N_CHAINS, jnp.float64)}, log_joint=log_joint
        )
        burnin, n_iters, thinning = 666, 1000, 50
        state, _ = jax.jit(
            lambda s, k: hmc.run(log_joint, {}, s, k, burnin, collect=False)
        )(state, key)
        _, out = jax.jit(
            lambda s, k: hmc.run(log_joint, {}, s, k, n_iters - burnin)
        )(state, jax.random.PRNGKey(1))
        e = double_well_error(out["samples"]["x"][::thinning])
        assert e <= 0.030

    def test_gaussian_with_adaptation(self):
        # Diagonal Gaussian with nontrivial mean/std; step-size + mass
        # adaptation should reach the target acceptance rate and recover
        # the moments (reference examples/toy_examples/gaussian.py setup).
        dim, n_chains = 10, 500
        mean = jnp.arange(dim, dtype=jnp.float64)
        std = jnp.linspace(0.5, 2.0, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * ((obs["x"] - mean) / std) ** 2, -1)

        hmc = zs.HMC(
            step_size=1.0, n_leapfrogs=10,
            adapt_step_size=True, adapt_mass=True,
        )
        state = hmc.init({"x": jnp.zeros((n_chains, dim), jnp.float64)},
                         log_joint=lj)
        state, _ = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 200, n_adapt=150,
                                 collect=False)
        )(state, jax.random.PRNGKey(0))
        final, out = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 300)
        )(state, jax.random.PRNGKey(1))
        acc = float(jnp.mean(out["acceptance_rate"]))
        assert 0.6 <= acc <= 1.0
        x = np.asarray(out["samples"]["x"]).reshape(-1, dim)
        np.testing.assert_allclose(x.mean(0), np.asarray(mean), atol=0.15)
        np.testing.assert_allclose(x.std(0), np.asarray(std), rtol=0.1)
        # Adapted mass should approximate the precision 1/std^2.
        mass = np.asarray(final.mass["x"]).reshape(dim)
        np.testing.assert_allclose(
            mass, 1 / np.asarray(std) ** 2, rtol=0.5
        )

    def test_chain_shape_contract(self):
        # log-joint output shape IS the chain shape; latent may carry extra
        # data axes (reference hmc.py:204-216).
        def lj(obs):
            return jnp.sum(-0.5 * obs["w"] ** 2, axis=(-1, -2))

        hmc = zs.HMC(step_size=0.1, n_leapfrogs=3)
        state = hmc.init({"w": jnp.zeros((7, 4, 3), jnp.float64)},
                         log_joint=lj)
        new_state, info = jax.jit(
            lambda s, k: hmc.sample(lj, {}, s, k)
        )(state, jax.random.PRNGKey(0))
        assert info.acceptance_rate.shape == (7,)
        assert new_state.q["w"].shape == (7, 4, 3)

    def test_meta_bn_interface(self):
        @zs.meta_bayesian_net()
        def build():
            bn = zs.BayesianNet()
            bn.normal("x", jnp.zeros(N_CHAINS), std=1.0)
            return bn

        hmc = zs.HMC(step_size=0.5, n_leapfrogs=5)
        state = hmc.init({"x": jnp.zeros(N_CHAINS, jnp.float64)},
                         n_chain_dims=1)
        state, info = hmc.sample(build(), {}, state, jax.random.PRNGKey(0))
        assert info.samples["x"].shape == (N_CHAINS,)

    def test_adapt_mass_requires_adapt_step_size(self):
        import pytest

        with pytest.raises(ValueError, match="adapt_mass"):
            zs.HMC(adapt_mass=True)


class TestEvalCache:
    """The carried (log_prob, grad) cache: n_leapfrogs gradient + 1 density
    evaluations per iteration instead of n_leapfrogs+1 and 2, same math
    (values agree to ~1 ulp/step; run() threads it automatically)."""

    def _lj(self, obs):
        z = obs["z"]
        scale = jnp.asarray([0.3, 1.0, 3.0, 0.5])
        return -0.5 * jnp.sum((z - 1.0) ** 2 / scale, axis=-1)

    def test_single_step_matches_uncached(self):
        hmc = zs.HMC(step_size=0.2, n_leapfrogs=7)
        q0 = {"z": jax.random.normal(jax.random.PRNGKey(9), (16, 4))}
        st = hmc.init(q0, n_chain_dims=1)
        key = jax.random.PRNGKey(0)
        cache = hmc.make_cache(self._lj, {}, st)
        s1, i1 = hmc.sample(self._lj, {}, st, key)
        s2, i2, cache2 = hmc.sample(self._lj, {}, st, key, cache=cache)
        np.testing.assert_allclose(
            np.asarray(s1.q["z"]), np.asarray(s2.q["z"]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(i1.hamiltonian), np.asarray(i2.hamiltonian),
            atol=1e-12,
        )
        # The returned cache IS (log_prob, grad) at the accepted position.
        lp2, g2 = cache2
        np.testing.assert_allclose(
            np.asarray(lp2), np.asarray(self._lj(s2.q)), atol=1e-12
        )
        grad_fn = jax.grad(lambda v: jnp.sum(self._lj(v)))
        np.testing.assert_allclose(
            np.asarray(g2["z"]), np.asarray(grad_fn(s2.q)["z"]), atol=1e-12
        )

    def test_zero_leapfrogs_edge(self):
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=0)
        st = hmc.init({"z": jnp.zeros((8, 4))}, n_chain_dims=1)
        key = jax.random.PRNGKey(1)
        cache = hmc.make_cache(self._lj, {}, st)
        s1, _ = hmc.sample(self._lj, {}, st, key)
        s2, _, _ = hmc.sample(self._lj, {}, st, key, cache=cache)
        np.testing.assert_array_equal(
            np.asarray(s1.q["z"]), np.asarray(s2.q["z"])
        )

    def test_run_with_cache_recovers_target(self):
        # run() threads the cache internally; the full adaptive pipeline
        # must still recover the target moments.
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=5, adapt_step_size=True,
                     adapt_mass=True)
        st = hmc.init({"z": jnp.zeros((200, 4))}, n_chain_dims=1)
        _, out = jax.jit(
            lambda s, k: hmc.run(self._lj, {}, s, k, 700, n_adapt=300)
        )(st, jax.random.PRNGKey(2))
        xs = np.asarray(out["samples"]["z"][350:]).reshape(-1, 4)
        np.testing.assert_allclose(xs.mean(0), np.ones(4), atol=0.1)
        np.testing.assert_allclose(
            xs.std(0), np.sqrt([0.3, 1.0, 3.0, 0.5]), rtol=0.1
        )

    def test_cached_rejection_keeps_old_gradient(self):
        # A huge step size forces rejections; the carried cache must then
        # equal the ORIGINAL position's (log_prob, grad).
        hmc = zs.HMC(step_size=50.0, n_leapfrogs=5)
        q0 = {"z": jax.random.normal(jax.random.PRNGKey(3), (32, 4))}
        st = hmc.init(q0, n_chain_dims=1)
        cache = hmc.make_cache(self._lj, {}, st)
        s2, info, cache2 = hmc.sample(
            self._lj, {}, st, jax.random.PRNGKey(4), cache=cache
        )
        rejected = ~(
            np.asarray(info.acceptance_rate)
            > np.asarray(jax.random.uniform(jax.random.PRNGKey(4), (32,)))
        )
        assert rejected.mean() > 0.5  # mostly rejected at this step size
        keep = np.asarray(s2.q["z"]) == np.asarray(st.q["z"])
        kept_rows = keep.all(axis=1)
        np.testing.assert_allclose(
            np.asarray(cache2[0])[kept_rows],
            np.asarray(cache[0])[kept_rows],
        )
        np.testing.assert_allclose(
            np.asarray(cache2[1]["z"])[kept_rows],
            np.asarray(cache[1]["z"])[kept_rows],
        )


class TestSGMCMC:
    def test_sgld(self):
        e = double_well_error(
            run_sgmcmc(zs.SGLD(learning_rate=0.01), 8000)
        )
        assert e <= 0.023

    def test_psgld(self):
        e = double_well_error(
            run_sgmcmc(zs.PSGLD(learning_rate=0.01), 8000)
        )
        # The reference ships no PSGLD statistical bound. The RMSprop
        # preconditioner (without the Gamma correction term, as in Li et
        # al. 2015) is measurably biased on the double-well's varying
        # curvature; 0.1 is a sanity bound (typical observed ~0.08).
        assert e <= 0.1

    def test_sghmc_first_order(self):
        sampler = zs.SGHMC(
            learning_rate=0.01, n_iter_resample_v=50, friction=0.3,
            variance_estimate=0.02, second_order=False,
        )
        e = double_well_error(run_sgmcmc(sampler, 8000))
        assert e <= 0.016

    def test_sghmc_second_order(self):
        sampler = zs.SGHMC(
            learning_rate=0.01, n_iter_resample_v=50, friction=0.3,
            variance_estimate=0.02, second_order=True,
        )
        e = double_well_error(run_sgmcmc(sampler, 8000))
        assert e <= 0.016

    # SGNHT has no statistical bound in the reference suite. With
    # variance_extra=0 (the default) no noise is injected, so on clean
    # gradients the dynamics are nearly deterministic — real use relies on
    # minibatch gradient noise. variance_extra=0.15 injects the equivalent.
    def test_sgnht_scalar_alpha(self):
        sampler = zs.SGNHT(
            learning_rate=0.01, variance_extra=0.15,
            second_order=False, use_vector_alpha=False,
        )
        e = double_well_error(run_sgmcmc(sampler, 8000))
        assert e <= 0.03

    def test_sgnht_vector_alpha_second_order(self):
        sampler = zs.SGNHT(
            learning_rate=0.01, variance_extra=0.15,
            second_order=True, use_vector_alpha=True,
        )
        e = double_well_error(run_sgmcmc(sampler, 8000))
        assert e <= 0.03

    def test_lr_schedule(self):
        sampler = zs.SGLD(learning_rate=lambda t: 0.01 / (1.0 + t) ** 0.55)
        state = sampler.init({"x": jnp.zeros(10, jnp.float64)})
        state, qs = jax.jit(
            lambda s, k: sampler.run(log_joint, {}, s, k, 100)
        )(state, jax.random.PRNGKey(0))
        assert qs["x"].shape == (100, 10)
        assert bool(jnp.all(jnp.isfinite(qs["x"])))


class TestSGMCMCInfoCollection:
    def test_collect_info(self):
        sampler = zs.SGNHT(learning_rate=0.01, variance_extra=0.1,
                           use_vector_alpha=False, second_order=False)
        state = sampler.init({"x": jnp.zeros(8, jnp.float64)},
                             key=jax.random.PRNGKey(0))
        state, qs, infos = jax.jit(
            lambda s, k: sampler.run(log_joint, {}, s, k, 20,
                                     collect_info=True)
        )(state, jax.random.PRNGKey(1))
        assert qs["x"].shape == (20, 8)
        assert infos.mean_k["x"].shape == (20,)
        assert infos.alpha["x"].shape == (20,)
        assert bool(jnp.all(jnp.isfinite(infos.mean_k["x"])))


class TestTensorParallelPlacement:
    def test_shard_params_tp(self):
        from zhusuan_tpu.parallel import shard_params_tp
        from jax.sharding import Mesh, PartitionSpec as P
        import numpy as _np

        n_dev = len(jax.devices())
        mesh = Mesh(_np.array(jax.devices()), ("tp",))
        params = {
            "w": jnp.ones((16, 8 * n_dev)),
            "b": jnp.ones((8 * n_dev,)),
            "scalar": jnp.ones(()),
            "odd": jnp.ones((3,)),  # not divisible -> replicated
        }
        placed = shard_params_tp(mesh, params)
        w_spec = placed["w"].sharding.spec
        assert w_spec == P(None, "tp")
        assert placed["b"].sharding.spec == P("tp")
        assert placed["odd"].sharding.spec == P()
        # A matmul against the sharded params runs and matches.
        x = jnp.ones((4, 16))
        with mesh:
            out = jax.jit(lambda w, x: x @ w)(placed["w"], x)
        _np.testing.assert_allclose(
            _np.asarray(out), _np.asarray(x @ params["w"]), rtol=1e-6
        )


class TestWindowedWarmup:
    def test_warmup_run_recovers_mass_and_samples(self):
        dim, n_chains = 10, 400
        std = jnp.linspace(0.3, 3.0, dim, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.5, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init({"x": jnp.zeros((n_chains, dim), jnp.float64)},
                         log_joint=lj)
        state = jax.jit(
            lambda s, k: hmc.warmup_run(lj, {}, s, k, 400)
        )(state, jax.random.PRNGKey(0))
        # Installed mass approximates the precision 1/std^2.
        mass = np.asarray(state.mass["x"]).reshape(dim)
        np.testing.assert_allclose(
            mass, 1 / np.asarray(std) ** 2, rtol=0.5
        )
        # Post-warmup sampling recovers the moments with good acceptance.
        _, out = jax.jit(lambda s, k: hmc.run(lj, {}, s, k, 300))(
            state, jax.random.PRNGKey(1)
        )
        acc = float(jnp.mean(out["acceptance_rate"]))
        assert acc > 0.6
        x = np.asarray(out["samples"]["x"]).reshape(-1, dim)
        np.testing.assert_allclose(x.std(0), np.asarray(std), rtol=0.1)

    def test_warmup_requires_flags(self):
        import pytest

        hmc = zs.HMC()
        with pytest.raises(ValueError, match="adapt_step_size"):
            hmc.warmup_run(log_joint, {}, None, None, 100)
        hmc2 = zs.HMC(adapt_step_size=True, adapt_mass=True)
        with pytest.raises(ValueError, match="owns the mass"):
            hmc2.warmup_run(log_joint, {}, None, None, 100)

    def test_short_budget_falls_back(self):
        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3, adapt_step_size=True)
        state = hmc.init({"x": jnp.zeros((16, 4), jnp.float64)},
                         n_chain_dims=1)
        st = hmc.warmup_run(log_joint_gauss, {}, state, jax.random.PRNGKey(0),
                            40)
        assert np.all(np.isfinite(np.asarray(st.q["x"])))


def log_joint_gauss(observed):
    return jnp.sum(-0.5 * observed["x"] ** 2, -1)


class TestStepSizeJitter:
    def test_jittered_hmc_samples_correctly(self):
        std = jnp.linspace(0.5, 2.0, 6, dtype=jnp.float64)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.4, n_leapfrogs=8, adapt_step_size=True,
                     step_size_jitter=0.2)
        state = hmc.init({"x": jnp.zeros((300, 6), jnp.float64)},
                         log_joint=lj)
        state, _ = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 200, n_adapt=150,
                                 collect=False)
        )(state, jax.random.PRNGKey(0))
        _, out = jax.jit(lambda s, k: hmc.run(lj, {}, s, k, 300))(
            state, jax.random.PRNGKey(1)
        )
        x = np.asarray(out["samples"]["x"]).reshape(-1, 6)
        np.testing.assert_allclose(x.std(0), np.asarray(std), rtol=0.1)

    def test_invalid_jitter(self):
        import pytest

        with pytest.raises(ValueError, match="jitter"):
            zs.HMC(step_size_jitter=1.5)


class TestFusedStepFallback:
    def test_fused_step_flag_falls_back_on_cpu(self):
        """experimental_fused_step on a CPU backend silently uses the scan
        path (hardware-PRNG kernels have no CPU lowering)."""
        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3,
                     experimental_fused_step=True)
        state = hmc.init({"x": jnp.zeros((16, 4), jnp.float64)},
                         log_joint=log_joint_gauss)
        new_state, info = jax.jit(
            lambda s, k: hmc.sample(log_joint_gauss, {}, s, k)
        )(state, jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(info.acceptance_rate)))


class TestSGLDFusedFallback:
    def test_sgld_fused_flag_falls_back_on_cpu(self):
        """SGLD(experimental_fused_step=True) on CPU silently uses the
        scan path and matches the default sampler exactly (the fused
        kernel only engages on TPU backends)."""
        s_plain = zs.SGLD(learning_rate=0.01)
        s_fused = zs.SGLD(learning_rate=0.01, experimental_fused_step=True)
        st = s_plain.init({"x": jnp.zeros((16, 4), jnp.float64)})
        run = lambda s: jax.jit(
            lambda st, k: s.run(log_joint_gauss, {}, st, k, 20)
        )(st, jax.random.PRNGKey(0))
        _, qs_a = run(s_plain)
        _, qs_b = run(s_fused)
        np.testing.assert_array_equal(np.asarray(qs_a["x"]),
                                      np.asarray(qs_b["x"]))


class TestPSGLDFusedFallback:
    def test_psgld_fused_flag_falls_back_on_cpu(self):
        mk = lambda fused: zs.PSGLD(
            learning_rate=0.01, experimental_fused_step=fused
        )
        st0 = lambda s: s.init({"x": jnp.zeros((16, 4), jnp.float64)})
        run = lambda s: jax.jit(
            lambda st, k: s.run(log_joint_gauss, {}, st, k, 20)
        )(st0(s), jax.random.PRNGKey(0))
        _, qs_a = run(mk(False))
        _, qs_b = run(mk(True))
        np.testing.assert_array_equal(np.asarray(qs_a["x"]),
                                      np.asarray(qs_b["x"]))


class TestSGNHTFusedFallback:
    def test_sgnht_fused_flag_falls_back_on_cpu(self):
        """SGNHT(experimental_fused_step=True) on CPU silently uses the
        scan path (hardware PRNG has no CPU lowering)."""
        mk = lambda fused: zs.SGNHT(
            learning_rate=0.003, tune_rate=0.5,
            experimental_fused_step=fused,
        )
        st0 = lambda s: s.init({"x": jnp.zeros((16, 4), jnp.float64)},
                               key=jax.random.PRNGKey(0))
        run = lambda s: jax.jit(
            lambda st, k: s.run(log_joint_gauss, {}, st, k, 20)
        )(st0(s), jax.random.PRNGKey(1))
        _, qs_a = run(mk(False))
        _, qs_b = run(mk(True))
        np.testing.assert_array_equal(np.asarray(qs_a["x"]),
                                      np.asarray(qs_b["x"]))

    def test_scalar_alpha_never_fuses(self):
        # The scalar thermostat needs a global mean(v^2); the fused gate
        # must refuse it even when the flag is set (scan-path results).
        mk = lambda fused: zs.SGNHT(
            learning_rate=0.003, use_vector_alpha=False,
            experimental_fused_step=fused,
        )
        st0 = lambda s: s.init({"x": jnp.zeros((16, 4), jnp.float64)},
                               key=jax.random.PRNGKey(0))
        run = lambda s: jax.jit(
            lambda st, k: s.run(log_joint_gauss, {}, st, k, 10)
        )(st0(s), jax.random.PRNGKey(1))
        _, qs_a = run(mk(False))
        _, qs_b = run(mk(True))
        np.testing.assert_array_equal(np.asarray(qs_a["x"]),
                                      np.asarray(qs_b["x"]))


class TestSGHMCFusedFallback:
    def test_sghmc_fused_flag_falls_back_on_cpu(self):
        s_plain = zs.SGHMC(learning_rate=0.003, n_iter_resample_v=5)
        s_fused = zs.SGHMC(learning_rate=0.003, n_iter_resample_v=5,
                           experimental_fused_step=True)
        st0 = lambda s: s.init({"x": jnp.zeros((16, 4), jnp.float64)},
                               key=jax.random.PRNGKey(0))
        run = lambda s: jax.jit(
            lambda st, k: s.run(log_joint_gauss, {}, st, k, 20)
        )(st0(s), jax.random.PRNGKey(1))
        _, qs_a = run(s_plain)
        _, qs_b = run(s_fused)
        np.testing.assert_array_equal(np.asarray(qs_a["x"]),
                                      np.asarray(qs_b["x"]))


class TestBF16StateScanFallback:
    """bf16 chain state on CPU: the fused kernel is ineligible, so the
    scan path runs — the carry must stay bf16 while the adaptation
    accumulators (step size, dual averaging, EW moments) stay f32
    (ops/hmc_step.py bf16-state contract; PERF.md round-4 study)."""

    def test_bf16_state_runs_and_keeps_f32_adaptation(self):
        dim, n_chains = 4, 256
        std = jnp.linspace(0.5, 2.0, dim).astype(jnp.float32)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3, adapt_step_size=True,
                     adapt_mass=True)
        state = hmc.init(
            {"x": jnp.zeros((n_chains, dim), jnp.bfloat16)}, log_joint=lj
        )
        assert state.q["x"].dtype == jnp.bfloat16
        assert state.step_size.dtype == jnp.float32
        assert state.h_bar.dtype == jnp.float32
        assert state.ewmv_var["x"].dtype == jnp.float32
        final, out = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 60, n_adapt=30)
        )(state, jax.random.PRNGKey(2))
        # Carry dtype is stable across the scan; accumulators stay f32.
        assert final.q["x"].dtype == jnp.bfloat16
        assert final.step_size.dtype == jnp.float32
        assert final.mass["x"].dtype == jnp.float32
        assert np.isfinite(
            np.asarray(out["samples"]["x"], np.float32)
        ).all()
        acc = float(np.mean(np.asarray(out["acceptance_rate"][30:],
                                       np.float32)))
        assert acc > 0.4


class TestHMCThinning:
    """HMC.run(thinning=k) — memory-bounded collect (VERDICT r2 item 3;
    same contract as SGMCMC/RWM thinning: bit-exact vs the sliced full
    run, final state identical for any n_iters)."""

    def _setup(self, adapt=True):
        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3,
                     adapt_step_size=True if adapt else None,
                     adapt_mass=True if adapt else None)
        s0 = hmc.init({"x": jnp.zeros((8, 2), jnp.float64)},
                      log_joint=log_joint_gauss)
        return hmc, s0

    def test_thinned_equals_sliced_full_run(self):
        hmc, s0 = self._setup()
        key = jax.random.PRNGKey(3)
        _, full = hmc.run(log_joint_gauss, {}, s0, key, n_iters=30,
                          n_adapt=10)
        fin_t, thin = hmc.run(
            log_joint_gauss, {}, s0, key, n_iters=30, n_adapt=10,
            collect_fields=("samples", "log_prob"), thinning=5,
        )
        assert set(thin) == {"samples", "log_prob"}
        assert thin["samples"]["x"].shape == (6, 8, 2)
        np.testing.assert_allclose(
            np.asarray(thin["samples"]["x"]),
            np.asarray(full["samples"]["x"][4::5]), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(thin["log_prob"]),
            np.asarray(full["log_prob"][4::5]), rtol=1e-12,
        )

    def test_remainder_matches_full_run(self):
        # n_iters not divisible by thinning: the tail advances on the SAME
        # key thread, so the final state is bit-identical.
        hmc, s0 = self._setup(adapt=False)
        key = jax.random.PRNGKey(4)
        fin_full, _ = hmc.run(log_joint_gauss, {}, s0, key, n_iters=17)
        fin_thin, thin = hmc.run(log_joint_gauss, {}, s0, key, n_iters=17,
                                 thinning=5)
        assert thin["samples"]["x"].shape[0] == 3
        np.testing.assert_array_equal(
            np.asarray(fin_thin.q["x"]), np.asarray(fin_full.q["x"]))
        assert int(fin_thin.t) == int(fin_full.t) == 17

    def test_thinning_with_fused_step_and_bf16_collect(self):
        # The fused transition has no eval cache; thinning must work with
        # cache=None carries, and collect_dtype composes.
        hmc = zs.HMC(step_size=0.3, n_leapfrogs=3,
                     experimental_fused_step=True)
        s0 = hmc.init({"x": jnp.zeros((8, 2), jnp.float64)},
                      log_joint=log_joint_gauss)
        key = jax.random.PRNGKey(5)
        _, full = hmc.run(log_joint_gauss, {}, s0, key, n_iters=20)
        _, thin = hmc.run(log_joint_gauss, {}, s0, key, n_iters=20,
                          collect_fields=("samples",),
                          collect_dtype=jnp.bfloat16, thinning=4)
        assert thin["samples"]["x"].dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(thin["samples"]["x"], dtype=np.float64),
            np.asarray(full["samples"]["x"][3::4]),
            rtol=1e-2, atol=1e-2,
        )

    def test_thinning_validation(self):
        import pytest

        hmc, s0 = self._setup(adapt=False)
        with pytest.raises(ValueError, match="thinning"):
            hmc.run(log_joint_gauss, {}, s0, jax.random.PRNGKey(0),
                    n_iters=4, thinning=0)


class TestFusedAutoSelect:
    """experimental_fused_step='auto' (round-3 default): gating logic and
    CPU fallback invariants."""

    def test_invalid_value_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="experimental_fused_step"):
            zs.HMC(experimental_fused_step="yes")

    def test_predictor_false_on_cpu_and_for_ineligible_latents(self):
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=3)  # default 'auto'
        # CPU backend (the test environment) -> never fused.
        assert not hmc._fused_step_likely({"x": jnp.zeros((8, 4),
                                                          jnp.float32)})
        off = zs.HMC(step_size=0.1, n_leapfrogs=3,
                     experimental_fused_step=False)
        assert not off._fused_step_likely({"x": jnp.zeros((8, 4),
                                                          jnp.float32)})

    def test_auto_matches_false_on_cpu_bitwise(self):
        # On CPU the auto default must take the identical scan path —
        # same PRNG stream, bit-identical draws.
        def lj(obs):
            return jnp.sum(-0.5 * obs["x"] ** 2, -1)

        run = lambda hmc: jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 15)
        )(hmc.init({"x": jnp.zeros((8, 4), jnp.float64)}, log_joint=lj),
          jax.random.PRNGKey(2))
        _, out_auto = run(zs.HMC(step_size=0.3, n_leapfrogs=3))
        _, out_off = run(zs.HMC(step_size=0.3, n_leapfrogs=3,
                                experimental_fused_step=False))
        np.testing.assert_array_equal(
            np.asarray(out_auto["samples"]["x"]),
            np.asarray(out_off["samples"]["x"]))


class TestInitSearchFlagValidation:
    def test_only_none_or_static_false_accepted(self):
        import pytest

        hmc = zs.HMC(step_size=0.3, n_leapfrogs=2, adapt_step_size=True)
        s0 = hmc.init({"x": jnp.zeros((4, 2), jnp.float64)},
                      log_joint=log_joint_gauss)
        k = jax.random.PRNGKey(0)
        for bad in (True, jnp.asarray(False), np.False_, 0):
            with pytest.raises(ValueError, match="init_step_size_search"):
                hmc.sample(log_joint_gauss, {}, s0, k,
                           init_step_size_search=bad)
        # The two supported values work.
        hmc.sample(log_joint_gauss, {}, s0, k, init_step_size_search=None)
        hmc.sample(log_joint_gauss, {}, s0, k,
                   init_step_size_search=False)


class TestMixedDtypeRobustness:
    """An f32 chain state driven by a wider-dtype (f64 under x64) density
    must not break the scan/while carries: the acceptance statistic is
    pinned to the tuner-state dtype in base.dual_averaging_update and
    the init-step-size search (regression: HMC adapt_mass and ChEES
    adaptation promoted their carried scalars to f64 and lax.scan
    rejected the carry)."""

    def test_adaptive_samplers_run_f32_state_f64_density(self):
        std64 = jnp.asarray(np.geomspace(0.1, 3.0, 8))  # f64 under x64
        assert std64.dtype == jnp.float64

        def lj(obs):
            return jnp.sum(-0.5 * (obs["z"] / std64) ** 2, -1)

        q0 = {"z": jnp.zeros((8, 8), jnp.float32)}
        samplers = [
            (zs.HMC(step_size=0.1, n_leapfrogs=3, adapt_step_size=True,
                    adapt_mass=True, mass_collect_iters=5),
             dict(n_adapt=5)),
            (zs.NUTS(step_size=0.1, max_tree_depth=4,
                     adapt_step_size=True), dict(n_adapt=5)),
            (zs.ChEESHMC(step_size=0.1, trajectory_length=0.5),
             dict(n_adapt=5)),
        ]
        for s, kw in samplers:
            if isinstance(s, zs.ChEESHMC):
                st = s.init(q0)
            else:
                st = s.init(q0, log_joint=lj)
            _, out = jax.jit(
                lambda st, k, s=s, kw=kw: s.run(lj, {}, st, k, 10, **kw)
            )(st, jax.random.PRNGKey(0))
            assert out["samples"]["z"].dtype == jnp.float32
            assert np.isfinite(np.asarray(out["samples"]["z"])).all()
