"""NUTS sampler tests: moments, tree behavior, divergences, run contract.

The exact detailed-balance validation lives in tests/test_geweke.py
(Geweke joint-distribution test); here: statistical moments on known
targets (the reference suite's style, tests/test_hmc.py), the
tree-depth response to geometry, divergence flagging, and the
``run``/thinning contract shared with HMC.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs

KEY = jax.random.PRNGKey(31)


def diag_gauss_log_joint(stds):
    stds = jnp.asarray(stds)

    def log_joint(obs):
        return jnp.sum(-0.5 * (obs["w"] / stds) ** 2, axis=-1)

    return log_joint


class TestNUTSMoments:
    def test_diag_gaussian_scales(self):
        stds = [0.5, 1.0, 2.0, 4.0]
        nuts = zs.NUTS(step_size=0.2, max_tree_depth=8,
                       adapt_step_size=True)
        st = nuts.init({"w": jnp.zeros((256, 4))}, n_chain_dims=1)
        final, out = jax.jit(
            lambda s, k: nuts.run(
                diag_gauss_log_joint(stds), {}, s, k, 600, n_adapt=300
            )
        )(st, KEY)
        post = np.asarray(out["samples"]["w"][300:]).reshape(-1, 4)
        np.testing.assert_allclose(post.std(axis=0), stds, rtol=0.1)
        np.testing.assert_allclose(
            post.mean(axis=0), np.zeros(4), atol=0.15
        )
        acc = float(np.mean(np.asarray(out["acceptance_rate"][300:])))
        assert 0.7 < acc < 0.95, acc

    def test_multi_latent_dict(self):
        """Two latents with different shapes exercise the flattener."""

        def log_joint(obs):
            lp_mu = -0.5 * (obs["mu"] / 2.0) ** 2
            lp_v = jnp.sum(-0.5 * obs["v"] ** 2, axis=-1)
            return lp_mu + lp_v

        nuts = zs.NUTS(step_size=0.3, adapt_step_size=True)
        st = nuts.init(
            {"mu": jnp.zeros(192), "v": jnp.zeros((192, 3))},
            n_chain_dims=1,
        )
        _, out = jax.jit(
            lambda s, k: nuts.run(log_joint, {}, s, k, 500, n_adapt=250)
        )(st, jax.random.fold_in(KEY, 1))
        mu = np.asarray(out["samples"]["mu"][250:]).ravel()
        v = np.asarray(out["samples"]["v"][250:]).reshape(-1, 3)
        assert abs(mu.std() - 2.0) < 0.2, mu.std()
        np.testing.assert_allclose(v.std(axis=0), np.ones(3), rtol=0.1)

    def test_bayesian_net_model_and_chain_inference(self):
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.normal("x", 1.0, std=0.7)
            return bn

        nuts = zs.NUTS(step_size=0.4, adapt_step_size=True)
        # n_chain_dims inferred by tracing the log joint.
        st = nuts.init({"x": jnp.zeros(128)}, log_joint=model())
        _, out = jax.jit(
            lambda s, k: nuts.run(model(), {}, s, k, 500, n_adapt=250)
        )(st, jax.random.fold_in(KEY, 2))
        x = np.asarray(out["samples"]["x"][250:]).ravel()
        assert abs(x.mean() - 1.0) < 0.1 and abs(x.std() - 0.7) < 0.1


class TestTreeBehavior:
    def test_depth_tracks_geometry(self):
        """An ill-conditioned Gaussian (scale ratio 100) needs longer
        trajectories than an isotropic one at the SAME adapted step
        size regime — NUTS discovers this; fixed-length HMC cannot."""

        def run_depth(stds, key):
            nuts = zs.NUTS(step_size=0.1, max_tree_depth=10,
                           adapt_step_size=True)
            st = nuts.init({"w": jnp.zeros((64, 2))}, n_chain_dims=1)
            _, out = jax.jit(
                lambda s, k: nuts.run(
                    diag_gauss_log_joint(stds), {}, s, k, 300,
                    n_adapt=150,
                )
            )(st, key)
            return float(np.mean(np.asarray(out["depth"][150:])))

        d_iso = run_depth([1.0, 1.0], jax.random.fold_in(KEY, 3))
        d_ill = run_depth([0.1, 10.0], jax.random.fold_in(KEY, 4))
        assert d_ill > d_iso + 1.0, (d_iso, d_ill)

    def test_divergences_flagged(self):
        """A grossly oversized step on a tight target must produce
        divergent transitions, flagged per chain."""
        nuts = zs.NUTS(step_size=50.0)  # no adaptation
        st = nuts.init({"w": jnp.zeros((32, 2))}, n_chain_dims=1)
        _, out = jax.jit(
            lambda s, k: nuts.run(
                diag_gauss_log_joint([0.1, 0.1]), {}, s, k, 50
            )
        )(st, jax.random.fold_in(KEY, 5))
        assert np.asarray(out["divergent"]).mean() > 0.5
        # Divergent-at-depth-0 chains keep their position (multinomial
        # draw over {initial point} only).
        assert np.allclose(np.asarray(out["samples"]["w"][0]), 0.0)

    def test_max_depth_respected(self):
        nuts = zs.NUTS(step_size=1e-4, max_tree_depth=4)
        st = nuts.init({"w": jnp.zeros((8, 2))}, n_chain_dims=1)
        _, out = jax.jit(
            lambda s, k: nuts.run(
                diag_gauss_log_joint([1.0, 1.0]), {}, s, k, 5,
                collect_fields=("depth", "n_leapfrogs", "turning"),
            )
        )(st, jax.random.fold_in(KEY, 6))
        depth = np.asarray(out["depth"])
        nl = np.asarray(out["n_leapfrogs"])
        assert depth.max() <= 4
        # A depth-4 tree has exactly 2^4 - 1 = 15 new leaves.
        assert nl.max() <= 15
        # Tiny steps never U-turn: every chain runs to max depth.
        assert (depth == 4).all() and not np.asarray(out["turning"]).any()


class TestMassAdaptation:
    @pytest.mark.slow
    def test_adapted_mass_matches_inverse_variance(self):
        stds = jnp.asarray([0.2, 5.0])
        nuts = zs.NUTS(step_size=0.2, adapt_step_size=True,
                       adapt_mass=True, mass_collect_iters=50)
        st = nuts.init({"w": jnp.zeros((256, 2))}, n_chain_dims=1)
        final, out = jax.jit(
            lambda s, k: nuts.run(
                diag_gauss_log_joint(stds), {}, s, k, 800, n_adapt=400
            )
        )(st, jax.random.fold_in(KEY, 7))
        mass = np.asarray(final.mass["w"]).ravel()
        np.testing.assert_allclose(
            mass, 1.0 / np.asarray(stds) ** 2, rtol=0.35
        )
        post = np.asarray(out["samples"]["w"][400:]).reshape(-1, 2)
        np.testing.assert_allclose(post.std(axis=0), stds, rtol=0.1)


class TestRunContract:
    def test_thinning_bit_exact_vs_sliced_full_run(self):
        lj = diag_gauss_log_joint([1.0, 2.0])
        nuts = zs.NUTS(step_size=0.5, adapt_step_size=True)
        st = nuts.init({"w": jnp.zeros((16, 2))}, n_chain_dims=1)
        k = jax.random.fold_in(KEY, 8)
        full_final, full = jax.jit(
            lambda s, kk: nuts.run(lj, {}, s, kk, 30, n_adapt=10)
        )(st, k)
        thin_final, thin = jax.jit(
            lambda s, kk: nuts.run(
                lj, {}, s, kk, 30, n_adapt=10, thinning=4
            )
        )(st, k)
        np.testing.assert_array_equal(
            np.asarray(thin["samples"]["w"]),
            np.asarray(full["samples"]["w"][3::4]),
        )
        # Remainder (30 = 7*4 + 2) still advances the final state
        # identically to the unthinned run.
        np.testing.assert_array_equal(
            np.asarray(thin_final.q["w"]), np.asarray(full_final.q["w"])
        )

    def test_collect_fields_and_validation(self):
        lj = diag_gauss_log_joint([1.0])
        nuts = zs.NUTS(step_size=0.5)
        st = nuts.init({"w": jnp.zeros((4, 1))}, n_chain_dims=1)
        _, out = nuts.run(
            lj, {}, st, KEY, 3,
            collect_fields=("samples", "energy", "n_leapfrogs"),
        )
        assert set(out) == {"samples", "energy", "n_leapfrogs"}
        with pytest.raises(ValueError, match="collect field"):
            nuts.run(lj, {}, st, KEY, 3, collect_fields=("bogus",))

    def test_constructor_validation(self):
        with pytest.raises(ValueError, match="step_size"):
            zs.NUTS(step_size=0.0)
        with pytest.raises(ValueError, match="max_tree_depth"):
            zs.NUTS(max_tree_depth=0)
        with pytest.raises(ValueError, match="adapt_mass requires"):
            zs.NUTS(adapt_mass=True)


class TestFusedKernel:
    """ops/nuts_step.py: the whole-tree Pallas transition. The hardware
    PRNG has no CPU lowering, so the statistical equivalence check is
    TPU-only (the bench selfcheck re-runs it each round); the CPU suite
    pins the eligibility gates and the silent fallback."""

    def test_cpu_falls_back_silently(self):
        lj = diag_gauss_log_joint([1.0, 2.0])
        nuts = zs.NUTS(step_size=0.3, max_tree_depth=5,
                       experimental_fused_step=True)
        st = nuts.init({"w": jnp.zeros((8, 2))}, n_chain_dims=1)
        _, out = nuts.run(lj, {}, st, KEY, 10, n_adapt=0)
        assert out["samples"]["w"].shape == (10, 8, 2)

    def test_kernels_trace_on_cpu(self):
        """Both kernel bodies trace to a jaxpr on CPU (jax.eval_shape).

        Pallas traces the kernel to a jaxpr at call time on every
        backend, so this catches Python-level breakage inside the kernel
        (regression: the looped-kernel refactor dropped the unrolled
        kernel's alive/turning/depth initializers — an UnboundLocalError
        that only fired at trace time on the TPU, crashing the bench)."""
        from zhusuan_tpu.ops.nuts_step import (
            fused_nuts_transition,
            fused_nuts_transition_looped,
        )

        d = 8
        std = jnp.linspace(0.5, 1.5, d, dtype=jnp.float32)
        vag = jax.vmap(jax.value_and_grad(
            lambda q: jnp.sum(-0.5 * (q / std) ** 2)))
        inv_m = jnp.ones((1, d), jnp.float32)
        q_s = jax.ShapeDtypeStruct((32, d), jnp.float32)
        k_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
        for fn, depth in ((fused_nuts_transition, 4),
                          (fused_nuts_transition, 6),
                          (fused_nuts_transition_looped, 8),
                          (fused_nuts_transition_looped, 10)):
            outs = jax.eval_shape(
                lambda q, k, fn=fn, depth=depth: fn(
                    vag, q, inv_m, 0.3, k, depth, 1000.0,
                    block_chains=32),
                q_s, k_s)
            assert outs[0].shape == (32, d)
            assert outs[4].dtype == jnp.int32

    def test_supported_gates(self):
        from zhusuan_tpu.ops.nuts_step import nuts_step_supported

        assert nuts_step_supported((4096, 100), 6)
        assert not nuts_step_supported((4096, 100), 7)   # unroll bound
        assert not nuts_step_supported((4096,), 6)       # rank
        assert not nuts_step_supported((4095, 100), 6)   # block divide
        assert not nuts_step_supported((4096, 100000), 6)  # VMEM

    def test_looped_supported_gates(self):
        from zhusuan_tpu.ops.nuts_step import nuts_looped_supported

        # covers the class DEFAULT depth 10 (the unrolled kernel's gap)
        assert nuts_looped_supported((4096, 100), 10)
        assert nuts_looped_supported((4096, 100), 7)
        assert not nuts_looped_supported((4096, 100), 13)  # depth cap
        assert not nuts_looped_supported((4096,), 10)      # rank
        assert not nuts_looped_supported((4095, 100), 10)  # block divide
        assert not nuts_looped_supported((4096, 100000), 10)  # VMEM

    def test_fused_mode_routing(self):
        """_use_fused picks unrolled at depth <= 6, looped at the default
        depth 10, None on CPU (this suite) — the mode strings are the
        tested contract so the default config can never silently lose
        its fused path without a test failing."""
        from unittest import mock

        from zhusuan_tpu.mcmc.nuts import _Flattener

        lj = diag_gauss_log_joint([1.0] * 4)
        q = {"w": jnp.zeros((256, 4), jnp.float32)}
        flat = _Flattener(q, 1)
        with mock.patch("zhusuan_tpu.mcmc.base.on_cpu_backend",
                        return_value=False):
            for depth, want in ((4, "unrolled"), (6, "unrolled"),
                                (8, "looped"), (10, "looped"),
                                (13, None)):
                nuts = zs.NUTS(max_tree_depth=depth,
                               experimental_fused_step=True)
                assert nuts._use_fused(flat, {}, 256, lj, {}) == want, depth
        # on the CPU backend every depth falls back to the scan path
        nuts = zs.NUTS(max_tree_depth=10, experimental_fused_step=True)
        assert nuts._use_fused(flat, {}, 256, lj, {}) is None

    def test_cpu_falls_back_silently_default_depth(self):
        """The DEFAULT config (max_tree_depth=10) runs on CPU via the
        scan path with the fused flag on."""
        lj = diag_gauss_log_joint([1.0, 2.0])
        nuts = zs.NUTS(step_size=0.3, experimental_fused_step=True)
        assert nuts.max_tree_depth == 10
        st = nuts.init({"w": jnp.zeros((8, 2))}, n_chain_dims=1)
        _, out = nuts.run(lj, {}, st, KEY, 5, n_adapt=0)
        assert out["samples"]["w"].shape == (5, 8, 2)

    def test_constructor_validation(self):
        with pytest.raises(ValueError):
            zs.NUTS(experimental_fused_step="yes")

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="hardware PRNG requires a TPU backend")
    def test_looped_matches_scan_statistically(self):
        """Default-depth NUTS (looped kernel) vs scan path on TPU."""
        stds = [0.5, 1.0, 2.0, 4.0]
        lj = diag_gauss_log_joint(stds)
        outs = {}
        for fused in (True, False):
            nuts = zs.NUTS(step_size=0.35, max_tree_depth=8,
                           experimental_fused_step=fused)
            st = nuts.init({"w": jnp.zeros((512, 4), jnp.float32)},
                           n_chain_dims=1)
            _, out = jax.jit(
                lambda s, k, n=nuts: n.run(lj, {}, s, k, 600, n_adapt=0)
            )(st, jax.random.fold_in(KEY, 11))
            post = np.asarray(out["samples"]["w"][150:]).reshape(-1, 4)
            np.testing.assert_allclose(post.std(axis=0), stds, rtol=0.1)
            outs[fused] = post.std(axis=0)
        np.testing.assert_allclose(outs[True], outs[False], rtol=0.08)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="hardware PRNG requires a TPU backend")
    def test_fused_matches_scan_statistically(self):
        stds = [0.5, 1.0, 2.0, 4.0]
        lj = diag_gauss_log_joint(stds)
        outs = {}
        for fused in (True, False):
            nuts = zs.NUTS(step_size=0.35, max_tree_depth=5,
                           experimental_fused_step=fused)
            st = nuts.init({"w": jnp.zeros((512, 4), jnp.float32)},
                           n_chain_dims=1)
            _, out = jax.jit(
                lambda s, k, n=nuts: n.run(lj, {}, s, k, 600, n_adapt=0)
            )(st, jax.random.fold_in(KEY, 9))
            post = np.asarray(out["samples"]["w"][150:]).reshape(-1, 4)
            np.testing.assert_allclose(post.std(axis=0), stds, rtol=0.1)
            outs[fused] = post.std(axis=0)
        np.testing.assert_allclose(outs[True], outs[False], rtol=0.08)
