"""SVGD particle inference (beyond-reference; variational/svgd.py).

Targets mirror the Liu & Wang (2016) experiments: Gaussians (moment
recovery) and the 1-D two-mode mixture (mode-weight recovery, where
plain gradient ascent collapses to one mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.variational import SVGD
from zhusuan_tpu.variational.svgd import rbf_kernel_terms


class TestKernelTerms:
    def test_rbf_matches_direct(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        k_mat, repulsion, h = rbf_kernel_terms(x, bandwidth=0.7)
        xd = np.asarray(x, np.float64)
        k_np = np.exp(
            -((xd[:, None, :] - xd[None, :, :]) ** 2).sum(-1) / 0.7
        )
        np.testing.assert_allclose(np.asarray(k_mat), k_np, rtol=1e-5)
        # repulsion[i] = sum_j grad_{x_j} k(x_j, x_i), via autodiff.
        def k_ji(xj, xi):
            return jnp.exp(-jnp.sum((xj - xi) ** 2) / 0.7)

        rep = np.zeros_like(xd)
        for i in range(5):
            for j in range(5):
                rep[i] += np.asarray(jax.grad(k_ji)(x[j], x[i]))
        np.testing.assert_allclose(np.asarray(repulsion), rep, rtol=1e-4,
                                   atol=1e-6)

    def test_bisection_median_matches_sort_median(self):
        # The sort-free median (PERF.md: 36x faster SVGD at 4096
        # particles on a v5e) must agree with jnp.median to the
        # bandwidth-relevant precision on assorted distributions.
        from zhusuan_tpu.variational.svgd import _median_bisect

        for seed, gen in enumerate([
            lambda k: jax.random.uniform(k, (5000,)),
            lambda k: jax.random.gamma(k, 2.0, (5000,)),
            lambda k: jax.random.exponential(k, (3, 700)) * 100.0,
        ]):
            x = gen(jax.random.PRNGKey(seed))
            approx = float(_median_bisect(x))
            exact = float(jnp.median(x))
            scale = float(jnp.max(x))
            assert abs(approx - exact) < 2e-4 * scale, (
                seed, approx, exact)

    def test_median_bandwidth_positive(self):
        x = jnp.zeros((4, 2))  # all-equal particles: sqdist all zero
        _, _, h = rbf_kernel_terms(x, bandwidth="median")
        assert float(h) > 0.0


class TestSVGDGaussian:
    def test_1d_moments(self):
        def log_joint(obs):
            return -0.5 * jnp.sum(((obs["z"] - 2.0) / 1.5) ** 2, axis=-1)

        svgd = SVGD(learning_rate=0.3)
        z0 = jax.random.normal(jax.random.PRNGKey(0), (100, 1)) * 0.2 - 4.0
        state = svgd.init({"z": z0})
        state, _ = jax.jit(
            lambda s: svgd.run(log_joint, {}, s, n_iters=800)
        )(state)
        z = np.asarray(state.particles["z"])
        assert abs(z.mean() - 2.0) < 0.1, z.mean()
        assert abs(z.std() - 1.5) < 0.2, z.std()

    def test_correlated_2d_covariance(self):
        cov = jnp.asarray([[1.0, 0.7], [0.7, 1.0]])
        prec = jnp.linalg.inv(cov)

        def log_joint(obs):
            z = obs["z"]
            return -0.5 * jnp.einsum("...i,ij,...j->...", z, prec, z)

        svgd = SVGD(learning_rate=0.2)
        z0 = jax.random.normal(jax.random.PRNGKey(1), (200, 2))
        state = svgd.init({"z": z0})
        state, diag = jax.jit(
            lambda s: svgd.run(log_joint, {}, s, n_iters=1500, collect=True)
        )(state)
        emp = np.cov(np.asarray(state.particles["z"]).T)
        np.testing.assert_allclose(emp, np.asarray(cov), atol=0.15)
        assert diag["grad_norm"].shape == (1500,)
        # The Stein direction shrinks as particles approach the target.
        assert float(diag["grad_norm"][-1]) < float(diag["grad_norm"][0])

    def test_multi_latent_dict(self):
        def log_joint(obs):
            a = -0.5 * jnp.sum((obs["a"] - 1.0) ** 2, axis=-1)
            b = -0.5 * jnp.sum(((obs["b"] + 2.0) / 0.5) ** 2, axis=(-2, -1))
            return a + b

        svgd = SVGD(learning_rate=0.3)
        key = jax.random.PRNGKey(2)
        state = svgd.init({
            "a": jax.random.normal(key, (80, 3)),
            "b": jax.random.normal(jax.random.fold_in(key, 1), (80, 2, 2)),
        })
        state, _ = jax.jit(
            lambda s: svgd.run(log_joint, {}, s, n_iters=800)
        )(state)
        a = np.asarray(state.particles["a"])
        b = np.asarray(state.particles["b"])
        assert abs(a.mean() - 1.0) < 0.1
        assert abs(b.mean() + 2.0) < 0.1
        assert abs(b.std() - 0.5) < 0.15

    def test_meta_bn_interface(self):
        from zhusuan_tpu.framework import meta_bayesian_net

        @meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.normal("z", jnp.zeros(2), std=jnp.asarray(1.0),
                      group_ndims=1)
            bn.normal("x", bn["z"], std=jnp.asarray(0.5), group_ndims=1)
            return bn

        x_obs = jnp.asarray([0.8, -0.4])
        svgd = SVGD(learning_rate=0.2)
        z0 = jax.random.normal(jax.random.PRNGKey(3), (150, 2)) * 2.0
        state = svgd.init({"z": z0})
        state, _ = jax.jit(
            lambda s: svgd.run(model(), {"x": x_obs}, s, n_iters=1000)
        )(state)
        # Conjugate posterior: N(x * 1/(1+0.25), (0.25/1.25) I).
        post_mean = np.asarray(x_obs) / 1.25
        post_std = float(np.sqrt(0.25 / 1.25))
        z = np.asarray(state.particles["z"])
        np.testing.assert_allclose(z.mean(axis=0), post_mean, atol=0.08)
        np.testing.assert_allclose(z.std(axis=0), post_std, atol=0.1)


class TestSVGDMixture:
    def test_two_mode_weights(self):
        # 1/3 N(-2, 1) + 2/3 N(2, 1): particles must occupy both modes
        # with the right mass — the paper's headline qualitative result.
        def log_joint(obs):
            z = obs["z"][..., 0]
            lp1 = -0.5 * (z + 2.0) ** 2 + jnp.log(1.0 / 3.0)
            lp2 = -0.5 * (z - 2.0) ** 2 + jnp.log(2.0 / 3.0)
            return jnp.logaddexp(lp1, lp2)

        svgd = SVGD(learning_rate=0.2)
        z0 = jax.random.normal(jax.random.PRNGKey(4), (300, 1)) * 0.3 - 4.0
        state = svgd.init({"z": z0})
        state, _ = jax.jit(
            lambda s: svgd.run(log_joint, {}, s, n_iters=2000)
        )(state)
        z = np.asarray(state.particles["z"])[:, 0]
        right = float((z > 0).mean())
        assert 0.55 < right < 0.8, right  # true mass 2/3


class TestSVGDValidation:
    def test_single_particle_rejected(self):
        with pytest.raises(ValueError, match="at least 2"):
            SVGD().init({"z": jnp.zeros((1, 3))})

    def test_mismatched_particle_axes_rejected(self):
        with pytest.raises(ValueError, match="leading n_particles"):
            SVGD().init({"a": jnp.zeros((4, 2)), "b": jnp.zeros((5, 2))})

    def test_bad_bandwidth_rejected(self):
        with pytest.raises(ValueError, match="bandwidth"):
            SVGD(bandwidth="mean")
        with pytest.raises(ValueError, match="positive"):
            SVGD(bandwidth=-1.0)

    def test_custom_optimizer(self):
        def log_joint(obs):
            return -0.5 * jnp.sum(obs["z"] ** 2, axis=-1)

        svgd = SVGD(optimizer=optax.adam(0.1))
        state = svgd.init(
            {"z": jax.random.normal(jax.random.PRNGKey(0), (50, 2)) + 3.0}
        )
        state, _ = jax.jit(
            lambda s: svgd.run(log_joint, {}, s, n_iters=500)
        )(state)
        z = np.asarray(state.particles["z"])
        assert abs(z.mean()) < 0.15


class TestMedianRobustness:
    def test_bisection_median_survives_huge_outlier(self):
        # Regression: absolute-tolerance bisection returned 7.6e6 for a
        # true median of ~1.0 when one 1e12 entry stretched the range.
        from zhusuan_tpu.variational.svgd import _median_bisect

        x = jax.random.uniform(jax.random.PRNGKey(0), (1000,),
                               jnp.float64, 0.0, 2.0)
        x = x.at[0].set(1e12)
        approx = float(_median_bisect(x))
        exact = float(jnp.median(x))
        assert abs(approx - exact) < 1e-3 * max(exact, 1.0), (
            approx, exact)
