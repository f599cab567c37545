"""Fused Cholesky + triangular-inverse kernel (zhusuan_tpu/ops/linalg.py).

CPU coverage runs the Pallas kernel in interpreter mode (the module's
``_FORCE_INTERPRET`` hook) against ``jnp.linalg.cholesky`` +
``solve_triangular``, and the closed-form matmul VJP against JAX's
autodiff of the stock primitives through a symmetric construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zhusuan_tpu.ops import linalg as zlin


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    b = rng.randn(n, 4 * n).astype(dtype)
    return b @ b.T / (4 * n) + np.eye(n, dtype=dtype)


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(zlin, "_FORCE_INTERPRET", True)


class TestCholeskyInverseValues:
    @pytest.mark.parametrize("n", [3, 17, 100])
    def test_matches_stock_primitives(self, interpret_kernel, n):
        a = jnp.asarray(_spd(n, seed=n))
        l, linv = zlin.cholesky_inverse(a)
        l_ref = jnp.linalg.cholesky(a)
        linv_ref = jax.scipy.linalg.solve_triangular(
            l_ref, jnp.eye(n, dtype=a.dtype), lower=True
        )
        np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(linv), np.asarray(linv_ref),
                                   rtol=3e-4, atol=3e-4)
        # L @ Linv == I to working precision.
        eye = np.asarray(l) @ np.asarray(linv)
        np.testing.assert_allclose(eye, np.eye(n), atol=5e-5)

    def test_strict_triangularity(self, interpret_kernel):
        a = jnp.asarray(_spd(12, seed=3))
        l, linv = zlin.cholesky_inverse(a)
        np.testing.assert_allclose(np.triu(np.asarray(l), 1), 0.0)
        np.testing.assert_allclose(np.triu(np.asarray(linv), 1), 0.0)

    def test_fallback_path_unsupported_dtype(self):
        a = jnp.asarray(_spd(8, seed=5, dtype=np.float64))
        l, linv = zlin.cholesky_inverse(a)
        np.testing.assert_allclose(
            np.asarray(l), np.linalg.cholesky(np.asarray(a)), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(l) @ np.asarray(linv), np.eye(8), atol=1e-12
        )

    def test_supported_gate(self):
        assert zlin.chol_inv_supported(100, jnp.float32)
        assert not zlin.chol_inv_supported(1024, jnp.float32)
        assert not zlin.chol_inv_supported(100, jnp.float64)


class TestCholeskyInverseGrad:
    def _loss_pair(self, n, seed, use_fused, w_l, w_linv):
        """Scalar losses through a symmetric construction B -> B@B.T + I,
        touching L and/or Linv with fixed random weights."""
        rng = np.random.RandomState(seed)
        b0 = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.3)
        wl = jnp.asarray(rng.randn(n, n).astype(np.float32))
        wi = jnp.asarray(rng.randn(n, n).astype(np.float32))

        def loss_fused(b):
            a = b @ b.T + jnp.eye(n, dtype=b.dtype)
            l, linv = zlin.cholesky_inverse(a)
            return w_l * jnp.sum(wl * l) + w_linv * jnp.sum(wi * linv)

        def loss_ref(b):
            a = b @ b.T + jnp.eye(n, dtype=b.dtype)
            l = jnp.linalg.cholesky(a)
            linv = jax.scipy.linalg.solve_triangular(
                l, jnp.eye(n, dtype=b.dtype), lower=True
            )
            return w_l * jnp.sum(wl * l) + w_linv * jnp.sum(wi * linv)

        f = loss_fused if use_fused else loss_ref
        return b0, f

    @pytest.mark.parametrize("w_l,w_linv", [(1.0, 0.0), (0.0, 1.0),
                                            (1.0, 1.0)])
    def test_vjp_matches_autodiff(self, interpret_kernel, w_l, w_linv):
        n = 9
        b0, f_fused = self._loss_pair(n, 11, True, w_l, w_linv)
        _, f_ref = self._loss_pair(n, 11, False, w_l, w_linv)
        g_fused = jax.grad(f_fused)(b0)
        g_ref = jax.grad(f_ref)(b0)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-4
        )

    def test_vjp_under_jit(self, interpret_kernel):
        n = 7
        b0, f_fused = self._loss_pair(n, 23, True, 1.0, 1.0)
        _, f_ref = self._loss_pair(n, 23, False, 1.0, 1.0)
        g1 = jax.jit(jax.grad(f_fused))(b0)
        g2 = jax.grad(f_ref)(b0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-4)

    def test_gp_like_pipeline_grad(self, interpret_kernel):
        """Grad parity on an SVGP-shaped chain: kernel matrix -> fused
        chol+inv -> conditional mean/var -> scalar."""
        n_z, n_x, d = 12, 20, 3
        rng = np.random.RandomState(7)
        z0 = jnp.asarray(rng.randn(n_z, d).astype(np.float32))
        x = jnp.asarray(rng.randn(n_x, d).astype(np.float32))
        fz = jnp.asarray(rng.randn(n_z).astype(np.float32))

        def rbf(a, b):
            return jnp.exp(-0.5 * jnp.sum(
                (a[:, None, :] - b[None, :, :]) ** 2, -1))

        def chain(z, fused):
            kzz = rbf(z, z) + 1e-5 * jnp.eye(n_z)
            if fused:
                l, linv = zlin.cholesky_inverse(kzz)
            else:
                l = jnp.linalg.cholesky(kzz)
                linv = jax.scipy.linalg.solve_triangular(
                    l, jnp.eye(n_z), lower=True)
            kxz = rbf(x, z)
            a_mat = kxz @ linv.T  # [n_x, n_z]
            mean = a_mat @ (linv @ fz)
            var = 1.0 - jnp.sum(a_mat ** 2, -1)
            return jnp.sum(mean ** 2) + jnp.sum(jnp.log(
                jnp.maximum(var, 1e-6)))

        g_fused = jax.grad(lambda z: chain(z, True))(z0)
        g_ref = jax.grad(lambda z: chain(z, False))(z0)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=5e-4, atol=5e-4)


class TestMVNCovTrilInv:
    def test_log_prob_matches_solve_path(self):
        from zhusuan_tpu.distributions import MultivariateNormalCholesky

        n = 8
        rng = np.random.RandomState(2)
        a = _spd(n, seed=2)
        l = np.linalg.cholesky(a).astype(np.float32)
        linv = np.linalg.inv(l).astype(np.float32)
        mean = jnp.asarray(rng.randn(n).astype(np.float32))
        x = jnp.asarray(rng.randn(5, n).astype(np.float32))
        d_plain = MultivariateNormalCholesky(mean, jnp.asarray(l))
        d_inv = MultivariateNormalCholesky(
            mean, jnp.asarray(l), cov_tril_inv=jnp.asarray(linv))
        np.testing.assert_allclose(
            np.asarray(d_inv.log_prob(x)),
            np.asarray(d_plain.log_prob(x)), rtol=1e-4, atol=1e-4)

    def test_log_prob_grad_matches(self):
        from zhusuan_tpu.distributions import MultivariateNormalCholesky

        n = 6
        rng = np.random.RandomState(3)
        raw0 = jnp.asarray(rng.randn(n, n).astype(np.float32) * 0.2)
        mean = jnp.asarray(rng.randn(n).astype(np.float32))
        x = jnp.asarray(rng.randn(4, n).astype(np.float32))

        def lp(raw, use_inv):
            l = jnp.tril(raw, -1) + jnp.diag(jax.nn.softplus(
                jnp.diagonal(raw)))
            kw = {}
            if use_inv:
                kw["cov_tril_inv"] = jax.scipy.linalg.solve_triangular(
                    l, jnp.eye(n, dtype=l.dtype), lower=True)
            d = MultivariateNormalCholesky(mean, l, **kw)
            return jnp.sum(d.log_prob(x))

        g_inv = jax.grad(lambda r: lp(r, True))(raw0)
        g_plain = jax.grad(lambda r: lp(r, False))(raw0)
        np.testing.assert_allclose(np.asarray(g_inv), np.asarray(g_plain),
                                   rtol=2e-4, atol=2e-4)

    def test_shape_mismatch_raises(self):
        from zhusuan_tpu.distributions import MultivariateNormalCholesky

        with pytest.raises(ValueError, match="cov_tril_inv"):
            MultivariateNormalCholesky(
                jnp.zeros(4), jnp.eye(4),
                cov_tril_inv=jnp.eye(3))


class TestSVGPFusedFactors:
    def test_elbo_value_and_grad_parity(self, interpret_kernel):
        """The SVGP loss with fused (L, L^{-1}) factors matches the plain
        cholesky+solve formulation in value and parameter gradients."""
        import optax  # noqa: F401 (example import chain)
        import zhusuan_tpu as zs
        from examples.gaussian_process import svgp

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(30, 3).astype(np.float32))
        y = jnp.asarray(np.sin(np.asarray(x).sum(-1)).astype(np.float32))
        n_z, n_particles = 8, 6
        params = svgp.init_params(jax.random.PRNGKey(0), n_z, 3,
                                  np.asarray(x))
        key = jax.random.PRNGKey(7)

        def loss(params, fused):
            if fused:
                chol, chol_inv = svgp.kzz_factors(params, n_z)
            else:
                chol, chol_inv = svgp.kzz_cholesky(params, n_z), None
            model = svgp.build_model(params, x, n_z, n_particles,
                                     kzz_chol=chol, kzz_chol_inv=chol_inv)

            def log_joint(bn):
                prior, log_py = bn.cond_log_prob(["fz", "y"])
                return prior + log_py

            model.log_joint = log_joint
            latent = svgp.build_variational_samples(
                params, x, n_z, n_particles, key, kzz_chol=chol,
                kzz_chol_inv=chol_inv)
            lb = zs.variational.elbo(model, observed={"y": y},
                                     latent=latent, axis=0)
            return jnp.mean(lb.sgvb())

        v_fused, g_fused = jax.value_and_grad(
            lambda p: loss(p, True))(params)
        v_plain, g_plain = jax.value_and_grad(
            lambda p: loss(p, False))(params)
        np.testing.assert_allclose(float(v_fused), float(v_plain),
                                   rtol=1e-4, atol=1e-4)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g_fused[k]), np.asarray(g_plain[k]),
                rtol=3e-3, atol=3e-3, err_msg=k)
