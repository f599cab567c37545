"""Normalizing flow tests.

Port of reference ``tests/test_transform.py``: the tracked
log-det-Jacobian must match the determinant of the autodiff-computed
Jacobian (:14-38), plus shape checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.transform import (
    init_linear_ar,
    init_planar_flow,
    inv_autoregressive_flow,
    linear_ar,
    planar_normalizing_flow,
)

KEY = jax.random.PRNGKey(3)


class TestPlanarFlow:
    def test_log_det_vs_autodiff(self):
        d, n_flows = 4, 3
        key_p, key_s = jax.random.split(KEY)
        # Non-trivially scaled params so the Jacobian is far from identity.
        params = init_planar_flow(key_p, n_flows, d, jnp.float64)
        params = jax.tree.map(lambda p: p * 100.0, params)
        z0 = jax.random.normal(key_s, (7, d), jnp.float64)
        lp0 = jnp.zeros((7,), jnp.float64)

        z1, lp1 = planar_normalizing_flow(z0, lp0, params)
        assert z1.shape == (7, d)
        assert lp1.shape == (7,)

        def flow_one(z):
            out, _ = planar_normalizing_flow(
                z[None, :], jnp.zeros((1,), jnp.float64), params
            )
            return out[0]

        for i in range(7):
            jac = jax.jacobian(flow_one)(z0[i])
            _, logdet = np.linalg.slogdet(np.asarray(jac))
            np.testing.assert_allclose(
                float(lp0[i] - lp1[i]), logdet, rtol=1e-8
            )

    def test_invertibility_constraint(self):
        # u_hat . w >= -1 regardless of raw u, so det > 0 everywhere.
        d = 3
        params = [
            {
                "u": jnp.asarray([-50.0, 0.0, 0.0]),
                "w": jnp.asarray([1.0, 0.0, 0.0]),
                "b": jnp.asarray(0.0),
            }
        ]
        z = jnp.linspace(-5, 5, 100)[:, None] * jnp.ones((100, d))
        _, lp = planar_normalizing_flow(z, jnp.zeros(100), params)
        assert bool(jnp.all(jnp.isfinite(lp)))

    def test_shape_errors(self):
        params = init_planar_flow(KEY, 1, 3)
        with pytest.raises(ValueError, match="rank >= 2"):
            planar_normalizing_flow(jnp.zeros(3), jnp.zeros(()), params)
        with pytest.raises(ValueError, match="rank"):
            planar_normalizing_flow(
                jnp.zeros((2, 3)), jnp.zeros((2, 3)), params
            )


class TestIAF:
    def test_log_det_vs_autodiff(self):
        d, n_flows = 4, 2
        key_p, key_s = jax.random.split(KEY)
        params = init_linear_ar(key_p, n_flows, d, jnp.float64)
        params = jax.tree.map(lambda p: p * 50.0, params)
        z0 = jax.random.normal(key_s, (5, d), jnp.float64)
        lp0 = jnp.zeros((5,), jnp.float64)

        z1, lp1 = inv_autoregressive_flow(
            z0, None, lp0, linear_ar, params, update="normal"
        )

        def flow_one(z):
            out, _ = inv_autoregressive_flow(
                z[None, :], None, jnp.zeros((1,), jnp.float64),
                linear_ar, params, update="normal",
            )
            return out[0]

        for i in range(5):
            jac = jax.jacobian(flow_one)(z0[i])
            _, logdet = np.linalg.slogdet(np.asarray(jac))
            np.testing.assert_allclose(
                float(lp0[i] - lp1[i]), logdet, rtol=1e-8
            )

    def test_gru_update(self):
        d = 3
        params = init_linear_ar(KEY, 2, d, jnp.float64)
        z0 = jax.random.normal(KEY, (6, d), jnp.float64)
        z1, lp1 = inv_autoregressive_flow(
            z0, None, jnp.zeros((6,), jnp.float64), linear_ar, params,
            update="gru",
        )
        assert z1.shape == (6, d)
        assert bool(jnp.all(jnp.isfinite(lp1)))

    def test_bad_update(self):
        params = init_linear_ar(KEY, 1, 3)
        with pytest.raises(ValueError, match="update"):
            inv_autoregressive_flow(
                jnp.zeros((2, 3)), None, jnp.zeros(2), linear_ar, params,
                update="bogus",
            )


class TestAffineCoupling:
    """RealNVP affine coupling (beyond-reference; transform.py)."""

    def _params(self, d=6, n=4, key=0):
        from zhusuan_tpu.transform import init_affine_coupling

        p = init_affine_coupling(jax.random.PRNGKey(key), n, d, hidden=16)
        # Perturb away from the identity init so the tests are non-trivial.
        k = jax.random.PRNGKey(key + 1)
        return jax.tree.map(
            lambda x: x + 0.3 * jax.random.normal(
                jax.random.fold_in(k, x.size), x.shape, x.dtype
            ),
            p,
        )

    def test_identity_at_init(self):
        from zhusuan_tpu.transform import (
            affine_coupling_flow, init_affine_coupling,
        )

        params = init_affine_coupling(jax.random.PRNGKey(0), 3, 6)
        z = jax.random.normal(jax.random.PRNGKey(1), (7, 6))
        lp = jnp.zeros(7)
        z2, lp2 = affine_coupling_flow(z, lp, params)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z))
        np.testing.assert_allclose(np.asarray(lp2), 0.0)

    def test_exact_inverse_roundtrip(self):
        from zhusuan_tpu.transform import affine_coupling_flow

        params = self._params()
        z = jax.random.normal(jax.random.PRNGKey(2), (11, 6))
        x, _ = affine_coupling_flow(z, jnp.zeros(11), params)
        z_back, _ = affine_coupling_flow(x, jnp.zeros(11), params,
                                         inverse=True)
        np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                                   rtol=1e-5, atol=1e-6)

    def test_logdet_matches_autodiff_jacobian(self):
        from zhusuan_tpu.transform import affine_coupling_flow

        params = self._params(d=4, n=3)

        def fwd(z):
            return affine_coupling_flow(z[None], jnp.zeros(1), params)[0][0]

        z = jax.random.normal(jax.random.PRNGKey(3), (4,))
        jac = jax.jacfwd(fwd)(z)
        _, lp = affine_coupling_flow(z[None], jnp.zeros(1), params)
        # forward subtracts log|det J|.
        np.testing.assert_allclose(
            float(-lp[0]), float(jnp.linalg.slogdet(jac)[1]),
            rtol=1e-5,
        )

    def test_density_evaluation_semantics(self):
        # base(z) - sum(ls) via forward == base(z0) + delta via inverse.
        from scipy import stats

        from zhusuan_tpu.transform import affine_coupling_flow

        params = self._params(d=6, n=4, key=5)
        z0 = jax.random.normal(jax.random.PRNGKey(4), (9, 6))
        base_lp = jnp.sum(
            jnp.asarray(stats.norm.logpdf(np.asarray(z0))), axis=-1
        )
        x, lp_fwd = affine_coupling_flow(z0, base_lp, params)
        z_rec, delta = affine_coupling_flow(x, jnp.zeros(9), params,
                                            inverse=True)
        np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z0),
                                   rtol=1e-5, atol=1e-6)
        lp_inv = jnp.sum(
            jnp.asarray(stats.norm.logpdf(np.asarray(z_rec))), axis=-1
        ) + delta
        np.testing.assert_allclose(np.asarray(lp_inv), np.asarray(lp_fwd),
                                   rtol=1e-5)

    def test_odd_dimension_supported(self):
        from zhusuan_tpu.transform import (
            affine_coupling_flow, init_affine_coupling,
        )

        params = init_affine_coupling(jax.random.PRNGKey(0), 2, 5)
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 5))
        x, lp = affine_coupling_flow(z, jnp.zeros(3), params)
        assert x.shape == (3, 5)

    def test_fits_correlated_target(self):
        # End-to-end flow VI: maximize E_q0[log p(f(z)) ] + log-det (the
        # flow ELBO) toward a correlated Gaussian; KL must drop sharply.
        import optax

        from zhusuan_tpu.transform import (
            affine_coupling_flow, init_affine_coupling,
        )

        cov = jnp.asarray([[1.0, 0.8], [0.8, 1.0]])
        prec = jnp.linalg.inv(cov)
        logdet_cov = jnp.linalg.slogdet(cov)[1]

        def target_lp(x):
            quad = jnp.einsum("...i,ij,...j->...", x, prec, x)
            return -0.5 * (quad + logdet_cov + 2 * jnp.log(2 * jnp.pi))

        params = init_affine_coupling(jax.random.PRNGKey(0), 4, 2,
                                      hidden=32)
        opt = optax.adam(1e-2)
        ostate = opt.init(params)

        def neg_elbo(params, key):
            z = jax.random.normal(key, (256, 2))
            base_lp = jnp.sum(
                -0.5 * (z ** 2 + jnp.log(2 * jnp.pi)), axis=-1
            )
            x, q_lp = affine_coupling_flow(z, base_lp, params)
            return jnp.mean(q_lp - target_lp(x))  # = KL(q || p)

        @jax.jit
        def step(params, ostate, key):
            kl, g = jax.value_and_grad(neg_elbo)(params, key)
            up, ostate = opt.update(g, ostate)
            return optax.apply_updates(params, up), ostate, kl

        key = jax.random.PRNGKey(1)
        kl0 = float(neg_elbo(params, key))
        for i in range(400):
            key, sub = jax.random.split(key)
            params, ostate, kl = step(params, ostate, sub)
        assert kl0 > 0.3  # identity init vs correlated target
        assert float(kl) < 0.05, (kl0, float(kl))
