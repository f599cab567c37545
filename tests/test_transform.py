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
