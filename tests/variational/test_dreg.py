"""DReG estimator tests (Tucker et al. 2019). Beyond reference parity.

Checks the three defining properties of the doubly-reparameterized
gradient for ``ImportanceWeightedObjective.dreg()``:

* model-parameter (theta) gradients are EXACTLY the IWAE gradients for the
  same draws (the stop-gradient correction restores the w-tilde weighting);
* inference-parameter (phi) gradients vanish pointwise (per draw, any key)
  when q equals the true posterior — the property plain SGVB/IWAE lacks;
* phi gradients agree with SGVB in expectation (both unbiased for the same
  bound's gradient);
* K = 1 reduces exactly to the STL estimator (Roeder et al. 2017);
* the estimator refuses variational nodes built without
  ``use_path_derivative=True`` (silent wrong gradients are unacceptable).

Conjugate setup: z ~ N(0,1), x | z ~ N(z + theta, 1), observed x0; the
posterior at theta=0 is N(x0/2, sqrt(1/2)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import BayesianNet
from zhusuan_tpu.variational import importance_weighted_objective

X0 = 1.0
POST_MEAN = X0 / 2.0
POST_LOGSTD = float(0.5 * np.log(0.5))

KEY = jax.random.PRNGKey(7)


def make_log_joint(theta):
    # f64 params (python floats would give the conventional f32 param
    # dtype and `given` would score in f32 — see base._check_input_shape).
    one = jnp.float64(1.0)

    def log_joint(observed):
        z = observed["z"]
        lp_z = zs.distributions.Normal(jnp.float64(0.0), std=one).log_prob(z)
        lp_x = zs.distributions.Normal(z + theta, std=one).log_prob(
            jnp.float64(X0)
        )
        return lp_z + lp_x

    return log_joint


def make_q(mean_q, logstd_q, n_samples, key=KEY, path_derivative=True,
           reparam=True):
    q = BayesianNet(key=key)
    q.normal(
        "z", jnp.float64(mean_q), logstd=jnp.float64(logstd_q),
        n_samples=n_samples,
        is_reparameterized=reparam, use_path_derivative=path_derivative,
    )
    return q


class TestDReG:
    def test_value_equals_sgvb_cost(self):
        q = make_q(0.3, -0.2, 16)
        obj = importance_weighted_objective(
            make_log_joint(0.0), {}, variational=q, axis=0
        )
        np.testing.assert_allclose(
            float(obj.dreg()), float(obj.sgvb()), rtol=0, atol=1e-12
        )

    def test_theta_grad_exactly_iwae(self):
        # Same fixed key => identical draws across traces; the theta
        # gradients of dreg and sgvb must agree to machine precision.
        def cost(theta, method):
            q = make_q(0.3, -0.2, 8)
            obj = importance_weighted_objective(
                make_log_joint(theta), {}, variational=q, axis=0
            )
            return getattr(obj, method)()

        g_dreg = jax.grad(cost)(jnp.float64(0.4), "dreg")
        g_iwae = jax.grad(cost)(jnp.float64(0.4), "sgvb")
        np.testing.assert_allclose(
            float(g_dreg), float(g_iwae), rtol=1e-10, atol=1e-12
        )
        assert abs(float(g_iwae)) > 1e-3  # the gradient is nontrivial

    @pytest.mark.parametrize("k", [1, 8])
    def test_phi_grad_zero_at_exact_posterior(self, k):
        # When q == p(z|x), d/dz [log p(x,z) - log q(z)] == 0 for every z,
        # so the DReG estimate is ~0 per draw — not merely in expectation.
        def cost(mean_q, logstd_q, method, key):
            # Plain SGVB keeps the live score term (path_derivative=False);
            # with it stopped, sgvb() would itself be STL and also vanish.
            q = make_q(mean_q, logstd_q, k, key=key,
                       path_derivative=(method == "dreg"))
            obj = importance_weighted_objective(
                make_log_joint(0.0), {}, variational=q, axis=0
            )
            return getattr(obj, method)()

        for seed in (0, 1, 2):
            key = jax.random.PRNGKey(seed)
            g = jax.grad(cost, argnums=(0, 1))(
                jnp.float64(POST_MEAN), jnp.float64(POST_LOGSTD),
                "dreg", key,
            )
            np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-9)
        # Plain SGVB at the same point is noisy per draw (only its
        # expectation vanishes).
        g_sgvb = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(POST_MEAN), jnp.float64(POST_LOGSTD),
            "sgvb", jax.random.PRNGKey(0),
        )
        assert max(abs(float(g_sgvb[0])), abs(float(g_sgvb[1]))) > 1e-3

    def test_phi_grad_unbiased_vs_sgvb(self):
        # Both estimators are unbiased for the gradient of the same K-sample
        # bound; their means over many keys must agree.
        k, n_rep = 4, 4000

        def grad_one(key, method):
            # dreg vs PLAIN sgvb: both unbiased for the K-sample bound's
            # gradient. (sgvb with path_derivative=True would be IWAE-STL,
            # which is biased for K > 1 — Tucker et al. 2019, sec. 3.)
            def cost(mean_q, logstd_q):
                q = make_q(mean_q, logstd_q, k, key=key,
                           path_derivative=(method == "dreg"))
                obj = importance_weighted_objective(
                    make_log_joint(0.0), {}, variational=q, axis=0
                )
                return getattr(obj, method)()

            return jnp.stack(
                jax.grad(cost, argnums=(0, 1))(
                    jnp.float64(0.9), jnp.float64(0.3)
                )
            )

        keys = jax.random.split(jax.random.PRNGKey(42), n_rep)
        g_dreg = jax.vmap(lambda kk: grad_one(kk, "dreg"))(keys)
        g_sgvb = jax.vmap(lambda kk: grad_one(kk, "sgvb"))(keys)
        m_dreg, m_sgvb = np.mean(g_dreg, axis=0), np.mean(g_sgvb, axis=0)
        se = np.sqrt(
            np.var(g_dreg, axis=0) / n_rep + np.var(g_sgvb, axis=0) / n_rep
        )
        assert np.all(np.abs(m_dreg - m_sgvb) < 5 * se + 1e-3), (
            m_dreg, m_sgvb, se,
        )
        # And DReG's per-component variance is no worse (here: much better).
        assert np.all(
            np.var(g_dreg, axis=0) <= np.var(g_sgvb, axis=0) + 1e-12
        )

    def test_k1_reduces_to_stl(self):
        # With K=1 the weights are 1 and the correction term vanishes:
        # dreg == grad of -(log p - log q_sg-phi) == STL.
        def cost(mean_q, logstd_q, method):
            q = make_q(mean_q, logstd_q, 1)
            obj = importance_weighted_objective(
                make_log_joint(0.0), {}, variational=q, axis=0
            )
            return getattr(obj, method)()

        g_dreg = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(0.9), jnp.float64(0.3), "dreg"
        )
        # STL via sgvb + use_path_derivative (reference mechanism).
        g_stl = jax.grad(cost, argnums=(0, 1))(
            jnp.float64(0.9), jnp.float64(0.3), "sgvb"
        )
        np.testing.assert_allclose(
            np.asarray(g_dreg), np.asarray(g_stl), rtol=1e-10, atol=1e-12
        )

    def test_raises_without_path_derivative(self):
        q = make_q(0.3, -0.2, 8, path_derivative=False)
        obj = importance_weighted_objective(
            make_log_joint(0.0), {}, variational=q, axis=0
        )
        with pytest.raises(ValueError, match="use_path_derivative"):
            obj.dreg()

    def test_raises_non_reparameterized(self):
        q = make_q(0.3, -0.2, 8, reparam=False)
        obj = importance_weighted_objective(
            make_log_joint(0.0), {}, variational=q, axis=0
        )
        with pytest.raises(ValueError, match="reparameterized"):
            obj.dreg()
