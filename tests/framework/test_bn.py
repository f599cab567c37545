"""Framework tests: StochasticTensor, BayesianNet, MetaBayesianNet.

Port of the contract in reference ``tests/framework/test_base.py`` (node
query API, observation checks, log_joint) and ``test_utils.py`` (Context
stack), rebuilt for the explicit-key functional API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.framework import BayesianNet, MetaBayesianNet, meta_bayesian_net

KEY = jax.random.PRNGKey(0)


class TestStochasticTensor:
    def test_sample_and_cache(self):
        bn = BayesianNet(key=KEY)
        z = bn.normal("z", jnp.zeros(3), std=jnp.ones(3))
        t1 = z.tensor
        t2 = z.tensor
        assert t1 is t2  # cached, sampled once
        assert t1.shape == (3,)
        assert not z.is_observed

    def test_observed(self):
        obs = jnp.asarray([1.0, 2.0, 3.0])
        bn = BayesianNet(observed={"z": obs})
        z = bn.normal("z", jnp.zeros(3), std=jnp.ones(3))
        assert z.is_observed
        np.testing.assert_allclose(np.asarray(z.tensor), np.asarray(obs))

    def test_observation_dtype_mismatch(self):
        bn = BayesianNet(observed={"z": jnp.zeros(3, jnp.int32)})
        with pytest.raises(ValueError, match="dtype"):
            bn.normal("z", jnp.zeros(3), std=jnp.ones(3))

    def test_observation_shape_mismatch(self):
        bn = BayesianNet(observed={"z": jnp.zeros((4,))})
        with pytest.raises(ValueError, match="broadcast"):
            bn.normal("z", jnp.zeros(3), std=jnp.ones(3))

    def test_arithmetic(self):
        bn = BayesianNet(observed={"z": jnp.asarray([1.0, 2.0])})
        z = bn.normal("z", jnp.zeros(2), std=jnp.ones(2))
        np.testing.assert_allclose(np.asarray(z + 1.0), [2.0, 3.0])
        np.testing.assert_allclose(np.asarray(2.0 * z), [2.0, 4.0])
        np.testing.assert_allclose(np.asarray(-z), [-1.0, -2.0])
        np.testing.assert_allclose(np.asarray(z[0]), 1.0)
        np.testing.assert_allclose(np.asarray(jnp.sum(jnp.asarray(z))), 3.0)
        np.testing.assert_allclose(
            np.asarray(jnp.exp(z.tensor)), np.exp([1.0, 2.0])
        )

    def test_cond_log_p(self):
        obs = jnp.asarray(0.5)
        bn = BayesianNet(observed={"z": obs})
        z = bn.normal("z", 0.0, std=1.0)
        expected = -0.5 * np.log(2 * np.pi) - 0.5 * 0.25
        np.testing.assert_allclose(float(z.cond_log_p), expected, rtol=1e-6)

    def test_n_samples(self):
        bn = BayesianNet(key=KEY)
        z = bn.normal("z", jnp.zeros(3), std=jnp.ones(3), n_samples=5)
        assert z.tensor.shape == (5, 3)


class TestBayesianNet:
    def test_duplicate_names(self):
        bn = BayesianNet(key=KEY)
        bn.normal("z", 0.0, std=1.0)
        with pytest.raises(ValueError, match="unique"):
            bn.normal("z", 0.0, std=1.0)
        with pytest.raises(ValueError, match="unique"):
            bn.deterministic("z", jnp.zeros(2))

    def test_missing_key(self):
        bn = BayesianNet()
        z = bn.normal("z", 0.0, std=1.0)
        with pytest.raises(ValueError, match="PRNG key"):
            _ = z.tensor

    def test_get_and_query(self):
        bn = BayesianNet(key=KEY)
        z = bn.normal("z", 0.0, std=1.0)
        h = bn.deterministic("h", jnp.ones(2))
        assert bn.get("z") is z
        assert bn["z"] is z
        got = bn.get(["z", "h"])
        assert got[0] is z
        assert "z" in bn and "h" in bn
        with pytest.raises(ValueError, match="isn't a node"):
            bn.get("nope")
        with pytest.raises(ValueError, match="deterministic"):
            bn.cond_log_prob("h")
        with pytest.raises(TypeError):
            bn.get(3)
        with pytest.raises(TypeError):
            bn["z"] = z

    def test_log_joint(self):
        obs_z, obs_x = jnp.asarray(0.3), jnp.asarray(1.2)
        bn = BayesianNet(observed={"z": obs_z, "x": obs_x})
        z = bn.normal("z", 0.0, std=1.0)
        x = bn.normal("x", z, std=1.0)
        lj = bn.log_joint()
        expected = float(z.cond_log_p) + float(x.cond_log_p)
        np.testing.assert_allclose(float(lj), expected, rtol=1e-6)

    def test_deterministic_key_derivation(self):
        # Same key + same names -> identical samples regardless of order.
        bn1 = BayesianNet(key=KEY)
        a1 = bn1.normal("a", 0.0, std=1.0).tensor
        b1 = bn1.normal("b", 0.0, std=1.0).tensor
        bn2 = BayesianNet(key=KEY)
        b2 = bn2.normal("b", 0.0, std=1.0).tensor
        a2 = bn2.normal("a", 0.0, std=1.0).tensor
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))
        assert not np.allclose(np.asarray(a1), np.asarray(b1))


class TestMetaBayesianNet:
    def _model(self):
        @meta_bayesian_net()
        def build(n):
            bn = BayesianNet()
            z = bn.normal("z", jnp.zeros(n), std=jnp.ones(n))
            bn.normal("x", z.tensor * 2.0, std=1.0)
            return bn

        return build

    def test_observe(self):
        model = self._model()(3)
        assert isinstance(model, MetaBayesianNet)
        bn = model.observe(KEY)
        assert not bn["z"].is_observed
        assert bn["x"].tensor.shape == (3,)

        obs = jnp.asarray([1.0, 1.0, 1.0])
        bn2 = model.observe(KEY, z=obs)
        assert bn2["z"].is_observed
        np.testing.assert_allclose(
            np.asarray(bn2["x"].dist.mean), 2 * np.asarray(obs)
        )

    def test_observe_fully_without_key(self):
        model = self._model()(2)
        bn = model.observe(z=jnp.zeros(2), x=jnp.zeros(2))
        lj = bn.log_joint()
        assert lj.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(lj)))

    def test_log_joint_override(self):
        model = self._model()(2)
        model.log_joint = lambda bn: 10.0 * bn.cond_log_prob("z")
        bn = model.observe(z=jnp.zeros(2), x=jnp.zeros(2))
        np.testing.assert_allclose(
            np.asarray(bn.log_joint()),
            10.0 * np.asarray(bn.cond_log_prob("z")),
        )

    def test_builder_must_return_bn(self):
        @meta_bayesian_net()
        def bad():
            return 42

        with pytest.raises(TypeError, match="BayesianNet"):
            bad().observe()

    def test_bare_decorator(self):
        @meta_bayesian_net
        def build():
            bn = BayesianNet()
            bn.normal("z", 0.0, std=1.0)
            return bn

        bn = build().observe(KEY)
        assert "z" in bn

    def test_under_jit_and_grad(self):
        @meta_bayesian_net()
        def build(mu):
            bn = BayesianNet()
            bn.normal("z", mu, std=1.0)
            return bn

        @jax.jit
        def log_joint(mu, z):
            return build(mu).observe(z=z).log_joint()

        g = jax.grad(log_joint)(0.5, jnp.asarray(1.5))
        np.testing.assert_allclose(float(g), 1.0, rtol=1e-6)

    def test_under_vmap(self):
        @meta_bayesian_net()
        def build():
            bn = BayesianNet()
            bn.normal("z", 0.0, std=1.0)
            return bn

        def sample_one(key):
            return build().observe(key)["z"].tensor

        keys = jax.random.split(KEY, 100)
        samples = jax.vmap(sample_one)(keys)
        assert samples.shape == (100,)
        # Distinct keys give distinct samples.
        assert len(np.unique(np.asarray(samples))) == 100


class TestCompatQueryAPI:
    def test_query_outputs_and_log_prob(self):
        bn = BayesianNet(observed={"z": jnp.asarray([0.5, 1.0])})
        bn.normal("z", jnp.zeros(2), std=jnp.ones(2))
        bn.deterministic("h", jnp.ones(3))

        out = bn.outputs("z")
        np.testing.assert_allclose(np.asarray(out), [0.5, 1.0])
        np.testing.assert_allclose(np.asarray(bn.outputs("h")), np.ones(3))

        lp = bn.local_log_prob("z")
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(bn.cond_log_prob("z"))
        )

        (val, logp) = bn.query("z", outputs=True, local_log_prob=True)
        np.testing.assert_allclose(np.asarray(val), [0.5, 1.0])

        pairs = bn.query(["z"], outputs=True, local_log_prob=True)
        assert len(pairs) == 1 and len(pairs[0]) == 2

        with pytest.raises(ValueError, match="No query options"):
            bn.query("z")


class TestCorrelatedTarget:
    def test_hmc_correlated_gaussian(self):
        # Correlated 2-D Gaussian (rho = 0.9): diagonal mass adaptation
        # cannot whiten it, but HMC must still recover the covariance.
        rho = 0.9
        cov = np.array([[1.0, rho], [rho, 1.0]])
        prec = np.linalg.inv(cov)
        prec_j = jnp.asarray(prec)

        def lj(obs):
            x = obs["x"]
            return -0.5 * jnp.einsum("ci,ij,cj->c", x, prec_j, x)

        hmc = zs.HMC(step_size=0.5, n_leapfrogs=10, adapt_step_size=True)
        state = hmc.init({"x": jnp.zeros((500, 2), jnp.float64)},
                         log_joint=lj)
        state, _ = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 300, n_adapt=200,
                                 collect=False)
        )(state, jax.random.PRNGKey(0))
        _, out = jax.jit(lambda s, k: hmc.run(lj, {}, s, k, 500))(
            state, jax.random.PRNGKey(1)
        )
        x = np.asarray(out["samples"]["x"]).reshape(-1, 2)
        emp_cov = np.cov(x.T)
        np.testing.assert_allclose(emp_cov, cov, atol=0.08)


class TestContextStack:
    # Parity: reference tests/framework/test_utils.py:15-45 (Context).
    def test_push_pop_and_get(self):
        from zhusuan_tpu.framework import Context, Local

        with pytest.raises(RuntimeError):
            Local.get_context()
        a, b = Local(), Local()
        with a:
            assert Local.get_context() is a
            with b:
                assert Local.get_context() is b
            assert Local.get_context() is a
        with pytest.raises(RuntimeError):
            Local.get_context()
        assert Local.try_get_context() is None

    def test_subclass_stacks_independent(self):
        from zhusuan_tpu.framework import Context, Local

        class Other(Context):
            pass

        o = Other()
        with o:
            assert Other.get_context() is o
            with pytest.raises(RuntimeError):
                Local.get_context()
