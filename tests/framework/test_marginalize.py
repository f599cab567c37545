"""zs.marginalize: exact enumeration of finite discrete latents.
Verified against the closed-form Mixture density, hand logsumexp for
two-site products, vector-valued supports, and HMC on the marginalized
joint. Beyond the reference (vae_ssl.py marginalizes by hand)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu as zs
from zhusuan_tpu import distributions as zd

LOGITS = jnp.log(jnp.asarray([0.2, 0.5, 0.3]))
MU = jnp.asarray([-3.0, 0.5, 4.0])
SD = jnp.asarray([0.6, 1.0, 2.0])


@zs.meta_bayesian_net()
def gmm_model():
    bn = zs.BayesianNet()
    z = bn.categorical("z", LOGITS)
    bn.normal("x", MU[z.tensor], std=SD[z.tensor])
    return bn


class TestExactness:
    def test_matches_mixture_density(self):
        lm = zs.marginalize(gmm_model(), {"z": 3})
        mix = zd.Mixture(LOGITS, zd.Normal(MU, std=SD))
        for x in np.linspace(-5.0, 7.0, 11):
            np.testing.assert_allclose(
                float(lm({"x": jnp.asarray(x)})),
                float(mix.log_prob(x)), rtol=1e-12,
            )

    def test_two_sites_product(self):
        la = jnp.log(jnp.asarray([0.4, 0.6]))
        lb = jnp.log(jnp.asarray([0.1, 0.2, 0.7]))
        shift = jnp.asarray([0.0, 2.0])
        scale = jnp.asarray([0.5, 1.0, 2.0])

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            a = bn.categorical("a", la)
            b = bn.categorical("b", lb)
            bn.normal("x", shift[a.tensor], std=scale[b.tensor])
            return bn

        lm = zs.marginalize(model(), {"a": 2, "b": 3})
        x = 1.1
        hand = np.logaddexp.reduce([
            float(la[i]) + float(lb[j])
            + stats.norm.logpdf(x, float(shift[i]), float(scale[j]))
            for i in range(2) for j in range(3)
        ])
        np.testing.assert_allclose(float(lm({"x": jnp.asarray(x)})),
                                   hand, rtol=1e-10)

    def test_vector_valued_support(self):
        """One-hot support array [K, K] drives an OnehotCategorical site."""
        onehots = jnp.eye(3)

        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            z = bn.onehot_categorical("z", LOGITS, dtype=jnp.float64)
            bn.normal("x", jnp.sum(z.tensor * MU, -1),
                      std=jnp.sum(z.tensor * SD, -1))
            return bn

        lm = zs.marginalize(model(), {"z": onehots})
        mix = zd.Mixture(LOGITS, zd.Normal(MU, std=SD))
        np.testing.assert_allclose(float(lm({"x": jnp.asarray(0.7)})),
                                   float(mix.log_prob(0.7)), rtol=1e-10)

    def test_raw_log_joint_callable(self):
        def lj(obs):
            z, x = obs["z"], obs["x"]
            return (jax.nn.log_softmax(LOGITS)[z]
                    + zd.Normal(MU[z], std=SD[z]).log_prob(x))

        lm = zs.marginalize(lj, {"z": 3})
        mix = zd.Mixture(LOGITS, zd.Normal(MU, std=SD))
        np.testing.assert_allclose(float(lm({"x": jnp.asarray(-1.0)})),
                                   float(mix.log_prob(-1.0)), rtol=1e-12)


class TestComposition:
    def test_chain_axes_broadcast(self):
        """Marginalized log-joint keeps the library chain convention:
        [C]-shaped continuous latents give [C]-shaped log density."""
        lm = zs.marginalize(gmm_model(), {"z": 3})
        xs = jnp.asarray(np.linspace(-2, 2, 16))
        lp = lm({"x": xs})
        assert lp.shape == (16,)
        mix = zd.Mixture(LOGITS, zd.Normal(MU, std=SD))
        np.testing.assert_allclose(np.asarray(lp),
                                   np.asarray(mix.log_prob(xs)),
                                   rtol=1e-10)

    @pytest.mark.slow
    def test_hmc_on_marginalized_joint(self):
        """HMC over the continuous variable of the enumerated model
        recovers the mixture moments (the marginalized-sampler use)."""
        lm = zs.marginalize(gmm_model(), {"z": 3})
        hmc = zs.HMC(step_size=0.5, n_leapfrogs=10, adapt_step_size=True)
        st = hmc.init({"x": jnp.zeros((256,))}, n_chain_dims=1)
        st = hmc.warmup_run(lm, {}, st, jax.random.PRNGKey(0),
                            n_warmup=400)
        st, out = hmc.run(lm, {}, st, jax.random.PRNGKey(1),
                          n_iters=1500)
        s = np.asarray(out["samples"]["x"]).ravel()
        w = np.asarray(jnp.exp(jax.nn.log_softmax(LOGITS)))
        mean = float(np.dot(w, np.asarray(MU)))
        var = float(np.dot(w, np.asarray(SD) ** 2 + np.asarray(MU) ** 2)
                    - mean ** 2)
        assert abs(s.mean() - mean) < 0.15
        assert abs(s.std() - np.sqrt(var)) < 0.15

    def test_gradients_flow(self):
        lm = zs.marginalize(gmm_model(), {"z": 3})
        g = jax.jit(jax.grad(lambda x: lm({"x": x})))(jnp.asarray(1.0))
        mix = zd.Mixture(LOGITS, zd.Normal(MU, std=SD))
        g_ref = jax.grad(lambda x: mix.log_prob(x))(jnp.asarray(1.0))
        np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-10)


class TestValidation:
    def test_enumerated_name_in_observed_raises(self):
        lm = zs.marginalize(gmm_model(), {"z": 3})
        with pytest.raises(ValueError, match="marginalized out"):
            lm({"z": jnp.asarray(0), "x": jnp.asarray(0.0)})

    def test_empty_supports_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            zs.marginalize(gmm_model(), {})

    def test_bad_support_size(self):
        with pytest.raises(ValueError, match=">= 1"):
            zs.marginalize(gmm_model(), {"z": 0})

    def test_bad_target(self):
        with pytest.raises(TypeError, match="MetaBayesianNet"):
            zs.marginalize(42, {"z": 3})
