"""Block-wise Gibbs composition (beyond-reference; mcmc/gibbs.py).

The statistical checks target CORRELATED blocks — the regime where a
broken conditional (stale cache, wrong observed merge) shifts the joint
visibly — plus a Geweke joint-distribution test of the whole compound
kernel via the raw-transition interface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import (
    HMC,
    NUTS,
    Gibbs,
    MALA,
    RandomWalkMetropolis,
    SliceSampler,
)
from zhusuan_tpu.testing import geweke_test

RHO = 0.8


def _corr_gauss(obs):
    """Bivariate N(0, [[1, rho], [rho, 1]]) split across two latents."""
    a, b = obs["a"], obs["b"]
    s = 1.0 - RHO * RHO
    return -0.5 * (a * a - 2.0 * RHO * a * b + b * b) / s


class TestGibbsStatistics:
    @pytest.mark.parametrize(
        "make",
        [
            lambda: Gibbs([
                (SliceSampler(width=2.0), ["a"]),
                (SliceSampler(width=2.0), ["b"]),
            ]),
            lambda: Gibbs([
                (HMC(step_size=0.3, n_leapfrogs=5, adapt_step_size=True),
                 ["a"]),
                (RandomWalkMetropolis(step_size=0.8, adapt_step_size=True),
                 ["b"]),
            ]),
            lambda: Gibbs([
                (MALA(step_size=0.4, adapt_step_size=True), ["a"]),
                (SliceSampler(width=2.0), ["b"]),
            ]),
        ],
        ids=["slice+slice", "hmc+rwm", "mala+slice"],
    )
    def test_correlated_blocks_joint_moments(self, make):
        sampler = make()
        state = sampler.init(
            {"a": jnp.zeros(256), "b": jnp.zeros(256)}, n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(
                _corr_gauss, {}, s, k, n_iters=2500, n_adapt=1000
            )
        )(state, jax.random.PRNGKey(0))
        a = np.asarray(out["samples"]["a"][1000:]).ravel()
        b = np.asarray(out["samples"]["b"][1000:]).ravel()
        assert abs(a.mean()) < 0.08 and abs(b.mean()) < 0.08
        assert abs(a.std() - 1.0) < 0.08, a.std()
        assert abs(b.std() - 1.0) < 0.08, b.std()
        got_rho = float(np.corrcoef(a, b)[0, 1])
        assert abs(got_rho - RHO) < 0.05, got_rho

    def test_hierarchical_model_with_observed(self):
        # mu ~ N(0, 3); tau-like scale fixed; y | mu ~ N(mu, 0.5), 4 obs.
        # Gibbs over {mu} x {z} where z is an auxiliary latent correlated
        # with mu through the likelihood of y - z.
        y = jnp.asarray([1.0, 1.4, 0.6, 1.2])

        def log_joint(obs):
            mu, z = obs["mu"], obs["z"]
            lp = -0.5 * (mu / 3.0) ** 2 - 0.5 * (z / 0.7) ** 2
            resid = obs["y"] - (mu + z)[..., None]
            return lp - 0.5 * jnp.sum((resid / 0.5) ** 2, axis=-1)

        sampler = Gibbs([
            (SliceSampler(width=2.0), ["mu"]),
            (SliceSampler(width=2.0), ["z"]),
        ])
        state = sampler.init(
            {"mu": jnp.zeros(256), "z": jnp.zeros(256)}, n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(
                log_joint, {"y": y}, s, k, n_iters=2500
            )
        )(state, jax.random.PRNGKey(1))
        # Closed form: theta = mu + z has prior var 9 + 0.49; posterior of
        # theta given ybar over 4 obs with noise var 0.25.
        prior_var = 9.0 + 0.49
        post_var = 1.0 / (1.0 / prior_var + 4.0 / 0.25)
        post_mean = float(y.sum() / 0.25 * post_var)
        theta = (
            np.asarray(out["samples"]["mu"][1000:])
            + np.asarray(out["samples"]["z"][1000:])
        ).ravel()
        assert abs(theta.mean() - post_mean) < 0.03, (theta.mean(), post_mean)
        assert abs(theta.std() - np.sqrt(post_var)) < 0.03

    def test_geweke_compound_kernel(self):
        # Joint-distribution validation of the WHOLE compound transition.
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            a = bn.normal("a", 0.0, std=1.0)
            b = bn.normal("b", a.tensor * 0.8, std=0.6)
            bn.normal("y", b.tensor[..., None] * jnp.ones(2), std=0.7,
                      group_ndims=1)
            return bn

        kernel = Gibbs([
            (SliceSampler(width=2.0), ["a"]),
            (RandomWalkMetropolis(step_size=0.7), ["b"]),
        ])

        def transition(meta_bn, observed, latent, key):
            st = kernel.init(latent, n_chain_dims=1)
            st, _ = kernel.sample(meta_bn, observed, st, key)
            return st.q

        res = geweke_test(
            model(), transition, latent=["a", "b"], data=["y"],
            key=jax.random.PRNGKey(42), n_iters=2500, n_chains=64,
            n_mc=100_000,
        )
        assert res.max_abs_z < 5.0, res.z_scores


class TestGibbsContract:
    def test_nuts_component_and_multi_d_blocks(self):
        def log_joint(obs):
            z, w = obs["z"], obs["w"]
            return (
                -0.5 * jnp.sum(z * z, axis=-1)
                - 0.5 * jnp.sum(((w - 1.0) / 2.0) ** 2, axis=-1)
            )

        sampler = Gibbs([
            (NUTS(step_size=0.5, max_tree_depth=4), ["z"]),
            (SliceSampler(width=3.0), ["w"]),
        ])
        state = sampler.init(
            {"z": jnp.zeros((64, 3)), "w": jnp.zeros((64, 2))},
            n_chain_dims=1,
        )
        state, out = jax.jit(
            lambda s, k: sampler.run(log_joint, {}, s, k, n_iters=800)
        )(state, jax.random.PRNGKey(2))
        z = np.asarray(out["samples"]["z"][300:]).reshape(-1, 3)
        w = np.asarray(out["samples"]["w"][300:]).reshape(-1, 2)
        assert abs(z.std() - 1.0) < 0.1
        assert abs(w.mean() - 1.0) < 0.15 and abs(w.std() - 2.0) < 0.2

    def test_thinning_matches_sliced_full_run(self):
        sampler = Gibbs([
            (SliceSampler(width=2.0), ["a"]),
            (RandomWalkMetropolis(step_size=0.5), ["b"]),
        ])
        s0 = sampler.init(
            {"a": jnp.zeros(8), "b": jnp.zeros(8)}, n_chain_dims=1
        )
        key = jax.random.PRNGKey(7)
        full_state, full = sampler.run(_corr_gauss, {}, s0, key, n_iters=12)
        thin_state, thin = sampler.run(
            _corr_gauss, {}, s0, key, n_iters=12, thinning=5
        )
        np.testing.assert_array_equal(
            np.asarray(thin["samples"]["a"]),
            np.asarray(full["samples"]["a"][4::5]),
        )
        np.testing.assert_array_equal(
            np.asarray(thin_state.q["b"]), np.asarray(full_state.q["b"])
        )

    def test_log_prob_is_full_joint(self):
        sampler = Gibbs([
            (SliceSampler(width=2.0), ["a"]),
            (SliceSampler(width=2.0), ["b"]),
        ])
        s0 = sampler.init(
            {"a": jnp.zeros(4), "b": jnp.zeros(4)}, n_chain_dims=1
        )
        s1, info = sampler.sample(_corr_gauss, {}, s0, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(info.log_prob),
            np.asarray(_corr_gauss(s1.q)),
            rtol=1e-6,
        )

    def test_adapt_gate_respects_component_switch(self):
        # A component constructed WITHOUT adaptation must keep its fixed
        # tuning under run(n_adapt>0); one constructed WITH it adapts.
        fixed = SliceSampler(width=7.0)
        tuned = RandomWalkMetropolis(step_size=0.5, adapt_step_size=True)
        sampler = Gibbs([(fixed, ["a"]), (tuned, ["b"])])
        s0 = sampler.init(
            {"a": jnp.zeros(32), "b": jnp.zeros(32)}, n_chain_dims=1
        )
        s1, _ = sampler.run(
            _corr_gauss, {}, s0, jax.random.PRNGKey(0), n_iters=60,
            n_adapt=60, collect=False,
        )
        slice_state, rwm_state = s1.sub_states
        np.testing.assert_array_equal(np.asarray(slice_state.width), 7.0)
        assert float(rwm_state.step_size) != 0.5  # dual averaging ran

    def test_validation_errors(self):
        slc = SliceSampler()
        with pytest.raises(ValueError, match="at least one"):
            Gibbs([])
        with pytest.raises(ValueError, match="disjoint"):
            Gibbs([(slc, ["a"]), (slc, ["a", "b"])])
        with pytest.raises(ValueError, match=">= 1 latent"):
            Gibbs([(slc, [])])
        with pytest.raises(TypeError, match="Unsupported"):
            Gibbs([(object(), ["a"])])
        g = Gibbs([(slc, ["a"])])
        with pytest.raises(ValueError, match="cover"):
            g.init({"a": jnp.zeros(2), "b": jnp.zeros(2)}, n_chain_dims=1)
        with pytest.raises(ValueError, match="cover"):
            g.init({}, n_chain_dims=1)
