"""FlowDistribution: flows as first-class distributions (beyond-reference;
distributions/flow.py). Verifies the full Distribution contract plus
end-to-end use as a BayesianNet variational family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import zhusuan_tpu as zs
from zhusuan_tpu.distributions import FlowDistribution, Normal
from zhusuan_tpu.distributions.multivariate import MultivariateNormalCholesky
from zhusuan_tpu.transform import (
    affine_coupling_flow,
    coupling_flow_pair,
    init_affine_coupling,
)


def _base(d=4, dtype=jnp.float32):
    return Normal(
        jnp.zeros(d, dtype), std=jnp.ones(d, dtype), group_ndims=1
    )


def _perturbed_params(d=4, n=3, key=0, dtype=jnp.float32):
    p = init_affine_coupling(jax.random.PRNGKey(key), n, d, hidden=8,
                             dtype=dtype)
    k = jax.random.PRNGKey(key + 1)
    return jax.tree.map(
        lambda x: x + 0.3 * jax.random.normal(
            jax.random.fold_in(k, x.size), x.shape, x.dtype
        ),
        p,
    )


class TestFlowDistributionContract:
    def test_shapes_and_dtype(self):
        params = _perturbed_params()
        dist = FlowDistribution.coupling(_base(4), params)
        assert dist.batch_shape == ()
        assert dist.value_shape == (4,)
        assert dist.dtype == np.float32
        assert dist.is_continuous and dist.is_reparameterized
        x = dist.sample(jax.random.PRNGKey(0), n_samples=7)
        assert x.shape == (7, 4) and x.dtype == jnp.float32
        lp = dist.log_prob(x)
        assert lp.shape == (7,)
        x1 = dist.sample(jax.random.PRNGKey(0))
        assert x1.shape == (4,)
        assert dist.log_prob(x1).shape == ()

    def test_identity_params_match_base(self):
        # Zero-initialized couplings are the identity: the flow IS the base.
        params = init_affine_coupling(jax.random.PRNGKey(0), 3, 4)
        base = _base(4)
        dist = FlowDistribution.coupling(base, params)
        x = base.sample(jax.random.PRNGKey(1), n_samples=9)
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)), np.asarray(base.log_prob(x)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(dist.sample(jax.random.PRNGKey(2), 5)),
            np.asarray(base.sample(jax.random.PRNGKey(2), 5)),
        )

    def test_log_prob_change_of_variables(self):
        # log p(x) == N(z0; 0, I) + inverse log-det, computed by hand.
        params = _perturbed_params()
        dist = FlowDistribution.coupling(_base(4), params)
        x = jax.random.normal(jax.random.PRNGKey(3), (6, 4))
        z0, delta = affine_coupling_flow(x, jnp.zeros(6), params,
                                         inverse=True)
        expect = jnp.sum(
            jnp.asarray(stats.norm.logpdf(np.asarray(z0))), axis=-1
        ) + delta
        np.testing.assert_allclose(
            np.asarray(dist.log_prob(x)), np.asarray(expect), rtol=1e-5
        )

    def test_log_prob_integrates_to_one_2d(self):
        # Grid-integrate exp(log_prob) over a wide box in 2-D.
        params = _perturbed_params(d=2, n=2, key=7)
        dist = FlowDistribution.coupling(_base(2), params)
        grid = jnp.linspace(-24.0, 24.0, 601)  # round-5 thin: measured
        # |total-1| 3e-5 at both 601 and 1201 points — h is not the
        # limiting error at this box size.
        xx, yy = jnp.meshgrid(grid, grid)
        pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        dens = jnp.exp(dist.log_prob(pts))
        h = float(grid[1] - grid[0])
        total = float(jnp.sum(dens) * h * h)
        assert abs(total - 1.0) < 1e-2, total

    def test_mvn_base(self):
        chol = jnp.asarray([[1.0, 0.0], [0.5, 0.8]])
        base = MultivariateNormalCholesky(jnp.zeros(2), chol)
        params = _perturbed_params(d=2, n=2, key=9)
        dist = FlowDistribution.coupling(base, params)
        x = dist.sample(jax.random.PRNGKey(0), n_samples=5)
        assert dist.log_prob(x).shape == (5,)

    def test_group_ndims(self):
        base = Normal(jnp.zeros((3, 4)), std=jnp.ones((3, 4)),
                      group_ndims=1)
        params = _perturbed_params()
        dist = FlowDistribution.coupling(base, params, group_ndims=1)
        assert dist.batch_shape == (3,)
        x = dist.sample(jax.random.PRNGKey(0), n_samples=5)
        assert x.shape == (5, 3, 4)
        assert dist.log_prob(x).shape == (5,)  # batch axis grouped

    def test_sampling_statistics_match_density(self):
        # Empirical mean/cov of flow samples vs quadrature moments of the
        # flow density (2-D) — ties _sample and _log_prob together.
        params = _perturbed_params(d=2, n=3, key=11)
        dist = FlowDistribution.coupling(_base(2), params)
        x = dist.sample(jax.random.PRNGKey(4), n_samples=200_000)
        grid = jnp.linspace(-8.0, 8.0, 401)
        xx, yy = jnp.meshgrid(grid, grid)
        pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        w = jnp.exp(dist.log_prob(pts))
        h = float(grid[1] - grid[0])
        mean_q = np.asarray(jnp.sum(pts * w[:, None], axis=0) * h * h)
        mean_s = np.asarray(jnp.mean(x, axis=0))
        np.testing.assert_allclose(mean_s, mean_q, atol=0.02)


class TestFlowDistributionErrors:
    def test_rejects_non_distribution(self):
        with pytest.raises(TypeError, match="Distribution"):
            FlowDistribution(lambda: None, lambda a, b: (a, b))

    def test_rejects_discrete_base(self):
        from zhusuan_tpu.distributions import Bernoulli

        with pytest.raises(ValueError, match="continuous"):
            FlowDistribution(
                Bernoulli(jnp.zeros(4), group_ndims=1),
                lambda a, b: (a, b),
            )

    def test_rejects_scalar_base(self):
        with pytest.raises(ValueError, match="at least one sample axis"):
            FlowDistribution(Normal(0.0, std=1.0), lambda a, b: (a, b))

    def test_rejects_unreduced_base(self):
        # group_ndims=0 Normal: log_prob keeps the last axis -> contract
        # violation caught at construction time.
        with pytest.raises(ValueError, match="reduce exactly the last"):
            FlowDistribution(
                Normal(jnp.zeros(4), std=jnp.ones(4)),
                lambda a, b: (a, b),
            )

    def test_sample_only_log_prob_raises(self):
        from zhusuan_tpu.transform import (
            init_planar_flow, planar_normalizing_flow,
        )

        pp = init_planar_flow(jax.random.PRNGKey(0), 2, 4)
        dist = FlowDistribution(
            _base(4), lambda s, lp: planar_normalizing_flow(s, lp, pp)
        )
        x = dist.sample(jax.random.PRNGKey(1), n_samples=3)
        assert x.shape == (3, 4)
        with pytest.raises(NotImplementedError, match="sample-only"):
            dist.log_prob(x)


class TestFlowVariational:
    def test_elbo_sgvb_fits_correlated_target(self):
        # FlowDistribution as a BayesianNet variational family through the
        # standard elbo().sgvb() path — the reason it is a Distribution.
        import optax

        from zhusuan_tpu.framework import BayesianNet
        from zhusuan_tpu.variational import elbo

        cov = jnp.asarray([[1.0, 0.8], [0.8, 1.0]])
        prec = jnp.linalg.inv(cov)
        logdet = jnp.linalg.slogdet(cov)[1]

        def log_joint(obs):
            z = obs["z"]
            quad = jnp.einsum("...i,ij,...j->...", z, prec, z)
            return -0.5 * (quad + logdet + 2 * jnp.log(2 * jnp.pi))

        init = init_affine_coupling(jax.random.PRNGKey(0), 4, 2, hidden=32)

        def cost(params, key):
            q = BayesianNet(key=key)
            q.stochastic(
                "z",
                FlowDistribution.coupling(_base(2), params),
                n_samples=256,
            )
            return elbo(log_joint, {}, variational=q, axis=0).sgvb()

        opt = optax.adam(1e-2)
        ostate = opt.init(init)

        @jax.jit
        def step(params, ostate, key):
            l, g = jax.value_and_grad(cost)(params, key)
            up, ostate = opt.update(g, ostate)
            return optax.apply_updates(params, up), ostate, l

        params, key = init, jax.random.PRNGKey(1)
        kl0 = float(cost(params, key))  # == KL(q||p) up to MC noise
        for _ in range(400):
            key, sub = jax.random.split(key)
            params, ostate, kl = step(params, ostate, sub)
        assert kl0 > 0.3
        assert float(kl) < 0.05, (kl0, float(kl))

    def test_hmc_prior_with_flow(self):
        # FlowDistribution as a *model* prior scored inside an HMC
        # log-joint: identity-init flow prior == Gaussian prior, so chain
        # statistics must match the standard normal.
        params = init_affine_coupling(jax.random.PRNGKey(0), 2, 3)
        dist = FlowDistribution.coupling(_base(3), params)

        def log_joint(obs):
            return dist.log_prob(obs["z"])

        # Round-5 thin: measured |mean| 0.011 / |std-1| 0.004 at
        # 300/150/8 vs 0.1 bounds (0.009/0.006 at 600/300/10).
        hmc = zs.HMC(step_size=0.2, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init({"z": jnp.zeros((32, 3))}, n_chain_dims=1)
        state, out = hmc.run(
            log_joint, {}, state, jax.random.PRNGKey(1), n_iters=300,
            n_adapt=150,
        )
        s = out["samples"]["z"][150:].reshape(-1, 3)
        assert abs(float(jnp.mean(s))) < 0.1
        assert abs(float(jnp.std(s)) - 1.0) < 0.1


class TestBatchedBaseRank1:
    def test_rank1_given_broadcasts_over_batch(self):
        # Regression: with a batched base, a rank-1 `given` must broadcast
        # over batch_shape and return a [batch]-shaped log_prob — not
        # silently return batch element 0's density.
        base = Normal(
            jnp.stack([jnp.zeros(4), jnp.ones(4) * 2.0]),  # batch (2,)
            std=jnp.ones((2, 4)), group_ndims=1,
        )
        params = init_affine_coupling(jax.random.PRNGKey(0), 2, 4)
        dist = FlowDistribution.coupling(base, params)
        assert dist.batch_shape == (2,)
        x = jnp.asarray([0.1, -0.2, 0.3, 0.4])
        lp = dist.log_prob(x)
        assert lp.shape == (2,)
        # Identity-init flow == base; compare against the base per batch.
        expect = base.log_prob(jnp.broadcast_to(x, (2, 4)))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(expect),
                                   rtol=1e-6)
        assert not np.allclose(float(lp[0]), float(lp[1]))
