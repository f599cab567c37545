"""Bijectors for constrained-latent sampling (beyond-reference;
bijectors.py). Posterior checks compare sampler output to dense
quadrature over the constrained coordinate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.bijectors import (
    Exp,
    Sigmoid,
    Softplus,
    transform_log_joint,
)


class TestBijectorMaps:
    @pytest.mark.parametrize("bij,lo", [
        (Exp(), 0.0), (Softplus(), 0.0), (Sigmoid(), 0.0),
        (Sigmoid(-2.0, 3.0), -2.0),
    ])
    def test_roundtrip_and_log_det(self, bij, lo):
        y = jnp.linspace(-4.0, 4.0, 41, dtype=jnp.float64)
        x = bij.forward(y)
        np.testing.assert_allclose(np.asarray(bij.inverse(x)),
                                   np.asarray(y), rtol=1e-8, atol=1e-8)
        # log-det vs autodiff derivative.
        d = jax.vmap(jax.grad(lambda t: bij.forward(t)))(y)
        np.testing.assert_allclose(
            np.asarray(bij.forward_log_det(y)),
            np.asarray(jnp.log(d)), rtol=1e-6, atol=1e-12,
        )

    def test_sigmoid_validation(self):
        with pytest.raises(ValueError, match="hi > lo"):
            Sigmoid(1.0, 1.0)


def _quadrature_posterior(log_post_1d, lo, hi, n=40001):
    grid = np.linspace(lo, hi, n)
    lp = np.asarray(jax.vmap(log_post_1d)(jnp.asarray(grid)))
    w = np.exp(lp - lp.max())
    w /= w.sum()
    mean = float((grid * w).sum())
    std = float(np.sqrt(((grid - mean) ** 2 * w).sum()))
    return mean, std


class TestConstrainedHMC:
    def test_half_cauchy_scale_posterior(self):
        # sigma ~ HalfCauchy(1), x_i ~ N(0, sigma): HMC over softplus^-1
        # coordinates must match quadrature over sigma.
        rng = np.random.RandomState(0)
        x = jnp.asarray(0.8 * rng.randn(50))

        def log_joint(obs):
            sigma = obs["sigma"]
            lp = zs.distributions.HalfCauchy(jnp.float64(1.0)).log_prob(
                sigma)
            lp += jnp.sum(
                -0.5 * (x / sigma[..., None]) ** 2
                - jnp.log(sigma)[..., None]
                - 0.5 * jnp.log(2 * jnp.pi),
                axis=-1,
            )
            return lp

        mean_q, std_q = _quadrature_posterior(
            lambda s: log_joint({"sigma": s}), 1e-3, 5.0
        )

        ulj, to_u, to_c = transform_log_joint(
            log_joint, {"sigma": Softplus()}
        )
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=10, adapt_step_size=True)
        state = hmc.init(
            to_u({"sigma": jnp.ones(128, jnp.float64)}), n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, 2000, n_adapt=1000)
        )(state, jax.random.PRNGKey(1))
        sigma = np.asarray(
            to_c({"sigma": out["samples"]["sigma"][1000:]})["sigma"]
        ).ravel()
        assert sigma.min() > 0
        assert abs(sigma.mean() - mean_q) < 0.03, (sigma.mean(), mean_q)
        assert abs(sigma.std() - std_q) < 0.03, (sigma.std(), std_q)

    def test_interval_latent_with_mala(self):
        # p ~ Beta-like posterior on (0, 1) via the Sigmoid bijector.
        k_heads, n_tot = 7, 20

        def log_joint(obs):
            p = obs["p"]
            # Beta(2, 2) prior + binomial likelihood (unnormalized).
            return (
                jnp.log(p) + jnp.log1p(-p)
                + k_heads * jnp.log(p) + (n_tot - k_heads) * jnp.log1p(-p)
            )

        mean_q, std_q = _quadrature_posterior(
            lambda p: log_joint({"p": p}), 1e-4, 1 - 1e-4
        )
        ulj, to_u, to_c = transform_log_joint(log_joint, {"p": Sigmoid()})
        mala = zs.MALA(step_size=0.3, adapt_step_size=True)
        state = mala.init(
            to_u({"p": 0.5 * jnp.ones(256, jnp.float64)}), n_chain_dims=1
        )
        state, out = jax.jit(
            lambda s, k: mala.run(ulj, {}, s, k, 2500, n_adapt=1200)
        )(state, jax.random.PRNGKey(2))
        p = np.asarray(
            to_c({"p": out["samples"]["p"][1200:]})["p"]
        ).ravel()
        assert p.min() > 0 and p.max() < 1
        assert abs(p.mean() - mean_q) < 0.02, (p.mean(), mean_q)
        assert abs(p.std() - std_q) < 0.02

    def test_mixed_constrained_and_free_latents(self):
        # Free w plus positive sigma in one model; both recovered.
        def log_joint(obs):
            w, sigma = obs["w"], obs["sigma"]
            lp = -0.5 * w**2
            lp += zs.distributions.Exponential(jnp.float64(1.0)).log_prob(
                sigma)
            lp += -0.5 * ((1.5 - w) / sigma) ** 2 - jnp.log(sigma)
            return lp

        ulj, to_u, to_c = transform_log_joint(log_joint,
                                              {"sigma": Exp()})
        hmc = zs.HMC(step_size=0.1, n_leapfrogs=8, adapt_step_size=True)
        init = to_u({"w": jnp.zeros(128, jnp.float64),
                     "sigma": jnp.ones(128, jnp.float64)})
        state = hmc.init(init, n_chain_dims=1)
        state, out = jax.jit(
            lambda s, k: hmc.run(ulj, {}, s, k, 2000, n_adapt=1000)
        )(state, jax.random.PRNGKey(3))
        cons = to_c({k: v[1000:] for k, v in out["samples"].items()})
        assert np.asarray(cons["sigma"]).min() > 0
        assert 0.2 < float(np.mean(np.asarray(cons["w"]))) < 1.5
        assert np.all(np.isfinite(np.asarray(cons["sigma"])))

    def test_meta_bn_accepted(self):
        @zs.meta_bayesian_net()
        def model():
            bn = zs.BayesianNet()
            bn.exponential("s", jnp.float64(2.0), n_samples=None)
            return bn

        ulj, to_u, to_c = transform_log_joint(model(), {"s": Exp()})
        y = to_u({"s": jnp.asarray([0.5, 1.0])})["s"]
        lp = ulj({"s": y})
        assert np.all(np.isfinite(np.asarray(lp)))
