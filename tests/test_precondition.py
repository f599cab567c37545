"""Tests for dense preconditioning via whitening
(zhusuan_tpu/mcmc/precondition.py — beyond-reference feature)."""

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc import fit_dense_preconditioner, whiten_log_joint


def _corr_gaussian(d=8, rho=0.95):
    """A strongly correlated Gaussian: equicorrelation rho, unit vars."""
    cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    prec = np.linalg.inv(cov)
    prec_j = jnp.asarray(prec)

    def lj(obs):
        z = obs["z"]
        return -0.5 * jnp.einsum("...i,ij,...j->...", z, prec_j, z)

    return lj, cov


class TestFit:
    def test_recovers_covariance_cholesky(self):
        rng = np.random.RandomState(0)
        cov = np.asarray([[2.0, 1.2], [1.2, 1.0]])
        x = rng.multivariate_normal(np.zeros(2), cov, size=20000)
        chol = np.asarray(fit_dense_preconditioner(jnp.asarray(x)))
        np.testing.assert_allclose(chol @ chol.T, cov, rtol=0.05, atol=0.02)

    def test_shrinkage_regularizes_tiny_samples(self):
        # 3 draws of a 5-dim latent: raw covariance is singular; the
        # shrunk one must still be Cholesky-decomposable (finite).
        x = jnp.asarray(np.random.RandomState(1).randn(3, 5))
        chol = np.asarray(fit_dense_preconditioner(x, shrinkage=5.0))
        assert np.all(np.isfinite(chol))
        assert np.all(np.diag(chol) > 0)


class TestWhiten:
    def test_maps_are_inverse(self):
        chol = jnp.asarray(np.linalg.cholesky(
            np.asarray([[2.0, 0.5], [0.5, 1.0]])
        ))
        _, to_w, from_w = whiten_log_joint(lambda o: 0.0, "z", chol)
        q = jnp.asarray(np.random.RandomState(2).randn(7, 2))
        np.testing.assert_allclose(
            np.asarray(from_w(to_w(q))), np.asarray(q), rtol=1e-6,
            atol=1e-8,
        )

    def test_accepts_meta_bayesian_net(self):
        import zhusuan_tpu as zst

        @zst.meta_bayesian_net()
        def model():
            bn = zst.BayesianNet()
            bn.normal("z", jnp.zeros(2), std=jnp.asarray([1.0, 2.0]),
                      group_ndims=1)
            return bn

        chol = jnp.asarray(np.diag([1.0, 2.0]))
        wlj, to_w, _ = whiten_log_joint(model(), "z", chol)
        y = jnp.asarray(np.random.RandomState(5).randn(6, 2))
        # Whitened meta-BN density == standard-normal quadratic (+const).
        got = np.asarray(wlj({"z": y}))
        want = np.asarray(-0.5 * jnp.sum(y * y, -1)) - np.log(
            2 * np.pi
        ) - np.log(2.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_whitened_density_is_standard_normal(self):
        lj, cov = _corr_gaussian(d=4, rho=0.9)
        chol = jnp.asarray(np.linalg.cholesky(cov))
        wlj, _, from_w = whiten_log_joint(lj, "z", chol)
        y = jnp.asarray(np.random.RandomState(3).randn(11, 4))
        # log p(L y) must equal the standard-normal quadratic in y.
        np.testing.assert_allclose(
            np.asarray(wlj({"z": y})),
            np.asarray(-0.5 * jnp.sum(y * y, axis=-1)),
            rtol=1e-6, atol=1e-8,
        )

    def test_hmc_on_whitened_correlated_gaussian(self):
        # End-to-end recipe: diagonal-mass warmup -> fit -> whiten -> run.
        # With rho=0.95 the condition number is ~(1+7*0.95)/(1-0.95)=153;
        # whitening must recover the full covariance accurately.
        lj, cov = _corr_gaussian(d=8, rho=0.95)
        hmc = zs.HMC(step_size=0.05, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init({"z": jnp.zeros((128, 8))}, n_chain_dims=1)
        warm, draws = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 500, n_adapt=500)
        )(state, jax.random.PRNGKey(0))

        chol = fit_dense_preconditioner(draws["samples"]["z"][250:])
        wlj, to_w, from_w = whiten_log_joint(lj, "z", chol)
        wstate = hmc.init({"z": to_w(warm.q["z"])}, n_chain_dims=1)
        wstate, out = jax.jit(
            lambda s, k: hmc.run(wlj, {}, s, k, 800, n_adapt=200)
        )(wstate, jax.random.PRNGKey(1))

        q = np.asarray(from_w(out["samples"]["z"][200:])).reshape(-1, 8)
        emp_cov = np.cov(q.T)
        np.testing.assert_allclose(emp_cov, cov, atol=0.12)
        np.testing.assert_allclose(q.mean(0), np.zeros(8), atol=0.08)

    def test_whitening_beats_diagonal_mass_ess(self):
        # The point of a dense metric: on a strongly correlated target,
        # whitened HMC must dominate diagonal-mass HMC in worst-direction
        # ESS at an equal post-warmup budget.
        from zhusuan_tpu.diagnostics import effective_sample_size

        lj, cov = _corr_gaussian(d=8, rho=0.95)
        n_keep, n_chains = 400, 64

        # Diagonal-mass baseline (the reference's only option).
        hmc_d = zs.HMC(step_size=0.05, n_leapfrogs=8,
                       adapt_step_size=True, adapt_mass=True)
        st = hmc_d.init({"z": jnp.zeros((n_chains, 8))}, n_chain_dims=1)
        _, out_d = jax.jit(
            lambda s, k: hmc_d.run(lj, {}, s, k, 500 + n_keep, n_adapt=500)
        )(st, jax.random.PRNGKey(2))
        xs_d = np.asarray(out_d["samples"]["z"][500:])

        # Whitened run at the same budget.
        hmc_w = zs.HMC(step_size=0.05, n_leapfrogs=8, adapt_step_size=True)
        st0 = hmc_w.init({"z": jnp.zeros((n_chains, 8))}, n_chain_dims=1)
        warm, draws = jax.jit(
            lambda s, k: hmc_w.run(lj, {}, s, k, 300, n_adapt=300)
        )(st0, jax.random.PRNGKey(3))
        chol = fit_dense_preconditioner(draws["samples"]["z"][150:])
        wlj, to_w, from_w = whiten_log_joint(lj, "z", chol)
        wst = hmc_w.init({"z": to_w(warm.q["z"])}, n_chain_dims=1)
        _, out_w = jax.jit(
            lambda s, k: hmc_w.run(wlj, {}, s, k, 200 + n_keep, n_adapt=200)
        )(wst, jax.random.PRNGKey(4))
        xs_w = np.asarray(from_w(out_w["samples"]["z"][200:]))

        # Worst-mixing direction for short-trajectory HMC on the
        # equicorrelated target: the LARGE-variance mean direction
        # (var 1+7*rho ~ 7.65) — the step size is pinned by the tight
        # (1-rho) contrasts, so trajectories random-walk along it.
        contrast = np.ones(8) / np.sqrt(8)

        def worst_ess(xs):
            proj = xs @ contrast  # [iters, chains]
            return sum(
                effective_sample_size(proj[:, c:c + 1])
                for c in range(8)
            )

        ess_w, ess_d = worst_ess(xs_w), worst_ess(xs_d)
        assert ess_w > 1.5 * ess_d, (ess_w, ess_d)
