"""Fused mean-field ADVI trainer (ops/advi_step.py).

Pins (1) the gradient identity: the kernel's closed-form pathwise
gradients equal autodiff of the library's own sgvb loss given the same
noise; (2) kernel correctness end-to-end in interpret mode on CPU
against a known optimum and against the scan path; (3) the advi()
routing/validation contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.ops.advi_step import (
    advi_step_supported,
    fused_meanfield_advi,
)

KEY = jax.random.PRNGKey(0)
_C = 0.5 * float(np.log(2.0 * np.pi))

MU0 = np.array([2.0, -1.0], np.float32)
SD0 = np.array([0.5, 1.5], np.float32)


def _flat_log_post(z):
    # iid Gaussian target N(MU0, SD0^2); z [dim] -> scalar.
    return jnp.sum(
        -0.5 * ((z - MU0) / SD0) ** 2 - jnp.log(SD0) - _C
    )


class TestGradientIdentity:
    def test_formulas_match_library_sgvb_autodiff(self):
        """Same eps => the kernel's closed-form (g_loc, g_ls) equal
        jax.grad of the library sgvb loss, per the Gaussian
        sticking-the-landing identity in the module docstring."""
        n, d = 64, 2
        eps = jax.random.normal(jax.random.PRNGKey(3), (n, d),
                                jnp.float32)

        def log_joint(obs):
            z = obs["z"]
            return jnp.sum(
                -0.5 * ((z - MU0) / SD0) ** 2 - jnp.log(SD0) - _C,
                axis=-1,
            )

        def lib_loss(loc, ls):
            z = loc + jnp.exp(ls) * eps
            logq = jnp.sum(-0.5 * eps * eps - _C - ls, axis=-1)
            lb = zs.variational.elbo(
                log_joint, {}, latent={"z": (z, logq)}, axis=0
            )
            return jnp.mean(lb.sgvb())

        loc = jnp.asarray([0.3, -0.2], jnp.float32)
        ls = jnp.asarray([-0.5, 0.1], jnp.float32)
        loss, (al, als) = jax.value_and_grad(lib_loss, argnums=(0, 1))(
            loc, ls
        )

        # Kernel formulas (advi_step.py body, plain JAX).
        sigma = jnp.exp(ls)
        z = loc + sigma * eps
        gz = jax.vmap(jax.grad(_flat_log_post))(z)
        g_loc = -jnp.mean(gz, axis=0)
        g_ls = -jnp.mean(gz * (sigma * eps), axis=0) - 1.0
        my_loss = (-jnp.mean(jax.vmap(_flat_log_post)(z))
                   - 0.5 * jnp.mean(jnp.sum(eps * eps, axis=-1))
                   - 2 * _C - jnp.sum(ls))

        np.testing.assert_allclose(np.asarray(g_loc), np.asarray(al),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g_ls), np.asarray(als),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(my_loss), float(loss),
                                   rtol=1e-6)


def _reference_trainer(log_post_fn, loc, ls, noise, lr_fn,
                       b1=0.9, b2=0.999, eps_adam=1e-8):
    """Plain-JAX trainer with the kernel's exact math (same noise =>
    same trajectory up to float re-association)."""
    vg = jax.vmap(jax.value_and_grad(log_post_fn))
    d = loc.shape[-1]

    def step(carry, te):
        loc, ls, m_l, v_l, m_s, v_s = carry
        t, eps = te
        sigma = jnp.exp(ls)
        z = loc + sigma * eps
        f_vals, gz = vg(z)
        g_loc = -jnp.mean(gz, axis=0)
        g_ls = -jnp.mean(gz * (sigma * eps), axis=0) - 1.0
        loss = (-jnp.mean(f_vals)
                - 0.5 * jnp.mean(jnp.sum(eps * eps, axis=-1))
                - d * _C - jnp.sum(ls))
        tf = (t + 1).astype(jnp.float32)
        lr_t = lr_fn(t.astype(jnp.float32))
        c1, c2 = 1.0 - b1 ** tf, 1.0 - b2 ** tf

        def adam(p, g, m, v):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            return p - lr_t * (m / c1) / (jnp.sqrt(v / c2) + eps_adam), m, v

        loc, m_l, v_l = adam(loc, g_loc, m_l, v_l)
        ls, m_s, v_s = adam(ls, g_ls, m_s, v_s)
        return (loc, ls, m_l, v_l, m_s, v_s), loss

    z0 = jnp.zeros_like(loc)
    ts = jnp.arange(noise.shape[0], dtype=jnp.int32)
    (loc, ls, *_), losses = jax.lax.scan(
        step, (loc, ls, z0, z0, z0, z0), (ts, noise)
    )
    return loc, ls, losses


class TestKernelInterpret:
    def test_exact_parity_with_reference_math(self):
        """Injected noise => the kernel's whole trajectory (params and
        loss trace) matches the plain-JAX implementation of the same
        math to float tolerance."""
        n_steps, n, d = 60, 16, 2
        noise = jax.random.normal(jax.random.PRNGKey(7), (n_steps, n, d),
                                  jnp.float32)
        lr_fn = lambda t: 0.05  # noqa: E731
        loc0 = jnp.asarray([0.3, -0.2], jnp.float32)
        ls0 = jnp.asarray([-0.5, 0.1], jnp.float32)
        loc_k, ls_k, losses_k = fused_meanfield_advi(
            _flat_log_post, loc0, ls0, n_steps=n_steps, n_particles=n,
            key=KEY, lr_schedule=lr_fn, noise=noise, interpret=True,
        )
        loc_r, ls_r, losses_r = _reference_trainer(
            _flat_log_post, loc0, ls0, noise, lr_fn
        )
        np.testing.assert_allclose(np.asarray(loc_k), np.asarray(loc_r),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ls_k), np.asarray(ls_r),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(losses_k),
                                   np.asarray(losses_r),
                                   rtol=1e-5, atol=1e-5)

    def test_fit_reaches_known_optimum(self):
        n_steps, n = 500, 64
        noise = jax.random.normal(jax.random.PRNGKey(11),
                                  (n_steps, n, 2), jnp.float32)
        loc, ls, losses = fused_meanfield_advi(
            _flat_log_post,
            jnp.zeros(2, jnp.float32),
            jnp.zeros(2, jnp.float32),
            n_steps=n_steps,
            n_particles=n,
            key=KEY,
            lr_schedule=lambda t: 0.05,
            noise=noise,
            interpret=True,
        )
        # The ELBO optimum of a Gaussian target is exact: q == p.
        np.testing.assert_allclose(np.asarray(loc), MU0, atol=0.12)
        np.testing.assert_allclose(np.asarray(jnp.exp(ls)), SD0,
                                   rtol=0.12)
        losses = np.asarray(losses)
        assert losses.shape == (n_steps,)
        assert np.all(np.isfinite(losses))
        assert losses[-50:].mean() < losses[:10].mean()
        # At the optimum the ELBO is 0 (KL(q||p) = 0): the loss
        # estimate must hover there.
        assert abs(losses[-50:].mean()) < 0.2, losses[-50:].mean()

    def test_validation(self):
        with pytest.raises(ValueError, match="unsupported size"):
            fused_meanfield_advi(
                _flat_log_post, jnp.zeros(2), jnp.zeros(2),
                n_steps=10, n_particles=33, key=KEY,  # odd
                lr_schedule=lambda t: 0.1, interpret=True,
            )
        assert not advi_step_supported(2, 33, 10)
        assert not advi_step_supported(0, 32, 10)
        assert not advi_step_supported(2, 32, 0)
        # particle block past the VMEM cap
        assert not advi_step_supported(4096, 4096, 10)
        assert advi_step_supported(2, 500, 16000)
        with pytest.raises(ValueError, match="noise must have shape"):
            fused_meanfield_advi(
                _flat_log_post, jnp.zeros(2), jnp.zeros(2),
                n_steps=10, n_particles=4, key=KEY,
                lr_schedule=lambda t: 0.1,
                noise=jnp.zeros((10, 4, 3)), interpret=True,
            )


@zs.meta_bayesian_net()
def _conjugate_model(x_obs):
    bn = zs.BayesianNet()
    w = bn.normal("w", jnp.zeros(2, jnp.float32), std=1.0,
                  group_ndims=1)
    bn.normal("x", jnp.sum(w.tensor, axis=-1, keepdims=True),
              std=1.0, group_ndims=1)
    return bn


class TestADVIRouting:
    X = jnp.asarray([1.2], jnp.float32)

    def _posterior(self):
        # w | x ~ N(mu, Sigma) with Sigma = (I + 11^T)^-1.
        prec = np.eye(2) + np.ones((2, 2))
        cov = np.linalg.inv(prec)
        mu = cov @ (np.ones(2) * float(self.X[0]))
        return mu, cov

    def test_fused_matches_scan_and_truth(self):
        mu, cov = self._posterior()
        kw = dict(n_iters=400, n_samples=64, learning_rate=0.05)
        noise = jax.random.normal(
            jax.random.PRNGKey(21), (400, 64, 2), jnp.float32
        )  # interpret mode has no hardware PRNG
        res_f = zs.variational.advi(
            _conjugate_model(self.X), {"x": self.X}, KEY,
            experimental_fused=True, _fused_interpret=True,
            _fused_noise=noise, **kw
        )
        res_s = zs.variational.advi(
            _conjugate_model(self.X), {"x": self.X}, KEY,
            experimental_fused=False, **kw
        )
        for res in (res_f, res_s):
            np.testing.assert_allclose(
                np.asarray(res.params["loc"]["w"]), mu, atol=0.1
            )
            np.testing.assert_allclose(
                np.asarray(jnp.exp(res.params["log_scale"]["w"])),
                np.sqrt(np.diag(cov)), rtol=0.2
            )
        # Same estimator, same optimum: the two paths agree closely
        # (different PRNG streams; deterministic attractor).
        np.testing.assert_allclose(
            np.asarray(res_f.params["loc"]["w"]),
            np.asarray(res_s.params["loc"]["w"]), atol=0.08,
        )
        assert res_f.losses.shape == res_s.losses.shape

    def test_force_with_custom_optimizer_raises(self):
        import optax

        with pytest.raises(ValueError, match="default optimizer"):
            zs.variational.advi(
                _conjugate_model(self.X), {"x": self.X}, KEY,
                n_iters=10, experimental_fused=True,
                optimizer=optax.sgd(0.1),
            )

    def test_force_with_fullrank_raises(self):
        with pytest.raises(ValueError, match="mean-field"):
            zs.variational.advi(
                _conjugate_model(self.X), {"x": self.X}, KEY,
                n_iters=10, guide="fullrank", experimental_fused=True,
            )

    def test_auto_on_cpu_uses_scan_path(self):
        # On the CPU backend "auto" must silently take the scan path
        # (no interpret-mode kernel in production use).
        res = zs.variational.advi(
            _conjugate_model(self.X), {"x": self.X}, KEY,
            n_iters=20, n_samples=8, experimental_fused="auto",
        )
        assert res.losses.shape == (20,)

    def test_init_params_passthrough(self):
        g = zs.variational.MeanFieldGuide(
            _conjugate_model(self.X), observed={"x": self.X}
        )
        init = g.init_params()
        init["loc"]["w"] = jnp.asarray([5.0, -5.0], jnp.float32)
        res = zs.variational.advi(
            _conjugate_model(self.X), {"x": self.X}, KEY,
            n_iters=1, n_samples=8, learning_rate=1e-3,
            experimental_fused=False, init_params=init,
        )
        # One tiny step: params stay near the custom init.
        np.testing.assert_allclose(
            np.asarray(res.params["loc"]["w"]), [5.0, -5.0], atol=0.1
        )
