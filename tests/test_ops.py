"""Tests for zhusuan_tpu.ops: numerics checks and the Pallas fused leapfrog
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.mcmc.base import leapfrog_step
from zhusuan_tpu.ops.leapfrog import fused_leapfrog, leapfrog_supported


def _reference_trajectory(grad_fn, q, p, ss, n_leapfrogs, mass):
    def body(carry, i):
        q, p = carry
        ss1 = jnp.where(i > 0, ss, 0.0)
        ss2 = jnp.where((i > 0) & (i < n_leapfrogs), ss, ss / 2)
        qd, pd = leapfrog_step(
            {"x": q}, {"x": p}, ss1, ss2,
            lambda d: {"x": grad_fn(d["x"])}, {"x": mass},
        )
        return (qd["x"], pd["x"]), None

    (q, p), _ = jax.lax.scan(body, (q, p), jnp.arange(n_leapfrogs + 1))
    return q, p


class TestFusedLeapfrog:
    def test_matches_reference(self):
        C, D, NL = 64, 12, 6
        std = jnp.linspace(0.2, 1.5, D, dtype=jnp.float32)

        def grad_fn(q):
            return jax.grad(lambda qq: jnp.sum(-0.5 * (qq / std) ** 2))(q)

        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (C, D), jnp.float32)
        p = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)
        mass = jnp.ones((1, D), jnp.float32) * 1.7
        ss = jnp.float32(0.07)

        q_ref, p_ref = _reference_trajectory(grad_fn, q, p, ss, NL, mass)
        q_pal, p_pal = fused_leapfrog(
            grad_fn, q, p, ss, NL, mass, block_chains=32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(q_pal), np.asarray(q_ref), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p_pal), np.asarray(p_ref), rtol=1e-5, atol=1e-6
        )

    def test_closure_constants_hoisted(self):
        # Gradient closes over an observed data array — must be hoisted.
        C, D, NL = 16, 8, 3
        obs = jax.random.normal(jax.random.PRNGKey(5), (D,), jnp.float32)

        def grad_fn(q):
            return jax.grad(
                lambda qq: jnp.sum(-0.5 * (qq - obs) ** 2)
            )(q)

        q = jnp.zeros((C, D), jnp.float32)
        p = jnp.ones((C, D), jnp.float32)
        mass = jnp.ones((1, D), jnp.float32)
        q_ref, p_ref = _reference_trajectory(
            grad_fn, q, p, jnp.float32(0.1), NL, mass
        )
        q_pal, p_pal = fused_leapfrog(
            grad_fn, q, p, 0.1, NL, mass, block_chains=16, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(q_pal), np.asarray(q_ref), rtol=1e-5, atol=1e-6
        )

    def test_supported_predicate(self):
        assert leapfrog_supported((1024, 16))
        assert not leapfrog_supported((7, 4, 4))
        assert not leapfrog_supported((1000, 16), block_chains=512)


class TestHMCFusedPath:
    def test_hmc_fused_matches_default(self, monkeypatch):
        # The fused path must produce identical transitions (same keys).
        import zhusuan_tpu as zs
        from zhusuan_tpu.ops import leapfrog as lf

        # Route the kernel through interpret mode on CPU.
        orig = lf.fused_leapfrog

        def interp(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(lf, "fused_leapfrog", interp)

        std = jnp.linspace(0.3, 1.2, 8, dtype=jnp.float32)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        q0 = {"x": jnp.zeros((32, 8), jnp.float32)}
        key = jax.random.PRNGKey(3)

        hmc_a = zs.HMC(step_size=0.2, n_leapfrogs=4)
        sa = hmc_a.init(dict(q0), log_joint=lj)
        sa, ia = hmc_a.sample(lj, {}, sa, key)

        hmc_b = zs.HMC(step_size=0.2, n_leapfrogs=4,
                       experimental_fused_leapfrog=True)
        sb = hmc_b.init(dict(q0), log_joint=lj)
        sb, ib = hmc_b.sample(lj, {}, sb, key)

        np.testing.assert_allclose(
            np.asarray(sa.q["x"]), np.asarray(sb.q["x"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ia.acceptance_rate), np.asarray(ib.acceptance_rate),
            rtol=1e-5, atol=1e-6,
        )


class TestCheckNumerics:
    """Numerics-guard tiers (ops/checks.py; reference tf.check_numerics
    semantics, univariate.py:101-111)."""

    def test_plain_jit_raises_at_sync(self):
        from zhusuan_tpu.ops.checks import check_numerics

        @jax.jit
        def f(x):
            return check_numerics(x, "probe") * 2

        with pytest.raises(Exception, match="probe"):
            jax.block_until_ready(f(jnp.asarray([1.0, jnp.nan])))

    def test_clean_value_passes_through(self):
        from zhusuan_tpu.ops.checks import check_numerics

        out = jax.jit(lambda x: check_numerics(x, "p"))(jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(out), [1.0])

    def test_disabled_is_identity(self):
        from zhusuan_tpu.ops.checks import check_numerics

        x = jnp.asarray([jnp.nan])
        out = jax.jit(lambda x: check_numerics(x, "p", enabled=False))(x)
        assert np.isnan(np.asarray(out)).all()

    def test_checked_raises_deterministically(self):
        from zhusuan_tpu.ops.checks import check_numerics, checked

        g = checked(lambda x: check_numerics(x, "probe") * 2)
        with pytest.raises(Exception, match="probe"):
            g(jnp.asarray([1.0, jnp.nan]))
        np.testing.assert_allclose(
            np.asarray(g(jnp.asarray([1.0, 2.0]))), [2.0, 4.0]
        )

    def test_checked_under_jit_and_scan(self):
        from zhusuan_tpu.ops.checks import check_numerics, checked

        def body(c, x):
            return c + check_numerics(x, "scan-elt"), None

        h = checked(jax.jit(lambda xs: jax.lax.scan(body, 0.0, xs)[0]))
        with pytest.raises(Exception, match="scan-elt"):
            h(jnp.asarray([1.0, jnp.nan, 2.0]))
        assert float(h(jnp.asarray([1.0, 2.0]))) == 3.0

    def test_checked_float_checks_catch_produced_nan(self):
        from zhusuan_tpu.ops.checks import checked

        g = checked(lambda x: jnp.log(x))  # log(-1) -> nan, no user check
        with pytest.raises(Exception, match="nan"):
            g(jnp.asarray(-1.0))
