"""Tests for the hardware-PRNG sampling kernels (TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.ops.random import tpu_normal, tpu_uniform

# The hardware PRNG primitives (pltpu.prng_seed / prng_random_bits) have no
# CPU interpreter lowering in this JAX version; these tests require a TPU.
# (Statistical correctness was additionally verified on a real v5e chip:
# mean 0.0001 / std 1.0000 over 33M draws — see PERF.md.)
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG requires a TPU backend",
)


def test_tpu_uniform_stats():
    u = tpu_uniform(jax.random.PRNGKey(0), (256, 128))
    u = np.asarray(u)
    assert u.shape == (256, 128)
    assert 0.0 <= u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005


def test_tpu_normal_stats():
    x = np.asarray(
        tpu_normal(jax.random.PRNGKey(1), (512, 128))
    )
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1.0) < 0.02
    # Normality sanity: ~68% within 1 sigma.
    frac = np.mean(np.abs(x) < 1.0)
    assert abs(frac - 0.6827) < 0.02


def test_distinct_keys_distinct_streams():
    a = np.asarray(tpu_normal(jax.random.PRNGKey(0), (64, 128)))
    b = np.asarray(tpu_normal(jax.random.PRNGKey(1), (64, 128)))
    assert not np.allclose(a, b)


class TestFusedHMCStep:
    """Fully fused HMC transition (ops/hmc_step.py): statistical
    equivalence with the scan path. TPU-only (hardware PRNG)."""

    def _run(self, fused):
        import zhusuan_tpu as zs

        dim, n_chains = 8, 1024
        std = jnp.linspace(0.5, 2.0, dim)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.4, n_leapfrogs=5, adapt_step_size=True,
                     experimental_fused_step=fused)
        state = hmc.init({"x": jnp.zeros((n_chains, dim), jnp.float32)},
                         log_joint=lj)
        final, out = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 300, n_adapt=100)
        )(state, jax.random.PRNGKey(0))
        return out

    def test_fused_matches_scan_statistically(self):
        out_s = self._run(False)
        out_f = self._run(True)
        xs_s = np.asarray(out_s["samples"]["x"][150:]).reshape(-1, 8)
        xs_f = np.asarray(out_f["samples"]["x"][150:]).reshape(-1, 8)
        # Same target moments from both streams.
        np.testing.assert_allclose(xs_f.std(0), xs_s.std(0), rtol=0.05)
        np.testing.assert_allclose(
            xs_f.mean(0), xs_s.mean(0), atol=0.1
        )
        acc_s = float(np.mean(np.asarray(out_s["acceptance_rate"][150:])))
        acc_f = float(np.mean(np.asarray(out_f["acceptance_rate"][150:])))
        assert abs(acc_s - acc_f) < 0.05

    def test_fused_deterministic_per_key(self):
        out_a = self._run(True)
        out_b = self._run(True)
        np.testing.assert_array_equal(
            np.asarray(out_a["samples"]["x"]),
            np.asarray(out_b["samples"]["x"]),
        )


class TestBF16State:
    """bf16 STATE on the fused HMC path (TPU only): HBM positions in
    bfloat16, all in-VMEM compute and MH energies f32 (ops/hmc_step.py;
    PERF.md round-4 stationarity study)."""

    def test_kernel_bf16_state_dtypes_and_energies(self):
        from zhusuan_tpu.ops.hmc_step import fused_hmc_step

        C, D = 1024, 64
        std = jnp.linspace(0.5, 2.0, D, dtype=jnp.float32)
        logp = lambda x: jnp.sum(-0.5 * (x / std) ** 2, -1)
        grad = lambda x: -x / (std * std)
        mass = jnp.ones((1, D), jnp.float32)
        q = jnp.asarray(np.random.RandomState(7).randn(C, D) * 0.5,
                        jnp.bfloat16)
        (out_q, p0, acc, old_lp, new_lp, old_h, new_h) = fused_hmc_step(
            logp, grad, q, mass, 0.05, 5, jax.random.PRNGKey(3)
        )
        # State stays bf16 in HBM; everything else is f32.
        assert out_q.dtype == jnp.bfloat16
        for v in (p0, acc, old_lp, new_lp, old_h, new_h):
            assert v.dtype == jnp.float32
        # Energies are evaluated in f32 at the (exactly representable)
        # upcast positions: old_lp == logp(f32(q)) to f32 accuracy.
        np.testing.assert_allclose(
            np.asarray(old_lp),
            np.asarray(logp(q.astype(jnp.float32))),
            rtol=1e-5,
        )
        a = np.asarray(acc)
        assert (0 <= a).all() and (a <= 1).all()
        assert a.mean() > 0.5  # small step -> mostly accepted

    def test_hmc_bf16_state_recovers_moments(self):
        import zhusuan_tpu as zs

        dim, n_chains = 8, 2048
        std = jnp.linspace(0.5, 2.0, dim)

        def lj(obs):
            return jnp.sum(-0.5 * (obs["x"] / std) ** 2, -1)

        hmc = zs.HMC(step_size=0.4, n_leapfrogs=5, adapt_step_size=True)
        state = hmc.init(
            {"x": jnp.zeros((n_chains, dim), jnp.bfloat16)}, log_joint=lj
        )
        # bf16 positions must not drag the adaptation state down to bf16.
        assert state.step_size.dtype == jnp.float32
        assert state.q["x"].dtype == jnp.bfloat16
        final, out = jax.jit(
            lambda s, k: hmc.run(lj, {}, s, k, 300, n_adapt=100)
        )(state, jax.random.PRNGKey(5))
        assert final.q["x"].dtype == jnp.bfloat16
        xs = np.asarray(
            out["samples"]["x"][150:], np.float32
        ).reshape(-1, dim)
        np.testing.assert_allclose(xs.std(0), np.asarray(std), rtol=0.05)
        np.testing.assert_allclose(xs.mean(0), 0.0, atol=0.1)


class TestFusedSGLDStep:
    """fused_sgld_step formula check (TPU only): with grad g(q) and
    learning rate lr, (new_q - q - 0.5*lr*g) must be N(0, lr) noise."""

    def test_update_formula_and_noise_scale(self):
        from zhusuan_tpu.ops.sgld_step import fused_sgld_step

        C, D, lr = 4096, 128, 0.04
        q = jnp.asarray(np.random.RandomState(0).randn(C, D), jnp.float32)
        grad = lambda x: -0.5 * x  # known gradient
        new_q = fused_sgld_step(grad, q, lr, jax.random.PRNGKey(0))
        resid = np.asarray(new_q - q - 0.5 * lr * (-0.5 * q))
        # Residual is exactly the injected noise: N(0, sqrt(lr)).
        assert abs(resid.mean()) < 3e-3
        np.testing.assert_allclose(resid.std(), np.sqrt(lr), rtol=0.02)

    def test_deterministic_per_key(self):
        from zhusuan_tpu.ops.sgld_step import fused_sgld_step

        q = jnp.zeros((512, 64), jnp.float32)
        grad = lambda x: -x
        a = np.asarray(fused_sgld_step(grad, q, 0.01, jax.random.PRNGKey(1)))
        b = np.asarray(fused_sgld_step(grad, q, 0.01, jax.random.PRNGKey(1)))
        c = np.asarray(fused_sgld_step(grad, q, 0.01, jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 0


class TestFusedHMCStepKernel:
    """Direct fused_hmc_step checks (TPU only; the HMC-level statistical
    equivalence lives in TestFusedHMCStep above)."""

    def test_momentum_and_energy_bookkeeping(self):
        from zhusuan_tpu.ops.hmc_step import fused_hmc_step

        C, D = 2048, 64
        std = jnp.linspace(0.5, 2.0, D, dtype=jnp.float32)
        logp = lambda x: jnp.sum(-0.5 * (x / std) ** 2, -1)
        grad = lambda x: -x / (std * std)
        mass = jnp.ones((1, D), jnp.float32)
        q = jnp.asarray(np.random.RandomState(1).randn(C, D) * 0.5,
                        jnp.float32)
        (out_q, p0, acc, old_lp, new_lp, old_h, new_h) = fused_hmc_step(
            logp, grad, q, mass, 0.05, 5, jax.random.PRNGKey(0)
        )
        p0 = np.asarray(p0)
        # Momentum ~ N(0, mass=1): both Box-Muller halves standard normal.
        assert abs(p0.mean()) < 5e-3
        np.testing.assert_allclose(p0.std(), 1.0, rtol=0.01)
        np.testing.assert_allclose(p0[: C // 2].std(), 1.0, rtol=0.02)
        np.testing.assert_allclose(p0[C // 2:].std(), 1.0, rtol=0.02)
        # Energy bookkeeping: old_h == -logp(q) + 0.5 sum p^2.
        expect_h = -np.asarray(logp(q)) + 0.5 * (p0 ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(old_h), expect_h, rtol=1e-4)
        # old_lp is exactly logp(q); acceptance in [0, 1].
        np.testing.assert_allclose(np.asarray(old_lp), np.asarray(logp(q)),
                                   rtol=1e-5)
        a = np.asarray(acc)
        assert (0 <= a).all() and (a <= 1).all()
        # Per-chain select: every row equals the proposal or the start.
        oq = np.asarray(out_q)
        qn = np.asarray(q)
        moved = np.abs(oq - qn).max(axis=1) > 0
        assert moved.mean() > 0.5  # small step -> mostly accepted


class TestFusedSGHMCStep:
    """fused_sghmc_step formula checks (TPU only), mirroring the scanned
    integrators in mcmc/sgmcmc.py."""

    def test_first_order_formula_and_noise(self):
        from zhusuan_tpu.ops.sghmc_step import fused_sghmc_step

        C, D, lr, alpha = 4096, 128, 0.01, 0.25
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(C, D), jnp.float32)
        v = jnp.asarray(rng.randn(C, D) * 0.1, jnp.float32)
        grad = lambda x: -0.7 * x
        new_q, new_v, vsq = fused_sghmc_step(
            grad, q, v, lr, alpha, 0.0, False, jax.random.PRNGKey(0)
        )
        # q' - q == v' exactly (1st-order: q' = q + v').
        np.testing.assert_allclose(
            np.asarray(new_q - q), np.asarray(new_v), rtol=1e-5, atol=1e-6
        )
        # Residual of the v update is the injected noise
        # N(0, sqrt(2*alpha*lr)).
        resid = np.asarray(new_v) - (
            (1 - alpha) * np.asarray(v) + lr * np.asarray(-0.7 * q)
        )
        assert abs(resid.mean()) < 3e-3
        np.testing.assert_allclose(
            resid.std(), np.sqrt(2 * alpha * lr), rtol=0.02
        )
        # Kinetic partial sums match.
        np.testing.assert_allclose(
            np.asarray(vsq), (np.asarray(new_v) ** 2).sum(-1), rtol=1e-4
        )

    def test_psgld_formula_and_noise(self):
        from zhusuan_tpu.ops.psgld_step import fused_psgld_step

        C, D, lr, decay, eps_c = 4096, 128, 0.01, 0.9, 1e-3
        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.randn(C, D), jnp.float32)
        rms = jnp.asarray(np.abs(rng.randn(C, D)) * 0.5, jnp.float32)
        grad = lambda x: -0.4 * x
        new_q, new_rms = fused_psgld_step(
            grad, q, rms, lr, decay, eps_c, jax.random.PRNGKey(0)
        )
        g = np.asarray(-0.4 * q)
        expect_rms = decay * np.asarray(rms) + (1 - decay) * g ** 2
        np.testing.assert_allclose(np.asarray(new_rms), expect_rms,
                                   rtol=1e-5)
        precond = 1.0 / (eps_c + np.sqrt(expect_rms))
        # Residual is the preconditioned noise: std sqrt(lr*G) per element.
        resid = np.asarray(new_q - q) - 0.5 * lr * precond * g
        z = resid / np.sqrt(lr * precond)  # whitened -> N(0, 1)
        assert abs(z.mean()) < 3e-3
        np.testing.assert_allclose(z.std(), 1.0, rtol=0.02)

    def test_sgnht_first_order_formula(self):
        from zhusuan_tpu.ops.sgnht_step import fused_sgnht_step

        C, D, lr, a, tr = 4096, 128, 0.01, 0.1, 0.5
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(C, D), jnp.float32)
        v = jnp.asarray(rng.randn(C, D) * 0.1, jnp.float32)
        al = jnp.asarray(np.abs(rng.randn(C, D)) * 0.2, jnp.float32)
        grad = lambda x: -0.6 * x
        new_q, new_v, new_al = fused_sgnht_step(
            grad, q, v, al, lr, a, tr, False, jax.random.PRNGKey(0)
        )
        # q' - q == v' exactly; thermostat update is deterministic in v'.
        np.testing.assert_allclose(
            np.asarray(new_q - q), np.asarray(new_v), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_al),
            np.asarray(al + tr * (new_v ** 2 - lr)),
            rtol=1e-4, atol=1e-6,
        )
        # Residual of the v update is the injected noise N(0, sqrt(2*a*lr)).
        resid = np.asarray(new_v) - (
            (1 - np.asarray(al)) * np.asarray(v) + lr * np.asarray(-0.6 * q)
        )
        assert abs(resid.mean()) < 3e-3
        np.testing.assert_allclose(resid.std(), np.sqrt(2 * a * lr),
                                   rtol=0.02)

    def test_sgnht_second_order_formula(self):
        from zhusuan_tpu.ops.sgnht_step import fused_sgnht_step

        C, D, lr, a, tr = 2048, 64, 0.01, 0.1, 0.5
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(C, D), jnp.float32)
        v = jnp.asarray(rng.randn(C, D) * 0.1, jnp.float32)
        al = jnp.asarray(np.abs(rng.randn(C, D)) * 0.2, jnp.float32)
        grad = lambda x: -x
        new_q, new_v, new_al = fused_sgnht_step(
            grad, q, v, al, lr, a, tr, True, jax.random.PRNGKey(4)
        )
        # Reconstruct per the scan formulas (sgmcmc.py:476-499).
        al1 = np.asarray(al) + 0.5 * tr * (np.asarray(v) ** 2 - lr)
        d_half = np.exp(-0.5 * al1)
        q1 = np.asarray(q) + 0.5 * np.asarray(v)
        np.testing.assert_allclose(
            np.asarray(new_q), q1 + 0.5 * np.asarray(new_v),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_al),
            al1 + 0.5 * tr * (np.asarray(new_v) ** 2 - lr),
            rtol=1e-4, atol=1e-6,
        )
        noise = np.asarray(new_v) / d_half - (
            d_half * np.asarray(v) + lr * (-q1)
        )
        np.testing.assert_allclose(noise.std(), np.sqrt(2 * a * lr),
                                   rtol=0.02)

    def test_second_order_matches_scan_formula(self):
        from zhusuan_tpu.ops.sghmc_step import fused_sghmc_step

        C, D, lr, alpha = 2048, 64, 0.01, 0.3
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(C, D), jnp.float32)
        v = jnp.asarray(rng.randn(C, D) * 0.1, jnp.float32)
        grad = lambda x: -x
        new_q, new_v, _ = fused_sghmc_step(
            grad, q, v, lr, alpha, 0.0, True, jax.random.PRNGKey(2)
        )
        # Reconstruct: q1 = q + v/2; noise = v'/d - (d*v + lr*g(q1));
        # then q' must equal q1 + v'/2 and noise ~ N(0, sqrt(2*alpha*lr)).
        d_half = np.exp(-0.5 * alpha)
        q1 = np.asarray(q) + 0.5 * np.asarray(v)
        np.testing.assert_allclose(
            np.asarray(new_q), q1 + 0.5 * np.asarray(new_v),
            rtol=1e-5, atol=1e-6,
        )
        noise = np.asarray(new_v) / d_half - (
            d_half * np.asarray(v) + lr * (-q1)
        )
        np.testing.assert_allclose(
            noise.std(), np.sqrt(2 * alpha * lr), rtol=0.02
        )
