"""Tests for ChEES-HMC (beyond-reference adaptive trajectory length;
zhusuan_tpu/mcmc/chees.py). Statistical bounds follow the house style of
tests/test_mcmc.py."""

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs
from zhusuan_tpu.mcmc.chees import _halton2


def test_halton_base2_values():
    h = np.asarray([float(_halton2(jnp.asarray(i, jnp.int32)))
                    for i in range(8)])
    np.testing.assert_allclose(
        h, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    )


STD = jnp.asarray(np.geomspace(0.1, 3.0, 16))


def _lj(obs):
    return jnp.sum(-0.5 * (obs["z"] / STD) ** 2, -1)


class TestChEES:
    def test_recovers_ill_conditioned_gaussian(self):
        s = zs.ChEESHMC(step_size=0.05, trajectory_length=0.3)
        st = s.init({"z": jnp.zeros((128, 16))})
        final, out = jax.jit(
            lambda st, k: s.run(_lj, {}, st, k, 1200, n_adapt=600)
        )(st, jax.random.PRNGKey(0))
        xs = np.asarray(out["samples"]["z"][600:]).reshape(-1, 16)
        np.testing.assert_allclose(xs.std(0), np.asarray(STD), rtol=0.1)
        # Per-dimension mean error, scaled by that dimension's std.
        np.testing.assert_allclose(
            xs.mean(0) / np.asarray(STD), np.zeros(16), atol=0.1
        )
        # Dual averaging drives the HARMONIC-mean acceptance (across
        # chains, the paper's statistic — round-3 fix) to the 0.651
        # target; the arithmetic mean then sits above it.
        a = np.asarray(out["acceptance_rate"][600:], np.float64)
        harm = float(np.mean(1.0 / np.mean(1.0 / np.maximum(a, 1e-10),
                                           axis=1)))
        assert abs(harm - 0.651) < 0.1, harm
        assert float(np.mean(a)) >= harm - 1e-6

    def test_trajectory_scales_with_target_width(self):
        # The ChEES-optimal integration time grows with the widest
        # principal axis; a 4x wider target must learn a longer T.
        def run(scale):
            std = STD * scale

            def lj(obs):
                return jnp.sum(-0.5 * (obs["z"] / std) ** 2, -1)

            s = zs.ChEESHMC(step_size=0.05 * scale, trajectory_length=0.3)
            st = s.init({"z": jnp.zeros((128, 16))})
            final, _ = jax.jit(
                lambda st, k: s.run(lj, {}, st, k, 600, n_adapt=600,
                                    collect=False)
            )(st, jax.random.PRNGKey(1))
            return float(jnp.exp(final.log_traj))

        t1, t4 = run(1.0), run(4.0)
        assert t4 > 2.0 * t1, (t1, t4)

    def test_adaptation_frozen_after_n_adapt(self):
        s = zs.ChEESHMC(step_size=0.05, trajectory_length=0.3)
        st = s.init({"z": jnp.zeros((64, 16))})
        final, out = jax.jit(
            lambda st, k: s.run(_lj, {}, st, k, 500, n_adapt=300)
        )(st, jax.random.PRNGKey(2))
        traj = np.asarray(out["trajectory_length"])
        # Post-burn-in the trajectory length is constant (detailed balance
        # needs frozen tuning; the Halton jitter still varies L).
        assert np.all(traj[300:] == traj[300])
        ls = np.asarray(out["n_leapfrogs"][300:])
        assert ls.min() >= 1 and len(np.unique(ls)) > 1

    def test_divergence_does_not_poison_adaptation(self):
        # A divergent trajectory (inf/NaN positions, rejected by MH) must
        # contribute ZERO ChEES gradient, not NaN — one early overshoot
        # would otherwise permanently destroy trajectory adaptation.
        def lj(obs):
            return -0.5 * jnp.sum(obs["z"] ** 4, -1)

        s = zs.ChEESHMC(step_size=0.9, trajectory_length=20.0)
        st = s.init({"z": jnp.full((32, 4), 3.0)})
        final, out = jax.jit(
            lambda st, k: s.run(lj, {}, st, k, 200, n_adapt=200)
        )(st, jax.random.PRNGKey(5))
        traj = np.asarray(out["trajectory_length"])
        assert np.all(np.isfinite(traj)), traj[:10]
        assert np.isfinite(float(final.log_traj))
        assert np.all(np.isfinite(np.asarray(final.q["z"])))
        # And dual averaging recovered a workable step size: late
        # acceptance is no longer ~0.
        late_acc = float(np.mean(np.asarray(out["acceptance_rate"][-50:])))
        assert late_acc > 0.3, late_acc

    def test_beats_naive_fixed_length_hmc(self):
        # On the ill-conditioned target, adaptive trajectories must yield
        # more effective samples PER GRADIENT EVALUATION than an untuned
        # short-trajectory HMC (the reference's default mode of use).
        from zhusuan_tpu.diagnostics import effective_sample_size

        n_keep = 600

        s = zs.ChEESHMC(step_size=0.05, trajectory_length=0.3)
        st = s.init({"z": jnp.zeros((64, 16))})
        _, out = jax.jit(
            lambda st, k: s.run(_lj, {}, st, k, 600 + n_keep, n_adapt=600)
        )(st, jax.random.PRNGKey(3))
        xs_c = np.asarray(out["samples"]["z"][600:])
        grads_c = float(np.asarray(out["n_leapfrogs"][600:]).sum())

        hmc = zs.HMC(step_size=0.05, n_leapfrogs=5, adapt_step_size=True)
        sth = hmc.init({"z": jnp.zeros((64, 16))}, n_chain_dims=1)
        _, outh = jax.jit(
            lambda st, k: hmc.run(_lj, {}, st, k, 600 + n_keep, n_adapt=600)
        )(sth, jax.random.PRNGKey(3))
        xs_h = np.asarray(outh["samples"]["z"][600:])
        grads_h = float(n_keep * 6)  # 5 leapfrogs -> 6 grad evals/iter

        def min_ess(xs):
            # worst-dimension ESS summed over chains
            return sum(
                effective_sample_size(xs[:, c, :]) for c in range(8)
            )  # 8 chains is enough signal for the ratio

        ess_per_grad_c = min_ess(xs_c) / grads_c
        ess_per_grad_h = min_ess(xs_h) / grads_h
        assert ess_per_grad_c > 1.5 * ess_per_grad_h, (
            ess_per_grad_c, ess_per_grad_h
        )


class TestFusedKernel:
    """ops/chees_step.py: the traced-trajectory-length fused transition.
    The hardware PRNG has no CPU lowering, so statistical equivalence is
    TPU-only (PERF.md round-5 A/B); the CPU suite pins the eligibility
    gate, the silent fallback, and that both closure-hoisted kernel
    bodies trace to a jaxpr (trace-time Python breakage fails here, not
    on hardware — the NUTS regression lesson)."""

    def test_supported_gates(self):
        from zhusuan_tpu.ops.chees_step import chees_step_supported

        assert chees_step_supported((4096, 100))
        assert not chees_step_supported((4096,))        # rank
        assert not chees_step_supported((4095, 100))    # block divide
        assert not chees_step_supported((4096, 200000))  # VMEM

    def test_kernel_traces_on_cpu(self):
        from zhusuan_tpu.ops.chees_step import fused_chees_step

        d = 8
        std = jnp.linspace(0.5, 1.5, d, dtype=jnp.float32)

        def log_post(qb):
            return jnp.sum(-0.5 * (qb / std) ** 2, -1)

        def potential_grad(qb):
            return -qb / std**2

        outs = jax.eval_shape(
            lambda q, n, k: fused_chees_step(
                log_post, potential_grad, q, jnp.ones((1, d), jnp.float32),
                0.1, n, k, block_chains=32),
            jax.ShapeDtypeStruct((64, d), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        assert outs[0].shape == (64, d)   # accepted_q
        assert outs[2].shape == (64, d)   # prop_p (ChEES grad needs it)
        assert outs[5].shape == (64,)     # sel_log_prob

    def test_cpu_falls_back_silently(self):
        s = zs.ChEESHMC(step_size=0.1, trajectory_length=0.5,
                        experimental_fused_step=True)
        st = s.init({"z": jnp.zeros((32, 16), jnp.float32)})
        final, out = jax.jit(
            lambda st, k: s.run(_lj, {}, st, k, 20, n_adapt=10)
        )(st, jax.random.PRNGKey(3))
        assert out["samples"]["z"].shape == (20, 32, 16)
        assert np.isfinite(np.asarray(out["samples"]["z"])).all()
