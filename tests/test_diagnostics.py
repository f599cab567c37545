"""Diagnostics tests. Port of reference ``tests/test_diagnostics.py``:
ESS of 10k iid normals >= 2000 (:22), ESS of a random-walk MH chain
<= 1000 (:39)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zhusuan_tpu.diagnostics import (
    effective_sample_size,
    nested_rhat,
    effective_sample_size_1d,
    ess_batch,
)


def test_iid_high_ess():
    rng = np.random.RandomState(0)
    samples = rng.randn(10_100, 2)
    ess = effective_sample_size(samples, burn_in=100)
    assert ess >= 2000


def test_rw_mh_low_ess():
    # Random-walk Metropolis on N(0,1) with small steps -> high
    # autocorrelation -> low ESS (reference test_diagnostics.py:26-39).
    rng = np.random.RandomState(1)
    n = 10_100
    x = 0.0
    chain = []
    for _ in range(n):
        prop = x + 0.5 * rng.randn()
        log_ratio = -0.5 * (prop ** 2 - x ** 2)
        if np.log(rng.rand()) < log_ratio:
            x = prop
        chain.append(x)
    samples = np.asarray(chain)[:, None]
    ess = effective_sample_size(samples, burn_in=100)
    assert ess <= 1000


def test_batch_matches_1d():
    rng = np.random.RandomState(2)
    x = rng.randn(500, 3).cumsum(axis=0) * 0.1 + rng.randn(500, 3)
    batch = ess_batch(x)
    for d in range(3):
        single = effective_sample_size_1d(x[:, d])
        np.testing.assert_allclose(batch[d], single, rtol=1e-8)


def test_rhat_converged_vs_not():
    from zhusuan_tpu.diagnostics import potential_scale_reduction

    rng = np.random.RandomState(0)
    # Converged: all chains sample the same distribution.
    good = rng.randn(1000, 8, 3)
    rhat = potential_scale_reduction(good)
    assert rhat.shape == (3,)
    assert np.all(rhat < 1.01)

    # Not converged: chains stuck at different locations.
    bad = rng.randn(1000, 8, 3) + np.arange(8)[None, :, None] * 3.0
    rhat_bad = potential_scale_reduction(bad)
    assert np.all(rhat_bad > 1.5)


class TestSummary:
    def test_summary_recovers_moments_and_flags_convergence(self):
        import zhusuan_tpu as zs
        from zhusuan_tpu.diagnostics import summary

        def log_joint(obs):
            z = obs["z"]
            return jnp.sum(-0.5 * ((z - 1.0) / 2.0) ** 2, axis=-1)

        hmc = zs.HMC(step_size=0.2, n_leapfrogs=8, adapt_step_size=True)
        state = hmc.init({"z": jnp.zeros((8, 2))}, log_joint=log_joint)
        state, out = jax.jit(
            lambda s, k: hmc.run(log_joint, {}, s, k, 1500, n_adapt=700)
        )(state, jax.random.PRNGKey(0))
        stats, table = summary(
            {"z": out["samples"]["z"][700:]}
        )
        assert stats["z"]["mean"].shape == (2,)
        np.testing.assert_allclose(stats["z"]["mean"], 1.0, atol=0.15)
        np.testing.assert_allclose(stats["z"]["sd"], 2.0, atol=0.25)
        assert np.all(stats["z"]["r_hat"] < 1.05)
        assert np.all(stats["z"]["ess"] > 100)
        assert "z[0]" in table and "r_hat" in table

    def test_summary_single_array_and_errors(self):
        from zhusuan_tpu.diagnostics import summary

        x = np.random.RandomState(0).randn(200, 4, 3)
        stats, table = summary(x)
        assert stats["x"]["mean"].shape == (3,)
        with pytest.raises(ValueError, match="n_iters, n_chains"):
            summary({"bad": np.zeros(10)})


def test_summary_frozen_chains_do_not_inflate_ess():
    # Regression: a zero-variance (never-accepting) chain used to be
    # credited with ESS == n; it must contribute 0 so dead chains SHRINK
    # the reported ESS.
    from zhusuan_tpu.diagnostics import summary

    rng = np.random.RandomState(0)
    live = rng.randn(500, 4, 1)
    frozen = np.ones((500, 4, 1)) * 2.5
    x = np.concatenate([live, frozen], axis=1)  # 4 live + 4 frozen
    stats, _ = summary({"z": x})
    ess_mixed = float(stats["z"]["ess"][0])
    stats_live, _ = summary({"z": live})
    ess_live = float(stats_live["z"]["ess"][0])
    assert ess_mixed <= ess_live * 1.05, (ess_mixed, ess_live)


class TestKSD:
    def _direct_ksd(self, x, score_fn, c=1.0, beta=-0.5):
        # Naive reference: autodiff the IMQ kernel per pair.
        import jax

        x = jnp.asarray(x, jnp.float64)
        n, d = x.shape
        s = np.asarray(score_fn(x))

        def k(a, b):
            return (c**2 + jnp.sum((a - b) ** 2)) ** beta

        gx = jax.grad(k, argnums=0)
        gy = jax.grad(k, argnums=1)
        trace_xy = lambda a, b: jnp.trace(jax.jacfwd(gy, argnums=0)(a, b))
        total = 0.0
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                a, b = x[i], x[j]
                total += (
                    float(k(a, b)) * float(s[i] @ s[j])
                    + float(s[i] @ np.asarray(gy(a, b)))
                    + float(s[j] @ np.asarray(gx(a, b)))
                    + float(trace_xy(a, b))
                )
        return total / (n * (n - 1))

    def test_matches_direct_computation(self):
        from zhusuan_tpu.diagnostics import kernel_stein_discrepancy

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(12, 3))
        score = lambda z: -z  # N(0, I)
        fast = float(kernel_stein_discrepancy(x, score))
        slow = self._direct_ksd(x, score)
        np.testing.assert_allclose(fast, slow, rtol=1e-8)

    def test_detects_bias(self):
        from zhusuan_tpu.diagnostics import kernel_stein_discrepancy

        rng = np.random.RandomState(1)
        base = rng.randn(500, 4)
        score = lambda z: -z  # target N(0, I)
        good = float(kernel_stein_discrepancy(jnp.asarray(base), score))
        shifted = float(kernel_stein_discrepancy(
            jnp.asarray(base + 0.5), score))
        very = float(kernel_stein_discrepancy(
            jnp.asarray(base + 1.5), score))
        assert good < shifted < very, (good, shifted, very)
        # Wrong scale is detected too.
        wide = float(kernel_stein_discrepancy(
            jnp.asarray(base * 2.0), score))
        assert good < wide

    def test_validation(self):
        from zhusuan_tpu.diagnostics import kernel_stein_discrepancy

        with pytest.raises(ValueError, match="n, d"):
            kernel_stein_discrepancy(jnp.zeros(5), lambda z: -z)
        with pytest.raises(ValueError, match="at least 2"):
            kernel_stein_discrepancy(jnp.zeros((1, 3)), lambda z: -z)


class TestRankNormalizedRhat:
    def test_variance_only_divergence_detected(self):
        # Two chain groups share the MEAN but differ 3x in SCALE: the
        # plain statistic is blind to this (B measures mean differences);
        # the folded rank-normalized variant must flag it.
        from zhusuan_tpu.diagnostics import potential_scale_reduction

        rng = np.random.RandomState(0)
        narrow = rng.randn(1000, 2, 1)
        wide = rng.randn(1000, 2, 1) * 3.0
        x = np.concatenate([narrow, wide], axis=1)
        plain = float(potential_scale_reduction(x)[0])
        ranked = float(
            potential_scale_reduction(x, rank_normalized=True)[0]
        )
        assert plain < 1.05, plain          # plain misses it
        assert ranked > 1.1, ranked         # folded-rank catches it

    def test_converged_chains_near_one(self):
        from zhusuan_tpu.diagnostics import potential_scale_reduction

        rng = np.random.RandomState(1)
        x = rng.randn(1000, 8, 3)
        r = potential_scale_reduction(x, rank_normalized=True)
        assert np.all(r < 1.01), r

    def test_heavy_tailed_stability(self):
        # Cauchy chains: plain R-hat is dominated by single extreme
        # draws; the rank version stays near 1 for identical chains.
        from zhusuan_tpu.diagnostics import potential_scale_reduction

        rng = np.random.RandomState(2)
        x = rng.standard_cauchy((2000, 8, 1))
        r = float(potential_scale_reduction(x, rank_normalized=True)[0])
        assert r < 1.02, r

    def test_mean_divergence_still_detected(self):
        from zhusuan_tpu.diagnostics import potential_scale_reduction

        rng = np.random.RandomState(3)
        a = rng.randn(500, 2, 1)
        b = rng.randn(500, 2, 1) + 2.0
        x = np.concatenate([a, b], axis=1)
        r = float(potential_scale_reduction(x, rank_normalized=True)[0])
        assert r > 1.2, r

    def test_constant_and_tied_chains_stable(self):
        # Regression: ordinal tie-breaking fabricated R-hat ~1.5 on
        # constant latents; average ranks give identical scores for ties
        # so the statistic degrades to nan (like the plain variant), not
        # a false divergence flag.
        from zhusuan_tpu.diagnostics import potential_scale_reduction

        const = np.ones((1000, 4, 1))
        r = potential_scale_reduction(const, rank_normalized=True)
        assert not (r[0] > 1.05), r  # nan or ~1, never a false flag
        # Discrete draws with heavy ties: identical chains stay near 1.
        rng = np.random.RandomState(0)
        disc = rng.poisson(3.0, size=(1000, 8, 1)).astype(float)
        r2 = float(potential_scale_reduction(
            disc, rank_normalized=True)[0])
        assert r2 < 1.02, r2


class TestFrozenChainESS:
    def test_zero_variance_dimension_reports_zero_not_full(self):
        """A frozen (permanently-rejecting) chain used to be credited with
        FULL ess=n by the host estimator while the device variant said
        ~0.5 (review r3). Both now report 0 — conservative and equal."""
        from zhusuan_tpu.diagnostics import ess_batch, ess_batch_device

        rng = np.random.RandomState(0)
        x = np.zeros((200, 2))
        x[:, 0] = rng.randn(200)  # healthy iid column
        # column 1 stays constant (frozen chain)
        host = ess_batch(x)
        dev = np.asarray(ess_batch_device(jnp.asarray(x)))
        assert host[0] > 30 and dev[0] > 30
        assert host[1] == 0.0 and dev[1] == 0.0


class TestNestedRhat:
    """Margossian et al. 2024: convergence diagnosis for many short
    chains, including the one-draw-per-chain regime where split-R-hat is
    undefined (within-chain variance needs n_iters >= 2)."""

    def test_iid_near_one(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(10, 512))  # N=10 draws, 512 chains
        r = float(nested_rhat(x, n_superchains=32))
        m_times_n = (512 // 32) * 10
        assert 1.0 <= r < np.sqrt(1.0 + 5.0 / m_times_n), r

    def test_single_draw_per_chain(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 4096))  # classic R-hat: W == 0, undefined
        r = float(nested_rhat(x, n_superchains=64))
        assert 1.0 <= r < np.sqrt(1.0 + 5.0 / 64.0), r
        # classic split-R-hat on the same draws is undefined (no
        # within-chain variance) and says so.
        from zhusuan_tpu.diagnostics import potential_scale_reduction
        with pytest.raises(ValueError, match="nested_rhat"):
            potential_scale_reduction(x)

    def test_detects_stuck_superchains(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 4096))
        # Half the superchains stuck in a mode at +3 (superchains are
        # contiguous chain blocks, so shift the first half of chains).
        x[:, : 2048] += 3.0
        r = float(nested_rhat(x, n_superchains=64))
        assert r > 1.5, r

    def test_mixing_within_superchain_is_healthy(self):
        # Chains WITHIN each superchain spread over modes identically
        # across superchains -> between-superchain variance small -> the
        # ensemble represents the same distribution everywhere: near 1.
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 1024))
        x[:, ::2] += 3.0  # alternating chains hit the second mode
        r = float(nested_rhat(x, n_superchains=16))
        assert r < np.sqrt(1.0 + 5.0 / (64 * 4)) , r

    def test_trailing_dims_and_validation(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(5, 64, 3, 2))
        r = nested_rhat(x, n_superchains=8)
        assert r.shape == (3, 2)
        with pytest.raises(ValueError, match="divide"):
            nested_rhat(x, n_superchains=7)
        with pytest.raises(ValueError, match=">= 2"):
            nested_rhat(x, n_superchains=1)

    def test_rank_normalized_variance_divergence(self):
        # Superchains agree in mean but differ in scale: the plain
        # statistic misses it, the folded rank-normalized one flags it.
        rng = np.random.default_rng(5)
        x = rng.normal(size=(8, 1024))
        x[:, : 512] *= 4.0
        plain = float(nested_rhat(x, n_superchains=16))
        ranked = float(
            nested_rhat(x, n_superchains=16,
                                       rank_normalized=True)
        )
        assert plain < 1.05, plain
        assert ranked > 1.2, ranked

    def test_summary_integration(self):
        from zhusuan_tpu.diagnostics import summary

        rng = np.random.default_rng(6)
        x = {"z": rng.normal(size=(4, 512, 2))}
        stats, table = summary(x, n_superchains=16)
        assert stats["z"]["r_hat"].shape == (2,)
        assert np.all(stats["z"]["r_hat"] < 1.1)
        assert "r_hat" in table

    def test_summary_single_iteration(self):
        # The regime n_superchains advertises (n_iters == 1): the ESS
        # column must not route through the n-1 == 0 autocovariance
        # divisor (ADVICE r4) — chains are independent runs, so each
        # contributes one draw: ESS = n_chains, warning-free.
        import warnings

        from zhusuan_tpu.diagnostics import summary

        rng = np.random.default_rng(7)
        x = {"z": rng.normal(size=(1, 512, 2))}
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            stats, table = summary(x, n_superchains=16)
        assert np.all(stats["z"]["ess"] == 512.0)
        assert np.all(np.isfinite(stats["z"]["r_hat"]))
