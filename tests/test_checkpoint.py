"""Checkpoint/resume and profiling-meter tests (SURVEY.md §5 subsystems)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zhusuan_tpu as zs
from zhusuan_tpu.checkpoint import restore_checkpoint, save_checkpoint
from zhusuan_tpu.profiling import SpeedMeter, ess_per_sec


def test_checkpoint_roundtrip_params():
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    with tempfile.TemporaryDirectory() as d:
        p = save_checkpoint(os.path.join(d, "ckpt"), params, step=7,
                            use_orbax=False)
        restored, step = restore_checkpoint(p)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(params["w"]))


def test_checkpoint_roundtrip_hmc_state():
    def lj(obs):
        return jnp.sum(-0.5 * obs["x"] ** 2, -1)

    hmc = zs.HMC(step_size=0.3, n_leapfrogs=3, adapt_step_size=True)
    state = hmc.init({"x": jnp.zeros((4, 2))}, log_joint=lj)
    state, _ = hmc.sample(lj, {}, state, jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as d:
        p = save_checkpoint(os.path.join(d, "hmc"), state, step=1,
                            use_orbax=False)
        restored, step = restore_checkpoint(p, like=state)
    # Resume sampling from the restored state.
    assert isinstance(restored, zs.HMCState)
    np.testing.assert_allclose(np.asarray(restored.q["x"]),
                               np.asarray(state.q["x"]))
    state2, info = hmc.sample(lj, {}, restored, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(state2.q["x"])))


def test_speed_meter():
    m = SpeedMeter(items_per_step=32)
    for _ in range(5):
        m.tick()
    assert m.steps_per_sec > 0
    # items/sec is steps/sec scaled by items_per_step (each property call
    # re-reads the clock, so compare with tolerance).
    assert abs(m.items_per_sec / (32 * m.steps_per_sec) - 1.0) < 0.5


def test_ess_per_sec():
    rng = np.random.RandomState(0)
    samples = rng.randn(200, 3, 4)
    v = ess_per_sec(samples, wall_seconds=2.0)
    assert v > 0


def test_checkpoint_empty_dict_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        p = save_checkpoint(os.path.join(d, "e"), {}, use_orbax=False)
        restored, _ = restore_checkpoint(p)
    assert restored == {}


def test_checkpoint_none_entries_need_like():
    """None entries are structure, not leaves: no-like restore omits them
    (documented); like= restores them faithfully."""
    state = {"a": jnp.ones(2), "b": None}
    with tempfile.TemporaryDirectory() as d:
        p = save_checkpoint(os.path.join(d, "n"), state, use_orbax=False)
        bare, _ = restore_checkpoint(p)
        assert "b" not in bare  # documented npz limitation
        withlike, _ = restore_checkpoint(p, like=state)
    assert withlike["b"] is None
    np.testing.assert_allclose(np.asarray(withlike["a"]), 1.0)


def test_checkpoint_legacy_format_clear_error():
    import pickle
    import pytest

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "old.npz")
        np.savez(
            p,
            __treedef__=np.frombuffer(pickle.dumps((1, 2)), dtype=np.uint8),
            __step__=np.asarray(0),
            leaf_0=np.ones(3),
        )
        with pytest.raises(ValueError, match="old pickled-treedef"):
            restore_checkpoint(p)


def test_checkpoint_untrusted_file_cannot_execute_code():
    """A malicious npz with pickled payloads is rejected by
    allow_pickle=False before anything is deserialized."""
    import pytest

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned",))

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "evil.npz")
        np.savez(
            p,
            __paths__=np.asarray([Evil()], dtype=object),
            __step__=np.asarray(0),
        )
        with pytest.raises(ValueError):
            restore_checkpoint(p)


def test_checkpoint_roundtrip_new_sampler_states():
    # MHState (MALA), SVGDState and EllipticalSliceState are plain
    # pytrees; save/restore with like= must resume exactly.
    from zhusuan_tpu.mcmc import MALA, EllipticalSlice
    from zhusuan_tpu.variational import SVGD

    def lj(obs):
        return jnp.sum(-0.5 * obs["x"] ** 2, -1)

    mala = MALA(step_size=0.3, adapt_step_size=True)
    m_state = mala.init({"x": jnp.zeros((4, 2))}, n_chain_dims=1)
    m_state, _ = mala.sample(lj, {}, m_state, jax.random.PRNGKey(0))

    svgd = SVGD(learning_rate=0.1)
    s_state = svgd.init({"x": jnp.ones((5, 2))})
    s_state, _ = svgd.update(lj, {}, s_state)

    ess = EllipticalSlice(prior_std=1.0)
    e_state = ess.init({"x": jnp.zeros((4, 2))}, n_chain_dims=1)
    e_state, _ = ess.sample(lj, {}, e_state, jax.random.PRNGKey(1))

    for name, state in [("mala", m_state), ("svgd", s_state),
                        ("ess", e_state)]:
        with tempfile.TemporaryDirectory() as d:
            p = save_checkpoint(os.path.join(d, name), state, step=1,
                                use_orbax=False)
            restored, step = restore_checkpoint(p, like=state)
        assert step == 1
        assert type(restored) is type(state)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored)[0]),
            np.asarray(jax.tree.leaves(state)[0]),
        )

    # Resume each from the restored state type (already validated above
    # for structure); one step must stay finite.
    m2, _ = mala.sample(lj, {}, m_state, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(m2.q["x"])))


class TestRound3ReviewFixes:
    def test_orbax_namedtuple_restore_by_path(self, tmp_path):
        """Orbax restores NamedTuples as dicts with ALPHABETICAL key order;
        a positional unflatten scrambled same-shaped fields (review r3).
        Restore must match leaves by path."""
        pytest.importorskip("orbax.checkpoint")
        from zhusuan_tpu.mcmc.sgmcmc import SGMCMCState

        state = SGMCMCState(
            q={"x": jnp.asarray([1.0, 2.0])},
            t=jnp.asarray(7, jnp.int32),
            v={"x": jnp.asarray([3.0, 4.0])},       # same shape as q
            alpha={"x": jnp.asarray([5.0, 6.0])},   # same shape again
            rms={},
        )
        p = str(tmp_path / "orbax_ckpt")
        save_checkpoint(p, state, step=7, use_orbax=True)
        restored, step = restore_checkpoint(p, like=state)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored.q["x"]), [1, 2])
        np.testing.assert_array_equal(np.asarray(restored.v["x"]), [3, 4])
        np.testing.assert_array_equal(
            np.asarray(restored.alpha["x"]), [5, 6])
        assert int(restored.t) == 7

    def test_npz_bfloat16_roundtrip(self, tmp_path):
        state = {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
                 "b": jnp.ones((), jnp.float32)}
        p = str(tmp_path / "bf16.npz")
        save_checkpoint(p, state, use_orbax=False)
        restored, _ = restore_checkpoint(p)
        assert restored["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(restored["w"], np.float32),
            np.arange(6, dtype=np.float32).reshape(2, 3))

    def test_npz_list_with_none_requires_like(self, tmp_path):
        state = {"a": [jnp.asarray(1.0), None, jnp.asarray(2.0)]}
        p = str(tmp_path / "holes.npz")
        save_checkpoint(p, state, use_orbax=False)
        with pytest.raises(ValueError, match="like"):
            restore_checkpoint(p)
        restored, _ = restore_checkpoint(p, like=state)
        assert restored["a"][1] is None
        assert float(restored["a"][2]) == 2.0
