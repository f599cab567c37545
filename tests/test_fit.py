"""fit_scan / make_fit_epoch — the packaged scanned training loop
(VERDICT r2 item 8: the 7.7x host-loop dispatch penalty must not be the
default user experience)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import zhusuan_tpu as zs


def quad_loss(params, batch, key):
    # Least squares: recoverable optimum, deterministic gradient.
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"]) ** 2)


def make_data(n=512, d=4, seed=0):
    rng = np.random.RandomState(seed)
    w_true = rng.randn(d).astype(np.float64)
    x = rng.randn(n, d).astype(np.float64)
    y = x @ w_true + 0.7
    return {"x": x, "y": y}, w_true


class TestFitScan:
    def test_converges_to_least_squares(self):
        data, w_true = make_data()
        params = {"w": jnp.zeros(4, jnp.float64),
                  "b": jnp.zeros((), jnp.float64)}
        params, opt_state, hist = zs.fit_scan(
            quad_loss, params, optax.adam(0.05), data,
            key=jax.random.PRNGKey(0), epochs=60, batch_size=64,
        )
        assert hist.shape == (60, 8)
        assert hist[-1].mean() < 1e-3
        np.testing.assert_allclose(np.asarray(params["w"]), w_true,
                                   atol=0.02)
        np.testing.assert_allclose(float(params["b"]), 0.7, atol=0.02)

    def test_epoch_matches_manual_step_loop(self):
        # One scanned epoch == the same steps taken one-by-one (same
        # keys, shuffle off): bit-for-bit parameter agreement.
        data, _ = make_data(n=256)
        optimizer = optax.sgd(0.1)
        params = {"w": jnp.zeros(4, jnp.float64),
                  "b": jnp.zeros((), jnp.float64)}
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(3)

        epoch_fn = zs.make_fit_epoch(quad_loss, optimizer)
        batches = jax.tree.map(
            lambda x: jnp.asarray(x).reshape((4, 64) + x.shape[1:]), data
        )
        p_scan, _, losses = epoch_fn(params, opt_state, batches, key)

        p_manual, o_manual = params, opt_state
        for i, k in enumerate(jax.random.split(key, 4)):
            batch = jax.tree.map(lambda x: x[i], batches)
            loss, grads = jax.value_and_grad(quad_loss)(
                p_manual, batch, k)
            updates, o_manual = optimizer.update(grads, o_manual, p_manual)
            p_manual = optax.apply_updates(p_manual, updates)
            np.testing.assert_allclose(float(losses[i]), float(loss),
                                       rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(p_scan["w"]),
                                      np.asarray(p_manual["w"]))

    def test_remainder_dropped_and_callback(self):
        data, _ = make_data(n=300)  # 300 // 128 = 2 batches, 44 dropped
        params = {"w": jnp.zeros(4, jnp.float64),
                  "b": jnp.zeros((), jnp.float64)}
        seen = []
        _, _, hist = zs.fit_scan(
            quad_loss, params, optax.adam(0.01), data,
            key=jax.random.PRNGKey(1), epochs=2, batch_size=128,
            callback=lambda e, l: seen.append((e, l)),
        )
        assert hist.shape == (2, 2)
        assert [e for e, _ in seen] == [0, 1]

    def test_batch_size_too_large_raises(self):
        data, _ = make_data(n=32)
        params = {"w": jnp.zeros(4, jnp.float64),
                  "b": jnp.zeros((), jnp.float64)}
        with pytest.raises(ValueError, match="batch_size"):
            zs.fit_scan(quad_loss, params, optax.adam(0.01), data,
                        key=jax.random.PRNGKey(0), batch_size=64)

    def test_vae_elbo_improves(self):
        # The flagship pattern from docs/vae.md on tiny shapes.
        from examples.variational_autoencoders.vae import (
            elbo_loss, init_params,
        )

        key = jax.random.PRNGKey(0)
        x = (jax.random.uniform(key, (256, 784)) < 0.4).astype(
            jnp.float32)
        params = init_params(jax.random.PRNGKey(1))
        params, _, hist = zs.fit_scan(
            lambda p, xb, k: elbo_loss(p, xb, k, 40),
            params, optax.adam(1e-3), x,
            key=jax.random.PRNGKey(2), epochs=3, batch_size=64,
        )
        assert hist[-1].mean() < hist[0].mean()  # loss (=-ELBO) falls


class TestEpochFnMemoization:
    def test_same_loss_and_optimizer_reuse_epoch_fn(self):
        opt = optax.adam(1e-2)
        f1 = zs.make_fit_epoch(quad_loss, opt)
        f2 = zs.make_fit_epoch(quad_loss, opt)
        assert f1 is f2  # same compiled program across fit_scan calls

    def test_distinct_optimizers_get_distinct_fns(self):
        f1 = zs.make_fit_epoch(quad_loss, optax.adam(1e-2))
        f2 = zs.make_fit_epoch(quad_loss, optax.adam(1e-3))
        assert f1 is not f2

    def test_staged_fit_continues_training(self):
        # Two 30-epoch stages == continued optimization (loss keeps
        # falling), exercising the memoized path end-to-end.
        data, w_true = make_data()
        opt = optax.adam(0.05)
        params = {"w": jnp.zeros(4, jnp.float64),
                  "b": jnp.zeros((), jnp.float64)}
        params, opt_state, h1 = zs.fit_scan(
            quad_loss, params, opt, data,
            key=jax.random.PRNGKey(0), epochs=30, batch_size=64)
        params, opt_state, h2 = zs.fit_scan(
            quad_loss, params, opt, data,
            key=jax.random.PRNGKey(1), epochs=30, batch_size=64,
            opt_state=opt_state)
        assert h2[-1].mean() < h1[-1].mean() < h1[0].mean()
        np.testing.assert_allclose(np.asarray(params["w"]), w_true,
                                   atol=0.05)
