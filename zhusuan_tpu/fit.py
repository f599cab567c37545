"""Packaged scanned training loops: make the fast path the default path.

The reference's training pattern is a Python loop with one ``sess.run``
per minibatch (e.g. examples/variational_autoencoders/vae.py:94-107).
Translated literally to JAX that becomes one jitted call + host dispatch
per step — measured 7.7x slower than a scanned epoch on this runtime,
where per-call dispatch crosses the axon tunnel (BENCH_r02, PERF.md).
This module packages the scanned-epoch pattern so user code keeps the
reference's ergonomics ("loop over epochs, see a loss history") while
each epoch runs as ONE on-device ``lax.scan`` program.

TPU-native notes: batches are a static ``[n_batches, batch, ...]``
reshape (static shapes — XLA requirement); per-epoch shuffling uses
``jax.random.permutation`` on device; the optimizer update is inside the
scan body so XLA fuses it with the backward pass.
"""

from __future__ import annotations

import functools as _functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_fit_epoch", "fit_scan"]


def make_fit_epoch(loss_fn: Callable, optimizer) -> Callable:
    """Build a jitted epoch function from ``loss_fn(params, batch, key)``
    (scalar loss) and an optax-style optimizer (``init``/``update``).

    Returns ``epoch_fn(params, opt_state, batches, key) ->
    (params, opt_state, losses)`` where ``batches`` is a pytree whose
    leaves carry a leading ``[n_batches, batch_size, ...]`` axis and
    ``losses`` is the per-step loss vector ``[n_batches]``. The whole
    epoch is one ``lax.scan`` — dispatch cost is one call per epoch, not
    per step.

    Memoized on ``(loss_fn, optimizer)`` when both are hashable (plain
    functions and optax GradientTransformations are), so repeated
    ``fit_scan`` calls — e.g. a train/eval stage loop — reuse the SAME
    jit wrapper and its compiled program instead of re-tracing (a cold
    compile costs ~30-300s on the remote-compile runtime, CLAUDE.md).
    """
    try:
        return _make_fit_epoch_cached(loss_fn, optimizer)
    except TypeError:  # unhashable loss_fn/optimizer: build uncached
        return _make_fit_epoch(loss_fn, optimizer)


def _make_fit_epoch(loss_fn: Callable, optimizer) -> Callable:

    @jax.jit
    def epoch_fn(params, opt_state, batches, key):
        n_batches = jax.tree.leaves(batches)[0].shape[0]

        def body(carry, inp):
            p, o = carry
            batch, k = inp
            loss, grads = jax.value_and_grad(loss_fn)(p, batch, k)
            updates, o = optimizer.update(grads, o, p)
            return (_apply(p, updates), o), loss

        keys = jax.random.split(key, n_batches)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, keys)
        )
        return params, opt_state, losses

    return epoch_fn


@_functools.lru_cache(maxsize=64)
def _make_fit_epoch_cached(loss_fn, optimizer):
    return _make_fit_epoch(loss_fn, optimizer)


def _apply(params, updates):
    """optax.apply_updates without importing optax at module load."""
    return jax.tree.map(lambda p, u: (p + u).astype(p.dtype), params,
                        updates)


def _batch(data, n_batches: int, batch_size: int, perm):
    """Shuffle (optional) + static reshape to [n_batches, batch, ...]."""
    n_used = n_batches * batch_size

    def one(x):
        x = x[perm[:n_used]] if perm is not None else x[:n_used]
        return x.reshape((n_batches, batch_size) + x.shape[1:])

    return jax.tree.map(one, data)


def fit_scan(
    loss_fn: Callable,
    params: Any,
    optimizer,
    data: Any,
    *,
    key,
    epochs: int = 1,
    batch_size: int = 128,
    opt_state: Any = None,
    shuffle: bool = True,
    callback: Optional[Callable[[int, float], None]] = None,
) -> Tuple[Any, Any, np.ndarray]:
    """Train ``params`` with scanned epochs (reference train-loop
    ergonomics, one on-device program per epoch).

    :param loss_fn: ``(params, batch, key) -> scalar loss`` where
        ``batch`` is a pytree slice of ``data`` with a leading
        ``batch_size`` axis.
    :param params: initial parameter pytree.
    :param optimizer: optax-style ``GradientTransformation``.
    :param data: pytree of arrays with a shared leading example axis
        (device or host; placed on device once, not per step). A
        trailing remainder smaller than ``batch_size`` is dropped each
        epoch (static shapes).
    :param key: PRNG key; consumed for shuffling and per-step loss keys.
    :param opt_state: optional initial optimizer state (``optimizer
        .init(params)`` otherwise).
    :param callback: optional host callback ``(epoch, mean_loss)`` run
        after each epoch (printing, early logging).
    :return: ``(params, opt_state, history)`` with ``history`` the
        ``[epochs, n_batches]`` per-step loss matrix (host numpy).

    Example (the VAE pattern)::

        params, opt_state, hist = fit_scan(
            lambda p, x, k: elbo_loss(p, x, k, z_dim),
            params, optax.adam(1e-3), x_train,
            key=key, epochs=10, batch_size=128)
    """
    if opt_state is None:
        opt_state = optimizer.init(params)
    data = jax.tree.map(jnp.asarray, data)
    n = jax.tree.leaves(data)[0].shape[0]
    n_batches = n // int(batch_size)
    if n_batches < 1:
        raise ValueError(
            "batch_size {} exceeds the dataset size {}.".format(
                batch_size, n)
        )
    epoch_fn = make_fit_epoch(loss_fn, optimizer)

    history = []
    for epoch in range(int(epochs)):
        key, k_perm, k_epoch = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n) if shuffle else None
        batches = _batch(data, n_batches, int(batch_size), perm)
        params, opt_state, losses = epoch_fn(
            params, opt_state, batches, k_epoch
        )
        losses = np.asarray(losses)
        history.append(losses)
        if callback is not None:
            callback(epoch, float(losses.mean()))
    return params, opt_state, np.stack(history)
