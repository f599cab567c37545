"""Mesh construction and sharding helpers.

TPU-native replacements for the reference's multi-GPU example helper
(``examples/utils/multi_gpu.py``): SPMD over a ``jax.sharding.Mesh`` with
XLA collectives riding ICI, instead of in-graph tower replication with
CPU-side gradient averaging.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "chain_mesh",
    "shard_chains",
    "replicated",
    "data_parallel_grad",
    "sharded_run",
    "shard_params_tp",
    "tp_last_axis_rule",
]


def chain_mesh(n_devices: Optional[int] = None, axis_name: str = "chains"):
    """Build a 1-D device mesh over which the leading chain/particle axis is
    sharded — the PPL's flagship parallel axis (SURVEY.md §2.10 row 1).

    :param n_devices: number of devices (default: all). Requesting more
        devices than the backend exposes raises — a silently smaller mesh
        would make :func:`shard_chains` quietly replicate arrays the
        caller sized for ``n_devices``-way sharding.
    :param axis_name: mesh axis name.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                "chain_mesh: requested {} devices but the backend exposes "
                "only {}.".format(n_devices, len(devices))
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_chains(mesh: Mesh, pytree, axis_name: str = "chains"):
    """Place a latent/state pytree with a leading chain axis so that axis is
    sharded across ``mesh``. Everything downstream (HMC/SGMCMC kernels,
    log-prob evaluation) then runs SPMD with zero cross-device traffic —
    chains are independent.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    n_dev = mesh.shape[axis_name]

    def place(x):
        x = jnp.asarray(x)
        # Only arrays whose leading axis is divisible by the device count
        # carry the chain axis; everything else (scalars, adaptation state
        # with broadcast leading 1s) is replicated.
        if x.ndim >= 1 and x.shape[0] % n_dev == 0 and x.shape[0] >= n_dev:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, pytree)


def replicated(mesh: Mesh, pytree):
    """Fully replicate a pytree (e.g. model parameters) across ``mesh``."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding),
                        pytree)


def data_parallel_grad(
    loss_fn: Callable,
    mesh: Mesh,
    axis_name: str = "dp",
    argnums=0,
):
    """Build a data-parallel value-and-grad function: the minibatch is
    sharded over ``axis_name``; per-shard gradients are ``pmean``-reduced
    over ICI inside ``shard_map``.

    Replaces reference ``examples/utils/multi_gpu.py:24-60``
    (``average_gradients``) with a single XLA all-reduce.

    :param loss_fn: ``loss_fn(params, batch, key) -> scalar`` where the
        loss is a mean over the batch shard.
    :return: ``f(params, batch, key) -> (loss, grads)`` with batch sharded
        on its leading axis and params/grads replicated.
    """
    from jax import shard_map

    # Differentiate THROUGH shard_map: the forward computes the pmean of the
    # per-shard losses; AD transposes the collectives correctly (note the
    # replicated-param cotangent is psum'd automatically under shard_map's
    # varying-axes semantics — hand-rolled per-shard grad + pmean would
    # double count).
    def per_shard(p, b, k):
        # Independent noise per shard: fold the shard index into the key
        # (a replicated key would give every device identical draws and
        # forfeit the variance reduction of N-way data parallelism).
        k = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
        return jax.lax.pmean(loss_fn(p, b, k), axis_name)

    sharded_loss = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=P(),
    )
    return jax.jit(jax.value_and_grad(sharded_loss, argnums=argnums))


def tp_last_axis_rule(mesh: Mesh, axis_name: str = "tp"):
    """The default TP placement rule: shard the LAST (output) axis over
    ``axis_name`` for any array whose last axis divides evenly; replicate
    everything else. Returns a ``rule(path, leaf) -> PartitionSpec``.

    This is a *heuristic* — an array whose last axis is incidentally
    divisible gets sharded too. Pass a custom ``rule`` to
    :func:`shard_params_tp` (e.g. matching on the pytree key path) for
    models where that matters.
    """
    n_dev = mesh.shape[axis_name]

    def rule(path, x):
        del path
        if x.ndim >= 1 and x.shape[-1] % n_dev == 0 and x.shape[-1] >= n_dev:
            return P(*([None] * (x.ndim - 1) + [axis_name]))
        return P()

    return rule


def shard_params_tp(mesh: Mesh, params, axis_name: str = "tp", rule=None):
    """Tensor-parallel placement for parameter pytrees. XLA inserts the
    all-gathers / reduce-scatters over ICI at use sites.

    SURVEY.md §2.10 row 3 ("optional TP: shard large BNN weight matrices /
    GP Gram matrices") made first-class.

    :param rule: ``rule(path, leaf) -> PartitionSpec`` deciding each leaf's
        placement; ``path`` is the ``jax.tree_util.keystr`` of the leaf.
        Defaults to :func:`tp_last_axis_rule` (last-axis-divisible
        heuristic: 2-D weights sharded on the output axis, biases likewise,
        scalars replicated).
    """
    if rule is None:
        rule = tp_last_axis_rule(mesh, axis_name)

    def place(path, x):
        x = jnp.asarray(x)
        spec = rule(jax.tree_util.keystr(path), x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def sharded_run(mesh: Mesh, fn: Callable, state, key, axis_name="chains"):
    """Jit-compile ``fn(state, key)`` with the chain axis of ``state``
    sharded over ``mesh`` and outputs sharded the same way. ``fn`` is
    typically a closure over ``sampler.run``."""
    state_sharded = shard_chains(mesh, state, axis_name)
    f = jax.jit(fn)
    return f(state_sharded, key)
