"""Checkpoint / resume for sampler state and parameters.

Parity note (SURVEY.md §5): the reference has NO checkpointing — all
persistent state lives in tf.Variables and users were expected to wire
tf.train.Saver themselves. Here every piece of state (sampler chains,
adaptation state, model parameters, optimizer state) is an explicit pytree,
so checkpointing is a first-class one-liner: orbax-backed when available,
with a dependency-free ``npz`` fallback.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint"]


def save_checkpoint(path: str, state: Any, step: int = 0, use_orbax=None):
    """Save a pytree (params, HMCState, SGMCMCState, opt state, ...) to
    ``path``.

    :param path: target path (directory for orbax, file for npz).
    :param step: step number stored alongside.
    :param use_orbax: force orbax on/off; default: try orbax, fall back.
    """
    if use_orbax is None or use_orbax:
        try:
            import orbax.checkpoint as ocp

            path = os.path.abspath(path)
            ckpt = ocp.PyTreeCheckpointer()
            ckpt.save(path, {"state": state, "step": step}, force=True)
            return path
        except Exception:
            if use_orbax:
                raise
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        __step__=np.asarray(step),
        **arrays,
    )
    return path + (".npz" if not path.endswith(".npz") else "")


def restore_checkpoint(path: str, like: Any = None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    :param like: optional template pytree; when given, restored leaves are
        cast to its structure/dtypes (needed for NamedTuple states).
    :return: ``(state, step)``.
    """
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if os.path.isfile(npz_path):
        data = np.load(npz_path, allow_pickle=False)
        treedef = pickle.loads(data["__treedef__"].tobytes())
        step = int(data["__step__"])
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        state = jax.tree.unflatten(treedef, leaves)
    else:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(os.path.abspath(path))
        state, step = restored["state"], int(restored["step"])
        if like is not None:
            leaves = jax.tree.leaves(state)
            state = jax.tree.unflatten(
                jax.tree.structure(like), [jnp.asarray(x) for x in leaves]
            )
        return state, step
    if like is not None:
        state = jax.tree.unflatten(
            jax.tree.structure(like), jax.tree.leaves(state)
        )
    return state, step
