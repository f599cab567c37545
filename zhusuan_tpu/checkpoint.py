"""Checkpoint / resume for sampler state and parameters.

Parity note (SURVEY.md §5): the reference has NO checkpointing — all
persistent state lives in tf.Variables and users were expected to wire
tf.train.Saver themselves. Here every piece of state (sampler chains,
adaptation state, model parameters, optimizer state) is an explicit pytree,
so checkpointing is a first-class one-liner: orbax-backed when available,
with a dependency-free ``npz`` fallback.

Security: the npz format is data-only — leaves as arrays plus a JSON key
path list (no pickled code objects), so restoring an untrusted checkpoint
file cannot execute code. dict/list/tuple nesting is rebuilt exactly;
states with attribute nodes (NamedTuples like HMCState) are rebuilt
against a ``like`` template.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, SequenceKey

__all__ = ["save_checkpoint", "restore_checkpoint"]


def _encode_paths(tree):
    """Data-only path encoding: one entry list per leaf, in jax leaf order.

    Entry forms: ``["d", key]`` dict key, ``["s", idx]`` sequence index,
    ``["a", name]`` attribute (NamedTuple field), ``["i", idx]`` flattened
    index (opaque custom nodes).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, _leaf in flat:
        entries = []
        for p in path:
            if isinstance(p, DictKey):
                if not isinstance(p.key, str):
                    entries.append(["i", repr(p.key)])
                else:
                    entries.append(["d", p.key])
            elif isinstance(p, SequenceKey):
                entries.append(["s", p.idx])
            elif isinstance(p, GetAttrKey):
                entries.append(["a", p.name])
            elif isinstance(p, FlattenedIndexKey):
                entries.append(["i", p.key])
            else:
                entries.append(["i", repr(p)])
        out.append(entries)
    return out


def _rebuild_from_paths(paths, leaves):
    """Rebuild dict/list nesting from encoded paths; None when the tree
    contains attribute/opaque nodes (caller must pass ``like``)."""
    if any(kind not in ("d", "s") for path in paths for kind, _ in path):
        return None

    def insert(container, path, leaf):
        kind, key = path[0]
        if len(path) == 1:
            container[key] = leaf
            return
        child = container.get(key)
        if child is None:
            child = {}
            container[key] = child
        insert(child, path[1:], leaf)

    def finalize(node, kinds_at):
        if not isinstance(node, dict):
            return node
        if not node:  # empty container: dict is the only faithful guess
            return {}
        keys = sorted(node.keys(), key=lambda k: (str(type(k)), k))
        if all(isinstance(k, int) for k in keys):
            if keys != list(range(len(keys))):
                # A list/tuple with None entries was saved: None is
                # structure, not a leaf, so the indices have holes and
                # the sequence cannot be rebuilt faithfully without a
                # template.
                raise ValueError(
                    "This checkpoint contains a sequence with None "
                    "entries (indices {}); pass `like=` (a template "
                    "state) to restore it faithfully.".format(keys)
                )
            return [finalize(node[i], kinds_at) for i in range(len(keys))]
        return {k: finalize(node[k], kinds_at) for k in node}

    root: dict = {}
    for path, leaf in zip(paths, leaves):
        if not path:  # single-leaf tree
            return leaf
        insert(root, path, leaf)
    return finalize(root, None)


def _dtype_from_name(name: str) -> np.dtype:
    """Resolve a dtype name, including ml_dtypes names ('bfloat16',
    'float8_e4m3fn', ...) that plain ``np.dtype`` does not accept."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


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
    leaves = jax.tree.leaves(state)
    arrays = {}
    exotic = {}  # leaf index -> [dtype name, shape] for npz-hostile dtypes
    for i, x in enumerate(leaves):
        arr = np.asarray(x)
        if arr.dtype.kind == "V":
            # ml_dtypes types (bfloat16, float8_*) register as void in
            # npy headers and round-trip as unusable '|V' blobs — store
            # raw bytes + (dtype, shape) metadata instead.
            exotic[i] = [arr.dtype.name, list(arr.shape)]
            arr = np.frombuffer(arr.tobytes(), dtype=np.uint8)
        arrays[f"leaf_{i}"] = arr
    paths_json = json.dumps(_encode_paths(state))
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        __paths__=np.frombuffer(paths_json.encode("utf-8"), dtype=np.uint8),
        __exotic__=np.frombuffer(
            json.dumps(exotic).encode("utf-8"), dtype=np.uint8
        ),
        __step__=np.asarray(step),
        **arrays,
    )
    return path + (".npz" if not path.endswith(".npz") else "")


def restore_checkpoint(path: str, like: Any = None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    :param like: optional template pytree; restored leaves are unflattened
        into its structure (leaf count verified). Required for states with
        NamedTuple/custom nodes; plain dict/list/tuple nesting restores
        without it (tuples come back as lists). ``None``-valued entries
        are pytree *structure*, not leaves — the npz format does not
        record them, so a no-``like`` restore omits them; pass ``like=``
        to restore trees containing ``None`` faithfully.
    :return: ``(state, step)``.
    """
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if os.path.isfile(npz_path):
        data = np.load(npz_path, allow_pickle=False)
        if "__treedef__" in data.files:
            raise ValueError(
                "This checkpoint uses the old pickled-treedef npz format "
                "(insecure; removed). Re-save it with the current "
                "save_checkpoint, or restore it with the release that "
                "wrote it."
            )
        paths = json.loads(data["__paths__"].tobytes().decode("utf-8"))
        step = int(data["__step__"])
        exotic = (
            json.loads(data["__exotic__"].tobytes().decode("utf-8"))
            if "__exotic__" in data.files else {}
        )
        leaves = []
        for i in range(len(paths)):
            arr = data[f"leaf_{i}"]
            meta = exotic.get(str(i))
            if meta is not None:
                name, shape = meta
                arr = np.frombuffer(
                    arr.tobytes(), dtype=_dtype_from_name(name)
                ).reshape(shape)
            leaves.append(jnp.asarray(arr))
        if like is not None:
            structure = jax.tree.structure(like)
            if structure.num_leaves != len(leaves):
                raise ValueError(
                    "Checkpoint has {} leaves but `like` template has "
                    "{}.".format(len(leaves), structure.num_leaves)
                )
            return jax.tree.unflatten(structure, leaves), step
        rebuilt = _rebuild_from_paths(paths, leaves)
        if rebuilt is None:
            raise ValueError(
                "This checkpoint contains NamedTuple/custom pytree nodes; "
                "pass `like=` (a template state) to restore its structure."
            )
        return rebuilt, step
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    state, step = restored["state"], int(restored["step"])
    if like is not None:
        # Orbax restores custom nodes (NamedTuples, ...) as plain dicts,
        # whose jax leaf order is ALPHABETICAL by key — not the field
        # declaration order of `like` — so a positional unflatten would
        # scramble same-shaped fields (q <-> momentum, mean <-> var).
        # Match leaves to the template BY PATH instead.
        state = _restore_like_by_path(like, state)
    return state, step


def _restore_like_by_path(like, restored):
    """Rebuild ``like``'s structure from an orbax-restored container tree,
    resolving each template leaf path against dict/list nesting (attribute
    names become dict keys in the restored tree)."""
    flat_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, _ in flat_like:
        node = restored
        walked = []
        for p in path:
            if isinstance(p, DictKey):
                key = p.key
            elif isinstance(p, GetAttrKey):
                key = p.name
            elif isinstance(p, SequenceKey):
                key = p.idx
            elif isinstance(p, FlattenedIndexKey):
                key = p.key
            else:  # pragma: no cover - unknown key type
                raise ValueError(
                    "Cannot resolve pytree path entry {!r} against the "
                    "restored checkpoint.".format(p)
                )
            walked.append(key)
            try:
                if isinstance(node, dict):
                    node = node[key] if key in node else node[str(key)]
                else:
                    node = node[int(key)]
            except (KeyError, IndexError, TypeError, ValueError):
                raise ValueError(
                    "Checkpoint does not contain a value at path {} "
                    "required by the `like` template.".format(walked)
                )
        leaves.append(jnp.asarray(node))
    return jax.tree_util.tree_unflatten(treedef, leaves)
