"""Framework utilities: the context stack binding ``observe`` scopes.

Parity: reference ``zhusuan/framework/utils.py:20-46`` (``Context``). The
context stack is plain thread-local Python state — it only exists while the
model *builder* executes, i.e. at trace time, so it is invisible to XLA and
perfectly compatible with ``jit``/``vmap``/``pjit`` tracing.

The reference's ``get_backward_ops`` graph traversal (utils.py:49-85) is not
rebuilt: it only served the deprecated legacy API, and JAX's functional
tracing makes explicit graph walks unnecessary (SURVEY.md §2.5 [TPU] note).
``reuse_variables`` (utils.py:88-106) is kept as a documented no-op: JAX
parameters are explicit pytrees, so there is nothing to reuse implicitly.
"""

from __future__ import annotations

import functools
import threading
import warnings

__all__ = ["Context", "Local", "reuse_variables", "reuse"]


class Context:
    """A per-class thread-local context stack with ``with`` support."""

    _local = None  # set per subclass
    _init_lock = threading.Lock()

    @classmethod
    def _stack(cls):
        if cls.__dict__.get("_local") is None:
            # Double-checked init under a lock: an unguarded check-then-
            # set lets two threads race on creating the threading.local,
            # and the loser's active stack would be silently discarded
            # mid-`with` (an unobserved net built with no error).
            with Context._init_lock:
                if cls.__dict__.get("_local") is None:
                    cls._local = threading.local()
        if not hasattr(cls._local, "stack"):
            cls._local.stack = []
        return cls._local.stack

    def __enter__(self):
        type(self)._stack().append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        type(self)._stack().pop()

    @classmethod
    def get_context(cls):
        stack = cls._stack()
        if not stack:
            raise RuntimeError("No contexts on the stack.")
        return stack[-1]

    @classmethod
    def try_get_context(cls):
        stack = cls._stack()
        return stack[-1] if stack else None


class Local(Context):
    """The scope created by ``MetaBayesianNet.observe``: carries the
    observation dict, the owning meta net, and the PRNG key that
    ``BayesianNet`` instances constructed inside will pick up.

    Parity: reference ``framework/meta_bn.py:87-91`` (Local carrying
    ``observations`` and ``meta_bn``); the explicit ``key`` is the TPU-native
    addition replacing TF's hidden global RNG.
    """

    def __init__(self, observations=None, meta_bn=None, key=None):
        self.observations = observations or {}
        self.meta_bn = meta_bn
        self.key = key


def reuse_variables(scope):
    """No-op parity shim for reference ``framework/utils.py:88-106``.

    In the reference this wrapped a builder in ``tf.make_template`` so
    repeated ``observe`` calls shared ``tf.Variable``s. JAX parameters are
    explicit pytrees passed into builders, so sharing is the default; the
    decorator is kept so reference code ports without edits.
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return fn(*args, **kwargs)

        return wrapper

    return deco


def reuse(scope):
    """Deprecated alias of :func:`reuse_variables` (reference
    ``framework/utils.py:109-117`` keeps ``reuse`` exported with a
    deprecation warning pointing at ``reuse_variables``)."""
    warnings.warn(
        "zs.reuse is deprecated; use zs.reuse_variables instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    return reuse_variables(scope)
