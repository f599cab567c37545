"""MetaBayesianNet: the reusable model lambda.

Capability parity with reference ``zhusuan/framework/meta_bn.py``:
``MetaBayesianNet`` wrapping a builder with its arguments (meta_bn.py:29-106)
and the ``meta_bayesian_net`` decorator (meta_bn.py:109-148).

TPU-native semantics: ``observe(key, **observations)`` re-executes the
builder inside a ``Local`` context carrying the observation dict and an
explicit PRNG key — pure function application, no ``tf.make_template``
variable reuse needed (JAX parameters are explicit pytrees closed over by the
builder; SURVEY.md §2.5 [TPU] note).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

from zhusuan_tpu.framework.bn import BayesianNet
from zhusuan_tpu.framework.utils import Local

__all__ = ["MetaBayesianNet", "meta_bayesian_net"]


class MetaBayesianNet:
    """A model "lambda": a builder function plus captured arguments that can
    be repeatedly instantiated into :class:`BayesianNet` s under different
    observations.

    :param f: the builder; must return a :class:`BayesianNet`.
    :param args/kwargs: captured builder arguments.

    ``log_joint`` may be set to a callable ``bn -> log_joint`` to override
    the default sum of conditional log-probabilities (reference
    meta_bn.py:69-85) — used e.g. to rescale minibatch likelihoods in
    BNN/SVGP models.
    """

    def __init__(self, f: Callable, args=(), kwargs=None, scope=None):
        self._f = f
        self._args = tuple(args)
        self._kwargs = dict(kwargs or {})
        self._scope = scope  # kept for API parity; unused in JAX
        self._log_joint = None

    @property
    def log_joint(self):
        """Optional user-defined log-joint callable taking the instantiated
        :class:`BayesianNet` (reference meta_bn.py:69-85)."""
        return self._log_joint

    @log_joint.setter
    def log_joint(self, value):
        self._log_joint = value

    def _run_with_local(self, local: Local) -> BayesianNet:
        with local:
            bn = self._f(*self._args, **self._kwargs)
        if not isinstance(bn, BayesianNet):
            raise TypeError(
                "The model builder function should return a BayesianNet "
                "instance, got {!r}.".format(type(bn))
            )
        return bn

    def observe(self, key=None, **observations) -> BayesianNet:
        """Instantiate the model with the given observations.

        Parity: reference ``meta_bn.py:93-106``; the explicit PRNG ``key``
        (first positional argument) replaces TF's hidden global seed. It may
        be omitted for fully observed nets.

        :param key: a ``jax.random`` PRNG key used (split per node name) to
            sample unobserved nodes, or None.
        :param observations: named observations, each broadcastable to the
            corresponding node's ``batch_shape + value_shape``.
        :return: the instantiated :class:`BayesianNet`.
        """
        local = Local(observations=observations, meta_bn=self, key=key)
        return self._run_with_local(local)

    def __repr__(self):
        return "<MetaBayesianNet f={}>".format(getattr(self._f, "__name__", self._f))


def meta_bayesian_net(scope=None, reuse_variables=None):
    """Decorator transforming a builder function into a
    :class:`MetaBayesianNet` factory.

    Parity: reference ``meta_bn.py:109-148``. ``scope`` and
    ``reuse_variables`` are accepted for source compatibility but are no-ops:
    JAX parameters are explicit, so there are no implicitly-created variables
    to scope or reuse.

    Usage::

        @meta_bayesian_net()
        def build_model(params, n_particles):
            bn = BayesianNet()
            ...
            return bn

        model = build_model(params, 32)       # -> MetaBayesianNet
        bn = model.observe(key, x=x_batch)    # -> BayesianNet
    """

    # Support bare-decorator usage: @meta_bayesian_net
    if callable(scope):
        f = scope
        return meta_bayesian_net()(f)

    def deco(f):
        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            return MetaBayesianNet(f, args=args, kwargs=kwargs, scope=scope)

        return wrapped

    return deco
