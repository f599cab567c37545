"""Finite mixture distribution (MixtureSameFamily semantics).

Beyond the reference: upstream ZhuSuan has no mixture head — GMM-style
models there must hand-write the logsumexp marginalization (e.g. the
bimodal toy in ``/root/reference/examples/toy_examples/mixture_sgnht.py``
builds its density inline). ``Mixture`` packages it as a first-class
:class:`~zhusuan_tpu.distributions.Distribution`: the discrete assignment
is marginalized out of ``log_prob`` (a logsumexp over the component axis),
so gradients flow into both the mixture weights and component parameters
with no REINFORCE machinery.

TPU-native design notes:
  * ``log_prob`` is one broadcast component-density evaluation over a
    static K axis + logsumexp — fuses into a single XLA kernel.
  * ``sample`` draws ALL K components and selects with
    ``take_along_axis`` (static shapes; K-fold redundant compute is the
    idiomatic TPU trade against dynamic gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.distributions.base import Distribution

__all__ = ["Mixture"]


class Mixture(Distribution):
    """Mixture of a batched component distribution.

    ``components`` is a single :class:`Distribution` whose LAST batch axis
    (length K) indexes the mixture components — e.g.
    ``Normal(mean=[K], std=[K])`` gives a K-component scalar GMM;
    ``MultivariateNormalCholesky(mean=[K, d], cov_tril=[K, d, d])`` a
    K-component MVN mixture. ``logits`` has shape broadcastable to
    ``components.batch_shape`` (last axis K); mixture weights are
    ``softmax(logits, -1)``.

    The resulting distribution has
    ``batch_shape = components.batch_shape[:-1]`` and the component
    ``value_shape``. ``log_prob`` marginalizes the assignment:
    ``logsumexp(log_softmax(logits) + comp.log_prob(x), -1)``.

    Not reparameterized (the component selection is discrete); for
    relaxed/differentiable sampling use a ``Concrete`` assignment
    explicitly.

    :param logits: unnormalized mixture log-weights, last axis K >= 1.
    :param components: component distribution with K as its last batch
        axis and ``group_ndims == 0``.
    """

    def __init__(
        self,
        logits,
        components,
        group_ndims: int = 0,
        **kwargs,
    ):
        if not isinstance(components, Distribution):
            raise TypeError(
                "components must be a Distribution; got {!r}."
                .format(type(components))
            )
        if components.group_ndims != 0:
            raise ValueError(
                "Mixture requires components with group_ndims=0 (the "
                "mixture marginalization needs per-component densities); "
                "apply group_ndims to the Mixture itself instead."
            )
        self._logits = jnp.asarray(logits)
        if not jnp.issubdtype(self._logits.dtype, jnp.floating):
            raise TypeError("logits must be a float array.")
        if self._logits.ndim < 1:
            raise ValueError("logits must have at least one axis (K).")
        comp_batch = tuple(components.batch_shape)
        if len(comp_batch) < 1:
            raise ValueError(
                "components must have at least one batch axis (the "
                "component axis K); got batch_shape {}.".format(comp_batch)
            )
        k = comp_batch[-1]
        if self._logits.shape[-1] != k:
            raise ValueError(
                "logits last axis ({}) must equal the component axis K "
                "({}).".format(self._logits.shape[-1], k)
            )
        # Full broadcast of the K-indexed batch, then strip K.
        full = np.broadcast_shapes(self._logits.shape, comp_batch)
        self._n_components = int(k)
        self._components = components
        self._mixture_batch_shape = tuple(full[:-1])
        super().__init__(
            dtype=components.dtype,
            param_dtype=self._logits.dtype,
            is_continuous=components.is_continuous,
            is_reparameterized=False,
            group_ndims=group_ndims,
            **kwargs,
        )

    logits = property(lambda self: self._logits,
                      doc="Unnormalized mixture log-weights.")
    components = property(lambda self: self._components,
                          doc="The K-batched component distribution.")
    n_components = property(lambda self: self._n_components,
                            doc="Number of mixture components K.")

    def _batch_shape(self):
        return self._mixture_batch_shape

    def _value_shape(self):
        return tuple(self._components.value_shape)

    @property
    def _value_ndims(self):
        return len(self._components.value_shape)

    def _sample(self, key, n_samples: int):
        key_comp, key_cat = jax.random.split(key)
        # [n] + full_batch + [K] + value: all components, static shapes.
        comp = self._components.sample(key_comp, n_samples=n_samples)
        full = (n_samples,) + tuple(
            np.broadcast_shapes(self._logits.shape,
                                tuple(self._components.batch_shape))
        ) + tuple(self.value_shape)
        comp = jnp.broadcast_to(comp, full)
        # Assignment indices: [n] + batch_shape.
        idx = jax.random.categorical(
            key_cat, self._logits, axis=-1,
            shape=(n_samples,) + self._mixture_batch_shape,
        )
        # Select along the K axis (just before the value axes).
        k_axis = comp.ndim - self._value_ndims - 1
        idx_e = idx.reshape(idx.shape + (1,) * (self._value_ndims + 1))
        picked = jnp.take_along_axis(comp, idx_e, axis=k_axis)
        return jnp.squeeze(picked, axis=k_axis)

    def _log_prob(self, given):
        # Insert the K axis just before the value axes so `given`
        # broadcasts against the K-batched component parameters.
        g = jnp.expand_dims(given, axis=-(self._value_ndims + 1))
        comp_lp = self._components.log_prob(g)  # (...)+batch+[K]
        log_w = jax.nn.log_softmax(self._logits, axis=-1)
        return jax.scipy.special.logsumexp(log_w + comp_lp, axis=-1)
