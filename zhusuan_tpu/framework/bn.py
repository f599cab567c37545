"""BayesianNet: the traced directed-graphical-model builder.

Capability parity with reference ``zhusuan/framework/bn.py``:
``StochasticTensor`` (bn.py:26-316), ``BayesianNet`` with
``stochastic``/``deterministic``/``get``/``cond_log_prob``/``log_joint``
(bn.py:319-497) and one sugar method per distribution (bn.py:556-1189).

TPU-native design (SURVEY.md §2.5 [TPU]): the builder is a *pure traced
function*. A ``BayesianNet`` carries an explicit observation dict and a PRNG
key; each stochastic node derives its own subkey deterministically from the
node *name* (``fold_in(key, crc32(name))``), so sampling is reproducible and
stable under ``jit``/``vmap``/``scan`` regardless of node creation order.
There is no mutable global state: "lazily sampled, cached" node tensors
(reference bn.py:164-175) become per-trace Python attribute caching, which is
sound because node objects live only within one builder execution.
"""

from __future__ import annotations

import warnings
import zlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu import distributions
from zhusuan_tpu.framework.arith import TensorArithmeticMixin
from zhusuan_tpu.framework.utils import Context, Local

__all__ = ["StochasticTensor", "BayesianNet"]


def _name_to_fold_data(name: str) -> int:
    """Deterministic, process-stable per-site key derivation data."""
    return zlib.crc32(name.encode("utf-8"))


class StochasticTensor(TensorArithmeticMixin):
    """A named random-variable node owned by a :class:`BayesianNet`.

    ``tensor`` is the observation if the node is observed, else a sample
    drawn once (lazily, cached) from ``dist`` using the net's PRNG key.
    ``cond_log_p`` is ``dist.log_prob(tensor)``, cached. Parity: reference
    ``bn.py:26-316``; arithmetic mixin makes the node usable directly in
    ``jnp`` expressions.
    """

    def __init__(self, bn, name, dist, observation=None, n_samples=None):
        self._bn = bn
        self._name = name
        self._dist = dist
        self._n_samples = n_samples
        self._observation = None
        if observation is not None:
            self._observation = self._check_observation(observation)
        self._tensor = None
        self._cond_log_p = None

    def _check_observation(self, observation):
        observation = jnp.asarray(observation)
        obs_dtype = np.dtype(observation.dtype)
        dist_dtype = np.dtype(self._dist.dtype)
        if obs_dtype != dist_dtype:
            # Same-kind mismatches (e.g. float64 observation on a float32
            # distribution) are cast; cross-kind mismatches (int vs float)
            # are errors, matching reference bn.py:96-115.
            if obs_dtype.kind == dist_dtype.kind:
                observation = observation.astype(dist_dtype)
            else:
                raise ValueError(
                    "Observed tensor for node '{}' has dtype {}, which does "
                    "not match the distribution dtype {}.".format(
                        self._name, observation.dtype, self._dist.dtype
                    )
                )
        expected = tuple(self._dist.batch_shape) + tuple(self._dist.value_shape)
        try:
            np.broadcast_shapes(observation.shape, expected)
        except ValueError:
            raise ValueError(
                "Observed tensor for node '{}' has shape {}, which cannot "
                "broadcast to match batch_shape + value_shape of the "
                "distribution ({} + {}).".format(
                    self._name,
                    observation.shape,
                    self._dist.batch_shape,
                    self._dist.value_shape,
                )
            )
        return observation

    # -- identity ------------------------------------------------------ #
    name = property(lambda self: self._name, doc="Name of the node.")
    bn = property(lambda self: self._bn, doc="The owning BayesianNet.")
    dist = property(lambda self: self._dist, doc="The followed distribution.")
    distribution = property(lambda self: self._dist)

    @property
    def is_observed(self) -> bool:
        """Whether the node is observed."""
        return self._observation is not None

    # -- dist metadata passthrough ------------------------------------- #
    dtype = property(lambda self: self._dist.dtype)
    n_samples = property(lambda self: self._n_samples)

    @property
    def tensor(self):
        """Observation if observed, else a cached sample."""
        if self._observation is not None:
            return self._observation
        if self._tensor is None:
            key = self._bn._key_for(self._name)
            self._tensor = self._dist.sample(key, n_samples=self._n_samples)
        return self._tensor

    @property
    def cond_log_p(self):
        """Cached ``dist.log_prob(self.tensor)`` (reference bn.py:195-204)."""
        if self._cond_log_p is None:
            self._cond_log_p = self._dist.log_prob(self.tensor)
        return self._cond_log_p

    # Convenience passthroughs (non-deprecated here; the reference kept them
    # with FutureWarnings at bn.py:216-303).
    def sample(self, key, n_samples=None):
        return self._dist.sample(key, n_samples=n_samples)

    def log_prob(self, given):
        return self._dist.log_prob(given)

    def prob(self, given):
        return self._dist.prob(given)

    def __repr__(self):
        return "<StochasticTensor '{}' {} observed={}>".format(
            self._name, type(self._dist).__name__, self.is_observed
        )


class BayesianNet(Context):
    """A Bayesian network under construction: a dict of named stochastic and
    deterministic nodes with conditional log-probability queries.

    Two construction modes:

    1. Direct (fully functional)::

        bn = BayesianNet(observed={"x": x}, key=key)

    2. Inside a builder executed by ``MetaBayesianNet.observe`` — the
       observation dict and key are picked up from the enclosing ``Local``
       context (parity with reference bn.py:319-346).

    Query API parity: ``get``/``bn[name]`` (bn.py:422-435,480),
    ``cond_log_prob`` (bn.py:437-452), ``log_joint`` (bn.py:454-478,
    overridable via ``meta_bn.log_joint``).
    """

    def __init__(
        self,
        observed: Optional[Dict[str, jnp.ndarray]] = None,
        key=None,
    ):
        self._nodes: Dict[str, object] = {}
        self._log_joint_cache = None
        local = Local.try_get_context()
        if local is not None:
            self._observed = dict(local.observations)
            if observed:
                self._observed.update(observed)
            self._meta_bn = local.meta_bn
            self._key = key if key is not None else local.key
        else:
            self._observed = dict(observed) if observed else {}
            self._meta_bn = None
            self._key = key

    # -- internals ----------------------------------------------------- #
    def _key_for(self, name: str):
        if self._key is None:
            raise ValueError(
                "Node '{}' is unobserved and needs to be sampled, but no "
                "PRNG key was provided. Pass `key=` to BayesianNet(...) or "
                "to MetaBayesianNet.observe(key, ...).".format(name)
            )
        return jax.random.fold_in(self._key, _name_to_fold_data(name))

    def _get_observation(self, name):
        return self._observed.get(name, None)

    # -- node creation ------------------------------------------------- #
    @property
    def nodes(self):
        """Dict of all named nodes (stochastic and deterministic)."""
        return self._nodes

    @property
    def observed(self):
        """The observation dict bound to this net."""
        return self._observed

    def _register_node(self, name, node):
        """Register a node under ``name`` (duplicate-checked) and invalidate
        the cached log-joint. Shared by :meth:`stochastic`,
        :meth:`deterministic`, and the legacy self-registering wrappers
        (reference bn.py:75-80 registered via ``bn.nodes[name] = self``)."""
        if name in self._nodes:
            raise ValueError(
                "There exists a node with name '{}' in the BayesianNet. "
                "Names should be unique.".format(name)
            )
        self._log_joint_cache = None
        self._nodes[name] = node
        return node

    def stochastic(self, name, dist, n_samples=None) -> StochasticTensor:
        """Add a stochastic node following ``dist``; returns the node.

        Parity: reference ``bn.py:348-371``.
        """
        node = StochasticTensor(
            self, name, dist,
            observation=self._get_observation(name),
            n_samples=n_samples,
        )
        return self._register_node(name, node)

    def deterministic(self, name, input_tensor):
        """Add a named deterministic node; returns the tensor itself.

        Parity: reference ``bn.py:373-385``.
        """
        input_tensor = jnp.asarray(input_tensor)
        return self._register_node(name, input_tensor)

    # -- deprecated use-as-context (reference bn.py:1193-1198) ---------- #
    def __enter__(self):
        warnings.warn(
            "Using `BayesianNet` as contexts has been deprecated. "
            "Please see the concepts tutorial for the suggested way of "
            "model construction.",
            FutureWarning,
        )
        return super().__enter__()

    # -- queries ------------------------------------------------------- #
    def _check_name_exist(self, name, only_stochastic=False):
        if not isinstance(name, str):
            raise TypeError(
                "Expected string in `name_or_names`, got {!r} of type "
                "{}.".format(name, type(name))
            )
        if name not in self._nodes:
            raise ValueError(
                "There isn't a node named '{}' in the BayesianNet.".format(name)
            )
        if only_stochastic and not isinstance(
            self._nodes[name], StochasticTensor
        ):
            raise ValueError(
                "Node '{}' is deterministic (input or output).".format(name)
            )
        return name

    def _check_names_exist(self, name_or_names, only_stochastic=False):
        if isinstance(name_or_names, str):
            names = (name_or_names,)
        else:
            name_or_names = tuple(name_or_names)
            names = name_or_names
        for name in names:
            self._check_name_exist(name, only_stochastic=only_stochastic)
        return name_or_names

    def get(self, name_or_names):
        """Get node(s) by name; list in, list out (reference bn.py:422-435)."""
        name_or_names = self._check_names_exist(name_or_names)
        if isinstance(name_or_names, tuple):
            return [self._nodes[name] for name in name_or_names]
        return self._nodes[name_or_names]

    def cond_log_prob(self, name_or_names):
        """Conditional log-probabilities of stochastic nodes at their current
        values (reference bn.py:437-452)."""
        name_or_names = self._check_names_exist(
            name_or_names, only_stochastic=True
        )
        if isinstance(name_or_names, tuple):
            return [self._nodes[name].cond_log_p for name in name_or_names]
        return self._nodes[name_or_names].cond_log_p

    def _default_log_joint(self):
        terms = [
            node.cond_log_p
            for node in self._nodes.values()
            if isinstance(node, StochasticTensor)
        ]
        if not terms:
            raise ValueError(
                "log_joint called on a BayesianNet with no stochastic nodes."
            )
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    def log_joint(self):
        """Sum of conditional log-probabilities of all stochastic nodes,
        overridable via ``meta_bn.log_joint`` (reference bn.py:454-478)."""
        if self._log_joint_cache is None:
            meta_bn = self._meta_bn
            if meta_bn is None or meta_bn.log_joint is None:
                self._log_joint_cache = self._default_log_joint()
            elif callable(meta_bn.log_joint):
                self._log_joint_cache = meta_bn.log_joint(self)
            else:
                raise TypeError(
                    "meta_bn.log_joint is set to a non-callable instance: "
                    "{!r}".format(meta_bn.log_joint)
                )
        return self._log_joint_cache

    def __getitem__(self, name):
        name = self._check_name_exist(name)
        return self._nodes[name]

    def __setitem__(self, name, node):
        raise TypeError(
            "BayesianNet instance does not support replacement of existing "
            "nodes. Pass observations via MetaBayesianNet.observe or the "
            "`observed=` constructor argument."
        )

    def __contains__(self, name):
        return name in self._nodes

    # -- compatibility query API (deprecated in reference 0.4,
    #    bn.py:1200-1249, but still used by its shipped examples) -------- #
    def outputs(self, name_or_names):
        """Node value(s) by name. Compatibility alias for
        ``get(...).tensor`` (reference bn.py:1200-1214)."""
        name_or_names = self._check_names_exist(name_or_names)
        if isinstance(name_or_names, tuple):
            return [
                self._node_value(self._nodes[name]) for name in name_or_names
            ]
        return self._node_value(self._nodes[name_or_names])

    @staticmethod
    def _node_value(node):
        return node.tensor if isinstance(node, StochasticTensor) else node

    def local_log_prob(self, name_or_names):
        """Compatibility alias of :meth:`cond_log_prob`
        (reference bn.py:1216-1226)."""
        return self.cond_log_prob(name_or_names)

    def query(self, name_or_names, outputs=False, local_log_prob=False):
        """Query values and/or conditional log-probs in one call.

        Compatibility with reference ``bn.py:1228-1249``: returns
        ``(value, log_prob)`` tuples (or a list of them for multiple
        names) depending on the selected options.
        """
        name_or_names = self._check_names_exist(name_or_names)
        ret = []
        if outputs:
            ret.append(self.outputs(name_or_names))
        if local_log_prob:
            ret.append(self.local_log_prob(name_or_names))
        if len(ret) == 0:
            raise ValueError("No query options are selected.")
        if isinstance(name_or_names, tuple):
            return list(zip(*ret))
        return tuple(ret)

    # -- sugar methods (one per distribution; reference bn.py:556-1189) - #
    def normal(
        self, name, mean=0.0, _sentinel=None, std=None, logstd=None,
        group_ndims=0, n_samples=None, is_reparameterized=True,
        use_path_derivative=False, check_numerics=False, **kwargs,
    ):
        """Add a Normal node (reference bn.py:556)."""
        dist = distributions.Normal(
            mean, _sentinel=_sentinel, std=std, logstd=logstd,
            group_ndims=group_ndims, is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def fold_normal(
        self, name, mean=0.0, _sentinel=None, std=None, logstd=None,
        group_ndims=0, n_samples=None, is_reparameterized=True,
        use_path_derivative=False, check_numerics=False, **kwargs,
    ):
        """Add a FoldNormal node (reference bn.py:592)."""
        dist = distributions.FoldNormal(
            mean, _sentinel=_sentinel, std=std, logstd=logstd,
            group_ndims=group_ndims, is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def bernoulli(
        self, name, logits, group_ndims=0, n_samples=None,
        dtype=jnp.int32, **kwargs,
    ):
        """Add a Bernoulli node (reference bn.py:628)."""
        dist = distributions.Bernoulli(
            logits, group_ndims=group_ndims, dtype=dtype, **kwargs
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def categorical(
        self, name, logits, group_ndims=0, n_samples=None,
        dtype=jnp.int32, **kwargs,
    ):
        """Add a Categorical node (reference bn.py:656)."""
        dist = distributions.Categorical(
            logits, group_ndims=group_ndims, dtype=dtype, **kwargs
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    discrete = categorical

    def uniform(
        self, name, minval=0.0, maxval=1.0, group_ndims=0, n_samples=None,
        is_reparameterized=True, check_numerics=False, **kwargs,
    ):
        """Add a Uniform node (reference bn.py:686)."""
        dist = distributions.Uniform(
            minval, maxval, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def gamma(
        self, name, alpha, beta, group_ndims=0, n_samples=None,
        check_numerics=False, **kwargs,
    ):
        """Add a Gamma node (reference bn.py:718)."""
        dist = distributions.Gamma(
            alpha, beta, group_ndims=group_ndims,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def beta(
        self, name, alpha, beta, group_ndims=0, n_samples=None,
        check_numerics=False, **kwargs,
    ):
        """Add a Beta node (reference bn.py:748)."""
        dist = distributions.Beta(
            alpha, beta, group_ndims=group_ndims,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def poisson(
        self, name, rate, group_ndims=0, n_samples=None, dtype=jnp.int32,
        check_numerics=False, **kwargs,
    ):
        """Add a Poisson node (reference bn.py:778)."""
        dist = distributions.Poisson(
            rate, group_ndims=group_ndims, dtype=dtype,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def binomial(
        self, name, logits, n_experiments, group_ndims=0, n_samples=None,
        dtype=jnp.int32, check_numerics=False, **kwargs,
    ):
        """Add a Binomial node (reference bn.py:808)."""
        dist = distributions.Binomial(
            logits, n_experiments, group_ndims=group_ndims, dtype=dtype,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def multivariate_normal_cholesky(
        self, name, mean, cov_tril, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a MultivariateNormalCholesky node (reference bn.py:840)."""
        dist = distributions.MultivariateNormalCholesky(
            mean, cov_tril, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def multivariate_student_t_cholesky(
        self, name, df, loc, scale_tril, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a MultivariateStudentTCholesky node (beyond reference)."""
        dist = distributions.MultivariateStudentTCholesky(
            df, loc, scale_tril, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def matrix_variate_normal_cholesky(
        self, name, mean, u_tril, v_tril, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a MatrixVariateNormalCholesky node (reference bn.py:872)."""
        dist = distributions.MatrixVariateNormalCholesky(
            mean, u_tril, v_tril, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def multinomial(
        self, name, logits, n_experiments, normalize_logits=True,
        group_ndims=0, n_samples=None, dtype=jnp.int32, **kwargs,
    ):
        """Add a Multinomial node (reference bn.py:906)."""
        dist = distributions.Multinomial(
            logits, n_experiments, normalize_logits=normalize_logits,
            group_ndims=group_ndims, dtype=dtype, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def unnormalized_multinomial(
        self, name, logits, normalize_logits=True, group_ndims=0,
        dtype=jnp.int32, **kwargs,
    ):
        """Add an UnnormalizedMultinomial node (reference bn.py:938)."""
        dist = distributions.UnnormalizedMultinomial(
            logits, normalize_logits=normalize_logits,
            group_ndims=group_ndims, dtype=dtype, **kwargs,
        )
        return self.stochastic(name, dist)

    bag_of_categoricals = unnormalized_multinomial

    def onehot_categorical(
        self, name, logits, group_ndims=0, n_samples=None, dtype=jnp.int32,
        **kwargs,
    ):
        """Add a OnehotCategorical node (reference bn.py:969)."""
        dist = distributions.OnehotCategorical(
            logits, group_ndims=group_ndims, dtype=dtype, **kwargs
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    onehot_discrete = onehot_categorical

    def dirichlet(
        self, name, alpha, group_ndims=0, n_samples=None,
        check_numerics=False, **kwargs,
    ):
        """Add a Dirichlet node (reference bn.py:999)."""
        dist = distributions.Dirichlet(
            alpha, group_ndims=group_ndims, check_numerics=check_numerics,
            **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def inverse_gamma(
        self, name, alpha, beta, group_ndims=0, n_samples=None,
        check_numerics=False, **kwargs,
    ):
        """Add an InverseGamma node (reference bn.py:1027)."""
        dist = distributions.InverseGamma(
            alpha, beta, group_ndims=group_ndims,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def laplace(
        self, name, loc, scale, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a Laplace node (reference bn.py:1057)."""
        dist = distributions.Laplace(
            loc, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    # -- beyond-reference heads (distributions/extra.py) ---------------- #
    def student_t(
        self, name, df, loc=0.0, scale=1.0, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a StudentT node (beyond reference)."""
        dist = distributions.StudentT(
            df, loc, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def exponential(
        self, name, rate, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add an Exponential node (beyond reference)."""
        dist = distributions.Exponential(
            rate, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def cauchy(
        self, name, loc, scale, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a Cauchy node (beyond reference)."""
        dist = distributions.Cauchy(
            loc, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def half_cauchy(
        self, name, scale, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a HalfCauchy node (beyond reference)."""
        dist = distributions.HalfCauchy(
            scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def log_normal(
        self, name, mean=0.0, scale=1.0, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a LogNormal node (beyond reference)."""
        dist = distributions.LogNormal(
            mean, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def negative_binomial(
        self, name, logits, total_count, dtype=None, group_ndims=0,
        n_samples=None, check_numerics=False, **kwargs,
    ):
        """Add a NegativeBinomial node (beyond reference)."""
        import jax.numpy as _jnp
        dist = distributions.NegativeBinomial(
            logits, total_count,
            dtype=_jnp.int32 if dtype is None else dtype,
            group_ndims=group_ndims, check_numerics=check_numerics,
            **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def truncated_normal(
        self, name, loc, scale, low, high, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a TruncatedNormal node (beyond reference)."""
        dist = distributions.TruncatedNormal(
            loc, scale, low, high, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def weibull(
        self, name, concentration, scale, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a Weibull node (beyond reference)."""
        dist = distributions.Weibull(
            concentration, scale, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def right_censored(
        self, name, base, upper, group_ndims=0, n_samples=None, **kwargs,
    ):
        """Add a RightCensored node wrapping a distribution instance
        (beyond reference; survival observation model)."""
        dist = distributions.RightCensored(
            base, upper, group_ndims=group_ndims, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def beta_binomial(
        self, name, n_experiments, alpha, beta, dtype=None, group_ndims=0,
        n_samples=None, check_numerics=False, **kwargs,
    ):
        """Add a BetaBinomial node (beyond reference)."""
        import jax.numpy as _jnp
        dist = distributions.BetaBinomial(
            n_experiments, alpha, beta,
            dtype=_jnp.int32 if dtype is None else dtype,
            group_ndims=group_ndims, check_numerics=check_numerics,
            **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def ordered_logistic(
        self, name, eta, cutpoints, dtype=None, group_ndims=0,
        n_samples=None, **kwargs,
    ):
        """Add an OrderedLogistic node (beyond reference)."""
        import jax.numpy as _jnp
        dist = distributions.OrderedLogistic(
            eta, cutpoints,
            dtype=_jnp.int32 if dtype is None else dtype,
            group_ndims=group_ndims, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def zero_inflated(
        self, name, base, pi_logits, group_ndims=0, n_samples=None,
        **kwargs,
    ):
        """Add a ZeroInflated node wrapping a count distribution
        instance (beyond reference)."""
        dist = distributions.ZeroInflated(
            base, pi_logits, group_ndims=group_ndims, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    def bin_concrete(
        self, name, temperature, logits, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a BinConcrete node (reference bn.py:1089)."""
        dist = distributions.BinConcrete(
            temperature, logits, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    bin_gumbel_softmax = bin_concrete

    def exp_concrete(
        self, name, temperature, logits, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add an ExpConcrete node (reference bn.py:1123)."""
        dist = distributions.ExpConcrete(
            temperature, logits, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    exp_gumbel_softmax = exp_concrete

    def concrete(
        self, name, temperature, logits, group_ndims=0, n_samples=None,
        is_reparameterized=True, use_path_derivative=False,
        check_numerics=False, **kwargs,
    ):
        """Add a Concrete node (reference bn.py:1157)."""
        dist = distributions.Concrete(
            temperature, logits, group_ndims=group_ndims,
            is_reparameterized=is_reparameterized,
            use_path_derivative=use_path_derivative,
            check_numerics=check_numerics, **kwargs,
        )
        return self.stochastic(name, dist, n_samples=n_samples)

    gumbel_softmax = concrete

    def implicit(self, name, samples, value_shape=(), group_ndims=0, **kwargs):
        """Add an Implicit node wrapping external samples (GAN support;
        reference legacy/distributions/special.py:96)."""
        dist = distributions.Implicit(
            samples, value_shape=value_shape, group_ndims=group_ndims, **kwargs
        )
        return self.stochastic(name, dist)

    def empirical(
        self, name, dtype, batch_shape=(), value_shape=(), group_ndims=0,
        **kwargs,
    ):
        """Add an Empirical (always-observed) node (reference
        legacy/distributions/special.py:19)."""
        dist = distributions.Empirical(
            dtype, batch_shape=batch_shape, value_shape=value_shape,
            group_ndims=group_ndims, **kwargs,
        )
        return self.stochastic(name, dist)

    def mixture(
        self, name, logits, components, group_ndims=0, n_samples=None,
        **kwargs,
    ):
        """Add a finite Mixture node (beyond the reference): ``logits``
        over the last batch axis of the K-batched ``components``
        distribution; the assignment is marginalized in ``log_prob``."""
        dist = distributions.Mixture(
            logits, components, group_ndims=group_ndims, **kwargs
        )
        return self.stochastic(name, dist, n_samples=n_samples)
