"""Block-wise Gibbs composition of MCMC kernels.

Beyond the reference: upstream ZhuSuan exposes single monolithic kernels
(``zhusuan/hmc.py``, ``zhusuan/sgmcmc.py``) over ALL latents at once.
:class:`Gibbs` cycles heterogeneous sub-kernels over disjoint latent
blocks — HMC on the smooth block, a :class:`~zhusuan_tpu.mcmc
.slice_sampler.SliceSampler` on non-differentiable hyperparameters, RWM on
a discrete-ish remainder — each block's conditional obtained by simply
OBSERVING the other blocks' current values (the ``make_log_joint_fn``
merge, mcmc/base.py), so any model usable with one kernel is usable
block-wise with no extra user code.

TPU-native design: the sweep is ordinary Python over a STATIC component
list (unrolled at trace time — each sub-kernel's step compiles once into
the sweep body), and the whole sweep is a pure ``(state, key) ->
(state, info)`` transition iterated by the shared
:func:`~zhusuan_tpu.mcmc.base.scan_run_driver`. Sub-kernel tuning state
(dual-averaged step sizes, EW mass/width accumulators) persists inside
:class:`GibbsState`, and cached-density sub-states are invalidated each
visit (other blocks moved, so the cached conditional is stale — the
``MHState``/``SliceState`` NaN-sentinel contract makes this one line).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import make_log_joint_fn, scan_run_driver
from zhusuan_tpu.mcmc.discrete import DiscreteGibbs
from zhusuan_tpu.mcmc.hmc import HMC
from zhusuan_tpu.mcmc.nuts import NUTS
from zhusuan_tpu.mcmc.rwm import _MetropolisBase
from zhusuan_tpu.mcmc.slice_sampler import SliceSampler
from zhusuan_tpu.utils import merge_dicts

__all__ = ["Gibbs", "GibbsState", "GibbsInfo"]

Latent = Dict[str, jnp.ndarray]


class GibbsState(NamedTuple):
    """Explicit compound-kernel state: one sub-state per component (each
    carrying its block's positions in ``.q``) plus the sweep counter."""

    sub_states: Tuple
    t: jnp.ndarray  # sweep counter (int32)

    @property
    def q(self) -> Latent:
        """The full latent dict, merged across blocks."""
        out = {}
        for sub in self.sub_states:
            out.update(sub.q)
        return out


class GibbsInfo(NamedTuple):
    """Per-sweep statistics."""

    samples: Latent  # merged across blocks
    log_prob: jnp.ndarray  # [chain_shape] FULL log joint after the sweep


def _component_step(kernel):
    """``(meta_bn, observed, sub_state, key, gate) -> (sub_state, info)``
    for one supported sub-kernel family (the ``testing._make_transition``
    dispatch, specialized to conditional re-targeting)."""
    if isinstance(kernel, (HMC, NUTS)):
        # No carried density cache: HMCState holds only position + tuning
        # accumulators, so re-targeting needs no invalidation.
        def step(meta_bn, observed, sub, key, gate):
            kw = {}
            if kernel.adapt_step_size is not None:
                kw["adapt_step_size"] = gate
            if kernel.adapt_mass is not None:
                kw["adapt_mass"] = gate
            return kernel.sample(meta_bn, observed, sub, key, **kw)

        return step
    if isinstance(kernel, (_MetropolisBase, SliceSampler, DiscreteGibbs)):
        # Honor the sub-kernel's own adaptation switch: a component
        # constructed with adaptation off must NOT be force-adapted by
        # the sweep gate (mirrors the HMC/NUTS `is not None` guards).
        adapts = bool(getattr(kernel, "_adapt", False))

        def step(meta_bn, observed, sub, key, gate):
            # The cached density was computed under the PREVIOUS values
            # of the other blocks — stale; the NaN sentinel forces a
            # re-evaluation against the fresh conditional (a no-op for
            # DiscreteGibbs, which carries no cache).
            sub = sub.invalidate_cache()
            return kernel.sample(
                meta_bn, observed, sub, key,
                adapt=gate if adapts else jnp.asarray(False),
            )

        return step
    raise TypeError(
        "Unsupported Gibbs component kernel {!r}. Supported: HMC, NUTS, "
        "RandomWalkMetropolis, MALA, SliceSampler, DiscreteGibbs. "
        "(EllipticalSlice is excluded on purpose: it consumes the "
        "LIKELIHOOD factor only, not the model's full log-joint, so "
        "composing it requires the prior-free conditional — run it "
        "standalone.)".format(type(kernel))
    )


class Gibbs:
    """Cycle sub-kernels over disjoint latent blocks, in order, once per
    sweep. See the module docstring for semantics and the TPU mapping.

    :param components: sequence of ``(kernel, names)`` pairs — a kernel
        instance and the list of latent names it owns. Blocks must be
        disjoint and, together with ``observed`` at sample time, cover
        the model's free variables.
    """

    def __init__(self, components: Sequence[Tuple[object, Sequence[str]]]):
        components = [(k, list(names)) for k, names in components]
        if not components:
            raise ValueError("Gibbs needs at least one component.")
        seen = set()
        for kernel, names in components:
            if not names:
                raise ValueError("Each component needs >= 1 latent name.")
            dup = seen.intersection(names)
            if dup:
                raise ValueError(
                    "Latent blocks must be disjoint; {} appear in more "
                    "than one component.".format(sorted(dup))
                )
            seen.update(names)
        self._components = components
        self._steps = [_component_step(k) for k, _ in components]

    # ------------------------------------------------------------------ #
    def init(self, latent: Latent, n_chain_dims: int) -> GibbsState:
        """Create the initial state from positions of shape
        ``chain_axes + data_axes`` (the ``HMC.init`` convention); the
        latent dict is split across components by name."""
        latent = {k: jnp.asarray(v) for k, v in latent.items()}
        owned = {n for _, names in self._components for n in names}
        missing = owned - set(latent)
        extra = set(latent) - owned
        if missing or extra:
            raise ValueError(
                "Component blocks must exactly cover the latent dict; "
                "missing {}, unowned {}.".format(
                    sorted(missing), sorted(extra))
            )
        subs = []
        for kernel, names in self._components:
            block = {n: latent[n] for n in names}
            subs.append(kernel.init(block, n_chain_dims=n_chain_dims))
        return GibbsState(
            sub_states=tuple(subs), t=jnp.zeros((), jnp.int32)
        )

    # ------------------------------------------------------------------ #
    def sample(self, meta_bn, observed, state: GibbsState, key, adapt=None):
        """One full sweep (every component once, in order). Pure;
        scan-safe.

        :param adapt: traced/None bool gating EVERY component's
            adaptation (sub-kernels constructed without adaptation
            ignore it).
        :return: ``(new_state, GibbsInfo)``.
        """
        gate = jnp.asarray(False) if adapt is None else jnp.asarray(adapt)
        subs = list(state.sub_states)
        keys = jax.random.split(key, len(subs))
        info_lp = None
        for i, ((kernel, names), step) in enumerate(
            zip(self._components, self._steps)
        ):
            others = {}
            for j, sub in enumerate(subs):
                if j != i:
                    others.update(sub.q)
            cond_obs = merge_dicts(observed, others)
            subs[i], info = step(meta_bn, cond_obs, subs[i], keys[i], gate)
            # Each component's log_prob is the FULL joint at the current
            # (block-updated) position — the conditional only differs by
            # which factors are "observed", and make_log_joint_fn scores
            # them all. The LAST component's value is the sweep's joint.
            info_lp = info.log_prob

        new_state = GibbsState(sub_states=tuple(subs), t=state.t + 1)
        return new_state, GibbsInfo(samples=new_state.q, log_prob=info_lp)

    # ------------------------------------------------------------------ #
    _VALID_FIELDS = ("samples", "log_prob")

    def run(
        self,
        meta_bn,
        observed,
        state: GibbsState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect: bool = True,
        collect_fields=("samples", "log_prob"),
        thinning: int = 1,
    ):
        """Run ``n_iters`` sweeps on-device via the shared scan driver.
        Adaptation (all components) is gated on the PERSISTED counter
        ``state.t < n_adapt`` (the ``HMC.run`` convention).

        :return: ``(final_state, {field: stacked} or None)``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )

        def pick(info):
            full = {"samples": info.samples, "log_prob": info.log_prob}
            return {f: full[f] for f in collect_fields}

        adapt_on = n_adapt > 0

        def one(st, k):
            k, sub = jax.random.split(k)
            gate = st.t < n_adapt if adapt_on else jnp.asarray(False)
            st2, info = self.sample(meta_bn, observed, st, sub, adapt=gate)
            return st2, k, info

        return scan_run_driver(
            one, pick, state, key, n_iters, collect, thinning
        )
