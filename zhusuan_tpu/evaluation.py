"""Evaluation: importance-sampling marginal likelihood and AIS.

Capability parity with reference ``zhusuan/evaluation.py``:
``is_loglikelihood`` (evaluation.py:22-54) and the ``AIS`` annealed
importance sampling driver (evaluation.py:57-172).

TPU-native design: the reference AIS runs a Python loop with one
``sess.run`` per temperature (1000 host round-trips per evaluation,
SURVEY.md §3.5). Here the entire annealing schedule is a ``lax.scan`` over
temperatures with the HMC transition inlined — the whole AIS evaluation is
one compiled on-device program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.framework.meta_bn import MetaBayesianNet
from zhusuan_tpu.mcmc.base import make_log_joint_fn
from zhusuan_tpu.mcmc.hmc import HMC
from zhusuan_tpu.utils import log_mean_exp, merge_dicts
from zhusuan_tpu.variational.monte_carlo import ImportanceWeightedObjective

__all__ = ["is_loglikelihood", "AIS"]


def is_loglikelihood(meta_bn, observed, latent=None, axis=None,
                     proposal=None):
    """Marginal log-likelihood estimate via self-normalized importance
    sampling — the importance-weighted objective evaluated as a value.

    Parity: reference ``evaluation.py:22-54``.

    :param meta_bn: MetaBayesianNet or log-joint callable.
    :param observed: dict of observations.
    :param latent: ``{name: (samples, log_probs)}`` (exclusive with
        ``proposal``).
    :param axis: the sample axis to reduce (log-mean-exp).
    :param proposal: a BayesianNet proposal whose unobserved stochastic
        nodes provide samples and log-probs.
    :return: the estimated log-likelihood array.
    """
    return ImportanceWeightedObjective(
        meta_bn, observed, latent=latent, axis=axis, variational=proposal
    ).tensor


class AIS:
    """Annealed importance sampling (Neal 2001) for marginal log-likelihood
    lower bounds, with HMC transitions along a sigmoid temperature schedule.

    Parity: reference ``evaluation.py:57-172`` — the tempered density
    ``log f_t = (1-t)*log_prior + t*log_joint`` (evaluation.py:98-105), the
    sigmoid schedule ``sigma(4*(2t/T - 1))`` normalized to [0, 1]
    (evaluation.py:112-117), chains initialized from the proposal, an
    ``n_adapt`` step-size adaptation phase, and the telescoping weight
    accumulation ``log_w += log f_t(x_{t-1}) - log f_t(x_t)``
    (evaluation.py:146-163) ending with ``+ log f_T(x_{T-1})``.

    Divergence note: the reference keeps whatever adaptation gate the user
    feeds during annealing; here adaptation is ON during the ``n_adapt``
    phase and frozen during annealing, which preserves the per-temperature
    invariance AIS formally requires.

    :param meta_bn: model (MetaBayesianNet or log-joint callable).
    :param proposal_meta_bn: proposal MetaBayesianNet; chains initialize
        from its samples and ``log_prior`` is its log-joint.
    :param hmc: an :class:`HMC` instance used as the transition kernel.
    :param observed: dict of observations.
    :param latent: list of latent node names (the reference took a dict of
        tf.Variables; shapes come from the proposal here — the chain
        count is the proposal samples' leading axis).
    :param n_temperatures: number of annealing steps.
    :param n_adapt: number of step-size adaptation iterations before the
        annealing run.
    """

    def __init__(
        self,
        meta_bn,
        proposal_meta_bn: MetaBayesianNet,
        hmc: HMC,
        observed: Dict,
        latent: Union[List[str], Dict],
        n_temperatures: int = 1000,
        n_adapt: int = 30,
    ):
        self._log_joint = make_log_joint_fn(meta_bn, {})
        self._proposal = proposal_meta_bn
        self._log_prior = make_log_joint_fn(proposal_meta_bn, {})
        self._hmc = hmc
        self._observed = dict(observed)
        self._latent_names = (
            list(latent.keys()) if isinstance(latent, dict) else list(latent)
        )
        if int(n_temperatures) < 1:
            raise ValueError("n_temperatures must be >= 1.")
        self._n_temperatures = int(n_temperatures)
        self._n_adapt = int(n_adapt)

    # sigmoid temperature schedule (reference evaluation.py:112-117)
    def _map_t(self, t):
        return 1.0 / (1.0 + np.exp(-4 * (2 * t / self._n_temperatures - 1)))

    def _schedule(self):
        t = np.arange(self._n_temperatures + 1, dtype=np.float64)
        mapped = self._map_t(t)
        return (mapped - mapped[0]) / (mapped[-1] - mapped[0])

    def _tempered_log_fn(self, temperature):
        def log_fn(obs):
            return self._log_prior(obs) * (1.0 - temperature) + \
                self._log_joint(obs) * temperature

        return log_fn

    def _init_latent(self, key):
        bn = self._proposal.observe(key)
        return {name: jnp.asarray(bn[name].tensor)
                for name in self._latent_names}

    def run(self, key):
        """Run the full AIS evaluation on-device.

        :param key: PRNG key.
        :return: scalar — the mean (over data) of the per-chain-averaged
            log marginal likelihood lower bound.
        """
        key_init, key_adapt, key_reinit, key_run = jax.random.split(key, 4)
        # Temperatures adopt the chain dtype so the scan carry is uniform
        # (f32 models under an x64-enabled host would otherwise promote).
        # Shape-only probe via eval_shape: no samples are drawn, so no key
        # is consumed (a reused key here would correlate the probe with the
        # phase-1 init draw after any refactor that materializes it).
        q_probe = jax.eval_shape(self._init_latent, key_init)
        chain_dtype = jnp.result_type(*[v.dtype for v in q_probe.values()])
        schedule = jnp.asarray(self._schedule(), chain_dtype)

        # --- phase 1: step-size adaptation at a small temperature -------- #
        adp_num_t = 2 if self._n_temperatures > 1 else 1
        adp_t = schedule[adp_num_t]
        q0 = self._init_latent(key_init)
        state = self._hmc.init(
            q0,
            log_joint=self._tempered_log_fn(adp_t),
            observed=self._observed,
        )
        adapt_enabled = self._hmc.adapt_step_size is not None

        def adapt_body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = self._hmc.sample(
                self._tempered_log_fn(adp_t), self._observed, st, sub,
                adapt_step_size=jnp.asarray(True) if adapt_enabled else None,
            )
            return (st, k), None

        (state, _), _ = jax.lax.scan(
            adapt_body, (state, key_adapt), None, length=self._n_adapt
        )

        # --- phase 2: re-init chains from the proposal ------------------- #
        # Keep the adapted step-size state (and counter — resetting t would
        # re-trigger the heuristic init-step-size search); only the chain
        # positions restart from the proposal.
        q = self._init_latent(key_reinit)
        state = state._replace(q=q)
        log_fn_at = lambda T, qq: self._tempered_log_fn(T)(
            merge_dicts(qq, self._observed)
        )
        log_weights = -log_fn_at(schedule[0], q)

        # --- phase 3: annealing scan over temperatures ------------------- #
        def anneal_body(carry, T):
            st, k, log_w = carry
            k, sub = jax.random.split(k)
            # EVERY adaptation channel is frozen during annealing — step
            # size, mass (an adapt_mass=True kernel would otherwise keep
            # re-estimating its metric from the per-temperature particle
            # cloud), and the t-based heuristic init-step-size search
            # (fires at t==1 / t==mass_collect_iters regardless of the
            # runtime gates) — so each transition is a FIXED
            # f_T-invariant kernel, the invariance AIS formally requires
            # (same discipline as AnnealedSMC rejuvenation, smc.py).
            st2, info = self._hmc.sample(
                self._tempered_log_fn(T), self._observed, st, sub,
                adapt_step_size=jnp.asarray(False) if adapt_enabled else None,
                adapt_mass=(
                    jnp.asarray(False)
                    if self._hmc.adapt_mass is not None else None
                ),
                init_step_size_search=False,
            )
            # old/new log f_T values come out of the HMC info directly.
            log_w = log_w + info.orig_log_prob - info.log_prob
            return (st2, k, log_w), info.log_prob

        (state, _, log_weights), log_probs = jax.lax.scan(
            anneal_body, (state, key_run, log_weights), schedule[1:]
        )
        # Final correction: add back log f_T at the last position
        # (the loop subtracted it; reference evaluation.py:157-160).
        log_weights = log_weights + log_probs[-1]

        # Lower bound: log-mean-exp over the chain axis (axis 0), then mean
        # (reference evaluation.py:165-172).
        bound = log_mean_exp(log_weights, axis=0)
        return jnp.mean(bound)
