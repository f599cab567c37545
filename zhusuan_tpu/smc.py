"""Annealed sequential Monte Carlo (Del Moral, Doucet & Jasra 2006).

Beyond the reference: upstream ZhuSuan estimates marginal likelihoods with
AIS (``evaluation.py:57-172``) but has no SMC sampler — AIS weights each
chain independently and never resamples, so a few chains stuck in bad
regions dominate the estimator variance. Annealed SMC runs the same
tempered bridge ``log f_t = (1-beta_t) log_prior + beta_t log_joint`` with
a POPULATION of interacting particles: importance-reweight at each
temperature, resample when the effective sample size collapses, then
rejuvenate with MCMC moves. It returns BOTH an unbiased evidence estimate
``log Z`` and an equally-weighted posterior particle set.

TPU-native design: particles are the leading axis; one temperature step is
reweight (elementwise + logsumexp) -> conditional systematic resampling
(cumsum + searchsorted gather, under ``lax.cond`` so the no-resample path
costs nothing) -> ``n_moves`` Metropolis rejuvenation steps; the whole
annealing run is a single ``lax.scan`` program. The rejuvenation kernel is
any :mod:`zhusuan_tpu.mcmc.rwm` sampler instance (RWM for
non-differentiable targets, MALA otherwise) with adaptation off — the
per-temperature invariance SMC requires.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Union

import jax
import jax.numpy as jnp

from zhusuan_tpu.framework.meta_bn import MetaBayesianNet
from zhusuan_tpu.mcmc.base import make_log_joint_fn
from zhusuan_tpu.mcmc.rwm import _MetropolisBase

__all__ = ["AnnealedSMC", "SMCResult"]

Latent = Dict[str, jnp.ndarray]


class SMCResult(NamedTuple):
    """Output of :meth:`AnnealedSMC.run`."""

    particles: Latent  # [n_particles, ...] — equally weighted (final
    #                    resample folds the last weights in)
    log_z: jnp.ndarray  # scalar evidence estimate log p(observed)
    ess: jnp.ndarray  # [n_temperatures] effective sample size per step
    n_resamples: jnp.ndarray  # scalar: resampling events during the run
    acceptance_rate: jnp.ndarray  # [n_temperatures] mean rejuvenation MH
    #                               acceptance at each temperature


def _systematic_resample(key, log_weights):
    """Systematic resampling indices from normalized log-weights ``[n]``.

    One uniform offset, ``n`` evenly spaced positions against the weight
    CDF — O(n log n) on device (cumsum + searchsorted), lower variance
    than multinomial resampling.
    """
    n = log_weights.shape[0]
    w = jnp.exp(log_weights - jax.scipy.special.logsumexp(log_weights))
    cdf = jnp.cumsum(w)
    u = jax.random.uniform(key, (), log_weights.dtype)
    positions = (jnp.arange(n, dtype=log_weights.dtype) + u) / n
    return jnp.clip(jnp.searchsorted(cdf, positions), 0, n - 1)


class AnnealedSMC:
    """Annealed SMC over the prior→posterior tempered bridge.

    Interface mirrors :class:`zhusuan_tpu.evaluation.AIS`: the proposal
    MetaBayesianNet supplies both the initial particle draws and
    ``log_prior``; the latent chain shape must be the single particle
    axis ``[n_particles]``.

    :param meta_bn: target model (MetaBayesianNet or log-joint callable).
    :param proposal_meta_bn: proposal/prior MetaBayesianNet.
    :param kernel: a :class:`~zhusuan_tpu.mcmc.RandomWalkMetropolis` or
        :class:`~zhusuan_tpu.mcmc.MALA` instance used for rejuvenation
        (its ``adapt_step_size`` is ignored — adaptation stays off).
    :param observed: observation dict for the target model.
    :param latent: latent names (list) or dict of names.
    :param n_temperatures: annealing steps (sigmoid schedule, the AIS
        default shape).
    :param n_moves: rejuvenation MCMC steps per temperature.
    :param resample_threshold: resample when ESS < threshold * n.
    """

    def __init__(
        self,
        meta_bn,
        proposal_meta_bn: MetaBayesianNet,
        kernel: _MetropolisBase,
        observed: Dict,
        latent: Union[List[str], Dict],
        n_temperatures: int = 100,
        n_moves: int = 2,
        resample_threshold: float = 0.5,
    ):
        self._log_joint = make_log_joint_fn(meta_bn, {})
        self._proposal = proposal_meta_bn
        self._log_prior = make_log_joint_fn(proposal_meta_bn, {})
        if not isinstance(kernel, _MetropolisBase):
            raise TypeError(
                "kernel must be a RandomWalkMetropolis or MALA instance, "
                "got {!r}.".format(type(kernel))
            )
        self._kernel = kernel
        self._observed = dict(observed)
        self._latent_names = (
            list(latent.keys()) if isinstance(latent, dict) else list(latent)
        )
        if int(n_temperatures) < 1:
            raise ValueError("n_temperatures must be >= 1.")
        self._n_temperatures = int(n_temperatures)
        if int(n_moves) < 0:
            raise ValueError("n_moves must be >= 0.")
        self._n_moves = int(n_moves)
        if not 0.0 <= float(resample_threshold) <= 1.0:
            raise ValueError("resample_threshold must be in [0, 1].")
        self._resample_threshold = float(resample_threshold)

    def _schedule(self, dtype):
        """Sigmoid temperatures in [0, 1] (AIS evaluation.py:112-117)."""
        t = jnp.arange(self._n_temperatures + 1, dtype=dtype)
        sig = jax.nn.sigmoid(4.0 * (2.0 * t / self._n_temperatures - 1.0))
        return (sig - sig[0]) / (sig[-1] - sig[0])

    def _init_particles(self, key):
        bn = self._proposal.observe(key)
        return {name: jnp.asarray(bn[name].tensor)
                for name in self._latent_names}

    def _tempered(self, beta):
        """log f_beta(q) = (1-beta) log_prior + beta log_joint."""

        def log_f(obs):
            q = {k: obs[k] for k in self._latent_names}
            lp0 = self._log_prior(q)
            lp1 = self._log_joint({**q, **self._observed})
            return (1.0 - beta) * lp0 + beta * lp1

        return log_f

    def run(self, key) -> SMCResult:
        """Run the full annealing pass on-device (one ``lax.scan``)."""
        key_init, key_scan, key_final = jax.random.split(key, 3)
        q0 = self._init_particles(key_init)
        lp_probe = self._log_prior(q0)
        if lp_probe.ndim != 1:
            raise ValueError(
                "AnnealedSMC supports a single particle axis: the proposal "
                "log-prior must be [n_particles]-shaped, got shape {}."
                .format(lp_probe.shape)
            )
        n = lp_probe.shape[0]
        dtype = lp_probe.dtype
        schedule = self._schedule(dtype)
        log_n = jnp.log(jnp.asarray(float(n), dtype))

        def step(carry, inputs):
            q, log_w, log_z, n_resamples, k = carry
            beta_prev, beta = inputs
            k, k_res, k_moves = jax.random.split(k, 3)

            # 1. Reweight: incremental weight for the bridge step.
            lp0 = self._log_prior(q)
            lp1 = self._log_joint({**q, **self._observed})
            log_w_inc = (beta - beta_prev) * (lp1 - lp0)
            # Evidence update with the PREVIOUS normalized weights.
            log_w_norm = log_w - jax.scipy.special.logsumexp(log_w)
            log_z = log_z + jax.scipy.special.logsumexp(
                log_w_norm + log_w_inc
            )
            log_w = log_w_norm + log_w_inc

            # 2. Conditional systematic resampling on ESS collapse.
            lw_n = log_w - jax.scipy.special.logsumexp(log_w)
            ess = jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw_n))

            def do_resample(args):
                q, log_w, n_resamples = args
                idx = _systematic_resample(k_res, log_w)
                q_r = jax.tree.map(lambda x: x[idx], q)
                return q_r, jnp.full((n,), -log_n, dtype), n_resamples + 1

            q, log_w, n_resamples = jax.lax.cond(
                ess < self._resample_threshold * n,
                do_resample,
                lambda args: args,
                (q, log_w, n_resamples),
            )

            # 3. Rejuvenate with MH moves targeting f_beta.
            log_f = self._tempered(beta)
            mh_state = self._kernel.init(q, n_chain_dims=1)
            acc = jnp.zeros((), dtype)
            if self._n_moves:
                def move(carry, kk):
                    st, _ = carry
                    st2, info = self._kernel.sample(
                        log_f, {}, st, kk, adapt=False
                    )
                    return (st2, jnp.mean(info.acceptance_rate)), None

                (mh_state, acc), _ = jax.lax.scan(
                    move,
                    (mh_state, acc),
                    jax.random.split(k_moves, self._n_moves),
                )
                q = mh_state.q

            return (q, log_w, log_z, n_resamples, k), (ess, acc)

        init = (
            q0,
            jnp.full((n,), -log_n, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
            key_scan,
        )
        pairs = jnp.stack([schedule[:-1], schedule[1:]], axis=1)
        (q, log_w, log_z, n_resamples, _), (ess_t, acc_t) = jax.lax.scan(
            step, init, pairs
        )
        # Final equal-weighting resample so `particles` is a plain sample
        # set from the posterior.
        idx = _systematic_resample(key_final, log_w)
        particles = jax.tree.map(lambda x: x[idx], q)
        return SMCResult(
            particles=particles,
            log_z=log_z,
            ess=ess_t,
            n_resamples=n_resamples,
            acceptance_rate=acc_t,
        )
