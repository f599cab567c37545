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
any RWM (non-differentiable targets), MALA, or HMC (higher dimensions)
instance with adaptation off — the per-temperature invariance SMC
requires.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Union

import jax
import jax.numpy as jnp

from zhusuan_tpu.framework.meta_bn import MetaBayesianNet
from zhusuan_tpu.mcmc.base import make_log_joint_fn
from zhusuan_tpu.mcmc.hmc import HMC
from zhusuan_tpu.mcmc.rwm import _MetropolisBase

__all__ = ["AnnealedSMC", "SMCResult"]

Latent = Dict[str, jnp.ndarray]


class SMCResult(NamedTuple):
    """Output of :meth:`AnnealedSMC.run`."""

    particles: Latent  # [n_particles, ...] — equally weighted (final
    #                    resample folds the last weights in)
    log_z: jnp.ndarray  # scalar evidence estimate log p(observed)
    ess: jnp.ndarray  # [n_steps_max] effective sample size per step
    n_resamples: jnp.ndarray  # scalar: resampling events during the run
    acceptance_rate: jnp.ndarray  # [n_steps_max] mean rejuvenation MH
    #                               acceptance at each temperature
    n_steps: jnp.ndarray  # temperatures actually used (== n_temperatures
    #                       on the fixed schedule; <= max_steps adaptive)
    betas: jnp.ndarray  # realized ladder (NaN-padded for adaptive runs)


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
    :param kernel: a :class:`~zhusuan_tpu.mcmc.RandomWalkMetropolis`,
        :class:`~zhusuan_tpu.mcmc.MALA` or :class:`~zhusuan_tpu.mcmc.HMC`
        instance used for rejuvenation (its adaptation settings are
        ignored — adaptation stays off inside the bridge).
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
        if not isinstance(kernel, (_MetropolisBase, HMC)):
            raise TypeError(
                "kernel must be a RandomWalkMetropolis, MALA or HMC "
                "instance, got {!r}.".format(type(kernel))
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

    def _setup(self, key):
        """Draw initial particles and validate the chain shape."""
        q0 = self._init_particles(key)
        # Shape-only probe: no density FLOPs spent on validation
        # (evaluation.py/laplace.py pattern).
        lp_probe = jax.eval_shape(self._log_prior, q0)
        if lp_probe.ndim != 1:
            raise ValueError(
                "AnnealedSMC supports a single particle axis: the proposal "
                "log-prior must be [n_particles]-shaped, got shape {}."
                .format(lp_probe.shape)
            )
        return q0, lp_probe.shape[0], lp_probe.dtype

    def _bridge_step(self, q, log_w, log_z, n_resamples, key, beta_prev,
                     beta, n, log_n, dtype, lp0=None, lp1=None):
        """One reweight -> conditional-resample -> rejuvenate step shared
        by the static-schedule and adaptive drivers.

        ``lp0``/``lp1`` may carry precomputed prior/joint densities at
        ``q`` (the adaptive driver already evaluated them to choose the
        temperature — re-evaluating would double the dominant cost).
        """
        k_res, k_moves = jax.random.split(key)

        # 1. Reweight: incremental weight for the bridge step.
        if lp0 is None:
            lp0 = self._log_prior(q)
        if lp1 is None:
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

        # 3. Rejuvenate with MCMC moves targeting f_beta (adaptation off —
        # the per-temperature invariance SMC requires).
        log_f = self._tempered(beta)
        acc = jnp.zeros((), dtype)
        if self._n_moves:
            mh_state = self._kernel.init(q, n_chain_dims=1)
            is_hmc = isinstance(self._kernel, HMC)

            def move(carry, kk):
                st, acc_sum = carry
                if is_hmc:
                    # init_step_size_search=False statically suppresses
                    # HMC's heuristic init-search trigger (which would
                    # otherwise fire on this fresh t=0 state and make the
                    # kernel depend on the particle cloud — not a fixed
                    # f_beta-invariant transition).
                    st2, info = self._kernel.sample(
                        log_f, {}, st, kk,
                        adapt_step_size=False, adapt_mass=False,
                        init_step_size_search=False,
                    )
                else:
                    st2, info = self._kernel.sample(
                        log_f, {}, st, kk, adapt=False
                    )
                return (st2, acc_sum + jnp.mean(info.acceptance_rate)), None

            (mh_state, acc_sum), _ = jax.lax.scan(
                move,
                (mh_state, acc),
                jax.random.split(k_moves, self._n_moves),
            )
            acc = acc_sum / self._n_moves  # MEAN over the n_moves
            q = mh_state.q

        return q, log_w, log_z, n_resamples, ess, acc

    def run(self, key) -> SMCResult:
        """Run the full fixed-schedule annealing pass on-device (one
        ``lax.scan`` over the sigmoid temperature ladder)."""
        key_init, key_scan, key_final = jax.random.split(key, 3)
        q0, n, dtype = self._setup(key_init)
        schedule = self._schedule(dtype)
        log_n = jnp.log(jnp.asarray(float(n), dtype))

        def step(carry, inputs):
            q, log_w, log_z, n_resamples, k = carry
            beta_prev, beta = inputs
            k, sub = jax.random.split(k)
            q, log_w, log_z, n_resamples, ess, acc = self._bridge_step(
                q, log_w, log_z, n_resamples, sub, beta_prev, beta, n,
                log_n, dtype,
            )
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
            n_steps=jnp.asarray(self._n_temperatures, jnp.int32),
            betas=schedule[1:],
        )

    def run_adaptive(self, key, target_cess: float = 0.9,
                     max_steps: int = 200,
                     n_bisect: int = 30) -> SMCResult:
        """Adaptive-tempering run: each temperature increment ``delta`` is
        chosen by bisection so the CONDITIONAL effective sample size of
        the incremental weights stays at ``target_cess * n`` (Jasra et al.
        2011) — big steps where the bridge is easy, small ones where it
        is not, no schedule to hand-tune.

        TPU notes: the outer loop is a ``lax.while_loop`` (data-dependent
        trip count, capped at ``max_steps``); the inner bisection is a
        fixed ``fori_loop`` of ``n_bisect`` halvings; the per-step
        ESS/acceptance/beta traces are written into preallocated
        ``[max_steps + 1]`` buffers (entries beyond ``n_steps`` are NaN).

        The ladder ALWAYS terminates at ``beta = 1``: if ``max_steps``
        runs out first, one forced closing jump bridges the remaining gap
        (consistent estimator, higher variance on that increment) rather
        than silently returning a half-tempered target.

        :return: :class:`SMCResult` with ``n_steps`` actual temperatures
            used and ``betas`` the realized ladder (NaN-padded).
        """
        if not 0.0 < float(target_cess) < 1.0:
            # 1.0 exactly is unattainable: CESS(delta) < n for every
            # delta > 0, so the ladder could never take a real step.
            raise ValueError("target_cess must be in (0, 1).")
        key_init, key_loop, key_last, key_final = jax.random.split(key, 4)
        q0, n, dtype = self._setup(key_init)
        log_n = jnp.log(jnp.asarray(float(n), dtype))
        log_target = jnp.log(
            jnp.asarray(float(target_cess) * n, dtype)
        )
        one = jnp.asarray(1.0, dtype)

        def densities(q):
            return self._log_prior(q), self._log_joint(
                {**q, **self._observed}
            )

        def choose_delta(lp0, lp1, log_w):
            """Largest delta in (0, 1-beta] with CESS >= target, by
            bisection on the monotone CESS(delta)."""
            d = lp1 - lp0
            lw_n = log_w - jax.scipy.special.logsumexp(log_w)

            def log_cess(delta):
                # CESS = (sum W e^{delta d})^2 / sum W e^{2 delta d} * n
                a = jax.scipy.special.logsumexp(lw_n + delta * d)
                b = jax.scipy.special.logsumexp(lw_n + 2.0 * delta * d)
                return 2.0 * a - b + log_n

            def bisect(lo_hi, _):
                lo, hi = lo_hi
                mid = 0.5 * (lo + hi)
                ok = log_cess(mid) >= log_target
                return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)), None

            return log_cess, bisect

        nan = jnp.asarray(jnp.nan, dtype)
        # Buffers hold max_steps adaptive entries + one slot for the
        # forced closing jump to beta = 1 when max_steps is exhausted.
        buf_len = max_steps + 1

        def cond(carry):
            (_, _, _, _, beta, i, _, _, _, _) = carry
            return jnp.logical_and(beta < one, i < max_steps)

        def body(carry):
            (q, log_w, log_z, n_resamples, beta, i, k, ess_buf, acc_buf,
             beta_buf) = carry
            k, sub = jax.random.split(k)
            lp0, lp1 = densities(q)
            log_cess, bisect = choose_delta(lp0, lp1, log_w)
            hi0 = one - beta
            (lo, hi), _ = jax.lax.scan(
                bisect, (jnp.zeros((), dtype), hi0), None, length=n_bisect
            )
            # If even the full remaining jump keeps CESS above target,
            # go straight to beta = 1.
            delta = jnp.where(log_cess(hi0) >= log_target, hi0, lo)
            # Never stall: a zero delta would loop forever on a hard
            # bridge; force a floor of 1/max_steps of the remaining gap.
            delta = jnp.maximum(delta, hi0 / max_steps)
            new_beta = jnp.minimum(beta + delta, one)

            q, log_w, log_z, n_resamples, ess, acc = self._bridge_step(
                q, log_w, log_z, n_resamples, sub, beta, new_beta, n,
                log_n, dtype, lp0=lp0, lp1=lp1,
            )
            ess_buf = ess_buf.at[i].set(ess)
            acc_buf = acc_buf.at[i].set(acc)
            beta_buf = beta_buf.at[i].set(new_beta)
            return (q, log_w, log_z, n_resamples, new_beta, i + 1, k,
                    ess_buf, acc_buf, beta_buf)

        init = (
            q0,
            jnp.full((n,), -log_n, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
            key_loop,
            jnp.full((buf_len,), nan),
            jnp.full((buf_len,), nan),
            jnp.full((buf_len,), nan),
        )
        (q, log_w, log_z, n_resamples, beta, n_steps, _, ess_buf, acc_buf,
         beta_buf) = jax.lax.while_loop(cond, body, init)

        # If max_steps ran out before beta reached 1, CLOSE the bridge
        # with one forced jump: the estimator stays consistent (just
        # higher-variance on that last increment) instead of silently
        # describing a half-tempered target.
        def close(args):
            q, log_w, log_z, n_resamples, n_steps, ess_buf, acc_buf, \
                beta_buf = args
            q, log_w, log_z, n_resamples, ess, acc = self._bridge_step(
                q, log_w, log_z, n_resamples, key_last, beta, one, n,
                log_n, dtype,
            )
            ess_buf = ess_buf.at[n_steps].set(ess)
            acc_buf = acc_buf.at[n_steps].set(acc)
            beta_buf = beta_buf.at[n_steps].set(one)
            return (q, log_w, log_z, n_resamples, n_steps + 1, ess_buf,
                    acc_buf, beta_buf)

        (q, log_w, log_z, n_resamples, n_steps, ess_buf, acc_buf,
         beta_buf) = jax.lax.cond(
            beta < one,
            close,
            lambda args: args,
            (q, log_w, log_z, n_resamples, n_steps, ess_buf, acc_buf,
             beta_buf),
        )
        idx = _systematic_resample(key_final, log_w)
        particles = jax.tree.map(lambda x: x[idx], q)
        return SMCResult(
            particles=particles,
            log_z=log_z,
            ess=ess_buf,
            n_resamples=n_resamples,
            acceptance_rate=acc_buf,
            n_steps=n_steps,
            betas=beta_buf,
        )
