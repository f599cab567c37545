"""State-space models: particle filtering/smoothing + exact Kalman baseline.

Beyond the reference: upstream ZhuSuan has no sequential inference at all —
its SMC-shaped tool is AIS over a tempered bridge
(``/root/reference/zhusuan/evaluation.py:57-172``), which anneals a STATIC
target. This module adds the sequential family: a bootstrap/guided particle
filter over time-series observations (unbiased marginal-likelihood
estimate + filtering clouds), forward-filter backward-sampling (FFBS)
trajectory smoothing, and an exact Kalman filter/smoother for the
linear-Gaussian special case (closed-form baseline the particle estimates
are tested against).

TPU-native design: particles are the leading axis of every array; one time
step is conditional systematic resampling (cumsum + searchsorted gather
under ``lax.cond``) -> proposal propagation -> reweight (elementwise +
logsumexp); the whole filter is ONE ``lax.scan`` over the observation
sequence, so a [T, n_particles, d] run is a single XLA program with no
host round-trips. The FFBS backward pass is a second ``lax.scan`` over the
stored history, ``vmap``-ed over trajectories.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.mcmc.base import dual_averaging_update, tree_normal_like
from zhusuan_tpu.smc import _systematic_resample

__all__ = [
    "ParticleFilter",
    "PFResult",
    "CSMCResult",
    "ParticleGibbs",
    "PseudoMarginalMH",
    "PMMHState",
    "PMMHInfo",
    "kalman_filter",
    "kalman_smoother",
    "KalmanResult",
    "hmm_filter",
    "hmm_smoother",
    "hmm_posterior_sample",
    "hmm_viterbi",
    "hmm_expected_stats",
    "hmm_mstep",
    "HMMStats",
]


class CSMCResult(NamedTuple):
    """Output of :meth:`ParticleFilter.conditional_run`."""

    trajectory: Any  # pytree of [T, ...] — the selected path
    log_z: jnp.ndarray  # scalar evidence estimate from this sweep
    ancestor_moves: jnp.ndarray  # scalar: steps where ancestor sampling
    #                              moved the reference off its own past


class PFResult(NamedTuple):
    """Output of :meth:`ParticleFilter.run`."""

    particles: Any  # final-time particle cloud pytree, [n_particles, ...]
    log_w: jnp.ndarray  # [n_particles] final log-weights (normalized)
    log_z: jnp.ndarray  # scalar log p(y_{0:T-1}) estimate (unbiased in
    #                     Z-space for the bootstrap filter)
    filter_means: Any  # pytree of [T, ...] self-normalized filtering means
    ess: jnp.ndarray  # [T] effective sample size after each reweight
    n_resamples: jnp.ndarray  # scalar resampling-event count
    history: Any  # ``store_history=True``: pytree of [T, n_particles, ...]
    #               post-propagation clouds, else None
    log_w_history: Optional[jnp.ndarray]  # [T, n_particles] matching
    #               normalized log-weights, else None


class ParticleFilter:
    """Sequential Monte Carlo for state-space models.

    The model is specified functionally (pure callables over vectorized
    particle clouds — the idiomatic JAX contract, everything traced into
    one program):

    - ``init_fn(key, n_particles) -> particles``: draw the t=0 cloud from
      the initial distribution p(x_0). ``particles`` is any pytree whose
      leaves carry the particle axis first.
    - ``transition_fn(key, particles, t) -> particles``: propagate the
      whole cloud x_{t-1} -> x_t ~ p(x_t | x_{t-1}) (vectorized over the
      leading axis; split ``key`` internally as needed).
    - ``emission_log_prob(particles, y, t) -> [n_particles]``: per-particle
      observation density log p(y_t | x_t).

    With only these three the filter is the BOOTSTRAP filter (proposal =
    transition prior; incremental weight = emission density). A guided
    filter supplies in addition:

    - ``proposal_fn(key, particles, y, t) -> particles``: propose x_t from
      q(x_t | x_{t-1}, y_t) (sees the incoming observation), and
    - ``proposal_log_prob(new, old, y, t) -> [n_particles]`` plus
    - ``transition_log_prob(new, old, t) -> [n_particles]``,

    so the incremental weight becomes emission + transition - proposal.
    ``transition_log_prob`` alone (no proposal) also unlocks
    :meth:`smooth` (FFBS needs transition densities, not samples).

    Resampling is conditional systematic (shared with
    :class:`~zhusuan_tpu.smc.AnnealedSMC`): triggered when
    ESS < ``resample_threshold * n_particles``; set the threshold to 1.0
    for always-resample, 0.0 for pure sequential importance sampling.

    :param init_fn: initial-cloud sampler (see above).
    :param transition_fn: transition sampler.
    :param emission_log_prob: observation log-density.
    :param n_particles: cloud size.
    :param proposal_fn: optional guided proposal sampler.
    :param proposal_log_prob: proposal log-density (required with
        ``proposal_fn``).
    :param transition_log_prob: transition log-density (required with
        ``proposal_fn``; alone it enables :meth:`smooth`).
    :param resample_threshold: ESS fraction triggering resampling.
    """

    def __init__(
        self,
        init_fn: Callable,
        transition_fn: Callable,
        emission_log_prob: Callable,
        n_particles: int,
        proposal_fn: Optional[Callable] = None,
        proposal_log_prob: Optional[Callable] = None,
        transition_log_prob: Optional[Callable] = None,
        resample_threshold: float = 0.5,
    ):
        if int(n_particles) < 2:
            raise ValueError("n_particles must be >= 2.")
        if (proposal_fn is None) != (proposal_log_prob is None):
            raise ValueError(
                "proposal_fn and proposal_log_prob must be supplied "
                "together (a guided proposal needs its density for the "
                "weight correction)."
            )
        if proposal_fn is not None and transition_log_prob is None:
            raise ValueError(
                "a guided proposal additionally needs transition_log_prob "
                "for the importance-weight correction."
            )
        if not 0.0 <= float(resample_threshold) <= 1.0:
            raise ValueError("resample_threshold must be in [0, 1].")
        self._init_fn = init_fn
        self._transition_fn = transition_fn
        self._emission_log_prob = emission_log_prob
        self._proposal_fn = proposal_fn
        self._proposal_log_prob = proposal_log_prob
        self._transition_log_prob = transition_log_prob
        self._n = int(n_particles)
        self._resample_threshold = float(resample_threshold)

    # -- one filter step ---------------------------------------------------

    def _propagate(self, key, x_prev, y, t, dtype):
        """Propose x_t and return (x_t, extra log-weight correction)."""
        if self._proposal_fn is None:
            x = self._transition_fn(key, x_prev, t)
            corr = jnp.zeros((self._n,), dtype)
            return x, corr
        x = self._proposal_fn(key, x_prev, y, t)
        corr = self._transition_log_prob(
            x, x_prev, t
        ) - self._proposal_log_prob(x, x_prev, y, t)
        return x, corr.astype(dtype)

    def _step(self, store_history, carry, inp):
        x, log_w, log_z, n_resamples = carry
        t, y, key = inp
        k_res, k_prop = jax.random.split(key)
        n = self._n
        dtype = log_w.dtype
        log_n = jnp.log(jnp.asarray(float(n), dtype))

        # 1. Conditional resampling on the INCOMING weights (skipped at
        # t=0 where they are uniform and ESS == n).
        lw_n = log_w - jax.scipy.special.logsumexp(log_w)
        ess_in = jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw_n))

        def do_resample(args):
            x, lw_n, n_resamples = args
            idx = _systematic_resample(k_res, lw_n)
            x_r = jax.tree.map(lambda a: a[idx], x)
            return x_r, jnp.full((n,), -log_n, dtype), n_resamples + 1

        x, lw_n, n_resamples = jax.lax.cond(
            ess_in < self._resample_threshold * n,
            do_resample,
            lambda args: args,
            (x, lw_n, n_resamples),
        )

        # 2. Propagate x_{t-1} -> x_t (identity at t=0: init_fn already
        # drew the time-0 cloud; both cond branches are traced, the
        # identity branch is free at run time).
        x, corr = jax.lax.cond(
            t > 0,
            lambda op: self._propagate(k_prop, op[0], op[1], t, dtype),
            lambda op: (op[0], jnp.zeros((n,), dtype)),
            (x, y),
        )

        # 3. Reweight with the incremental weight; update the evidence
        # with the previous NORMALIZED weights (AnnealedSMC discipline —
        # exact for both always- and adaptive-resampling regimes).
        lw_inc = self._emission_log_prob(x, y, t) + corr
        log_z = log_z + jax.scipy.special.logsumexp(lw_n + lw_inc)
        log_w = lw_n + lw_inc

        lw_out = log_w - jax.scipy.special.logsumexp(log_w)
        ess = jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw_out))
        w = jnp.exp(lw_out)
        means = jax.tree.map(
            lambda a: jnp.tensordot(w, a, axes=(0, 0)), x
        )
        # Only stack the full cloud when smoothing needs it — scan outputs
        # materialize as [T, ...] buffers, so an unconditional history
        # would cost T*n_particles HBM on every plain filter run.
        out = (ess, means) + ((x, lw_out) if store_history else ())
        return (x, log_w, log_z, n_resamples), out

    # -- drivers -----------------------------------------------------------

    def run(self, key, ys, store_history: bool = False) -> PFResult:
        """Run the filter over ``ys`` (pytree, leading axis = time) as one
        ``lax.scan`` program.

        :param key: PRNG key.
        :param ys: observations; every leaf has shape ``[T, ...]``.
        :param store_history: keep the per-step clouds + weights
            (``[T, n_particles, ...]`` — the memory cost of smoothing;
            required by :meth:`smooth`).
        """
        leaves = jax.tree.leaves(ys)
        if not leaves:
            raise ValueError("ys must contain at least one observation "
                             "array.")
        T = leaves[0].shape[0]
        k_init, k_scan = jax.random.split(key)
        x0 = self._init_fn(k_init, self._n)

        # Dtype/shape contract probe without spending density FLOPs
        # (evaluation.py pattern).
        y0 = jax.tree.map(lambda a: a[0], ys)
        lw_probe = jax.eval_shape(
            lambda x: self._emission_log_prob(x, y0, 0), x0
        )
        if lw_probe.shape != (self._n,):
            raise ValueError(
                "emission_log_prob must return [n_particles]={} log-"
                "densities, got shape {}.".format((self._n,),
                                                  lw_probe.shape)
            )
        dtype = lw_probe.dtype
        log_n = jnp.log(jnp.asarray(float(self._n), dtype))

        init = (
            x0,
            jnp.full((self._n,), -log_n, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
        )
        inputs = (jnp.arange(T), ys, jax.random.split(k_scan, T))
        carry, outs = jax.lax.scan(
            lambda c, i: self._step(store_history, c, i), init, inputs
        )
        x, log_w, log_z, n_resamples = carry
        if store_history:
            ess_t, means_t, hist, lw_hist = outs
        else:
            (ess_t, means_t), hist, lw_hist = outs, None, None
        return PFResult(
            particles=x,
            log_w=log_w - jax.scipy.special.logsumexp(log_w),
            log_z=log_z,
            filter_means=means_t,
            ess=ess_t,
            n_resamples=n_resamples,
            history=hist,
            log_w_history=lw_hist,
        )

    def smooth(self, key, result: PFResult, n_paths: int):
        """Forward-filter backward-sampling (Godsill, Doucet & West 2004):
        draw ``n_paths`` joint smoothing trajectories
        x_{0:T-1} ~ p(x_{0:T-1} | y_{0:T-1}) from the stored filter
        history.

        Backward pass per path: pick the final state from the final
        filtering weights, then for t = T-2..0 reweight the time-t cloud
        by the transition density into the chosen x_{t+1} and sample.
        One ``lax.scan`` over reversed time, ``vmap`` over paths —
        O(T * n_paths * n_particles) transition-density evaluations, all
        on device.

        :param key: PRNG key.
        :param result: a :meth:`run` output with ``store_history=True``.
        :param n_paths: number of smoothing trajectories.
        :return: pytree of ``[n_paths, T, ...]`` trajectories.
        """
        if self._transition_log_prob is None:
            raise ValueError(
                "smooth() needs transition_log_prob (FFBS reweights by "
                "transition densities)."
            )
        if result.history is None:
            raise ValueError(
                "smooth() needs the filter history: re-run with "
                "store_history=True."
            )
        xs, lws = result.history, result.log_w_history
        T = lws.shape[0]

        def one_path(k):
            k_last, k_back = jax.random.split(k)
            idx_last = jax.random.categorical(k_last, lws[T - 1])
            x_last = jax.tree.map(lambda a: a[T - 1, idx_last], xs)

            def back(x_next, inp):
                t, kk = inp
                x_t_all = jax.tree.map(lambda a: a[t], xs)
                lw_b = lws[t] + self._transition_log_prob(
                    x_next, x_t_all, t + 1
                )
                idx = jax.random.categorical(kk, lw_b)
                x_t = jax.tree.map(lambda a: a[idx], x_t_all)
                return x_t, x_t

            ts = jnp.arange(T - 2, -1, -1)
            _, traj_rev = jax.lax.scan(
                back, x_last, (ts, jax.random.split(k_back, T - 1))
            )
            # traj_rev is [T-1, ...] in reverse order; flip and append the
            # final state.
            return jax.tree.map(
                lambda rev, last: jnp.concatenate(
                    [jnp.flip(rev, axis=0), last[None]], axis=0
                ),
                traj_rev,
                x_last,
            )

        return jax.vmap(one_path)(jax.random.split(key, int(n_paths)))


    # -- conditional SMC (the particle-Gibbs kernel) -----------------------

    def conditional_run(self, key, ys, ref,
                        ancestor_sampling: bool = True) -> CSMCResult:
        """Conditional SMC sweep (Andrieu, Doucet & Holenstein 2010) with
        optional ancestor sampling (Lindsten, Jordan & Schön 2014): run
        the filter with the reference trajectory ``ref`` forced into
        particle slot 0, then sample ONE trajectory from the final
        weights by ancestral trace-back. Iterating
        ``ref -> conditional_run -> trajectory`` is a Markov kernel that
        leaves the exact joint smoothing distribution
        ``p(x_{0:T-1} | y_{0:T-1})`` invariant — the inner kernel of
        particle Gibbs.

        Resampling is multinomial at EVERY step (the cSMC-correct
        scheme; the adaptive systematic scheme of :meth:`run` does not
        apply here). Ancestor sampling re-draws the reference's ancestor
        from ``w_{t-1} * p(ref_t | x_{t-1})`` each step — it needs
        ``transition_log_prob`` and transforms the kernel's mixing from
        path-degeneracy-limited to near-ideal; without it the reference
        keeps its own past (plain cSMC, slower mixing; a warning-level
        choice, not an error).

        :param key: PRNG key.
        :param ys: observations, leaves ``[T, ...]``.
        :param ref: reference trajectory pytree, leaves ``[T, ...]``
            (e.g. a previous sweep's ``trajectory``).
        :param ancestor_sampling: use ancestor sampling (requires
            ``transition_log_prob``).
        :return: :class:`CSMCResult` (new trajectory, evidence estimate,
            ancestor-move count).
        """
        if ancestor_sampling and self._transition_log_prob is None:
            raise ValueError(
                "ancestor_sampling=True needs transition_log_prob; pass "
                "ancestor_sampling=False for plain (slower-mixing) cSMC."
            )
        leaves = jax.tree.leaves(ys)
        if not leaves:
            raise ValueError("ys must contain at least one observation "
                             "array.")
        T = leaves[0].shape[0]
        n = self._n
        k_init, k_scan, k_pick = jax.random.split(key, 3)

        x0 = self._init_fn(k_init, n)
        ref0 = jax.tree.map(lambda a: a[0], ref)
        x0 = jax.tree.map(lambda a, r: a.at[0].set(r), x0, ref0)
        y0 = jax.tree.map(lambda a: a[0], ys)
        lw_probe = jax.eval_shape(
            lambda x: self._emission_log_prob(x, y0, 0), x0
        )
        if lw_probe.shape != (n,):
            raise ValueError(
                "emission_log_prob must return [n_particles]={} log-"
                "densities, got shape {}.".format((n,), lw_probe.shape)
            )
        dtype = lw_probe.dtype
        log_n = jnp.log(jnp.asarray(float(n), dtype))

        def step(carry, inp):
            x, lw_n, log_z, as_moves = carry
            t, y, kk = inp
            k_anc, k_res, k_prop = jax.random.split(kk, 3)
            ref_t = jax.tree.map(lambda a: a[t], ref)

            def advance(x):
                # Multinomial ancestors for the free slots; slot 0 =
                # ancestor-sampled (or pinned to its own past).
                idx = jax.random.categorical(
                    k_res, lw_n, shape=(n,)).astype(jnp.int32)
                if ancestor_sampling:
                    lw_as = lw_n + self._transition_log_prob(ref_t, x, t)
                    a0 = jax.random.categorical(k_anc, lw_as).astype(
                        jnp.int32)
                else:
                    a0 = jnp.zeros((), jnp.int32)
                idx = idx.at[0].set(a0)
                x_prev = jax.tree.map(lambda a: a[idx], x)
                if self._proposal_fn is None:
                    x_new = self._transition_fn(k_prop, x_prev, t)
                else:
                    x_new = self._proposal_fn(k_prop, x_prev, y, t)
                x_new = jax.tree.map(lambda a, r: a.at[0].set(r),
                                     x_new, ref_t)
                if self._proposal_fn is None:
                    corr = jnp.zeros((n,), dtype)
                else:
                    # Elementwise [n]-vs-[n] density pairs; slot 0 gets
                    # the REFERENCE's correction (its forced value, its
                    # selected ancestor).
                    corr = (self._transition_log_prob(x_new, x_prev, t)
                            - self._proposal_log_prob(x_new, x_prev,
                                                      y, t)).astype(dtype)
                moved = (a0 != 0).astype(as_moves.dtype)
                return x_new, idx, corr, moved

            def start(x):
                # t = 0: init cloud (reference already in slot 0),
                # identity ancestors.
                return (x, jnp.arange(n, dtype=jnp.int32),
                        jnp.zeros((n,), dtype),
                        jnp.zeros((), as_moves.dtype))

            x, anc, corr, moved = jax.lax.cond(t > 0, advance, start, x)
            lw_inc = self._emission_log_prob(x, y, t) + corr
            # Multinomial resampling every step -> incoming weights are
            # uniform; the evidence increment is the plain mean.
            log_z = log_z + jax.scipy.special.logsumexp(lw_inc) - log_n
            lw_n = lw_inc - jax.scipy.special.logsumexp(lw_inc)
            return (x, lw_n, log_z, as_moves + moved), (x, anc)

        init = (
            x0,
            jnp.full((n,), -log_n, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
        )
        inputs = (jnp.arange(T), ys, jax.random.split(k_scan, T))
        (x, lw_n, log_z, as_moves), (hist, ancs) = jax.lax.scan(
            step, init, inputs
        )

        # Ancestral trace-back from a final-weight draw (one scan over
        # reversed time; anc_0 is the identity so the carry is uniform).
        j0 = jax.random.categorical(k_pick, lw_n).astype(jnp.int32)

        def back(j, inp):
            x_t, anc_t = inp
            out = jax.tree.map(lambda a: a[j], x_t)
            return anc_t[j], out

        rev = lambda a: jnp.flip(a, axis=0)
        _, traj_rev = jax.lax.scan(
            back, j0, (jax.tree.map(rev, hist), rev(ancs))
        )
        trajectory = jax.tree.map(rev, traj_rev)
        return CSMCResult(trajectory=trajectory, log_z=log_z,
                          ancestor_moves=as_moves)


class ParticleGibbs:
    """Particle Gibbs (Andrieu, Doucet & Holenstein 2010): alternate a
    conditional-SMC trajectory refresh with a parameter update given the
    full latent path — exact MCMC on the joint
    ``p(theta, x_{0:T-1} | y_{0:T-1})``.

    Complements :class:`PseudoMarginalMH`: PMMH needs only a black-box
    evidence estimate but mixes through parameter space alone; particle
    Gibbs exploits a tractable (often conjugate)
    ``p(theta | x_{0:T-1}, y_{0:T-1})`` for much larger parameter moves.
    With ancestor sampling the trajectory kernel mixes well even for
    long series at modest particle counts (Lindsten et al. 2014).

    TPU-native: one sweep (full cSMC scan + parameter draw) is one step
    of an outer ``lax.scan`` — an ``n_sweeps`` run is a single XLA
    program.

    :param make_filter: ``theta -> ParticleFilter`` factory (traced; the
        returned filter's callables may close over ``theta``).
    :param update_params: ``(key, theta, trajectory) -> theta`` Gibbs /
        MH-within-Gibbs parameter update given the latent path. ``None``
        keeps ``theta`` fixed (pure cSMC trajectory sampling).
    :param ancestor_sampling: passed to
        :meth:`ParticleFilter.conditional_run`.
    """

    _VALID_FIELDS = ("params", "trajectory", "log_z", "ancestor_moves")

    def __init__(self, make_filter: Callable,
                 update_params: Optional[Callable] = None,
                 ancestor_sampling: bool = True):
        self._make_filter = make_filter
        self._update = update_params
        self._as = bool(ancestor_sampling)

    def run(self, key, ys, theta0: dict, ref0,
            n_sweeps: int,
            collect_fields=("params", "trajectory", "log_z")):
        """Run ``n_sweeps`` particle-Gibbs sweeps as one scan program.

        :param theta0: initial parameter dict (any pytree).
        :param ref0: initial reference trajectory, leaves ``[T, ...]``
            (e.g. zeros, or a :meth:`ParticleFilter.run` +
            :meth:`~ParticleFilter.smooth` draw).
        :return: ``(final_theta, final_trajectory, {field: stacked})``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )

        def sweep(carry, kk):
            theta, ref = carry
            k_traj, k_par = jax.random.split(kk)
            pf = self._make_filter(theta)
            res = pf.conditional_run(k_traj, ys, ref,
                                     ancestor_sampling=self._as)
            traj = res.trajectory
            if self._update is not None:
                theta = self._update(k_par, theta, traj)
            full = {
                "params": theta,
                "trajectory": traj,
                "log_z": res.log_z,
                "ancestor_moves": res.ancestor_moves,
            }
            return (theta, traj), {f: full[f] for f in collect_fields}

        (theta, traj), out = jax.lax.scan(
            sweep, (theta0, ref0), jax.random.split(key, int(n_sweeps))
        )
        return theta, traj, out


# -- pseudo-marginal MH (PMMH) --------------------------------------------


class PMMHState(NamedTuple):
    """Pseudo-marginal Metropolis state (MHState conventions,
    ``mcmc/rwm.py:39-66``): the RETAINED evidence estimate rides with the
    parameters — the defining pseudo-marginal mechanic — and is filled
    with a NaN sentinel at init (``sample`` re-evaluates on it; a live
    retained value is never NaN because NaN proposals are rejected)."""

    theta: Any  # parameter dict, leaves [n_chains, ...]
    log_post: jnp.ndarray  # [n_chains] retained log_z_hat + log_prior
    t: jnp.ndarray  # iteration counter (int32)
    step_size: jnp.ndarray  # scalar
    da_step: jnp.ndarray
    h_bar: jnp.ndarray
    log_epsilon_bar: jnp.ndarray

    def invalidate_cache(self) -> "PMMHState":
        """Mark the retained evidence stale (e.g. after re-targeting a
        restored state); the next ``sample`` re-estimates it."""
        return self._replace(log_post=jnp.full_like(self.log_post,
                                                    float("nan")))


class PMMHInfo(NamedTuple):
    """Per-iteration statistics."""

    samples: Any
    acceptance_rate: jnp.ndarray  # [n_chains]
    updated_step_size: jnp.ndarray
    log_post: jnp.ndarray  # [n_chains] retained log-posterior estimate


class PseudoMarginalMH:
    """Particle-marginal / pseudo-marginal Metropolis–Hastings (Andrieu,
    Doucet & Holenstein 2010): random-walk MH over model parameters where
    the intractable likelihood is replaced by an UNBIASED stochastic
    estimate — for state-space models, the particle filter's ``log_z``.
    The retained-estimate construction targets the exact parameter
    posterior despite the noise.

    Beyond the reference: upstream ZhuSuan has no sequential models and
    no pseudo-marginal machinery. TPU-native design: the estimator (a
    full :meth:`ParticleFilter.run` scan) is traced INTO the MH step, so
    ``run`` compiles to one nested-scan XLA program; chains are a leading
    axis ``vmap``-ed over independent filters.

    :param log_z_fn: ``(theta_single, key) -> scalar`` unbiased
        log-evidence estimator for ONE parameter setting (no chain axis —
        the kernel vmaps it). Typically
        ``lambda th, k: make_filter(th).run(k, ys).log_z``.
    :param log_prior: ``(theta_single) -> scalar`` parameter log-prior.
    :param step_size: random-walk proposal scale (multiplies
        ``proposal_scales``).
    :param proposal_scales: optional dict of per-site scale arrays
        (broadcast against each leaf) for anisotropic proposals.
    :param adapt_step_size: dual-average the step size toward
        ``target_acceptance_rate`` during ``run``'s ``n_adapt`` window.
        Off by default: with a noisy estimator the optimal acceptance is
        BELOW the 0.234 clean-likelihood value (Sherlock et al. 2015) —
        set a lower target when the per-step evidence noise is large.
    """

    _VALID_FIELDS = ("samples", "acceptance_rate", "step_size", "log_post")

    def __init__(
        self,
        log_z_fn: Callable,
        log_prior: Callable,
        step_size: float = 0.1,
        proposal_scales: Optional[dict] = None,
        adapt_step_size: bool = False,
        target_acceptance_rate: float = 0.234,
        gamma: float = 0.05,
        t0: float = 100.0,
        kappa: float = 0.75,
    ):
        if not float(step_size) > 0.0:
            raise ValueError("step_size must be positive.")
        if not 0.0 < float(target_acceptance_rate) < 1.0:
            raise ValueError("target_acceptance_rate must be in (0, 1).")
        self._log_z_fn = log_z_fn
        self._log_prior = log_prior
        self._step_size = float(step_size)
        self._scales = dict(proposal_scales or {})
        self._adapt = bool(adapt_step_size)
        self._target = float(target_acceptance_rate)
        self._gamma, self._t0, self._kappa = (float(gamma), float(t0),
                                              float(kappa))

    def init(self, theta: dict) -> PMMHState:
        """State from initial parameters; every leaf carries the chain
        axis first (``[n_chains, ...]``)."""
        theta = {k: jnp.asarray(v) for k, v in theta.items()}
        any_leaf = next(iter(theta.values()))
        n_chains = any_leaf.shape[0]
        dtype = any_leaf.dtype
        zero = jnp.zeros((), dtype)
        return PMMHState(
            theta=theta,
            log_post=jnp.full((n_chains,), float("nan"), dtype),
            t=jnp.zeros((), jnp.int32),
            step_size=jnp.asarray(self._step_size, dtype),
            da_step=zero,
            h_bar=zero,
            log_epsilon_bar=zero,
        )

    def _estimate(self, theta, keys):
        """[n_chains] log_z_hat + log_prior, vmapped over the chain axis."""

        def one(th, k):
            return self._log_z_fn(th, k) + self._log_prior(th)

        return jax.vmap(one)(theta, keys)

    def sample(self, state: PMMHState, key, adapt=None):
        """One pseudo-marginal MH step over all chains. Pure; scan-safe.

        Each call consumes ONE evidence estimate per chain (the
        proposal's); the current position's estimate is RETAINED from the
        step that accepted it — re-estimating it here would break the
        pseudo-marginal exactness argument.
        """
        n_chains = state.log_post.shape[0]
        k_fill, k_prop, k_z, k_mh = jax.random.split(key, 4)

        # Refill the retained estimate when the NaN sentinel is present
        # (first call / invalidate_cache) — scalar predicate so the
        # (expensive: one full filter per chain) branch is skipped at run
        # time on every later step.
        log_post0 = jax.lax.cond(
            jnp.any(jnp.isnan(state.log_post)),
            lambda: self._estimate(
                state.theta, jax.random.split(k_fill, n_chains)
            ).astype(state.log_post.dtype),
            lambda: state.log_post,
        )

        eps = tree_normal_like(k_prop, state.theta)
        theta_prop = {
            n: state.theta[n]
            + state.step_size
            * jnp.asarray(self._scales.get(n, 1.0),
                          state.theta[n].dtype)
            * eps[n]
            for n in state.theta
        }
        log_post_prop = self._estimate(
            theta_prop, jax.random.split(k_z, n_chains)
        ).astype(log_post0.dtype)

        # Symmetric proposal: log alpha is the posterior-estimate ratio.
        # NaN/-inf proposals (zero-density prior region, filter
        # breakdown) are rejected; +inf escapes from -inf stay accepts
        # (rwm.py:184-191 semantics).
        log_alpha = log_post_prop - log_post0
        bad = jnp.logical_or(jnp.isnan(log_alpha),
                             jnp.logical_not(jnp.isfinite(log_post_prop)))
        log_alpha = jnp.where(bad, -jnp.inf, log_alpha)
        accept_rate = jnp.minimum(1.0,
                                  jnp.exp(jnp.minimum(log_alpha, 0.0)))
        u = jax.random.uniform(k_mh, (n_chains,))
        accept = jnp.log(u) < log_alpha

        def pick(new, old):
            mask = accept.reshape(accept.shape
                                  + (1,) * (new.ndim - accept.ndim))
            return jnp.where(mask, new, old)

        theta = jax.tree.map(pick, theta_prop, state.theta)
        log_post = jnp.where(accept, log_post_prop, log_post0)

        gate = self._adapt if adapt is None else adapt
        step_size, da_step, h_bar, log_eps_bar = dual_averaging_update(
            state.da_step,
            state.h_bar,
            state.log_epsilon_bar,
            state.step_size,
            jnp.mean(accept_rate),
            jnp.asarray(gate),
            fresh_start=state.t == 0,
            mu=float(np.log(10.0 * self._step_size)),
            target=self._target,
            gamma=self._gamma,
            t0=self._t0,
            kappa=self._kappa,
        )
        ss_dtype = state.step_size.dtype
        new_state = PMMHState(
            theta=theta,
            log_post=log_post,
            t=state.t + 1,
            step_size=step_size.astype(ss_dtype),
            da_step=da_step.astype(state.da_step.dtype),
            h_bar=h_bar.astype(ss_dtype),
            log_epsilon_bar=log_eps_bar.astype(ss_dtype),
        )
        info = PMMHInfo(
            samples=theta,
            acceptance_rate=accept_rate,
            updated_step_size=new_state.step_size,
            log_post=log_post,
        )
        return new_state, info

    def run(
        self,
        state: PMMHState,
        key,
        n_iters: int,
        n_adapt: int = 0,
        collect_fields=("samples", "acceptance_rate", "step_size",
                        "log_post"),
    ):
        """Run ``n_iters`` PMMH iterations as one ``lax.scan`` program
        (each body step contains the vmapped particle filters).
        Adaptation gates on the persisted ``state.t < n_adapt``
        (``HMC.run`` convention — resumed states past the window never
        re-adapt).

        :return: ``(final_state, {field: [n_iters, ...] stacked})``.
        """
        for f in collect_fields:
            if f not in self._VALID_FIELDS:
                raise ValueError(
                    "Unknown collect field {!r}; valid: {}.".format(
                        f, self._VALID_FIELDS)
                )
        adapt_on = self._adapt and n_adapt > 0

        def one(st, k):
            gate = (st.t < n_adapt if adapt_on else jnp.asarray(False))
            st2, info = self.sample(st, k, adapt=gate)
            full = {
                "samples": info.samples,
                "acceptance_rate": info.acceptance_rate,
                "step_size": info.updated_step_size,
                "log_post": info.log_post,
            }
            return st2, {f: full[f] for f in collect_fields}

        return jax.lax.scan(one, state,
                            jax.random.split(key, int(n_iters)))


# -- exact linear-Gaussian baseline ---------------------------------------


class KalmanResult(NamedTuple):
    """Output of :func:`kalman_filter` / :func:`kalman_smoother`."""

    means: jnp.ndarray  # [T, d] filtering (or smoothing) means
    covs: jnp.ndarray  # [T, d, d] matching covariances
    log_likelihood: jnp.ndarray  # scalar log p(y_{0:T-1}) (exact)


# -- discrete-state HMMs (exact) ------------------------------------------
#
# Emissions enter as a precomputed [T, K] table of per-state observation
# log-likelihoods, so ANY emission model plugs in (Gaussian, categorical,
# neural — evaluate your density on a state grid once, vectorized). All
# four algorithms are one `lax.scan` over time whose per-step work is
# [K]/[K, K] dense algebra — MXU-shaped for large state counts.


def _check_hmm(log_pi0, log_trans, log_obs):
    log_pi0, log_trans, log_obs = map(jnp.asarray,
                                      (log_pi0, log_trans, log_obs))
    K = log_pi0.shape[-1]
    if log_trans.shape != (K, K):
        raise ValueError(
            "log_trans must be [K, K]={}, got {}.".format(
                (K, K), log_trans.shape))
    if log_obs.ndim != 2 or log_obs.shape[1] != K:
        raise ValueError(
            "log_obs must be [T, K] with K={}, got {}.".format(
                K, log_obs.shape))
    return log_pi0, log_trans, log_obs


def _log_matmul(A, B):
    """Batched log-space matmul ``C[.., i, j] = LSE_k A[.., i, k] + B[.., k, j]``.

    Max-shifted so the inner product is a REAL matmul (MXU-eligible):
    shift each A row / B column by its max, ``exp``, ``@``, ``log``,
    unshift. ``-inf`` rows/columns (impossible states) are handled by
    zeroing their shift so no ``inf - inf`` NaNs appear.
    """
    a = jnp.max(A, axis=-1, keepdims=True)
    b = jnp.max(B, axis=-2, keepdims=True)
    a = jnp.where(jnp.isfinite(a), a, 0.0)
    b = jnp.where(jnp.isfinite(b), b, 0.0)
    prod = jnp.exp(A - a) @ jnp.exp(B - b)
    return jnp.log(prod) + a + b


def _hmm_elems(log_pi0, log_trans, log_obs):
    """Per-step transition operators ``M_t`` for prefix products:
    ``M_0[i, j] = log pi0[j] + obs[0, j]`` (constant over ``i``),
    ``M_t[i, j] = log_trans[i, j] + obs[t, j]``."""
    K = log_pi0.shape[-1]
    elems = log_trans[None] + log_obs[1:, None, :]
    first = jnp.broadcast_to(log_pi0 + log_obs[0], (K, K))
    return jnp.concatenate([first[None], elems], axis=0)


def _suffix_scan(combine, elems):
    """Suffix combinations ``s_t = e_t * e_{t+1} * ... * e_{T-1}`` with an
    operator written for time order (left = earlier). Implemented as a
    prefix associative scan over the flipped array with swapped operands —
    log-depth, like the forward pass."""
    flipped = jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), elems)
    out = jax.lax.associative_scan(lambda u, v: combine(v, u), flipped)
    return jax.tree_util.tree_map(lambda x: jnp.flip(x, 0), out)


def hmm_filter(log_pi0, log_trans, log_obs, parallel: bool = False):
    """Exact forward filtering for a discrete-state HMM.

    Convention: ``log_trans[i, j] = log p(x_t = j | x_{t-1} = i)``;
    ``log_obs[t, k] = log p(y_t | x_t = k)`` precomputed by the caller.

    With ``parallel=True`` the forward recursion is replaced by a
    log-depth ``jax.lax.associative_scan`` over per-step ``[K, K]``
    transition operators combined by max-shifted log-matmul — O(T K^3)
    work on the MXU instead of O(T K^2) sequential steps, the right
    trade on TPU for long sequences (temporal parallelization; same
    answer to float tolerance).

    :return: ``(log_alpha, log_z)`` — normalized filtering log-marginals
        ``[T, K]`` (``log p(x_t | y_{0:t})``) and the exact data
        log-likelihood ``log p(y_{0:T-1})``.
    """
    log_pi0, log_trans, log_obs = _check_hmm(log_pi0, log_trans, log_obs)

    if parallel:
        prefix = jax.lax.associative_scan(
            _log_matmul, _hmm_elems(log_pi0, log_trans, log_obs))
        raw = prefix[:, 0, :]  # row 0: M_0 is constant over i
        c = jax.scipy.special.logsumexp(raw, axis=1)
        return raw - c[:, None], c[-1]

    def step(carry, lo):
        log_a, log_z = carry
        # Predict: logsumexp_i alpha_i + trans[i, j]  (log-space matvec).
        pred = jax.scipy.special.logsumexp(
            log_a[:, None] + log_trans, axis=0)
        post = pred + lo
        c = jax.scipy.special.logsumexp(post)
        return (post - c, log_z + c), post - c

    a0 = log_pi0 + log_obs[0]
    c0 = jax.scipy.special.logsumexp(a0)
    (_, log_z), rest = jax.lax.scan(step, (a0 - c0, c0), log_obs[1:])
    log_alpha = jnp.concatenate([(a0 - c0)[None], rest], axis=0)
    return log_alpha, log_z


def hmm_smoother(log_pi0, log_trans, log_obs, parallel: bool = False):
    """Exact forward-backward smoothing.

    ``parallel=True`` runs both the forward and backward passes as
    log-depth associative scans (see :func:`hmm_filter`).

    :return: ``(log_gamma, log_z)`` — smoothing log-marginals ``[T, K]``
        (``log p(x_t | y_{0:T-1})``, normalized) and the data
        log-likelihood.
    """
    log_alpha, log_z = hmm_filter(log_pi0, log_trans, log_obs,
                                  parallel=parallel)
    log_pi0, log_trans, log_obs = _check_hmm(log_pi0, log_trans, log_obs)
    log_beta = _hmm_backward(log_trans, log_obs, parallel)
    post = log_alpha + log_beta
    log_gamma = post - jax.scipy.special.logsumexp(
        post, axis=1, keepdims=True)
    return log_gamma, log_z


def _hmm_backward(log_trans, log_obs, parallel: bool = False):
    """Backward messages ``log_beta[t, i] = log p(y_{t+1:T-1} | x_t=i)``
    (unnormalized; ``log_beta[T-1] = 0``)."""
    K = log_trans.shape[-1]
    if log_obs.shape[0] == 1:
        return jnp.zeros((1, K), log_obs.dtype)

    if parallel:
        # beta_t[i] = LSE_j (N_{t+1} * ... * N_{T-1})[i, j], suffix
        # products of N_t[i, j] = trans[i, j] + obs[t, j].
        elems = log_trans[None] + log_obs[1:, None, :]
        suffix = _suffix_scan(_log_matmul, elems)
        return jnp.concatenate(
            [jax.scipy.special.logsumexp(suffix, axis=2),
             jnp.zeros((1, K), log_obs.dtype)], axis=0)

    def back(log_b, lo):
        # beta_i = logsumexp_j trans[i, j] + obs[j] + beta_j
        new = jax.scipy.special.logsumexp(
            log_trans + (lo + log_b)[None, :], axis=1)
        return new, new

    zero = jnp.zeros((K,), log_obs.dtype)
    _, betas_rev = jax.lax.scan(back, zero, jnp.flip(log_obs[1:], 0))
    return jnp.concatenate([jnp.flip(betas_rev, 0), zero[None]], axis=0)


class HMMStats(NamedTuple):
    """E-step sufficient statistics from :func:`hmm_expected_stats`."""

    log_gamma: jnp.ndarray  # [T, K] smoothing log-marginals (normalized)
    log_xi: jnp.ndarray  # [T-1, K, K] pairwise log p(x_t=i, x_{t+1}=j | y)
    log_z: jnp.ndarray  # scalar data log-likelihood


def hmm_expected_stats(log_pi0, log_trans, log_obs,
                       parallel: bool = False) -> HMMStats:
    """E-step of Baum-Welch: smoothing marginals, pairwise transition
    marginals, and the data log-likelihood, in one forward + one backward
    pass (both log-depth under ``parallel=True``).

    Emission models stay caller-owned: fit them from ``exp(log_gamma)``
    responsibilities (weighted MLE) alongside :func:`hmm_mstep` for the
    chain parameters.
    """
    log_pi0, log_trans, log_obs = _check_hmm(log_pi0, log_trans, log_obs)
    if log_obs.shape[0] < 2:
        raise ValueError("hmm_expected_stats requires T >= 2.")
    log_alpha, log_z = hmm_filter(log_pi0, log_trans, log_obs,
                                  parallel=parallel)
    log_beta = _hmm_backward(log_trans, log_obs, parallel)
    post = log_alpha + log_beta
    log_gamma = post - jax.scipy.special.logsumexp(
        post, axis=1, keepdims=True)
    # xi_t[i, j] ∝ alpha_t[i] + trans[i, j] + obs[t+1, j] + beta_{t+1}[j]
    raw = (log_alpha[:-1, :, None] + log_trans[None]
           + (log_obs[1:] + log_beta[1:])[:, None, :])
    log_xi = raw - jax.scipy.special.logsumexp(
        raw, axis=(1, 2), keepdims=True)
    return HMMStats(log_gamma=log_gamma, log_xi=log_xi, log_z=log_z)


def hmm_mstep(stats: HMMStats):
    """Closed-form M-step for the chain parameters.

    :return: ``(log_pi0, log_trans)`` — the EM update
        ``pi0 = gamma_0``, ``trans[i, j] ∝ sum_t xi_t[i, j]``
        (row-normalized).
    """
    log_pi0 = stats.log_gamma[0]
    rows = jax.scipy.special.logsumexp(stats.log_xi, axis=0)
    log_trans = rows - jax.scipy.special.logsumexp(
        rows, axis=1, keepdims=True)
    return log_pi0, log_trans


def hmm_posterior_sample(key, log_pi0, log_trans, log_obs, n_paths: int):
    """Joint posterior state paths ``x_{0:T-1} ~ p(x | y)`` by forward
    filtering / backward sampling (the discrete FFBS — exact, not
    approximate).

    :return: ``[n_paths, T]`` int32 state paths.
    """
    log_alpha, _ = hmm_filter(log_pi0, log_trans, log_obs)
    log_pi0, log_trans, log_obs = _check_hmm(log_pi0, log_trans, log_obs)
    T = log_obs.shape[0]

    def one(k):
        k_last, k_back = jax.random.split(k)
        x_last = jax.random.categorical(k_last,
                                        log_alpha[T - 1]).astype(jnp.int32)

        def back(x_next, inp):
            la_t, kk = inp
            logits = la_t + log_trans[:, x_next]
            x_t = jax.random.categorical(kk, logits).astype(jnp.int32)
            return x_t, x_t

        _, rest_rev = jax.lax.scan(
            back, x_last,
            (jnp.flip(log_alpha[:-1], 0),
             jax.random.split(k_back, T - 1)),
        )
        return jnp.concatenate([jnp.flip(rest_rev, 0), x_last[None]])

    return jax.vmap(one)(jax.random.split(key, int(n_paths)))


def hmm_viterbi(log_pi0, log_trans, log_obs):
    """Most probable state path (max-product dynamic programming).

    :return: ``(path, score)`` — ``[T]`` int32 argmax path and its joint
        log-probability ``log p(x*, y)``.
    """
    log_pi0, log_trans, log_obs = _check_hmm(log_pi0, log_trans, log_obs)

    def step(delta, lo):
        scores = delta[:, None] + log_trans  # [i, j]
        best = jnp.max(scores, axis=0) + lo
        arg = jnp.argmax(scores, axis=0).astype(jnp.int32)
        return best, arg

    d0 = log_pi0 + log_obs[0]
    delta, args = jax.lax.scan(step, d0, log_obs[1:])
    x_last = jnp.argmax(delta).astype(jnp.int32)
    score = jnp.max(delta)

    def back(x_next, arg_t):
        x_t = arg_t[x_next]
        return x_t, x_t

    _, rest_rev = jax.lax.scan(back, x_last, jnp.flip(args, 0))
    path = jnp.concatenate([jnp.flip(rest_rev, 0), x_last[None]])
    return path, score


def _mvn_logpdf(y, mean, cov):
    d = y.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    z = jax.scipy.linalg.solve_triangular(chol, y - mean, lower=True)
    half_log_det = jnp.sum(jnp.log(jnp.diagonal(chol)))
    return (-0.5 * jnp.sum(z ** 2) - half_log_det
            - 0.5 * d * jnp.log(2.0 * jnp.asarray(jnp.pi, y.dtype)))


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _kalman_combine(ei, ej):
    """Associative combination of two Kalman filtering elements
    ``(A, b, C, eta, J)`` (earlier ``ei``, later ``ej``) — the
    temporal-parallelization operator of Särkkä & García-Fernández
    (IEEE TAC 2021, eq. 10). Batched over the leading axis as
    ``associative_scan`` requires."""
    Ai, bi, Ci, ni, Ji = ei
    Aj, bj, Cj, nj, Jj = ej
    d = Ai.shape[-1]
    I = jnp.eye(d, dtype=Ai.dtype)
    D = I + Ci @ Jj
    Dt = I + Jj @ Ci
    sol_A = jnp.linalg.solve(D, Ai)
    sol_b = jnp.linalg.solve(
        D, (bi + jnp.einsum("...ij,...j->...i", Ci, nj))[..., None]
    )[..., 0]
    sol_C = jnp.linalg.solve(D, Ci)
    AiT = jnp.swapaxes(Ai, -1, -2)
    sol_n = jnp.linalg.solve(
        Dt, (nj - jnp.einsum("...ij,...j->...i", Jj, bi))[..., None]
    )[..., 0]
    sol_J = jnp.linalg.solve(Dt, Jj)
    return (
        Aj @ sol_A,
        jnp.einsum("...ij,...j->...i", Aj, sol_b) + bj,
        _sym(Aj @ sol_C @ jnp.swapaxes(Aj, -1, -2) + Cj),
        jnp.einsum("...ij,...j->...i", AiT, sol_n) + ni,
        _sym(AiT @ sol_J @ Ai + Ji),
    )


def _kalman_filter_parallel(ys, A, Q, H, R, m0, P0) -> KalmanResult:
    """Log-depth Kalman filter: per-step conditional-density elements
    combined with :func:`_kalman_combine` under one
    ``jax.lax.associative_scan`` (Särkkä & García-Fernández 2021). The
    prefix element's ``(b, C)`` IS the filtering ``(mean, cov)``; the
    log-likelihood is recovered afterwards from the (vectorized)
    one-step-ahead predictive densities."""
    T, d = ys.shape[0], m0.shape[0]
    I = jnp.eye(d, dtype=ys.dtype)

    # Generic element (t >= 1): S, K and the squares are t-independent.
    S = H @ Q @ H.T + R
    chol_s = jnp.linalg.cholesky(S)
    K = jax.scipy.linalg.cho_solve((chol_s, True), H @ Q.T).T
    A_g = (I - K @ H) @ A
    C_g = _sym((I - K @ H) @ Q)
    W = jax.scipy.linalg.cho_solve((chol_s, True), H @ A)  # S^{-1} H A
    eta_g = ys[1:] @ W  # [T-1, d]: eta_t = A' H' S^{-1} y_t
    J_g = _sym(W.T @ (H @ A))  # A' H' S^{-1} H A

    # First element uses the prior (x_0 ~ N(m0, P0), no transition).
    S0 = H @ P0 @ H.T + R
    chol0 = jnp.linalg.cholesky(S0)
    K0 = jax.scipy.linalg.cho_solve((chol0, True), H @ P0.T).T
    b0 = m0 + K0 @ (ys[0] - H @ m0)
    C0 = _sym((I - K0 @ H) @ P0)

    zeros_m = jnp.zeros((d, d), ys.dtype)
    elems = (
        jnp.concatenate([zeros_m[None],
                         jnp.broadcast_to(A_g, (T - 1, d, d))], 0),
        jnp.concatenate([b0[None], ys[1:] @ K.T], 0),
        jnp.concatenate([C0[None],
                         jnp.broadcast_to(C_g, (T - 1, d, d))], 0),
        jnp.concatenate([jnp.zeros((1, d), ys.dtype), eta_g], 0),
        jnp.concatenate([zeros_m[None],
                         jnp.broadcast_to(J_g, (T - 1, d, d))], 0),
    )
    _, ms, Ps, _, _ = jax.lax.associative_scan(_kalman_combine, elems)

    # Exact log-likelihood from one-step-ahead predictives, vectorized.
    m_pred = jnp.concatenate([m0[None], ms[:-1] @ A.T], 0)
    P_pred = jnp.concatenate(
        [P0[None], _sym(A @ Ps[:-1] @ A.T + Q)], 0)
    S_all = H @ P_pred @ H.T + R
    ll = jnp.sum(jax.vmap(_mvn_logpdf)(
        ys, m_pred @ H.T, S_all))
    return KalmanResult(means=ms, covs=Ps, log_likelihood=ll)


def kalman_filter(ys, A, Q, H, R, m0, P0,
                  parallel: bool = False) -> KalmanResult:
    """Exact filter for the linear-Gaussian SSM

    .. math::
        x_0 \\sim N(m_0, P_0), \\quad
        x_t = A x_{t-1} + N(0, Q), \\quad
        y_t = H x_t + N(0, R).

    One ``lax.scan`` over time; Cholesky-based innovations (no explicit
    inverses). Returns filtering means/covariances and the EXACT
    log-marginal-likelihood — the closed-form baseline the particle
    filter's ``log_z`` is validated against (tests/test_ssm.py).

    With ``parallel=True`` the sequential recursion is replaced by the
    temporal-parallelization associative scan (Särkkä &
    García-Fernández, IEEE TAC 2021): O(log T) depth on device, same
    result to float tolerance — the right choice for long series on TPU.

    :param ys: ``[T, p]`` observations.
    :param A: ``[d, d]`` transition matrix.
    :param Q: ``[d, d]`` transition noise covariance.
    :param H: ``[p, d]`` emission matrix.
    :param R: ``[p, p]`` emission noise covariance.
    :param m0: ``[d]`` initial mean.
    :param P0: ``[d, d]`` initial covariance.
    """
    ys, A, Q, H, R, m0, P0 = map(jnp.asarray, (ys, A, Q, H, R, m0, P0))
    T = ys.shape[0]
    if parallel:
        return _kalman_filter_parallel(ys, A, Q, H, R, m0, P0)

    def step(carry, inp):
        m, P, ll = carry
        t, y = inp
        # Predict (identity at t=0: m0/P0 already describe x_0).
        m_pred = jnp.where(t > 0, A @ m, m)
        P_pred = jnp.where(t > 0, A @ P @ A.T + Q, P)
        # Update.
        S = H @ P_pred @ H.T + R
        chol_s = jnp.linalg.cholesky(S)
        innov = y - H @ m_pred
        # K = P_pred H' S^{-1} via two triangular solves.
        K = jax.scipy.linalg.cho_solve((chol_s, True),
                                       H @ P_pred.T).T
        m_new = m_pred + K @ innov
        P_new = P_pred - K @ S @ K.T
        ll = ll + _mvn_logpdf(y, H @ m_pred, S)
        return (m_new, P_new, ll), (m_new, P_new, m_pred, P_pred)

    init = (m0, P0, jnp.zeros((), ys.dtype))
    (_, _, ll), (ms, Ps, _, _) = jax.lax.scan(
        step, init, (jnp.arange(T), ys)
    )
    return KalmanResult(means=ms, covs=Ps, log_likelihood=ll)


def kalman_smoother(ys, A, Q, H, R, m0, P0,
                    parallel: bool = False) -> KalmanResult:
    """Rauch–Tung–Striebel smoother for the same LGSSM as
    :func:`kalman_filter`: a forward filter pass then one backward
    ``lax.scan``. Returns smoothing means/covariances (and the filter's
    exact log-likelihood).

    ``parallel=True`` runs BOTH passes as log-depth associative scans
    (Särkkä & García-Fernández 2021): backward elements
    ``(E, g, L) = (G_t, m_t - G_t A m_t, P_t - G_t P^-_{t+1} G_t')``
    combine as ``(E_i E_j, g_i + E_i g_j, L_i + E_i L_j E_i')``."""
    ys, A, Q, H, R, m0, P0 = map(jnp.asarray, (ys, A, Q, H, R, m0, P0))
    filt = kalman_filter(ys, A, Q, H, R, m0, P0, parallel=parallel)
    ms, Ps = filt.means, filt.covs
    T = ys.shape[0]

    if parallel:
        if T == 1:
            return filt
        P_pred = _sym(A @ Ps[:-1] @ A.T + Q)  # [T-1, d, d]
        G = jnp.swapaxes(jnp.linalg.solve(
            P_pred, A @ jnp.swapaxes(Ps[:-1], -1, -2)), -1, -2)
        g = ms[:-1] - jnp.einsum("tij,tj->ti", G, ms[:-1] @ A.T)
        L = _sym(Ps[:-1] - G @ P_pred @ jnp.swapaxes(G, -1, -2))
        d = m0.shape[0]
        elems = (
            jnp.concatenate([G, jnp.zeros((1, d, d), ys.dtype)], 0),
            jnp.concatenate([g, ms[-1][None]], 0),
            jnp.concatenate([L, Ps[-1][None]], 0),
        )

        def combine(ei, ej):
            Ei, gi, Li = ei
            Ej, gj, Lj = ej
            return (
                Ei @ Ej,
                gi + jnp.einsum("...ij,...j->...i", Ei, gj),
                _sym(Li + Ei @ Lj @ jnp.swapaxes(Ei, -1, -2)),
            )

        _, ms_s, Ps_s = _suffix_scan(combine, elems)
        return KalmanResult(means=ms_s, covs=Ps_s,
                            log_likelihood=filt.log_likelihood)

    def back(carry, inp):
        m_next_s, P_next_s = carry
        m_f, P_f = inp
        m_pred = A @ m_f
        P_pred = A @ P_f @ A.T + Q
        chol_p = jnp.linalg.cholesky(P_pred)
        # G = P_f A' P_pred^{-1}
        G = jax.scipy.linalg.cho_solve((chol_p, True), A @ P_f.T).T
        m_s = m_f + G @ (m_next_s - m_pred)
        P_s = P_f + G @ (P_next_s - P_pred) @ G.T
        return (m_s, P_s), (m_s, P_s)

    init = (ms[T - 1], Ps[T - 1])
    # Backward over t = T-2..0 (reverse the stacked filter results).
    _, (ms_rev, Ps_rev) = jax.lax.scan(
        back, init, (jnp.flip(ms[:-1], 0), jnp.flip(Ps[:-1], 0))
    )
    ms_s = jnp.concatenate([jnp.flip(ms_rev, 0), ms[T - 1][None]], 0)
    Ps_s = jnp.concatenate([jnp.flip(Ps_rev, 0), Ps[T - 1][None]], 0)
    return KalmanResult(means=ms_s, covs=Ps_s,
                        log_likelihood=filt.log_likelihood)
