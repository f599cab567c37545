"""Evaluation: marginal likelihood, AIS, and predictive model comparison.

Capability parity with reference ``zhusuan/evaluation.py``:
``is_loglikelihood`` (evaluation.py:22-54) and the ``AIS`` annealed
importance sampling driver (evaluation.py:57-172).

TPU-native design: the reference AIS runs a Python loop with one
``sess.run`` per temperature (1000 host round-trips per evaluation,
SURVEY.md §3.5). Here the entire annealing schedule is a ``lax.scan`` over
temperatures with the HMC transition inlined — the whole AIS evaluation is
one compiled on-device program.

Beyond the reference: :func:`waic` and :func:`psis_loo` — the standard
predictive model-comparison criteria (Watanabe 2010; Vehtari, Gelman &
Gabry 2017) over a pointwise log-likelihood matrix, with
:func:`pointwise_log_likelihood` producing that matrix from posterior
draws via one vmapped model re-execution (the expensive part stays on
device; the criteria themselves are host-side f64 postprocessing, the
``diagnostics.py`` split).
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

__all__ = [
    "is_loglikelihood",
    "AIS",
    "pointwise_log_likelihood",
    "waic",
    "psis_loo",
    "WAICResult",
    "LOOResult",
    "compare",
    "ComparisonRow",
]


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


# --------------------------------------------------------------------- #
# Predictive model comparison: WAIC and PSIS-LOO (beyond the reference)  #
# --------------------------------------------------------------------- #
from typing import NamedTuple  # noqa: E402


class WAICResult(NamedTuple):
    """:func:`waic` output (all f64 numpy; ``pointwise`` has the data
    shape of the input's trailing axes)."""

    elpd_waic: np.ndarray  # scalar sum of pointwise elpd
    p_waic: np.ndarray  # scalar effective number of parameters
    se: np.ndarray  # scalar standard error of elpd_waic
    pointwise: np.ndarray  # per-datapoint elpd contributions


class LOOResult(NamedTuple):
    """:func:`psis_loo` output. ``pareto_k > 0.7`` entries flag data
    points whose importance weights are unreliable (Vehtari et al. 2017
    §2.2) — refit without that point or distrust its contribution."""

    elpd_loo: np.ndarray  # scalar sum of pointwise elpd
    p_loo: np.ndarray  # scalar effective number of parameters
    se: np.ndarray  # scalar standard error of elpd_loo
    pareto_k: np.ndarray  # per-datapoint GPD shape diagnostic
    pointwise: np.ndarray  # per-datapoint elpd contributions


def pointwise_log_likelihood(meta_bn, draws, observed, node, key=None):
    """Pointwise log-likelihood matrix from posterior draws.

    Re-executes the model once per draw (vmapped — one device program)
    with the draw AND the observations pinned, and reads the likelihood
    node's conditional log-probability.

    :param meta_bn: the model :class:`MetaBayesianNet`.
    :param draws: ``{name: [n_draws, ...]}`` posterior draws (e.g.
        stacked ``HMC.run`` output).
    :param observed: the observation dict (shared across draws).
    :param node: name of the likelihood node. Declare it with
        ``group_ndims=0`` (the default) so entries stay per-datapoint —
        a group-reduced node yields one column, defeating WAIC/LOO.
    :param key: optional PRNG key (only consumed if the model has
        stochastic nodes beyond ``draws`` + ``observed``).
    :return: ``[n_draws] + data_shape`` jnp array.
    """
    draws = {k: jnp.asarray(v) for k, v in draws.items()}
    n_set = {v.shape[0] for v in draws.values()}
    if len(n_set) != 1:
        raise ValueError(
            "All draw arrays must share a leading n_draws axis; got "
            "shapes {}.".format({k: v.shape for k, v in draws.items()})
        )
    n_draws = n_set.pop()
    if key is None:
        key = jax.random.PRNGKey(0)

    def one(k, d):
        bn = meta_bn.observe(key=k, **merge_dicts(d, observed))
        return bn.cond_log_prob(node)

    keys = jax.random.split(key, n_draws)
    return jax.vmap(one)(keys, draws)


def _prepare_ll(log_likelihood):
    """[S, ...data] -> f64 [S, n] matrix + the original data shape."""
    ll = np.asarray(log_likelihood, np.float64)
    if ll.ndim < 2:
        raise ValueError(
            "log_likelihood must be [n_draws, n_data...]-shaped, got "
            "shape {}.".format(ll.shape)
        )
    data_shape = ll.shape[1:]
    return ll.reshape(ll.shape[0], -1), data_shape


def waic(log_likelihood) -> WAICResult:
    """Widely applicable information criterion (Watanabe 2010), elpd
    convention of Vehtari, Gelman & Gabry (2017) Eq. 4-5:

        elpd_waic_i = log (1/S) sum_s p(y_i | theta_s)  -  Var_s[log p]

    :param log_likelihood: ``[n_draws, n_data...]`` pointwise
        log-likelihoods (see :func:`pointwise_log_likelihood`).
    """
    ll, data_shape = _prepare_ll(log_likelihood)
    s = ll.shape[0]
    lppd_i = _logsumexp0(ll) - np.log(s)
    p_i = np.var(ll, axis=0, ddof=1)
    elpd_i = lppd_i - p_i
    n = elpd_i.shape[0]
    se = np.sqrt(n * np.var(elpd_i, ddof=1)) if n > 1 else np.float64(0.0)
    return WAICResult(
        elpd_waic=np.sum(elpd_i),
        p_waic=np.sum(p_i),
        se=np.float64(se),
        pointwise=elpd_i.reshape(data_shape),
    )


def _logsumexp0(x):
    m = np.max(x, axis=0)
    return m + np.log(np.sum(np.exp(x - m[None]), axis=0))


def _gpd_fit(exc):
    """Generalized-Pareto fit to exceedances (Zhang & Stephens 2009
    empirical-Bayes estimator, the PSIS paper's recommendation).

    :param exc: ``[M, C]`` ascending-sorted positive exceedances, one
        column per data point.
    :return: ``(xi, sigma)`` each ``[C]`` — STANDARD shape/scale
        convention (scipy ``genpareto(c=xi, scale=sigma)``); Zhang &
        Stephens' ``k`` is ``-xi``.
    """
    m_tail, c = exc.shape
    n_b = 30 + int(np.sqrt(m_tail))
    j = np.arange(1, n_b + 1, dtype=np.float64)
    x_quart = exc[int(m_tail / 4 + 0.5) - 1]  # [C] first-quartile value
    # Candidate b = k/sigma grid; every b < 1/x_max so 1 - b*x > 0.
    b = (
        1.0 / exc[-1][None]
        + (1.0 - np.sqrt(n_b / (j - 0.5)))[:, None] / (3.0 * x_quart)[None]
    )  # [n_b, C]
    # Profile likelihood L(b) = M (log(b/k_b) + k_b - 1) with
    # k_b = -mean log(1 - b x)  (Z&S Eq. 7).
    log1mbx = np.log1p(-b[:, None, :] * exc[None, :, :])  # [n_b, M, C]
    k_b = -np.mean(log1mbx, axis=1)  # [n_b, C]
    profile = m_tail * (np.log(b / k_b) + k_b - 1.0)
    # Bayesian weighting of the grid: W_j = 1 / sum_l exp(L_l - L_j),
    # i.e. softmax(L) — computed max-shifted so no exp overflows.
    profile = profile - np.max(profile, axis=0)[None]
    w_raw = np.exp(profile)
    w = w_raw / np.sum(w_raw, axis=0)[None]  # [n_b, C]
    b_hat = np.sum(w * b, axis=0)  # [C]
    k_hat = -np.mean(np.log1p(-b_hat[None] * exc), axis=0)
    xi = -k_hat
    sigma = k_hat / b_hat
    # Weakly-informative prior regularization toward xi = 0.5 (PSIS
    # paper appendix C): stabilizes the small-tail estimate.
    xi = (m_tail * xi + 5.0) / (m_tail + 10.0)
    return xi, sigma


def _gpd_quantile(p, xi, sigma):
    """Standard-convention GPD quantile, elementwise over columns."""
    xi_safe = np.where(np.abs(xi) < 1e-12, 1e-12, xi)
    q = sigma[None] * np.expm1(-xi_safe[None] * np.log1p(-p[:, None])) \
        / xi_safe[None]
    q_lim = -sigma[None] * np.log1p(-p[:, None])
    return np.where(np.abs(xi)[None] < 1e-12, q_lim, q)


def psis_smooth_log_weights(log_ratios, _chunk: int = 1 << 22):
    """Pareto-smoothed importance sampling weights (Vehtari, Simpson,
    Gelman, Yao & Gabry 2024): fit a GPD to the largest
    ``M = min(0.2 S, 3 sqrt(S))`` raw ratios per column, replace them by
    the fitted quantiles at ``(z - 0.5)/M``, cap at the raw maximum.

    :param log_ratios: ``[S, C]`` raw log importance ratios.
    :return: ``(log_weights [S, C] — UNNORMALIZED, khat [C])``. Columns
        with too few draws for a tail fit (``S < 25``) or a
        zero-variation tail pass through unsmoothed with ``khat`` of
        ``inf`` / ``-inf`` respectively.
    """
    lr = np.asarray(log_ratios, np.float64)
    s, c = lr.shape
    shift = np.max(lr, axis=0)
    lr = lr - shift[None]
    m_tail = int(min(0.2 * s, 3.0 * np.sqrt(s)))
    if m_tail < 5:
        return lr, np.full(c, np.inf)
    order = np.argsort(lr, axis=0, kind="stable")
    srt = np.take_along_axis(lr, order, axis=0)
    cutoff = srt[s - m_tail - 1]  # [C] largest non-tail log ratio
    tail = srt[s - m_tail:]  # [M, C] ascending
    exc = np.exp(tail) - np.exp(cutoff)[None]  # positive exceedances
    ok = (exc[-1] > 0) & np.all(np.isfinite(exc), axis=0)
    khat = np.full(c, -np.inf)
    smoothed = tail.copy()
    if np.any(ok):
        # Chunk the [n_b, M, C] fit workspace to bound host memory.
        idx_ok = np.nonzero(ok)[0]
        n_b = 30 + int(np.sqrt(m_tail))
        cols_per = max(1, _chunk // max(1, n_b * m_tail))
        p = (np.arange(m_tail, dtype=np.float64) + 0.5) / m_tail
        for start in range(0, idx_ok.size, cols_per):
            cols = idx_ok[start:start + cols_per]
            e = np.maximum(exc[:, cols], 1e-300)
            xi, sigma = _gpd_fit(e)
            good = np.isfinite(xi) & np.isfinite(sigma) & (sigma > 0)
            q = _gpd_quantile(p, xi, sigma)
            sm = np.log(np.exp(cutoff[cols])[None] + q)
            # Cap at the raw maximum (= 0 after the shift).
            sm = np.minimum(sm, 0.0)
            smoothed[:, cols] = np.where(good[None], sm, tail[:, cols])
            khat[cols] = np.where(good, xi, np.inf)
    out = np.concatenate([srt[: s - m_tail], smoothed], axis=0)
    # Undo the sort.
    unsorted = np.empty_like(out)
    np.put_along_axis(unsorted, order, out, axis=0)
    return unsorted, khat


def psis_loo(log_likelihood) -> LOOResult:
    """PSIS-LOO: leave-one-out expected log predictive density via
    Pareto-smoothed importance sampling (Vehtari, Gelman & Gabry 2017).

    The importance ratios for point ``i`` are ``1/p(y_i | theta_s)``
    (draws come from the FULL posterior); their right tail is smoothed
    with a generalized-Pareto fit before the weighted average

        elpd_loo_i = log [ sum_s w_s p(y_i|theta_s) / sum_s w_s ].

    :param log_likelihood: ``[n_draws, n_data...]`` pointwise
        log-likelihoods from draws of the full posterior.
    """
    ll, data_shape = _prepare_ll(log_likelihood)
    s = ll.shape[0]
    lw, khat = psis_smooth_log_weights(-ll)
    lw = lw - _logsumexp0(lw)[None]
    elpd_i = _logsumexp0(lw + ll)
    lppd_i = _logsumexp0(ll) - np.log(s)
    n = elpd_i.shape[0]
    se = np.sqrt(n * np.var(elpd_i, ddof=1)) if n > 1 else np.float64(0.0)
    return LOOResult(
        elpd_loo=np.sum(elpd_i),
        p_loo=np.sum(lppd_i - elpd_i),
        se=np.float64(se),
        pareto_k=khat.reshape(data_shape),
        pointwise=elpd_i.reshape(data_shape),
    )


class ComparisonRow(NamedTuple):
    """One row of :func:`compare` (models ranked best-first)."""

    name: str
    rank: int
    elpd: float  # elpd_loo or elpd_waic of this model
    se: float  # standard error of this model's elpd
    elpd_diff: float  # elpd(best) - elpd(this); 0 for the best row
    dse: float  # PAIRED standard error of that difference (pointwise
    #             differences share data — much tighter than hypot(se))
    p_eff: float  # effective parameter count (p_loo / p_waic)
    warning: bool  # True when any pareto_k > 0.7 (LOO results only)


def compare(results) -> "list[ComparisonRow]":
    """Rank models by expected log predictive density.

    The difference column uses the PAIRED standard error over shared
    data points (Vehtari, Gelman & Gabry 2017 Eq. 24): pointwise elpd
    differences cancel shared data noise, so two models can be
    confidently separated even when their individual ``se`` intervals
    overlap.

    :param results: ``{model_name: LOOResult | WAICResult}`` — all
        scored on the SAME data (pointwise shapes must match).
    :return: list of :class:`ComparisonRow`, best model first.
    """
    if len(results) < 2:
        raise ValueError("compare needs at least two models.")
    point = {}
    for name, res in results.items():
        point[name] = np.asarray(res.pointwise, np.float64).reshape(-1)
    shapes = {v.shape for v in point.values()}
    if len(shapes) != 1:
        raise ValueError(
            "All models must be scored on the same data; pointwise "
            "shapes differ: {}.".format(
                {k: v.shape for k, v in point.items()})
        )
    order = sorted(results, key=lambda k: -float(np.sum(point[k])))
    best = order[0]
    n = point[best].shape[0]
    rows = []
    for rank, name in enumerate(order):
        res = results[name]
        diff_i = point[best] - point[name]
        dse = (
            float(np.sqrt(n * np.var(diff_i, ddof=1)))
            if (name != best and n > 1) else 0.0
        )
        k = getattr(res, "pareto_k", None)
        p_eff = res.p_loo if isinstance(res, LOOResult) else res.p_waic
        rows.append(ComparisonRow(
            name=name,
            rank=rank,
            elpd=float(np.sum(point[name])),
            se=float(res.se),
            elpd_diff=float(np.sum(diff_i)),
            dse=dse,
            p_eff=float(p_eff),
            warning=bool(np.any(np.asarray(k) > 0.7))
            if k is not None else False,
        ))
    return rows
