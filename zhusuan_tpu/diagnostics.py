"""MCMC diagnostics: effective sample size.

Capability parity with reference ``zhusuan/diagnostics.py``:
``effective_sample_size_1d`` (diagnostics.py:17-40) and
``effective_sample_size`` (diagnostics.py:43-64, min over dimensions).

The reference estimator (kept bit-for-bit here, it backs the BASELINE.md
test bounds): with ``mu = mean(x)``, ``var = np.var(x) * n/(n-1)``,
``var_plus = np.var(x)`` and ``acov(t) = mean((x[:n-t]-mu)*(x[t:]-mu))``
(note the 1/(n-t) normalization), accumulate
``rho_t = 1 - (var - acov(t)) / var_plus`` from t=0 upward until the first
negative value, then ``ess = n / (1 + 2 * sum_rho)``.

TPU-native: the O(n^2) per-lag Python loop of the reference becomes one
batched FFT autocovariance (O(n log n)) over all dimensions at once —
this is what makes the ESS/sec north-star metric cheap to evaluate on-chip.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "effective_sample_size",
    "effective_sample_size_1d",
    "ess_batch",
    "ess_batch_device",
    "nested_rhat",
    "potential_scale_reduction",
    "summary",
    "kernel_stein_discrepancy",
]


def _rank_normalize(x):
    """AVERAGE fractional ranks -> normal scores over the pooled draws
    (Vehtari et al. 2021, Eq. 14: Blom offsets, then the normal PPF).

    Average ranks (ties share one rank) matter: ordinal argsort ranks
    give tied values sort-order-dependent distinct scores, which
    fabricates R-hat ~1.5 on constant/discrete latents. The PPF comes
    from ``jax.scipy.special.ndtri`` — no scipy dependency at runtime.
    """
    from jax.scipy.special import ndtri

    flat = x.reshape(-1, int(np.prod(x.shape[2:], dtype=np.int64)))
    n_tot, n_cols = flat.shape
    # Vectorized average ranks over ALL columns in one NumPy pass (no
    # per-column Python loop): stable argsort gives ordinal positions;
    # tie groups are contiguous in sorted order, so the average rank of a
    # group is (first_index + last_index)/2, recovered with prefix/suffix
    # accumulates and scattered back with put_along_axis.
    order = np.argsort(flat, axis=0, kind="stable")
    sv = np.take_along_axis(flat, order, axis=0)
    idx = np.arange(n_tot, dtype=flat.dtype)[:, None]
    start = np.ones((n_tot, n_cols), dtype=bool)
    start[1:] = sv[1:] != sv[:-1]
    first = np.maximum.accumulate(np.where(start, idx, 0.0), axis=0)
    nxt = np.concatenate(
        [np.where(start[1:], idx[1:], float(n_tot)),
         np.full((1, n_cols), float(n_tot), flat.dtype)], axis=0)
    last = np.flip(
        np.minimum.accumulate(np.flip(nxt, axis=0), axis=0), axis=0
    ) - 1.0
    ranks = np.empty_like(flat)
    np.put_along_axis(ranks, order, 0.5 * (first + last), axis=0)
    z = np.asarray(
        ndtri((ranks + 1 - 0.375) / (n_tot + 0.25))
    )
    return z.reshape(x.shape)


def potential_scale_reduction(samples, rank_normalized: bool = False):
    """Split-R-hat (Gelman-Rubin potential scale reduction) per dimension.

    Not present in the reference (its only diagnostic is ESS); added
    because multi-chain sampling is this library's flagship axis and R-hat
    is the standard convergence check for it. Values near 1.0 indicate
    convergence; > 1.01 is suspect.

    :param samples: ``[n_iters, n_chains, ...]`` array (each chain's
        draws along axis 0).
    :param rank_normalized: compute the modern rank-normalized R-hat
        (Vehtari et al. 2021): the max of the BULK statistic
        (rank-normal scores — robust to heavy tails) and the FOLDED
        statistic (scores of ``|x - median|`` — catches chains that agree
        in location but differ in SCALE, which the plain statistic
        misses entirely).
    :return: numpy array of shape ``samples.shape[2:]``.
    """
    if rank_normalized:
        x = np.asarray(samples, np.float64)
        bulk = potential_scale_reduction(_rank_normalize(x))
        folded = potential_scale_reduction(
            _rank_normalize(np.abs(x - np.median(x, axis=(0, 1))))
        )
        return np.maximum(bulk, folded)
    x = np.asarray(samples, np.float64)
    n, m = x.shape[:2]
    if n < 2:
        raise ValueError(
            "split-R-hat needs n_iters >= 2 to estimate within-chain "
            "variance (got {}); for single-draw many-chain runs use "
            "nested_rhat.".format(n)
        )
    # Split each chain in half (guards against trending chains).
    half = n // 2
    x = np.concatenate([x[:half], x[half:2 * half]], axis=1)
    n, m = x.shape[:2]
    chain_means = x.mean(axis=0)  # [m, ...]
    chain_vars = x.var(axis=0, ddof=1)  # [m, ...]
    w = chain_vars.mean(axis=0)
    b = n * chain_means.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / w)
    return rhat


def nested_rhat(samples, n_superchains: int, rank_normalized: bool = False):
    """Nested R-hat for the many-short-chains regime (Margossian, Hoffman,
    Sountsov, Carpenter, Gelman & Vehtari, "Nested R-hat: Assessing the
    convergence of Markov chain Monte Carlo when running many short
    chains", Bayesian Analysis 2024).

    Not present in the reference (its only diagnostic is ESS); added
    because vectorized thousands-of-chains sampling is this library's
    flagship axis, and classic (split-)R-hat needs each chain long enough
    to estimate its own variance — useless when the TPU budget buys
    4096 chains x 10 draws. Nested R-hat groups chains into K
    *superchains* of M chains each and compares between-superchain
    variance to within-superchain variance (between-chain + within-chain),
    so it remains well-defined even at ONE draw per chain:

    .. math::
        \\hat R_{nested} = \\sqrt{1 + \\hat B / \\hat W},

    where :math:`\\hat B` is the (ddof=1) variance of superchain means and
    :math:`\\hat W = \\tfrac1K \\sum_k \\big[\\tfrac1M \\sum_m
    (\\bar x_{mk} - \\bar x_{k})^2 + \\tfrac1M \\sum_m s^2_{mk}\\big]`
    with biased (1/N) within-chain variances. At stationarity
    :math:`\\hat R_{nested}^2 \\approx 1 + 1/(MN)` per superchain, so the
    paper's decision rule is ``nested_rhat < sqrt(1 + 1/ess_target)``.

    For the diagnostic to detect non-mixing, chains *within* a superchain
    should share (or draw from the same) initialization, so that distinct
    basins/modes separate superchains rather than being averaged inside
    one. Chains are grouped contiguously: chain axis index
    ``c`` belongs to superchain ``c // (n_chains // n_superchains)``.

    :param samples: ``[n_iters, n_chains, ...]`` array; ``n_iters`` may
        be 1.
    :param n_superchains: K; must divide ``n_chains`` and be >= 2.
    :param rank_normalized: apply the Vehtari et al. 2021 bulk/folded
        rank-normalization (max of the two statistics), as in
        :func:`potential_scale_reduction`.
    :return: numpy array of shape ``samples.shape[2:]``.
    """
    x = np.asarray(samples, np.float64)
    if x.ndim < 2:
        raise ValueError(
            "samples must be [n_iters, n_chains, ...]; got shape "
            + repr(x.shape)
        )
    n, c = x.shape[:2]
    k = int(n_superchains)
    if k < 2:
        raise ValueError("n_superchains must be >= 2.")
    if c % k != 0:
        raise ValueError(
            "n_superchains ({}) must divide n_chains ({}).".format(k, c)
        )
    if rank_normalized:
        bulk = nested_rhat(_rank_normalize(x), k)
        folded = nested_rhat(
            _rank_normalize(np.abs(x - np.median(x, axis=(0, 1)))), k
        )
        return np.maximum(bulk, folded)
    m = c // k
    x = x.reshape((n, k, m) + x.shape[2:])
    chain_means = x.mean(axis=0)                     # [k, m, ...]
    within_chain = x.var(axis=0, ddof=0)             # [k, m, ...] (1/N)
    super_means = chain_means.mean(axis=1)           # [k, ...]
    between_chain = np.mean(
        (chain_means - super_means[:, None]) ** 2, axis=1
    )                                                # [k, ...]
    w = np.mean(between_chain + within_chain.mean(axis=1), axis=0)
    b = super_means.var(axis=0, ddof=1)              # [...]
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(1.0 + b / w)
    return rhat


def _batched_reference_acov(x):
    """Reference-style autocovariance for all lags, batched.

    x: float64 array [n, d]. Returns acov [n, d] with
    ``acov[t] = (1/(n-t)) * sum_i (x[i]-mu)(x[i+t]-mu)`` (parity with
    reference diagnostics.py:29-30 which uses ``np.mean`` over n-t terms).
    """
    n = x.shape[0]
    xc = x - x.mean(axis=0, keepdims=True)
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(xc, n=m, axis=0)
    raw = np.fft.irfft(f * np.conj(f), n=m, axis=0)[:n]
    counts = (n - np.arange(n))[:, None]
    return raw / counts


def _ess_from_acov(acov, n):
    """Vectorized reference recurrence: acov [n, d] -> ess [d]."""
    # acov[0] = mean((x-mu)^2) = biased variance = the reference's var_plus;
    # the reference's var is the unbiased variance.
    var_plus = acov[0]
    var = acov[0] * n / (n - 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1.0 - (var - acov) / var_plus  # [n, d]
    rho = np.where(np.isfinite(rho), rho, -1.0)
    neg = rho < 0  # [n, d]
    # First negative lag per dimension; if none, include all lags.
    any_neg = neg.any(axis=0)
    cutoff = np.where(any_neg, neg.argmax(axis=0), n)  # [d]
    lag_idx = np.arange(n)[:, None]
    sum_rho = np.sum(np.where(lag_idx < cutoff, rho, 0.0), axis=0)
    ess = n / (1.0 + 2.0 * sum_rho)
    # Zero-variance (frozen) dimension: the recurrence is 0/0 there and
    # the NaN->-1 fill used to credit a permanently-rejecting chain with
    # FULL ess = n. A constant chain carries no information about mixing
    # — report 0 (conservative; matches ess_batch_device bit-for-bit).
    return np.where(var_plus > 0, ess, 0.0)


def effective_sample_size_1d(samples):
    """ESS of a 1-D chain of scalar samples.

    Parity: reference ``diagnostics.py:17-40`` (identical estimator, FFT
    accelerated).

    :param samples: 1-D array of correlated samples.
    :return: float, the effective sample size.
    """
    samples = np.asarray(samples, dtype=np.float64)
    n = samples.shape[0]
    acov = _batched_reference_acov(samples[:, None])
    return float(_ess_from_acov(acov, n)[0])


def ess_batch(samples):
    """Per-dimension ESS for a chain of vector samples ``[n, d]`` -> ``[d]``.

    Same estimator as :func:`effective_sample_size_1d`, all dimensions at
    once. Backs the ESS/sec north-star benchmark (BASELINE.md).
    """
    samples = np.asarray(samples, dtype=np.float64)
    n = samples.shape[0]
    acov = _batched_reference_acov(samples.reshape(n, -1))
    return _ess_from_acov(acov, n)


def ess_batch_device(samples, chunk: int = 1 << 18):
    """On-device per-dimension ESS for huge chain batches.

    Same estimator as :func:`ess_batch` but the FFT autocovariance and the
    initial-positive-sequence cutoff run on the accelerator in float32,
    chunked over columns to bound HBM usage. Input ``[n, d]`` -> ``[d]``
    (numpy, on host).
    """
    import jax

    samples = jnp.asarray(samples)
    n, d = samples.shape

    @jax.jit
    def one_chunk(x):
        # Cast per chunk: a bf16 trajectory is upcast 2^18 columns at a
        # time instead of materializing the full f32 copy (which would
        # double the trajectory's HBM footprint).
        x = x.astype(jnp.float32)
        xc = x - jnp.mean(x, axis=0, keepdims=True)
        m = 1 << (2 * n - 1).bit_length()
        f = jnp.fft.rfft(xc, n=m, axis=0)
        raw = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=0)[:n]
        counts = (n - jnp.arange(n))[:, None]
        acov = raw / counts
        var_plus = acov[0]
        var = acov[0] * n / (n - 1)
        rho = 1.0 - (var - acov) / jnp.where(var_plus == 0, 1.0, var_plus)
        rho = jnp.where(jnp.isfinite(rho), rho, -1.0)
        neg = rho < 0
        any_neg = jnp.any(neg, axis=0)
        cutoff = jnp.where(any_neg, jnp.argmax(neg, axis=0), n)
        lag_idx = jnp.arange(n)[:, None]
        sum_rho = jnp.sum(jnp.where(lag_idx < cutoff, rho, 0.0), axis=0)
        ess = n / (1.0 + 2.0 * sum_rho)
        # Frozen dimension -> 0, agreeing with the host ess_batch (see
        # _ess_from_acov).
        return jnp.where(var_plus > 0, ess, 0.0)

    out = []
    for start in range(0, d, chunk):
        out.append(np.asarray(one_chunk(samples[:, start:start + chunk])))
    return np.concatenate(out)


def effective_sample_size(samples, burn_in: int = 100):
    """Minimum positive ESS across dimensions after discarding ``burn_in``.

    Parity: reference ``diagnostics.py:43-64`` (which returns the running
    minimum over dimensions, ignoring zero-ESS dimensions).

    :param samples: array ``[n_iters, d]`` (or any trailing shape, which is
        flattened), iterations first.
    :param burn_in: leading iterations to discard.
    :return: float, the minimum ESS.
    """
    samples = np.asarray(samples, dtype=np.float64)
    samples = samples[burn_in:]
    flat = samples.reshape(samples.shape[0], -1)
    esses = ess_batch(flat)
    positive = esses[esses > 0]
    if positive.size == 0:
        return np.inf
    return float(np.min(positive))


def summary(samples, round_to: int = 3, rank_normalized: bool = False,
            n_superchains: Optional[int] = None):
    """Per-latent convergence/summary table over stacked MCMC output.

    Beyond the reference (whose only diagnostic is ESS): the standard
    post-sampling health check — posterior mean/sd, split-R-hat and ESS
    for every latent in one call, over the ``(final_state, outputs)``
    convention every sampler's ``run(collect=True)`` emits.

    :param samples: dict ``{name: [n_iters, n_chains, ...]}`` (the
        ``outputs["samples"]`` of ``HMC.run``/``MALA.run``/... after any
        burn-in slicing), or a single such array.
    :param round_to: decimals in the formatted table.
    :param rank_normalized: use the rank-normalized + folded R-hat
        (see :func:`potential_scale_reduction`).
    :param n_superchains: when given, the r_hat column is
        :func:`nested_rhat` with this many superchains — the right
        diagnostic for many short chains (including n_iters == 1, where
        split-R-hat does not exist).
    :return: ``(stats, table)`` — ``stats`` maps each latent name to a
        dict with ``mean``/``sd``/``r_hat``/``ess`` arrays of the
        latent's data shape; ``table`` is a printable string.
    """
    if not isinstance(samples, dict):
        samples = {"x": samples}
    stats = {}
    for name, draws in samples.items():
        x = np.asarray(draws, np.float64)
        if x.ndim < 2:
            raise ValueError(
                "summary expects [n_iters, n_chains, ...] arrays; "
                "{} has shape {}.".format(name, x.shape)
            )
        n, m = x.shape[:2]
        data_shape = x.shape[2:]
        flat = x.reshape(n, m, -1)
        mean = flat.mean(axis=(0, 1))
        sd = flat.std(axis=(0, 1))
        if n_superchains is not None:
            r_hat = nested_rhat(
                flat, n_superchains, rank_normalized=rank_normalized
            )
        else:
            r_hat = potential_scale_reduction(
                flat, rank_normalized=rank_normalized
            )
        # ESS over pooled chains: per-chain ESS estimates summed (chains
        # are independent given convergence; this is the reference
        # estimator applied chain-wise, as in tests/test_mcmc.py) — in
        # ONE batched FFT pass over all chains x dims, not a Python loop.
        if n < 2:
            # The within-chain autocovariance estimator needs >= 2 draws
            # (it divides by n - 1); in the many-short-chains regime the
            # n_superchains caller explicitly advertises (n_iters == 1),
            # chains are independent runs, so each contributes one
            # independent draw: ESS = n_chains per latent dim.
            ess = np.full(flat.shape[-1], float(m))
        else:
            per_chain = ess_batch(
                flat.reshape(n, -1)
            ).reshape(m, flat.shape[-1])
            # A frozen chain (zero variance — e.g. permanent rejection)
            # has no information; the estimator's degenerate-
            # autocovariance path would credit it with full n. Zero it
            # instead so dead chains SHRINK the reported ESS rather than
            # inflating it.
            chain_var = flat.var(axis=0)  # [m, K]
            per_chain = np.where(chain_var > 1e-300, per_chain, 0.0)
            ess = per_chain.sum(axis=0)
        stats[name] = {
            "mean": mean.reshape(data_shape),
            "sd": sd.reshape(data_shape),
            "r_hat": np.asarray(r_hat).reshape(data_shape),
            "ess": ess.reshape(data_shape),
        }
    header = "{:<18}{:>10}{:>10}{:>8}{:>10}".format(
        "latent", "mean", "sd", "r_hat", "ess"
    )
    lines = [header, "-" * len(header)]
    for name, s in stats.items():
        flat_mean = np.ravel(s["mean"])
        flat_sd = np.ravel(s["sd"])
        flat_rh = np.ravel(s["r_hat"])
        flat_ess = np.ravel(s["ess"])
        for i in range(len(flat_mean)):
            label = name if len(flat_mean) == 1 else "{}[{}]".format(
                name, i)
            lines.append(
                "{:<18}{:>10}{:>10}{:>8}{:>10}".format(
                    label,
                    round(float(flat_mean[i]), round_to),
                    round(float(flat_sd[i]), round_to),
                    round(float(flat_rh[i]), round_to),
                    int(flat_ess[i]),
                )
            )
    return stats, "\n".join(lines)


def kernel_stein_discrepancy(samples, score_fn, c: float = 1.0,
                             beta: float = -0.5):
    """Kernelized Stein discrepancy (U-statistic) with the IMQ kernel.

    Beyond the reference: a gradient-based sample-quality measure
    (Gorham & Mackey 2017) — zero iff the sample matches the target
    whose score is ``score_fn``, WITHOUT needing the normalizing
    constant. Detects bias that ESS/R-hat cannot (they only measure
    mixing, not correctness). The IMQ kernel ``(c^2 + ||x-y||^2)^beta``
    with ``beta in (-1, 0)`` is the standard choice with convergence
    control.

    TPU notes: everything reduces to ``[n, n]`` Gram-style matmuls and
    elementwise ops — no ``[n, n, d]`` intermediates — so it runs at MXU
    speed and jits cleanly.

    :param samples: ``[n, d]`` array of draws.
    :param score_fn: ``x [n, d] -> grad log p(x) [n, d]`` (vectorized).
    :param c, beta: IMQ kernel parameters.
    :return: scalar KSD^2 estimate (can be slightly negative due to the
        unbiased U-statistic; compare magnitudes, not signs).
    """
    x = jnp.asarray(samples)
    if x.ndim != 2:
        raise ValueError(
            "samples must be [n, d]; got shape {}.".format(x.shape)
        )
    n, d = x.shape
    if n < 2:
        raise ValueError("KSD needs at least 2 samples.")
    s = score_fn(x)  # [n, d]

    x2 = jnp.sum(x * x, axis=1)
    r2 = jnp.maximum(x2[:, None] + x2[None, :] - 2.0 * (x @ x.T), 0.0)
    u = c * c + r2
    # One transcendental pow for the [n, n] matrix; the other two powers
    # of u follow by multiplication.
    p = u ** (beta - 2.0)
    g = 2.0 * beta * p * u  # = 2 beta u^{beta-1}
    k = p * u * u  # = u^beta

    ss = s @ s.T  # s(x_i) . s(x_j)
    sx = jnp.sum(s * x, axis=1)  # s(x_i) . x_i
    # s(x_i) . (x_i - x_j) and s(x_j) . (x_i - x_j) via matmuls.
    s_i_diff = sx[:, None] - s @ x.T
    s_j_diff = (x @ s.T) - sx[None, :]

    trace_term = -(4.0 * beta * (beta - 1.0) * p * r2 + g * d)
    u_p = k * ss - g * s_i_diff + g * s_j_diff + trace_term
    # U-statistic: drop the diagonal.
    total = jnp.sum(u_p) - jnp.sum(jnp.diagonal(u_p))
    return total / (n * (n - 1))
