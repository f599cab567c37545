"""Sampler validation: Geweke (2004) joint tests + simulation-based
calibration (Talts et al. 2018).

Beyond the reference (whose sampler tests compare moments against known
targets, e.g. tests/test_hmc.py — necessary but weak: subtle detailed-
balance bugs pass moment checks on easy targets): Geweke's joint-
distribution test validates a TRANSITION KERNEL against a MODEL exactly.
Two simulators for the same joint p(latent, data):

- *marginal-conditional*: draw ``latent ~ p(latent)``, then
  ``data ~ p(data | latent)`` — exact independent joint draws;
- *successive-conditional*: a Markov chain alternating
  ``data ~ p(data | latent)`` (exact, from the model) with
  ``latent <- K(latent | data)`` (the kernel under test, which must be
  p(latent | data)-invariant).

If the kernel is correct, both simulators target the SAME joint, so
every test statistic ``g(latent, data)`` must agree in expectation; a
z-score blowing past ~4-5 exposes the bug. Crucially, the successive
chain STARTS in stationarity (the initial point is itself a joint draw),
so there is no burn-in question, and per-chain means over independent
vectorized chains give an exact standard error without autocorrelation
machinery — the TPU-native chain axis doing statistical work.

Typical use (also how this library tests its own kernels,
tests/test_geweke.py)::

    res = geweke_test(model_meta_bn, zs.HMC(step_size=0.3, n_leapfrogs=5),
                      latent=["mu"], data=["y"], key=key)
    assert res.max_abs_z < 5.0, res.z_scores

Model requirements: nodes must broadcast over a leading chain axis fed
through the latent (the library-wide chain convention), and the latent/
data split must cover every stochastic node.

Reference: Geweke (2004), "Getting it right: joint distribution tests of
posterior simulators", JASA 99(467).
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from zhusuan_tpu.framework.bn import StochasticTensor
from zhusuan_tpu.mcmc.hmc import HMC
from zhusuan_tpu.mcmc.nuts import NUTS
from zhusuan_tpu.mcmc.discrete import DiscreteGibbs
from zhusuan_tpu.mcmc.rwm import _MetropolisBase
from zhusuan_tpu.mcmc.slice_sampler import SliceSampler

__all__ = ["geweke_test", "GewekeResult", "sbc_test", "SBCResult"]


class GewekeResult(NamedTuple):
    """Output of :func:`geweke_test`."""

    z_scores: Dict[str, float]  # per-statistic z between the simulators
    max_abs_z: float  # the headline: > ~5 means a broken kernel
    mc_means: Dict[str, float]  # marginal-conditional statistic means
    sc_means: Dict[str, float]  # successive-conditional statistic means
    n_mc: int  # independent joint draws used
    n_chains: int  # successive-conditional chains
    n_iters: int  # successive-conditional iterations per chain


def _default_statistics(latent: List[str], data: List[str]):
    """First and second moments of each latent plus latent-data cross
    moments — the Geweke-recommended minimum battery."""

    def flat_mean(x):
        x = jnp.asarray(x)
        axes = tuple(range(1, x.ndim))
        return jnp.mean(x, axis=axes) if axes else x

    stats = {}
    for name in latent:
        stats["mean[{}]".format(name)] = (
            lambda v, n=name: flat_mean(v[n])
        )
        stats["m2[{}]".format(name)] = (
            lambda v, n=name: flat_mean(jnp.square(jnp.asarray(v[n])))
        )
        for dname in data:
            stats["cross[{},{}]".format(name, dname)] = (
                lambda v, n=name, d=dname:
                flat_mean(v[n]) * flat_mean(v[d])
            )
    return stats


def _make_transition(kernel):
    """Adapt a sampler to ``(meta_bn, observed, latent, carry, key) ->
    (latent, carry)`` with EVERY adaptation channel frozen — Geweke
    requires a fixed p(latent|data)-invariant kernel."""
    if isinstance(kernel, HMC):
        adapt_ss = (
            jnp.asarray(False) if kernel.adapt_step_size is not None
            else None
        )
        adapt_m = (
            jnp.asarray(False) if kernel.adapt_mass is not None else None
        )

        def init(latent):
            return kernel.init(latent, n_chain_dims=1)

        def step(meta_bn, observed, latent, carry, key):
            carry = carry._replace(q=latent)
            carry, _ = kernel.sample(
                meta_bn, observed, carry, key,
                adapt_step_size=adapt_ss, adapt_mass=adapt_m,
                init_step_size_search=False,
            )
            return carry.q, carry

        return init, step
    if isinstance(kernel, NUTS):
        def init(latent):
            return kernel.init(latent, n_chain_dims=1)

        def step(meta_bn, observed, latent, carry, key):
            # NUTS recomputes the density each iteration (no carried
            # cache), so the fresh data draw needs no invalidation.
            carry = carry._replace(q=latent)
            carry, _ = kernel.sample(
                meta_bn, observed, carry, key,
                adapt_step_size=False, adapt_mass=False,
            )
            return carry.q, carry

        return init, step
    if isinstance(kernel, _MetropolisBase):
        def init(latent):
            return kernel.init(latent, n_chain_dims=1)

        def step(meta_bn, observed, latent, carry, key):
            # The carried (log_prob, grad) cache was computed under the
            # PREVIOUS data draw — stale now; the NaN sentinel forces a
            # re-evaluation against the fresh conditional.
            carry = carry._replace(q=latent).invalidate_cache()
            carry, _ = kernel.sample(
                meta_bn, observed, carry, key, adapt=False
            )
            return carry.q, carry

        return init, step
    if isinstance(kernel, (SliceSampler, DiscreteGibbs)):
        def init(latent):
            return kernel.init(latent, n_chain_dims=1)

        def step(meta_bn, observed, latent, carry, key):
            # Same staleness rule as the Metropolis family: the cached
            # density was computed under the previous data draw.
            carry = carry._replace(q=latent).invalidate_cache()
            carry, _ = kernel.sample(
                meta_bn, observed, carry, key, adapt=False
            )
            return carry.q, carry

        return init, step
    if callable(kernel):
        # Raw transition: latent' = kernel(meta_bn, observed, latent, key)
        # (stateless — how the sensitivity test injects a broken kernel).
        def init(latent):
            return None

        def step(meta_bn, observed, latent, carry, key):
            return kernel(meta_bn, observed, latent, key), None

        return init, step
    raise TypeError(
        "kernel must be an HMC instance, a Metropolis-family sampler "
        "(RandomWalkMetropolis/MALA), a SliceSampler, or a callable "
        "transition "
        "``(meta_bn, observed, latent_dict, key) -> latent_dict``; got "
        "{!r}.".format(type(kernel))
    )


def geweke_test(
    meta_bn,
    kernel,
    latent: List[str],
    data: List[str],
    key,
    n_iters: int = 2000,
    n_chains: int = 64,
    n_mc: int = 100_000,
    statistics: Optional[Dict[str, Callable]] = None,
) -> GewekeResult:
    """Run the Geweke joint-distribution test of ``kernel`` against
    ``meta_bn``. Fully on-device: the marginal-conditional side is one
    vmapped prior sweep, the successive-conditional side one
    ``lax.scan`` over ``n_chains`` vectorized chains.

    :param meta_bn: the model (a MetaBayesianNet); ``latent`` +
        ``data`` must name all of its stochastic nodes.
    :param kernel: sampler under test (HMC / RWM / MALA instance —
        adaptation is forcibly frozen), or a raw transition callable
        ``(meta_bn, observed, latent_dict, key) -> latent_dict``.
    :param latent: latent node names (the kernel's targets).
    :param data: data node names (redrawn from the model each step).
    :param key: PRNG key.
    :param n_iters: successive-conditional steps per chain.
    :param n_chains: vectorized successive-conditional chains (standard
        errors come from the spread of per-chain means).
    :param n_mc: independent marginal-conditional joint draws.
    :param statistics: optional ``{name: fn(values_dict) -> [C]}``
        overriding the default moment battery; each fn maps the node-
        value dict (chain axis leading) to a per-chain scalar.
    :return: :class:`GewekeResult`.
    """
    latent = list(latent)
    data = list(data)
    names = latent + data
    # Validate coverage once, eagerly (a forgotten node would silently
    # be redrawn on BOTH sides and mask kernel bugs).
    probe = meta_bn.observe(key=jax.random.PRNGKey(0))
    stochastic = [
        n for n, node in probe.nodes.items()
        if isinstance(node, StochasticTensor)
    ]
    missing = sorted(set(stochastic) - set(names))
    extra = sorted(set(names) - set(stochastic))
    if missing or extra:
        raise ValueError(
            "latent + data must cover the model's stochastic nodes "
            "exactly; missing {}, unknown {}.".format(missing, extra)
        )
    stats = statistics or _default_statistics(latent, data)
    init_fn, step_fn = _make_transition(kernel)

    key_mc, key_init, key_scan = jax.random.split(jnp.asarray(key), 3)

    # --- marginal-conditional: independent joint draws ----------------- #
    def joint_draw(k):
        bn = meta_bn.observe(key=k)
        return {n: bn._node_value(bn.nodes[n]) for n in names}

    mc_vals = jax.vmap(joint_draw)(jax.random.split(key_mc, n_mc))
    mc_stats = {name: np.asarray(fn(mc_vals), np.float64)
                for name, fn in stats.items()}

    # --- successive-conditional chain ---------------------------------- #
    init_vals = jax.vmap(joint_draw)(jax.random.split(key_init, n_chains))
    latent0 = {n: init_vals[n] for n in latent}
    carry0 = init_fn(latent0)
    if carry0 is not None and hasattr(carry0, "log_prob"):
        # Metropolis-family carry: align the density-cache dtype to the
        # model's log-joint (mixed-dtype models) so the scan carry is
        # type-stable from iteration 0 — the MHState.run() recipe.
        from zhusuan_tpu.mcmc.base import make_log_joint_fn

        obs0 = {n: init_vals[n] for n in data}
        lp_dtype = jax.eval_shape(
            make_log_joint_fn(meta_bn, obs0), latent0
        ).dtype
        carry0 = carry0._replace(
            log_prob=carry0.log_prob.astype(lp_dtype)
        )

    def body(c, k):
        lat, kcarry = c
        k_data, k_trans = jax.random.split(k)
        bn = meta_bn.observe(key=k_data, **lat)
        obs = {n: bn._node_value(bn.nodes[n]) for n in data}
        lat, kcarry = step_fn(meta_bn, obs, lat, kcarry, k_trans)
        vals = dict(lat)
        vals.update(obs)
        out = {name: fn(vals) for name, fn in stats.items()}
        return (lat, kcarry), out

    (_, _), sc_series = jax.lax.scan(
        body, (latent0, carry0), jax.random.split(key_scan, n_iters)
    )
    # sc_series[name]: [n_iters, n_chains]

    z_scores, mc_means, sc_means = {}, {}, {}
    for name in stats:
        mc = mc_stats[name]
        mc_mean = float(np.mean(mc))
        mc_se = float(np.std(mc, ddof=1) / np.sqrt(mc.shape[0]))
        chain_means = np.asarray(sc_series[name], np.float64).mean(axis=0)
        sc_mean = float(np.mean(chain_means))
        sc_se = float(
            np.std(chain_means, ddof=1) / np.sqrt(chain_means.shape[0])
        )
        z = (mc_mean - sc_mean) / float(np.hypot(mc_se, sc_se))
        z_scores[name] = float(z)
        mc_means[name] = mc_mean
        sc_means[name] = sc_mean

    return GewekeResult(
        z_scores=z_scores,
        max_abs_z=float(np.max(np.abs(list(z_scores.values())))),
        mc_means=mc_means,
        sc_means=sc_means,
        n_mc=int(n_mc),
        n_chains=int(n_chains),
        n_iters=int(n_iters),
    )


class SBCResult(NamedTuple):
    """Output of :func:`sbc_test`."""

    ranks: Dict[str, np.ndarray]  # per-statistic ranks in {0..n_draws}
    histograms: Dict[str, np.ndarray]  # binned rank counts [n_bins]
    p_values: Dict[str, float]  # chi-square uniformity p per statistic
    min_p_value: float  # the headline: tiny => miscalibrated inference
    n_sims: int
    n_draws: int  # posterior draws ranked against (L)
    expected_per_bin: float


def sbc_test(
    meta_bn,
    kernel,
    latent: List[str],
    data: List[str],
    key,
    n_sims: int = 256,
    n_draws: int = 63,
    thinning: int = 10,
    n_warmup: int = 300,
    n_bins: int = 16,
    statistics: Optional[Dict[str, Callable]] = None,
) -> SBCResult:
    """Simulation-based calibration (Talts et al. 2018): rank-uniformity
    validation of a full inference procedure.

    For each of ``n_sims`` simulations, a joint draw
    ``(theta_s, y_s) ~ p(theta, data)`` gives a dataset and — because the
    pair is a joint draw — an EXACT posterior sample ``theta_s`` of
    ``p(theta | y_s)``. The sampler then produces ``n_draws`` more
    posterior draws for the same ``y_s``; if it is calibrated, the rank
    of ``g(theta_s)`` among ``{g(theta'_l)}`` is uniform on
    ``{0..n_draws}`` for ANY scalar statistic ``g``. Non-uniformity
    localizes the failure: a U-shaped histogram means the posterior is
    too narrow, a hump too wide, a slope means bias.

    TPU-native: all ``n_sims`` simulations run as ONE vectorized chain
    axis (per-sim data rides the same leading axis through ``observed``),
    so the whole calibration study is two ``lax.scan`` programs —
    adaptation, then thinned collection.

    Because chains START at the exact posterior draw ``theta_s`` (already
    stationary), no burn-in is discarded: ``n_warmup`` exists only to
    adapt the step size, and those iterations also keep the chain
    stationary. ``thinning`` combats the autocorrelation that would
    otherwise distort ranks (Talts et al. §5.1).

    :param meta_bn: the model; ``latent`` + ``data`` must cover its
        stochastic nodes (checked).
    :param kernel: any sampler following the library ``init``/``run``
        contract (HMC, NUTS, RandomWalkMetropolis, MALA, ChEESHMC...).
    :param statistics: optional ``{name: fn(latent_dict) -> [S]}``
        per-sim scalar statistics; default: flat mean and second moment
        of every latent.
    :return: :class:`SBCResult`; check ``min_p_value`` (with a
        multiple-comparison margin) or plot ``histograms``.
    """
    from scipy import stats as _sps

    latent = list(latent)
    data = list(data)
    names = latent + data
    probe = meta_bn.observe(key=jax.random.PRNGKey(0))
    stochastic = [
        n for n, node in probe.nodes.items()
        if isinstance(node, StochasticTensor)
    ]
    missing = sorted(set(stochastic) - set(names))
    extra = sorted(set(names) - set(stochastic))
    if missing or extra:
        raise ValueError(
            "latent + data must cover the model's stochastic nodes "
            "exactly; missing {}, unknown {}.".format(missing, extra)
        )
    if (n_draws + 1) % n_bins != 0:
        raise ValueError(
            "n_draws + 1 ({}) must be divisible by n_bins ({}) so rank "
            "bins have equal prior mass (Talts et al. recommend e.g. "
            "n_draws=63, n_bins=16).".format(n_draws + 1, n_bins)
        )

    if statistics is None:
        def flat_mean(x):
            x = jnp.asarray(x)
            axes = tuple(range(1, x.ndim))
            return jnp.mean(x, axis=axes) if axes else x

        statistics = {}
        for name in latent:
            statistics["mean[{}]".format(name)] = (
                lambda v, n=name: flat_mean(v[n])
            )
            statistics["m2[{}]".format(name)] = (
                lambda v, n=name: flat_mean(jnp.square(jnp.asarray(v[n])))
            )

    key_joint, key_warm, key_run = jax.random.split(jnp.asarray(key), 3)

    # One vmapped sweep: (theta_s, y_s) joint draws, sims as chain axis.
    def joint_draw(k):
        bn = meta_bn.observe(key=k)
        return {n: bn._node_value(bn.nodes[n]) for n in names}

    vals = jax.vmap(joint_draw)(jax.random.split(key_joint, n_sims))
    theta0 = {n: vals[n] for n in latent}
    observed = {n: vals[n] for n in data}

    state = kernel.init(theta0, n_chain_dims=1)
    if n_warmup > 0:
        state, _ = jax.jit(
            lambda s, k: kernel.run(
                meta_bn, observed, s, k, n_iters=n_warmup,
                n_adapt=n_warmup, collect=False,
            )
        )(state, key_warm)
    state, out = jax.jit(
        lambda s, k: kernel.run(
            meta_bn, observed, s, k, n_iters=n_draws * thinning,
            n_adapt=0, collect_fields=("samples",), thinning=thinning,
        )
    )(state, key_run)
    draws = out["samples"]  # {name: [n_draws, n_sims, ...]}

    ranks, hists, pvals = {}, {}, {}
    edges = np.arange(0, n_draws + 2, (n_draws + 1) // n_bins)
    for sname, fn in statistics.items():
        g0 = np.asarray(fn(theta0), np.float64)  # [S]
        gd = np.asarray(
            jax.vmap(fn)(draws), np.float64
        )  # [n_draws, S]
        r = np.sum(gd < g0[None, :], axis=0).astype(np.int64)  # [S]
        hist = np.histogram(r, bins=edges)[0]
        expected = n_sims / n_bins
        chi2 = float(np.sum((hist - expected) ** 2 / expected))
        pvals[sname] = float(_sps.chi2.sf(chi2, df=n_bins - 1))
        ranks[sname] = r
        hists[sname] = hist

    return SBCResult(
        ranks=ranks,
        histograms=hists,
        p_values=pvals,
        min_p_value=float(np.min(list(pvals.values()))),
        n_sims=int(n_sims),
        n_draws=int(n_draws),
        expected_per_bin=float(n_sims / n_bins),
    )
