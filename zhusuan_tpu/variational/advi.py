"""One-call ADVI: automatic guide + scanned on-device optimization.

Beyond the reference (which has no automatic VI at all): packages the
:class:`~zhusuan_tpu.variational.MeanFieldGuide` /
:class:`~zhusuan_tpu.variational.FullRankGuide` workflow —
derive-the-family, init params, optax loop — into one call whose entire
optimization runs as a single ``lax.scan`` program on-device (the
``fit_scan`` lesson: per-step host dispatch costs 10-40x on TPU, see
PERF.md "VAE vs the real reference").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from zhusuan_tpu.variational.autoguide import FullRankGuide, MeanFieldGuide
from zhusuan_tpu.variational.exclusive_kl import elbo

__all__ = ["advi", "ADVIResult"]


class ADVIResult(NamedTuple):
    """Output of :func:`advi`: the fitted guide + parameters, plus the
    per-iteration negative-ELBO trace for convergence inspection.
    Draw posterior samples with
    ``result.guide.sample_posterior(result.params, key, n)``."""

    guide: object
    params: dict
    losses: jnp.ndarray  # [n_iters] negative ELBO per step


def advi(
    meta_bn,
    observed,
    key,
    guide: str = "meanfield",
    n_iters: int = 2000,
    n_samples: int = 32,
    learning_rate: float = 1e-2,
    optimizer=None,
    bijectors: Optional[dict] = None,
) -> ADVIResult:
    """Fit an automatic Gaussian guide to ``meta_bn``'s posterior by
    SGVB, entirely on-device.

    :param meta_bn: the model (a MetaBayesianNet).
    :param observed: observation dict (defines the free latents).
    :param key: PRNG key.
    :param guide: ``"meanfield"``, ``"fullrank"``, or an already-built
        guide instance (anything exposing ``init_params`` / ``latent``).
    :param n_iters: optimization steps (one ``lax.scan``).
    :param n_samples: ELBO particles per step.
    :param learning_rate: Adam step size with cosine decay to 10%
        (ignored when ``optimizer`` is given).
    :param optimizer: optional optax optimizer overriding the default.
    :param bijectors: optional per-latent support bijector overrides,
        passed through to the guide constructor.
    :return: :class:`ADVIResult`.
    """
    import optax

    if isinstance(guide, str):
        cls = {"meanfield": MeanFieldGuide, "fullrank": FullRankGuide}.get(
            guide.lower()
        )
        if cls is None:
            raise ValueError(
                "guide must be 'meanfield', 'fullrank', or a guide "
                "instance; got {!r}.".format(guide)
            )
        g = cls(meta_bn, observed=observed, bijectors=bijectors)
    else:
        g = guide
    if optimizer is None:
        optimizer = optax.adam(
            optax.cosine_decay_schedule(
                learning_rate, max(int(n_iters), 1), 0.1
            )
        )

    params = g.init_params()
    opt_state = optimizer.init(params)

    def loss_fn(p, k):
        lat = g.latent(p, k, n_samples=n_samples)
        return elbo(meta_bn, observed, latent=lat, axis=0).sgvb()

    def step(carry, k):
        p, s = carry
        val, grads = jax.value_and_grad(loss_fn)(p, k)
        upd, s = optimizer.update(grads, s, p)
        return (optax.apply_updates(p, upd), s), val

    (params, _), losses = jax.lax.scan(
        step, (params, opt_state),
        jax.random.split(jnp.asarray(key), int(n_iters)),
    )
    return ADVIResult(guide=g, params=params, losses=losses)
