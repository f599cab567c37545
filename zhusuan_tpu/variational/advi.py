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
    init_params: Optional[dict] = None,
    lr_schedule=None,
    experimental_fused="auto",
    _fused_interpret: bool = False,
    _fused_noise=None,
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
    :param init_params: optional initial guide parameters (same pytree
        as ``guide.init_params()``) overriding the default init.
    :param lr_schedule: optional jnp-traceable ``step -> lr`` (e.g. an
        optax schedule, or ``lambda t: 0.1`` for a constant rate)
        replacing the default cosine decay; both execution paths use it
        through Adam.
    :param experimental_fused: ``"auto"`` (default) runs the ENTIRE fit
        as one Pallas kernel (:func:`zhusuan_tpu.ops.fused_meanfield_advi`)
        when eligible — mean-field guide, default Adam optimizer, f32,
        sizes inside VMEM, TPU backend; gradients are mathematically
        identical per sample to the scan path's, the random stream is
        not (hardware PRNG). ``True`` forces the kernel (raises when
        ineligible; on CPU it runs in interpret mode — test use only),
        ``False`` always uses the ``lax.scan`` path.
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

    if lr_schedule is None:
        lr_schedule = optax.cosine_decay_schedule(
            learning_rate, max(int(n_iters), 1), 0.1
        )
    if experimental_fused is not False and optimizer is None:
        fused = _maybe_fused_fit(
            g, meta_bn, observed, key, int(n_iters), int(n_samples),
            lr_schedule, init_params,
            force=(experimental_fused is True),
            interpret=_fused_interpret, noise=_fused_noise,
        )
        if fused is not None:
            return fused
    elif experimental_fused is True:
        raise ValueError(
            "experimental_fused=True requires the default optimizer "
            "(the kernel replicates Adam + the cosine schedule); got a "
            "custom optimizer."
        )
    if optimizer is None:
        optimizer = optax.adam(lr_schedule)

    params = g.init_params() if init_params is None else init_params
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


def _maybe_fused_fit(g, meta_bn, observed, key, n_iters, n_samples,
                     lr_schedule, init_params, force, interpret,
                     noise=None):
    """Run the whole fit as one Pallas kernel when eligible (None when
    not and ``force`` is False; raises when not and ``force`` is True).
    Gradient identity with the scan path is pinned by
    tests/test_ops_advi.py."""
    from zhusuan_tpu.mcmc.base import make_log_joint_fn, on_cpu_backend
    from zhusuan_tpu.ops.advi_step import (
        advi_step_supported, fused_meanfield_advi,
    )

    def bail(reason):
        if force:
            raise ValueError(
                "experimental_fused=True but the fused ADVI kernel "
                "cannot run: " + reason
            )
        return None

    if not isinstance(g, MeanFieldGuide):
        return bail("only the mean-field guide has a fused trainer.")
    names = g.latent_names
    dim = g._dim
    if jnp.dtype(g._dtype) != jnp.float32:
        return bail("the kernel is float32-only (guide dtype {})."
                    .format(g._dtype))
    if not advi_step_supported(dim, n_samples, n_iters):
        return bail(
            "unsupported size (dim={}, n_samples={}, n_iters={}); "
            "n_samples must be even and the particle block must fit "
            "VMEM.".format(dim, n_samples, n_iters)
        )
    if on_cpu_backend() and not force:
        return None  # kernel targets TPU; interpret mode is test-only

    log_posterior = make_log_joint_fn(meta_bn, observed)
    shapes, sizes = g._shapes, g._sizes

    def flat_log_post(z):
        z_u, off = {}, 0
        for n in names:
            z_u[n] = z[off:off + sizes[n]].reshape(shapes[n])
            off += sizes[n]
        samples, neg_ld = g._constrain(z_u, 0)
        lp = jnp.reshape(log_posterior(samples), ())
        for v in neg_ld.values():
            lp = lp - v
        return lp

    params = g.init_params() if init_params is None else init_params
    loc0 = jnp.concatenate(
        [jnp.reshape(params["loc"][n], (-1,)) for n in names]
    )
    ls0 = jnp.concatenate(
        [jnp.reshape(params["log_scale"][n], (-1,)) for n in names]
    )
    loc, ls, losses = fused_meanfield_advi(
        flat_log_post, loc0, ls0, n_iters, n_samples, key, lr_schedule,
        noise=noise, interpret=(interpret or on_cpu_backend()),
    )

    def unflatten(v):
        out, off = {}, 0
        for n in names:
            out[n] = v[off:off + sizes[n]].reshape(shapes[n])
            off += sizes[n]
        return out

    fitted = {"loc": unflatten(loc), "log_scale": unflatten(ls)}
    return ADVIResult(guide=g, params=fitted, losses=losses)
