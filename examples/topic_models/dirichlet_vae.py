"""Dirichlet-latent VAE for bag-of-words topic modeling, trained with
IMPLICIT reparameterization gradients.

Beyond the reference: upstream ZhuSuan marks Gamma/Beta/Dirichlet
non-reparameterized (reference univariate.py:733-735), so a model like
this could only be trained there with high-variance REINFORCE. Here the
variational posterior is a ``Dirichlet(is_reparameterized=True)`` whose
sampler carries Figurnov-style implicit gradients through
``jax.random.gamma`` — SGVB trains the document-topic simplex latents
pathwise.

Model: theta_d ~ Dirichlet(alpha0); words ~ Multinomial(softmax-free:
the topic-word matrix is a learned log-prob table); variational
q(theta|d) = Dirichlet(exp(MLP(bow_d))). The whole train step is one
jitted program driven by ``zs.fit_scan``.

Zero-egress: runs on a synthetic LDA-generated corpus (deterministic)
when no data file is present. Run:
``python -m examples.topic_models.dirichlet_vae``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs
from zhusuan_tpu.distributions import Dirichlet

N_TOPICS = 8
N_VOCAB = 200
ALPHA0 = 0.5


def synthetic_corpus(n_docs=512, doc_len=64, seed=0):
    """Deterministic LDA-generated bag-of-words corpus + true topics."""
    rng = np.random.RandomState(seed)
    topics = rng.dirichlet(np.full(N_VOCAB, 0.1), size=N_TOPICS)
    bows = np.zeros((n_docs, N_VOCAB), np.float32)
    for d in range(n_docs):
        theta = rng.dirichlet(np.full(N_TOPICS, ALPHA0))
        z = rng.choice(N_TOPICS, size=doc_len, p=theta)
        w = np.array([rng.choice(N_VOCAB, p=topics[k]) for k in z])
        np.add.at(bows[d], w, 1.0)
    return bows, topics


def init_params(key, hidden=64):
    from examples.utils.nn import init_linear, init_mlp

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "enc": init_mlp(k1, [N_VOCAB, hidden]),
        "alpha": init_linear(k2, hidden, N_TOPICS),
        # Topic-word logits (the "decoder" table).
        "log_phi": 0.01 * jax.random.normal(k3, (N_TOPICS, N_VOCAB)),
    }


def elbo_loss(params, bow, key, n_particles=4):
    """-ELBO with a pathwise-reparameterized Dirichlet posterior."""
    from examples.utils.nn import linear_apply, mlp_apply

    h = mlp_apply(params["enc"], jnp.log1p(bow),
                  final_activation=jax.nn.relu)
    # Concentrations > 0; +1e-3 keeps the Gamma sampler well-conditioned.
    alpha_q = jax.nn.softplus(linear_apply(params["alpha"], h)) + 1e-3

    q = Dirichlet(alpha_q, is_reparameterized=True)
    theta = q.sample(n_samples=n_particles, key=key)  # [P, B, K]

    log_phi = jax.nn.log_softmax(params["log_phi"], axis=-1)  # [K, V]
    # log p(words|theta) = sum_w count_w * log(theta @ phi).
    word_logp = jax.nn.logsumexp(
        jnp.log(theta)[..., None] + log_phi[None, None], axis=-2
    )  # [P, B, V]
    log_lik = jnp.sum(bow[None] * word_logp, axis=-1)
    prior = Dirichlet(jnp.full((N_TOPICS,), ALPHA0, theta.dtype))
    # Pathwise SGVB: E_q[log p(x,theta) - log q(theta)], gradient flows
    # through theta via the implicit-gamma sampler.
    lb = log_lik + prior.log_prob(theta) - q.log_prob(theta)
    return -jnp.mean(lb)


def main():
    bows, true_topics = synthetic_corpus()
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    params = init_params(k_init)

    params, _, hist = zs.fit_scan(
        elbo_loss, params, optax.adam(1e-2), bows,
        key=key, epochs=150, batch_size=64,
        callback=lambda e, l: (print("Epoch %d: -ELBO = %.2f" % (e, l))
                               if e % 10 == 0 else None),
    )

    # Topic recovery diagnostic: each true topic should have a learned
    # topic close in total variation.
    phi = np.asarray(jax.nn.softmax(params["log_phi"], axis=-1))
    tv = 0.5 * np.abs(true_topics[:, None, :] - phi[None, :, :]).sum(-1)
    best = tv.min(axis=1)
    print("per-true-topic best TV distance:", np.round(best, 3))
    print("mean best TV:", float(best.mean()))
    return hist, best


if __name__ == "__main__":
    main()
