"""Logistic-normal topic model trained by Monte Carlo EM.

Parity: reference ``examples/topic_models/lntm_mcem.py``: per-document
logistic-normal topic proportions ``eta``, topic-word matrix ``beta`` with a
wide Normal prior (log_delta = 10), bag-of-words likelihood via
``unnormalized_multinomial``; E-step = persistent-chain HMC over eta
(reference :97-114), M-step = Adam on beta plus moment-matched updates of
the eta prior (reference :157-186).

Zero-egress note: the NIPS bag-of-words corpus is replaced by a synthetic
corpus drawn from a ground-truth LNTM when the data file is absent.
Run: ``python -m examples.topic_models.lntm_mcem``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs

log_delta = 10.0


def lntm(n_chains, n_docs, n_topics, n_vocab, eta_mean, eta_logstd):
    """The model (reference lntm_mcem.py:33-48)."""

    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        eta_mean_t = jnp.tile(eta_mean[None, :], (n_docs, 1))
        eta = bn.normal(
            "eta", eta_mean_t, logstd=eta_logstd, n_samples=n_chains,
            group_ndims=1,
        )
        theta = jax.nn.softmax(eta.tensor, axis=-1)
        beta = bn.normal(
            "beta", jnp.zeros([n_topics, n_vocab], jnp.float32),
            logstd=jnp.float32(log_delta),
            group_ndims=1,
        )
        phi = jax.nn.softmax(beta.tensor, axis=-1)
        doc_word = jnp.reshape(
            jnp.reshape(theta, (-1, n_topics)) @ phi,
            (n_chains, n_docs, n_vocab),
        )
        bn.unnormalized_multinomial(
            "x", jnp.log(doc_word), normalize_logits=False, dtype=jnp.float32
        )
        return bn

    return model()


def ais_test_perplexity(X_test, beta, eta_mean, eta_logstd, n_topics,
                        n_chains=25, n_temperatures=100, key=None):
    """Test perplexity upper bound via AIS (reference lntm_mcem.py:208-219):
    anneal from the eta prior to the posterior with HMC transitions and
    bound log p(x_test)."""
    n_docs_test, n_vocab = X_test.shape
    model = lntm(n_chains, n_docs_test, n_topics, n_vocab, eta_mean,
                 eta_logstd)
    model.log_joint = lambda bn: (
        bn.cond_log_prob("eta") + bn.cond_log_prob("x")
    )
    proposal = lntm(n_chains, n_docs_test, n_topics, n_vocab, eta_mean,
                    eta_logstd)
    proposal.log_joint = lambda bn: bn.cond_log_prob("eta")
    hmc = zs.HMC(step_size=0.01, n_leapfrogs=20, adapt_step_size=True,
                 target_acceptance_rate=0.6)
    ais = zs.evaluation.AIS(
        model, proposal, hmc,
        observed={"x": jnp.asarray(X_test), "beta": beta},
        latent=["eta"],
        n_temperatures=n_temperatures,
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    ll_lb = float(jax.jit(ais.run)(key))
    perplexity_ub = float(
        np.exp(-ll_lb * n_docs_test / np.sum(X_test))
    )
    return ll_lb, perplexity_ub


def main(epochs=20, batch_size=100, n_topics=20, num_e_steps=5, n_chains=1,
         run_ais=True, ais_temperatures=100):
    from examples.utils.dataset import load_uci_bow

    X, vocab, synthetic = load_uci_bow("nips", n_docs=1500, n_vocab=500)
    if synthetic:
        print("[note] NIPS bag-of-words not found; using a synthetic "
              "corpus (zero-egress env).")
    training_size = 1200
    X_train, X_test = X[:training_size], X[training_size:]
    n_vocab = X_train.shape[1]

    rem = batch_size - X_train.shape[0] % batch_size
    if rem < batch_size:
        X_train = np.vstack([X_train, np.zeros((rem, n_vocab), np.float32)])
    iters = X_train.shape[0] // batch_size

    # Persistent chain state for every document (reference :81-84).
    Eta = np.zeros((n_chains, X_train.shape[0], n_topics), np.float32)
    eta_mean = jnp.zeros(n_topics, jnp.float32)
    eta_logstd = jnp.zeros(n_topics, jnp.float32)
    beta = jnp.zeros((n_topics, n_vocab), jnp.float32)

    hmc = zs.HMC(
        step_size=1e-3, n_leapfrogs=20, adapt_step_size=True,
        target_acceptance_rate=0.6,
    )
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(beta)

    def make_model(eta_mean, eta_logstd):
        model = lntm(
            n_chains, batch_size, n_topics, n_vocab, eta_mean, eta_logstd
        )
        model.log_joint = lambda bn: (
            bn.cond_log_prob("eta") + bn.cond_log_prob("x")
        )
        return model

    @jax.jit
    def e_step(eta, beta, eta_mean, eta_logstd, x, hmc_state_da, key):
        """num_e_steps HMC transitions over eta for one minibatch."""
        model = make_model(eta_mean, eta_logstd)
        state = hmc.init({"eta": eta}, n_chain_dims=2)
        # Carry over dual-averaging state across minibatches.
        state = state._replace(**hmc_state_da)
        state, out = hmc.run(
            model, {"x": x, "beta": beta}, state, key, num_e_steps,
            n_adapt=num_e_steps,
        )
        da = {
            "t": state.t, "step_size": state.step_size,
            "da_step": state.da_step, "h_bar": state.h_bar,
            "log_epsilon_bar": state.log_epsilon_bar,
        }
        return state.q["eta"], da, jnp.mean(out["acceptance_rate"])

    @jax.jit
    def m_step(beta, opt_state, eta, eta_mean, eta_logstd, x):
        """Adam step on beta maximizing log p(beta) + log p(x | ...)."""

        def neg_log_joint(beta):
            model = make_model(eta_mean, eta_logstd)
            bn = model.observe(eta=eta, x=x, beta=beta)
            log_p_beta, log_px = bn.cond_log_prob(["beta", "x"])
            return -(jnp.sum(log_p_beta) + jnp.sum(jnp.mean(log_px, 0)))

        loss, grads = jax.value_and_grad(neg_log_joint)(beta)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(beta, updates), opt_state, -loss

    key = jax.random.PRNGKey(1237)
    da_state = {
        "t": jnp.zeros((), jnp.int32),
        "step_size": jnp.asarray(1e-3, jnp.float32),
        "da_step": jnp.zeros((), jnp.float32),
        "h_bar": jnp.zeros((), jnp.float32),
        "log_epsilon_bar": jnp.zeros((), jnp.float32),
    }
    for epoch in range(1, epochs + 1):
        accs, ljs = [], []
        for t in range(iters):
            sl = slice(t * batch_size, (t + 1) * batch_size)
            x = jnp.asarray(X_train[sl])
            key, sub = jax.random.split(key)
            eta_new, da_state, acc = e_step(
                jnp.asarray(Eta[:, sl]), beta, eta_mean, eta_logstd, x,
                da_state, sub,
            )
            Eta[:, sl] = np.asarray(eta_new)
            beta, opt_state, lj = m_step(
                beta, opt_state, eta_new, eta_mean, eta_logstd, x
            )
            accs.append(float(acc))
            ljs.append(float(lj))
        # Update the eta prior by moment matching (reference :176-181).
        eta_mean = jnp.asarray(Eta.mean(axis=(0, 1)), jnp.float32)
        eta_logstd = jnp.asarray(
            np.log(Eta.std(axis=(0, 1)) + 1e-6), jnp.float32
        )
        if epoch % 5 == 0:
            print(
                "Epoch {}: acceptance = {:.3f}, log joint = {:.1f}".format(
                    epoch, np.mean(accs), np.mean(ljs)
                )
            )
    # Report top words per topic by index (no vocab in synthetic mode).
    phi = np.asarray(jax.nn.softmax(beta, axis=-1))
    print("Topic sparsity (mean max word prob): {:.4f}".format(
        phi.max(-1).mean()
    ))
    if run_ais:
        print("Evaluating test perplexity using AIS...")
        ll_lb, ppl_ub = ais_test_perplexity(
            X_test[:50], beta, eta_mean, eta_logstd, n_topics,
            n_chains=10, n_temperatures=ais_temperatures,
        )
        print(">> log likelihood lower bound = {:.2f}\n"
              ">> perplexity upper bound = {:.2f}".format(ll_lb, ppl_ub))
    return beta, eta_mean, eta_logstd


if __name__ == "__main__":
    main()
