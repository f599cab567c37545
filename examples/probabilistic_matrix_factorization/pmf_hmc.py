"""Probabilistic matrix factorization with alternating HMC.

Parity: reference
``examples/probabilistic_matrix_factorization/pmf_hmc.py``: Normal priors on
user/item factor matrices, ``r ~ N(sigmoid(u . v), alpha_pred)`` likelihood
on observed ratings, alternating HMC sweeps over U given V and V given U
with K parallel chains (reference :122-138).

Zero-egress note: MovieLens-1M is replaced by a synthetic low-rank ratings
matrix when absent.
Run: ``python -m examples.probabilistic_matrix_factorization.pmf_hmc``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import zhusuan_tpu as zs


def pmf_u_model(n, D, n_particles, v_fixed, su, sv, alpha_u, alpha_pred):
    """Model over U with V observed/fixed (one half of the alternation)."""

    @zs.meta_bayesian_net()
    def model():
        bn = zs.BayesianNet()
        u = bn.normal(
            "u", jnp.zeros([n, D]), std=alpha_u, n_samples=n_particles,
            group_ndims=1,
        )
        gather_u = u.tensor[:, su, :]  # [K, n_ratings, D]
        gather_v = v_fixed[:, sv, :]  # [K, n_ratings, D]
        r_logits = jnp.sum(gather_u * gather_v, axis=-1)
        bn.deterministic("r_pred", jax.nn.sigmoid(r_logits))
        bn.normal("r", jax.nn.sigmoid(r_logits), std=alpha_pred)
        return bn

    return model()


def synthetic_ratings(n_users=300, n_movies=200, D_true=5, n_obs=20000,
                      seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randn(n_users, D_true) * 0.8
    v = rng.randn(n_movies, D_true) * 0.8
    full = 1 / (1 + np.exp(-(u @ v.T)))
    ui = rng.randint(0, n_users, n_obs)
    vi = rng.randint(0, n_movies, n_obs)
    r = full[ui, vi] + 0.05 * rng.randn(n_obs)
    return ui.astype(np.int32), vi.astype(np.int32), r.astype(np.float32), (
        n_users, n_movies,
    )


def main(n_epochs=20, D=10, K=4, n_leapfrogs=10):
    su, sv, r_obs, (N, M) = synthetic_ratings()
    n_train = int(0.9 * len(r_obs))
    su_t, sv_t, r_t = su[:n_train], sv[:n_train], r_obs[:n_train]
    su_e, sv_e, r_e = su[n_train:], sv[n_train:], r_obs[n_train:]
    alpha_u = alpha_v = 1.0
    alpha_pred = 0.2 / 4.0

    key = jax.random.PRNGKey(1237)
    key, ku, kv = jax.random.split(key, 3)
    U = 0.1 * jax.random.normal(ku, (K, N, D))
    V = 0.1 * jax.random.normal(kv, (K, M, D))

    hmc_u = zs.HMC(step_size=1e-3, n_leapfrogs=n_leapfrogs,
                   adapt_step_size=True)
    hmc_v = zs.HMC(step_size=1e-3, n_leapfrogs=n_leapfrogs,
                   adapt_step_size=True)

    su_j, sv_j, r_j = jnp.asarray(su_t), jnp.asarray(sv_t), jnp.asarray(r_t)

    def log_joint_u(obs):
        u = obs["u"]
        log_pu = jnp.sum(
            zs.distributions.Normal(0.0, std=alpha_u).log_prob(u),
            axis=(-1, -2),
        )
        r_logits = jnp.sum(u[:, su_j, :] * obs["v"][:, sv_j, :], -1)
        log_pr = jnp.sum(
            zs.distributions.Normal(
                jax.nn.sigmoid(r_logits), std=alpha_pred
            ).log_prob(r_j),
            axis=-1,
        )
        return log_pu + log_pr

    def log_joint_v(obs):
        v = obs["v"]
        log_pv = jnp.sum(
            zs.distributions.Normal(0.0, std=alpha_v).log_prob(v),
            axis=(-1, -2),
        )
        r_logits = jnp.sum(obs["u"][:, su_j, :] * v[:, sv_j, :], -1)
        log_pr = jnp.sum(
            zs.distributions.Normal(
                jax.nn.sigmoid(r_logits), std=alpha_pred
            ).log_prob(r_j),
            axis=-1,
        )
        return log_pv + log_pr

    state_u = hmc_u.init({"u": U}, n_chain_dims=1)
    state_v = hmc_v.init({"v": V}, n_chain_dims=1)

    @jax.jit
    def sweep(state_u, state_v, key):
        k1, k2 = jax.random.split(key)
        state_u, info_u = hmc_u.sample(
            log_joint_u, {"v": state_v.q["v"]}, state_u, k1,
            adapt_step_size=True,
        )
        state_v, info_v = hmc_v.sample(
            log_joint_v, {"u": state_u.q["u"]}, state_v, k2,
            adapt_step_size=True,
        )
        return state_u, state_v, info_u.acceptance_rate, info_v.acceptance_rate

    @jax.jit
    def eval_rmse(state_u, state_v):
        u, v = state_u.q["u"], state_v.q["v"]
        pred = jax.nn.sigmoid(
            jnp.sum(u[:, jnp.asarray(su_e), :] * v[:, jnp.asarray(sv_e), :],
                    -1)
        ).mean(0)
        return jnp.sqrt(jnp.mean((pred - jnp.asarray(r_e)) ** 2))

    for epoch in range(1, n_epochs + 1):
        key, sub = jax.random.split(key)
        state_u, state_v, acc_u, acc_v = sweep(state_u, state_v, sub)
        if epoch % 5 == 0:
            rmse = float(eval_rmse(state_u, state_v))
            print(
                "Epoch {}: acc_u = {:.3f}, acc_v = {:.3f}, "
                "test rmse = {:.4f}".format(
                    epoch, float(jnp.mean(acc_u)), float(jnp.mean(acc_v)),
                    rmse,
                )
            )
    return state_u, state_v


if __name__ == "__main__":
    main()
