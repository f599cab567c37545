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


def synthetic_ratings(n_users=300, n_movies=200, D_true=5, n_obs=20000,
                      seed=0):
    """Small low-rank ratings set for smoke tests; main() uses the
    MovieLens loader (with its own synthetic fallback)."""
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


def main(n_epochs=20, D=10, K=4, n_leapfrogs=10, max_ratings=100_000):
    from examples.utils.dataset import load_movielens1m

    N, M, train, valid, test, synthetic = load_movielens1m()
    if synthetic:
        print("[note] MovieLens-1M not found; using synthetic ratings "
              "(zero-egress env).")
    # Ratings 1-5 -> [0, 1] to match the sigmoid likelihood
    # (reference pmf_hmc.py normalizes by alpha_pred = 0.2/4).
    su_t = np.concatenate([train[0], valid[0]])[:max_ratings]
    sv_t = np.concatenate([train[1], valid[1]])[:max_ratings]
    r_t = ((np.concatenate([train[2], valid[2]]) - 1.0) / 4.0)[:max_ratings]
    n_eval = min(len(test[2]), max_ratings // 10)
    su_e, sv_e = test[0][:n_eval], test[1][:n_eval]
    r_e = (test[2][:n_eval] - 1.0) / 4.0
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
