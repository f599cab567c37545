"""Sandwiching the model evidence: ELBO/VR from below, CUBO from above.

Beyond reference parity (the reference only ever lower-bounds log Z, e.g.
``examples/toy_examples/toy2d_intractable.py`` or AIS): fit one variational
family twice — maximizing the Renyi VR-0.5 lower bound (Li & Turner 2016)
and minimizing the CUBO_2 upper bound (Dieng et al. 2017) — and report the
bracket ``L_0.5 <= log Z <= CUBO_2`` on a conjugate target where
``log Z`` is analytic.

Model: z ~ N(0, 1), x | z ~ N(z, 1), observed x0 = 1.0, so the marginal is
N(0, sqrt(2)) and the posterior is N(0.5, sqrt(0.5)).

Run: ``python -m examples.toy_examples.evidence_sandwich``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs

X0 = 1.0


@zs.meta_bayesian_net()
def build_model(n_particles):
    bn = zs.BayesianNet()
    z = bn.normal("z", 0.0, std=1.0, n_samples=n_particles)
    bn.normal("x", z.tensor, std=1.0)
    return bn


def build_variational(params, n_particles, key):
    bn = zs.BayesianNet(key=key)
    bn.normal(
        "z", params["mean"], logstd=params["logstd"], n_samples=n_particles
    )
    return bn


def fit_bound(make_cost, params, n_iters, lr=5e-2, seed=0):
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        grads = jax.grad(make_cost)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    key = jax.random.PRNGKey(seed)
    for _ in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state = step(params, opt_state, sub)
    return params


def main(n_iters=800, n_particles=256, n_eval=100_000):
    model = build_model(n_particles)
    observed = {"x": jnp.asarray(X0)}
    init = {"mean": jnp.asarray(-1.0), "logstd": jnp.asarray(0.7)}

    def vr_cost(params, key):
        q = build_variational(params, n_particles, key)
        return zs.variational.vr_objective(
            model, observed, variational=q, axis=0, alpha=0.5
        ).sgvb()

    def cubo_cost(params, key):
        q = build_variational(params, n_particles, key)
        return zs.variational.cubo_objective(
            model, observed, variational=q, axis=0, n=2.0
        ).exp_sgvb()

    lo_params = fit_bound(vr_cost, dict(init), n_iters)
    up_params = fit_bound(cubo_cost, dict(init), n_iters, seed=1)

    # Evaluate both bounds at their fitted families with a large K.
    key = jax.random.PRNGKey(123)
    q_lo = build_variational(lo_params, n_eval, key)
    q_up = build_variational(up_params, n_eval, jax.random.fold_in(key, 1))
    lower = float(
        zs.variational.vr_objective(
            model, observed, variational=q_lo, axis=0, alpha=0.5
        ).tensor
    )
    upper = float(
        zs.variational.cubo_objective(
            model, observed, variational=q_up, axis=0, n=2.0
        ).tensor
    )
    log_z = float(
        zs.distributions.Normal(0.0, std=float(np.sqrt(2.0))).log_prob(
            jnp.asarray(X0)
        )
    )
    print(
        "VR-0.5 lower bound = {:.4f} <= log Z = {:.4f} <= CUBO_2 = {:.4f}"
        .format(lower, log_z, upper)
    )
    print(
        "fitted q (VR): mean={:.3f} std={:.3f}; (CUBO): mean={:.3f} "
        "std={:.3f}; posterior: mean=0.500 std={:.3f}".format(
            float(lo_params["mean"]), float(jnp.exp(lo_params["logstd"])),
            float(up_params["mean"]), float(jnp.exp(up_params["logstd"])),
            float(np.sqrt(0.5)),
        )
    )
    return {
        "lower": lower,
        "upper": upper,
        "log_z": log_z,
        "gap": upper - lower,
    }


if __name__ == "__main__":
    main()
