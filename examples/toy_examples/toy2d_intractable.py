"""Mean-field SGVB on a 2-D intractable (funnel-like) posterior.

Parity: reference ``examples/toy_examples/toy2d_intractable.py`` (BASELINE
config #2): model ``z2 ~ N(0, 1.35)``, ``z1 ~ N(0, e^{z2})``; mean-field
Normal variational with learnable means/logstds initialized at (-2, -5);
``elbo(...).sgvb()`` with Adam(0.1).
Run: ``python -m examples.toy_examples.toy2d_intractable``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import zhusuan_tpu as zs


@zs.meta_bayesian_net()
def build_toy2d_intractable(n_particles):
    bn = zs.BayesianNet()
    z2 = bn.normal("z2", 0.0, std=1.35, n_samples=n_particles)
    bn.normal("z1", 0.0, logstd=z2.tensor)
    return bn


def build_mean_field_variational(params, n_particles, key):
    bn = zs.BayesianNet(key=key)
    for name in ["z1", "z2"]:
        bn.normal(
            name, params[name + "_mean"], logstd=params[name + "_logstd"],
            n_samples=n_particles,
        )
    return bn


def main(n_iters=600, n_particles=500):
    model = build_toy2d_intractable(n_particles)
    params = {
        "z1_mean": jnp.asarray(-2.0), "z1_logstd": jnp.asarray(-5.0),
        "z2_mean": jnp.asarray(-2.0), "z2_logstd": jnp.asarray(-5.0),
    }
    optimizer = optax.adam(0.1)
    opt_state = optimizer.init(params)

    def loss_fn(params, key):
        variational = build_mean_field_variational(params, n_particles, key)
        lower_bound = zs.variational.elbo(
            model, {}, variational=variational, axis=0
        )
        return lower_bound.sgvb()

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, -loss

    key = jax.random.PRNGKey(0)
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state, lb = step(params, opt_state, sub)
        if i % 100 == 0:
            print("Iteration {}: lower bound = {:.4f}".format(i, float(lb)))
    print("Final variational params:",
          {k: float(v) for k, v in params.items()})
    return params


if __name__ == "__main__":
    main()
