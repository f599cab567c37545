"""Measure THIS library's throughput on the remaining BASELINE.json
acceptance configs (#2 toy2d SGVB, #4 BNN SGVB + SGHMC, #5 SBN VIMCO +
SVGP) under the protocol shared with ``measure_configs_ref.py``
(``configs_protocol.py``: identical data, shapes, hyperparameters, step
counts) — VERDICT r3 item 1.

Execution model is ours-native: each training step is a jitted pure
function and the timed loop is ONE ``lax.scan`` over device-resident
minibatches (the library's idiomatic on-device loop), 3 trials, best
kept. Runs on the default backend (the real TPU chip under axon); pass
``--cpu`` for a host-CPU A/B.

Run: ``python -m baseline_ref.measure_configs_ours [config ...]``.
Writes/merges baseline_ref/ours_configs.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

import zhusuan_tpu as zs
from baseline_ref import configs_protocol as P

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ours_configs.json")


def _fold_keys(xs, trial):
    """Vary every PRNG-key leaf per trial: axon can return
    memoized-looking timings on repeated identical inputs (CLAUDE.md
    timing methodology), so no two timed calls may share keys."""
    def fold(leaf):
        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.uint32
                and leaf.ndim >= 1 and leaf.shape[-1] == 2):
            return jax.vmap(lambda k: jax.random.fold_in(k, trial))(
                leaf.reshape(-1, 2)).reshape(leaf.shape)
        return leaf
    return jax.tree.map(fold, xs)


MIN_TRIAL_SEC = 0.5  # axon tunnel timing floor: trials must be >> ~ms
MAX_REPEATS = 512


def _scan_train(step_fn, carry, xs, n_timed):
    """Warmup compile + 3 timed trials; each trial runs the compiled
    scanned pass over ``xs`` back-to-back R times (keys re-folded per
    repeat — see ``_fold_keys``; state chains through the carry so the
    repeats are data-dependent and cannot be elided), with R auto-chosen
    so every trial is >= MIN_TRIAL_SEC of wall time. The timing barrier
    is a HOST FETCH of the last per-step metric, not block_until_ready:
    through the axon tunnel block_until_ready can return before the
    computation completes (sub-ms walls for multi-ms programs —
    CLAUDE.md timing methodology), while a device->host copy of the
    result bytes cannot. A 1x-vs-2x work-scaling ratio is measured and
    recorded in the artifact as proof the clock sees the work.

    Returns (steps_per_sec, last_metric, best_trial_sec, repeats,
    work_scaling_ratio)."""
    run = jax.jit(lambda c, xs: jax.lax.scan(step_fn, c, xs))

    def fetch(out):
        arr = out if not isinstance(out, tuple) else out[0]
        return float(np.asarray(arr)[-1])  # host fetch = hard barrier

    carry, out = run(carry, _fold_keys(xs, 100))  # compile + warmup pass
    fetch(out)
    t0 = time.perf_counter()
    carry, out = run(carry, _fold_keys(xs, 101))
    fetch(out)
    est = time.perf_counter() - t0
    repeats = int(min(MAX_REPEATS,
                      max(1, np.ceil(MIN_TRIAL_SEC / max(est, 1e-3)))))

    def timed_pass(n_rep, base):
        nonlocal carry
        t0 = time.perf_counter()
        for r in range(n_rep):
            carry, out = run(carry, _fold_keys(xs, base + r))
        last = fetch(out)
        return time.perf_counter() - t0, last

    best, last = np.inf, float("nan")
    for trial in range(3):
        dt, last = timed_pass(repeats, 1000 * (trial + 1))
        best = min(best, dt)
    dt2, _ = timed_pass(2 * repeats, 9000)  # work-scaling probe
    return (repeats * n_timed / best, last, best, repeats,
            round(dt2 / best, 2))


def _measure(build):
    """Time one config from its builder (build -> (step, carry, xs,
    n_timed, metric_name)); builders are shared with measure_mfu.py so
    the MFU artifact lowers EXACTLY the step the matrix times."""
    step, carry, xs, n_timed, metric_name = build()
    return _result(_scan_train(step, carry, xs, n_timed), n_timed,
                   metric_name)


def _result(scan_out, n_timed, metric_name):
    sps, last, dt, repeats, scaling = scan_out
    return {"steps_per_sec": round(sps, 2), "timed_steps": n_timed,
            "repeats": repeats, "timed_sec": round(dt, 3),
            "work_scaling_2x": scaling, metric_name: round(last, 4)}


def build_toy2d():
    """Ours-side of reference toy2d_intractable.py (examples/toy_examples/
    toy2d_intractable.py here)."""
    from examples.toy_examples.toy2d_intractable import (
        build_mean_field_variational, build_toy2d_intractable)

    cfg = P.TOY2D
    n_particles = cfg["n_particles"]
    model = build_toy2d_intractable(n_particles)
    params = {
        "z1_mean": jnp.asarray(-2.0), "z1_logstd": jnp.asarray(-5.0),
        "z2_mean": jnp.asarray(-2.0), "z2_logstd": jnp.asarray(-5.0),
    }
    optimizer = optax.adam(cfg["lr"])
    opt_state = optimizer.init(params)

    def loss_fn(params, key):
        variational = build_mean_field_variational(params, n_particles, key)
        lb = zs.variational.elbo(model, {}, variational=variational, axis=0)
        return lb.sgvb(), lb.tensor

    def step(carry, key):
        params, opt_state = carry
        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), lb

    keys = jax.random.split(jax.random.PRNGKey(0), cfg["timed_steps"])
    return (step, (params, opt_state), keys, cfg["timed_steps"],
            "final_lb")


def build_bnn_sgvb():
    """Ours-side of reference bnn_vi.py (examples/bayesian_neural_nets/
    bnn_vi.py here): mean-field SGVB over the weights."""
    cfg = P.BNN_SGVB
    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train = len(x_train)
    layer_sizes = [cfg["x_dim"], cfg["n_hidden"], 1]
    n_particles = cfg["n_particles"]

    from examples.bayesian_neural_nets.bnn_vi import init_params, make_loss

    vparams = init_params(layer_sizes)
    optimizer = optax.adam(cfg["lr"])
    opt_state = optimizer.init(vparams)
    loss_fn = make_loss(layer_sizes, n_train, n_particles)

    def step(carry, batch):
        vparams, opt_state = carry
        x, y, key = batch
        loss, grads = jax.value_and_grad(loss_fn)(vparams, x, y, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(vparams, updates), opt_state), -loss

    idx = P.minibatch_indices(n_train, cfg["batch_size"],
                              cfg["timed_steps"])
    xs = (jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
          jax.random.split(jax.random.PRNGKey(1), cfg["timed_steps"]))
    return (step, (vparams, opt_state), xs, cfg["timed_steps"],
            "final_lb")


def build_bnn_sghmc():
    """Ours-side of reference bnn_sgmcmc.py (examples/bayesian_neural_nets/
    bnn_sgmcmc.py here): 2nd-order SGHMC E steps."""
    cfg = P.BNN_SGHMC
    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train = len(x_train)
    layer_sizes = [cfg["x_dim"], cfg["n_hidden"], 1]
    w_names = ["w" + str(i) for i in range(len(layer_sizes) - 1)]
    n_particles = cfg["n_particles"]

    from examples.bayesian_neural_nets.bnn_sgmcmc import build_bnn

    rng = np.random.RandomState(3)
    w_init = {
        name: jnp.asarray(
            rng.uniform(size=(n_particles, n_out, n_in + 1)).astype(
                np.float32) * 4 - 2)
        for name, (n_in, n_out) in zip(
            w_names, zip(layer_sizes[:-1], layer_sizes[1:]))
    }
    logstds = [jnp.zeros([n_out, n_in + 1]) for n_in, n_out in
               zip(layer_sizes[:-1], layer_sizes[1:])]

    sgmcmc = zs.SGHMC(
        learning_rate=cfg["lr"], friction=cfg["friction"],
        n_iter_resample_v=cfg["n_iter_resample_v"], second_order=True)
    state = sgmcmc.init(w_init, key=jax.random.PRNGKey(2))

    def step(state, batch):
        x, y, key = batch
        model = build_bnn(x, layer_sizes, logstds, n_particles)

        def log_joint(bn):
            log_pws = bn.cond_log_prob(w_names)
            log_py_xw = bn.cond_log_prob("y")
            return sum(log_pws) + jnp.mean(log_py_xw, 1) * n_train

        model.log_joint = log_joint
        state, info = sgmcmc.sample(model, {"y": y}, state, key)
        mk = info.mean_k
        if isinstance(mk, dict):
            mk = sum(jnp.mean(v) for v in mk.values()) / len(mk)
        return state, mk

    idx = P.minibatch_indices(n_train, cfg["batch_size"],
                              cfg["timed_steps"])
    xs = (jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx]),
          jax.random.split(jax.random.PRNGKey(3), cfg["timed_steps"]))
    return step, state, xs, cfg["timed_steps"], "final_mean_k"


def build_sbn_vimco():
    """Ours-side of reference sbn_vimco.py (examples/sigmoid_belief_nets/
    sbn_vimco.py here): VIMCO k=10."""
    from examples.sigmoid_belief_nets.sbn import init_sbn_params
    from examples.sigmoid_belief_nets.sbn_vimco import vimco_loss

    cfg = P.SBN_VIMCO
    total = cfg["timed_steps"]
    data = P.synthetic_binary_mnist(cfg["batch_size"] * total,
                                    cfg["data_seed"])
    batches = jnp.asarray(
        data.reshape(total, cfg["batch_size"], cfg["x_dim"]))

    params = init_sbn_params(jax.random.PRNGKey(1234), cfg["x_dim"],
                             cfg["h_dim"])
    optimizer = optax.adam(cfg["lr"], eps=cfg["eps"])
    opt_state = optimizer.init(params)

    def step(carry, batch):
        params, opt_state = carry
        x, key = batch
        (_, lb), grads = jax.value_and_grad(vimco_loss, has_aux=True)(
            params, x, key, cfg["h_dim"], cfg["n_particles"])
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), lb

    xs = (batches, jax.random.split(jax.random.PRNGKey(4), total))
    return step, (params, opt_state), xs, total, "final_lb"


def build_svgp():
    """Ours-side of reference svgp.py (examples/gaussian_process/svgp.py
    here): 100 inducing points, 20 particles, full batch."""
    from examples.gaussian_process.svgp import (
        build_model, build_variational_samples, init_params, kzz_factors)

    cfg = P.SVGP
    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train = len(x_train)
    n_z, n_particles = cfg["n_z"], cfg["n_particles"]

    params = init_params(jax.random.PRNGKey(1234), n_z, cfg["x_dim"],
                         x_train)
    optimizer = optax.adam(cfg["lr"])
    opt_state = optimizer.init(params)
    x = jnp.asarray(x_train)
    y = jnp.asarray(y_train)

    def loss_fn(params, key):
        chol, chol_inv = kzz_factors(params, n_z)
        model = build_model(params, x, n_z, n_particles, kzz_chol=chol,
                            kzz_chol_inv=chol_inv)

        def log_joint(bn):
            prior, log_py_given_fx = bn.cond_log_prob(["fz", "y"])
            return prior + log_py_given_fx / n_train * n_train

        model.log_joint = log_joint
        latent = build_variational_samples(params, x, n_z, n_particles,
                                           key, kzz_chol=chol,
                                           kzz_chol_inv=chol_inv)
        lb = zs.variational.elbo(model, observed={"y": y}, latent=latent,
                                 axis=0)
        return jnp.mean(lb.sgvb()), jnp.mean(lb.tensor)

    def step(carry, key):
        params, opt_state = carry
        (_, lb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), lb

    keys = jax.random.split(jax.random.PRNGKey(5), cfg["timed_steps"])
    return (step, (params, opt_state), keys, cfg["timed_steps"],
            "final_lb")


BUILDS = {
    "toy2d": build_toy2d,
    "bnn_sgvb": build_bnn_sgvb,
    "bnn_sghmc": build_bnn_sghmc,
    "sbn_vimco": build_sbn_vimco,
    "svgp": build_svgp,
}

MEASURES = {name: (lambda b=build: _measure(b))
            for name, build in BUILDS.items()}


def main(names):
    platform = jax.devices()[0].platform
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        print("=== measuring ours:", name, "on", platform, flush=True)
        results[name] = MEASURES[name]()
        results[name]["what"] = (
            "zhusuan_tpu, jit + lax.scan device loop, best of 3 trials "
            "({} backend)".format(platform))
        print(name, "->", json.dumps(results[name]), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:] or list(MEASURES))
