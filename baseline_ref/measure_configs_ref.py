"""Measure the REAL reference ZhuSuan's throughput on the remaining
BASELINE.json acceptance configs (#2 toy2d SGVB, #4 BNN SGVB + SGHMC,
#5 SBN VIMCO + SVGP) — VERDICT r3 item 1.

Runs the reference library (/root/reference/zhusuan, TF1 via tf.compat.v1,
``baseline_ref/tf1_shim.py``) with model/variational graphs built exactly
as the reference examples build them (file:line cited per config in
``configs_protocol.py``), in the reference's own execution model: one
``sess.run([infer_op, lower_bound])`` per step with host fetch, matching
each example's training loop. Data/hyperparameters/step counts come from
the shared protocol module so the ours-side run is identical.

Run ALONE on the (one-vCPU) host: ``python -m baseline_ref.measure_configs_ref
[config ...]``. Writes/merges baseline_ref/ref_configs.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from baseline_ref import configs_protocol as P
from baseline_ref.tf1_shim import install

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ref_configs.json")


def _timed_loop(sess, fetches, feeds, warmup, timed):
    for _ in range(warmup):
        sess.run(fetches, feed_dict=feeds)
    t0 = time.perf_counter()
    last = None
    for _ in range(timed):
        last = sess.run(fetches, feed_dict=feeds)
    dt = time.perf_counter() - t0
    return timed / dt, last, dt


def measure_toy2d(tf, zs):
    """Reference toy2d_intractable.py:36-44,87-94 (minus matplotlib)."""
    cfg = P.TOY2D
    tf.reset_default_graph()
    tf.set_random_seed(1)
    n_particles = tf.placeholder(tf.int32, shape=[])

    @zs.meta_bayesian_net(scope="model")
    def build_model(n_particles):
        bn = zs.BayesianNet()
        z2 = bn.normal("z2", 0., std=1.35, n_samples=n_particles)
        bn.normal("z1", 0., logstd=z2)
        return bn

    @zs.reuse_variables(scope="variational")
    def build_variational(n_particles):
        bn = zs.BayesianNet()
        for name in ["z1", "z2"]:
            z_mean = bn.deterministic(name + "_mean", tf.Variable(-2.))
            z_logstd = bn.deterministic(name + "_logstd", tf.Variable(-5.))
            bn.normal(name, z_mean, logstd=z_logstd, n_samples=n_particles)
        return bn

    model = build_model(n_particles)
    variational = build_variational(n_particles)
    lower_bound = zs.variational.elbo(model, {}, variational=variational,
                                      axis=0)
    cost = lower_bound.sgvb()
    infer_op = tf.train.AdamOptimizer(learning_rate=cfg["lr"]).minimize(cost)

    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        sps, last, dt = _timed_loop(
            sess, [infer_op, lower_bound],
            {n_particles: cfg["n_particles"]},
            cfg["warmup_steps"], cfg["timed_steps"])
    return {"steps_per_sec": round(sps, 2), "timed_steps": cfg["timed_steps"],
            "timed_sec": round(dt, 2), "final_lb": round(float(last[1]), 4)}


def _ref_bnn_graph(tf, zs, layer_sizes, n_particles, logstds=None):
    """Reference bnn builder (bnn_vi.py:18-35 / bnn_sgmcmc.py:19-35)."""
    x = tf.placeholder(tf.float32, shape=[None, layer_sizes[0]])
    y = tf.placeholder(tf.float32, shape=[None])

    @zs.meta_bayesian_net(scope="bnn", reuse_variables=True)
    def build_bnn():
        bn = zs.BayesianNet()
        h = tf.tile(x[None, ...], [n_particles, 1, 1])
        for i, (n_in, n_out) in enumerate(
                zip(layer_sizes[:-1], layer_sizes[1:])):
            if logstds is None:
                w = bn.normal("w" + str(i), tf.zeros([n_out, n_in + 1]),
                              std=1., group_ndims=2, n_samples=n_particles)
            else:
                w = bn.normal("w" + str(i), tf.zeros([n_out, n_in + 1]),
                              logstd=logstds[i], group_ndims=2,
                              n_samples=n_particles)
            h = tf.concat([h, tf.ones(tf.shape(h)[:-1])[..., None]], -1)
            h = tf.einsum("imk,ijk->ijm", w, h) / tf.sqrt(
                tf.cast(tf.shape(h)[2], tf.float32))
            if i < len(layer_sizes) - 2:
                h = tf.nn.relu(h)
        y_mean = bn.deterministic("y_mean", tf.squeeze(h, 2))
        bn.normal("y", y_mean, logstd=-0.95)
        return bn

    return build_bnn(), x, y


def measure_bnn_sgvb(tf, zs):
    """Reference bnn_vi.py:74-100,108-112 (SGVB mean-field BNN)."""
    cfg = P.BNN_SGVB
    tf.reset_default_graph()
    tf.set_random_seed(1237)
    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train = len(x_train)
    layer_sizes = [cfg["x_dim"], cfg["n_hidden"], 1]
    w_names = ["w" + str(i) for i in range(len(layer_sizes) - 1)]
    n_particles = cfg["n_particles"]
    model, x, y = _ref_bnn_graph(tf, zs, layer_sizes, n_particles)

    @zs.reuse_variables(scope="variational")
    def build_variational():
        bn = zs.BayesianNet()
        for i, (n_in, n_out) in enumerate(
                zip(layer_sizes[:-1], layer_sizes[1:])):
            w_mean = tf.get_variable(
                "w_mean_" + str(i), shape=[n_out, n_in + 1],
                initializer=tf.constant_initializer(0.))
            w_logstd = tf.get_variable(
                "w_logstd_" + str(i), shape=[n_out, n_in + 1],
                initializer=tf.constant_initializer(0.))
            bn.normal("w" + str(i), w_mean, logstd=w_logstd,
                      n_samples=n_particles, group_ndims=2)
        return bn

    def log_joint(bn):
        log_pws = bn.cond_log_prob(w_names)
        log_py_xw = bn.cond_log_prob("y")
        return tf.add_n(log_pws) + tf.reduce_mean(log_py_xw, 1) * n_train

    model.log_joint = log_joint
    variational = build_variational()
    lower_bound = zs.variational.elbo(model, {"y": y},
                                      variational=variational, axis=0)
    cost = lower_bound.sgvb()
    infer_op = tf.train.AdamOptimizer(learning_rate=cfg["lr"]).minimize(cost)

    total = cfg["warmup_steps"] + cfg["timed_steps"]
    batches = P.minibatch_indices(n_train, cfg["batch_size"], total)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        step = [0]

        def run_one():
            idx = batches[min(step[0], total - 1)]
            step[0] += 1
            return sess.run([infer_op, lower_bound],
                            feed_dict={x: x_train[idx], y: y_train[idx]})

        for _ in range(cfg["warmup_steps"]):
            run_one()
        t0 = time.perf_counter()
        last = None
        for _ in range(cfg["timed_steps"]):
            last = run_one()
        dt = time.perf_counter() - t0
    return {"steps_per_sec": round(cfg["timed_steps"] / dt, 2),
            "timed_steps": cfg["timed_steps"], "timed_sec": round(dt, 2),
            "final_lb": round(float(last[1]), 4)}


def measure_bnn_sghmc(tf, zs):
    """Reference bnn_sgmcmc.py:59-92,108-128 (2nd-order SGHMC E step)."""
    cfg = P.BNN_SGHMC
    tf.reset_default_graph()
    tf.set_random_seed(1237)
    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train = len(x_train)
    layer_sizes = [cfg["x_dim"], cfg["n_hidden"], 1]
    w_names = ["w" + str(i) for i in range(len(layer_sizes) - 1)]
    n_particles = cfg["n_particles"]

    rng = np.random.RandomState(3)
    wv = []
    logstds = []
    for i, (n_in, n_out) in enumerate(zip(layer_sizes[:-1],
                                          layer_sizes[1:])):
        wv.append(tf.Variable(
            rng.uniform(size=[n_particles, n_out, n_in + 1]).astype(
                np.float32) * 4 - 2))
        logstds.append(tf.Variable(tf.zeros([n_out, n_in + 1])))

    model, x, y = _ref_bnn_graph(tf, zs, layer_sizes, n_particles,
                                 logstds=logstds)

    def log_joint(bn):
        log_pws = bn.cond_log_prob(w_names)
        log_py_xw = bn.cond_log_prob("y")
        return tf.add_n(log_pws) + tf.reduce_mean(log_py_xw, 1) * n_train

    model.log_joint = log_joint
    sgmcmc = zs.SGHMC(learning_rate=cfg["lr"], friction=cfg["friction"],
                      n_iter_resample_v=cfg["n_iter_resample_v"],
                      second_order=True)
    latent = dict(zip(w_names, wv))
    sample_op, sgmcmc_info = sgmcmc.sample(model, observed={"y": y},
                                           latent=latent)
    mean_k = sgmcmc_info.mean_k

    total = cfg["warmup_steps"] + cfg["timed_steps"]
    batches = P.minibatch_indices(n_train, cfg["batch_size"], total)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        step = [0]

        def run_one():
            idx = batches[min(step[0], total - 1)]
            step[0] += 1
            return sess.run([sample_op, mean_k],
                            feed_dict={x: x_train[idx], y: y_train[idx]})

        for _ in range(cfg["warmup_steps"]):
            run_one()
        t0 = time.perf_counter()
        last = None
        for _ in range(cfg["timed_steps"]):
            last = run_one()
        dt = time.perf_counter() - t0
    return {"steps_per_sec": round(cfg["timed_steps"] / dt, 2),
            "timed_steps": cfg["timed_steps"], "timed_sec": round(dt, 2),
            "final_mean_k": round(float(np.mean([
                np.mean(v) for v in (last[1].values()
                                     if isinstance(last[1], dict)
                                     else [last[1]])])), 4)}


def _dense(tf, name, inp, units):
    """tf.layers.dense equivalent (unavailable under Keras 3): glorot
    kernel + zero bias under the current variable scope — exactly what the
    reference's ``tf.layers.dense(h, units)`` calls created."""
    in_dim = int(inp.shape[-1])
    w = tf.get_variable(name + "/kernel", [in_dim, units],
                        initializer=tf.glorot_uniform_initializer())
    b = tf.get_variable(name + "/bias", [units],
                        initializer=tf.zeros_initializer())
    return tf.tensordot(inp, w, [[-1], [0]]) + b


def measure_sbn_vimco(tf, zs):
    """Reference sbn_vimco.py:19-45,68-111 (3-layer SBN, VIMCO k=10)."""
    cfg = P.SBN_VIMCO
    tf.reset_default_graph()
    tf.set_random_seed(1234)
    x_dim, h_dim = cfg["x_dim"], cfg["h_dim"]
    total = cfg["warmup_steps"] + cfg["timed_steps"]
    data = P.synthetic_binary_mnist(cfg["batch_size"] * total,
                                    cfg["data_seed"])

    n_particles = tf.placeholder(tf.int32, shape=[], name="n_particles")
    x = tf.placeholder(tf.int32, shape=[None, x_dim], name="x")
    n = tf.placeholder(tf.int32, shape=[], name="n")

    @zs.meta_bayesian_net(scope="sbn", reuse_variables=True)
    def build_sbn():
        bn = zs.BayesianNet()
        h3_logits = tf.zeros([n, h_dim])
        h3 = bn.bernoulli("h3", h3_logits, group_ndims=1,
                          n_samples=n_particles, dtype=tf.float32)
        h2_logits = _dense(tf, "g32", h3, h_dim)
        h2 = bn.bernoulli("h2", h2_logits, group_ndims=1, dtype=tf.float32)
        h1_logits = _dense(tf, "g21", h2, h_dim)
        h1 = bn.bernoulli("h1", h1_logits, group_ndims=1, dtype=tf.float32)
        x_logits = _dense(tf, "g1x", h1, x_dim)
        bn.bernoulli("x", x_logits, group_ndims=1)
        return bn

    @zs.reuse_variables(scope="q_net")
    def build_q_net():
        bn = zs.BayesianNet()
        h1_logits = _dense(tf, "qx1", tf.cast(x, tf.float32), h_dim)
        h1 = bn.bernoulli("h1", h1_logits, group_ndims=1,
                          n_samples=n_particles, dtype=tf.float32)
        h2_logits = _dense(tf, "q12", h1, h_dim)
        h2 = bn.bernoulli("h2", h2_logits, group_ndims=1, dtype=tf.float32)
        h3_logits = _dense(tf, "q23", h2, h_dim)
        bn.bernoulli("h3", h3_logits, group_ndims=1, dtype=tf.float32)
        return bn

    model = build_sbn()
    variational = build_q_net()
    lower_bound = zs.variational.importance_weighted_objective(
        model, observed={"x": x}, variational=variational, axis=0)
    cost = tf.reduce_mean(lower_bound.vimco())
    lower_bound = tf.reduce_mean(lower_bound)
    infer_op = tf.train.AdamOptimizer(
        learning_rate=cfg["lr"], epsilon=cfg["eps"]).minimize(cost)

    bs = cfg["batch_size"]
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        step = [0]

        def run_one():
            i = min(step[0], total - 1)
            step[0] += 1
            xb = data[i * bs:(i + 1) * bs].astype(np.int32)
            return sess.run([infer_op, lower_bound],
                            feed_dict={x: xb, n_particles:
                                       cfg["n_particles"], n: bs})

        for _ in range(cfg["warmup_steps"]):
            run_one()
        t0 = time.perf_counter()
        last = None
        for _ in range(cfg["timed_steps"]):
            last = run_one()
        dt = time.perf_counter() - t0
    return {"steps_per_sec": round(cfg["timed_steps"] / dt, 2),
            "timed_steps": cfg["timed_steps"], "timed_sec": round(dt, 2),
            "final_lb": round(float(last[1]), 4)}


def measure_svgp(tf, zs):
    """Reference svgp.py:49-143,163-186 (SVGP, 100 inducing, full batch)."""
    cfg = P.SVGP
    tf.reset_default_graph()
    tf.set_random_seed(1237)
    sys.path.insert(0, "/root/reference")
    from examples.gaussian_process.utils import gp_conditional, RBFKernel

    x_train, y_train, _, _, _ = P.regression_splits(cfg)
    n_train, n_covariates = x_train.shape
    n_z, n_particles = cfg["n_z"], cfg["n_particles"]
    dtype = tf.float32

    kernel = RBFKernel(n_covariates)
    x_ph = tf.placeholder(dtype, [None, n_covariates], "x")
    y_ph = tf.placeholder(dtype, [None], "y")
    z_pos = tf.get_variable(
        "z/pos", [n_z, n_covariates], dtype,
        initializer=tf.random_uniform_initializer(-1, 1))
    n_particles_ph = tf.placeholder(tf.int32, [], "n_particles")
    batch_size_f = tf.cast(tf.shape(x_ph)[0], dtype)

    class HPS:
        pass

    hps = HPS()
    hps.n_z, hps.dtype = n_z, dtype

    @zs.meta_bayesian_net(scope="model", reuse_variables=True)
    def build_model():
        bn = zs.BayesianNet()
        Kzz_chol = tf.cholesky(kernel(z_pos, z_pos))
        fz = bn.multivariate_normal_cholesky(
            "fz", tf.zeros([n_z], dtype=dtype), Kzz_chol,
            n_samples=n_particles_ph)
        fx_given_fz = bn.stochastic(
            "fx", gp_conditional(z_pos, fz, x_ph, False, kernel, Kzz_chol))
        noise_level = tf.get_variable(
            "noise_level", shape=[], dtype=dtype,
            initializer=tf.constant_initializer(0.05))
        noise_level = tf.nn.softplus(noise_level)
        bn.normal("y", mean=fx_given_fz, std=noise_level, group_ndims=1)
        return bn

    def build_variational():
        bn = zs.BayesianNet()
        z_mean = tf.get_variable("z/mean", [n_z], dtype,
                                 tf.zeros_initializer())
        z_cov_raw = tf.get_variable("z/cov_raw",
                                    initializer=tf.eye(n_z, dtype=dtype))
        z_cov_tril = tf.matrix_set_diag(
            tf.matrix_band_part(z_cov_raw, -1, 0),
            tf.nn.softplus(tf.matrix_diag_part(z_cov_raw)))
        fz = bn.multivariate_normal_cholesky(
            "fz", z_mean, z_cov_tril, n_samples=n_particles_ph)
        bn.stochastic("fx", gp_conditional(z_pos, fz, x_ph, False, kernel))
        return bn

    model = build_model()

    def log_joint(bn):
        prior, log_py_given_fx = bn.cond_log_prob(["fz", "y"])
        return prior + log_py_given_fx / batch_size_f * n_train

    model.log_joint = log_joint
    variational = build_variational()
    [var_fz, var_fx] = variational.query(
        ["fz", "fx"], outputs=True, local_log_prob=True)
    var_fx = (var_fx[0], tf.zeros_like(var_fx[1]))
    lower_bound = zs.variational.elbo(
        model, observed={"y": y_ph},
        latent={"fz": var_fz, "fx": var_fx}, axis=0)
    cost = lower_bound.sgvb()
    infer_op = tf.train.AdamOptimizer(learning_rate=cfg["lr"]).minimize(cost)

    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        sps, last, dt = _timed_loop(
            sess, [infer_op, lower_bound],
            {x_ph: x_train, y_ph: y_train,
             n_particles_ph: n_particles},
            cfg["warmup_steps"], cfg["timed_steps"])
    return {"steps_per_sec": round(sps, 2),
            "timed_steps": cfg["timed_steps"], "timed_sec": round(dt, 2),
            "final_lb": round(float(last[1]), 4)}


MEASURES = {
    "toy2d": measure_toy2d,
    "bnn_sgvb": measure_bnn_sgvb,
    "bnn_sghmc": measure_bnn_sghmc,
    "sbn_vimco": measure_sbn_vimco,
    "svgp": measure_svgp,
}


def main(names):
    tf = install()
    import zhusuan as zs

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        print("=== measuring reference:", name, flush=True)
        # 3 trials, keep the fastest (generous-to-reference; CLAUDE.md
        # A/B methodology): each trial rebuilds graph + session.
        trials = [MEASURES[name](tf, zs) for _ in range(3)]
        best = max(trials, key=lambda r: r["steps_per_sec"])
        best["trials_steps_per_sec"] = [r["steps_per_sec"] for r in trials]
        results[name] = best
        results[name]["what"] = (
            "REAL reference ZhuSuan via tf.compat.v1, sess.run per step "
            "(host CPU), best of 3 trials")
        print(name, "->", json.dumps(results[name]), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:] or list(MEASURES))
