"""Measure the REAL reference ZhuSuan VAE (second half of the north star:
MNIST SGVB steps/sec + the per-epoch ELBO curve, BASELINE.json).

Builds the reference VAE graph exactly as
/root/reference/examples/variational_autoencoders/vae.py:19-75 (2x500 relu
MLPs, z_dim 40, Bernoulli likelihood, SGVB ELBO, Adam 1e-3, dynamic
binarization inside the graph, vae.py:58) via tf.compat.v1, and trains it
with the reference's sess.run loop (vae.py:94-107) on the SAME deterministic
synthetic MNIST our examples use (zero egress — examples/utils/dataset.py).

Two deliberate protocol choices, for an apples-to-apples ELBO curve:
- dense kernels use He-normal init to match examples/utils/nn.py:init_linear
  (the reference's TF default is glorot_uniform; init family is not part of
  the algorithm under test);
- epoch shuffles come from a seeded RNG so both sides see the same data
  order (the curve comparison script uses the identical permutations).

Writes baseline_ref/ref_vae.json: steps/sec + per-epoch lower bounds.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from baseline_ref.tf1_shim import install
from baseline_ref.vae_protocol import (
    BATCH, EPOCHS, LR, Z_DIM, load_train, permutations,
)


def main(seed=1, epochs=EPOCHS, write=True):
    tf = install()
    import zhusuan as zs

    tf.reset_default_graph()
    tf.set_random_seed(seed)
    x_train = load_train()
    x_dim = x_train.shape[1]
    he = tf.variance_scaling_initializer(scale=2.0, distribution="normal")

    def dense(h, n, name, activation=None):
        # tf.layers.dense is unavailable under Keras 3; raw get_variable +
        # matmul is the TF1-native equivalent and honors variable_scope
        # reuse (which zs.reuse_variables/meta_bayesian_net rely on).
        with tf.variable_scope(name, reuse=tf.AUTO_REUSE):
            w = tf.get_variable("kernel", [int(h.shape[-1]), n], tf.float32,
                                initializer=he)
            b = tf.get_variable("bias", [n], tf.float32,
                                initializer=tf.zeros_initializer())
        out = tf.tensordot(h, w, axes=[[-1], [0]]) + b
        return activation(out) if activation is not None else out

    @zs.meta_bayesian_net(scope="gen", reuse_variables=True)
    def build_gen(n, n_particles):
        bn = zs.BayesianNet()
        z_mean = tf.zeros([n, Z_DIM])
        z = bn.normal("z", z_mean, std=1., group_ndims=1,
                      n_samples=n_particles)
        h = dense(z, 500, "h1", tf.nn.relu)
        h = dense(h, 500, "h2", tf.nn.relu)
        x_logits = dense(h, x_dim, "logits")
        bn.bernoulli("x", x_logits, group_ndims=1)
        return bn

    @zs.reuse_variables(scope="q_net")
    def build_q_net(x, n_z_per_x):
        bn = zs.BayesianNet()
        h = dense(tf.cast(x, tf.float32), 500, "h1", tf.nn.relu)
        h = dense(h, 500, "h2", tf.nn.relu)
        z_mean = dense(h, Z_DIM, "z_mean")
        z_logstd = dense(h, Z_DIM, "z_logstd")
        bn.normal("z", z_mean, logstd=z_logstd, group_ndims=1,
                  n_samples=n_z_per_x)
        return bn

    n_particles = tf.placeholder(tf.int32, shape=[], name="n_particles")
    x_input = tf.placeholder(tf.float32, shape=[None, x_dim], name="x")
    x = tf.cast(tf.less(tf.random_uniform(tf.shape(x_input)), x_input),
                tf.int32)
    n = tf.placeholder(tf.int32, shape=[], name="n")

    model = build_gen(n, n_particles)
    variational = build_q_net(x, n_particles)
    lower_bound = zs.variational.elbo(
        model, {"x": x}, variational=variational, axis=0)
    cost = tf.reduce_mean(lower_bound.sgvb())
    lower_bound = tf.reduce_mean(lower_bound)
    optimizer = tf.train.AdamOptimizer(learning_rate=LR)
    infer_op = optimizer.minimize(cost)

    iters = x_train.shape[0] // BATCH
    perms = permutations()
    curve, epoch_secs = [], []
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        for epoch in range(1, epochs + 1):
            xs = x_train[perms[epoch - 1]]
            lbs = []
            t0 = time.perf_counter()
            for t in range(iters):
                x_batch = xs[t * BATCH:(t + 1) * BATCH]
                _, lb = sess.run([infer_op, lower_bound],
                                 feed_dict={x_input: x_batch,
                                            n_particles: 1, n: BATCH})
                lbs.append(lb)
            epoch_secs.append(time.perf_counter() - t0)
            curve.append(float(np.mean(lbs)))
            print("Epoch %d (%.1fs): LB = %.3f"
                  % (epoch, epoch_secs[-1], curve[-1]))

    if not write:
        return curve
    steady = epoch_secs[2:] or epoch_secs
    steps_per_sec = iters * len(steady) / sum(steady)
    result = {
        "what": "REAL reference ZhuSuan VAE via tf.compat.v1 "
                "(sess.run train loop, reference vae.py protocol)",
        "tf_version": tf.VERSION,
        "n_train": int(x_train.shape[0]), "batch": BATCH, "epochs": EPOCHS,
        "z_dim": Z_DIM, "lr": LR,
        "steps_per_sec": round(steps_per_sec, 2),
        "epoch_sec_mean": round(float(np.mean(steady)), 2),
        "elbo_curve": [round(v, 3) for v in curve],
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ref_vae.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "elbo_curve"}))
    return curve


if __name__ == "__main__":
    main()
