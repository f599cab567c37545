"""Measure the REAL reference ZhuSuan's HMC throughput (the north-star
baseline denominator, BASELINE.json / VERDICT r2 item 1).

Runs the reference ``zs.HMC`` (/root/reference/zhusuan/hmc.py:382) on the
exact benchmark target from bench.py — a 100-dim diagonal Gaussian with
stdev linspace(0.1, 1.0, 100) — in the reference's own execution model:
TF1 graph + ``sess.run`` per iteration with a per-iteration host fetch
(/root/reference/examples/toy_examples/gaussian.py:49-62), 1000 chains,
5 leapfrogs, adaptive step size + mass (first 200 iters), then 500 timed
sampling iterations. ESS is computed with the same reference-exact
estimator bench.py uses (zhusuan_tpu.diagnostics.ess_batch).

Writes JSON to baseline_ref/ref_hmc.json and prints it.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from baseline_ref.tf1_shim import install

DIM = 100
N_CHAINS = int(os.environ.get("REF_HMC_CHAINS", "1000"))
N_ADAPT = 200
N_ITERS = int(os.environ.get("REF_HMC_ITERS", "500"))
N_LEAPFROGS = 5


def main():
    tf = install()
    import zhusuan as zs

    tf.set_random_seed(1)
    target_std = np.linspace(0.1, 1.0, DIM).astype(np.float32)

    @zs.meta_bayesian_net()
    def gaussian():
        bn = zs.BayesianNet()
        bn.normal("x", tf.zeros([DIM]), std=tf.constant(target_std),
                  n_samples=N_CHAINS, group_ndims=1)
        return bn

    model = gaussian()
    adapt = tf.placeholder(tf.bool, shape=[], name="adapt")
    hmc = zs.HMC(step_size=0.1, n_leapfrogs=N_LEAPFROGS,
                 adapt_step_size=adapt, adapt_mass=adapt,
                 target_acceptance_rate=0.8)
    x = tf.Variable(tf.zeros([N_CHAINS, DIM]), trainable=False, name="x")
    sample_op, hmc_info = hmc.sample(model, {}, {"x": x})

    config = tf.ConfigProto()
    with tf.Session(config=config) as sess:
        sess.run(tf.global_variables_initializer())
        # Warm-up/adaptation phase (mirrors bench.py's untimed burn).
        t0 = time.perf_counter()
        for i in range(N_ADAPT):
            sess.run([sample_op, hmc_info.acceptance_rate],
                     feed_dict={adapt: True})
        adapt_dt = time.perf_counter() - t0

        # Timed sampling phase: sess.run per iteration + host fetch of the
        # samples, exactly the reference example loop (gaussian.py:53-62).
        samples = []
        t0 = time.perf_counter()
        for i in range(N_ITERS):
            _, x_sample = sess.run([sample_op, hmc_info.samples["x"]],
                                   feed_dict={adapt: False})
            samples.append(x_sample)
        dt = time.perf_counter() - t0
        acc = sess.run(hmc_info.acceptance_rate, feed_dict={adapt: False})

    traj = np.stack(samples)  # [T, C, D]
    if os.environ.get("REF_HMC_SAVE_TRAJ", "1") == "1":
        np.savez_compressed("/tmp/ref_hmc_traj.npz",
                            traj=traj.astype(np.float32))

    # ESS with the identical estimator bench.py uses (JAX stays on CPU).
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zhusuan_tpu.diagnostics import ess_batch

    T, C, D = traj.shape
    ess = np.asarray(ess_batch(traj.reshape(T, C * D))).reshape(C, D)
    total_ess = float(np.minimum.reduce(ess, axis=1).sum())

    result = {
        "what": "REAL reference ZhuSuan HMC via tf.compat.v1 "
                "(sess.run per iteration, reference gaussian.py loop)",
        "tf_version": tf.VERSION,
        "n_chains": N_CHAINS, "dim": DIM, "n_iters": N_ITERS,
        "n_leapfrogs": N_LEAPFROGS,
        "adapt_phase_sec": round(adapt_dt, 2),
        "sample_phase_sec": round(dt, 2),
        "mean_acceptance": round(float(np.mean(acc)), 3),
        "total_min_ess": round(total_ess, 1),
        "ess_per_sec": round(total_ess / dt, 2),
    }
    suffix = "" if N_CHAINS == 1000 else "_%dc" % N_CHAINS
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ref_hmc%s.json" % suffix)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
