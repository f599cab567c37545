"""Shared measurement protocol for the remaining BASELINE.json acceptance
configs (#2 toy2d SGVB, #4 BNN SGVB + SGHMC, #5 SBN VIMCO + SVGP).

Both measurement scripts (``measure_configs_ref.py`` — the REAL TF1
reference via tf.compat.v1, and ``measure_configs_ours.py`` — this library
on the TPU) import THIS module so data, shapes, hyperparameters, and step
counts are identical on both sides. Data is deterministic synthetic
(zero-egress image; same generator as ``examples.utils.dataset``'s
fallbacks) standardized exactly like the reference examples do.

Reference configs mirrored (file:line are /root/reference paths):
- toy2d:     examples/toy_examples/toy2d_intractable.py:36-44,87-94
- bnn_sgvb:  examples/bayesian_neural_nets/bnn_vi.py:74-100,108-112
- bnn_sghmc: examples/bayesian_neural_nets/bnn_sgmcmc.py:59-92,108-128
- sbn_vimco: examples/sigmoid_belief_nets/sbn_vimco.py:60-111
- svgp:      examples/gaussian_process/svgp.py:36-46,108-140,163-186

Each side reports steps/sec over TIMED_STEPS after WARMUP_STEPS untimed
steps (graph/compile warm). TIMED_STEPS is sized so the OURS-side timed
unit is >=0.15s wall: sub-millisecond axon timings are unreliable (work-
scaling check, PERF.md round 4). Each framework runs its native loop:
``sess.run`` per step for the TF1 reference (its examples' own pattern),
``jax.jit`` + ``lax.scan`` over device-resident batches for ours.
"""

import numpy as np

# ---------------------------------------------------------------- toy2d #
TOY2D = dict(n_particles=500, lr=0.1, warmup_steps=50, timed_steps=16000)

# ------------------------------------------------------------- bnn sgvb #
# Boston-housing protocol (bnn_vi.py): layers [13, 50, 1], batch 10,
# lb_samples 10, Adam(0.01).
BNN_SGVB = dict(n_train_raw=506, x_dim=13, n_hidden=50, batch_size=10,
                n_particles=10, lr=0.01, warmup_steps=50, timed_steps=8000,
                data_seed=42)

# ------------------------------------------------------------ bnn sghmc #
# Protein protocol (bnn_sgmcmc.py): layers [9, 50, 1], batch 100,
# 20 particles, SGHMC(2e-6, friction 0.2, resample 1000, 2nd order).
BNN_SGHMC = dict(n_train_raw=45730, x_dim=9, n_hidden=50, batch_size=100,
                 n_particles=20, lr=2e-6, friction=0.2,
                 n_iter_resample_v=1000, warmup_steps=50, timed_steps=8000,
                 data_seed=7)

# ------------------------------------------------------------ sbn vimco #
# MNIST protocol (sbn_vimco.py): x_dim 784, h_dim 200, batch 24, k=10,
# Adam(1e-3, eps=1e-4).
SBN_VIMCO = dict(x_dim=784, h_dim=200, batch_size=24, n_particles=10,
                 lr=1e-3, eps=1e-4, warmup_steps=30, timed_steps=2000,
                 data_seed=1234)

# ----------------------------------------------------------------- svgp #
# Boston protocol (svgp.py defaults): 100 inducing points, 20 particles,
# full batch (455 <= 5000), Adam(1e-2).
SVGP = dict(n_train_raw=506, x_dim=13, n_z=100, n_particles=20, lr=1e-2,
            warmup_steps=30, timed_steps=600, data_seed=42)


def synthetic_regression(n, d, seed):
    """Deterministic synthetic regression data, identical to
    ``examples.utils.dataset._synthetic_regression`` (keep in sync)."""
    rng = np.random.RandomState(seed)
    w1 = rng.randn(d, 32)
    w2 = rng.randn(32)
    x = rng.randn(n, d)
    y = np.tanh(x @ w1) @ w2 + 0.3 * rng.randn(n)
    return x.astype(np.float32), y.astype(np.float32)


def standardize(data_train, data_test):
    """Reference ``examples/utils/dataset.py:standardize`` semantics."""
    std = np.std(data_train, 0, keepdims=True)
    std[std == 0] = 1.0
    mean = np.mean(data_train, 0, keepdims=True)
    train = (data_train - mean) / std
    test = (data_test - mean) / std
    return train, test, np.squeeze(mean), np.squeeze(std)


def regression_splits(cfg):
    """90/10 train/test split + standardization (reference bnn/svgp
    examples merge train+valid; we split deterministically)."""
    x, y = synthetic_regression(cfg["n_train_raw"], cfg["x_dim"],
                                cfg["data_seed"])
    n_test = max(1, int(0.1 * len(x)))
    x_train, x_test = x[:-n_test], x[-n_test:]
    y_train, y_test = y[:-n_test], y[-n_test:]
    x_train, x_test, _, _ = standardize(x_train, x_test)
    y_train, y_test, _, std_y = standardize(y_train, y_test)
    return (x_train.astype(np.float32), y_train.astype(np.float32),
            x_test.astype(np.float32), y_test.astype(np.float32),
            float(std_y))


def minibatch_indices(n_train, batch_size, n_steps, seed=0):
    """The SAME minibatch index sequence on both sides: epoch-wise
    permutations (reference loop pattern) flattened to n_steps batches."""
    rng = np.random.RandomState(seed)
    out = []
    step = 0
    while step < n_steps:
        perm = rng.permutation(n_train)
        for t in range(n_train // batch_size):
            if step >= n_steps:
                break
            out.append(perm[t * batch_size:(t + 1) * batch_size])
            step += 1
    return np.stack(out)  # [n_steps, batch_size]


def synthetic_binary_mnist(n, seed):
    """Deterministic {0,1} MNIST-shaped batches (blurred random strokes,
    thresholded) — same spirit as examples.utils.dataset's fallback."""
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, 28, 28)
    # cheap separable blur to create stroke-like correlations
    k = np.array([0.25, 0.5, 0.25])
    for axis in (1, 2):
        imgs = (np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, imgs))
    flat = imgs.reshape(n, 784)
    flat = (flat - flat.min(1, keepdims=True))
    flat = flat / np.maximum(flat.max(1, keepdims=True), 1e-9)
    return (flat > 0.55).astype(np.float32)
