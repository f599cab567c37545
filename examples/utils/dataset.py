"""Dataset loaders for the examples.

Parity target: reference ``examples/utils/dataset.py`` (MNIST :102,
CIFAR-10 :198, UCI boston :321 / protein :347 / german credits :301,
bag-of-words :373, MovieLens-1M :466, standardize :20, to_one_hot :39).

This build environment has zero network egress, so each loader first looks
for a local copy (``ZS_DATA_DIR``, default ``~/.zhusuan_tpu/data``) and
otherwise falls back to a *deterministic synthetic* dataset with identical
shapes/dtypes/value ranges, clearly flagged by the returned ``synthetic``
flag. Throughput benchmarks are data-independent; accuracy numbers on
synthetic data are labeled as such.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Tuple

import numpy as np

__all__ = [
    "data_dir",
    "load_mnist_realval",
    "load_binary_mnist",
    "load_uci_boston_housing",
    "load_uci_protein_data",
    "standardize",
    "to_one_hot",
]


def data_dir():
    return os.environ.get(
        "ZS_DATA_DIR", os.path.expanduser("~/.zhusuan_tpu/data")
    )


def standardize(data_train, data_test):
    """Standardize train/test by train statistics.

    Parity: reference ``examples/utils/dataset.py:20-36``.

    :return: ``(train_standardized, test_standardized, mean, std)``.
    """
    std = np.std(data_train, 0, keepdims=True)
    std[std == 0] = 1
    mean = np.mean(data_train, 0, keepdims=True)
    out_train = (data_train - mean) / std
    out_test = (data_test - mean) / std
    return out_train, out_test, np.squeeze(mean, 0), np.squeeze(std, 0)


def to_one_hot(x, depth):
    """Integer labels -> one-hot (reference dataset.py:39-50)."""
    ret = np.zeros((x.shape[0], depth), dtype=np.int32)
    ret[np.arange(x.shape[0]), x] = 1
    return ret


def _read_idx_images(path):
    with gzip.open(path, "rb") as f:
        _, n, rows, cols = struct.unpack(">IIII", f.read(16))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(n, rows * cols).astype(np.float32) / 255.0


def _read_idx_labels(path):
    with gzip.open(path, "rb") as f:
        _ = struct.unpack(">II", f.read(8))
        return np.frombuffer(f.read(), dtype=np.uint8).astype(np.int32)


def _synthetic_mnist(n_train=50000, n_valid=10000, n_test=10000, seed=1234):
    """Deterministic MNIST-shaped synthetic digits: blurred random strokes
    per class template, values in [0, 1], 784 features, 10 classes."""
    rng = np.random.RandomState(seed)
    templates = rng.rand(10, 28, 28) ** 3
    # Smooth the templates to get digit-like blobs.
    for _ in range(2):
        templates = (
            templates
            + np.roll(templates, 1, -1) + np.roll(templates, -1, -1)
            + np.roll(templates, 1, -2) + np.roll(templates, -1, -2)
        ) / 5.0
    templates /= templates.max(axis=(1, 2), keepdims=True)

    def make(n):
        labels = rng.randint(0, 10, size=n)
        base = templates[labels]
        noise = rng.rand(n, 28, 28) * 0.3
        imgs = np.clip(base * 0.9 + noise - 0.15, 0.0, 1.0)
        return imgs.reshape(n, 784).astype(np.float32), labels.astype(np.int32)

    x_train, t_train = make(n_train)
    x_valid, t_valid = make(n_valid)
    x_test, t_test = make(n_test)
    return x_train, t_train, x_valid, t_valid, x_test, t_test


def load_mnist_realval(path=None):
    """MNIST with real-valued pixels in [0, 1].

    Parity: reference ``dataset.py:102-142`` (returns train/valid/test
    splits). Falls back to :func:`_synthetic_mnist` when the IDX files are
    absent (zero-egress environment); check the module docstring.

    :return: ``(x_train, t_train, x_valid, t_valid, x_test, t_test,
        synthetic)``.
    """
    base = path or os.path.join(data_dir(), "mnist")
    files = [
        "train-images-idx3-ubyte.gz",
        "train-labels-idx1-ubyte.gz",
        "t10k-images-idx3-ubyte.gz",
        "t10k-labels-idx1-ubyte.gz",
    ]
    paths = [os.path.join(base, f) for f in files]
    if all(os.path.exists(p) for p in paths):
        x = _read_idx_images(paths[0])
        t = _read_idx_labels(paths[1])
        x_test = _read_idx_images(paths[2])
        t_test = _read_idx_labels(paths[3])
        x_train, x_valid = x[:-10000], x[-10000:]
        t_train, t_valid = t[:-10000], t[-10000:]
        return x_train, t_train, x_valid, t_valid, x_test, t_test, False
    out = _synthetic_mnist()
    return (*out, True)


def load_binary_mnist(path=None, seed=0):
    """Binarized MNIST (Bernoulli-sampled pixels), the VAE benchmark input.

    :return: ``(x_train, x_valid, x_test, synthetic)`` with values in {0,1}.
    """
    x_train, _, x_valid, _, x_test, _, synthetic = load_mnist_realval(path)
    rng = np.random.RandomState(seed)
    return (
        (rng.rand(*x_train.shape) < x_train).astype(np.float32),
        (rng.rand(*x_valid.shape) < x_valid).astype(np.float32),
        (rng.rand(*x_test.shape) < x_test).astype(np.float32),
        synthetic,
    )


def _synthetic_regression(n, d, seed):
    """Deterministic nonlinear regression data (UCI fallback)."""
    rng = np.random.RandomState(seed)
    w1 = rng.randn(d, 32)
    w2 = rng.randn(32)
    x = rng.randn(n, d)
    y = np.tanh(x @ w1) @ w2 + 0.3 * rng.randn(n)
    return x.astype(np.float32), y.astype(np.float32)


def load_uci_boston_housing(path=None, seed=0):
    """Boston housing (506 x 13). Parity: reference ``dataset.py:321-344``.

    :return: ``(x_train, y_train, x_valid, y_valid, x_test, y_test,
        synthetic)``.
    """
    base = path or os.path.join(data_dir(), "housing.data")
    if os.path.exists(base):
        data = np.loadtxt(base)
        synthetic = False
    else:
        x, y = _synthetic_regression(506, 13, seed=42)
        data = np.concatenate([x, y[:, None]], axis=1)
        synthetic = True
    rng = np.random.RandomState(seed)
    perm = rng.permutation(data.shape[0])
    data = data[perm]
    n = data.shape[0]
    n_train, n_valid = int(0.8 * n), int(0.1 * n)
    splits = (
        data[:n_train], data[n_train:n_train + n_valid],
        data[n_train + n_valid:],
    )
    out = []
    for s in splits:
        out.extend([s[:, :-1], s[:, -1]])
    return (*out, synthetic)


def load_uci_protein_data(path=None, seed=0):
    """Protein structure (45730 x 9). Parity: reference
    ``dataset.py:347-370``."""
    base = path or os.path.join(data_dir(), "protein.data")
    if os.path.exists(base):
        data = np.loadtxt(base, delimiter=",", skiprows=1)
        # reference: first column is the target
        y, x = data[:, 0], data[:, 1:]
        synthetic = False
    else:
        x, y = _synthetic_regression(45730, 9, seed=7)
        synthetic = True
    rng = np.random.RandomState(seed)
    perm = rng.permutation(x.shape[0])
    x, y = x[perm], y[perm]
    n = x.shape[0]
    n_train, n_valid = int(0.8 * n), int(0.1 * n)
    return (
        x[:n_train], y[:n_train],
        x[n_train:n_train + n_valid], y[n_train:n_train + n_valid],
        x[n_train + n_valid:], y[n_train + n_valid:],
        synthetic,
    )
