"""Shared protocol constants + data for the reference-vs-ours VAE ELBO-curve
comparison (north star part 2, BASELINE.json).

Both measure_vae_ref.py (TF1 reference) and measure_vae_ours.py (this repo)
import from here so the data, data order, and hyperparameters are identical
by construction. 10k-sample subset of the deterministic synthetic MNIST
keeps the TF1-CPU side tractable (~78 iters/epoch).
"""

import os
import sys

import numpy as np

N_TRAIN = 10000
BATCH = 128
EPOCHS = 20
Z_DIM = 40
LR = 1e-3
SHUFFLE_SEED = 20260817


def load_train():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from examples.utils.dataset import _synthetic_mnist

    x_train = _synthetic_mnist()[0][:N_TRAIN]
    return np.asarray(x_train, dtype=np.float32)


def permutations():
    """The exact per-epoch shuffles both sides use."""
    rng = np.random.RandomState(SHUFFLE_SEED)
    return [rng.permutation(N_TRAIN) for _ in range(EPOCHS)]
