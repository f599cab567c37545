"""Optimizers for the examples.

Parity: reference ``examples/utils/optimizers.py:11-61`` implemented a
custom ``AdamaxOptimizer``; in the JAX ecosystem this is ``optax.adamax``,
re-exported here so example code reads the same.
"""

import optax

__all__ = ["adamax", "AdamaxOptimizer"]

adamax = optax.adamax


def AdamaxOptimizer(learning_rate=1e-3, beta1=0.9, beta2=0.999, epsilon=1e-8):
    """Factory matching the reference constructor signature; returns an
    optax GradientTransformation."""
    return optax.adamax(learning_rate, b1=beta1, b2=beta2, eps=epsilon)
