"""Analytic KL between two univariate Normals.

Parity: reference ``tests/variational/utils.py:11-13``.
"""

import jax.numpy as jnp


def kl_normal_normal(mean_q, logstd_q, mean_p, logstd_p):
    """KL(q || p) for q = N(mean_q, e^logstd_q), p = N(mean_p, e^logstd_p)."""
    var_q = jnp.exp(2.0 * logstd_q)
    var_p = jnp.exp(2.0 * logstd_p)
    return (
        logstd_p
        - logstd_q
        + (var_q + (mean_q - mean_p) ** 2) / (2.0 * var_p)
        - 0.5
    )
