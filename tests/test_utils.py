"""Utils tests. Port of reference ``tests/test_utils.py`` log_sum_exp /
log_mean_exp scipy agreement (:257-287)."""

import jax.numpy as jnp
import numpy as np
from scipy.special import logsumexp

from zhusuan_tpu.utils import log_mean_exp, log_sum_exp, merge_dicts


class TestLogExp:
    def test_log_sum_exp(self):
        x = np.random.RandomState(0).randn(3, 4, 5)
        np.testing.assert_allclose(
            np.asarray(log_sum_exp(jnp.asarray(x), axis=1)),
            logsumexp(x, axis=1),
            rtol=1e-10,
        )

    def test_log_mean_exp(self):
        x = np.random.RandomState(1).randn(3, 4, 5)
        np.testing.assert_allclose(
            np.asarray(log_mean_exp(jnp.asarray(x), axis=-1)),
            logsumexp(x, axis=-1) - np.log(5),
            rtol=1e-10,
        )

    def test_log_mean_exp_extremes(self):
        x = jnp.asarray([-1e10, -1e10])
        assert np.isfinite(float(log_mean_exp(x, axis=0))) or float(
            log_mean_exp(x, axis=0)
        ) == -1e10


class TestMergeDicts:
    def test_precedence(self):
        assert merge_dicts({"a": 1, "b": 2}, {"b": 3}) == {"a": 1, "b": 3}
        assert merge_dicts() == {}
