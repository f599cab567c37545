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


class TestNameScopeAndHelpers:
    """Port of the remaining reference test_utils.py coverage
    (add_name_scope :289-295, if_raise :297-304, DocInherit)."""

    def test_add_name_scope_preserves_result_and_name(self):
        import jax
        from zhusuan_tpu.utils import add_name_scope

        class Thing:
            @add_name_scope
            def compute(self, x):
                return x * 2

        t = Thing()
        out = t.compute(jnp.asarray(3.0))
        assert float(out) == 6.0
        assert Thing.compute.__name__ == "compute"
        # Works under jit (named scopes are trace-time annotations).
        assert float(jax.jit(lambda x: t.compute(x))(jnp.asarray(2.0))) == 4.0

    def test_if_raise(self):
        import pytest
        from zhusuan_tpu.utils import if_raise

        if_raise(False, ValueError("nope"))  # no-op
        with pytest.raises(ValueError, match="yes"):
            if_raise(True, ValueError("yes"))

    def test_docinherit(self):
        from zhusuan_tpu.utils import docinherit

        def src():
            """The docs."""

        @docinherit(src)
        def dst():
            pass

        assert dst.__doc__ == "The docs."

    def test_split_by_names(self):
        from zhusuan_tpu.utils import split_by_names

        d = {"a": 1, "b": 2, "c": 3}
        assert split_by_names(d, ["a", "c"]) == {"a": 1, "c": 3}

    def test_cached_property(self):
        from zhusuan_tpu.utils import cached_property

        calls = []

        class Foo:
            @cached_property
            def val(self):
                calls.append(1)
                return 42

        f = Foo()
        assert f.val == 42 and f.val == 42
        assert len(calls) == 1
