"""Deprecated compatibility layer (reference ``zhusuan/legacy/``, 1,398 LoC).

Old-style self-registering ``StochasticTensor`` wrappers (``zs.Normal('w',
...)`` inside ``with zs.BayesianNet() as bn:``) and the special
``Empirical``/``Implicit`` distributions, re-exported flat at the package
top level exactly like the reference (``zhusuan/__init__.py:10-13``).
Everything here emits ``FutureWarning`` on use; new code should use the
``BayesianNet`` sugar methods.
"""

from zhusuan_tpu.legacy import distributions
from zhusuan_tpu.legacy import framework
from zhusuan_tpu.legacy.framework import *  # noqa: F401,F403
from zhusuan_tpu.legacy.framework import stochastic as _stochastic

__all__ = list(_stochastic.__all__)
