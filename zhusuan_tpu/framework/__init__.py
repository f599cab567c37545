"""Model framework: BayesianNet, StochasticTensor, MetaBayesianNet.

Parity: reference ``zhusuan/framework/__init__.py`` flat re-exports.
"""

from zhusuan_tpu.framework.bn import BayesianNet, StochasticTensor
from zhusuan_tpu.framework.meta_bn import MetaBayesianNet, meta_bayesian_net
from zhusuan_tpu.framework.utils import Context, Local, reuse, reuse_variables
from zhusuan_tpu.framework.arith import TensorArithmeticMixin
from zhusuan_tpu.framework.predictive import posterior_predictive
from zhusuan_tpu.framework.marginalize import marginalize

__all__ = [
    "BayesianNet",
    "StochasticTensor",
    "MetaBayesianNet",
    "meta_bayesian_net",
    "Context",
    "Local",
    "reuse_variables",
    "reuse",
    "TensorArithmeticMixin",
    "posterior_predictive",
    "marginalize",
]
