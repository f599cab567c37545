"""Distribution zoo.

Parity with reference ``zhusuan/distributions/__init__.py``: 14 univariate +
12 multivariate classes plus the special Empirical/Implicit pair, all exposed
flat in this namespace. Beyond the reference: ``FlowDistribution``
(flows as first-class densities), five extra univariate heads
(StudentT/Exponential/Cauchy/HalfCauchy/LogNormal), the ``LKJCholesky``
correlation prior, ``Wishart``, and the ``Mixture`` composition (finite
mixtures with the assignment marginalized out of ``log_prob``).
"""

from zhusuan_tpu.distributions.base import Distribution
from zhusuan_tpu.distributions.univariate import *  # noqa: F401,F403
from zhusuan_tpu.distributions.multivariate import *  # noqa: F401,F403
from zhusuan_tpu.distributions.special import *  # noqa: F401,F403
from zhusuan_tpu.distributions.flow import FlowDistribution  # noqa: F401
from zhusuan_tpu.distributions.extra import *  # noqa: F401,F403
from zhusuan_tpu.distributions.lkj import LKJCholesky  # noqa: F401
from zhusuan_tpu.distributions.wishart import Wishart  # noqa: F401
from zhusuan_tpu.distributions.mixture import Mixture  # noqa: F401
from zhusuan_tpu.distributions import utils  # noqa: F401

from zhusuan_tpu.distributions import univariate as _uni
from zhusuan_tpu.distributions import multivariate as _multi
from zhusuan_tpu.distributions import special as _special
from zhusuan_tpu.distributions import extra as _extra

__all__ = (
    ["Distribution", "FlowDistribution", "LKJCholesky", "Wishart", "Mixture"]
    + _uni.__all__ + _multi.__all__ + _special.__all__ + _extra.__all__
)
