"""Legacy framework layer (reference ``zhusuan/legacy/framework/``)."""

from zhusuan_tpu.legacy.framework.stochastic import *  # noqa: F401,F403
from zhusuan_tpu.legacy.framework import stochastic

__all__ = list(stochastic.__all__)
