"""TPU compute ops: numerics checks and Pallas kernels for hot paths.

See PERF.md for the measurements behind what is (and deliberately is not)
hand-written here.
"""

from zhusuan_tpu.ops.checks import check_numerics
from zhusuan_tpu.ops.leapfrog import fused_leapfrog, leapfrog_supported
from zhusuan_tpu.ops.random import tpu_normal, tpu_uniform

__all__ = [
    "check_numerics",
    "fused_leapfrog",
    "leapfrog_supported",
    "tpu_normal",
    "tpu_uniform",
]
