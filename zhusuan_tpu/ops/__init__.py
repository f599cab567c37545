"""TPU compute ops: numerics checks and Pallas kernels for hot paths.

See PERF.md for the measurements behind what is (and deliberately is not)
hand-written here.
"""

from zhusuan_tpu.ops.advi_step import (
    advi_step_supported,
    fused_meanfield_advi,
)
from zhusuan_tpu.ops.checks import check_numerics, checked
from zhusuan_tpu.ops.hmc_step import fused_hmc_step, hmc_step_supported
from zhusuan_tpu.ops.leapfrog import fused_leapfrog, leapfrog_supported
from zhusuan_tpu.ops import linalg
from zhusuan_tpu.ops.linalg import cholesky_inverse
from zhusuan_tpu.ops.random import tpu_normal, tpu_uniform
from zhusuan_tpu.ops.psgld_step import fused_psgld_step
from zhusuan_tpu.ops.sghmc_step import fused_sghmc_step
from zhusuan_tpu.ops.sgld_step import fused_sgld_step
from zhusuan_tpu.ops.sgnht_step import fused_sgnht_step

__all__ = [
    "advi_step_supported",
    "fused_meanfield_advi",
    "check_numerics",
    "cholesky_inverse",
    "linalg",
    "checked",
    "fused_hmc_step",
    "hmc_step_supported",
    "fused_leapfrog",
    "leapfrog_supported",
    "fused_psgld_step",
    "fused_sghmc_step",
    "fused_sgld_step",
    "fused_sgnht_step",
    "tpu_normal",
    "tpu_uniform",
]
