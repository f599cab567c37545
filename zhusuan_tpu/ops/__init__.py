"""TPU compute ops: numerics checks and Pallas kernels for hot paths."""

from zhusuan_tpu.ops.checks import check_numerics

__all__ = ["check_numerics"]
