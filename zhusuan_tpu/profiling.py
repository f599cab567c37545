"""Tracing, profiling, and throughput meters.

Parity (SURVEY.md §5): the reference's only tracing hook was tf.name_scope
annotation for TensorBoard (``zhusuan/utils.py:211``). TPU-native
equivalents:

- :func:`named_scope` — ``jax.named_scope`` re-export; annotate model
  builders/kernels so XLA HLO and profiler traces are readable.
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
- :class:`SpeedMeter` — steps/sec and items/sec meter for training loops.
- :func:`ess_per_sec` — the north-star metric: effective samples per second
  for a chain tensor and its wall-clock.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["named_scope", "trace", "SpeedMeter", "ess_per_sec"]

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile the enclosed block to ``log_dir`` (TensorBoard 'profile'
    plugin format, works with xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SpeedMeter:
    """Throughput meter: call :meth:`tick` once per step."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n_steps: int = 1):
        self._steps += n_steps

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else float("inf")

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step

    def __repr__(self):
        return "<SpeedMeter {:.1f} steps/s, {:.1f} items/s>".format(
            self.steps_per_sec, self.items_per_sec
        )


def ess_per_sec(samples, wall_seconds: float) -> float:
    """Total effective samples per second for stacked chain output.

    :param samples: ``[n_iters, n_chains, dim]`` (or ``[n_iters, dim]``).
    :param wall_seconds: wall-clock of the sampling phase.
    """
    from zhusuan_tpu.diagnostics import ess_batch_device

    samples = np.asarray(samples)
    if samples.ndim == 2:
        samples = samples[:, None, :]
    t, c, d = samples.shape
    ess = ess_batch_device(samples.reshape(t, c * d)).reshape(c, d)
    return float(np.minimum.reduce(ess, axis=1).sum() / wall_seconds)
