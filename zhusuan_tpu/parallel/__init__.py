"""Device-mesh parallelism: chain sharding and data parallelism over ICI.

Parity target (SURVEY.md §2.10): the reference's only distributed primitive
is in-graph multi-GPU gradient averaging (``examples/utils/multi_gpu.py``).
Here the equivalents are first-class library code built on ``jax.sharding``:

- :func:`chain_mesh` / :func:`shard_chains` — shard the leading chain /
  particle axis (the PPL's main parallel axis) across devices; XLA inserts
  the (trivially none) collectives, chains stay independent.
- :func:`data_parallel_grad` — minibatch-gradient ``pmean`` over the mesh
  via ``shard_map``, replacing ``average_gradients``
  (multi_gpu.py:24-60) with one ICI all-reduce.
"""

from zhusuan_tpu.parallel.mesh import (
    chain_mesh,
    data_parallel_grad,
    replicated,
    shard_chains,
    shard_params_tp,
    sharded_run,
    tp_last_axis_rule,
)

__all__ = [
    "chain_mesh",
    "shard_chains",
    "replicated",
    "data_parallel_grad",
    "shard_params_tp",
    "sharded_run",
    "tp_last_axis_rule",
]
