"""ZhuSuan-TPU: a TPU-native probabilistic programming library in JAX.

A from-scratch rebuild of the capabilities of ZhuSuan (thu-ml/zhusuan), designed
TPU-first: pure-functional model tracing, explicit PRNG keys, `jit`/`vmap`/`scan`
everywhere, chains and particles as vectorized leading axes, and device-mesh
sharding (`jax.sharding` + `shard_map`) for multi-chip scaling.

Public API parity map (reference -> here):
  - zhusuan/distributions  -> zhusuan_tpu.distributions
  - zhusuan/framework      -> zhusuan_tpu.framework (BayesianNet, MetaBayesianNet)
  - zhusuan/variational    -> zhusuan_tpu.variational (elbo, iw_objective, klpq)
  - zhusuan/hmc.py         -> zhusuan_tpu.mcmc.hmc (HMC)
  - zhusuan/sgmcmc.py      -> zhusuan_tpu.mcmc.sgmcmc (SGLD, PSGLD, SGHMC, SGNHT)
  - zhusuan/transform.py   -> zhusuan_tpu.transform (planar NF, IAF)
  - zhusuan/evaluation.py  -> zhusuan_tpu.evaluation (is_loglikelihood, AIS)
  - zhusuan/diagnostics.py -> zhusuan_tpu.diagnostics (effective_sample_size)
  - zhusuan/utils.py       -> zhusuan_tpu.utils (log_mean_exp, merge_dicts, ...)
"""

__version__ = "0.1.0"

from zhusuan_tpu import distributions
from zhusuan_tpu import framework
from zhusuan_tpu.framework import *  # noqa: F401,F403
from zhusuan_tpu import variational
from zhusuan_tpu import mcmc
from zhusuan_tpu.mcmc import *  # noqa: F401,F403
from zhusuan_tpu import transform
from zhusuan_tpu.transform import *  # noqa: F401,F403
from zhusuan_tpu import evaluation
from zhusuan_tpu.evaluation import *  # noqa: F401,F403
from zhusuan_tpu import smc
from zhusuan_tpu.smc import *  # noqa: F401,F403
from zhusuan_tpu import ssm
from zhusuan_tpu.ssm import *  # noqa: F401,F403
from zhusuan_tpu import gp  # namespaced only: kernel names (RBF, Linear,
#                             ...) would shadow nothing but read better
#                             as zs.gp.RBF
from zhusuan_tpu import bijectors
from zhusuan_tpu.bijectors import transform_log_joint  # noqa: F401
from zhusuan_tpu import diagnostics
from zhusuan_tpu.diagnostics import *  # noqa: F401,F403
from zhusuan_tpu import testing
from zhusuan_tpu import utils
from zhusuan_tpu.utils import *  # noqa: F401,F403
from zhusuan_tpu import legacy
from zhusuan_tpu.legacy import *  # noqa: F401,F403  (flat re-export, parity
#                                   with reference zhusuan/__init__.py:10-13)
from zhusuan_tpu import parallel
from zhusuan_tpu import ops
from zhusuan_tpu import checkpoint
from zhusuan_tpu.checkpoint import save_checkpoint, restore_checkpoint
from zhusuan_tpu import profiling
from zhusuan_tpu.fit import fit_scan, make_fit_epoch
