"""MCMC samplers: HMC, the SGMCMC family, and adaptive-trajectory ChEES.

Parity: reference ``zhusuan/hmc.py`` and ``zhusuan/sgmcmc.py``;
:class:`ChEESHMC` is a beyond-reference feature (cross-chain adaptive
trajectory lengths — the vectorized/TPU-idiomatic alternative to NUTS).
"""

from zhusuan_tpu.mcmc.chees import ChEESHMC, ChEESInfo, ChEESState
from zhusuan_tpu.mcmc.hmc import HMC, HMCInfo, HMCState
from zhusuan_tpu.mcmc.nuts import NUTS, NUTSInfo
from zhusuan_tpu.mcmc.precondition import (
    fit_dense_preconditioner,
    whiten_log_joint,
)
from zhusuan_tpu.mcmc.neutra import (
    NeuTraResult,
    fit_neutra,
    neutra_log_joint,
)
from zhusuan_tpu.mcmc.elliptical import (
    EllipticalSlice,
    EllipticalSliceInfo,
    EllipticalSliceState,
)
from zhusuan_tpu.mcmc.remc import REMCInfo, REMCState, ReplicaExchangeHMC
from zhusuan_tpu.mcmc.discrete import (
    DiscreteGibbs,
    DiscreteGibbsInfo,
    DiscreteGibbsState,
)
from zhusuan_tpu.mcmc.gibbs import Gibbs, GibbsInfo, GibbsState
from zhusuan_tpu.mcmc.rwm import MALA, MHInfo, MHState, RandomWalkMetropolis
from zhusuan_tpu.mcmc.slice_sampler import (
    SliceInfo,
    SliceSampler,
    SliceState,
)
from zhusuan_tpu.mcmc.sgmcmc import (
    SGMCMC,
    SGMCMCInfo,
    SGMCMCState,
    SGLD,
    PSGLD,
    SGHMC,
    SGNHT,
)

__all__ = [
    "HMC",
    "HMCInfo",
    "HMCState",
    "NUTS",
    "NUTSInfo",
    "ChEESHMC",
    "ChEESInfo",
    "ChEESState",
    "SGMCMC",
    "SGMCMCInfo",
    "SGMCMCState",
    "SGLD",
    "PSGLD",
    "SGHMC",
    "SGNHT",
    "fit_dense_preconditioner",
    "whiten_log_joint",
    "fit_neutra",
    "neutra_log_joint",
    "NeuTraResult",
    "ReplicaExchangeHMC",
    "REMCState",
    "REMCInfo",
    "RandomWalkMetropolis",
    "MALA",
    "MHState",
    "MHInfo",
    "EllipticalSlice",
    "EllipticalSliceState",
    "EllipticalSliceInfo",
    "SliceSampler",
    "SliceState",
    "SliceInfo",
    "Gibbs",
    "GibbsState",
    "GibbsInfo",
    "DiscreteGibbs",
    "DiscreteGibbsState",
    "DiscreteGibbsInfo",
]
