"""MCMC samplers: HMC and the SGMCMC family.

Parity: reference ``zhusuan/hmc.py`` and ``zhusuan/sgmcmc.py``.
"""

from zhusuan_tpu.mcmc.hmc import HMC, HMCInfo, HMCState
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
    "SGMCMC",
    "SGMCMCInfo",
    "SGMCMCState",
    "SGLD",
    "PSGLD",
    "SGHMC",
    "SGNHT",
]
