"""MCMC samplers: HMC and the SGMCMC family.

Parity: reference ``zhusuan/hmc.py`` and ``zhusuan/sgmcmc.py``.
"""

__all__ = []
