"""Variational inference objectives and gradient estimators.

Parity: reference ``zhusuan/variational/__init__.py``.
"""

from zhusuan_tpu.variational.base import VariationalObjective
from zhusuan_tpu.variational.exclusive_kl import (
    EvidenceLowerBoundObjective,
    elbo,
)
from zhusuan_tpu.variational.monte_carlo import (
    ImportanceWeightedObjective,
    importance_weighted_objective,
    iw_objective,
)
from zhusuan_tpu.variational.inclusive_kl import InclusiveKLObjective, klpq
from zhusuan_tpu.variational.renyi import (
    ChiSquareObjective,
    RenyiDivergenceObjective,
    cubo_objective,
    vr_objective,
)
from zhusuan_tpu.variational.autoguide import FullRankGuide, MeanFieldGuide
from zhusuan_tpu.variational.advi import advi, ADVIResult
from zhusuan_tpu.variational.svgd import SVGD, SVGDInfo, SVGDState
from zhusuan_tpu.variational.laplace import (
    LaplaceResult,
    laplace_approximation,
)
from zhusuan_tpu.variational.pathfinder import (
    MultiPathfinderResult,
    PathfinderResult,
    multipath_pathfinder,
    pathfinder,
    pathfinder_mcmc_init,
)

__all__ = [
    "SVGD",
    "SVGDState",
    "SVGDInfo",
    "laplace_approximation",
    "LaplaceResult",
    "VariationalObjective",
    "EvidenceLowerBoundObjective",
    "elbo",
    "ImportanceWeightedObjective",
    "importance_weighted_objective",
    "iw_objective",
    "InclusiveKLObjective",
    "klpq",
    "RenyiDivergenceObjective",
    "vr_objective",
    "ChiSquareObjective",
    "cubo_objective",
    "MeanFieldGuide",
    "advi",
    "ADVIResult",
    "FullRankGuide",
    "pathfinder",
    "PathfinderResult",
    "multipath_pathfinder",
    "MultiPathfinderResult",
    "pathfinder_mcmc_init",
]
