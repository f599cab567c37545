"""Legacy import path for the special distributions.

Parity: reference ``zhusuan/legacy/distributions/special.py`` defined
``Empirical`` (special.py:19-93) and ``Implicit`` (special.py:96-171)
here; this rebuild hosts the implementations in
``zhusuan_tpu.distributions.special`` (they are useful beyond the legacy
layer — the GAN examples observe ``Empirical`` data nodes) and keeps this
module as the compatible import location.
"""

from zhusuan_tpu.distributions.special import Empirical, Implicit

__all__ = ["Empirical", "Implicit"]
