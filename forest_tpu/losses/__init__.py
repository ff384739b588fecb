"""Pure-function losses (jit-safe, mask-based static shapes).

Ports the behavioral contracts of /root/reference/frl/losses/* (SURVEY.md §2.5)
to JAX: every loss takes explicit validity masks instead of dynamic filtering,
so shapes stay static under jit.
"""

from forest_tpu.losses.reconstruction import reconstruction_loss  # noqa: F401
from forest_tpu.losses.categorical import categorical_loss  # noqa: F401
from forest_tpu.losses.count import count_loss  # noqa: F401
from forest_tpu.losses.variance_covariance import variance_covariance_loss  # noqa: F401
from forest_tpu.losses.contrastive import contrastive_loss  # noqa: F401
