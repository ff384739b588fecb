"""Device mesh construction, data-parallel step builders, multi-host."""

from forest_tpu.parallel.mesh import make_mesh, batch_sharding  # noqa: F401
from forest_tpu.parallel.dp import (make_dp_train_step,  # noqa: F401
                                    make_dp_frl_step)
from forest_tpu.parallel import hosts  # noqa: F401
