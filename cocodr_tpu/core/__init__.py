from cocodr_tpu.core.mesh import (  # noqa: F401
    MeshConfig,
    create_mesh,
    data_sharding,
    replicated,
)
from cocodr_tpu.core.precision import Precision  # noqa: F401
