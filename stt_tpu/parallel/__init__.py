from stt_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
)

__all__ = ["make_mesh", "batch_sharding", "param_sharding", "replicated"]
