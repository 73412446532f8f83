"""Device-mesh parallelism: mesh construction and named-sharding rules."""

from mgnns_tpu.parallel.mesh import create_mesh, batch_device_put
from mgnns_tpu.parallel.sharding import (
    mgnns_param_rules,
    text_model_param_rules,
    batch_spec,
    shard_pytree,
)

__all__ = [
    "create_mesh",
    "batch_device_put",
    "mgnns_param_rules",
    "text_model_param_rules",
    "batch_spec",
    "shard_pytree",
]
