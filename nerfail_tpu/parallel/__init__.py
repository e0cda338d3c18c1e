from nerfail_tpu.parallel.mesh import make_mesh, mesh_shape_for
from nerfail_tpu.parallel.shard import (
    nerf_param_pspec,
    shard_nerf_params,
    shard_batch,
    replicate,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "nerf_param_pspec",
    "shard_nerf_params",
    "shard_batch",
    "replicate",
]
