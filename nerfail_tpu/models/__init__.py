from nerfail_tpu.models.nerf import (
    init_nerf_params,
    apply_nerf,
    nerf_param_count,
)

__all__ = ["init_nerf_params", "apply_nerf", "nerf_param_count"]
