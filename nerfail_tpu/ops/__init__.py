"""Pure-function NeRF math ops — the `core/` layer of SURVEY.md §7.

Every op here is a stateless jnp function with static shapes, jit/vmap/grad
safe, and has an optional Pallas-fused fast path under `ops.pallas`.
"""

from nerfail_tpu.ops.encoding import positional_encoding, encoder_output_dim
from nerfail_tpu.ops.rays import get_rays, get_rays_np, ndc_rays
from nerfail_tpu.ops.sampling import stratified_z_vals, sample_pdf
from nerfail_tpu.ops.volume import raw2outputs, exclusive_cumprod

__all__ = [
    "positional_encoding",
    "encoder_output_dim",
    "get_rays",
    "get_rays_np",
    "ndc_rays",
    "stratified_z_vals",
    "sample_pdf",
    "raw2outputs",
    "exclusive_cumprod",
]
