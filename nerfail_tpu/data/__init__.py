from nerfail_tpu.data.blender import load_blender_data
from nerfail_tpu.data.poses import pose_spherical, render_spiral_poses

__all__ = ["load_blender_data", "pose_spherical", "render_spiral_poses"]
