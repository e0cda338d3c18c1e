"""nerfail_tpu — TPU-native NeRF multiview adversarial-attack framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jiang-wenxiang/NeRFail (AAAI 2024): NeRF training + volume rendering,
pixel→3D spatial-point-set extraction, 8-NN Gaussian splat machinery,
and the NeRFail / NeRFail-S / UAP-2D / IGSM-2D attack engines, plus the
classifier train/test harness — all built TPU-first (static shapes, fused
kernels, `jax.sharding` meshes) rather than translated from the PyTorch
reference.

Layer map (mirrors SURVEY.md §7):
  ops/        pure-function NeRF math + Pallas kernels
  models/     NeRF MLP and the classifier zoo (flax)
  parallel/   device mesh + sharding specs
  data/       scene loaders (blender/llff), pose utilities, datasets
  train/      NeRF + classifier trainers, checkpointing
  pointset/   pts_max extraction, streaming 8-NN, Gaussian weights
  attacks/    differentiable splat forward + the four attack engines
  eval/       ASR / perturbation-budget metrics harness
"""

__version__ = "0.1.0"
