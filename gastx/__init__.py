"""gastx — TPU-native (JAX/XLA/Pallas/pjit) 2D→3D human-pose lifting framework.

A ground-up rebuild of the capabilities of GAST-Net
(fabro66/GAST-Net-3DPoseEstimation): graph-attention spatio-temporal lifting of
2D keypoint sequences to root-relative 3D poses, with Human3.6M / HumanEva
train+eval protocols, PyTorch-checkpoint import for weight parity, sliding
window and causal streaming inference, and an in-the-wild video pipeline.

Subpackages:
  geometry   quaternions, camera model, screen-coordinate transforms
  skeleton   joint layouts, skeleton graph, adjacency builders
  models     the GastNet model family (functional JAX, channels-last)
  ops        TPU compute primitives (temporal conv, graph attention, batchnorm)
  data       datasets, chunk planner / batchers, keypoint-format converters
  train      training loop, optimizer, checkpointing
  eval       MPJPE / P-MPJPE protocols
  parallel   device mesh + sharding helpers
  io         PyTorch .bin checkpoint import
  infer      sliding-window / streaming lifting drivers
  pipeline   in-the-wild video pipeline (detector, tracker, 2D pose)
  viz        animation rendering
"""

__version__ = "0.1.0"
