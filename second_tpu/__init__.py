"""second_tpu — a TPU-native LiDAR 3D detection framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the SECOND /
PointPillars reference framework (traveller59/second.pytorch): voxel-based
3D object detection on KITTI and NuScenes with protobuf-text configs, GT
database augmentation, one-cycle training, official AP evaluation, and
SPMD scaling over TPU device meshes.

Layout:
  configs/   text-proto config parser + typed schema + bundled configs
  core/      framework-free host ops (numpy): boxes, geometry, targets, aug
  ops/       jitted JAX + Pallas device ops: voxelize, iou, nms, sparse conv
  models/    flax model zoo: VFE/PFN, middle extractors, RPN, VoxelNet
  data/      dataset registry, KITTI/NuScenes IO, preprocessing pipeline
  train/     optimizer/schedules/checkpoint and the train/eval loops
  parallel/  mesh + sharding helpers (data-parallel pjit over ICI)
  utils/     eval (KITTI AP / NuScenes), logging, timers, config tools
  native/    C++ host kernels (voxelizer, NMS, eval stats) with numpy fallbacks
"""

__version__ = "0.1.0"
