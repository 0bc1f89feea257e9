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


def enable_compilation_cache():
    """Persistent XLA compilation cache: TPU compiles through a remote
    tunnel cost 1-10 min per program, so every entry point (CLI, bench,
    tests, tools) shares one on-disk cache.  Library-consumer safe: a
    no-op when the user already configured a cache (env var or
    jax.config) or set SECOND_TPU_NO_JAX_CACHE=1, and it never touches
    a config key the user has already set away from its default."""
    import os

    if os.environ.get("SECOND_TPU_NO_JAX_CACHE"):
        return
    try:
        import jax

        if (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or jax.config.jax_compilation_cache_dir):
            return  # user-configured: leave their settings alone
        path = os.path.expanduser("~/.cache/second_tpu_jax")
        jax.config.update("jax_compilation_cache_dir", path)
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            cur = jax.config.jax_persistent_cache_min_compile_time_secs
            if cur == 1.0:  # jax default: only override untouched values
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


enable_compilation_cache()
