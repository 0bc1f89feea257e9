"""Train / evaluate entry points (the reference's
second/pytorch/train.py CLI surface, TPU-native internals).

    python -m second_tpu.train train --config_path=X --model_dir=Y
    python -m second_tpu.train evaluate --config_path=X --model_dir=Y

The train loop is ONE jitted SPMD program per step: batch sharded over
the device mesh's ``data`` axis, parameters replicated, XLA all-reduce
for gradients (vs the reference's DataParallel scatter/gather,
train.py:203-306).  Checkpoints keep the upstream JSON-manifest layout;
the config is snapshotted into model_dir as pipeline.config.
"""

import json
import pickle
import shutil
import time
from pathlib import Path

import numpy as np

from ..builders import build_network, dataset_builder
from ..configs import load_pipeline_config
from ..data.loader import DataLoader
from . import checkpoint as ckpt_lib
from . import optimizer as opt_builder
from ..utils.log_tool import SimpleModelLog
from .state import TrainState, make_eval_step, make_train_step


def example_convert(example, dtype=np.float32):
    """Select + cast the device-bound keys of a host batch."""
    device_keys = {
        "voxels": dtype,
        "num_points": np.int32,
        "coordinates": np.int32,
        "points": dtype,
        "points_q": np.int16,
        "points_count": np.int32,
        "labels_i8": np.int8,
        "pos_idx": np.int32,
        "pos_targets": np.float32,
        "pos_count": np.int32,
        "anchors": dtype,
        "labels": np.int32,
        "reg_targets": dtype,
        "importance": dtype,
        "anchors_mask": bool,
    }
    out = {}
    for k, t in device_keys.items():
        if k in example:
            out[k] = np.ascontiguousarray(example[k], dtype=t)
    for k, v in example.items():
        if k.startswith("plan_"):  # host-built sparse-conv rulebooks
            # keep the planner's dtype (uint16 slots halve the upload)
            out[k] = np.ascontiguousarray(v)
    if "sparse_active_counts" in example:
        out["sparse_active_counts"] = np.ascontiguousarray(
            example["sparse_active_counts"], dtype=np.int32)
    return out


def _build_all(config_path, training_loader=True, use_banded=False):
    cfg = load_pipeline_config(config_path)
    parts = build_network(cfg, use_banded=use_banded)
    return cfg, parts


def _auto_banded(cfg):
    """Banded MXU-gather inference kernels: on for sparse middles on a
    real TPU backend (the Pallas interpret fallback is for tests)."""
    import jax

    from ..models.sparse_middle import SPARSE_MIDDLE_NAMES

    mid = cfg.model.second.middle_feature_extractor.module_class_name
    return jax.default_backend() == "tpu" and mid in SPARSE_MIDDLE_NAMES


def _restore_or_init(model_dir, net, tx, example, resume,
                     voxel_shapes=None):
    import jax

    if "voxels" in example:
        vx, npts, crd = (example["voxels"], example["num_points"],
                         example["coordinates"])
    else:  # device-voxelize examples ship points; init from shapes
        b = example.get("points", example.get("points_q")).shape[0]
        v, t, f = voxel_shapes
        vx = np.zeros((b, v, t, f), np.float32)
        npts = np.zeros((b, v), np.int32)
        crd = np.full((b, v, 3), -1, np.int32)
    variables = net.init(jax.random.PRNGKey(0), vx, npts, crd)
    state = TrainState.create(variables, tx)
    restored, step = ckpt_lib.try_restore_latest(model_dir, "voxelnet", state)
    if step is not None:
        print(f"Restored checkpoint at step {step}")
        return restored
    if not resume:
        return state
    return state


def train(config_path,
          model_dir,
          result_path=None,
          resume=False,
          display_step=50,
          pretrained_path=None,
          pretrained_include=None,
          pretrained_exclude=None,
          freeze_include=None,
          freeze_exclude=None,
          measure_time=False,
          profile_steps=0,
          batch_size=None,
          num_workers=None,
          loader_mode="auto",
          device_voxelize="auto",
          quantize_points=True,
          use_banded="auto"):
    """Train a detector with the given pipeline config.

    use_banded: "auto" (default) trains sparse middles through the
    banded MXU-gather kernels on TPU (ops.banded_sparse —
    differentiable via custom VJP; loader workers emit the banded
    window metadata and the strided-conv transpose plans next to the
    rulebooks). False forces the XLA gather path (exact-parity
    reference numerics).

    device_voxelize: "auto" (default) ships the augmented POINTS and
    voxelizes inside the jitted step for models without a sparse host
    planner (PointPillars family) — the padded [V, T, F] voxel buffer
    is ~100x the points' bytes and dominates H2D otherwise. Set False
    to always ship host-built voxels.

    quantize_points: with device_voxelize, int16-quantize the shipped
    train points (~1 mm max coordinate error, 50x below the smallest
    voxel size; see data/point_quant.py). Eval always ships f32.

    profile_steps: if > 0, capture a jax.profiler trace of that many
    steps (starting at step 2, after compilation) into
    model_dir/profile — the TPU-native twin of the reference's
    --measure_time named-region timers (voxelnet.py:191-228).

    loader_mode: "process" (default via "auto"): forked worker pool —
    the train-time prep (DB-sample + per-object noise + target assign)
    is Python-heavy and GIL-bound, so threads cannot feed the chip;
    mirrors the reference's DataLoader worker processes
    (train.py:262-270). "thread" for fork-hostile environments.
    """
    import jax
    import jax.numpy as jnp

    from ..parallel import make_mesh, put_sharded

    model_dir = Path(model_dir)
    if model_dir.exists() and not resume and (
            model_dir / "checkpoints.json").exists():
        raise ValueError(
            f"model dir {model_dir} exists and resume=False")
    model_dir.mkdir(parents=True, exist_ok=True)
    if result_path is None:
        result_path = model_dir / "results"

    if use_banded == "auto":
        use_banded = _auto_banded(load_pipeline_config(config_path))
    cfg, parts = _build_all(config_path, use_banded=use_banded)
    shutil.copyfile(config_path, model_dir / "pipeline.config")
    net, spec = parts["net"], parts["spec"]
    train_cfg = cfg.train_config

    if device_voxelize == "auto":
        from ..models.sparse_middle import SPARSE_MIDDLE_NAMES
        device_voxelize = (
            parts["model_cfg"].middle_feature_extractor.module_class_name
            not in SPARSE_MIDDLE_NAMES)
    dataset = dataset_builder.build(
        cfg.train_input_reader, parts["model_cfg"], training=True,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"],
        device_voxelize=device_voxelize,
        quantize_points=device_voxelize and quantize_points,
        banded_plans=use_banded, banded_bwd=use_banded)
    eval_dataset = dataset_builder.build(
        cfg.eval_input_reader, parts["model_cfg"], training=False,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"],
        device_voxelize=device_voxelize,
        banded_plans=use_banded)
    voxelizer_fn = None
    flat_pp = None
    if device_voxelize:
        from .state import make_voxelizer_fn
        voxelizer_fn = make_voxelizer_fn(
            parts["voxel_generator"],
            cfg.train_input_reader.preprocess.max_number_of_voxels)
        vfe_name = (
            parts["model_cfg"].voxel_feature_extractor.module_class_name)
        if vfe_name.startswith("PillarFeatureNet"):
            # eval via the flat pillar path (models/pp_fast.py)
            flat_pp = dict(
                gen=parts["voxel_generator"],
                model_cfg=parts["model_cfg"],
                max_voxels=(
                    cfg.eval_input_reader.preprocess.max_number_of_voxels))

    batch_size = batch_size or cfg.train_input_reader.batch_size
    num_workers = (
        num_workers
        if num_workers is not None
        else cfg.train_input_reader.preprocess.num_workers)
    devices = jax.devices()
    n_dev = len(devices)
    if batch_size % n_dev != 0:
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        print(f"adjusted batch_size to {batch_size} for {n_dev} devices")
    mesh = make_mesh(devices)

    total_step = train_cfg.steps
    tx, lr_fn, _ = opt_builder.build(train_cfg.optimizer, total_step)
    if loader_mode == "auto":
        loader_mode = "process" if num_workers and num_workers > 0 else "thread"
    loader = DataLoader(
        dataset, batch_size, shuffle=True, num_workers=num_workers,
        mode=loader_mode)

    log = SimpleModelLog(model_dir).open()
    log.log_text(
        f"second_tpu train: {len(dataset)} frames, batch={batch_size}, "
        f"devices={n_dev}, steps={total_step}", 0)

    first_batch = example_convert(next(iter(loader)))
    voxel_shapes = (
        cfg.train_input_reader.preprocess.max_number_of_voxels,
        parts["voxel_generator"].max_num_points_per_voxel,
        parts["model_cfg"].num_point_features)
    state = _restore_or_init(model_dir, net, tx, first_batch, resume,
                             voxel_shapes=voxel_shapes)
    if pretrained_path is not None:
        new_params = ckpt_lib.restore_pretrained(
            pretrained_path, state.params,
            include=pretrained_include, exclude=pretrained_exclude)
        state = state.replace(params=new_params)
    if freeze_include is not None or freeze_exclude is not None:
        from .optimizer import freeze_by_patterns

        tx = freeze_by_patterns(
            tx, state.params, include=freeze_include, exclude=freeze_exclude)
        state = state.replace(opt_state=tx.init(state.params))
    step_fn = make_train_step(net, spec, tx, mesh=mesh,
                              voxelizer=voxelizer_fn)

    from ..utils.metrics import RunningMetrics
    from ..utils.timer import ModelTimer

    timer = ModelTimer(enabled=measure_time)
    running = RunningMetrics()
    steps_per_epoch = max(len(loader), 1)
    start_step = int(state.global_step)
    step = start_step
    last_ckpt_time = time.time()
    t_step = time.time()
    try:
        def _timed(iterable):
            it = iter(iterable)
            while True:
                timer.start("data_fetch")
                try:
                    nxt = next(it)
                except StopIteration:
                    return
                timer.end("data_fetch")
                yield nxt

        from ..data.prefetch import DevicePrefetcher

        # anchors are the run-constant anchor cache replicated per
        # example — upload ONCE and splice the resident array into
        # every batch instead of re-shipping ~4 MB/step
        anchors_dev = put_sharded(
            {"anchors": jnp.asarray(first_batch["anchors"])},
            mesh)["anchors"]

        def _prep(example):
            host = example_convert(example)
            host.pop("anchors", None)
            if "importance" in host and np.all(host["importance"] == 1.0):
                host.pop("importance")  # compute_loss defaults to ones
            dev = put_sharded(
                {k: jnp.asarray(v) for k, v in host.items()}, mesh)
            dev["anchors"] = anchors_dev
            return dev

        while step < total_step:
            # convert + H2D of the next batches overlaps the device step
            for ex in _timed(DevicePrefetcher(loader, _prep)):
                if step >= total_step:
                    break
                if profile_steps > 0 and step == start_step + 1:
                    jax.profiler.start_trace(str(model_dir / "profile"))
                timer.start("train_step")
                state, metrics = step_fn(state, ex)
                # loss transfer below is the honest device sync
                timer.end("train_step", sync_value=metrics["loss"])
                step += 1
                if profile_steps > 0 and \
                        step == start_step + 1 + profile_steps:
                    jax.profiler.stop_trace()
                    log.log_text(
                        f"profiler trace written to {model_dir}/profile",
                        step)
                cls_stats = metrics.pop("cls_stats", None)
                if cls_stats is not None:
                    running.update(
                        {k: np.asarray(v) for k, v in cls_stats.items()})
                if step % display_step == 0 or step == 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(running.value())
                    m["lr"] = float(lr_fn(step))
                    sac = ex.get("sparse_active_counts")
                    if sac is not None:
                        # [B, S, 2] (true_active, capacity) per stage:
                        # >1.0 means voxels were DROPPED (raise
                        # capacity_factors on the middle class)
                        sac = np.asarray(sac)
                        util = sac[..., 0] / np.maximum(sac[..., 1], 1)
                        m["sparse_util_max"] = float(util.max())
                        if util.max() > 1.0:
                            log.log_text(
                                f"WARNING sparse active-set OVERFLOW: "
                                f"per-stage utilization "
                                f"{util.max(axis=0).round(3).tolist()} — "
                                f"voxels dropped; raise capacity_factors",
                                step)
                    m["steps_per_sec"] = display_step / max(
                        time.time() - t_step, 1e-6)
                    t_step = time.time()
                    log.log_metrics({"runtime": m}, step)
                    if measure_time:
                        avg = timer.get_avg_time_dict()
                        log.log_text(
                            "avg_time_ms: " + ", ".join(
                                f"{k}={v * 1000:.2f}"
                                for k, v in avg.items()), step)
                        timer.clear()
                if train_cfg.clear_metrics_every_epoch and \
                        step % steps_per_epoch == 0:
                    running.clear()
                if time.time() - last_ckpt_time > train_cfg.save_checkpoints_secs:
                    ckpt_lib.save(model_dir, state, "voxelnet", step)
                    last_ckpt_time = time.time()
                if train_cfg.steps_per_eval > 0 and \
                        step % train_cfg.steps_per_eval == 0:
                    ckpt_lib.save(model_dir, state, "voxelnet", step)
                    res = _run_eval(
                        net, spec, state, eval_dataset, batch_size,
                        num_workers, mesh, Path(result_path) / f"step_{step}",
                        voxelizer=voxelizer_fn, flat_pp=flat_pp)
                    if res is not None:
                        for name, text in res["results"].items():
                            log.log_text(f"Evaluation {name}", step)
                            log.log_text(text, step)
    except Exception:
        ckpt_lib.save(model_dir, state, "voxelnet", step)
        raise
    ckpt_lib.save(model_dir, state, "voxelnet", step)
    res = _run_eval(net, spec, state, eval_dataset, batch_size, num_workers,
                    mesh, Path(result_path) / "final",
                    voxelizer=voxelizer_fn, flat_pp=flat_pp)
    if res is not None:
        for name, text in res["results"].items():
            log.log_text(f"Evaluation {name}", step)
            log.log_text(text, step)
    log.close()
    return str(model_dir)


def _run_eval(net, spec, state, eval_dataset, batch_size, num_workers, mesh,
              result_dir, timer=None, voxelizer=None, flat_pp=None):
    """Eval loop: fixed-shape batches, ragged detections, official AP."""
    import jax.numpy as jnp

    from ..parallel import put_sharded
    from ..utils.timer import ModelTimer

    timer = timer or ModelTimer(enabled=False)
    # use_moving_average: evaluate with the parameter EMA when the
    # optimizer tracks one (reference train.py:433-481 restores the
    # moving-average variables for eval)
    from .optimizer import ema_params

    ema = ema_params(state.opt_state)
    if ema is not None:
        state = state.replace(params=ema)
    eval_step = make_eval_step(net, spec, mesh=mesh, voxelizer=voxelizer,
                               flat_pp=flat_pp)
    loader = DataLoader(
        eval_dataset, batch_size, shuffle=False,
        num_workers=num_workers, drop_last=False)
    detections = []
    t0 = time.time()

    def _drain(pending):
        """Device->host transfer of a finished batch (the honest sync)."""
        dets_dev, real, metadata = pending
        dets = {k: np.asarray(v) for k, v in dets_dev.items()}
        for b in range(real):
            valid = dets["valid"][b]
            detections.append({
                "box3d_lidar": dets["box3d_lidar"][b][valid],
                "scores": dets["scores"][b][valid],
                "label_preds": dets["label_preds"][b][valid],
                "metadata": metadata[b],
            })

    # double-buffered: batch N's async dispatch runs on device while
    # batch N-1's detections transfer to host
    pending = None
    for example in loader:
        with timer.scope("host_prep"):
            ex_np = example_convert(example)
            real = next(iter(ex_np.values())).shape[0]
            if real < batch_size:  # pad the tail batch
                pad = batch_size - real
                ex_np = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                    for k, v in ex_np.items()
                }
            ex = put_sharded(
                {k: jnp.asarray(v) for k, v in ex_np.items()}, mesh)
        with timer.scope("eval_step"):
            dets_dev = eval_step(state, ex)  # async dispatch
            if pending is not None:
                _drain(pending)
            pending = (dets_dev, real, example["metadata"])
    if pending is not None:
        with timer.scope("eval_step"):
            _drain(pending)
    dt = time.time() - t0
    n = len(detections)
    print(f"eval: {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps)")
    result_dir = Path(result_dir)
    result_dir.mkdir(parents=True, exist_ok=True)
    with open(result_dir / "result.pkl", "wb") as f:
        pickle.dump(detections, f)
    res = eval_dataset.evaluation(detections, str(result_dir))
    return res


def evaluate(config_path,
             model_dir,
             result_path=None,
             ckpt_path=None,
             measure_time=False,
             batch_size=None,
             num_workers=None,
             use_banded="auto"):
    """Evaluate the latest (or given) checkpoint with the official AP.

    use_banded: "auto" enables the banded MXU-gather sparse-conv
    kernels (ops.banded_sparse) for sparse middles on TPU; loader
    workers then also emit the banded plans."""
    import jax

    from ..parallel import make_mesh

    model_dir = Path(model_dir)
    if use_banded == "auto":
        use_banded = _auto_banded(load_pipeline_config(config_path))
    cfg, parts = _build_all(config_path, use_banded=use_banded)
    net, spec = parts["net"], parts["spec"]
    from ..models.sparse_middle import SPARSE_MIDDLE_NAMES

    vfe_name = parts["model_cfg"].voxel_feature_extractor.module_class_name
    mid_name = (
        parts["model_cfg"].middle_feature_extractor.module_class_name)
    device_voxelize = (mid_name not in SPARSE_MIDDLE_NAMES
                       and vfe_name.startswith("PillarFeatureNet"))
    eval_dataset = dataset_builder.build(
        cfg.eval_input_reader, parts["model_cfg"], training=False,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"],
        banded_plans=use_banded,
        device_voxelize=device_voxelize)
    voxelizer_fn = None
    flat_pp = None
    if device_voxelize:
        from .state import make_voxelizer_fn

        max_v = cfg.eval_input_reader.preprocess.max_number_of_voxels
        voxelizer_fn = make_voxelizer_fn(parts["voxel_generator"], max_v)
        flat_pp = dict(gen=parts["voxel_generator"],
                       model_cfg=parts["model_cfg"], max_voxels=max_v)
    batch_size = batch_size or cfg.eval_input_reader.batch_size
    num_workers = (
        num_workers
        if num_workers is not None
        else cfg.eval_input_reader.preprocess.num_workers)
    devices = jax.devices()
    if batch_size % len(devices) != 0:
        batch_size = max(len(devices), batch_size - batch_size % len(devices))
    mesh = make_mesh(devices)

    tx, _, _ = opt_builder.build(
        cfg.train_config.optimizer, cfg.train_config.steps)
    if device_voxelize:
        vv = cfg.eval_input_reader.preprocess.max_number_of_voxels
        tt = parts["voxel_generator"].max_num_points_per_voxel
        ff = parts["model_cfg"].num_point_features
        variables = net.init(
            jax.random.PRNGKey(0),
            np.zeros((1, vv, tt, ff), np.float32),
            np.zeros((1, vv), np.int32),
            np.full((1, vv, 3), -1, np.int32))
    else:
        example = example_convert(eval_dataset[0])
        example = {k: v[None] for k, v in example.items()}
        variables = net.init(
            jax.random.PRNGKey(0), example["voxels"],
            example["num_points"], example["coordinates"])
    state = TrainState.create(variables, tx)
    if ckpt_path is not None:
        state = ckpt_lib.restore(ckpt_path, state)
        step = "custom"
    else:
        state, step = ckpt_lib.try_restore_latest(
            model_dir, "voxelnet", state)
        if step is None:
            raise ValueError(f"no checkpoint found in {model_dir}")
    if result_path is None:
        result_path = model_dir / "eval_results" / f"step_{step}"
    from ..utils.timer import ModelTimer

    timer = ModelTimer(enabled=measure_time)
    res = _run_eval(net, spec, state, eval_dataset, batch_size, num_workers,
                    mesh, result_path, timer=timer,
                    voxelizer=voxelizer_fn, flat_pp=flat_pp)
    if measure_time:
        print("avg_time_ms:", {
            k: round(v * 1000, 2)
            for k, v in timer.get_avg_time_dict().items()})
    if res is not None:
        for name, text in res["results"].items():
            print(f"Evaluation {name}")
            print(text)
        with open(Path(result_path) / "metrics.json", "w") as f:
            json.dump(res["detail"], f, indent=2, default=str)
    return res


def helper_tune_target_assigner(config_path, num_tune_epoch=1,
                                classes=None):
    """Run the train pipeline standalone and report anchor-assignment
    statistics per class (reference train.py:547-640)."""
    cfg, parts = _build_all(config_path)
    target_assigner = parts["target_assigner"]
    dataset = dataset_builder.build(
        cfg.train_input_reader, parts["model_cfg"], training=True,
        voxel_generator=parts["voxel_generator"],
        target_assigner=target_assigner,
        anchor_cache=parts["anchor_cache"])
    class_count = {c: 0 for c in target_assigner.classes}
    anchor_count = {c: 0 for c in target_assigner.classes}
    n = len(dataset) * num_tune_epoch
    for i in range(n):
        example = dataset[i % len(dataset)]
        labels = example["labels"]
        for ci, c in enumerate(target_assigner.classes):
            class_count[c] += int(
                np.sum(np.array(example["gt_names"]) == c))
            anchor_count[c] += int(np.sum(labels == ci + 1))
    for c in target_assigner.classes:
        avg = anchor_count[c] / max(class_count[c], 1)
        print(f"{c}: {class_count[c]} gt, {anchor_count[c]} assigned "
              f"anchors ({avg:.1f} per gt)")
    return class_count, anchor_count


def main():
    import os

    from ..utils.fire_lite import fire

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an
    # explicit cpu request so CPU runs are possible (other values, e.g.
    # the environment-provided "axon", are plugin names jax.config
    # does not accept — leave those to the plugin)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat == "cpu":
        import jax

        jax.config.update("jax_platforms", plat)
    fire({
        "train": train,
        "evaluate": evaluate,
        "helper_tune_target_assigner": helper_tune_target_assigner,
    })


if __name__ == "__main__":
    main()
