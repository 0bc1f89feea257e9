import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.builders import build_network
from second_tpu.data.synthetic import assemble_example, make_scene
from second_tpu.train import optimizer as opt_builder
from second_tpu.train import schedules
from second_tpu.train.checkpoint import save, try_restore_latest
from second_tpu.train.state import TrainState, make_eval_step, make_train_step
from second_tpu.utils.config_tool import change_detection_range, read_config

XYRES16 = "/root/reference/second/configs/pointpillars/car/xyres_16.config"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(XYRES16), reason="reference configs absent"
)


@pytest.fixture(scope="module")
def setup():
    cfg = read_config(XYRES16)
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    parts = build_network(cfg.model.second)
    rng = np.random.RandomState(0)
    scenes = [
        make_scene(rng, num_objects=3, num_bg_points=2000,
                   x_range=(0, 20.4), y_range=(-10, 10))
        for _ in range(2)
    ]
    ex = assemble_example(parts, scenes, max_voxels=800)
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    return cfg, parts, ex


def test_schedules_one_cycle():
    lr_fn, mom_fn = schedules.one_cycle(1000, 3e-3, [0.95, 0.85], 10.0, 0.4)
    assert float(lr_fn(0)) == pytest.approx(3e-4, rel=1e-5)
    assert float(lr_fn(400)) == pytest.approx(3e-3, rel=1e-3)
    assert float(lr_fn(1000)) == pytest.approx(3e-4 / 1e4, rel=1e-2)
    assert float(mom_fn(0)) == pytest.approx(0.95)
    assert float(mom_fn(400)) == pytest.approx(0.85, rel=1e-3)
    assert float(mom_fn(1000)) == pytest.approx(0.95, rel=1e-3)


def test_schedules_exp_decay():
    lr_fn = schedules.exponential_decay(1000, 1e-3, 0.1, 0.8, True)
    assert float(lr_fn(0)) == pytest.approx(1e-3)
    assert float(lr_fn(150)) == pytest.approx(8e-4)
    assert float(lr_fn(950)) == pytest.approx(1e-3 * 0.8**9, rel=1e-5)


def test_schedules_multi_phase_vs_reference():
    """Value-level parity with the reference phase engine
    (torchplus/train/learning_schedules_fastai.py:7-56), run in place
    with a fake optimizer."""
    import sys

    from reference_torch import install_stubs

    install_stubs()
    sys.path.insert(0, "/root/reference")
    try:
        from torchplus.train.learning_schedules_fastai import LRSchedulerStep
    finally:
        sys.path.pop(0)

    total = 200
    lr_phases = [
        (0.0, "lambda x: 0.001 * (1 - 0.9 * x)"),
        (0.4, "lambda x: 0.0005 * cos(x * pi / 2)"),
        (0.8, "lambda x: 0.0001"),
    ]
    mom_phases = [
        (0.0, "lambda x: 0.95 - 0.1 * x"),
        (0.4, "lambda x: 0.85 + 0.1 * x"),
        (0.8, "lambda x: 0.95"),
    ]

    class FakeOpt:
        lr = 0.0
        mom = 0.0

    import math

    ref_env = {"cos": math.cos, "pi": math.pi}
    ref_phases = [(s, eval(f, ref_env)) for s, f in lr_phases]
    ref_mom = [(s, eval(f, ref_env)) for s, f in mom_phases]
    opt = FakeOpt()
    ref = LRSchedulerStep(opt, total, ref_phases, ref_mom)

    lr_fn, mom_fn = schedules.multi_phase(total, lr_phases, mom_phases)
    for step in [0, 1, 50, 79, 80, 81, 120, 159, 160, 199]:
        ref.step(step)
        assert float(lr_fn(step)) == pytest.approx(opt.lr, rel=1e-5), step
        assert float(mom_fn(step)) == pytest.approx(opt.mom, rel=1e-5), step


def test_multi_phase_lambda_rejects_unsafe():
    with pytest.raises(ValueError):
        schedules.parse_lambda("lambda x: __import__('os')")
    with pytest.raises(ValueError):
        schedules.parse_lambda("lambda x: open('/etc/passwd')")
    with pytest.raises(ValueError):
        schedules.parse_lambda("0.001")
    fn = schedules.parse_lambda("lambda x: annealing_cos(0.1, 0.01, x)")
    assert float(fn(0.0)) == pytest.approx(0.1)


def test_overfit_synthetic(setup):
    cfg, parts, ex = setup
    net, spec = parts["net"], parts["spec"]
    tx, lr_fn, _ = opt_builder.build(
        cfg.train_config.optimizer, total_step=100)
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])
    state = TrainState.create(variables, tx)
    step = make_train_step(net, spec, tx)
    losses = []
    for _ in range(25):
        state, metrics = step(state, ex)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses
    assert int(state.global_step) == 25
    del lr_fn


def test_moving_average_optimizer(setup):
    """use_moving_average tracks a parameter EMA in the optimizer state
    (the reference raises on this flag, optimizer_builder.py:92-93; we
    support it — ema_params() recovers the averaged weights)."""
    cfg, parts, ex = setup
    net, spec = parts["net"], parts["spec"]
    opt_cfg = cfg.train_config.optimizer
    assert not opt_cfg.use_moving_average  # config default
    opt_cfg.use_moving_average = True
    opt_cfg.moving_average_decay = 0.9
    try:
        tx, _, _ = opt_builder.build(opt_cfg, total_step=100)
        variables = net.init(
            jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
            ex["coordinates"])
        state = TrainState.create(variables, tx)
        # snapshot before stepping: the jitted step donates state buffers
        init_params = jax.tree_util.tree_map(np.asarray, state.params)
        step = make_train_step(net, spec, tx)
        for _ in range(5):
            state, _ = step(state, ex)
        ema = opt_builder.ema_params(state.opt_state)
        assert ema is not None
        # EMA lags the live params: it must sit strictly between the
        # initial and current value of any leaf that moved
        leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
        p0, p5, e5 = (np.asarray(leaf(t)).ravel()
                      for t in (init_params, state.params, ema))
        moved = np.abs(p5 - p0) > 1e-7
        assert moved.any()
        # EMA lags: most leaves sit between start and current value
        # (not all — adam trajectories oscillate, EMA can overshoot)
        between = (np.abs(e5 - p0) <= np.abs(p5 - p0) + 1e-7)
        assert between[moved].mean() > 0.9
        # decay 0.9 over 5 steps: ema-to-current distance ~0.9^5 of full
        ratio = np.abs(e5 - p5)[moved] / np.abs(p5 - p0)[moved]
        assert 0.3 < np.median(ratio) < 0.95
    finally:
        opt_cfg.use_moving_average = False


def test_eval_step_runs(setup):
    cfg, parts, ex = setup
    net, spec = parts["net"], parts["spec"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])
    state = TrainState.create(variables, tx)
    eval_step = make_eval_step(net, spec)
    dets = eval_step(state, ex)
    assert dets["box3d_lidar"].shape[0] == 2


def test_sharded_train_step_8dev(setup):
    from second_tpu.parallel import make_mesh, put_sharded

    cfg, parts, ex = setup
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    mesh = make_mesh()
    net, spec = parts["net"], parts["spec"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)
    # batch of 8: tile the batch-2 example
    ex8 = {k: jnp.concatenate([v] * 4, axis=0) for k, v in ex.items()}
    ex8 = put_sharded(ex8, mesh)
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])
    state = TrainState.create(variables, tx)
    step = make_train_step(net, spec, tx, mesh=mesh)
    state, metrics = step(state, ex8)
    assert np.isfinite(float(metrics["loss"]))
    # single-device step on the same batch must match (allreduce parity)
    state2 = TrainState.create(
        net.init(jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
                 ex["coordinates"]), tx)
    step1 = make_train_step(net, spec, tx)
    ex8_local = {k: jnp.concatenate([v] * 4, axis=0) for k, v in ex.items()}
    state2, metrics2 = step1(state2, ex8_local)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-5)
    # adam's update is sign-sensitive for near-zero grads, so cross-shard
    # reduction-order noise bounds parity at ~2*lr per step, not 1e-7
    lr0 = 2.25e-4  # one_cycle low_lr for this config
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2 * lr0)


def test_sharded_eval_parity_8dev(setup):
    """The 8-device sharded eval/predict program must produce the SAME
    detections as the single-device program on the same batch (decode +
    NMS are per-sample; dp sharding must not change them)."""
    from second_tpu.parallel import make_mesh, put_sharded

    cfg, parts, ex = setup
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    mesh = make_mesh()
    net, spec = parts["net"], parts["spec"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])
    state = TrainState.create(variables, tx)
    ex8_host = {k: np.asarray(jnp.concatenate([v] * 4, axis=0))
                for k, v in ex.items()}
    ex8 = put_sharded({k: jnp.asarray(v) for k, v in ex8_host.items()},
                      mesh)
    dets_m = jax.tree_util.tree_map(
        np.asarray, make_eval_step(net, spec, mesh=mesh)(state, ex8))
    dets_1 = jax.tree_util.tree_map(
        np.asarray, make_eval_step(net, spec)(state, ex8_host))
    for key in ("box3d_lidar", "scores", "label_preds"):
        np.testing.assert_allclose(
            np.asarray(dets_m[key], np.float32),
            np.asarray(dets_1[key], np.float32),
            rtol=1e-4, atol=1e-4, err_msg=key)


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, parts, ex = setup
    net = parts["net"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])
    state = TrainState.create(variables, tx)
    save(tmp_path, state, "voxelnet", 42)
    save(tmp_path, state, "voxelnet", 43)
    restored, step = try_restore_latest(tmp_path, "voxelnet", state)
    assert step == 43
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    # manifest format parity
    import json
    with open(tmp_path / "checkpoints.json") as f:
        info = json.load(f)
    assert info["latest_ckpt"]["voxelnet"] == "voxelnet-43.ckpt"
    assert info["all_ckpts"]["voxelnet"] == [
        "voxelnet-42.ckpt", "voxelnet-43.ckpt"]
    # missing name
    _, none_step = try_restore_latest(tmp_path, "other", state)
    assert none_step is None


def test_device_voxelize_train_step_matches_host(setup):
    """Training with device-side voxelization ("points" examples) must
    produce the same loss as the host-voxelized path: the device
    voxelizer is set-equivalent and PFN pooling is order-invariant, so
    with no per-voxel truncation the network inputs are identical."""
    from second_tpu.train.state import make_voxelizer_fn

    cfg, parts, _ = setup
    net, spec = parts["net"], parts["spec"]
    gen = parts["voxel_generator"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)

    # Rebuild the scenes and a NO-TRUNCATION example (the scenes make
    # ~2.1k pillars; a cap below that makes host FCFS and the device
    # voxelizer keep different subsets and the losses diverge).
    rng = np.random.RandomState(0)
    scenes = [
        make_scene(rng, num_objects=3, num_bg_points=2000,
                   x_range=(0, 20.4), y_range=(-10, 10))
        for _ in range(2)
    ]
    max_voxels = 4096
    ex = assemble_example(parts, scenes, max_voxels=max_voxels)
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])

    N = 8192
    pts = np.zeros((2, N, 4), np.float32)
    cnt = np.zeros((2, 1), np.int32)
    for i, (points, _, _) in enumerate(scenes):
        n = min(len(points), N)
        pts[i, :n] = points[:n]
        cnt[i, 0] = n
    ex_pts = {k: v for k, v in ex.items()
              if k not in ("voxels", "num_points", "coordinates")}
    ex_pts["points"] = jnp.asarray(pts)
    ex_pts["points_count"] = jnp.asarray(cnt)

    voxelizer = make_voxelizer_fn(gen, max_voxels=max_voxels)

    step_host = make_train_step(net, spec, tx)
    step_dev = make_train_step(net, spec, tx, voxelizer=voxelizer)
    # independent buffer copies: the jitted steps donate their state
    variables2 = jax.tree_util.tree_map(jnp.array, variables)
    state_h = TrainState.create(variables, tx)
    state_d = TrainState.create(variables2, tx)
    _, mh = step_host(state_h, dict(ex))
    _, md = step_dev(state_d, ex_pts)
    lh, ld = float(mh["loss"]), float(md["loss"])
    assert abs(lh - ld) < 1e-2 * max(1.0, abs(lh)), (lh, ld)


def test_compact_quantized_examples_match_dense(setup):
    """int16-quantized points + int8 labels + sparse positive targets
    (the low-H2D train path) must reproduce the dense f32 example's
    loss to ~1% (quantization moves points by <~1.1 mm, 50x below the
    smallest voxel size)."""
    from second_tpu.data.point_quant import quantize, ranges
    from second_tpu.train.state import make_voxelizer_fn

    cfg, parts, _ = setup
    net, spec = parts["net"], parts["spec"]
    gen = parts["voxel_generator"]
    tx, _, _ = opt_builder.build(cfg.train_config.optimizer, total_step=100)

    rng = np.random.RandomState(0)
    scenes = [
        make_scene(rng, num_objects=3, num_bg_points=2000,
                   x_range=(0, 20.4), y_range=(-10, 10))
        for _ in range(2)
    ]
    max_voxels = 4096
    ex = assemble_example(parts, scenes, max_voxels=max_voxels)
    ex = {k: jnp.asarray(v) for k, v in ex.items()}
    variables = net.init(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points"],
        ex["coordinates"])

    N = 8192
    lo, hi = ranges(gen.point_cloud_range, 4)
    pts_q = np.zeros((2, N, 4), np.int16)
    cnt = np.zeros((2, 1), np.int32)
    for i, (points, _, _) in enumerate(scenes):
        n = min(len(points), N)
        pts_q[i, :n] = quantize(points[:n], lo, hi)
        cnt[i, 0] = n
    labels = np.asarray(ex["labels"])
    code = spec.box_code_size
    a = labels.shape[1]
    pos_idx = np.full((2, 64), a, np.int32)
    pos_tgt = np.zeros((2, 64, code), np.float32)
    pos_cnt = np.zeros((2, 1), np.int32)
    for b in range(2):
        (pos,) = np.nonzero(labels[b] > 0)
        pos_idx[b, :len(pos)] = pos
        pos_tgt[b, :len(pos)] = np.asarray(ex["reg_targets"])[b, pos]
        pos_cnt[b, 0] = len(pos)
    ex_c = {
        "points_q": jnp.asarray(pts_q),
        "points_count": jnp.asarray(cnt),
        "labels_i8": jnp.asarray(labels.astype(np.int8)),
        "pos_idx": jnp.asarray(pos_idx),
        "pos_targets": jnp.asarray(pos_tgt),
        "pos_count": jnp.asarray(pos_cnt),
        "anchors": ex["anchors"],
    }

    voxelizer = make_voxelizer_fn(gen, max_voxels=max_voxels)
    step_dense = make_train_step(net, spec, tx)
    step_compact = make_train_step(net, spec, tx, voxelizer=voxelizer)
    variables2 = jax.tree_util.tree_map(jnp.array, variables)
    _, md = step_dense(TrainState.create(variables, tx), dict(ex))
    _, mc = step_compact(TrainState.create(variables2, tx), ex_c)
    ld, lc = float(md["loss"]), float(mc["loss"])
    assert abs(ld - lc) < 1e-2 * max(1.0, abs(ld)), (ld, lc)
