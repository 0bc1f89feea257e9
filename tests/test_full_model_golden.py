"""WHOLE-network golden test vs the reference torch VoxelNet.

Runs the reference's own ``second.pytorch.models.voxelnet.VoxelNet``
(PointPillars xyres_16 config — no spconv kernels needed: the middle is
``PointPillarsScatter``, pure torch) on a canned example, imports its
state_dict through ``checkpoint_import``, and asserts second_tpu
reproduces its forward logits, loss dict, and post-processed detections
(incl. the direction-bin yaw fix with the config's
direction_limit_offset: 1). This is the strongest AP-parity proxy
available without the KITTI dataset.

Reference construction mirrors second/pytorch/builder/second_builder.py:22-133;
forward/loss/predict parity targets voxelnet.py:239-312,339-375,377-645.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from second_tpu.utils import checkpoint_import as ci  # noqa: E402

CFG_PATH = "/root/reference/second/configs/pointpillars/car/xyres_16.config"


def _np_greedy_standup_nms(dets, thresh):
    """Numpy stand-in for the reference's nms_gpu_cc (spconv C++):
    greedy NMS over [x1, y1, x2, y2, score] rows, score-descending."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


class _TargetAssignerShim:
    """The two attributes reference VoxelNet reads off target_assigner
    (voxelnet.py:122-123,166,457)."""

    def __init__(self, box_coder, num_anchors_per_location):
        self.box_coder = box_coder
        self.num_anchors_per_location = num_anchors_per_location


class _VoxelGeneratorShim:
    def __init__(self, voxel_size, point_cloud_range):
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)


@pytest.fixture(scope="module")
def pair():
    """(reference torch net, our parts dict, canned example arrays)."""
    if not os.path.exists(CFG_PATH):
        pytest.skip("reference configs absent")
    from reference_torch import load_reference_rpn

    if load_reference_rpn() is None:
        pytest.skip("reference tree not importable")

    from second.pytorch.core import losses as ref_losses
    from second.pytorch.core.box_coders import GroundBox3dCoderTorch
    from second.pytorch.core import box_torch_ops as ref_bto
    from second.pytorch.models import voxelnet as ref_vn

    from second_tpu.builders import build_network
    from second_tpu.utils.config_tool import read_config

    # reference non-rotated NMS calls the spconv C++ kernel; substitute
    # an exact numpy greedy implementation (same sorted-greedy spec)
    ref_bto.nms_gpu_cc = _np_greedy_standup_nms

    cfg = read_config(CFG_PATH)
    mc = cfg.model.second
    parts = build_network(mc)
    gen = parts["voxel_generator"]
    ta = parts["target_assigner"]

    grid_size = gen.grid_size
    dense_shape = [1] + grid_size[::-1].tolist() + [
        int(mc.voxel_feature_extractor.num_filters[-1])]

    # reference loss functors for this config (losses_builder.py:23-190
    # applied to xyres_16's weighted_sigmoid_focal + weighted_smooth_l1)
    cls_loss = ref_losses.SigmoidFocalClassificationLoss(
        gamma=2.0, alpha=0.25)
    loc_loss = ref_losses.WeightedSmoothL1LocalizationLoss(
        sigma=3.0, code_weights=[1.0] * 7, codewise=True)

    shim_ta = _TargetAssignerShim(
        GroundBox3dCoderTorch(linear_dim=False, vec_encode=False),
        ta.num_anchors_per_location)
    shim_gen = _VoxelGeneratorShim(gen.voxel_size, gen.point_cloud_range)

    tnet = ref_vn.VoxelNet(
        dense_shape,
        num_class=1,
        vfe_class_name=mc.voxel_feature_extractor.module_class_name,
        vfe_num_filters=list(mc.voxel_feature_extractor.num_filters),
        middle_class_name=mc.middle_feature_extractor.module_class_name,
        middle_num_input_features=(
            mc.middle_feature_extractor.num_input_features),
        rpn_class_name=mc.rpn.module_class_name,
        rpn_num_input_features=mc.rpn.num_input_features,
        rpn_layer_nums=list(mc.rpn.layer_nums),
        rpn_layer_strides=[int(v) for v in mc.rpn.layer_strides],
        rpn_num_filters=list(mc.rpn.num_filters),
        rpn_upsample_strides=[int(v) for v in mc.rpn.upsample_strides],
        rpn_num_upsample_filters=list(mc.rpn.num_upsample_filters),
        use_norm=True,
        use_rotate_nms=parts["spec"].use_rotate_nms,
        multiclass_nms=parts["spec"].multiclass_nms,
        nms_score_thresholds=list(parts["spec"].nms_score_thresholds),
        nms_pre_max_sizes=list(parts["spec"].nms_pre_max_sizes),
        nms_post_max_sizes=list(parts["spec"].nms_post_max_sizes),
        nms_iou_thresholds=list(parts["spec"].nms_iou_thresholds),
        use_sigmoid_score=mc.use_sigmoid_score,
        encode_background_as_zeros=mc.encode_background_as_zeros,
        use_direction_classifier=mc.use_direction_classifier,
        num_input_features=mc.num_point_features,
        with_distance=mc.voxel_feature_extractor.with_distance,
        cls_loss_weight=mc.loss.classification_weight,
        loc_loss_weight=mc.loss.localization_weight,
        pos_cls_weight=mc.pos_class_weight,
        neg_cls_weight=mc.neg_class_weight,
        direction_loss_weight=mc.direction_loss_weight,
        loss_norm_type=ref_vn.LossNormType.NormByNumPositives,
        encode_rad_error_by_sin=mc.encode_rad_error_by_sin,
        loc_loss_ftor=loc_loss,
        cls_loss_ftor=cls_loss,
        target_assigner=shim_ta,
        voxel_generator=shim_gen,
        post_center_range=list(mc.post_center_limit_range),
        dir_offset=mc.direction_offset,
        sin_error_factor=mc.sin_error_factor or 1.0,
        nms_class_agnostic=mc.nms_class_agnostic,
        num_direction_bins=mc.num_direction_bins,
        direction_limit_offset=mc.direction_limit_offset,
    )
    tnet.eval()
    # non-trivial BN stats so import correctness is actually exercised
    g = torch.Generator().manual_seed(7)
    for m in tnet.modules():
        if hasattr(m, "running_mean"):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)

    # ---- canned example: synthetic scene through the host voxelizer
    from second_tpu.data.synthetic import make_scene

    rng = np.random.RandomState(11)
    points, _, _ = make_scene(rng, num_objects=8, num_bg_points=6000,
                              points_per_object=200)
    V = 4000
    res = gen.generate_multi_gpu(points, max_voxels=V)
    n = int(res["voxel_num"])
    assert n > 100

    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    A = anchors.shape[0]
    labels = rng.choice([-1, 0, 1], size=A, p=[0.05, 0.90, 0.05]).astype(
        np.int32)
    reg_targets = (rng.randn(A, 7) * 0.2).astype(np.float32)

    example = {
        "voxels": res["voxels"].astype(np.float32),
        "num_points": res["num_points_per_voxel"].astype(np.int32),
        "coords": res["coordinates"].astype(np.int32),
        "n_voxels": n,
        "anchors": anchors[None],
        "labels": labels[None],
        "reg_targets": reg_targets[None],
        "importance": np.ones((1, A), np.float32),
    }
    return tnet, parts, example


def _import_weights(tnet, parts, example):
    net = parts["net"]
    variables = net.init(
        jax.random.PRNGKey(0),
        example["voxels"][None],
        example["num_points"][None],
        example["coords"][None])
    variables = jax.tree_util.tree_map(np.asarray, variables)
    new_vars, report = ci.import_state_dict(tnet.state_dict(), variables)
    assert not report["missing_targets"], report["missing_targets"]
    return new_vars


def _ref_forward(tnet, example):
    coords4 = np.concatenate(
        [np.zeros((example["n_voxels"], 1), np.int32),
         example["coords"][:example["n_voxels"]]], axis=1)
    with torch.no_grad():
        preds = tnet.network_forward(
            torch.from_numpy(example["voxels"][:example["n_voxels"]]),
            torch.from_numpy(
                example["num_points"][:example["n_voxels"]].astype(np.int64)),
            torch.from_numpy(coords4.astype(np.float32)),
            1)
    code = 7
    return {
        "box_preds": preds["box_preds"].view(1, -1, code),
        "cls_preds": preds["cls_preds"].view(1, -1, 1),
        "dir_cls_preds": preds["dir_cls_preds"].view(1, -1, 2),
    }


def test_whole_network_forward_golden(pair):
    tnet, parts, example = pair
    new_vars = _import_weights(tnet, parts, example)
    ref = _ref_forward(tnet, example)

    my = parts["net"].apply(
        new_vars, example["voxels"][None], example["num_points"][None],
        example["coords"][None])
    for key in ("box_preds", "cls_preds", "dir_cls_preds"):
        r = ref[key].numpy().reshape(-1)
        m = np.asarray(my[key]).reshape(-1)
        assert r.shape == m.shape, key
        np.testing.assert_allclose(m, r, atol=3e-3, rtol=1e-3, err_msg=key)


def test_whole_network_loss_golden(pair):
    tnet, parts, example = pair
    from second_tpu.models.voxelnet import compute_loss

    ref_preds = _ref_forward(tnet, example)
    t_example = {
        "anchors": torch.from_numpy(example["anchors"]),
        "labels": torch.from_numpy(example["labels"]),
        "reg_targets": torch.from_numpy(example["reg_targets"]),
        "importance": torch.from_numpy(example["importance"]),
    }
    with torch.no_grad():
        ref_loss = tnet.loss(t_example, ref_preds)

    # OUR loss on the REFERENCE's own logits: isolates loss parity from
    # forward parity (forward is covered by the test above)
    my_preds = {k: jnp.asarray(v.numpy()) for k, v in ref_preds.items()}
    my_example = {k: jnp.asarray(v) for k, v in example.items()
                  if k in ("anchors", "labels", "reg_targets", "importance")}
    my_loss = compute_loss(parts["spec"], my_preds, my_example)

    for key in ("loss", "cls_loss_reduced", "loc_loss_reduced",
                "dir_loss_reduced", "cls_pos_loss", "cls_neg_loss"):
        r = float(ref_loss[key])
        m = float(my_loss[key])
        assert abs(m - r) <= max(1e-4, 1e-3 * abs(r)), (key, m, r)


def test_whole_network_predict_golden(pair):
    """Decode + NMS + direction yaw fix + post_center_range on SHARED
    logits must produce the same detections (incl. yaw — the config sets
    direction_limit_offset: 1, the reference-parity mode)."""
    tnet, parts, example = pair
    from second_tpu.models.voxelnet import predict

    ref_preds = _ref_forward(tnet, example)
    t_example = {"anchors": torch.from_numpy(example["anchors"])}
    with torch.no_grad():
        ref_dets = tnet.predict(t_example, ref_preds)[0]

    my_preds = {k: jnp.asarray(v.numpy()) for k, v in ref_preds.items()}
    my = predict(parts["spec"], my_preds,
                 {"anchors": jnp.asarray(example["anchors"])})
    valid = np.asarray(my["valid"][0])
    my_boxes = np.asarray(my["box3d_lidar"][0])[valid]
    my_scores = np.asarray(my["scores"][0])[valid]
    my_labels = np.asarray(my["label_preds"][0])[valid]

    ref_boxes = ref_dets["box3d_lidar"].numpy()
    ref_scores = ref_dets["scores"].numpy()
    ref_labels = ref_dets["label_preds"].numpy()

    assert len(my_boxes) == len(ref_boxes)
    # order may differ (and scores can tie); sort by (score, x, y)
    mo = np.lexsort((my_boxes[:, 1], my_boxes[:, 0], -my_scores))
    ro = np.lexsort((ref_boxes[:, 1], ref_boxes[:, 0], -ref_scores))
    np.testing.assert_allclose(
        my_scores[mo], ref_scores[ro], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        my_boxes[mo], ref_boxes[ro], atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(my_labels[mo], ref_labels[ro])
