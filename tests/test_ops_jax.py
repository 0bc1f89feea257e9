import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.core import box_ops as nb
from second_tpu.ops import box_ops_jax as jb
from second_tpu.ops import losses as L
from second_tpu.ops.nms import nms_bev


def random_boxes(n, rng, ndim=7):
    boxes = np.zeros((n, ndim))
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 2] = rng.uniform(-3, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestBoxOpsParity:
    @pytest.mark.parametrize("vec", [False, True])
    @pytest.mark.parametrize("smooth", [False, True])
    def test_encode_decode_match_host(self, vec, smooth):
        rng = np.random.RandomState(0)
        boxes, anchors = random_boxes(40, rng), random_boxes(40, rng)
        enc_np = nb.second_box_encode(boxes, anchors, vec, smooth)
        enc_j = np.asarray(jb.second_box_encode(
            jnp.asarray(boxes), jnp.asarray(anchors), vec, smooth))
        np.testing.assert_allclose(enc_j, enc_np, atol=1e-5, rtol=1e-5)
        dec_np = nb.second_box_decode(enc_np, anchors, vec, smooth)
        dec_j = np.asarray(jb.second_box_decode(
            jnp.asarray(enc_np), jnp.asarray(anchors), vec, smooth))
        np.testing.assert_allclose(dec_j, dec_np, atol=1e-4, rtol=1e-5)

    def test_limit_period(self):
        vals = np.linspace(-10, 10, 33)
        np.testing.assert_allclose(
            np.asarray(jb.limit_period(jnp.asarray(vals))),
            nb.limit_period(vals),
            atol=1e-6,
        )

    def test_corners_match_host(self):
        rng = np.random.RandomState(1)
        b = random_boxes(10, rng)
        c_np = nb.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])
        c_j = np.asarray(
            jb.center_to_corner_box2d(
                jnp.asarray(b[:, :2]), jnp.asarray(b[:, 3:5]), jnp.asarray(b[:, 6])
            )
        )
        np.testing.assert_allclose(c_j, c_np, atol=1e-5)


class TestLosses:
    def test_sigmoid_ce_matches_naive(self):
        rng = np.random.RandomState(2)
        logits = rng.normal(size=(4, 8, 3))
        labels = (rng.uniform(size=(4, 8, 3)) > 0.5).astype(np.float64)
        got = np.asarray(
            L.sigmoid_cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(labels))
        )
        p = 1 / (1 + np.exp(-logits))
        expected = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_focal_reduces_easy_examples(self):
        logits = jnp.asarray([[[5.0], [-5.0]]])  # easy pos / easy "pos" miss
        targets = jnp.asarray([[[1.0], [1.0]]])
        loss = np.asarray(L.sigmoid_focal_loss(logits, targets))
        assert loss[0, 0, 0] < 1e-4  # easy example almost free
        assert loss[0, 1, 0] > 1.0  # hard example dominates

    def test_smooth_l1_formula(self):
        preds = jnp.asarray([[[0.0, 2.0]]])
        targets = jnp.asarray([[[0.05, 0.0]]])
        sigma = 3.0
        loss = np.asarray(L.weighted_smooth_l1_loss(preds, targets, sigma=sigma))
        # |x| = 0.05 < 1/9 -> 0.5*(0.05*3)^2; |x| = 2 -> 2 - 0.5/9
        np.testing.assert_allclose(
            loss[0, 0], [0.5 * (0.05 * 3) ** 2, 2 - 0.5 / 9], atol=1e-6
        )

    def test_prepare_loss_weights_norm_by_positives(self):
        labels = jnp.asarray([[1, 1, 0, 0, 0, -1]])
        cls_w, reg_w, cared = L.prepare_loss_weights(labels)
        np.testing.assert_allclose(np.asarray(reg_w[0]), [0.5, 0.5, 0, 0, 0, 0])
        np.testing.assert_allclose(
            np.asarray(cls_w[0]), [0.5, 0.5, 0.5, 0.5, 0.5, 0.0]
        )
        np.testing.assert_array_equal(
            np.asarray(cared[0]), [True] * 5 + [False]
        )

    def test_sin_difference(self):
        b1 = jnp.zeros((1, 1, 7)).at[..., 6].set(0.3)
        b2 = jnp.zeros((1, 1, 7)).at[..., 6].set(0.1)
        o1, o2 = L.add_sin_difference(b1, b2)
        # sin(a - b) = sin a cos b - cos a sin b
        np.testing.assert_allclose(
            np.asarray(o1[..., 6] - o2[..., 6]), np.sin(0.3 - 0.1), atol=1e-6
        )

    def test_direction_target(self):
        anchors = jnp.zeros((1, 4, 7))
        reg = jnp.zeros((1, 4, 7)).at[0, :, 6].set(
            jnp.asarray([0.3, np.pi - 0.1, -0.3, -np.pi + 0.1])
        )
        tgt = L.get_direction_target(anchors, reg, one_hot=False)
        np.testing.assert_array_equal(np.asarray(tgt[0]), [0, 0, 1, 1])


def _np_greedy_nms(boxes_standup, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        from second_tpu.core.box_ops import iou

        ious = iou(boxes_standup[i : i + 1], boxes_standup, eps=0.0)[0]
        suppressed |= ious > thresh
        suppressed[i] = True
    return keep


class TestNMS:
    def test_matches_numpy_greedy_axis_aligned(self):
        rng = np.random.RandomState(3)
        n = 64
        boxes = np.zeros((n, 5))
        boxes[:, :2] = rng.uniform(0, 20, (n, 2))
        boxes[:, 2:4] = rng.uniform(2, 5, (n, 2))
        boxes[:, 4] = 0.0
        scores = rng.uniform(size=n)
        su = np.concatenate(
            [boxes[:, :2] - boxes[:, 2:4] / 2, boxes[:, :2] + boxes[:, 2:4] / 2],
            axis=1,
        )
        expected = _np_greedy_nms(su, scores, 0.3)
        idx, valid = nms_bev(
            jnp.asarray(boxes), jnp.asarray(scores),
            pre_max_size=64, post_max_size=32,
            iou_threshold=0.3, rotated=False,
        )
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        assert got == expected[: len(got)]
        assert len(got) == min(len(expected), 32)

    def test_rotated_suppresses_rotated_duplicates(self):
        # two nearly identical rotated boxes + one distant box
        boxes = jnp.asarray(
            [
                [10.0, 10.0, 2.0, 5.0, 0.7],
                [10.1, 10.0, 2.0, 5.0, 0.72],
                [30.0, 30.0, 2.0, 5.0, 1.2],
            ]
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        idx, valid = nms_bev(
            boxes, scores, pre_max_size=3, post_max_size=3,
            iou_threshold=0.3, rotated=True,
        )
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        assert got == [0, 2]

    def test_score_threshold_and_padding(self):
        boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0], [5.0, 5.0, 1.0, 1.0, 0.0]])
        scores = jnp.asarray([0.9, 0.01])
        idx, valid = nms_bev(
            boxes, scores, pre_max_size=2, post_max_size=4,
            iou_threshold=0.5, score_threshold=0.1, rotated=True,
        )
        assert list(np.asarray(valid)) == [True, False, False, False]
        assert int(idx[0]) == 0
        assert all(int(i) == -1 for i in np.asarray(idx)[1:])

    def test_jit_static_shapes(self):
        # ensure repeated calls with same shapes don't retrace
        boxes = jnp.zeros((128, 5))
        scores = jnp.zeros((128,))
        f = lambda b, s: nms_bev(b, s, 64, 16, 0.5)
        jax.eval_shape(f, boxes, scores)  # compiles fine
        idx, valid = f(boxes, scores)
        assert idx.shape == (16,)


def test_ghm_losses():
    from second_tpu.ops import losses as L

    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    targets = jnp.asarray((rng.rand(2, 50, 3) > 0.7).astype(np.float32))
    weights = jnp.asarray((rng.rand(2, 50) > 0.3).astype(np.float32))

    out = L.ghm_c_loss(logits, targets, weights)
    assert out.shape == logits.shape
    total = float(out.sum())
    assert np.isfinite(total) and total > 0
    # invalid entries contribute nothing
    zero_w = L.ghm_c_loss(logits, targets, jnp.zeros_like(weights))
    assert float(jnp.abs(zero_w).sum()) == 0.0
    # gradient flows and is finite
    g = jax.grad(lambda x: L.ghm_c_loss(x, targets, weights).sum())(logits)
    assert np.isfinite(np.asarray(g)).all()

    preds = jnp.asarray(rng.randn(2, 50, 7).astype(np.float32))
    regt = jnp.asarray(rng.randn(2, 50, 7).astype(np.float32))
    out_r = L.ghm_r_loss(preds, regt, weights)
    assert out_r.shape == preds.shape
    assert np.isfinite(float(out_r.sum()))
    gr = jax.grad(lambda x: L.ghm_r_loss(x, regt, weights).sum())(preds)
    assert np.isfinite(np.asarray(gr)).all()

    # builder wiring
    from second_tpu.builders import losses_builder
    from second_tpu.configs import textproto, schema
    cfg = schema.Loss.from_raw(textproto.parse("""
      classification_loss { weighted_ghm { bins: 10 } }
      localization_loss { weighted_ghm { mu: 0.02 bins: 10 } }
      classification_weight: 1.0
      localization_weight: 2.0
    """))
    cls_fn, loc_fn, cw, lw, _ = losses_builder.build(cfg)
    assert cls_fn(logits, targets, weights=weights).shape == logits.shape
    assert loc_fn(preds, regt, weights=weights).shape == preds.shape


def test_direction_target_reconstruction_roundtrip():
    """predict-time yaw reconstruction must invert get_direction_target
    when direction_limit_offset is 0 (the proto default / corrected
    mode; voxelnet._single_frame_predict honours the config value —
    nonzero offsets reproduce upstream voxelnet.py:602-606 for
    checkpoint-import parity, see test_dir_limit_offset_parity)."""
    from second_tpu.ops import losses as L
    from second_tpu.core import box_ops as box_ops_jax

    rng = np.random.RandomState(0)
    n = 256
    yaw = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    anchors = np.zeros((1, n, 7), np.float32)
    anchors[..., 6] = rng.uniform(-np.pi, np.pi, n)
    reg_targets = np.zeros((1, n, 7), np.float32)
    reg_targets[..., 6] = yaw - anchors[..., 6]

    bins = np.asarray(L.get_direction_target(
        jnp.asarray(anchors), jnp.asarray(reg_targets), one_hot=False))[0]

    # regression recovers yaw modulo pi (sin-difference encoding); the
    # direction bin must restore the right half-turn for ANY representative
    psi = yaw + np.pi * rng.randint(-2, 3, n)
    period = np.pi  # 2*pi / 2 bins
    dir_rot = np.asarray(box_ops_jax.limit_period(
        jnp.asarray(psi), 0.0, period))
    rec = dir_rot + period * bins
    err = np.abs(np.angle(np.exp(1j * (rec - yaw))))
    assert err.max() < 1e-3


def test_dir_limit_offset_parity():
    """With a nonzero dir_limit_offset, predict's yaw reconstruction
    must match the reference formula (voxelnet.py:598-607) exactly:
    dir_rot = limit_period(yaw - dir_offset, dir_limit_offset, period);
    yaw = dir_rot + dir_offset + period * dir_label."""
    from second_tpu.models.voxelnet import ModelSpec, _single_frame_predict

    rng = np.random.RandomState(1)
    n = 64
    spec = ModelSpec(
        num_class=1, box_code_size=7, num_anchor_per_loc=2,
        use_direction_classifier=True, dir_offset=0.78539816,
        dir_limit_offset=1.0,
        nms_score_thresholds=(0.0,), nms_pre_max_sizes=(n,),
        nms_post_max_sizes=(n,), nms_iou_thresholds=(1.01,),
        use_rotate_nms=False)
    anchors = np.zeros((n, 7), np.float32)
    anchors[:, 3:6] = 1.0
    anchors[:, 6] = rng.uniform(-np.pi, np.pi, n)
    anchors[:, :2] = rng.uniform(-20, 20, (n, 2))
    box_preds = rng.uniform(-0.2, 0.2, (n, 7)).astype(np.float32)
    cls_preds = rng.uniform(-2, 2, (n, 1)).astype(np.float32)
    dir_preds = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    out = _single_frame_predict(
        spec, jnp.asarray(box_preds), jnp.asarray(cls_preds),
        jnp.asarray(dir_preds), jnp.asarray(anchors), None)
    # reference formula on the same decoded boxes (order may differ
    # post-NMS, so compare as sets keyed by x-coordinate)
    decoded = np.asarray(spec.decode(jnp.asarray(box_preds),
                                     jnp.asarray(anchors)))
    dirs = dir_preds.argmax(-1)
    period = np.pi
    dir_rot = decoded[:, 6] - spec.dir_offset
    dir_rot = dir_rot - np.floor(
        dir_rot / period + spec.dir_limit_offset) * period
    yaw_ref = dir_rot + spec.dir_offset + period * dirs
    ref_by_x = {round(float(x), 4): float(y)
                for x, y in zip(decoded[:, 0], yaw_ref)}
    got_boxes = np.asarray(out["box3d_lidar"])
    got_valid = np.asarray(out["valid"])
    checked = 0
    for b, v in zip(got_boxes, got_valid):
        if not v:
            continue
        key = round(float(b[0]), 4)
        assert key in ref_by_x
        assert abs(float(b[6]) - ref_by_x[key]) < 1e-4
        checked += 1
    assert checked >= n // 2


def _np_greedy_ref(iou, valid, thr):
    n = iou.shape[0]
    suppress = np.asarray(iou) > thr
    alive = np.asarray(valid).copy()
    keep = np.zeros(n, bool)
    for i in range(n):
        if alive[i]:
            keep[i] = True
            alive &= ~suppress[i]
        alive[i] = False
    return keep


def test_pallas_greedy_suppress_interpret_parity():
    """Pallas greedy sweep (interpret mode on CPU) must match the
    sequential greedy reference exactly."""
    from second_tpu.ops.pallas_nms import greedy_suppress_pallas

    rng = np.random.RandomState(11)
    n = 200
    # random symmetric IoU-like matrix with plenty of conflicts
    m = rng.uniform(0, 1, (n, n))
    iou_np = np.maximum(m, m.T)
    valid_np = rng.rand(n) > 0.2
    ref = _np_greedy_ref(iou_np, valid_np, 0.5)
    got = np.asarray(greedy_suppress_pallas(
        jnp.asarray(iou_np), jnp.asarray(valid_np), 0.5, interpret=True))
    np.testing.assert_array_equal(got, ref)
