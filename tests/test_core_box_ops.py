import numpy as np
import pytest

from second_tpu.core import box_ops, geometry, rotated_iou
from second_tpu.core.anchor_generator import AnchorGeneratorRange, AnchorGeneratorStride
from second_tpu.core.box_coders import BevBoxCoder, GroundBox3dCoder


def random_boxes(n, rng, ndim=7):
    boxes = np.zeros((n, ndim))
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 2] = rng.uniform(-3, 1, n)
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if ndim > 7:
        boxes[:, 7:] = rng.normal(size=(n, ndim - 7))
    return boxes


class TestEncodeDecode:
    @pytest.mark.parametrize("vec", [False, True])
    @pytest.mark.parametrize("smooth", [False, True])
    def test_roundtrip(self, vec, smooth):
        rng = np.random.RandomState(0)
        boxes = random_boxes(50, rng)
        anchors = random_boxes(50, rng)
        enc = box_ops.second_box_encode(boxes, anchors, vec, smooth)
        dec = box_ops.second_box_decode(enc, anchors, vec, smooth)
        if vec:
            # angle recovered mod 2pi
            np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-9)
            np.testing.assert_allclose(
                np.cos(dec[:, 6]), np.cos(boxes[:, 6]), atol=1e-9)
            np.testing.assert_allclose(
                np.sin(dec[:, 6]), np.sin(boxes[:, 6]), atol=1e-9)
        else:
            np.testing.assert_allclose(dec, boxes, atol=1e-9)

    def test_roundtrip_custom_dims(self):
        rng = np.random.RandomState(1)
        boxes = random_boxes(20, rng, ndim=9)
        anchors = random_boxes(20, rng, ndim=9)
        enc = box_ops.second_box_encode(boxes, anchors)
        assert enc.shape == (20, 9)
        dec = box_ops.second_box_decode(enc, anchors)
        np.testing.assert_allclose(dec, boxes, atol=1e-9)

    def test_identity_encoding_is_zero(self):
        rng = np.random.RandomState(2)
        b = random_boxes(5, rng)
        enc = box_ops.second_box_encode(b, b)
        np.testing.assert_allclose(enc, 0, atol=1e-12)

    def test_known_values(self):
        anchor = np.array([[0.0, 0.0, 0.0, 1.0, 2.0, 1.0, 0.0]])
        box = np.array([[np.sqrt(5), 0.0, 0.5, 2.0, 2.0, 2.0, 0.3]])
        enc = box_ops.second_box_encode(box, anchor)
        # diag = sqrt(1+4) = sqrt(5) -> xt = 1
        np.testing.assert_allclose(
            enc[0], [1.0, 0.0, 0.5, np.log(2), 0.0, np.log(2), 0.3], atol=1e-12
        )

    def test_bev_roundtrip(self):
        rng = np.random.RandomState(3)
        boxes = random_boxes(20, rng)[:, [0, 1, 3, 4, 6]]
        anchors = random_boxes(20, rng)[:, [0, 1, 3, 4, 6]]
        enc = box_ops.bev_box_encode(boxes, anchors)
        dec = box_ops.bev_box_decode(enc, anchors)
        np.testing.assert_allclose(dec, boxes, atol=1e-9)


class TestCorners:
    def test_corners_2d_unit_square(self):
        corners = box_ops.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[2.0, 2.0]])
        )
        expected = {(-1, -1), (-1, 1), (1, 1), (1, -1)}
        got = {tuple(np.round(c, 6)) for c in corners[0]}
        assert got == expected

    def test_corner_order_clockwise_from_min(self):
        corners = box_ops.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[2.0, 4.0]])
        )[0]
        np.testing.assert_allclose(
            corners, [[-1, -2], [-1, 2], [1, 2], [1, -2]], atol=1e-12
        )

    def test_rotation_90deg(self):
        # reference convention: positive angle rotates x into -y direction
        # for points (p @ R_T with R_T = [[c, -s], [s, c]])
        pts = np.array([[[1.0, 0.0]]])
        out = box_ops.rotation_2d(pts, np.array([np.pi / 2]))
        np.testing.assert_allclose(out[0, 0], [0.0, -1.0], atol=1e-12)

    def test_corners_3d_lidar_origin(self):
        # lidar boxes: origin (0.5, 0.5, 0) => z is bottom
        corners = box_ops.center_to_corner_box3d(
            np.array([[0.0, 0.0, 0.0]]),
            np.array([[2.0, 2.0, 2.0]]),
            np.array([0.0]),
            origin=(0.5, 0.5, 0),
            axis=2,
        )
        assert corners[0][:, 2].min() == 0.0
        assert corners[0][:, 2].max() == 2.0

    def test_standup(self):
        corners = box_ops.center_to_corner_box2d(
            np.array([[1.0, 1.0]]), np.array([[2.0, 2.0]]), np.array([np.pi / 4])
        )
        standup = box_ops.corner_to_standup_nd(corners)
        s2 = np.sqrt(2)
        np.testing.assert_allclose(
            standup[0], [1 - s2, 1 - s2, 1 + s2, 1 + s2], atol=1e-9
        )

    def test_near_bbox_rot_swap(self):
        rb = np.array([[0.0, 0.0, 2.0, 4.0, 0.0], [0.0, 0.0, 2.0, 4.0, np.pi / 2]])
        near = box_ops.rbbox2d_to_near_bbox(rb)
        np.testing.assert_allclose(near[0], [-1, -2, 1, 2])
        np.testing.assert_allclose(near[1], [-2, -1, 2, 1])


class TestIoU:
    def test_identical(self):
        b = np.array([[0.0, 0.0, 2.0, 2.0]])
        np.testing.assert_allclose(box_ops.iou(b, b, eps=0.0), [[1.0]])

    def test_half_overlap(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0]])
        b = np.array([[1.0, 0.0, 3.0, 2.0]])
        np.testing.assert_allclose(box_ops.iou(a, b, eps=0.0), [[2.0 / 6.0]])

    def test_disjoint(self):
        a = np.array([[0.0, 0.0, 1.0, 1.0]])
        b = np.array([[5.0, 5.0, 6.0, 6.0]])
        np.testing.assert_allclose(box_ops.iou(a, b, eps=0.0), [[0.0]])


class TestRotatedIoU:
    def test_identical(self):
        b = np.array([[0.0, 0.0, 2.0, 4.0, 0.3]])
        got = rotated_iou.rotated_iou(b, b)
        np.testing.assert_allclose(got, [[1.0]], atol=1e-6)

    def test_axis_aligned_matches_simple(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = np.array([[1.0, 1.0, 2.0, 2.0, 0.0]])
        # inter = 1, union = 7
        got = rotated_iou.rotated_iou(a, b)
        np.testing.assert_allclose(got, [[1.0 / 7.0]], atol=1e-6)

    def test_rotated_45_square(self):
        # unit square vs itself rotated 45 deg: inter = 2*(sqrt(2)-1)
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
        inter = 2 * (np.sqrt(2) - 1)
        expected = inter / (2 - inter)
        got = rotated_iou.rotated_iou(a, b)
        np.testing.assert_allclose(got, [[expected]], atol=1e-6)

    def test_rotation_invariance(self):
        rng = np.random.RandomState(4)
        a = random_boxes(10, rng)[:, [0, 1, 3, 4, 6]]
        b = random_boxes(12, rng)[:, [0, 1, 3, 4, 6]]
        base = rotated_iou.rotated_iou(a, b)
        # rotate everything by a global angle about origin
        ang = 0.7
        c, s = np.cos(ang), np.sin(ang)

        def rot(boxes):
            out = boxes.copy()
            out[:, 0] = boxes[:, 0] * c - boxes[:, 1] * s
            out[:, 1] = boxes[:, 0] * s + boxes[:, 1] * c
            out[:, 4] = boxes[:, 4] - ang  # note reference rotation sign
            return out

        got = rotated_iou.rotated_iou(rot(a), rot(b))
        np.testing.assert_allclose(got, base, atol=1e-6)

    def test_criterion_ioa(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])  # area 4
        b = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])  # area 1, fully inside
        got0 = rotated_iou.rotated_iou_matrix(a, b, criterion=0)
        got1 = rotated_iou.rotated_iou_matrix(a, b, criterion=1)
        np.testing.assert_allclose(got0, [[0.25]], atol=1e-6)
        np.testing.assert_allclose(got1, [[1.0]], atol=1e-6)

    def test_contained_box(self):
        a = np.array([[0.0, 0.0, 4.0, 4.0, 0.2]])
        b = np.array([[0.0, 0.0, 2.0, 2.0, 0.2]])
        got = rotated_iou.rotated_iou(a, b)
        np.testing.assert_allclose(got, [[4.0 / 16.0]], atol=1e-6)


class TestGeometry:
    def test_points_in_rbbox(self):
        boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
        pts = np.array(
            [[0.0, 0.0, 1.0], [0.9, 0.9, 0.5], [1.5, 0.0, 1.0], [0.0, 0.0, 2.5]]
        )
        # lidar origin: z bottom
        inside = box_ops.points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0))
        np.testing.assert_array_equal(inside[:, 0], [True, True, False, False])

    def test_points_in_rbbox_rotated(self):
        boxes = np.array([[0.0, 0.0, 0.0, 1.0, 4.0, 2.0, np.pi / 2]])
        pts = np.array([[1.5, 0.0, 1.0], [0.0, 1.5, 1.0]])
        inside = box_ops.points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0))
        # after rotating by pi/2 the long axis lies along x
        np.testing.assert_array_equal(inside[:, 0], [True, False])

    def test_points_in_polygon_2d(self):
        poly = np.array([[[0, 0], [0, 2], [2, 2], [2, 0]]], dtype=np.float64)
        pts = np.array([[1.0, 1.0], [3.0, 1.0]])
        got = geometry.points_in_convex_polygon_2d(pts, poly)
        np.testing.assert_array_equal(got[:, 0], [True, False])


class TestAnchors:
    def test_range_anchor_values(self):
        gen = AnchorGeneratorRange(
            anchor_ranges=[0, -40, -1, 70.4, 40, -1],
            sizes=[1.6, 3.9, 1.56],
            rotations=[0, np.pi / 2],
            class_name="Car",
            match_threshold=0.6,
            unmatch_threshold=0.45,
        )
        a = gen.generate([1, 4, 8])
        assert a.shape == (1, 4, 8, 1, 2, 7)
        assert a[..., 2].min() == -1 and a[..., 2].max() == -1
        np.testing.assert_allclose(a[0, 0, 0, 0, 0, :2], [0, -40])
        np.testing.assert_allclose(a[0, -1, -1, 0, 0, :2], [70.4, 40])
        np.testing.assert_allclose(a[0, 0, 0, 0, 1, 6], np.pi / 2)
        np.testing.assert_allclose(a[..., 3:6].reshape(-1, 3)[0], [1.6, 3.9, 1.56])

    def test_stride_anchor_values(self):
        gen = AnchorGeneratorStride(
            sizes=[1.6, 3.9, 1.56],
            anchor_strides=[0.32, 0.32, 0.0],
            anchor_offsets=[0.16, -39.52, -1.78],
            rotations=[0, 1.57],
            class_name="Car",
        )
        a = gen.generate([1, 10, 10])
        assert a.shape == (1, 10, 10, 1, 2, 7)
        np.testing.assert_allclose(a[0, 0, 0, 0, 0, :3], [0.16, -39.52, -1.78])
        np.testing.assert_allclose(
            a[0, 0, 1, 0, 0, :3], [0.16 + 0.32, -39.52, -1.78]
        )

    def test_custom_values(self):
        gen = AnchorGeneratorRange(
            anchor_ranges=[0, -40, -1, 70, 40, -1],
            custom_values=(0.0, 0.0),
            class_name="car",
        )
        a = gen.generate([1, 2, 2])
        assert a.shape[-1] == 9
        assert gen.ndim == 9


class TestBoxCoders:
    def test_ground_coder(self):
        coder = GroundBox3dCoder()
        assert coder.code_size == 7
        rng = np.random.RandomState(5)
        boxes, anchors = random_boxes(10, rng), random_boxes(10, rng)
        dec = coder.decode(coder.encode(boxes, anchors), anchors)
        np.testing.assert_allclose(dec, boxes, atol=1e-9)

    def test_ground_coder_vec(self):
        coder = GroundBox3dCoder(vec_encode=True)
        assert coder.code_size == 8

    def test_bev_coder(self):
        coder = BevBoxCoder(z_fixed=-1.0, h_fixed=2.0)
        assert coder.code_size == 5
        rng = np.random.RandomState(6)
        boxes, anchors = random_boxes(10, rng), random_boxes(10, rng)
        dec = coder.decode(coder.encode(boxes, anchors), anchors)
        np.testing.assert_allclose(dec[:, [0, 1, 3, 4, 6]], boxes[:, [0, 1, 3, 4, 6]], atol=1e-9)
        assert np.all(dec[:, 2] == -1.0)
        assert np.all(dec[:, 5] == 2.0)


class TestMisc:
    def test_limit_period(self):
        np.testing.assert_allclose(
            box_ops.limit_period(np.array([0.0, np.pi, -np.pi / 2, 3 * np.pi])),
            [0.0, 0.0, -np.pi / 2, 0.0],
            atol=1e-12,
        )

    def test_camera_lidar_roundtrip(self):
        rng = np.random.RandomState(7)
        rect = np.eye(4)
        rect[:3, :3] += rng.normal(scale=0.01, size=(3, 3))
        velo2cam = np.eye(4)
        velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
        velo2cam[:3, 3] = rng.normal(size=3)
        pts = rng.uniform(-10, 10, (20, 3))
        cam = box_ops.lidar_to_camera(pts, rect, velo2cam)
        back = box_ops.camera_to_lidar(cam, rect, velo2cam)
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_box_camera_lidar_roundtrip(self):
        rng = np.random.RandomState(8)
        rect, velo2cam = np.eye(4), np.eye(4)
        velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
        boxes_cam = np.concatenate(
            [rng.uniform(-10, 10, (5, 3)), rng.uniform(1, 4, (5, 3)), rng.uniform(-3, 3, (5, 1))],
            axis=1,
        )
        lidar = box_ops.box_camera_to_lidar(boxes_cam, rect, velo2cam)
        back = box_ops.box_lidar_to_camera(lidar, rect, velo2cam)
        np.testing.assert_allclose(back, boxes_cam, atol=1e-9)

    def test_anchors_area_summed_table(self):
        coors = np.array([[0, 2, 3], [0, 2, 4], [0, 5, 5]])  # zyx
        dense = box_ops.sparse_sum_for_anchors_mask(coors, (8, 8))
        cum = dense.cumsum(0).cumsum(1)
        # upstream's summed-area lookup is exclusive of the min row/col,
        # so pick bounds strictly below the voxels of interest
        anchors_bv = np.array([[2.5, 1.5, 5.0, 3.0]])  # xyxy metric
        area = box_ops.fused_get_anchors_area(
            cum, anchors_bv, (1.0, 1.0), (0.0, 0.0), (8, 8)
        )
        assert area[0] == 2  # the two voxels at y=2, x=3/4 are inside
