import numpy as np

from second_tpu.core.anchor_generator import AnchorGeneratorRange
from second_tpu.core.box_coders import GroundBox3dCoder
from second_tpu.core.region_similarity import NearestIouSimilarity
from second_tpu.core.target_assigner import TargetAssigner
from second_tpu.core.target_ops import create_target_np


def make_assigner(classes=("Car",), assign_per_class=True):
    gens = []
    sims = []
    for cls in classes:
        gens.append(
            AnchorGeneratorRange(
                anchor_ranges=[0, -8, -1, 16, 8, -1],
                sizes=[1.6, 3.9, 1.56],
                rotations=[0, np.pi / 2],
                class_name=cls,
                match_threshold=0.6,
                unmatch_threshold=0.45,
            )
        )
        sims.append(NearestIouSimilarity())
    return TargetAssigner(
        box_coder=GroundBox3dCoder(),
        anchor_generators=gens,
        classes=list(classes),
        feature_map_sizes=[None] * len(classes),
        region_similarity_calculators=sims,
        sample_size=512,
        assign_per_class=assign_per_class,
    )


def test_generate_anchors_shape_and_order():
    ta = make_assigner()
    fmap = [1, 4, 8]
    d = ta.generate_anchors(fmap)
    num = 1 * 4 * 8 * 2
    assert d["anchors"].shape == (num, 7)
    assert d["matched_thresholds"].shape == (num,)
    # anchor-type-major flattening: first half rotation 0, second half pi/2
    assert np.all(d["anchors"][: num // 2, 6] == 0)
    np.testing.assert_allclose(d["anchors"][num // 2 :, 6], np.pi / 2)


def test_assign_per_class_positive_on_gt():
    ta = make_assigner()
    fmap = [1, 8, 16]
    anchors_dict = ta.generate_anchors_dict(fmap)
    # one gt box sitting exactly on an anchor center
    anchors = anchors_dict["Car"]["anchors"]
    gt = anchors[100:101].copy()
    targets = ta.assign_per_class(
        anchors_dict,
        gt_boxes=gt,
        anchors_mask=None,
        gt_classes=np.array([1], dtype=np.int32),
        gt_names=["Car"],
    )
    labels = targets["labels"]
    assert labels.shape == (anchors.shape[0],)
    assert labels[100] == 1  # exact match must be positive
    assert np.sum(labels == 1) >= 1
    assert np.sum(labels == -1) >= 0
    # regression target of the exact-match anchor is ~0
    np.testing.assert_allclose(targets["bbox_targets"][100], 0, atol=1e-6)


def test_assign_multi_class_ranges():
    ta = make_assigner(("Car", "Pedestrian"))
    fmap = [1, 4, 4]
    anchors_dict = ta.generate_anchors_dict(fmap)
    gt = anchors_dict["Pedestrian"]["anchors"][5:6].copy()
    targets = ta.assign_per_class(
        anchors_dict,
        gt_boxes=gt,
        anchors_mask=None,
        gt_classes=np.array([2], dtype=np.int32),
        gt_names=["Pedestrian"],
    )
    n_per_class = 1 * 4 * 4 * 2
    assert targets["labels"].shape == (2 * n_per_class,)
    # positives must live in the second class's anchor range
    pos = np.where(targets["labels"] == 2)[0]
    assert len(pos) >= 1
    assert np.all(pos >= n_per_class)
    r = ta.anchors_range("Pedestrian")
    assert r == (n_per_class, 2 * n_per_class)


def test_force_match_low_iou_gt():
    # a gt that overlaps no anchor above threshold still gets its best
    # anchor force-matched
    anchors = np.array(
        [[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0],
         [8.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]]
    )
    gt = np.array([[1.2, 1.2, -1.0, 1.6, 3.9, 1.56, 0.0]])

    sim = NearestIouSimilarity()

    def similarity_fn(a, g):
        return sim.compare(a[:, [0, 1, 3, 4, 6]], g[:, [0, 1, 3, 4, 6]])

    coder = GroundBox3dCoder()
    ret = create_target_np(
        anchors, gt, similarity_fn, coder.encode,
        matched_threshold=0.6, unmatched_threshold=0.45,
    )
    assert ret["labels"][0] == 1  # force match
    assert ret["labels"][1] == 0


def test_no_gt_all_background():
    ta = make_assigner()
    anchors_dict = ta.generate_anchors_dict([1, 4, 4])
    targets = ta.assign_per_class(
        anchors_dict,
        gt_boxes=np.zeros((0, 7)),
        anchors_mask=None,
        gt_classes=np.zeros((0,), dtype=np.int32),
        gt_names=[],
    )
    assert np.all(targets["labels"] == 0)


def test_anchors_mask_prunes():
    ta = make_assigner()
    anchors_dict = ta.generate_anchors_dict([1, 4, 4])
    n = anchors_dict["Car"]["anchors"].shape[0]
    mask = np.zeros(n, dtype=bool)
    mask[: n // 2] = True
    gt = anchors_dict["Car"]["anchors"][n - 1 : n].copy()
    targets = ta.assign_per_class(
        anchors_dict,
        gt_boxes=gt,
        anchors_mask=mask,
        gt_classes=np.array([1], dtype=np.int32),
        gt_names=["Car"],
    )
    # gt's anchor is masked out: labels of masked-out anchors must be -1
    assert np.all(targets["labels"][n // 2 :] == -1)
