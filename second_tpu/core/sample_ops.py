"""GT-database sampling (paste augmentation).

Port of second/core/sample_ops.py DataBaseSamplerV2: class-balanced
sampling up to per-class quotas with BEV collision rejection against
existing ground truth, loading each sampled object's cropped points and
translating them into the scene.  Group sampling (multi-part objects)
is not ported yet — no bundled KITTI config enables use_group_id.
"""

import copy
import pathlib

import numpy as np

from . import box_ops
from . import preprocess as prep


class DataBaseSamplerV2:
    def __init__(self, db_infos, groups, db_prepor=None, rate=1.0,
                 global_rot_range=None):
        if db_prepor is not None:
            db_infos = db_prepor(db_infos)

        self.db_infos = db_infos
        self._rate = rate
        self._groups = groups
        self._sample_classes = []
        self._sample_max_nums = []
        if any(len(g) > 1 for g in groups):
            raise NotImplementedError(
                "group sampling not ported (no bundled config uses it)")
        for group_info in groups:
            self._sample_classes += list(group_info.keys())
            self._sample_max_nums += list(group_info.values())

        self._sampler_dict = {
            k: prep.BatchSampler(v, k) for k, v in db_infos.items()
        }
        self._enable_global_rot = False
        if global_rot_range is not None:
            if not isinstance(global_rot_range, (list, tuple, np.ndarray)):
                global_rot_range = [-global_rot_range, global_rot_range]
            if np.abs(global_rot_range[0] - global_rot_range[1]) >= 1e-3:
                raise NotImplementedError(
                    "per-object global rotation placement not ported "
                    "(bundled configs use [0, 0])")
        self._global_rot_range = global_rot_range

    def sample_all(self,
                   root_path,
                   gt_boxes,
                   gt_names,
                   num_point_features,
                   random_crop=False,
                   gt_group_ids=None,
                   calib=None):
        """Returns dict with sampled gt_names/gt_boxes/points/masks or
        None when nothing was sampled."""
        sampled_num_dict = {}
        for class_name, max_sample_num in zip(self._sample_classes,
                                              self._sample_max_nums):
            sampled_num = int(
                max_sample_num - np.sum([n == class_name for n in gt_names]))
            sampled_num = int(np.round(self._rate * sampled_num))
            sampled_num_dict[class_name] = sampled_num

        sampled = []
        sampled_gt_boxes = []
        avoid_coll_boxes = gt_boxes

        for class_name in self._sample_classes:
            sampled_num = sampled_num_dict[class_name]
            if sampled_num > 0:
                sampled_cls = self.sample_class_v2(
                    class_name, sampled_num, avoid_coll_boxes)
                sampled += sampled_cls
                if len(sampled_cls) > 0:
                    sampled_gt_box = np.stack(
                        [s["box3d_lidar"] for s in sampled_cls], axis=0)
                    sampled_gt_boxes.append(sampled_gt_box)
                    avoid_coll_boxes = np.concatenate(
                        [avoid_coll_boxes, sampled_gt_box], axis=0)

        if not sampled:
            return None
        sampled_gt_boxes = np.concatenate(sampled_gt_boxes, axis=0)
        s_points_list = []
        for info in sampled:
            s_points = np.fromfile(
                str(pathlib.Path(root_path) / info["path"]), dtype=np.float32
            ).reshape([-1, num_point_features])
            if "rot_transform" in info:
                s_points[:, :3] = box_ops.rotation_points_single_angle(
                    s_points[:, :3], info["rot_transform"], axis=2)
            s_points[:, :3] += info["box3d_lidar"][:3]
            s_points_list.append(s_points)
        if random_crop:
            raise NotImplementedError("random frustum crop not ported")
        return {
            "gt_names": np.array([s["name"] for s in sampled]),
            "difficulty": np.array([s["difficulty"] for s in sampled]),
            "gt_boxes": sampled_gt_boxes,
            "points": np.concatenate(s_points_list, axis=0),
            "gt_masks": np.ones((len(sampled),), dtype=np.bool_),
            "group_ids": np.arange(
                gt_boxes.shape[0], gt_boxes.shape[0] + len(sampled)),
        }

    def sample_class_v2(self, name, num, gt_boxes):
        """Sample `num` objects, reject those colliding with existing
        boxes or accepted samples (reference :238-285)."""
        sampled = copy.deepcopy(self._sampler_dict[name].sample(num))
        num_gt = gt_boxes.shape[0]
        num_sampled = len(sampled)
        gt_boxes_bv = box_ops.center_to_corner_box2d(
            gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, 6])
        sp_boxes = np.stack([i["box3d_lidar"] for i in sampled], axis=0)
        sp_boxes_bv = box_ops.center_to_corner_box2d(
            sp_boxes[:, 0:2], sp_boxes[:, 3:5], sp_boxes[:, 6])
        total_bv = np.concatenate([gt_boxes_bv, sp_boxes_bv], axis=0)
        coll_mat = prep.box_collision_test(total_bv, total_bv)
        diag = np.arange(total_bv.shape[0])
        coll_mat[diag, diag] = False

        valid_samples = []
        for i in range(num_gt, num_gt + num_sampled):
            if coll_mat[i].any():
                coll_mat[i] = False
                coll_mat[:, i] = False
            else:
                valid_samples.append(sampled[i - num_gt])
        return valid_samples
