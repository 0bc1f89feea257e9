"""GT-database sampling (paste augmentation).

Port of second/core/sample_ops.py DataBaseSamplerV2: class-balanced
sampling up to per-class quotas with BEV collision rejection against
existing ground truth, loading each sampled object's cropped points and
translating them into the scene. Includes group sampling (multi-part
objects share a group_id and are placed/rejected together,
reference :287-353) and per-object global-rotation placement
(sample_class_v2/:238-285 with enable_global_rot).
"""

import copy
import pathlib
from functools import reduce

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
        self._group_db_infos = {}
        self._group_name_to_names = []
        self._use_group_sampling = any(len(g) > 1 for g in groups)
        if not self._use_group_sampling:
            self._group_db_infos = self.db_infos
            for group_info in groups:
                self._sample_classes += list(group_info.keys())
                self._sample_max_nums += list(group_info.values())
        else:
            # each sampler entry is a LIST of same-group items
            for group_info in groups:
                group_names = list(group_info.keys())
                group_name = ", ".join(group_names)
                self._sample_classes += group_names
                self._sample_max_nums += list(group_info.values())
                self._group_name_to_names.append((group_name, group_names))
                group_dict = {}
                for name in group_names:
                    for item in db_infos[name]:
                        group_dict.setdefault(item["group_id"], []).append(
                            item)
                if group_name in self._group_db_infos:
                    raise ValueError("group must be unique")
                self._group_db_infos[group_name] = list(group_dict.values())

        self._sampler_dict = {
            k: prep.BatchSampler(v, k) for k, v in self._group_db_infos.items()
        }
        self._enable_global_rot = False
        if global_rot_range is not None:
            if not isinstance(global_rot_range, (list, tuple, np.ndarray)):
                global_rot_range = [-global_rot_range, global_rot_range]
            if np.abs(global_rot_range[0] - global_rot_range[1]) >= 1e-3:
                self._enable_global_rot = True
        self._global_rot_range = global_rot_range

    @property
    def use_group_sampling(self):
        return self._use_group_sampling

    def sample(self, name, num):
        """Returns (flat item list, per-group member counts)."""
        if self._use_group_sampling:
            groups = self._sampler_dict[name].sample(num)
            group_num = [len(g) for g in groups]
            return reduce(lambda a, b: a + b, groups, []), group_num
        ret = self._sampler_dict[name].sample(num)
        return ret, np.ones((len(ret),), dtype=np.int64)

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

        sampled_groups = list(self._sample_classes)
        sample_nums = [sampled_num_dict[c] for c in sampled_groups]
        total_group_ids = None
        if self._use_group_sampling:
            assert gt_group_ids is not None
            sampled_groups, sample_nums = [], []
            for group_name, class_names in self._group_name_to_names:
                sampled_groups.append(group_name)
                sample_nums.append(
                    max(sampled_num_dict[n] for n in class_names))
            total_group_ids = gt_group_ids

        sampled = []
        sampled_gt_boxes = []
        avoid_coll_boxes = gt_boxes

        for class_name, sampled_num in zip(sampled_groups, sample_nums):
            if sampled_num > 0:
                if self._use_group_sampling:
                    sampled_cls = self.sample_group(
                        class_name, sampled_num, avoid_coll_boxes,
                        total_group_ids)
                else:
                    sampled_cls = self.sample_class_v2(
                        class_name, sampled_num, avoid_coll_boxes)
                sampled += sampled_cls
                if len(sampled_cls) > 0:
                    sampled_gt_box = np.stack(
                        [s["box3d_lidar"] for s in sampled_cls], axis=0)
                    sampled_gt_boxes.append(sampled_gt_box)
                    avoid_coll_boxes = np.concatenate(
                        [avoid_coll_boxes, sampled_gt_box], axis=0)
                    if self._use_group_sampling:
                        total_group_ids = np.concatenate(
                            [total_group_ids,
                             np.array([s["group_id"] for s in sampled_cls])],
                            axis=0)

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
            # occlusion augmentation: crop a random image-plane
            # sub-frustum out of each pasted object's points
            # (reference sample_ops.py:182-201)
            assert calib is not None
            rect, Trv2c, P2 = calib["rect"], calib["Trv2c"], calib["P2"]
            gt_bboxes = box_ops.box3d_to_bbox(
                sampled_gt_boxes, rect, Trv2c, P2)
            crop_frustums = prep.random_crop_frustum(
                gt_bboxes, rect, Trv2c, P2)
            s_points_list_new = []
            for i, s_points in enumerate(s_points_list):
                mask = box_ops.mask_points_in_corners(
                    s_points, crop_frustums[i:i + 1]).reshape(-1)
                num_remove = np.sum(mask)
                if num_remove > 0 and (
                        s_points.shape[0] - num_remove) > 15:
                    s_points = s_points[np.logical_not(mask)]
                s_points_list_new.append(s_points)
            s_points_list = s_points_list_new
        return {
            "gt_names": np.array([s["name"] for s in sampled]),
            "difficulty": np.array([s["difficulty"] for s in sampled]),
            "gt_boxes": sampled_gt_boxes,
            "points": np.concatenate(s_points_list, axis=0),
            "gt_masks": np.ones((len(sampled),), dtype=np.bool_),
            "group_ids": (
                np.array([s["group_id"] for s in sampled])
                if self._use_group_sampling else np.arange(
                    gt_boxes.shape[0], gt_boxes.shape[0] + len(sampled))),
        }

    def _place_with_global_rot(self, boxes, valid_mask, group_ids=None):
        """Re-place accepted samples anywhere on their range circle
        (reference :252-263 / :317-327): noise_per_object_v3_ with zero
        loc/rot noise and the configured global rotation range."""
        prep.noise_per_object_v3_(
            boxes, None, valid_mask,
            rotation_perturb=0.0, center_noise_std=0.0,
            global_random_rot_range=self._global_rot_range,
            group_ids=group_ids, num_try=100)

    def sample_class_v2(self, name, num, gt_boxes):
        """Sample `num` objects, reject those colliding with existing
        boxes or accepted samples (reference :238-285)."""
        sampled, _ = self.sample(name, num)
        sampled = copy.deepcopy(sampled)
        num_gt = gt_boxes.shape[0]
        num_sampled = len(sampled)
        gt_boxes_bv = box_ops.center_to_corner_box2d(
            gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, 6])
        sp_boxes = np.stack([i["box3d_lidar"] for i in sampled], axis=0)

        valid_mask = np.concatenate([
            np.zeros((num_gt,), np.bool_),
            np.ones((num_sampled,), np.bool_)], axis=0)
        boxes = np.concatenate([gt_boxes, sp_boxes], axis=0).copy()
        if self._enable_global_rot:
            self._place_with_global_rot(boxes, valid_mask)
        sp_boxes_new = boxes[num_gt:]
        sp_boxes_bv = box_ops.center_to_corner_box2d(
            sp_boxes_new[:, 0:2], sp_boxes_new[:, 3:5], sp_boxes_new[:, 6])
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
                if self._enable_global_rot:
                    sampled[i - num_gt]["box3d_lidar"][:2] = boxes[i, :2]
                    sampled[i - num_gt]["box3d_lidar"][6] = boxes[i, 6]
                    sampled[i - num_gt]["rot_transform"] = (
                        boxes[i, 6] - sp_boxes[i - num_gt, 6])
                valid_samples.append(sampled[i - num_gt])
        return valid_samples

    def sample_group(self, name, num, gt_boxes, gt_group_ids):
        """Sample whole groups; a group is accepted only if none of its
        members collide (reference :287-353)."""
        sampled, group_num = self.sample(name, num)
        sampled = copy.deepcopy(sampled)
        # rewrite sampled group ids to avoid clashing with gt group ids
        gid_map = {}
        next_gid = int(np.max(gt_group_ids)) + 1
        for s in sampled:
            gid = s["group_id"]
            if gid not in gid_map:
                gid_map[gid] = next_gid
                next_gid += 1
            s["group_id"] = gid_map[gid]

        num_gt = gt_boxes.shape[0]
        gt_boxes_bv = box_ops.center_to_corner_box2d(
            gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, 6])
        sp_boxes = np.stack([i["box3d_lidar"] for i in sampled], axis=0)
        sp_group_ids = np.array([i["group_id"] for i in sampled])
        valid_mask = np.concatenate([
            np.zeros((num_gt,), np.bool_),
            np.ones((sp_boxes.shape[0],), np.bool_)], axis=0)
        boxes = np.concatenate([gt_boxes, sp_boxes], axis=0).copy()
        group_ids = np.concatenate([gt_group_ids, sp_group_ids], axis=0)
        if self._enable_global_rot:
            self._place_with_global_rot(
                boxes, valid_mask, group_ids=group_ids)
        sp_boxes_new = boxes[num_gt:]
        sp_boxes_bv = box_ops.center_to_corner_box2d(
            sp_boxes_new[:, 0:2], sp_boxes_new[:, 3:5], sp_boxes_new[:, 6])
        total_bv = np.concatenate([gt_boxes_bv, sp_boxes_bv], axis=0)
        coll_mat = prep.box_collision_test(total_bv, total_bv)
        diag = np.arange(total_bv.shape[0])
        coll_mat[diag, diag] = False

        valid_samples = []
        idx = num_gt
        for n_in_group in group_num:
            if coll_mat[idx:idx + n_in_group].any():
                coll_mat[idx:idx + n_in_group] = False
                coll_mat[:, idx:idx + n_in_group] = False
            else:
                for i in range(n_in_group):
                    if self._enable_global_rot:
                        sampled[idx - num_gt + i]["box3d_lidar"][:2] = (
                            boxes[idx + i, :2])
                        sampled[idx - num_gt + i]["box3d_lidar"][6] = (
                            boxes[idx + i, 6])
                        sampled[idx - num_gt + i]["rot_transform"] = (
                            boxes[idx + i, 6]
                            - sp_boxes[idx + i - num_gt, 6])
                    valid_samples.append(sampled[idx - num_gt + i])
            idx += n_in_group
        return valid_samples
