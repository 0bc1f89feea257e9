"""GT database creation (reference second/data/all_dataset.py:14-101):
crop each object's points into a .bin plus a dbinfos pkl."""

import pickle
from pathlib import Path

import numpy as np

from ..core import box_ops
from .dataset import get_dataset_class


def create_groundtruth_database(dataset_class_name,
                                data_path,
                                info_path=None,
                                used_classes=None,
                                database_save_path=None,
                                db_info_save_path=None,
                                relative_path=True):
    dataset = get_dataset_class(dataset_class_name)(
        info_path=info_path, root_path=data_path)
    root_path = Path(data_path)
    if database_save_path is None:
        database_save_path = root_path / "gt_database"
    else:
        database_save_path = Path(database_save_path)
    if db_info_save_path is None:
        db_info_save_path = root_path / "kitti_dbinfos_train.pkl"
    database_save_path.mkdir(parents=True, exist_ok=True)
    all_db_infos = {}

    group_counter = 0
    for j in range(len(dataset)):
        image_idx = j
        sensor_data = dataset.get_sensor_data(j)
        if "image_idx" in sensor_data["metadata"]:
            image_idx = sensor_data["metadata"]["image_idx"]
        points = sensor_data["lidar"]["points"]
        annos = sensor_data["lidar"]["annotations"]
        gt_boxes = annos["boxes"]
        names = annos["names"]
        group_dict = {}
        if "group_ids" in annos:
            group_ids = annos["group_ids"]
        else:
            group_ids = np.arange(gt_boxes.shape[0], dtype=np.int64)
        difficulty = annos.get(
            "difficulty", np.zeros(gt_boxes.shape[0], dtype=np.int32))

        num_obj = gt_boxes.shape[0]
        point_indices = box_ops.points_in_rbbox(points, gt_boxes)
        for i in range(num_obj):
            filename = f"{image_idx}_{names[i]}_{i}.bin"
            filepath = database_save_path / filename
            gt_points = points[point_indices[:, i]].copy()
            gt_points[:, :3] -= gt_boxes[i, :3]
            with open(filepath, "w") as f:
                gt_points.tofile(f)
            if used_classes is None or names[i] in used_classes:
                db_path = (
                    str(database_save_path.stem + "/" + filename)
                    if relative_path else str(filepath))
                db_info = {
                    "name": names[i],
                    "path": db_path,
                    "image_idx": image_idx,
                    "gt_idx": i,
                    "box3d_lidar": gt_boxes[i],
                    "num_points_in_gt": gt_points.shape[0],
                    "difficulty": difficulty[i],
                }
                local_group_id = group_ids[i]
                if local_group_id not in group_dict:
                    group_dict[local_group_id] = group_counter
                    group_counter += 1
                db_info["group_id"] = group_dict[local_group_id]
                if "score" in annos:
                    db_info["score"] = annos["score"][i]
                all_db_infos.setdefault(names[i], []).append(db_info)
    for k, v in all_db_infos.items():
        print(f"load {len(v)} {k} database infos")
    with open(db_info_save_path, "wb") as f:
        pickle.dump(all_db_infos, f)
