"""Offline data preparation CLI (reference second/create_data.py):

    python -m second_tpu.create_data kitti_data_prep --root_path=/data/kitti
"""

from .data.gt_database import create_groundtruth_database
from .data.kitti_dataset import (
    create_kitti_info_file,
    create_reduced_point_cloud,
)


def kitti_data_prep(root_path):
    create_kitti_info_file(root_path)
    create_reduced_point_cloud(root_path)
    create_groundtruth_database("KittiDataset", root_path)


def nuscenes_data_prep(root_path, version, max_sweeps=10):
    from .data.nuscenes_dataset import create_nuscenes_infos

    create_nuscenes_infos(root_path, version=version, max_sweeps=max_sweeps)
    name = "infos_train.pkl"
    if version == "v1.0-test":
        name = "infos_test.pkl"
    create_groundtruth_database(
        "NuScenesDataset", root_path, f"{root_path}/{name}")


def main():
    from .utils.fire_lite import fire

    fire({
        "kitti_data_prep": kitti_data_prep,
        "nuscenes_data_prep": nuscenes_data_prep,
    })


if __name__ == "__main__":
    main()
