"""Dataset ABC + registry (reference second/data/dataset.py:14-113).

The ``get_sensor_data`` contract is identical to upstream: a query (int
index or dict) returns a dict with lidar points, annotations in the
lidar frame (z-CENTER boxes), metadata, and optional calib/camera
entries.  ``evaluation(detections, output_dir)`` scores a full
detection list with the dataset's official metric.
"""

from pathlib import Path

REGISTERED_DATASET_CLASSES = {}


def register_dataset(cls, name=None):
    name = name or cls.__name__
    assert name not in REGISTERED_DATASET_CLASSES, f"exist class: {name}"
    REGISTERED_DATASET_CLASSES[name] = cls
    return cls


def get_dataset_class(name):
    if name not in REGISTERED_DATASET_CLASSES:
        raise KeyError(
            f"unknown dataset {name!r}; available: "
            f"{sorted(REGISTERED_DATASET_CLASSES)}")
    return REGISTERED_DATASET_CLASSES[name]


class Dataset:
    """An abstract class representing a detection dataset."""

    NumPointFeatures = -1

    def __getitem__(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def get_sensor_data(self, query):
        """Query format: int index, or dict
        {"lidar": {"idx": i}, "cam": {}} for multi-sensor reads.

        Returns (annotation format v2-sensor):
        {
            "lidar": {"type": "lidar", "points": [N, 3+],
                      "annotations": {"boxes": [M, 7] z-center lidar,
                                      "names": [M]}},
            "metadata": {...},  # e.g. image_idx / token
            ["calib"], ["cam"]
        }
        """
        raise NotImplementedError

    def evaluation(self, detections, output_dir):
        """Evaluate model detections (list of net.predict outputs).

        Returns {"results": {metric_name: str}, "detail": {...}}.
        """
        raise NotImplementedError


def get_root_path(info_path, root_path=None):
    return Path(root_path) if root_path is not None else Path(info_path).parent
