# importing the dataset modules registers them (registry side effects)
from . import kitti_dataset  # noqa: F401
from . import nuscenes_dataset  # noqa: F401
from .dataset import get_dataset_class, register_dataset  # noqa: F401
