from .network_builder import build_network, build_model_spec  # noqa: F401
from .voxel_builder import build as build_voxel_generator  # noqa: F401
from .target_assigner_builder import build as build_target_assigner  # noqa: F401
from .box_coder_builder import build as build_box_coder  # noqa: F401
