from .registry import (  # noqa: F401
    get_middle_class,
    get_rpn_class,
    get_vfe_class,
    get_voxelnet_class,
    register_middle,
    register_rpn,
    register_vfe,
    register_voxelnet,
)

# import model modules for their registration side effects
from . import voxel_encoders  # noqa: F401,E402
from . import middle  # noqa: F401,E402
from . import sparse_middle  # noqa: F401,E402
from . import rpn  # noqa: F401,E402
from . import voxelnet  # noqa: F401,E402
from . import multi_head  # noqa: F401,E402
