"""Name -> class registries.

The config's ``module_class_name`` strings select implementations, same
public contract as the reference registries
(second/pytorch/models/voxelnet.py:36-49, voxel_encoder.py:11-24,
middle.py:15-28, rpn.py:12-25).
"""

REGISTERED_VFE_CLASSES = {}
REGISTERED_MIDDLE_CLASSES = {}
REGISTERED_RPN_CLASSES = {}
REGISTERED_NETWORK_CLASSES = {}


def _make_register(registry):
    def register(cls, name=None):
        key = name or cls.__name__
        assert key not in registry, f"class {key} already registered"
        registry[key] = cls
        return cls

    return register


def _make_get(registry, kind):
    def get(name):
        if name not in registry:
            raise KeyError(
                f"unknown {kind} class {name!r}; available: {sorted(registry)}"
            )
        return registry[name]

    return get


register_vfe = _make_register(REGISTERED_VFE_CLASSES)
register_middle = _make_register(REGISTERED_MIDDLE_CLASSES)
register_rpn = _make_register(REGISTERED_RPN_CLASSES)
register_voxelnet = _make_register(REGISTERED_NETWORK_CLASSES)

get_vfe_class = _make_get(REGISTERED_VFE_CLASSES, "VFE")
get_middle_class = _make_get(REGISTERED_MIDDLE_CLASSES, "middle")
get_rpn_class = _make_get(REGISTERED_RPN_CLASSES, "RPN")
get_voxelnet_class = _make_get(REGISTERED_NETWORK_CLASSES, "network")
