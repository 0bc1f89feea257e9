"""Import helpers for running the reference's torch modules on CPU.

The reference tree (read-only at /root/reference) imports numba,
spconv, and torchvision, none of which exist in this image; the RPN
and PFN modules themselves are pure torch, so stubbing those imports
lets us load them and use them as golden oracles for checkpoint
import tests. Nothing from the reference is copied — the modules are
executed in place.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"

_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    _installed = True
    import collections
    import collections.abc

    import torch.nn as tnn

    if not hasattr(collections, "Iterable"):  # removed in py3.10
        collections.Iterable = collections.abc.Iterable

    def _passthru(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    numba = types.ModuleType("numba")
    numba.jit = _passthru
    numba.njit = _passthru
    numba.prange = range
    numba.float64 = numba.float32 = None
    numba.int64 = numba.int32 = numba.boolean = None
    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _passthru
    numba.cuda = cuda
    sys.modules.setdefault("numba", numba)
    sys.modules.setdefault("numba.cuda", cuda)

    spconv = types.ModuleType("spconv")
    spconv.SparseModule = tnn.Module
    spconv.SparseSequential = tnn.Sequential
    for n in ("SubMConv3d", "SparseConv3d", "SparseConvTensor",
              "SparseInverseConv3d", "ToDense"):
        setattr(spconv, n, tnn.Module)
    sputils = types.ModuleType("spconv.utils")
    for n in ("rbbox_iou", "rbbox_intersection", "non_max_suppression_cpu",
              "rotate_non_max_suppression_cpu", "non_max_suppression",
              "points_to_voxel", "VoxelGenerator", "VoxelGeneratorV2"):
        setattr(sputils, n, None)
    spconv.utils = sputils
    spops = types.ModuleType("spconv.ops")
    spops.nms = None
    spconv.ops = spops
    sys.modules.setdefault("spconv", spconv)
    sys.modules.setdefault("spconv.utils", sputils)
    sys.modules.setdefault("spconv.ops", spops)

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvr = types.ModuleType("torchvision.models.resnet")

    class BasicBlock(tnn.Module):
        expansion = 1

    class Bottleneck(tnn.Module):
        expansion = 4

    tvr.BasicBlock = BasicBlock
    tvr.Bottleneck = Bottleneck
    tvm.resnet = tvr
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    sys.modules.setdefault("torchvision.models.resnet", tvr)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_rpn():
    """Returns the reference rpn module, or None if unavailable."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    install_stubs()
    try:
        from second.pytorch.models import rpn as ref_rpn
        return ref_rpn
    except Exception:
        return None
