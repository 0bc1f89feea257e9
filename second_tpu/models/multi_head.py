"""NuScenes multi-head detector (reference
second/pytorch/models/net_multi_head.py).

Two heads over one RPNNoHead backbone: a SmallObjectHead on the
center-cropped stride-1 stage0 feature map (fine resolution for
pedestrians/cones/bikes) and a DefaultHead on the upsampled final map
(cars/trucks/trailers/buses).  Predictions concatenate LARGE then SMALL
— matching the class_settings order of the nuscenes configs and the
per-class anchor ranges.
"""

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .registry import register_voxelnet
from .rpn import ConvBNReLU, head_reshape
from .voxelnet import VoxelNet

SMALL_CLASSES = (
    "pedestrian", "traffic_cone", "bicycle", "motorcycle", "barrier")
LARGE_CLASSES = ("car", "truck", "trailer", "bus", "construction_vehicle")


class _Head(nn.Module):
    num_class: int
    num_anchor_per_loc: int
    box_code_size: int
    num_direction_bins: int
    use_direction_classifier: bool
    encode_background_as_zeros: bool
    conv_stack: int = 0  # SmallObjectHead: 3 conv+bn+relu at 64ch

    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(self.conv_stack):
            x = ConvBNReLU(64, 3, 1)(x, train)
        nloc = self.num_anchor_per_loc
        b = x.shape[0]
        if self.encode_background_as_zeros:
            num_cls = nloc * self.num_class
        else:
            num_cls = nloc * (self.num_class + 1)
        box_preds = nn.Conv(nloc * self.box_code_size, (1, 1),
                            name="conv_box")(x)
        cls_preds = nn.Conv(num_cls, (1, 1), name="conv_cls")(x)
        ret = {
            "box_preds": head_reshape(
                box_preds, nloc, self.box_code_size
            ).reshape(b, -1, self.box_code_size),
            "cls_preds": head_reshape(
                cls_preds, nloc, num_cls // nloc
            ).reshape(b, -1, num_cls // nloc),
        }
        if self.use_direction_classifier:
            dir_preds = nn.Conv(nloc * self.num_direction_bins, (1, 1),
                                name="conv_dir_cls")(x)
            ret["dir_cls_preds"] = head_reshape(
                dir_preds, nloc, self.num_direction_bins
            ).reshape(b, -1, self.num_direction_bins)
        return ret


@register_voxelnet
class VoxelNetNuscenesMultiHead(VoxelNet):
    """10-class NuScenes net with large+small heads."""

    class_names: Sequence[str] = ()
    num_anchor_per_loc_by_class: Sequence[int] = ()
    small_classes: Tuple[str, ...] = SMALL_CLASSES
    large_classes: Tuple[str, ...] = LARGE_CLASSES

    def setup(self):
        super().setup()
        assert self.num_class == 10, "multi-head net expects 10 classes"
        nloc = dict(zip(self.class_names, self.num_anchor_per_loc_by_class))
        small_nloc = sum(nloc[c] for c in self.small_classes)
        large_nloc = sum(nloc[c] for c in self.large_classes)
        common = dict(
            num_class=self.num_class,
            box_code_size=self.box_code_size,
            num_direction_bins=self.num_direction_bins,
            use_direction_classifier=self.use_direction_classifier,
            encode_background_as_zeros=self.encode_background_as_zeros,
        )
        self.small_head = _Head(
            num_anchor_per_loc=small_nloc, conv_stack=3, **common)
        self.large_head = _Head(
            num_anchor_per_loc=large_nloc, conv_stack=0, **common)

    def __call__(self, voxels, num_points, coords, train=False,
                 sparse_plan=None):
        voxel_features = self.voxel_feature_extractor(
            voxels, num_points, coords, train=train)
        if sparse_plan is not None:
            spatial_features = self.middle_feature_extractor(
                voxel_features, coords, train=train, plan=sparse_plan)
        else:
            spatial_features = self.middle_feature_extractor(
                voxel_features, coords, train=train)
        rpn_out = self.rpn(spatial_features, train=train)
        r1 = rpn_out["stage0"]  # NHWC
        h = r1.shape[1]
        crop = int(np.round(h * 0.1))
        r1 = r1[:, crop:-crop, crop:-crop, :]
        small = self.small_head(r1, train=train)
        large = self.large_head(rpn_out["out"], train=train)
        res = {
            "box_preds": jnp.concatenate(
                [large["box_preds"], small["box_preds"]], axis=1),
            "cls_preds": jnp.concatenate(
                [large["cls_preds"], small["cls_preds"]], axis=1),
        }
        if self.use_direction_classifier:
            res["dir_cls_preds"] = jnp.concatenate(
                [large["dir_cls_preds"], small["dir_cls_preds"]], axis=1)
        return res
