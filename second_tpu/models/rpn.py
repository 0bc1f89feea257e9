"""Region proposal networks (2D BEV conv backbones) — flax, NHWC.

Structure parity with the reference RPN family
(second/pytorch/models/rpn.py:202-529): per stage a strided 3x3 conv +
``layer_num`` 3x3 convs (each Conv+BN+ReLU), a transpose-conv (or
strided conv for fractional strides) "deblock" per upsampled stage,
concatenation of the upsampled maps, then 1x1 cls/box/dir heads whose
outputs are reshaped anchor-type-major ([B, nloc, H, W, code] ->
[B, A, code], matching the anchor flattening in
second_tpu.core.target_assigner.generate_anchors).
"""

from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .layers import MaskedBatchNorm
from .registry import register_rpn


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    transpose: bool = False
    dtype: str = None  # compute dtype for the conv (e.g. bfloat16)

    @nn.compact
    def __call__(self, x, train=False):
        if self.transpose:
            x = nn.ConvTranspose(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=not self.use_norm,
                dtype=self.dtype,
            )(x)
        else:
            pad = (self.kernel - 1) // 2
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                use_bias=not self.use_norm,
                dtype=self.dtype,
            )(x)
        if self.use_norm:
            if self.use_groupnorm:
                x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-3)(x)
            else:
                x = MaskedBatchNorm()(x, use_running_average=not train)
        return nn.relu(x)


class RPNNoHeadBase(nn.Module):
    """Multi-scale conv backbone + upsample-concat (rpn.py:202-331)."""

    use_norm: bool = True
    num_class: int = 2
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (128, 128, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (256, 256, 256)
    num_input_features: int = 128
    num_anchor_per_loc: int = 2
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    box_code_size: int = 7
    num_direction_bins: int = 2
    compute_dtype: str = None

    @property
    def upsample_start_idx(self):
        return len(self.layer_nums) - len(self.upsample_strides)

    @property
    def final_num_filters(self):
        if len(self.num_upsample_filters) == 0:
            return self.num_filters[-1]
        return sum(self.num_upsample_filters)

    def _backbone(self, x, train):
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        assert len(self.layer_strides) == len(self.layer_nums)
        assert len(self.num_filters) == len(self.layer_nums)
        assert len(self.num_upsample_filters) == len(self.upsample_strides)
        start = self.upsample_start_idx
        must_equal = [
            self.upsample_strides[i] / np.prod(self.layer_strides[: i + start + 1])
            for i in range(len(self.upsample_strides))
        ]
        assert all(v == must_equal[0] for v in must_equal)

        ups, stage_outputs = [], []
        for i, layer_num in enumerate(self.layer_nums):
            x = ConvBNReLU(
                self.num_filters[i], 3, self.layer_strides[i], self.use_norm,
                self.use_groupnorm, self.num_groups,
                dtype=self.compute_dtype,
            )(x, train)
            for _ in range(layer_num):
                x = ConvBNReLU(
                    self.num_filters[i], 3, 1, self.use_norm,
                    self.use_groupnorm, self.num_groups,
                    dtype=self.compute_dtype,
                )(x, train)
            stage_outputs.append(x)
            if i - start >= 0:
                stride = self.upsample_strides[i - start]
                nf = self.num_upsample_filters[i - start]
                if stride >= 1:
                    s = int(np.round(stride))
                    up = ConvBNReLU(
                        nf, s, s, self.use_norm, self.use_groupnorm,
                        self.num_groups, transpose=True,
                        dtype=self.compute_dtype,
                    )(x, train)
                else:
                    s = int(np.round(1 / stride))
                    up = ConvBNReLU(
                        nf, s, s, self.use_norm, self.use_groupnorm,
                        self.num_groups, dtype=self.compute_dtype,
                    )(x, train)
                ups.append(up)

        res = {}
        out = jnp.concatenate(ups, axis=-1) if ups else x
        for i, up in enumerate(ups):
            res[f"up{i}"] = up
        for i, s_out in enumerate(stage_outputs):
            res[f"stage{i}"] = s_out
        res["out"] = out
        return res

    @nn.compact
    def __call__(self, x, train=False):
        return self._backbone(x, train)


def head_reshape(preds, num_anchor_per_loc, per_loc_size):
    """[B, H, W, nloc*size] NHWC head output -> [B, nloc, H, W, size]
    (anchor-type-major, matching the reference rpn.py:396-420)."""
    b, h, w, _ = preds.shape
    preds = preds.reshape(b, h, w, num_anchor_per_loc, per_loc_size)
    return preds.transpose(0, 3, 1, 2, 4)


class RPNBase(RPNNoHeadBase):
    @nn.compact
    def __call__(self, x, train=False):
        res = self._backbone(x, train)
        x = res["out"].astype(jnp.float32)
        nloc = self.num_anchor_per_loc
        if self.encode_background_as_zeros:
            num_cls = nloc * self.num_class
        else:
            num_cls = nloc * (self.num_class + 1)
        box_preds = nn.Conv(
            nloc * self.box_code_size, (1, 1), name="conv_box")(x)
        cls_preds = nn.Conv(num_cls, (1, 1), name="conv_cls")(x)
        ret = {
            "box_preds": head_reshape(box_preds, nloc, self.box_code_size),
            "cls_preds": head_reshape(cls_preds, nloc, num_cls // nloc),
        }
        if self.use_direction_classifier:
            dir_preds = nn.Conv(
                nloc * self.num_direction_bins, (1, 1), name="conv_dir_cls")(x)
            ret["dir_cls_preds"] = head_reshape(
                dir_preds, nloc, self.num_direction_bins)
        return ret


@register_rpn
class RPNV2(RPNBase):
    pass


@register_rpn
class RPNNoHead(RPNNoHeadBase):
    pass


class BasicBlock(nn.Module):
    """torchvision-style BasicBlock used by ResNetRPN (rpn.py:428-466)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False)(x)
        out = MaskedBatchNorm()(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = MaskedBatchNorm()(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False)(x)
            identity = MaskedBatchNorm()(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


@register_rpn
class ResNetRPN(RPNBase):
    """RPN with residual stages instead of plain conv stacks."""

    def _backbone(self, x, train):
        start = self.upsample_start_idx
        ups, stage_outputs = [], []
        for i, layer_num in enumerate(self.layer_nums):
            x = BasicBlock(self.num_filters[i], self.layer_strides[i])(x, train)
            for _ in range(1, max(layer_num, 1)):
                x = BasicBlock(self.num_filters[i], 1)(x, train)
            stage_outputs.append(x)
            if i - start >= 0:
                stride = self.upsample_strides[i - start]
                nf = self.num_upsample_filters[i - start]
                if stride >= 1:
                    s = int(np.round(stride))
                    up = ConvBNReLU(nf, s, s, self.use_norm,
                                    self.use_groupnorm, self.num_groups,
                                    transpose=True)(x, train)
                else:
                    s = int(np.round(1 / stride))
                    up = ConvBNReLU(nf, s, s, self.use_norm,
                                    self.use_groupnorm, self.num_groups)(x, train)
                ups.append(up)
        res = {}
        out = jnp.concatenate(ups, axis=-1) if ups else x
        for i, up in enumerate(ups):
            res[f"up{i}"] = up
        for i, s_out in enumerate(stage_outputs):
            res[f"stage{i}"] = s_out
        res["out"] = out
        return res
