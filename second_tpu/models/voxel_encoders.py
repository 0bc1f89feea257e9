"""Voxel feature encoders (VFE) — flax.

Inputs use the TPU static layout: voxels [B, V, T, F] (zero padding),
num_points [B, V] int32, coords [B, V, 3] int32 zyx (-1 padding rows).

Parity notes vs the reference (second/pytorch/models/voxel_encoder.py):
  * BN statistics include the zeroed padding slots along T of REAL
    voxels (the reference concatenates real voxels only but keeps all T
    slots) — here padding VOXEL rows are additionally excluded via
    MaskedBatchNorm's mask, making the statistics match.
  * VoxelFeatureExtractor re-masks after every VFE layer
    (voxel_encoder.py:128-140); the PillarFeatureNet family masks once
    before the PFN stack and lets BN-of-zero rows join the max
    (pointpillars.py:52-66) — both behaviors are replicated exactly.
"""

import jax.numpy as jnp
from flax import linen as nn

from .layers import LinearBNReLU
from .registry import register_vfe


def slot_mask(num_points, max_T, dtype=jnp.float32):
    """[B, V] counts -> [B, V, T, 1] validity (reference
    get_paddings_indicator, voxel_encoder.py:27-48)."""
    ids = jnp.arange(max_T).reshape(1, 1, -1)
    return (ids < num_points[..., None]).astype(dtype)[..., None]


def _cluster_offsets(voxels, num_points):
    """xyz offsets from each voxel's point-mean."""
    denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None, None]
    mean = voxels[..., :3].sum(axis=-2, keepdims=True) / denom
    return voxels[..., :3] - mean


class VFELayer(nn.Module):
    """Linear+BN+ReLU then max-pool concat (voxel_encoder.py:50-80)."""

    out_channels: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, voxel_mask, train=False):
        units = self.out_channels // 2
        pointwise = LinearBNReLU(units, self.use_norm)(
            x, mask=voxel_mask[..., None], train=train
        )
        aggregated = pointwise.max(axis=-2, keepdims=True)
        repeated = jnp.broadcast_to(
            aggregated, pointwise.shape[:-2] + (x.shape[-2], units)
        )
        return jnp.concatenate([pointwise, repeated], axis=-1)


class PFNLayer(nn.Module):
    """Pillar feature net layer (pointpillars.py:17-66)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, x, voxel_mask, train=False):
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = LinearBNReLU(units, self.use_norm)(
            x, mask=voxel_mask[..., None], train=train
        )
        x_max = x.max(axis=-2, keepdims=True)
        if self.last_layer:
            return x_max
        repeated = jnp.broadcast_to(x_max, x.shape[:-2] + (x.shape[-2], units))
        return jnp.concatenate([x, repeated], axis=-1)


@register_vfe
class VoxelFeatureExtractor(nn.Module):
    """Two VFELayers + final linear (voxel_encoder.py:82-140)."""

    num_input_features: int = 4
    use_norm: bool = True
    num_filters: tuple = (32, 128)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train=False):
        assert len(self.num_filters) == 2
        voxel_mask = num_points > 0
        mask = slot_mask(num_points, voxels.shape[-2], voxels.dtype)
        feats = [voxels, _cluster_offsets(voxels, num_points)]
        if self.with_distance:
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = VFELayer(self.num_filters[0], self.use_norm)(x, voxel_mask, train)
        x = x * mask
        x = VFELayer(self.num_filters[1], self.use_norm)(x, voxel_mask, train)
        x = x * mask
        x = LinearBNReLU(self.num_filters[1], self.use_norm)(
            x, mask=voxel_mask[..., None], train=train
        )
        x = x * mask
        return x.max(axis=-2)


@register_vfe
class VoxelFeatureExtractorV2(nn.Module):
    """Arbitrary-depth VFE stack (voxel_encoder.py:142-204)."""

    num_input_features: int = 4
    use_norm: bool = True
    num_filters: tuple = (32, 128)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train=False):
        voxel_mask = num_points > 0
        mask = slot_mask(num_points, voxels.shape[-2], voxels.dtype)
        feats = [voxels, _cluster_offsets(voxels, num_points)]
        if self.with_distance:
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        for nf in self.num_filters:
            x = VFELayer(nf, self.use_norm)(x, voxel_mask, train)
            x = x * mask
        x = LinearBNReLU(self.num_filters[-1], self.use_norm)(
            x, mask=voxel_mask[..., None], train=train
        )
        x = x * mask
        return x.max(axis=-2)


@register_vfe
class SimpleVoxel(nn.Module):
    """Mean of the voxel's points (voxel_encoder.py:206-225)."""

    num_input_features: int = 4
    use_norm: bool = True
    num_filters: tuple = (32, 128)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train=False):
        if voxels.ndim == 3:
            # host-precomputed per-voxel means [B, V, F] (the [V, T, F]
            # buffer costs a ~1.5 ms tiled-layout pass on TPU and 5x
            # the H2D bytes for what is just a mean)
            return voxels[..., : self.num_input_features]
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        return voxels[..., : self.num_input_features].sum(axis=-2) / denom


@register_vfe
class SimpleVoxelRadius(nn.Module):
    """Mean point reduced to (radius, z, intensity...)
    (voxel_encoder.py:227-255)."""

    num_input_features: int = 4
    use_norm: bool = True
    num_filters: tuple = (32, 128)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train=False):
        if voxels.ndim == 3:  # host-precomputed means [B, V, F]
            mean = voxels[..., : self.num_input_features]
        else:
            denom = jnp.maximum(
                num_points, 1).astype(voxels.dtype)[..., None]
            mean = voxels[..., : self.num_input_features].sum(
                axis=-2) / denom
        radius = jnp.linalg.norm(mean[..., :2], axis=-1, keepdims=True)
        return jnp.concatenate(
            [radius, mean[..., 2 : self.num_input_features]], axis=-1
        )


class _PillarFeatureNetBase(nn.Module):
    """Shared pillar decoration + PFN stack (pointpillars.py:67-413)."""

    num_input_features: int = 4
    use_norm: bool = True
    num_filters: tuple = (64,)
    with_distance: bool = False
    voxel_size: tuple = (0.2, 0.2, 4)
    pc_range: tuple = (0, -40, -3, 70.4, 40, 1)

    radius: bool = False
    height: bool = False
    # "Old" variant quirk (pointpillars.py:119-137): f_center is an
    # in-place view of the raw xy columns, so the decorated vector ends
    # up with xy REPLACED by the pillar-center offsets (and duplicated).
    center_replaces_xy: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords, train=False):
        voxel_mask = num_points > 0
        dtype = voxels.dtype
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.pc_range[0]
        y_offset = vy / 2 + self.pc_range[1]

        f_cluster = _cluster_offsets(voxels, num_points)
        # pillar-center offsets from zyx int coords
        px = coords[..., 2:3].astype(dtype) * vx + x_offset  # [B, V, 1]
        py = coords[..., 1:2].astype(dtype) * vy + y_offset
        f_center = jnp.stack(
            [voxels[..., 0] - px, voxels[..., 1] - py], axis=-1
        )

        if self.radius:
            r = jnp.linalg.norm(voxels[..., :2], axis=-1, keepdims=True)
            base = jnp.concatenate([r, voxels[..., 2:]], axis=-1)
        elif self.center_replaces_xy:
            base = jnp.concatenate([f_center, voxels[..., 2:]], axis=-1)
        else:
            base = voxels
        feats = [base, f_cluster, f_center]
        if self.height:
            pp_min = voxels[..., 2:3].min(axis=-2, keepdims=True)
            pp_max = voxels[..., 2:3].max(axis=-2, keepdims=True)
            feats.append(
                jnp.broadcast_to(pp_max - pp_min, voxels[..., :1].shape))
        if self.with_distance:
            feats.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = x * slot_mask(num_points, voxels.shape[-2], dtype)

        nf = list(self.num_filters)
        for i, out in enumerate(nf):
            x = PFNLayer(out, self.use_norm, last_layer=(i == len(nf) - 1))(
                x, voxel_mask, train
            )
        return x[..., 0, :]  # squeeze the pooled T axis


@register_vfe
class PillarFeatureNet(_PillarFeatureNetBase):
    pass


@register_vfe
class PillarFeatureNetOld(_PillarFeatureNetBase):
    center_replaces_xy: bool = True


@register_vfe
class PillarFeatureNetRadius(_PillarFeatureNetBase):
    radius: bool = True


@register_vfe
class PillarFeatureNetRadiusHeight(_PillarFeatureNetBase):
    radius: bool = True
    height: bool = True
