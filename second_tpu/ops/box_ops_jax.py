"""Jitted JAX twins of the core box math (device side).

Same formulas as second_tpu.core.box_ops (host numpy), kept in sync by
tests/test_ops_jax.py. These run inside the jitted train/eval step so
decode + NMS never leave the device (the reference instead copied to
CPU per frame inside NMS — box_torch_ops.py:465,503).
"""

import jax.numpy as jnp


def second_box_encode(boxes, anchors, encode_angle_to_vector=False, smooth_dim=False):
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha, ra = (anchors[..., i : i + 1] for i in range(7))
    xg, yg, zg, wg, lg, hg, rg = (boxes[..., i : i + 1] for i in range(7))
    diag = jnp.sqrt(wa**2 + la**2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    if smooth_dim:
        wt, lt, ht = wg / wa - 1, lg / la - 1, hg / ha - 1
    else:
        wt, lt, ht = jnp.log(wg / wa), jnp.log(lg / la), jnp.log(hg / ha)
    custom = [boxes[..., 7:ndim] - anchors[..., 7:ndim]] if ndim > 7 else []
    if encode_angle_to_vector:
        rot = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
    else:
        rot = [rg - ra]
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, *rot, *custom], axis=-1)


def second_box_decode(encodings, anchors, encode_angle_to_vector=False, smooth_dim=False):
    ndim = anchors.shape[-1]
    xa, ya, za, wa, la, ha, ra = (anchors[..., i : i + 1] for i in range(7))
    xt, yt, zt, wt, lt, ht = (encodings[..., i : i + 1] for i in range(6))
    diag = jnp.sqrt(wa**2 + la**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    if smooth_dim:
        wg, lg, hg = (wt + 1) * wa, (lt + 1) * la, (ht + 1) * ha
    else:
        wg, lg, hg = jnp.exp(wt) * wa, jnp.exp(lt) * la, jnp.exp(ht) * ha
    if encode_angle_to_vector:
        rtx, rty = encodings[..., 6:7], encodings[..., 7:8]
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
        rest = encodings[..., 8 : ndim + 1]
    else:
        rg = encodings[..., 6:7] + ra
        rest = encodings[..., 7:ndim]
    custom = [rest + anchors[..., 7:ndim]] if ndim > 7 else []
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg, *custom], axis=-1)


def bev_box_decode(encodings, anchors, encode_angle_to_vector=False, smooth_dim=False):
    xa, ya, wa, la, ra = (anchors[..., i : i + 1] for i in range(5))
    xt, yt, wt, lt = (encodings[..., i : i + 1] for i in range(4))
    diag = jnp.sqrt(wa**2 + la**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    if smooth_dim:
        wg, lg = (wt + 1) * wa, (lt + 1) * la
    else:
        wg, lg = jnp.exp(wt) * wa, jnp.exp(lt) * la
    if encode_angle_to_vector:
        rtx, rty = encodings[..., 4:5], encodings[..., 5:6]
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
    else:
        rg = encodings[..., 4:5] + ra
    return jnp.concatenate([xg, yg, wg, lg, rg], axis=-1)


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def center_to_corner_box2d(centers, dims, angles):
    """[N, 2]x[N, 2]x[N] -> [N, 4, 2] (same convention as host box_ops)."""
    boxes = jnp.concatenate([centers, dims, angles[..., None]], axis=-1)
    from ..core.rotated_iou import box_to_corners

    return box_to_corners(boxes, xp=jnp)


def corner_to_standup(corners):
    """[N, 4, 2] -> [N, 4] xyxy."""
    return jnp.concatenate(
        [corners.min(axis=-2), corners.max(axis=-2)], axis=-1
    )
