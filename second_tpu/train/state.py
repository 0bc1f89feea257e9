"""Train state + jitted step factories."""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.voxelnet import compute_loss, predict


def make_voxelizer_fn(voxel_generator, max_voxels):
    """Static device-voxelization closure for step factories: maps a
    padded point batch ("points" [B, N, F] + "points_count" [B, 1]) to
    (voxels, num_points, coords) inside the jitted step (twin of the
    host C++ voxelizer; equivalence-tested in test_voxelizer)."""
    from ..ops.voxelize import voxelize

    voxel_size = tuple(float(v) for v in voxel_generator.voxel_size)
    range_min = tuple(
        float(v) for v in voxel_generator.point_cloud_range[:3])
    grid = tuple(int(v) for v in voxel_generator.grid_size)
    t = int(voxel_generator.max_num_points_per_voxel)
    full_mean = bool(getattr(voxel_generator, "full_mean", False))

    pc_range = tuple(float(v) for v in voxel_generator.point_cloud_range)

    def fn(points, points_count):
        if points.dtype == jnp.int16:
            # int16-quantized points (data/point_quant.py affine)
            from ..data.point_quant import ranges

            lo, hi = ranges(pc_range, points.shape[-1])
            lo, hi = jnp.asarray(lo), jnp.asarray(hi)
            points = ((points.astype(jnp.float32) + 32768.0) / 65535.0
                      ) * (hi - lo) + lo

        def one(p, c):
            voxels, coords, counts, _ = voxelize(
                p, c[0], voxel_size, range_min, grid_size=grid,
                max_voxels=int(max_voxels), max_points_per_voxel=t,
                full_mean=full_mean)
            return voxels, counts, coords

        return jax.vmap(one)(points, points_count)

    return fn


def _network_inputs(example, voxelizer):
    pts = example.get("points", example.get("points_q"))
    if pts is not None:
        assert voxelizer is not None, (
            "example ships raw points; build the step with "
            "voxelizer=make_voxelizer_fn(...)")
        return voxelizer(pts, example["points_count"])
    return (example["voxels"], example["num_points"],
            example["coordinates"])


def _expand_targets(example, code_size):
    """Reconstruct dense labels/reg_targets from the compact H2D form
    (int8 labels + sparse positive rows, preprocess.py compact_targets)
    inside the jitted step."""
    if "labels_i8" not in example:
        return example
    ex = dict(example)
    labels = ex.pop("labels_i8").astype(jnp.int32)
    pos_idx = ex.pop("pos_idx")
    pos_tgt = ex.pop("pos_targets")
    ex.pop("pos_count")
    b, a = labels.shape

    def scatter(idx, tgt):
        return jnp.zeros((a, code_size), tgt.dtype).at[idx].set(
            tgt, mode="drop")

    ex["labels"] = labels
    ex["reg_targets"] = jax.vmap(scatter)(pos_idx, pos_tgt)
    return ex


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    global_step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            global_step=jnp.zeros((), jnp.int32),
        )


def make_train_step(net, spec, tx, mesh=None, voxelizer=None):
    """Returns a jitted (state, example) -> (state, metrics) step.

    example: dict with voxels [B, V, T, F], num_points [B, V],
    coords [B, V, 3] (or "points" [B, N, F] + "points_count" when built
    with a ``voxelizer`` — device-side voxelization), anchors
    [B, A, 7+], labels [B, A], reg_targets [B, A, code], importance
    [B, A] (optional).
    When a mesh is given, the batch is sharded over its 'data' axis and
    state is replicated; XLA inserts the grad all-reduce.
    """

    def step(state, example):
        example = _expand_targets(example, spec.box_code_size)
        plan = {k: v for k, v in example.items()
                if k.startswith("plan_")}
        voxels, num_points, coords = _network_inputs(example, voxelizer)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, updated = net.apply(
                variables,
                voxels,
                num_points,
                coords,
                train=True,
                sparse_plan=plan or None,
                mutable=["batch_stats"],
            )
            res = compute_loss(spec, preds, example)
            return res["loss"], (res, updated["batch_stats"])

        (loss, (res, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            global_step=state.global_step + 1,
        )
        metrics = {
            "loss": loss,
            "cls_loss": res["cls_loss_reduced"],
            "loc_loss": res["loc_loss_reduced"],
            "cls_pos_loss": res["cls_pos_loss"],
            "cls_neg_loss": res["cls_neg_loss"],
            "num_pos": (example["labels"] > 0).sum(),
            "num_neg": (example["labels"] == 0).sum(),
        }
        if "dir_loss_reduced" in res:
            metrics["dir_loss"] = res["dir_loss_reduced"]
        from ..utils.metrics import classification_metrics

        metrics["cls_stats"] = classification_metrics(
            res["cls_preds"], example["labels"],
            encode_background_as_zeros=spec.encode_background_as_zeros)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=0)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def make_eval_step(net, spec, mesh=None, voxelizer=None, flat_pp=None):
    """Returns a jitted (state, example) -> fixed-size detections fn.

    flat_pp: optional dict(gen=..., model_cfg=..., max_voxels=...) —
    run PillarFeatureNet-family inference through the flat pillar path
    (models/pp_fast.py: no [V, T, F] buffer) on point-shipping
    examples; requires ``voxelizer`` examples ("points"/"points_q").
    """

    def step(state, example):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        pts = example.get("points", example.get("points_q"))
        if flat_pp is not None and pts is not None:
            from ..models import pp_fast

            if pts.dtype == jnp.int16:
                from ..data.point_quant import ranges

                gen = flat_pp["gen"]
                lo, hi = ranges(
                    tuple(float(v)
                          for v in gen.point_cloud_range), pts.shape[-1])
                pts = ((pts.astype(jnp.float32) + 32768.0) / 65535.0
                       ) * (jnp.asarray(hi) - jnp.asarray(lo))                     + jnp.asarray(lo)
            extra = {k: v for k, v in example.items()
                     if k in ("anchors_mask",)}
            return pp_fast.pointpillars_infer(
                variables, net, spec, predict, example["anchors"],
                pts, example["points_count"][:, 0],
                gen=flat_pp["gen"], model_cfg=flat_pp["model_cfg"],
                max_voxels=flat_pp["max_voxels"],
                predict_example=extra)
        plan = {k: v for k, v in example.items()
                if k.startswith("plan_")}
        voxels, num_points, coords = _network_inputs(example, voxelizer)
        preds = net.apply(
            variables,
            voxels,
            num_points,
            coords,
            train=False,
            sparse_plan=plan or None,
        )
        return predict(spec, preds, example)

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=data)
