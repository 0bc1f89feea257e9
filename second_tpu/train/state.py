"""Train state + jitted step factories."""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.voxelnet import compute_loss, predict


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


def make_train_step(net, spec, tx, mesh=None):
    """Returns a jitted (state, example) -> (state, metrics) step.

    example: dict with voxels [B, V, T, F], num_points [B, V],
    coords [B, V, 3], anchors [B, A, 7+], labels [B, A],
    reg_targets [B, A, code], importance [B, A] (optional).
    When a mesh is given, the batch is sharded over its 'data' axis and
    state is replicated; XLA inserts the grad all-reduce.
    """

    def step(state, example):
        plan = {k: v for k, v in example.items()
                if k.startswith("plan_")}

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, updated = net.apply(
                variables,
                example["voxels"],
                example["num_points"],
                example["coordinates"],
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


def make_eval_step(net, spec, mesh=None):
    """Returns a jitted (state, example) -> fixed-size detections fn."""

    def step(state, example):
        plan = {k: v for k, v in example.items()
                if k.startswith("plan_")}
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        preds = net.apply(
            variables,
            example["voxels"],
            example["num_points"],
            example["coordinates"],
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
