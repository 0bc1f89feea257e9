"""Import reference torch checkpoints (.tckpt) into this framework.

The reference saves plain ``state_dict`` files via torchplus
(torchplus/train/checkpoint.py:52-111, train.py:380-381). This tool
maps those tensors onto our flax variable tree:

  * torch Conv2d OIHW             -> flax Conv HWIO   (transpose 2,3,1,0)
  * torch ConvTranspose2d IOHW    -> flax ConvTranspose HWIO
                                     (transpose 2,3,0,1)
  * torch Linear [out, in]        -> flax Dense [in, out]
  * spconv [kz, ky, kx, ci, co]   -> ours [K, ci, co] (reshape; same
                                     C-order offset enumeration)
  * BatchNorm weight/bias/running_mean/running_var
                                  -> scale/bias + batch_stats mean/var

Covered modules: PillarFeatureNet family + VFE/VFELayer (pfn_layers /
vfe1 / vfe2 / linear+norm), the SpMiddle* family (middle_conv
sequential), RPN/RPNV2 blocks+deblocks+heads. Layer correspondence is
structural (sorted module indices zipped against our enumeration), so
every reference config's zoo maps without per-config tables.

CLI:
    python -m second_tpu.utils.checkpoint_import \
        --config_path=X.config --tckpt_path=voxelnet-123.tckpt \
        --model_dir=OUT
"""

import re
from collections import defaultdict

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _to_np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


_BN_PARTS = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("stats", "mean"),
    "running_var": ("stats", "var"),
}


class _Assign:
    """Collects (collection, flax-path) <- numpy assignments."""

    def __init__(self, params, stats):
        self.params = params
        self.stats = stats
        self.used = []
        self.missing = []

    def put(self, coll, path, value):
        tgt = self.params if coll == "params" else self.stats
        if path not in tgt:
            self.missing.append("/".join(path))
            return
        expect = tgt[path].shape
        if tuple(value.shape) != tuple(expect):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: checkpoint "
                f"{value.shape} vs model {expect}")
        tgt[path] = value.astype(np.asarray(tgt[path]).dtype)
        self.used.append("/".join(path))

    def put_bn(self, flax_prefix, torch_items):
        """torch_items: dict part -> tensor for one BatchNorm."""
        for part, tensor in torch_items.items():
            if part not in _BN_PARTS:  # num_batches_tracked etc.
                continue
            coll, leaf = _BN_PARTS[part]
            self.put(coll, flax_prefix + (leaf,), _to_np(tensor))


def _conv_oihw(t):
    return _to_np(t).transpose(2, 3, 1, 0)


def _convtranspose_iohw(t):
    # flax ConvTranspose (transpose_kernel=False) computes the true
    # fractionally-strided conv; matching torch's gradient-of-conv
    # semantics needs HWIO plus a spatial flip (verified numerically
    # in tests/test_checkpoint_import.py)
    w = _to_np(t).transpose(2, 3, 0, 1)
    return np.ascontiguousarray(w[::-1, ::-1])


def _linear(t):
    return _to_np(t).transpose(1, 0)


def _group_sequential(state_dict, prefix):
    """prefix.{idx}.{leaf...} -> {idx: {leaf: tensor}} sorted by idx."""
    groups = defaultdict(dict)
    plen = len(prefix) + 1
    for key, t in state_dict.items():
        if not key.startswith(prefix + "."):
            continue
        rest = key[plen:]
        idx_str, leaf = rest.split(".", 1)
        groups[int(idx_str)][leaf] = t
    return [groups[i] for i in sorted(groups)]


def _map_linear_bn_relu(asg, flax_prefix, linear_w, norm):
    asg.put("params", flax_prefix + ("Dense_0", "kernel"), _linear(linear_w))
    asg.put_bn(flax_prefix + ("MaskedBatchNorm_0",), norm)


def _collect_norm(state_dict, prefix):
    return {
        part: state_dict[f"{prefix}.{part}"]
        for part in _BN_PARTS
        if f"{prefix}.{part}" in state_dict
    }


def _map_vfe(asg, state_dict):
    sd = state_dict
    base = "voxel_feature_extractor"
    # PillarFeatureNet family: pfn_layers.{i}.linear + .norm
    i = 0
    while f"{base}.pfn_layers.{i}.linear.weight" in sd:
        _map_linear_bn_relu(
            asg,
            ("voxel_feature_extractor", f"PFNLayer_{i}", "LinearBNReLU_0"),
            sd[f"{base}.pfn_layers.{i}.linear.weight"],
            _collect_norm(sd, f"{base}.pfn_layers.{i}.norm"))
        i += 1
    # VFE v1: vfe1/vfe2 (VFELayer); v2: vfe_layers ModuleList; both
    # with a trailing linear+norm
    for j, name in enumerate(("vfe1", "vfe2")):
        if f"{base}.{name}.linear.weight" in sd:
            _map_linear_bn_relu(
                asg,
                ("voxel_feature_extractor", f"VFELayer_{j}",
                 "LinearBNReLU_0"),
                sd[f"{base}.{name}.linear.weight"],
                _collect_norm(sd, f"{base}.{name}.norm"))
    j = 0
    while f"{base}.vfe_layers.{j}.linear.weight" in sd:
        _map_linear_bn_relu(
            asg,
            ("voxel_feature_extractor", f"VFELayer_{j}", "LinearBNReLU_0"),
            sd[f"{base}.vfe_layers.{j}.linear.weight"],
            _collect_norm(sd, f"{base}.vfe_layers.{j}.norm"))
        j += 1
    if f"{base}.linear.weight" in sd:
        _map_linear_bn_relu(
            asg, ("voxel_feature_extractor", "LinearBNReLU_0"),
            sd[f"{base}.linear.weight"],
            _collect_norm(sd, f"{base}.norm"))


def _map_middle(asg, state_dict, param_paths):
    """spconv middle_conv sequential -> subm{li}_w / down{li}_w / bn{li}.

    Conv weights and BN groups are zipped against our topology order —
    both sides enumerate the same op sequence.
    """
    seq = _group_sequential(state_dict, "middle_feature_extractor.middle_conv")
    convs = [g["weight"] for g in seq if "weight" in g and g["weight"].dim() == 5]
    bns = [g for g in seq if "running_mean" in g]
    my_convs = sorted(
        (p for p in param_paths
         if p[0] == "middle_feature_extractor" and p[-1].endswith("_w")),
        key=lambda p: int(re.search(r"(\d+)_w$", p[-1]).group(1)))
    my_bns = sorted(
        {p[:-1] for p in param_paths
         if p[0] == "middle_feature_extractor" and p[-2].startswith("bn")},
        key=lambda p: int(p[-1][2:]))
    if len(convs) != len(my_convs):
        raise ValueError(
            f"middle conv count mismatch: checkpoint {len(convs)} "
            f"vs model {len(my_convs)}")
    for w, path in zip(convs, my_convs):
        wnp = _to_np(w)
        k = wnp.shape[0] * wnp.shape[1] * wnp.shape[2]
        asg.put("params", path, wnp.reshape(k, wnp.shape[3], wnp.shape[4]))
    for bn, path in zip(bns, my_bns):
        asg.put_bn(path, bn)


def _map_rpn(asg, state_dict, param_paths):
    """blocks/deblocks: structural zip per block index; heads direct."""
    sd = state_dict
    # our ConvBNReLU enumeration order: block0, deblock0, block1, ...
    my_units = sorted(
        {p[1] for p in param_paths
         if p[0] == "rpn" and p[1].startswith("ConvBNReLU_")},
        key=lambda s: int(s.split("_")[1]))
    my_kinds = {}
    for unit in my_units:
        kinds = {p[2] for p in param_paths if p[0] == "rpn" and p[1] == unit}
        my_kinds[unit] = (
            "ConvTranspose_0" if "ConvTranspose_0" in kinds else "Conv_0")

    # torch side: interleave blocks.{b} convs then deblocks.{b}
    n_blocks = len({
        int(m.group(1)) for k in sd
        if (m := re.match(r"rpn\.blocks\.(\d+)\.", k))})
    torch_units = []  # list of (conv_weight, bn_group, is_transpose)
    for b in range(n_blocks):
        seq = _group_sequential(sd, f"rpn.blocks.{b}")
        convs = [g["weight"] for g in seq
                 if "weight" in g and g["weight"].dim() == 4]
        bns = [g for g in seq if "running_mean" in g]
        torch_units.extend(
            (w, bn, False) for w, bn in zip(convs, bns))
        dseq = _group_sequential(sd, f"rpn.deblocks.{b}")
        dconvs = [g["weight"] for g in dseq
                  if "weight" in g and g["weight"].dim() == 4]
        dbns = [g for g in dseq if "running_mean" in g]
        torch_units.extend(
            (w, bn, True) for w, bn in zip(dconvs, dbns))
    if len(torch_units) != len(my_units):
        raise ValueError(
            f"rpn conv count mismatch: checkpoint {len(torch_units)} "
            f"vs model {len(my_units)}")
    for (w, bn, is_deblock), unit in zip(torch_units, my_units):
        kind = my_kinds[unit]
        if kind == "ConvTranspose_0":
            asg.put("params", ("rpn", unit, kind, "kernel"),
                    _convtranspose_iohw(w))
        else:
            asg.put("params", ("rpn", unit, kind, "kernel"), _conv_oihw(w))
        asg.put_bn(("rpn", unit, "MaskedBatchNorm_0"), bn)

    for head in ("conv_cls", "conv_box", "conv_dir_cls"):
        if f"rpn.{head}.weight" in sd:
            asg.put("params", ("rpn", head, "kernel"),
                    _conv_oihw(sd[f"rpn.{head}.weight"]))
            asg.put("params", ("rpn", head, "bias"),
                    _to_np(sd[f"rpn.{head}.bias"]))


def import_state_dict(state_dict, variables):
    """Map a reference torch state_dict onto flax ``variables``.

    Returns (new_variables, report) where report lists used / unmapped
    torch keys and untouched flax leaves.
    """
    params = _flatten(variables["params"])
    stats = _flatten(variables.get("batch_stats", {}))
    asg = _Assign(dict(params), dict(stats))
    _map_vfe(asg, state_dict)
    _map_middle(asg, state_dict, list(params))
    _map_rpn(asg, state_dict, list(params))

    consumed_prefixes = (
        "voxel_feature_extractor.", "middle_feature_extractor.", "rpn.")
    skipped = [
        k for k in state_dict
        if not k.startswith(consumed_prefixes)
        or "num_batches_tracked" in k or k == "global_step"]
    new_vars = {"params": _unflatten(asg.params)}
    if asg.stats:
        new_vars["batch_stats"] = _unflatten(asg.stats)
    report = {
        "assigned": sorted(asg.used),
        "missing_targets": sorted(asg.missing),
        "skipped_torch_keys": sorted(skipped),
    }
    return new_vars, report


def import_tckpt(config_path, tckpt_path, model_dir, step=0):
    """Load a reference .tckpt and write a framework checkpoint."""
    import jax
    import torch

    from ..builders import build_network
    from ..train import checkpoint as ckpt_lib
    from ..train import optimizer as opt_builder
    from ..train.state import TrainState
    from .config_tool import read_config

    cfg = read_config(config_path)
    parts = build_network(cfg.model.second)
    net, gen = parts["net"], parts["voxel_generator"]
    T = gen.max_num_points_per_voxel
    nf = cfg.model.second.num_point_features
    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, T, nf), np.float32),
        np.zeros((1, 64), np.int32),
        np.full((1, 64, 3), -1, np.int32))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    state_dict = torch.load(tckpt_path, map_location="cpu")
    new_vars, report = import_state_dict(state_dict, variables)
    for k in report["missing_targets"]:
        print("WARNING: no model target for", k)
    for k in report["skipped_torch_keys"]:
        print("skipped torch key:", k)
    print(f"assigned {len(report['assigned'])} tensors")
    tx, _, _ = opt_builder.build(
        cfg.train_config.optimizer, cfg.train_config.steps)
    state = TrainState.create(new_vars, tx)
    state = state.replace(global_step=np.asarray(step, np.int32))
    ckpt_lib.save(model_dir, state, "voxelnet", step)
    return report


def main():
    from .fire_lite import fire

    fire({"import_tckpt": import_tckpt})


if __name__ == "__main__":
    main()
