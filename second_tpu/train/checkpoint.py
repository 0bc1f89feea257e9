"""Checkpoint store with the reference's JSON-manifest layout.

Mirrors torchplus/train/checkpoint.py: a ``checkpoints.json`` in the
model dir maps object names to their latest file and keeps a GC'd
history (max_to_keep).  State payloads are flax msgpack
(flax.serialization) instead of torch pickles; filenames are
``{name}-{global_step}.ckpt``.  Writes are atomic (tmp + rename)
— the TPU-native stand-in for upstream's DelayedKeyboardInterrupt.
"""

import json
import os
from pathlib import Path

from flax import serialization


def latest_checkpoint(model_dir, name):
    info_path = Path(model_dir) / "checkpoints.json"
    if not info_path.is_file():
        return None
    with open(info_path) as f:
        info = json.load(f)
    fname = info.get("latest_ckpt", {}).get(name)
    if fname is None:
        return None
    path = Path(model_dir) / fname
    return str(path) if path.is_file() else None


def save(model_dir, state, name, global_step, max_to_keep=8):
    """Serialize a pytree ``state`` under ``name`` at ``global_step``."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    info_path = model_dir / "checkpoints.json"
    fname = f"{name}-{int(global_step)}.ckpt"

    payload = serialization.to_bytes(state)
    tmp = model_dir / (fname + ".tmp")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, model_dir / fname)

    if info_path.is_file():
        with open(info_path) as f:
            info = json.load(f)
    else:
        info = {"latest_ckpt": {}, "all_ckpts": {}}
    info["latest_ckpt"][name] = fname
    all_ckpts = [
        c for c in info["all_ckpts"].get(name, []) if (model_dir / c).is_file()
    ]
    all_ckpts.append(fname)
    while len(all_ckpts) > max_to_keep:
        stale = all_ckpts.pop(0)
        try:
            os.remove(model_dir / stale)
        except OSError:
            pass
    info["all_ckpts"][name] = all_ckpts
    tmp_info = str(info_path) + ".tmp"
    with open(tmp_info, "w") as f:
        json.dump(info, f, indent=2)
    os.replace(tmp_info, info_path)
    return str(model_dir / fname)


def restore(ckpt_path, state_template):
    """Load a checkpoint into the structure of ``state_template``."""
    with open(ckpt_path, "rb") as f:
        return serialization.from_bytes(state_template, f.read())


def try_restore_latest(model_dir, name, state_template):
    """Returns (state, step) or (template, None) when nothing to restore."""
    path = latest_checkpoint(model_dir, name)
    if path is None:
        return state_template, None
    state = restore(path, state_template)
    step = int(Path(path).stem.split("-")[-1])
    return state, step


# ---------------------------------------------------------------------------
# pretrained partial load (reference second/pytorch/train.py:94-127)
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _set_path(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def restore_pretrained(ckpt_path, params, include=None, exclude=None,
                       verbose=True):
    """Copy shape-matching params from a checkpoint into ``params``.

    include/exclude: regex on the "/"-joined parameter path. Same
    filter-and-shape-match semantics as the reference's pretrained-path
    loading (train.py:187-202).
    """
    import re

    import jax
    from flax import serialization

    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    src = raw.get("params", raw)
    flat_src = _flatten(src)
    include_re = re.compile(include) if include else None
    exclude_re = re.compile(exclude) if exclude else None
    target = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    target = serialization.to_state_dict(target)
    flat_dst = _flatten(target)
    loaded = []
    for path, val in flat_src.items():
        if path not in flat_dst:
            continue
        if include_re is not None and include_re.match(path) is None:
            continue
        if exclude_re is not None and exclude_re.match(path) is not None:
            continue
        if tuple(flat_dst[path].shape) != tuple(val.shape):
            continue
        _set_path(target, path, val)
        loaded.append(path)
    if verbose:
        print(f"Restored {len(loaded)} pretrained tensors")
        for p_ in loaded:
            print("  ", p_)
    return serialization.from_state_dict(params, target)
