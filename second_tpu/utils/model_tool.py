"""Misc model-dir utilities (reference second/utils/model_tool.py,
merge_result.py, check.py)."""

import pickle
import shutil
from pathlib import Path

import numpy as np


def remove_invalid_model_dir(directory):
    """Delete model dirs that never produced a checkpoint
    (reference model_tool.py:5)."""
    directory = Path(directory)
    removed = []
    for p in directory.iterdir():
        if not p.is_dir():
            continue
        if not (p / "checkpoints.json").is_file():
            shutil.rmtree(str(p))
            removed.append(str(p))
    return removed


def merge_results(result_paths, output_path):
    """Concatenate several result.pkl detection lists
    (reference merge_result.py:5)."""
    detections = []
    for p in result_paths:
        with open(p, "rb") as f:
            detections += pickle.load(f)
    with open(output_path, "wb") as f:
        pickle.dump(detections, f)
    return len(detections)


def shape_mergeable(x, expected_shape):
    """Whether shape x broadcasts onto expected_shape (None = any;
    reference utils/check.py)."""
    mergeable = True
    if isinstance(x, (list, tuple)):
        x_shape = list(x)
    elif isinstance(x, np.ndarray):
        x_shape = list(x.shape)
    else:
        return False
    if len(x_shape) != len(expected_shape):
        return False
    for s, s_ex in zip(x_shape, expected_shape):
        if s_ex is not None and s != s_ex:
            mergeable = False
    return mergeable
