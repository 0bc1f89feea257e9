"""KITTI dataset IO: labels, calibs, info dicts, result formatting.

Functional port of second/data/kitti_common.py (the reference's KITTI
annotation toolbox): same info-dict schema (annotation format v2,
kitti_common.py:164-190), same label parsing (get_label_anno:627 — dims
converted hwl -> lhw camera), same difficulty rule
(add_difficulty_to_annos:543), same result-line format
(kitti_result_line:481).  Image shapes are read from the PNG header
directly (no imaging dependency).
"""

import struct
from collections import OrderedDict
from concurrent import futures
from pathlib import Path

import numpy as np


def get_image_index_str(img_idx):
    return "{:06d}".format(img_idx)


def _get_kitti_info_path(idx, prefix, info_type, file_tail, training,
                         relative_path, exist_check=True):
    img_idx_str = get_image_index_str(idx) + file_tail
    prefix = Path(prefix)
    folder = "training" if training else "testing"
    file_path = Path(folder) / info_type / img_idx_str
    if exist_check and not (prefix / file_path).exists():
        raise ValueError(f"file not exist: {file_path}")
    return str(file_path) if relative_path else str(prefix / file_path)


def get_image_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _get_kitti_info_path(idx, prefix, "image_2", ".png", training,
                                relative_path, exist_check)


def get_label_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _get_kitti_info_path(idx, prefix, "label_2", ".txt", training,
                                relative_path, exist_check)


def get_velodyne_path(idx, prefix, training=True, relative_path=True,
                      exist_check=True):
    return _get_kitti_info_path(idx, prefix, "velodyne", ".bin", training,
                                relative_path, exist_check)


def get_calib_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _get_kitti_info_path(idx, prefix, "calib", ".txt", training,
                                relative_path, exist_check)


def read_image_shape(path):
    """(height, width) from a PNG or JPEG header, no imaging library."""
    with open(path, "rb") as f:
        head = f.read(32)
        if head[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", head[16:24])
            return np.array([h, w], dtype=np.int32)
        if head[:2] == b"\xff\xd8":  # JPEG
            f.seek(2)
            while True:
                marker = f.read(2)
                if len(marker) < 2 or marker[0] != 0xFF:
                    break
                if 0xC0 <= marker[1] <= 0xCF and marker[1] not in (
                        0xC4, 0xC8, 0xCC):
                    f.read(3)
                    h, w = struct.unpack(">HH", f.read(4))
                    return np.array([h, w], dtype=np.int32)
                (size,) = struct.unpack(">H", f.read(2))
                f.seek(size - 2, 1)
    raise ValueError(f"cannot read image shape from {path}")


def get_label_anno(label_path):
    """Parse a KITTI label file into the annotation dict."""
    with open(label_path, "r") as f:
        lines = f.readlines()
    content = [line.strip().split(" ") for line in lines if line.strip()]
    annotations = {}
    num_objects = len([x[0] for x in content if x[0] != "DontCare"])
    annotations["name"] = np.array([x[0] for x in content])
    num_gt = len(annotations["name"])
    annotations["truncated"] = np.array([float(x[1]) for x in content])
    annotations["occluded"] = np.array([int(float(x[2])) for x in content])
    annotations["alpha"] = np.array([float(x[3]) for x in content])
    annotations["bbox"] = np.array(
        [[float(v) for v in x[4:8]] for x in content]).reshape(-1, 4)
    # dims: label file is hwl; standard camera format is lhw
    annotations["dimensions"] = np.array(
        [[float(v) for v in x[8:11]] for x in content]).reshape(-1, 3)[
            :, [2, 0, 1]]
    annotations["location"] = np.array(
        [[float(v) for v in x[11:14]] for x in content]).reshape(-1, 3)
    annotations["rotation_y"] = np.array(
        [float(x[14]) for x in content]).reshape(-1)
    if len(content) != 0 and len(content[0]) == 16:
        annotations["score"] = np.array([float(x[15]) for x in content])
    else:
        annotations["score"] = np.zeros((annotations["bbox"].shape[0],))
    index = list(range(num_objects)) + [-1] * (num_gt - num_objects)
    annotations["index"] = np.array(index, dtype=np.int32)
    annotations["group_ids"] = np.arange(num_gt, dtype=np.int32)
    return annotations


def get_label_annos(label_folder, image_ids=None):
    if image_ids is None:
        image_ids = sorted(
            int(p.stem) for p in Path(label_folder).glob("*.txt"))
    if not isinstance(image_ids, list):
        image_ids = list(range(image_ids))
    annos = []
    for idx in image_ids:
        label_filename = Path(label_folder) / (
            get_image_index_str(idx) + ".txt")
        annos.append(get_label_anno(label_filename))
    return annos


def empty_result_anno():
    return {
        "name": np.array([]),
        "truncated": np.array([]),
        "occluded": np.array([]),
        "alpha": np.array([]),
        "bbox": np.zeros([0, 4]),
        "dimensions": np.zeros([0, 3]),
        "location": np.zeros([0, 3]),
        "rotation_y": np.array([]),
        "score": np.array([]),
    }


def get_start_result_anno():
    return {
        "name": [],
        "truncated": [],
        "occluded": [],
        "alpha": [],
        "bbox": [],
        "dimensions": [],
        "location": [],
        "rotation_y": [],
        "score": [],
    }


def _extend_matrix(mat):
    return np.concatenate(
        [mat, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def read_calib(calib_path, extend_matrix=True):
    """Parse a KITTI calib file into the calib dict."""
    with open(calib_path, "r") as f:
        lines = f.readlines()

    def mat(line, n):
        return np.array(
            [float(v) for v in line.split(" ")[1 : n + 1]])

    P0 = mat(lines[0], 12).reshape([3, 4])
    P1 = mat(lines[1], 12).reshape([3, 4])
    P2 = mat(lines[2], 12).reshape([3, 4])
    P3 = mat(lines[3], 12).reshape([3, 4])
    R0_rect = mat(lines[4], 9).reshape([3, 3])
    Tr_velo_to_cam = mat(lines[5], 12).reshape([3, 4])
    Tr_imu_to_velo = mat(lines[6], 12).reshape([3, 4])
    if extend_matrix:
        P0, P1, P2, P3 = (
            _extend_matrix(P0), _extend_matrix(P1), _extend_matrix(P2),
            _extend_matrix(P3))
        rect_4x4 = np.zeros([4, 4], dtype=R0_rect.dtype)
        rect_4x4[3, 3] = 1.0
        rect_4x4[:3, :3] = R0_rect
        Tr_velo_to_cam = _extend_matrix(Tr_velo_to_cam)
        Tr_imu_to_velo = _extend_matrix(Tr_imu_to_velo)
    else:
        rect_4x4 = R0_rect
    return {
        "P0": P0, "P1": P1, "P2": P2, "P3": P3,
        "R0_rect": rect_4x4,
        "Tr_velo_to_cam": Tr_velo_to_cam,
        "Tr_imu_to_velo": Tr_imu_to_velo,
    }


def get_kitti_image_info(path,
                         training=True,
                         label_info=True,
                         velodyne=False,
                         calib=False,
                         image_ids=7481,
                         extend_matrix=True,
                         num_worker=8,
                         relative_path=True,
                         with_imageshape=True):
    """Build per-frame info dicts (annotation format v2)."""
    root_path = Path(path)
    if not isinstance(image_ids, list):
        image_ids = list(range(image_ids))

    def map_func(idx):
        info = {}
        pc_info = {"num_features": 4}
        image_info = {"image_idx": idx}
        annotations = None
        if velodyne:
            pc_info["velodyne_path"] = get_velodyne_path(
                idx, path, training, relative_path)
        image_info["image_path"] = get_image_path(
            idx, path, training, relative_path)
        if with_imageshape:
            img_path = image_info["image_path"]
            if relative_path:
                img_path = str(root_path / img_path)
            image_info["image_shape"] = read_image_shape(img_path)
        if label_info:
            label_path = get_label_path(idx, path, training, relative_path)
            if relative_path:
                label_path = str(root_path / label_path)
            annotations = get_label_anno(label_path)
        info["image"] = image_info
        info["point_cloud"] = pc_info
        if calib:
            calib_path = get_calib_path(
                idx, path, training, relative_path=False)
            info["calib"] = read_calib(calib_path, extend_matrix)
        if annotations is not None:
            info["annos"] = annotations
            add_difficulty_to_annos(info)
        return info

    with futures.ThreadPoolExecutor(num_worker) as executor:
        image_infos = executor.map(map_func, image_ids)
    return list(image_infos)


def add_difficulty_to_annos(info):
    """KITTI easy/moderate/hard assignment (vectorized)."""
    min_height = [40, 25, 25]
    max_occlusion = [0, 1, 2]
    max_trunc = [0.15, 0.3, 0.5]
    annos = info["annos"]
    bbox = annos["bbox"]
    height = bbox[:, 3] - bbox[:, 1]
    occlusion = np.asarray(annos["occluded"])
    truncation = np.asarray(annos["truncated"])

    def ok(level):
        return ~(
            (occlusion > max_occlusion[level])
            | (height <= min_height[level])
            | (truncation > max_trunc[level])
        )

    easy_mask, moderate_mask, hard_mask = ok(0), ok(1), ok(2)
    is_easy = easy_mask
    is_moderate = np.logical_xor(easy_mask, moderate_mask)
    is_hard = np.logical_xor(hard_mask, moderate_mask)
    diff = np.full(len(height), -1, dtype=np.int32)
    diff[is_hard] = 2
    diff[is_moderate] = 1
    diff[is_easy] = 0
    annos["difficulty"] = diff
    return diff


def kitti_result_line(result_dict, precision=4):
    prec_float = "{" + ":.{}f".format(precision) + "}"
    all_field_default = OrderedDict([
        ("name", None),
        ("truncated", -1),
        ("occluded", -1),
        ("alpha", -10),
        ("bbox", None),
        ("dimensions", [-1, -1, -1]),
        ("location", [-1000, -1000, -1000]),
        ("rotation_y", -10),
        ("score", 0.0),
    ])
    res_dict = OrderedDict((key, None) for key in all_field_default)
    for key, val in result_dict.items():
        if all_field_default[key] is None and val is None:
            raise ValueError(f"you must specify a value for {key}")
        res_dict[key] = val
    res_line = []
    for key, val in res_dict.items():
        if key == "name":
            res_line.append(val)
        elif key in ("truncated", "alpha", "rotation_y", "score"):
            res_line.append(
                str(all_field_default[key]) if val is None
                else prec_float.format(val))
        elif key == "occluded":
            res_line.append(
                str(all_field_default[key]) if val is None
                else "{}".format(val))
        elif key in ("bbox", "dimensions", "location"):
            vals = all_field_default[key] if val is None else val
            res_line += [
                str(v) if val is None else prec_float.format(v) for v in vals
            ]
        else:
            raise ValueError(f"unknown key {key}")
    return " ".join(res_line)


def annos_to_kitti_label(annos):
    return [
        kitti_result_line({
            "name": annos["name"][i],
            "truncated": annos["truncated"][i],
            "occluded": annos["occluded"][i],
            "alpha": annos["alpha"][i],
            "bbox": annos["bbox"][i],
            "dimensions": annos["dimensions"][i],
            "location": annos["location"][i],
            "rotation_y": annos["rotation_y"][i],
        })
        for i in range(len(annos["name"]))
    ]


def anno_to_rbboxes(anno):
    """camera-format [N, 7] (x, y, z, l, h, w, ry) from an anno dict."""
    loc = anno["location"]
    dims = anno["dimensions"]
    rots = anno["rotation_y"]
    return np.concatenate([loc, dims, rots[..., np.newaxis]], axis=1)


def remove_dontcare(image_anno):
    relevant = [i for i, x in enumerate(image_anno["name"]) if x != "DontCare"]
    return {
        key: (val[relevant] if isinstance(val, np.ndarray) else val)
        for key, val in image_anno.items()
    }


def keep_arrays_by_name(gt_names, used_classes):
    return np.array(
        [i for i, x in enumerate(gt_names) if x in used_classes],
        dtype=np.int64)


def drop_arrays_by_name(gt_names, used_classes):
    return np.array(
        [i for i, x in enumerate(gt_names) if x not in used_classes],
        dtype=np.int64)


def filter_kitti_anno(image_anno, used_classes, used_difficulty=None,
                      dontcare_iou=None):
    if not isinstance(used_classes, (list, tuple, np.ndarray)):
        used_classes = [used_classes]
    img_filtered = {}
    relevant = [
        i for i, x in enumerate(image_anno["name"]) if x in used_classes
    ]
    for key, val in image_anno.items():
        if isinstance(val, np.ndarray):
            img_filtered[key] = val[relevant]
        else:
            img_filtered[key] = val
    if used_difficulty is not None and "difficulty" in img_filtered:
        keep = np.isin(img_filtered["difficulty"], used_difficulty)
        for key, val in img_filtered.items():
            if isinstance(val, np.ndarray):
                img_filtered[key] = val[keep]
    return img_filtered
