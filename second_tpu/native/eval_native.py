"""ctypes bindings for the native KITTI-eval matcher."""

import ctypes

import numpy as np

from .build import load_lib

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    lib = load_lib()
    if lib is None:
        return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    lib.compute_statistics.argtypes = [
        c_double_p, ctypes.c_int64, ctypes.c_int64, c_double_p, c_double_p,
        c_int64_p, c_int64_p, c_double_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        c_int64_p, c_double_p, c_double_p, c_int64_p,
    ]
    lib.fused_compute_statistics.argtypes = [
        c_double_p, ctypes.c_int64, ctypes.c_int64, c_double_p, c_double_p,
        c_int64_p, c_int64_p, c_double_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, c_double_p, ctypes.c_int64, ctypes.c_int64,
        c_double_p,
    ]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _prep(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes):
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    gt_datas = np.ascontiguousarray(gt_datas, np.float64)
    dt_datas = np.ascontiguousarray(dt_datas, np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc = np.ascontiguousarray(
        dc_bboxes if len(dc_bboxes) else np.zeros((0, 4)), np.float64)
    return overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_aos=False):
    lib = _load()
    overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc = _prep(
        overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes)
    num_dt, num_gt = dt_datas.shape[0], gt_datas.shape[0]
    counts = np.zeros(3, np.int64)
    sim = ctypes.c_double(0.0)
    th = np.zeros(max(num_gt, 1), np.float64)
    nth = ctypes.c_int64(0)
    lib.compute_statistics(
        _dp(overlaps), num_dt, num_gt, _dp(gt_datas), _dp(dt_datas),
        _ip(ignored_gt), _ip(ignored_det), _dp(dc), dc.shape[0],
        int(metric), float(min_overlap), float(thresh), int(compute_fp),
        int(compute_aos), _ip(counts), ctypes.byref(sim), _dp(th),
        ctypes.byref(nth))
    return (int(counts[0]), int(counts[1]), int(counts[2]), sim.value,
            th[: nth.value])


def fused_compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt,
                             ignored_det, dc_bboxes, metric, min_overlap,
                             thresholds, compute_aos, pr):
    """Accumulate one image's stats across all thresholds into pr [T, 4]."""
    lib = _load()
    overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc = _prep(
        overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    lib.fused_compute_statistics(
        _dp(overlaps), dt_datas.shape[0], gt_datas.shape[0], _dp(gt_datas),
        _dp(dt_datas), _ip(ignored_gt), _ip(ignored_det), _dp(dc),
        dc.shape[0], int(metric), float(min_overlap), _dp(thresholds),
        thresholds.shape[0], int(compute_aos), _dp(pr))
