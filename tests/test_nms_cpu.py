"""Host NMS variants vs the reference's own kernels run in place."""

import numpy as np
import pytest


def _random_dets(rng, n):
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    w = rng.uniform(2, 20, n)
    h = rng.uniform(2, 20, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], axis=1)


def _load_reference_nms_cpu():
    import os

    from reference_torch import REFERENCE_ROOT, install_stubs

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    install_stubs()
    try:
        from second.core.non_max_suppression import nms_cpu as ref
        return ref
    except Exception:
        return None


def test_greedy_nms_vs_reference():
    ref = _load_reference_nms_cpu()
    if ref is None:
        pytest.skip("reference tree not importable")
    from second_tpu.core.nms_cpu import nms

    rng = np.random.RandomState(0)
    for trial in range(5):
        dets = _random_dets(rng, 200)
        ours = nms(dets, 0.4)
        theirs = list(ref.nms_jit(dets.copy(), 0.4, eps=1.0))
        assert ours == theirs, trial


@pytest.mark.parametrize("method", [0, 1, 2])
def test_soft_nms_vs_reference(method):
    """Our soft_nms must reproduce soft_nms_jit (nms_cpu.py:64-154):
    same surviving boxes in the same order, same decayed scores."""
    ref = _load_reference_nms_cpu()
    if ref is None:
        pytest.skip("reference tree not importable")
    from second_tpu.core.nms_cpu import soft_nms

    rng = np.random.RandomState(1 + method)
    dets = _random_dets(rng, 120)

    ref_boxes = dets.copy()
    keep_ref = ref.soft_nms_jit(
        ref_boxes, sigma=0.5, Nt=0.3, threshold=0.05, method=method)
    ref_out = ref_boxes[list(keep_ref)]  # reordered survivors + scores

    keep, kept_scores = soft_nms(
        dets[:, :4], dets[:, 4], sigma=0.5, nt=0.3, threshold=0.05,
        method=method)
    assert len(keep) == len(ref_out)
    np.testing.assert_allclose(dets[keep, :4], ref_out[:, :4], atol=1e-9)
    np.testing.assert_allclose(kept_scores, ref_out[:, 4], atol=1e-9)


def test_soft_nms_hard_equals_greedy():
    """method=0 with threshold below every score must select the same
    boxes as plain greedy NMS."""
    from second_tpu.core.nms_cpu import nms, soft_nms

    rng = np.random.RandomState(5)
    dets = _random_dets(rng, 150)
    dets[:, 4] += 0.5  # all scores > threshold
    keep_g = nms(dets, 0.3)
    keep_s, _ = soft_nms(
        dets[:, :4], dets[:, 4], nt=0.3, threshold=1e-9, method=0)
    assert keep_g == keep_s
