"""Official KITTI AP evaluation (41-point interpolated).

Behavioral port of the reference evaluator (second/utils/eval.py):
identical recall-threshold sampling (get_thresholds, eval.py:12-30),
difficulty filters (clean_data, :33-89), per-image TP/FP matching
(compute_statistics_jit, :182-299), partitioned IoU computation
(calculate_iou_partly, :362-446), 41-pt curves + 11-pt mAP subsampling
(get_mAP, :614-618), official + coco result blocks (:730-915).

The reference leans on numba + CUDA; here the pair-IoU matrices are
vectorized numpy (core.rotated_iou) and the sequential greedy matcher
runs through the C++ kernel in second_tpu.native when built, with a
pure-Python fallback (same function, same results).
"""

import io as sysio

import numpy as np

from ..core import rotated_iou


def get_thresholds(scores, num_gt, num_sample_pts=41):
    """Score thresholds that sample recall in 1/(pts-1) steps."""
    scores = np.sort(scores)[::-1]
    current_recall = 0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        if i < (len(scores) - 1):
            r_recall = (i + 2) / num_gt
        else:
            r_recall = l_recall
        if (((r_recall - current_recall) < (current_recall - l_recall))
                and (i < (len(scores) - 1))):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return thresholds


CLASS_NAMES = [
    "car", "pedestrian", "cyclist", "van", "person_sitting", "car",
    "tractor", "trailer",
    # extension beyond upstream: NuScenes classes so the kitti-style
    # NuScenes eval works for all 10 classes (upstream crashes on these)
    "bus", "construction_vehicle", "motorcycle", "bicycle", "barrier",
    "traffic_cone", "truck",
]
MIN_HEIGHT = [40, 25, 25]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.3, 0.5]


def clean_data(gt_anno, dt_anno, current_class, difficulty):
    dc_bboxes, ignored_gt, ignored_dt = [], [], []
    current_cls_name = CLASS_NAMES[current_class].lower()
    num_valid_gt = 0
    for i in range(len(gt_anno["name"])):
        bbox = gt_anno["bbox"][i]
        gt_name = gt_anno["name"][i].lower()
        height = bbox[3] - bbox[1]
        if gt_name == current_cls_name:
            valid_class = 1
        elif current_cls_name == "pedestrian" and gt_name == "person_sitting":
            valid_class = 0
        elif current_cls_name == "car" and gt_name == "van":
            valid_class = 0
        else:
            valid_class = -1
        ignore = (
            (gt_anno["occluded"][i] > MAX_OCCLUSION[difficulty])
            or (gt_anno["truncated"][i] > MAX_TRUNCATION[difficulty])
            or (height <= MIN_HEIGHT[difficulty])
        )
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if gt_anno["name"][i] == "DontCare":
            dc_bboxes.append(gt_anno["bbox"][i])
    for i in range(len(dt_anno["name"])):
        valid_class = 1 if dt_anno["name"][i].lower() == current_cls_name else -1
        height = abs(dt_anno["bbox"][i, 3] - dt_anno["bbox"][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, ignored_gt, ignored_dt, dc_bboxes


def image_box_overlap(boxes, query_boxes, criterion=-1):
    """2D image-plane overlap [N, K], areas WITHOUT +1 (KITTI style)."""
    if boxes.shape[0] == 0 or query_boxes.shape[0] == 0:
        return np.zeros((boxes.shape[0], query_boxes.shape[0]), boxes.dtype)
    iw = np.minimum(boxes[:, None, 2], query_boxes[None, :, 2]) - np.maximum(
        boxes[:, None, 0], query_boxes[None, :, 0])
    ih = np.minimum(boxes[:, None, 3], query_boxes[None, :, 3]) - np.maximum(
        boxes[:, None, 1], query_boxes[None, :, 1])
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area_n = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    area_k = (query_boxes[:, 2] - query_boxes[:, 0]) * (
        query_boxes[:, 3] - query_boxes[:, 1])
    if criterion == -1:
        ua = area_n[:, None] + area_k[None, :] - inter
    elif criterion == 0:
        ua = np.broadcast_to(area_n[:, None], inter.shape)
    elif criterion == 1:
        ua = np.broadcast_to(area_k[None, :], inter.shape)
    else:
        ua = np.ones_like(inter)
    out = np.where(inter > 0, inter / np.where(ua == 0, 1.0, ua), 0.0)
    return out.astype(boxes.dtype)


def bev_box_overlap(boxes, qboxes, criterion=-1):
    """[N, 5] x [K, 5] rotated BEV overlap."""
    if boxes.shape[0] == 0 or qboxes.shape[0] == 0:
        return np.zeros((boxes.shape[0], qboxes.shape[0]))
    return rotated_iou.rotated_iou_matrix(
        np.asarray(boxes, np.float64), np.asarray(qboxes, np.float64),
        criterion=criterion)


def box3d_overlap(boxes, qboxes, criterion=-1, z_axis=1, z_center=1.0):
    """[N, 7] x [K, 7] camera-format 3D overlap (z_axis=1 for camera)."""
    if boxes.shape[0] == 0 or qboxes.shape[0] == 0:
        return np.zeros((boxes.shape[0], qboxes.shape[0]))
    bev_axes = list(range(7))
    bev_axes.pop(z_axis + 3)
    bev_axes.pop(z_axis)
    # criterion 2 -> raw intersection area (reference nms_gpu criterion
    # semantics: ua = 1)
    rinc = rotated_iou.rotated_iou_matrix(
        np.asarray(boxes[:, bev_axes], np.float64),
        np.asarray(qboxes[:, bev_axes], np.float64),
        criterion=2)
    min_z = np.minimum(
        boxes[:, None, z_axis] + boxes[:, None, z_axis + 3] * (1 - z_center),
        qboxes[None, :, z_axis] + qboxes[None, :, z_axis + 3] * (1 - z_center))
    max_z = np.maximum(
        boxes[:, None, z_axis] - boxes[:, None, z_axis + 3] * z_center,
        qboxes[None, :, z_axis] - qboxes[None, :, z_axis + 3] * z_center)
    iw = min_z - max_z
    vol1 = boxes[:, 3] * boxes[:, 4] * boxes[:, 5]
    vol2 = qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5]
    inc = iw * rinc
    if criterion == -1:
        ua = vol1[:, None] + vol2[None, :] - inc
    elif criterion == 0:
        ua = np.broadcast_to(vol1[:, None], inc.shape)
    elif criterion == 1:
        ua = np.broadcast_to(vol2[None, :], inc.shape)
    else:
        ua = np.ones_like(inc)
    out = np.where((rinc > 0) & (iw > 0),
                   inc / np.where(ua == 0, 1.0, ua), 0.0)
    return out


NO_DETECTION = -10000000


def compute_statistics(overlaps,
                       gt_datas,
                       dt_datas,
                       ignored_gt,
                       ignored_det,
                       dc_bboxes,
                       metric,
                       min_overlap,
                       thresh=0.0,
                       compute_fp=False,
                       compute_aos=False):
    """Per-image greedy matching -> (tp, fp, fn, similarity, thresholds).

    overlaps: [num_dt, num_gt]. Faithful to the reference matcher
    (eval.py:182-299); dispatches to the native kernel when available.
    """
    from ..native import eval_native

    if eval_native.available():
        return eval_native.compute_statistics(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
            metric, min_overlap, thresh, compute_fp, compute_aos)
    return _compute_statistics_py(
        overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
        metric, min_overlap, thresh, compute_fp, compute_aos)


def _compute_statistics_py(overlaps, gt_datas, dt_datas, ignored_gt,
                           ignored_det, dc_bboxes, metric, min_overlap,
                           thresh=0.0, compute_fp=False, compute_aos=False):
    det_size = dt_datas.shape[0]
    gt_size = gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    dt_alphas = dt_datas[:, 4]
    gt_alphas = gt_datas[:, 4]
    dt_bboxes = dt_datas[:, :4]

    assigned_detection = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if dt_scores[i] < thresh:
                ignored_threshold[i] = True
    tp, fp, fn, similarity = 0, 0, 0, 0
    thresholds = np.zeros((gt_size,))
    thresh_idx = 0
    delta = np.zeros((gt_size,))
    delta_idx = 0
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned_detection[j] or \
                    ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            dt_score = dt_scores[j]
            if (not compute_fp and overlap > min_overlap
                    and dt_score > valid_detection):
                det_idx = j
                valid_detection = dt_score
            elif (compute_fp and overlap > min_overlap
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_det[j] == 0):
                max_overlap = overlap
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = False
            elif (compute_fp and overlap > min_overlap
                  and valid_detection == NO_DETECTION
                  and ignored_det[j] == 1):
                det_idx = j
                valid_detection = 1
                assigned_ignored_det = True
        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif (valid_detection != NO_DETECTION
              and (ignored_gt[i] == 1 or ignored_det[det_idx] == 1)):
            assigned_detection[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            thresholds[thresh_idx] = dt_scores[det_idx]
            thresh_idx += 1
            if compute_aos:
                delta[delta_idx] = gt_alphas[i] - dt_alphas[det_idx]
                delta_idx += 1
            assigned_detection[det_idx] = True
    if compute_fp:
        for i in range(det_size):
            if not (assigned_detection[i] or ignored_det[i] in (-1, 1)
                    or ignored_threshold[i]):
                fp += 1
        nstuff = 0
        if metric == 0 and len(dc_bboxes) > 0:
            overlaps_dt_dc = image_box_overlap(
                dt_bboxes, np.asarray(dc_bboxes), 0)
            for i in range(len(dc_bboxes)):
                for j in range(det_size):
                    if (assigned_detection[j] or ignored_det[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if overlaps_dt_dc[j, i] > min_overlap:
                        assigned_detection[j] = True
                        nstuff += 1
        fp -= nstuff
        if compute_aos:
            tmp = np.zeros((fp + delta_idx,))
            for i in range(delta_idx):
                tmp[i + fp] = (1.0 + np.cos(delta[i])) / 2.0
            similarity = np.sum(tmp) if (tp > 0 or fp > 0) else -1
    return tp, fp, fn, similarity, thresholds[:thresh_idx]


def get_split_parts(num, num_part):
    num_part = max(min(num_part, num), 1)
    same_part = num // num_part
    remain_num = num % num_part
    if remain_num == 0:
        return [same_part] * num_part
    return [same_part] * num_part + [remain_num]


def calculate_iou_partly(gt_annos, dt_annos, metric, num_parts=50,
                         z_axis=1, z_center=1.0):
    """Batched pairwise IoU over annotation parts.

    NOTE argument order quirk preserved: eval_class passes (dt, gt) so
    each per-image overlap is [num_dt, num_gt].
    """
    assert len(gt_annos) == len(dt_annos)
    total_dt_num = np.stack([len(a["name"]) for a in dt_annos], 0)
    total_gt_num = np.stack([len(a["name"]) for a in gt_annos], 0)
    num_examples = len(gt_annos)
    split_parts = get_split_parts(num_examples, num_parts)
    parted_overlaps = []
    example_idx = 0
    bev_axes = list(range(3))
    bev_axes.pop(z_axis)

    def boxes7(annos):
        loc = np.concatenate([a["location"] for a in annos], 0)
        dims = np.concatenate([a["dimensions"] for a in annos], 0)
        rots = np.concatenate([a["rotation_y"] for a in annos], 0)
        return np.concatenate([loc, dims, rots[..., np.newaxis]], axis=1)

    def boxes_bev(annos):
        loc = np.concatenate([a["location"][:, bev_axes] for a in annos], 0)
        dims = np.concatenate([a["dimensions"][:, bev_axes] for a in annos], 0)
        rots = np.concatenate([a["rotation_y"] for a in annos], 0)
        return np.concatenate([loc, dims, rots[..., np.newaxis]], axis=1)

    for num_part in split_parts:
        gt_part = gt_annos[example_idx:example_idx + num_part]
        dt_part = dt_annos[example_idx:example_idx + num_part]
        if metric == 0:
            gt_boxes = np.concatenate([a["bbox"] for a in gt_part], 0)
            dt_boxes = np.concatenate([a["bbox"] for a in dt_part], 0)
            overlap_part = image_box_overlap(gt_boxes, dt_boxes)
        elif metric == 1:
            overlap_part = bev_box_overlap(
                boxes_bev(gt_part), boxes_bev(dt_part)).astype(np.float64)
        elif metric == 2:
            overlap_part = box3d_overlap(
                boxes7(gt_part), boxes7(dt_part), z_axis=z_axis,
                z_center=z_center).astype(np.float64)
        else:
            raise ValueError("unknown metric")
        parted_overlaps.append(overlap_part)
        example_idx += num_part

    overlaps = []
    example_idx = 0
    for j, num_part in enumerate(split_parts):
        gt_num_idx, dt_num_idx = 0, 0
        for i in range(num_part):
            gt_box_num = total_gt_num[example_idx + i]
            dt_box_num = total_dt_num[example_idx + i]
            overlaps.append(
                parted_overlaps[j][gt_num_idx:gt_num_idx + gt_box_num,
                                   dt_num_idx:dt_num_idx + dt_box_num])
            gt_num_idx += gt_box_num
            dt_num_idx += dt_box_num
        example_idx += num_part
    return overlaps, parted_overlaps, total_gt_num, total_dt_num


def _prepare_data(gt_annos, dt_annos, current_class, difficulty):
    gt_datas_list, dt_datas_list = [], []
    total_dc_num = []
    ignored_gts, ignored_dets, dontcares = [], [], []
    total_num_valid_gt = 0
    for i in range(len(gt_annos)):
        num_valid_gt, ignored_gt, ignored_det, dc_bboxes = clean_data(
            gt_annos[i], dt_annos[i], current_class, difficulty)
        ignored_gts.append(np.array(ignored_gt, dtype=np.int64))
        ignored_dets.append(np.array(ignored_det, dtype=np.int64))
        if len(dc_bboxes) == 0:
            dc_bboxes = np.zeros((0, 4)).astype(np.float64)
        else:
            dc_bboxes = np.stack(dc_bboxes, 0).astype(np.float64)
        total_dc_num.append(dc_bboxes.shape[0])
        dontcares.append(dc_bboxes)
        total_num_valid_gt += num_valid_gt
        gt_datas_list.append(np.concatenate(
            [gt_annos[i]["bbox"], gt_annos[i]["alpha"][..., np.newaxis]], 1))
        dt_datas_list.append(np.concatenate([
            dt_annos[i]["bbox"], dt_annos[i]["alpha"][..., np.newaxis],
            dt_annos[i]["score"][..., np.newaxis]], 1))
    return (gt_datas_list, dt_datas_list, ignored_gts, ignored_dets,
            dontcares, np.stack(total_dc_num, axis=0), total_num_valid_gt)


def eval_class(gt_annos, dt_annos, current_classes, difficultys, metric,
               min_overlaps, compute_aos=False, z_axis=1, z_center=1.0,
               num_parts=50):
    """41-pt precision/recall curves per (class, difficulty, overlap)."""
    assert len(gt_annos) == len(dt_annos)
    num_examples = len(gt_annos)
    split_parts = get_split_parts(num_examples, num_parts)

    overlaps, parted_overlaps, total_dt_num, total_gt_num = (
        calculate_iou_partly(
            dt_annos, gt_annos, metric, num_parts, z_axis=z_axis,
            z_center=z_center))
    N_SAMPLE_PTS = 41
    num_minoverlap = len(min_overlaps)
    num_class = len(current_classes)
    num_difficulty = len(difficultys)
    precision = np.zeros(
        [num_class, num_difficulty, num_minoverlap, N_SAMPLE_PTS])
    recall = np.zeros_like(precision)
    aos = np.zeros_like(precision)
    all_thresholds = np.zeros_like(precision)
    for m, current_class in enumerate(current_classes):
        for le, difficulty in enumerate(difficultys):
            (gt_datas_list, dt_datas_list, ignored_gts, ignored_dets,
             dontcares, total_dc_num, total_num_valid_gt) = _prepare_data(
                gt_annos, dt_annos, current_class, difficulty)
            for k, min_overlap in enumerate(min_overlaps[:, metric, m]):
                thresholdss = []
                for i in range(len(gt_annos)):
                    tp, fp, fn, sim, th = compute_statistics(
                        overlaps[i], gt_datas_list[i], dt_datas_list[i],
                        ignored_gts[i], ignored_dets[i], dontcares[i],
                        metric, min_overlap=min_overlap, thresh=0.0,
                        compute_fp=False)
                    thresholdss += list(th)
                thresholds = np.array(
                    get_thresholds(np.array(thresholdss), total_num_valid_gt))
                all_thresholds[m, le, k, :len(thresholds)] = thresholds
                pr = np.zeros([len(thresholds), 4])
                from ..native import eval_native

                for i in range(len(gt_annos)):
                    if eval_native.available():
                        eval_native.fused_compute_statistics(
                            overlaps[i], gt_datas_list[i], dt_datas_list[i],
                            ignored_gts[i], ignored_dets[i], dontcares[i],
                            metric, min_overlap, thresholds, compute_aos, pr)
                        continue
                    for t, thresh in enumerate(thresholds):
                        tp, fp, fn, sim, _ = compute_statistics(
                            overlaps[i], gt_datas_list[i], dt_datas_list[i],
                            ignored_gts[i], ignored_dets[i], dontcares[i],
                            metric, min_overlap=min_overlap, thresh=thresh,
                            compute_fp=True, compute_aos=compute_aos)
                        pr[t, 0] += tp
                        pr[t, 1] += fp
                        pr[t, 2] += fn
                        if sim != -1:
                            pr[t, 3] += sim
                for i in range(len(thresholds)):
                    precision[m, le, k, i] = pr[i, 0] / (pr[i, 0] + pr[i, 1])
                    if compute_aos:
                        aos[m, le, k, i] = pr[i, 3] / (pr[i, 0] + pr[i, 1])
                for i in range(len(thresholds)):
                    precision[m, le, k, i] = np.max(
                        precision[m, le, k, i:], axis=-1)
                    if compute_aos:
                        aos[m, le, k, i] = np.max(aos[m, le, k, i:], axis=-1)
    del split_parts, parted_overlaps, total_dt_num, total_gt_num
    return {
        "recall": recall,
        "precision": precision,
        "orientation": aos,
        "thresholds": all_thresholds,
        "min_overlaps": min_overlaps,
    }


def get_mAP(prec):
    """11-pt subsample of the 41-pt curve (reference get_mAP)."""
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def do_eval(gt_annos, dt_annos, current_classes, min_overlaps,
            compute_aos=False, difficultys=(0, 1, 2), z_axis=1, z_center=1.0):
    types = ["bbox", "bev", "3d"]
    metrics = {}
    for i in range(3):
        metrics[types[i]] = eval_class(
            gt_annos, dt_annos, current_classes, difficultys, i,
            min_overlaps, compute_aos, z_axis=z_axis, z_center=z_center)
    return metrics


def print_str(value, *arg, sstream=None):
    if sstream is None:
        sstream = sysio.StringIO()
    sstream.truncate(0)
    sstream.seek(0)
    print(value, *arg, file=sstream)
    return sstream.getvalue()


CLASS_TO_NAME = {
    0: "Car",
    1: "Pedestrian",
    2: "Cyclist",
    3: "Van",
    4: "Person_sitting",
    5: "car",
    6: "tractor",
    7: "trailer",
    8: "bus",
    9: "construction_vehicle",
    10: "motorcycle",
    11: "bicycle",
    12: "barrier",
    13: "traffic_cone",
    14: "truck",
}


def _name_to_class():
    """Name -> class id, with case-insensitive aliases for names that
    only exist in one casing (e.g. NuScenes-mapped 'pedestrian')."""
    out = {v: n for n, v in CLASS_TO_NAME.items()}
    for n, v in CLASS_TO_NAME.items():
        out.setdefault(v.lower(), n)
    return out


def get_official_eval_result(gt_annos, dt_annos, current_classes,
                             difficultys=(0, 1, 2), z_axis=1, z_center=1.0):
    """Official KITTI AP blocks; same output text format as upstream."""
    overlap_mod = np.array(
        [[0.7, 0.5, 0.5, 0.7, 0.5, 0.7, 0.7, 0.7,
          0.7, 0.7, 0.5, 0.5, 0.5, 0.5, 0.7]] * 3)
    overlap_easy = np.array(
        [[0.7, 0.5, 0.5, 0.7, 0.5, 0.5, 0.5, 0.5,
          0.5, 0.5, 0.25, 0.25, 0.25, 0.25, 0.5],
         [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.5, 0.5,
          0.5, 0.5, 0.25, 0.25, 0.25, 0.25, 0.5],
         [0.5, 0.25, 0.25, 0.5, 0.25, 0.5, 0.5, 0.5,
          0.5, 0.5, 0.25, 0.25, 0.25, 0.25, 0.5]])
    min_overlaps = np.stack([overlap_mod, overlap_easy], axis=0)
    name_to_class = _name_to_class()
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    current_classes = [
        name_to_class[c] if isinstance(c, str) else c for c in current_classes
    ]
    min_overlaps = min_overlaps[:, :, current_classes]
    result = ""
    compute_aos = False
    for anno in dt_annos:
        if anno["alpha"].shape[0] != 0:
            if anno["alpha"][0] != -10:
                compute_aos = True
            break
    metrics = do_eval(
        gt_annos, dt_annos, current_classes, min_overlaps, compute_aos,
        difficultys, z_axis=z_axis, z_center=z_center)
    detail = {}
    for j, curcls in enumerate(current_classes):
        class_name = CLASS_TO_NAME[curcls]
        detail[class_name] = {}
        for i in range(min_overlaps.shape[0]):
            mAPbbox = get_mAP(metrics["bbox"]["precision"][j, :, i])
            mAPbev = get_mAP(metrics["bev"]["precision"][j, :, i])
            mAP3d = get_mAP(metrics["3d"]["precision"][j, :, i])
            detail[class_name][f"bbox@{min_overlaps[i, 0, j]:.2f}"] = (
                mAPbbox.tolist())
            detail[class_name][f"bev@{min_overlaps[i, 1, j]:.2f}"] = (
                mAPbev.tolist())
            detail[class_name][f"3d@{min_overlaps[i, 2, j]:.2f}"] = (
                mAP3d.tolist())
            result += print_str(
                (f"{class_name} "
                 "AP(Average Precision)@{:.2f}, {:.2f}, {:.2f}:".format(
                     *min_overlaps[i, :, j])))
            result += print_str(
                "bbox AP:" + ", ".join(f"{v:.2f}" for v in mAPbbox))
            result += print_str(
                "bev  AP:" + ", ".join(f"{v:.2f}" for v in mAPbev))
            result += print_str(
                "3d   AP:" + ", ".join(f"{v:.2f}" for v in mAP3d))
            if compute_aos:
                mAPaos = get_mAP(metrics["bbox"]["orientation"][j, :, i])
                detail[class_name]["aos"] = mAPaos.tolist()
                result += print_str(
                    "aos  AP:" + ", ".join(f"{v:.2f}" for v in mAPaos))
    return {"result": result, "detail": detail}


def get_coco_eval_result(gt_annos, dt_annos, current_classes, z_axis=1,
                         z_center=1.0):
    class_to_range = {
        0: [0.5, 0.95, 10],
        1: [0.25, 0.7, 10],
        2: [0.25, 0.7, 10],
        3: [0.5, 0.95, 10],
        4: [0.25, 0.7, 10],
        5: [0.5, 0.95, 10],
        6: [0.5, 0.95, 10],
        7: [0.5, 0.95, 10],
        8: [0.5, 0.95, 10],
        9: [0.5, 0.95, 10],
        10: [0.25, 0.7, 10],
        11: [0.25, 0.7, 10],
        12: [0.25, 0.7, 10],
        13: [0.25, 0.7, 10],
        14: [0.5, 0.95, 10],
    }
    name_to_class = _name_to_class()
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    current_classes = [
        name_to_class[c] if isinstance(c, str) else c for c in current_classes
    ]
    overlap_ranges = np.zeros([3, 3, len(current_classes)])
    for i, curcls in enumerate(current_classes):
        overlap_ranges[:, :, i] = np.array(
            class_to_range[curcls])[:, np.newaxis]
    compute_aos = False
    for anno in dt_annos:
        if anno["alpha"].shape[0] != 0:
            if anno["alpha"][0] != -10:
                compute_aos = True
            break
    min_overlaps = np.zeros([10, *overlap_ranges.shape[1:]])
    for i in range(overlap_ranges.shape[1]):
        for j in range(overlap_ranges.shape[2]):
            start, stop, num = overlap_ranges[:, i, j]
            min_overlaps[:, i, j] = np.linspace(start, stop, int(num))
    metrics = do_eval(
        gt_annos, dt_annos, current_classes, min_overlaps, compute_aos,
        z_axis=z_axis, z_center=z_center)
    mAP_bbox = get_mAP(metrics["bbox"]["precision"]).mean(-1)
    mAP_bev = get_mAP(metrics["bev"]["precision"]).mean(-1)
    mAP_3d = get_mAP(metrics["3d"]["precision"]).mean(-1)
    mAP_aos = (
        get_mAP(metrics["bbox"]["orientation"]).mean(-1)
        if compute_aos else None)
    result = ""
    detail = {}
    for j, curcls in enumerate(current_classes):
        class_name = CLASS_TO_NAME[curcls]
        detail[class_name] = {}
        o_range = np.array(class_to_range[curcls])[[0, 2, 1]]
        o_range[1] = (o_range[2] - o_range[0]) / (o_range[1] - 1)
        result += print_str(
            (f"{class_name} coco AP@{o_range[0]:.2f}:"
             f"{o_range[1]:.2f}:{o_range[2]:.2f}:"))
        result += print_str(
            f"bbox AP:{mAP_bbox[j, 0]:.2f}, {mAP_bbox[j, 1]:.2f}, "
            f"{mAP_bbox[j, 2]:.2f}")
        result += print_str(
            f"bev  AP:{mAP_bev[j, 0]:.2f}, {mAP_bev[j, 1]:.2f}, "
            f"{mAP_bev[j, 2]:.2f}")
        result += print_str(
            f"3d   AP:{mAP_3d[j, 0]:.2f}, {mAP_3d[j, 1]:.2f}, "
            f"{mAP_3d[j, 2]:.2f}")
        detail[class_name]["bbox"] = mAP_bbox[j].tolist()
        detail[class_name]["bev"] = mAP_bev[j].tolist()
        detail[class_name]["3d"] = mAP_3d[j].tolist()
        if compute_aos:
            detail[class_name]["aos"] = mAP_aos[j].tolist()
            result += print_str(
                f"aos  AP:{mAP_aos[j, 0]:.2f}, {mAP_aos[j, 1]:.2f}, "
                f"{mAP_aos[j, 2]:.2f}")
    return {"result": result, "detail": detail}
