// Native host kernels for second_tpu.
//
// Replaces the reference's numba-JIT CPU hot loops (there is no numba in
// the TPU image) and the external spconv C++ voxelizer:
//   * compute_statistics / fused_compute_statistics: the sequential
//     greedy TP/FP matcher of the official KITTI evaluator
//     (reference second/utils/eval.py:182-341).
//   * points_to_voxel: first-come-first-serve voxelization
//     (reference spconv VoxelGeneratorV2 semantics, called from
//     second/data/preprocess.py:302-315).
//
// Build: g++ -O3 -shared -fPIC (see second_tpu/native/build.py). Plain C
// ABI so ctypes can bind without pybind11.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KITTI eval matcher
// ---------------------------------------------------------------------------

static const double NO_DETECTION = -10000000.0;

// image-plane overlap of one dt bbox against one dc bbox, criterion 0
// (intersection / dt area), KITTI convention without +1.
static double dt_dc_overlap(const double* dt_bbox, const double* dc_bbox) {
  double iw = std::fmin(dt_bbox[2], dc_bbox[2]) -
              std::fmax(dt_bbox[0], dc_bbox[0]);
  if (iw <= 0) return 0.0;
  double ih = std::fmin(dt_bbox[3], dc_bbox[3]) -
              std::fmax(dt_bbox[1], dc_bbox[1]);
  if (ih <= 0) return 0.0;
  double area = (dt_bbox[2] - dt_bbox[0]) * (dt_bbox[3] - dt_bbox[1]);
  if (area == 0) return 0.0;
  return iw * ih / area;
}

// One image, one threshold. overlaps is [num_dt, num_gt] row-major.
// gt_datas: [num_gt, 5] (bbox, alpha); dt_datas: [num_dt, 6]
// (bbox, alpha, score). Outputs: counts[3] = tp, fp, fn; similarity;
// thresholds buffer (size >= num_gt) + count.
void compute_statistics(const double* overlaps, int64_t num_dt,
                        int64_t num_gt, const double* gt_datas,
                        const double* dt_datas, const int64_t* ignored_gt,
                        const int64_t* ignored_det, const double* dc_bboxes,
                        int64_t num_dc, int64_t metric, double min_overlap,
                        double thresh, int64_t compute_fp,
                        int64_t compute_aos, int64_t* counts,
                        double* similarity, double* out_thresholds,
                        int64_t* out_num_thresholds) {
  std::vector<char> assigned(num_dt, 0);
  std::vector<char> ignored_threshold(num_dt, 0);
  if (compute_fp) {
    for (int64_t i = 0; i < num_dt; ++i) {
      if (dt_datas[i * 6 + 5] < thresh) ignored_threshold[i] = 1;
    }
  }
  int64_t tp = 0, fp = 0, fn = 0;
  double sim = 0.0;
  std::vector<double> delta;
  delta.reserve(num_gt);
  int64_t thresh_idx = 0;

  for (int64_t i = 0; i < num_gt; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;
    for (int64_t j = 0; j < num_dt; ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
        continue;
      double overlap = overlaps[j * num_gt + i];
      double dt_score = dt_datas[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap &&
          dt_score > valid_detection) {
        det_idx = j;
        valid_detection = dt_score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      fn += 1;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DETECTION) {
      tp += 1;
      out_thresholds[thresh_idx++] = dt_datas[det_idx * 6 + 5];
      if (compute_aos) {
        delta.push_back(gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4]);
      }
      assigned[det_idx] = 1;
    }
  }
  if (compute_fp) {
    for (int64_t j = 0; j < num_dt; ++j) {
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]))
        fp += 1;
    }
    int64_t nstuff = 0;
    if (metric == 0 && num_dc > 0) {
      for (int64_t i = 0; i < num_dc; ++i) {
        for (int64_t j = 0; j < num_dt; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ignored_threshold[j])
            continue;
          if (dt_dc_overlap(&dt_datas[j * 6], &dc_bboxes[i * 4]) >
              min_overlap) {
            assigned[j] = 1;
            nstuff += 1;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      if (tp > 0 || fp > 0) {
        sim = 0.0;
        for (double d : delta) sim += (1.0 + std::cos(d)) / 2.0;
      } else {
        sim = -1.0;
      }
    }
  }
  counts[0] = tp;
  counts[1] = fp;
  counts[2] = fn;
  *similarity = sim;
  *out_num_thresholds = thresh_idx;
}

// One image across all thresholds; accumulates into pr [num_thresh, 4].
void fused_compute_statistics(const double* overlaps, int64_t num_dt,
                              int64_t num_gt, const double* gt_datas,
                              const double* dt_datas,
                              const int64_t* ignored_gt,
                              const int64_t* ignored_det,
                              const double* dc_bboxes, int64_t num_dc,
                              int64_t metric, double min_overlap,
                              const double* thresholds, int64_t num_thresh,
                              int64_t compute_aos, double* pr) {
  std::vector<double> th_buf(num_gt > 0 ? num_gt : 1);
  for (int64_t t = 0; t < num_thresh; ++t) {
    int64_t counts[3];
    double sim;
    int64_t nth;
    compute_statistics(overlaps, num_dt, num_gt, gt_datas, dt_datas,
                       ignored_gt, ignored_det, dc_bboxes, num_dc, metric,
                       min_overlap, thresholds[t], 1, compute_aos, counts,
                       &sim, th_buf.data(), &nth);
    pr[t * 4 + 0] += counts[0];
    pr[t * 4 + 1] += counts[1];
    pr[t * 4 + 2] += counts[2];
    if (sim != -1.0) pr[t * 4 + 3] += sim;
  }
}

// ---------------------------------------------------------------------------
// FCFS voxelizer
// ---------------------------------------------------------------------------

// coor_to_voxelidx: workspace [nz*ny*nx] pre-filled with -1 on first use;
// this function restores touched entries before returning.
// Returns number of voxels produced (<= max_voxels). Voxels beyond
// max_voxels and points beyond max_points are dropped (FCFS).
int64_t points_to_voxel(const float* points, int64_t num_points,
                        int64_t num_features, const float* voxel_size,
                        const float* coors_range, int64_t max_points,
                        int64_t max_voxels, int64_t nx, int64_t ny,
                        int64_t nz, float* voxels, int32_t* coors,
                        int32_t* num_points_per_voxel,
                        int32_t* coor_to_voxelidx) {
  int64_t voxel_num = 0;
  for (int64_t p = 0; p < num_points; ++p) {
    const float* pt = &points[p * num_features];
    int64_t cx = (int64_t)std::floor((pt[0] - coors_range[0]) / voxel_size[0]);
    int64_t cy = (int64_t)std::floor((pt[1] - coors_range[1]) / voxel_size[1]);
    int64_t cz = (int64_t)std::floor((pt[2] - coors_range[2]) / voxel_size[2]);
    if (cx < 0 || cx >= nx || cy < 0 || cy >= ny || cz < 0 || cz >= nz)
      continue;
    int64_t lin = cz * (ny * nx) + cy * nx + cx;
    int32_t vid = coor_to_voxelidx[lin];
    if (vid == -1) {
      if (voxel_num >= max_voxels) continue;
      vid = (int32_t)voxel_num++;
      coor_to_voxelidx[lin] = vid;
      coors[vid * 3 + 0] = (int32_t)cz;
      coors[vid * 3 + 1] = (int32_t)cy;
      coors[vid * 3 + 2] = (int32_t)cx;
      num_points_per_voxel[vid] = 0;
    }
    int32_t n = num_points_per_voxel[vid];
    if (n < max_points) {
      std::memcpy(&voxels[(vid * max_points + n) * num_features], pt,
                  sizeof(float) * num_features);
      num_points_per_voxel[vid] = n + 1;
    }
  }
  // restore workspace
  for (int64_t v = 0; v < voxel_num; ++v) {
    int64_t cz = coors[v * 3 + 0], cy = coors[v * 3 + 1],
            cx = coors[v * 3 + 2];
    coor_to_voxelidx[cz * (ny * nx) + cy * nx + cx] = -1;
  }
  return voxel_num;
}

}  // extern "C"
