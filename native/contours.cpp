// Native contour tracing + polygon rasterization.
//
// Host-side hot path: serializing instance masks to OMERO polygon ROIs runs
// per instance per frame (reference uses cv2.findContours + shapely,
// reference: src/utils/hull_polygon.py:44-89; here the Python fallback is
// microbeseg_tpu/client/contours.py).  A 2D+t experiment can carry tens of
// thousands of instances, so the tracing/rasterization loops are C++.
//
// Semantics MUST match the Python implementation exactly (tests compare
// them): Moore neighbor tracing clockwise from the topmost-leftmost pixel
// with Jacob's stopping criterion; crossing-number rasterization with
// boundary-vertex inclusion.
//
// Build: g++ -O2 -shared -fPIC -o libmbs_contours.so contours.cpp
// (done automatically by microbeseg_tpu/client/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Moore neighborhood, clockwise, starting from W (matches _MOORE in
// client/contours.py)
const int MOORE_DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};
const int MOORE_DX[8] = {-1, -1, 0, 1, 1, 1, 0, -1};

inline bool at(const int32_t* labels, int H, int W, int32_t id, int y, int x) {
  return y >= 0 && y < H && x >= 0 && x < W && labels[y * W + x] == id;
}

// Moore trace clockwise from a given start pixel (the object's
// topmost-leftmost) with Jacob's stopping criterion.  Writes (y, x) pairs;
// returns point count or -(n+1) if max_pts truncated.
int trace_from(const int32_t* labels, int H, int W, int32_t id, int sy,
               int sx, int64_t* out_yx, int max_pts) {
  int n = 0;
  auto push = [&](int y, int x) -> bool {
    if (n >= max_pts) return false;
    out_yx[2 * n] = y;
    out_yx[2 * n + 1] = x;
    ++n;
    return true;
  };
  if (!push(sy, sx)) return -(n + 1);

  int prev_dir = 0;  // backtrack direction index (W of start)
  int cy = sy, cx = sx;
  int fy = -1, fx = -1;  // first pixel visited after the start
  long guard = 4L * H * W + 8;
  while (guard-- > 0) {
    bool found = false;
    for (int k = 0; k < 8; ++k) {
      int d = (prev_dir + 1 + k) % 8;
      int ny = cy + MOORE_DY[d];
      int nx = cx + MOORE_DX[d];
      if (at(labels, H, W, id, ny, nx)) {
        prev_dir = (d + 4) % 8;
        cy = ny;
        cx = nx;
        found = true;
        break;
      }
    }
    if (!found) break;  // isolated pixel
    if (fy < 0) {
      fy = cy;
      fx = cx;
    } else if (cy == fy && cx == fx && out_yx[2 * (n - 1)] == sy &&
               out_yx[2 * (n - 1) + 1] == sx) {
      break;  // Jacob's criterion: revisit first move from the start pixel
    }
    if (!push(cy, cx)) return -(n + 1);
  }
  // drop the duplicated closing vertex if present
  if (n > 1 && out_yx[2 * (n - 1)] == sy && out_yx[2 * (n - 1) + 1] == sx) {
    --n;
  }
  return n;
}

}  // namespace

extern "C" {

// Trace the outer boundary of the instance `id` in `labels` (H x W, int32).
// Writes up to max_pts (y, x) pairs into out_yx; returns the number of
// points, or -1 if the instance is absent, or -(n+1) if truncated.
int mbs_trace_boundary(const int32_t* labels, int H, int W, int32_t id,
                       int64_t* out_yx, int max_pts) {
  // start: topmost-leftmost pixel
  int sy = -1, sx = -1;
  for (int y = 0; y < H && sy < 0; ++y) {
    for (int x = 0; x < W; ++x) {
      if (labels[y * W + x] == id) {
        sy = y;
        sx = x;
        break;
      }
    }
  }
  if (sy < 0) return -1;
  return trace_from(labels, H, W, id, sy, sx, out_yx, max_pts);
}

// Trace the outer boundary of EVERY 8-connected fragment of EVERY instance
// of a label image in one call (the per-call Python loop around
// mbs_trace_boundary costs ~0.4 ms/instance in interpreter overhead; a
// 2048^2 frame carries thousands of instances).
//
// Emits polygons in the same order as the Python path
// (client/contours.py::mask_to_polygons): instance ids ascending, fragments
// of one instance in raster order of their topmost-leftmost pixel; vertices
// are (x, y) int64 pairs, clockwise Moore trace from the fragment's
// topmost-leftmost pixel with Jacob's stopping criterion (identical to
// mbs_trace_boundary; fragments of one id are never 8-adjacent, so tracing
// on the id predicate stays on the seed's fragment).
//
// out_xy: (x, y) pairs, concatenated; offsets: max_polys+1 point offsets;
// ids: instance id per polygon.  Returns n_polys, or -1 if max_pts points
// would be exceeded, or -2 if max_polys would be (caller grows and retries).
int mbs_trace_all(const int32_t* labels, int H, int W, int64_t* out_xy,
                  int64_t max_pts, int64_t* offsets, int32_t* ids,
                  int max_polys) {
  int32_t max_id = 0;
  const long total = static_cast<long>(H) * W;
  for (long i = 0; i < total; ++i) max_id = std::max(max_id, labels[i]);
  if (max_id == 0) {
    offsets[0] = 0;
    return 0;
  }
  // per-id bounding boxes in one pass
  std::vector<int> by0(max_id + 1, H), by1(max_id + 1, -1),
      bx0(max_id + 1, W), bx1(max_id + 1, -1);
  for (int y = 0; y < H; ++y) {
    const int32_t* row = labels + static_cast<long>(y) * W;
    for (int x = 0; x < W; ++x) {
      int32_t id = row[x];
      if (id <= 0) continue;
      by0[id] = std::min(by0[id], y);
      by1[id] = std::max(by1[id], y);
      bx0[id] = std::min(bx0[id], x);
      bx1[id] = std::max(bx1[id], x);
    }
  }
  std::vector<uint8_t> visited(total, 0);
  std::vector<long> stack;
  int n_polys = 0;
  int64_t n_pts = 0;
  offsets[0] = 0;
  for (int32_t id = 1; id <= max_id; ++id) {
    if (by1[id] < 0) continue;
    for (int y = by0[id]; y <= by1[id]; ++y) {
      for (int x = bx0[id]; x <= bx1[id]; ++x) {
        long p = static_cast<long>(y) * W + x;
        if (labels[p] != id || visited[p]) continue;
        // new fragment; (y, x) is its topmost-leftmost pixel by scan order
        stack.clear();
        stack.push_back(p);
        visited[p] = 1;
        while (!stack.empty()) {
          long q = stack.back();
          stack.pop_back();
          int qy = static_cast<int>(q / W), qx = static_cast<int>(q % W);
          for (int k = 0; k < 8; ++k) {
            int ny = qy + MOORE_DY[k], nx = qx + MOORE_DX[k];
            if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
            long np_ = static_cast<long>(ny) * W + nx;
            if (labels[np_] == id && !visited[np_]) {
              visited[np_] = 1;
              stack.push_back(np_);
            }
          }
        }
        if (n_polys >= max_polys) return -2;
        int rem = static_cast<int>(
            std::min<int64_t>(max_pts - n_pts, 1 << 30));
        int n = trace_from(labels, H, W, id, y, x, out_xy + 2 * n_pts, rem);
        if (n < 0) return -1;  // truncated: caller grows out_xy and retries
        // tracer emits (y, x); flip to the OMERO (x, y) order in place
        for (int i = 0; i < n; ++i)
          std::swap(out_xy[2 * (n_pts + i)], out_xy[2 * (n_pts + i) + 1]);
        ids[n_polys] = id;
        n_pts += n;
        offsets[++n_polys] = n_pts;
      }
    }
  }
  return n_polys;
}

// Serialize traced polygons to OMERO points strings: "x,y x,y ..." per
// polygon, concatenated into out with byte offsets (str_offsets has
// n_polys+1 entries).  Returns total bytes, or -1 if cap is exceeded.
int64_t mbs_roi_strings(const int64_t* xy, const int64_t* offsets,
                        int n_polys, char* out, int64_t cap,
                        int64_t* str_offsets) {
  int64_t n = 0;
  auto put = [&](char c) -> bool {
    if (n >= cap) return false;
    out[n++] = c;
    return true;
  };
  auto put_int = [&](int64_t v) -> bool {
    char buf[24];
    int len = 0;
    if (v < 0) {
      if (!put('-')) return false;
      v = -v;
    }
    do {
      buf[len++] = static_cast<char>('0' + v % 10);
      v /= 10;
    } while (v > 0);
    while (len > 0)
      if (!put(buf[--len])) return false;
    return true;
  };
  str_offsets[0] = 0;
  for (int p = 0; p < n_polys; ++p) {
    for (int64_t i = offsets[p]; i < offsets[p + 1]; ++i) {
      if (i > offsets[p] && !put(' ')) return -1;
      if (!put_int(xy[2 * i]) || !put(',') || !put_int(xy[2 * i + 1]))
        return -1;
    }
    str_offsets[p + 1] = n;
  }
  return n;
}

// Rasterize a polygon given as n (x, y) float64 vertices into out (H x W,
// uint8, 0/1).  Crossing-number inside test at pixel centers + explicit
// boundary-vertex inclusion (matches polygon_to_mask in client/contours.py).
void mbs_rasterize_polygon(const double* xy, int n, uint8_t* out, int H,
                           int W) {
  std::memset(out, 0, static_cast<size_t>(H) * W);
  if (n < 3) {
    for (int i = 0; i < n; ++i) {
      int x = static_cast<int>(xy[2 * i] + 0.5);
      int y = static_cast<int>(xy[2 * i + 1] + 0.5);
      if (x < 0) x = 0;
      if (x >= W) x = W - 1;
      if (y < 0) y = 0;
      if (y >= H) y = H - 1;
      out[y * W + x] = 1;
    }
    return;
  }
  std::vector<double> xs(n), ys(n);
  for (int i = 0; i < n; ++i) {
    xs[i] = xy[2 * i];
    ys[i] = xy[2 * i + 1];
  }
  for (int py = 0; py < H; ++py) {
    double fy = py;
    // collect x-intersections of edges crossing this scanline
    std::vector<double> xints;
    for (int i = 0; i < n; ++i) {
      int j = (i + 1) % n;
      double y1 = ys[i], y2 = ys[j];
      if ((y1 <= fy && y2 > fy) || (y2 <= fy && y1 > fy)) {
        double t = (fy - y1) / (y2 - y1);
        xints.push_back(xs[i] + t * (xs[j] - xs[i]));
      }
    }
    if (xints.empty()) continue;
    for (int px = 0; px < W; ++px) {
      int crossings = 0;
      for (double xi : xints) {
        if (static_cast<double>(px) < xi) ++crossings;
      }
      if (crossings & 1) out[py * W + px] = 1;
    }
  }
  // boundary vertices (rounded) are included
  for (int i = 0; i < n; ++i) {
    int x = static_cast<int>(xs[i] + 0.5);
    int y = static_cast<int>(ys[i] + 0.5);
    if (x < 0) x = 0;
    if (x >= W) x = W - 1;
    if (y < 0) y = 0;
    if (y >= H) y = H - 1;
    out[y * W + x] = 1;
  }
}

// Batched rasterization of all ROIs of one frame: polys given as a
// concatenated (x, y) vertex array with per-polygon offsets; each polygon is
// painted with its 1-based index into a uint16 label image.
//
// Each polygon touches only its bounding box (a full-frame pass per polygon
// is O(n_polys * H * W) — ~10 s/frame at 2048^2 with ~2K cells); scanlines
// fill sorted even-odd spans, which is semantically identical to the
// per-pixel "count of x-intersections > px" test of mbs_rasterize_polygon
// (px integer inside iff px in [ceil(x[2k]), ceil(x[2k+1]) - 1]).
void mbs_rasterize_rois(const double* xy, const int64_t* offsets, int n_polys,
                        uint16_t* out, int H, int W) {
  std::memset(out, 0, static_cast<size_t>(H) * W * sizeof(uint16_t));
  std::vector<double> xints;
  for (int p = 0; p < n_polys; ++p) {
    int64_t start = offsets[p];
    int64_t end = offsets[p + 1];
    int n = static_cast<int>(end - start);
    const double* poly = xy + 2 * start;
    uint16_t id = static_cast<uint16_t>(p + 1);
    auto paint_vertices = [&]() {
      for (int i = 0; i < n; ++i) {
        int x = static_cast<int>(poly[2 * i] + 0.5);
        int y = static_cast<int>(poly[2 * i + 1] + 0.5);
        if (x < 0) x = 0;
        if (x >= W) x = W - 1;
        if (y < 0) y = 0;
        if (y >= H) y = H - 1;
        out[static_cast<long>(y) * W + x] = id;
      }
    };
    if (n < 3) {
      paint_vertices();
      continue;
    }
    double ymin = poly[1], ymax = poly[1];
    for (int i = 1; i < n; ++i) {
      ymin = std::min(ymin, poly[2 * i + 1]);
      ymax = std::max(ymax, poly[2 * i + 1]);
    }
    int py0 = std::max(0, static_cast<int>(std::ceil(ymin)));
    int py1 = std::min(H - 1, static_cast<int>(std::floor(ymax)));
    for (int py = py0; py <= py1; ++py) {
      double fy = py;
      xints.clear();
      for (int i = 0; i < n; ++i) {
        int j = (i + 1) % n;
        double y1 = poly[2 * i + 1], y2 = poly[2 * j + 1];
        if ((y1 <= fy && y2 > fy) || (y2 <= fy && y1 > fy)) {
          double t = (fy - y1) / (y2 - y1);
          xints.push_back(poly[2 * i] + t * (poly[2 * j] - poly[2 * i]));
        }
      }
      if (xints.size() < 2) continue;
      std::sort(xints.begin(), xints.end());
      for (size_t k = 0; k + 1 < xints.size(); k += 2) {
        int x0 = std::max(0, static_cast<int>(std::ceil(xints[k])));
        int x1 = std::min(W - 1,
                          static_cast<int>(std::ceil(xints[k + 1])) - 1);
        uint16_t* row = out + static_cast<long>(py) * W;
        for (int px = x0; px <= x1; ++px) row[px] = id;
      }
    }
    paint_vertices();  // boundary vertices (rounded) are included
  }
}

}  // extern "C"
