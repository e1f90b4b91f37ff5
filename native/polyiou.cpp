// Exact convex-quad polygon IoU + greedy rotated NMS — host-side native ops.
//
// Fills the role of the reference's SWIG polyiou (tools/prepare_dota/
// polyiou.cpp) and the CPU poly-NMS used by the tile merger
// (dafne/utils/ResultMerge_multi_process.py:61-122), implemented fresh:
// Sutherland–Hodgman half-plane clipping in double precision, C ABI for
// ctypes.  Batched entry points so Python overhead is per-call, not
// per-pair.
//
// Build: g++ -O3 -march=native -shared -fPIC polyiou.cpp -o libpolyiou.so

#include <algorithm>
#include <cmath>
#include <limits>
#include <cstdint>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

inline double polygon_area(const Pt* p, int n) {
  double s = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& a = p[i];
    const Pt& b = p[(i + 1) % n];
    s += a.x * b.y - a.y * b.x;
  }
  return 0.5 * s;
}

// Clip polygon `in` (n vertices) by the half-plane left of a->b (CCW).
// Returns the new vertex count written to `out`.  For a CONVEX subject the
// output has at most n + 1 vertices, but callers can feed self-intersecting
// (bowtie) quads whose clips emit up to ~1.5n, so writes are bounded by
// `cap` explicitly — never trust the input to be simple.
int clip_halfplane(const Pt* in, int n, Pt a, Pt b, Pt* out, int cap) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const Pt& cur = in[i];
    const Pt& nxt = in[(i + 1) % n];
    double s_cur = cross(a, b, cur);
    double s_nxt = cross(a, b, nxt);
    if (s_cur >= 0 && m < cap) out[m++] = cur;
    if ((s_cur > 0 && s_nxt < 0) || (s_cur < 0 && s_nxt > 0)) {
      double t = s_cur / (s_cur - s_nxt);
      if (m < cap)
        out[m++] = Pt{cur.x + t * (nxt.x - cur.x), cur.y + t * (nxt.y - cur.y)};
    }
  }
  return m;
}

void load_ccw(const double* q, Pt* out) {
  for (int i = 0; i < 4; ++i) out[i] = Pt{q[2 * i], q[2 * i + 1]};
  if (polygon_area(out, 4) < 0) std::swap(out[0], out[3]), std::swap(out[1], out[2]);
}

constexpr int kClipCap = 32;  // 4 clips of a (possibly bowtie) quad stay
                              // well under this; clip_halfplane clamps anyway

double intersect_area_verts(const Pt* p, const Pt* q) {
  Pt buf_a[kClipCap], buf_b[kClipCap];
  int n = 4;
  Pt* cur = buf_a;
  Pt* nxt = buf_b;
  for (int i = 0; i < 4; ++i) buf_a[i] = p[i];
  for (int e = 0; e < 4 && n > 2; ++e) {
    n = clip_halfplane(cur, n, q[e], q[(e + 1) % 4], nxt, kClipCap);
    std::swap(cur, nxt);
  }
  if (n < 3) return 0.0;
  return std::fabs(polygon_area(cur, n));
}

double intersect_area(const double* p8, const double* q8) {
  Pt p[4], q[4];
  load_ccw(p8, p);
  load_ccw(q8, q);
  return intersect_area_verts(p, q);
}

double quad_iou(const double* p8, const double* q8) {
  // load/orient each quad ONCE and share between intersection and union
  Pt p[4], q[4];
  load_ccw(p8, p);
  load_ccw(q8, q);
  double inter = intersect_area_verts(p, q);
  double ua = std::fabs(polygon_area(p, 4)) + std::fabs(polygon_area(q, 4)) - inter;
  // degenerate-union convention of the reference polyiou (polyiou.cpp:121-126)
  if (ua == 0.0) return (inter + 1.0) / (ua + 1.0);
  return inter / ua;
}

}  // namespace

extern "C" {

double polyiou_single(const double* p, const double* q) { return quad_iou(p, q); }

// Elementwise: p [n, 8], q [n, 8] -> out [n]
void polyiou_pairs(const double* p, const double* q, int64_t n, double* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = quad_iou(p + 8 * i, q + 8 * i);
}

// Full matrix: p [n, 8], q [m, 8] -> out [n, m]
void polyiou_matrix(const double* p, int64_t n, const double* q, int64_t m,
                    double* out) {
  for (int64_t i = 0; i < n; ++i)
    for (int64_t j = 0; j < m; ++j) out[i * m + j] = quad_iou(p + 8 * i, q + 8 * j);
}

// Greedy rotated NMS with axis-aligned prefilter (host path for tile
// merging).  boxes [n, 8] (already in a single class group), scores [n],
// keep_out [n] (0/1).  Suppress when IoU > thresh.
void poly_nms(const double* boxes, const double* scores, int64_t n,
              double thresh, uint8_t* keep_out) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  // stable: equal scores keep input order, matching the NumPy fallback's
  // kind='stable' argsort so keep-sets agree with and without the native lib
  // NaN scores sort LAST (lowest priority) like the NumPy fallback's
  // argsort; a raw `>` comparator with NaN violates strict weak ordering
  // (undefined behavior in std::stable_sort)
  auto key = [&](int64_t i) {
    double s = scores[i];
    return std::isnan(s) ? -std::numeric_limits<double>::infinity() : s;
  };
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return key(a) > key(b); });

  std::vector<double> hb(n * 4);
  for (int64_t i = 0; i < n; ++i) {
    const double* b = boxes + 8 * i;
    double x0 = b[0], x1 = b[0], y0 = b[1], y1 = b[1];
    for (int k = 1; k < 4; ++k) {
      x0 = std::min(x0, b[2 * k]);
      x1 = std::max(x1, b[2 * k]);
      y0 = std::min(y0, b[2 * k + 1]);
      y1 = std::max(y1, b[2 * k + 1]);
    }
    hb[4 * i] = x0; hb[4 * i + 1] = y0; hb[4 * i + 2] = x1; hb[4 * i + 3] = y1;
  }

  std::vector<int64_t> kept;
  std::fill(keep_out, keep_out + n, 0);
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    bool ok = true;
    for (int64_t j : kept) {
      // axis-aligned reject first
      if (hb[4 * i] > hb[4 * j + 2] || hb[4 * j] > hb[4 * i + 2] ||
          hb[4 * i + 1] > hb[4 * j + 3] || hb[4 * j + 1] > hb[4 * i + 3])
        continue;
      if (quad_iou(boxes + 8 * i, boxes + 8 * j) > thresh) {
        ok = false;
        break;
      }
    }
    if (ok) {
      kept.push_back(i);
      keep_out[i] = 1;
    }
  }
}

}  // extern "C"
