// Locality-aware NMS for EAST quadrangle detections.
//
// C++ equivalent of the lanms library the reference imports but bypasses
// (reference: OCR/detect.py:8 imports lanms, falls back to the pure-python
// nms_locality in evaluate/test_lnms.py:46). Input is an [n, 9] array of
// (x1..y4, score) rows in scan-row order; the algorithm merges consecutive
// overlapping quads by score-weighted vertex averaging, then applies
// standard NMS over the merged set.
//
// Polygon intersection is Sutherland–Hodgman clipping over convex quads —
// no external geometry library.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

double polygon_area(const std::vector<Pt>& p) {
  double a = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt& u = p[i];
    const Pt& v = p[(i + 1) % p.size()];
    a += u.x * v.y - v.x * u.y;
  }
  return std::fabs(a) * 0.5;
}

// clip subject polygon by the half-plane left of edge (a, b)
std::vector<Pt> clip_edge(const std::vector<Pt>& subject, Pt a, Pt b) {
  std::vector<Pt> out;
  const size_t n = subject.size();
  for (size_t i = 0; i < n; ++i) {
    Pt cur = subject[i];
    Pt prev = subject[(i + n - 1) % n];
    double cur_side = (b.x - a.x) * (cur.y - a.y) - (b.y - a.y) * (cur.x - a.x);
    double prev_side =
        (b.x - a.x) * (prev.y - a.y) - (b.y - a.y) * (prev.x - a.x);
    if (cur_side >= 0) {
      if (prev_side < 0) {
        double t = prev_side / (prev_side - cur_side);
        out.push_back({prev.x + t * (cur.x - prev.x),
                       prev.y + t * (cur.y - prev.y)});
      }
      out.push_back(cur);
    } else if (prev_side >= 0) {
      double t = prev_side / (prev_side - cur_side);
      out.push_back(
          {prev.x + t * (cur.x - prev.x), prev.y + t * (cur.y - prev.y)});
    }
  }
  return out;
}

std::vector<Pt> quad_points(const float* q) {
  std::vector<Pt> p(4);
  for (int i = 0; i < 4; ++i) p[i] = {q[2 * i], q[2 * i + 1]};
  // ensure counter-clockwise orientation for clipping
  double a = 0;
  for (int i = 0; i < 4; ++i) {
    a += p[i].x * p[(i + 1) % 4].y - p[(i + 1) % 4].x * p[i].y;
  }
  if (a < 0) std::reverse(p.begin(), p.end());
  return p;
}

double quad_iou(const float* g, const float* p) {
  std::vector<Pt> a = quad_points(g);
  std::vector<Pt> b = quad_points(p);
  std::vector<Pt> inter = a;
  for (int i = 0; i < 4 && !inter.empty(); ++i) {
    inter = clip_edge(inter, b[i], b[(i + 1) % 4]);
  }
  if (inter.size() < 3) return 0.0;
  double ai = polygon_area(inter);
  double u = polygon_area(a) + polygon_area(b) - ai;
  return u > 0 ? ai / u : 0.0;
}

void weighted_merge(const float* g, const float* p, float* out) {
  float sg = g[8], sp = p[8];
  for (int i = 0; i < 8; ++i) out[i] = (sg * g[i] + sp * p[i]) / (sg + sp);
  out[8] = sg + sp;
}

}  // namespace

extern "C" {

// polys: [n, 9]; returns number of kept rows written to out (capacity n).
int lanms_merge_quadrangle(const float* polys, int n, float iou_thresh,
                           float* out) {
  if (n == 0) return 0;
  std::vector<std::vector<float>> merged;
  std::vector<float> prev;
  for (int i = 0; i < n; ++i) {
    const float* g = polys + 9 * i;
    if (!prev.empty() && quad_iou(g, prev.data()) > iou_thresh) {
      std::vector<float> m(9);
      weighted_merge(g, prev.data(), m.data());
      prev = m;
    } else {
      if (!prev.empty()) merged.push_back(prev);
      prev.assign(g, g + 9);
    }
  }
  if (!prev.empty()) merged.push_back(prev);

  // standard NMS over merged quads, descending score
  std::vector<int> order(merged.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = (int)i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return merged[a][8] > merged[b][8];
  });
  std::vector<char> suppressed(merged.size(), 0);
  int count = 0;
  for (int idx : order) {
    if (suppressed[idx]) continue;
    std::memcpy(out + 9 * count, merged[idx].data(), 9 * sizeof(float));
    ++count;
    for (int jdx : order) {
      if (jdx == idx || suppressed[jdx]) continue;
      if (quad_iou(merged[idx].data(), merged[jdx].data()) > iou_thresh) {
        suppressed[jdx] = 1;
      }
    }
  }
  return count;
}

}  // extern "C"
