// Native helpers for voge_tpu's host-side (non-TPU) subsystems:
//   - fast whitespace-separated float/int parsing (OFF/COFF/GOFF loaders —
//     the IO layer of reference VoGE/Converter/IO.py, rebuilt native);
//   - uniform-grid k-nearest-neighbor mean distances (the pointcloud ->
//     Gaussian converter, reference Converters.py:98-122, whose dense
//     pairwise-distance formulation is O(N^2) memory/time).
//
// Exposed with a plain C ABI and loaded via ctypes (no pybind11 in this
// image).  Compiled lazily by voge_tpu/native/__init__.py; every caller has
// a pure-Python fallback.
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Parse up to max_out whitespace-separated floats from buf[0:len].
// Returns the number parsed.
long vg_parse_floats(const char* buf, long len, float* out, long max_out) {
    const char* p = buf;
    const char* end = buf + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && std::isspace((unsigned char)*p)) ++p;
        if (p >= end) break;
        char* next = nullptr;
        float v = std::strtof(p, &next);
        if (next == p) { ++p; continue; }  // skip unparsable byte
        out[n++] = v;
        p = next;
    }
    return n;
}

// Mean distance to the k nearest neighbors (self excluded by distance 0
// being included then clipped — matching the reference's torch.topk over
// the full distance row which includes self), with per-point clipping at
// thr_max * mean (reference Converters.py:107-109 semantics):
//   top_dist = k smallest distances (self included, = 0)
//   clipped  = min(top_dist, mean(top_dist) * thr_max)
//   out      = mean(clipped)
// Uniform-grid acceleration: O(N * k) expected for uniform-ish clouds.
void vg_knn_mean_dist(const float* pts, long n, int k, float thr_max,
                      float* out) {
    if (n == 0) return;
    // bounding box
    float lo[3], hi[3];
    for (int d = 0; d < 3; ++d) { lo[d] = pts[d]; hi[d] = pts[d]; }
    for (long i = 1; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            float v = pts[i * 3 + d];
            lo[d] = std::min(lo[d], v);
            hi[d] = std::max(hi[d], v);
        }
    // grid resolution: ~ (n)^(1/3) cells per axis, >= 1
    long res = std::max(1L, (long)std::cbrt((double)n / 2.0));
    float cell[3], inv_cell[3];
    for (int d = 0; d < 3; ++d) {
        float span = std::max(hi[d] - lo[d], 1e-12f);
        cell[d] = span / res;
        inv_cell[d] = 1.0f / cell[d];
    }
    long ncells = res * res * res;
    std::vector<int32_t> counts(ncells + 1, 0);
    auto cell_of = [&](long i) -> long {
        long c[3];
        for (int d = 0; d < 3; ++d) {
            long v = (long)((pts[i * 3 + d] - lo[d]) * inv_cell[d]);
            c[d] = std::min(std::max(v, 0L), res - 1);
        }
        return (c[0] * res + c[1]) * res + c[2];
    };
    for (long i = 0; i < n; ++i) counts[cell_of(i) + 1]++;
    for (long c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    std::vector<int32_t> order(n);
    {
        std::vector<int32_t> cursor(counts.begin(), counts.end() - 1);
        for (long i = 0; i < n; ++i) order[cursor[cell_of(i)]++] = (int32_t)i;
    }

    std::vector<float> best(k);
    for (long i = 0; i < n; ++i) {
        int found = 0;
        float worst = 1e30f;
        long ci[3];
        for (int d = 0; d < 3; ++d) {
            long v = (long)((pts[i * 3 + d] - lo[d]) * inv_cell[d]);
            ci[d] = std::min(std::max(v, 0L), res - 1);
        }
        // expand rings until k found and the ring boundary exceeds worst
        for (long ring = 0; ring < res; ++ring) {
            bool ring_useful = false;
            for (long dx = -ring; dx <= ring; ++dx)
                for (long dy = -ring; dy <= ring; ++dy)
                    for (long dz = -ring; dz <= ring; ++dz) {
                        if (std::max({std::labs(dx), std::labs(dy), std::labs(dz)}) != ring)
                            continue;
                        long cx = ci[0] + dx, cy = ci[1] + dy, cz = ci[2] + dz;
                        if (cx < 0 || cy < 0 || cz < 0 || cx >= res || cy >= res || cz >= res)
                            continue;
                        ring_useful = true;
                        long c = (cx * res + cy) * res + cz;
                        for (long s = counts[c]; s < counts[c + 1]; ++s) {
                            long j = order[s];
                            float dx_ = pts[i * 3] - pts[j * 3];
                            float dy_ = pts[i * 3 + 1] - pts[j * 3 + 1];
                            float dz_ = pts[i * 3 + 2] - pts[j * 3 + 2];
                            float d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_;
                            float d = std::sqrt(d2);
                            if (found < k) {
                                best[found++] = d;
                                if (found == k) {
                                    std::sort(best.begin(), best.end());
                                    worst = best[k - 1];
                                }
                            } else if (d < worst) {
                                // insert
                                int pos = k - 1;
                                while (pos > 0 && best[pos - 1] > d) {
                                    best[pos] = best[pos - 1];
                                    --pos;
                                }
                                best[pos] = d;
                                worst = best[k - 1];
                            }
                        }
                    }
            if (found >= k) {
                // minimum distance to any cell at distance `ring` from ours
                float ring_min = (ring > 0)
                    ? (ring - 0) * std::min({cell[0], cell[1], cell[2]})
                    : 0.0f;
                if (ring_min > worst && ring_useful) break;
                if (ring >= res) break;
            }
        }
        int m = std::min(found, k);
        float mean = 0.0f;
        for (int t = 0; t < m; ++t) mean += best[t];
        mean /= std::max(m, 1);
        float acc = 0.0f;
        float cap = mean * thr_max;
        for (int t = 0; t < m; ++t) acc += std::min(best[t], cap);
        out[i] = acc / std::max(m, 1);
    }
}

// Per-vertex mean adjacent-edge length (reference Converters.py:10-32
// semantics: per face, each vertex records the face's first 3 vertices as
// neighbors; unique neighbors incl. self; sum of distances / (count - 1)).
void vg_vert_edge_length(const float* verts, long nv, const int64_t* faces,
                         long nf, int fw, float default_l, float* out) {
    std::vector<std::vector<int32_t>> nbrs(nv);
    for (long f = 0; f < nf; ++f) {
        for (int a = 0; a < fw; ++a) {
            int64_t v = faces[f * fw + a];
            if (v < 0 || v >= nv) continue;
            for (int b = 0; b < 3 && b < fw; ++b) {
                nbrs[v].push_back((int32_t)faces[f * fw + b]);
            }
        }
    }
    for (long v = 0; v < nv; ++v) {
        auto& nb = nbrs[v];
        if (nb.empty()) { out[v] = default_l; continue; }
        std::sort(nb.begin(), nb.end());
        nb.erase(std::unique(nb.begin(), nb.end()), nb.end());
        double acc = 0.0;
        for (int32_t u : nb) {
            double dx = verts[v * 3] - verts[u * 3];
            double dy = verts[v * 3 + 1] - verts[u * 3 + 1];
            double dz = verts[v * 3 + 2] - verts[u * 3 + 2];
            acc += std::sqrt(dx * dx + dy * dy + dz * dz);
        }
        long denom = (long)nb.size() - 1;
        out[v] = denom > 0 ? (float)(acc / denom) : default_l;
    }
}

}  // extern "C"
