// Native Viola-Jones Haar-cascade object detector.
//
// Role in the framework: the reference detects faces/eyes with dlib via
// face_recognition (gance/faces.py). This machine class has neither dlib nor a
// cascade-capable OpenCV (cv2 5.0 dropped CascadeClassifier), but the standard Haar
// cascade XMLs exist on disk. The XML is parsed on the Python side into flat arrays
// (see gance_tpu/overlay/haar.py); this C++ core does the hot work: integral
// images, multi-scale sliding window with variance normalization, staged early-out
// evaluation, and neighbor-count rectangle grouping.
//
// Cascade blob layout (all little-endian, counts from the Python parser):
//   stage_thresholds : float32 [n_stages]
//   stage_offsets    : int32   [n_stages + 1]   (weak-classifier index ranges)
//   node_feature     : int32   [n_weak]
//   node_threshold   : float32 [n_weak]
//   leaf_values      : float32 [n_weak * 2]     (left, right)
//   feature_offsets  : int32   [n_features + 1] (rect index ranges)
//   rects            : float32 [n_rects * 5]    (x, y, w, h, weight)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cascade {
    int window_w, window_h;
    int n_stages, n_weak, n_features, n_rects;
    const float* stage_thresholds;
    const int32_t* stage_offsets;
    const int32_t* node_feature;
    const float* node_threshold;
    const float* leaf_values;
    const int32_t* feature_offsets;
    const float* rects;
};

struct Detection {
    float x, y, w, h;
    int neighbors = 0;
};

// Integral images with (W+1, H+1) layout, row-major, stride = width+1.
void integrals(const uint8_t* img, int w, int h, std::vector<double>& ii,
               std::vector<double>& ii2) {
    const int stride = w + 1;
    ii.assign(static_cast<size_t>(stride) * (h + 1), 0.0);
    ii2.assign(static_cast<size_t>(stride) * (h + 1), 0.0);
    for (int y = 1; y <= h; ++y) {
        double row = 0.0, row2 = 0.0;
        for (int x = 1; x <= w; ++x) {
            const double v = img[(y - 1) * w + (x - 1)];
            row += v;
            row2 += v * v;
            ii[y * stride + x] = ii[(y - 1) * stride + x] + row;
            ii2[y * stride + x] = ii2[(y - 1) * stride + x] + row2;
        }
    }
}

inline double rect_sum(const std::vector<double>& ii, int stride, int x, int y,
                       int w, int h) {
    return ii[(y + h) * stride + (x + w)] - ii[y * stride + (x + w)] -
           ii[(y + h) * stride + x] + ii[y * stride + x];
}

// Plain-sum integral image (uint64; exact for any frame size) used to turn the
// per-scale area-average resize into O(dst) rect sums instead of O(src) pixel
// visits. The pyramid re-reads the ORIGINAL image at every scale; pre-summing
// it once makes each level cost its own (small) area — measured ~10x on the
// whole detector at 1024-2000px where the resize dominated the profile.
void integral_u64(const uint8_t* img, int w, int h, std::vector<uint64_t>& ii) {
    const int stride = w + 1;
    ii.assign(static_cast<size_t>(stride) * (h + 1), 0);
    for (int y = 1; y <= h; ++y) {
        uint64_t row = 0;
        const uint8_t* src_row = img + static_cast<size_t>(y - 1) * w;
        const uint64_t* prev = ii.data() + static_cast<size_t>(y - 1) * stride;
        uint64_t* cur = ii.data() + static_cast<size_t>(y) * stride;
        for (int x = 1; x <= w; ++x) {
            row += src_row[x - 1];
            cur[x] = prev[x] + row;
        }
    }
}

// Area-average downscale evaluated on the source's integral image. The box
// boundaries, the double division, and the +0.5 rounding replicate the loop in
// resize_gray EXACTLY (integer pixel sums are exact in both formulations), so
// detections are bit-identical to the pre-integral implementation.
void resize_area_from_integral(const std::vector<uint64_t>& ii, int sw, int sh,
                               std::vector<uint8_t>& dst, int dw, int dh) {
    dst.resize(static_cast<size_t>(dw) * dh);
    const int stride = sw + 1;
    const double fx = static_cast<double>(sw) / dw;
    const double fy = static_cast<double>(sh) / dh;
    for (int y = 0; y < dh; ++y) {
        const int y0 = static_cast<int>(y * fy);
        const int y1 = std::max(std::min(static_cast<int>((y + 1) * fy), sh), y0 + 1);
        const uint64_t* top = ii.data() + static_cast<size_t>(y0) * stride;
        const uint64_t* bot = ii.data() + static_cast<size_t>(y1) * stride;
        for (int x = 0; x < dw; ++x) {
            const int x0 = static_cast<int>(x * fx);
            const int x1 =
                std::max(std::min(static_cast<int>((x + 1) * fx), sw), x0 + 1);
            const uint64_t sum = bot[x1] - bot[x0] - top[x1] + top[x0];
            const int count = (x1 - x0) * (y1 - y0);
            dst[y * dw + x] =
                static_cast<uint8_t>(static_cast<double>(sum) / count + 0.5);
        }
    }
}

// Per-pyramid-level evaluation plan: every feature rect's four integral-image
// corners pre-resolved to offsets from the window-origin pointer (stride-baked),
// so the hot rect sum is four loads + three adds + one multiply. This is the
// standard cascade optimization (the naive form recomputed 4 two-term index
// expressions per rect per window and measured ~5x slower at 1024-2000px).
struct LevelRect {
    int o00, o01, o10, o11;
    float weight;
};

// One weak classifier (stump) with its rects inlined in evaluation order; the
// whole cascade becomes two contiguous streams (nodes + rects) walked linearly
// per window — the Cascade's node->feature->rect indirection is resolved once
// per pyramid level instead of once per rect per window.
struct LevelNode {
    int rect_begin, rect_end;
    float threshold;
    float leaf[2];  // indexed by the stump outcome — keep the select branch-free
};

struct LevelPlan {
    std::vector<LevelRect> rects;     // node-ordered, contiguous
    std::vector<LevelNode> nodes;     // cascade-ordered
    int n00, n01, n10, n11;           // variance-norm rect corner offsets
    double norm_area;
};

void build_level_plan(const Cascade& c, int stride, LevelPlan& plan) {
    plan.nodes.resize(c.n_weak);
    plan.rects.clear();
    plan.rects.reserve(c.n_rects);
    for (int n = 0; n < c.n_weak; ++n) {
        const int f = c.node_feature[n];
        LevelNode& node = plan.nodes[n];
        node.rect_begin = static_cast<int>(plan.rects.size());
        for (int r = c.feature_offsets[f]; r < c.feature_offsets[f + 1]; ++r) {
            const float* rc = c.rects + static_cast<size_t>(r) * 5;
            const int x = static_cast<int>(rc[0]), y = static_cast<int>(rc[1]);
            const int w = static_cast<int>(rc[2]), h = static_cast<int>(rc[3]);
            plan.rects.push_back(LevelRect{
                y * stride + x, y * stride + (x + w), (y + h) * stride + x,
                (y + h) * stride + (x + w), rc[4]});
        }
        node.rect_end = static_cast<int>(plan.rects.size());
        node.threshold = c.node_threshold[n];
        node.leaf[0] = c.leaf_values[n * 2];
        node.leaf[1] = c.leaf_values[n * 2 + 1];
    }
    // Variance normalization over OpenCV's inset norm rect Rect(1,1,w-2,h-2) —
    // node thresholds in the XMLs are calibrated against exactly this.
    const int nw = c.window_w - 2, nh = c.window_h - 2;
    plan.norm_area = static_cast<double>(nw) * nh;
    plan.n00 = 1 * stride + 1;
    plan.n01 = 1 * stride + (1 + nw);
    plan.n10 = (1 + nh) * stride + 1;
    plan.n11 = (1 + nh) * stride + (1 + nw);
}

// Evaluate the cascade at a window. `base`/`base2` point at the window origin
// inside the level's integral images. Returns true if every stage passes.
bool eval_window(const Cascade& c, const LevelPlan& plan, const double* base,
                 const double* base2) {
    const double sum = base[plan.n11] - base[plan.n01] - base[plan.n10] + base[plan.n00];
    const double sqsum =
        base2[plan.n11] - base2[plan.n01] - base2[plan.n10] + base2[plan.n00];
    double nf = plan.norm_area * sqsum - sum * sum;
    nf = nf > 0.0 ? std::sqrt(nf) : 1.0;
    const double inv_norm = 1.0 / nf;

    const LevelRect* rects = plan.rects.data();
    const LevelNode* nodes = plan.nodes.data();
    for (int s = 0; s < c.n_stages; ++s) {
        double stage_sum = 0.0;
        const int begin = c.stage_offsets[s];
        const int end = c.stage_offsets[s + 1];
        for (int n = begin; n < end; ++n) {
            const LevelNode& node = nodes[n];
            double val = 0.0;
            for (int r = node.rect_begin; r < node.rect_end; ++r) {
                const LevelRect& lr = rects[r];
                val += lr.weight *
                       (base[lr.o11] - base[lr.o01] - base[lr.o10] + base[lr.o00]);
            }
            // indexed load, not a ternary: stump outcomes are ~random, so a
            // conditional branch here mispredicts its way to a measured 1.5x
            // slowdown; setcc + indexed load stays flat
            stage_sum += node.leaf[val * inv_norm >= node.threshold];
        }
        if (stage_sum < c.stage_thresholds[s]) return false;
    }
    return true;
}

// Grayscale resize. Downscaling uses area averaging (anti-aliased, like
// INTER_AREA) — plain bilinear aliases catastrophically at the 10-80x reduction
// factors the pyramid needs on 1-4K frames. Upscaling (rare here) is bilinear.
void resize_gray(const uint8_t* src, int sw, int sh, std::vector<uint8_t>& dst,
                 int dw, int dh) {
    dst.resize(static_cast<size_t>(dw) * dh);
    if (dw <= sw && dh <= sh) {
        const double fx = static_cast<double>(sw) / dw;
        const double fy = static_cast<double>(sh) / dh;
        for (int y = 0; y < dh; ++y) {
            const int y0 = static_cast<int>(y * fy);
            const int y1 = std::min(static_cast<int>((y + 1) * fy), sh);
            for (int x = 0; x < dw; ++x) {
                const int x0 = static_cast<int>(x * fx);
                const int x1 = std::min(static_cast<int>((x + 1) * fx), sw);
                double acc = 0.0;
                int count = 0;
                for (int yy = y0; yy < std::max(y1, y0 + 1); ++yy)
                    for (int xx = x0; xx < std::max(x1, x0 + 1); ++xx) {
                        acc += src[yy * sw + xx];
                        ++count;
                    }
                dst[y * dw + x] = static_cast<uint8_t>(acc / count + 0.5);
            }
        }
        return;
    }
    const float fx = static_cast<float>(sw) / dw;
    const float fy = static_cast<float>(sh) / dh;
    for (int y = 0; y < dh; ++y) {
        const float sy = (y + 0.5f) * fy - 0.5f;
        const int y0 = std::clamp(static_cast<int>(std::floor(sy)), 0, sh - 1);
        const int y1 = std::min(y0 + 1, sh - 1);
        const float wy = sy - std::floor(std::max(sy, 0.0f));
        for (int x = 0; x < dw; ++x) {
            const float sx = (x + 0.5f) * fx - 0.5f;
            const int x0 = std::clamp(static_cast<int>(std::floor(sx)), 0, sw - 1);
            const int x1 = std::min(x0 + 1, sw - 1);
            const float wx = sx - std::floor(std::max(sx, 0.0f));
            const float top = src[y0 * sw + x0] * (1 - wx) + src[y0 * sw + x1] * wx;
            const float bot = src[y1 * sw + x0] * (1 - wx) + src[y1 * sw + x1] * wx;
            dst[y * dw + x] = static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5f);
        }
    }
}

// groupRectangles-style clustering: rectangles are similar when their positions and
// sizes agree within eps; clusters below min_neighbors are dropped.
std::vector<Detection> group_rects(std::vector<Detection>& raw, int min_neighbors,
                                   float eps = 0.2f) {
    const size_t n = raw.size();
    std::vector<int> labels(n, -1);
    int n_clusters = 0;
    for (size_t i = 0; i < n; ++i) {
        if (labels[i] >= 0) continue;
        labels[i] = n_clusters;
        for (size_t j = 0; j < n; ++j) {
            if (labels[j] >= 0) continue;
            const float delta = eps * (std::min(raw[i].w, raw[j].w) +
                                       std::min(raw[i].h, raw[j].h)) * 0.5f;
            if (std::abs(raw[i].x - raw[j].x) <= delta &&
                std::abs(raw[i].y - raw[j].y) <= delta &&
                std::abs(raw[i].x + raw[i].w - raw[j].x - raw[j].w) <= delta &&
                std::abs(raw[i].y + raw[i].h - raw[j].y - raw[j].h) <= delta) {
                labels[j] = n_clusters;
            }
        }
        ++n_clusters;
    }
    std::vector<Detection> clusters(n_clusters);
    std::vector<int> counts(n_clusters, 0);
    for (size_t i = 0; i < n; ++i) {
        Detection& d = clusters[labels[i]];
        d.x += raw[i].x;
        d.y += raw[i].y;
        d.w += raw[i].w;
        d.h += raw[i].h;
        counts[labels[i]] += 1;
    }
    std::vector<Detection> out;
    for (int k = 0; k < n_clusters; ++k) {
        if (counts[k] >= min_neighbors) {
            Detection d = clusters[k];
            const float inv = 1.0f / counts[k];
            d.x *= inv; d.y *= inv; d.w *= inv; d.h *= inv;
            d.neighbors = counts[k];
            out.push_back(d);
        }
    }
    return out;
}

}  // namespace

extern "C" {

// Detect objects. Returns the number of detections written (<= max_out).
// out: [x, y, w, h] * n as float32 in original-image coordinates.
int haar_detect(
    const uint8_t* gray, int img_w, int img_h,
    // cascade blob
    int window_w, int window_h, int n_stages, int n_weak, int n_features, int n_rects,
    const float* stage_thresholds, const int32_t* stage_offsets,
    const int32_t* node_feature, const float* node_threshold,
    const float* leaf_values, const int32_t* feature_offsets, const float* rects,
    // detection params
    double scale_factor, int min_neighbors, int min_size, int step,
    float* out, int max_out) {
    Cascade c{window_w, window_h, n_stages, n_weak, n_features, n_rects,
              stage_thresholds, stage_offsets, node_feature, node_threshold,
              leaf_values, feature_offsets, rects};

    std::vector<Detection> raw;
    std::vector<uint8_t> scaled;
    std::vector<double> ii, ii2;
    std::vector<uint64_t> src_ii;
    integral_u64(gray, img_w, img_h, src_ii);

    for (double scale = 1.0;; scale *= scale_factor) {
        const int win_w = static_cast<int>(window_w * scale);
        const int win_h = static_cast<int>(window_h * scale);
        if (win_w > img_w || win_h > img_h) break;
        if (win_w < min_size || win_h < min_size) continue;

        const int sw = static_cast<int>(img_w / scale);
        const int sh = static_cast<int>(img_h / scale);
        if (sw < window_w || sh < window_h) break;
        if (sw <= img_w && sh <= img_h) {
            resize_area_from_integral(src_ii, img_w, img_h, scaled, sw, sh);
        } else {
            resize_gray(gray, img_w, img_h, scaled, sw, sh);
        }
        integrals(scaled.data(), sw, sh, ii, ii2);
        const int stride = sw + 1;
        LevelPlan plan;
        build_level_plan(c, stride, plan);

        for (int y = 0; y + window_h <= sh; y += step) {
            const double* row = ii.data() + static_cast<size_t>(y) * stride;
            const double* row2 = ii2.data() + static_cast<size_t>(y) * stride;
            for (int x = 0; x + window_w <= sw; x += step) {
                if (eval_window(c, plan, row + x, row2 + x)) {
                    raw.push_back(Detection{
                        static_cast<float>(x * scale), static_cast<float>(y * scale),
                        static_cast<float>(window_w * scale),
                        static_cast<float>(window_h * scale)});
                }
            }
        }
    }

    std::vector<Detection> grouped = group_rects(raw, min_neighbors);
    const int n_out = std::min(static_cast<int>(grouped.size()), max_out);
    for (int i = 0; i < n_out; ++i) {
        out[i * 4 + 0] = grouped[i].x;
        out[i * 4 + 1] = grouped[i].y;
        out[i * 4 + 2] = grouped[i].w;
        out[i * 4 + 3] = grouped[i].h;
    }
    return n_out;
}

}  // extern "C"
