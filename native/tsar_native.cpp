// Native host-side kernels for tsar_mvs_tpu.
//
// The reference implements its CPU algorithm layer in C++ (main.cpp:
// Connect/roberts/texture, SURVEY.md §2 #2); these are the equivalent
// native implementations for the host stages that sit off the TPU compute
// path, exposed through a C ABI for ctypes. A scipy fallback exists in
// tsar_mvs_tpu/models/weak_texture.py; this library is the production
// path for large images.
//
// Build: make -C native   (produces libtsar_native.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 4-connected component labeling of the zero pixels of a binary edge map.
//
// Semantics match Connect (reference main.cpp:242-363): edge pixels
// (value != 0) get label 0; non-edge components are numbered 1.. in
// raster first-encounter order. Union-find with path compression +
// union-by-label-minimum (the reference's "connection" table resolves to
// the same representative structure).
//
// Returns the number of labels including label 0.
// ---------------------------------------------------------------------------
static int32_t uf_find(std::vector<int32_t>& parent, int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int32_t next = parent[x];
        parent[x] = root;
        x = next;
    }
    return root;
}

int32_t tsar_cc_label(const uint8_t* edges, int32_t h, int32_t w,
                      int32_t* labels) {
    std::vector<int32_t> parent;
    parent.reserve(static_cast<size_t>(h) * w / 16 + 2);
    parent.push_back(0);  // label 0 = edges

    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            const int64_t idx = static_cast<int64_t>(y) * w + x;
            if (edges[idx] != 0) {
                labels[idx] = 0;
                continue;
            }
            const bool left_ok = x > 0 && edges[idx - 1] == 0;
            const bool up_ok = y > 0 && edges[idx - w] == 0;
            if (!left_ok && !up_ok) {
                const int32_t fresh = static_cast<int32_t>(parent.size());
                parent.push_back(fresh);
                labels[idx] = fresh;
            } else if (left_ok && !up_ok) {
                labels[idx] = labels[idx - 1];
            } else if (!left_ok && up_ok) {
                labels[idx] = labels[idx - w];
            } else {
                int32_t a = uf_find(parent, labels[idx - 1]);
                int32_t b = uf_find(parent, labels[idx - w]);
                if (a > b) std::swap(a, b);
                parent[b] = a;
                labels[idx] = a;
            }
        }
    }

    // Resolve + renumber in raster first-encounter order.
    std::vector<int32_t> mapping(parent.size(), -1);
    mapping[0] = 0;
    int32_t next_label = 1;
    for (int64_t idx = 0; idx < static_cast<int64_t>(h) * w; ++idx) {
        if (labels[idx] == 0) continue;
        const int32_t root = uf_find(parent, labels[idx]);
        if (mapping[root] < 0) mapping[root] = next_label++;
        labels[idx] = mapping[root];
    }
    return next_label;
}

// ---------------------------------------------------------------------------
// Hough vote accumulation: for each point, vote into acc[rho][theta]
// with rho = round(x cos t + y sin t) + diag. acc has shape
// (2*diag + 1, n_theta), int32, caller-zeroed.
// ---------------------------------------------------------------------------
void tsar_hough_accumulate(const int32_t* xs, const int32_t* ys,
                           int64_t n, int32_t diag, int32_t n_theta,
                           const float* cos_t, const float* sin_t,
                           int32_t* acc) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = static_cast<float>(xs[i]);
        const float y = static_cast<float>(ys[i]);
        for (int32_t t = 0; t < n_theta; ++t) {
            const int32_t rho =
                static_cast<int32_t>(x * cos_t[t] + y * sin_t[t]
                                     + (x * cos_t[t] + y * sin_t[t] >= 0
                                        ? 0.5f : -0.5f));
            acc[static_cast<int64_t>(rho + diag) * n_theta + t] += 1;
        }
    }
}

// Subtract votes of used points (segment removal in the peak loop).
void tsar_hough_subtract(const int32_t* xs, const int32_t* ys,
                         int64_t n, int32_t diag, int32_t n_theta,
                         const float* cos_t, const float* sin_t,
                         int32_t* acc) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = static_cast<float>(xs[i]);
        const float y = static_cast<float>(ys[i]);
        for (int32_t t = 0; t < n_theta; ++t) {
            const int32_t rho =
                static_cast<int32_t>(x * cos_t[t] + y * sin_t[t]
                                     + (x * cos_t[t] + y * sin_t[t] >= 0
                                        ? 0.5f : -0.5f));
            acc[static_cast<int64_t>(rho + diag) * n_theta + t] -= 1;
        }
    }
}

// ---------------------------------------------------------------------------
// Roberts cross edge magnitude (reference main.cpp:214-241): interior
// sqrt((I(y,x)-I(y+1,x+1))^2 + (I(y+1,x)-I(y,x+1))^2); border forced to
// 100; saturate-cast to uint8 with rounding.
// ---------------------------------------------------------------------------
void tsar_roberts(const uint8_t* img, int32_t h, int32_t w,
                  uint8_t* out) {
    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            const int64_t idx = static_cast<int64_t>(y) * w + x;
            if (y == 0 || y == h - 1 || x == 0 || x == w - 1) {
                out[idx] = 100;
                continue;
            }
            const float d1 = static_cast<float>(img[idx])
                - static_cast<float>(img[idx + w + 1]);
            const float d2 = static_cast<float>(img[idx + w])
                - static_cast<float>(img[idx + 1]);
            float mag = __builtin_sqrtf(d1 * d1 + d2 * d2) + 0.5f;
            if (mag > 255.0f) mag = 255.0f;
            out[idx] = static_cast<uint8_t>(mag);
        }
    }
}

}  // extern "C"
