// Native host-side data loader: batched uint8 letterbox/stretch resize,
// BGR→RGB, gray padding — the TPU-native equivalent of the OpenCV imgproc
// surface the reference leans on (SURVEY.md §2.14: "OpenCV C++ imgproc
// resize/normalize" row). Used by the host preprocessing path to assemble
// mixed-resolution images into one fixed-shape uint8 batch so a single
// compiled device executable serves any directory (frames still cross
// host→HBM as raw uint8; normalization stays on-device).
//
// Bilinear with half-pixel centers (cv2.INTER_LINEAR semantics, float
// accumulation, round-half-up) — matches cv2 within ±1 LSB.
//
// Build: g++ -O3 -shared -fPIC -fopenmp preproc.cpp -o libpreproc.so
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                               uint8_t* dst, int dh, int dw, bool swap_rb) {
    const float sx = static_cast<float>(sw) / dw;
    const float sy = static_cast<float>(sh) / dh;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = static_cast<int>(std::floor(fy));
        float wy = fy - y0;
        int y1 = std::min(y0 + 1, sh - 1);
        y0 = std::max(y0, 0);
        const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
        const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
        uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = static_cast<int>(std::floor(fx));
            float wx = fx - x0;
            int x1 = std::min(x0 + 1, sw - 1);
            x0 = std::max(x0, 0);
            const uint8_t* p00 = row0 + x0 * 3;
            const uint8_t* p01 = row0 + x1 * 3;
            const uint8_t* p10 = row1 + x0 * 3;
            const uint8_t* p11 = row1 + x1 * 3;
            for (int c = 0; c < 3; ++c) {
                int cc = swap_rb ? 2 - c : c;
                float v = (1 - wy) * ((1 - wx) * p00[cc] + wx * p01[cc]) +
                          wy * ((1 - wx) * p10[cc] + wx * p11[cc]);
                out[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

}  // namespace

extern "C" {

// Letterbox one image into a caller-provided (nh, nw, 3) canvas that has
// already been filled with the pad value. Returns 0 on success.
int letterbox_one(const uint8_t* src, int sh, int sw, uint8_t* dst, int nh,
                  int nw, int swap_rb) {
    if (!src || !dst || sh <= 0 || sw <= 0 || nh <= 0 || nw <= 0) return -1;
    // double precision + round-half-up, matching the Python/device
    // letterbox_params exactly (float/lround disagreed on half-pixel cases)
    const double scale = std::min(static_cast<double>(nh) / sh,
                                  static_cast<double>(nw) / sw);
    const int rh = std::max(1, static_cast<int>(std::floor(sh * scale + 0.5)));
    const int rw = std::max(1, static_cast<int>(std::floor(sw * scale + 0.5)));
    const int top = (nh - rh) / 2;
    const int left = (nw - rw) / 2;
    // resize into a stack/heap strip then blit (keeps the inner loop simple)
    uint8_t* strip = new uint8_t[static_cast<size_t>(rh) * rw * 3];
    resize_bilinear_u8(src, sh, sw, strip, rh, rw, swap_rb != 0);
    for (int y = 0; y < rh; ++y) {
        std::memcpy(dst + ((static_cast<size_t>(top) + y) * nw + left) * 3,
                    strip + static_cast<size_t>(y) * rw * 3,
                    static_cast<size_t>(rw) * 3);
    }
    delete[] strip;
    return 0;
}

// Batched letterbox of same-shape sources. dst must be pre-filled with pad.
int letterbox_batch(const uint8_t* src, int n, int sh, int sw, uint8_t* dst,
                    int nh, int nw, int swap_rb) {
    if (!src || !dst || n <= 0) return -1;
    int rc = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        int r = letterbox_one(src + static_cast<size_t>(i) * sh * sw * 3, sh,
                              sw, dst + static_cast<size_t>(i) * nh * nw * 3,
                              nh, nw, swap_rb);
        if (r != 0) rc = r;
    }
    return rc;
}

// Mixed-shape batch: per-image (sh, sw) arrays and per-image src pointers.
int letterbox_mixed(const uint8_t* const* srcs, const int* shs,
                    const int* sws, int n, uint8_t* dst, int nh, int nw,
                    int swap_rb) {
    if (!srcs || !dst || n <= 0) return -1;
    int rc = 0;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        int r = letterbox_one(srcs[i], shs[i], sws[i],
                              dst + static_cast<size_t>(i) * nh * nw * 3, nh,
                              nw, swap_rb);
        if (r != 0) rc = r;
    }
    return rc;
}

// Plain aspect-distorting resize (the reference's probable preprocessing,
// SURVEY.md §2.3 caveat) batched over same-shape sources.
int stretch_batch(const uint8_t* src, int n, int sh, int sw, uint8_t* dst,
                  int nh, int nw, int swap_rb) {
    if (!src || !dst || n <= 0) return -1;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int i = 0; i < n; ++i) {
        resize_bilinear_u8(src + static_cast<size_t>(i) * sh * sw * 3, sh, sw,
                           dst + static_cast<size_t>(i) * nh * nw * 3, nh, nw,
                           swap_rb != 0);
    }
    return 0;
}

int preproc_version() { return 1; }

}  // extern "C"
