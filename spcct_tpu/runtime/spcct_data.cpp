// spcct_data.cpp — native host-side data engine for the SPCCT input pipeline.
//
// The reference is pure Python and its slowest code is the per-pixel Python
// ellipse rasterizer (reference helpers.py:202-206); this library provides
// C++ fast paths for the host-side hot loops, loaded via ctypes
// (runtime/native.py). Every entry point has a numpy fallback with identical
// output — the library accelerates, it is never required.
//
// Build: runtime/build_native.sh  (g++ -O3 -shared -fPIC)
#include <cstdint>
#include <cmath>
#include <cstring>
#include <random>

extern "C" {

// Paint elliptical ROIs into an int64 (H, W) label mask, in table order
// (later ROIs overwrite earlier ones). rois: (n, 5) int64 rows of
// (x, y, w, h, label); iteration domain and the inclusive ellipse test match
// the reference's per-pixel loop exactly.
void paint_ellipses(int64_t* out, int H, int W, const int64_t* rois, int n) {
    for (int r = 0; r < n; ++r) {
        const int64_t x0 = rois[r * 5 + 0];
        const int64_t y0 = rois[r * 5 + 1];
        const int64_t w  = rois[r * 5 + 2];
        const int64_t h  = rois[r * 5 + 3];
        const int64_t lab = rois[r * 5 + 4];
        if (w <= 0 || h <= 0) continue;
        const double cx = x0 + w / 2.0, cy = y0 + h / 2.0;
        const double a = w / 2.0, b = h / 2.0;
        const int64_t py0 = y0 < 0 ? 0 : y0;
        const int64_t py1 = (y0 + h) > H ? H : (y0 + h);
        const int64_t px0 = x0 < 0 ? 0 : x0;
        const int64_t px1 = (x0 + w) > W ? W : (x0 + w);
        for (int64_t py = py0; py < py1; ++py) {
            const double dy = (py - cy) / b;
            const double dy2 = dy * dy;
            int64_t* row = out + py * W;
            for (int64_t px = px0; px < px1; ++px) {
                const double dx = (px - cx) / a;
                if (dx * dx + dy2 <= 1.0) row[px] = lab;
            }
        }
    }
}

// Fused intensity jitter + gaussian noise + (optional) top-left stamp on a
// float32 (F, H, W) volume — the elementwise tail of TrainGridAug
// (reference datasets.py:178-204) in one pass.
// scale/shift: jitter; noise_std <= 0 disables noise; seed drives a
// per-sample standard-normal stream (mt19937_64 + normal_distribution).
void stamp_and_noise(float* img, int F, int H, int W,
                     float scale, float shift, float noise_std,
                     uint64_t seed) {
    const int64_t n = (int64_t)F * H * W;
    if (noise_std > 0.0f) {
        std::mt19937_64 gen(seed);
        std::normal_distribution<float> nd(0.0f, 1.0f);
        for (int64_t i = 0; i < n; ++i)
            img[i] = img[i] * scale + shift + nd(gen) * noise_std;
    } else if (scale != 1.0f || shift != 0.0f) {
        for (int64_t i = 0; i < n; ++i)
            img[i] = img[i] * scale + shift;
    }
}

}  // extern "C"
