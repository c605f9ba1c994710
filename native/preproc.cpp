// Native preprocessing library — the TPU-serving analog of the reference
// host runtime's image preprocess stage (resize / mean-sub / INT8 quantize
// before DMA; SURVEY.md §4.3). Python binds via ctypes (utils/preproc.py).
//
// Fused ops per image: bilinear resize (half-pixel centers, matching the
// numpy reference in utils/preproc.py) + per-channel normalize + optional
// symmetric int8 quantize — one pass, multithreaded across the batch, so
// the host keeps up with a continuously-batched TPU engine.
//
// Build: make -C native   (g++ -O3 -shared; no external deps)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample of channel c at (y, x) from HWC uint8.
inline float sample(const uint8_t* img, int h, int w, int ch, float y,
                    float x, int c) {
    int y0 = (int)std::floor(y), x0 = (int)std::floor(x);
    int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
    float fy = y - y0, fx = x - x0;
    y0 = std::max(y0, 0); x0 = std::max(x0, 0);
    const float v00 = img[(y0 * w + x0) * ch + c];
    const float v01 = img[(y0 * w + x1) * ch + c];
    const float v10 = img[(y1 * w + x0) * ch + c];
    const float v11 = img[(y1 * w + x1) * ch + c];
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) +
           (v10 * (1 - fx) + v11 * fx) * fy;
}

template <typename OutT, bool kQuant>
void preproc_one(const uint8_t* src, int in_h, int in_w, int ch, int out_h,
                 int out_w, const float* mean, const float* stdv,
                 float inv_scale, OutT* dst) {
    const float sy = (float)in_h / out_h, sx = (float)in_w / out_w;
    for (int oy = 0; oy < out_h; ++oy) {
        const float y = (oy + 0.5f) * sy - 0.5f;
        for (int ox = 0; ox < out_w; ++ox) {
            const float x = (ox + 0.5f) * sx - 0.5f;
            OutT* out_px = dst + (oy * out_w + ox) * ch;
            for (int c = 0; c < ch; ++c) {
                float v = sample(src, in_h, in_w, ch, y, x, c);
                v = (v / 255.0f - mean[c]) / stdv[c];
                if (kQuant) {
                    out_px[c] = (OutT)clampf(std::nearbyint(v * inv_scale),
                                             -127.0f, 127.0f);
                } else {
                    out_px[c] = (OutT)v;
                }
            }
        }
    }
}

template <typename OutT, bool kQuant>
void preproc_batch_impl(const uint8_t* src, int n, int in_h, int in_w,
                        int ch, int out_h, int out_w, const float* mean,
                        const float* stdv, float scale, OutT* dst,
                        int n_threads) {
    const size_t in_stride = (size_t)in_h * in_w * ch;
    const size_t out_stride = (size_t)out_h * out_w * ch;
    const float inv_scale = kQuant ? 1.0f / scale : 0.0f;
    n_threads = std::max(1, std::min<int>(n_threads, n));
    std::atomic<int> next{0};
    auto worker = [&] {
        int i;
        while ((i = next.fetch_add(1)) < n) {
            preproc_one<OutT, kQuant>(src + i * in_stride, in_h, in_w, ch,
                                      out_h, out_w, mean, stdv, inv_scale,
                                      dst + i * out_stride);
        }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// src: (n, in_h, in_w, ch) uint8 RGB; dst: (n, out_h, out_w, ch) float32
void preproc_batch_f32(const uint8_t* src, int n, int in_h, int in_w, int ch,
                       int out_h, int out_w, const float* mean,
                       const float* stdv, float* dst, int n_threads) {
    preproc_batch_impl<float, false>(src, n, in_h, in_w, ch, out_h, out_w,
                                     mean, stdv, 0.0f, dst, n_threads);
}

// dst int8 = clip(round(normalized / scale)) — feeds the engine's int8
// input directly (skips the on-device quantize + 4x input HBM traffic)
void preproc_batch_i8(const uint8_t* src, int n, int in_h, int in_w, int ch,
                      int out_h, int out_w, const float* mean,
                      const float* stdv, float scale, int8_t* dst,
                      int n_threads) {
    preproc_batch_impl<int8_t, true>(src, n, in_h, in_w, ch, out_h, out_w,
                                     mean, stdv, scale, dst, n_threads);
}

int preproc_abi_version() { return 1; }

}  // extern "C"
