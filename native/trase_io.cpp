// trase_io — native host-side IO kernels for the TPU feeding path.
//
// The reference keeps its hot host work in C/CUDA (bitarray decode via
// torch, image ops via PIL/cv2's C cores). Here the per-iteration
// host-side stages that sit on the train loop's critical path are
// implemented as a small multithreaded C++ library, bound via ctypes
// (no pybind11 in this environment):
//
//   - unpack_masks_padded: bit-packed SAM mask stack -> zero-padded
//     float32 (m_max, H, W) in one pass (replaces
//     np.unpackbits + reshape + astype + pad, four full passes);
//   - rgba_to_rgb_f32: HWC uint8 RGBA -> CHW float32 RGB composited on
//     a background color (the reference's PILtoTorch + blend,
//     utils/general_utils.py:24-28).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtrase_io.so \
//            trase_io.cpp -lpthread   (driven by trase_tpu/native.py)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// 256 x 8 float expansion table: byte -> 8 floats (MSB-first), so the
// inner loop is one 32-byte table copy per input byte (memory-bound)
// instead of 8 scalar shift/mask/stores.
struct BitLut {
    float t[256][8];
    BitLut() {
        for (int b = 0; b < 256; ++b)
            for (int i = 0; i < 8; ++i)
                t[b][i] = (b >> (7 - i)) & 1 ? 1.0f : 0.0f;
    }
};
const BitLut kLut;

void unpack_range(const uint8_t* packed, float* out, int64_t bit0,
                  int64_t bit1) {
    int64_t i = bit0;
    // head: align to a byte boundary
    for (; i < bit1 && (i & 7); ++i)
        out[i] = (packed[i >> 3] >> (7 - (i & 7))) & 1 ? 1.0f : 0.0f;
    // body: whole bytes via the LUT
    for (; i + 8 <= bit1; i += 8)
        std::memcpy(out + i, kLut.t[packed[i >> 3]], 8 * sizeof(float));
    // tail
    for (; i < bit1; ++i)
        out[i] = (packed[i >> 3] >> (7 - (i & 7))) & 1 ? 1.0f : 0.0f;
}

int n_workers(int64_t work, int64_t grain) {
    int hw = static_cast<int>(std::thread::hardware_concurrency());
    if (hw < 1) hw = 1;
    int64_t want = work / grain + 1;
    return static_cast<int>(want < hw ? want : hw);
}

}  // namespace

extern "C" {

// packed: ceil(n*h*w/8) bytes, MSB-first (np.packbits layout).
// out: m_max*h*w float32, rows >= n zeroed.
void unpack_masks_padded(const uint8_t* packed, int64_t n, int64_t h,
                         int64_t w, int64_t m_max, float* out) {
    const int64_t real = (n < m_max ? n : m_max) * h * w;
    const int64_t total = m_max * h * w;
    const int nw = n_workers(real, 1 << 20);
    std::vector<std::thread> ts;
    const int64_t chunk = (real + nw - 1) / nw;
    for (int t = 0; t < nw; ++t) {
        int64_t b0 = t * chunk;
        int64_t b1 = b0 + chunk < real ? b0 + chunk : real;
        if (b0 >= b1) break;
        ts.emplace_back(unpack_range, packed, out, b0, b1);
    }
    for (auto& t : ts) t.join();
    if (total > real) {
        std::memset(out + real, 0, sizeof(float) * (total - real));
    }
}

// rgba: h*w*4 uint8 (HWC). out: 3*h*w float32 (CHW), alpha-composited
// on bg[3] in [0,1]. Pass has_alpha=0 for plain RGB input (h*w*3).
void rgba_to_rgb_f32(const uint8_t* rgba, int64_t h, int64_t w,
                     int has_alpha, const float* bg, float* out) {
    const int64_t hw = h * w;
    const int c_in = has_alpha ? 4 : 3;
    const float inv = 1.0f / 255.0f;
    const int nw = n_workers(hw * 3, 1 << 20);
    std::vector<std::thread> ts;
    const int64_t chunk = (hw + nw - 1) / nw;
    auto body = [=](int64_t p0, int64_t p1) {
        for (int64_t p = p0; p < p1; ++p) {
            const uint8_t* px = rgba + p * c_in;
            float a = has_alpha ? px[3] * inv : 1.0f;
            for (int c = 0; c < 3; ++c) {
                float v = px[c] * inv * a + bg[c] * (1.0f - a);
                out[c * hw + p] = v < 0 ? 0 : (v > 1 ? 1 : v);
            }
        }
    };
    for (int t = 0; t < nw; ++t) {
        int64_t p0 = t * chunk;
        int64_t p1 = p0 + chunk < hw ? p0 + chunk : hw;
        if (p0 >= p1) break;
        ts.emplace_back(body, p0, p1);
    }
    for (auto& t : ts) t.join();
}

}  // extern "C"
