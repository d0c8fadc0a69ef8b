// Native CPU implementations of the three ops the reference shipped as
// CUDA extensions (reference: models/flownet2_pytorch/networks/
// {correlation,resample2d,channelnorm}_package/*.cu) — used as
// independent parity oracles for the TPU kernels and as a fast host-side
// fallback. NHWC layout, float32, OpenMP-parallel over batch*rows.
//
// Build: make -C native   (produces libvid2vid_kernels.so; loaded via
// ctypes in vid2vid_tpu/native.py)

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// Cost volume: out[b, y, x, (tj+rad)*D + (ti+rad)] =
//   mean_c f1[b,y,x,c] * f2[b, y+tj*s2, x+ti*s2, c], zero padded.
void correlation_forward(const float* f1, const float* f2, float* out,
                         int64_t b, int64_t h, int64_t w, int64_t c,
                         int64_t max_disp, int64_t stride2) {
  const int64_t rad = max_disp / stride2;
  const int64_t d = 2 * rad + 1;
  const int64_t n_out = d * d;
  const float inv_c = 1.0f / static_cast<float>(c);
#pragma omp parallel for collapse(2)
  for (int64_t bi = 0; bi < b; ++bi) {
    for (int64_t y = 0; y < h; ++y) {
      for (int64_t x = 0; x < w; ++x) {
        const float* p1 = f1 + ((bi * h + y) * w + x) * c;
        float* po = out + ((bi * h + y) * w + x) * n_out;
        for (int64_t tj = -rad; tj <= rad; ++tj) {
          const int64_t y2 = y + tj * stride2;
          for (int64_t ti = -rad; ti <= rad; ++ti) {
            const int64_t x2 = x + ti * stride2;
            float acc = 0.0f;
            if (y2 >= 0 && y2 < h && x2 >= 0 && x2 < w) {
              const float* p2 = f2 + ((bi * h + y2) * w + x2) * c;
              for (int64_t ch = 0; ch < c; ++ch) acc += p1[ch] * p2[ch];
            }
            po[(tj + rad) * d + (ti + rad)] = acc * inv_c;
          }
        }
      }
    }
  }
}

// Bilinear warp by pixel flow with border clamping:
// out[b,y,x,:] = bilinear_sample(img[b], y + flow[...,1], x + flow[...,0]).
void resample2d_forward(const float* img, const float* flow, float* out,
                        int64_t b, int64_t h, int64_t w, int64_t c) {
#pragma omp parallel for collapse(2)
  for (int64_t bi = 0; bi < b; ++bi) {
    for (int64_t y = 0; y < h; ++y) {
      for (int64_t x = 0; x < w; ++x) {
        const float* pf = flow + ((bi * h + y) * w + x) * 2;
        const float sx = static_cast<float>(x) + pf[0];
        const float sy = static_cast<float>(y) + pf[1];
        const float fx = std::floor(sx), fy = std::floor(sy);
        const float wx = sx - fx, wy = sy - fy;
        auto clampi = [](int64_t v, int64_t hi) {
          return std::max<int64_t>(0, std::min<int64_t>(hi, v));
        };
        const int64_t x0 = clampi((int64_t)fx, w - 1);
        const int64_t x1 = clampi((int64_t)fx + 1, w - 1);
        const int64_t y0 = clampi((int64_t)fy, h - 1);
        const int64_t y1 = clampi((int64_t)fy + 1, h - 1);
        const float* p00 = img + ((bi * h + y0) * w + x0) * c;
        const float* p01 = img + ((bi * h + y0) * w + x1) * c;
        const float* p10 = img + ((bi * h + y1) * w + x0) * c;
        const float* p11 = img + ((bi * h + y1) * w + x1) * c;
        float* po = out + ((bi * h + y) * w + x) * c;
        for (int64_t ch = 0; ch < c; ++ch) {
          const float top = p00[ch] * (1 - wx) + p01[ch] * wx;
          const float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
          po[ch] = top * (1 - wy) + bot * wy;
        }
      }
    }
  }
}

// Per-pixel L2 norm over channels.
void channelnorm_forward(const float* x, float* out, int64_t b, int64_t h,
                         int64_t w, int64_t c) {
  const int64_t n = b * h * w;
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    const float* p = x + i * c;
    float acc = 0.0f;
    for (int64_t ch = 0; ch < c; ++ch) acc += p[ch] * p[ch];
    out[i] = std::sqrt(acc);
  }
}

}  // extern "C"
