// neural-tpu native codec: multithreaded RTN quantization + bit-plane
// packing + ggml block decode.
//
// TPU-native analog of the reference's C++ conversion hot path
// (neural_speed/core/layers/bestla_gemm.cpp:34-190 BTLAGemmQuantPackB —
// multithreaded weight quantize+pack — and the ggml block codecs in
// core/data_types.h / vectors/cpu/quantize.h). The TPU compute path is
// JAX/Pallas; this library accelerates the HOST side: converting 10s-of-GB
// checkpoints (quantize, pack, ggml decode) at memory bandwidth instead of
// single-threaded numpy speed. Exposed via a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp ntpu_native.cpp
//        -o libntpu_native.so
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// RTN quantization, groups along K of a [K, N] row-major f32 matrix.
// codes:  uint8 [K, N]   (unsigned storage domain, like core/qtensor.py)
// scales: f32   [K/g, N]
// zeros:  uint8 [K/g, N] (asym only, may be null)
// ---------------------------------------------------------------------------
void rtn_quantize_f32(const float* w, int64_t K, int64_t N, int group,
                      int bits, int sym, uint8_t* codes, float* scales,
                      uint8_t* zeros) {
  const int64_t G = K / group;
  const int maxq = (1 << bits) - 1;
  const int half = 1 << (bits - 1);
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t gi = 0; gi < G; ++gi) {
    for (int64_t n = 0; n < N; ++n) {
      const int64_t k0 = gi * group;
      if (bits == 1) {
        float amean = 0.f;
        for (int64_t k = 0; k < group; ++k)
          amean += std::fabs(w[(k0 + k) * N + n]);
        amean = amean / group + 1e-9f;
        scales[gi * N + n] = amean;
        for (int64_t k = 0; k < group; ++k)
          codes[(k0 + k) * N + n] = w[(k0 + k) * N + n] >= 0.f ? 1 : 0;
      } else if (sym) {
        float amax = 0.f;
        for (int64_t k = 0; k < group; ++k)
          amax = std::max(amax, std::fabs(w[(k0 + k) * N + n]));
        const float s = amax / half + 1e-9f;
        scales[gi * N + n] = s;
        const float inv = 1.0f / s;
        for (int64_t k = 0; k < group; ++k) {
          int q = (int)std::lrintf(w[(k0 + k) * N + n] * inv);
          q = std::min(std::max(q, -half), half - 1);
          codes[(k0 + k) * N + n] = (uint8_t)(q + half);
        }
      } else {
        float lo = 0.f, hi = 0.f;
        for (int64_t k = 0; k < group; ++k) {
          const float v = w[(k0 + k) * N + n];
          lo = std::min(lo, v);
          hi = std::max(hi, v);
        }
        const float s = (hi - lo) / maxq + 1e-9f;
        scales[gi * N + n] = s;
        int zp = (int)std::lrintf(-lo / s);
        zp = std::min(std::max(zp, 0), maxq);
        zeros[gi * N + n] = (uint8_t)zp;
        const float inv = 1.0f / s;
        for (int64_t k = 0; k < group; ++k) {
          int q = (int)std::lrintf(w[(k0 + k) * N + n] * inv) + zp;
          q = std::min(std::max(q, 0), maxq);
          codes[(k0 + k) * N + n] = (uint8_t)q;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Chunk-local bit-plane packing (core/qtensor.py pack_plane): within each
// run of `chunk` K-values, sub-chunk c of 8/p stores at bit offset p*c.
// vals: uint8 [K, N] with entries < 2^p → out uint8 [K*p/8, N].
// ---------------------------------------------------------------------------
void pack_plane_u8(const uint8_t* vals, int64_t K, int64_t N, int p,
                   int chunk, uint8_t* out) {
  if (p == 8) { std::memcpy(out, vals, (size_t)(K * N)); return; }
  const int per_byte = 8 / p;
  const int sub = chunk / per_byte;
  const int64_t n_chunks = K / chunk;
#pragma omp parallel for schedule(static)
  for (int64_t ci = 0; ci < n_chunks; ++ci) {
    for (int r = 0; r < sub; ++r) {
      uint8_t* dst = out + (ci * sub + r) * N;
      std::memset(dst, 0, (size_t)N);
      for (int c = 0; c < per_byte; ++c) {
        const uint8_t* src = vals + (ci * chunk + c * sub + r) * N;
        const int shift = p * c;
        for (int64_t n = 0; n < N; ++n) dst[n] |= (uint8_t)(src[n] << shift);
      }
    }
  }
}

void unpack_plane_u8(const uint8_t* packed, int64_t K, int64_t N, int p,
                     int chunk, uint8_t* out) {
  if (p == 8) { std::memcpy(out, packed, (size_t)(K * N)); return; }
  const int per_byte = 8 / p;
  const int sub = chunk / per_byte;
  const int64_t n_chunks = K / chunk;
  const uint8_t mask = (uint8_t)((1 << p) - 1);
#pragma omp parallel for schedule(static)
  for (int64_t ci = 0; ci < n_chunks; ++ci) {
    for (int r = 0; r < sub; ++r) {
      const uint8_t* src = packed + (ci * sub + r) * N;
      for (int c = 0; c < per_byte; ++c) {
        uint8_t* dst = out + (ci * chunk + c * sub + r) * N;
        const int shift = p * c;
        for (int64_t n = 0; n < N; ++n)
          dst[n] = (uint8_t)((src[n] >> shift) & mask);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// ggml Q4_0 block decode: n/32 blocks of [f16 d | 16 bytes nibbles] →
// f32 out[n]. Low nibbles are elements 0..15, high are 16..31 (ggml).
// ---------------------------------------------------------------------------
static inline float f16_to_f32(uint16_t h) {
  const uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  const uint32_t exp = (h >> 10) & 0x1F;
  const uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) { bits = sign; }
    else {  // subnormal
      float f = man * (1.0f / 16777216.0f);  // man * 2^-24
      std::memcpy(&bits, &f, 4);
      bits |= sign;
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp + 112) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

void dequant_q4_0(const uint8_t* blocks, int64_t n, float* out) {
  const int64_t nb = n / 32;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = blocks + b * 18;
    uint16_t h;
    std::memcpy(&h, blk, 2);
    const float d = f16_to_f32(h);
    float* o = out + b * 32;
    for (int j = 0; j < 16; ++j) {
      const uint8_t q = blk[2 + j];
      o[j] = ((int)(q & 0xF) - 8) * d;
      o[j + 16] = ((int)(q >> 4) - 8) * d;
    }
  }
}

void dequant_q8_0(const uint8_t* blocks, int64_t n, float* out) {
  const int64_t nb = n / 32;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = blocks + b * 34;
    uint16_t h;
    std::memcpy(&h, blk, 2);
    const float d = f16_to_f32(h);
    const int8_t* q = (const int8_t*)(blk + 2);
    float* o = out + b * 32;
    for (int j = 0; j < 32; ++j) o[j] = q[j] * d;
  }
}

int ntpu_native_version() { return 1; }

int ntpu_native_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
