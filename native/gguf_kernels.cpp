// Native GGUF block-quant kernels (data-loader core).
//
// The TPU build's equivalent of the ggml dequant routines the reference
// gets from llama.cpp: C++ (OpenMP) decode of GGUF block formats into
//   - f32 dequantized tensors (lbox_dequant), and
//   - the TPU structure-of-arrays repack (lbox_repack):
//       w[i] = scales[i/group] * q[i] - mins[i/group]
// exactly matching llama_box_tpu/gguf/{quants,repack}.py (golden-tested).
//
// C ABI only; bound from Python via ctypes (gguf/native.py).
//
// Build: cc -O3 -march=native -fopenmp -shared -fPIC gguf_kernels.cpp
// Reference formats: ggml quants (public GGUF spec); llama-box consumes
// them via ggml (SURVEY.md §2.1 L0).

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, sizeof f);
    return f;
}

inline uint16_t rd16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}
inline uint32_t rd32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

// k-quant 6-bit scale/min unpack (Q4_K/Q5_K), per llama.cpp layout
inline void k4_scale_min(const uint8_t* s, int j, uint8_t* sc, uint8_t* mn) {
    if (j < 4) {
        *sc = s[j] & 63;
        *mn = s[j + 4] & 63;
    } else {
        *sc = (s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4);
        *mn = (s[j + 4] >> 4) | ((s[j] >> 6) << 4);
    }
}

struct BlockSpec {
    int64_t block_elems;
    int64_t block_bytes;
};

// ggml type ids (gguf/constants.py GGMLType)
enum {
    T_F32 = 0, T_F16 = 1,
    T_Q4_0 = 2, T_Q4_1 = 3, T_Q5_0 = 6, T_Q5_1 = 7, T_Q8_0 = 8,
    T_Q2_K = 10, T_Q3_K = 11, T_Q4_K = 12, T_Q5_K = 13, T_Q6_K = 14,
    T_IQ4_NL = 20, T_BF16 = 30,
};

bool block_spec(int t, BlockSpec* bs) {
    switch (t) {
        case T_Q4_0: *bs = {32, 18}; return true;
        case T_Q4_1: *bs = {32, 20}; return true;
        case T_Q5_0: *bs = {32, 22}; return true;
        case T_Q5_1: *bs = {32, 24}; return true;
        case T_Q8_0: *bs = {32, 34}; return true;
        case T_Q2_K: *bs = {256, 84}; return true;
        case T_Q3_K: *bs = {256, 110}; return true;
        case T_Q4_K: *bs = {256, 144}; return true;
        case T_Q5_K: *bs = {256, 176}; return true;
        case T_Q6_K: *bs = {256, 210}; return true;
        case T_IQ4_NL: *bs = {32, 18}; return true;
        default: return false;
    }
}

const int8_t IQ4_NL_TAB[16] = {-127, -104, -83, -65, -49, -35, -22, -10,
                               1, 13, 25, 38, 53, 69, 89, 113};

// Decode one block into (q int8, scales f32, mins f32|null) at group
// granularity; used by both dequant and repack paths.
// qo: block_elems int8; so/mo: block_elems/group floats. Returns group size.
int decode_block(int t, const uint8_t* b, int8_t* qo, float* so, float* mo) {
    switch (t) {
        case T_Q4_0: {
            float d = f16_to_f32(rd16(b));
            for (int l = 0; l < 16; ++l) {
                qo[l] = (int8_t)(b[2 + l] & 0x0F);
                qo[l + 16] = (int8_t)(b[2 + l] >> 4);
            }
            so[0] = d;
            if (mo) mo[0] = 8.0f * d;
            return 32;
        }
        case T_Q4_1: {
            float d = f16_to_f32(rd16(b));
            float m = f16_to_f32(rd16(b + 2));
            for (int l = 0; l < 16; ++l) {
                qo[l] = (int8_t)(b[4 + l] & 0x0F);
                qo[l + 16] = (int8_t)(b[4 + l] >> 4);
            }
            so[0] = d;
            if (mo) mo[0] = -m;
            return 32;
        }
        case T_Q5_0: {
            float d = f16_to_f32(rd16(b));
            uint32_t qh = rd32(b + 2);
            for (int l = 0; l < 16; ++l) {
                int lo = (b[6 + l] & 0x0F) | (((qh >> l) & 1) << 4);
                int hi = (b[6 + l] >> 4) | (((qh >> (l + 16)) & 1) << 4);
                qo[l] = (int8_t)lo;
                qo[l + 16] = (int8_t)hi;
            }
            so[0] = d;
            if (mo) mo[0] = 16.0f * d;
            return 32;
        }
        case T_Q5_1: {
            float d = f16_to_f32(rd16(b));
            float m = f16_to_f32(rd16(b + 2));
            uint32_t qh = rd32(b + 4);
            for (int l = 0; l < 16; ++l) {
                int lo = (b[8 + l] & 0x0F) | (((qh >> l) & 1) << 4);
                int hi = (b[8 + l] >> 4) | (((qh >> (l + 16)) & 1) << 4);
                qo[l] = (int8_t)lo;
                qo[l + 16] = (int8_t)hi;
            }
            so[0] = d;
            if (mo) mo[0] = -m;
            return 32;
        }
        case T_Q8_0: {
            float d = f16_to_f32(rd16(b));
            std::memcpy(qo, b + 2, 32);
            so[0] = d;
            if (mo) mo[0] = 0.0f;
            return 32;
        }
        case T_IQ4_NL: {
            float d = f16_to_f32(rd16(b));
            for (int l = 0; l < 16; ++l) {
                qo[l] = IQ4_NL_TAB[b[2 + l] & 0x0F];
                qo[l + 16] = IQ4_NL_TAB[b[2 + l] >> 4];
            }
            so[0] = d;
            if (mo) mo[0] = 0.0f;
            return 32;
        }
        case T_Q2_K: {
            const uint8_t* scales = b;
            const uint8_t* qs = b + 16;
            float d = f16_to_f32(rd16(b + 80));
            float dmin = f16_to_f32(rd16(b + 82));
            for (int half = 0; half < 2; ++half) {
                for (int j = 0; j < 4; ++j) {
                    int base = half * 128 + j * 32;
                    for (int l = 0; l < 32; ++l) {
                        qo[base + l] =
                            (int8_t)((qs[half * 32 + l] >> (2 * j)) & 3);
                    }
                }
            }
            for (int g = 0; g < 16; ++g) {
                so[g] = d * (float)(scales[g] & 0x0F);
                if (mo) mo[g] = dmin * (float)(scales[g] >> 4);
            }
            return 16;
        }
        case T_Q3_K: {
            const uint8_t* hm = b;
            const uint8_t* qs = b + 32;
            const uint8_t* sraw = b + 96;
            float d = f16_to_f32(rd16(b + 108));
            for (int j = 0; j < 2; ++j) {
                for (int shift = 0; shift < 4; ++shift) {
                    int base = j * 128 + shift * 32;
                    for (int l = 0; l < 32; ++l) {
                        int low = (qs[j * 32 + l] >> (2 * shift)) & 3;
                        int hbit = (hm[l] >> (j * 4 + shift)) & 1;
                        qo[base + l] = (int8_t)(low - (hbit ? 0 : 4));
                    }
                }
            }
            for (int g = 0; g < 16; ++g) {
                int low = (g < 8) ? (sraw[g] & 0x0F) : (sraw[g - 8] >> 4);
                int high = (sraw[8 + (g % 4)] >> (2 * (g / 4))) & 3;
                so[g] = d * (float)((low | (high << 4)) - 32);
                if (mo) mo[g] = 0.0f;
            }
            return 16;
        }
        case T_Q4_K: {
            float d = f16_to_f32(rd16(b));
            float dmin = f16_to_f32(rd16(b + 2));
            const uint8_t* scales = b + 4;
            const uint8_t* qs = b + 16;
            for (int c = 0; c < 4; ++c) {
                for (int l = 0; l < 32; ++l) {
                    qo[c * 64 + l] = (int8_t)(qs[c * 32 + l] & 0x0F);
                    qo[c * 64 + 32 + l] = (int8_t)(qs[c * 32 + l] >> 4);
                }
            }
            for (int g = 0; g < 8; ++g) {
                uint8_t sc, mn;
                k4_scale_min(scales, g, &sc, &mn);
                so[g] = d * (float)sc;
                if (mo) mo[g] = dmin * (float)mn;
            }
            return 32;
        }
        case T_Q5_K: {
            float d = f16_to_f32(rd16(b));
            float dmin = f16_to_f32(rd16(b + 2));
            const uint8_t* scales = b + 4;
            const uint8_t* qh = b + 16;
            const uint8_t* qs = b + 48;
            for (int c = 0; c < 4; ++c) {
                for (int l = 0; l < 32; ++l) {
                    int lo = (qs[c * 32 + l] & 0x0F)
                        + (((qh[l] >> (2 * c)) & 1) ? 16 : 0);
                    int hi = (qs[c * 32 + l] >> 4)
                        + (((qh[l] >> (2 * c + 1)) & 1) ? 16 : 0);
                    qo[c * 64 + l] = (int8_t)lo;
                    qo[c * 64 + 32 + l] = (int8_t)hi;
                }
            }
            for (int g = 0; g < 8; ++g) {
                uint8_t sc, mn;
                k4_scale_min(scales, g, &sc, &mn);
                so[g] = d * (float)sc;
                if (mo) mo[g] = dmin * (float)mn;
            }
            return 32;
        }
        case T_Q6_K: {
            const uint8_t* ql = b;
            const uint8_t* qh = b + 128;
            const int8_t* scales = (const int8_t*)(b + 192);
            float d = f16_to_f32(rd16(b + 208));
            for (int half = 0; half < 2; ++half) {
                const uint8_t* qlp = ql + half * 64;
                const uint8_t* qhp = qh + half * 32;
                for (int l = 0; l < 32; ++l) {
                    int q0 = ((qlp[l] & 0x0F) | (((qhp[l] >> 0) & 3) << 4)) - 32;
                    int q1 = ((qlp[32 + l] & 0x0F) | (((qhp[l] >> 2) & 3) << 4)) - 32;
                    int q2 = ((qlp[l] >> 4) | (((qhp[l] >> 4) & 3) << 4)) - 32;
                    int q3 = ((qlp[32 + l] >> 4) | (((qhp[l] >> 6) & 3) << 4)) - 32;
                    int base = half * 128;
                    qo[base + l] = (int8_t)q0;
                    qo[base + 32 + l] = (int8_t)q1;
                    qo[base + 64 + l] = (int8_t)q2;
                    qo[base + 96 + l] = (int8_t)q3;
                }
            }
            for (int g = 0; g < 16; ++g) {
                so[g] = d * (float)scales[g];
                if (mo) mo[g] = 0.0f;
            }
            return 16;
        }
        default:
            return -1;
    }
}

}  // namespace

extern "C" {

// group size for a format; -1 if unsupported
int lbox_group_size(int t) {
    switch (t) {
        case T_Q2_K: case T_Q3_K: case T_Q6_K: return 16;
        case T_Q4_0: case T_Q4_1: case T_Q5_0: case T_Q5_1:
        case T_Q8_0: case T_IQ4_NL: case T_Q4_K: case T_Q5_K: return 32;
        default: return -1;
    }
}

// 4 if codes fit 0..15 (packable nibbles), else 8; -1 unsupported
int lbox_qbits(int t) {
    switch (t) {
        case T_Q4_0: case T_Q4_1: case T_Q4_K: case T_Q2_K: return 4;
        case T_Q5_0: case T_Q5_1: case T_Q8_0: case T_IQ4_NL:
        case T_Q3_K: case T_Q5_K: case T_Q6_K: return 8;
        default: return -1;
    }
}

// raw block data -> int8 codes + f32 group scales/mins. n must be a
// multiple of the block size. Returns 0 on success.
int lbox_repack(int t, const uint8_t* raw, int64_t n,
                int8_t* q, float* scales, float* mins) {
    BlockSpec bs;
    if (!block_spec(t, &bs)) return -1;
    int64_t nb = n / bs.block_elems;
    int group = lbox_group_size(t);
    int64_t gpb = bs.block_elems / group;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        decode_block(t, raw + i * bs.block_bytes,
                     q + i * bs.block_elems,
                     scales + i * gpb,
                     mins ? mins + i * gpb : nullptr);
    }
    return 0;
}

// raw block data -> f32 (dequantize)
int lbox_dequant(int t, const uint8_t* raw, int64_t n, float* out) {
    if (t == T_F32) { std::memcpy(out, raw, n * 4); return 0; }
    if (t == T_F16) {
        const uint8_t* p = raw;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) out[i] = f16_to_f32(rd16(p + i * 2));
        return 0;
    }
    if (t == T_BF16) {
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) {
            uint32_t bits = (uint32_t)rd16(raw + i * 2) << 16;
            std::memcpy(out + i, &bits, 4);
        }
        return 0;
    }
    BlockSpec bs;
    if (!block_spec(t, &bs)) return -1;
    int group = lbox_group_size(t);
    int64_t nb = n / bs.block_elems;
    int64_t gpb = bs.block_elems / group;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        int8_t q[256];
        float s[16], m[16];
        decode_block(t, raw + i * bs.block_bytes, q, s, m);
        float* o = out + i * bs.block_elems;
        for (int64_t g = 0; g < gpb; ++g)
            for (int l = 0; l < group; ++l)
                o[g * group + l] = s[g] * (float)q[g * group + l] - m[g];
    }
    return 0;
}

int lbox_n_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
