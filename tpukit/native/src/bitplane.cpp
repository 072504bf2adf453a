// Embedded bit-plane coder for wavelet coefficients (group-significance
// coding, EZW/SPECK-family). Shared entropy backend of tpukit's transform
// codecs:
//   * j2k     — reversible 5/3 (lossless) or quantized 9/7 (quality mode)
//   * ccsds122 — integer 9/7M with per-band bpp-targeted truncation
//
// The stream is *embedded*: truncating it at any byte yields a valid
// lower-rate reconstruction (decoder mid-point fills unseen planes), which
// is what gives the CCSDS-122-style `-r {bpp}` rate control surface
// (reference tools/codecs/ccsds122/ccsds122_wrap.py:110-121) a principled
// in-framework implementation.
//
// Layout: [u8 nplanes][bit stream MSB-first]. Coefficients arrive in the
// caller's scan order (coarse subbands first for best embedded quality).
// Refinement bits are emitted in order of significance acquisition (a list
// both sides maintain identically), so refinement cost scales with the
// number of significant coefficients, not with n.
//
// Throughput design (the two hot loops):
//   * significance pass — per-coefficient MSB indices live in 16-byte
//     group lanes; one SSE2 compare+movemask per (group, plane) yields the
//     "becomes significant here" mask, so the common nothing-happens group
//     costs a handful of instructions and its bits join a bulk zero run
//     (put_zeros skips pre-zeroed output bytes; the decoder tests the
//     group's significance bits against zero as one window word).
//   * refinement pass — significant coefficients are kept DENSE in
//     acquisition order (magnitudes copied aside), so refinement reads and
//     writes stream linearly and vectorizes: AVX2 extracts/applies 8
//     refinement bits per step instead of gathering through an index list.
//   * decoder bookkeeping for still-insignificant members is skipped
//     entirely (they reconstruct to 0 regardless), and truncation midpoint
//     planes are recovered from three scalars (lowest fully-refined plane,
//     partial-plane cursor) + per-entry acquisition planes instead of a
//     per-coefficient "known plane" array.
// Both sides keep bit-by-bit tail paths near the end of the stream so
// truncated-budget semantics stay bit-identical to the plain coder.

#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>
#if defined(__SSE2__) || defined(__AVX2__) || defined(__AVX512F__)
#include <immintrin.h>
#endif
#include "bitio.hpp"

using namespace tpukit;

namespace {
constexpr int GROUP = 16;

inline int msb_index(uint32_t v) {  // -1 for 0
    return v ? 31 - __builtin_clz(v) : -1;
}

// 8-bit reverse LUT: movemask packs lane 0 into bit 0, the stream wants
// the first (lowest-index) entry most-significant
struct Rev8 {
    uint8_t t[256];
    Rev8() {
        for (int i = 0; i < 256; ++i) {
            uint8_t r = 0;
            for (int b = 0; b < 8; ++b) r |= ((i >> b) & 1) << (7 - b);
            t[i] = r;
        }
    }
};
const Rev8 REV8;

inline uint32_t rev16(uint32_t x) {  // bit-reverse the low 16 bits
    return ((uint32_t)REV8.t[x & 0xFF] << 8) | REV8.t[(x >> 8) & 0xFF];
}
}

static int64_t encode_body(const int32_t* coef, int64_t n, uint8_t* out,
                           int64_t out_cap, int64_t max_bytes) {
    if (n <= 0 || out_cap < 2) return -1;
    std::vector<uint32_t> mag((size_t)n);
    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<int8_t> topg((size_t)ngroups, -1);   // msb plane per group
    std::vector<uint16_t> rem((size_t)ngroups);      // insignificant members
    // per-member MSB planes, one 16-byte lane per group (pad = -1)
    std::vector<int8_t> msb8((size_t)ngroups * GROUP, -1);
    uint32_t maxmag = 0;
    int64_t g0 = 0;
#if defined(__AVX512F__) && defined(__AVX512CD__)
    // fused setup: one 16-lane pass per group computes |coef|, the per-
    // member MSB planes (31 - lzcnt; -1 for zero), the group max, and the
    // running magnitude max — replaces two scalar passes over n
    {
        __m512i maxv = _mm512_setzero_si512();
        const __m512i c31 = _mm512_set1_epi32(31);
        int64_t gfull = n / GROUP;
        for (; g0 < gfull; ++g0) {
            const int64_t lo = g0 * GROUP;
            __m512i v = _mm512_loadu_si512((const void*)(coef + lo));
            __m512i m = _mm512_abs_epi32(v);
            _mm512_storeu_si512((void*)&mag[(size_t)lo], m);
            maxv = _mm512_max_epu32(maxv, m);
            __m512i msb = _mm512_sub_epi32(c31, _mm512_lzcnt_epi32(m));
            _mm_storeu_si128((__m128i*)&msb8[(size_t)lo],
                             _mm512_cvtepi32_epi8(msb));
            topg[g0] = (int8_t)_mm512_reduce_max_epi32(msb);
            rem[g0] = 0xFFFF;
        }
        maxmag = _mm512_reduce_max_epu32(maxv);
    }
#endif
    for (int64_t g = g0; g < ngroups; ++g) {
        int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
        int t = -1;
        for (int64_t i = lo; i < hi; ++i) {
            uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i]
                                                : coef[i]);
            mag[i] = m;
            if (m > maxmag) maxmag = m;
            int c = msb_index(m);
            msb8[(size_t)(g * GROUP + (i - lo))] = (int8_t)c;
            t = c > t ? c : t;
        }
        topg[g] = (int8_t)t;
        rem[g] = (uint16_t)((hi - lo == GROUP) ? 0xFFFF
                                               : ((1u << (hi - lo)) - 1u));
    }
    int nplanes = msb_index(maxmag) + 1;
    out[0] = (uint8_t)nplanes;

    int64_t budget = max_bytes > 0 ? (max_bytes < out_cap ? max_bytes : out_cap)
                                   : out_cap;
    BitWriter bw(out + 1, budget - 1);   // put_zeros memsets its own runs
    // significant magnitudes, dense, in acquisition order (refinement
    // source — no index gather in the hot loop); uninitialized upper-bound
    // buffer + cursor, same as the decoder
    std::unique_ptr<uint32_t[]> sig_mag_v(new uint32_t[(size_t)n]);
    uint32_t* sig_mag = sig_mag_v.get();
    size_t n_sig = 0;

    for (int p = nplanes - 1; p >= 0 && !bw.overflow; --p) {
        size_t n_sig_before = n_sig;
#ifdef __SSE2__
        const __m128i pv = _mm_set1_epi8((char)p);
#endif
        int64_t zrun = 0;                    // pending zero bits
        // significance pass (group-gated, SIMD member test)
        for (int64_t g = 0; g < ngroups; ++g) {
            if (topg[g] < p) { ++zrun; continue; }   // inactive gate: 0
            const uint16_t mask = rem[g];
#ifdef __SSE2__
            const __m128i mv = _mm_loadu_si128(
                (const __m128i*)&msb8[(size_t)g * GROUP]);
            const uint32_t hit =
                (uint32_t)_mm_movemask_epi8(_mm_cmpeq_epi8(mv, pv)) & mask;
#else
            uint32_t hit = 0;
            for (int j = 0; j < GROUP; ++j)
                hit |= (uint32_t)(msb8[(size_t)g * GROUP + j] == (int8_t)p)
                       << j;
            hit &= mask;
#endif
            if (hit == 0) {
                // active group, nothing becomes significant on this plane
                // (gate 1 never coincides with hit==0: the max member hits
                // exactly at topg)
                zrun += __builtin_popcount(mask);
                continue;
            }
            if (zrun) { bw.put_zeros(zrun); zrun = 0; }
            if (bw.overflow) break;
            uint64_t acc = 0;
            int nb = 0;
            if (topg[g] == p) { acc = 1; nb = 1; }   // gate: activates here
            const int64_t lo = g * GROUP;
            for (uint16_t mm = mask; mm; mm &= (uint16_t)(mm - 1)) {
                int j = __builtin_ctz(mm);
                uint32_t b = (hit >> j) & 1u;
                acc = (acc << 1) | b;
                ++nb;
                if (b) {
                    int64_t i = lo + j;
                    acc = (acc << 1) | (uint64_t)(coef[i] < 0);
                    ++nb;
                    rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                    sig_mag[n_sig++] = mag[i];
                }
            }
            bw.put_bits(acc, nb);            // ≤ 33 bits
            if (bw.overflow) break;
        }
        if (zrun && !bw.overflow) bw.put_zeros(zrun);
        // refinement pass: previously-significant only, acquisition order,
        // AVX2-extracted 8 bits per step from the dense magnitude array
        {
            const uint32_t* sm = sig_mag;
            size_t s = 0;
#if defined(__AVX512F__)
            {
                const __m512i bp512 = _mm512_set1_epi32((int)(1u << p));
                while (s + 48 <= n_sig_before && !bw.overflow) {
                    uint64_t acc = 0;
                    for (int k = 0; k < 3; ++k) {
                        __m512i v = _mm512_loadu_si512(
                            (const void*)(sm + s + (size_t)k * 16));
                        uint32_t mk = (uint32_t)_mm512_test_epi32_mask(
                            v, bp512);
                        acc = (acc << 16) | rev16(mk);
                    }
                    bw.put_bits(acc, 48);
                    s += 48;
                }
            }
#elif defined(__AVX2__)
            const int sh = 31 - p;
            while (s + 48 <= n_sig_before && !bw.overflow) {
                uint64_t acc = 0;
                for (int k = 0; k < 6; ++k) {
                    __m256i v = _mm256_loadu_si256(
                        (const __m256i*)(sm + s + (size_t)k * 8));
                    uint32_t m8 = (uint32_t)_mm256_movemask_ps(
                        _mm256_castsi256_ps(_mm256_slli_epi32(v, sh)));
                    acc = (acc << 8) | REV8.t[m8];
                }
                bw.put_bits(acc, 48);
                s += 48;
            }
#endif
            uint64_t acc = 0;
            int nb = 0;
            for (; s < n_sig_before && !bw.overflow; ++s) {
                acc = (acc << 1) | ((sm[s] >> p) & 1u);
                if (++nb == 48) { bw.put_bits(acc, nb); acc = 0; nb = 0; }
            }
            if (nb) bw.put_bits(acc, nb);
        }
    }
    return 1 + bw.bytes();
}

extern "C" int64_t bpc_encode(const int32_t* coef, int64_t n, uint8_t* out,
                              int64_t out_cap, int64_t max_bytes) {
    return encode_body(coef, n, out, out_cap, max_bytes);
}

// Fused deadzone quantize + encode: qc[i] = (int32)(coefs[i] *
// (inv_steps[i] * inv_base)), the exact operation (and association order,
// hence rounding) of the host numpy path and the device requantizer
// (j2k_codec._device_requant_recon_ladder) — then the regular embedded
// coder over qc. Saves a full numpy pass + temporaries per rate point;
// the quantized coefficients land in caller-provided qc for round-trip
// verification and checksums.
extern "C" int64_t bpc_encode_quant(const float* coefs,
                                    const float* inv_steps, float inv_base,
                                    int32_t* qc, int64_t n, uint8_t* out,
                                    int64_t out_cap, int64_t max_bytes) {
    int64_t i = 0;
#ifdef __AVX2__
    const __m256 ib = _mm256_set1_ps(inv_base);
    for (; i + 8 <= n; i += 8) {
        __m256 s = _mm256_mul_ps(_mm256_loadu_ps(inv_steps + i), ib);
        __m256 c = _mm256_mul_ps(_mm256_loadu_ps(coefs + i), s);
        _mm256_storeu_si256((__m256i*)(qc + i), _mm256_cvttps_epi32(c));
    }
#endif
    for (; i < n; ++i) {
        float s = inv_steps[i] * inv_base;
        qc[i] = (int32_t)(coefs[i] * s);
    }
    return encode_body(qc, n, out, out_cap, max_bytes);
}

extern "C" int64_t bpc_decode(const uint8_t* in, int64_t nbytes, int32_t* coef,
                              int64_t n) {
    if (nbytes < 1 || n <= 0) return -1;
    int nplanes = in[0];
    // a legitimate stream has <= 32 planes (int32 magnitudes); larger values
    // mean corruption and would shift by >= the type width (UB)
    if (nplanes > 32) return -2;
    BitReader br(in + 1, nbytes - 1);
    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<uint8_t> active((size_t)ngroups, 0);
    std::vector<uint16_t> rem((size_t)ngroups);
    // dense significant-entry state, acquisition order; preallocated
    // (uninitialized) at the n upper bound so the hot loops append with a
    // bare cursor — no push_back capacity branches, no zero-fill pass.
    // posneg carries the sign in bit 0.
    std::unique_ptr<uint32_t[]> sig_mag_v(new uint32_t[(size_t)n]);
    std::unique_ptr<int64_t[]> sig_posneg_v(new int64_t[(size_t)n]);
    std::unique_ptr<int8_t[]> sig_pa_v(new int8_t[(size_t)n]);
    uint32_t* sig_mag = sig_mag_v.get();
    int64_t* sig_posneg = sig_posneg_v.get();
    int8_t* sig_pa = sig_pa_v.get();
    size_t nsig = 0;
    for (int64_t g = 0; g < ngroups; ++g) {
        int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
        rem[g] = (uint16_t)((hi - lo == GROUP) ? 0xFFFF
                                               : ((1u << (hi - lo)) - 1u));
    }
    // truncation midpoint bookkeeping: the lowest plane whose refinement
    // pass completed, and the cursor of the one partially-completed pass
    int p_done_ref = nplanes;
    int p_part = -1;
    size_t s_part = 0;

    for (int p = nplanes - 1; p >= 0 && !br.error; --p) {
        size_t n_sig_before = nsig;
        for (int64_t g = 0; g < ngroups && !br.error; ++g) {
            const int64_t lo = g * GROUP;
            br.refill();
            // Worst case for one group pass: 1 gate + 16 sig + 16 sign = 33.
            if (br.avail >= 33) {
                // batched path: parse from a local window copy, commit after
                uint64_t w = br.window;
                int av = br.avail;
                if (!active[g]) {
                    uint32_t any = (uint32_t)(w >> 63);
                    w <<= 1; --av;
                    if (!any) {
                        // bookkeeping-free skip: members stay 0
                        br.window = w; br.avail = av;
                        continue;
                    }
                    active[g] = 1;
                }
                const int nb = __builtin_popcount(rem[g]);
                if (nb && (w >> (64 - nb)) == 0) {
                    // no member becomes significant on this plane
                    br.window = w << nb; br.avail = av - nb;
                    continue;
                }
                uint16_t mm = rem[g];
                while (mm) {
                    int j = __builtin_ctz(mm);
                    mm &= (uint16_t)(mm - 1);
                    uint32_t b = (uint32_t)(w >> 63);
                    w <<= 1; --av;
                    if (b) {
                        uint8_t s = (uint8_t)(w >> 63);
                        w <<= 1; --av;
                        rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                        sig_mag[nsig] = 1u << p;
                        sig_posneg[nsig] = ((lo + j) << 1) | s;
                        sig_pa[nsig] = (int8_t)p;
                        ++nsig;
                    }
                }
                br.window = w; br.avail = av;
                continue;
            }
            // tail path: bit-by-bit with error checks (identical semantics
            // to the reference coder on truncated streams)
            if (!active[g]) {
                int any = (int)br.get_bits(1);
                if (br.error) break;
                if (!any) continue;
                active[g] = 1;
            }
            uint16_t mm = rem[g];
            while (mm && !br.error) {
                int j = __builtin_ctz(mm);
                mm &= (uint16_t)(mm - 1);
                int b = (int)br.get_bits(1);
                if (br.error) break;
                if (b) {
                    int sg = (int)br.get_bits(1);
                    if (br.error) break;
                    rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                    sig_mag[nsig] = 1u << p;
                    sig_posneg[nsig] = ((lo + j) << 1) | (int64_t)(sg != 0);
                    sig_pa[nsig] = (int8_t)p;
                    ++nsig;
                }
            }
        }
        // refinement pass: linear over the dense magnitudes, AVX2-applied
        // 8 bits per step where the window allows
        uint32_t* sm = sig_mag;
#if defined(__AVX512F__)
        const __m512i bitp512 = _mm512_set1_epi32((int)(1u << p));
#endif
#ifdef __AVX2__
        const __m256i sel = _mm256_setr_epi32(0x80, 0x40, 0x20, 0x10,
                                              8, 4, 2, 1);
        const __m256i bitp = _mm256_set1_epi32((int)(1u << p));
#endif
        size_t s = 0;
        while (s < n_sig_before && !br.error) {
            br.refill();
            int take = br.avail < 48 ? br.avail : 48;
            size_t left = n_sig_before - s;
            if ((size_t)take > left) take = (int)left;
            if (take >= 8 || (size_t)take == left) {
                uint64_t w = br.window;
                int t = 0;
#if defined(__AVX512F__)
                for (; t + 16 <= take; t += 16, s += 16) {
                    __mmask16 k = (__mmask16)rev16((uint32_t)(w >> 48));
                    w <<= 16;
                    __m512i cur = _mm512_loadu_si512((void*)(sm + s));
                    _mm512_storeu_si512(
                        (void*)(sm + s),
                        _mm512_mask_or_epi32(cur, k, cur, bitp512));
                }
#endif
#ifdef __AVX2__
                for (; t + 8 <= take; t += 8, s += 8) {
                    __m256i bits = _mm256_set1_epi32((int)(w >> 56));
                    w <<= 8;
                    __m256i on = _mm256_cmpeq_epi32(
                        _mm256_and_si256(bits, sel), sel);
                    __m256i cur = _mm256_loadu_si256((__m256i*)(sm + s));
                    _mm256_storeu_si256(
                        (__m256i*)(sm + s),
                        _mm256_or_si256(cur, _mm256_and_si256(on, bitp)));
                }
#endif
                for (; t < take; ++t, ++s) {
                    if (w >> 63) sm[s] |= 1u << p;
                    w <<= 1;
                }
                br.window = w;
                br.avail -= take;
                if (take == 0) { br.error = true; break; }
            } else {
                int b = (int)br.get_bits(1);
                if (br.error) break;
                if (b) sm[s] |= 1u << p;
                ++s;
            }
        }
        if (!br.error) {
            p_done_ref = p;
        } else if (s > 0 || n_sig_before > 0) {
            p_part = p;
            s_part = s;
        }
    }

    // scatter: insignificant coefficients are 0; significant ones get the
    // truncation midpoint of their last-incorporated plane (known):
    //   known(s) = p_part        if the partial pass reached s
    //            = p_done_ref    if s existed before that pass (pa > done)
    //            = pa(s)         otherwise (acquired at/after the lowest
    //                            completed refinement plane)
    std::memset(coef, 0, (size_t)n * sizeof(int32_t));
    for (size_t s = 0; s < nsig; ++s) {
        uint32_t m = sig_mag[s];
        int known;
        if (p_part >= 0 && s < s_part) {
            known = p_part;
        } else {
            int pa = sig_pa[s];
            known = pa > p_done_ref ? p_done_ref : pa;
        }
        if (known > 0) m += 1u << (known - 1);
        int64_t pn = sig_posneg[s];
        coef[pn >> 1] = (pn & 1) ? -(int32_t)m : (int32_t)m;
    }
    return n;
}
