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

#include <cstdint>
#include <cstring>
#include <vector>
#include "bitio.hpp"

using namespace tpukit;

namespace {
constexpr int GROUP = 16;

inline int msb_index(uint32_t v) {  // -1 for 0
    return v ? 31 - __builtin_clz(v) : -1;
}
}

extern "C" int64_t bpc_encode(const int32_t* coef, int64_t n, uint8_t* out,
                              int64_t out_cap, int64_t max_bytes) {
    if (n <= 0 || out_cap < 2) return -1;
    std::vector<uint32_t> mag((size_t)n);
    std::vector<int8_t> topc((size_t)n);  // msb plane per coefficient
    uint32_t maxmag = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
        mag[i] = m;
        topc[i] = (int8_t)msb_index(m);
        if (m > maxmag) maxmag = m;
    }
    int nplanes = msb_index(maxmag) + 1;
    out[0] = (uint8_t)nplanes;

    int64_t budget = max_bytes > 0 ? (max_bytes < out_cap ? max_bytes : out_cap)
                                   : out_cap;
    std::memset(out + 1, 0, (size_t)(budget - 1));
    BitWriter bw(out + 1, budget - 1);

    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<int8_t> topg((size_t)ngroups, -1);   // msb plane per group
    for (int64_t g = 0; g < ngroups; ++g) {
        int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
        int8_t t = -1;
        for (int64_t i = lo; i < hi; ++i) t = topc[i] > t ? topc[i] : t;
        topg[g] = t;
    }
    std::vector<uint8_t> sig((size_t)n, 0);
    std::vector<int64_t> sig_list;           // refinement order
    sig_list.reserve((size_t)n / 4);

    for (int p = nplanes - 1; p >= 0 && !bw.overflow; --p) {
        uint32_t bit = 1u << p;
        size_t n_sig_before = sig_list.size();
        // significance pass (group-gated)
        for (int64_t g = 0; g < ngroups && !bw.overflow; ++g) {
            if (topg[g] < p) { if (topg[g] < p) bw.raw(0, 1); continue; }
            if (topg[g] == p) bw.raw(1, 1);  // group activates exactly here
            // group active (topg > p means it activated earlier: no gate bit)
            int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
            for (int64_t i = lo; i < hi; ++i) {
                if (sig[i]) continue;
                int b = (mag[i] & bit) ? 1 : 0;
                bw.raw(b, 1);
                if (b) {
                    sig[i] = 1;
                    bw.raw(coef[i] < 0 ? 1 : 0, 1);
                    sig_list.push_back(i);
                }
            }
        }
        // refinement pass: previously-significant only, acquisition order
        for (size_t s = 0; s < n_sig_before && !bw.overflow; ++s) {
            bw.raw((mag[sig_list[s]] & bit) ? 1 : 0, 1);
        }
    }
    return 1 + bw.bytes();
}

extern "C" int64_t bpc_decode(const uint8_t* in, int64_t nbytes, int32_t* coef,
                              int64_t n) {
    if (nbytes < 1 || n <= 0) return -1;
    int nplanes = in[0];
    BitReader br(in + 1, nbytes - 1);
    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<uint8_t> active((size_t)ngroups, 0);
    std::vector<uint8_t> sig((size_t)n, 0);
    std::vector<uint8_t> neg((size_t)n, 0);
    std::vector<int8_t> known((size_t)n);
    std::vector<uint32_t> mag((size_t)n, 0);
    std::vector<int64_t> sig_list;
    sig_list.reserve((size_t)n / 4);
    for (int64_t i = 0; i < n; ++i) known[i] = (int8_t)nplanes;

    for (int p = nplanes - 1; p >= 0 && !br.error; --p) {
        uint32_t bit = 1u << p;
        size_t n_sig_before = sig_list.size();
        for (int64_t g = 0; g < ngroups && !br.error; ++g) {
            int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
            if (!active[g]) {
                int any = (int)br.get_bits(1);
                if (br.error) break;
                if (!any) {
                    for (int64_t i = lo; i < hi; ++i) known[i] = (int8_t)p;
                    continue;
                }
                active[g] = 1;
            }
            for (int64_t i = lo; i < hi && !br.error; ++i) {
                if (sig[i]) continue;
                int b = (int)br.get_bits(1);
                if (br.error) break;
                known[i] = (int8_t)p;
                if (b) {
                    int s = (int)br.get_bits(1);
                    if (br.error) break;
                    sig[i] = 1;
                    neg[i] = (uint8_t)s;
                    mag[i] = bit;
                    sig_list.push_back(i);
                }
            }
        }
        for (size_t s = 0; s < n_sig_before && !br.error; ++s) {
            int b = (int)br.get_bits(1);
            if (br.error) break;
            int64_t i = sig_list[s];
            if (b) mag[i] |= bit;
            known[i] = (int8_t)p;
        }
    }

    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = mag[i];
        if (sig[i] && known[i] > 0) m += 1u << (known[i] - 1);  // midpoint
        coef[i] = neg[i] ? -(int32_t)m : (int32_t)m;
    }
    return n;
}
