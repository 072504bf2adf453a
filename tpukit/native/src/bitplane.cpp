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

#include <cstdint>
#include <cstring>
#include <vector>
#include "bitio.hpp"

using namespace tpukit;

namespace {
constexpr int GROUP = 16;
}

extern "C" int64_t bpc_encode(const int32_t* coef, int64_t n, uint8_t* out,
                              int64_t out_cap, int64_t max_bytes) {
    if (n <= 0 || out_cap < 2) return -1;
    uint32_t maxmag = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
        if (m > maxmag) maxmag = m;
    }
    int nplanes = 0;
    while ((1u << nplanes) <= maxmag && nplanes < 31) ++nplanes;
    out[0] = (uint8_t)nplanes;
    std::memset(out + 1, 0, (size_t)(out_cap - 1));

    int64_t budget = max_bytes > 0 ? (max_bytes < out_cap ? max_bytes : out_cap)
                                   : out_cap;
    BitWriter bw(out + 1, budget - 1);

    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<uint8_t> sig(n, 0);        // significance established
    std::vector<uint8_t> active(ngroups, 0);

    for (int p = nplanes - 1; p >= 0 && !bw.overflow; --p) {
        uint32_t bit = 1u << p;
        // significance pass (group-gated)
        for (int64_t g = 0; g < ngroups && !bw.overflow; ++g) {
            int64_t lo = g * GROUP;
            int64_t hi = lo + GROUP < n ? lo + GROUP : n;
            if (!active[g]) {
                bool any = false;
                for (int64_t i = lo; i < hi; ++i) {
                    uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
                    if (m & bit) { any = true; break; }
                }
                bw.put_bits(any ? 1 : 0, 1);
                if (!any) continue;
                active[g] = 1;
            }
            for (int64_t i = lo; i < hi && !bw.overflow; ++i) {
                if (sig[i]) continue;
                uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
                int b = (m & bit) ? 1 : 0;
                bw.put_bits(b, 1);
                if (b) {
                    sig[i] = (uint8_t)(p + 1);  // became significant at plane p
                    bw.put_bits(coef[i] < 0 ? 1 : 0, 1);
                }
            }
        }
        // refinement pass
        for (int64_t i = 0; i < n && !bw.overflow; ++i) {
            if (sig[i] && sig[i] != (uint8_t)(p + 1)) {
                uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
                bw.put_bits((m & bit) ? 1 : 0, 1);
            }
        }
        // clear "new this plane" marker: fold into generic significant
        for (int64_t i = 0; i < n; ++i)
            if (sig[i] == (uint8_t)(p + 1) && p == 0) sig[i] = 255;
        for (int64_t i = 0; i < n; ++i)
            if (sig[i] == (uint8_t)(p + 1)) sig[i] = 255;
    }
    return 1 + bw.bytes();
}

extern "C" int64_t bpc_decode(const uint8_t* in, int64_t nbytes, int32_t* coef,
                              int64_t n) {
    if (nbytes < 1 || n <= 0) return -1;
    int nplanes = in[0];
    BitReader br(in + 1, nbytes - 1);
    int64_t ngroups = (n + GROUP - 1) / GROUP;
    std::vector<uint8_t> sig(n, 0);   // plane+1 at which became significant
    std::vector<uint8_t> neg(n, 0);
    std::vector<uint8_t> known(n, 0); // lowest plane whose bit is known
    std::vector<uint32_t> mag(n, 0);
    std::vector<uint8_t> active(ngroups, 0);
    for (int64_t i = 0; i < n; ++i) known[i] = (uint8_t)nplanes;

    for (int p = nplanes - 1; p >= 0 && !br.error; --p) {
        uint32_t bit = 1u << p;
        for (int64_t g = 0; g < ngroups && !br.error; ++g) {
            int64_t lo = g * GROUP;
            int64_t hi = lo + GROUP < n ? lo + GROUP : n;
            if (!active[g]) {
                int any = (int)br.get_bits(1);
                if (br.error) break;
                if (!any) {
                    for (int64_t i = lo; i < hi; ++i) known[i] = (uint8_t)p;
                    continue;
                }
                active[g] = 1;
            }
            for (int64_t i = lo; i < hi && !br.error; ++i) {
                if (sig[i] && sig[i] != (uint8_t)(p + 1)) continue;
                if (sig[i]) continue;
                int b = (int)br.get_bits(1);
                if (br.error) break;
                known[i] = (uint8_t)p;
                if (b) {
                    int s = (int)br.get_bits(1);
                    if (br.error) break;
                    sig[i] = (uint8_t)(p + 1);
                    neg[i] = (uint8_t)s;
                    mag[i] = bit;
                }
            }
        }
        for (int64_t i = 0; i < n && !br.error; ++i) {
            if (sig[i] && sig[i] != (uint8_t)(p + 1)) {
                int b = (int)br.get_bits(1);
                if (br.error) break;
                if (b) mag[i] |= bit;
                known[i] = (uint8_t)p;
            }
        }
        for (int64_t i = 0; i < n; ++i)
            if (sig[i] == (uint8_t)(p + 1)) sig[i] = 255;
    }

    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = mag[i];
        if (sig[i] && known[i] > 0) m += 1u << (known[i] - 1);  // midpoint
        coef[i] = neg[i] ? -(int32_t)m : (int32_t)m;
    }
    return n;
}
