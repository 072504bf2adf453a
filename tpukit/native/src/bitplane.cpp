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
// Throughput notes: groups carry a 16-bit insignificance mask so passes
// visit only still-insignificant members (ctz iteration), and each group's
// bits are assembled in a register and emitted/parsed in one batched
// writer/reader operation (≤ 33 bits per group per plane). The decoder's
// batched path runs only when the reader window provably holds the group's
// worst case, falling back to the bit-by-bit path near the end of the
// stream so truncated-budget semantics are bit-identical to the
// straightforward coder.

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
    uint32_t maxmag = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = (uint32_t)(coef[i] < 0 ? -(int64_t)coef[i] : coef[i]);
        mag[i] = m;
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
    std::vector<uint16_t> rem((size_t)ngroups);      // insignificant members
    for (int64_t g = 0; g < ngroups; ++g) {
        int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
        int t = -1;
        for (int64_t i = lo; i < hi; ++i) {
            int c = msb_index(mag[i]);
            t = c > t ? c : t;
        }
        topg[g] = (int8_t)t;
        rem[g] = (uint16_t)((hi - lo == GROUP) ? 0xFFFF
                                               : ((1u << (hi - lo)) - 1u));
    }
    std::vector<int64_t> sig_list;           // refinement order
    sig_list.reserve((size_t)n / 4);

    for (int p = nplanes - 1; p >= 0 && !bw.overflow; --p) {
        size_t n_sig_before = sig_list.size();
        // significance pass (group-gated)
        for (int64_t g = 0; g < ngroups && !bw.overflow; ++g) {
            if (topg[g] < p) { bw.raw(0, 1); continue; }
            uint64_t acc = 0;
            int nb = 0;
            if (topg[g] == p) { acc = 1; nb = 1; }  // gate: activates here
            const int64_t lo = g * GROUP;
            uint16_t mask = rem[g];
            for (uint16_t mm = mask; mm; mm &= (uint16_t)(mm - 1)) {
                int j = __builtin_ctz(mm);
                int64_t i = lo + j;
                uint32_t b = (mag[i] >> p) & 1u;
                acc = (acc << 1) | b;
                ++nb;
                if (b) {
                    acc = (acc << 1) | (uint64_t)(coef[i] < 0);
                    ++nb;
                    rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                    sig_list.push_back(i);
                }
            }
            if (nb) bw.put_bits(acc, nb);    // ≤ 33 bits
        }
        // refinement pass: previously-significant only, acquisition order
        {
            uint64_t acc = 0;
            int nb = 0;
            for (size_t s = 0; s < n_sig_before && !bw.overflow; ++s) {
                acc = (acc << 1) | ((mag[sig_list[s]] >> p) & 1u);
                if (++nb == 48) { bw.put_bits(acc, nb); acc = 0; nb = 0; }
            }
            if (nb) bw.put_bits(acc, nb);
        }
    }
    return 1 + bw.bytes();
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
    std::vector<uint8_t> neg((size_t)n, 0);
    std::vector<int8_t> known((size_t)n);
    std::vector<uint32_t> mag((size_t)n, 0);
    std::vector<int64_t> sig_list;
    sig_list.reserve((size_t)n / 4);
    for (int64_t i = 0; i < n; ++i) known[i] = (int8_t)nplanes;
    for (int64_t g = 0; g < ngroups; ++g) {
        int64_t lo = g * GROUP, hi = lo + GROUP < n ? lo + GROUP : n;
        rem[g] = (uint16_t)((hi - lo == GROUP) ? 0xFFFF
                                               : ((1u << (hi - lo)) - 1u));
    }

    for (int p = nplanes - 1; p >= 0 && !br.error; --p) {
        size_t n_sig_before = sig_list.size();
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
                        uint16_t mm = rem[g];
                        while (mm) {
                            int j = __builtin_ctz(mm);
                            mm &= (uint16_t)(mm - 1);
                            known[lo + j] = (int8_t)p;
                        }
                        br.window = w; br.avail = av;
                        continue;
                    }
                    active[g] = 1;
                }
                uint16_t mm = rem[g];
                while (mm) {
                    int j = __builtin_ctz(mm);
                    mm &= (uint16_t)(mm - 1);
                    int64_t i = lo + j;
                    uint32_t b = (uint32_t)(w >> 63);
                    w <<= 1; --av;
                    known[i] = (int8_t)p;
                    if (b) {
                        neg[i] = (uint8_t)(w >> 63);
                        w <<= 1; --av;
                        mag[i] = 1u << p;
                        rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                        sig_list.push_back(i);
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
                if (!any) {
                    uint16_t mm = rem[g];
                    while (mm) {
                        int j = __builtin_ctz(mm);
                        mm &= (uint16_t)(mm - 1);
                        known[lo + j] = (int8_t)p;
                    }
                    continue;
                }
                active[g] = 1;
            }
            uint16_t mm = rem[g];
            while (mm && !br.error) {
                int j = __builtin_ctz(mm);
                mm &= (uint16_t)(mm - 1);
                int64_t i = lo + j;
                int b = (int)br.get_bits(1);
                if (br.error) break;
                known[i] = (int8_t)p;
                if (b) {
                    int s = (int)br.get_bits(1);
                    if (br.error) break;
                    neg[i] = (uint8_t)s;
                    mag[i] = 1u << p;
                    rem[g] = (uint16_t)(rem[g] & ~(1u << j));
                    sig_list.push_back(i);
                }
            }
        }
        // refinement pass, batched where the window allows
        size_t s = 0;
        while (s < n_sig_before && !br.error) {
            br.refill();
            int take = br.avail < 48 ? br.avail : 48;
            size_t left = n_sig_before - s;
            if ((size_t)take > left) take = (int)left;
            if (take >= 8 || (size_t)take == left) {
                uint64_t w = br.window;
                for (int t = 0; t < take; ++t, ++s) {
                    int64_t i = sig_list[s];
                    if (w >> 63) mag[i] |= 1u << p;
                    w <<= 1;
                    known[i] = (int8_t)p;
                }
                br.window = w;
                br.avail -= take;
                if (take == 0) { br.error = true; break; }
            } else {
                int b = (int)br.get_bits(1);
                if (br.error) break;
                int64_t i = sig_list[s];
                if (b) mag[i] |= 1u << p;
                known[i] = (int8_t)p;
                ++s;
            }
        }
    }

    for (int64_t i = 0; i < n; ++i) {
        uint32_t m = mag[i];
        if (m && known[i] > 0) m += 1u << (known[i] - 1);  // midpoint
        coef[i] = neg[i] ? -(int32_t)m : (int32_t)m;
    }
    return n;
}
