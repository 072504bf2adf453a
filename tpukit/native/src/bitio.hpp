// Bit-level writer/reader (MSB-first within bytes), shared by the entropy
// coders. tpukit native runtime.
#pragma once
#include <cstdint>
#include <cstring>

namespace tpukit {

struct BitWriter {
    uint8_t* buf;
    int64_t cap;          // bytes
    uint64_t acc = 0;     // bit accumulator (MSB-first semantics)
    int nacc = 0;         // bits held in acc
    int64_t bytepos = 0;  // bytes already flushed
    bool overflow = false;

    BitWriter(uint8_t* b, int64_t c) : buf(b), cap(c) {}

    inline void raw(uint32_t value, int nbits) {  // nbits <= 32
        acc = (acc << nbits) | (value & (nbits == 32 ? 0xFFFFFFFFu
                                                     : ((1u << nbits) - 1u)));
        nacc += nbits;
        while (nacc >= 8) {
            nacc -= 8;
            if (bytepos < cap) buf[bytepos++] = (uint8_t)(acc >> nacc);
            else overflow = true;
        }
    }

    inline void put_bits(uint64_t value, int nbits) {
        // MSB-first: value's nbits LSBs are written most-significant first.
        while (nbits > 32) {
            raw((uint32_t)(value >> (nbits - 32)), 32);
            nbits -= 32;
        }
        if (nbits > 0) raw((uint32_t)value, nbits);
    }

    inline void put_fs(uint32_t value) {
        // fundamental sequence: `value` zeros then a one
        while (value >= 32) { raw(0, 32); value -= 32; }
        raw(1, (int)value + 1);
    }

    inline int64_t bitpos_now() const { return bytepos * 8 + nacc; }

    inline int64_t bytes() {
        // flush: pad the last partial byte with zeros
        if (nacc > 0) raw(0, 8 - nacc);
        return bytepos;
    }
};

struct BitReader {
    const uint8_t* buf;
    int64_t nbits;
    int64_t bitpos = 0;
    bool error = false;

    BitReader(const uint8_t* b, int64_t nbytes) : buf(b), nbits(nbytes * 8) {}

    inline uint64_t get_bits(int n) {
        uint64_t v = 0;
        if (bitpos + n > nbits) { error = true; bitpos = nbits; return 0; }
        for (int i = 0; i < n; ++i) {
            v = (v << 1) | ((buf[bitpos >> 3] >> (7 - (bitpos & 7))) & 1u);
            ++bitpos;
        }
        return v;
    }

    inline uint32_t get_fs() {
        uint32_t zeros = 0;
        while (bitpos < nbits) {
            uint32_t bit = (buf[bitpos >> 3] >> (7 - (bitpos & 7))) & 1u;
            ++bitpos;
            if (bit) return zeros;
            ++zeros;
        }
        error = true;
        return zeros;
    }
};

}  // namespace tpukit
