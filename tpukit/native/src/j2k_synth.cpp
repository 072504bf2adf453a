// Inverse DWT synthesis (T.800 F.3.8 reversible 5/3, F.4.8.2 irreversible
// 9/7), bit-for-bit equal to the numpy reference in io/jp2.py
// (_sr1d_53/_sr1d_97 + the sr2d interleave).  Used by the EBCOT rate
// ladder's truncated-decode model (io/j2c_enc.J2CPlan.truncated_recon),
// where the per-point host synthesis is the wall once packet sizing and
// tier-1 analysis are amortized; the numpy implementations stay as the
// oracle the parity tests pin against.
//
// Exactness notes: IEEE double ops in the same order as the numpy
// expressions; the library builds with -ffp-contract=off so no FMA
// contraction perturbs the 9/7 lifting.  The in-place sequential update
// is equivalent to numpy's simultaneous vectorized one because every
// lifting step writes one parity class while reading only the other,
// with the boundary re-extension applied between steps exactly as the
// Python does.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double A97 = -1.586134342059924;
constexpr double B97 = -0.052980118572961;
constexpr double G97 = 0.882911075530934;
constexpr double D97 = 0.443506852043971;
constexpr double K97 = 1.230174104914001;

// 1D 9/7 synthesis over b[0..n-1] covering absolute coords [i0, i0+n),
// using scratch e[0..n+1] (ext buffer).
void sr1d_97(double* b, int64_t n, int i0, double* e) {
    if (n == 0) return;
    if (n == 1) {
        b[0] *= (i0 % 2 == 0) ? K97 : (1.0 / K97);
        return;
    }
    // scaling: even absolute coords * K, odd / K
    for (int64_t k = 0; k < n; ++k) {
        if (((k + i0) % 2 + 2) % 2 == 0) b[k] *= K97;
        else b[k] /= K97;
    }
    e[0] = b[1];
    std::memcpy(e + 1, b, (size_t)n * sizeof(double));
    e[n + 1] = b[n - 2];
    const int e0 = ((i0 + 1) % 2 + 2) % 2;
    int64_t je0 = e0 >= 1 ? e0 : e0 + 2;   // first even ext index in [1, n]
    int64_t jo0 = e0 + 1 >= 1 ? e0 + 1 : e0 + 3;
    // step: x[j] -= c * (x[j-1] + x[j+1]) over one parity, then re-extend
    auto lift = [&](int64_t j0, double c) {
        for (int64_t j = j0; j <= n; j += 2)
            e[j] = e[j] - c * (e[j - 1] + e[j + 1]);
        e[0] = e[2];
        e[n + 1] = e[n - 1];
    };
    lift(je0, D97);
    lift(jo0, G97);
    lift(je0, B97);
    lift(jo0, A97);
    std::memcpy(b, e + 1, (size_t)n * sizeof(double));
}

// 1D 5/3 synthesis (integer), same geometry machinery.
void sr1d_53(int64_t* b, int64_t n, int i0, int64_t* e) {
    if (n == 0) return;
    if (n == 1) {
        if ((i0 % 2 + 2) % 2) {
            int64_t x = b[0];
            int64_t m = x < 0 ? -((-x) % 2) : x % 2;   // sign(x) * (|x| % 2)
            // floor division by 2 of (x - m); x - m is even
            b[0] = (x - m) / 2;
        }
        return;
    }
    e[0] = b[1];
    std::memcpy(e + 1, b, (size_t)n * sizeof(int64_t));
    e[n + 1] = b[n - 2];
    const int e0 = ((i0 + 1) % 2 + 2) % 2;
    int64_t je0 = e0 >= 1 ? e0 : e0 + 2;
    int64_t jo0 = e0 + 1 >= 1 ? e0 + 1 : e0 + 3;
    for (int64_t j = je0; j <= n; j += 2)
        e[j] = e[j] - ((e[j - 1] + e[j + 1] + 2) >> 2);
    e[0] = e[2];
    e[n + 1] = e[n - 1];
    for (int64_t j = jo0; j <= n; j += 2)
        e[j] = e[j] + ((e[j - 1] + e[j + 1]) >> 1);
    std::memcpy(b, e + 1, (size_t)n * sizeof(int64_t));
}

}  // namespace

// One 2D 9/7 synthesis level, in place on the ALREADY-INTERLEAVED (h, w)
// row-major array (caller does the F.3.3 subband interleave in numpy —
// cheap strided stores).  u0/v0 are the absolute coords of the region's
// top-left (parity selects the even/odd phase, exactly as sr2d_97).
extern "C" int64_t j2k_sr2d_97(double* a, int64_t h, int64_t w,
                               int32_t u0, int32_t v0) {
    if (h < 0 || w < 0) return -1;
    if (h == 0 || w == 0) return 0;
    std::vector<double> ext((size_t)(w > h ? w : h) + 2);
    std::vector<double> col((size_t)h);
    for (int64_t y = 0; y < h; ++y)
        sr1d_97(a + y * w, w, u0, ext.data());
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) col[y] = a[y * w + x];
        sr1d_97(col.data(), h, v0, ext.data());
        for (int64_t y = 0; y < h; ++y) a[y * w + x] = col[y];
    }
    return 0;
}

// One 2D 5/3 synthesis level, in place (int64), same contract.
extern "C" int64_t j2k_sr2d_53(int64_t* a, int64_t h, int64_t w,
                               int32_t u0, int32_t v0) {
    if (h < 0 || w < 0) return -1;
    if (h == 0 || w == 0) return 0;
    std::vector<int64_t> ext((size_t)(w > h ? w : h) + 2);
    std::vector<int64_t> col((size_t)h);
    for (int64_t y = 0; y < h; ++y)
        sr1d_53(a + y * w, w, u0, ext.data());
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) col[y] = a[y * w + x];
        sr1d_53(col.data(), h, v0, ext.data());
        for (int64_t y = 0; y < h; ++y) a[y * w + x] = col[y];
    }
    return 0;
}
