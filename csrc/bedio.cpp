// Native PLINK .bed decode kernels (host side).
//
// TPU-native replacement for the reference's C++ Data layer
// (data.cpp:65-148 decode_plink/decode_plink_simple, data.cpp:215-335
// read_snp_block first-visit statistics): byte-level work that numpy
// does with several large intermediate arrays runs here as single-pass
// LUT loops, OpenMP-parallel over SNPs.  Exposed to Python via ctypes
// (flashpca_tpu/io/cbed.py); a pure-numpy fallback always exists.
//
// Layout contract (identical to data.h:24-45): SNP-major packed bytes,
// 4 samples/byte, sample 4b+s at bits [2s,2s+1]; code->dosage
// 0->2, 2->1, 3->0, 1->missing.
//
// Build: make -C csrc   (-O3 -fopenmp; no external deps)

#include <cstdint>
#include <cmath>
#include <cstring>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// counts[byte][code] = how many of the 4 packed samples carry `code`
struct CountLut {
    uint8_t cnt[256][4];
    // dosage sum / sum of squared dosages over the 4 samples, missing
    // contributing 0 (dosage 2 -> 4, dosage 1 -> 1; max 16 fits uint8)
    uint8_t dsum[256];
    uint8_t d2sum[256];
    CountLut() {
        for (int b = 0; b < 256; ++b) {
            std::memset(cnt[b], 0, 4);
            int ds = 0, d2 = 0;
            for (int s = 0; s < 4; ++s) {
                int c = (b >> (2 * s)) & 3;
                cnt[b][c]++;
                if (c == 0) { ds += 2; d2 += 4; }
                else if (c == 2) { ds += 1; d2 += 1; }
            }
            dsum[b] = static_cast<uint8_t>(ds);
            d2sum[b] = static_cast<uint8_t>(d2);
        }
    }
};
const CountLut LUT;

inline double code_dosage(int c) {
    switch (c) {
        case 0: return 2.0;
        case 2: return 1.0;
        case 3: return 0.0;
        default: return 0.0;  // missing handled by caller
    }
}

}  // namespace

extern "C" {

// Per-SNP mean/sd over non-missing dosages.
// method: 1 = binom (sd = sqrt(p(1-p))), 2 = binom2 (sqrt(2p(1-p))).
// Mirrors the streaming standardizer's first-visit pass
// (reference: data.cpp:262-291).
void bed_stats(const uint8_t* packed, int64_t p, int64_t nbytes,
               int64_t n_samples, int method, double* mean, double* sd) {
    const int64_t full = n_samples / 4;       // whole bytes
    const int rem = static_cast<int>(n_samples % 4);
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        const uint8_t* row = packed + j * nbytes;
        int64_t n_na = 0, dsum = 0;
        for (int64_t b = 0; b < full; ++b) {
            n_na += LUT.cnt[row[b]][1];
            dsum += LUT.dsum[row[b]];
        }
        if (rem) {
            const int byte = row[full];
            for (int s = 0; s < rem; ++s) {
                const int c = (byte >> (2 * s)) & 3;
                if (c == 1) ++n_na;
                else dsum += static_cast<int64_t>(code_dosage(c));
            }
        }
        const double ngood = static_cast<double>(n_samples - n_na);
        if (ngood <= 0.0) {
            // all-missing SNP: (0, 0) zeroes the column downstream
            // like a monomorphic SNP (NaN stats would poison the
            // device decode; the reference divides by zero here)
            mean[j] = 0.0;
            sd[j] = 0.0;
            continue;
        }
        const double m = dsum / ngood;
        const double ph = m / 2.0;
        const double mult = (method == 1) ? 1.0 : 2.0;
        mean[j] = m;
        sd[j] = std::sqrt(mult * ph * (1.0 - ph));
    }
}

// Per-SNP raw dosage moments over non-missing samples: ngood (count),
// dsum (sum of dosages), d2sum (sum of squared dosages).  From these
// any standardization's (mean, sd) AND the exact per-SNP sum of squared
// standardized genotypes follow analytically (ops/standardize.py
// sumsq_from_moments) -- replacing the reference's trace-accumulation
// data pass (svdwide.cpp:44-45) with host arithmetic.
void bed_moments(const uint8_t* packed, int64_t p, int64_t nbytes,
                 int64_t n_samples, double* ngood, double* dsum_out,
                 double* d2sum_out) {
    const int64_t full = n_samples / 4;       // whole bytes
    const int rem = static_cast<int>(n_samples % 4);
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        const uint8_t* row = packed + j * nbytes;
        int64_t n_na = 0, dsum = 0, d2sum = 0;
        for (int64_t b = 0; b < full; ++b) {
            n_na += LUT.cnt[row[b]][1];
            dsum += LUT.dsum[row[b]];
            d2sum += LUT.d2sum[row[b]];
        }
        if (rem) {
            const int byte = row[full];
            for (int s = 0; s < rem; ++s) {
                const int c = (byte >> (2 * s)) & 3;
                if (c == 1) { ++n_na; continue; }
                const int64_t d = static_cast<int64_t>(code_dosage(c));
                dsum += d;
                d2sum += d * d;
            }
        }
        ngood[j] = static_cast<double>(n_samples - n_na);
        dsum_out[j] = static_cast<double>(dsum);
        d2sum_out[j] = static_cast<double>(d2sum);
    }
}

// Decode to standardized float64, SNP-major (p x n_samples), streaming
// semantics: (dosage - mean)/sd for non-missing, 0 for missing, whole
// column zero when sd <= var_tol (reference: data.cpp:299-320).
void bed_standardize(const uint8_t* packed, int64_t p, int64_t nbytes,
                     int64_t n_samples, const double* mean,
                     const double* sd, double var_tol, double* out) {
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        const uint8_t* row = packed + j * nbytes;
        double* orow = out + j * n_samples;
        double lut[4];
        const double inv = (sd[j] > var_tol) ? 1.0 / sd[j] : 0.0;
        lut[0] = (2.0 - mean[j]) * inv;
        lut[1] = 0.0;
        lut[2] = (1.0 - mean[j]) * inv;
        lut[3] = (0.0 - mean[j]) * inv;
        for (int64_t i = 0; i < n_samples; ++i) {
            const int c = (row[i >> 2] >> (2 * (i & 3))) & 3;
            orow[i] = lut[c];
        }
    }
}

// Decode to raw dosage float64 with NaN for missing, SNP-major.
// Equivalent of decode_plink + NA marking (reference: data.cpp:65-126).
void bed_dosage(const uint8_t* packed, int64_t p, int64_t nbytes,
                int64_t n_samples, double* out) {
    const double nan = std::nan("");
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        const uint8_t* row = packed + j * nbytes;
        double* orow = out + j * n_samples;
        static const double lut_base[4] = {2.0, 0.0, 1.0, 0.0};
        for (int64_t i = 0; i < n_samples; ++i) {
            const int c = (row[i >> 2] >> (2 * (i & 3))) & 3;
            orow[i] = (c == 1) ? nan : lut_base[c];
        }
    }
}

// Unpack 2-bit codes to uint8, SNP-major (p x n_samples).
// Equivalent of decode_plink_simple (reference: data.cpp:128-148).
void bed_codes(const uint8_t* packed, int64_t p, int64_t nbytes,
               int64_t n_samples, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < p; ++j) {
        const uint8_t* row = packed + j * nbytes;
        uint8_t* orow = out + j * n_samples;
        for (int64_t i = 0; i < n_samples; ++i) {
            orow[i] = (row[i >> 2] >> (2 * (i & 3))) & 3;
        }
    }
}

// CLI --numthreads for the native kernels (the reference wires its
// flag to omp_set_num_threads, flashpca.cpp:571-577).  n <= 0 leaves
// the OpenMP default untouched.
void bed_set_num_threads(int n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads(n);
#else
    (void)n;
#endif
}

}  // extern "C"
