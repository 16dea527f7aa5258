// FFTW3F-compatible single-1D-complex-FFT shim (see include/fftw3.h).
// Iterative radix-2 decimation-in-time with double-precision twiddles;
// n is a power of two (the reference enforces fft_size in 256..8192,
// reference: src/rtl_airband.cpp:786-800).
#include "fftw3.h"

#include <stdlib.h>
#include <string.h>

#include <cmath>
#include <vector>

struct shim_fftwf_plan_s {
    int n;
    int sign;  // -1 forward
    fftwf_complex* in;
    fftwf_complex* out;
    std::vector<int> rev;          // bit-reversal permutation
    std::vector<double> tw;        // twiddles per stage, packed [re, im]
    std::vector<double> work;      // [2 * n] double workspace
};

extern "C" fftwf_complex* fftwf_alloc_complex(size_t n) {
    void* p = nullptr;
    if (posix_memalign(&p, 32, n * sizeof(fftwf_complex)) != 0)
        return nullptr;
    memset(p, 0, n * sizeof(fftwf_complex));
    return (fftwf_complex*)p;
}

extern "C" void* fftwf_malloc(size_t n) {
    void* p = nullptr;
    if (posix_memalign(&p, 32, n) != 0)
        return nullptr;
    return p;
}

extern "C" void fftwf_free(void* p) {
    free(p);
}

extern "C" fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* in, fftwf_complex* out, int sign, unsigned /*flags*/) {
    shim_fftwf_plan_s* p = new shim_fftwf_plan_s;
    p->n = n;
    p->sign = sign;
    p->in = in;
    p->out = out;
    p->rev.resize(n);
    int log2n = 0;
    while ((1 << log2n) < n)
        log2n++;
    for (int i = 0; i < n; i++) {
        int r = 0;
        for (int b = 0; b < log2n; b++)
            if (i & (1 << b))
                r |= 1 << (log2n - 1 - b);
        p->rev[i] = r;
    }
    // Twiddles: for each stage with half-size m, factors w^j = exp(sign*2πi*j/(2m)), j in [0, m)
    for (int m = 1; m < n; m <<= 1) {
        for (int j = 0; j < m; j++) {
            double ang = (double)sign * 2.0 * M_PI * (double)j / (double)(2 * m);
            p->tw.push_back(std::cos(ang));
            p->tw.push_back(std::sin(ang));
        }
    }
    p->work.resize(2 * (size_t)n);
    return p;
}

extern "C" void fftwf_execute(const fftwf_plan p) {
    const int n = p->n;
    double* w = p->work.data();
    const fftwf_complex* in = p->in;
    for (int i = 0; i < n; i++) {
        int r = p->rev[i];
        w[2 * r] = (double)in[i][0];
        w[2 * r + 1] = (double)in[i][1];
    }
    const double* tw = p->tw.data();
    for (int m = 1; m < n; m <<= 1) {
        for (int k = 0; k < n; k += 2 * m) {
            for (int j = 0; j < m; j++) {
                double wr = tw[2 * j], wi = tw[2 * j + 1];
                double* a = &w[2 * (k + j)];
                double* b = &w[2 * (k + j + m)];
                double tr = wr * b[0] - wi * b[1];
                double ti = wr * b[1] + wi * b[0];
                b[0] = a[0] - tr;
                b[1] = a[1] - ti;
                a[0] += tr;
                a[1] += ti;
            }
        }
        tw += 2 * m;
    }
    fftwf_complex* out = p->out;
    for (int i = 0; i < n; i++) {
        out[i][0] = (float)w[2 * i];
        out[i][1] = (float)w[2 * i + 1];
    }
}

extern "C" void fftwf_destroy_plan(fftwf_plan p) {
    delete p;
}
