/* Minimal FFTW3F-compatible API for building the reference out-of-tree
 * (no fftw3f dev package in this image).  Only the surface the reference
 * uses (reference: src/rtl_airband.cpp:262-264,460): fftwf_alloc_complex,
 * fftwf_plan_dft_1d, fftwf_execute.  The transform itself is a correct
 * iterative radix-2 DIT FFT with double-precision twiddles, accurate to
 * float roundoff — implemented in shim_fftw.cpp (our own code, no FFTW
 * sources involved).
 */
#ifndef SHIM_FFTW3_H
#define SHIM_FFTW3_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct shim_fftwf_plan_s* fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0U)
#define FFTW_ESTIMATE (1U << 6)

fftwf_complex* fftwf_alloc_complex(size_t n);
void* fftwf_malloc(size_t n);
void fftwf_free(void* p);
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* in, fftwf_complex* out, int sign, unsigned flags);
void fftwf_execute(const fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);

#ifdef __cplusplus
}
#endif

#endif /* SHIM_FFTW3_H */
