/* Hand-generated equivalent of the reference's cmake-configured config.h
 * (reference: src/config.h.in).  Built with: no SDR drivers, no pulse,
 * no BCM GPU, NFM enabled (WAVE_RATE=16000 — lets one binary exercise both
 * AM and NFM demodulation paths), glibc sincosf, stubbed libshout without
 * TLS/content-format.
 */
#ifndef _CONFIG_H
#define _CONFIG_H

/* #undef WITH_RTLSDR */
/* #undef WITH_MIRISDR */
/* #undef WITH_SOAPYSDR */
/* #undef WITH_PROFILING */
/* #undef WITH_PULSEAUDIO */
#define NFM
/* #undef WITH_BCM_VC */
/* #undef LIBSHOUT_HAS_TLS */
/* #undef LIBSHOUT_HAS_CONTENT_FORMAT */
#define SINCOSF sincosf

#define SHOUT_SET_METADATA shout_set_metadata

#endif /* _CONFIG_H */
