/* Declarations for the subset of the public libmp3lame API the reference
 * uses (reference: src/output.cpp:148-232,458-462, rtl_airband.cpp:1153).
 * The image ships the runtime library (libmp3lame.so.0) but no headers;
 * these prototypes match the stable public LAME ABI, so the reference
 * binary links against the real encoder.
 */
#ifndef SHIM_LAME_H
#define SHIM_LAME_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct lame_global_struct lame_global_flags;
typedef lame_global_flags* lame_t;

typedef enum vbr_mode_e {
    vbr_off = 0,
    vbr_mt = 1,
    vbr_rh = 2,
    vbr_abr = 3,
    vbr_mtrh = 4,
    vbr_default = vbr_mtrh
} vbr_mode;

typedef enum MPEG_mode_e {
    STEREO = 0,
    JOINT_STEREO = 1,
    DUAL_CHANNEL = 2,
    MONO = 3,
    NOT_SET = 4
} MPEG_mode;

lame_global_flags* lame_init(void);
int lame_close(lame_global_flags*);
int lame_init_params(lame_global_flags*);

int lame_set_in_samplerate(lame_global_flags*, int);
int lame_set_out_samplerate(lame_global_flags*, int);
int lame_set_num_channels(lame_global_flags*, int);
int lame_set_mode(lame_global_flags*, MPEG_mode);
int lame_set_quality(lame_global_flags*, int);
int lame_set_brate(lame_global_flags*, int);
int lame_set_VBR(lame_global_flags*, vbr_mode);
int lame_set_lowpassfreq(lame_global_flags*, int);
int lame_set_highpassfreq(lame_global_flags*, int);

int lame_encode_buffer_ieee_float(lame_t gfp, const float pcm_l[], const float pcm_r[], const int nsamples, unsigned char* mp3buf, const int mp3buf_size);
int lame_encode_flush(lame_global_flags* gfp, unsigned char* mp3buf, int size);
int lame_encode_flush_nogap(lame_global_flags* gfp, unsigned char* mp3buf, int size);

#ifdef __cplusplus
}
#endif

#endif /* SHIM_LAME_H */
