/* Inert libshout-compatible stub for building the reference out-of-tree.
 * The golden harness never configures icecast outputs, so these are pure
 * link stubs: shout_new() returns NULL, which the reference's own error
 * handling treats as "output unavailable" (reference: src/output.cpp:60-67).
 */
#ifndef SHIM_SHOUT_H
#define SHIM_SHOUT_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct shim_shout shout_t;
typedef struct shim_shout_metadata shout_metadata_t;

#define SHOUTERR_SUCCESS (0)
#define SHOUTERR_CONNECTED (-7)
#define SHOUTERR_BUSY (-10)
/* SHOUTERR_RETRY intentionally absent: output.cpp defines a fallback. */

#define SHOUT_FORMAT_MP3 (1)
#define SHOUT_FORMAT_MP (1)
#define SHOUT_PROTOCOL_HTTP (0)
#define SHOUT_AI_CHANNELS "channels"
#define SHOUT_AI_SAMPLERATE "samplerate"
#define SHOUT_META_NAME "name"
#define SHOUT_META_GENRE "genre"
#define SHOUT_META_DESCRIPTION "description"
#define SHOUT_USAGE_AUDIO (1 << 0)

static inline void shout_init(void) {}
static inline shout_t* shout_new(void) {
    return (shout_t*)0;
}
static inline void shout_free(shout_t* s) {
    (void)s;
}
static inline const char* shout_get_error(shout_t* s) {
    (void)s;
    return "libshout stub";
}
static inline int shout_set_host(shout_t* s, const char* h) {
    (void)s;
    (void)h;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_protocol(shout_t* s, unsigned int p) {
    (void)s;
    (void)p;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_port(shout_t* s, unsigned short p) {
    (void)s;
    (void)p;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_password(shout_t* s, const char* p) {
    (void)s;
    (void)p;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_mount(shout_t* s, const char* m) {
    (void)s;
    (void)m;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_user(shout_t* s, const char* u) {
    (void)s;
    (void)u;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_format(shout_t* s, unsigned int f) {
    (void)s;
    (void)f;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_content_format(shout_t* s, unsigned int f, unsigned int u, const char* c) {
    (void)s;
    (void)f;
    (void)u;
    (void)c;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_name(shout_t* s, const char* n) {
    (void)s;
    (void)n;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_genre(shout_t* s, const char* g) {
    (void)s;
    (void)g;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_description(shout_t* s, const char* d) {
    (void)s;
    (void)d;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_meta(shout_t* s, const char* k, const char* v) {
    (void)s;
    (void)k;
    (void)v;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_audio_info(shout_t* s, const char* k, const char* v) {
    (void)s;
    (void)k;
    (void)v;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_nonblocking(shout_t* s, unsigned int nb) {
    (void)s;
    (void)nb;
    return SHOUTERR_SUCCESS;
}
static inline int shout_open(shout_t* s) {
    (void)s;
    return -1;
}
static inline int shout_close(shout_t* s) {
    (void)s;
    return SHOUTERR_SUCCESS;
}
static inline int shout_send(shout_t* s, const unsigned char* d, size_t n) {
    (void)s;
    (void)d;
    (void)n;
    return -1;
}
static inline int shout_get_connected(shout_t* s) {
    (void)s;
    return -1;
}
static inline size_t shout_queuelen(shout_t* s) {
    (void)s;
    return 0;
}
static inline shout_metadata_t* shout_metadata_new(void) {
    return (shout_metadata_t*)0;
}
static inline void shout_metadata_free(shout_metadata_t* m) {
    (void)m;
}
static inline int shout_metadata_add(shout_metadata_t* m, const char* k, const char* v) {
    (void)m;
    (void)k;
    (void)v;
    return SHOUTERR_SUCCESS;
}
static inline int shout_set_metadata(shout_t* s, shout_metadata_t* m) {
    (void)s;
    (void)m;
    return SHOUTERR_SUCCESS;
}

#ifdef __cplusplus
}
#endif

#endif /* SHIM_SHOUT_H */
