// Golden-oracle harness: drives the REFERENCE's own DSP classes
// (Squelch / CTCSS / NotchFilter / LowpassFilter, compiled unmodified from
// the read-only reference tree via -I / direct source paths) so the Python
// tests can compare our refmodel (and thus the whole TPU demod chain that is
// tested against the refmodel) against the actual C++ behaviour.
//
// This file is NEW driver code; it contains no code from the reference.
//
// Protocols (all little-endian binary on stdin/stdout):
//
//   squelch <snr_db|level:manual_dbfs_level> [ctcss <freq> <rate>] [postfilter]
//     stdin:  per sample: float32 raw, float32 filtered, float32 audio
//     stdout: per sample: uint8 flags (bit0 is_open, bit1 should_filter,
//             bit2 first_open, bit3 last_open, bit4 should_process_audio),
//             float32 noise_level, float32 signal_level
//             then trailer: uint64 open_count, flappy_count, ctcss_count,
//             no_ctcss_count
//
//   lowpass <cutoff_hz> <sample_rate>
//     stdin:  float32 (re, im) pairs;  stdout: float32 (re, im) pairs
//
//   notch <freq> <sample_rate> <q>
//     stdin:  float32 samples;         stdout: float32 samples

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

#include "ctcss.h"
#include "filters.h"
#include "logging.h"
#include "squelch.h"

// logging.cpp globals/functions the reference objects reference (we don't
// link logging.cpp — these no-op stand-ins keep the harness dependency-free)
LogDestination log_destination = NONE;
FILE* debugf = nullptr;
void log(int, const char*, ...) {}
void error() {
    _Exit(1);
}

static int run_squelch(int argc, char** argv) {
    Squelch sq;
    bool use_post = false;
    bool use_ctcss = false;
    for (int i = 2; i < argc; i++) {
        std::string a = argv[i];
        if (a == "postfilter") {
            use_post = true;
        } else if (a == "ctcss") {
            float f = atof(argv[++i]);
            float r = atof(argv[++i]);
            sq.set_ctcss_freq(f, r);
            use_ctcss = true;
        } else if (a.rfind("level:", 0) == 0) {
            sq.set_squelch_level_threshold(atof(a.c_str() + 6));
        } else {
            sq.set_squelch_snr_threshold(atof(a.c_str()));
        }
    }
    float buf[3];
    while (fread(buf, sizeof(float), 3, stdin) == 3) {
        sq.process_raw_sample(buf[0]);
        uint8_t flags = 0;
        if (sq.should_filter_sample()) {
            flags |= 2;
            if (use_post)
                sq.process_filtered_sample(buf[1]);
        }
        bool spa = sq.should_process_audio();
        if (spa)
            flags |= 16;
        if (use_ctcss && spa)
            sq.process_audio_sample(buf[2]);
        if (sq.is_open())
            flags |= 1;
        if (sq.first_open_sample())
            flags |= 4;
        if (sq.last_open_sample())
            flags |= 8;
        float nl = sq.noise_level();
        float sl = sq.signal_level();
        fwrite(&flags, 1, 1, stdout);
        fwrite(&nl, sizeof(float), 1, stdout);
        fwrite(&sl, sizeof(float), 1, stdout);
    }
    uint64_t trailer[4] = {(uint64_t)sq.open_count(), (uint64_t)sq.flappy_count(), (uint64_t)sq.ctcss_count(), (uint64_t)sq.no_ctcss_count()};
    fwrite(trailer, sizeof(uint64_t), 4, stdout);
    return 0;
}

static int run_lowpass(int argc, char** argv) {
    (void)argc;
    LowpassFilter lp(atof(argv[2]), atof(argv[3]));
    float rj[2];
    while (fread(rj, sizeof(float), 2, stdin) == 2) {
        lp.apply(rj[0], rj[1]);
        fwrite(rj, sizeof(float), 2, stdout);
    }
    return 0;
}

static int run_notch(int argc, char** argv) {
    (void)argc;
    NotchFilter nf(atof(argv[2]), atof(argv[3]), atof(argv[4]));
    float v;
    while (fread(&v, sizeof(float), 1, stdin) == 1) {
        nf.apply(v);
        fwrite(&v, sizeof(float), 1, stdout);
    }
    return 0;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s squelch|lowpass|notch ...\n", argv[0]);
        return 2;
    }
    if (!strcmp(argv[1], "squelch"))
        return run_squelch(argc, argv);
    if (!strcmp(argv[1], "lowpass"))
        return run_lowpass(argc, argv);
    if (!strcmp(argv[1], "notch"))
        return run_notch(argc, argv);
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
