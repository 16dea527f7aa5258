// Native ingest runtime for rtlsdr-airband-tpu.
//
// TPU-native equivalent of the reference's input core (reference:
// src/input-helpers.cpp ring buffer with tail duplication, and the NEON
// samplefft conversion kernel src/rtl_airband_neon.s): a lock-guarded byte
// ring buffer whose head is mirrored past the end so a consumer read never
// straddles the wrap point, plus vectorizable sample-format converters
// (u8/s8/s16/f32 interleaved IQ -> float32 [re, im] pairs) and a paced file
// reader thread (reference: src/input-file.cpp real-time pacing).
//
// Exposed as a C ABI for ctypes.  Build: make -C native (produces
// libingest.so).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>

extern "C" {

// ----------------------------------------------------------------- ring

struct Ring {
    uint8_t* buf;
    size_t size;
    size_t extra;   // tail-duplication bytes (>= one FFT window)
    size_t head;    // write offset (bufe)
    size_t tail;    // read offset (bufs)
    size_t used;
    uint64_t overflow_count;
    std::mutex m;
};

Ring* ring_new(size_t size, size_t extra) {
    Ring* r = new Ring();
    r->buf = new uint8_t[size + extra]();
    r->size = size;
    r->extra = extra;
    r->head = r->tail = r->used = 0;
    r->overflow_count = 0;
    return r;
}

void ring_free(Ring* r) {
    if (!r) return;
    delete[] r->buf;
    delete r;
}

// Append n bytes; mirrors writes landing in [0, extra) past the end
// (reference: input-helpers.cpp:27-54).  Returns 1 on success, 0 on
// overflow (data dropped, counter bumped — reference :56-61 semantics).
int ring_append(Ring* r, const uint8_t* data, size_t n) {
    std::lock_guard<std::mutex> g(r->m);
    if (r->used + n > r->size) {
        r->overflow_count++;
        return 0;
    }
    size_t end = r->head + n;
    if (end <= r->size) {
        memcpy(r->buf + r->head, data, n);
        if (r->head < r->extra) {
            size_t dup = r->extra - r->head;
            if (dup > n) dup = n;
            memcpy(r->buf + r->size + r->head, data, dup);
        }
    } else {
        size_t first = r->size - r->head;
        memcpy(r->buf + r->head, data, first);
        size_t rest = n - first;
        memcpy(r->buf, data + first, rest);
        size_t dup = rest < r->extra ? rest : r->extra;
        memcpy(r->buf + r->size, r->buf, dup);
    }
    r->head = end % r->size;
    r->used += n;
    return 1;
}

size_t ring_available(Ring* r) {
    std::lock_guard<std::mutex> g(r->m);
    return r->used;
}

uint64_t ring_overflow_count(Ring* r) {
    std::lock_guard<std::mutex> g(r->m);
    return r->overflow_count;
}

// Consume n bytes into out.  Thanks to tail duplication the copy is at most
// two memcpys and commonly one.  Returns 1 on success, 0 if insufficient.
int ring_read(Ring* r, uint8_t* out, size_t n) {
    std::lock_guard<std::mutex> g(r->m);
    if (r->used < n) return 0;
    if (r->tail + n <= r->size + r->extra) {
        memcpy(out, r->buf + r->tail, n);
    } else {
        size_t first = r->size - r->tail;
        memcpy(out, r->buf + r->tail, first);
        memcpy(out + first, r->buf, n - first);
    }
    r->tail = (r->tail + n) % r->size;
    r->used -= n;
    return 1;
}

// Zero-copy view: if [tail, tail+n) is contiguous (incl. the duplicated
// tail), return a pointer without consuming; caller then ring_consume()s.
const uint8_t* ring_peek(Ring* r, size_t n) {
    std::lock_guard<std::mutex> g(r->m);
    if (r->used < n || r->tail + n > r->size + r->extra) return nullptr;
    return r->buf + r->tail;
}

void ring_consume(Ring* r, size_t n) {
    std::lock_guard<std::mutex> g(r->m);
    if (n > r->used) n = r->used;
    r->tail = (r->tail + n) % r->size;
    r->used -= n;
}

// ----------------------------------------------------- format conversion

// u8 interleaved IQ -> f32 pairs, (x - 127.5) / 127.5
// (reference: levels LUT init, rtl_airband.cpp:316-324)
void convert_u8_f32(const uint8_t* in, float* out, size_t n) {
    const float s = 1.0f / 127.5f;
    for (size_t i = 0; i < n; i++) out[i] = ((float)in[i] - 127.5f) * s;
}

void convert_s8_f32(const int8_t* in, float* out, size_t n) {
    const float s = 1.0f / 128.0f;
    for (size_t i = 0; i < n; i++) out[i] = (float)in[i] * s;
}

void convert_s16_f32(const int16_t* in, float* out, size_t n, float fullscale) {
    const float s = 1.0f / fullscale;
    for (size_t i = 0; i < n; i++) out[i] = (float)in[i] * s;
}

void convert_f32_scale(const float* in, float* out, size_t n, float fullscale) {
    const float s = 1.0f / fullscale;
    for (size_t i = 0; i < n; i++) out[i] = in[i] * s;
}

// Fused: window multiply during conversion (the reference's NEON samplefft
// fuses LUT lookup + window multiply, rtl_airband_neon.s).  out[f][k] =
// in[(f*hop + k)] * window[k] for complex interleaved data; used by future
// host-side pre-framing paths.
void window_frames_f32(const float* in, const float* window, float* out, size_t n_frames, size_t hop, size_t fft_size) {
    for (size_t f = 0; f < n_frames; f++) {
        const float* src = in + 2 * f * hop;
        float* dst = out + 2 * f * fft_size;
        for (size_t k = 0; k < fft_size; k++) {
            float w = window[k];
            dst[2 * k] = src[2 * k] * w;
            dst[2 * k + 1] = src[2 * k + 1] * w;
        }
    }
}

// ------------------------------------------------------- paced file reader

struct FileReader {
    Ring* ring;
    FILE* f;
    double time_per_byte;  // 0 = unpaced
    size_t chunk;
    std::thread th;
    std::atomic<bool> stop_flag;
    std::atomic<int> state;  // 0 unknown, 1 init, 2 running, 3 failed(EOF), 4 stopped
};

static void file_reader_loop(FileReader* fr) {
    fr->state = 2;
    uint8_t* buf = new uint8_t[fr->chunk];
    while (!fr->stop_flag.load()) {
        auto t0 = std::chrono::steady_clock::now();
        size_t n = fread(buf, 1, fr->chunk, fr->f);
        if (n == 0) {
            fr->state = 3;  // EOF -> FAILED (reference: input-file.cpp:104-108)
            break;
        }
        while (!ring_append(fr->ring, buf, n)) {
            if (fr->stop_flag.load()) goto done;
            std::this_thread::sleep_for(std::chrono::milliseconds(5));
        }
        if (fr->time_per_byte > 0) {
            double want = (double)n * fr->time_per_byte;
            std::chrono::duration<double> took = std::chrono::steady_clock::now() - t0;
            double surplus = want - took.count();
            if (surplus > 0) std::this_thread::sleep_for(std::chrono::duration<double>(surplus));
        }
    }
done:
    delete[] buf;
    if (fr->state == 2) fr->state = 4;
}

FileReader* file_reader_new(const char* path, Ring* ring, double bytes_per_sec, double speedup, size_t chunk) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    FileReader* fr = new FileReader();
    fr->ring = ring;
    fr->f = f;
    fr->chunk = chunk ? chunk : 262144;
    fr->time_per_byte = (speedup > 0 && bytes_per_sec > 0) ? 1.0 / (bytes_per_sec * speedup) : 0.0;
    fr->stop_flag = false;
    fr->state = 1;
    return fr;
}

void file_reader_start(FileReader* fr) {
    fr->th = std::thread(file_reader_loop, fr);
}

int file_reader_state(FileReader* fr) {
    return fr->state.load();
}

void file_reader_stop(FileReader* fr) {
    fr->stop_flag = true;
    if (fr->th.joinable()) fr->th.join();
    if (fr->state == 2) fr->state = 4;
}

void file_reader_free(FileReader* fr) {
    if (!fr) return;
    file_reader_stop(fr);
    if (fr->f) fclose(fr->f);
    delete fr;
}

}  // extern "C"
