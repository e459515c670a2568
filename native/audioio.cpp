// foley-tpu native audio IO: the host-side post-processing hot loop in C++.
//
// The reference has no native sources (SURVEY.md §2: 100% Python/PyTorch); this library is
// the framework's native runtime component for the serving path, where per-request host work
// (float32 -> int16 PCM with clipping, peak scan, linear resampling, WAV container framing)
// runs outside XLA. Exposed via ctypes (no pybind11 in this image); a pure-numpy fallback
// lives in foley_tpu/io/native.py.
//
// Build: make -C native  (or foley_tpu.io.native.build_native())

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <algorithm>

extern "C" {

// float32 [-1, 1] -> int16 PCM with clipping. Returns number of samples written.
long af_float_to_pcm16(const float* in, int16_t* out, long n) {
    for (long i = 0; i < n; ++i) {
        float v = in[i];
        v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
    return n;
}

// Peak absolute value.
float af_peak(const float* in, long n) {
    float peak = 0.0f;
    for (long i = 0; i < n; ++i) {
        float a = fabsf(in[i]);
        if (a > peak) peak = a;
    }
    return peak;
}

// In-place gain.
void af_scale(float* x, long n, float gain) {
    for (long i = 0; i < n; ++i) x[i] *= gain;
}

// Linear resampler: n_in samples at sr_in -> n_out samples at sr_out.
// n_out must be (long)(n_in * (double)sr_out / sr_in). Returns n_out.
long af_resample_linear(const float* in, long n_in, float* out, long n_out) {
    if (n_in <= 1 || n_out <= 0) {
        for (long i = 0; i < n_out; ++i) out[i] = n_in > 0 ? in[0] : 0.0f;
        return n_out;
    }
    const double step = (double)(n_in - 1) / (double)(n_out - 1 > 0 ? n_out - 1 : 1);
    for (long i = 0; i < n_out; ++i) {
        double pos = i * step;
        long i0 = (long)pos;
        if (i0 >= n_in - 1) { out[i] = in[n_in - 1]; continue; }
        double frac = pos - (double)i0;
        out[i] = (float)((1.0 - frac) * in[i0] + frac * in[i0 + 1]);
    }
    return n_out;
}

// Write a complete 16-bit PCM WAV image (header + payload) into `out`.
// `out` must have room for 44 + 2*n_samples*channels bytes. Returns total bytes.
long af_wav_image(const float* interleaved, long n_samples, int channels, int sample_rate,
                  uint8_t* out) {
    const long data_bytes = 2L * n_samples * channels;
    const long total = 44 + data_bytes;
    uint8_t* p = out;
    auto w32 = [&p](uint32_t v) { memcpy(p, &v, 4); p += 4; };
    auto w16 = [&p](uint16_t v) { memcpy(p, &v, 2); p += 2; };
    memcpy(p, "RIFF", 4); p += 4;
    w32((uint32_t)(total - 8));
    memcpy(p, "WAVE", 4); p += 4;
    memcpy(p, "fmt ", 4); p += 4;
    w32(16);                       // fmt chunk size
    w16(1);                        // PCM
    w16((uint16_t)channels);
    w32((uint32_t)sample_rate);
    w32((uint32_t)(sample_rate * channels * 2));  // byte rate
    w16((uint16_t)(channels * 2)); // block align
    w16(16);                       // bits per sample
    memcpy(p, "data", 4); p += 4;
    w32((uint32_t)data_bytes);
    af_float_to_pcm16(interleaved, (int16_t*)p, n_samples * channels);
    return total;
}

// ---------------------------------------------------------------------------------
// WAV ingest (the training data-loader hot loop): parse RIFF, decode PCM 16/24/32 or
// float32, average to mono, linear-resample to target_sr — one call, no Python copies.
//
// Two-phase protocol (so the caller allocates exactly once):
//   n = af_load_wav_mono(path, target_sr, NULL, 0, &sr);   // probe: output length (or <0)
//   af_load_wav_mono(path, target_sr, buf, n, &sr);        // decode into buf
// target_sr <= 0 keeps the file rate. Errors: -1 open, -2 not RIFF/WAVE, -3 missing
// chunks, -4 unsupported encoding, -5 buffer too small.
// ---------------------------------------------------------------------------------

static long af__read_chunks(FILE* f, uint8_t** fmt_out, long* fmt_len,
                            uint8_t** data_out, long* data_len) {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return -2;
    if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return -2;
    *fmt_out = nullptr; *data_out = nullptr;
    uint8_t ch[8];
    while (fread(ch, 1, 8, f) == 8) {
        uint32_t size; memcpy(&size, ch + 4, 4);
        long padded = (long)size + (size & 1);
        if (size == 0) {  // legal zero-length chunk: skip (malloc(0) may return NULL)
            if (padded) fseek(f, 1, SEEK_CUR);
            continue;
        }
        uint8_t* buf = (uint8_t*)malloc(size);
        if (!buf) return -3;
        if (fread(buf, 1, size, f) != size) { free(buf); break; }
        if (padded != (long)size) fseek(f, 1, SEEK_CUR);
        // keep the LAST fmt/data chunk, mirroring the Python fallback parser
        // (foley_tpu/io/audio.py) so both paths agree on pathological files
        if (memcmp(ch, "fmt ", 4) == 0) { free(*fmt_out); *fmt_out = buf; *fmt_len = size; }
        else if (memcmp(ch, "data", 4) == 0) { free(*data_out); *data_out = buf; *data_len = size; }
        else free(buf);
    }
    return (*fmt_out && *data_out) ? 0 : -3;
}

long af_load_wav_mono(const char* path, int target_sr, float* out, long out_cap,
                      int* sr_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t *fmt = nullptr, *data = nullptr; long fmt_len = 0, data_len = 0;
    long rc = af__read_chunks(f, &fmt, &fmt_len, &data, &data_len);
    fclose(f);
    if (rc != 0) { free(fmt); free(data); return rc; }

    uint16_t audio_format, channels, bits; uint32_t sr;
    memcpy(&audio_format, fmt + 0, 2);
    memcpy(&channels, fmt + 2, 2);
    memcpy(&sr, fmt + 4, 4);
    memcpy(&bits, fmt + 14, 2);
    if (audio_format == 0xFFFE && fmt_len >= 26) memcpy(&audio_format, fmt + 24, 2);
    if (channels == 0) { free(fmt); free(data); return -4; }

    long frames;
    float* mono = nullptr;
    if (audio_format == 3 && bits == 32) {
        frames = data_len / (4L * channels);
        mono = (float*)malloc(sizeof(float) * frames);
        const float* s = (const float*)data;
        for (long i = 0; i < frames; ++i) {
            double acc = 0;
            for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
            mono[i] = (float)(acc / channels);
        }
    } else if (audio_format == 1 && bits == 16) {
        frames = data_len / (2L * channels);
        mono = (float*)malloc(sizeof(float) * frames);
        const int16_t* s = (const int16_t*)data;
        for (long i = 0; i < frames; ++i) {
            double acc = 0;
            for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
            mono[i] = (float)(acc / channels / 32768.0);
        }
    } else if (audio_format == 1 && bits == 32) {
        frames = data_len / (4L * channels);
        mono = (float*)malloc(sizeof(float) * frames);
        const int32_t* s = (const int32_t*)data;
        for (long i = 0; i < frames; ++i) {
            double acc = 0;
            for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
            mono[i] = (float)(acc / channels / 2147483648.0);
        }
    } else if (audio_format == 1 && bits == 24) {
        frames = data_len / (3L * channels);
        mono = (float*)malloc(sizeof(float) * frames);
        const uint8_t* s = data;
        for (long i = 0; i < frames; ++i) {
            double acc = 0;
            for (int c = 0; c < channels; ++c) {
                const uint8_t* p3 = s + 3 * (i * channels + c);
                int32_t v = (int32_t)(p3[0] | (p3[1] << 8) | ((int8_t)p3[2] << 16));
                acc += v;
            }
            mono[i] = (float)(acc / channels / 8388608.0);
        }
    } else {
        free(fmt); free(data); return -4;
    }
    free(fmt); free(data);

    long n_out = frames;
    if (target_sr > 0 && (uint32_t)target_sr != sr && frames > 0)
        n_out = (long)llround((double)frames * target_sr / sr);
    if (sr_out) *sr_out = (target_sr > 0) ? target_sr : (int)sr;
    if (!out) { free(mono); return n_out; }           // probe call
    if (out_cap < n_out) { free(mono); return -5; }
    if (n_out == frames) memcpy(out, mono, sizeof(float) * frames);
    else af_resample_linear(mono, frames, out, n_out);
    free(mono);
    return n_out;
}

}  // extern "C"
