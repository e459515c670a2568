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

}  // extern "C"
