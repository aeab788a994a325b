// Native runtime components for fun_asr_vllm_tpu.
//
// The reference leans on native libraries for its CPU hot spots: the
// kaldialign C++ Levenshtein (reference infer.py:10, 91) and libav/
// libsndfile decode (reference model.py:362, infer_kaldidata.py:101).
// This file provides TPU-framework-owned equivalents exposed via ctypes
// (see fun_asr_vllm_tpu/utils/native.py):
//
//   - align_tokens:  Levenshtein alignment over interned token ids with
//                    the same op semantics as the python DP (wer.py)
//   - pcm16_to_float / float_to_pcm16: bulk sample conversion
//   - resample_linear: light-weight linear resampler (the scipy polyphase
//                    path stays the quality option)
//   - nlms_echo_cancel: NLMS adaptive echo canceller (the data factory's
//                    2-channel device-recording cleaner,
//                    reference simple_audio_processor.py:603-718)
//   - wav_probe / wav_decode_f32: RIFF/RF64 WAV container parse + PCM
//                    8/16/24/32/float decode (the libsndfile surface the
//                    reference reads WAVs through)
//   - resample_upfirdn_f32: polyphase FIR resampler core (upfirdn) with
//                    double accumulation; taps are designed host-side to
//                    the scipy.signal.resample_poly spec so native and
//                    scipy outputs agree
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ops: 0=cor, 1=sub, 2=del, 3=ins. Tie-break: del < ins < diag, matching
// the python DP in fun_asr_vllm_tpu/text/wer.py. Returns op count.
int align_tokens(const int32_t* ref, int n, const int32_t* hyp, int m,
                 int32_t* ops_out) {
    const int w = m + 1;
    std::vector<int32_t> prev(w), cur(w);
    std::vector<uint8_t> bp((size_t)(n + 1) * w);
    for (int j = 0; j <= m; ++j) { prev[j] = j; bp[j] = 3; }
    bp[0] = 0;
    for (int i = 1; i <= n; ++i) {
        cur[0] = i;
        bp[(size_t)i * w] = 2;
        const int32_t ri = ref[i - 1];
        for (int j = 1; j <= m; ++j) {
            int best = prev[j] + 1;      // del
            uint8_t op = 2;
            int d = cur[j - 1] + 1;      // ins
            if (d < best) { best = d; op = 3; }
            d = prev[j - 1] + (ri == hyp[j - 1] ? 0 : 1);
            if (d < best) { best = d; op = (ri == hyp[j - 1]) ? 0 : 1; }
            cur[j] = best;
            bp[(size_t)i * w + j] = op;
        }
        std::swap(prev, cur);
    }
    // trace back
    int i = n, j = m, k = 0;
    std::vector<uint8_t> rev;
    rev.reserve(n + m);
    while (i > 0 || j > 0) {
        uint8_t op = bp[(size_t)i * w + j];
        rev.push_back(op);
        if (op <= 1) { --i; --j; }
        else if (op == 2) { --i; }
        else { --j; }
    }
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) ops_out[k++] = *it;
    return k;
}

void pcm16_to_float(const int16_t* in, int64_t n, float* out) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * s;
}

void float_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
}

void resample_linear(const float* in, int64_t n, double sr_in,
                     float* out, int64_t out_n, double sr_out) {
    if (n == 0 || out_n == 0) return;
    const double step = sr_in / sr_out;
    for (int64_t i = 0; i < out_n; ++i) {
        double pos = i * step;
        int64_t i0 = (int64_t)pos;
        if (i0 >= n - 1) { out[i] = in[n - 1]; continue; }
        double frac = pos - i0;
        out[i] = (float)(in[i0] * (1.0 - frac) + in[i0 + 1] * frac);
    }
}

// NLMS adaptive filter: cancel `ref_ch` (far-end/reference channel) from
// `mic_ch`; taps/mu/eps mirror the reference's echo-cancel configuration
// shape (simple_audio_processor.py:667-718). In-place output.
void nlms_echo_cancel(const float* mic, const float* ref, int64_t n,
                      int taps, float mu, float eps, float* out) {
    std::vector<float> wgt(taps, 0.0f);
    std::vector<float> buf(taps, 0.0f);
    float energy = eps;
    for (int64_t i = 0; i < n; ++i) {
        // shift reference into delay line
        energy -= buf[taps - 1] * buf[taps - 1];
        for (int t = taps - 1; t > 0; --t) buf[t] = buf[t - 1];
        buf[0] = ref[i];
        energy += ref[i] * ref[i];
        float est = 0.0f;
        for (int t = 0; t < taps; ++t) est += wgt[t] * buf[t];
        float err = mic[i] - est;
        out[i] = err;
        const float g = mu * err / (energy + eps);
        for (int t = 0; t < taps; ++t) wgt[t] += g * buf[t];
    }
}

// ---- WAV container ------------------------------------------------------

static inline uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}
static inline uint64_t rd_u64(const uint8_t* p) {
    return (uint64_t)rd_u32(p) | ((uint64_t)rd_u32(p + 4) << 32);
}
static inline uint16_t rd_u16(const uint8_t* p) {
    return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

// Parse a RIFF/RF64 WAVE header from an in-memory buffer. Mirrors the
// python parser in fun_asr_vllm_tpu/audio/io.py::read_wav (fmt chunk,
// WAVE_FORMAT_EXTENSIBLE sub-format resolution, RF64 ds64 data size,
// odd-size chunk padding). Returns 0 on success, <0 on parse error.
int wav_probe(const uint8_t* buf, int64_t n, int32_t* fmt_code,
              int32_t* bits, int32_t* channels, int32_t* rate,
              int64_t* data_off, int64_t* data_len) {
    if (n < 12) return -1;
    const bool rf64 = std::memcmp(buf, "RF64", 4) == 0;
    if (!rf64 && std::memcmp(buf, "RIFF", 4) != 0) return -1;
    if (std::memcmp(buf + 8, "WAVE", 4) != 0) return -1;
    int64_t pos = 12;
    bool have_fmt = false, have_data = false;
    int64_t rf64_data_size = -1;
    *channels = 1;
    *rate = 16000;
    while (pos + 8 <= n) {
        const uint8_t* cid = buf + pos;
        uint32_t csize = rd_u32(buf + pos + 4);
        pos += 8;
        if (rf64 && std::memcmp(cid, "ds64", 4) == 0) {
            // declared chunk size must cover the fields we read, else the
            // next chunk's bytes would be misread as sizes (the python
            // parser raises on such files — return <0 so it stays
            // authoritative)
            if (csize < 16 || pos + 16 > n) return -2;
            rf64_data_size = (int64_t)rd_u64(buf + pos + 8);
        } else if (std::memcmp(cid, "fmt ", 4) == 0) {
            if (csize < 16 || pos + 16 > n) return -2;
            *fmt_code = rd_u16(buf + pos);
            *channels = rd_u16(buf + pos + 2);
            *rate = (int32_t)rd_u32(buf + pos + 4);
            *bits = rd_u16(buf + pos + 14);
            if (*fmt_code == 0xFFFE && csize >= 40 && pos + 26 <= n)
                *fmt_code = rd_u16(buf + pos + 24);  // sub-format GUID head
            have_fmt = true;
        } else if (std::memcmp(cid, "data", 4) == 0) {
            int64_t size = csize;
            if (rf64 && csize == 0xFFFFFFFFu && rf64_data_size >= 0)
                size = rf64_data_size;
            if (size > n - pos) size = n - pos;  // truncated file: clamp
            *data_off = pos;
            *data_len = size;
            have_data = true;
        }
        pos += csize + (csize & 1);
    }
    if (!have_fmt || !have_data) return -3;
    return 0;
}

// Decode a PCM/float data chunk to float32 in [-1, 1]. `bits`/`fmt_code`
// from wav_probe (fmt 1 = integer PCM, 3 = IEEE float). Returns the
// number of decoded samples (total, interleaved) or <0 on error.
int64_t wav_decode_f32(const uint8_t* data, int64_t nbytes, int32_t bits,
                       int32_t fmt_code, float* out) {
    if (fmt_code == 3) {  // IEEE float
        if (bits == 32) {
            int64_t m = nbytes / 4;
            std::memcpy(out, data, (size_t)m * 4);
            return m;
        }
        if (bits == 64) {
            int64_t m = nbytes / 8;
            for (int64_t i = 0; i < m; ++i) {
                double v;
                std::memcpy(&v, data + i * 8, 8);
                out[i] = (float)v;
            }
            return m;
        }
        return -1;
    }
    if (bits == 16) {
        int64_t m = nbytes / 2;
        const float s = 1.0f / 32768.0f;
        for (int64_t i = 0; i < m; ++i)
            out[i] = (int16_t)rd_u16(data + i * 2) * s;
        return m;
    }
    if (bits == 32) {
        int64_t m = nbytes / 4;
        const float s = 1.0f / 2147483648.0f;
        for (int64_t i = 0; i < m; ++i)
            out[i] = (int32_t)rd_u32(data + i * 4) * s;
        return m;
    }
    if (bits == 24) {
        int64_t m = nbytes / 3;
        const float s = 1.0f / (float)(1 << 23);
        for (int64_t i = 0; i < m; ++i) {
            int32_t v = (int32_t)data[i * 3] | ((int32_t)data[i * 3 + 1] << 8)
                        | ((int32_t)data[i * 3 + 2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            out[i] = v * s;
        }
        return m;
    }
    if (bits == 8) {  // unsigned 8-bit PCM
        const float s = 1.0f / 128.0f;
        for (int64_t i = 0; i < nbytes; ++i)
            out[i] = ((float)data[i] - 128.0f) * s;
        return nbytes;
    }
    return -1;
}

// ---- Polyphase resampling (upfirdn core) ---------------------------------

// y[k] = z((offset + k) * down), z(t) = sum_j h[j] * x_up[t - j], where
// x_up is x zero-stuffed by `up`. Taps (float64) are the zero-padded
// firwin(2*10*max_rate+1, 1/max_rate, kaiser 5.0) * up filter that
// scipy.signal.resample_poly uses; `offset` is scipy's n_pre_remove.
// Multi-channel: x/out are interleaved [n, ch] / [out_n, ch].
void resample_upfirdn_f32(const float* x, int64_t n, int32_t ch,
                          int32_t up, int32_t down, const double* taps,
                          int64_t ntaps, int64_t offset, float* out,
                          int64_t out_n) {
    for (int64_t k = 0; k < out_n; ++k) {
        const int64_t t = (offset + k) * down;
        // valid input indices i with j = t - up*i in [0, ntaps)
        int64_t i_hi = t / up;
        if (i_hi > n - 1) i_hi = n - 1;
        int64_t lo_num = t - ntaps + 1;
        int64_t i_lo = lo_num <= 0 ? 0 : (lo_num + up - 1) / up;
        if (ch == 1) {
            double acc = 0.0;
            for (int64_t i = i_lo; i <= i_hi; ++i)
                acc += taps[t - up * i] * (double)x[i];
            out[k] = (float)acc;
        } else {
            for (int32_t c = 0; c < ch; ++c) {
                double acc = 0.0;
                for (int64_t i = i_lo; i <= i_hi; ++i)
                    acc += taps[t - up * i] * (double)x[i * ch + c];
                out[k * ch + c] = (float)acc;
            }
        }
    }
}

}  // extern "C"
