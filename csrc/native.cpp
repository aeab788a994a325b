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

}  // extern "C"
