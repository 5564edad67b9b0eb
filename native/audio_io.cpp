// Native audio I/O + resampling kernels for the data pipeline.
//
// The reference ships native (CUDA) code for its hot device ops; on TPU those
// became XLA programs (flowdec_tpu/ops), so the framework's native layer
// moves to where native code still pays off: the host-side input pipeline.
// WAV decoding (PCM int → float conversion) and polyphase resampling dominate
// dataloader CPU time; both are implemented here and exposed over a plain C
// ABI consumed via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -ffast-math -funroll-loops -shared -fPIC audio_io.cpp -o libflowdec_audio.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decoding
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits;
  int32_t format;     // 1 = PCM, 3 = IEEE float
  int64_t n_samples;  // per channel
  int64_t data_offset;
  int64_t data_size;
};

// Parse RIFF/WAVE headers. Returns 0 on success, negative error code otherwise.
int wav_probe(const uint8_t* buf, int64_t size, WavInfo* info) {
  if (size < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  bool have_fmt = false;
  info->data_offset = -1;
  while (pos + 8 <= size) {
    const uint8_t* ch = buf + pos;
    uint32_t chunk_size;
    memcpy(&chunk_size, ch + 4, 4);
    const uint8_t* body = ch + 8;
    if (memcmp(ch, "fmt ", 4) == 0 && pos + 8 + 16 <= size) {
      uint16_t fmt, channels, bits;
      uint32_t rate;
      memcpy(&fmt, body, 2);
      memcpy(&channels, body + 2, 2);
      memcpy(&rate, body + 4, 4);
      memcpy(&bits, body + 14, 2);
      if (fmt == 0xFFFE && chunk_size >= 26) {  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&fmt, body + 24, 2);
      }
      info->format = fmt;
      info->channels = channels;
      info->sample_rate = (int32_t)rate;
      info->bits = bits;
      have_fmt = true;
    } else if (memcmp(ch, "data", 4) == 0) {
      info->data_offset = pos + 8;
      info->data_size = std::min<int64_t>(chunk_size, size - info->data_offset);
    }
    pos += 8 + chunk_size + (chunk_size & 1);
    if (have_fmt && info->data_offset >= 0) break;
  }
  if (!have_fmt || info->data_offset < 0) return -2;
  if (info->channels <= 0 || info->bits <= 0) return -3;
  const int64_t frame = (int64_t)info->channels * (info->bits / 8);
  if (frame <= 0) return -3;
  info->n_samples = info->data_size / frame;
  return 0;
}

// Decode interleaved PCM/float payload into a planar float32 buffer
// out[channel * n_samples + t]; optional mono downmix (out length n_samples).
int wav_decode(const uint8_t* buf, int64_t size, const WavInfo* info,
               float* out, int downmix) {
  const uint8_t* d = buf + info->data_offset;
  const int64_t n = info->n_samples;
  const int c = info->channels;
  const float inv_c = 1.0f / (float)c;

  auto store = [&](int64_t t, int ch, float v) {
    if (downmix) {
      if (ch == 0) out[t] = v * inv_c;
      else out[t] += v * inv_c;
    } else {
      out[(int64_t)ch * n + t] = v;
    }
  };

  if (info->format == 1 && info->bits == 16) {
    const int16_t* p = (const int16_t*)d;
    const float s = 1.0f / 32768.0f;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) store(t, ch, p[t * c + ch] * s);
  } else if (info->format == 1 && info->bits == 24) {
    const float s = 1.0f / 8388608.0f;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) {
        const uint8_t* b = d + 3 * (t * c + ch);
        int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
        if (v >= (1 << 23)) v -= (1 << 24);
        store(t, ch, v * s);
      }
  } else if (info->format == 1 && info->bits == 32) {
    const int32_t* p = (const int32_t*)d;
    const float s = 1.0f / 2147483648.0f;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) store(t, ch, p[t * c + ch] * s);
  } else if (info->format == 1 && info->bits == 8) {
    const float s = 1.0f / 128.0f;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) store(t, ch, ((int)d[t * c + ch] - 128) * s);
  } else if (info->format == 3 && info->bits == 32) {
    const float* p = (const float*)d;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) store(t, ch, p[t * c + ch]);
  } else if (info->format == 3 && info->bits == 64) {
    const double* p = (const double*)d;
    for (int64_t t = 0; t < n; t++)
      for (int ch = 0; ch < c; ch++) store(t, ch, (float)p[t * c + ch]);
  } else {
    return -4;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Polyphase resampling
// ---------------------------------------------------------------------------

// in:       input signal, length in_len
// kernels:  (phases, taps) filter bank (same bank the JAX path builds)
// width:    left padding length (filter half-width)
// o:        reduced source rate (input stride per block)
// out:      output, length out_len (= ceil(phases * in_len / o))
// Output index j corresponds to block j / phases, phase j % phases.
int polyphase_resample(const float* in, int64_t in_len,
                       const float* kernels, int phases, int taps,
                       int o, int width,
                       float* out, int64_t out_len) {
  for (int64_t j = 0; j < out_len; j++) {
    const int64_t block = j / phases;
    const int phase = (int)(j % phases);
    const float* k = kernels + (int64_t)phase * taps;
    const int64_t start = block * o - width;  // index into unpadded input
    float acc = 0.0f;
    int64_t t0 = std::max<int64_t>(0, -start);
    int64_t t1 = std::min<int64_t>(taps, in_len - start);
    const float* src = in + start;
    for (int64_t t = t0; t < t1; t++) acc += k[t] * src[t];
    out[j] = acc;
  }
  return 0;
}

// Random/center crop + pad helper: copies a window [start, start+target) from
// src (len n) into dst (len target), zero-padding symmetrically when n < target.
void crop_or_pad(const float* src, int64_t n, float* dst, int64_t target,
                 int64_t start) {
  if (n >= target) {
    memcpy(dst, src + start, sizeof(float) * target);
  } else {
    const int64_t pad = target - n;
    const int64_t lo = pad / 2;
    memset(dst, 0, sizeof(float) * target);
    memcpy(dst + lo, src, sizeof(float) * n);
  }
}

}  // extern "C"
