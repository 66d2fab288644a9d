// Native audio data plane: WAV decode with seek + polyphase sinc resampling.
//
// The reference delegates decode/resample to ffmpeg/julius (C/CUDA via pip
// deps, SURVEY.md §2.9); here the host-side hot path is first-party C++
// exposed through ctypes (audiocraft_tpu/data/_native.py). On the single-core
// data-plane hosts this is the training-input bottleneck.
//
// Build: see native/Makefile (g++ -O3 -march=native -shared).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM int, 3 = float
  long data_offset = 0;
  uint64_t data_size = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char riff[12];
  if (fread(riff, 1, 12, f) != 12) return false;
  if (memcmp(riff, "RIFF", 4) != 0 || memcmp(riff + 8, "WAVE", 4) != 0)
    return false;
  char chunk[8];
  bool have_fmt = false;
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      if (size < 16) return false;  // malformed: PCM fmt chunk is >= 16 bytes
      std::vector<char> fmt(size);
      if (fread(fmt.data(), 1, size, f) != size) return false;
      memcpy(&info->format, fmt.data(), 2);
      memcpy(&info->channels, fmt.data() + 2, 2);
      memcpy(&info->sample_rate, fmt.data() + 4, 4);
      memcpy(&info->bits, fmt.data() + 14, 2);
      if (info->format == 0xFFFE && size >= 26) {
        memcpy(&info->format, fmt.data() + 24, 2);
      }
      if (size % 2) fseek(f, 1, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      if (!have_fmt) return false;
      info->data_offset = ftell(f);
      info->data_size = size;
      return true;
    } else {
      fseek(f, size + (size % 2), SEEK_CUR);
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Returns 0 on success. Fills sample_rate/channels/num_frames.
int wav_info(const char* path, int* sample_rate, int* channels,
             long* num_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok || info.channels == 0 || info.bits == 0) return 2;
  *sample_rate = static_cast<int>(info.sample_rate);
  *channels = static_cast<int>(info.channels);
  *num_frames =
      static_cast<long>(info.data_size / (info.channels * (info.bits / 8)));
  return 0;
}

// Decode [start_frame, start_frame + max_frames) into out — planar
// [C, out_capacity_frames] float32: channel c is written at stride
// out_capacity_frames (the caller's allocation), NOT at the decoded
// length, so short reads stay aligned with the caller's 2-D view.
// Returns number of frames decoded, or -errno.
long wav_read(const char* path, long start_frame, long max_frames,
              float* out, long out_capacity_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -2;
  }
  if (info.channels == 0 ||
      (info.bits != 8 && info.bits != 16 && info.bits != 24 &&
       info.bits != 32)) {
    fclose(f);
    return -3;
  }
  const int C = info.channels;
  const int bytes_per_sample = info.bits / 8;
  const long total = info.data_size / (C * bytes_per_sample);
  if (start_frame > total) start_frame = total;
  long n = total - start_frame;
  if (max_frames >= 0 && n > max_frames) n = max_frames;
  if (n > out_capacity_frames) n = out_capacity_frames;
  fseek(f, info.data_offset + start_frame * C * bytes_per_sample, SEEK_SET);
  std::vector<unsigned char> raw(n * C * bytes_per_sample);
  long got = fread(raw.data(), C * bytes_per_sample, n, f);
  fclose(f);
  n = got;

  // interleaved -> planar float32
  for (long t = 0; t < n; ++t) {
    for (int c = 0; c < C; ++c) {
      const unsigned char* p = raw.data() + (t * C + c) * bytes_per_sample;
      float v = 0.f;
      if (info.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.f;
      } else if (info.bits == 32 && info.format == 3) {
        memcpy(&v, p, 4);
      } else if (info.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.f;
      } else if (info.bits == 24) {
        int32_t s = p[0] | (p[1] << 8) | (p[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = s / 8388608.f;
      } else if (info.bits == 8) {
        v = (p[0] - 128) / 128.f;
      }
      out[c * out_capacity_frames + t] = v;
    }
  }
  return n;
}

// Polyphase windowed-sinc resampling matching ops/resample.py semantics:
// kernel[phase, j] = h(j - half - phase*q/p), Hann-windowed sinc lowpass.
// in: [C, T] planar (compact, channel stride T). out: planar with channel
// stride out_capacity (the caller's allocation). Returns out frames.
long resample(const float* in, long T, int C, int old_sr, int new_sr,
              int zeros, float rolloff, float* out, long out_capacity) {
  if (old_sr == new_sr) {
    long n = T < out_capacity ? T : out_capacity;
    for (int c = 0; c < C; ++c)
      memcpy(out + c * out_capacity, in + c * T, sizeof(float) * n);
    return n;
  }
  // reduce by gcd
  int a = old_sr, b = new_sr;
  while (b) {
    int t = b;
    b = a % b;
    a = t;
  }
  const int q = old_sr / a, p = new_sr / a;
  const double cutoff = rolloff * std::min(1.0, double(p) / q);
  const int half = static_cast<int>(std::ceil(zeros / cutoff));
  const long new_len = static_cast<long>(
      std::ceil(double(T) * new_sr / old_sr));
  const long n_out = new_len < out_capacity ? new_len : out_capacity;

  // precompute kernels [p][2*half + q]
  const int width = 2 * half + 1 + (q - 1);
  std::vector<std::vector<float>> kernels(p, std::vector<float>(width));
  for (int phase = 0; phase < p; ++phase) {
    for (int j = 0; j < width; ++j) {
      const double t = j - half - double(phase) * q / p;
      const double x = cutoff * t;
      const double sinc =
          x == 0.0 ? cutoff : cutoff * std::sin(M_PI * x) / (M_PI * x);
      const double warg = t / half;
      const double window =
          std::fabs(warg) <= 1.0 ? 0.5 * (1.0 + std::cos(M_PI * warg)) : 0.0;
      kernels[phase][j] = static_cast<float>(sinc * window);
    }
  }

  for (int c = 0; c < C; ++c) {
    const float* src = in + c * T;
    float* dst = out + c * out_capacity;
    for (long m = 0; m < n_out; ++m) {
      const long frame = m / p;
      const int phase = static_cast<int>(m % p);
      const long base = frame * q - half;
      const std::vector<float>& k = kernels[phase];
      float acc = 0.f;
      for (int j = 0; j < width; ++j) {
        const long idx = base + j;
        if (idx >= 0 && idx < T) acc += src[idx] * k[j];
      }
      dst[m] = acc;
    }
  }
  return n_out;
}

// Fused read + resample + channel conversion: the dataset hot path.
// Returns output frames at target_sr with target_channels, planar.
long wav_read_resample(const char* path, double seek_time, double duration,
                       int target_sr, int target_channels, float* out,
                       long out_capacity_frames) {
  int sr, ch;
  long total;
  if (wav_info(path, &sr, &ch, &total) != 0) return -1;
  long start = static_cast<long>(seek_time * sr);
  long max_frames = duration > 0
                        ? static_cast<long>(duration * sr)
                        : -1;
  long want = max_frames >= 0 ? max_frames : total - start;
  if (want < 0) want = 0;
  std::vector<float> buf(static_cast<size_t>(want) * ch);
  long n = wav_read(path, start, want, buf.data(), want);
  if (n < 0) return n;
  if (n < want) {
    // compact short reads: wav_read wrote channel c at stride `want`;
    // downstream consumers expect compact stride n. Ascending c is safe
    // (dest c*n <= src c*want, regions shrink left).
    for (int c = 1; c < ch; ++c)
      memmove(buf.data() + static_cast<size_t>(c) * n,
              buf.data() + static_cast<size_t>(c) * want,
              sizeof(float) * n);
  }

  // channel conversion (planar, compact stride n)
  std::vector<float> mono;
  const float* src = buf.data();
  int src_ch = ch;
  if (target_channels == 1 && ch > 1) {
    mono.resize(n);
    for (long t = 0; t < n; ++t) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += buf[c * n + t];
      mono[t] = acc / ch;
    }
    src = mono.data();
    src_ch = 1;
  }

  if (sr == target_sr && src_ch == target_channels) {
    long frames = n < out_capacity_frames ? n : out_capacity_frames;
    for (int c = 0; c < src_ch; ++c)
      memcpy(out + c * out_capacity_frames, src + c * n,
             sizeof(float) * frames);
    return frames;
  }
  if (src_ch == target_channels) {
    return resample(src, n, src_ch, sr, target_sr, 24, 0.945f, out,
                    out_capacity_frames);
  }
  // mono -> multi: resample then replicate at the caller's stride
  std::vector<float> res(static_cast<size_t>(out_capacity_frames));
  long rn = resample(src, n, 1, sr, target_sr, 24, 0.945f, res.data(),
                     out_capacity_frames);
  for (int c = 0; c < target_channels; ++c)
    memcpy(out + c * out_capacity_frames, res.data(), sizeof(float) * rn);
  return rn;
}

}  // extern "C"
