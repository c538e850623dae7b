// diffmst_native: host-side data-loader core (C++17, no external deps).
//
// The reference delegates its data-pipeline hot path to native libraries
// (libsndfile decode + per-track loudness measurement inside DataLoader
// workers; /root/reference/mst/dataloader.py:205,303-316 and SURVEY.md §2.6).
// This library is the equivalent for the TPU host: random-access WAV decode
// (PCM 16/24/32 and float32), BS.1770-4 integrated loudness (K-weighting +
// two-stage gating), and a fused decode+measure+normalize entry point so one
// pass over the samples feeds the RAM buffer.
//
// Exposed as a C ABI consumed via ctypes (diffmst_tpu/data/native.py).
// Build: g++ -O3 -march=native -shared -fPIC -o libdiffmst_native.so diffmst_native.cpp

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- WAV parse

struct WavInfo {
  long data_offset = 0;   // byte offset of sample data
  long num_frames = 0;
  int channels = 0;
  int sample_rate = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM int, 3 = IEEE float
};

bool parse_wav_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "RIFF", 4)) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || memcmp(id, "WAVE", 4)) return false;

  bool have_fmt = false;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (!memcmp(id, "fmt ", 4)) {
      std::vector<uint8_t> buf(sz);
      if (fread(buf.data(), 1, sz, f) != sz) return false;
      uint16_t fmt, ch, bits;
      uint32_t rate;
      memcpy(&fmt, buf.data(), 2);
      memcpy(&ch, buf.data() + 2, 2);
      memcpy(&rate, buf.data() + 4, 4);
      memcpy(&bits, buf.data() + 14, 2);
      if (fmt == 0xFFFE && sz >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        memcpy(&sub, buf.data() + 24, 2);
        fmt = sub;
      }
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)rate;
      info->bits = bits;
      have_fmt = true;
    } else if (!memcmp(id, "data", 4)) {
      if (!have_fmt) return false;
      info->data_offset = ftell(f);
      long block = (long)info->channels * (info->bits / 8);
      if (block <= 0) return false;
      info->num_frames = (long)sz / block;
      return info->format == 1 || info->format == 3;
    } else {
      fseek(f, (sz + 1) & ~1u, SEEK_CUR);  // chunks are word-aligned
    }
  }
  return false;
}

// Decode `frames` frames starting at `start` into interleaved float32 [-1,1).
bool decode(FILE* f, const WavInfo& info, long start, long frames, float* out) {
  const int bytes = info.bits / 8;
  const long block = (long)info.channels * bytes;
  if (fseek(f, info.data_offset + start * block, SEEK_SET) != 0) return false;
  const long n = frames * info.channels;
  std::vector<uint8_t> raw((size_t)n * bytes);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return false;

  const uint8_t* p = raw.data();
  if (info.format == 3 && info.bits == 32) {
    memcpy(out, p, (size_t)n * 4);
  } else if (info.format == 1 && info.bits == 16) {
    constexpr float s = 1.0f / 32768.0f;
    for (long i = 0; i < n; ++i) {
      int16_t v;
      memcpy(&v, p + i * 2, 2);
      out[i] = v * s;
    }
  } else if (info.format == 1 && info.bits == 24) {
    constexpr float s = 1.0f / 8388608.0f;
    for (long i = 0; i < n; ++i) {
      const uint8_t* b = p + i * 3;
      int32_t v = (int32_t)((uint32_t)b[0] << 8 | (uint32_t)b[1] << 16 |
                            (uint32_t)b[2] << 24) >> 8;
      out[i] = v * s;
    }
  } else if (info.format == 1 && info.bits == 32) {
    constexpr float s = 1.0f / 2147483648.0f;
    for (long i = 0; i < n; ++i) {
      int32_t v;
      memcpy(&v, p + i * 4, 4);
      out[i] = v * s;
    }
  } else {
    return false;
  }
  return true;
}

// ------------------------------------------------------------ BS.1770-4

struct Biquad {
  double b0, b1, b2, a1, a2;
};

// RBJ designs matching diffmst_tpu/ops/loudness.py (+4 dB high shelf at
// 1500 Hz Q=1/sqrt(2); high-pass at 38 Hz Q=0.5).
void k_weighting(double fs, Biquad* shelf, Biquad* hp) {
  {
    const double G = 4.0, Q = 1.0 / std::sqrt(2.0), fc = 1500.0;
    const double A = std::pow(10.0, G / 40.0);
    const double w0 = 2.0 * M_PI * fc / fs;
    const double alpha = std::sin(w0) / (2.0 * Q), cw = std::cos(w0);
    const double a0 = (A + 1) - (A - 1) * cw + 2 * std::sqrt(A) * alpha;
    shelf->b0 = A * ((A + 1) + (A - 1) * cw + 2 * std::sqrt(A) * alpha) / a0;
    shelf->b1 = -2 * A * ((A - 1) + (A + 1) * cw) / a0;
    shelf->b2 = A * ((A + 1) + (A - 1) * cw - 2 * std::sqrt(A) * alpha) / a0;
    shelf->a1 = 2 * ((A - 1) - (A + 1) * cw) / a0;
    shelf->a2 = ((A + 1) - (A - 1) * cw - 2 * std::sqrt(A) * alpha) / a0;
  }
  {
    const double Q = 0.5, fc = 38.0;
    const double w0 = 2.0 * M_PI * fc / fs;
    const double alpha = std::sin(w0) / (2.0 * Q), cw = std::cos(w0);
    const double a0 = 1 + alpha;
    hp->b0 = ((1 + cw) / 2.0) / a0;
    hp->b1 = (-(1 + cw)) / a0;
    hp->b2 = ((1 + cw) / 2.0) / a0;
    hp->a1 = (-2 * cw) / a0;
    hp->a2 = (1 - alpha) / a0;
  }
}

// Integrated loudness of interleaved float audio.
double loudness_impl(const float* data, long frames, int channels, double fs) {
  if (frames <= 0 || channels <= 0) return -INFINITY;
  Biquad shelf, hp;
  k_weighting(fs, &shelf, &hp);

  const long block = (long)std::lround(0.4 * fs);
  const long step = (long)std::lround(block * 0.25);
  if (block <= 0) return -INFINITY;
  const long num_blocks = frames >= block ? (frames - block) / step + 1 : 1;
  const double g_w[5] = {1.0, 1.0, 1.0, 1.41, 1.41};

  // K-weight per channel (direct form II transposed), accumulate squared
  // signal into a prefix-sum for O(1) block power queries.
  std::vector<std::vector<double>> prefix(
      channels, std::vector<double>((size_t)frames + 1, 0.0));
  for (int c = 0; c < channels; ++c) {
    double s1 = 0, s2 = 0, h1 = 0, h2 = 0;
    double* pf = prefix[c].data();
    for (long i = 0; i < frames; ++i) {
      const double x = data[i * channels + c];
      // shelf
      double y = shelf.b0 * x + s1;
      s1 = shelf.b1 * x - shelf.a1 * y + s2;
      s2 = shelf.b2 * x - shelf.a2 * y;
      // highpass
      double z = hp.b0 * y + h1;
      h1 = hp.b1 * y - hp.a1 * z + h2;
      h2 = hp.b2 * y - hp.a2 * z;
      pf[i + 1] = pf[i] + z * z;
    }
  }

  auto block_power = [&](long j, int c) {
    const long s = (frames >= block) ? j * step : 0;
    const long e = (frames >= block) ? s + block : frames;
    return (prefix[c][e] - prefix[c][s]) / (double)(e - s);
  };

  std::vector<double> l(num_blocks);
  for (long j = 0; j < num_blocks; ++j) {
    double sum = 0;
    for (int c = 0; c < channels && c < 5; ++c) sum += g_w[c] * block_power(j, c);
    l[j] = -0.691 + 10.0 * std::log10(std::max(sum, 1e-12));
  }

  auto gated_loudness = [&](double gate) -> double {
    std::vector<double> zavg(channels, 0.0);
    long count = 0;
    for (long j = 0; j < num_blocks; ++j) {
      if (l[j] > gate) {
        for (int c = 0; c < channels; ++c) zavg[c] += block_power(j, c);
        ++count;
      }
    }
    if (!count) return -INFINITY;
    double sum = 0;
    for (int c = 0; c < channels && c < 5; ++c) sum += g_w[c] * zavg[c] / count;
    return -0.691 + 10.0 * std::log10(std::max(sum, 1e-12));
  };

  const double abs_gated = gated_loudness(-70.0);
  if (!std::isfinite(abs_gated)) return -INFINITY;
  const double gamma_r = abs_gated - 10.0;
  // second stage: both gates apply
  std::vector<double> zavg(channels, 0.0);
  long count = 0;
  for (long j = 0; j < num_blocks; ++j) {
    if (l[j] > -70.0 && l[j] > gamma_r) {
      for (int c = 0; c < channels; ++c) zavg[c] += block_power(j, c);
      ++count;
    }
  }
  if (!count) return -INFINITY;
  double sum = 0;
  for (int c = 0; c < channels && c < 5; ++c) sum += g_w[c] * zavg[c] / count;
  return -0.691 + 10.0 * std::log10(std::max(sum, 1e-12));
}

}  // namespace

extern "C" {

// Query (num_frames, channels, sample_rate); returns 0 on success.
int dn_wav_info(const char* path, long* frames, int* channels, int* rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  const bool ok = parse_wav_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *frames = info.num_frames;
  *channels = info.channels;
  *rate = info.sample_rate;
  return 0;
}

// Decode a slice into caller-allocated out[frames*channels] (interleaved).
int dn_wav_read(const char* path, long start, long frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  if (start < 0 || start + frames > info.num_frames) {
    fclose(f);
    return -3;
  }
  const bool ok = decode(f, info, start, frames, out);
  fclose(f);
  return ok ? 0 : -4;
}

// BS.1770-4 integrated loudness of interleaved float32 audio (LUFS).
double dn_integrated_loudness(const float* data, long frames, int channels,
                              double sample_rate) {
  return loudness_impl(data, frames, channels, sample_rate);
}

// Fused loader: decode slice, measure loudness, scale to target LUFS.
// Returns the measured pre-gain loudness via *lufs_out (or -inf; audio is
// then left unscaled). Rejection logic stays in Python.
int dn_load_normalized(const char* path, long start, long frames,
                       double target_lufs, float* out, double* lufs_out) {
  const int rc = dn_wav_read(path, start, frames, out);
  if (rc != 0) return rc;
  FILE* f = fopen(path, "rb");
  WavInfo info;
  parse_wav_header(f, &info);
  fclose(f);
  const double lufs =
      loudness_impl(out, frames, info.channels, (double)info.sample_rate);
  *lufs_out = lufs;
  if (std::isfinite(lufs)) {
    const float g = (float)std::pow(10.0, (target_lufs - lufs) / 20.0);
    for (long i = 0; i < frames * info.channels; ++i) out[i] *= g;
  }
  return 0;
}

// Threaded batch loader: run the fused decode+measure+normalize path for n
// files on a work-stealing pool of `num_threads` threads. Per item i the
// caller provides starts[i], frames[i], an out buffer sized
// frames[i]*channels_i (channels known from a prior dn_wav_info), and
// receives lufs[i] + rcs[i]. Decode is I/O + branchy integer unpacking and
// the K-weighting filter is sequential per file — exactly the work that
// belongs on host threads while the TPU consumes the previous buffer.
void dn_load_normalized_batch(const char** paths, const long* starts,
                              const long* frames, double target_lufs,
                              float** outs, double* lufs, int* rcs, int n,
                              int num_threads) {
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (int i; (i = next.fetch_add(1)) < n;) {
      rcs[i] = dn_load_normalized(paths[i], starts[i], frames[i], target_lufs,
                                  outs[i], &lufs[i]);
    }
  };
  int k = num_threads > 0 ? num_threads : 1;
  if (k > n) k = n;
  if (k <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(k);
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

}  // extern "C"
