// juicyio — native I/O runtime for juicy_tpu.
//
// The reference's runtime layer is native C++ (JUCE host glue, buffer
// management); the TPU framework's equivalent native needs are on the *feed*
// side: decoding WAV corpora into pinned float32 arenas fast enough to keep a
// chip busy, and a lock-free SPSC ring buffer for a realtime host bridge.
// Python binds via ctypes (juicy_tpu/runtime/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode: PCM16/24/32 + IEEE float32 → float32 interleaved-planar [C][T].
// Returns 0 on success. Caller provides the arena; query dims first.
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t channels;
  int32_t sample_rate;
  int64_t frames;
  int32_t format;       // 1 = PCM, 3 = float
  int32_t bits;
};

static int read_header(FILE* f, WavInfo* info, long* data_offset,
                       int64_t* data_size) {
  char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return -1;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return -2;
  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  *data_offset = -1;
  *data_size = 0;
  for (;;) {
    char cid[4];
    uint32_t size;
    if (fread(cid, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (memcmp(cid, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) return -3;
      memcpy(&fmt_tag, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&sr, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      fseek(f, (long)(size - 16 + (size & 1)), SEEK_CUR);
    } else if (memcmp(cid, "data", 4) == 0) {
      *data_offset = ftell(f);
      *data_size = size;
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    } else {
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    }
  }
  if (fmt_tag == 0xFFFE) fmt_tag = (bits == 32) ? 3 : 1;  // extensible: guess
  if (*data_offset < 0 || channels == 0 || bits == 0) return -4;
  info->channels = channels;
  info->sample_rate = (int32_t)sr;
  info->format = fmt_tag;
  info->bits = bits;
  info->frames = *data_size / (channels * (bits / 8));
  return 0;
}

int juicy_wav_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long off; int64_t sz;
  int rc = read_header(f, info, &off, &sz);
  fclose(f);
  return rc;
}

// Decode into out[C][T] (planar), zero-padded / truncated to `frames_out`.
int juicy_wav_read(const char* path, float* out, int64_t frames_out,
                   int32_t channels_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  long off; int64_t sz;
  int rc = read_header(f, &info, &off, &sz);
  if (rc != 0) { fclose(f); return rc; }
  fseek(f, off, SEEK_SET);

  const int c_in = info.channels;
  const int bytes = info.bits / 8;
  const int64_t frames = info.frames < frames_out ? info.frames : frames_out;
  std::vector<uint8_t> raw((size_t)(frames * c_in * bytes));
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) { fclose(f); return -5; }
  fclose(f);

  memset(out, 0, sizeof(float) * (size_t)(frames_out * channels_out));
  for (int64_t i = 0; i < frames; ++i) {
    for (int c = 0; c < channels_out; ++c) {
      const int src_c = c < c_in ? c : c_in - 1;   // mono → dup to all chans
      const uint8_t* p = raw.data() + (size_t)((i * c_in + src_c) * bytes);
      float v = 0.0f;
      if (info.format == 3 && info.bits == 32) {
        memcpy(&v, p, 4);
      } else if (info.bits == 16) {
        int16_t s; memcpy(&s, p, 2);
        v = (float)s / 32768.0f;
      } else if (info.bits == 24) {
        int32_t s = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = (float)s / 8388608.0f;
      } else if (info.bits == 32) {
        int32_t s; memcpy(&s, p, 4);
        v = (float)((double)s / 2147483648.0);
      } else { return -6; }
      out[(size_t)c * frames_out + i] = v;
    }
  }
  return 0;
}

int juicy_wav_write_f32(const char* path, const float* audio,
                        int64_t frames, int32_t channels, int32_t sr) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_size = (uint32_t)(frames * channels * 4);
  const uint32_t riff = 4 + 8 + 16 + 8 + data_size;
  uint16_t fmt3 = 3, ch = (uint16_t)channels, bits = 32;
  uint32_t srate = (uint32_t)sr, brate = srate * channels * 4;
  uint16_t align = (uint16_t)(channels * 4);
  uint32_t sixteen = 16;
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f); fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f); fwrite(&sixteen, 4, 1, f);
  fwrite(&fmt3, 2, 1, f); fwrite(&ch, 2, 1, f); fwrite(&srate, 4, 1, f);
  fwrite(&brate, 4, 1, f); fwrite(&align, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&data_size, 4, 1, f);
  // planar [C][T] → interleaved
  std::vector<float> inter((size_t)(frames * channels));
  for (int64_t i = 0; i < frames; ++i)
    for (int c = 0; c < channels; ++c)
      inter[(size_t)(i * channels + c)] = audio[(size_t)c * frames + i];
  fwrite(inter.data(), 4, inter.size(), f);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Corpus loader: decode `n` files into a planar arena [B][C][T] (float32),
// zero-padded/truncated to T frames, mono duplicated to C channels.
// Returns number of files successfully decoded.
// ---------------------------------------------------------------------------

int juicy_load_corpus(const char** paths, int32_t n, float* arena,
                      int64_t frames, int32_t channels) {
  int ok = 0;
  const size_t clip_stride = (size_t)frames * channels;
  for (int i = 0; i < n; ++i) {
    if (juicy_wav_read(paths[i], arena + (size_t)i * clip_stride,
                       frames, channels) == 0)
      ++ok;
    else
      memset(arena + (size_t)i * clip_stride, 0, clip_stride * sizeof(float));
  }
  return ok;
}

// Threaded variant: files are independent, so workers pull indices off an
// atomic counter (no partitioning skew when file sizes vary). threads <= 0
// picks hardware_concurrency. Returns the number successfully decoded;
// failed slots are zeroed like the serial loader.
int juicy_load_corpus_mt(const char** paths, int32_t n, float* arena,
                         int64_t frames, int32_t channels, int32_t threads) {
  if (threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    threads = hc ? (int32_t)hc : 4;
  }
  if (threads > n) threads = n > 0 ? n : 1;
  if (threads <= 1) return juicy_load_corpus(paths, n, arena, frames, channels);
  std::atomic<int32_t> next(0), ok(0);
  const size_t clip_stride = (size_t)frames * channels;
  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n) return;
      if (juicy_wav_read(paths[i], arena + (size_t)i * clip_stride,
                         frames, channels) == 0)
        ok.fetch_add(1, std::memory_order_relaxed);
      else
        memset(arena + (size_t)i * clip_stride, 0,
               clip_stride * sizeof(float));
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

// Kernel-tile layout loader: decode + repack straight into the chain
// kernel's [nb, G, block*C*MSUB, 128] layout (kernels/chain_kernel.py:
// corpus_to_tiles — clip b = g*tile + m*128 + lane, tile row =
// (s*C + ch)*MSUB + m), so the device never pays the corpus transpose.
// `tiles` must hold nb*G*block*C*MSUB*128 floats for the TILE-padded batch
// (padding slots come out zero). Phase 1 decodes threaded into a planar
// scratch; phase 2 repacks threaded over (k, g) tiles — writes are
// sequential 512-byte rows, reads stream 16-samples-per-line across the
// tile's 128 clip buffers (the active read lines fit L2).
int juicy_load_corpus_tiles(const char** paths, int32_t n, float* tiles,
                            int64_t frames, int32_t channels, int32_t block,
                            int32_t tile, int32_t threads) {
  if (block <= 0 || frames % block || tile % 128) return -1;
  const int64_t nb = frames / block;
  const int32_t padded = (int32_t)(((int64_t)n + tile - 1) / tile * tile);
  const int32_t grid = padded / tile, msub = tile / 128;
  const int64_t rows = (int64_t)block * channels * msub;
  std::vector<float> planar((size_t)padded * channels * frames, 0.0f);
  const int ok = juicy_load_corpus_mt(paths, n, planar.data(), frames,
                                      channels, threads);
  if (threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    threads = hc ? (int32_t)hc : 4;
  }
  const int64_t n_items = nb * grid;
  if (threads > n_items) threads = (int32_t)(n_items > 0 ? n_items : 1);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t item = next.fetch_add(1, std::memory_order_relaxed);
      if (item >= n_items) return;
      const int64_t k = item / grid, g = item % grid;
      float* out = tiles + (size_t)(k * grid + g) * rows * 128;
      for (int32_t s = 0; s < block; ++s)
        for (int32_t ch = 0; ch < channels; ++ch)
          for (int32_t m = 0; m < msub; ++m) {
            float* row = out + ((size_t)(s * channels + ch) * msub + m) * 128;
            const float* src = planar.data() +
                ((size_t)(g * tile + m * 128) * channels + ch) * frames +
                k * block + s;
            const size_t clip_stride = (size_t)channels * frames;
            for (int32_t lane = 0; lane < 128; ++lane)
              row[lane] = src[(size_t)lane * clip_stride];
          }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC float ring buffer — the realtime host bridge primitive
// (the atomics thread-boundary of the reference, rebuilt as a block queue:
// an audio callback pushes blocks, the TPU feeder pops them).
// ---------------------------------------------------------------------------

struct JuicyRing {
  float* data;
  int64_t capacity;           // in floats, power of two
  std::atomic<int64_t> head;  // write position (producer)
  std::atomic<int64_t> tail;  // read position (consumer)
};

JuicyRing* juicy_ring_create(int64_t capacity) {
  int64_t cap = 1;
  while (cap < capacity) cap <<= 1;
  auto* r = new JuicyRing();
  r->data = new float[cap];
  r->capacity = cap;
  r->head.store(0);
  r->tail.store(0);
  return r;
}

void juicy_ring_destroy(JuicyRing* r) {
  delete[] r->data;
  delete r;
}

int64_t juicy_ring_readable(JuicyRing* r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

int juicy_ring_push(JuicyRing* r, const float* src, int64_t n) {
  const int64_t head = r->head.load(std::memory_order_relaxed);
  const int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail + n > r->capacity) return -1;   // full: realtime drop
  const int64_t mask = r->capacity - 1;
  for (int64_t i = 0; i < n; ++i) r->data[(head + i) & mask] = src[i];
  r->head.store(head + n, std::memory_order_release);
  return 0;
}

int juicy_ring_pop(JuicyRing* r, float* dst, int64_t n) {
  const int64_t tail = r->tail.load(std::memory_order_relaxed);
  const int64_t head = r->head.load(std::memory_order_acquire);
  if (head - tail < n) return -1;                 // not enough data
  const int64_t mask = r->capacity - 1;
  for (int64_t i = 0; i < n; ++i) dst[i] = r->data[(tail + i) & mask];
  r->tail.store(tail + n, std::memory_order_release);
  return 0;
}

// ---------------------------------------------------------------------------
// Native host shim — the audio-callback side of the ring protocol (the
// Standalone-format analog, reference CMakeLists.txt:34). Streams a WAV
// through a running bridge: pushes interleaved [N, C] input blocks into
// `in_ring` (paced at 1x when realtime != 0, like a host callback), pops
// rendered blocks from `out_ring`, and writes the result WAV. This proves
// end-to-end that a thin JUCE shim needs only juicy_ring_push/pop from its
// processBlock (runtime/host_bridge.py pumps the TPU side of the rings).
//
// Runs synchronously on the calling thread; Python callers invoke it from
// a worker thread (ctypes releases the GIL), so the exchange crosses a real
// native-thread boundary through the lock-free rings.
// ---------------------------------------------------------------------------

struct JuicyHostStats {
  int64_t blocks_pushed;
  int64_t blocks_popped;
  int64_t push_retries;      // input ring full (backpressure waits)
  double elapsed_s;
};

int juicy_host_stream(JuicyRing* in_ring, JuicyRing* out_ring,
                      const char* wav_path, const char* out_path,
                      int32_t channels, int32_t block, int32_t sr,
                      int32_t realtime, double timeout_s,
                      JuicyHostStats* stats) {
  using clock = std::chrono::steady_clock;
  WavInfo info;
  if (juicy_wav_info(wav_path, &info) != 0) return -1;
  const int64_t frames = info.frames;
  const int64_t nb = (frames + block - 1) / block;
  const int64_t padded = nb * block;
  std::vector<float> in_planar((size_t)(padded * channels), 0.0f);
  if (juicy_wav_read(wav_path, in_planar.data(), padded, channels) != 0)
    return -2;
  std::vector<float> out_planar((size_t)(padded * channels), 0.0f);
  std::vector<float> inter((size_t)block * channels);

  const int64_t blk_floats = (int64_t)block * channels;
  int64_t pushed = 0, popped = 0, retries = 0;
  const auto t0 = clock::now();
  const double block_s = (double)block / (double)sr;

  auto elapsed = [&]() {
    return std::chrono::duration<double>(clock::now() - t0).count();
  };
  auto pop_ready = [&]() {
    while (popped < pushed &&
           juicy_ring_readable(out_ring) >= blk_floats) {
      if (juicy_ring_pop(out_ring, inter.data(), blk_floats) != 0) break;
      float* dst = out_planar.data();
      const int64_t off = popped * block;
      for (int i = 0; i < block; ++i)
        for (int c = 0; c < channels; ++c)
          dst[(size_t)c * padded + off + i] = inter[(size_t)i * channels + c];
      ++popped;
    }
  };

  for (int64_t b = 0; b < nb; ++b) {
    if (realtime) {   // host-callback cadence: one block per block period
      const double target = (double)b * block_s;
      while (elapsed() < target)
        std::this_thread::sleep_for(std::chrono::microseconds(100));
    }
    // interleave [C][T] planar -> [N, C] frames
    const int64_t off = b * block;
    for (int i = 0; i < block; ++i)
      for (int c = 0; c < channels; ++c)
        inter[(size_t)i * channels + c] =
            in_planar[(size_t)c * padded + off + i];
    while (juicy_ring_push(in_ring, inter.data(), blk_floats) != 0) {
      ++retries;                       // backpressure: consumer behind
      if (elapsed() > timeout_s) return -3;
      std::this_thread::sleep_for(std::chrono::microseconds(200));
    }
    ++pushed;
    pop_ready();
  }
  while (popped < pushed) {            // drain the tail of the pipeline
    if (elapsed() > timeout_s) return -4;
    pop_ready();
    if (popped < pushed)
      std::this_thread::sleep_for(std::chrono::microseconds(200));
  }

  if (stats) {
    stats->blocks_pushed = pushed;
    stats->blocks_popped = popped;
    stats->push_retries = retries;
    stats->elapsed_s = elapsed();
  }
  if (out_path && out_path[0]) {
    // write only the original frame count (drop padding), planar layout —
    // but out_planar strides by `padded`, so compact first
    std::vector<float> trimmed((size_t)frames * channels);
    for (int c = 0; c < channels; ++c)
      memcpy(trimmed.data() + (size_t)c * frames,
             out_planar.data() + (size_t)c * padded,
             sizeof(float) * (size_t)frames);
    if (juicy_wav_write_f32(out_path, trimmed.data(), frames, channels,
                            sr) != 0)
      return -5;
  }
  return 0;
}

}  // extern "C"
