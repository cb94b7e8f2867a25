// framepipe — native frame-ingestion runtime for the TPU serving path.
//
// The reference's native layer was ROS/C++ glue around the GPU runtime
// (yolo_ws/src/*). The TPU-native equivalent is the host-side hot path
// that keeps a single Python process fed with ready-to-upload tensors:
//
//   * a lock-free single-producer/single-consumer ring buffer of frames
//     (replaces the hand-rolled two-thread busy-wait handoff of
//     car/video_node.py with a real wait-free structure),
//   * fused uint8-RGB -> float32 [0,1] conversion + centre letterbox onto
//     the stride-aligned network canvas (the per-frame CPU work that
//     python/numpy would otherwise do with several temporaries),
//   * a background producer thread streaming PPM/raw frames from a file
//     descriptor or directory (e.g. an ffmpeg pipe).
//
// Exposed as a C API for ctypes; no Python.h dependency.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Ring {
  int capacity;          // number of frame slots
  int frame_h, frame_w;  // producer-side frame geometry (RGB u8)
  size_t frame_bytes;
  std::vector<uint8_t> storage;
  std::atomic<uint64_t> head{0};  // next write index (producer)
  std::atomic<uint64_t> tail{0};  // next read index (consumer)
  std::atomic<uint64_t> dropped{0};
  std::atomic<bool> eos{false};
  std::thread producer;

  uint8_t* slot(uint64_t idx) {
    return storage.data() + (idx % capacity) * frame_bytes;
  }
};

inline float u8_to_unit(uint8_t v) { return v * (1.0f / 255.0f); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// ring buffer
// ---------------------------------------------------------------------
void* fp_ring_create(int capacity, int h, int w) {
  Ring* r = new Ring();
  r->capacity = capacity;
  r->frame_h = h;
  r->frame_w = w;
  r->frame_bytes = static_cast<size_t>(h) * w * 3;
  r->storage.resize(r->frame_bytes * capacity);
  return r;
}

void fp_ring_destroy(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  r->eos.store(true);
  if (r->producer.joinable()) r->producer.join();
  delete r;
}

// producer: push one RGB u8 frame; drops the oldest when full (a live
// video feed must never block the camera thread).
int fp_ring_push(void* ring, const uint8_t* rgb) {
  Ring* r = static_cast<Ring*>(ring);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= static_cast<uint64_t>(r->capacity)) {
    // full: advance tail (drop oldest)
    r->tail.compare_exchange_strong(tail, tail + 1,
                                    std::memory_order_acq_rel);
    r->dropped.fetch_add(1, std::memory_order_relaxed);
  }
  std::memcpy(r->slot(head), rgb, r->frame_bytes);
  r->head.store(head + 1, std::memory_order_release);
  return 1;
}

// consumer: pop up to `batch` frames, each letterboxed+normalised into
// out (batch, out_h, out_w, 3) float32. Returns frames written.
int fp_ring_pop_batch(void* ring, float* out, int batch, int out_h,
                      int out_w, float fill) {
  Ring* r = static_cast<Ring*>(ring);
  int got = 0;
  const int ih = r->frame_h, iw = r->frame_w;
  const int dy = (out_h - ih) / 2;
  const int dx = (out_w - iw) / 2;
  const size_t canvas = static_cast<size_t>(out_h) * out_w * 3;
  while (got < batch) {
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    if (tail >= r->head.load(std::memory_order_acquire)) break;
    const uint8_t* src = r->slot(tail);
    float* dst = out + got * canvas;
    // fill then paste (letterbox); when geometries match it's one pass
    if (dy == 0 && dx == 0 && ih == out_h && iw == out_w) {
      const size_t n = canvas;
      for (size_t i = 0; i < n; ++i) dst[i] = u8_to_unit(src[i]);
    } else {
      for (size_t i = 0; i < canvas; ++i) dst[i] = fill;
      for (int y = 0; y < ih; ++y) {
        int oy = y + dy;
        if (oy < 0 || oy >= out_h) continue;
        const uint8_t* srow = src + static_cast<size_t>(y) * iw * 3;
        float* drow = dst + (static_cast<size_t>(oy) * out_w +
                             (dx > 0 ? dx : 0)) * 3;
        int copy_w = iw;
        if (dx < 0) { srow += -dx * 3; copy_w += dx; }
        if (copy_w > out_w) copy_w = out_w;
        for (int i = 0; i < copy_w * 3; ++i) drow[i] = u8_to_unit(srow[i]);
      }
    }
    r->tail.store(tail + 1, std::memory_order_release);
    ++got;
  }
  return got;
}

// Raw u8 pop: frames leave the ring untouched; letterbox + /255
// normalize run on the accelerator instead (4x less host->device
// traffic than the f32 pop — the transfer is the serving bottleneck on
// tunneled transports).
int fp_ring_pop_batch_u8(void* ring, uint8_t* out, int batch) {
  Ring* r = static_cast<Ring*>(ring);
  int got = 0;
  while (got < batch) {
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    if (tail >= r->head.load(std::memory_order_acquire)) break;
    std::memcpy(out + static_cast<size_t>(got) * r->frame_bytes,
                r->slot(tail), r->frame_bytes);
    r->tail.store(tail + 1, std::memory_order_release);
    ++got;
  }
  return got;
}

uint64_t fp_ring_dropped(void* ring) {
  return static_cast<Ring*>(ring)->dropped.load();
}

int fp_ring_size(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  return static_cast<int>(r->head.load() - r->tail.load());
}

int fp_ring_eos(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  return (r->eos.load() && fp_ring_size(ring) == 0) ? 1 : 0;
}

// ---------------------------------------------------------------------
// producers
// ---------------------------------------------------------------------
namespace {

// minimal binary PPM (P6) reader; frames must match the ring geometry.
bool read_ppm(FILE* f, Ring* r, std::vector<uint8_t>& buf) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P6") != 0) return false;
  int w, h, maxv;
  if (fscanf(f, "%d %d %d", &w, &h, &maxv) != 3) return false;
  fgetc(f);  // single whitespace after header
  if (w != r->frame_w || h != r->frame_h || maxv != 255) return false;
  buf.resize(r->frame_bytes);
  return fread(buf.data(), 1, r->frame_bytes, f) == r->frame_bytes;
}

}  // namespace

// stream PPM frames from a file (or fifo fed by e.g.
//   ffmpeg -i in.mp4 -vf scale=WxH -f image2pipe -vcodec ppm -)
int fp_start_ppm_stream(void* ring, const char* path) {
  Ring* r = static_cast<Ring*>(ring);
  std::string p(path);
  r->producer = std::thread([r, p]() {
    FILE* f = fopen(p.c_str(), "rb");
    if (f) {
      std::vector<uint8_t> buf;
      while (!r->eos.load() && read_ppm(f, r, buf)) {
        fp_ring_push(r, buf.data());
      }
      fclose(f);
    }
    r->eos.store(true);
  });
  return 1;
}

// stream raw RGB24 frames of the ring geometry from a file/fifo.
int fp_start_raw_stream(void* ring, const char* path) {
  Ring* r = static_cast<Ring*>(ring);
  std::string p(path);
  r->producer = std::thread([r, p]() {
    FILE* f = fopen(p.c_str(), "rb");
    if (f) {
      std::vector<uint8_t> buf(r->frame_bytes);
      while (!r->eos.load() &&
             fread(buf.data(), 1, r->frame_bytes, f) == r->frame_bytes) {
        fp_ring_push(r, buf.data());
      }
      fclose(f);
    }
    r->eos.store(true);
  });
  return 1;
}

void fp_signal_eos(void* ring) {
  static_cast<Ring*>(ring)->eos.store(true);
}

// standalone letterbox+normalise for single frames (no ring)
void fp_letterbox(const uint8_t* rgb, int ih, int iw, float* out,
                  int oh, int ow, float fill) {
  const size_t canvas = static_cast<size_t>(oh) * ow * 3;
  for (size_t i = 0; i < canvas; ++i) out[i] = fill;
  const int dy = (oh - ih) / 2, dx = (ow - iw) / 2;
  for (int y = 0; y < ih; ++y) {
    int oy = y + dy;
    if (oy < 0 || oy >= oh) continue;
    const uint8_t* srow = rgb + static_cast<size_t>(y) * iw * 3;
    float* drow = out + (static_cast<size_t>(oy) * ow +
                         (dx > 0 ? dx : 0)) * 3;
    int copy_w = iw;
    if (dx < 0) { srow += -dx * 3; copy_w += dx; }
    if (copy_w > ow) copy_w = ow;
    for (int i = 0; i < copy_w * 3; ++i) drow[i] = u8_to_unit(srow[i]);
  }
}

}  // extern "C"
