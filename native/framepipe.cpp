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
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <fcntl.h>
#include <poll.h>
#include <string>
#include <thread>
#include <unistd.h>
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
    // full: drop THIS frame. Reclaiming the oldest slot instead would
    // overwrite the exact slot the consumer may be mid-read on (pop
    // converts from slot(tail) BEFORE advancing tail) — a torn frame.
    // The camera thread still never blocks; the consumer frees a whole
    // batch of slots at a time, so the ring drains within one pop.
    r->dropped.fetch_add(1, std::memory_order_relaxed);
    return 0;
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

// Non-blocking reads with a 200 ms poll so a producer blocked on a
// stalled FIFO writer re-checks eos and destroy()'s join cannot hang
// the process. `seen_data` distinguishes "FIFO writer not connected
// yet" (read()==0 before any byte: wait) from true EOF.
bool read_n(int fd, uint8_t* dst, size_t n, Ring* r, bool& seen_data) {
  size_t off = 0;
  while (off < n && !r->eos.load()) {
    ssize_t k = read(fd, dst + off, n - off);
    if (k > 0) {
      off += static_cast<size_t>(k);
      seen_data = true;
      continue;
    }
    if (k == 0 && !seen_data) {      // FIFO with no writer yet
      struct pollfd p = {fd, POLLIN, 0};
      poll(&p, 1, 200);
      continue;
    }
    if (k < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      struct pollfd p = {fd, POLLIN, 0};
      poll(&p, 1, 200);
      continue;
    }
    return false;                    // EOF or hard error
  }
  return off == n;
}

// minimal binary PPM (P6) reader over read_n; frames must match the
// ring geometry. Header = "P6" ws <w> ws <h> ws <maxv> single-ws.
bool read_ppm(int fd, Ring* r, std::vector<uint8_t>& buf,
              bool& seen_data) {
  auto next_tok = [&](char* out, size_t cap) -> bool {
    size_t i = 0;
    uint8_t c;
    // skip leading whitespace
    do {
      if (!read_n(fd, &c, 1, r, seen_data)) return false;
    } while (c == ' ' || c == '\t' || c == '\r' || c == '\n');
    while (!(c == ' ' || c == '\t' || c == '\r' || c == '\n')) {
      if (i + 1 < cap) out[i++] = static_cast<char>(c);
      if (!read_n(fd, &c, 1, r, seen_data)) break;
    }
    out[i] = 0;
    return i > 0;
  };
  char tok[16];
  if (!next_tok(tok, sizeof tok) || strcmp(tok, "P6") != 0) return false;
  int vals[3];
  for (int i = 0; i < 3; ++i) {
    if (!next_tok(tok, sizeof tok)) return false;
    vals[i] = atoi(tok);
  }
  // next_tok consumed exactly the single whitespace after maxval
  if (vals[0] != r->frame_w || vals[1] != r->frame_h || vals[2] != 255)
    return false;
  buf.resize(r->frame_bytes);
  return read_n(fd, buf.data(), r->frame_bytes, r, seen_data);
}

int open_stream(const char* path) {
  return open(path, O_RDONLY | O_NONBLOCK);
}

}  // namespace

// stream PPM frames from a file (or fifo fed by e.g.
//   ffmpeg -i in.mp4 -vf scale=WxH -f image2pipe -vcodec ppm -)
int fp_start_ppm_stream(void* ring, const char* path) {
  Ring* r = static_cast<Ring*>(ring);
  if (r->producer.joinable()) return 0;  // second start would terminate()
  std::string p(path);
  r->producer = std::thread([r, p]() {
    int fd = open_stream(p.c_str());
    if (fd >= 0) {
      std::vector<uint8_t> buf;
      bool seen = false;
      while (!r->eos.load() && read_ppm(fd, r, buf, seen)) {
        fp_ring_push(r, buf.data());
      }
      close(fd);
    }
    r->eos.store(true);
  });
  return 1;
}

// stream raw RGB24 frames of the ring geometry from a file/fifo.
int fp_start_raw_stream(void* ring, const char* path) {
  Ring* r = static_cast<Ring*>(ring);
  if (r->producer.joinable()) return 0;  // second start would terminate()
  std::string p(path);
  r->producer = std::thread([r, p]() {
    int fd = open_stream(p.c_str());
    if (fd >= 0) {
      std::vector<uint8_t> buf(r->frame_bytes);
      bool seen = false;
      while (!r->eos.load() &&
             read_n(fd, buf.data(), r->frame_bytes, r, seen)) {
        fp_ring_push(r, buf.data());
      }
      close(fd);
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
