// pjrt_node — fully native serving node: framepipe ring -> PJRT executable.
//
// The end-to-end C++ replacement for the reference's intended
// tensorrt_ros node (yolo_ws/src/tensorrt_ros/src/tensorrt.cpp, a
// non-compiling sketch): a producer thread streams raw RGB frames into
// the lock-free ring (framepipe.cpp), the main loop pops letterboxed
// float32 batches and runs them through the StableHLO executable via the
// PJRT C API (pjrt_shim.cpp). No Python anywhere.
//
//   pjrt_node <plugin.so> <module.mlir> <frame_h> <frame_w>
//             <net_h> <net_w> <batch> <frames.raw> [max_batches]
//             [weights.bin] [dump_dir] [u8] [depth]
//
// depth (default 2): dispatch pipeline depth. With depth D the loop keeps
// up to D batches in flight (ps_execute_async) and harvests the oldest
// (ps_await_next) only when the FIFO is full — batch N's readback
// round-trips over the transport overlap batch N+1's upload + execute
// instead of serializing with them. depth 1 reproduces the synchronous
// dispatch-then-harvest loop.
//
// frames.raw: concatenated H*W*3 uint8 RGB frames (e.g. from
//   ffmpeg -i in.mp4 -f rawvideo -pix_fmt rgb24 frames.raw
//
// weights.bin (optional): trained model parameters passed as trailing
// executable arguments, uploaded to the device ONCE before the serving
// loop (the exported module keeps weights as arguments instead of
// constants so its StableHLO stays small). Format: "YTW1" magic,
// int32 n_tensors, then per tensor int32 ndims, int64 dims[ndims],
// int32 dtype (0=f32), raw data. Written by
// yolo_tpu/tools/pjrt_node_demo.py write_weights_bin.
//
// dump_dir (optional): every output of every batch is written to
// <dump_dir>/b<batch>_o<output>.bin (raw bytes) so a checker process can
// compare detections against the jax reference.
//
// Prints per-batch latency, then a one-line JSON summary separating the
// first (warm-up) batch from steady-state timing.
//
// Build: make -C native pjrt_node

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// framepipe C API (framepipe.cpp)
extern "C" {
void* fp_ring_create(int capacity, int h, int w);
void fp_ring_destroy(void* ring);
int fp_ring_pop_batch(void* ring, float* out, int batch, int out_h,
                      int out_w, float fill);
int fp_ring_pop_batch_u8(void* ring, uint8_t* out, int batch);
int fp_ring_size(void* ring);
int fp_ring_eos(void* ring);
int fp_start_raw_stream(void* ring, const char* path);
}

// pjrt_shim C API (pjrt_shim.cpp)
extern "C" {
void* ps_create(const char* plugin_path);
const char* ps_last_error(void* handle);
int ps_compile(void* handle, const char* code, size_t code_size);
int ps_upload(void* handle, const void* data, const int64_t* dims,
              int ndims, int type);
int ps_execute_async(void* handle, const void* const* args_data,
                     const int64_t* const* args_dims, const int* args_ndims,
                     const int* args_types, int n_args);
int ps_await_next(void* handle);
int ps_num_inflight(void* handle);
int ps_output_rank(void* handle, int i);
void ps_output_dims(void* handle, int i, int64_t* dims_out);
int64_t ps_output_nbytes(void* handle, int i);
void ps_output_read(void* handle, int i, void* dst);
void ps_last_timings(void* handle, double* out);
void ps_destroy(void* handle);
}

namespace {

// Load weights.bin and upload every tensor as a persistent device
// argument. Returns the tensor count, or -1 on error.
int upload_weights(void* eng, const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror("weights"); return -1; }
  char magic[4];
  int32_t n_tensors = 0;
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "YTW1", 4) != 0 ||
      fread(&n_tensors, 4, 1, f) != 1) {
    fprintf(stderr, "weights: bad header in %s\n", path);
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> data;
  for (int32_t t = 0; t < n_tensors; t++) {
    int32_t ndims = 0, dtype = 0;
    if (fread(&ndims, 4, 1, f) != 1 || ndims < 0 || ndims > 8) goto bad;
    {
      int64_t dims[8];
      if (ndims && fread(dims, 8, ndims, f) != static_cast<size_t>(ndims))
        goto bad;
      if (fread(&dtype, 4, 1, f) != 1) goto bad;
      size_t elems = 1;
      for (int i = 0; i < ndims; i++) elems *= static_cast<size_t>(dims[i]);
      const size_t esize = dtype == 2 ? 1 : dtype == 3 ? 2 : 4;
      data.resize(elems * esize);
      if (elems && fread(data.data(), 1, data.size(), f) != data.size())
        goto bad;
      if (ps_upload(eng, data.data(), dims, ndims, dtype) < 0) {
        fprintf(stderr, "weights: upload %d failed: %s\n", t,
                ps_last_error(eng));
        fclose(f);
        return -1;
      }
    }
    continue;
  bad:
    fprintf(stderr, "weights: truncated tensor %d in %s\n", t, path);
    fclose(f);
    return -1;
  }
  fclose(f);
  return n_tensors;
}

void dump_outputs(void* eng, const char* dir, int batch_idx, int n_out) {
  for (int i = 0; i < n_out; i++) {
    int64_t nbytes = ps_output_nbytes(eng, i);
    std::vector<uint8_t> out(static_cast<size_t>(nbytes));
    ps_output_read(eng, i, out.data());
    char path[4096];
    snprintf(path, sizeof(path), "%s/b%03d_o%d.bin", dir, batch_idx, i);
    FILE* f = fopen(path, "wb");
    if (!f) { perror(path); return; }
    fwrite(out.data(), 1, out.size(), f);
    fclose(f);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 9) {
    fprintf(stderr,
            "usage: %s <plugin.so> <module.mlir> <frame_h> <frame_w> "
            "<net_h> <net_w> <batch> <frames.raw> [max_batches] "
            "[weights.bin] [dump_dir]\n",
            argv[0]);
    return 2;
  }
  const char* plugin = argv[1];
  const char* module_path = argv[2];
  const int fh = atoi(argv[3]), fw = atoi(argv[4]);
  const int nh = atoi(argv[5]), nw = atoi(argv[6]);
  const int batch = atoi(argv[7]);
  const char* frames_path = argv[8];
  const int max_batches = argc > 9 ? atoi(argv[9]) : 0;
  const char* weights_path = argc > 10 && argv[10][0] ? argv[10] : nullptr;
  const char* dump_dir = argc > 11 && argv[11][0] ? argv[11] : nullptr;
  // "u8": stream raw uint8 frames and let the device program do the
  // letterbox + /255 normalize — 4x less H2D traffic than f32 batches.
  // "nv12": stream packed NV12 (fh*3/2 x fw bytes/frame, the camera-
  // native 4:2:0 format); the device program does BT.601 conversion +
  // letterbox — HALF the u8-RGB bytes on a bandwidth-bound transport.
  const bool nv12_input = argc > 12 && strcmp(argv[12], "nv12") == 0;
  const bool u8_input =
      nv12_input || (argc > 12 && strcmp(argv[12], "u8") == 0);
  int depth = argc > 13 ? atoi(argv[13]) : 2;
  if (depth < 1) depth = 1;

  // ---- load + compile the StableHLO module ----
  FILE* f = fopen(module_path, "rb");
  if (!f) { perror("module"); return 1; }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> code(n);
  if (fread(code.data(), 1, n, f) != static_cast<size_t>(n)) {
    perror("read module");
    return 1;
  }
  fclose(f);

  void* eng = ps_create(plugin);
  if (!eng) return 1;
  auto tc0 = std::chrono::steady_clock::now();
  if (ps_compile(eng, code.data(), code.size()) != 0) {
    fprintf(stderr, "compile: %s\n", ps_last_error(eng));
    return 1;
  }
  double compile_ms = std::chrono::duration<double, std::milli>(
                          std::chrono::steady_clock::now() - tc0)
                          .count();

  // ---- upload trained weights once (device-resident arguments) ----
  int n_weights = 0;
  double weights_ms = 0.0;
  if (weights_path) {
    auto tw0 = std::chrono::steady_clock::now();
    n_weights = upload_weights(eng, weights_path);
    if (n_weights < 0) return 1;
    weights_ms = std::chrono::duration<double, std::milli>(
                     std::chrono::steady_clock::now() - tw0)
                     .count();
    fprintf(stderr, "uploaded %d weight tensors in %.0f ms\n", n_weights,
            weights_ms);
  }

  // ---- stream frames through the ring ----
  // live runs (max_batches == 0) keep a small ring and drop stale
  // frames; bounded verification runs must hold every frame so the
  // dumped batches align with the checker's reference slices.
  const int capacity =
      max_batches > 0 ? max_batches * batch + batch : 4 * batch;
  // nv12 frames are fh*3/2 * fw bytes = 3 * (fh/2) * fw: a ring slot of
  // height fh/2 holds exactly one packed NV12 frame, so the ring and the
  // raw-stream reader work unchanged
  void* ring = fp_ring_create(capacity, nv12_input ? fh / 2 : fh, fw);
  fp_start_raw_stream(ring, frames_path);

  // depth host buffer slots: an async dispatch's host memory must stay
  // valid until its harvest (kImmutableUntilTransferCompletes h2d events
  // are awaited in ps_await_next), so each in-flight batch owns a slot
  // bytes of one streamed frame on the wire
  const size_t frame_bytes =
      nv12_input ? static_cast<size_t>(fh) * 3 / 2 * fw
                 : static_cast<size_t>(fh) * fw * 3;
  const size_t fbuf_sz = u8_input ? 0 : static_cast<size_t>(batch) * nh *
                                            nw * 3;
  const size_t ubuf_sz = u8_input ? static_cast<size_t>(batch) *
                                        frame_bytes : 0;
  std::vector<std::vector<float>> bufs(depth, std::vector<float>(fbuf_sz));
  std::vector<std::vector<uint8_t>> ubufs(depth,
                                          std::vector<uint8_t>(ubuf_sz));
  // nv12 rides rank-4 (B, fh/2, fw, 3) u8 — the same linear bytes as
  // the packed (B, fh*3/2, fw) planes, so the dims path stays the
  // proven u8 one. u8: (B, fh, fw, 3); f32: (B, nh, nw, 3)
  const int64_t dims[4] = {batch,
                           nv12_input ? fh / 2 : (u8_input ? fh : nh),
                           u8_input ? fw : nw, 3};
  const int64_t* dimp[1] = {dims};
  const int ndims[1] = {4};
  const int types[1] = {u8_input ? 2 : 0};  // u8 | f32

  int dispatched = 0, harvested = 0;
  int frames_served = 0;
  bool eos = false;
  double first_ms = 0.0;
  double stage_ms[3] = {0, 0, 0};        // steady-state h2d/exec/d2h sums
  auto t_start = std::chrono::steady_clock::now();
  auto t_first_done = t_start, t_last_done = t_start;

  auto harvest_one = [&]() -> bool {
    int n_out = ps_await_next(eng);
    if (n_out < 0) {
      fprintf(stderr, "await: %s\n", ps_last_error(eng));
      return false;
    }
    auto now = std::chrono::steady_clock::now();
    if (harvested == 0) {
      first_ms = std::chrono::duration<double, std::milli>(now - t_start)
                     .count();       // warm-up: dispatch + first execute
      t_first_done = now;
    } else {
      double t[3];
      ps_last_timings(eng, t);
      for (int k = 0; k < 3; k++) stage_ms[k] += t[k];
    }
    t_last_done = now;
    if (dump_dir) dump_outputs(eng, dump_dir, harvested, n_out);

    // print the first row of output 0 (car detection row)
    int rank = ps_output_rank(eng, 0);
    std::vector<int64_t> od(rank);
    ps_output_dims(eng, 0, od.data());
    int64_t cols = rank >= 2 ? od[rank - 1] : 1;
    std::vector<float> out(ps_output_nbytes(eng, 0) / sizeof(float));
    ps_output_read(eng, 0, out.data());
    printf("batch %d (inflight %d):", harvested + 1,
           ps_num_inflight(eng));
    for (int64_t c = 0; c < cols && c < 6; c++) printf(" %.4f", out[c]);
    printf("\n");
    harvested++;
    return true;
  };

  while (!eos && (max_batches == 0 || dispatched < max_batches)) {
    // accumulate a FULL batch unless the stream ended: padding on mere
    // producer lag would duplicate frames mid-stream and shift every
    // later batch against the verifier's reference
    const int slot = dispatched % depth;
    float* fslot = bufs[slot].data();
    uint8_t* uslot = ubufs[slot].data();
    int got = 0;
    while (got < batch) {
      int k = u8_input
                  ? fp_ring_pop_batch_u8(
                        ring, uslot + static_cast<size_t>(got) *
                                          frame_bytes,
                        batch - got)
                  : fp_ring_pop_batch(
                        ring, fslot + static_cast<size_t>(got) * nh * nw *
                                          3,
                        batch - got, nh, nw, 0.5f);
      got += k;
      if (got >= batch || fp_ring_eos(ring)) break;
      if (k == 0)
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    if (got == 0) break;               // eos and nothing left
    eos = fp_ring_eos(ring) && fp_ring_size(ring) == 0;
    frames_served += got;
    // partial TAIL batch (eos): repeat the last frame to keep the
    // shape static
    if (u8_input) {
      const size_t fsz = frame_bytes;
      for (int i = got; i < batch; i++)
        memcpy(uslot + i * fsz, uslot + (got - 1) * fsz, fsz);
    } else {
      const size_t fsz = static_cast<size_t>(nh) * nw * 3;
      for (int i = got; i < batch; i++)
        memcpy(fslot + i * fsz, fslot + (got - 1) * fsz,
               fsz * sizeof(float));
    }

    const void* data[1] = {u8_input ? static_cast<const void*>(uslot)
                                    : static_cast<const void*>(fslot)};
    if (ps_execute_async(eng, data, dimp, ndims, types, 1) < 0) {
      fprintf(stderr, "execute: %s\n", ps_last_error(eng));
      return 1;
    }
    dispatched++;
    // harvest only when the pipeline is full: the oldest batch's
    // readback overlaps the batches still executing behind it.
    // Exception: harvest batch 0 immediately — the shim caches output
    // metadata on the first harvest, and every batch dispatched BEFORE
    // that would miss the eager-d2h start (its readback would serialize
    // at harvest). Batch 0 is the excluded warm-up batch either way.
    if ((ps_num_inflight(eng) >= depth || harvested == 0) &&
        !harvest_one())
      return 1;
  }
  while (ps_num_inflight(eng) > 0)     // drain the tail of the pipeline
    if (!harvest_one()) return 1;

  const int batches = harvested;
  const int steady_batches = batches > 1 ? batches - 1 : 0;
  // pipelined throughput is wall-clock between harvests, NOT the sum of
  // per-call latencies (dispatch N+1 runs inside harvest N's window)
  const double steady_wall = std::chrono::duration<double, std::milli>(
                                 t_last_done - t_first_done)
                                 .count();
  const double steady_mean =
      steady_batches ? steady_wall / steady_batches : 0.0;
  const double denom = steady_batches ? steady_batches : 1;
  printf(
      "{\"batches\": %d, \"frames\": %d, \"compile_ms\": %.0f, "
      "\"weights_upload_ms\": %.0f, \"n_weight_tensors\": %d, "
      "\"pipeline_depth\": %d, "
      "\"first_batch_ms\": %.3f, \"steady_ms_per_batch\": %.3f, "
      "\"steady_fps\": %.1f, \"steady_h2d_ms\": %.3f, "
      "\"steady_exec_ms\": %.3f, \"steady_d2h_ms\": %.3f}\n",
      batches, frames_served, compile_ms, weights_ms, n_weights, depth,
      first_ms, steady_mean,
      steady_mean > 0 ? batch / (steady_mean / 1e3) : 0.0,
      stage_ms[0] / denom, stage_ms[1] / denom, stage_ms[2] / denom);

  fp_ring_destroy(ring);
  ps_destroy(eng);
  return 0;
}
