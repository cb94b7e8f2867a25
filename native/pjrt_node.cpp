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
//
// frames.raw: concatenated H*W*3 uint8 RGB frames (e.g. from
//   ffmpeg -i in.mp4 -f rawvideo -pix_fmt rgb24 frames.raw
// Prints per-batch latency and the first row of the first output, then a
// one-line JSON summary.
//
// Build: make -C native pjrt_node

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

// framepipe C API (framepipe.cpp)
extern "C" {
void* fp_ring_create(int capacity, int h, int w);
void fp_ring_destroy(void* ring);
int fp_ring_pop_batch(void* ring, float* out, int batch, int out_h,
                      int out_w, float fill);
int fp_ring_size(void* ring);
int fp_ring_eos(void* ring);
int fp_start_raw_stream(void* ring, const char* path);
}

// pjrt_shim C API (pjrt_shim.cpp)
extern "C" {
void* ps_create(const char* plugin_path);
const char* ps_last_error(void* handle);
int ps_compile(void* handle, const char* code, size_t code_size);
int ps_execute(void* handle, const void* const* args_data,
               const int64_t* const* args_dims, const int* args_ndims,
               const int* args_types, int n_args);
int ps_output_rank(void* handle, int i);
void ps_output_dims(void* handle, int i, int64_t* dims_out);
int64_t ps_output_nbytes(void* handle, int i);
void ps_output_read(void* handle, int i, void* dst);
void ps_destroy(void* handle);
}

int main(int argc, char** argv) {
  if (argc < 9) {
    fprintf(stderr,
            "usage: %s <plugin.so> <module.mlir> <frame_h> <frame_w> "
            "<net_h> <net_w> <batch> <frames.raw> [max_batches]\n",
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
  if (ps_compile(eng, code.data(), code.size()) != 0) {
    fprintf(stderr, "compile: %s\n", ps_last_error(eng));
    return 1;
  }

  // ---- stream frames through the ring ----
  void* ring = fp_ring_create(4 * batch, fh, fw);
  fp_start_raw_stream(ring, frames_path);

  std::vector<float> buf(static_cast<size_t>(batch) * nh * nw * 3);
  const int64_t dims[4] = {batch, nh, nw, 3};
  const void* data[1] = {buf.data()};
  const int64_t* dimp[1] = {dims};
  const int ndims[1] = {4};
  const int types[1] = {0};  // f32

  int batches = 0;
  double total_ms = 0.0;
  while (max_batches == 0 || batches < max_batches) {
    int got = fp_ring_pop_batch(ring, buf.data(), batch, nh, nw, 0.5f);
    if (got == 0) {
      if (fp_ring_eos(ring)) break;
      std::this_thread::sleep_for(std::chrono::milliseconds(1));
      continue;
    }
    // partial tail batch: repeat the last frame to keep the shape static
    const size_t fsz = static_cast<size_t>(nh) * nw * 3;
    for (int i = got; i < batch; i++)
      memcpy(buf.data() + i * fsz, buf.data() + (got - 1) * fsz,
             fsz * sizeof(float));

    auto t0 = std::chrono::steady_clock::now();
    int n_out = ps_execute(eng, data, dimp, ndims, types, 1);
    if (n_out < 0) {
      fprintf(stderr, "execute: %s\n", ps_last_error(eng));
      return 1;
    }
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    total_ms += ms;
    batches++;

    // print the first row of output 0 (car detection row)
    int rank = ps_output_rank(eng, 0);
    std::vector<int64_t> od(rank);
    ps_output_dims(eng, 0, od.data());
    int64_t cols = rank >= 2 ? od[rank - 1] : 1;
    std::vector<float> out(ps_output_nbytes(eng, 0) / sizeof(float));
    ps_output_read(eng, 0, out.data());
    printf("batch %d (%d frames, %.2f ms):", batches, got, ms);
    for (int64_t c = 0; c < cols && c < 6; c++) printf(" %.4f", out[c]);
    printf("\n");
  }

  printf("{\"batches\": %d, \"frames\": %d, \"mean_ms_per_batch\": %.3f, "
         "\"fps\": %.1f}\n",
         batches, batches * batch,
         batches ? total_ms / batches : 0.0,
         total_ms > 0 ? batches * batch / (total_ms / 1e3) : 0.0);

  fp_ring_destroy(ring);
  ps_destroy(eng);
  return 0;
}
