// pjrt_shim — native StableHLO serving runtime over the PJRT C API.
//
// The reference deployed through a C++ TensorRT ROS node
// (yolo_ws/src/tensorrt_ros/src/tensorrt.cpp — a non-compiling sketch);
// its working deployment path was Python MXNet executors. The TPU-native
// equivalent is this shim: it dlopens ANY PJRT plugin (libaxon_pjrt.so /
// libtpu.so / a CPU plugin), compiles the StableHLO module produced by
// yolo_tpu.serve.export, uploads raw frames, executes and reads back
// results — no Python in the serving loop.
//
// Exposed as a C API for ctypes (yolo_tpu/serve/native.py PjrtEngine) and
// as a standalone CLI (pjrt_shim_main.cpp) that chains the framepipe ring
// into the executable.
//
// Build: make -C native  (needs the PJRT C API header; see Makefile's
// PJRT_INC autodetection).

#include <dlfcn.h>
#include <ctime>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

// One dispatched-but-not-harvested execution. The serving loop keeps a
// short FIFO of these (ps_execute_async / ps_await_next): the device runs
// programs in order, so batch N's readback round-trips over the transport
// overlap batch N+1's upload + dispatch instead of serializing with them.
struct Inflight {
  std::vector<PJRT_Buffer*> inputs;   // streamed args (freed at harvest)
  std::vector<PJRT_Event*> h2d_events;
  std::vector<PJRT_Buffer*> outputs;
  PJRT_Event* done = nullptr;
  double t_dispatch_ms = 0;           // host time spent in dispatch
  // eager readback: d2h transfers STARTED at dispatch time (once output
  // metadata is cached), so the ~1 transport-RTT readback latencies of
  // the whole in-flight window ride concurrently instead of one full
  // round-trip per harvest — the round-3/4 86 ms/batch d2h wall
  bool d2h_started = false;
  std::vector<std::vector<uint8_t>> host_data;
  std::vector<PJRT_Event*> d2h_events;
  std::vector<std::vector<int64_t>> m2ms;  // layout storage, outlives call
};

struct Shim {
  void* dso = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  size_t num_outputs = 0;
  // device-resident arguments uploaded once (model weights); appended
  // after the streamed arguments on every execute
  std::vector<PJRT_Buffer*> persistent;
  // last-execution outputs (host copies)
  std::vector<std::vector<int64_t>> out_dims;
  std::vector<int> out_types;
  std::vector<std::vector<uint8_t>> out_data;
  // static per-output metadata, captured on the first harvest and reused:
  // dims / element type / host byte size never change for a compiled
  // program, and re-querying them cost 3 transport round-trips per
  // output per batch on the remote axon plugin
  bool meta_cached = false;
  std::vector<int64_t> cached_nbytes;
  std::string last_error;
  std::vector<Inflight> inflight;     // FIFO, oldest first
  // per-stage wall times of the last harvested execute (ms)
  double t_h2d_ms = 0, t_exec_ms = 0, t_d2h_ms = 0;
  // start d2h at dispatch (default); PS_EAGER_D2H=0 restores the
  // harvest-time readback for debugging
  bool eager_d2h = true;
};

double now_ms() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1e3 + ts.tv_nsec * 1e-6;
}

PJRT_Buffer_Type to_pjrt_type(int t) {
  switch (t) {
    case 1: return PJRT_Buffer_Type_S32;
    case 2: return PJRT_Buffer_Type_U8;
    case 3: return PJRT_Buffer_Type_BF16;
    default: return PJRT_Buffer_Type_F32;
  }
}

bool check(Shim* s, PJRT_Error* err, const char* what) {
  if (err == nullptr) return true;
  PJRT_Error_Message_Args m;
  memset(&m, 0, sizeof(m));
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  s->api->PJRT_Error_Message(&m);
  s->last_error = std::string(what) + ": " +
                  std::string(m.message, m.message_size);
  PJRT_Error_Destroy_Args d;
  memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  s->api->PJRT_Error_Destroy(&d);
  return false;
}

bool await_event(Shim* s, PJRT_Event* ev, const char* what) {
  if (ev == nullptr) return true;
  PJRT_Event_Await_Args aw;
  memset(&aw, 0, sizeof(aw));
  aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aw.event = ev;
  bool ok = check(s, s->api->PJRT_Event_Await(&aw), what);
  PJRT_Event_Destroy_Args ed;
  memset(&ed, 0, sizeof(ed));
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.event = ev;
  s->api->PJRT_Event_Destroy(&ed);
  return ok;
}

// Minimal hand-encoded xla.CompileOptionsProto (the C API takes the
// serialized proto; we avoid a protobuf dependency):
//   executable_build_options (field 3) {
//     device_ordinal: -1 (field 1), num_replicas: 1 (field 4),
//     num_partitions: 1 (field 5) }
std::string default_compile_options() {
  std::string ebo;
  ebo.push_back('\x08');                      // field 1, varint
  for (int i = 0; i < 9; i++) ebo.push_back('\xff');   // -1 as int64
  ebo.push_back('\x01');
  ebo.push_back('\x20');                      // field 4, varint
  ebo.push_back('\x01');                      // num_replicas = 1
  ebo.push_back('\x28');                      // field 5, varint
  ebo.push_back('\x01');                      // num_partitions = 1
  std::string out;
  out.push_back('\x1a');                      // field 3, length-delimited
  out.push_back(static_cast<char>(ebo.size()));
  out += ebo;
  return out;
}

// Parse PJRT_CREATE_OPTIONS ("key=i:123;key=s:text;key=b:1") into
// NamedValues — some plugins (e.g. the axon TPU transport) require
// session/topology options at client creation.
struct CreateOptions {
  std::vector<std::string> keys;    // stable storage for name pointers
  std::vector<std::string> strs;
  std::vector<PJRT_NamedValue> values;
};

void parse_create_options(CreateOptions* out) {
  const char* env = getenv("PJRT_CREATE_OPTIONS");
  if (!env || !*env) return;
  std::string s(env);
  size_t pos = 0;
  // two passes not needed if storage is reserved up front
  size_t n_items = 1;
  for (char c : s) n_items += (c == ';');
  out->keys.reserve(n_items);
  out->strs.reserve(n_items);
  while (pos < s.size()) {
    size_t end = s.find(';', pos);
    if (end == std::string::npos) end = s.size();
    std::string item = s.substr(pos, end - pos);
    pos = end + 1;
    size_t eq = item.find('=');
    if (eq == std::string::npos || eq + 2 >= item.size() ||
        item[eq + 2] != ':')
      continue;
    out->keys.push_back(item.substr(0, eq));
    char kind = item[eq + 1];
    std::string val = item.substr(eq + 3);

    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = out->keys.back().c_str();
    nv.name_size = out->keys.back().size();
    if (kind == 'i') {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = atoll(val.c_str());
      nv.value_size = 1;
    } else if (kind == 'b') {
      nv.type = PJRT_NamedValue_kBool;
      nv.bool_value = val == "1" || val == "true";
      nv.value_size = 1;
    } else {  // 's'
      out->strs.push_back(val);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = out->strs.back().c_str();
      nv.value_size = out->strs.back().size();
    }
    out->values.push_back(nv);
  }
}

}  // namespace

extern "C" {

// Create a client from a PJRT plugin shared object. Returns nullptr on
// failure (use ps_last_error on a zeroed Shim not possible then; the error
// goes to stderr).
void* ps_create(const char* plugin_path) {
  Shim* s = new Shim();
  const char* eager = getenv("PS_EAGER_D2H");
  if (eager && *eager) s->eager_d2h = atoi(eager) != 0;
  s->dso = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!s->dso) {
    fprintf(stderr, "pjrt_shim: dlopen(%s): %s\n", plugin_path, dlerror());
    delete s;
    return nullptr;
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(s->dso, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "pjrt_shim: no GetPjrtApi in %s\n", plugin_path);
    delete s;
    return nullptr;
  }
  s->api = get_api();

  PJRT_Plugin_Initialize_Args init;
  memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  if (!check(s, s->api->PJRT_Plugin_Initialize(&init), "plugin_init")) {
    fprintf(stderr, "pjrt_shim: %s\n", s->last_error.c_str());
    delete s;
    return nullptr;
  }

  CreateOptions opts;
  parse_create_options(&opts);
  PJRT_Client_Create_Args cc;
  memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts.values.empty() ? nullptr : opts.values.data();
  cc.num_options = opts.values.size();
  if (!check(s, s->api->PJRT_Client_Create(&cc), "client_create")) {
    fprintf(stderr, "pjrt_shim: %s\n", s->last_error.c_str());
    delete s;
    return nullptr;
  }
  s->client = cc.client;

  PJRT_Client_AddressableDevices_Args ad;
  memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = s->client;
  if (!check(s, s->api->PJRT_Client_AddressableDevices(&ad), "devices") ||
      ad.num_addressable_devices == 0) {
    fprintf(stderr, "pjrt_shim: no addressable devices\n");
    delete s;
    return nullptr;
  }
  s->device = ad.addressable_devices[0];
  return s;
}

const char* ps_last_error(void* handle) {
  return static_cast<Shim*>(handle)->last_error.c_str();
}

// Compile StableHLO (MLIR bytecode or text). Returns 0 on success.
// May be called again to swap programs on one client (e.g. the
// transport-probe tool); cached output metadata is per-program and
// must be invalidated or the next harvest reads stale sizes.
int ps_compile(void* handle, const char* code, size_t code_size) {
  Shim* s = static_cast<Shim*>(handle);
  s->meta_cached = false;
  s->out_dims.clear();
  s->out_types.clear();
  s->cached_nbytes.clear();
  PJRT_Program prog;
  memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = const_cast<char*>(code);
  prog.code_size = code_size;
  static const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;

  std::string opts = default_compile_options();
  PJRT_Client_Compile_Args c;
  memset(&c, 0, sizeof(c));
  c.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  c.client = s->client;
  c.program = &prog;
  c.compile_options = opts.data();
  c.compile_options_size = opts.size();
  if (!check(s, s->api->PJRT_Client_Compile(&c), "compile")) return 1;
  s->exec = c.executable;

  PJRT_LoadedExecutable_GetExecutable_Args ge;
  memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = s->exec;
  if (!check(s, s->api->PJRT_LoadedExecutable_GetExecutable(&ge),
             "get_executable"))
    return 1;
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  if (!check(s, s->api->PJRT_Executable_NumOutputs(&no), "num_outputs"))
    return 1;
  s->num_outputs = no.num_outputs;
  return 0;
}

// Upload a dense array as a persistent device-resident argument (model
// weights: transferred once, appended after the streamed args on every
// ps_execute). types: 0 = f32, 1 = s32, 2 = u8, 3 = bf16. Returns the
// persistent index, or -1.
int ps_upload(void* handle, const void* data, const int64_t* dims,
              int ndims, int type) {
  Shim* s = static_cast<Shim*>(handle);
  PJRT_Client_BufferFromHostBuffer_Args b;
  memset(&b, 0, sizeof(b));
  b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  b.client = s->client;
  b.data = data;
  b.type = to_pjrt_type(type);
  b.dims = dims;
  b.num_dims = static_cast<size_t>(ndims);
  b.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  b.device = s->device;
  if (!check(s, s->api->PJRT_Client_BufferFromHostBuffer(&b), "upload"))
    return -1;
  if (!await_event(s, b.done_with_host_buffer, "upload_event")) return -1;
  s->persistent.push_back(b.buffer);
  return static_cast<int>(s->persistent.size()) - 1;
}

int ps_num_persistent(void* handle) {
  return static_cast<int>(static_cast<Shim*>(handle)->persistent.size());
}

namespace {

void destroy_buf(Shim* s, PJRT_Buffer* buf) {
  if (!buf) return;
  PJRT_Buffer_Destroy_Args d;
  memset(&d, 0, sizeof(d));
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = buf;
  s->api->PJRT_Buffer_Destroy(&d);
}

void drop_inflight(Shim* s, Inflight* fl) {
  for (auto* ev : fl->h2d_events) await_event(s, ev, "h2d_drop");
  for (auto* buf : fl->inputs) destroy_buf(s, buf);
  if (fl->done) await_event(s, fl->done, "done_drop");
  // eagerly-started readbacks must complete before their host buffers
  // (fl->host_data) and device buffers can be released
  for (auto* ev : fl->d2h_events) await_event(s, ev, "d2h_drop");
  for (auto* buf : fl->outputs) destroy_buf(s, buf);
  fl->h2d_events.clear();
  fl->d2h_events.clear();
  fl->inputs.clear();
  fl->outputs.clear();
  fl->done = nullptr;
}

// Enqueue the device->host copy of every output of ``fl`` into
// fl->host_data using the CACHED per-output sizes (valid only once
// meta_cached). PJRT allows ToHostBuffer right after Execute returns —
// the copy completes when the producing computation does — so calling
// this at dispatch time lets the readback round-trips of the whole
// in-flight window overlap instead of paying one transport RTT per
// harvest. Returns false (with last_error set) if any start fails.
bool start_d2h(Shim* s, Inflight* fl) {
  fl->host_data.resize(s->num_outputs);
  fl->d2h_events.assign(s->num_outputs, nullptr);
  fl->m2ms.resize(s->num_outputs);
  for (size_t i = 0; i < s->num_outputs; i++) {
    // dense row-major host layout, same rationale as the harvest path:
    // tile-less Tiled with minor_to_major = [rank-1, ..., 0]
    std::vector<int64_t>& m2m = fl->m2ms[i];
    m2m.resize(s->out_dims[i].size());
    for (size_t k = 0; k < m2m.size(); k++)
      m2m[k] = static_cast<int64_t>(m2m.size() - 1 - k);
    PJRT_Buffer_MemoryLayout layout;
    memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = m2m.data();
    layout.tiled.minor_to_major_size = m2m.size();
    layout.tiled.tile_dims = nullptr;
    layout.tiled.tile_dim_sizes = nullptr;
    layout.tiled.num_tiles = 0;

    fl->host_data[i].resize(static_cast<size_t>(s->cached_nbytes[i]));
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = fl->outputs[i];
    th.host_layout = &layout;
    th.dst = fl->host_data[i].data();
    th.dst_size = fl->host_data[i].size();
    if (!check(s, s->api->PJRT_Buffer_ToHostBuffer(&th), "d2h_eager"))
      return false;
    fl->d2h_events[i] = th.event;
  }
  fl->d2h_started = true;
  return true;
}

}  // namespace

// Dispatch one execution WITHOUT waiting for results: upload the streamed
// args, enqueue the program, push the pending outputs on the in-flight
// FIFO. The caller's args_data buffers must stay valid until the matching
// ps_await_next (h2d uses kImmutableUntilTransferCompletes and the
// transfer-done events are only awaited at harvest). types[i]: 0 = f32,
// 1 = s32, 2 = u8, 3 = bf16. Returns the in-flight depth, or -1.
int ps_execute_async(void* handle, const void* const* args_data,
                     const int64_t* const* args_dims, const int* args_ndims,
                     const int* args_types, int n_args) {
  Shim* s = static_cast<Shim*>(handle);
  Inflight fl;
  fl.inputs.assign(n_args, nullptr);

  double t0 = now_ms();
  for (int i = 0; i < n_args; i++) {
    PJRT_Client_BufferFromHostBuffer_Args b;
    memset(&b, 0, sizeof(b));
    b.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    b.client = s->client;
    b.data = args_data[i];
    b.type = to_pjrt_type(args_types[i]);
    b.dims = args_dims[i];
    b.num_dims = static_cast<size_t>(args_ndims[i]);
    b.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    b.device = s->device;
    if (!check(s, s->api->PJRT_Client_BufferFromHostBuffer(&b), "h2d")) {
      drop_inflight(s, &fl);
      return -1;
    }
    fl.inputs[i] = b.buffer;
    // do NOT await done_with_host_buffer here: the wait is a transport
    // round-trip that can ride along with the execute dispatch
    if (b.done_with_host_buffer)
      fl.h2d_events.push_back(b.done_with_host_buffer);
  }

  // full argument list: streamed args then persistent weights
  std::vector<PJRT_Buffer*> all_args(fl.inputs);
  all_args.insert(all_args.end(), s->persistent.begin(),
                  s->persistent.end());

  fl.outputs.assign(s->num_outputs, nullptr);
  PJRT_Buffer** out_list = fl.outputs.data();
  PJRT_Buffer* const* arg_list = all_args.data();

  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_LoadedExecutable_Execute_Args ex;
  memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = s->exec;
  ex.options = &opts;
  ex.argument_lists = &arg_list;
  ex.num_devices = 1;
  ex.num_args = all_args.size();
  ex.output_lists = &out_list;
  ex.device_complete_events = &fl.done;
  ex.execute_device = s->device;
  if (!check(s, s->api->PJRT_LoadedExecutable_Execute(&ex), "execute")) {
    drop_inflight(s, &fl);
    return -1;
  }
  // once output metadata is known (first harvest), start the readback
  // NOW: depth-D in-flight batches then have D readbacks riding the
  // transport concurrently instead of one blocking RTT per harvest
  if (s->eager_d2h && s->meta_cached && !start_d2h(s, &fl)) {
    drop_inflight(s, &fl);
    return -1;
  }
  fl.t_dispatch_ms = now_ms() - t0;
  s->inflight.push_back(std::move(fl));
  return static_cast<int>(s->inflight.size());
}

// Harvest the OLDEST in-flight execution: await its completion, read all
// outputs back (one overlapped wave of transfers, static metadata cached
// after the first batch), free its buffers. Returns the number of
// outputs readable via ps_output_*, or -1.
int ps_await_next(void* handle) {
  Shim* s = static_cast<Shim*>(handle);
  if (s->inflight.empty()) {
    s->last_error = "await: nothing in flight";
    return -1;
  }
  Inflight fl = std::move(s->inflight.front());
  s->inflight.erase(s->inflight.begin());
  s->t_h2d_ms = fl.t_dispatch_ms;

  double t1 = now_ms();
  bool ok = true;
  for (auto* ev : fl.h2d_events) ok &= await_event(s, ev, "h2d_event");
  fl.h2d_events.clear();
  if (ok) ok = await_event(s, fl.done, "execute_event");
  fl.done = nullptr;
  for (auto* buf : fl.inputs) destroy_buf(s, buf);
  fl.inputs.clear();
  double t2 = now_ms();
  s->t_exec_ms = t2 - t1;
  if (!ok) {
    for (auto* ev : fl.d2h_events) await_event(s, ev, "d2h_drop");
    for (auto* buf : fl.outputs) destroy_buf(s, buf);
    return -1;
  }

  // ---- eager path: the readback was started at dispatch time ----
  // Just await the copy events (long since in flight — typically already
  // complete once the pipeline is full) and adopt the host buffers.
  if (fl.d2h_started) {
    bool d2h_ok = true;
    for (auto* ev : fl.d2h_events) {
      if (!await_event(s, ev, "d2h_event")) d2h_ok = false;
    }
    fl.d2h_events.clear();
    for (auto* buf : fl.outputs) destroy_buf(s, buf);
    fl.outputs.clear();
    if (!d2h_ok) return -1;
    s->out_data = std::move(fl.host_data);
    s->t_d2h_ms = now_ms() - t2;
    return static_cast<int>(s->num_outputs);
  }

  // ---- static output metadata: query once, reuse forever ----
  // Dimensions / ElementType / host-copy byte size are fixed by the
  // compiled program; on the remote axon transport each query is a full
  // round-trip, so re-asking every batch tripled the readback latency.
  if (!s->meta_cached) {
    s->out_dims.assign(s->num_outputs, {});
    s->out_types.assign(s->num_outputs, -1);
    s->cached_nbytes.assign(s->num_outputs, 0);
    for (size_t i = 0; i < s->num_outputs; i++) {
      PJRT_Buffer* buf = fl.outputs[i];
      PJRT_Buffer_Dimensions_Args dd;
      memset(&dd, 0, sizeof(dd));
      dd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      dd.buffer = buf;
      if (!check(s, s->api->PJRT_Buffer_Dimensions(&dd), "dims")) {
        for (auto* b2 : fl.outputs) destroy_buf(s, b2);
        return -1;
      }
      s->out_dims[i].assign(dd.dims, dd.dims + dd.num_dims);

      PJRT_Buffer_ElementType_Args et;
      memset(&et, 0, sizeof(et));
      et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      et.buffer = buf;
      if (!check(s, s->api->PJRT_Buffer_ElementType(&et), "etype")) {
        for (auto* b2 : fl.outputs) destroy_buf(s, b2);
        return -1;
      }
      s->out_types[i] = static_cast<int>(et.type);
    }
  }

  // request an explicit dense row-major host layout: with host_layout
  // null PJRT copies in the SOURCE buffer's layout, and the TPU
  // compiler is free to pick a permuted/tiled layout per output —
  // which scrambled e.g. the (B, 4, 2) corners and the 5-D head maps
  // while same-layout outputs compared exact (the
  // reports/pjrt_roundtrip.json ok=false signature). The axon plugin
  // rejects Strides host layouts ("only dense minor_to_major layouts
  // are handled"), matching jaxlib's ToLiteral path which always
  // passes Tiled — so express row-major as a tile-less Tiled layout
  // with minor_to_major = [rank-1, ..., 0].
  //
  // All transfers are STARTED first and the events awaited afterwards:
  // N sequential await round-trips collapse into one wave in flight at
  // once (the d2h bottleneck was latency, not bytes — the serving
  // outputs total a few KB).
  s->out_data.resize(s->num_outputs);
  std::vector<PJRT_Event*> d2h_events(s->num_outputs, nullptr);
  std::vector<std::vector<int64_t>> m2ms(s->num_outputs);
  bool started_ok = true;
  for (size_t i = 0; i < s->num_outputs && started_ok; i++) {
    PJRT_Buffer* buf = fl.outputs[i];
    m2ms[i].resize(s->out_dims[i].size());
    for (size_t k = 0; k < m2ms[i].size(); k++)
      m2ms[i][k] = static_cast<int64_t>(m2ms[i].size() - 1 - k);
    PJRT_Buffer_MemoryLayout layout;
    memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
    layout.tiled.minor_to_major = m2ms[i].data();
    layout.tiled.minor_to_major_size = m2ms[i].size();
    layout.tiled.tile_dims = nullptr;
    layout.tiled.tile_dim_sizes = nullptr;
    layout.tiled.num_tiles = 0;

    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = buf;
    th.host_layout = &layout;
    if (!s->meta_cached) {
      th.dst = nullptr;              // size query (first batch only)
      if (!check(s, s->api->PJRT_Buffer_ToHostBuffer(&th), "d2h_size")) {
        started_ok = false;
        break;
      }
      s->cached_nbytes[i] = static_cast<int64_t>(th.dst_size);
    }
    s->out_data[i].resize(static_cast<size_t>(s->cached_nbytes[i]));
    th.dst = s->out_data[i].data();
    th.dst_size = static_cast<size_t>(s->cached_nbytes[i]);
    if (!check(s, s->api->PJRT_Buffer_ToHostBuffer(&th), "d2h")) {
      started_ok = false;
      break;
    }
    d2h_events[i] = th.event;
  }
  for (size_t i = 0; i < s->num_outputs; i++) {
    if (!await_event(s, d2h_events[i], "d2h_event")) started_ok = false;
    destroy_buf(s, fl.outputs[i]);
  }
  fl.outputs.clear();
  if (!started_ok) return -1;
  s->meta_cached = true;
  s->t_d2h_ms = now_ms() - t2;
  return static_cast<int>(s->num_outputs);
}

int ps_num_inflight(void* handle) {
  return static_cast<int>(static_cast<Shim*>(handle)->inflight.size());
}

// Synchronous execute (dispatch + harvest): the original API, kept for
// the roundtrip tool and PjrtEngine; single-batch callers still gain the
// cached-metadata + overlapped-readback path.
int ps_execute(void* handle, const void* const* args_data,
               const int64_t* const* args_dims, const int* args_ndims,
               const int* args_types, int n_args) {
  if (ps_execute_async(handle, args_data, args_dims, args_ndims,
                       args_types, n_args) < 0)
    return -1;
  return ps_await_next(handle);
}

// Per-stage wall times of the last ps_execute: out[0..2] = h2d ms,
// execute ms (incl. completion wait), d2h ms.
void ps_last_timings(void* handle, double* out) {
  Shim* s = static_cast<Shim*>(handle);
  out[0] = s->t_h2d_ms;
  out[1] = s->t_exec_ms;
  out[2] = s->t_d2h_ms;
}

int ps_output_rank(void* handle, int i) {
  Shim* s = static_cast<Shim*>(handle);
  return static_cast<int>(s->out_dims[i].size());
}

void ps_output_dims(void* handle, int i, int64_t* dims_out) {
  Shim* s = static_cast<Shim*>(handle);
  memcpy(dims_out, s->out_dims[i].data(),
         s->out_dims[i].size() * sizeof(int64_t));
}

// PJRT_Buffer_Type enum value of output i (11 == F32, 13 == BF16 in
// the v0.x enum; the Python side maps via _PJRT_TYPE_NP).
int ps_output_type(void* handle, int i) {
  return static_cast<Shim*>(handle)->out_types[i];
}

int64_t ps_output_nbytes(void* handle, int i) {
  return static_cast<int64_t>(
      static_cast<Shim*>(handle)->out_data[i].size());
}

void ps_output_read(void* handle, int i, void* dst) {
  Shim* s = static_cast<Shim*>(handle);
  memcpy(dst, s->out_data[i].data(), s->out_data[i].size());
}

void ps_destroy(void* handle) {
  Shim* s = static_cast<Shim*>(handle);
  for (auto& fl : s->inflight) drop_inflight(s, &fl);
  s->inflight.clear();
  for (auto* buf : s->persistent) {
    PJRT_Buffer_Destroy_Args d;
    memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = buf;
    s->api->PJRT_Buffer_Destroy(&d);
  }
  if (s->exec) {
    PJRT_LoadedExecutable_Destroy_Args d;
    memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    d.executable = s->exec;
    s->api->PJRT_LoadedExecutable_Destroy(&d);
  }
  if (s->client) {
    PJRT_Client_Destroy_Args d;
    memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    d.client = s->client;
    s->api->PJRT_Client_Destroy(&d);
  }
  // NOTE: we leak the dlopened plugin on purpose — PJRT plugins do not
  // support re-initialisation after dlclose in one process.
  delete s;
}

}  // extern "C"
