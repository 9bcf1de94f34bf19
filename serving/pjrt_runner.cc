// Native serving runner on the PJRT C API.
//
// Role parity: ref demo/TensorRT/cpp/yolox.cpp (engine deserialize +
// doInference loop) — the TPU equivalent loads a PJRT plugin (.so), compiles
// a StableHLO module exported by tools/export_stablehlo.py --mlir, feeds a
// float32 NHWC image buffer, executes, and reads back the output tensors.
// Decode+NMS live inside the compiled graph (exported with --decode), so the
// C++ side is pure runtime: no model code, no postprocess math.
//
// Build:   make -C serving          (uses the TF-bundled pjrt_c_api.h)
// Run:     ./serving/pjrt_runner <plugin.so> <program.mlir> \
//              <compile_options.pb> [batch height width] [iters]
//
// The input is synthetic (114-filled letterbox gray) — this binary is the
// runtime harness; production wiring feeds camera/decoder buffers instead.

#include <dlfcn.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

std::string ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot read %s\n", path);
    std::exit(1);
  }
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "%s failed: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

void AwaitEvent(PJRT_Event* event, const char* what) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  Check(g_api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  g_api->PJRT_Event_Destroy(&dargs);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <program.mlir> <compile_options.pb> "
                 "[batch h w] [iters]\n",
                 argv[0]);
    return 1;
  }
  const char* plugin_path = argv[1];
  const std::string program = ReadFile(argv[2]);
  const std::string compile_options = ReadFile(argv[3]);
  const int64_t batch = argc > 4 ? std::atol(argv[4]) : 1;
  const int64_t height = argc > 5 ? std::atol(argv[5]) : 640;
  const int64_t width = argc > 6 ? std::atol(argv[6]) : 640;
  const int iters = argc > 7 ? std::atoi(argv[7]) : 20;

  // ---- load plugin ----
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen(%s): %s\n", plugin_path, dlerror());
    return 1;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found: %s\n", dlerror());
    return 1;
  }
  g_api = get_api();
  std::printf("PJRT api version %d.%d\n",
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init_args;
  std::memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&init_args), "Plugin_Initialize");

  // ---- create client ----
  // Option set mirroring the python-side registration for the axon
  // plugin's pool/remote-compile mode (axon.register.pjrt): topology,
  // session_id, remote_compile, rank sentinel. Harmless extras are
  // ignored by plugins that don't know them.
  auto str_opt = [](const char* name, const char* value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kString;
    v.string_value = value;
    v.value_size = std::strlen(value);
    return v;
  };
  auto int_opt = [](const char* name, int64_t value) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kInt64;
    v.int64_value = value;
    v.value_size = 1;
    return v;
  };
  const char* topology = std::getenv("PALLAS_AXON_TPU_GEN")
                             ? "v5e:1x1x1"
                             : "v5e:1x1x1";
  char session_id[64];
  std::snprintf(session_id, sizeof(session_id), "pjrt-runner-%d",
                static_cast<int>(getpid()));
  std::vector<PJRT_NamedValue> opts_v = {
      int_opt("remote_compile", 1),
      int_opt("local_only", 0),
      int_opt("priority", 0),
      str_opt("topology", topology),
      int_opt("n_slices", 1),
      str_opt("session_id", session_id),
      int_opt("rank", static_cast<int64_t>(0xFFFFFFFFll)),
  };

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = opts_v.data();
  cargs.num_options = opts_v.size();
  Check(g_api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_PlatformName_Args pargs;
  std::memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = client;
  Check(g_api->PJRT_Client_PlatformName(&pargs), "PlatformName");
  std::printf("platform: %.*s\n", static_cast<int>(pargs.platform_name_size),
              pargs.platform_name);

  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dargs), "AddressableDevices");
  std::printf("%zu addressable device(s)\n", dargs.num_addressable_devices);
  PJRT_Device* device = dargs.addressable_devices[0];

  // ---- compile ----
  PJRT_Program prog;
  std::memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = const_cast<char*>(program.data());
  prog.code_size = program.size();
  static const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &prog;
  comp.compile_options = compile_options.data();
  comp.compile_options_size = compile_options.size();
  auto t0 = std::chrono::steady_clock::now();
  Check(g_api->PJRT_Client_Compile(&comp), "Client_Compile");
  auto t1 = std::chrono::steady_clock::now();
  std::printf("compiled in %.1fs\n",
              std::chrono::duration<double>(t1 - t0).count());
  PJRT_LoadedExecutable* exec = comp.executable;

  // ---- input buffer: (batch, h, w, 3) f32, 114-filled ----
  const int64_t dims[4] = {batch, height, width, 3};
  std::vector<float> host(batch * height * width * 3, 114.0f);

  PJRT_Client_BufferFromHostBuffer_Args bargs;
  std::memset(&bargs, 0, sizeof(bargs));
  bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bargs.client = client;
  bargs.data = host.data();
  bargs.type = PJRT_Buffer_Type_F32;
  bargs.dims = dims;
  bargs.num_dims = 4;
  bargs.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bargs.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&bargs),
        "BufferFromHostBuffer");
  AwaitEvent(bargs.done_with_host_buffer, "host buffer transfer");
  PJRT_Buffer* input = bargs.buffer;

  // ---- execute loop ----
  PJRT_Executable_NumOutputs_Args noargs;
  std::memset(&noargs, 0, sizeof(noargs));
  noargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  {
    // LoadedExecutable -> Executable for metadata
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    std::memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
    noargs.executable = ge.executable;
    Check(g_api->PJRT_Executable_NumOutputs(&noargs), "NumOutputs");
  }
  const size_t num_outputs = noargs.num_outputs;
  std::printf("%zu output tensor(s)\n", num_outputs);

  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer* const arg_list_storage[1] = {input};
  PJRT_Buffer* const* arg_lists[1] = {arg_list_storage};

  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  double total_s = 0.0;
  for (int it = 0; it < iters + 1; ++it) {  // first iter = warmup
    for (auto*& b : outputs) b = nullptr;
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    eargs.executable = exec;
    eargs.options = &opts;
    eargs.argument_lists = arg_lists;
    eargs.num_devices = 1;
    eargs.num_args = 1;
    eargs.output_lists = &output_list;
    eargs.device_complete_events = &done;

    auto s = std::chrono::steady_clock::now();
    Check(g_api->PJRT_LoadedExecutable_Execute(&eargs), "Execute");
    AwaitEvent(done, "device completion");
    auto e = std::chrono::steady_clock::now();
    if (it > 0) total_s += std::chrono::duration<double>(e - s).count();

    // free outputs except on the final iteration (kept for readback)
    if (it < iters) {
      for (auto* b : outputs) {
        if (!b) continue;
        PJRT_Buffer_Destroy_Args bd;
        std::memset(&bd, 0, sizeof(bd));
        bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        bd.buffer = b;
        Check(g_api->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
      }
    }
  }
  std::printf("avg exec: %.3f ms (%.1f img/s)\n", 1e3 * total_s / iters,
              batch * iters / total_s);

  // ---- read back first output ----
  if (num_outputs > 0 && outputs[0]) {
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outputs[0];
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
    std::vector<uint8_t> out_host(th.dst_size);
    th.dst = out_host.data();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
    AwaitEvent(th.event, "D2H");
    std::printf("output[0]: %zu bytes; first floats:", out_host.size());
    const float* f = reinterpret_cast<const float*>(out_host.data());
    for (size_t i = 0; i < 4 && (i + 1) * 4 <= out_host.size(); ++i)
      std::printf(" %.3f", f[i]);
    std::printf("\n");
  }
  std::printf("ok\n");
  return 0;
}
