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
// For the request-level dynamic-batching loop see pjrt_server.cc.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "pjrt_util.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <program.mlir> <compile_options.pb> "
                 "[batch h w] [iters]\n",
                 argv[0]);
    return 1;
  }
  const std::string program = pjrt_util::ReadFile(argv[2]);
  const std::string compile_options = pjrt_util::ReadFile(argv[3]);
  const int64_t batch = argc > 4 ? std::atol(argv[4]) : 1;
  const int64_t height = argc > 5 ? std::atol(argv[5]) : 640;
  const int64_t width = argc > 6 ? std::atol(argv[6]) : 640;
  const int iters = argc > 7 ? std::atoi(argv[7]) : 20;

  pjrt_util::LoadPlugin(argv[1]);
  const PJRT_Api* api = pjrt_util::Api();
  PJRT_Client* client = pjrt_util::CreateClient("pjrt-runner");
  PJRT_Device* device = pjrt_util::FirstDevice(client);

  auto t0 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exec =
      pjrt_util::Compile(client, program, compile_options);
  auto t1 = std::chrono::steady_clock::now();
  std::printf("compiled in %.1fs\n",
              std::chrono::duration<double>(t1 - t0).count());

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
  pjrt_util::Check(api->PJRT_Client_BufferFromHostBuffer(&bargs),
                   "BufferFromHostBuffer");
  pjrt_util::AwaitEvent(bargs.done_with_host_buffer, "host buffer transfer");
  PJRT_Buffer* input = bargs.buffer;

  // ---- execute loop ----
  const size_t num_outputs = pjrt_util::NumOutputs(exec);
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
    pjrt_util::Check(api->PJRT_LoadedExecutable_Execute(&eargs), "Execute");
    pjrt_util::AwaitEvent(done, "device completion");
    auto e = std::chrono::steady_clock::now();
    if (it > 0) total_s += std::chrono::duration<double>(e - s).count();

    // free outputs except on the final iteration (kept for readback)
    if (it < iters) {
      for (auto* b : outputs) pjrt_util::DestroyBuffer(b);
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
    pjrt_util::Check(api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
    std::vector<uint8_t> out_host(th.dst_size);
    th.dst = out_host.data();
    pjrt_util::Check(api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
    pjrt_util::AwaitEvent(th.event, "D2H");
    std::printf("output[0]: %zu bytes; first floats:", out_host.size());
    const float* f = reinterpret_cast<const float*>(out_host.data());
    for (size_t i = 0; i < 4 && (i + 1) * 4 <= out_host.size(); ++i)
      std::printf(" %.3f", f[i]);
    std::printf("\n");
  }
  std::printf("ok\n");
  return 0;
}
