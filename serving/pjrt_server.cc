// Native dynamic-batching serving loop with latency-SLO measurement.
//
// Role parity: the serving role of the reference's deployment demos
// (ref demo/TensorRT/cpp/yolox.cpp runs a fixed loop; real deployments sit
// behind a request queue). This binary is the TPU production pattern:
//
//   * a request generator produces Poisson arrivals at a target QPS
//     (each request = one image);
//   * a batcher thread collects up to --max-batch requests or waits at
//     most --max-wait-ms, then pads to the fixed compiled batch (static
//     XLA shapes!) and executes;
//   * per-request end-to-end latency (enqueue -> device completion) is
//     recorded and reported as p50/p95/p99 against an SLO.
//
// Build:   make -C serving pjrt_server
// Run:     ./serving/pjrt_server <plugin.so> <program.mlir> <options.pb> \
//              [batch h w] [qps] [duration_s] [max_wait_ms] [slo_ms]
//
// The exported program must take one (batch, h, w, 3) f32 input (decode+NMS
// inside the graph, tools/export_stablehlo.py --decode).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

#include "pjrt_util.h"

namespace {

using Clock = std::chrono::steady_clock;

struct Request {
  Clock::time_point enqueue;
};

struct Queue {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Request> items;
  bool closed = false;

  void Push(Request r) {
    {
      std::lock_guard<std::mutex> lock(mu);
      items.push_back(r);
    }
    cv.notify_one();
  }

  void Close() {
    {
      std::lock_guard<std::mutex> lock(mu);
      closed = true;
    }
    cv.notify_all();
  }

  // Pop up to max_n requests; waits up to max_wait for the FIRST request,
  // then up to max_wait after it for the batch to fill. Returns empty only
  // when closed and drained.
  std::vector<Request> PopBatch(size_t max_n,
                                std::chrono::milliseconds max_wait) {
    std::unique_lock<std::mutex> lock(mu);
    cv.wait(lock, [&] { return !items.empty() || closed; });
    if (items.empty()) return {};
    auto deadline = Clock::now() + max_wait;
    while (items.size() < max_n && !closed &&
           cv.wait_until(lock, deadline,
                         [&] { return items.size() >= max_n || closed; })) {
    }
    size_t n = std::min(items.size(), max_n);
    std::vector<Request> out(items.begin(), items.begin() + n);
    items.erase(items.begin(), items.begin() + n);
    return out;
  }
};

double Percentile(std::vector<double>& v, double p) {
  if (v.empty()) return 0.0;
  size_t k = static_cast<size_t>(p * (v.size() - 1));
  std::nth_element(v.begin(), v.begin() + k, v.end());
  return v[k];
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <program.mlir> <options.pb> "
                 "[batch h w] [qps] [duration_s] [max_wait_ms] [slo_ms]\n",
                 argv[0]);
    return 1;
  }
  const std::string program = pjrt_util::ReadFile(argv[2]);
  const std::string compile_options = pjrt_util::ReadFile(argv[3]);
  const int64_t batch = argc > 4 ? std::atol(argv[4]) : 16;
  const int64_t height = argc > 5 ? std::atol(argv[5]) : 832;
  const int64_t width = argc > 6 ? std::atol(argv[6]) : 832;
  const double qps = argc > 7 ? std::atof(argv[7]) : 500.0;
  const double duration_s = argc > 8 ? std::atof(argv[8]) : 20.0;
  const int max_wait_ms = argc > 9 ? std::atoi(argv[9]) : 10;
  const double slo_ms = argc > 10 ? std::atof(argv[10]) : 50.0;

  pjrt_util::LoadPlugin(argv[1]);
  PJRT_Client* client = pjrt_util::CreateClient("pjrt-server");
  PJRT_Device* device = pjrt_util::FirstDevice(client);

  auto t0 = Clock::now();
  PJRT_LoadedExecutable* exec =
      pjrt_util::Compile(client, program, compile_options);
  std::printf("compiled in %.1fs\n",
              std::chrono::duration<double>(Clock::now() - t0).count());
  const size_t num_outputs = pjrt_util::NumOutputs(exec);

  const PJRT_Api* api = pjrt_util::Api();

  // Pre-staged device input (the full fixed batch; partial batches reuse it
  // — a production server would H2D the real images into this slot).
  const int64_t dims[4] = {batch, height, width, 3};
  std::vector<float> host(static_cast<size_t>(batch) * height * width * 3,
                          114.0f);
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
  pjrt_util::AwaitEvent(bargs.done_with_host_buffer, "H2D");
  PJRT_Buffer* input = bargs.buffer;

  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  PJRT_Buffer** output_list = outputs.data();
  PJRT_Buffer* const arg_list_storage[1] = {input};
  PJRT_Buffer* const* arg_lists[1] = {arg_list_storage};
  PJRT_ExecuteOptions eopts;
  std::memset(&eopts, 0, sizeof(eopts));
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  auto execute_once = [&]() {
    for (auto*& b : outputs) b = nullptr;
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args eargs;
    std::memset(&eargs, 0, sizeof(eargs));
    eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    eargs.executable = exec;
    eargs.options = &eopts;
    eargs.argument_lists = arg_lists;
    eargs.num_devices = 1;
    eargs.num_args = 1;
    eargs.output_lists = &output_list;
    eargs.device_complete_events = &done;
    pjrt_util::Check(api->PJRT_LoadedExecutable_Execute(&eargs), "Execute");
    pjrt_util::AwaitEvent(done, "device completion");
    for (auto* b : outputs) pjrt_util::DestroyBuffer(b);
  };

  // warmup (outside the measured window)
  execute_once();
  execute_once();
  std::printf("serving: qps=%.0f duration=%.0fs batch<=%lld wait<=%dms "
              "slo=%.0fms\n",
              qps, duration_s, static_cast<long long>(batch), max_wait_ms,
              slo_ms);

  Queue queue;
  std::atomic<long> generated{0};

  std::thread producer([&] {
    std::mt19937_64 rng(42);
    std::exponential_distribution<double> gap(qps);
    auto end = Clock::now() + std::chrono::duration_cast<Clock::duration>(
                                  std::chrono::duration<double>(duration_s));
    while (Clock::now() < end) {
      queue.Push({Clock::now()});
      generated.fetch_add(1);
      std::this_thread::sleep_for(std::chrono::duration<double>(gap(rng)));
    }
    queue.Close();
  });

  std::vector<double> latencies_ms;
  std::vector<size_t> batch_sizes;
  auto serve_start = Clock::now();
  while (true) {
    auto reqs = queue.PopBatch(static_cast<size_t>(batch),
                               std::chrono::milliseconds(max_wait_ms));
    if (reqs.empty()) break;
    execute_once();
    auto done_at = Clock::now();
    for (const auto& r : reqs) {
      latencies_ms.push_back(
          std::chrono::duration<double, std::milli>(done_at - r.enqueue)
              .count());
    }
    batch_sizes.push_back(reqs.size());
  }
  producer.join();
  double wall = std::chrono::duration<double>(Clock::now() - serve_start)
                    .count();

  size_t n = latencies_ms.size();
  double mean_batch = 0.0;
  for (auto b : batch_sizes) mean_batch += static_cast<double>(b);
  mean_batch /= std::max<size_t>(batch_sizes.size(), 1);
  size_t violations = 0;
  for (double l : latencies_ms) violations += l > slo_ms;
  std::vector<double> v = latencies_ms;
  std::printf(
      "served %zu/%ld reqs in %.1fs (%.1f img/s), %zu batches "
      "(mean %.1f imgs)\n",
      n, generated.load(), wall, n / wall, batch_sizes.size(), mean_batch);
  std::printf(
      "latency ms: p50=%.2f p95=%.2f p99=%.2f max=%.2f | SLO %.0fms "
      "violations %.2f%%\n",
      Percentile(v, 0.50), Percentile(v, 0.95), Percentile(v, 0.99),
      v.empty() ? 0.0 : *std::max_element(v.begin(), v.end()), slo_ms,
      100.0 * violations / std::max<size_t>(n, 1));
  std::printf("ok\n");
  return 0;
}
