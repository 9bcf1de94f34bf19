// Native serving runner on the PJRT C API — a COMPLETE standalone
// detector, same scope as the reference's TensorRT demo.
//
// Role parity: ref demo/TensorRT/cpp/yolox.cpp — engine deserialize +
// static_resize letterbox (:38-48) + doInference + draw_objects
// (:166-208).  The TPU equivalent loads a PJRT plugin (.so), compiles a
// StableHLO module exported by tools/export_stablehlo.py --mlir --decode,
// letterboxes a real image on the host (the SAME native kernel the python
// loaders use, layers/fast_preproc/src/preproc.cpp), executes, reads back
// the NMSResult tensors, rescales boxes to original-image coordinates,
// prints them, and draws them into an output image.  Decode+NMS live
// INSIDE the compiled graph, so the C++ side carries no model math.
//
// Build:   make -C serving          (uses the TF-bundled pjrt_c_api.h)
// Timing:  ./serving/pjrt_runner <plugin.so> <program.mlir> \
//              <compile_options.pb> [batch h w] [iters]
// Detect:  ./serving/pjrt_runner <plugin.so> <program.mlir> <opts.pb> \
//              1 640 640 1 --image dog.ppm --out det.ppm [--conf 0.25]
//
// Without --image the input is synthetic (114-filled letterbox gray) and
// the binary is a pure timing harness.  For the request-level
// dynamic-batching loop see pjrt_server.cc.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "image_io.h"
#include "pjrt_util.h"

// layers/fast_preproc/src/preproc.cpp (linked in by the Makefile): the
// same ratio-preserving top-left-anchored letterbox the python harness
// uses.  Returns the resize ratio.
extern "C" float letterbox_u8(const uint8_t* src, int src_h, int src_w,
                              float* dst, int out_h, int out_w, float fill,
                              int num_threads);

// --selftest <in.ppm> <out.ppm>: drive every host-side stage (PPM read,
// BGR swap, native letterbox, box rescale, draw, PPM write) without a
// PJRT plugin — the CI smoke for this binary (no CPU PJRT plugin ships in
// this image; the PJRT path itself is run-verified on the v5e, see
// README).  Fabricates two detections and draws them.
static int SelfTest(const char* in_path, const char* out_path) {
  image_io::Image img;
  if (!image_io::ReadPPM(in_path, &img)) {
    std::fprintf(stderr, "selftest: cannot read %s\n", in_path);
    return 1;
  }
  const int out_h = 640, out_w = 640;
  std::vector<uint8_t> bgr(img.rgb.size());
  for (size_t i = 0; i < bgr.size(); i += 3) {
    bgr[i] = img.rgb[i + 2];
    bgr[i + 1] = img.rgb[i + 1];
    bgr[i + 2] = img.rgb[i];
  }
  std::vector<float> canvas(static_cast<size_t>(out_h) * out_w * 3);
  const float ratio = letterbox_u8(bgr.data(), img.h, img.w, canvas.data(),
                                   out_h, out_w, 114.0f, 2);
  if (!(ratio > 0.0f)) {
    std::fprintf(stderr, "selftest: bad letterbox ratio\n");
    return 1;
  }
  // fabricated letterbox-space detections -> original coords -> draw
  const float fake[2][6] = {// x0, y0, x1, y1, score, cls
                            {40, 40, 300, 300, 0.91f, 17},
                            {200, 120, 500, 400, 0.55f, 3}};
  for (const float* d : {fake[0], fake[1]}) {
    uint8_t r, g, b;
    image_io::ClassColor(static_cast<int>(d[5]), &r, &g, &b);
    image_io::DrawRect(&img, static_cast<int>(d[0] / ratio),
                       static_cast<int>(d[1] / ratio),
                       static_cast<int>(d[2] / ratio),
                       static_cast<int>(d[3] / ratio), r, g, b);
    char label[32];
    std::snprintf(label, sizeof(label), "%d %.2f", static_cast<int>(d[5]),
                  d[4]);
    image_io::DrawText(&img, static_cast<int>(d[0] / ratio) + 3,
                       static_cast<int>(d[1] / ratio) + 3, label, r, g, b);
    std::printf("det cls=%d score=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n",
                static_cast<int>(d[5]), d[4], d[0] / ratio, d[1] / ratio,
                d[2] / ratio, d[3] / ratio);
  }
  if (!image_io::WritePPM(out_path, img)) {
    std::fprintf(stderr, "selftest: cannot write %s\n", out_path);
    return 1;
  }
  // PermuteToRowMajor: rebuild the observed TPU boxes layout — logical
  // (B, det, 4) stored physically (B, 4, det), i.e. minor_to_major
  // {1, 2, 0} — and check the permute inverts it exactly.
  {
    const std::vector<int64_t> dims = {2, 3, 4};
    const std::vector<int64_t> m2m = {1, 2, 0};
    std::vector<float> logical(24);
    for (size_t i = 0; i < logical.size(); ++i)
      logical[i] = static_cast<float>(i);
    // physical element order: major->minor = dim0, dim2, dim1
    std::vector<float> physical;
    for (int64_t b = 0; b < dims[0]; ++b)
      for (int64_t c = 0; c < dims[2]; ++c)
        for (int64_t d = 0; d < dims[1]; ++d)
          physical.push_back(logical[(b * dims[1] + d) * dims[2] + c]);
    const std::vector<float> back =
        pjrt_util::PermuteToRowMajor(physical, dims, m2m);
    if (back != logical) {
      std::fprintf(stderr, "selftest: PermuteToRowMajor mismatch\n");
      return 1;
    }
  }
  std::printf("selftest ok: %s (%dx%d, ratio %.4f) -> %s\n", in_path, img.w,
              img.h, ratio, out_path);
  return 0;
}

int main(int argc, char** argv) {
  if (argc == 4 && !std::strcmp(argv[1], "--selftest"))
    return SelfTest(argv[2], argv[3]);
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <program.mlir> <compile_options.pb> "
                 "[batch h w] [iters] [--image in.ppm] [--out out.ppm] "
                 "[--conf 0.25]\n",
                 argv[0]);
    return 1;
  }
  const char* image_path = nullptr;
  const char* out_path = nullptr;
  float conf_thr = 0.25f;
  std::vector<char*> pos;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--image") && i + 1 < argc) {
      image_path = argv[++i];
    } else if (!std::strcmp(argv[i], "--out") && i + 1 < argc) {
      out_path = argv[++i];
    } else if (!std::strcmp(argv[i], "--conf") && i + 1 < argc) {
      conf_thr = std::atof(argv[++i]);
    } else {
      pos.push_back(argv[i]);
    }
  }
  if (pos.size() < 3) {
    std::fprintf(stderr, "need <plugin.so> <program.mlir> <opts.pb>\n");
    return 1;
  }
  const std::string program = pjrt_util::ReadFile(pos[1]);
  const std::string compile_options = pjrt_util::ReadFile(pos[2]);
  const int64_t batch = pos.size() > 3 ? std::atol(pos[3]) : 1;
  const int64_t height = pos.size() > 4 ? std::atol(pos[4]) : 640;
  const int64_t width = pos.size() > 5 ? std::atol(pos[5]) : 640;
  const int iters = pos.size() > 6 ? std::atoi(pos[6]) : 20;

  pjrt_util::LoadPlugin(pos[0]);
  const PJRT_Api* api = pjrt_util::Api();
  PJRT_Client* client = pjrt_util::CreateClient("pjrt-runner");
  PJRT_Device* device = pjrt_util::FirstDevice(client);

  auto t0 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exec =
      pjrt_util::Compile(client, program, compile_options);
  auto t1 = std::chrono::steady_clock::now();
  std::printf("compiled in %.1fs\n",
              std::chrono::duration<double>(t1 - t0).count());

  // ---- input buffer: (batch, h, w, 3) f32, 114-filled; slot 0 carries
  // the letterboxed --image when given ----
  const int64_t dims[4] = {batch, height, width, 3};
  std::vector<float> host(batch * height * width * 3, 114.0f);

  image_io::Image orig;
  float ratio = 1.0f;
  if (image_path) {
    if (!image_io::ReadPPM(image_path, &orig)) {
      std::fprintf(stderr, "cannot read PPM %s\n", image_path);
      return 1;
    }
    // model convention is BGR (the harness feeds cv2-order buffers)
    std::vector<uint8_t> bgr(orig.rgb.size());
    for (size_t i = 0; i < bgr.size(); i += 3) {
      bgr[i] = orig.rgb[i + 2];
      bgr[i + 1] = orig.rgb[i + 1];
      bgr[i + 2] = orig.rgb[i];
    }
    ratio = letterbox_u8(bgr.data(), orig.h, orig.w, host.data(),
                         static_cast<int>(height), static_cast<int>(width),
                         114.0f, 4);
    std::printf("image %s: %dx%d, letterbox ratio %.4f\n", image_path,
                orig.w, orig.h, ratio);
  }

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
    // The completion event can fire before the device actually ran the
    // program (tunnel/async dispatch — see ROADMAP "TIMING GOTCHA"); a
    // host readback of one small output is the only trustworthy barrier.
    // Read element 0 of the LAST output regardless of signature (ADVICE
    // r4: the old >=5-output condition left non-decode exports timed by
    // AwaitEvent alone — untrustworthy numbers).  The last output is the
    // smallest readback for decode exports (valid mask) and correct for
    // any export shape.
    if (num_outputs >= 1 && outputs[num_outputs - 1]) {
      volatile float sink =
          pjrt_util::ReadBufferAsFloat(outputs[num_outputs - 1])[0];
      (void)sink;
    }
    auto e = std::chrono::steady_clock::now();
    if (it > 0) total_s += std::chrono::duration<double>(e - s).count();

    // free outputs except on the final iteration (kept for readback)
    if (it < iters) {
      for (auto* b : outputs) pjrt_util::DestroyBuffer(b);
    }
  }
  std::printf("avg exec+readback: %.3f ms (%.1f img/s)\n",
              1e3 * total_s / iters, batch * iters / total_s);

  // ---- read back detections ----
  // A --decode export returns the NMSResult pytree in field order:
  // boxes (B, max_det, 4) xyxy, scores (B, max_det), classes (B, max_det)
  // s32, obj (B, max_det), valid (B, max_det) pred (ops/nms.py NMSResult).
  if (num_outputs == 5 && outputs[0]) {
    const std::vector<int64_t> bdims = pjrt_util::BufferDims(outputs[0]);
    const int64_t max_det = bdims.size() == 3 ? bdims[1] : 0;
    // Logical (row-major) readback: the TPU lays (B, max_det, 4) out
    // transposed (max_det on the 128-lane minor dim) — see
    // pjrt_util::ReadBufferAsFloatLogical.
    const std::vector<float> boxes =
        pjrt_util::ReadBufferAsFloatLogical(outputs[0]);
    const std::vector<float> scores =
        pjrt_util::ReadBufferAsFloatLogical(outputs[1]);
    const std::vector<float> classes =
        pjrt_util::ReadBufferAsFloatLogical(outputs[2]);
    const std::vector<float> valid =
        pjrt_util::ReadBufferAsFloatLogical(outputs[4]);

    int n_det = 0;
    for (int64_t k = 0; k < max_det; ++k) {  // batch slot 0
      if (valid[k] < 0.5f || scores[k] < conf_thr) continue;
      ++n_det;
      // boxes come out in letterbox coords; map back to the original image
      const float x0 = boxes[k * 4 + 0] / ratio;
      const float y0 = boxes[k * 4 + 1] / ratio;
      const float x1 = boxes[k * 4 + 2] / ratio;
      const float y1 = boxes[k * 4 + 3] / ratio;
      const int cls = static_cast<int>(classes[k]);
      std::printf("det cls=%d score=%.3f box=[%.1f, %.1f, %.1f, %.1f]\n",
                  cls, scores[k], x0, y0, x1, y1);
      if (image_path) {
        uint8_t r, g, b;
        image_io::ClassColor(cls, &r, &g, &b);
        image_io::DrawRect(&orig, static_cast<int>(x0),
                           static_cast<int>(y0), static_cast<int>(x1),
                           static_cast<int>(y1), r, g, b);
        char label[32];
        std::snprintf(label, sizeof(label), "%d %.2f", cls, scores[k]);
        image_io::DrawText(&orig, static_cast<int>(x0) + 3,
                           static_cast<int>(y0) + 3, label, r, g, b);
      }
    }
    std::printf("%d detection(s) >= conf %.3f\n", n_det, conf_thr);
    if (image_path && out_path) {
      if (!image_io::WritePPM(out_path, orig)) {
        std::fprintf(stderr, "cannot write %s\n", out_path);
        return 1;
      }
      std::printf("wrote %s\n", out_path);
    }
  } else if (num_outputs > 0 && outputs[0]) {
    // raw-maps export: keep the probe print
    const std::vector<float> f = pjrt_util::ReadBufferAsFloat(outputs[0]);
    std::printf("output[0]: %zu floats; first:", f.size());
    for (size_t i = 0; i < 4 && i < f.size(); ++i)
      std::printf(" %.3f", f[i]);
    std::printf("\n");
  }
  std::printf("ok\n");
  return 0;
}
