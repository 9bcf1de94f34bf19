// Shared PJRT C-API boilerplate for the native serving binaries
// (pjrt_runner.cc one-shot benchmark, pjrt_server.cc batching server).
//
// Role parity: the engine-handling half of ref demo/TensorRT/cpp/yolox.cpp
// (deserialize + context setup) — on TPU this is plugin load, client
// creation, StableHLO compile.

#ifndef COCODET_SERVING_PJRT_UTIL_H_
#define COCODET_SERVING_PJRT_UTIL_H_

#include <dlfcn.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace pjrt_util {

inline const PJRT_Api*& Api() {
  static const PJRT_Api* api = nullptr;
  return api;
}

inline std::string ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot read %s\n", path);
    std::exit(1);
  }
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

inline void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  Api()->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "%s failed: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  Api()->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

inline void AwaitEvent(PJRT_Event* event, const char* what) {
  if (event == nullptr) return;
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  Check(Api()->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  Api()->PJRT_Event_Destroy(&dargs);
}

inline void LoadPlugin(const char* plugin_path) {
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen(%s): %s\n", plugin_path, dlerror());
    std::exit(1);
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found: %s\n", dlerror());
    std::exit(1);
  }
  Api() = get_api();
  std::printf("PJRT api version %d.%d\n",
              Api()->pjrt_api_version.major_version,
              Api()->pjrt_api_version.minor_version);

  PJRT_Plugin_Initialize_Args init_args;
  std::memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(Api()->PJRT_Plugin_Initialize(&init_args), "Plugin_Initialize");
}

// Option set mirroring the python-side registration for the axon plugin's
// pool/remote-compile mode (axon.register.pjrt): topology, session_id,
// remote_compile, rank sentinel. Harmless extras are ignored by plugins
// that don't know them (stock libtpu among them).
inline PJRT_Client* CreateClient(const char* session_prefix) {
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
  static char session_id[64];
  std::snprintf(session_id, sizeof(session_id), "%s-%d", session_prefix,
                static_cast<int>(getpid()));
  std::vector<PJRT_NamedValue> opts_v = {
      int_opt("remote_compile", 1),
      int_opt("local_only", 0),
      int_opt("priority", 0),
      str_opt("topology", "v5e:1x1x1"),
      int_opt("n_slices", 1),
      str_opt("session_id", session_id),
      int_opt("rank", static_cast<int64_t>(0xFFFFFFFFll)),
  };

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = opts_v.data();
  cargs.num_options = opts_v.size();
  Check(Api()->PJRT_Client_Create(&cargs), "Client_Create");

  PJRT_Client_PlatformName_Args pargs;
  std::memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = cargs.client;
  Check(Api()->PJRT_Client_PlatformName(&pargs), "PlatformName");
  std::printf("platform: %.*s\n", static_cast<int>(pargs.platform_name_size),
              pargs.platform_name);
  return cargs.client;
}

inline PJRT_Device* FirstDevice(PJRT_Client* client) {
  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  Check(Api()->PJRT_Client_AddressableDevices(&dargs), "AddressableDevices");
  std::printf("%zu addressable device(s)\n", dargs.num_addressable_devices);
  return dargs.addressable_devices[0];
}

inline PJRT_LoadedExecutable* Compile(PJRT_Client* client,
                                      const std::string& program,
                                      const std::string& compile_options) {
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
  Check(Api()->PJRT_Client_Compile(&comp), "Client_Compile");
  return comp.executable;
}

inline size_t NumOutputs(PJRT_LoadedExecutable* exec) {
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  std::memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  Check(Api()->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
  PJRT_Executable_NumOutputs_Args noargs;
  std::memset(&noargs, 0, sizeof(noargs));
  noargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  noargs.executable = ge.executable;
  Check(Api()->PJRT_Executable_NumOutputs(&noargs), "NumOutputs");
  return noargs.num_outputs;
}

inline std::vector<int64_t> BufferDims(PJRT_Buffer* b) {
  PJRT_Buffer_Dimensions_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  args.buffer = b;
  Check(Api()->PJRT_Buffer_Dimensions(&args), "Buffer_Dimensions");
  return std::vector<int64_t>(args.dims, args.dims + args.num_dims);
}

inline PJRT_Buffer_Type BufferType(PJRT_Buffer* b) {
  PJRT_Buffer_ElementType_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
  args.buffer = b;
  Check(Api()->PJRT_Buffer_ElementType(&args), "Buffer_ElementType");
  return args.type;
}

// Raw D2H copy of a device buffer (blocking).
inline std::vector<uint8_t> ReadBuffer(PJRT_Buffer* b) {
  PJRT_Buffer_ToHostBuffer_Args th;
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = b;
  Check(Api()->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
  std::vector<uint8_t> host(th.dst_size);
  th.dst = host.data();
  Check(Api()->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
  AwaitEvent(th.event, "D2H");
  return host;
}

// D2H + element-wise conversion to float (F32 / BF16 / S32 / PRED-bool).
inline std::vector<float> ReadBufferAsFloat(PJRT_Buffer* b) {
  const std::vector<uint8_t> raw = ReadBuffer(b);
  const PJRT_Buffer_Type t = BufferType(b);
  std::vector<float> out;
  if (t == PJRT_Buffer_Type_F32) {
    out.resize(raw.size() / 4);
    std::memcpy(out.data(), raw.data(), raw.size());
  } else if (t == PJRT_Buffer_Type_BF16) {
    out.resize(raw.size() / 2);
    for (size_t i = 0; i < out.size(); ++i) {
      uint32_t bits = static_cast<uint32_t>(
                          reinterpret_cast<const uint16_t*>(raw.data())[i])
                      << 16;
      std::memcpy(&out[i], &bits, 4);
    }
  } else if (t == PJRT_Buffer_Type_S32) {
    out.resize(raw.size() / 4);
    for (size_t i = 0; i < out.size(); ++i)
      out[i] = static_cast<float>(
          reinterpret_cast<const int32_t*>(raw.data())[i]);
  } else if (t == PJRT_Buffer_Type_PRED || t == PJRT_Buffer_Type_U8 ||
             t == PJRT_Buffer_Type_S8) {
    out.resize(raw.size());
    for (size_t i = 0; i < out.size(); ++i)
      out[i] = static_cast<float>(raw[i]);
  } else {
    std::fprintf(stderr, "ReadBufferAsFloat: unsupported type %d\n",
                 static_cast<int>(t));
    std::exit(1);
  }
  return out;
}

// Device minor-to-major order of a buffer (layout.minor_to_major), or an
// empty vector when the plugin reports a strided/unknown layout.
inline std::vector<int64_t> BufferMinorToMajor(PJRT_Buffer* b) {
  PJRT_Buffer_GetMemoryLayout_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_GetMemoryLayout_Args_STRUCT_SIZE;
  args.buffer = b;
  PJRT_Error* err = Api()->PJRT_Buffer_GetMemoryLayout(&args);
  if (err) {  // optional API — treat as unknown layout
    PJRT_Error_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    Api()->PJRT_Error_Destroy(&d);
    return {};
  }
  if (args.layout.type != PJRT_Buffer_MemoryLayout_Type_Tiled) return {};
  const auto& t = args.layout.tiled;
  return std::vector<int64_t>(t.minor_to_major,
                              t.minor_to_major + t.minor_to_major_size);
}

// D2H + float conversion + permutation into LOGICAL row-major order.
//
// ToHostBuffer without a host_layout delivers the elements in the
// buffer's DEVICE dimension order.  XLA:TPU frequently transposes small
// trailing dims off the 128-lane minor position — e.g. the NMSResult
// boxes (B, 300, 4) come back physically (B, 4, 300) — so a reader that
// assumes row-major sees interleaved garbage (found the hard way: the
// first detection's x1 was the third detection's x0, and every later
// row read zero padding).  This wrapper inverts minor_to_major on the
// host, which needs no relayout support from the plugin.
// Permute a dense buffer laid out with the given minor_to_major order
// into logical row-major.  Returns raw unchanged when the layout is
// already row-major, unknown, or rank < 2.  Exits loudly if the element
// count disagrees with dims (tiled padding would corrupt every value).
inline std::vector<float> PermuteToRowMajor(std::vector<float> raw,
                                            const std::vector<int64_t>& dims,
                                            const std::vector<int64_t>& m2m) {
  const size_t n = dims.size();
  if (m2m.size() != n || n < 2) return raw;  // unknown layout or 0/1-D
  bool rowmajor = true;
  for (size_t i = 0; i < n; ++i)
    rowmajor &= (m2m[i] == static_cast<int64_t>(n - 1 - i));
  if (rowmajor) return raw;
  size_t total = 1;
  for (int64_t d : dims) total *= static_cast<size_t>(d);
  if (raw.size() != total) {
    std::fprintf(stderr,
                 "PermuteToRowMajor: %zu elements on host vs %zu "
                 "logical (tiled padding in D2H?) — refusing to decode\n",
                 raw.size(), total);
    std::exit(1);
  }
  // physical stride of each logical dim (dense in minor_to_major order)
  std::vector<size_t> stride(n);
  size_t s = 1;
  for (int64_t d : m2m) {
    stride[static_cast<size_t>(d)] = s;
    s *= static_cast<size_t>(dims[static_cast<size_t>(d)]);
  }
  std::vector<float> out(total);
  std::vector<size_t> idx(n, 0);
  for (size_t lin = 0; lin < total; ++lin) {
    size_t off = 0;
    for (size_t k = 0; k < n; ++k) off += idx[k] * stride[k];
    out[lin] = raw[off];
    for (size_t k = n; k-- > 0;) {  // row-major increment
      if (++idx[k] < static_cast<size_t>(dims[k])) break;
      idx[k] = 0;
    }
  }
  return out;
}

inline std::vector<float> ReadBufferAsFloatLogical(PJRT_Buffer* b) {
  return PermuteToRowMajor(ReadBufferAsFloat(b), BufferDims(b),
                           BufferMinorToMajor(b));
}

inline void DestroyBuffer(PJRT_Buffer* b) {
  if (!b) return;
  PJRT_Buffer_Destroy_Args bd;
  std::memset(&bd, 0, sizeof(bd));
  bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  bd.buffer = b;
  Check(Api()->PJRT_Buffer_Destroy(&bd), "Buffer_Destroy");
}

}  // namespace pjrt_util

#endif  // COCODET_SERVING_PJRT_UTIL_H_
