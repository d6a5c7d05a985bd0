// Minimal PJRT C API probe: dlopen a plugin, initialize it, create a
// client with CLI-supplied named options, and list devices.
//
// Risk-reduction step for the full serving host (pjrt_host.cpp): proves
// the plugin/ABI/options path works before compile/execute lands.
//
// Build: g++ -std=c++17 -O2 -o probe_pjrt probe_pjrt.cpp -ldl
// Usage: probe_pjrt <plugin.so> [key=type:value ...]
//        types: s (string), i (int64), b (bool)
#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "third_party/pjrt/pjrt_c_api.h"

static void check(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  fprintf(stderr, "FAIL %s: %.*s\n", what, (int)margs.message_size,
          margs.message);
  PJRT_Error_Destroy_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  exit(1);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <plugin.so> [key=type:value ...]\n", argv[0]);
    return 2;
  }
  void* lib = dlopen(argv[1], RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "no GetPjrtApi: %s\n", dlerror());
    return 1;
  }
  const PJRT_Api* api = get_api();
  printf("pjrt api version: %d.%d (struct_size %zu, ours %zu)\n",
         api->pjrt_api_version.major_version,
         api->pjrt_api_version.minor_version, api->struct_size,
         PJRT_Api_STRUCT_SIZE);

  PJRT_Plugin_Initialize_Args init;
  memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(api, api->PJRT_Plugin_Initialize(&init), "Plugin_Initialize");
  printf("plugin initialized\n");

  // parse key=type:value options; keep the strings alive
  std::vector<std::string> keys, svals;
  std::vector<PJRT_NamedValue> opts;
  keys.reserve(argc);
  svals.reserve(argc);
  for (int i = 2; i < argc; ++i) {
    std::string a = argv[i];
    size_t eq = a.find('='), co = a.find(':', eq);
    if (eq == std::string::npos || co == std::string::npos) {
      fprintf(stderr, "bad option %s\n", argv[i]);
      return 2;
    }
    keys.push_back(a.substr(0, eq));
    char type = a[eq + 1];
    svals.push_back(a.substr(co + 1));
    PJRT_NamedValue v;
    memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = keys.back().c_str();
    v.name_size = keys.back().size();
    v.value_size = 1;
    if (type == 's') {
      v.type = PJRT_NamedValue_kString;
      v.string_value = svals.back().c_str();
      v.value_size = svals.back().size();
    } else if (type == 'i') {
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = strtoll(svals.back().c_str(), nullptr, 10);
    } else if (type == 'b') {
      v.type = PJRT_NamedValue_kBool;
      v.bool_value = svals.back() == "1" || svals.back() == "true";
    } else {
      fprintf(stderr, "bad type in %s\n", argv[i]);
      return 2;
    }
    opts.push_back(v);
  }

  PJRT_Client_Create_Args cargs;
  memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = opts.data();
  cargs.num_options = opts.size();
  check(api, api->PJRT_Client_Create(&cargs), "Client_Create");

  PJRT_Client_PlatformName_Args pargs;
  memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = cargs.client;
  check(api, api->PJRT_Client_PlatformName(&pargs), "PlatformName");
  printf("platform: %.*s\n", (int)pargs.platform_name_size,
         pargs.platform_name);

  PJRT_Client_Devices_Args devs;
  memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_Devices_Args_STRUCT_SIZE;
  devs.client = cargs.client;
  check(api, api->PJRT_Client_Devices(&devs), "Devices");
  printf("devices: %zu\n", devs.num_devices);

  PJRT_Client_Destroy_Args dc;
  memset(&dc, 0, sizeof(dc));
  dc.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  dc.client = cargs.client;
  check(api, api->PJRT_Client_Destroy(&dc), "Client_Destroy");
  printf("OK\n");
  return 0;
}
