// C-ABI shared library for the zktpu prover/verifier (TPU-native framework).
//
// Re-owns the reference's cgo c-shared surface (SURVEY.md N1):
//   libraries/prover/libprove.go:17-47  -> InitAlgorithm, Prove, Free
//   libraries/verifier/libverify.go:14-17 -> Verify
// Same C signatures and the same JSON byte protocol; errors cross the
// boundary as JSON payloads instead of panics (libprove.go:33-43).
//
// The implementation hosts the zktpu Python runtime (JAX/XLA client owning
// the TPU) inside the calling process via the CPython C API — the same
// architecture as the reference, where the cgo library hosts the Go runtime.
//
// Build:  make -C native   (produces libzkprove.so)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdlib>
#include <cstring>
#include <mutex>

namespace {

// Concurrency contract (VERDICT r3 item 9): runtime bring-up runs exactly
// once (std::call_once); after that, Prove/Verify take NO library-level
// lock — the CPython GIL serializes interpreter bytecode and is RELEASED
// by JAX during device dispatch/waits, so concurrent Prove callers
// pipeline on the device instead of queueing on a process mutex.  The
// Python registry has its own _REGISTRY_LOCK (service.py).
std::once_flag g_once;
PyObject* g_service = nullptr;  // zktpu.api.service module

bool ensure_runtime() {
  std::call_once(g_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
    }
    PyGILState_STATE gil = PyGILState_Ensure();
    g_service = PyImport_ImportModule("zktpu.api.service");
    if (g_service == nullptr) {
      PyErr_Print();
    }
    PyGILState_Release(gil);
  });
  return g_service != nullptr;
}

// Serialize a Python bytes result into a malloc'd buffer (caller frees via
// Free, mirroring libprove.go's C.CBytes contract).
void* to_cbuf(PyObject* bytes_obj, int* out_len) {
  char* data = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(bytes_obj, &data, &len) != 0) return nullptr;
  void* buf = std::malloc(len);
  if (buf == nullptr) return nullptr;
  std::memcpy(buf, data, len);
  *out_len = static_cast<int>(len);
  return buf;
}

void* error_json(const char* msg, int* out_len) {
  // panic -> JSON payload at the boundary (libprove.go:33-43)
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* err = PyErr_Occurred() ? PyObject_Repr(PyErr_GetRaisedException())
                                   : nullptr;
  PyErr_Clear();
  PyGILState_Release(gil);
  (void)err;
  const char* prefix = "{\"error\":\"";
  const char* suffix = "\"}";
  size_t n = std::strlen(prefix) + std::strlen(msg) + std::strlen(suffix);
  char* buf = static_cast<char*>(std::malloc(n + 1));
  std::snprintf(buf, n + 1, "%s%s%s", prefix, msg, suffix);
  *out_len = static_cast<int>(n);
  return buf;
}

}  // namespace

extern "C" {

// reference: libprove.go:17-18 (no-op export kept for ABI parity)
void enforce_binding() {}

// reference: libprove.go:21-23
// returns 1 on success, 0 on failure
int InitAlgorithm(unsigned char algorithm_id, const unsigned char* pk_ptr,
                  int pk_len, const unsigned char* r1cs_ptr, int r1cs_len) {
  if (!ensure_runtime()) return 0;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* res = PyObject_CallMethod(
      g_service, "init_algorithm", "iy#y#", static_cast<int>(algorithm_id),
      reinterpret_cast<const char*>(pk_ptr), static_cast<Py_ssize_t>(pk_len),
      reinterpret_cast<const char*>(r1cs_ptr),
      static_cast<Py_ssize_t>(r1cs_len));
  int ok = (res != nullptr && PyObject_IsTrue(res) == 1) ? 1 : 0;
  if (res == nullptr) PyErr_Print();
  Py_XDECREF(res);
  PyGILState_Release(gil);
  return ok;
}

// reference: libprove.go:31-47 — returns malloc'd JSON; caller must Free()
void* Prove(const unsigned char* params_ptr, int params_len, int* out_len) {
  *out_len = 0;
  if (!ensure_runtime()) return error_json("runtime init failed", out_len);
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* res = PyObject_CallMethod(
      g_service, "prove", "y#", reinterpret_cast<const char*>(params_ptr),
      static_cast<Py_ssize_t>(params_len));
  void* out;
  if (res == nullptr) {
    PyGILState_Release(gil);
    return error_json("prove failed", out_len);
  }
  out = to_cbuf(res, out_len);
  Py_DECREF(res);
  PyGILState_Release(gil);
  if (out == nullptr) return error_json("alloc failed", out_len);
  return out;
}

// reference: libprove.go:25-28
void Free(void* ptr) { std::free(ptr); }

// reference: libverify.go:15-17
int Verify(const unsigned char* params_ptr, int params_len) {
  if (!ensure_runtime()) return 0;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* res = PyObject_CallMethod(
      g_service, "verify", "y#", reinterpret_cast<const char*>(params_ptr),
      static_cast<Py_ssize_t>(params_len));
  int ok = (res != nullptr && PyObject_IsTrue(res) == 1) ? 1 : 0;
  if (res == nullptr) PyErr_Clear();
  Py_XDECREF(res);
  PyGILState_Release(gil);
  return ok;
}

}  // extern "C"
