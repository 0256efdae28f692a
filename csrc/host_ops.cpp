// Native host-side runtime ops for qspec_tpu.
//
// TPU-native counterpart of the reference's C++/CUDA runtime surface where
// the work is genuinely host CPU: the device compute path is Pallas/XLA, but
// the per-step host loops — prefix-cache content hashing
// (vllm/core/block/prefix_caching_block.py), n-gram prompt lookup
// (vllm/spec_decode/ngram_worker.py) and batched input assembly
// (vllm/worker/model_runner.py ModelInputForGPUBuilder) — run for every
// scheduler iteration and scale with batch x context. Python fallbacks exist
// (core/block_manager.py, spec_decode/ngram.py); this extension is selected
// automatically when built (see qspec_tpu/_native/__init__.py).
//
// CPython C API only — no pybind11 in this image.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// 64-bit FNV-1a over token ids, chained: hash(prev, tokens)
// ---------------------------------------------------------------------------

uint64_t fnv1a_chain(uint64_t prev, const int32_t* toks, Py_ssize_t n) {
  uint64_t h = 1469598103934665603ULL ^ prev * 1099511628211ULL;
  for (Py_ssize_t i = 0; i < n; ++i) {
    h ^= static_cast<uint64_t>(static_cast<uint32_t>(toks[i]));
    h *= 1099511628211ULL;
  }
  return h;
}

bool parse_int32_seq(PyObject* obj, std::vector<int32_t>* out) {
  PyObject* fast = PySequence_Fast(obj, "expected a sequence of ints");
  if (!fast) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->resize(n);
  PyObject** items = PySequence_Fast_ITEMS(fast);
  for (Py_ssize_t i = 0; i < n; ++i) {
    long v = PyLong_AsLong(items[i]);
    if (v == -1 && PyErr_Occurred()) {
      Py_DECREF(fast);
      return false;
    }
    (*out)[i] = static_cast<int32_t>(v);
  }
  Py_DECREF(fast);
  return true;
}

PyObject* chain_hash(PyObject*, PyObject* args) {
  PyObject* prev_obj;
  PyObject* tokens;
  if (!PyArg_ParseTuple(args, "OO", &prev_obj, &tokens)) return nullptr;
  uint64_t prev = 0;
  if (prev_obj != Py_None) {
    prev = PyLong_AsUnsignedLongLongMask(prev_obj);
    if (PyErr_Occurred()) return nullptr;
  }
  std::vector<int32_t> toks;
  if (!parse_int32_seq(tokens, &toks)) return nullptr;
  uint64_t h = fnv1a_chain(prev ^ 0x9e3779b97f4a7c15ULL, toks.data(),
                           static_cast<Py_ssize_t>(toks.size()));
  return PyLong_FromUnsignedLongLong(h);
}

// ---------------------------------------------------------------------------
// hash_prompt_pages(tokens, page_size) -> list of per-page chained hashes
// ---------------------------------------------------------------------------

PyObject* hash_prompt_pages(PyObject*, PyObject* args) {
  PyObject* tokens;
  Py_ssize_t page_size;
  if (!PyArg_ParseTuple(args, "On", &tokens, &page_size)) return nullptr;
  if (page_size <= 0) {
    PyErr_SetString(PyExc_ValueError, "page_size must be > 0");
    return nullptr;
  }
  std::vector<int32_t> toks;
  if (!parse_int32_seq(tokens, &toks)) return nullptr;
  Py_ssize_t n_pages = static_cast<Py_ssize_t>(toks.size()) / page_size;
  PyObject* out = PyList_New(n_pages);
  if (!out) return nullptr;
  uint64_t prev = 0;
  for (Py_ssize_t p = 0; p < n_pages; ++p) {
    // same mixing as chain_hash so the two entry points agree
    prev = fnv1a_chain(prev ^ 0x9e3779b97f4a7c15ULL,
                       toks.data() + p * page_size, page_size);
    PyList_SET_ITEM(out, p, PyLong_FromUnsignedLongLong(prev));
  }
  return out;
}

// ---------------------------------------------------------------------------
// ngram_propose(history, nmin, nmax, k) -> list[k] or None
// (matches spec_decode/ngram.py semantics: longest tail n-gram, most recent
//  earlier occurrence, continuation padded with its last token)
// ---------------------------------------------------------------------------

PyObject* ngram_propose(PyObject*, PyObject* args) {
  PyObject* tokens;
  Py_ssize_t nmin, nmax, k;
  if (!PyArg_ParseTuple(args, "Onnn", &tokens, &nmin, &nmax, &k)) return nullptr;
  std::vector<int32_t> hist;
  if (!parse_int32_seq(tokens, &hist)) return nullptr;
  Py_ssize_t L = static_cast<Py_ssize_t>(hist.size());

  for (Py_ssize_t n = std::min(nmax, L - 1); n >= nmin; --n) {
    const int32_t* tail = hist.data() + (L - n);
    // find the most recent occurrence strictly before the tail itself;
    // windows may start at 0 .. L-1-n (into hist[:-1])
    Py_ssize_t found = -1;
    for (Py_ssize_t s = L - 1 - n; s >= 0; --s) {
      if (std::memcmp(hist.data() + s, tail, n * sizeof(int32_t)) == 0) {
        found = s;
        break;
      }
    }
    if (found < 0) continue;
    Py_ssize_t start = found + n;
    Py_ssize_t avail = L - start;
    if (avail <= 0) continue;
    PyObject* out = PyList_New(k);
    if (!out) return nullptr;
    int32_t last = hist[start + std::min(avail, k) - 1];
    for (Py_ssize_t i = 0; i < k; ++i) {
      int32_t v = (i < avail) ? hist[start + i] : last;
      PyList_SET_ITEM(out, i, PyLong_FromLong(v));
    }
    return out;
  }
  Py_RETURN_NONE;
}

// ---------------------------------------------------------------------------
// build_slot_mapping(page_ids, start_pos, count, page_size) -> bytes (int32)
// Flat kv slots for positions [start_pos, start_pos + count); the caller
// wraps the bytes in numpy without a copy.
// ---------------------------------------------------------------------------

PyObject* build_slot_mapping(PyObject*, PyObject* args) {
  PyObject* pages_obj;
  Py_ssize_t start, count, page_size;
  if (!PyArg_ParseTuple(args, "Onnn", &pages_obj, &start, &count, &page_size))
    return nullptr;
  std::vector<int32_t> pages;
  if (!parse_int32_seq(pages_obj, &pages)) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, count * sizeof(int32_t));
  if (!out) return nullptr;
  int32_t* dst = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  for (Py_ssize_t i = 0; i < count; ++i) {
    Py_ssize_t pos = start + i;
    Py_ssize_t pidx = pos / page_size;
    int32_t page =
        (pidx < static_cast<Py_ssize_t>(pages.size())) ? pages[pidx] : 0;
    dst[i] = page * static_cast<int32_t>(page_size) +
             static_cast<int32_t>(pos % page_size);
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"chain_hash", chain_hash, METH_VARARGS,
     "chain_hash(prev_hash_or_None, tokens) -> int"},
    {"hash_prompt_pages", hash_prompt_pages, METH_VARARGS,
     "hash_prompt_pages(tokens, page_size) -> list of chained page hashes"},
    {"ngram_propose", ngram_propose, METH_VARARGS,
     "ngram_propose(history, nmin, nmax, k) -> list | None"},
    {"build_slot_mapping", build_slot_mapping, METH_VARARGS,
     "build_slot_mapping(page_ids, start, count, page_size) -> int32 bytes"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_host_ops",
                       "qspec_tpu native host ops", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__host_ops(void) { return PyModule_Create(&kModule); }
