// Test-only C-ABI wrapper around the UNMODIFIED reference polyiou.cpp
// (/root/reference/tools/prepare_dota/polyiou.cpp, compiled in place by
// tests/test_reference_oracles.py — the reference source is linked as-is,
// never copied into this repo).  This exposes the reference's `iou_poly`
// (the exact function the reference evaluator calls through SWIG,
// voc_eval.py:184-187) to ctypes, batched so Python overhead is per-call.
#include <vector>

double iou_poly(std::vector<double> p, std::vector<double> q);

extern "C" double ref_iou_poly(const double* p, const double* q) {
  return iou_poly(std::vector<double>(p, p + 8),
                  std::vector<double>(q, q + 8));
}

extern "C" void ref_iou_poly_batch(const double* p, const double* q,
                                   long long n, double* out) {
  for (long long i = 0; i < n; ++i) {
    out[i] = iou_poly(std::vector<double>(p + 8 * i, p + 8 * i + 8),
                      std::vector<double>(q + 8 * i, q + 8 * i + 8));
  }
}
