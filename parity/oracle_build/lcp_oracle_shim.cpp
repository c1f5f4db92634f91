// C shim exposing the reference's vendored ODE Dantzig boxed-LCP solver
// (/root/reference/dart/external/odelcpsolver/lcp.cpp) for parity testing.
// Compiled against the reference tree IN PLACE (no sources copied); this
// file only adapts the C++ API to a ctypes-friendly C ABI.
#include "dart/external/odelcpsolver/lcp.h"
#include <cstring>
#include <vector>

extern "C" int solve_lcp_dantzig(int n, double* A_rowmajor, double* x,
                                 double* b, double* w, int nub,
                                 double* lo, double* hi, int* findex) {
  // ODE expects A with leading dimension dPAD(n) and destroys inputs.
  int npad = dPAD(n);
  std::vector<dReal> A(n * npad, 0.0);
  for (int i = 0; i < n; ++i)
    std::memcpy(&A[i * npad], &A_rowmajor[i * n], n * sizeof(double));
  std::vector<dReal> bb(b, b + n), lo2(lo, lo + n), hi2(hi, hi + n);
  std::vector<int> fi(findex, findex + n);
  bool ok = dSolveLCP(n, A.data(), x, bb.data(), w, nub, lo2.data(),
                      hi2.data(), fi.data(), /*earlyTermination*/ false);
  return ok ? 1 : 0;
}
