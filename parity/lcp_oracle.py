"""Parity oracle: the CPU reference's EXACT boxed-LCP kernel.

The reference's primary LCP solver is the vendored ODE Dantzig pivoting
solver (`/root/reference/dart/constraint/DantzigBoxedLcpSolver.cpp:50` ->
`/root/reference/dart/external/odelcpsolver/lcp.cpp`). That vendored
subdirectory is Eigen-free, so — unlike the rest of the reference, which
cannot be built in this image (no Eigen/IPOPT/assimp and no network) — it
compiles standalone. We build it IN PLACE from the read-only reference tree
(no sources are copied into this repo; `oracle_build/lcp_oracle_shim.cpp`
is only a ~20-line C-ABI adapter) and use it as the ground-truth oracle for
control-impulse parity: the same (A, b, lo, hi, findex) problems our TPU
solver sees are fed to the reference's numeric kernel and the solutions
compared.

Golden problems + oracle solutions are committed in
`tests/golden/lcp_golden.npz` so the parity tests run without a compiler;
`python parity/lcp_oracle.py` regenerates both the .so and the goldens.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_SO = os.path.join(_HERE, "ref_lcp.so")
_REFERENCE = "/root/reference"

_BIG = 1e20


def build_oracle() -> str:
    """(Re)build ref_lcp.so from the reference tree. Returns the path."""
    src = os.path.join(_HERE, "oracle_build", "lcp_oracle_shim.cpp")
    ode = os.path.join(_REFERENCE, "dart", "external", "odelcpsolver")
    units = [
        os.path.join(ode, f + ".cpp")
        for f in ("lcp", "matrix", "misc", "error",
                  "fastdot", "fastldlt", "fastlsolve", "fastltsolve")
    ]
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", f"-I{_REFERENCE}", "-o", _SO, src]
        + units,
        check=True,
    )
    return _SO


def load_oracle() -> Optional[ctypes.CDLL]:
    """Load the oracle, building it if the reference tree is available."""
    if not os.path.exists(_SO):
        if not os.path.isdir(_REFERENCE):
            return None
        try:
            build_oracle()
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    lib.solve_lcp_dantzig.restype = ctypes.c_int
    lib.solve_lcp_dantzig.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    return lib


def solve_dantzig(lib, A, b, lo, hi, findex):
    """Reference solve of  w = A x - b,  lo <= x <= hi, with ODE friction
    indexing (hi_i := |hi_i * x[findex_i]|, lo_i := -hi_i for coupled rows).
    Matches the calling convention of `DantzigBoxedLcpSolver::solve`
    (/root/reference/dart/constraint/DantzigBoxedLcpSolver.cpp:50-57)."""
    n = len(b)
    A = np.ascontiguousarray(np.asarray(A, np.float64))
    b = np.ascontiguousarray(np.asarray(b, np.float64))
    lo = np.ascontiguousarray(np.asarray(lo, np.float64))
    hi = np.ascontiguousarray(np.asarray(hi, np.float64))
    fi = np.ascontiguousarray(np.asarray(findex, np.int32))
    x = np.zeros(n)
    w = np.zeros(n)
    ok = lib.solve_lcp_dantzig(n, A.copy(), x, b.copy(), w, 0,
                               lo.copy(), hi.copy(), fi)
    return ok, x, w


def lcp_residual(A, x, b, lo, hi, fscale, findex, tol=1e-5):
    """Max complementarity violation of a boxed-LCP solution under the
    reference's own validity semantics (`LCPUtils::isLCPSolutionValid`,
    /root/reference/dart/constraint/LCPUtils.cpp:12-77): friction bounds
    are substituted from the solution (fully coupled), boundary membership
    is decided at `tol`, and a zero-bound row with x=0 is always legal.
    Returns 0.0 for a solution the reference would accept."""
    A = np.asarray(A); x = np.asarray(x); b = np.asarray(b)
    lo = np.array(lo, np.float64); hi = np.array(hi, np.float64)
    findex = np.asarray(findex)
    for i, f in enumerate(findex):
        if f >= 0:
            hi[i] = fscale[i] * x[f]
            lo[i] = -hi[i]
    w = A @ x - b
    worst = 0.0
    for i in range(len(x)):
        if abs(lo[i]) < tol and abs(hi[i]) < tol and abs(x[i]) < tol:
            continue                       # zero-bound row: always legal
        if abs(x[i] - lo[i]) < tol:
            v = max(0.0, -w[i] - tol)      # at lo: w >= 0
        elif abs(x[i] - hi[i]) < tol:
            v = max(0.0, w[i] - tol)       # at hi: w <= 0
        elif lo[i] < x[i] < hi[i]:
            v = max(0.0, abs(w[i]) - tol)  # interior: w = 0
        else:
            v = max(lo[i] - x[i], x[i] - hi[i])  # out of bounds
        worst = max(worst, v)
    return float(worst)


def make_contact_lcp(rng, n_contacts, n_limits, ndof=8, mu_range=(0.2, 1.2)):
    """Random boxed LCP with the exact row structure our contact assembly
    produces (nimblephysics_tpu/ops/contact.py:build_constraint_system):
    per contact [normal, fric1, fric2] with findex coupling, then one-sided
    limit rows; A = J M^-1 J^T + CFM I from a random articulated J/M."""
    m = 3 * n_contacts + n_limits
    J = rng.standard_normal((m, ndof))
    L = rng.standard_normal((ndof, ndof)) * 0.4 + np.eye(ndof)
    M = L @ L.T + np.eye(ndof)  # SPD mass matrix
    A = J @ np.linalg.solve(M, J.T) + 1e-5 * np.eye(m)
    b = rng.standard_normal(m)
    # bias normals toward activity (negative approach velocity)
    for k in range(n_contacts):
        b[3 * k] = abs(b[3 * k])
    lo = np.zeros(m)
    hi = np.zeros(m)
    fscale = np.zeros(m)
    findex = -np.ones(m, np.int32)
    for k in range(n_contacts):
        hi[3 * k] = _BIG
        mu = rng.uniform(*mu_range)
        for d in (1, 2):
            findex[3 * k + d] = 3 * k
            hi[3 * k + d] = mu          # ODE convention: hi = mu pre-scaling
            fscale[3 * k + d] = mu
    for i in range(3 * n_contacts, m):
        lo[i] = 0.0
        hi[i] = _BIG
    return A, b, lo, hi, fscale, findex


def generate_goldens(path=None, n_problems=48, seed=0):
    lib = load_oracle()
    assert lib is not None, "reference tree required to regenerate goldens"
    rng = np.random.default_rng(seed)
    out = {}
    count = 0
    trials = 0
    while count < n_problems and trials < n_problems * 30:
        trials += 1
        nc = int(rng.integers(0, 5))
        nl = int(rng.integers(0, 4))
        if nc == 0 and nl == 0:
            nl = 2
        A, b, lo, hi, fscale, findex = make_contact_lcp(rng, nc, nl)
        ok, x, w = solve_dantzig(lib, A, b, lo, hi, findex)
        if not ok:
            continue
        res = lcp_residual(A, x, b, lo, hi, fscale, findex)
        if res > 0.0:  # keep only Dantzig answers the reference would accept
            continue
        p = f"p{count}_"
        out[p + "A"] = A
        out[p + "b"] = b
        out[p + "lo"] = lo
        out[p + "hi"] = hi
        out[p + "fscale"] = fscale
        out[p + "findex"] = findex
        out[p + "x"] = x
        count += 1
    out["n_problems"] = np.asarray(count)
    path = path or os.path.join(_REPO, "tests", "golden", "lcp_golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {count} golden LCPs to {path}")
    return path


if __name__ == "__main__":
    build_oracle()
    generate_goldens()
