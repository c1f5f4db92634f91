"""Regression: direct active-set LCP cycling/blow-up on rank-deficient
systems.

Round-3 bug (dbec927): the direct active-set stage solved the interior
block exactly; on rank-deficient principal blocks (coplanar contacts,
cond ~1e6+) the iterates blew up along the null space and the
reclassification oscillated, so `staged_solve` never rescued hard LCPs.
Fixed with minimum-norm (pseudoinverse) interior solves + an exact
Newton polish. Minimal repro: a constructed rank-deficient delassus
system that PGS stalls on."""

import numpy as np

import jax.numpy as jnp

from nimblephysics_tpu.ops.lcp import lcp_residual, staged_solve


def test_staged_solve_bounded_on_rank_deficient_system():
    rng = np.random.default_rng(7)
    m = 12
    G = rng.standard_normal((m, 3))          # rank-3 delassus core
    A = G @ G.T + 1e-10 * np.eye(m)
    b = rng.standard_normal(m)
    lo = np.zeros(m)
    hi = np.full(m, np.inf)
    fscale = np.ones(m)
    findex = tuple([-1] * m)

    x = staged_solve(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(fscale), jnp.zeros(m), findex,
    )
    x = np.asarray(x)
    assert np.isfinite(x).all(), "solution blew up along the null space"
    # bounded magnitude (minimum-norm property keeps it near the data scale)
    assert np.abs(x).max() < 1e3
    res = float(
        lcp_residual(jnp.asarray(A), jnp.asarray(x), jnp.asarray(b),
                     jnp.asarray(lo), jnp.asarray(hi),
                     jnp.asarray(fscale), findex)
    )
    assert res < 1e-5, f"complementarity residual {res}"
