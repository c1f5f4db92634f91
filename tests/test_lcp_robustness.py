"""LCP convergence diagnostics + staged fallback + hyper-accurate mode.

Mirrors the reference's solver-robustness machinery:
  * residual reporting — LCPUtils::isLCPSolutionValid (dart/math/LCPUtils.cpp:12)
  * staged fallback — BoxedLcpConstraintSolver.cpp:390-470 (secondary
    solver, deeper settings, ignore-friction last resort)
  * makeHyperAccurateAndVerySlow — BoxedLcpConstraintSolver.hpp:94
"""

import numpy as np

import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops import lcp as lcp_mod
from nimblephysics_tpu.ops.contact import contact_step


def _settled_worm():
    m = builders.jump_worm(dt=0.001)
    s = State(q=jnp.zeros(m.nq).at[1].set(-0.45), v=jnp.zeros(m.nq))
    for _ in range(300):
        s = contact_step(m, s, jnp.zeros(m.nq))
    return m, s


def test_residual_surfaced_and_small_on_contact_world():
    model, s = _settled_worm()
    _, info = contact_step(model, s, jnp.zeros(model.nq), return_info=True)
    r = float(info.residual)
    assert np.isfinite(r)
    # 60-sweep PGS on the settled worm: quantified convergence level
    assert r < 1e-6, f"60-sweep residual unexpectedly large: {r}"


def test_hyper_accurate_tightens_residual():
    """The accuracy valve must not be worse than the standard path, and
    must reach near-exact complementarity."""
    model, s = _settled_worm()
    # kick it so the LCP is non-trivial this step
    s = State(q=s.q, v=s.v.at[0].set(0.8).at[1].set(-0.5))
    _, info_std = contact_step(model, s, jnp.zeros(model.nq), return_info=True)
    _, info_hyp = contact_step(
        model, s, jnp.zeros(model.nq), return_info=True, accuracy="hyper"
    )
    r_std, r_hyp = float(info_std.residual), float(info_hyp.residual)
    assert r_hyp <= r_std * 1.01 + 1e-14, (r_std, r_hyp)
    assert r_hyp < 1e-8, r_hyp


def test_staged_fallback_rescues_hard_lcp():
    """A nearly-degenerate LCP where 6-sweep PGS is far from converged:
    the staged cascade must reach the solution."""
    rng = np.random.default_rng(0)
    m = 12
    # ill-conditioned A: near-redundant rows (coplanar-contact structure)
    G = rng.standard_normal((m, 4))
    A = G @ G.T + 1e-6 * np.eye(m)
    b = rng.standard_normal(m)
    lo = np.zeros(m)
    hi = np.full(m, 1e20)
    fscale = np.zeros(m)
    findex = tuple([-1] * m)
    x0 = jnp.zeros(m)

    args = tuple(jnp.asarray(v) for v in (A, b, lo, hi, fscale))
    x_short = lcp_mod.pgs_solve(*args, x0, findex, iters=6)
    x_staged = lcp_mod.staged_solve(*args, x0, findex, iters=6)
    r_short = float(lcp_mod.lcp_residual(args[0], x_short, *args[1:], findex))
    r_staged = float(lcp_mod.lcp_residual(args[0], x_staged, *args[1:], findex))
    assert r_staged < r_short, (r_short, r_staged)
    assert r_staged < 1e-4, r_staged


def test_residual_zero_when_no_active_constraints():
    """Airborne worm: padded LCP is inactive, residual ~0."""
    model = builders.jump_worm(dt=0.001)
    s = State(q=jnp.zeros(model.nq).at[1].set(2.0), v=jnp.zeros(model.nq))
    _, info = contact_step(model, s, jnp.zeros(model.nq), return_info=True)
    assert float(info.residual) < 1e-10
