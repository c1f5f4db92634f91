"""Generate world-level LCP parity goldens.

Rolls out real contact worlds (frictional bouncing box = BASELINE config-3
class, jump-worm, cartpole with hard joint limits) with OUR engine, and at
every step feeds the exact constraint system our assembly produced
(`ops/contact.py:build_constraint_system`) to the reference's Dantzig LCP
kernel (see `parity/lcp_oracle.py`). Steps where the reference accepts its
own answer (`LCPUtils::isLCPSolutionValid` semantics) are stored with the
oracle impulses; `tests/test_parity_lcp.py` then asserts our solver's
impulses AND the resulting post-step velocities match.

Run on the clean CPU env:
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
      JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python parity/gen_world_lcp_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from nimblephysics_tpu.models import builders  # noqa: E402
from nimblephysics_tpu.models.model import State  # noqa: E402
from nimblephysics_tpu.ops import dynamics as dyn  # noqa: E402
from nimblephysics_tpu.ops import lcp as lcp_mod  # noqa: E402
from nimblephysics_tpu.ops.collide import detect_contacts  # noqa: E402
from nimblephysics_tpu.ops.contact import (  # noqa: E402
    build_constraint_system,
    lcp_dim,
    lcp_findex,
)
from parity.lcp_oracle import (  # noqa: E402
    lcp_residual,
    load_oracle,
    solve_dantzig,
)


def worlds():
    """(name, model, q0, v0, action_fn, steps) parity scenarios."""
    out = []

    m = builders.jump_worm(dt=0.001)
    s0 = State(
        q=jnp.zeros(m.nq, jnp.float64).at[1].set(-0.45),
        v=jnp.zeros(m.nq, jnp.float64),
    )
    out.append(("jump_worm_drop", m, s0, lambda t: np.zeros(m.num_actions), 300))

    m2 = builders.catapult(dt=0.002)
    s2 = State(q=jnp.zeros(m2.nq, jnp.float64), v=jnp.zeros(m2.nq, jnp.float64))
    out.append(
        (
            "catapult_swing",
            m2,
            s2,
            lambda t: 4.0 * np.sin(0.05 * t) * np.ones(m2.num_actions),
            150,
        )
    )

    m3 = builders.cartpole(dt=0.02)
    # hard joint limits on the pole so limit rows activate
    m3 = m3.replace(
        q_lower=jnp.asarray([-0.6, -0.5], jnp.float64),
        q_upper=jnp.asarray([0.6, 0.5], jnp.float64),
    )
    s3 = State(q=jnp.asarray([0.0, 0.3], jnp.float64), v=jnp.zeros(2, jnp.float64))
    out.append(
        ("cartpole_limits", m3, s3, lambda t: np.asarray([6.0 * np.sin(0.2 * t)]), 120)
    )
    return out


def main(path=None):
    lib = load_oracle()
    assert lib is not None
    entries = {}
    n_saved = 0
    for name, model, s, act, steps in worlds():
        fi = lcp_findex(model)
        m = lcp_dim(model)
        x_warm = jnp.zeros(m, jnp.float64)
        saved_here = 0
        for t in range(steps):
            tau = model.action_to_tau(jnp.asarray(act(t), jnp.float64))
            q, v = s.q, s.v
            kin0 = dyn.forward_kinematics(model, q)
            qdd = dyn.aba(model, q, v, tau, kin=kin0)
            v_star = v + model.dt * qdd
            contacts = detect_contacts(model, kin0.T_wb)
            J, A, b, lo, hi, fscale, Minv_Jt = build_constraint_system(
                model, q, v_star, kin0, contacts
            )
            A_n, b_n = np.asarray(A), np.asarray(b)
            lo_n, hi_n = np.asarray(lo), np.asarray(hi)
            fs_n = np.asarray(fscale)
            # ODE convention: coupled rows carry mu in hi (pre-scaling)
            hi_ode = hi_n.copy()
            for i, f in enumerate(fi):
                if f >= 0:
                    hi_ode[i] = fs_n[i]
            ok, x_ref, _ = solve_dantzig(lib, A_n, b_n, lo_n, hi_ode, fi)
            # step OUR engine (PGS warm-started, like rollout())
            x_ours = lcp_mod.boxed_lcp(
                A, b, lo, hi, fscale, x_warm, fi, 300, "gs"
            )
            x_warm = x_ours
            v_next = v_star + Minv_Jt @ x_ours
            from nimblephysics_tpu.simulation.step import integrate_positions

            q_next = integrate_positions(model, q, v)
            s = State(q=q_next, v=v_next)
            active = bool(np.any(np.abs(x_ref) > 1e-12)) or bool(
                np.any(np.abs(np.asarray(x_ours)) > 1e-12)
            )
            if not (ok and active):
                continue
            if lcp_residual(A_n, x_ref, b_n, lo_n, hi_ode, fs_n, fi) > 0.0:
                continue
            p = f"w{n_saved}_"
            entries[p + "A"] = A_n
            entries[p + "b"] = b_n
            entries[p + "lo"] = lo_n
            entries[p + "hi"] = hi_n
            entries[p + "fscale"] = fs_n
            entries[p + "findex"] = np.asarray(fi, np.int32)
            entries[p + "x_ref"] = x_ref
            entries[p + "Minv_Jt"] = np.asarray(Minv_Jt)
            entries[p + "v_star"] = np.asarray(v_star)
            entries[p + "name"] = np.bytes_(f"{name}:t{t}")
            n_saved += 1
            saved_here += 1
        print(f"{name}: saved {saved_here} active constraint steps")
    entries["n_problems"] = np.asarray(n_saved)
    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "world_lcp_golden.npz",
    )
    np.savez_compressed(path, **entries)
    print(f"wrote {n_saved} world-step LCPs to {path}")


if __name__ == "__main__":
    main()
