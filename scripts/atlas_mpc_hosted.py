"""Host-orchestrated Atlas-class MPC on the real TPU (round-5 verdict #1).

No single-jit Atlas MPC program survives the remote compile helper
(BIGMODEL_STUDY.md wall 4b; re-verified round 5: the chained composites
crash while every individual piece compiles). This driver therefore runs
the replan as a HOST-side loop over separately-jitted phases — each one
proven to compile by scripts/atlas_compile_bisect.py:

  refresh     XLA open-loop frozen rollout (scan)  + pointwise classify
  linearize   the chained row-VJP lane kernels (ops/lane_chain.py), one
              jit per chunk (primal chain grid (G,), tangent chain grid
              (G, K))
  backward    XLA associative-scan LQR (_parallel_riccati, vmapped) —
              the lane-Riccati kernel exceeds VMEM at nx = 66
  line search XLA closed-loop gain rollouts over the alpha ladder

Per-phase dispatch costs host round-trips the fused single-jit bench
configs never pay — the point is a MEASURED humanoid-class number, not
parity with the sub-10-dof configs. Writes ATLAS_MPC.json.

Run: env PYTHONPATH=/root/.axon_site:/root/repo python \
         scripts/atlas_mpc_hosted.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from nimblephysics_tpu.models.humanoid import atlas_planner
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops.contact import lcp_dim
from nimblephysics_tpu.ops.frozen_contact import (
    FrozenClasses,
    classify_points,
)
from nimblephysics_tpu.ops.lane_chain import (
    _chains_for,
    pack_rows,
    unpack_rows,
)
from nimblephysics_tpu.ops.pallas_linearize import _const_spec
from nimblephysics_tpu.trajectory.ilqr import (
    _make_frozen_dyn,
    _parallel_riccati,
)

from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("ATLAS_B", "64"))
H = int(os.environ.get("ATLAS_H", "50"))
CG = int(os.environ.get("CG_ATLAS", "16"))
BUDGET = int(os.environ.get("CHAIN_BUDGET", "18000"))
ITERS = int(os.environ.get("ATLAS_ITERS", "2"))
ALPHAS = (1.0, 0.3)
COPTS = {"xla_tpu_scoped_vmem_limit_kib": 98304}

planner, s0 = atlas_planner()
m = lcp_dim(planner)
nq, na = planner.nq, planner.num_actions
nx = 2 * nq
dtype = jnp.float32

idx = jnp.asarray(planner.actuated, dtype=jnp.int32)
u_lo = jnp.asarray(planner.tau_lower)[idx]
u_hi = jnp.asarray(planner.tau_upper)[idx]
dynf = _make_frozen_dyn(planner, cg_iters=CG)
tau_b = jax.vmap(jax.vmap(planner.action_to_tau))


def running(x, u, t):
    return 1e-5 * jnp.sum(u ** 2) + (x[nq - 2] - 0.9) ** 2


def final_cost(x):
    return 10.0 * jnp.sum(x[nq:] ** 2)


# ------------------------------------------------------------ XLA phases --

@partial(jax.jit, compiler_options=COPTS)
def refresh_rollout(x0f, u, cm, us):
    def one(x0_, uu, c1, u1):
        def body(x, inp):
            ut, cc, uu_ = inp
            ut = jnp.clip(ut, u_lo, u_hi)
            return dynf(x, ut, (cc, uu_)), x

        _, xs = jax.lax.scan(body, x0_, (uu, c1, u1))
        return xs

    return jax.vmap(one)(x0f, u, cm, us)


@partial(jax.jit, compiler_options=COPTS)
def classify(xs, u):
    cl, _ = classify_points(planner, xs, tau_b(u))
    return cl.cmask, cl.us


ts = jnp.arange(H)


@partial(jax.jit, compiler_options=COPTS)
def rollout_gains_xla(x0f, xs_ref, u_ref, K, k, cm, us, alphas):
    def one(x0_, xr, ur, K1, k1, c1, u1, alpha):
        def body(x, inp):
            x_r, u_r, K_t, k_t, cc, uu_ = inp
            u_t = jnp.clip(u_r + alpha * k_t + K_t @ (x - x_r), u_lo, u_hi)
            x2 = dynf(x, u_t, (cc, uu_))
            return x2, (x2, u_t)

        _, (xs2, us2) = jax.lax.scan(
            body, x0_, (xr[:-1], ur, K1, k1, c1, u1))
        xs_full = jnp.concatenate([x0_[None], xs2], axis=0)
        cost = jnp.sum(jax.vmap(running)(xs_full[:-1], us2, ts)) + \
            final_cost(xs_full[-1])
        return xs_full, us2, cost

    batched = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, None))
    return jax.vmap(batched, in_axes=(None,) * 7 + (0,))(
        x0f, xs_ref, u_ref, K, k, cm, us, alphas)


@partial(jax.jit, compiler_options=COPTS)
def backward_parallel(fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT, reg):
    return jax.vmap(_parallel_riccati)(
        fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT, reg)


@partial(jax.jit, compiler_options=COPTS)
def cost_derivs(xs, u):
    tsb = jnp.broadcast_to(ts, (B, H))
    lx, lu = jax.vmap(jax.vmap(
        jax.grad(running, argnums=(0, 1))))(xs[:, :-1], u, tsb)

    def hess_one(x, u_t, t):
        return (jax.hessian(running, argnums=0)(x, u_t, t),
                jax.hessian(running, argnums=1)(x, u_t, t),
                jax.jacobian(jax.grad(running, argnums=1), argnums=0)(
                    x, u_t, t))

    lxx, luu, lux = jax.vmap(jax.vmap(hess_one))(xs[:, :-1], u, tsb)
    VxT = jax.vmap(jax.grad(final_cost))(xs[:, -1])
    VxxT = jax.vmap(jax.hessian(final_cost))(xs[:, -1])
    return lx, lu, lxx, luu, lux, VxT, VxxT


# ------------------------------------------- chained linearize, hosted --
# chained_linearize_vjp with a caching per-launch jax.jit wrapper: every
# pallas launch compiles as its OWN program (multi-kernel programs crash
# the remote compile service; individual kernels compile).

from nimblephysics_tpu.ops.lane_chain import (  # noqa: E402
    _chains_for,
    chained_linearize_vjp,
)

ch = _chains_for(planner, m, nx, na, dtype, CG, BUDGET)
_JITS = {}


def _wrap(name, f):
    g = _JITS.get(name)
    if g is None:
        print(f"  compiling lin launch {name}", flush=True)
        jitted = jax.jit(f, compiler_options=COPTS)

        def g(*a, _j=jitted, _n=name):
            # the remote compile helper 500s non-deterministically on
            # programs it compiles fine on retry (round-5: p6s1 crashed
            # where the same-sized p6s0 compiled) — retry before giving up
            n_try = int(os.environ.get("ATLAS_COMPILE_RETRIES", "6"))
            for attempt in range(n_try):
                try:
                    return _j(*a)
                except Exception as e:  # noqa: BLE001
                    if attempt == n_try - 1:
                        raise
                    print(f"  launch {_n} failed "
                          f"({type(e).__name__}); retrying", flush=True)
                    # failures come in multi-minute bursts (round-5
                    # observation: a window that 500'd 3x compiled
                    # first-try 20 min later) — back off up to 2 min
                    time.sleep(min(120, 15 + 15 * attempt))

        _JITS[name] = g
    return g


def linearize(xs, u, cm, us):
    return chained_linearize_vjp(
        planner, xs, u, (cm, us), block_b=128, interpret=False,
        cg_iters=CG, budget=BUDGET, wrap=_wrap)


def main():
    t_start = time.time()
    log = {"B": B, "H": H, "iters": ITERS, "alphas": list(ALPHAS),
           "cg": CG, "budget": BUDGET,
           "chunks": {"primal": ch.pchain.n_chunks,
                      "tangent": ch.tchain.n_chunks}}

    key = jax.random.PRNGKey(0)
    x0 = jnp.tile(s0.flat()[None].astype(dtype), (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, dtype=dtype)
    u = jnp.zeros((B, H, na), dtype)
    cm = jnp.zeros((B, H, m), dtype)
    us_ = jnp.zeros((B, H, m), dtype)
    alphas = jnp.asarray(ALPHAS, dtype)

    def replan(x0, u, cm, us_):
        # refresh (warm): rollout under previous classes + reclassify
        xs_pre = refresh_rollout(x0, u, cm, us_)
        cm, us_ = classify(xs_pre, u)
        # initial rollout under the refreshed classes (the 1-alpha ladder)
        xs_full, _, cost = rollout_gains_xla(
            x0, jnp.concatenate([x0[:, None], xs_pre], axis=1), u,
            jnp.zeros((B, H, na, nx), dtype), jnp.zeros((B, H, na), dtype),
            cm, us_, jnp.ones((1,), dtype))
        xs, cost = xs_full[0], cost[0]
        for _ in range(ITERS):
            fx, fu = linearize(xs[:, :-1], u, cm, us_)
            lx, lu, lxx, luu, lux, VxT, VxxT = cost_derivs(xs, u)
            K, k, dV, ok = backward_parallel(
                fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT,
                jnp.full((B,), 1e-3, dtype))
            xss, uss, costs = rollout_gains_xla(
                x0, xs, u, K, k, cm, us_, alphas)
            best = jnp.argmin(costs, axis=0)
            barange = jnp.arange(B)
            new_cost = costs[best, barange]
            improved = new_cost < cost
            xs = jnp.where(improved[:, None, None], xss[best, barange], xs)
            u = jnp.where(improved[:, None, None], uss[best, barange], u)
            cost = jnp.where(improved, new_cost, cost)
        cm, us_ = classify(xs[:, :-1], u)
        return u, cost, cm, us_

    print("compiling + first replan...", flush=True)
    t0 = time.time()
    u1, cost, cm, us_ = replan(x0, u, cm, us_)
    float(jnp.sum(cost))
    log["compile_plus_first_replan_s"] = round(time.time() - t0, 1)
    print(f"first replan: {log['compile_plus_first_replan_s']}s", flush=True)

    t0 = time.time()
    reps = 5
    warm = (x0, u1, cm, us_)
    for _ in range(reps):
        u1, cost, cm, us_ = replan(*warm)
        warm = (x0, u1, cm, us_)
        float(jnp.sum(cost))
    dt_replan = (time.time() - t0) / reps
    log["steady_replan_ms"] = round(dt_replan * 1000, 1)
    log["solves_per_s"] = round(B / dt_replan, 2)
    log["cost_finite"] = bool(jnp.all(jnp.isfinite(cost)))
    log["mean_cost"] = float(jnp.mean(cost))
    log["total_s"] = round(time.time() - t_start, 1)
    print(json.dumps(log), flush=True)
    with open("/root/repo/ATLAS_MPC.json", "w") as f:
        json.dump(log, f, indent=1)


if __name__ == "__main__":
    main()
