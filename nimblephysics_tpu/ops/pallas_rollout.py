"""Fused Pallas TPU kernel: gain-rollout line search for iLQR.

An iLQR iteration closes the loop with `u = u_ref + α·k + K(x − x_ref)`
rolled forward for a ladder of A step sizes α, then keeps each world's
best candidate (reference analogue: IPOPT's line search inside
`IPOptShotWrapper`, /root/reference/dart/trajectory/IPOptShotWrapper.hpp,
done world-parallel here). As an XLA scan over T steps this costs a
kernel-launch round trip per step; this kernel runs the WHOLE closed-loop
rollout — control law + clamp + running cost + dynamics step — on the VPU
with (α, world) pairs on the lane axis:

  * one traced per-step function (`step_fn`: gains → clamp → cost → step)
    evaluated with `ops/lanevmap.LaneFn`, every op (tiny..., block) lanes,
  * the time loop is chunked on the innermost grid dim (forward order);
    the state/cost carry lives in VMEM scratch across chunks,
  * per-step inputs (x_ref, u_ref, K, k) are packed into one (T, E, L)
    array — one DMA per chunk,
  * T is padded up to a chunk multiple; padded steps are masked out via
    the step index (state and cost carry unchanged),
  * the terminal cost is added in the last chunk.

Outputs the candidate trajectories, controls, and total costs for ALL
alphas; the caller argmins over the alpha axis (trajectory/ilqr.py).
Forward-only (the planner's line search is not differentiated through).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops.lanevmap import LaneFn
from nimblephysics_tpu.ops.pallas_linearize import dyn_for_trace, _const_spec


def _pad8(e: int) -> int:
    return -(-e // 8) * 8


def _rollout_kernel(
    lf: LaneFn, nx: int, na: int, m_cl: int, t_chunk: int, n_chunks: int,
    T: int, bt: tuple,
    *refs,
):
    n_c = lf.n_consts
    const_refs = refs[:n_c]
    steps_ref, x0_ref, alpha_ref = refs[n_c: n_c + 3]
    out_ref, cost_ref, carry_s = refs[n_c + 3:]

    c = pl.program_id(1)
    cvals = [cr[...] for cr in const_refs]
    alpha = jax.lax.squeeze(alpha_ref[...], (0, 1))

    @pl.when(c == 0)
    def _():
        x0 = jax.lax.squeeze(x0_ref[...], (1,))
        init = [x0[i] for i in range(nx)] + [jnp.zeros_like(alpha)]
        init += [jnp.zeros_like(alpha)] * (carry_s.shape[0] - len(init))
        carry_s[...] = jnp.stack(init)

    carry = carry_s[...]
    x = [carry[i] for i in range(nx)]
    cost = carry[nx]

    oxr, our, oK, ok_ = 0, nx, nx + na, nx + na + na * nx
    ocl = nx + na + na * nx + na
    for r in range(t_chunk):
        st = jax.lax.squeeze(steps_ref[r], (1,))
        t_idx = c * t_chunk + r
        t_lane = jnp.full(bt, t_idx, jnp.float32)
        xv = jnp.stack(x)
        xref = st[oxr: oxr + nx]
        uref = st[our: our + na]
        Kt = st[oK: oK + na * nx]
        kt = st[ok_: ok_ + na]
        args = [xv, xref, uref, Kt, kt]
        if m_cl:
            args += [st[ocl: ocl + m_cl], st[ocl + m_cl: ocl + 2 * m_cl]]
        x2, u, c_t = lf.call(cvals, args + [alpha, t_lane], bt)
        live = (jnp.full(bt, t_idx, jnp.int32) < T)
        x = [jnp.where(live, x2[i], x[i]) for i in range(nx)]
        cost = cost + jnp.where(live, c_t, jnp.zeros_like(c_t))
        out_ref[r] = jax.lax.expand_dims(jnp.concatenate(
            [jnp.stack(x), u, jnp.zeros(
                (out_ref.shape[1] - nx - na,) + bt, x2.dtype)], axis=0
        ), (1,))

    row = [x[i] for i in range(nx)] + [cost]
    row += [jnp.zeros_like(cost)] * (carry_s.shape[0] - len(row))
    carry_s[...] = jnp.stack(row)

    @pl.when(c == n_chunks - 1)
    def _():
        cost_ref[...] = jax.lax.expand_dims(jnp.stack(
            [cost] + [jnp.zeros_like(cost)] * (cost_ref.shape[0] - 1)
        ), (1,))


def _classes_kernel(
    lf: LaneFn, nx: int, na: int, m: int, t_chunk: int, n_chunks: int,
    T: int, bt: tuple,
    *refs,
):
    n_c = lf.n_consts
    const_refs = refs[:n_c]
    steps_ref, x0_ref = refs[n_c: n_c + 2]
    out_ref, carry_s = refs[n_c + 2:]

    c = pl.program_id(1)
    cvals = [cr[...] for cr in const_refs]

    @pl.when(c == 0)
    def _():
        x0 = jax.lax.squeeze(x0_ref[...], (1,))
        init = [x0[i] for i in range(nx)]
        init += [jnp.zeros_like(init[0])] * (carry_s.shape[0] - nx)
        carry_s[...] = jnp.stack(init)

    carry = carry_s[...]
    x = [carry[i] for i in range(nx)]
    for r in range(t_chunk):
        st = jax.lax.squeeze(steps_ref[r], (1,))
        t_idx = c * t_chunk + r
        xv = jnp.stack(x)
        u_t = st[:na]
        x2, cm, us = lf.call(cvals, [xv, u_t], bt)
        live = (jnp.full(bt, t_idx, jnp.int32) < T)
        x = [jnp.where(live, x2[i], x[i]) for i in range(nx)]
        row = jnp.concatenate([jnp.stack(x), cm, us], axis=0)
        pad = out_ref.shape[1] - row.shape[0]
        if pad:
            row = jnp.concatenate(
                [row, jnp.zeros((pad,) + bt, row.dtype)], axis=0
            )
        out_ref[r] = jax.lax.expand_dims(row, (1,))

    row = [x[i] for i in range(nx)]
    row += [jnp.zeros_like(row[0])] * (carry_s.shape[0] - nx)
    carry_s[...] = jnp.stack(row)


def rollout_classes_pallas(
    model: Model,
    x0: jax.Array,       # (B, nx)
    u: jax.Array,        # (B, T, na)
    block_b: int = 1024,
    t_chunk: int = None,
    interpret: bool = None,
):
    """The per-replan full-LCP mode rollout as ONE fused Pallas kernel:
    worlds on lanes, the T-step time loop chunked on the inner grid dim
    with the state carry in VMEM scratch — same kernel structure as
    `rollout_gains_pallas`, but the step is the FULL constrained step
    (direct boxed LCP) and the outputs are the per-step class masks.

    Replaces the sequential XLA scan of `frozen_contact.rollout_classes`
    for models passing `fused_class_rollout_ok` (measured: the scan was
    1.39 s of a 1.45 s cartpole-limits replan at B=2048, T=100 — a
    launch-latency chain of tiny vmapped ops, the exact pathology the
    rollout kernel exists to remove). Returns (xs (B, T, nx) POST-step
    states, FrozenClasses with (B, T, m) leading axes).
    """
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses,
        step_with_classes_for_trace,
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, na = u.shape
    nx = x0.shape[-1]
    m = lcp_dim(model)
    dtype = x0.dtype

    z = lambda n: jnp.zeros(n, dtype)  # noqa: E731
    lf = LaneFn(step_with_classes_for_trace(model), (z(nx), z(na)))
    from nimblephysics_tpu.ops.lanevmap import count_eqns, fit_block
    n_eqns = count_eqns(lf.closed.jaxpr)
    block_b = fit_block(block_b, n_eqns, budget=10_000_000)
    block_b = max(128, (block_b // 128) * 128)
    S_b = block_b // 128

    L = B
    L_pad = -(-L // block_b) * block_b
    E_pad = _pad8(na)
    Eo_pad = _pad8(nx + 2 * m)
    if t_chunk is None:
        budget = (8 << 20) - 6 * n_eqns * block_b
        per_step = (E_pad + Eo_pad) * block_b * 4 * 2
        t_chunk = 1 if interpret else max(
            1, min(T, budget // max(per_step, 1))
        )
    n_chunks = -(-T // t_chunk)
    T_pad = n_chunks * t_chunk

    rows = u.transpose(1, 2, 0)                          # (T, na, B)
    rows = jnp.pad(rows, ((0, T_pad - T), (0, E_pad - na), (0, L_pad - L)))
    packed = rows.reshape(T_pad, E_pad, L_pad // block_b, S_b, 128)
    x0_l = jnp.pad(x0.T, ((0, 0), (0, L_pad - L)))
    x0_l = x0_l.reshape(nx, L_pad // block_b, S_b, 128)

    Lb = L_pad // block_b
    grid = (Lb, n_chunks)
    kernel = partial(_classes_kernel, lf, nx, na, m, t_chunk, n_chunks, T,
                     (S_b, 128))
    out_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec(cs) for cs in lf.consts2d]
        + [
            pl.BlockSpec((t_chunk, E_pad, 1, S_b, 128),
                         lambda lb, cc: (cc, 0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, 1, S_b, 128), lambda lb, cc: (0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, Eo_pad, 1, S_b, 128),
                               lambda lb, cc: (cc, 0, lb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (T_pad, Eo_pad, L_pad // block_b, S_b, 128), dtype),
        scratch_shapes=[pltpu.VMEM((_pad8(nx), S_b, 128), dtype)],
        interpret=interpret,
    )(*lf.consts2d, packed, x0_l)
    out_p = out_p.reshape(T_pad, Eo_pad, L_pad)

    rows = out_p[:T, :, :L].transpose(2, 0, 1)           # (B, T, Eo_pad)
    xs = rows[:, :, :nx]
    cm = rows[:, :, nx: nx + m]
    us = rows[:, :, nx + m: nx + 2 * m]
    return xs, FrozenClasses(cmask=cm, us=us)


def rollout_gains_pallas(
    model: Model,
    running_cost: Callable,
    final_cost: Callable,
    x0: jax.Array,       # (B, nx)
    xs_ref: jax.Array,   # (B, T+1, nx) reference trajectory
    u_ref: jax.Array,    # (B, T, na)
    K: jax.Array,        # (B, T, na, nx)
    k: jax.Array,        # (B, T, na)
    alphas: jax.Array,   # (A,)
    block_b: int = 1024,
    t_chunk: int = None,
    interpret: bool = None,
    classes=None,        # optional (cmask, us) each (B, T, m): frozen contact
    cg_iters: int = None,   # planner PCG depth for the frozen solve
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-loop rollouts for every (alpha, world) pair in one kernel.

    Returns (xs2, us, costs): xs2 (A, B, T+1, nx) candidate trajectories,
    us (A, B, T, na) clamped controls, costs (A, B) total trajectory costs
    (running + terminal) — semantically `vmap(rollout_with_gains)` over
    the alpha ladder as in trajectory/ilqr.py. With `classes`, the dynamics
    is the frozen-mode contact step (ops/frozen_contact.py) and each step's
    class masks ride in the packed per-step rows."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, na = u_ref.shape
    nx = x0.shape[-1]
    A = alphas.shape[0]
    dtype = x0.dtype

    idx = jnp.asarray(model.actuated, dtype=jnp.int32)
    u_lo = jnp.asarray(model.tau_lower)[idx]
    u_hi = jnp.asarray(model.tau_upper)[idx]
    m_cl = 0 if classes is None else classes[0].shape[-1]

    z = lambda n: jnp.zeros(n, dtype)  # noqa: E731
    if classes is None:
        dyn = dyn_for_trace(model)

        def step_fn(x, xref, uref, Kt_flat, kt, alpha, t):
            du = alpha * kt + Kt_flat.reshape(na, nx) @ (x - xref)
            u = jnp.clip(uref + du, u_lo, u_hi)
            c = running_cost(x, u, t)
            x2 = dyn(x, u)
            return x2, u, c

        lf = LaneFn(step_fn, (z(nx), z(nx), z(na), z(na * nx), z(na),
                              jnp.zeros((), dtype), jnp.zeros((), dtype)))
    else:
        from nimblephysics_tpu.ops.pallas_linearize import dyn_frozen_for_trace

        dynf = dyn_frozen_for_trace(model, cg_iters=cg_iters)

        def step_fn(x, xref, uref, Kt_flat, kt, cm, usv, alpha, t):
            du = alpha * kt + Kt_flat.reshape(na, nx) @ (x - xref)
            u = jnp.clip(uref + du, u_lo, u_hi)
            c = running_cost(x, u, t)
            x2 = dynf(x, u, cm, usv)
            return x2, u, c

        lf = LaneFn(step_fn, (z(nx), z(nx), z(na), z(na * nx), z(na),
                              z(m_cl), z(m_cl),
                              jnp.zeros((), dtype), jnp.zeros((), dtype)))
    from nimblephysics_tpu.ops.lanevmap import count_eqns, fit_block
    # Contact (frozen-step) graphs are large: at the default ~8 MB lane
    # budget fit_block collapses to 128 lanes = 1/8 sublane occupancy
    # (measured 2.5x slower). Contact pipelines run under the raised
    # scoped-vmem cap (bench.py jits with xla_tpu_scoped_vmem_limit_kib=
    # 98304), so give them the budget that keeps full 1024-lane blocks.
    budget = 1_300_000 if classes is None else 10_000_000
    block_b = fit_block(block_b, count_eqns(lf.closed.jaxpr), budget=budget)
    # the batch tail is (block//128, 128): blocks must be full lane rows
    block_b = max(128, (block_b // 128) * 128)
    S_b = block_b // 128

    L = A * B
    L_pad = -(-L // block_b) * block_b
    E = nx + na + na * nx + na + 2 * m_cl
    E_pad = _pad8(E)
    if t_chunk is None:
        # VMEM budget: the steps/out blocks (t_chunk * (E_pad + Eo) rows x
        # block_b lanes x 4B, double-buffered) must coexist with the lane
        # graph's live values (~n_eqns * block_b * 4B — what fit_block
        # bounded). A contact-model step graph is large, so t_chunk often
        # collapses to 1 (observed: 30.7M > 16M scoped-vmem OOM at
        # t_chunk=16 on the jump-worm frozen step).
        n_eqns = count_eqns(lf.closed.jaxpr)
        # 6 bytes/eqn/lane ~ live values + Mosaic spill/temporary overhead
        # (empirical: t_chunk=16 on the cheetah frozen step blew the 16M
        # scoped-vmem stack by 21M)
        budget = (8 << 20) - 6 * n_eqns * block_b
        per_step = (E_pad + _pad8(nx + na)) * block_b * 4 * 2
        t_chunk = 1 if interpret else max(
            1, min(T, budget // max(per_step, 1))
        )
    n_chunks = -(-T // t_chunk)
    T_pad = n_chunks * t_chunk

    def tile_lanes(a):
        # (B, T, ...) -> (T_pad, rows, L_pad), lane index = a*B + b
        rows = a.reshape(B, T, -1)
        rows = jnp.tile(rows, (A, 1, 1))                    # (L, T, e)
        rows = rows.transpose(1, 2, 0)                      # (T, e, L)
        rows = jnp.pad(rows, ((0, T_pad - T), (0, 0), (0, L_pad - L)))
        return rows

    parts = [
        tile_lanes(xs_ref[:, :-1]),
        tile_lanes(u_ref),
        tile_lanes(K),
        tile_lanes(k),
    ]
    if classes is not None:
        parts += [tile_lanes(classes[0]), tile_lanes(classes[1])]
    packed = jnp.concatenate(parts, axis=1)
    packed = jnp.pad(packed, ((0, 0), (0, E_pad - packed.shape[1]), (0, 0)))
    packed = packed.reshape(T_pad, E_pad, L_pad // block_b, S_b, 128)

    x0_l = jnp.pad(jnp.tile(x0, (A, 1)).T, ((0, 0), (0, L_pad - L)))
    x0_l = x0_l.reshape(nx, L_pad // block_b, S_b, 128)
    alpha_l = jnp.pad(jnp.repeat(alphas, B)[None, :], ((0, 0), (0, L_pad - L)))
    alpha_l = alpha_l.reshape(1, L_pad // block_b, S_b, 128)

    Eo_pad = _pad8(nx + na)
    Lb = L_pad // block_b
    grid = (Lb, n_chunks)

    kernel = partial(_rollout_kernel, lf, nx, na, m_cl, t_chunk, n_chunks, T,
                     (S_b, 128))
    out_p, cost_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_const_spec(cs) for cs in lf.consts2d]
        + [
            pl.BlockSpec((t_chunk, E_pad, 1, S_b, 128),
                         lambda lb, cc: (cc, 0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, 1, S_b, 128), lambda lb, cc: (0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_b, 128), lambda lb, cc: (0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk, Eo_pad, 1, S_b, 128),
                         lambda lb, cc: (cc, 0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1, S_b, 128), lambda lb, cc: (0, lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (T_pad, Eo_pad, L_pad // block_b, S_b, 128), dtype),
            jax.ShapeDtypeStruct((8, L_pad // block_b, S_b, 128), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((_pad8(nx + 1), S_b, 128), dtype)],
        interpret=interpret,
    )(*lf.consts2d, packed, x0_l, alpha_l)
    out_p = out_p.reshape(T_pad, Eo_pad, L_pad)
    cost_p = cost_p.reshape(8, L_pad)

    xu = out_p[:T, :, :L].transpose(2, 0, 1)        # (L, T, Eo_pad)
    xs_steps = xu[:, :, :nx].reshape(A, B, T, nx)
    us = xu[:, :, nx: nx + na].reshape(A, B, T, na)
    x0_ab = jnp.broadcast_to(x0[None], (A, B, nx))
    xs2 = jnp.concatenate([x0_ab[:, :, None, :], xs_steps], axis=2)

    run_cost = cost_p[0, :L].reshape(A, B)
    # terminal cost on the final states (one tiny vmapped eval in XLA)
    fin = jax.vmap(jax.vmap(final_cost))(xs_steps[:, :, -1])
    return xs2, us, run_cost + fin
