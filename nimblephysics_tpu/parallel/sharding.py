"""Mesh-parallel solvers: the reference's concurrency, re-based on ICI.

Reference parallelism inventory (SURVEY.md §2.5):
  * `std::async` over shooting segments (`MultiShot.cpp:183-202`)
    -> a "seg" mesh axis: segment rollouts run on separate devices, the
       knot-defect coupling is a neighbor exchange (`ppermute`) + `psum`
  * scenario fan-out (domain randomization / batched MPC)
    -> a "dp" mesh axis: worlds are embarrassingly parallel, reductions
       (aggregate costs/metrics) ride ICI via `psum`

Everything is `shard_map` over a `jax.sharding.Mesh`; XLA inserts the
collectives. Multi-host extends the same mesh over DCN without code
changes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.simulation.step import rollout
from nimblephysics_tpu.trajectory.ilqr import ILQRConfig, ilqr_solve


def make_mesh(axes: Sequence[tuple] = (("dp", -1),), devices=None) -> Mesh:
    """Build a mesh; axis size -1 consumes all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    sizes = []
    remaining = devices.size
    for _, s in axes:
        if s == -1:
            sizes.append(remaining)
        else:
            sizes.append(s)
            remaining //= s
    names = tuple(n for n, _ in axes)
    return Mesh(devices.reshape(sizes), names)


def sharded_mpc_solves(
    model: Model,
    mesh: Mesh,
    running_cost: Callable,
    final_cost: Callable,
    horizon: int,
    iters: int = 8,
    axis: str = "dp",
    with_classes: bool = False,
    fused: bool = False,
    contact: bool = False,
    block_b: int = 1024,
    config: Optional[ILQRConfig] = None,
):
    """Return a jitted fn: (x0_flat (B, 2nq), u_warm (B, H, na)) ->
    (u (B,H,na), mean_cost ()) with B sharded over `axis`.

    This is the scale-out of the BASELINE metric: B scenario replans per
    call, scenarios split across devices, one psum for the aggregate cost.

    `with_classes=True` adds a third argument: per-world FrozenClasses
    with leading (B, H) axes (from `ops/frozen_contact.rollout_classes`
    vmapped over worlds), sharded over `axis` alongside the states — the
    contact-model MPC fast path on the mesh.

    `fused=True` runs the PRODUCTION composition for the scale-out config
    (SURVEY §6 config 5): each shard executes `ilqr_solve_batch` — the
    fused Pallas linearize/Riccati/rollout pipeline bench.py times — on
    its local worlds, instead of `vmap(ilqr_solve)`'s scan-based XLA path.
    With `contact=True` each shard runs the full contact-MPC replan
    (`solve_contact_mpc_batch`: one full-LCP mode-sequence rollout + the
    fused frozen-mode iLQR; reference: MPCLocal::optimizePlan fan-out,
    dart/realtime/MPCLocal.cpp:255-300 + MultiShot.cpp:183-202).
    """
    cfg = config if config is not None else ILQRConfig(iters=iters)

    def solve_one(x0_flat, u_warm, classes=None):
        sol = ilqr_solve(
            model, State.from_flat(x0_flat), u_warm, running_cost, final_cost,
            cfg, classes=classes,
        )
        return sol.u, sol.cost

    if fused:
        from nimblephysics_tpu.trajectory.ilqr import (
            ilqr_solve_batch,
            solve_contact_mpc_batch,
        )

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P()),
            # pallas_call outputs carry no varying-mesh-axes metadata;
            # the per-shard program is replicated-by-construction here
            check_vma=False,
        )
        def solve_shard(x0s, u_warms):
            if contact:
                sol, _ = solve_contact_mpc_batch(
                    model, x0s, u_warms, running_cost, final_cost, cfg,
                    outer_iters=1, block_b=block_b,
                )
            else:
                sol = ilqr_solve_batch(
                    model, x0s, u_warms, running_cost, final_cost, cfg,
                    block_b=block_b,
                )
            total = jax.lax.psum(jnp.sum(sol.cost), axis)
            return sol.u, total / x0s.shape[0] / jax.lax.psum(1, axis)

        return jax.jit(solve_shard)

    if with_classes:
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P()),
        )
        def solve_shard(x0s, u_warms, classes):
            us, costs = jax.vmap(solve_one)(x0s, u_warms, classes)
            total = jax.lax.psum(jnp.sum(costs), axis)
            return us, total / x0s.shape[0] / jax.lax.psum(1, axis)
    else:
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P()),
        )
        def solve_shard(x0s, u_warms):
            us, costs = jax.vmap(solve_one)(x0s, u_warms)
            total = jax.lax.psum(jnp.sum(costs), axis)
            return us, total / x0s.shape[0] / jax.lax.psum(1, axis)

    return jax.jit(solve_shard)


def sharded_multishoot_step(
    model: Model,
    mesh: Mesh,
    loss_of_traj: Callable,
    seg_len: int,
    axis: str = "seg",
):
    """One multiple-shooting evaluation with SEGMENTS sharded over `axis`
    (the reference's per-shot `std::async` fan-out, `MultiShot.cpp:183-202`,
    as a mesh axis): each device rolls its segments, knot defects are formed
    by exchanging segment end-states with the right neighbor via ppermute,
    and the total objective reduces with psum.

    Returns a jitted fn: (starts_q (S,nq), starts_v (S,nq), u (S,L,na)) ->
    (total_loss (), defects (S, 2nq) [row s = x_end(s) − x_start(s+1), last
    row zero]).
    """
    n_seg_devices = mesh.shape[axis]

    def rollout_segment(sq, sv, su):
        final, traj = rollout(model, State(sq, sv), su)
        return traj.q, traj.v, final.q, final.v

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis)),
    )
    def eval_shard(starts_q, starts_v, u):
        qs, vs, fq, fv = jax.vmap(rollout_segment)(starts_q, starts_v, u)
        local_loss = loss_of_traj(qs, vs, u)
        total_loss = jax.lax.psum(local_loss, axis)

        # neighbor exchange: device d sends its first start-state to d-1 so
        # d can form defects against the segment that FOLLOWS its last one.
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % n_seg_devices) for i in range(n_seg_devices)]
        next_q = jax.lax.ppermute(starts_q[:1], axis, perm)  # (1, nq)
        next_v = jax.lax.ppermute(starts_v[:1], axis, perm)
        starts_q_next = jnp.concatenate([starts_q[1:], next_q], axis=0)
        starts_v_next = jnp.concatenate([starts_v[1:], next_v], axis=0)
        dq = fq - starts_q_next
        dv = fv - starts_v_next
        defects = jnp.concatenate([dq, dv], axis=-1)
        # last global segment has no successor: zero its defect row
        is_last_dev = idx == n_seg_devices - 1
        row_ids = jnp.arange(defects.shape[0])
        last_row = defects.shape[0] - 1
        mask = jnp.where(
            is_last_dev & (row_ids == last_row), 0.0, 1.0
        )[:, None]
        return total_loss, defects * mask

    return jax.jit(eval_shard)
