"""Articulated-body dynamics: FK, velocity kinematics, ABA forward dynamics,
CRBA mass matrix, RNEA inverse dynamics, and point Jacobians.

TPU-first re-design of the reference's Featherstone implementation
(`Skeleton::computeForwardDynamics` `Skeleton.cpp:13034` via per-body
`BodyNode::updateArtInertia/updateBiasForce/updateAccelerationFD`,
`BodyNode.hpp:1025-1060`; the flat-array `SimpleFeatherstone` variant,
`dart/dynamics/SimpleFeatherstone.hpp:48-70`, is the closest structural
relative). Key differences:

  * Topology is static Python data — loops over bodies unroll at trace
    time into straight-line XLA ops on small (6,) / (6,6) tensors.
  * Batching over worlds/scenarios is `vmap`: every 6x6 op becomes a
    (B,6,6) batched op that XLA maps onto the VPU/MXU. The tree dimension
    is tiny (2–60 bodies); the batch dimension carries the parallelism.
  * All functions are pure and differentiable by JAX AD. Contact-free
    gradients need no custom rules at all (the reference's
    `dart/neural` Jacobians-by-hand exist only because C++ lacks AD;
    contact gradients DO need the custom implicit rule — see
    `contact_grad.py`).

All quantities follow spatial-vector conventions of lie.py: angular-first,
body-frame unless suffixed `_w` (world).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import joints as J
from nimblephysics_tpu.ops import lie
from nimblephysics_tpu.ops import linalg_small
from nimblephysics_tpu.ops.lie import Transform
from nimblephysics_tpu.ops.spatial import spatial_inertia


class Kinematics(NamedTuple):
    """Per-body kinematic quantities (lists of length num_bodies)."""

    T_wb: List[Transform]  # body -> world
    T_pc: List[Transform]  # child body -> parent body
    S: List[jax.Array]     # (6, ndof) child-frame motion subspace


class VelKinematics(NamedTuple):
    V: List[jax.Array]      # (6,) body-frame spatial velocity
    c: List[jax.Array]      # (6,) velocity-product bias: Ṡq̇ + V × Sq̇


def forward_kinematics(model: Model, q: jax.Array) -> Kinematics:
    T_wb: List[Transform] = []
    T_pc: List[Transform] = []
    S: List[jax.Array] = []
    for i, jt in enumerate(model.joint_types):
        qi = q[model.joint_slice(i)]
        T_pj = Transform(model.T_pj.R[i], model.T_pj.p[i])
        T_cj = Transform(model.T_cj.R[i], model.T_cj.p[i])
        spec = model.custom_spec(i)
        Q = J.joint_transform(jt, qi, model.axes[i], spec)
        Ti = T_pj.compose(Q).compose(T_cj.inverse())
        T_pc.append(Ti)
        S.append(J.child_subspace(jt, qi, model.axes[i], T_cj, spec))
        p = model.parents[i]
        T_wb.append(Ti if p < 0 else T_wb[p].compose(Ti))
    return Kinematics(T_wb=T_wb, T_pc=T_pc, S=S)


def _subspaces_with_rates(model: Model, q: jax.Array, v: jax.Array):
    S, cJ = [], []
    for i, jt in enumerate(model.joint_types):
        sl = model.joint_slice(i)
        T_cj = Transform(model.T_cj.R[i], model.T_cj.p[i])
        Si, cJi = J.child_subspace_and_rate(
            jt, q[sl], v[sl], model.axes[i], T_cj, model.custom_spec(i)
        )
        S.append(Si)
        cJ.append(cJi)
    return S, cJ


def velocity_kinematics(
    model: Model, kin: Kinematics, q: jax.Array, v: jax.Array
) -> VelKinematics:
    _, cJ = _subspaces_with_rates(model, q, v)
    V: List[jax.Array] = []
    c: List[jax.Array] = []
    for i in range(model.num_bodies):
        sl = model.joint_slice(i)
        vJ = kin.S[i] @ v[sl]
        p = model.parents[i]
        V_par = (
            jnp.zeros(6, dtype=q.dtype)
            if p < 0
            else lie.Ad_inv_apply(kin.T_pc[i], V[p])
        )
        Vi = V_par + vJ
        V.append(Vi)
        c.append(cJ[i] + lie.ad_motion(Vi, vJ))
    return VelKinematics(V=V, c=c)


def joint_forces(model: Model, q: jax.Array, v: jax.Array, tau: jax.Array) -> jax.Array:
    """Effective generalized force: commanded tau + implicit spring/damping.

    Mirrors `GenericJoint::updateTotalForce`: spring uses the implicitly
    integrated position q + dt·v (this is why the reference's velVel
    Jacobian is I − dt·M⁻¹(D + dt·K + ∂C/∂v)).
    """
    spring = -model.stiffness * (q - model.rest_pos + v * model.dt)
    damp = -model.damping * v
    return tau + spring + damp


def _body_inertias(model: Model) -> jax.Array:
    return spatial_inertia(model.mass, model.com, model.moment)


def aba(
    model: Model,
    q: jax.Array,
    v: jax.Array,
    tau: jax.Array,
    f_ext: Optional[List[jax.Array]] = None,
    include_spring_damper: bool = True,
    kin: Optional[Kinematics] = None,
) -> jax.Array:
    """Articulated Body Algorithm: generalized accelerations q̈ (nq,).

    `f_ext[i]` is an optional body-frame spatial force on body i.
    Gravity enters via the standard fictitious base acceleration −g.
    """
    nb = model.num_bodies
    if kin is None:
        kin = forward_kinematics(model, q)
    vel = velocity_kinematics(model, kin, q, v)
    tau_eff = joint_forces(model, q, v, tau) if include_spring_damper else tau
    I_body = _body_inertias(model)

    IA = [None] * nb
    pA = [None] * nb
    for i in range(nb):
        IA[i] = I_body[i]
        bias = lie.ad_dual(vel.V[i], I_body[i] @ vel.V[i])
        if f_ext is not None and f_ext[i] is not None:
            bias = bias - f_ext[i]
        pA[i] = bias

    U = [None] * nb
    Dinv = [None] * nb
    u = [None] * nb
    for i in reversed(range(nb)):
        Si = kin.S[i]
        nd = Si.shape[1]
        if nd > 0:
            U[i] = IA[i] @ Si                             # (6, nd)
            D = Si.T @ U[i]                               # (nd, nd)
            # D is the SPD joint-space articulated inertia (nd <= 6);
            # unrolled pivot-free inverse keeps the scan body off the
            # serial LU path (ops/linalg_small.py).
            Dinv[i] = linalg_small.inv_spd(D)
            u[i] = tau_eff[model.joint_slice(i)] - Si.T @ pA[i]
            Ia = IA[i] - U[i] @ Dinv[i] @ U[i].T
            pa = pA[i] + Ia @ vel.c[i] + U[i] @ (Dinv[i] @ u[i])
        else:
            Ia = IA[i]
            pa = pA[i] + Ia @ vel.c[i]
        p = model.parents[i]
        if p >= 0:
            X = lie.Ad_inv(kin.T_pc[i])                   # parent -> child motion
            IA[p] = IA[p] + X.T @ Ia @ X
            pA[p] = pA[p] + X.T @ pa

    g_accel = jnp.concatenate([jnp.zeros(3, dtype=q.dtype), -model.gravity.astype(q.dtype)])
    a = [None] * nb
    # dof layout is sequential by joint index (Model.dof_offsets), so qdd is
    # the ordered concatenation of per-joint segments — keeps the graph free
    # of scatter ops (which Mosaic can't lower inside Pallas kernels).
    qdd_parts = []
    for i in range(nb):
        p = model.parents[i]
        a_par = (
            lie.Ad_inv_apply(kin.T_wb[i], g_accel)  # world-frame −g into body frame
            if p < 0
            else lie.Ad_inv_apply(kin.T_pc[i], a[p])
        )
        a_prime = a_par + vel.c[i]
        Si = kin.S[i]
        if Si.shape[1] > 0:
            qdd_i = Dinv[i] @ (u[i] - U[i].T @ a_prime)
            qdd_parts.append(qdd_i)
            a[i] = a_prime + Si @ qdd_i
        else:
            a[i] = a_prime
    return jnp.concatenate(qdd_parts) if qdd_parts else jnp.zeros_like(v)


def rnea(
    model: Model,
    q: jax.Array,
    v: jax.Array,
    qdd: jax.Array,
    f_ext: Optional[List[jax.Array]] = None,
    gravity: bool = True,
) -> jax.Array:
    """Recursive Newton-Euler inverse dynamics: tau(q, v, q̈).

    With qdd=0 this is the combined Coriolis+gravity bias force
    (`Skeleton::getCoriolisAndGravityForces`).
    """
    nb = model.num_bodies
    kin = forward_kinematics(model, q)
    vel = velocity_kinematics(model, kin, q, v)
    I_body = _body_inertias(model)

    g_accel = jnp.concatenate([jnp.zeros(3, dtype=q.dtype), -model.gravity.astype(q.dtype)])
    if not gravity:
        g_accel = jnp.zeros(6, dtype=q.dtype)

    a = [None] * nb
    for i in range(nb):
        p = model.parents[i]
        a_par = (
            lie.Ad_inv_apply(kin.T_wb[i], g_accel)  # world-frame −g into body frame
            if p < 0
            else lie.Ad_inv_apply(kin.T_pc[i], a[p])
        )
        Si = kin.S[i]
        a[i] = a_par + vel.c[i] + (
            Si @ qdd[model.joint_slice(i)]
            if Si.shape[1] > 0
            else jnp.zeros(6, dtype=q.dtype)
        )

    f = [None] * nb
    for i in range(nb):
        f[i] = I_body[i] @ a[i] + lie.ad_dual(vel.V[i], I_body[i] @ vel.V[i])
        if f_ext is not None and f_ext[i] is not None:
            f[i] = f[i] - f_ext[i]

    # scatter-free assembly (see aba): collect per-joint segments in the
    # backward sweep, then concatenate in joint order.
    tau_parts = [None] * nb
    for i in reversed(range(nb)):
        Si = kin.S[i]
        if Si.shape[1] > 0:
            tau_parts[i] = Si.T @ f[i]
        p = model.parents[i]
        if p >= 0:
            f[p] = f[p] + lie.Ad_dual_apply(kin.T_pc[i], f[i])
    parts = [t for t in tau_parts if t is not None]
    return jnp.concatenate(parts) if parts else jnp.zeros_like(v)


def mass_matrix(
    model: Model, q: jax.Array, kin: Optional[Kinematics] = None
) -> jax.Array:
    """Composite Rigid Body Algorithm: M(q) (nq, nq)."""
    nb, nq = model.num_bodies, model.nq
    if kin is None:
        kin = forward_kinematics(model, q)
    I_body = _body_inertias(model)
    Ic = [I_body[i] for i in range(nb)]
    for i in reversed(range(nb)):
        p = model.parents[i]
        if p >= 0:
            X = lie.Ad_inv(kin.T_pc[i])
            Ic[p] = Ic[p] + X.T @ Ic[i] @ X
    # collect per-(joint, joint) blocks, then assemble the matrix by
    # CONCATENATION over the static dof layout (scatter-free: lane-kernel
    # compatible and avoids TPU's serialized scatter lowering)
    blocks = {}
    for i in range(nb):
        Si = kin.S[i]
        nd = Si.shape[1]
        if nd == 0:
            continue
        F = Ic[i] @ Si                                   # (6, nd)
        blocks[(i, i)] = Si.T @ F
        jidx = i
        while model.parents[jidx] >= 0:
            # move F to the parent frame and dot against its subspace
            F = jax.vmap(lambda col: lie.Ad_dual_apply(kin.T_pc[jidx], col), 1, 1)(F)
            jidx = model.parents[jidx]
            Sj = kin.S[jidx]
            if Sj.shape[1] > 0:
                blk = Sj.T @ F                           # (ndj, ndi)
                blocks[(jidx, i)] = blk
                blocks[(i, jidx)] = blk.T
    ndofs = [kin.S[i].shape[1] for i in range(nb)]
    rows = []
    for a in range(nb):
        if ndofs[a] == 0:
            continue
        row = []
        for b in range(nb):
            if ndofs[b] == 0:
                continue
            row.append(
                blocks.get(
                    (a, b), jnp.zeros((ndofs[a], ndofs[b]), dtype=q.dtype)
                )
            )
        rows.append(jnp.concatenate(row, axis=1))
    if not rows:
        return jnp.zeros((nq, nq), dtype=q.dtype)
    return jnp.concatenate(rows, axis=0)


def coriolis_and_gravity(model: Model, q: jax.Array, v: jax.Array) -> jax.Array:
    """C(q,v)·v + g(q) = rnea(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros_like(v))


def world_jacobian(model: Model, kin: Kinematics) -> jax.Array:
    """Stacked world-frame spatial Jacobians: (nb, 6, nq).

    Column d (a dof of ancestor joint k) of body b's Jacobian is
    Ad(T_w,k) S_k[:, d]; the spatial velocity reference point is the world
    origin (so point velocity at world point x is v + ω × x).
    """
    nb, nq = model.num_bodies, model.nq
    cols_w = []  # (6, ndof) world-frame columns per joint
    for i in range(nb):
        Si = kin.S[i]
        if Si.shape[1] > 0:
            cols_w.append(jax.vmap(lambda c: lie.Ad_apply(kin.T_wb[i], c), 1, 1)(Si))
        else:
            cols_w.append(Si)
    # assemble each body row by CONCATENATION over the static dof layout
    # (ancestor joints contribute their world columns, others zeros) —
    # scatter-free so the lane kernels (ops/lanevmap.py) can evaluate it,
    # and faster on TPU than the serial .at[].set scatter chain
    dtype = model.mass.dtype
    Js = []
    for b in range(nb):
        ancestors = set()
        k = b
        while k >= 0:
            ancestors.add(k)
            k = model.parents[k]
        blocks = []
        for k in range(nb):
            nd = kin.S[k].shape[1]
            if nd == 0:
                continue
            if k in ancestors:
                blocks.append(cols_w[k])
            else:
                blocks.append(jnp.zeros((6, nd), dtype=dtype))
        Js.append(
            jnp.concatenate(blocks, axis=1)
            if blocks
            else jnp.zeros((6, nq), dtype=dtype)
        )
    return jnp.stack(Js)


def point_jacobian(
    model: Model, kin: Kinematics, body_index: int, point_w: jax.Array
) -> jax.Array:
    """(3, nq) Jacobian of the world-frame velocity of a world point rigidly
    attached to a body. Used to build contact constraint rows."""
    Jw = world_jacobian(model, kin)[body_index]
    w_cols, v_cols = Jw[:3], Jw[3:]
    return v_cols + jnp.cross(w_cols, point_w[:, None], axis=0)


def com_position(model: Model, kin: Kinematics) -> jax.Array:
    """World COM of the whole model (mass-weighted)."""
    total = jnp.sum(model.mass)
    acc = jnp.zeros(3, dtype=model.mass.dtype)
    for i in range(model.num_bodies):
        acc = acc + model.mass[i] * kin.T_wb[i].apply(model.com[i])
    return acc / total
