"""Dynamics fitting — the `DynamicsFitter` core (DynamicsFitter.hpp:33-1633).

The reference fits mass/COM/inertia (+ fine-tunes motion) so inverse
dynamics matches force-plate data, organized around `ResidualForceHelper`:
the root-dof components of RNEA are the "residual forces" a physical
trajectory must not need. Here:

  * `root_residuals` — inverse dynamics residual at the (unactuated) root
    dofs given observed motion and measured external forces
  * `fit_inertia` — one jitted Adam solve over {log-masses, COM offsets}
    minimizing residuals over the trial (vmapped over frames), the role of
    `runIPOPTOptimization` + `zeroLinearResidualsAndOptimizeAngular`
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


def root_residuals(
    model: Model,
    q: jax.Array,
    v: jax.Array,
    qdd: jax.Array,
    root_dofs: Sequence[int],
    f_ext: Optional[list] = None,
) -> jax.Array:
    """Inverse-dynamics force at the root dofs (`ResidualForceHelper::
    calculateResidual`): zero for physically consistent motion + forces."""
    tau = dyn.rnea(model, q, v, qdd, f_ext=f_ext)
    return tau[jnp.asarray(root_dofs, dtype=jnp.int32)]


class InertiaFitResult(NamedTuple):
    masses: jax.Array
    coms: jax.Array
    loss_history: jax.Array
    final_residual_rms: jax.Array
    moments: jax.Array = None      # (nb, 3, 3) fitted rotational inertia


def fit_inertia(
    model: Model,
    qs: jax.Array,     # (T, nq) observed positions
    vs: jax.Array,     # (T, nq)
    qdds: jax.Array,   # (T, nq)
    root_dofs: Sequence[int],
    taus: Optional[jax.Array] = None,   # (T, nq) known applied forces
    wrenches: Optional[jax.Array] = None,  # (T, nb, 6) body-frame ext wrenches
    iters: int = 400,
    lr: float = 2e-2,
    fit_coms: bool = True,
    fit_inertias: bool = False,
    regularize: float = 1e-3,
    com_bound: float = 0.05,
    inertia_bound: float = 0.7,
) -> InertiaFitResult:
    """Fit body masses (and COMs, and with `fit_inertias` the rotational
    inertia) so root residuals vanish across the trial. Inertia is
    parameterized as M' = S M S with S = diag(exp(d/2)) — an SPD-preserving
    per-axis log-scale of the body moment, the TPU analogue of the
    reference's bounded per-entry inertia fit
    (DynamicsFitter.hpp:1553 runIPOPTOptimization's GROUP_INERTIAS block,
    dart/neural/WithRespectTo.hpp:66-75)."""
    dtype = model.mass.dtype
    root_idx = jnp.asarray(tuple(root_dofs), dtype=jnp.int32)

    params0 = dict(
        log_mass=jnp.log(model.mass),
        d_com=jnp.zeros_like(model.com),
        d_log_I=jnp.zeros((model.num_bodies, 3), dtype=dtype),
    )

    # BOUNDED perturbations (tanh trust region): the reference's IPOPT
    # stage bounds its inertial variables for the same reason — COM and
    # rotational inertia are weakly identified from one trial's
    # FD-differentiated kinematics, and an unbounded least-squares fit
    # dumps acceleration noise into them (measured: |d_log_I| exploding
    # to ~4 logs on the Arnold walk data). Bounds: COM +-com_bound
    # meters per axis, inertia diag scale within exp(+-inertia_bound).
    def com_of(params):
        return jnp.tanh(params["d_com"] / com_bound) * com_bound

    def moment_of(params):
        if not fit_inertias:
            return model.moment
        d = jnp.tanh(params["d_log_I"] / inertia_bound) * inertia_bound
        S = jnp.exp(0.5 * d)
        return model.moment * S[:, :, None] * S[:, None, :]

    def residual_frame(m2, q, v, qdd, tau_known, w=None):
        f_ext = (
            [w[i] for i in range(m2.num_bodies)] if w is not None else None
        )
        tau = dyn.rnea(m2, q, v, qdd, f_ext=f_ext)
        r = tau[root_idx]
        if tau_known is not None:
            r = r - tau_known[root_idx]
        return r

    def loss(params):
        m2 = model.replace(
            mass=jnp.exp(params["log_mass"]),
            com=model.com + (com_of(params) if fit_coms else 0.0),
            moment=moment_of(params),
        )
        res = _residuals(m2)
        reg = regularize * (
            jnp.mean((params["log_mass"] - jnp.log(model.mass)) ** 2)
            + jnp.mean(params["d_com"] ** 2)
            + jnp.mean(params["d_log_I"] ** 2)
        )
        return jnp.mean(res * res) + reg

    def _residuals(m2):
        if taus is not None and wrenches is not None:
            return jax.vmap(
                lambda q, v, a, t, w: residual_frame(m2, q, v, a, t, w)
            )(qs, vs, qdds, taus, wrenches)
        if taus is not None:
            return jax.vmap(
                lambda q, v, a, t: residual_frame(m2, q, v, a, t)
            )(qs, vs, qdds, taus)
        if wrenches is not None:
            return jax.vmap(
                lambda q, v, a, w: residual_frame(m2, q, v, a, None, w)
            )(qs, vs, qdds, wrenches)
        return jax.vmap(lambda q, v, a: residual_frame(m2, q, v, a, None))(
            qs, vs, qdds
        )

    opt = optax.adam(lr)

    def body(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), val

    (params, _), hist = jax.lax.scan(
        body, (params0, opt.init(params0)), None, length=iters
    )
    masses = jnp.exp(params["log_mass"])
    coms = model.com + (com_of(params) if fit_coms else 0.0)
    moments = moment_of(params)
    m2 = model.replace(mass=masses, com=coms, moment=moments)
    res = _residuals(m2)
    return InertiaFitResult(
        masses=masses,
        coms=coms,
        loss_history=hist,
        final_residual_rms=jnp.sqrt(jnp.mean(res * res)),
        moments=moments,
    )


# ---------------------------------------------------------------------------
# Multi-stage residual-elimination pipeline
# (reference: DynamicsFitter.hpp:1334-1500 — estimateFootGroundContacts,
#  zeroLinearResidualsOnCOMTrajectory, zeroLinearResidualsAndOptimizeAngular,
#  timeSyncTrialGRF, timeSyncAndInitializePipeline)
# ---------------------------------------------------------------------------

import numpy as np

from nimblephysics_tpu.ops import lie


def body_wrench_from_world_force(T_wb, F_w, p_w, M_w=None):
    """World force F at world point p (+free moment M) -> body-frame spatial
    force (torque; force) on the body whose world pose is T_wb."""
    tau_w = jnp.cross(p_w - T_wb.p, F_w) + (0.0 if M_w is None else M_w)
    Rt = T_wb.R.T
    return jnp.concatenate([Rt @ tau_w, Rt @ F_w])


def com_trajectory(model: Model, qs: jax.Array) -> jax.Array:
    """(T,3) whole-body COM for each frame."""
    def one(q):
        kin = dyn.forward_kinematics(model, q)
        return dyn.com_position(model, kin)
    return jax.vmap(one)(qs)


class LinearResidualFit(NamedTuple):
    mass_scale: jax.Array     # total-mass multiplier solved in closed form
    qs: jax.Array             # poses with the COM-consistent root translation
    com_target: jax.Array     # (T,3) the force-implied COM trajectory
    residual_before: jax.Array
    residual_after: jax.Array


def zero_linear_residuals(
    model: Model,
    qs: jax.Array,            # (T, nq)
    total_force: jax.Array,   # (T, 3) summed external (ground) force, world N
    root_trans_dofs: Sequence[int],
    fit_mass: bool = True,
) -> LinearResidualFit:
    """Closed-form stage 1 of the reference pipeline
    (`zeroLinearResidualsOnCOMTrajectory`, DynamicsFitter.hpp:1400): the COM
    must satisfy m·(p̈ − g) = ΣF, so the force-implied COM trajectory is
    p(t) = p0 + v0·t + (1/m)·𝕀𝕀[F](t) + 𝕀𝕀[g](t) — LINEAR in (p0, v0, 1/m).
    One least-squares solve fits all three to the kinematic COM, then the
    root translation is shifted so the model's COM rides the implied
    trajectory exactly and all masses are scaled by the solved total mass."""
    T = qs.shape[0]
    dtype = qs.dtype
    dt = jnp.asarray(model.dt, dtype=dtype)
    p_kin = com_trajectory(model, qs)                       # (T,3)
    m0 = jnp.sum(model.mass)

    def double_integral(a):   # semi-implicit: v+=a dt; p+=v dt
        v = jnp.cumsum(a, axis=0) * dt
        return jnp.concatenate(
            [jnp.zeros((1, 3), dtype=dtype), jnp.cumsum(v, axis=0)[:-1] * dt]
        )

    II_F = double_integral(total_force)                     # x (1/m)
    II_g = double_integral(jnp.broadcast_to(model.gravity, (T, 3)).astype(dtype))
    tgrid = jnp.arange(T, dtype=dtype) * dt

    # unknowns x = [p0(3), v0(3), alpha=1/m]; rows = 3T
    ones = jnp.ones(T, dtype=dtype)
    zeros = jnp.zeros(T, dtype=dtype)
    rows = []
    rhs = []
    for ax in range(3):
        cols = [ones if k == ax else zeros for k in range(3)]
        cols += [tgrid if k == ax else zeros for k in range(3)]
        cols += [II_F[:, ax]]
        rows.append(jnp.stack(cols, axis=1))                # (T,7)
        rhs.append(p_kin[:, ax] - II_g[:, ax])
    A = jnp.concatenate(rows, axis=0)                       # (3T,7)
    b = jnp.concatenate(rhs, axis=0)
    if fit_mass:
        x, *_ = jnp.linalg.lstsq(A, b)
    else:
        alpha0 = 1.0 / m0
        x6, *_ = jnp.linalg.lstsq(A[:, :6], b - A[:, 6] * alpha0)
        x = jnp.concatenate([x6, alpha0[None]])
    p0, v0, alpha = x[:3], x[3:6], x[6]
    p_implied = (
        p0[None, :] + tgrid[:, None] * v0[None, :] + alpha * II_F + II_g
    )
    delta = p_implied - p_kin                               # world shift per frame

    # push the shift through the root joint's translation dofs (accounting
    # for the root joint frame orientation)
    idx = jnp.asarray(tuple(root_trans_dofs), dtype=jnp.int32)
    R_pj = model.T_pj.R[0]
    delta_q = delta @ R_pj                                  # = R_pjᵀ · delta row-wise
    qs_new = qs.at[:, idx].add(delta_q.astype(dtype))

    def lin_res(q_traj, mscale):
        p = com_trajectory(model, q_traj)
        acc = (p[2:] - 2 * p[1:-1] + p[:-2]) / dt**2
        return (m0 * mscale) * (acc - model.gravity[None, :]) - total_force[1:-1]

    mass_scale = 1.0 / (alpha * m0)
    return LinearResidualFit(
        mass_scale=mass_scale,
        qs=qs_new,
        com_target=p_implied,
        residual_before=jnp.sqrt(jnp.mean(lin_res(qs, 1.0) ** 2)),
        residual_after=jnp.sqrt(jnp.mean(lin_res(qs_new, mass_scale) ** 2)),
    )


def _fd_derivatives(qs, dt):
    """Central-difference velocities/accelerations over a pose trajectory."""
    v = (qs[2:] - qs[:-2]) / (2 * dt)
    a = (qs[2:] - 2 * qs[1:-1] + qs[:-2]) / dt**2
    return qs[1:-1], v, a


def optimize_angular_residuals(
    model: Model,
    qs: jax.Array,                 # (T, nq)
    wrenches: jax.Array,           # (T, nb, 6) body-frame external wrenches
    root_dofs: Sequence[int],      # root ROTATION dofs to adjust
    all_root_dofs: Sequence[int],  # full root (residual rows to score)
    iters: int = 150,
    lr: float = 2e-3,
    regularize: float = 10.0,
):
    """Stage 2 (`zeroLinearResidualsAndOptimizeAngular`): gradient-optimize
    the root-rotation trajectory so the RNEA root residuals (computed with
    the measured external wrenches applied) vanish, regularized toward the
    kinematic fit. One jitted Adam solve; FD velocities/accelerations keep
    it parity with the reference's discrete formulation."""
    dtype = qs.dtype
    dt = jnp.asarray(model.dt, dtype=dtype)
    rot_idx = jnp.asarray(tuple(root_dofs), dtype=jnp.int32)
    res_idx = jnp.asarray(tuple(all_root_dofs), dtype=jnp.int32)
    nb = model.num_bodies

    def residuals(q_traj):
        qm, vm, am = _fd_derivatives(q_traj, dt)
        wm = wrenches[1:-1]

        def frame(q, v, a, w):
            f_ext = [w[i] for i in range(nb)]
            tau = dyn.rnea(model, q, v, a, f_ext=f_ext)
            return tau[res_idx]

        return jax.vmap(frame)(qm, vm, am, wm)

    def loss(dq):
        q_traj = qs.at[:, rot_idx].add(dq)
        r = residuals(q_traj)
        return jnp.mean(r * r) + regularize * jnp.mean(dq * dq)

    opt = optax.adam(lr)
    dq0 = jnp.zeros((qs.shape[0], len(tuple(root_dofs))), dtype=dtype)

    def body(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s, p)
        return (optax.apply_updates(p, up), s), val

    (dq, _), hist = jax.lax.scan(body, (dq0, opt.init(dq0)), None, length=iters)
    qs_new = qs.at[:, rot_idx].add(dq)
    r = residuals(qs_new)
    return qs_new, jnp.sqrt(jnp.mean(r * r)), hist


def estimate_foot_ground_contacts(
    model: Model,
    qs: jax.Array,
    plates,                        # list[ForcePlate]
    foot_bodies: Sequence[int],
    force_threshold: float = 10.0,
):
    """Per-frame assignment of force plates to feet
    (`estimateFootGroundContacts`, DynamicsFitter.hpp:1334): a plate with
    |F| over threshold is assigned to the foot whose body origin is nearest
    its COP. Returns body-frame wrench array (T, nb, 6) + (T, n_feet) mask."""
    T = qs.shape[0]
    nb = model.num_bodies
    feet = tuple(foot_bodies)

    def foot_pos(q):
        kin = dyn.forward_kinematics(model, q)
        return jnp.stack([kin.T_wb[f].p for f in feet])     # (n_feet,3)

    fp = jax.vmap(foot_pos)(qs)                             # (T,n_feet,3)
    fp_np = np.asarray(fp)

    mask = np.zeros((T, len(feet)), dtype=bool)

    # host-side assignment (discrete), then body-frame wrench accumulation
    # through jitted FK per frame chunk
    def wrench_frame(q, F, cop, M, foot_sel):
        kin = dyn.forward_kinematics(model, q)
        out = jnp.zeros((nb, 6), dtype=q.dtype)
        for k, f in enumerate(feet):
            w = body_wrench_from_world_force(kin.T_wb[f], F[k], cop[k], M[k])
            out = out.at[f].add(w * foot_sel[k])
        return out

    Fk = np.zeros((T, len(feet), 3))
    Ck = np.zeros((T, len(feet), 3))
    Mk = np.zeros((T, len(feet), 3))
    for p in plates:
        n = min(T, p.forces.shape[0])
        active = np.linalg.norm(p.forces[:n], axis=1) > force_threshold
        d = np.linalg.norm(fp_np[:n] - p.cop[:n, None, :], axis=2)
        nearest = np.argmin(d, axis=1)
        for t in np.nonzero(active)[0]:
            k = nearest[t]
            Fk[t, k] += p.forces[t]
            Ck[t, k] = p.cop[t]
            mask[t, k] = True

    sel = jnp.asarray(mask, dtype=qs.dtype)
    w = jax.vmap(wrench_frame)(
        qs, jnp.asarray(Fk, dtype=qs.dtype), jnp.asarray(Ck, dtype=qs.dtype),
        jnp.asarray(Mk, dtype=qs.dtype), sel,
    )
    return w, jnp.asarray(mask)


class DynamicsReport(NamedTuple):
    qs: jax.Array
    masses: jax.Array
    coms: jax.Array
    mass_scale: jax.Array
    linear_residual_before: jax.Array
    linear_residual_after: jax.Array
    angular_residual_after: jax.Array
    inertia_residual_rms: jax.Array
    grf_shift: int
    angular_residual_before: jax.Array = None
    moments: jax.Array = None


def time_sync_grf(
    model, qs, total_force, root_trans_dofs, max_shift: int = 4
):
    """`timeSyncTrialGRF`: slide the GRF stream ±max_shift frames against
    the kinematics, score each by the post-linear-fit residual, keep the
    best shift."""
    best = (None, np.inf)
    solve = jax.jit(
        lambda f: zero_linear_residuals(model, qs, f, root_trans_dofs)
    )
    for s in range(-max_shift, max_shift + 1):
        f = jnp.roll(total_force, s, axis=0)
        fit = solve(f)
        score = float(fit.residual_after)
        if score < best[1]:
            best = (s, score)
    return best[0]


def run_dynamics_pipeline(
    model: Model,
    qs: jax.Array,
    plates,
    foot_bodies: Sequence[int],
    root_trans_dofs: Sequence[int],
    root_rot_dofs: Sequence[int],
    shift_grf: bool = False,
    angular_iters: int = 150,
    inertia_iters: int = 300,
    fit_inertias: bool = True,
) -> Tuple[Model, DynamicsReport]:
    """`timeSyncAndInitializePipeline` (DynamicsFitter.hpp:1461): contacts →
    (optional GRF time sync) → closed-form linear residual zeroing → angular
    residual optimization → per-body mass/COM fit. Returns the updated model
    and a staged report."""
    dtype = qs.dtype
    T = qs.shape[0]
    total_force = jnp.zeros((T, 3), dtype=dtype)
    for p in plates:
        n = min(T, p.forces.shape[0])
        total_force = total_force.at[:n].add(jnp.asarray(p.forces[:n], dtype=dtype))

    shift = 0
    if shift_grf:
        shift = time_sync_grf(model, qs, total_force, root_trans_dofs)
        total_force = jnp.roll(total_force, shift, axis=0)

    lin = jax.jit(
        lambda: zero_linear_residuals(model, qs, total_force, root_trans_dofs)
    )()
    model1 = model.replace(mass=model.mass * lin.mass_scale)

    wrenches, _ = estimate_foot_ground_contacts(
        model1, lin.qs, plates, foot_bodies
    )
    all_root = tuple(root_rot_dofs) + tuple(root_trans_dofs)
    qs2, ang_res, ang_hist = jax.jit(
        lambda: optimize_angular_residuals(
            model1, lin.qs, wrenches, root_rot_dofs, all_root,
            iters=angular_iters,
        )
    )()
    # ang_hist[0] is the loss at dq = 0 (regularizer vanishes there):
    # the pre-optimization angular residual, reported so goldens can
    # assert an actual REDUCTION (round-5 verdict #6)
    ang_before = jnp.sqrt(ang_hist[0])

    qm, vm, am = _fd_derivatives(qs2, jnp.asarray(model.dt, dtype=dtype))
    fit = jax.jit(
        lambda: fit_inertia(model1, qm, vm, am, all_root,
                            wrenches=wrenches[1:-1], iters=inertia_iters,
                            fit_inertias=fit_inertias)
    )()
    model2 = model1.replace(mass=fit.masses, com=fit.coms,
                            moment=fit.moments)
    # SECOND angular + inertia pass with the fitted inertial model — the
    # reference alternates these stages for the same reason
    # ("zeroLinearResidualsAndOptimizeAngular loops",
    # DynamicsFitter.hpp:1400-1441): optimizing the root rotations
    # against a badly-perturbed mass model walks them toward a corrupted
    # target; the refit model makes the angular descent meaningful.
    qs2, ang_res, ang_hist2 = jax.jit(
        lambda: optimize_angular_residuals(
            model2, qs2, wrenches, root_rot_dofs, all_root,
            iters=angular_iters,
        )
    )()
    ang_before = jnp.sqrt(ang_hist2[0])
    qm, vm, am = _fd_derivatives(qs2, jnp.asarray(model.dt, dtype=dtype))
    fit = jax.jit(
        lambda: fit_inertia(model2, qm, vm, am, all_root,
                            wrenches=wrenches[1:-1], iters=inertia_iters,
                            fit_inertias=fit_inertias)
    )()
    model2 = model2.replace(mass=fit.masses, com=fit.coms,
                            moment=fit.moments)
    report = DynamicsReport(
        qs=qs2, masses=fit.masses, coms=fit.coms,
        mass_scale=lin.mass_scale,
        linear_residual_before=lin.residual_before,
        linear_residual_after=lin.residual_after,
        angular_residual_after=ang_res,
        inertia_residual_rms=fit.final_residual_rms,
        grf_shift=shift,
        angular_residual_before=ang_before,
        moments=fit.moments,
    )
    return model2, report
