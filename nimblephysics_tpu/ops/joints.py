"""Per-joint-type kinematics: relative transform Q(q), motion subspace S(q),
and explicit position integration.

Functional re-design of the reference's joint class hierarchy
(`dart/dynamics/*Joint*`, templated on `GenericJoint<ConfigSpace>` —
`detail/GenericJoint.hpp`). Joint *type* is static Python data, so dispatch
happens at trace time and XLA sees straight-line code; q/v are traced.

Conventions (verified against the reference, which does NOT define
DART_USE_IDENTITY_JACOBIAN):
  * child-to-parent transform: T_pc = T_pj ∘ Q(q) ∘ T_cj⁻¹
  * body-frame relative Jacobian: S_child = Ad(T_cj) S_joint(q), so that
    V_child_rel = S_child q̇  (DART `Joint::getRelativeJacobian`)
  * Ball/Free joints use exp-map coordinates with right-Jacobian subspaces
    (`BallJoint.cpp:286`, `FreeJoint::getRelativeJacobianStatic`), and
    exp-map explicit integration (`BallJoint::integratePositionsExplicit`,
    `FreeJoint::integratePositionsExplicit`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops import lie
from nimblephysics_tpu.ops.functions import eval_fn_spec
from nimblephysics_tpu.ops.lie import Transform

# A CustomSpec is hashable static metadata describing an OpenSim-style
# CustomJoint (dart/dynamics/CustomJoint.hpp:56-95): ndof coordinates drive
# six transform axes through 1-D functions:
#   (ndof, entries) with entries = 6 x ("rot"|"trans", axis xyz tuple,
#   fn_spec (ops/functions.py), coord_index or -1 for constants)
# T = Trans(sum trans_i axis_i f_i) ∘ Rot(prod rot_i about axis_i by f_i),
# translation expressed in the joint(parent-side) frame — OpenSim
# SpatialTransform semantics.


def custom_joint_transform(q: jax.Array, spec) -> Transform:
    ndof, entries = spec
    dtype = q.dtype
    R = jnp.eye(3, dtype=dtype)
    p = jnp.zeros(3, dtype=dtype)
    for kind, axis, fn, coord in entries:
        val = eval_fn_spec(fn, q[coord] if coord >= 0 else jnp.zeros((), dtype))
        a = jnp.asarray(axis, dtype=dtype)
        if kind == "rot":
            R = R @ lie.expm_so3(a * val)
        else:
            p = p + a * val
    return Transform(R, p)


_EULER_AXIS = {"x": 0, "y": 1, "z": 2}
# +90°-about-Z conjugation frame used by the reference's ellipsoid-surface
# joints (EllipsoidJoint.cpp:138-144: eulerR with (1,0)=-1, (0,1)=1, (2,2)=1)
_R90Z = ((0.0, 1.0, 0.0), (-1.0, 0.0, 0.0), (0.0, 0.0, 1.0))


def _euler_R(q: jax.Array, order: str, flip, dtype) -> jax.Array:
    """R = Π_i Rot(axis_i, q_i·flip_i) in the given order (e.g. "xzy").

    Reference: `EulerJoint::convertToTransform`
    (/root/reference/dart/dynamics/EulerJoint.cpp:225)."""
    eye = jnp.eye(3, dtype=dtype)
    R = eye
    for i, ax in enumerate(order):
        R = R @ lie.expm_so3(eye[_EULER_AXIS[ax]] * (q[i] * flip[i]))
    return R


def ellipsoid_joint_transform(q: jax.Array, axes: jax.Array, spec) -> Transform:
    """OpenSim-style EllipsoidJoint: an euler ball rotating a unit vector
    onto an ellipsoid surface (translation = rotated ẑ ⊙ radii).

    Reference: `EllipsoidJoint::getRelativeTransformStatic`
    (/root/reference/dart/dynamics/EllipsoidJoint.cpp:165-196). radii live
    in axes[0] (numeric, so scale-differentiable); (axis order, flip map)
    are static metadata in `spec`."""
    order, flip = spec
    dtype = q.dtype
    radii = axes[0]
    E = jnp.asarray(_R90Z, dtype=dtype)
    rot = E.T @ _euler_R(q[:3], order, flip, dtype) @ E
    p = rot[:, 2] * radii  # rot @ ẑ, component-scaled to the ellipsoid
    return Transform(rot, p)


def scapulathoracic_joint_transform(
    q: jax.Array, axes: jax.Array, spec
) -> Transform:
    """4-dof ScapulathoracicJoint: ellipsoid-surface euler ball (dofs 0-2)
    composed with a "winging" rotation about an axis in the XY plane with
    an offset origin (dof 3).

    Reference: `ScapulathoracicJoint::updateRelativeTransform`
    (/root/reference/dart/dynamics/ScapulathoracicJoint.cpp:154-199).
    axes[0] = ellipsoid radii; axes[1,0:2] = winging axis XY origin;
    axes[1,2] = winging axis direction angle."""
    order, flip = spec
    dtype = q.dtype
    radii = axes[0]
    wing_origin = jnp.concatenate([axes[1, :2], jnp.zeros(1, dtype=dtype)])
    wing_angle = axes[1, 2]
    E = jnp.asarray(_R90Z, dtype=dtype)
    rot = E.T @ _euler_R(q[:3], order, flip, dtype) @ E
    ball_p = rot[:, 2] * radii
    wing_dir = jnp.stack(
        [-jnp.sin(wing_angle), jnp.cos(wing_angle), jnp.zeros((), dtype)]
    )
    wing_R = lie.expm_so3(wing_dir * (q[3] * flip[3]))
    # Trans(o) ∘ Rot ∘ Trans(−o): conjugate the winging rotation by its origin
    wing_p = wing_origin - wing_R @ wing_origin
    return Transform(rot @ wing_R, ball_p + rot @ wing_p)


def constant_curve_transform(
    q: jax.Array, axes: jax.Array, spec, incompressible: bool
) -> Transform:
    """Constant-curvature rod joint (spine models): an XZY euler rotation
    whose translation follows a circular arc of arc-length d bent away from
    vertical (+Y) by the rotation.

    Reference: `ConstantCurveJoint::updateRelativeTransform`
    (/root/reference/dart/dynamics/ConstantCurveJoint.cpp:105-152) and the
    3-dof fixed-length variant
    (ConstantCurveIncompressibleJoint.cpp:170-215). axes[0] = neutral
    position (XZY angles); axes[1,0] = 4th neutral entry (4-dof) or rod
    length (3-dof); axes[1,1] = child Y-scale."""
    (flip,) = spec
    dtype = q.dtype
    scale_y = axes[1, 1]
    if incompressible:
        pos = q + axes[0]
        d = axes[1, 0] * scale_y
    else:
        pos = q[:3] + axes[0]
        d = (q[3] + axes[1, 0]) * scale_y
    rot = _euler_R(pos, "xzy", flip, dtype)
    cx, sx = jnp.cos(pos[0]), jnp.sin(pos[0])
    cz, sz = jnp.cos(pos[1]), jnp.sin(pos[1])
    linear_angle = jnp.stack([-sz, cx * cz, cz * sx])
    sin_theta = jnp.sqrt(linear_angle[0] ** 2 + linear_angle[2] ** 2)
    near_vertical = sin_theta < 1e-3
    degenerate = near_vertical | (sin_theta > 0.999) if incompressible else near_vertical
    # Straight-rod approximation used near the branch limits.
    p_vert = rot @ (jnp.array([0.0, 1.0, 0.0], dtype=dtype) * d)
    # Arc branch with eps-guarded denominators (jnp.where evaluates both
    # branches under AD; the guards keep the unused branch NaN-free).
    st_safe = jnp.clip(sin_theta, 1e-4, 1.0 - 1e-7)
    theta = jnp.arcsin(st_safe)
    r = d / theta
    horizontal = r - r * jnp.cos(theta)
    vertical = r * st_safe
    p_arc = jnp.stack([
        horizontal * (linear_angle[0] / st_safe),
        vertical,
        horizontal * (linear_angle[2] / st_safe),
    ])
    return Transform(rot, jnp.where(degenerate, p_vert, p_arc))


def _subspace_via_autodiff(transform_fn, q: jax.Array) -> jax.Array:
    """Generic motion subspace: column j = (vee(Rᵀ ∂R/∂q_j); Rᵀ ∂p/∂q_j)."""
    Q = transform_fn(q)
    eye = jnp.eye(q.shape[0], dtype=q.dtype)

    def col(e):
        _, (dR, dp) = jax.jvp(lambda qq: tuple(transform_fn(qq)), (q,), (e,))
        Rt = Q.R.T
        return jnp.concatenate([lie.vee(Rt @ dR), Rt @ dp])

    return jax.vmap(col, 0, 1)(eye)


def joint_transform(
    jtype: str, q: jax.Array, axes: jax.Array, custom_spec=None
) -> Transform:
    """Relative transform Q(q) in the joint frame. `axes` is (3, 3): up to
    three static axis row-vectors whose meaning depends on the type."""
    dtype = q.dtype if q.size else axes.dtype
    eye = jnp.eye(3, dtype=dtype)
    zero3 = jnp.zeros(3, dtype=dtype)
    if jtype == "weld":
        return Transform(eye, zero3)
    if jtype == "revolute":
        return Transform(lie.expm_so3(axes[0] * q[0]), zero3)
    if jtype == "prismatic":
        return Transform(eye, axes[0] * q[0])
    if jtype == "universal":
        R = lie.expm_so3(axes[0] * q[0]) @ lie.expm_so3(axes[1] * q[1])
        return Transform(R, zero3)
    if jtype == "translational2d":
        return Transform(eye, axes[0] * q[0] + axes[1] * q[1])
    if jtype == "translational":
        return Transform(eye, q)
    if jtype == "planar":
        # DOF order (trans1, trans2, rot): T = Trans(a1 q0 + a2 q1) ∘ Rot(a3 q2)
        R = lie.expm_so3(axes[2] * q[2])
        return Transform(R, axes[0] * q[0] + axes[1] * q[1])
    if jtype == "screw":
        # rotation about axes[0] coupled with translation pitch*q along it
        # (axes[1][0] stores the pitch — dart/dynamics/ScrewJoint)
        pitch = axes[1, 0]
        return Transform(lie.expm_so3(axes[0] * q[0]), axes[0] * (pitch * q[0]))
    if jtype == "ball":
        return Transform(lie.expm_so3(q), zero3)
    if jtype == "euler_xyz":
        R = (
            lie.expm_so3(eye[0] * q[0])
            @ lie.expm_so3(eye[1] * q[1])
            @ lie.expm_so3(eye[2] * q[2])
        )
        return Transform(R, zero3)
    if jtype == "euler_zyx":
        R = (
            lie.expm_so3(eye[2] * q[0])
            @ lie.expm_so3(eye[1] * q[1])
            @ lie.expm_so3(eye[0] * q[2])
        )
        return Transform(R, zero3)
    if jtype == "free":
        return Transform(lie.expm_so3(q[:3]), q[3:])
    if jtype == "euler_free":
        # EulerFreeJoint (EulerFreeJoint.cpp:225-233): R = EulerXYZ(q[:3])
        # about the JOINT frame axes, translation = q[3:] directly.
        R = (
            lie.expm_so3(eye[0] * q[0])
            @ lie.expm_so3(eye[1] * q[1])
            @ lie.expm_so3(eye[2] * q[2])
        )
        return Transform(R, q[3:])
    if jtype == "custom":
        return custom_joint_transform(q, custom_spec)
    if jtype == "ellipsoid":
        return ellipsoid_joint_transform(q, axes, custom_spec)
    if jtype == "scapulathoracic":
        return scapulathoracic_joint_transform(q, axes, custom_spec)
    if jtype == "constant_curve":
        return constant_curve_transform(q, axes, custom_spec, False)
    if jtype == "constant_curve_incompressible":
        return constant_curve_transform(q, axes, custom_spec, True)
    raise ValueError(f"unknown joint type {jtype!r}")


def joint_subspace(
    jtype: str, q: jax.Array, axes: jax.Array, custom_spec=None
) -> jax.Array:
    """Motion subspace S_joint(q): (6, ndof) such that the joint-frame body
    velocity vee(Q⁻¹ Q̇) = S_joint q̇."""
    dtype = q.dtype if q.size else axes.dtype
    zero3 = jnp.zeros(3, dtype=dtype)

    def col(w, v):
        return jnp.concatenate([w, v])

    if jtype == "weld":
        return jnp.zeros((6, 0), dtype=dtype)
    if jtype == "revolute":
        return col(axes[0], zero3)[:, None]
    if jtype == "prismatic":
        return col(zero3, axes[0])[:, None]
    if jtype == "screw":
        return col(axes[0], axes[0] * axes[1, 0])[:, None]
    if jtype == "universal":
        # V = vee(Q⁻¹Q̇), Q = R1(q0) R2(q1):
        # col0 = (R2⁻¹ a1; 0), col1 = (a2; 0)
        R2_inv = lie.expm_so3(-axes[1] * q[1])
        return jnp.stack([col(R2_inv @ axes[0], zero3), col(axes[1], zero3)], axis=1)
    if jtype == "translational2d":
        return jnp.stack([col(zero3, axes[0]), col(zero3, axes[1])], axis=1)
    if jtype == "translational":
        eye = jnp.eye(3, dtype=dtype)
        return jnp.concatenate([jnp.zeros((3, 3), dtype=dtype), eye], axis=0)
    if jtype == "planar":
        # Q = Trans(t) Rot(R): omega = a3 q̇2, v = Rᵀ(a1 q̇0 + a2 q̇1)
        Rt = lie.expm_so3(-axes[2] * q[2])
        return jnp.stack(
            [col(zero3, Rt @ axes[0]), col(zero3, Rt @ axes[1]), col(axes[2], zero3)],
            axis=1,
        )
    if jtype == "ball":
        Jr = lie.so3_right_jacobian(q)
        return jnp.concatenate([Jr, jnp.zeros((3, 3), dtype=dtype)], axis=0)
    if jtype in ("euler_xyz", "euler_zyx"):
        eye = jnp.eye(3, dtype=dtype)
        order = (0, 1, 2) if jtype == "euler_xyz" else (2, 1, 0)
        # omega = Σ (R_{k>i}⁻¹ e_{order[i]}) q̇_i
        cols = []
        for i in range(3):
            Racc = jnp.eye(3, dtype=dtype)
            for k in range(i + 1, 3):
                Racc = Racc @ lie.expm_so3(eye[order[k]] * q[k])
            cols.append(col(Racc.T @ eye[order[i]], zero3))
        return jnp.stack(cols, axis=1)
    if jtype == "free":
        # S = [[Jr(w), 0], [0, exp(-ŵ)]] (FreeJoint::getRelativeJacobianStatic
        # with T_cj factored out — we apply Ad(T_cj) separately).
        w = q[:3]
        Jr = lie.so3_right_jacobian(w)
        Rt = lie.expm_so3(-w)
        z = jnp.zeros((3, 3), dtype=dtype)
        return jnp.concatenate(
            [
                jnp.concatenate([Jr, z], axis=1),
                jnp.concatenate([z, Rt], axis=1),
            ],
            axis=0,
        )
    if jtype == "euler_free":
        # omega columns: the euler_xyz chain; linear columns: Rᵀ e_i
        # (vee(Q⁻¹Q̇) linear part = Rᵀ ṗ) — the closed form of
        # EulerFreeJoint::computeRelativeJacobianStatic
        # (EulerFreeJoint.cpp:324).
        eye3 = jnp.eye(3, dtype=dtype)
        cols = []
        for i in range(3):
            Racc = jnp.eye(3, dtype=dtype)
            for k in range(i + 1, 3):
                Racc = Racc @ lie.expm_so3(eye3[k] * q[k])
            cols.append(col(Racc.T @ eye3[i], zero3))
        Rt = (
            lie.expm_so3(-eye3[2] * q[2])
            @ lie.expm_so3(-eye3[1] * q[1])
            @ lie.expm_so3(-eye3[0] * q[0])
        )
        for i in range(3):
            cols.append(col(zero3, Rt @ eye3[i]))
        return jnp.stack(cols, axis=1)
    if jtype == "custom":
        return _subspace_via_autodiff(
            lambda qq: custom_joint_transform(qq, custom_spec), q
        )
    if jtype in ("ellipsoid", "scapulathoracic", "constant_curve",
                 "constant_curve_incompressible"):
        # AD replaces the reference's ~7k LoC of hand-derived Jacobians
        # (EllipsoidJoint.cpp:199+, ScapulathoracicJoint.cpp:202+,
        # ConstantCurveJoint.cpp:154+) — FD-verified in tests.
        return _subspace_via_autodiff(
            lambda qq: joint_transform(jtype, qq, axes, custom_spec), q
        )
    raise ValueError(f"unknown joint type {jtype!r}")


def child_subspace(
    jtype: str, q: jax.Array, axes: jax.Array, T_cj: Transform, custom_spec=None
) -> jax.Array:
    """S in the child body frame: Ad(T_cj) S_joint, (6, ndof)."""
    S = joint_subspace(jtype, q, axes, custom_spec)
    return lie.Ad(T_cj) @ S


def child_subspace_and_rate(
    jtype: str, q: jax.Array, v: jax.Array, axes: jax.Array, T_cj: Transform,
    custom_spec=None,
):
    """(S_child, Ṡ_child q̇): the second term is the cJ bias of Featherstone.

    Ṡ q̇ is computed exactly with one jvp through S(q) — the TPU-native
    replacement for DART's hand-derived `updateRelativeJacobianTimeDeriv`.
    """
    if jtype in ("weld", "revolute", "prismatic", "screw", "translational",
                 "translational2d"):
        S = child_subspace(jtype, q, axes, T_cj)
        return S, jnp.zeros(S.shape[:-1], dtype=S.dtype)
    S, S_dot = jax.jvp(
        lambda qq: child_subspace(jtype, qq, axes, T_cj, custom_spec), (q,), (v,)
    )
    return S, S_dot @ v


def integrate_position(
    jtype: str, q: jax.Array, v: jax.Array, dt, axes: jax.Array, T_cj: Transform
) -> jax.Array:
    """Explicit position integration q_{t+1} = f(q_t, v_t, dt).

    Linear for vector-space joints; exp-map retraction for ball/free
    (reference: `BallJoint::integratePositionsExplicit` uses
    R⁺ = R exp(Jr(q) v dt); `FreeJoint::integratePositionsExplicit` uses the
    full relative Jacobian *including* T_cj).
    """
    if jtype == "ball":
        Jr = lie.so3_right_jacobian(q)
        R_next = lie.expm_so3(q) @ lie.expm_so3(Jr @ (v * dt))
        return lie.logm_so3(R_next)
    if jtype == "free":
        J = lie.Ad(T_cj) @ joint_subspace("free", q, axes)
        dq = J @ (v * dt)
        Q = joint_transform("free", q, axes)
        Qd = Transform(lie.expm_so3(dq[:3]), dq[3:])
        Q_next = Q.compose(Qd)
        return jnp.concatenate([lie.logm_so3(Q_next.R), Q_next.p])
    return q + v * dt
