"""Model & State: the world as data.

The reference represents a world as a pointer-rich mutable object graph
(`dart/simulation/World`, `dart/dynamics/Skeleton`). Here a world IS a
pytree: static topology metadata (joint types, parent indices, dof layout)
lives in hashable aux data so `jit` specializes on it, while every numeric
parameter (transforms, inertias, limits, gravity, dt) is a differentiable
array leaf — which is what makes system-ID gradients (the reference's
`WithRespectTo` machinery, `dart/neural/WithRespectTo.hpp:66-75`) fall out
of plain JAX AD wrt the model pytree.

Bodies and joints are 1:1 as in DART: body i's parent joint is joint i;
`parents[i]` is the parent *body* index (-1 = world). Topologically sorted:
parents[i] < i.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.ops.lie import Transform

# Number of dofs contributed by each joint type.
JOINT_NDOF = {
    "weld": 0,
    "revolute": 1,
    "prismatic": 1,
    "screw": 1,
    "universal": 2,
    "translational2d": 2,
    "translational": 3,
    "planar": 3,
    "ball": 3,
    "euler_xyz": 3,
    "euler_zyx": 3,
    "free": 6,
    # EulerFreeJoint (dart/dynamics/EulerFreeJoint.hpp:1): free joint with
    # EULER-ANGLE orientation coordinates — q = [euler_xyz, translation]
    # (the reference's biomech root joint; gimbal coordinates, unlike
    # "free"'s exponential coordinates)
    "euler_free": 6,
    # biomechanics joints (OpenSim shoulder/spine models)
    "ellipsoid": 3,
    "scapulathoracic": 4,
    "constant_curve": 4,
    "constant_curve_incompressible": 3,
}

# Collision shape kinds. Params layout per kind (all padded into a (4,) vector):
#   box:      [sx, sy, sz, 0]        full extents
#   sphere:   [r, 0, 0, 0]
#   capsule:  [r, h, 0, 0]           axis = local z, h = cylinder length
#   halfspace:[nx, ny, nz, offset]   plane n·x = offset (static geometry only)
#   convex:   params unused; `vertices` (V,3) and `faces` (F,4 plane
#             equations n·x + d <= 0 inside) carry the hull geometry
#             (reference: mesh shapes through libccd, DARTCollide.hpp:42)
#   heightmap: params [x0, z0, dx, dz]; `vertices` holds the (H,W) height
#             grid (+y up in the shape frame; static terrain)
#   cylinder: [r, h, 0, 0]           flat caps, axis = local z (reference
#             narrow phase: DARTCollide.hpp:271-295 collideCylinder*)
#   cone:     [r, h, 0, 0]           base (radius r) at z=-h/2, apex at
#             z=+h/2 (DART ConeShape conventions)
#   trimesh:  params unused; `vertices` (V,3) + `faces` (F,3) INTEGER
#             triangle indices with outward winding — NON-convex triangle
#             meshes (the libccd/ODE-trimesh role, DARTCollide.hpp:42).
#             Narrow phase is vertex-vs-closest-triangle (signed local
#             surface distance); uses gathers, so trimesh worlds run the
#             XLA contact path, not the lane kernels.
#   pointcloud: [r, 0, 0, 0]; `vertices` (P,3) — each point collides as a
#             sphere of radius r (dart/dynamics/PointCloudShape.hpp:1)
#   linesegment: [r, 0, 0, 0]; `vertices` (S, 2, 3) segment endpoint
#             pairs — thin capsules of radius r
#             (dart/dynamics/LineSegmentShape.hpp:1)
SHAPE_KINDS = ("box", "sphere", "capsule", "halfspace", "convex", "heightmap",
               "cylinder", "cone", "trimesh", "pointcloud", "linesegment")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShapeSpec:
    """One collision shape attached to a body (body_index == -1: static world
    geometry, e.g. a floor). Mirrors a DART ShapeNode with collision aspect
    + its DynamicsAspect (friction/restitution)."""

    kind: str = dataclasses.field(metadata=dict(static=True))
    body_index: int = dataclasses.field(metadata=dict(static=True))
    offset: Transform = dataclasses.field(
        default_factory=lambda: Transform(jnp.eye(3), jnp.zeros(3))
    )
    params: jax.Array = dataclasses.field(default_factory=lambda: jnp.zeros(4))
    friction: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(1.0))
    restitution: jax.Array = dataclasses.field(default_factory=lambda: jnp.asarray(0.0))
    # convex hulls only: local-frame vertices (V,3) and face plane
    # equations (F,4) with n·x + d <= 0 inside (scipy ConvexHull layout)
    vertices: Any = None
    faces: Any = None


class State(NamedTuple):
    """Simulation state: generalized positions and velocities.

    The RL-style flat state of the reference (`World::getState`,
    `World.hpp:483`) is `concat([q, v])`; use `flat()`/`State.from_flat`.
    """

    q: jax.Array
    v: jax.Array

    def flat(self) -> jax.Array:
        return jnp.concatenate([self.q, self.v], axis=-1)

    @staticmethod
    def from_flat(x: jax.Array) -> "State":
        nq = x.shape[-1] // 2
        return State(q=x[..., :nq], v=x[..., nq:])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    """A full world: topology (static) + parameters (differentiable leaves)."""

    # ---- static topology (hashable metadata; jit specializes on these) ----
    joint_types: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    parents: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    joint_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    body_names: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    # ---- per-joint fixed frames ----
    # T_pj: pose of the joint frame in the parent body frame (joint -> parent op)
    # T_cj: pose of the joint frame in the child body frame (joint -> child op)
    # (DART: mT_ParentBodyToJoint / mT_ChildBodyToJoint.)
    T_pj: Transform = None
    T_cj: Transform = None
    # Up to 3 axis vectors per joint, meaning depends on type: (nb, 3, 3)
    axes: jax.Array = None

    # ---- per-body inertial parameters ----
    mass: jax.Array = None          # (nb,)
    com: jax.Array = None           # (nb, 3) in body frame
    moment: jax.Array = None        # (nb, 3, 3) about COM, body frame

    # ---- per-dof parameters ----
    damping: jax.Array = None       # (nq,)
    coulomb_friction: jax.Array = None  # (nq,) static joint friction force
    stiffness: jax.Array = None     # (nq,)
    rest_pos: jax.Array = None      # (nq,)
    q_lower: jax.Array = None       # (nq,)
    q_upper: jax.Array = None       # (nq,)
    tau_lower: jax.Array = None     # (nq,)
    tau_upper: jax.Array = None     # (nq,)

    # ---- world parameters ----
    gravity: jax.Array = None       # (3,)
    dt: jax.Array = None            # ()

    # ---- collision geometry ----
    shapes: Tuple[ShapeSpec, ...] = ()

    # ---- action space: which dofs the `action` vector drives ----
    # (reference: World::setActionSpace, World.hpp:842)
    actuated: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- CustomJoint specs (hashable; see ops/joints.py CustomSpec) ----
    # aligned with joints; () means no custom joints, else one entry per
    # joint (None for non-custom types)
    custom_specs: Tuple[Any, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- actuator constraints (dart/constraint Servo/MimicMotorConstraint) --
    # servo_dofs: dofs whose action is a VELOCITY command enforced by a
    # force-limited LCP row (Joint::SERVO actuator type)
    servo_dofs: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    # mimic couplings: (dof, reference_dof, multiplier, offset) — dof
    # velocity tracks multiplier * reference velocity (MimicMotorConstraint)
    mimic: Tuple[Tuple[int, int, float, float], ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- per-dof coordinate names (DegreeOfFreedom::getName; OpenSim
    # coordinate names for .osim models — () means auto-generated) ----
    dof_names: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- collision filtering (dart/collision/BodyNodeCollisionFilter) ----
    # static body-index pairs that never collide (beyond the built-in
    # parent-child adjacency filter); order-insensitive
    no_collide: Tuple[Tuple[int, int], ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    # ---- loop-closure dynamic joint constraints ----
    # (dart/constraint/BallJointConstraint.hpp:46, WeldJointConstraint.hpp:46)
    # Static topology: (kind, body_a, body_b) with kind in {"ball", "weld"}
    # and body_b = -1 anchoring to the world. Numeric anchor data are
    # differentiable leaves: anchors in each body's local frame, and the
    # target relative rotation R_ab for welds (identity rows for balls).
    loops: Tuple[Tuple[str, int, int], ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    loop_anchor_a: jax.Array = None  # (n_loops, 3) in body_a frame
    loop_anchor_b: jax.Array = None  # (n_loops, 3) in body_b frame (world if body_b<0)
    loop_rel_rot: jax.Array = None   # (n_loops, 3, 3) target R_a^T R_b (welds)

    # ------------------------------------------------------------------
    @property
    def num_bodies(self) -> int:
        return len(self.joint_types)

    @property
    def joint_ndofs(self) -> Tuple[int, ...]:
        out = []
        for i, t in enumerate(self.joint_types):
            if t == "custom":
                out.append(self.custom_specs[i][0])
            else:
                out.append(JOINT_NDOF[t])
        return tuple(out)

    def custom_spec(self, i: int):
        return self.custom_specs[i] if self.custom_specs else None

    @property
    def dof_offsets(self) -> Tuple[int, ...]:
        offs, c = [], 0
        for nd in self.joint_ndofs:
            offs.append(c)
            c += nd
        return tuple(offs)

    @property
    def nq(self) -> int:
        return sum(self.joint_ndofs)

    @property
    def num_actions(self) -> int:
        return len(self.actuated)

    def joint_slice(self, i: int) -> slice:
        o = self.dof_offsets[i]
        return slice(o, o + self.joint_ndofs[i])

    # ------------------------------------------------------------------
    def action_to_tau(self, action: jax.Array) -> jax.Array:
        """Scatter an action vector onto the control-force vector
        (World::setAction semantics)."""
        tau = jnp.zeros(action.shape[:-1] + (self.nq,), dtype=action.dtype)
        if not self.actuated:
            return tau
        idx = jnp.asarray(self.actuated, dtype=jnp.int32)
        return tau.at[..., idx].set(action)

    def tau_to_action(self, tau: jax.Array) -> jax.Array:
        idx = jnp.asarray(self.actuated, dtype=jnp.int32)
        return tau[..., idx]

    def replace(self, **kwargs) -> "Model":
        return dataclasses.replace(self, **kwargs)


def build_model(
    joints: Sequence[dict],
    gravity=(0.0, -9.81, 0.0),
    dt=0.002,
    shapes: Sequence[ShapeSpec] = (),
    actuated: Optional[Sequence[int]] = None,
    dtype=None,
) -> Model:
    """Assemble a Model from a list of per-joint dicts.

    Each dict: {type, name, parent (body index, -1=world), body_name,
    T_pj (Transform|None), T_cj, axes ((k,3) array|None), mass, com, moment,
    damping, stiffness, rest, q_lower, q_upper, tau_lower, tau_upper}.
    Missing entries get DART defaults (mass=1, moment=I, no limits).
    """
    nb = len(joints)
    types, parents, jnames, bnames = [], [], [], []
    TpjR, Tpjp, TcjR, Tcjp = [], [], [], []
    axes_all = []
    mass, com, moment = [], [], []
    damping, coulomb, stiffness, rest = [], [], [], []
    q_lo, q_hi, tau_lo, tau_hi = [], [], [], []
    inf = float("inf")

    custom_specs = []
    dof_names = []
    for i, j in enumerate(joints):
        t = j["type"]
        spec = j.get("custom_spec")
        custom_specs.append(spec)
        nd = spec[0] if t == "custom" else JOINT_NDOF[t]
        types.append(t)
        parents.append(int(j.get("parent", i - 1)))
        jnames.append(j.get("name", f"joint_{i}"))
        bnames.append(j.get("body_name", f"body_{i}"))
        T_pj = j.get("T_pj") or Transform(np.eye(3), np.zeros(3))
        T_cj = j.get("T_cj") or Transform(np.eye(3), np.zeros(3))
        TpjR.append(np.asarray(T_pj.R, dtype=np.float64))
        Tpjp.append(np.asarray(T_pj.p, dtype=np.float64))
        TcjR.append(np.asarray(T_cj.R, dtype=np.float64))
        Tcjp.append(np.asarray(T_cj.p, dtype=np.float64))
        ax = np.zeros((3, 3))
        ax[0] = [1.0, 0.0, 0.0]
        ax[1] = [0.0, 1.0, 0.0]
        ax[2] = [0.0, 0.0, 1.0]
        user_axes = j.get("axes")
        if user_axes is not None:
            user_axes = np.atleast_2d(np.asarray(user_axes, dtype=np.float64))
            ax[: user_axes.shape[0]] = user_axes
        axes_all.append(ax)
        mass.append(float(j.get("mass", 1.0)))
        com.append(np.asarray(j.get("com", np.zeros(3)), dtype=np.float64))
        moment.append(np.asarray(j.get("moment", np.eye(3)), dtype=np.float64))
        damping.extend(_per_dof(j.get("damping", 0.0), nd))
        coulomb.extend(_per_dof(j.get("coulomb_friction", 0.0), nd))
        stiffness.extend(_per_dof(j.get("stiffness", 0.0), nd))
        rest.extend(_per_dof(j.get("rest", 0.0), nd))
        q_lo.extend(_per_dof(j.get("q_lower", -inf), nd))
        q_hi.extend(_per_dof(j.get("q_upper", inf), nd))
        tau_lo.extend(_per_dof(j.get("tau_lower", -inf), nd))
        tau_hi.extend(_per_dof(j.get("tau_upper", inf), nd))
        jdn = j.get("dof_names")
        if jdn is not None:
            dof_names.extend(jdn[:nd])
            dof_names.extend(
                f"{jnames[-1]}_{k}" for k in range(len(jdn), nd)
            )
        else:
            dof_names.extend(
                [jnames[-1]] if nd == 1
                else [f"{jnames[-1]}_{k}" for k in range(nd)]
            )

    nq = len(damping)
    if actuated is None:
        actuated = tuple(range(nq))

    if dtype is None:
        # f64 under x64 (tests/parity), f32 otherwise (TPU production)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    arr = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
    return Model(
        joint_types=tuple(types),
        parents=tuple(parents),
        joint_names=tuple(jnames),
        body_names=tuple(bnames),
        T_pj=Transform(arr(TpjR), arr(Tpjp)),
        T_cj=Transform(arr(TcjR), arr(Tcjp)),
        axes=arr(axes_all),
        mass=arr(mass),
        com=arr(com),
        moment=arr(moment),
        damping=arr(damping),
        coulomb_friction=arr(coulomb),
        stiffness=arr(stiffness),
        rest_pos=arr(rest),
        q_lower=arr(q_lo),
        q_upper=arr(q_hi),
        tau_lower=arr(tau_lo),
        tau_upper=arr(tau_hi),
        gravity=arr(gravity),
        dt=arr(dt),
        shapes=tuple(shapes),
        actuated=tuple(actuated),
        dof_names=tuple(dof_names),
        custom_specs=(
            tuple(custom_specs) if any(s is not None for s in custom_specs) else ()
        ),
    )


def _per_dof(val: Any, nd: int) -> list:
    if np.isscalar(val):
        return [float(val)] * nd
    out = list(np.asarray(val, dtype=np.float64).ravel())
    assert len(out) == nd
    return out


def relax_limits(model: Model) -> Model:
    """A copy with joint position limits and Coulomb friction removed.

    Use as an MPC PLANNING model: the solver linearizes smooth dynamics
    (no per-step LCP) while the simulated/real world keeps the full
    constraint engine — the standard planner/plant split, and the same
    spirit as the reference's pluggable constraint-engine escape hatch
    (`World::replaceConstraintEngineFn`, World.cpp:270-280). Control
    bounds (tau limits) are kept — iLQR clamps to them."""
    inf = jnp.asarray(np.inf, dtype=model.mass.dtype)
    return model.replace(
        q_lower=jnp.full_like(model.q_lower, -inf),
        q_upper=jnp.full_like(model.q_upper, inf),
        coulomb_friction=jnp.zeros_like(model.coulomb_friction),
    )


def zero_state(model: Model, dtype=None) -> State:
    dtype = dtype or model.mass.dtype
    return State(
        q=jnp.zeros(model.nq, dtype=dtype), v=jnp.zeros(model.nq, dtype=dtype)
    )
