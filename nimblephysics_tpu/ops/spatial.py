"""Spatial (6D) inertia utilities.

Counterpart of the reference's `dart/dynamics/Inertia.{hpp,cpp}` in functional
form. Spatial vectors are angular-first (omega; v); a body's spatial inertia
about its own frame origin is

    I = [[ I_com + m ĉ ĉᵀ,  m ĉ ],
         [ m ĉᵀ,            m 1 ]]

with c the COM offset in the body frame and ĉ = hat(c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops.lie import Transform, hat


def spatial_inertia(mass: jax.Array, com: jax.Array, moment: jax.Array) -> jax.Array:
    """Build the 6x6 spatial inertia from (mass (...,), com (...,3),
    moment (...,3,3) about the COM)."""
    C = hat(com)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=moment.dtype), C.shape)
    m = mass[..., None, None]
    top_left = moment + m * (C @ jnp.swapaxes(C, -1, -2))
    top_right = m * C
    bottom_left = m * jnp.swapaxes(C, -1, -2)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def moment_from_params(params: jax.Array) -> jax.Array:
    """(..., 6) [Ixx, Iyy, Izz, Ixy, Ixz, Iyz] -> (..., 3, 3) symmetric matrix."""
    ixx, iyy, izz = params[..., 0], params[..., 1], params[..., 2]
    ixy, ixz, iyz = params[..., 3], params[..., 4], params[..., 5]
    row0 = jnp.stack([ixx, ixy, ixz], axis=-1)
    row1 = jnp.stack([ixy, iyy, iyz], axis=-1)
    row2 = jnp.stack([ixz, iyz, izz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def box_inertia(mass: jax.Array, size: jax.Array) -> jax.Array:
    """Solid box moment about COM. size = full extents (x, y, z).

    Mirrors `BoxShape::computeInertia` so skel-parsed models that omit
    <moment_of_inertia> match the reference mass matrices.
    """
    x2 = size[..., 0] ** 2
    y2 = size[..., 1] ** 2
    z2 = size[..., 2] ** 2
    c = mass / 12.0
    return _diag3(c * (y2 + z2), c * (x2 + z2), c * (x2 + y2))


def sphere_inertia(mass: jax.Array, radius: jax.Array) -> jax.Array:
    i = 0.4 * mass * radius**2
    return _diag3(i, i, i)


def ellipsoid_inertia(mass: jax.Array, size: jax.Array) -> jax.Array:
    """DART EllipsoidShape: size = DIAMETERS along each axis."""
    r = size / 2.0
    c = mass / 5.0
    x2, y2, z2 = r[..., 0] ** 2, r[..., 1] ** 2, r[..., 2] ** 2
    return _diag3(c * (y2 + z2), c * (x2 + z2), c * (x2 + y2))


def cylinder_inertia(mass: jax.Array, radius: jax.Array, height: jax.Array) -> jax.Array:
    """Solid cylinder, axis = z (DART CylinderShape::computeInertia)."""
    r2 = radius**2
    h2 = height**2
    ixx = mass * (3.0 * r2 + h2) / 12.0
    izz = 0.5 * mass * r2
    return _diag3(ixx, ixx, izz)


def capsule_inertia(mass: jax.Array, radius: jax.Array, height: jax.Array) -> jax.Array:
    """Capsule, axis = z, height = cylinder section length.

    Mirrors `CapsuleShape::computeInertia` (dart/dynamics/CapsuleShape.cpp):
    mass split between cylinder and hemispheres by volume.
    """
    r, h = radius, height
    vol_cyl = jnp.pi * r * r * h
    vol_cap = 4.0 / 3.0 * jnp.pi * r**3
    vol = vol_cyl + vol_cap
    m_cyl = mass * vol_cyl / vol
    m_cap = mass * vol_cap / vol
    # cylinder part
    ixx = m_cyl * (h * h / 12.0 + r * r / 4.0)
    izz = m_cyl * r * r / 2.0
    # two hemispheres as one sphere displaced to the ends
    i_sph = 0.4 * m_cap * r * r
    # parallel axis: hemisphere COM at +-(h/2 + 3r/8); DART uses the
    # standard capsule formula:
    ixx = ixx + i_sph + m_cap * (h * h / 4.0 + 3.0 * h * r / 8.0)
    izz = izz + i_sph
    return _diag3(ixx, ixx, izz)


def cone_inertia(mass: jax.Array, radius: jax.Array, height: jax.Array) -> jax.Array:
    """Solid cone, base radius r, height h along z
    (DART ConeShape::computeInertia, dart/dynamics/ConeShape.cpp:106-117)."""
    r2 = radius**2
    h2 = height**2
    ixx = (3.0 / 20.0) * mass * (r2 + (2.0 / 3.0) * h2)
    izz = (3.0 / 10.0) * mass * r2
    return _diag3(ixx, ixx, izz)


def _diag3(a, b, c) -> jax.Array:
    a, b, c = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    zero = jnp.zeros_like(a)
    row0 = jnp.stack([a, zero, zero], axis=-1)
    row1 = jnp.stack([zero, b, zero], axis=-1)
    row2 = jnp.stack([zero, zero, c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def transform_inertia(T: Transform, I: jax.Array) -> jax.Array:
    """Express spatial inertia I (child frame) in the parent frame of T:
    I_parent = Ad(T⁻¹)ᵀ I Ad(T⁻¹)."""
    from nimblephysics_tpu.ops.lie import Ad_inv

    X = Ad_inv(T)
    return jnp.swapaxes(X, -1, -2) @ I @ X
