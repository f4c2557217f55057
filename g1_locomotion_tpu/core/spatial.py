"""Spatial (6D) rigid-body algebra in JAX — Featherstone-style, batched.

Replaces the reference's C++ rigid-body backend (xbot2_interface ``ModelInterface2``
over Pinocchio; reference wbid.py:20-27, SURVEY.md §2.2) with pure-jnp primitives
used by the batched FK / RNEA / CRBA in ``g1_locomotion_tpu.models``.

Conventions (Featherstone / Pinocchio):
* Motion vectors are ``[v_lin(3), w_ang(3)]`` stacked **linear-first** to match
  Pinocchio's convention (the reference's generalized-velocity layout is
  ``[v_base_local, w_base_local, qdot]``, ros_run_simulation.py:364-368).
* A frame placement is ``(R, p)``: rotation of frame axes expressed in parent,
  and origin offset in parent coordinates.
* ``iXp`` denotes the motion transform taking vectors expressed in parent
  coordinates to child (local) coordinates.

Everything is elementwise-jnp and usable under jit/vmap/grad.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from g1_locomotion_tpu.core.rotations import skew


class Transform(NamedTuple):
    """Frame placement: x_parent = R @ x_local + p."""

    R: jnp.ndarray  # (..., 3, 3)
    p: jnp.ndarray  # (..., 3)

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other: placement of other's frame through self."""
        return Transform(
            R=self.R @ other.R,
            p=jnp.einsum("...ij,...j->...i", self.R, other.p) + self.p,
        )

    def inverse(self) -> "Transform":
        RT = jnp.swapaxes(self.R, -1, -2)
        return Transform(R=RT, p=-jnp.einsum("...ij,...j->...i", RT, self.p))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform a point from local to parent coordinates."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.p

    def rotate(self, v: jnp.ndarray) -> jnp.ndarray:
        """Rotate a (free) vector from local to parent coordinates."""
        return jnp.einsum("...ij,...j->...i", self.R, v)


def transform_identity(dtype=jnp.float64) -> Transform:
    return Transform(R=jnp.eye(3, dtype=dtype), p=jnp.zeros(3, dtype=dtype))


def motion_transform(X: Transform, m: jnp.ndarray) -> jnp.ndarray:
    """Express motion vector m=[v,w] (in frame B) in frame A, where X = placement
    of B in A: v_A = R v_B + p x (R w_B), w_A = R w_B."""
    v, w = m[..., :3], m[..., 3:]
    Rw = X.rotate(w)
    return jnp.concatenate([X.rotate(v) + jnp.cross(X.p, Rw), Rw], axis=-1)


def motion_transform_inv(X: Transform, m: jnp.ndarray) -> jnp.ndarray:
    """Express motion vector from frame A into frame B (X = placement of B in A)."""
    v, w = m[..., :3], m[..., 3:]
    RT = jnp.swapaxes(X.R, -1, -2)
    wB = jnp.einsum("...ij,...j->...i", RT, w)
    vB = jnp.einsum("...ij,...j->...i", RT, v - jnp.cross(X.p, w))
    return jnp.concatenate([vB, wB], axis=-1)


def force_transform(X: Transform, f: jnp.ndarray) -> jnp.ndarray:
    """Express force vector f=[lin,ang] (in frame B) in frame A (X = B placed in A):
    n_A = R n_B + p x (R f_B), f_A = R f_B."""
    lin, ang = f[..., :3], f[..., 3:]
    Rl = X.rotate(lin)
    return jnp.concatenate([Rl, X.rotate(ang) + jnp.cross(X.p, Rl)], axis=-1)


def force_transform_inv(X: Transform, f: jnp.ndarray) -> jnp.ndarray:
    """Express force vector from frame A into frame B (X = placement of B in A)."""
    lin, ang = f[..., :3], f[..., 3:]
    RT = jnp.swapaxes(X.R, -1, -2)
    lB = jnp.einsum("...ij,...j->...i", RT, lin)
    aB = jnp.einsum("...ij,...j->...i", RT, ang - jnp.cross(X.p, lin))
    return jnp.concatenate([lB, aB], axis=-1)


def motion_cross(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Spatial motion cross product m x* x for motion vector x=[v,w]:
    [w_m x v_x + v_m x w_x, w_m x w_x]."""
    vm, wm = m[..., :3], m[..., 3:]
    vx, wx = x[..., :3], x[..., 3:]
    return jnp.concatenate(
        [jnp.cross(wm, vx) + jnp.cross(vm, wx), jnp.cross(wm, wx)], axis=-1
    )


def motion_cross_force(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial force cross product m x* f for force vector f=[lin,ang]:
    [w_m x lin, w_m x ang + v_m x lin]."""
    vm, wm = m[..., :3], m[..., 3:]
    lf, af = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(wm, lf), jnp.cross(wm, af) + jnp.cross(vm, lf)], axis=-1
    )


class SpatialInertia(NamedTuple):
    """Rigid-body spatial inertia about the body frame origin.

    Parameterized (m, h=m*c, I_o) with I_o the rotational inertia about the body
    origin. Applied to motion [v,w]: f = [m v - h x w (=m v + w x h? no: see apply)].
    """

    m: jnp.ndarray  # (...,)
    h: jnp.ndarray  # (..., 3) first mass moment m*com
    I: jnp.ndarray  # (..., 3, 3) inertia about origin

    def apply(self, motion: jnp.ndarray) -> jnp.ndarray:
        """f = I_spatial @ [v, w] (Featherstone, linear-first ordering):
        lin = m * v - h x w ;  ang = I_o @ w + h x v."""
        v, w = motion[..., :3], motion[..., 3:]
        lin = self.m[..., None] * v - jnp.cross(self.h, w)
        ang = jnp.einsum("...ij,...j->...i", self.I, w) + jnp.cross(self.h, v)
        return jnp.concatenate([lin, ang], axis=-1)

    def to_matrix(self) -> jnp.ndarray:
        """Dense 6x6 (linear-first): [[m*1, -S(h)], [S(h), I_o]]."""
        eye = jnp.eye(3, dtype=self.I.dtype)
        mI = self.m[..., None, None] * eye
        Sh = skew(self.h)
        top = jnp.concatenate([mI, -Sh], axis=-1)
        bot = jnp.concatenate([Sh, self.I], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)


def spatial_inertia_from_params(
    m: jnp.ndarray, com: jnp.ndarray, I_com: jnp.ndarray
) -> SpatialInertia:
    """Build spatial inertia from mass, CoM offset (body frame), inertia about CoM."""
    h = m[..., None] * com
    # Parallel axis: I_o = I_c + m (c·c 1 - c cᵀ)
    c2 = jnp.sum(com * com, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=I_com.dtype)
    I_o = I_com + m[..., None, None] * (c2 * eye - com[..., :, None] * com[..., None, :])
    return SpatialInertia(m=jnp.asarray(m), h=h, I=I_o)


def inertia_transform(X: Transform, si: SpatialInertia) -> SpatialInertia:
    """Express a spatial inertia given in frame B in frame A (X = placement of B in A)."""
    m = si.m
    com_B = si.h / jnp.where(m[..., None] == 0, 1.0, m[..., None])
    I_com = si.I - m[..., None, None] * (
        jnp.sum(com_B * com_B, axis=-1)[..., None, None] * jnp.eye(3, dtype=si.I.dtype)
        - com_B[..., :, None] * com_B[..., None, :]
    )
    com_A = X.apply(com_B)
    I_com_A = X.R @ I_com @ jnp.swapaxes(X.R, -1, -2)
    return spatial_inertia_from_params(m, com_A, I_com_A)


def inertia_add(a: SpatialInertia, b: SpatialInertia) -> SpatialInertia:
    return SpatialInertia(m=a.m + b.m, h=a.h + b.h, I=a.I + b.I)
