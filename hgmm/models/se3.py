"""SE(3) Lie-group utilities: exp/log maps, composition, application.

Replaces the reference's host-side glm/quaternion pose math (SURVEY.md §2.1
item 8; reference mount empty — spec from BASELINE.json:5 "SE(3) pose solve").
Everything is jit-friendly (static shapes, no data-dependent branching).

Conventions:
- A pose is a pair (R, t): R in SO(3) [3,3], t in R^3. y = R @ x + t.
- A twist xi in R^6 is ordered [omega (rotation), v (translation)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pose(NamedTuple):
    """Rigid transform y = R @ x + t."""

    R: jax.Array  # [3, 3]
    t: jax.Array  # [3]

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype))

    def apply(self, points: jax.Array) -> jax.Array:
        """Transform points [..., 3]."""
        return points @ self.R.T + self.t

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: first apply `other`, then `self`."""
        return Pose(self.R @ other.R, self.R @ other.t + self.t)

    def inverse(self) -> "Pose":
        Rt = self.R.T
        return Pose(Rt, -(Rt @ self.t))

    def matrix(self) -> jax.Array:
        """Homogeneous [4, 4] matrix."""
        top = jnp.concatenate([self.R, self.t[:, None]], axis=1)
        bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=self.R.dtype)
        return jnp.concatenate([top, bottom], axis=0)

    @staticmethod
    def from_matrix(m: jax.Array) -> "Pose":
        return Pose(m[:3, :3], m[:3, 3])


def hat(omega: jax.Array) -> jax.Array:
    """so(3) hat operator: [omega]_x such that hat(w) @ v = w x v."""
    wx, wy, wz = omega[0], omega[1], omega[2]
    z = jnp.zeros((), dtype=omega.dtype)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues' formula with Taylor fallback near theta=0 (branch-free)."""
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(omega)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks, selected smoothly.
    use_series = theta2 < 1e-8
    a = jnp.where(use_series, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_series, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    return jnp.eye(3, dtype=omega.dtype) + a * K + b * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """Inverse of so3_exp. Valid for theta well below pi (registration and
    pose-graph increments).

    atan2-based and autodiff-safe at the identity: pose-graph Gauss-Newton
    differentiates this exactly where residuals vanish, and the naive
    arccos form has an infinite derivative there (the double-where guard
    keeps the unselected branch finite under jacfwd)."""
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    w2 = jnp.sum(w * w)  # = 4 sin^2(theta)
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)  # cos(theta)
    small = w2 < 1e-12
    w2_safe = jnp.where(small, 1.0, w2)
    s = 0.5 * jnp.sqrt(w2_safe)  # sin(theta), safe under grad
    theta = jnp.arctan2(s, c)
    scale_large = theta / (2.0 * s)
    # Small angle: theta^2 ~ w2/4, scale = 1/2 + theta^2/12 = 1/2 + w2/48.
    scale_small = 0.5 + w2 / 48.0
    return jnp.where(small, scale_small, scale_large) * w


def se3_exp(xi: jax.Array) -> Pose:
    """Exponential map R^6 -> SE(3). xi = [omega, v]."""
    omega, v = xi[:3], xi[3:]
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(omega)
    use_series = theta2 < 1e-8
    a = jnp.where(use_series, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_series, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        use_series, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta + 1e-32)
    )
    R = jnp.eye(3, dtype=xi.dtype) + a * K + b * (K @ K)
    V = jnp.eye(3, dtype=xi.dtype) + b * K + c * (K @ K)
    return Pose(R, V @ v)


def se3_log(pose: Pose) -> jax.Array:
    """Logarithm map SE(3) -> R^6."""
    omega = so3_log(pose.R)
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + 1e-32)
    K = hat(omega)
    use_series = theta2 < 1e-8
    b = jnp.where(use_series, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(
        use_series, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta + 1e-32)
    )
    V = jnp.eye(3, dtype=omega.dtype) + b * K + c * (K @ K)
    v = jnp.linalg.solve(V, pose.t)
    return jnp.concatenate([omega, v])


def random_pose(key: jax.Array, max_angle: float = 0.5, max_trans: float = 0.3) -> Pose:
    """Random SE(3) for tests/synthetic benchmarks."""
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, (3,))
    axis = axis / (jnp.linalg.norm(axis) + 1e-12)
    angle = jax.random.uniform(k2, (), minval=-max_angle, maxval=max_angle)
    t = jax.random.uniform(k3, (3,), minval=-max_trans, maxval=max_trans)
    return Pose(so3_exp(axis * angle), t)
