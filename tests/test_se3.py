import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgmm.models.se3 import Pose, hat, random_pose, se3_exp, se3_log, so3_exp, so3_log


def test_so3_exp_orthogonal():
    w = jnp.array([0.3, -0.2, 0.9])
    R = so3_exp(w)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_so3_roundtrip():
    for i in range(5):
        w = jax.random.normal(jax.random.PRNGKey(i), (3,)) * 0.8
        np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-5)


def test_so3_small_angle():
    w = jnp.array([1e-6, -2e-6, 1e-6])
    np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-9)


def test_se3_roundtrip():
    xi = jnp.array([0.2, -0.4, 0.1, 0.5, -0.3, 0.8])
    np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=1e-5)


def test_se3_exp_zero():
    p = se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(p.R, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(p.t, np.zeros(3), atol=1e-7)


def test_compose_inverse():
    a = random_pose(jax.random.PRNGKey(0))
    b = random_pose(jax.random.PRNGKey(1))
    ab = a.compose(b)
    pts = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    np.testing.assert_allclose(ab.apply(pts), a.apply(b.apply(pts)), atol=1e-5)
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(ident.R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(ident.t, np.zeros(3), atol=1e-6)


def test_hat_cross():
    w = jnp.array([1.0, 2.0, 3.0])
    v = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(hat(w) @ v, jnp.cross(w, v), atol=1e-6)


def test_matrix_roundtrip():
    p = random_pose(jax.random.PRNGKey(3))
    q = Pose.from_matrix(p.matrix())
    np.testing.assert_allclose(q.R, p.R, atol=1e-7)
    np.testing.assert_allclose(q.t, p.t, atol=1e-7)
