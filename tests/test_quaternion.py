import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.core import quaternion as Q


def random_quat(rng, unit=True):
    q = rng.normal(size=4)
    if unit:
        q = q / np.linalg.norm(q)
    return jnp.asarray(q)


def test_quat_mul_matches_matrix_forms(rng):
    q1, q2 = random_quat(rng), random_quat(rng)
    q3 = Q.quat_mul(q1, q2)
    # dq3_by_dq1(q1) maps q2 -> q3; dq3_by_dq2(q2) maps q1 -> q3
    np.testing.assert_allclose(Q.dq3_by_dq1(q1) @ q2, q3, rtol=1e-12)
    np.testing.assert_allclose(Q.dq3_by_dq2(q2) @ q1, q3, rtol=1e-12)


def test_quat_mul_jacobians_are_exact_derivatives(rng):
    q1, q2 = random_quat(rng), random_quat(rng)
    J1 = jax.jacfwd(lambda a: Q.quat_mul(a, q2))(q1)
    J2 = jax.jacfwd(lambda b: Q.quat_mul(q1, b))(q2)
    np.testing.assert_allclose(J1, Q.dq3_by_dq2(q2), atol=1e-12)
    np.testing.assert_allclose(J2, Q.dq3_by_dq1(q1), atol=1e-12)


def test_rotation_matrix_unit_quat(rng):
    q = random_quat(rng)
    R = np.asarray(Q.quat_to_rotation_matrix(q))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-12)
    # w=1 identity
    np.testing.assert_allclose(
        Q.quat_to_rotation_matrix(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=0
    )


def test_rotation_matrix_eigen_unit_assumption():
    # Non-unit quaternion: Eigen's formula scales like |q|^2 in the off-identity
    # terms. Replicate that (NOT the norm-invariant form).
    q = jnp.array([2.0, 0.0, 0.0, 0.0])
    R = np.asarray(Q.quat_to_rotation_matrix(q))
    np.testing.assert_allclose(R, np.eye(3), atol=0)  # only w: tyy etc all zero
    q2 = jnp.array([0.0, 2.0, 0.0, 0.0])  # pure x, norm 2
    R2 = np.asarray(Q.quat_to_rotation_matrix(q2))
    # Eigen: diag(1, 1-2*x*2x.. ) => [1, 1-8, 1-8]
    np.testing.assert_allclose(np.diag(R2), [1.0, -7.0, -7.0], atol=0)


def test_quat_inverse_matches_eigen(rng):
    q = random_quat(rng, unit=False) * 1.3
    qi = np.asarray(Q.quat_inverse(q))
    # Eigen inverse: conjugate / squaredNorm; q * q^-1 == identity quaternion
    prod = np.asarray(Q.quat_mul(jnp.asarray(q), jnp.asarray(qi)))
    np.testing.assert_allclose(prod, [1.0, 0, 0, 0], atol=1e-12)


def test_quat_from_angular_velocity():
    av = jnp.array([0.1, -0.2, 0.3])
    q = np.asarray(Q.quat_from_angular_velocity(av))
    angle = np.linalg.norm(av)
    np.testing.assert_allclose(q[0], np.cos(angle / 2), rtol=1e-12)
    np.testing.assert_allclose(q[1:], np.sin(angle / 2) / angle * np.asarray(av), rtol=1e-12)
    # zero branch
    np.testing.assert_array_equal(
        np.asarray(Q.quat_from_angular_velocity(jnp.zeros(3))), [1.0, 0, 0, 0]
    )


def test_dqomegadt_by_domega_vs_autodiff(rng):
    omega = jnp.asarray(rng.normal(size=3))
    dt = 1 / 30.0
    J_closed = Q.dqomegadt_by_domega(omega, dt)
    J_auto = jax.jacfwd(lambda w: Q.quat_from_angular_velocity(w * dt))(omega)
    np.testing.assert_allclose(J_closed, J_auto, atol=1e-10)


def test_dqomegadt_by_domega_zero_limit():
    dt = 1 / 30.0
    J = np.asarray(Q.dqomegadt_by_domega(jnp.zeros(3), dt))
    assert not np.isnan(J).any()
    expected = np.zeros((4, 3))
    expected[1, 0] = expected[2, 1] = expected[3, 2] = dt / 2
    np.testing.assert_allclose(J, expected, atol=1e-15)
    # continuity: tiny omega ~ the limit
    J2 = np.asarray(Q.dqomegadt_by_domega(jnp.array([1e-10, 0, 0]), dt))
    np.testing.assert_allclose(J2, expected, atol=1e-9)


def test_dqnorm_by_dq_quirk_formula(rng):
    q = random_quat(rng, unit=False) * 1.1
    qq = float(jnp.sum(q * q))
    M = np.asarray(Q.dqnorm_by_dq(q))
    qn = np.asarray(q)
    for i in range(4):
        for j in range(4):
            if i == j:
                expected = (1 - qn[i] * qn[i] / (qq * qq)) / qq
            else:
                expected = -qn[i] * qn[j] / (qq * qq * qq)
            np.testing.assert_allclose(M[i, j], expected, rtol=1e-12)


def test_dqnorm_is_true_jacobian_at_unit_norm(rng):
    q = random_quat(rng, unit=True)
    J_true = jax.jacfwd(lambda x: x / jnp.linalg.norm(x))(q)
    np.testing.assert_allclose(Q.dqnorm_by_dq(q), J_true, atol=1e-10)


def test_dRq_times_a_by_dq_vs_autodiff_unit(rng):
    # At |q|=1 the homogeneous-formula derivative blocks match autodiff of
    # R(q/|q|)... they match d/dq of the *unnormalised* formula everywhere.
    q = random_quat(rng, unit=False) * 1.4
    a = jnp.asarray(rng.normal(size=3))

    def rot_unnormalised(qv):
        w, x, y, z = qv
        R = jnp.array(
            [
                [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
            ]
        )
        return R @ a

    J_auto = jax.jacfwd(rot_unnormalised)(q)
    np.testing.assert_allclose(Q.dRq_times_a_by_dq(q, a), J_auto, atol=1e-10)


def test_dvnorm_by_dv_true_jacobian_at_unit(rng):
    v = rng.normal(size=3)
    v = jnp.asarray(v / np.linalg.norm(v))
    J_true = jax.jacfwd(lambda x: x / jnp.linalg.norm(x))(v)
    np.testing.assert_allclose(Q.dvnorm_by_dv(v), J_true, atol=1e-10)
