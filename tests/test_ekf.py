"""Dense EKF vs NumPy oracle + masked-row equivalence property."""

import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.core import ekf, motion


def test_predict_matches_reference_blocks(rng):
    """Dense predict == reference per-block ops (kalman.cpp:50-69):
    Pxx <- F Pxx F'+Q, Pxy <- F Pxy, Pyy untouched."""
    D = 13 + 12
    A = rng.normal(size=(D, D))
    P = A @ A.T
    xv = rng.normal(size=13)
    xv[3:7] /= np.linalg.norm(xv[3:7])
    x = np.concatenate([xv, rng.normal(size=12)])
    u = np.zeros(3)
    dt = 1 / 30.0

    x2, P2 = ekf.predict(jnp.asarray(x), jnp.asarray(P), jnp.asarray(u), dt, 4.0, 6.0)

    fv, F = motion.func_fv_and_dfv_by_dxv(jnp.asarray(xv), jnp.asarray(u), dt)
    Q = motion.func_Q(jnp.asarray(xv), dt, 4.0, 6.0)
    F = np.asarray(F)
    np.testing.assert_allclose(np.asarray(x2[:13]), np.asarray(fv), rtol=1e-14)
    np.testing.assert_array_equal(np.asarray(x2[13:]), x[13:])
    np.testing.assert_allclose(np.asarray(P2[:13, :13]), F @ P[:13, :13] @ F.T + np.asarray(Q), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(P2[:13, 13:]), F @ P[:13, 13:], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(P2[13:, :13]), (F @ P[:13, 13:]).T, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(P2[13:, 13:]), P[13:, 13:])


def test_joint_update_matches_numpy(rng):
    D, M = 25, 6
    A = rng.normal(size=(D, D))
    P = A @ A.T + np.eye(D)
    x = rng.normal(size=D)
    H = rng.normal(size=(M, D))
    nu = rng.normal(size=M)
    R = np.eye(M) * 1.5

    x2, P2, S = ekf.joint_update(jnp.asarray(x), jnp.asarray(P), jnp.asarray(H), jnp.asarray(nu), jnp.asarray(R))

    S_np = H @ P @ H.T + R
    Sinv = np.linalg.inv(S_np)
    W = P @ H.T @ Sinv
    np.testing.assert_allclose(np.asarray(x2), x + W @ nu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(P2), P - W @ S_np @ W.T, rtol=1e-8, atol=1e-10)


def test_masked_rows_are_exact_noops(rng):
    """H=0/nu=0/R=I rows must leave the update identical to the packed
    smaller update — the trick that makes fixed-shape measurement vectors
    exact (see core/ekf.py docstring)."""
    D, M = 25, 4
    A = rng.normal(size=(D, D))
    P = A @ A.T + np.eye(D)
    x = rng.normal(size=D)
    H_small = rng.normal(size=(M, D))
    nu_small = rng.normal(size=M)
    R_small = np.eye(M) * 1.3

    x_s, P_s, _ = ekf.joint_update(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(H_small), jnp.asarray(nu_small), jnp.asarray(R_small)
    )

    # interleave masked rows: rows 0,2,4,6 real; 1,3,5,7 masked
    Mi = 2 * M
    H_big = np.zeros((Mi, D))
    nu_big = np.zeros(Mi)
    R_big = np.eye(Mi)
    for k in range(M):
        H_big[2 * k] = H_small[k]
        nu_big[2 * k] = nu_small[k]
        R_big[2 * k, 2 * k] = R_small[k, k]
    x_b, P_b, _ = ekf.joint_update(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(H_big), jnp.asarray(nu_big), jnp.asarray(R_big)
    )
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(x_s), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(P_b), np.asarray(P_s), rtol=1e-9, atol=1e-11)


def test_normalise_transforms_covariance_only(rng):
    D = 19
    A = rng.normal(size=(D, D))
    P = A @ A.T
    x = rng.normal(size=D)
    x2, P2 = ekf.normalise(jnp.asarray(x), jnp.asarray(P))
    np.testing.assert_array_equal(np.asarray(x2), x)  # reference never renormalises
    from scenelib2_tpu.core.quaternion import dqnorm_by_dq

    J = np.eye(13)
    J[3:7, 3:7] = np.asarray(dqnorm_by_dq(jnp.asarray(x[3:7])))
    np.testing.assert_allclose(np.asarray(P2[:13, :13]), J @ P[:13, :13] @ J.T, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(P2[:13, 13:]), J @ P[:13, 13:], rtol=1e-12)


def test_chol2x2_and_inverse(rng):
    A = rng.normal(size=(2, 2))
    S = A @ A.T + np.eye(2)
    L = np.asarray(ekf.chol2x2(jnp.asarray(S)))
    np.testing.assert_allclose(L @ L.T, S, rtol=1e-12)
    assert L[0, 1] == 0.0
    Sinv = np.asarray(ekf.inv2x2_via_chol(jnp.asarray(S)))
    np.testing.assert_allclose(Sinv @ S, np.eye(2), atol=1e-12)


def test_symmetrize():
    P = jnp.asarray(np.arange(9.0).reshape(3, 3))
    P2 = np.asarray(ekf.symmetrize(P))
    np.testing.assert_array_equal(P2, P2.T)
    np.testing.assert_allclose(P2, (np.arange(9.0).reshape(3, 3) + np.arange(9.0).reshape(3, 3).T) / 2)
