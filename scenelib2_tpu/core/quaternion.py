"""Quaternion & rotation-derivative primitives (pure JAX, wxyz convention).

Semantics match the reference closed forms:
  - quaternion product Jacobians dq3_by_dq1/dq3_by_dq2
    (reference scenelib2/support/math_util.cpp:82-114)
  - QuaternionFromAngularVelocity (support/math_util.cpp:61-80)
  - dqomegadt_by_domega (motion_model.cpp:290-349), with the w->0 limit
    guarded (the reference divides by |w| and would produce NaN; we return the
    analytic limit instead, which only differs where the reference is UB)
  - dqnorm_by_dq (motion_model.cpp:351-380): NOTE the reference evaluates the
    normalisation Jacobian formula with qq = |q|^2 where |q| is mathematically
    required. We replicate the reference literally for parity; it coincides
    with the true Jacobian only at |q| = 1.
  - dqbar_by_dq, dRq_times_a_by_dq and the dR_by_dq{0,x,y,z} blocks
    (feature_model.cpp:152-237)
  - dvnorm_by_dv (part_feature_model.cpp:300-335) with the same qq=|v|^2 quirk.

Quaternions are stored as [w, x, y, z] arrays; all functions are vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, wxyz layout."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Eigen Quaternion::inverse(): conjugate / squaredNorm.

    The reference inverts near-unit (but never exactly renormalised)
    quaternions with this, e.g. qRW at full_feature_model.cpp:76, so the
    1/|q|^2 factor is part of the parity surface.
    """
    return quat_conjugate(q) / jnp.sum(q * q)


def quat_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix via Eigen's toRotationMatrix() formula.

    Eigen assumes a unit quaternion (plain factor 2, no renormalisation); the
    reference feeds it near-unit quaternions, so we replicate the
    unit-assumption formula rather than the norm-invariant 2/|q|^2 variant.
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    s = 2.0
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def quat_from_angular_velocity(av: jnp.ndarray) -> jnp.ndarray:
    """q(omega) = [cos(|av|/2), sin(|av|/2)/|av| * av]; identity at av=0.

    Matches QuaternionFromAngularVelocity (math_util.cpp:61-80) including the
    angle==0 branch.
    """
    angle = jnp.sqrt(av[0] ** 2 + av[1] ** 2 + av[2] ** 2)
    safe = jnp.where(angle > 0.0, angle, 1.0)
    s = jnp.where(angle > 0.0, jnp.sin(angle / 2.0) / safe, 0.0)
    c = jnp.where(angle > 0.0, jnp.cos(angle / 2.0), 1.0)
    return jnp.stack([c, s * av[0], s * av[1], s * av[2]])


# Every entry of the quaternion-product Jacobians is a single signed
# component of q, so the 4x4 matrices are one constant-index gather + one
# sign multiply (bit-identical to scalar placement, ~16 broadcast/concat
# ops fewer per call on TPU).
_DQ1_IDX = jnp.array(
    [[0, 1, 2, 3], [1, 0, 3, 2], [2, 3, 0, 1], [3, 2, 1, 0]], jnp.int32
)
_DQ1_SGN = jnp.array(
    [[1.0, -1.0, -1.0, -1.0], [1.0, 1.0, -1.0, 1.0],
     [1.0, 1.0, 1.0, -1.0], [1.0, -1.0, 1.0, 1.0]]
)
_DQ2_SGN = jnp.array(
    [[1.0, -1.0, -1.0, -1.0], [1.0, 1.0, 1.0, -1.0],
     [1.0, -1.0, 1.0, 1.0], [1.0, 1.0, -1.0, 1.0]]
)


def dq3_by_dq1(q1: jnp.ndarray) -> jnp.ndarray:
    """d(q1*q2)/dq2 expressed via q1 (math_util.cpp:82-97); wxyz rows/cols.

    [[w, -x, -y, -z], [x, w, -z, y], [y, z, w, -x], [z, -y, x, w]]
    """
    return q1[_DQ1_IDX] * _DQ1_SGN.astype(q1.dtype)


def dq3_by_dq2(q2: jnp.ndarray) -> jnp.ndarray:
    """d(q1*q2)/dq1 expressed via q2 (math_util.cpp:99-114).

    [[w, -x, -y, -z], [x, w, z, -y], [y, -z, w, x], [z, y, -x, w]]
    """
    return q2[_DQ1_IDX] * _DQ2_SGN.astype(q2.dtype)


def dqomegadt_by_domega(omega: jnp.ndarray, delta_t: float) -> jnp.ndarray:
    """4x3 Jacobian of q(omega*dt) wrt omega (motion_model.cpp:290-349).

    The omega->0 singularity is guarded with the analytic limits
    (d q0/d w -> 0, diagonal -> dt/2, off-diagonal -> 0); the reference would
    divide by zero there.
    """
    wmod = jnp.sqrt(omega[0] ** 2 + omega[1] ** 2 + omega[2] ** 2)
    ok = wmod > 0.0
    w = jnp.where(ok, wmod, 1.0)
    half = delta_t / 2.0
    s = jnp.sin(w * half)
    c = jnp.cos(w * half)

    def dq0_by_dA(wA):
        return jnp.where(ok, -half * (wA / w) * s, 0.0)

    def dqA_by_dA(wA):
        val = half * (wA * wA) / (w * w) * c + (1.0 / w) * (1.0 - wA * wA / (w * w)) * s
        return jnp.where(ok, val, half)

    def dqA_by_dB(wA, wB):
        val = (wA * wB / (w * w)) * (half * c - (1.0 / w) * s)
        return jnp.where(ok, val, 0.0)

    ox, oy, oz = omega[0], omega[1], omega[2]
    return jnp.array(
        [
            [dq0_by_dA(ox), dq0_by_dA(oy), dq0_by_dA(oz)],
            [dqA_by_dA(ox), dqA_by_dB(ox, oy), dqA_by_dB(ox, oz)],
            [dqA_by_dB(oy, ox), dqA_by_dA(oy), dqA_by_dB(oy, oz)],
            [dqA_by_dB(oz, ox), dqA_by_dB(oz, oy), dqA_by_dA(oz)],
        ]
    )


def _norm_jac(v: jnp.ndarray) -> jnp.ndarray:
    """Reference 'normalisation Jacobian' with the qq=|v|^2 quirk.

    Literal transcription of dqi_by_dqi/dqi_by_dqj (motion_model.cpp:369-380,
    part_feature_model.cpp:322-334): with qq = sum(v^2),
      diag:     (1 - vi^2/qq^2) / qq
      off-diag: -vi*vj / qq^3
    This equals the true Jacobian of v/|v| only when |v| == 1.
    """
    qq = jnp.sum(v * v)
    n = v.shape[0]
    outer = jnp.outer(v, v)
    diag = (1.0 - v * v / (qq * qq)) / qq
    off = -outer / (qq * qq * qq)
    return off * (1.0 - jnp.eye(n, dtype=v.dtype)) + jnp.diag(diag)


def dqnorm_by_dq(q: jnp.ndarray) -> jnp.ndarray:
    """4x4 quaternion-normalisation Jacobian (motion_model.cpp:351-367)."""
    return _norm_jac(q)


def dvnorm_by_dv(v: jnp.ndarray) -> jnp.ndarray:
    """3x3 vector-normalisation Jacobian (part_feature_model.cpp:300-320)."""
    return _norm_jac(v)


def dqbar_by_dq() -> jnp.ndarray:
    """Jacobian of conjugation (feature_model.cpp:155-165)."""
    return jnp.diag(jnp.array([1.0, -1.0, -1.0, -1.0]))


# dR_by_dq{0,x,y,z} blocks: every entry is one signed q component times 2,
# so all four 3x3 blocks come from one gather + sign/scale multiply.
_DR_IDX = jnp.array(
    [
        [[0, 3, 2], [3, 0, 1], [2, 1, 0]],   # dR0:  [[w,-z,y],[z,w,-x],[-y,x,w]]
        [[1, 2, 3], [2, 1, 0], [3, 0, 1]],   # dRx:  [[x,y,z],[y,-x,-w],[z,w,-x]]
        [[2, 1, 0], [1, 2, 3], [0, 3, 2]],   # dRy:  [[-y,x,w],[x,y,z],[-w,z,-y]]
        [[3, 0, 1], [0, 3, 2], [1, 2, 3]],   # dRz:  [[-z,-w,x],[w,-z,y],[x,y,z]]
    ],
    jnp.int32,
)
_DR_SGN = jnp.array(
    [
        [[2.0, -2.0, 2.0], [2.0, 2.0, -2.0], [-2.0, 2.0, 2.0]],
        [[2.0, 2.0, 2.0], [2.0, -2.0, -2.0], [2.0, 2.0, -2.0]],
        [[-2.0, 2.0, 2.0], [2.0, 2.0, 2.0], [-2.0, 2.0, -2.0]],
        [[-2.0, -2.0, 2.0], [2.0, -2.0, 2.0], [2.0, 2.0, 2.0]],
    ]
)


def dRq_times_a_by_dq(q: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """3x4 Jacobian of R(q) @ a wrt q (feature_model.cpp:167-237).

    Uses the unnormalised-R derivative blocks dR_by_dq{0,x,y,z}; note this is
    the derivative of the *homogeneous* (unnormalised) rotation formula, which
    matches the true derivative only at |q| = 1 — replicated as-is.
    """
    dR = q[_DR_IDX] * _DR_SGN.astype(q.dtype)        # [4, 3, 3]
    return jnp.einsum("cik,k->ic", dR, a)
