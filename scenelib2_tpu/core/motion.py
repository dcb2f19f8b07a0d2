"""Constant-velocity motion model (13-dim camera state), pure functions.

State layout xv = [r(3), q(4, wxyz), v(3), omega(3)] — motion_model.cpp:44.
Replicates reference scenelib2/motion_model.cpp:

  fv / dfv_by_dxv  (:84-146):  r += v*dt, q <- q * q(omega*dt), v += u*dt
  Q                (:148-217): Q = J Pnn J^T, Pnn = diag(sd_a^2 dt^2 (x3),
                               sd_alpha^2 dt^2 (x3))
  xp / dxp_by_dxv  (:219-235)
  xvnorm / dxvnorm_by_dxv (:237-263): NOTE the reference never actually
    normalises the quaternion (Tempqb = Tempqa with no .normalize()); only the
    covariance is transformed by dqnorm_by_dq. Replicated exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from scenelib2_tpu.core.quaternion import (
    dq3_by_dq1,
    dq3_by_dq2,
    dqnorm_by_dq,
    dqomegadt_by_domega,
    quat_from_angular_velocity,
    quat_mul,
)


def extract_r_q_v_omega(xv: jnp.ndarray):
    return xv[0:3], xv[3:7], xv[7:10], xv[10:13]


def func_fv(xv: jnp.ndarray, u: jnp.ndarray, delta_t: float) -> jnp.ndarray:
    """State transition only, no Jacobian (motion_model.cpp:84-117 value
    path) — for the auto-init future rollforward, which the reference runs
    Jacobian-free (monoslam.cpp:880-883)."""
    r, q, v, omega = extract_r_q_v_omega(xv)
    rnew = r + v * delta_t
    qnew = quat_mul(q, quat_from_angular_velocity(omega * delta_t))
    vnew = v + u * delta_t
    return jnp.concatenate([rnew, qnew, vnew, omega])


def func_fv_and_dfv_by_dxv(xv: jnp.ndarray, u: jnp.ndarray, delta_t: float):
    """Returns (fv[13], dfv_by_dxv[13,13])."""
    r, q, v, omega = extract_r_q_v_omega(xv)
    rnew = r + v * delta_t
    qwt = quat_from_angular_velocity(omega * delta_t)
    qnew = quat_mul(q, qwt)
    vnew = v + u * delta_t
    fv = jnp.concatenate([rnew, qnew, vnew, omega])

    F = jnp.eye(13, dtype=xv.dtype)
    F = F.at[0:3, 7:10].set(jnp.eye(3, dtype=xv.dtype) * delta_t)
    F = F.at[3:7, 3:7].set(dq3_by_dq2(qwt))
    # dqomegadt_by_domega is d q(omega*dt) / d omega (dt factors included)
    dqnew_by_domega = dq3_by_dq1(q) @ dqomegadt_by_domega(omega, delta_t)
    F = F.at[3:7, 10:13].set(dqnew_by_domega)
    return fv, F


def func_Q(xv: jnp.ndarray, delta_t: float, sd_a: float, sd_alpha: float) -> jnp.ndarray:
    """Process noise Q[13,13] (motion_model.cpp:148-217)."""
    lin_var = sd_a * sd_a * delta_t * delta_t
    ang_var = sd_alpha * sd_alpha * delta_t * delta_t

    _, q, _, omega = extract_r_q_v_omega(xv)
    dqnew_by_dOmega = dq3_by_dq1(q) @ dqomegadt_by_domega(omega, delta_t)

    # dxnew_by_dn [13,6]: rows r<-(I dt, 0), q<-(0, dqnew_by_dOmega),
    # v<-(I, 0), omega<-(0, I)
    G = jnp.zeros((13, 6), dtype=xv.dtype)
    G = G.at[0:3, 0:3].set(jnp.eye(3, dtype=xv.dtype) * delta_t)
    G = G.at[3:7, 3:6].set(dqnew_by_dOmega)
    G = G.at[7:10, 0:3].set(jnp.eye(3, dtype=xv.dtype))
    G = G.at[10:13, 3:6].set(jnp.eye(3, dtype=xv.dtype))

    pnn = jnp.diag(jnp.array([lin_var] * 3 + [ang_var] * 3, dtype=xv.dtype))
    return G @ pnn @ G.T


def func_xp(xv: jnp.ndarray) -> jnp.ndarray:
    """Position state [r(3), q(4)] (motion_model.cpp:219-222)."""
    return xv[0:7]


def dxp_by_dxv(dtype=jnp.float64) -> jnp.ndarray:
    """[7,13] selector of the position state (motion_model.cpp:224-235)."""
    return jnp.eye(7, 13, dtype=dtype)


def func_xvnorm_and_dxvnorm_by_dxv(xv: jnp.ndarray):
    """Quaternion-'normalisation' step (motion_model.cpp:237-263).

    Returns (xvnorm, J). xvnorm == xv — the reference copies the quaternion
    without normalising it; only the Jacobian (with the qq=|q|^2 quirk, see
    quaternion.dqnorm_by_dq) is nontrivial and transforms the covariance.
    """
    J = jnp.eye(13, dtype=xv.dtype)
    J = J.at[3:7, 3:7].set(dqnorm_by_dq(xv[3:7]))
    return xv, J
