"""Feature measurement models: full 3D point and partially-initialised ray.

Replaces the reference's virtual FeatureModel hierarchy
(feature_model.cpp / full_feature_model.cpp / part_feature_model.cpp) with
pure functions designed for vmap over features and (features x particles).

Layouts:
  xp     = [r(3), q(4 wxyz)]                    position state
  y_full = [3] world point
  y_part = [rWi(3), hhatWi(3)] semi-infinite ray + free depth lambda (scalar)

Visibility flag bits match full_feature_model.h:74-78.
"""

from __future__ import annotations

import jax.numpy as jnp

from scenelib2_tpu.core import camera as cam_mod
from scenelib2_tpu.core.camera import CameraParams
from scenelib2_tpu.core.quaternion import (
    dRq_times_a_by_dq,
    dqbar_by_dq,
    dvnorm_by_dv,
    quat_inverse,
    quat_to_rotation_matrix,
)

# visibility_test bit flags (full_feature_model.h:74-78)
LEFT_RIGHT_FAIL = 1
UP_DOWN_FAIL = 2
DISTANCE_FAIL = 4
ANGLE_FAIL = 8
BEHIND_CAMERA_FAIL = 16


def full_zeroedyi(y: jnp.ndarray, xp: jnp.ndarray):
    """Feature position in robot frame + Jacobians (full_feature_model.cpp:67-101).

    Returns (zeroedyi[3], dzeroedyi_by_dxp[3,7], dzeroedyi_by_dyi[3,3]).
    """
    r, q = xp[0:3], xp[3:7]
    y_minus_r = y - r
    qRW = quat_inverse(q)
    RRW = quat_to_rotation_matrix(qRW)
    zeroed = RRW @ y_minus_r

    d_by_dr = -RRW
    d_by_dq = dRq_times_a_by_dq(qRW, y_minus_r) @ dqbar_by_dq()
    d_by_dxp = jnp.concatenate([d_by_dr, d_by_dq], axis=1)
    return zeroed, d_by_dxp, RRW


def full_predict_measurement(cam: CameraParams, y: jnp.ndarray, xp: jnp.ndarray):
    """hi and Jacobians for a 3D point feature (full_feature_model.cpp:178-195).

    Returns (hi[2], dhi_by_dxp[2,7], dhi_by_dyi[2,3], zeroedyi[3]).
    """
    zeroed, dz_by_dxp, dz_by_dyi = full_zeroedyi(y, xp)
    hi = cam_mod.project(cam, zeroed)
    dh_by_dz = cam_mod.project_jacobian(cam, zeroed)
    return hi, dh_by_dz @ dz_by_dxp, dh_by_dz @ dz_by_dyi, zeroed


def full_visibility_test(
    cam: CameraParams,
    xp: jnp.ndarray,
    y: jnp.ndarray,
    xp_orig: jnp.ndarray,
    hi: jnp.ndarray,
    image_search_boundary: float = 20.0,
    max_length_ratio: float = 2.0,
    max_angle_difference: float = jnp.pi / 4,
) -> jnp.ndarray:
    """Bit-flag visibility test (full_feature_model.cpp:103-170). 0 == visible."""
    flag = jnp.zeros((), jnp.int32)
    flag |= jnp.where(
        (hi[0] < image_search_boundary) | (hi[0] > cam.width - 1 - image_search_boundary),
        LEFT_RIGHT_FAIL,
        0,
    ).astype(jnp.int32)
    flag |= jnp.where(
        (hi[1] < image_search_boundary) | (hi[1] > cam.height - 1 - image_search_boundary),
        UP_DOWN_FAIL,
        0,
    ).astype(jnp.int32)

    zeroed, _, _ = full_zeroedyi(y, xp)
    flag |= jnp.where(zeroed[2] <= 0, BEHIND_CAMERA_FAIL, 0).astype(jnp.int32)

    RWR = quat_to_rotation_matrix(xp[3:7])
    hLWi = RWR @ zeroed

    zeroed_orig, _, _ = full_zeroedyi(y, xp_orig)
    RWR_orig = quat_to_rotation_matrix(xp_orig[3:7])
    hLWi_orig = RWR_orig @ zeroed_orig

    mod = jnp.linalg.norm(hLWi)
    mod_orig = jnp.linalg.norm(hLWi_orig)
    length_ratio = mod / mod_orig
    flag |= jnp.where(
        (length_ratio > max_length_ratio) | (length_ratio < 1.0 / max_length_ratio),
        DISTANCE_FAIL,
        0,
    ).astype(jnp.int32)

    # acos argument can exceed 1 by rounding; the reference lets acos produce
    # NaN there and the comparison is then false — clamp-free would propagate
    # NaN through jnp.where, so clip (same comparison outcome either way).
    cosang = jnp.clip(jnp.dot(hLWi, hLWi_orig) / (mod * mod_orig), -1.0, 1.0)
    angle = jnp.abs(jnp.arccos(cosang))
    flag |= jnp.where(angle > max_angle_difference, ANGLE_FAIL, 0).astype(jnp.int32)
    return flag


def innovation_covariance(
    Pxx: jnp.ndarray,
    Pxy: jnp.ndarray,
    Pyy: jnp.ndarray,
    dh_by_dxv: jnp.ndarray,
    dh_by_dy: jnp.ndarray,
    R: jnp.ndarray,
) -> jnp.ndarray:
    """S_i = Hx Pxx Hx' + Hx Pxy Hy' + (Hx Pxy Hy')' + Hy Pyy Hy' + R
    (feature_model.cpp:99-116)."""
    t = dh_by_dxv @ Pxy @ dh_by_dy.T
    return dh_by_dxv @ Pxx @ dh_by_dxv.T + t + t.T + dh_by_dy @ Pyy @ dh_by_dy.T + R


# ---------------------------------------------------------------------------
# Partially-initialised (ray) feature model — part_feature_model.cpp
# ---------------------------------------------------------------------------


def part_init_ray(cam: CameraParams, h: jnp.ndarray, xp: jnp.ndarray):
    """Initialise ray state from one measurement (part_feature_model.cpp:162-229).

    Returns (ypi[6], dypi_by_dxp[6,7], dypi_by_dhi[6,2]).
    """
    hLRi = cam_mod.unproject(cam, h)
    norm = jnp.linalg.norm(hLRi)
    hLhatRi = hLRi / norm
    dhLhatRi_by_dhLRi = dvnorm_by_dv(hLRi)

    q = xp[3:7]
    RWR = quat_to_rotation_matrix(q)
    hLhatWi = RWR @ hLhatRi
    r = xp[0:3]

    ypi = jnp.concatenate([r, hLhatWi])

    dypi_by_dxp = jnp.zeros((6, 7), xp.dtype)
    dypi_by_dxp = dypi_by_dxp.at[0:3, 0:3].set(jnp.eye(3, dtype=xp.dtype))
    dypi_by_dxp = dypi_by_dxp.at[3:6, 3:7].set(dRq_times_a_by_dq(q, hLhatRi))

    dypi_by_dhi = jnp.zeros((6, 2), xp.dtype)
    dypi_by_dhi = dypi_by_dhi.at[3:6, 0:2].set(
        RWR @ dhLhatRi_by_dhLRi @ cam_mod.unproject_jacobian(cam, h)
    )
    return ypi, dypi_by_dxp, dypi_by_dhi


def part_zeroedyi(y: jnp.ndarray, xp: jnp.ndarray):
    """Ray in robot frame + Jacobians (part_feature_model.cpp:80-144).

    Returns (zeroedyi[6], dzeroedyi_by_dxp[6,7], dzeroedyi_by_dyi[6,6]).
    """
    r, q = xp[0:3], xp[3:7]
    ri, hhat = y[0:3], y[3:6]
    y_minus_r = ri - r
    qRW = quat_inverse(q)
    RRW = quat_to_rotation_matrix(qRW)
    dqbar = dqbar_by_dq()

    zeroedri = RRW @ y_minus_r
    zeroedhhat = RRW @ hhat

    d_by_dxp = jnp.zeros((6, 7), y.dtype)
    d_by_dxp = d_by_dxp.at[0:3, 0:3].set(-RRW)
    d_by_dxp = d_by_dxp.at[0:3, 3:7].set(dRq_times_a_by_dq(qRW, y_minus_r) @ dqbar)
    d_by_dxp = d_by_dxp.at[3:6, 3:7].set(dRq_times_a_by_dq(qRW, hhat) @ dqbar)

    d_by_dyi = jnp.zeros((6, 6), y.dtype)
    d_by_dyi = d_by_dyi.at[0:3, 0:3].set(RRW)
    d_by_dyi = d_by_dyi.at[3:6, 3:6].set(RRW)

    return jnp.concatenate([zeroedri, zeroedhhat]), d_by_dxp, d_by_dyi


def part_predict_from_zeroed(
    cam: CameraParams,
    zeroed: jnp.ndarray,       # [6] from part_zeroedyi — lambda-INDEPENDENT
    dz_by_dxp: jnp.ndarray,    # [6,7]
    dz_by_dyi: jnp.ndarray,    # [6,6]
    lam: jnp.ndarray,
):
    """Per-particle tail of the ray measurement prediction.

    part_zeroedyi does not depend on lambda; callers vmapping over a
    particle grid must compute it ONCE per ray and call this per particle
    (vmapping the fused part_predict_measurement re-evaluates the quaternion
    rotation + Jacobian chain per particle — measured ~0.7 ms/frame at 100
    particles). Bit-identical to the fused path: same values, same op order.
    """
    hLR = zeroed[0:3] + lam * zeroed[3:6]
    hpi = cam_mod.project(cam, hLR)
    dh_by_dhLR = cam_mod.project_jacobian(cam, hLR)
    dhLR_by_dz = jnp.concatenate(
        [jnp.eye(3, dtype=zeroed.dtype), lam * jnp.eye(3, dtype=zeroed.dtype)], axis=1
    )
    J = dh_by_dhLR @ dhLR_by_dz
    return hpi, J @ dz_by_dxp, J @ dz_by_dyi


def part_predict_measurement(cam: CameraParams, y: jnp.ndarray, xp: jnp.ndarray, lam: jnp.ndarray):
    """hpi and Jacobians for a ray at depth lambda (part_feature_model.cpp:231-265).

    Returns (hpi[2], dhpi_by_dxp[2,7], dhpi_by_dyi[2,6]).
    """
    zeroed, dz_by_dxp, dz_by_dyi = part_zeroedyi(y, xp)
    return part_predict_from_zeroed(cam, zeroed, dz_by_dxp, dz_by_dyi, lam)


def part_convert_to_full(y: jnp.ndarray, lam: jnp.ndarray):
    """yfi = ri + lambda*hhat + Jacobians (part_feature_model.cpp:267-287).

    Returns (yfi[3], dyfi_by_dypi[3,6], dyfi_by_dlambda[3,1]).
    """
    ri, hhat = y[0:3], y[3:6]
    yfi = ri + lam * hhat
    dyfi_by_dypi = jnp.concatenate([jnp.eye(3, dtype=y.dtype), lam * jnp.eye(3, dtype=y.dtype)], axis=1)
    return yfi, dyfi_by_dypi, hhat.reshape(3, 1)
