"""Stateless pinhole camera with SceneLib2's negated-focal + radial model.

Replicates reference scenelib2/camera.cpp exactly (do NOT "fix" to a standard
Brown model — the conventions below are part of the parity surface):

  project   (camera.cpp:90-114):  u_c = (-fku*x/z, -fkv*y/z),
            h = u_c / sqrt(1 + 2*kd1*|u_c|^2) + centre
  unproject (camera.cpp:133-154): u_c = (h-centre)/sqrt(1 - 2*kd1*|h-centre|^2),
            y = (u_c.x/-fku, u_c.y/-fkv, 1)
  projection_jacobian   (camera.cpp:183-215)
  unprojection_jacobian (camera.cpp:247-275)
  measurement_noise     (camera.cpp:282-300): sd*(1+d/dmax), R = var*I2

Unlike the reference's Camera class there is no hidden last_camera_ state:
functions return Jacobians together with values. All functions vmap cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scenelib2_tpu.config import Params


class CameraParams(NamedTuple):
    width: int
    height: int
    fku: float
    fkv: float
    u0: float
    v0: float
    kd1: float
    sd: float

    @staticmethod
    def from_params(p: Params) -> "CameraParams":
        return CameraParams(
            p.cam_width, p.cam_height, p.cam_fku, p.cam_fkv, p.cam_u0, p.cam_v0, p.cam_kd1, p.cam_sd
        )

    @property
    def centre(self) -> jnp.ndarray:
        return jnp.array([self.u0, self.v0], jnp.float64)


def project(cam: CameraParams, y: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame point [3] -> distorted image coords [2]."""
    uc = jnp.stack([-cam.fku * y[0] / y[2], -cam.fkv * y[1] / y[2]])
    radius2 = uc[0] * uc[0] + uc[1] * uc[1]
    factor = jnp.sqrt(1.0 + 2.0 * cam.kd1 * radius2)
    return uc / factor + cam.centre


def project_jacobian(cam: CameraParams, y: jnp.ndarray) -> jnp.ndarray:
    """2x3 dh/dy at camera point y (camera.cpp:183-215)."""
    fku_yz = cam.fku / y[2]
    fkv_yz = cam.fkv / y[2]
    du_by_dy = jnp.array(
        [
            [-fku_yz, 0.0, fku_yz * y[0] / y[2]],
            [0.0, -fkv_yz, fkv_yz * y[1] / y[2]],
        ]
    )
    uc = jnp.stack([-cam.fku * y[0] / y[2], -cam.fkv * y[1] / y[2]])
    outer = jnp.outer(uc, uc)
    radius2 = outer[0, 0] + outer[1, 1]
    distor = 1.0 + 2.0 * cam.kd1 * radius2
    distor1_2 = jnp.sqrt(distor)
    distor3_2 = distor1_2 * distor
    dh_by_du = outer * (-2.0 * cam.kd1 / distor3_2) + jnp.eye(2) / distor1_2
    return dh_by_du @ du_by_dy


def unproject(cam: CameraParams, h: jnp.ndarray) -> jnp.ndarray:
    """Image coords [2] -> camera-frame ray [3] with z=1 (camera.cpp:133-154)."""
    centred = h - cam.centre
    radius2 = centred[0] * centred[0] + centred[1] * centred[1]
    factor = jnp.sqrt(1.0 - 2.0 * cam.kd1 * radius2)
    und = centred / factor
    return jnp.stack([und[0] / -cam.fku, und[1] / -cam.fkv, jnp.ones((), und.dtype)])


def unproject_jacobian(cam: CameraParams, h: jnp.ndarray) -> jnp.ndarray:
    """3x2 dy/dh at image point h (camera.cpp:247-275)."""
    dy_by_du = jnp.array([[-1.0 / cam.fku, 0.0], [0.0, -1.0 / cam.fkv], [0.0, 0.0]])
    centred = h - cam.centre
    outer = jnp.outer(centred, centred)
    radius2 = outer[0, 0] + outer[1, 1]
    distor = 1.0 - 2.0 * cam.kd1 * radius2
    distor1_2 = jnp.sqrt(distor)
    distor3_2 = distor1_2 * distor
    du_by_dh = outer * (2.0 * cam.kd1 / distor3_2) + jnp.eye(2) / distor1_2
    return dy_by_du @ du_by_dh


def measurement_noise(cam: CameraParams, h: jnp.ndarray) -> jnp.ndarray:
    """2x2 diagonal R, sd grows radially to 2x at the corners (camera.cpp:282-300)."""
    distance = jnp.linalg.norm(h - cam.centre)
    max_distance = jnp.linalg.norm(cam.centre)
    ratio = distance / max_distance
    sd = cam.sd * (1.0 + ratio)
    return jnp.eye(2) * (sd * sd)
