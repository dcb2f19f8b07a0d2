"""Double-entry bookkeeping: the JAX core functions vs the independently
written NumPy oracle math (tests/oracle_monoslam.py). Both were derived from
the reference formulas separately; agreement to fp noise validates both."""

import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import camera as C
from scenelib2_tpu.core import models as FM
from scenelib2_tpu.core import motion as M
from tests import oracle_monoslam as O

CAM_J = C.CameraParams.from_params(Params())
CAM_O = O.Cam(320, 240, 195.0, 195.0, 162.0, 125.0, 9e-6, 1.0)


def unit_q(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_camera_cross(rng):
    y = np.array([0.15, -0.1, 1.7])
    np.testing.assert_allclose(np.asarray(C.project(CAM_J, jnp.asarray(y))), CAM_O.project(y), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(C.project_jacobian(CAM_J, jnp.asarray(y))), CAM_O.project_jac(y), rtol=1e-13
    )
    h = np.array([140.0, 100.0])
    np.testing.assert_allclose(np.asarray(C.unproject(CAM_J, jnp.asarray(h))), CAM_O.unproject(h), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(C.unproject_jacobian(CAM_J, jnp.asarray(h))), CAM_O.unproject_jac(h), rtol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(C.measurement_noise(CAM_J, jnp.asarray(h))), CAM_O.noise(h), rtol=1e-14
    )


def test_motion_cross(rng):
    xv = np.concatenate([rng.normal(size=3), unit_q(rng), rng.normal(size=3) * 0.2,
                         rng.normal(size=3) * 0.1 + 0.05])
    u = np.zeros(3)
    dt = 1 / 30.0
    fv_j, F_j = M.func_fv_and_dfv_by_dxv(jnp.asarray(xv), jnp.asarray(u), dt)
    oracle = O.OracleMonoSLAM(CAM_O, Params(), np.zeros(13), np.zeros((13, 13)))
    fv_o, F_o = oracle.fv_F(xv, u, dt)
    np.testing.assert_allclose(np.asarray(fv_j), fv_o, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(F_j), F_o, atol=1e-13)
    Q_j = M.func_Q(jnp.asarray(xv), dt, 4.0, 6.0)
    Q_o = oracle.Qmat(xv, dt)
    np.testing.assert_allclose(np.asarray(Q_j), Q_o, atol=1e-15)


def test_full_feature_cross(rng):
    oracle = O.OracleMonoSLAM(CAM_O, Params(), np.zeros(13), np.zeros((13, 13)))
    xp = np.concatenate([rng.normal(size=3) * 0.1, unit_q(rng)])
    y = xp[:3] + O.quat_R(xp[3:7]) @ np.array([0.1, 0.05, 1.5])
    h_j, hx_j, hy_j, z_j = FM.full_predict_measurement(CAM_J, jnp.asarray(y), jnp.asarray(xp))
    h_o, hx_o, hy_o, z_o = oracle.hi_full(y, xp)
    np.testing.assert_allclose(np.asarray(h_j), h_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hx_j)[:, :7], hx_o, atol=1e-11)
    np.testing.assert_allclose(np.asarray(hy_j), hy_o, atol=1e-12)
    # visibility flags agree across displacement cases
    for dr in ([0, 0, 0], [0, 0, 1.2], [3.0, 0, 0], [0.4, 0, 0]):
        xp2 = xp.copy()
        xp2[:3] += np.asarray(dr)
        z2, _, _ = oracle.zeroedyi_full(y, xp2)
        h2 = CAM_O.project(z2) if z2[2] > 0 else np.array([500.0, 500.0])
        f_o = oracle.visible(y, xp2, xp, h2)
        f_j = int(
            FM.full_visibility_test(CAM_J, jnp.asarray(xp2), jnp.asarray(y), jnp.asarray(xp), jnp.asarray(h2))
        )
        assert f_o == f_j, (dr, f_o, f_j)


def test_part_feature_cross(rng):
    oracle = O.OracleMonoSLAM(CAM_O, Params(), np.zeros(13), np.zeros((13, 13)))
    xp = np.concatenate([rng.normal(size=3) * 0.1, unit_q(rng)])
    y6 = np.concatenate([xp[:3], O.quat_R(xp[3:7]) @ np.array([0.02, -0.03, 1.0])])
    y6[3:6] /= np.linalg.norm(y6[3:6])
    lam = 1.9
    z_o, dxp_o, dy_o = oracle.zeroedyi_part(y6, xp)
    z_j, dxp_j, dy_j = FM.part_zeroedyi(jnp.asarray(y6), jnp.asarray(xp))
    np.testing.assert_allclose(np.asarray(z_j), z_o, atol=1e-13)
    np.testing.assert_allclose(np.asarray(dxp_j), dxp_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dy_j), dy_o, atol=1e-13)
    h_j, hx_j, hy_j = FM.part_predict_measurement(CAM_J, jnp.asarray(y6), jnp.asarray(xp), jnp.asarray(lam))
    # oracle inline (same as match_partials body)
    hLR = z_o[:3] + lam * z_o[3:6]
    h_o = CAM_O.project(hLR)
    np.testing.assert_allclose(np.asarray(h_j), h_o, rtol=1e-12)


def test_norm_jacobian_cross(rng):
    from scenelib2_tpu.core.quaternion import dqnorm_by_dq, dvnorm_by_dv

    q = rng.normal(size=4) * 1.2
    np.testing.assert_allclose(np.asarray(dqnorm_by_dq(jnp.asarray(q))), O.norm_jac(q), rtol=1e-12)
    v = rng.normal(size=3) * 0.9
    np.testing.assert_allclose(np.asarray(dvnorm_by_dv(jnp.asarray(v))), O.norm_jac(v), rtol=1e-12)
