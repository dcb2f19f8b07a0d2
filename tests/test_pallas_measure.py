"""Lane-parallel measurement-prediction kernel vs the vmapped XLA chain
(interpret mode on CPU; f32-level tolerances)."""

import numpy as np
import jax
import jax.numpy as jnp

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import ekf, models
from scenelib2_tpu.core.camera import CameraParams, measurement_noise
from scenelib2_tpu.kernels import pallas_measure as pm

import pytest

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow; deselect with -m 'not pallas'

CAM_DIM = 13


def _scene(rng, MF=8):
    params = Params()
    cam = CameraParams.from_params(params)
    xp = np.zeros(7)
    xp[3] = 1.0
    xp[4:7] = rng.normal(0, 0.02, 3)          # small rotation off identity
    xp[2] = -0.8
    # features in front of the camera (world z=0 plane, camera at z=-0.8)
    ys = np.zeros((MF, 3))
    ys[:, 0] = rng.uniform(-0.3, 0.3, MF)
    ys[:, 1] = rng.uniform(-0.2, 0.2, MF)
    xpo = np.tile(xp, (MF, 1))
    xpo[:, :3] += rng.normal(0, 0.005, (MF, 3))
    D = CAM_DIM + 6 * MF
    A = rng.normal(size=(D, D))
    P = (A @ A.T / (4 * D) + np.eye(D)) * 1e-4
    act = np.ones(MF, bool)
    act[-1] = False
    return params, cam, xp, ys, xpo, P, act


def test_measure_kernel_matches_vmapped_chain(rng):
    params, cam, xp, ys, xpo, P, act = _scene(rng)
    MF = ys.shape[0]
    xpj = jnp.asarray(xp)
    Pxx = jnp.asarray(P[:CAM_DIM, :CAM_DIM])
    pxy3 = jnp.asarray(
        np.stack([P[:CAM_DIM, CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3] for k in range(MF)])
    )
    pyy3 = jnp.asarray(
        np.stack(
            [P[CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3,
               CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3] for k in range(MF)]
        )
    )

    def per_slot(y, pxy_i, pyy_i, xp_org):
        h, hx7, hy, zeroed = models.full_predict_measurement(cam, y, xpj)
        hx = jnp.pad(hx7, ((0, 0), (0, CAM_DIM - 7)))
        R = measurement_noise(cam, h)
        S = models.innovation_covariance(Pxx, pxy_i, pyy_i, hx, hy, R)
        vis = models.full_visibility_test(
            cam, xpj, y, xp_org, h, params.image_search_boundary,
            params.max_length_ratio, params.max_angle_difference,
        )
        return h, hx7, hy, R, S, vis, zeroed[2]

    h_a, hx_a, hy_a, R_a, S_a, vis_a, zz_a = jax.vmap(per_slot)(
        jnp.asarray(ys), pxy3, pyy3, jnp.asarray(xpo)
    )
    sinv_a = jax.vmap(ekf.inv2x2_via_chol)(S_a)

    out = np.asarray(
        pm.pallas_measure_predict(
            xpj, Pxx[:7, :7], jnp.asarray(ys), jnp.asarray(xpo),
            pxy3[:, :7, :], pyy3, jnp.asarray(act),
            cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
            sd0=cam.sd, image_shape=(cam.height, cam.width),
            boundary=params.image_search_boundary,
            max_length_ratio=params.max_length_ratio,
            max_angle_difference=params.max_angle_difference, interpret=True,
        )
    )

    # at least some features must be genuinely visible for a meaningful test
    assert (np.asarray(vis_a)[: MF - 1] == 0).sum() >= 4, np.asarray(vis_a)

    np.testing.assert_allclose(out[pm.O_H : pm.O_H + 2].T, np.asarray(h_a),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        out[pm.O_HX : pm.O_HX + 14].T.reshape(MF, 2, 7),
        np.asarray(hx_a)[:, :, :7], rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        out[pm.O_HY : pm.O_HY + 6].T.reshape(MF, 2, 3),
        np.asarray(hy_a), rtol=1e-3, atol=2e-3,
    )
    np.testing.assert_allclose(out[pm.O_RD], np.asarray(R_a)[:, 0, 0],
                               rtol=1e-5, atol=1e-6)
    S_k = np.stack(
        [out[pm.O_S], out[pm.O_S + 1], out[pm.O_S + 1], out[pm.O_S + 2]], axis=1
    ).reshape(MF, 2, 2)
    np.testing.assert_allclose(S_k, np.asarray(S_a), rtol=2e-3, atol=1e-6)
    sinv_k = np.stack(
        [out[pm.O_SINV], out[pm.O_SINV + 1], out[pm.O_SINV + 1],
         out[pm.O_SINV + 2]], axis=1
    ).reshape(MF, 2, 2)
    np.testing.assert_allclose(sinv_k, np.asarray(sinv_a), rtol=2e-3, atol=5e-2)
    np.testing.assert_array_equal(out[pm.O_VIS].astype(int), np.asarray(vis_a))
    np.testing.assert_allclose(out[pm.O_ZZ], np.asarray(zz_a), rtol=1e-5, atol=1e-6)

    want_score = np.where(
        act & (np.asarray(vis_a) == 0),
        np.asarray(S_a)[:, 0, 0] + np.asarray(S_a)[:, 1, 1], -np.inf,
    )
    got_score = out[pm.O_SCORE]
    np.testing.assert_array_equal(np.isneginf(got_score), np.isneginf(want_score))
    fin = ~np.isneginf(want_score)
    np.testing.assert_allclose(got_score[fin], want_score[fin], rtol=2e-3)
