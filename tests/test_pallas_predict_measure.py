"""Fused predict+measure kernel vs core.ekf.predict + the vmapped XLA
measurement chain (interpret mode on CPU; f32-level tolerances)."""

import numpy as np
import jax
import jax.numpy as jnp

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import ekf, models
from scenelib2_tpu.core.camera import CameraParams, measurement_noise
from scenelib2_tpu.kernels import pallas_measure as pm
from scenelib2_tpu.kernels.pallas_predict_measure import pallas_predict_measure

import pytest

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow

CAM_DIM = 13


def _scene(rng, MF=8):
    params = Params()
    cam = CameraParams.from_params(params)
    D = CAM_DIM + 6 * MF
    x = np.zeros(D)
    x[3] = 1.0
    x[4:7] = rng.normal(0, 0.02, 3)
    x[2] = -0.8
    x[7:10] = rng.normal(0, 0.1, 3)           # velocity
    x[10:13] = rng.normal(0, 0.2, 3)          # omega
    for k in range(MF):
        x[CAM_DIM + 6 * k + 0] = rng.uniform(-0.3, 0.3)
        x[CAM_DIM + 6 * k + 1] = rng.uniform(-0.2, 0.2)
        x[CAM_DIM + 6 * k + 2] = 0.0
    xpo = np.tile(x[:7], (MF, 1))
    xpo[:, :3] += rng.normal(0, 0.005, (MF, 3))
    A = rng.normal(size=(D, D))
    P = (A @ A.T / (4 * D) + np.eye(D)) * 1e-4
    act = np.ones(MF, bool)
    act[-1] = False
    return params, cam, x, xpo, P, act


@pytest.mark.parametrize("MF", [8, 60])
def test_predict_measure_matches_xla_chain(rng, MF):
    # MF=60 is the hires operating point (D = 373 -> TD = 384): exercises
    # the multi-tile P block of the generalized kernel
    params, cam, x, xpo, P, act = _scene(rng, MF=MF)

    # reference path: f64 predict then vmapped measurement chain, all f32-cast
    xj64 = jnp.asarray(x)
    Pj64 = jnp.asarray(P)
    u = jnp.zeros(3)
    x_pred, P_pred = ekf.predict(xj64, Pj64, u, params.delta_t,
                                 params.sd_a, params.sd_alpha)
    x_pred = np.asarray(x_pred)
    P_pred = np.asarray(P_pred)

    xpj = jnp.asarray(x_pred[:7])
    Pxx = jnp.asarray(P_pred[:CAM_DIM, :CAM_DIM])
    ys = np.stack([x_pred[CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3] for k in range(MF)])
    pxy3 = jnp.asarray(np.stack(
        [P_pred[:CAM_DIM, CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3] for k in range(MF)]
    ))
    pyy3 = jnp.asarray(np.stack(
        [P_pred[CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3,
                CAM_DIM + 6 * k : CAM_DIM + 6 * k + 3] for k in range(MF)]
    ))

    def per_slot(y, pxy_i, pyy_i, xp_org):
        h, hx7, hy, zeroed = models.full_predict_measurement(cam, y, xpj)
        hx = jnp.pad(hx7, ((0, 0), (0, CAM_DIM - 7)))
        R = measurement_noise(cam, h)
        S = models.innovation_covariance(Pxx, pxy_i, pyy_i, hx, hy, R)
        vis = models.full_visibility_test(
            cam, xpj, y, xp_org, h, params.image_search_boundary,
            params.max_length_ratio, params.max_angle_difference,
        )
        return h, S, vis

    h_a, S_a, vis_a = jax.vmap(per_slot)(
        jnp.asarray(ys), pxy3, pyy3, jnp.asarray(xpo)
    )

    meas, sel, x_k, P_k, top_idx, top_score, n_vis, pidx, pmask = pallas_predict_measure(
        jnp.asarray(x, jnp.float32), jnp.asarray(P, jnp.float32),
        jnp.asarray(xpo), jnp.asarray(act), jnp.zeros(act.shape, bool),
        nsel=params.n_features_to_select, maxp=1,
        dt=params.delta_t, sd_a=params.sd_a, sd_alpha=params.sd_alpha,
        cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
        sd0=cam.sd, image_shape=(cam.height, cam.width),
        boundary=params.image_search_boundary,
        max_length_ratio=params.max_length_ratio,
        max_angle_difference=params.max_angle_difference, interpret=True,
    )
    meas = np.asarray(meas)

    # predicted state/covariance
    np.testing.assert_allclose(np.asarray(x_k), x_pred, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(P_k), P_pred, rtol=1e-4, atol=1e-6)
    # feature block of P must pass through EXACTLY (identity contraction)
    np.testing.assert_array_equal(
        np.asarray(P_k)[CAM_DIM:, CAM_DIM:],
        np.asarray(P, np.float32)[CAM_DIM:, CAM_DIM:],
    )
    # feature states unchanged
    np.testing.assert_array_equal(
        np.asarray(x_k)[CAM_DIM:], np.asarray(x, np.float32)[CAM_DIM:]
    )

    # measurement rows on the predicted state
    assert (np.asarray(vis_a)[: MF - 1] == 0).sum() >= 3, np.asarray(vis_a)
    np.testing.assert_allclose(meas[pm.O_H : pm.O_H + 2].T, np.asarray(h_a),
                               rtol=1e-5, atol=5e-3)
    S_k = np.stack(
        [meas[pm.O_S], meas[pm.O_S + 1], meas[pm.O_S + 1], meas[pm.O_S + 2]],
        axis=1,
    ).reshape(MF, 2, 2)
    np.testing.assert_allclose(S_k, np.asarray(S_a), rtol=2e-3, atol=1e-6)
    np.testing.assert_array_equal(meas[pm.O_VIS].astype(int), np.asarray(vis_a))

    want_score = np.where(
        act & (np.asarray(vis_a) == 0),
        np.asarray(S_a)[:, 0, 0] + np.asarray(S_a)[:, 1, 1], -np.inf,
    )
    got = meas[pm.O_SCORE]
    np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want_score))
    fin = ~np.isneginf(want_score)
    np.testing.assert_allclose(got[fin], want_score[fin], rtol=2e-3)

    # in-kernel selection must equal lax.top_k on the kernel's own score row
    # (the kernel works on the -inf-padded 128-lane row, like the step does
    # on score[MF] with MF >= NSEL; pad the reference the same way)
    NSEL = params.n_features_to_select
    got_pad = np.full(128, -np.inf, np.float32)
    got_pad[:MF] = got
    ts_ref, ti_ref = jax.lax.top_k(jnp.asarray(got_pad), NSEL)
    np.testing.assert_array_equal(np.asarray(top_idx), np.asarray(ti_ref))
    live0 = ~np.isneginf(np.asarray(ts_ref))
    np.testing.assert_array_equal(
        np.asarray(top_score)[live0], np.asarray(ts_ref)[live0]
    )
    # sel content is only meaningful where the pick is real (top_score
    # finite); garbage columns are masked by sel_mask downstream
    live = ~np.isneginf(np.asarray(ts_ref))
    np.testing.assert_array_equal(
        np.asarray(sel)[:, live], meas[:, np.asarray(ti_ref)[live]]
    )
    assert int(n_vis) == int((act & (np.asarray(vis_a) == 0)).sum())
    # no partial slots in this scene
    assert not bool(np.asarray(pmask)[0])


def test_predict_measure_zero_omega_guard(rng):
    """The omega->0 guarded limit must match motion.func_fv_and_dfv_by_dxv."""
    params, cam, x, xpo, P, act = _scene(rng)
    x[10:13] = 0.0
    x_pred, P_pred = ekf.predict(
        jnp.asarray(x), jnp.asarray(P), jnp.zeros(3), params.delta_t,
        params.sd_a, params.sd_alpha,
    )
    _, _, x_k, P_k, _, _, _, _, _ = pallas_predict_measure(
        jnp.asarray(x, jnp.float32), jnp.asarray(P, jnp.float32),
        jnp.asarray(xpo), jnp.asarray(act), jnp.zeros(act.shape, bool),
        nsel=params.n_features_to_select, maxp=1,
        dt=params.delta_t, sd_a=params.sd_a, sd_alpha=params.sd_alpha,
        cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
        sd0=cam.sd, image_shape=(cam.height, cam.width),
        boundary=params.image_search_boundary,
        max_length_ratio=params.max_length_ratio,
        max_angle_difference=params.max_angle_difference, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_pred),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_pred),
                               rtol=1e-4, atol=1e-6)
