"""Cross-validation against the ACTUAL reference C++ (VERDICT item 4).

native/libcrosscheck.so compiles the reference's Pangolin-free translation
units (camera.cpp, motion_model.cpp, feature_model.cpp, full/part_feature_
model.cpp, feature_init_info.cpp, support/math_util.cpp, improc/*.cpp)
behind a flat C ABI (native/crosscheck.cpp). These tests drive that library
on random inputs and assert the JAX implementations (and, where relevant,
the NumPy oracle) agree to float64 noise — closing the "parity only vs the
builder's own oracle" gap: the ground truth here is the reference binary
itself, not anyone's reading of it.

Skipped (not failed) when the .so cannot be built — e.g. the read-only
reference tree or OpenCV dev headers are absent.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import camera as C
from scenelib2_tpu.core import models as FM
from scenelib2_tpu.core import motion as M
from scenelib2_tpu.core import quaternion as Q
from tests import oracle_improc as OI

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
LIB_PATH = os.path.abspath(os.path.join(NATIVE_DIR, "libcrosscheck.so"))
REF = "/root/reference/scenelib2"

F64 = ctypes.POINTER(ctypes.c_double)
U8 = ctypes.POINTER(ctypes.c_ubyte)
I32 = ctypes.POINTER(ctypes.c_int)


def _load_lib():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available", allow_module_level=False)
    if not os.path.exists(LIB_PATH):
        r = subprocess.run(
            ["make", "-C", os.path.abspath(NATIVE_DIR), "crosscheck"],
            capture_output=True, text=True,
        )
        if r.returncode != 0 or not os.path.exists(LIB_PATH):
            pytest.skip(f"libcrosscheck.so build failed:\n{r.stderr[-2000:]}")
    lib = ctypes.CDLL(LIB_PATH)
    lib.xc_full_selection_score.restype = ctypes.c_double
    lib.xc_correlate2.restype = ctypes.c_double
    lib.xc_particle_update.restype = ctypes.c_int
    return lib


@pytest.fixture(scope="module")
def lib():
    lib = _load_lib()
    # stock TestSeqMonoSLAM intrinsics (data/SceneLib2.cfg:24-31)
    lib.xc_set_camera(320, 240, ctypes.c_double(195.0), ctypes.c_double(195.0),
                      ctypes.c_double(162.0), ctypes.c_double(125.0),
                      ctypes.c_double(9e-6), 1)
    return lib


CAM = C.CameraParams(320, 240, 195.0, 195.0, 162.0, 125.0, 9e-6, 1.0)


def buf(n):
    return (ctypes.c_double * n)()


def arr(x):
    a = np.ascontiguousarray(x, dtype=np.float64)
    return a.ctypes.data_as(F64)


def out(b, shape):
    return np.frombuffer(b, dtype=np.float64).reshape(shape).copy()


def unit_q(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def random_xv(rng):
    return np.concatenate([
        rng.normal(size=3) * 0.5, unit_q(rng),
        rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.4,
    ])


# --------------------------------------------------------------------- camera


def test_camera_vs_reference(lib, rng):
    for _ in range(20):
        y = np.array([rng.normal() * 0.4, rng.normal() * 0.4, rng.uniform(0.3, 5.0)])
        h2, jac = buf(2), buf(6)
        lib.xc_camera_project(arr(y), h2, jac)
        np.testing.assert_allclose(np.asarray(C.project(CAM, jnp.asarray(y))),
                                   out(h2, (2,)), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(C.project_jacobian(CAM, jnp.asarray(y))),
                                   out(jac, (2, 3)), rtol=0, atol=1e-11)

        h = np.array([rng.uniform(5, 315), rng.uniform(5, 235)])
        y3, jac2 = buf(3), buf(6)
        lib.xc_camera_unproject(arr(h), y3, jac2)
        np.testing.assert_allclose(np.asarray(C.unproject(CAM, jnp.asarray(h))),
                                   out(y3, (3,)), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(C.unproject_jacobian(CAM, jnp.asarray(h))),
                                   out(jac2, (3, 2)), rtol=0, atol=1e-13)

        R4 = buf(4)
        lib.xc_camera_noise(arr(h), R4)
        np.testing.assert_allclose(np.asarray(C.measurement_noise(CAM, jnp.asarray(h))),
                                   out(R4, (2, 2)), rtol=1e-13)


# --------------------------------------------------------------------- motion


def test_motion_vs_reference(lib, rng):
    dt = 1.0 / 30.0
    for i in range(20):
        xv = random_xv(rng)
        u = np.zeros(3)
        fv_b, F_b = buf(13), buf(169)
        lib.xc_motion_fv(arr(xv), arr(u), ctypes.c_double(dt), fv_b, F_b)
        fv_j, F_j = M.func_fv_and_dfv_by_dxv(jnp.asarray(xv), jnp.asarray(u), dt)
        np.testing.assert_allclose(np.asarray(fv_j), out(fv_b, (13,)), rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(F_j), out(F_b, (13, 13)), rtol=0, atol=1e-12)

        Q_b = buf(169)
        lib.xc_motion_Q(arr(xv), arr(u), ctypes.c_double(dt), Q_b)
        # reference MotionModel hard-codes SD_A=4.0, SD_alpha=6.0 (motion_model.cpp:43-45)
        Q_j = M.func_Q(jnp.asarray(xv), dt, 4.0, 6.0)
        np.testing.assert_allclose(np.asarray(Q_j), out(Q_b, (13, 13)), rtol=0, atol=1e-14)

        xvn_b, J_b = buf(13), buf(169)
        lib.xc_motion_xvnorm(arr(xv), xvn_b, J_b)
        xvn_j, J_j = M.func_xvnorm_and_dxvnorm_by_dxv(jnp.asarray(xv))
        np.testing.assert_allclose(np.asarray(xvn_j), out(xvn_b, (13,)), rtol=0, atol=1e-15)
        np.testing.assert_allclose(np.asarray(J_j), out(J_b, (13, 13)), rtol=0, atol=1e-13)


def test_omega_zero_quirk(lib):
    """At exactly omega=0 the reference's dqomegadt_by_domega divides 0/0 and
    returns NaN (motion_model.cpp:319-350 — no guard). The stock config never
    hits it (initial ww_z=0.01, SceneLib2.cfg:83). Our version returns the
    analytic limit instead: identical for all omega != 0, finite at 0."""
    dt = 1.0 / 30.0
    o16 = buf(12)
    lib.xc_motion_dqomegadt(arr(np.zeros(3)), ctypes.c_double(dt), o16)
    assert np.isnan(out(o16, (4, 3))).any()
    J = np.asarray(Q.dqomegadt_by_domega(jnp.zeros(3), dt))
    assert np.isfinite(J).all()
    # finite limit: dq/domega -> [[0,0,0], dt/2 * I]
    np.testing.assert_allclose(J[1:, :], np.eye(3) * dt / 2.0, atol=1e-15)
    np.testing.assert_allclose(J[0, :], 0.0, atol=1e-15)


def test_quaternion_jacobians_vs_reference(lib, rng):
    dt = 1.0 / 30.0
    for i in range(20):
        om = rng.normal(size=3)
        o16 = buf(12)
        lib.xc_motion_dqomegadt(arr(om), ctypes.c_double(dt), o16)
        np.testing.assert_allclose(np.asarray(Q.dqomegadt_by_domega(jnp.asarray(om), dt)),
                                   out(o16, (4, 3)), rtol=0, atol=1e-13)

        q = unit_q(rng) * rng.uniform(0.5, 1.5)  # dqnorm on non-unit q too
        o44 = buf(16)
        lib.xc_dqnorm_by_dq(arr(q), o44)
        np.testing.assert_allclose(np.asarray(Q.dqnorm_by_dq(jnp.asarray(q))),
                                   out(o44, (4, 4)), rtol=0, atol=1e-12)

        lib.xc_dq3_by_dq1(arr(q), o44)
        np.testing.assert_allclose(np.asarray(Q.dq3_by_dq1(jnp.asarray(q))),
                                   out(o44, (4, 4)), rtol=0, atol=1e-15)
        lib.xc_dq3_by_dq2(arr(q), o44)
        np.testing.assert_allclose(np.asarray(Q.dq3_by_dq2(jnp.asarray(q))),
                                   out(o44, (4, 4)), rtol=0, atol=1e-15)

        av = rng.normal(size=3) * (0.0 if i == 1 else 0.8)
        q4 = buf(4)
        lib.xc_quat_from_av(arr(av), q4)
        np.testing.assert_allclose(np.asarray(Q.quat_from_angular_velocity(jnp.asarray(av))),
                                   out(q4, (4,)), rtol=0, atol=1e-15)


# -------------------------------------------------------- feature model base


def test_feature_model_base_vs_reference(lib, rng):
    o44 = buf(16)
    lib.xc_dqbar_by_dq(o44)
    np.testing.assert_array_equal(np.asarray(Q.dqbar_by_dq()), out(o44, (4, 4)))

    for _ in range(10):
        q = unit_q(rng)
        a = rng.normal(size=3)
        o34 = buf(12)
        lib.xc_dRq_times_a_by_dq(arr(q), arr(a), o34)
        np.testing.assert_allclose(np.asarray(Q.dRq_times_a_by_dq(jnp.asarray(q), jnp.asarray(a))),
                                   out(o34, (3, 4)), rtol=0, atol=1e-13)

    for _ in range(5):
        A = rng.normal(size=(13, 13))
        Pxx = A @ A.T
        Pxy = rng.normal(size=(13, 3))
        Bm = rng.normal(size=(3, 3))
        Pyy = Bm @ Bm.T
        hx = rng.normal(size=(2, 13))
        hy = rng.normal(size=(2, 3))
        Ri = np.eye(2) * rng.uniform(0.5, 2.0)
        S = buf(4)
        lib.xc_func_si(arr(Pxx), arr(Pxy), arr(Pyy), arr(hx), arr(hy), arr(Ri), S)
        S_j = FM.innovation_covariance(jnp.asarray(Pxx), jnp.asarray(Pxy), jnp.asarray(Pyy),
                                       jnp.asarray(hx), jnp.asarray(hy), jnp.asarray(Ri))
        np.testing.assert_allclose(np.asarray(S_j), out(S, (2, 2)), rtol=1e-12)


# ------------------------------------------------------------ full feature


def test_full_feature_vs_reference(lib, rng):
    for _ in range(20):
        xp = np.concatenate([rng.normal(size=3) * 0.3, unit_q(rng)])
        # a point broadly in front of the camera
        from tests.oracle_monoslam import quat_R
        y = xp[:3] + quat_R(xp[3:7]) @ np.array(
            [rng.normal() * 0.3, rng.normal() * 0.3, rng.uniform(0.5, 4.0)])

        z3, dzx, dzy = buf(3), buf(21), buf(9)
        lib.xc_full_zeroedyi(arr(y), arr(xp), z3, dzx, dzy)
        z_j, dzx_j, dzy_j = FM.full_zeroedyi(jnp.asarray(y), jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(z_j), out(z3, (3,)), rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(dzx_j), out(dzx, (3, 7)), rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(dzy_j), out(dzy, (3, 3)), rtol=0, atol=1e-13)

        hi, dhx, dhy = buf(2), buf(14), buf(6)
        lib.xc_full_hi(arr(y), arr(xp), hi, dhx, dhy)
        h_j, hx_j, hy_j, _ = FM.full_predict_measurement(CAM, jnp.asarray(y), jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(h_j), out(hi, (2,)), rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(hx_j), out(dhx, (2, 7)), rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(hy_j), out(dhy, (2, 3)), rtol=0, atol=1e-9)

        S2 = rng.normal(size=(2, 2))
        S2 = S2 @ S2.T + np.eye(2)
        assert lib.xc_full_selection_score(arr(S2)) == pytest.approx(np.trace(S2), rel=1e-15)


def test_full_visibility_vs_reference(lib, rng):
    from tests.oracle_monoslam import quat_R
    hits = set()
    for _ in range(200):
        xp_org = np.concatenate([rng.normal(size=3) * 0.2, unit_q(rng)])
        y = xp_org[:3] + quat_R(xp_org[3:7]) @ np.array(
            [rng.normal() * 0.2, rng.normal() * 0.2, rng.uniform(0.4, 3.0)])
        xp = np.concatenate([xp_org[:3] + rng.normal(size=3) * rng.uniform(0, 1.5),
                             unit_q(rng) if rng.uniform() < 0.4 else xp_org[3:7]])
        z_j = np.asarray(FM.full_zeroedyi(jnp.asarray(y), jnp.asarray(xp))[0])
        h = (np.asarray(C.project(CAM, jnp.asarray(z_j)))
             if z_j[2] > 1e-9 else np.array([500.0, 500.0]))
        f_ref = lib.xc_full_visibility(arr(xp), arr(y), arr(xp_org), arr(h))
        f_j = int(FM.full_visibility_test(CAM, jnp.asarray(xp), jnp.asarray(y),
                                          jnp.asarray(xp_org), jnp.asarray(h)))
        assert f_j == f_ref, (xp, y, h, f_j, f_ref)
        hits.add(f_ref)
    assert len(hits) >= 4  # exercised several distinct flag combinations


# ------------------------------------------------------------ part feature


def test_part_feature_vs_reference(lib, rng):
    for _ in range(20):
        xp = np.concatenate([rng.normal(size=3) * 0.3, unit_q(rng)])
        h = np.array([rng.uniform(20, 300), rng.uniform(20, 220)])

        ypi, dyx, dyh, Ri = buf(6), buf(42), buf(12), buf(4)
        lib.xc_part_ypi(arr(h), arr(xp), ypi, dyx, dyh, Ri)
        ypi_j, dyx_j, dyh_j = FM.part_init_ray(CAM, jnp.asarray(h), jnp.asarray(xp))
        np.testing.assert_allclose(np.asarray(ypi_j), out(ypi, (6,)), rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(dyx_j), out(dyx, (6, 7)), rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(dyh_j), out(dyh, (6, 2)), rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(C.measurement_noise(CAM, jnp.asarray(h))),
                                   out(Ri, (2, 2)), rtol=1e-13)

        y6 = np.asarray(ypi_j)
        lam = rng.uniform(0.5, 5.0)
        hpi, dhx, dhy = buf(2), buf(14), buf(12)
        lib.xc_part_hpi(arr(y6), arr(xp), ctypes.c_double(lam), hpi, dhx, dhy)
        hpi_j, dhx_j, dhy_j = FM.part_predict_measurement(
            CAM, jnp.asarray(y6), jnp.asarray(xp), jnp.asarray(lam))
        np.testing.assert_allclose(np.asarray(hpi_j), out(hpi, (2,)), rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(dhx_j), out(dhx, (2, 7)), rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dhy_j), out(dhy, (2, 6)), rtol=0, atol=1e-9)

        yfi, dyp, dyl = buf(3), buf(18), buf(3)
        lib.xc_part_yfi(arr(y6), ctypes.c_double(lam), yfi, dyp, dyl)
        yfi_j, dyp_j, dyl_j = FM.part_convert_to_full(jnp.asarray(y6), jnp.asarray(lam))
        np.testing.assert_allclose(np.asarray(yfi_j), out(yfi, (3,)), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(dyp_j), out(dyp, (3, 6)), rtol=0, atol=1e-15)
        np.testing.assert_allclose(np.asarray(dyl_j), out(dyl, (3, 1)), rtol=0, atol=1e-15)


# ------------------------------------------------------------------- improc


def _rand_image(rng, H=60, W=80):
    # smooth-ish random texture so NSSD has structure
    img = rng.integers(0, 256, size=(H, W)).astype(np.float64)
    k = np.ones((3, 3)) / 9.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(np.pad(img, 1, mode="edge"), (3, 3))
    img = (sm * k).sum(axis=(-2, -1))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_correlate2_vs_reference(lib, rng):
    B = 11
    img = _rand_image(rng)
    H, W = img.shape
    pimg = img.ctypes.data_as(U8)
    for _ in range(50):
        x1 = int(rng.integers(0, W - B + 1))
        y1 = int(rng.integers(0, H - B + 1))
        patch = np.ascontiguousarray(
            img[max(0, y1 - 3):max(0, y1 - 3) + B, max(0, x1 - 3):max(0, x1 - 3) + B])
        sd0, sd1 = ctypes.c_double(), ctypes.c_double()
        c_ref = lib.xc_correlate2(0, 0, B, B, x1, y1,
                                  patch.ctypes.data_as(U8), B, B, pimg, H, W,
                                  ctypes.byref(sd0), ctypes.byref(sd1))
        c_o, sd0_o, sd1_o = OI.correlate2(patch, img, x1, y1)
        assert c_ref == pytest.approx(c_o, rel=1e-12, abs=1e-12)
        assert sd0.value == pytest.approx(sd0_o, rel=1e-12)
        assert sd1.value == pytest.approx(sd1_o, rel=1e-12)
    # zero-variance specials (improc.cpp:117-125)
    flat = np.full((B, B), 77, np.uint8)
    fimg = np.full((H, W), 13, np.uint8)
    sd0, sd1 = ctypes.c_double(), ctypes.c_double()
    c_ref = lib.xc_correlate2(0, 0, B, B, 5, 5, flat.ctypes.data_as(U8), B, B,
                              fimg.ctypes.data_as(U8), H, W,
                              ctypes.byref(sd0), ctypes.byref(sd1))
    assert c_ref == OI.correlate2(flat, fimg, 5, 5)[0] == 0.0
    c_ref = lib.xc_correlate2(0, 0, B, B, 5, 5, flat.ctypes.data_as(U8), B, B,
                              img.ctypes.data_as(U8), H, W,
                              ctypes.byref(sd0), ctypes.byref(sd1))
    assert c_ref == OI.correlate2(flat, img, 5, 5)[0] == 1.0


def test_multi_ellipse_search_vs_reference(lib, rng):
    B = 11
    img = _rand_image(rng, 60, 80)
    H, W = img.shape
    # patch taken from the image so there is a true match
    cu, cv = 40, 30
    patch = np.ascontiguousarray(img[cv - 5:cv + 6, cu - 5:cu + 6])
    n = 6
    centres, sinvs = [], []
    for k in range(n):
        c = np.array([cu + rng.normal() * 2.5, cv + rng.normal() * 2.5])
        a = rng.uniform(0.05, 0.4)
        b = rng.uniform(0.05, 0.4)
        rho = rng.uniform(-0.2, 0.2)
        Sinv = np.array([[a, rho * math.sqrt(a * b)], [rho * math.sqrt(a * b), b]])
        centres.append(c)
        sinvs.append(Sinv)
    flags = (ctypes.c_int * n)()
    us = (ctypes.c_int * n)()
    vs = (ctypes.c_int * n)()
    lib.xc_search_ellipses(img.ctypes.data_as(U8), H, W,
                           patch.ctypes.data_as(U8), B, n,
                           arr(np.stack(sinvs).reshape(-1)),
                           arr(np.stack(centres).reshape(-1)),
                           flags, us, vs)
    oracle = OI.multi_ellipse_search(img, patch, centres, sinvs, B)
    from scenelib2_tpu.kernels import correlate as CK
    fsums = CK.frame_sums(jnp.asarray(img), B)
    cross = CK.cross_sum_maps(jnp.asarray(img), jnp.asarray(patch)[None], B)
    sg0, sg0sq = CK.patch_stats(jnp.asarray(patch)[None])
    ok_j, u_j, v_j, over = CK.multi_ellipse_search(
        fsums, cross[0], sg0[0], sg0sq[0],
        jnp.asarray(np.stack(centres)), jnp.asarray(np.stack(sinvs)),
        jnp.ones(n, bool), B, win_radius=16)
    for k in range(n):
        assert (bool(flags[k]), us[k], vs[k]) == oracle[k], (k, oracle[k])
        assert bool(np.asarray(ok_j)[k]) == bool(flags[k])
        if flags[k]:
            assert int(np.asarray(u_j)[k]) == us[k]
            assert int(np.asarray(v_j)[k]) == vs[k]


# ------------------------------------------------------- particle depth filter


def test_particle_set_S_vs_reference(lib, rng):
    for _ in range(20):
        A = rng.normal(size=(2, 2))
        S = A @ A.T + np.eye(2) * 0.1
        SInv, det = buf(4), ctypes.c_double()
        lib.xc_particle_set_S(arr(S), SInv, ctypes.byref(det))
        np.testing.assert_allclose(out(SInv, (2, 2)), np.linalg.inv(S), rtol=1e-10)
        assert det.value == pytest.approx(np.linalg.det(S), rel=1e-12)


def test_particle_update_vs_reference(lib, rng):
    """Bayes update -> normalise -> prune -> renormalise -> moments, vs the
    actual FeatureInitInfo code (feature_init_info.cpp:99-176)."""
    for trial in range(10):
        n = 40
        lams = np.linspace(0.5, 5.0, n) + rng.normal(size=n) * 0.01
        probs = rng.uniform(0.1, 1.0, size=n)
        hs = rng.uniform(50, 200, size=(n, 2))
        zs = hs + rng.normal(size=(n, 2)) * 2.0
        success = (rng.uniform(size=n) < (0.0 if trial == 9 else 0.8)).astype(np.int32)
        sinvs = np.zeros((n, 2, 2))
        dets = np.zeros(n)
        for k in range(n):
            A = rng.normal(size=(2, 2))
            S = A @ A.T + np.eye(2) * 2.0
            sinvs[k] = np.linalg.inv(S)
            dets[k] = np.linalg.det(S)

        n_out = ctypes.c_int()
        lam_o, prob_o, cum_o = buf(n), buf(n), buf(n)
        mean_o, cov_o = ctypes.c_double(), ctypes.c_double()
        ok = lib.xc_particle_update(
            n, arr(lams), arr(probs), arr(zs.reshape(-1)), arr(hs.reshape(-1)),
            arr(sinvs.reshape(-1)), arr(dets),
            success.ctypes.data_as(I32), ctypes.c_double(0.05),
            ctypes.byref(n_out), lam_o, prob_o, cum_o,
            ctypes.byref(mean_o), ctypes.byref(cov_o))

        # independent NumPy statement of the same semantics
        lik = np.zeros(n)
        for k in range(n):
            if success[k]:
                nu = zs[k] - hs[k]
                lik[k] = (1.0 / math.sqrt(2 * math.pi * dets[k])) * math.exp(
                    -0.5 * nu @ sinvs[k] @ nu)
        p = probs * lik
        if p.sum() == 0.0:
            assert ok == 0
            continue
        assert ok == 1
        p = p / p.sum()
        keep = p >= 0.05 / n  # threshold fixed before erasing (cpp:128-130)
        lam_k, p_k = lams[keep], p[keep]
        if p_k.sum() > 0:
            p_k = p_k / p_k.sum()
        mean = float((lam_k * p_k).sum())
        cov = float((lam_k * lam_k * p_k).sum() - mean * mean)

        assert n_out.value == keep.sum()
        np.testing.assert_allclose(out(lam_o, (n,))[: n_out.value], lam_k, rtol=1e-14)
        np.testing.assert_allclose(out(prob_o, (n,))[: n_out.value], p_k, rtol=1e-11)
        np.testing.assert_allclose(out(cum_o, (n,))[: n_out.value], np.cumsum(p_k), rtol=1e-10)
        assert mean_o.value == pytest.approx(mean, rel=1e-11)
        assert cov_o.value == pytest.approx(cov, rel=1e-8, abs=1e-13)
