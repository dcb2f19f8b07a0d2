"""Pallas fused search vs the XLA windowed search (interpret mode on CPU).

The kernel is the fast-mode path; in f32 its scores equal the XLA f32 path's
(same integer sums, same formula) so decisions must agree exactly on
non-degenerate inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from scenelib2_tpu.kernels import correlate
from scenelib2_tpu.kernels.pallas_search import gather_windows_u8, pallas_elliptical_search
from tests import oracle_improc as oracle

B = 11
R = 20


@pytest.fixture
def scene(rng):
    img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
    patch = img[40:51, 60:71].copy()
    return img, patch


def _run_pallas(img, patches, centres, sinvs, active):
    Hh, W = img.shape
    h = jnp.asarray(centres, jnp.float64)
    u0, v0, _, _ = correlate.search_window_origin(h, R, W, Hh, B, round_half=True)
    wins = gather_windows_u8(jnp.asarray(img), u0, v0, R, B)
    return pallas_elliptical_search(
        wins, jnp.asarray(patches), u0, v0, h,
        jnp.asarray(sinvs), jnp.asarray(active),
        image_shape=(Hh, W), boxsize=B, win_radius=R, interpret=True,
    )


def test_pallas_matches_oracle(scene):
    img, patch = scene
    sinv = np.array([[0.08, 0.01], [0.01, 0.05]])
    centres = [[65.2, 45.4], [60.0, 42.0], [20.0, 20.0]]
    found, u, v, best, over = _run_pallas(
        img, np.stack([patch] * 3), centres, [sinv] * 3, [True] * 3
    )
    for k, centre in enumerate(centres):
        f_o, u_o, v_o, best_o = oracle.elliptical_search(img, patch, centre, sinv, B)
        assert bool(found[k]) == f_o, (k, centre)
        if f_o:
            assert (int(u[k]), int(v[k])) == (u_o, v_o), (k, centre)
            # f32 score vs f64 oracle: equal to f32 tolerance
            np.testing.assert_allclose(float(best[k]), best_o, rtol=2e-5, atol=5e-5)


def test_pallas_matches_xla_search(scene, rng):
    img, patch = scene
    Hh, W = img.shape
    K = 4
    patches = np.stack([img[20 + 5 * k : 31 + 5 * k, 30 : 41] for k in range(K)])
    centres = np.array([[35.0 + 4 * k, 25.0 + 3 * k] for k in range(K)])
    sinvs = np.stack([np.array([[0.1, 0.01], [0.01, 0.08]])] * K)
    active = np.ones(K, bool)

    found_p, u_p, v_p, best_p, over_p = _run_pallas(img, patches, centres, sinvs, active)

    fsums = correlate.frame_sums(jnp.asarray(img), B)
    h = jnp.asarray(centres, jnp.float64)
    u0, v0, _, _ = correlate.search_window_origin(h, R, W, Hh, B, round_half=True)
    cross = correlate.cross_sum_windows(jnp.asarray(img), jnp.asarray(patches), u0, v0, R, B)
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patches))
    res = correlate.elliptical_search_batch(
        fsums, cross, sg0, sg0sq, u0, v0, h, jnp.asarray(sinvs),
        jnp.asarray(active), B, win_radius=R,
    )
    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(res.found))
    for k in range(K):
        if bool(res.found[k]):
            assert (int(u_p[k]), int(v_p[k])) == (int(res.u[k]), int(res.v[k])), k
        assert bool(over_p[k]) == bool(res.overflow[k])


def test_pallas_flat_patch_fails(scene):
    img, _ = scene
    flat = np.full((B, B), 99, np.uint8)
    found, u, v, best, over = _run_pallas(
        img, flat[None], [[60.0, 45.0]], [np.eye(2) * 0.05], [True]
    )
    assert not bool(found[0])


def test_pallas_particle_search_matches_dense(rng):
    """pallas_multi_ellipse_search vs multi_ellipse_search_dense: identical
    decisions/pixels on shared score maps (f32 both)."""
    from scenelib2_tpu.kernels.pallas_search import pallas_multi_ellipse_search

    Hh, W = 120, 160
    F, P = 2, 24
    Rwin = 16
    maps = rng.uniform(0.0, 2.0, size=(F, Hh, W)).astype(np.float32)
    # scatter some strong minima
    for f in range(F):
        for _ in range(30):
            maps[f, rng.integers(0, Hh), rng.integers(0, W)] = rng.uniform(0, 0.3)
    centres = np.stack(
        [
            np.stack(
                [rng.uniform(-5, W + 5, size=P), rng.uniform(-5, Hh + 5, size=P)],
                axis=1,
            )
            for _ in range(F)
        ]
    )
    sinvs = np.zeros((F, P, 2, 2))
    for f in range(F):
        for p in range(P):
            a = rng.uniform(0.02, 0.4)
            c = rng.uniform(0.02, 0.4)
            b = rng.uniform(-0.5, 0.5) * np.sqrt(a * c)
            sinvs[f, p] = [[a, b], [b, c]]
    alive = rng.uniform(size=(F, P)) > 0.2

    m32 = jnp.asarray(maps)
    h32 = jnp.asarray(centres, jnp.float32)
    s32 = jnp.asarray(sinvs, jnp.float32)
    al = jnp.asarray(alive)

    found_p, u_p, v_p, over_p = pallas_multi_ellipse_search(
        m32, h32, s32, al, win_radius=Rwin, interpret=True
    )

    def dense_f(cm, h_f, sinv_f, alive_f):
        return correlate.multi_ellipse_search_dense(
            cm, h_f, sinv_f, alive_f, win_radius=Rwin
        )

    import jax

    found_d, u_d, v_d, over_d = jax.vmap(dense_f)(m32, h32, s32, al)

    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(found_d))
    np.testing.assert_array_equal(np.asarray(over_p), np.asarray(over_d))
    fd = np.asarray(found_d)
    np.testing.assert_array_equal(np.asarray(u_p)[fd], np.asarray(u_d)[fd])
    np.testing.assert_array_equal(np.asarray(v_p)[fd], np.asarray(v_d)[fd])


def test_pallas_particle_predict_matches_xla(rng):
    """Lane-parallel particle prediction kernel vs the vmapped XLA chain."""
    import jax
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.core import ekf, models
    from scenelib2_tpu.core.camera import (
        CameraParams, measurement_noise, project, project_jacobian,
    )
    from scenelib2_tpu.kernels.pallas_particle import pallas_particle_predict

    params = Params()
    cam = CameraParams.from_params(params)
    f32 = jnp.float32
    xp = np.zeros(7)
    xp[3:7] = rng.normal(size=4)
    xp[3:7] /= np.linalg.norm(xp[3:7])
    xp[:3] = rng.normal(0, 0.1, 3)
    y6 = np.concatenate([rng.normal(0, 0.1, 3), rng.normal(size=3)])
    y6[3:] /= np.linalg.norm(y6[3:])
    if y6[5] < 0.3:
        y6[3:] = [0.1, 0.1, 0.99]
        y6[3:] /= np.linalg.norm(y6[3:])
    A = rng.normal(size=(13, 13))
    C13 = A @ A.T / 80 + np.eye(13) * 1e-4
    lam = np.linspace(0.5, 5.0, 64)

    xp32 = jnp.asarray(xp, f32)
    zeroed, dzx, dzy = models.part_zeroedyi(jnp.asarray(y6, f32), xp32)
    Pxx7 = jnp.asarray(C13[:7, :7], f32)
    pxy7 = jnp.asarray(C13[:7, 7:], f32)
    pyy = jnp.asarray(C13[7:, 7:], f32)

    Ctop = jnp.concatenate([Pxx7, pxy7], 1)
    Cbot = jnp.concatenate([pxy7.T, pyy], 1)
    C = jnp.concatenate([Ctop, Cbot], 0)
    N1 = jnp.concatenate([dzx[0:3], dzy[0:3]], 1)
    N2 = jnp.concatenate([dzx[3:6], dzy[3:6]], 1)
    CN1, CN2 = C @ N1.T, C @ N2.T
    K0, K12, K2 = N1 @ CN1, N1 @ CN2, N2 @ CN2
    Ksym = K12 + K12.T

    def ref_particle(lam_p):
        hLR = zeroed[0:3] + lam_p * zeroed[3:6]
        hpi = project(cam, hLR)
        Aj = project_jacobian(cam, hLR)
        Kl = K0 + lam_p * Ksym + (lam_p * lam_p) * K2
        S = Aj @ Kl @ Aj.T + measurement_noise(cam, hpi)
        return hpi, ekf.inv2x2_via_chol(S), S[0, 0] * S[1, 1] - S[1, 0] * S[0, 1]

    h_ref, sinv_ref, det_ref = jax.vmap(ref_particle)(jnp.asarray(lam, f32))

    h_k, sinv_k, det_k, hw_k, hh_k = pallas_particle_predict(
        jnp.asarray(zeroed, f32)[None], K0[None], Ksym[None], K2[None],
        jnp.asarray(lam, f32)[None],
        fku=cam.fku, fkv=cam.fkv, u0c=cam.u0, v0c=cam.v0,
        kd1=cam.kd1, sd0=cam.sd, no_sigma=3.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h_k[0]), np.asarray(h_ref), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sinv_k[0]), np.asarray(sinv_ref), rtol=3e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(det_k[0]), np.asarray(det_ref), rtol=3e-3, atol=1e-6
    )
