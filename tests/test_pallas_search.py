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

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow; deselect with -m 'not pallas'

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


def test_pallas_particle_predict_fused_matches_xla(rng):
    """Fused-geometry kernel (in-kernel quaternion/N/K products from raw
    state blocks) vs the XLA slot_geom + K-form chain it replaces."""
    import jax
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.core import ekf, models
    from scenelib2_tpu.core.camera import (
        CameraParams, measurement_noise, project, project_jacobian,
    )
    from scenelib2_tpu.kernels.pallas_particle import pallas_particle_predict_fused

    params = Params()
    cam = CameraParams.from_params(params)
    f32 = jnp.float32
    xp = np.zeros(7)
    xp[3:7] = rng.normal(size=4)
    xp[3:7] /= np.linalg.norm(xp[3:7])
    xp[3:7] *= 1.0 + rng.normal(0, 1e-3)    # near-unit, like the live filter
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

    # kernel consumes the RAW blocks — full [13,6] pxy whose velocity rows
    # must be ignored ([:7] slice inside the wrapper). Two slots exercise the
    # grid/per-slot SMEM indexing: slot 0 is a decoy with different geometry,
    # slot 1 carries the reference values.
    pxy13 = jnp.asarray(
        np.concatenate([np.asarray(pxy7), rng.normal(size=(6, 6))], axis=0), f32
    )
    y6_dec = np.concatenate([rng.normal(0, 0.1, 3), [0.2, -0.1, 0.97]])
    ys = jnp.asarray(np.stack([y6_dec, y6]), f32)
    pxys = jnp.stack([pxy13 * 0.5, pxy13])
    pyys = jnp.stack([pyy * 2.0, pyy])
    lams = jnp.asarray(np.stack([lam * 0.7, lam]), f32)
    h_k, sinv_k, det_k, hw_k, hh_k = pallas_particle_predict_fused(
        ys, pxys, pyys, xp32, Pxx7, lams,
        fku=cam.fku, fkv=cam.fkv, u0c=cam.u0, v0c=cam.v0,
        kd1=cam.kd1, sd0=cam.sd, no_sigma=3.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h_k[1]), np.asarray(h_ref), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sinv_k[1]), np.asarray(sinv_ref), rtol=5e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(det_k[1]), np.asarray(det_ref), rtol=5e-3, atol=1e-6
    )
    # the decoy slot must NOT equal the reference slot (per-slot params landed)
    assert not np.allclose(np.asarray(h_k[0]), np.asarray(h_ref), atol=1e-3)


def _score_map_f32_numpy(img, patch, sigma_thresh=10.0, penalty=5.0):
    """f32 NumPy replica of the fast-mode penalized score map (same op order
    as correlate.nssd_score, which the tests' x64 env would run in f64)."""
    H, W = img.shape
    half = (B - 1) // 2
    n = np.float32(B * B)
    imgf = img.astype(np.float32)
    pf = patch.astype(np.float32)
    sg1 = np.zeros((H, W), np.float32)
    sg1sq = np.zeros((H, W), np.float32)
    cross = np.zeros((H, W), np.float32)
    for v in range(half, H - half):
        for u in range(half, W - half):
            w = imgf[v - half : v + half + 1, u - half : u + half + 1]
            sg1[v, u] = w.sum(dtype=np.float32)
            sg1sq[v, u] = (w * w).sum(dtype=np.float32)
            cross[v, u] = (w * pf).sum(dtype=np.float32)
    sg0 = np.float32(pf.sum(dtype=np.float32))
    sg0sq = np.float32((pf * pf).sum(dtype=np.float32))
    with np.errstate(all="ignore"):
        g0bar = sg0 / n
        g1bar = sg1 / n
        varg0 = sg0sq / n - g0bar * g0bar
        varg1 = sg1sq / n - g1bar * g1bar
        sd0 = np.sqrt(varg0)
        sd1 = np.sqrt(varg1)
        v0s = np.where(varg0 == 0.0, np.float32(1.0), varg0)
        v1s = np.where(varg1 == 0.0, np.float32(1.0), varg1)
        s0 = np.sqrt(v0s)
        s1 = np.sqrt(v1s)
        k = g0bar / s0 - g1bar / s1
        C = (
            sg0sq / v0s + sg1sq / v1s + n * (k * k)
            - cross * np.float32(2.0) / (s0 * s1)
            - sg0 * np.float32(2.0) * k / s0 + sg1 * np.float32(2.0) * k / s1
        ) / n
    both_zero = (sd0 == 0.0) & (sd1 == 0.0)
    corr = np.where((sd0 != 0.0) & (sd1 != 0.0), C, np.where(both_zero, 0.0, 1.0))
    corr = np.where(sd1 < sigma_thresh, corr + np.float32(penalty), corr).astype(np.float32)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    valid = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    return np.where(valid, corr, np.float32(1e6)).astype(np.float32)


def test_pallas_score_map_matches_f32_reference(rng):
    """Fused score-map kernel vs an f32 NumPy replica of the fast-mode map.

    Integer sums are exact in both, so only formula rounding can differ.
    XLA compiles the /n divisions as multiply-by-reciprocal, so EXACTLY-flat
    image windows can yield a tiny negative variance -> NaN score where the
    replica's true division gives variance 0 -> score 1.0. The XLA f32
    pipeline path has the identical behaviour (the kernel is bit-identical
    to it on TPU — verified on hardware), and a NaN score always fails the
    0.40 match threshold just like the replica's penalized 6.0, so
    *decisions* agree everywhere; the test therefore allows NaN only at
    zero-variance windows."""
    from scenelib2_tpu.kernels.pallas_score_map import pallas_score_maps

    img = rng.integers(0, 256, size=(48, 160), dtype=np.uint8)
    img[20:40, 100:130] = 9  # flat region (zero image sigma)
    # one textured patch, one flat patch (sd0 == 0 special case)
    patches = np.stack([img[20:31, 60:71].copy(), np.full((B, B), 7, np.uint8)])
    want = np.stack([_score_map_f32_numpy(img, p) for p in patches])
    got = np.asarray(
        pallas_score_maps(jnp.asarray(img), jnp.asarray(patches), boxsize=B,
                          interpret=True)
    )
    assert got.shape == want.shape

    # zero-variance window map (exact integer sums in f64)
    imgf = img.astype(np.float64)
    H, W = img.shape
    half = (B - 1) // 2
    flat = np.zeros((H, W), bool)
    for v in range(half, H - half):
        for u in range(half, W - half):
            w = imgf[v - half : v + half + 1, u - half : u + half + 1]
            flat[v, u] = w.var() == 0.0
    nan_got = np.isnan(got)
    assert nan_got[:, ~flat].sum() == 0, "NaN outside zero-variance windows"
    # textured patch: full value comparison outside the NaN cells.
    # (A degenerate all-flat PATCH is excluded: reciprocal rounding kicks it
    # out of the sd0==0 special case and the formula output is meaningless —
    # identically so in the XLA f32 fast path, and unreachable in practice
    # since patches are Shi-Tomasi winners; the f64 parity path keeps the
    # reference's exact special-case handling.)
    ok0 = ~nan_got[0]
    np.testing.assert_allclose(got[0][ok0], want[0][ok0], rtol=2e-6, atol=2e-5)
    assert np.isfinite(got[1][~nan_got[1]]).all()


def test_pallas_fused_search_matches_gathered(scene, rng):
    """The Element-indexed fused search (in-kernel window fetch) must make
    the same decisions and pick the same pixels as the pre-gathered-window
    kernel; scores equal at found cells (pad cells differ by design)."""
    from scenelib2_tpu.kernels.pallas_search import pallas_elliptical_search_fused

    img, patch = scene
    Hh, W = img.shape
    K = 4
    patches = np.stack([img[20 + 5 * k : 31 + 5 * k, 30:41] for k in range(K)])
    centres = np.array([[35.0 + 4 * k, 25.0 + 3 * k] for k in range(K)])
    sinvs = np.stack([np.array([[0.1, 0.01], [0.01, 0.08]])] * K)
    active = np.array([True, True, False, True])

    f0, u0r, v0r, b0, o0 = _run_pallas(img, patches, centres, sinvs, active)
    h = jnp.asarray(centres, jnp.float64)
    u0, v0, _, _ = correlate.search_window_origin(h, R, W, Hh, B, round_half=True)
    f1, u1, v1, b1, o1 = pallas_elliptical_search_fused(
        jnp.asarray(img), jnp.asarray(patches), u0, v0, h,
        jnp.asarray(sinvs), jnp.asarray(active),
        image_shape=(Hh, W), boxsize=B, win_radius=R, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    for k in range(K):
        if bool(f0[k]):
            assert (int(u0r[k]), int(v0r[k])) == (int(u1[k]), int(v1[k]))
            assert float(b0[k]) == float(b1[k])


def test_pallas_score_map_banded_matches_whole(rng):
    """The row-banded kernel variant (used above the VMEM size threshold)
    must produce the identical map as the whole-frame variant."""
    from scenelib2_tpu.kernels.pallas_score_map import pallas_score_maps

    img = rng.integers(0, 256, size=(200, 256), dtype=np.uint8)
    patches = np.stack([img[40:51, 60:71].copy(), img[100:111, 30:41].copy()])
    whole = np.asarray(
        pallas_score_maps(jnp.asarray(img), jnp.asarray(patches), boxsize=B,
                          interpret=True)
    )
    banded = np.asarray(
        pallas_score_maps(jnp.asarray(img), jnp.asarray(patches), boxsize=B,
                          interpret=True, force_banded=True)
    )
    nan_w = np.isnan(whole)
    np.testing.assert_array_equal(nan_w, np.isnan(banded))
    np.testing.assert_array_equal(whole[~nan_w], banded[~nan_w])


def test_pallas_tier_boundaries_match_xla(scene, rng):
    """The tiered slab regimes (32/48/full) must agree with the XLA search
    exactly at ellipse heights spanning every regime and at window-edge
    centres where the slab start clamps (pallas_search._SLABS)."""
    img, _ = scene
    Hh, W = img.shape
    WR = 32   # window pad_v = 80 -> both tiers + the full path are live
    cases = []
    # target halfheights across the tier boundaries: hh = floor(3/sqrt(c))
    for hh_t in (3, 7, 10, 14, 18, 30):
        c = (3.0 / (hh_t + 0.5)) ** 2
        for centre in ([80.0, 60.0], [80.0, 8.0], [80.0, 112.0], [10.0, 60.0]):
            cases.append((centre, np.array([[0.05, 0.0], [0.0, c]])))
    centres = np.array([c for c, _ in cases])
    sinvs = np.stack([s for _, s in cases])
    K = len(cases)
    patches = np.stack(
        [img[20 + (3 * k) % 60 : 31 + (3 * k) % 60, 30:41] for k in range(K)]
    )
    active = np.ones(K, bool)

    h = jnp.asarray(centres, jnp.float64)
    u0, v0, _, _ = correlate.search_window_origin(h, WR, W, Hh, B, round_half=True)
    wins = gather_windows_u8(jnp.asarray(img), u0, v0, WR, B)
    found_p, u_p, v_p, best_p, over_p = pallas_elliptical_search(
        wins, jnp.asarray(patches), u0, v0, h,
        jnp.asarray(sinvs), jnp.asarray(active),
        image_shape=(Hh, W), boxsize=B, win_radius=WR, interpret=True,
    )

    fsums = correlate.frame_sums(jnp.asarray(img), B)
    cross = correlate.cross_sum_windows(
        jnp.asarray(img), jnp.asarray(patches), u0, v0, WR, B
    )
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patches))
    res = correlate.elliptical_search_batch(
        fsums, cross, sg0, sg0sq, u0, v0, h, jnp.asarray(sinvs),
        jnp.asarray(active), B, win_radius=WR,
    )
    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(res.found))
    for k in range(K):
        if bool(res.found[k]):
            assert (int(u_p[k]), int(v_p[k])) == (int(res.u[k]), int(res.v[k])), k
        assert bool(over_p[k]) == bool(res.overflow[k]), k


def test_pallas_tier64_matches_xla(rng):
    """hires-class windows (pad_v 112): ellipse heights across the tier
    boundaries and beyond must agree with the XLA search exactly."""
    img = rng.integers(0, 256, size=(200, 160), dtype=np.uint8)
    Hh, W = img.shape
    WR = 48
    cases = []
    for hh_t in (5, 12, 18, 22, 26, 40):
        c = (3.0 / (hh_t + 0.5)) ** 2
        for centre in ([80.0, 100.0], [80.0, 12.0], [80.0, 188.0]):
            cases.append((centre, np.array([[0.05, 0.0], [0.0, c]])))
    centres = np.array([c for c, _ in cases])
    sinvs = np.stack([s for _, s in cases])
    K = len(cases)
    patches = np.stack(
        [img[20 + (3 * k) % 100 : 31 + (3 * k) % 100, 30:41] for k in range(K)]
    )
    active = np.ones(K, bool)

    h = jnp.asarray(centres, jnp.float64)
    u0, v0, _, _ = correlate.search_window_origin(h, WR, W, Hh, B, round_half=True)
    wins = gather_windows_u8(jnp.asarray(img), u0, v0, WR, B)
    found_p, u_p, v_p, best_p, over_p = pallas_elliptical_search(
        wins, jnp.asarray(patches), u0, v0, h,
        jnp.asarray(sinvs), jnp.asarray(active),
        image_shape=(Hh, W), boxsize=B, win_radius=WR, interpret=True,
    )

    fsums = correlate.frame_sums(jnp.asarray(img), B)
    cross = correlate.cross_sum_windows(
        jnp.asarray(img), jnp.asarray(patches), u0, v0, WR, B
    )
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patches))
    res = correlate.elliptical_search_batch(
        fsums, cross, sg0, sg0sq, u0, v0, h, jnp.asarray(sinvs),
        jnp.asarray(active), B, win_radius=WR,
    )
    np.testing.assert_array_equal(np.asarray(found_p), np.asarray(res.found))
    for k in range(K):
        if bool(res.found[k]):
            assert (int(u_p[k]), int(v_p[k])) == (int(res.u[k]), int(res.v[k])), k
        assert bool(over_p[k]) == bool(res.overflow[k]), k
