"""JAX image kernels vs the NumPy oracle (bit-exactness of scores, identical
candidate choices and tie-breaks), including the windowed search variants the
runtime step uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.kernels import correlate, shi_tomasi
from tests import oracle_improc as oracle

B = 11


@pytest.fixture
def scene(rng):
    img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
    patch = img[20:31, 30:41].copy()
    return img, patch


def _windowed_search(img, patch, centre, sinv, active=True, win_radius=25):
    Hh, W = img.shape
    fsums = correlate.frame_sums(jnp.asarray(img), B)
    h = jnp.asarray([centre])
    u0, v0, _, _ = correlate.search_window_origin(h, win_radius, W, Hh, B, round_half=True)
    cross = correlate.cross_sum_windows(
        jnp.asarray(img), jnp.asarray(patch)[None], u0, v0, win_radius, B
    )
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patch)[None])
    return correlate.elliptical_search_batch(
        fsums, cross, sg0, sg0sq, u0, v0,
        h, jnp.asarray([sinv]), jnp.asarray([active]), B,
        win_radius=win_radius,
    )


def test_nssd_map_bit_exact(scene):
    img, patch = scene
    corr, sd0, sd1, valid = correlate.correlation_maps(
        jnp.asarray(img), jnp.asarray(patch)[None], B
    )
    corr = np.asarray(corr[0])
    sd1 = np.asarray(sd1)
    for vc in range(5, 55, 7):
        for uc in range(5, 75, 11):
            c_ref, sdp_ref, sdi_ref = oracle.correlate2(patch, img, uc - 5, vc - 5)
            assert corr[vc, uc] == c_ref, (vc, uc)
            assert sd1[vc, uc] == sdi_ref
    c_ref0, sdp_ref0, _ = oracle.correlate2(patch, img, 30, 20)
    assert corr[25, 35] == c_ref0
    assert np.asarray(sd0)[0] == sdp_ref0


def test_nssd_flat_special_cases():
    img = np.full((40, 40), 77, np.uint8)
    patch = np.full((B, B), 77, np.uint8)
    corr, sd0, sd1, valid = correlate.correlation_maps(jnp.asarray(img), jnp.asarray(patch)[None], B)
    assert float(corr[0, 20, 20]) == 0.0  # both flat -> 0
    patch2 = np.arange(B * B, dtype=np.uint8).reshape(B, B)
    corr2, _, _, _ = correlate.correlation_maps(jnp.asarray(img), jnp.asarray(patch2)[None], B)
    assert float(corr2[0, 20, 20]) == 1.0  # image flat -> 1


def test_elliptical_search_matches_oracle(scene):
    img, patch = scene
    sinv = np.array([[0.08, 0.01], [0.01, 0.05]])
    for centre in ([35.3, 25.2], [33.0, 22.0], [6.0, 6.0], [74.0, 54.0]):
        found_o, u_o, v_o, best_o = oracle.elliptical_search(img, patch, centre, sinv, B)
        res = _windowed_search(img, patch, centre, sinv)
        assert bool(res.found[0]) == found_o, centre
        if found_o:
            assert (int(res.u[0]), int(res.v[0])) == (u_o, v_o), centre
            assert float(res.best[0]) == best_o
        assert not bool(res.overflow[0])


def test_elliptical_search_low_patch_sigma_fails(scene):
    img, _ = scene
    flatp = np.full((B, B), 100, np.uint8)
    res = _windowed_search(img, flatp, [40.0, 30.0], np.eye(2) * 0.05)
    assert not bool(res.found[0])


def test_elliptical_search_overflow_flag(scene):
    img, patch = scene
    tiny_sinv = np.eye(2) * 1e-4  # 3-sigma extent ~300 px >> window cap
    res = _windowed_search(img, patch, [40.0, 30.0], tiny_sinv, win_radius=10)
    assert bool(res.overflow[0])


def test_multi_ellipse_search_matches_oracle(scene):
    img, patch = scene
    centres = [[35.0 + 3 * k, 25.0 + 0.5 * k] for k in range(6)]
    sinvs = [np.array([[0.2, 0.0], [0.0, 0.15]])] * 6
    res_o = oracle.multi_ellipse_search(img, patch, centres, sinvs, B)
    fsums = correlate.frame_sums(jnp.asarray(img), B)
    cross = correlate.cross_sum_maps(jnp.asarray(img), jnp.asarray(patch)[None], B)
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patch)[None])
    found, u, v, over = correlate.multi_ellipse_search(
        fsums, cross[0], sg0[0], sg0sq[0], jnp.asarray(centres), jnp.asarray(sinvs),
        jnp.ones(6, bool), B, win_radius=16,
    )
    for k in range(6):
        assert bool(found[k]) == res_o[k][0], k
        if res_o[k][0]:
            assert (int(u[k]), int(v[k])) == (res_o[k][1], res_o[k][2]), k
        assert not bool(over[k])


def test_multi_ellipse_low_sigma_penalty():
    """A flat image region adds +5.0 instead of skipping (multi-ellipse only)."""
    rng = np.random.default_rng(5)
    img = np.full((40, 60), 90, np.uint8)
    img[:, :20] = rng.integers(0, 256, size=(40, 20)).astype(np.uint8)
    patch = np.full((B, B), 90, np.uint8)  # flat patch matches flat region: corr 0 + 5
    centres = [[40.0, 20.0]]
    sinvs = [np.eye(2) * 0.1]
    res_o = oracle.multi_ellipse_search(img, patch, centres, sinvs, B)
    fsums = correlate.frame_sums(jnp.asarray(img), B)
    cross = correlate.cross_sum_maps(jnp.asarray(img), jnp.asarray(patch)[None], B)
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patch)[None])
    found, u, v, over = correlate.multi_ellipse_search(
        fsums, cross[0], sg0[0], sg0sq[0], jnp.asarray(centres), jnp.asarray(sinvs),
        jnp.ones(1, bool), B, win_radius=16,
    )
    assert bool(found[0]) == res_o[0][0] == False  # 0 + 5 penalty > 0.40


@pytest.mark.slow  # compile-heavy equivalence check; covered fast by cross-native + parity suites
def test_multi_ellipse_dense_matches_windowed(rng):
    """The fused broadcast particle search (the step's path) agrees exactly
    with the per-particle windowed search on the same shared score map."""
    img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
    patch = img[40:51, 60:71].copy()
    P = 32
    fsums = correlate.frame_sums(jnp.asarray(img), B)
    cross = correlate.cross_sum_maps(jnp.asarray(img), jnp.asarray(patch)[None], B)[0]
    sg0, sg0sq = correlate.patch_stats(jnp.asarray(patch)[None])
    centres = np.stack(
        [65.0 + rng.uniform(-14, 14, P), 45.0 + rng.uniform(-10, 10, P)], axis=1
    )
    centres[-1] = [3.0, 3.0]     # border clamp
    centres[-2] = [157.0, 117.0]
    sinvs = np.stack([np.array([[0.08, 0.01], [0.01, 0.06]])] * P)
    alive = np.ones(P, bool)
    alive[5] = False

    f_w, u_w, v_w, o_w = correlate.multi_ellipse_search(
        fsums, cross, sg0[0], sg0sq[0], jnp.asarray(centres), jnp.asarray(sinvs),
        jnp.asarray(alive), B, win_radius=16,
    )
    cm = correlate.penalized_score_map(fsums, cross, sg0[0], sg0sq[0], B)
    f_d, u_d, v_d, o_d = correlate.multi_ellipse_search_dense(
        cm, jnp.asarray(centres), jnp.asarray(sinvs), jnp.asarray(alive), win_radius=16
    )
    np.testing.assert_array_equal(np.asarray(f_d), np.asarray(f_w))
    np.testing.assert_array_equal(np.asarray(o_d), np.asarray(o_w))
    for k in range(P):
        if bool(f_w[k]):
            assert (int(u_d[k]), int(v_d[k])) == (int(u_w[k]), int(v_w[k])), k


def test_shi_tomasi_matches_oracle(rng):
    img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
    sxx, syy, sxy, valid = shi_tomasi.structure_tensor_maps(jnp.asarray(img), B)
    ev = shi_tomasi.min_eigenvalue_map(sxx, syy, sxy)
    for region in [(10, 10, 40, 30), (0, 0, 80, 60), (50, 40, 79, 59)]:
        us, vs, uf, vf = region
        u_o, v_o, ev_o = oracle.find_best_patch(img, B, us, vs, uf, vf)
        ru, rv, ruf, rvf = shi_tomasi.clamp_region(
            jnp.int32(us), jnp.int32(vs), jnp.int32(uf), jnp.int32(vf), 80, 60, B
        )
        u_j, v_j, ev_j = shi_tomasi.find_best_patch_in_region(ev, valid, ru, rv, ruf, rvf)
        assert (int(u_j), int(v_j)) == (u_o, v_o), region
        assert float(ev_j) == ev_o, region


def test_shi_tomasi_image_window_matches_oracle(rng):
    """The sliced-window Shi-Tomasi (the step's path) is bit-identical to the
    oracle across interior, full-frame, and border-clamped regions."""
    img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
    for region in [(10, 10, 40, 30), (0, 0, 80, 60), (50, 40, 79, 59), (7, 7, 87, 67)]:
        us, vs, uf, vf = region
        u_o, v_o, ev_o = oracle.find_best_patch(img, B, us, vs, uf, vf)
        ru, rv, ruf, rvf = shi_tomasi.clamp_region(
            jnp.int32(us), jnp.int32(vs), jnp.int32(uf), jnp.int32(vf), 80, 60, B
        )
        u_j, v_j, ev_j = shi_tomasi.find_best_patch_in_image_window(
            jnp.asarray(img), B, ru, rv, ruf, rvf, region_w=40, region_h=30
        )
        # regions larger than the static window cap are covered partially;
        # only check exactness where the region fits the cap
        if uf - us <= 40 and vf - vs <= 30:
            assert (int(u_j), int(v_j)) == (u_o, v_o), region
            assert float(ev_j) == ev_o, region
        else:
            assert float(ev_j) >= 0.0


def test_shi_tomasi_empty_region(rng):
    img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
    sxx, syy, sxy, valid = shi_tomasi.structure_tensor_maps(jnp.asarray(img), B)
    ev = shi_tomasi.min_eigenvalue_map(sxx, syy, sxy)
    u, v, e = shi_tomasi.find_best_patch_in_region(
        ev, valid, jnp.int32(30), jnp.int32(30), jnp.int32(30), jnp.int32(40)
    )
    assert float(e) == 0.0


@pytest.mark.slow  # compile-heavy equivalence check; covered fast by cross-native + parity suites
def test_tie_break_last_scan_order():
    """Two identical patch sites inside the ellipse: reference keeps the one
    visited LAST in (u outer, v inner) scan order."""
    img = np.zeros((40, 60), np.uint8)
    patch = (np.arange(B * B, dtype=np.uint8) * 7 % 251).reshape(B, B)
    img[10:21, 10:21] = patch
    img[10:21, 30:41] = patch  # duplicate at larger u
    big = np.array([[0.005, 0.0], [0.0, 0.05]])
    centre = [25.0, 15.0]
    found_o, u_o, v_o, _ = oracle.elliptical_search(img, patch, centre, big, B)
    res = _windowed_search(img, patch, centre, big, win_radius=28)
    assert bool(res.found[0]) and found_o
    assert (int(res.u[0]), int(res.v[0])) == (u_o, v_o) == (35, 15)


@pytest.mark.slow  # compile-heavy equivalence check; covered fast by cross-native + parity suites
def test_rowband_matches_dense_particle_search(rng):
    """multi_ellipse_search_rowband must be bit-equal to the dense broadcast
    form in f64 (same masked candidate set, same reductions)."""
    import jax

    Hh, W, P, R = 90, 130, 40, 16
    maps = rng.uniform(0.0, 2.0, size=(Hh, W))
    centres = np.stack(
        [rng.uniform(-4, W + 4, size=P), rng.uniform(-4, Hh + 4, size=P)], axis=1
    )
    sinvs = np.zeros((P, 2, 2))
    for p in range(P):
        a = rng.uniform(0.02, 0.5)
        c = rng.uniform(0.02, 0.5)
        b = rng.uniform(-0.6, 0.6) * np.sqrt(a * c)
        sinvs[p] = [[a, b], [b, c]]
    alive = rng.uniform(size=P) > 0.15

    m = jnp.asarray(maps)
    h = jnp.asarray(centres)
    s = jnp.asarray(sinvs)
    al = jnp.asarray(alive)
    fd, ud, vd, od = correlate.multi_ellipse_search_dense(m, h, s, al, win_radius=R)
    fr, ur, vr, orr = correlate.multi_ellipse_search_rowband(m, h, s, al, win_radius=R)
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(fr))
    np.testing.assert_array_equal(np.asarray(od), np.asarray(orr))
    sel = np.asarray(fd)
    np.testing.assert_array_equal(np.asarray(ud)[sel], np.asarray(ur)[sel])
    np.testing.assert_array_equal(np.asarray(vd)[sel], np.asarray(vr)[sel])


@pytest.mark.pallas
def test_pallas_chol_inv_matches_unrolled(rng):
    """pallas_chol_inv_lower vs the unrolled f64 reference math in f32."""
    from scenelib2_tpu.core import ekf
    from scenelib2_tpu.kernels.pallas_linalg import pallas_chol_inv_lower

    for M in (2, 8, 20, 33):
        A = rng.normal(size=(M, M))
        S = A @ A.T / M + np.eye(M)
        # identity rows/cols as the masked update produces for missed slots
        if M >= 8:
            S[3, :] = 0.0; S[:, 3] = 0.0; S[3, 3] = 1.0
        L = ekf.chol_unrolled(jnp.asarray(S))
        Linv64 = np.asarray(ekf.tril_inv_unrolled(L))
        Linv32 = np.asarray(
            pallas_chol_inv_lower(jnp.asarray(S, jnp.float32), interpret=True)
        )
        assert Linv32.dtype == np.float32
        np.testing.assert_allclose(Linv32, Linv64, rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # compile-heavy equivalence check; covered fast by cross-native + parity suites
def test_unionbox_search_matches_dense(rng):
    """multi_ellipse_search_unionbox (banded AND overflow-fallback branches)
    vs the dense broadcast: identical decisions and pixels."""
    import jax

    Hh, W, P, R = 120, 160, 24, 16
    maps = rng.uniform(0.0, 2.0, size=(Hh, W)).astype(np.float64)
    for _ in range(25):
        maps[rng.integers(0, Hh), rng.integers(0, W)] = rng.uniform(0, 0.3)
    sinvs = np.zeros((P, 2, 2))
    for p in range(P):
        a = rng.uniform(0.05, 0.4)
        c = rng.uniform(0.05, 0.4)
        b = rng.uniform(-0.5, 0.5) * np.sqrt(a * c)
        sinvs[p] = [[a, b], [b, c]]
    alive = rng.uniform(size=P) > 0.2
    m = jnp.asarray(maps)
    s = jnp.asarray(sinvs)
    al = jnp.asarray(alive)

    # very tight cluster + tight ellipses (smallest ladder rung), clustered
    # centres (mid/large rungs), and scattered centres (full fallback)
    tight_s = np.broadcast_to(np.array([[2.0, 0.1], [0.1, 2.0]]), (P, 2, 2))
    cases = [
        (np.stack([rng.uniform(70, 76, P), rng.uniform(50, 56, P)], axis=1),
         jnp.asarray(tight_s)),
        (np.stack([rng.uniform(60, 90, P), rng.uniform(40, 70, P)], axis=1), s),
        (np.stack([rng.uniform(-5, W + 5, P), rng.uniform(-5, Hh + 5, P)], axis=1), s),
        # ellipse boxes entirely outside the (border-clipped) windows
        (np.stack([rng.uniform(-80, -60, P), rng.uniform(-80, -60, P)], axis=1), s),
    ]
    for centres, s_case in cases:
        for al_case in (al, jnp.zeros(P, bool)):
            h = jnp.asarray(centres)
            fd, ud, vd, od = correlate.multi_ellipse_search_dense(
                m, h, s_case, al_case, win_radius=R
            )
            fu, uu_, vu, ou = correlate.multi_ellipse_search_unionbox(
                m, h, s_case, al_case, win_radius=R, band_h=64, band_w=96
            )
            np.testing.assert_array_equal(np.asarray(fd), np.asarray(fu))
            np.testing.assert_array_equal(np.asarray(od), np.asarray(ou))
            fdn = np.asarray(fd)
            np.testing.assert_array_equal(np.asarray(ud)[fdn], np.asarray(uu_)[fdn])
            np.testing.assert_array_equal(np.asarray(vd)[fdn], np.asarray(vu)[fdn])
