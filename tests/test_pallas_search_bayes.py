"""Fused search+Bayes kernel vs the union-box ladder + pallas_bayes_update.

The fused kernel (kernels/pallas_search_bayes.py) must reproduce, bit-for-
bit in f32, the exact pipeline it replaces on the single-stream fast path:
correlate.multi_ellipse_search_unionbox -> likelihood -> Bayes -> prune ->
moments -> conversion/kill decisions (pallas_bayes_update). Scenarios cover
tight/spread clouds, window overflow, dead particles, making=False slots,
forced score ties, and empty unions.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenelib2_tpu.kernels import correlate
from scenelib2_tpu.kernels.pallas_bayes import pallas_bayes_update
from scenelib2_tpu.kernels.pallas_search_bayes import pallas_search_bayes

H, W = 240, 320
NP = 100
NO_SIGMA = 3.0
THRESH = 0.40


def _pred_rows(hpi, sinv, dets, NP_pad):
    """Pack the particle-predict row layout [F, 8, NP_pad] from dense parts,
    with HW/HH derived by the ladder's own f32 formula so both paths read
    identical values."""
    F, NPl = dets.shape
    a = sinv[..., 0, 0].astype(np.float32)
    b = sinv[..., 0, 1].astype(np.float32)
    c = sinv[..., 1, 1].astype(np.float32)
    hw = np.floor(np.float32(NO_SIGMA) / np.sqrt(a - b * b / c))
    hh = np.floor(np.float32(NO_SIGMA) / np.sqrt(c - b * b / a))
    rows = np.zeros((F, 8, NP_pad), np.float32)
    rows[:, 0, :NPl] = hpi[..., 0]
    rows[:, 1, :NPl] = hpi[..., 1]
    rows[:, 2, :NPl] = a
    rows[:, 3, :NPl] = b
    rows[:, 4, :NPl] = c
    rows[:, 5, :NPl] = dets
    rows[:, 5, NPl:] = 1.0  # keep 1/sqrt(det) finite in padding lanes
    rows[:, 6, :NPl] = hw
    rows[:, 7, :NPl] = hh
    return jnp.asarray(rows)


def _scenario(seed, *, spread, overflow=False, dead_frac=0.0, making=True,
              ties=False, F=1, win_radius=32):
    rng = np.random.default_rng(seed)
    corr = rng.uniform(0.0, 2.0, size=(F, H, W)).astype(np.float32)
    if ties:
        corr = np.round(corr * 8.0) / 8.0  # force exact duplicate scores
    # particle cloud along a rough ray
    t = np.linspace(0.0, 1.0, NP, dtype=np.float32)
    centers_u = 60.0 + (200.0 if spread else 14.0) * t
    centers_v = 50.0 + (150.0 if spread else 9.0) * t
    hpi = np.stack(
        [
            np.tile(centers_u, (F, 1)) + rng.normal(0, 1.5, (F, NP)),
            np.tile(centers_v, (F, 1)) + rng.normal(0, 1.5, (F, NP)),
        ],
        axis=-1,
    ).astype(np.float32)
    # random SPD S, inverted to sinv (f32)
    sd = rng.uniform(2.0, 40.0 if overflow else 6.0, (F, NP)).astype(np.float32)
    rho = rng.uniform(-0.5, 0.5, (F, NP)).astype(np.float32)
    s00 = sd * sd
    s11 = sd * sd * rng.uniform(0.6, 1.4, (F, NP)).astype(np.float32)
    s01 = rho * np.sqrt(s00 * s11, dtype=np.float32)
    dets = (s00 * s11 - s01 * s01).astype(np.float32)
    sinv = np.empty((F, NP, 2, 2), np.float32)
    sinv[..., 0, 0] = s11 / dets
    sinv[..., 1, 1] = s00 / dets
    sinv[..., 0, 1] = sinv[..., 1, 0] = -s01 / dets
    dets_inv = (sinv[..., 0, 0] * sinv[..., 1, 1] - sinv[..., 0, 1] ** 2)
    palive = rng.uniform(size=(F, NP)) >= dead_frac
    palive[:, :5] = True
    prob = rng.uniform(0.1, 1.0, (F, NP)).astype(np.float32)
    prob /= prob.sum(axis=1, keepdims=True)
    lam = np.linspace(0.5, 5.0, NP, dtype=np.float32)[None, :].repeat(F, 0)
    making_v = np.full(F, making)
    pmask = np.ones(F, bool)
    attempts = rng.integers(1, 9, F).astype(np.int32)
    return dict(
        corr=jnp.asarray(corr), hpi=jnp.asarray(hpi), sinv=jnp.asarray(sinv),
        dets=jnp.asarray(dets_inv.astype(np.float32)),
        palive=jnp.asarray(palive), prob=jnp.asarray(prob),
        lam=jnp.asarray(lam), making=jnp.asarray(making_v),
        pmask=jnp.asarray(pmask), attempts=jnp.asarray(attempts),
        win_radius=win_radius,
    )


def _reference_pipeline(s):
    """The exact pipeline the fused kernel replaces (step.py pre-fusion)."""
    F = s["corr"].shape[0]
    searchable = s["palive"] & s["making"][:, None]
    res = [
        correlate.multi_ellipse_search_unionbox(
            s["corr"][j], s["hpi"][j].astype(jnp.float32),
            s["sinv"][j].astype(jnp.float32), searchable[j],
            win_radius=s["win_radius"], no_sigma=NO_SIGMA,
            corr_thresh2=THRESH,
        )
        for j in range(F)
    ]
    found, zu, zv, p_over = (jnp.stack([r[i] for r in res]) for i in range(4))
    z = jnp.stack([zu, zv], axis=-1).astype(jnp.float32)
    return (
        pallas_bayes_update(
            s["prob"], s["lam"], s["palive"], found, p_over, z,
            s["hpi"], s["sinv"], s["dets"], s["making"], s["pmask"],
            s["attempts"], interpret=True,
        ),
        (found, z),
    )


def _fused(s):
    NP_pad = 128
    pred = _pred_rows(
        np.asarray(s["hpi"]), np.asarray(s["sinv"]), np.asarray(s["dets"]),
        NP_pad,
    )
    return pallas_search_bayes(
        s["corr"], pred, s["prob"], s["lam"], s["palive"], s["making"],
        s["pmask"], s["attempts"], image_shape=(H, W),
        win_radius=s["win_radius"], no_sigma=NO_SIGMA, corr_thresh2=THRESH,
        interpret=True,
    )


CASES = [
    ("tight", dict(spread=False)),
    ("spread", dict(spread=True)),
    ("overflow", dict(spread=False, overflow=True, win_radius=16)),
    ("dead", dict(spread=False, dead_frac=0.6)),
    ("not_making", dict(spread=False, making=False)),
    ("ties", dict(spread=False, ties=True)),
    ("two_slots", dict(spread=True, F=2, dead_frac=0.3)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_fused_matches_ladder_plus_bayes(name, kw):
    s = _scenario(zlib.crc32(name.encode()) % 100000, **kw)
    (ref, (found_r, z_r)) = _reference_pipeline(s)
    prob_r, palive_r, mean_r, cov_r, conv_r, kill_r, nov_r = ref
    out = _fused(s)
    prob_f, palive_f, mean_f, cov_f, conv_f, kill_f, nov_f, found_f, z_f, _ = out

    # search results and every DECISION are exact; the continuous Bayes
    # quantities are same-source-code f32 whose fused-multiply-add
    # contraction may differ between the two kernel compilation contexts
    # (the standalone bayes kernel is likewise allclose-verified vs its XLA
    # form, tests/test_pallas_bayes.py:82-87) — ULP-level tolerance only.
    np.testing.assert_array_equal(np.asarray(found_f), np.asarray(found_r))
    fm = np.asarray(found_r)
    np.testing.assert_array_equal(np.asarray(z_f)[fm], np.asarray(z_r)[fm])
    np.testing.assert_allclose(
        np.asarray(prob_f), np.asarray(prob_r), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(palive_f), np.asarray(palive_r))
    np.testing.assert_allclose(
        np.asarray(mean_f), np.asarray(mean_r), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(cov_f), np.asarray(cov_r), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(conv_f), np.asarray(conv_r))
    np.testing.assert_array_equal(np.asarray(kill_f), np.asarray(kill_r))
    np.testing.assert_array_equal(np.asarray(nov_f), np.asarray(nov_r))


def test_fused_empty_union_is_all_miss():
    s = _scenario(7, spread=False)
    s["palive"] = jnp.zeros_like(s["palive"])  # nothing searchable
    out = _fused(s)
    _, _, _, _, _, _, _, found_f, _, best = out
    assert not bool(np.asarray(found_f).any())
    assert float(np.asarray(best).min()) == 1e6


def test_full_width_mode_matches_compact():
    """pidx mode: whole-state rows in, whole-state rows out, other rows
    passed through bit-exactly."""
    MF = 16
    s = _scenario(4242, spread=False, dead_frac=0.2)
    rng = np.random.default_rng(99)
    prob_full = rng.uniform(0.0, 1.0, (MF, NP)).astype(np.float32)
    lam_full = rng.uniform(0.5, 5.0, (MF, NP)).astype(np.float32)
    palive_full = rng.uniform(size=(MF, NP)) > 0.3
    pidx = 5
    prob_full[pidx] = np.asarray(s["prob"])[0]
    lam_full[pidx] = np.asarray(s["lam"])[0]
    palive_full[pidx] = np.asarray(s["palive"])[0]

    compact = _fused(s)
    pred = _pred_rows(
        np.asarray(s["hpi"]), np.asarray(s["sinv"]), np.asarray(s["dets"]), 128
    )
    full = pallas_search_bayes(
        s["corr"], pred, jnp.asarray(prob_full), jnp.asarray(lam_full),
        jnp.asarray(palive_full), s["making"], s["pmask"], s["attempts"],
        image_shape=(H, W), win_radius=s["win_radius"], no_sigma=NO_SIGMA,
        corr_thresh2=THRESH, interpret=True, pidx=jnp.int32(pidx),
    )
    prob_out, palive_out = np.asarray(full[0]), np.asarray(full[1])
    # slot row updated exactly as compact mode; all other rows untouched
    np.testing.assert_array_equal(prob_out[pidx], np.asarray(compact[0])[0])
    np.testing.assert_array_equal(palive_out[pidx], np.asarray(compact[1])[0])
    others = np.arange(MF) != pidx
    np.testing.assert_array_equal(prob_out[others], prob_full[others])
    np.testing.assert_array_equal(palive_out[others], palive_full[others])
    # scalar decisions identical
    for k in range(2, 7):
        np.testing.assert_array_equal(np.asarray(full[k]), np.asarray(compact[k]))
    np.testing.assert_array_equal(np.asarray(full[7]), np.asarray(compact[7]))


def test_frame_mode_matches_precomputed_score_map():
    """Frame mode (in-kernel banded score) vs score_maps -> corr mode."""
    from scenelib2_tpu.kernels.pallas_score_map import pallas_score_maps

    rng = np.random.default_rng(321)
    frame = rng.integers(0, 255, (H, W)).astype(np.uint8)
    patch = rng.integers(0, 255, (11, 11)).astype(np.uint8)
    from scenelib2_tpu.runtime.state import patch_row as mk_patch_row

    prow = mk_patch_row(jnp.asarray(patch))
    corr = pallas_score_maps(
        jnp.asarray(frame), jnp.asarray(patch)[None], boxsize=11,
        interpret=True,
    )
    img32 = jnp.pad(jnp.asarray(frame, jnp.float32), ((0, 8), (0, 64)))

    MF = 16
    for seed, spread in ((5, False), (6, True), (9, False)):
        s = _scenario(seed, spread=spread, dead_frac=0.2 if spread else 0.0)
        pred = _pred_rows(
            np.asarray(s["hpi"]), np.asarray(s["sinv"]), np.asarray(s["dets"]),
            128,
        )
        prob_full = np.zeros((MF, NP), np.float32)
        lam_full = np.zeros((MF, NP), np.float32)
        palive_full = np.zeros((MF, NP), bool)
        pidx = 3
        prob_full[pidx] = np.asarray(s["prob"])[0]
        lam_full[pidx] = np.asarray(s["lam"])[0]
        palive_full[pidx] = np.asarray(s["palive"])[0]
        common = dict(
            image_shape=(H, W), win_radius=s["win_radius"], no_sigma=NO_SIGMA,
            corr_thresh2=THRESH, interpret=True, pidx=jnp.int32(pidx),
        )
        args = (pred, jnp.asarray(prob_full), jnp.asarray(lam_full),
                jnp.asarray(palive_full), s["making"], s["pmask"],
                s["attempts"])
        ref = pallas_search_bayes(corr, *args, **common)
        got = pallas_search_bayes(
            img32, *args, patch_row=prow, boxsize=11, **common
        )
        # search decisions exact; continuous values ULP-tolerance (the score
        # formula compiles in two different kernel contexts)
        np.testing.assert_array_equal(np.asarray(got[7]), np.asarray(ref[7]))
        fm = np.asarray(ref[7])
        np.testing.assert_array_equal(np.asarray(got[8])[fm], np.asarray(ref[8])[fm])
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        for k in (4, 5, 6):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-6, atol=1e-9
        )


def test_merged_predict_matches_two_stage():
    """Merged mode (pred_rows=None: the particle-predict chain runs inside
    the search+Bayes kernel) must be bit-equal to the two-kernel pipeline
    (pallas_particle_predict_fused -> pallas_search_bayes) on real ray
    geometry, in both full-width and compact modes."""
    from scenelib2_tpu.kernels.pallas_particle import (
        _NSHARED, pallas_particle_predict_fused,
    )

    rng = np.random.default_rng(11)
    CAM = (195.0, 195.0, 162.0, 125.0, 9e-6)
    SD0 = 1.0
    F = 1
    MF = 8
    corr = jnp.asarray(rng.uniform(0.0, 2.0, size=(F, H, W)).astype(np.float32))

    # plausible camera + ray slots
    xp = np.zeros(7, np.float32)
    xp[:3] = rng.normal(0, 0.05, 3)
    q = rng.normal(0, 1, 4); q /= np.linalg.norm(q) * (1 + 2e-4)
    xp[3:] = q
    A = rng.normal(size=(7, 7)) * 0.02
    pxx7 = (A @ A.T + np.eye(7) * 1e-4).astype(np.float32)
    ys6 = np.zeros((F, 6), np.float32)
    ys6[:, :3] = xp[:3] + rng.normal(0, 0.02, (F, 3))
    d = rng.normal(0, 1, (F, 3)); d[:, 2] = np.abs(d[:, 2]) + 1.5
    ys6[:, 3:] = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    B6 = rng.normal(size=(F, 13, 13)) * 0.02
    C13 = np.einsum("fij,fkj->fik", B6, B6) + np.eye(13) * 1e-5
    pxy = C13[:, :13, 7:13][:, :, :6].astype(np.float32)   # [F,13,6]
    pyy = C13[:, 7:13, 7:13].astype(np.float32)            # [F,6,6]
    lam = np.linspace(0.5, 5.0, NP, dtype=np.float32)[None].repeat(F, 0)

    prob = rng.uniform(0.1, 1.0, (MF, NP)).astype(np.float32)
    prob /= prob.sum(axis=1, keepdims=True)
    lam_full = np.tile(lam, (MF, 1))
    palive = np.ones((MF, NP), bool)
    pidx = 3
    making = np.array([True])
    pmask = np.ones(F, bool)
    attempts = np.array([4], np.int32)

    hpi, sinv, dets, _, _, pred_raw = pallas_particle_predict_fused(
        jnp.asarray(ys6), jnp.asarray(pxy), jnp.asarray(pyy),
        jnp.asarray(xp), jnp.asarray(pxx7), jnp.asarray(lam),
        fku=CAM[0], fkv=CAM[1], u0c=CAM[2], v0c=CAM[3], kd1=CAM[4],
        sd0=SD0, no_sigma=NO_SIGMA, interpret=True, return_raw=True,
    )
    kw = dict(image_shape=(H, W), win_radius=32, no_sigma=NO_SIGMA,
              corr_thresh2=THRESH, interpret=True)

    shared = jnp.concatenate(
        [jnp.asarray(xp), jnp.asarray(pxx7).reshape(49)]
    ).reshape(1, _NSHARED)
    slot_rows = jnp.concatenate(
        [jnp.asarray(ys6), jnp.asarray(pxy[:, :7, :]).reshape(F, 42),
         jnp.asarray(pyy).reshape(F, 36)], axis=1)

    # full-width mode
    want = pallas_search_bayes(
        corr, pred_raw, jnp.asarray(prob), jnp.asarray(lam_full),
        jnp.asarray(palive), jnp.asarray(making), jnp.asarray(pmask),
        jnp.asarray(attempts), pidx=jnp.int32(pidx), **kw,
    )
    got = pallas_search_bayes(
        corr, None, jnp.asarray(prob), jnp.asarray(lam_full),
        jnp.asarray(palive), jnp.asarray(making), jnp.asarray(pmask),
        jnp.asarray(attempts), pidx=jnp.int32(pidx),
        shared=shared, slot_rows=slot_rows, cam_static=CAM, sd0=SD0, **kw,
    )
    assert len(got) == len(want) + 1
    for i, (g, w) in enumerate(zip(got[:-1], want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=str(i))
    # pred rows: bit-equal except ROW_DET, where the compiler is free to
    # contract s00*s11 - s01*s01 into an FMA differently in the two graphs
    # (observed: exactly 1 ulp of the product magnitude on a few lanes).
    # Every decision output above is still bit-equal; the e2e fingerprint
    # guards the device build.
    gp, wp = np.asarray(got[-1]), np.asarray(pred_raw)
    det_row = 5
    keep = np.ones(gp.shape[1], bool)
    keep[det_row] = False
    np.testing.assert_array_equal(gp[:, keep], wp[:, keep])
    np.testing.assert_allclose(gp[:, det_row], wp[:, det_row], rtol=1e-5)

    # compact mode
    want_c = pallas_search_bayes(
        corr, pred_raw, jnp.asarray(prob[pidx : pidx + 1]),
        jnp.asarray(lam), jnp.asarray(palive[pidx : pidx + 1]),
        jnp.asarray(making), jnp.asarray(pmask), jnp.asarray(attempts), **kw,
    )
    got_c = pallas_search_bayes(
        corr, None, jnp.asarray(prob[pidx : pidx + 1]),
        jnp.asarray(lam), jnp.asarray(palive[pidx : pidx + 1]),
        jnp.asarray(making), jnp.asarray(pmask), jnp.asarray(attempts),
        shared=shared, slot_rows=slot_rows, cam_static=CAM, sd0=SD0, **kw,
    )
    for i, (g, w) in enumerate(zip(got_c[:-1], want_c)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=str(i))
