"""END-TO-END cross-validation against the reference's OWN compiled
orchestration (VERDICT round-2 item 1).

native/librefslam.so compiles the actual reference per-frame loop —
monoslam.cpp GoOneStep (:108-180) + kalman.cpp + feature.cpp — headless
behind stub Pangolin/graphics headers (native/refbuild/), driven through the
reference's real Init() on a generated .cfg. These tests replay the same
synthetic PGM sequences through that binary and through the JAX pipeline and
compare directly:

  - camera-trajectory RMSE (the BASELINE north-star clause, <= 1e-3, is
    measured literally here against the C++ reference; observed ~1e-15/frame)
  - per-frame discrete decisions: measured-feature count, map size, partial
    count, auto-init events
  - final map: labels, feature positions, attempt/success counters
  - full joint covariance via the reference's construct_total_covariance

The NumPy oracle (tests/oracle_monoslam.py) is hereby demoted to a debugging
aid — the ground truth below is the reference binary itself.

Skipped (not failed) when librefslam.so cannot be built (no reference tree
or OpenCV dev headers).
"""

from __future__ import annotations

import numpy as np
import pytest

from scenelib2_tpu.eval.synthetic import generate_dataset
from scenelib2_tpu.runtime.slam import MonoSLAM
from tests import refslam

pytestmark = pytest.mark.slow

N_FRAMES = 150


@pytest.fixture(scope="module")
def lib_ok():
    if refslam.build_lib() is None:
        pytest.skip("librefslam.so unavailable (reference tree or OpenCV missing)")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, lib_ok):
    d = tmp_path_factory.mktemp("e2e_ds")
    frames, rs, qs, cfg = generate_dataset(str(d), n_frames=N_FRAMES, seed=7)
    return frames, rs, qs, cfg


def run_pair(cfg, frames, enable_mapping):
    """Replay `frames` through the compiled reference and the JAX step.

    Returns (per-frame record list, ref instance, ours instance).
    """
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    recs = []
    for i in range(len(frames)):
        ref.go_one_step(frames[i], True, enable_mapping)
        ours.go_one_step(frames[i], True, enable_mapping)
        out = ours.last_output
        recs.append(
            dict(
                frame=i,
                ref_xv=ref.xv,
                our_xv=ours.xv,
                ref_matched=ref.n_matched,
                our_matched=int(np.asarray(out.n_matched)),
                ref_nfeat=ref.n_features,
                our_nfeat=int(np.asarray(out.n_active)),
                ref_npart=ref.n_partial,
                our_npart=int(np.asarray(out.n_partial)),
            )
        )
    return recs, ref, ours


def test_goonestep_trajectory_parity_vs_compiled_reference(dataset):
    """>=100 mapping-enabled frames through the REAL C++ GoOneStep: the
    north-star RMSE clause measured against the reference binary itself."""
    frames, rs, qs, cfg = dataset
    recs, ref, ours = run_pair(cfg, frames, enable_mapping=True)

    # the run must exercise mapping: the map must have grown and the
    # particle lifecycle fired at least once
    assert ref.n_features > 4, "mapping never initialised a feature"
    assert any(r["ref_npart"] > 0 for r in recs), "no partial feature ever live"

    # discrete decisions identical on every frame
    for r in recs:
        assert r["ref_matched"] == r["our_matched"], r
        assert r["ref_nfeat"] == r["our_nfeat"], r
        assert r["ref_npart"] == r["our_npart"], r

    # trajectory parity: north-star is RMSE <= 1e-3; actual agreement is
    # float64-noise level
    ref_traj = np.stack([r["ref_xv"][:3] for r in recs])
    our_traj = np.stack([r["our_xv"][:3] for r in recs])
    rmse = np.sqrt(np.mean(np.sum((ref_traj - our_traj) ** 2, axis=1)))
    assert rmse <= 1e-3, f"north-star RMSE violated: {rmse}"
    assert rmse <= 1e-8, f"expected float-noise agreement, got {rmse}"

    # full 13-dim camera state, worst frame
    max_xv = max(np.abs(r["ref_xv"] - r["our_xv"]).max() for r in recs)
    assert max_xv < 1e-9, f"camera state diverged: {max_xv}"

    # final map identical: labels, kinds, counters, positions
    ref_feats = {f["label"]: f for f in ref.features()}
    our_feats = {f["label"]: f for f in ours.feature_table()}
    assert set(ref_feats) == set(our_feats)
    for lab, rf in ref_feats.items():
        of = our_feats[lab]
        assert rf["fully_initialised"] == of["fully_initialised"], lab
        assert rf["attempts"] == of["attempts"], lab
        assert rf["successes"] == of["successes"], lab
        np.testing.assert_allclose(of["y"], rf["y"], atol=1e-9)

    # final camera covariance through the reference's own gather
    np.testing.assert_allclose(ours.pxx, ref.pxx, atol=1e-12)


def test_joint_covariance_parity_vs_compiled_reference(dataset):
    """The FULL joint covariance (reference construct_total_covariance,
    monoslam.cpp:518-546) matches our single dense P after a mapping run."""
    frames, rs, qs, cfg = dataset
    n = 60
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    for i in range(n):
        ref.go_one_step(frames[i], True, True)
        ours.go_one_step(frames[i], True, True)

    # assemble our packed P in reference feature order (ascending label =
    # insertion order, which matches position_in_total_state_vector_ order)
    from scenelib2_tpu.runtime import state as st

    refP = ref.total_cov()
    d = ref.total_state_size
    labels = np.asarray(ours.state.label)
    active = np.asarray(ours.state.active)
    full = np.asarray(ours.state.full)
    order = sorted(np.nonzero(active)[0], key=lambda s: labels[s])
    idx = list(range(13))
    for s in order:
        off = st.slot_offset(int(s))
        idx.extend(range(off, off + (3 if full[s] else 6)))
    assert len(idx) == d, (len(idx), d)
    ourP = np.asarray(ours.state.P)[np.ix_(idx, idx)]
    np.testing.assert_allclose(ourP, refP, atol=1e-12)

    # and the packed state vector
    refx = ref.total_state()
    ourx = np.asarray(ours.state.x)[idx]
    np.testing.assert_allclose(ourx, refx, atol=1e-10)


def test_mapping_disabled_parity_vs_compiled_reference(dataset):
    """Known-features-only tracking (Enable Mapping off,
    MonoSlamSceneLib1.cpp:107): same filter trajectory, no map growth."""
    frames, rs, qs, cfg = dataset
    recs, ref, ours = run_pair(cfg, frames[:60], enable_mapping=False)
    assert ref.n_features == 4 and ref.n_partial == 0
    for r in recs:
        assert r["ref_matched"] == r["our_matched"], r
        assert r["ref_nfeat"] == r["our_nfeat"] == 4, r
    max_xv = max(np.abs(r["ref_xv"] - r["our_xv"]).max() for r in recs)
    assert max_xv < 1e-9, max_xv


def test_particle_filter_internals_vs_compiled_reference(dataset):
    """While a partial feature is live, its surviving lambda particles and
    Bayes-updated weights match the reference's FeatureInitInfo exactly."""
    frames, rs, qs, cfg = dataset
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    compared = 0
    for i in range(len(frames)):
        ref.go_one_step(frames[i], True, True)
        ours.go_one_step(frames[i], True, True)
        parts = ref.partials()
        if not parts:
            continue
        s = ours.state
        alive = np.asarray(s.palive)
        lam = np.asarray(s.lam)
        w = np.asarray(s.prob)
        labels = np.asarray(s.label)
        part_slots = np.nonzero(np.asarray(s.active) & ~np.asarray(s.full))[0]
        our_parts = {}
        for slot in part_slots:
            m = alive[slot]
            our_parts[int(labels[slot])] = (lam[slot][m], w[slot][m])
        for p in parts:
            assert p["label"] in our_parts, (i, p["label"], our_parts.keys())
            ol, ow = our_parts[p["label"]]
            assert len(ol) == len(p["lambdas"]), (i, len(ol), len(p["lambdas"]))
            np.testing.assert_allclose(ol, p["lambdas"], atol=1e-12)
            np.testing.assert_allclose(ow, p["probs"], atol=1e-12)
            compared += 1
    assert compared >= 5, f"particle comparison barely exercised ({compared})"


def test_occlusion_deletion_parity_vs_compiled_reference(tmp_path_factory, lib_ok):
    """Occlude one known feature so its match rate collapses: the reference's
    delete_bad_features (monoslam.cpp:644-660, >=10 attempts & <50% success)
    must fire in both pipelines on the same frame, with identical surviving
    labels and camera state."""
    from scenelib2_tpu.eval.synthetic import (
        KNOWN_POINTS, generate_dataset, project_point,
    )
    from scenelib2_tpu.config import load_config

    d = str(tmp_path_factory.mktemp("e2e_occl"))
    frames, rs, qs, cfg = generate_dataset(d, n_frames=80, seed=13)
    params = load_config(cfg).params
    # paint over known feature 0 from frame 3 on (same trick as
    # test_parity_long.build_scene)
    frames = frames.copy()
    for i in range(3, len(frames)):
        h = project_point(params, KNOWN_POINTS[0], rs[i], qs[i])
        uu, vv = int(round(h[0])), int(round(h[1]))
        frames[i, max(0, vv - 16): vv + 16, max(0, uu - 16): uu + 16] = 128

    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    deletion_frame_ref = None
    for i in range(len(frames)):
        n_before = ref.n_features
        ref.go_one_step(frames[i], True, True)
        ours.go_one_step(frames[i], True, True)
        labels_ref = sorted(f["label"] for f in ref.features())
        labels_ours = sorted(f["label"] for f in ours.feature_table())
        assert labels_ref == labels_ours, (i, labels_ref, labels_ours)
        if deletion_frame_ref is None and 0 not in labels_ref:
            deletion_frame_ref = i
        np.testing.assert_allclose(ours.xv, ref.xv, atol=1e-9)
    assert deletion_frame_ref is not None, "occluded feature never deleted"
    assert 0 not in {f["label"] for f in ours.feature_table()}


def test_second_scene_parity_vs_compiled_reference(tmp_path_factory, lib_ok):
    """A different texture/trajectory seed: 100 mapping-enabled frames with
    identical decisions and float-noise trajectory agreement."""
    d = str(tmp_path_factory.mktemp("e2e_seed23"))
    frames, rs, qs, cfg = generate_dataset(d, n_frames=100, seed=23)
    recs, ref, ours = run_pair(cfg, frames, enable_mapping=True)
    for r in recs:
        assert r["ref_matched"] == r["our_matched"], r
        assert r["ref_nfeat"] == r["our_nfeat"], r
        assert r["ref_npart"] == r["our_npart"], r
    max_xv = max(np.abs(r["ref_xv"] - r["our_xv"]).max() for r in recs)
    assert max_xv < 1e-9, max_xv


def test_hires_parity_vs_compiled_reference(tmp_path_factory, lib_ok):
    """640x480 calibration (the hires bench config) through the REAL C++
    GoOneStep: the reference searches unbounded ellipses, so this also
    validates that the framework's static window caps (raised for the 2x
    pixel density) never clip a decision on this workload."""
    from scenelib2_tpu.config import Params

    p = Params(
        cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
        cam_u0=324.0, cam_v0=250.0, max_features=60,
        search_win_radius=48, particle_win_radius=52, n_particles=200,
    )
    d = str(tmp_path_factory.mktemp("e2e_hires"))
    frames, rs, qs, cfg = generate_dataset(d, n_frames=80, seed=7, params=p)
    ref = refslam.RefSlam(cfg)
    # window caps are framework-only knobs (not stock cfg keys): pass as
    # overrides so ours runs the same raised-cap hires configuration
    ours = MonoSLAM(
        cfg, max_features=60, search_win_radius=48, particle_win_radius=52
    )
    n_over = 0
    for i in range(len(frames)):
        ref.go_one_step(frames[i], True, True)
        ours.go_one_step(frames[i], True, True)
        out = ours.last_output
        n_over += int(np.asarray(out.n_overflow))
        assert ref.n_matched == int(np.asarray(out.n_matched)), i
        assert ref.n_features == int(np.asarray(out.n_active)), i
        assert ref.n_partial == int(np.asarray(out.n_partial)), i
        np.testing.assert_allclose(ours.xv, ref.xv, atol=1e-9)
    assert ref.n_features > 4, "hires mapping never initialised a feature"
    assert n_over == 0, "window caps clipped a search on the hires workload"


def test_manual_init_parity_vs_compiled_reference(dataset):
    """Manual feature initialisation at a picked pixel (the GUI click path,
    reference InitialiseFeature monoslam.cpp:1211-1235) inserts the same ray
    with the same particle distribution and evolves identically."""
    frames, rs, qs, cfg = dataset
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    # a few tracked frames first so the covariance is non-trivial
    for i in range(5):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)
    uu, vv = 240, 90
    ref.initialise_feature(frames[5], uu, vv)
    assert ours.initialise_feature(frames[5], uu, vv)
    assert ref.n_features == 5 and ref.n_partial == 1
    assert int(np.asarray(ours.state.active.sum())) == 5

    # inserted ray state + particle grid identical
    rfeat = {f["label"]: f for f in ref.features()}
    ofeat = {f["label"]: f for f in ours.feature_table()}
    np.testing.assert_allclose(ofeat[4]["y"], rfeat[4]["y"], atol=1e-12)
    rp = ref.partials()[0]
    lam = np.asarray(ours.state.lam)[
        np.nonzero(np.asarray(ours.state.active) & ~np.asarray(ours.state.full))[0][0]
    ]
    np.testing.assert_allclose(lam[: len(rp["lambdas"])], rp["lambdas"], atol=0)

    # continue mapping-off so only the manual feature's lifecycle differs
    for i in range(6, 40):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)
        out = ours.last_output
        assert ref.n_matched == int(np.asarray(out.n_matched)), i
        assert ref.n_partial == int(np.asarray(out.n_partial)), i
        np.testing.assert_allclose(ours.xv, ref.xv, atol=1e-9)


def test_initialise_auto_feature_parity_vs_compiled_reference(dataset):
    """Manual auto-init trigger (reference InitialiseAutoFeature,
    monoslam.cpp:1535-1541 -> AutoInitialiseFeature :823-868, no speed or
    visible-count gates): the same region is proposed, the same Shi-Tomasi
    patch picked, and the same ray inserted with the same particle grid."""
    frames, rs, qs, cfg = dataset
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    # tracked mapping-OFF frames so GoOneStep itself never auto-inits and the
    # only init event is the manual trigger below
    for i in range(8):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)
    assert ref.n_partial == 0

    ref.initialise_auto_feature(frames[8])
    did = ours.initialise_auto_feature(frames[8])
    assert ref.n_partial == 1, "reference trigger declined to init"
    assert did, "our trigger declined while the reference initialised"
    assert int(np.asarray(ours.state.active.sum())) == ref.n_features

    # same proposed search region
    defined, box = ref.init_search_region()
    assert defined
    # inserted ray + particle grid identical
    rfeat = {f["label"]: f for f in ref.features()}
    ofeat = {f["label"]: f for f in ours.feature_table()}
    assert set(rfeat) == set(ofeat)
    new_lab = max(rfeat)
    np.testing.assert_allclose(ofeat[new_lab]["y"], rfeat[new_lab]["y"],
                               atol=1e-12)
    rp = ref.partials()[0]
    slot = np.nonzero(
        np.asarray(ours.state.active) & ~np.asarray(ours.state.full)
    )[0][0]
    lam = np.asarray(ours.state.lam)[slot]
    np.testing.assert_allclose(lam[: len(rp["lambdas"])], rp["lambdas"], atol=0)

    # evolve mapping-off: the manual ray's particle lifecycle must track
    for i in range(9, 45):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)
        out = ours.last_output
        assert ref.n_matched == int(np.asarray(out.n_matched)), i
        assert ref.n_partial == int(np.asarray(out.n_partial)), i
        np.testing.assert_allclose(ours.xv, ref.xv, atol=1e-9)


def test_add_new_known_feature_midrun_parity_vs_compiled_reference(
    dataset, tmp_path
):
    """AddNewKnownFeature mid-run (reference monoslam.cpp:1278-1291 +
    known-feature constructor feature.cpp:108-149): a 5th known feature with
    zero covariance injected after 10 tracked frames behaves identically in
    both pipelines."""
    from scenelib2_tpu.config import load_config
    from scenelib2_tpu.eval.synthetic import project_point
    from scenelib2_tpu.io.pgm import write_pgm

    frames, rs, qs, cfg = dataset
    params = load_config(cfg).params
    ref = refslam.RefSlam(cfg)
    ours = MonoSLAM(cfg)
    for i in range(10):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)

    # world point at the target centre, patch cropped from frame 10 at its
    # ground-truth projection — exactly how the stock PGMs were captured
    y = np.array([0.0, 0.0, 0.0])
    xp_org = np.concatenate([rs[10], qs[10]])
    h = project_point(params, y, rs[10], qs[10])
    uu, vv = int(round(h[0])), int(round(h[1]))
    half = (params.boxsize - 1) // 2
    patch = frames[10][vv - half : vv + half + 1, uu - half : uu + half + 1]
    patch_path = str(tmp_path / "known_patch_mid.pgm")
    write_pgm(patch_path, patch)

    ref.add_new_known_feature(y, xp_org, patch_path)
    ours.add_new_known_feature(y, xp_org, patch_path)
    assert ref.n_features == 5
    assert int(np.asarray(ours.state.active.sum())) == 5

    # the new feature enters with zero covariance in both
    d = ref.total_state_size
    refP = ref.total_cov()
    assert np.abs(refP[d - 3 :, :]).max() == 0.0
    rfeat = {f["label"]: f for f in ref.features()}
    ofeat = {f["label"]: f for f in ours.feature_table()}
    assert set(rfeat) == set(ofeat)
    np.testing.assert_allclose(ofeat[4]["y"], rfeat[4]["y"], atol=0)

    # it must be measured and converge identically from here on
    matched_counts = []
    for i in range(10, 60):
        ref.go_one_step(frames[i], True, False)
        ours.go_one_step(frames[i], True, False)
        out = ours.last_output
        assert ref.n_matched == int(np.asarray(out.n_matched)), i
        assert ref.n_features == int(np.asarray(out.n_active)) == 5, i
        matched_counts.append(ref.n_matched)
        np.testing.assert_allclose(ours.xv, ref.xv, atol=1e-9)
    # the injected feature was actually exercised: with 5 known features the
    # selector (NSEL=5 default... cfg) must have matched 5 at least once
    assert max(matched_counts) >= 5, matched_counts

    # final per-feature counters identical (attempts/successes of the new one)
    rfeat = {f["label"]: f for f in ref.features()}
    ofeat = {f["label"]: f for f in ours.feature_table()}
    for lab, rf in rfeat.items():
        assert rf["attempts"] == ofeat[lab]["attempts"], lab
        assert rf["successes"] == ofeat[lab]["successes"], lab


def test_stock_data_bootstrap_parity_vs_compiled_reference(
    lib_ok, tmp_path_factory, monkeypatch
):
    """North-star "stock SceneLib2.cfg" clause exercised with STOCK DATA end
    to end: the cold start is AddNewKnownFeature x4 from the literal
    data/known_patch{0..3}.pgm files (monoslam.cpp:1940-1957,
    SceneLib2.cfg:267-313) against footage CONTAINING that printed target —
    the four stock patches composited onto the world plane at the cfg's
    target-corner points — and both pipelines consume the UNMODIFIED stock
    cfg (no synthetic lookalikes anywhere in the chain)."""
    import os

    from scenelib2_tpu.config import load_config
    from scenelib2_tpu.eval.synthetic import generate_stock_dataset, project_point
    from scenelib2_tpu.io.pgm import read_pgm

    d = tmp_path_factory.mktemp("stock_ds")
    frames, rs, qs, stock_cfg = generate_stock_dataset(str(d), n_frames=120)
    assert os.path.basename(stock_cfg) == "SceneLib2.cfg"

    # the rendered target must be faithful: frame 0 reproduces each STOCK
    # patch at its projection well inside the matcher's threshold
    cfg = load_config(stock_cfg)
    half = (cfg.params.boxsize - 1) // 2
    for kf in cfg.known_features:
        patch = read_pgm(kf.patch_path).astype(float)
        h = project_point(cfg.params, np.asarray(kf.y), rs[0], qs[0])
        uu, vv = int(round(h[0])), int(round(h[1]))
        crop = frames[0][vv - half : vv + half + 1,
                         uu - half : uu + half + 1].astype(float)
        a = crop - crop.mean()
        b = patch - patch.mean()
        nssd = ((a / np.linalg.norm(a) - b / np.linalg.norm(b)) ** 2).sum()
        assert nssd < 0.25, (kf.patch_path, nssd)  # corr_thresh2 is 0.40

    # the reference resolves the stock `../../data/known_patch*.pgm`
    # identifiers against the CWD: run it from two levels below the repo
    # root so the LITERAL cfg loads the LITERAL stock PGMs
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(os.path.join(repo, "native", "refbuild"))
    recs, ref, ours = run_pair(stock_cfg, frames[1:], enable_mapping=True)

    # cold start actually worked: the stock known features were measured
    # from the first frames (4 known, NSEL=10 selects all of them)
    early = [r["our_matched"] for r in recs[:10]]
    assert min(early) >= 3, early
    assert ref.n_features > 4, "mapping never grew past the stock bootstrap"

    for r in recs:
        assert r["ref_matched"] == r["our_matched"], r
        assert r["ref_nfeat"] == r["our_nfeat"], r
        assert r["ref_npart"] == r["our_npart"], r

    ref_traj = np.stack([r["ref_xv"][:3] for r in recs])
    our_traj = np.stack([r["our_xv"][:3] for r in recs])
    rmse = np.sqrt(np.mean(np.sum((ref_traj - our_traj) ** 2, axis=1)))
    assert rmse <= 1e-3, f"north-star RMSE violated: {rmse}"
    assert rmse <= 1e-8, f"expected float-noise agreement, got {rmse}"

    # and the stock bootstrap genuinely localizes: trajectory error vs the
    # rendered ground truth stays small and BOUNDED (no divergence). The
    # reference binary itself achieves ~0.020 m RMSE here — the stock prior
    # starts with the wrong velocity (-0.1 z vs true +0.23 x) at zero
    # velocity variance, giving a ~0.033 m transient around frame 6 that
    # settles to ~1-2 cm at 0.6 m scene depth; both pipelines reproduce it
    # identically, which the 1e-8 parity bound above already proves
    gt = rs[1:]
    err = np.linalg.norm(our_traj - gt, axis=1)
    rmse_gt = np.sqrt(np.mean(err ** 2))
    assert rmse_gt < 0.04, f"lost tracking on stock data: {rmse_gt} m"
    assert err[-1] < 0.03, f"trajectory diverging: final error {err[-1]} m"
