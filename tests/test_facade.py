"""MonoSLAM facade API tests (tiny config, fast compiles)."""

import os

import numpy as np
import pytest

from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime.slam import MonoSLAM

pytestmark = pytest.mark.slow  # compile-heavy end-to-end (full-suite/CI selection)

PARAMS = Params(
    cam_width=160, cam_height=120, cam_fku=98.0, cam_fkv=98.0,
    cam_u0=80.0, cam_v0=60.0, max_features=8, n_particles=16,
    n_features_to_select=4, n_features_to_keep_visible=4, min_particles=4,
)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ds"))
    frames, rs, qs, cfg = synthetic.generate_dataset(d, n_frames=8, params=PARAMS)
    return d, frames, cfg


@pytest.fixture(scope="module")
def slam(world):
    d, frames, cfg = world
    s = MonoSLAM(cfg, max_features=PARAMS.max_features, n_particles=PARAMS.n_particles,
                 n_features_to_select=PARAMS.n_features_to_select,
                 n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
                 min_particles=PARAMS.min_particles)
    for i in range(1, 5):
        s.go_one_step(frames[i])
    return s


def test_reference_style_aliases(slam):
    assert slam.GoOneStep == slam.go_one_step
    assert slam.InitialiseAutoFeature == slam.initialise_auto_feature
    assert slam.AddNewKnownFeature == slam.add_new_known_feature
    assert slam.SavePatch == slam.save_patch


def test_manual_initialise_feature(world):
    """Reference InitialiseFeature: init a ray at a picked pixel."""
    d, frames, cfg = world
    s = MonoSLAM(cfg, max_features=PARAMS.max_features, n_particles=PARAMS.n_particles,
                 n_features_to_select=PARAMS.n_features_to_select,
                 n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
                 min_particles=PARAMS.min_particles)
    n0 = sum(1 for _ in s.feature_table())
    assert s.initialise_feature(frames[1], 80, 60)
    tbl = s.feature_table()
    assert len(tbl) == n0 + 1
    assert not tbl[-1]["fully_initialised"]
    # out-of-border pick is rejected
    assert not s.initialise_feature(frames[1], 2, 2)
    assert s.InitialiseFeature == s.initialise_feature


def test_feature_table_and_mark_toggle(slam):
    tbl = slam.feature_table()
    assert len(tbl) >= 4
    lab = tbl[0]["label"]
    slam.mark_feature_by_lab(lab)
    assert slam.marked_feature_label == lab
    assert slam.toggle_feature_lab(lab)
    assert lab in slam.selected_labels
    assert slam.toggle_feature_lab(lab)
    assert lab not in slam.selected_labels
    assert not slam.toggle_feature_lab(999)


def test_print_robot_state(slam, capsys):
    s = slam.print_robot_state()
    assert "[Robot state]" in s and "[Robot covariance]" in s
    assert len(slam.xv) == 13 and slam.pxx.shape == (13, 13)


def test_checkpoint_roundtrip(slam, world, tmp_path):
    d, frames, cfg = world
    ck = str(tmp_path / "state.npz")
    slam.save_checkpoint(ck)
    other = MonoSLAM(cfg, max_features=PARAMS.max_features, n_particles=PARAMS.n_particles,
                     n_features_to_select=PARAMS.n_features_to_select,
                     n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
                     min_particles=PARAMS.min_particles)
    other.load_checkpoint(ck)
    np.testing.assert_array_equal(np.asarray(other.state.x), np.asarray(slam.state.x))
    np.testing.assert_array_equal(np.asarray(other.state.rng), np.asarray(slam.state.rng))


def test_reset(world):
    d, frames, cfg = world
    s = MonoSLAM(cfg, max_features=PARAMS.max_features, n_particles=PARAMS.n_particles,
                 n_features_to_select=PARAMS.n_features_to_select,
                 n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
                 min_particles=PARAMS.min_particles)
    x0 = np.asarray(s.state.x).copy()
    s.go_one_step(frames[1])
    assert not np.array_equal(np.asarray(s.state.x), x0)
    s.reset()
    np.testing.assert_array_equal(np.asarray(s.state.x), x0)
    assert s.trajectory_store == []


def test_add_known_feature_mid_run(slam, world):
    d, frames, cfg = world
    n0 = len(slam.feature_table())
    patch = frames[0][40:51, 60:71]
    slam.add_new_known_feature([0.0, 0.0, 0.05], np.concatenate([[0, 0, -0.6], [1, 0, 0, 0]]), patch)
    assert len(slam.feature_table()) == n0 + 1


def test_checkpoint_rejects_mismatched_capacity(slam, world, tmp_path):
    """A checkpoint written under one capacity config must fail to load
    under another with a clear error, not deep inside jit (VERDICT r4)."""
    d, frames, cfg = world
    ck = str(tmp_path / "state_cap.npz")
    slam.save_checkpoint(ck)
    other = MonoSLAM(cfg, max_features=12, n_particles=PARAMS.n_particles,
                     n_features_to_select=PARAMS.n_features_to_select,
                     n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
                     min_particles=PARAMS.min_particles)
    with pytest.raises(ValueError, match="max_features=12"):
        other.load_checkpoint(ck)


def test_checkpoint_roundtrip_mid_collapse(world, tmp_path):
    """Round-trip with a partial feature mid-collapse: non-trivial particle
    state (pruned weights, live mask) must survive save/load and the resumed
    run must continue identically to the uninterrupted one."""
    d, frames, cfg = world
    kw = dict(max_features=PARAMS.max_features, n_particles=PARAMS.n_particles,
              n_features_to_select=PARAMS.n_features_to_select,
              n_features_to_keep_visible=PARAMS.n_features_to_keep_visible,
              min_particles=PARAMS.min_particles)
    s = MonoSLAM(cfg, **kw)
    s.go_one_step(frames[1])
    # manually init a ray so a partial feature with a live particle cloud
    # exists, then run frames so its weights are Bayes-updated / pruned
    assert s.initialise_feature(frames[1], 80, 60)
    s.go_one_step(frames[2])
    s.go_one_step(frames[3])
    st_ = s.state
    partial = np.asarray(st_.active & ~st_.full)
    assert partial.any(), "setup should leave a partial feature mid-collapse"
    pr = np.asarray(st_.prob[np.flatnonzero(partial)[0]])
    assert np.isfinite(pr).all() and pr.max() > 0

    ck = str(tmp_path / "state_mid.npz")
    s.save_checkpoint(ck)
    resumed = MonoSLAM(cfg, **kw)
    resumed.load_checkpoint(ck)
    for k, v in s.state._asdict().items():
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed.state, k)), np.asarray(v), err_msg=k)
    # continue both for two frames: identical continuation
    for i in (4, 5):
        s.go_one_step(frames[i])
        resumed.go_one_step(frames[i])
    np.testing.assert_array_equal(np.asarray(s.state.x), np.asarray(resumed.state.x))
    np.testing.assert_array_equal(np.asarray(s.state.palive), np.asarray(resumed.state.palive))
    np.testing.assert_array_equal(np.asarray(s.state.prob), np.asarray(resumed.state.prob))
