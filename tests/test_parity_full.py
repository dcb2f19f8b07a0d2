"""Full-size parity run (stock 320x240 calibration): auto-init, particle
depth filtering, and ray->point conversion must all fire and match the
oracle's decisions exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod
from tests.oracle_monoslam import Cam, Feat, OracleMonoSLAM

pytestmark = pytest.mark.slow  # compile-heavy end-to-end (full-suite/CI selection)

PARAMS = Params(max_features=16)
N_FRAMES = 24


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    tex = synthetic.make_texture(rng)
    scale = 0.6 / PARAMS.cam_fku
    rs, qs = synthetic.default_trajectory(N_FRAMES, PARAMS.delta_t)
    frames = np.stack(
        [synthetic.render_frame(PARAMS, tex, rs[i], qs[i], scale) for i in range(N_FRAMES)]
    )
    # occlude the first known feature from frame 3 on so its matches fail and
    # the delete-bad path (>=10 attempts, <50% success) fires in both
    # implementations
    for i in range(3, N_FRAMES):
        h = synthetic.project_point(PARAMS, synthetic.KNOWN_POINTS[0], rs[i], qs[i])
        uu, vv = int(round(h[0])), int(round(h[1]))
        frames[i, max(0, vv - 16) : vv + 16, max(0, uu - 16) : uu + 16] = 128

    xv0 = np.zeros(13)
    xv0[:3] = rs[0]
    xv0[3:7] = qs[0]
    xv0[9] = -0.02
    xv0[12] = 0.01
    pxx0 = np.zeros((13, 13))
    for i in (0, 1, 2, 7, 8, 9, 10, 11, 12):
        pxx0[i, i] = 0.0004

    half = (PARAMS.boxsize - 1) // 2
    feats = []
    for y in synthetic.KNOWN_POINTS:
        h = synthetic.project_point(PARAMS, y, rs[0], qs[0])
        uu, vv = int(round(h[0])), int(round(h[1]))
        patch = frames[0][vv - half : vv + half + 1, uu - half : uu + half + 1]
        feats.append((y, np.concatenate([rs[0], qs[0]]), patch))
    return frames, xv0, pxx0, feats


@pytest.fixture(scope="module")
def runs(world):
    frames, xv0, pxx0, feats = world
    cam = Cam(
        PARAMS.cam_width, PARAMS.cam_height, PARAMS.cam_fku, PARAMS.cam_fkv,
        PARAMS.cam_u0, PARAMS.cam_v0, PARAMS.cam_kd1, PARAMS.cam_sd,
    )
    oracle = OracleMonoSLAM(cam, PARAMS, xv0, pxx0, seed=0)
    for y, xp_org, patch in feats:
        oracle.feats.append(
            Feat(
                y=np.asarray(y, float).copy(), pxy=np.zeros((13, 3)), pyy=np.zeros((3, 3)),
                cross=[np.zeros((3, 3)) for _ in range(len(oracle.feats))],
                patch=patch.copy(), xp_org=np.asarray(xp_org, float).copy(),
                label=oracle.next_label, fully=True,
            )
        )
        oracle.next_label += 1

    events = dict(inits=0, conversions=0)
    ostats = []
    for i in range(1, N_FRAMES):
        nf = len(oracle.feats)
        nfull = sum(f.fully for f in oracle.feats)
        ostats.append(oracle.go_one_step(frames[i], True))
        if len(oracle.feats) > nf:
            events["inits"] += 1
        if sum(f.fully for f in oracle.feats) > nfull:
            events["conversions"] += 1

    s = st.init_state(PARAMS, xv0, pxx0)
    for y, xp_org, patch in feats:
        s = st.add_known_feature(s, y, xp_org, patch)
    step = jax.jit(step_mod.make_step(PARAMS))
    jouts, jstates = [], []
    for i in range(1, N_FRAMES):
        s, o = step(s, jnp.asarray(frames[i]), True)
        jouts.append(o)
        jstates.append(s)
    return oracle, ostats, events, jstates, jouts


def test_lifecycle_events_fire(runs):
    oracle, ostats, events, jstates, jouts = runs
    assert events["inits"] >= 1, "scenario must exercise auto-init"
    assert events["conversions"] >= 1, "scenario must exercise ray->point conversion"
    jinits = sum(bool(o.did_init) for o in jouts)
    jconv = sum(bool(o.did_convert) for o in jouts)
    assert jinits == events["inits"]
    assert jconv == events["conversions"]


def test_bad_feature_deleted_in_both(runs):
    """The occluded known feature must be pruned by the failure-rate rule in
    both implementations (monoslam.cpp:644-660)."""
    oracle, ostats, events, jstates, jouts = runs
    oracle_labels = {f.label for f in oracle.feats}
    assert 0 not in oracle_labels, "oracle should have deleted feature 0"
    s = jstates[-1]
    jax_labels = {int(l) for l, a in zip(np.asarray(s.label), np.asarray(s.active)) if a}
    assert 0 not in jax_labels, "jax pipeline should have deleted feature 0"


def test_per_frame_decisions(runs):
    oracle, ostats, events, jstates, jouts = runs
    for i, (os_, jo) in enumerate(zip(ostats, jouts)):
        assert os_["n_visible"] == int(jo.n_visible), f"frame {i+1}"
        assert os_["n_matched"] == int(jo.n_matched), f"frame {i+1}"


def test_map_and_particles(runs):
    oracle, ostats, events, jstates, jouts = runs
    s = jstates[-1]
    assert int(np.asarray(s.active).sum()) == len(oracle.feats)
    # partial particle distributions match
    for pi in oracle.partials:
        # find the jax slot with the same label
        labels = np.asarray(s.label)
        slot = int(np.nonzero(labels == pi.feat.label)[0][0])
        alive = np.asarray(s.palive[slot])
        assert alive.sum() == len(pi.lam)
        np.testing.assert_allclose(
            np.asarray(s.lam[slot])[alive], pi.lam, rtol=0, atol=0
        )
        np.testing.assert_allclose(
            np.asarray(s.prob[slot])[alive], pi.prob, rtol=1e-9, atol=1e-12
        )


def test_feature_positions_match(runs):
    oracle, ostats, events, jstates, jouts = runs
    s = jstates[-1]
    labels = np.asarray(s.label)
    for k, f in enumerate(oracle.feats):
        slot = int(np.nonzero(labels == f.label)[0][0])
        off = st.slot_offset(slot)
        yj = np.asarray(s.x[off : off + f.y.size])
        np.testing.assert_allclose(yj, f.y, rtol=0, atol=1e-9, err_msg=f"feature {f.label}")


def test_trajectory_rmse(runs):
    oracle, ostats, events, jstates, jouts = runs
    otraj = np.asarray(oracle.trajectory)
    jtraj = np.stack([np.asarray(o.r) for o in jouts])
    rmse = np.sqrt(((otraj - jtraj) ** 2).sum(axis=1).mean())
    assert rmse < 1e-8, f"RMSE vs oracle = {rmse}"


def test_rng_parity(runs):
    oracle, ostats, events, jstates, jouts = runs
    from scenelib2_tpu.rng import unpack_state
    assert unpack_state(jstates[-1].rng) == oracle.rng.state()
