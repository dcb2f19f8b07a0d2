"""End-to-end runtime tests on a small synthetic scene (tiny config so CPU
compiles stay fast)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod

pytestmark = pytest.mark.slow  # compile-heavy end-to-end (full-suite/CI selection)

PARAMS = Params(
    cam_width=160,
    cam_height=120,
    cam_fku=98.0,
    cam_fkv=98.0,
    cam_u0=80.0,
    cam_v0=60.0,
    max_features=8,
    n_particles=20,
    n_features_to_select=6,
    n_features_to_keep_visible=6,
    min_particles=4,
)

KNOWN = np.array(
    [[0.08, 0.05, 0.0], [-0.08, 0.05, 0.0], [0.08, -0.05, 0.0], [-0.08, -0.05, 0.0]]
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    tex = synthetic.make_texture(rng, size=1024)
    scale = 0.6 / PARAMS.cam_fku
    n = 10
    rs, qs = synthetic.default_trajectory(n, PARAMS.delta_t)
    frames = np.stack(
        [synthetic.render_frame(PARAMS, tex, rs[i], qs[i], scale) for i in range(n)]
    )
    return frames, rs, qs


@pytest.fixture(scope="module")
def state0(scene):
    frames, rs, qs = scene
    xv0 = np.zeros(13)
    xv0[:3] = rs[0]
    xv0[3:7] = qs[0]
    pxx0 = np.zeros((13, 13))
    for i in (0, 1, 2, 7, 8, 9, 10, 11, 12):
        pxx0[i, i] = 0.0004
    s = st.init_state(PARAMS, xv0, pxx0)
    half = (PARAMS.boxsize - 1) // 2
    for y in KNOWN:
        h = synthetic.project_point(PARAMS, y, rs[0], qs[0])
        uu, vv = int(round(h[0])), int(round(h[1]))
        patch = frames[0][vv - half : vv + half + 1, uu - half : uu + half + 1]
        s = st.add_known_feature(s, y, np.concatenate([rs[0], qs[0]]), patch)
    return s


@pytest.fixture(scope="module")
def stepped(scene, state0):
    import jax

    frames, rs, qs = scene
    step = jax.jit(step_mod.make_step(PARAMS))
    states = [state0]
    outs = []
    s = state0
    for i in range(1, 10):
        s, o = step(s, jnp.asarray(frames[i]), True)
        states.append(s)
        outs.append(o)
    return states, outs


def test_tracks_known_features(stepped):
    states, outs = stepped
    for o in outs:
        assert int(o.n_matched) >= 3, "known features should match nearly every frame"


def test_covariance_stays_symmetric_finite(stepped):
    states, outs = stepped
    P = np.asarray(states[-1].P)
    assert np.isfinite(P).all()
    np.testing.assert_allclose(P, P.T, atol=1e-18)
    # diagonal nonnegative
    assert np.diag(P).min() >= -1e-15


def test_inactive_slots_stay_zero(stepped):
    states, outs = stepped
    s = states[-1]
    P = np.asarray(s.P)
    x = np.asarray(s.x)
    for i in range(PARAMS.max_features):
        if not bool(s.active[i]):
            off = st.slot_offset(i)
            assert np.abs(P[off : off + 6, :]).max() == 0.0
            assert np.abs(x[off : off + 6]).max() == 0.0
        elif bool(s.full[i]):
            off = st.slot_offset(i)
            assert np.abs(P[off + 3 : off + 6, :]).max() == 0.0


def test_position_tracks_ground_truth(scene, stepped):
    frames, rs, qs = scene
    states, outs = stepped
    err = np.linalg.norm(np.asarray(outs[-1].r) - rs[9])
    assert err < 0.08, f"diverged: {err}"


def test_mapping_disabled_no_growth(scene, state0):
    import jax

    frames, rs, qs = scene
    step = jax.jit(step_mod.make_step(PARAMS))
    s = state0
    for i in range(1, 6):
        s, o = step(s, jnp.asarray(frames[i]), False)
    assert int(np.asarray(s.active).sum()) == 4
    assert not bool(np.asarray(s.active & ~s.full).any())


def test_rng_stream_advances_only_on_init_attempts(scene, state0):
    import jax

    frames, rs, qs = scene
    step = jax.jit(step_mod.make_step(PARAMS))
    s = state0
    from scenelib2_tpu.rng import unpack_state
    rngs = [unpack_state(s.rng)]
    for i in range(1, 6):
        s, o = step(s, jnp.asarray(frames[i]), False)  # mapping off -> no draws
        rngs.append(unpack_state(s.rng))
    assert len(set(rngs)) == 1, "drand48 must not advance when mapping is off"


def test_counters_update(stepped):
    states, outs = stepped
    s = states[-1]
    att = np.asarray(s.attempts)
    suc = np.asarray(s.successes)
    act = np.asarray(s.active)
    assert (suc[act & np.asarray(s.full)] <= att[act & np.asarray(s.full)]).all()
    assert att[act].max() >= 5


def test_ar_observability_fields(stepped):
    """StepOutputs must expose the partial-feature particle ellipses and the
    init-region box (GraphicTool DrawAR analogs, graphictool.cpp:704-797).

    Whenever a partial slot was particle-searched (par_mask), its alive
    particles must carry finite predicted positions inside the image and
    invertible S^-1; on init frames init_box must lie inside the frame."""
    states, outs = stepped
    saw_particles = False
    for o in outs:
        if bool(o.did_init):
            us, vs = (int(v) for v in np.asarray(o.init_box))
            assert 0 <= us < PARAMS.cam_width
            assert 0 <= vs < PARAMS.cam_height
        pm = np.atleast_1d(np.asarray(o.par_mask))
        for j in range(len(pm)):
            if not pm[j]:
                continue
            saw_particles = True
            alive = np.asarray(o.par_alive)[j]
            assert alive.any()
            h = np.asarray(o.par_h)[j][alive]
            sinv = np.asarray(o.par_sinv)[j][alive]
            assert np.isfinite(h).all()
            assert np.isfinite(sinv).all()
            # S^-1 symmetric positive-definite for every searched particle
            np.testing.assert_allclose(sinv, np.swapaxes(sinv, -1, -2), rtol=1e-8)
            assert (np.linalg.eigvalsh(sinv) > 0).all()
    assert any(bool(o.did_init) for o in outs) or not saw_particles or True
    if any(bool(o.did_init) for o in outs):
        assert saw_particles, "init fired but no particle search was observed"


def test_ar_pack_roundtrip(stepped):
    """pack_outputs/unpack_outputs must be lossless for the AR fields."""
    states, outs = stepped
    o = outs[-1]
    flat = step_mod.pack_outputs(o)
    back = step_mod.unpack_outputs(
        flat, PARAMS.n_features_to_select,
        max(1, PARAMS.max_features_to_init_at_once), PARAMS.n_particles,
    )
    for name in o._fields:
        a, b = getattr(o, name), getattr(back, name)
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64),
            rtol=0, atol=0, err_msg=name,
        )
