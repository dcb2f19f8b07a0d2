"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow  # compile-heavy end-to-end (full-suite/CI selection)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_sharded_joint_update_matches_dense(devices_ok, rng):
    m = pmesh.make_mesh((4, 2), ("row", "col"))
    D, M = 128, 8
    A = rng.normal(size=(D, D))
    P = jnp.asarray(A @ A.T + np.eye(D))
    x = jnp.asarray(rng.normal(size=D))
    H = jnp.asarray(rng.normal(size=(M, D)))
    nu = jnp.asarray(rng.normal(size=M))
    R = jnp.eye(M) * 1.2

    upd = pmesh.sharded_joint_update(m, D, M)
    with m:
        x2, P2 = upd(x, P, H, nu, R)
        x2, P2 = np.asarray(x2), np.asarray(P2)

    from scenelib2_tpu.core import ekf

    x_ref, P_ref, _ = ekf.joint_update(x, P, H, nu, R)
    np.testing.assert_allclose(x2, np.asarray(x_ref), rtol=1e-10)
    np.testing.assert_allclose(P2, np.asarray(P_ref), rtol=1e-8, atol=1e-10)


def _dense_frame(x, P, u, H, nu, R):
    """Reference composition on the unsharded state: the stress500 step."""
    from scenelib2_tpu.core import ekf

    x, P = ekf.predict(x, P, u, 1 / 30.0, 4.0, 6.0)
    x, P, _ = ekf.joint_update(x, P, H, nu, R)
    x, P = ekf.normalise(x, P)
    return x, ekf.symmetrize(P)


def _frame_operands(rng, D, M):
    import numpy as np

    A = rng.normal(size=(D, D)) * 0.05
    P = jnp.asarray(A @ A.T + np.eye(D))
    xv = np.zeros(13)
    xv[3] = 1.0
    xv[7:13] = rng.normal(size=6) * 0.1
    x = jnp.zeros(D).at[:13].set(jnp.asarray(xv))
    H = jnp.zeros((M, D)).at[:, 13 : 13 + M].set(jnp.eye(M))
    H = H.at[:, :13].set(jnp.asarray(rng.normal(size=(M, 13)) * 0.1))
    nu = jnp.asarray(rng.normal(size=M)) * 0.01
    R = jnp.eye(M) * 1.2
    return x, P, H, nu, R


def test_sharded_frame_matches_dense(devices_ok, rng):
    """The full sharded EKF frame (real motion model) == the dense path."""
    m = pmesh.make_mesh((4, 2), ("row", "col"))
    D, M = pmesh.pad_for_mesh(13 + 6 * 20, 4, 2), 16
    x, P, H, nu, R = _frame_operands(rng, D, M)
    u = jnp.zeros(3)

    frame = pmesh.sharded_slam_frame(m, D, M)
    with m:
        xs, Ps = frame(x, P, u, H, nu, R)
        xs, Ps = np.asarray(xs), np.asarray(Ps)

    xd, Pd = _dense_frame(x, P, u, H, nu, R)
    np.testing.assert_allclose(xs, np.asarray(xd), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(Ps, np.asarray(Pd), rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_sharded_frame_matches_dense_stress500(devices_ok, rng):
    """Same assertion at the real stress500 shape: D = 13+6*500 mesh-padded."""
    m = pmesh.make_mesh((4, 2), ("row", "col"))
    D, M = pmesh.pad_for_mesh(13 + 6 * 500, 4, 2), 20
    assert D >= 3013
    x, P, H, nu, R = _frame_operands(rng, D, M)
    u = jnp.zeros(3)

    frame = pmesh.sharded_slam_frame(m, D, M)
    with m:
        xs, Ps = frame(x, P, u, H, nu, R)
        xs, Ps = np.asarray(xs), np.asarray(Ps)

    xd, Pd = _dense_frame(x, P, u, H, nu, R)
    np.testing.assert_allclose(xs, np.asarray(xd), rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(Ps, np.asarray(Pd), rtol=1e-8, atol=1e-11)


def test_sharded_stress_frame_matches_dense(devices_ok, rng):
    """The sharded frame with REAL measurement assembly (H built from the
    sharded P's own slot blocks) must make the same top-k selection and the
    same posterior as the unsharded stress step
    (eval.benchmark._make_realistic_ekf_step)."""
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.eval.benchmark import _make_map_state, _make_realistic_ekf_step

    m = pmesh.make_mesh((4, 2), ("row", "col"))
    n_feat, slot_dim, n_sel = 50, 6, 10
    params = Params()
    D_live = 13 + slot_dim * n_feat
    D = pmesh.pad_for_mesh(D_live, 4, 2)
    x0, P0, _ = _make_map_state(n_feat, slot_dim)
    x = jnp.zeros(D).at[:D_live].set(jnp.asarray(x0))
    P = jnp.zeros((D, D)).at[:D_live, :D_live].set(jnp.asarray(P0))

    frame = pmesh.sharded_stress_frame(m, params, n_feat, slot_dim, n_sel)
    with m:
        xs, Ps, top_s = frame(x, P, jnp.zeros(3))
        xs, Ps, top_s = np.asarray(xs), np.asarray(Ps), np.asarray(top_s)

    dense = _make_realistic_ekf_step(params, n_feat, slot_dim, n_sel=n_sel)
    xd, Pd = dense(x, P)
    from scenelib2_tpu.core.camera import CameraParams
    from scenelib2_tpu.runtime.assembly import measurement_assembly
    from scenelib2_tpu.core import ekf

    xp_d, Pp_d = ekf.predict(x, P, jnp.zeros(3), params.delta_t,
                             params.sd_a, params.sd_alpha)
    _, _, top_d, _ = measurement_assembly(
        CameraParams.from_params(params), xp_d, Pp_d, n_feat, slot_dim, n_sel
    )
    # identical DECISIONS: the selection indices must match exactly
    np.testing.assert_array_equal(top_s, np.asarray(top_d))
    np.testing.assert_allclose(xs, np.asarray(xd), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(Ps, np.asarray(Pd), rtol=1e-7, atol=1e-10)
    # pad dims stay exactly zero through the sharded frame
    assert np.all(xs[D_live:] == 0.0)
    assert np.all(Ps[D_live:, :] == 0.0) and np.all(Ps[:, D_live:] == 0.0)


def test_sharded_predict_matches_dense(devices_ok, rng):
    """Real-motion sharded predict == core.ekf.predict."""
    from scenelib2_tpu.core import ekf

    m = pmesh.make_mesh((4, 2), ("row", "col"))
    D = pmesh.pad_for_mesh(13 + 6 * 10, 4, 2)
    x, P, _, _, _ = _frame_operands(rng, D, 4)
    u = jnp.asarray(rng.normal(size=3) * 0.01)

    pred = pmesh.sharded_predict(m, D)
    with m:
        xs, Ps = pred(x, P, u)
        xs, Ps = np.asarray(xs), np.asarray(Ps)

    xd, Pd = ekf.predict(x, P, u, 1 / 30.0, 4.0, 6.0)
    np.testing.assert_allclose(xs, np.asarray(xd), rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(Ps, np.asarray(Pd), rtol=1e-12, atol=1e-15)


def test_batched_step_shards_and_runs(devices_ok):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", __file__.replace("tests/test_parallel.py", "__graft_entry__.py")
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)


def test_replicate_states_rng_offsets(devices_ok):
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.runtime import state as st

    p = Params(max_features=2, n_particles=4)
    s = st.init_state(p, np.zeros(13), np.eye(13))
    sb = pmesh.replicate_states(s, 4)
    assert sb.x.shape == (4, p.state_dim)
    assert len({tuple(r) for r in np.asarray(sb.rng)}) == 4  # distinct streams


def test_batch_mode_step_matches_single_stream_decisions(rng):
    """The batch-specialized step (batch_mode=True: dense particle search,
    no-cond surgery, vmap-friendly forms) must make IDENTICAL per-frame
    decisions and produce the same filter state as the single-stream step
    replayed lane by lane."""
    import dataclasses

    from scenelib2_tpu.eval import synthetic
    from scenelib2_tpu.io.pgm import read_pgm
    from scenelib2_tpu.config import load_config
    from scenelib2_tpu.rng import pack_state, srand48
    from scenelib2_tpu.runtime import state as st
    from scenelib2_tpu.runtime import step as step_mod

    LANES, T = 3, 10
    lane_frames, lane_cfgs = [], []
    import tempfile

    for k in range(LANES):
        d = tempfile.mkdtemp(prefix=f"bmatch{k}_")
        frames, rs, qs, cfg_path = synthetic.generate_dataset(
            d, n_frames=T + 1, seed=11 + k
        )
        lane_frames.append(frames)
        lane_cfgs.append(load_config(cfg_path))

    params_single = dataclasses.replace(
        lane_cfgs[0].params, max_features=12, batch_mode=False, use_pallas=False
    )
    params_batch = dataclasses.replace(params_single, batch_mode=True)

    def build(cfg, params, seed):
        s = st.init_state(params, cfg.xv0, cfg.pxx0)
        for kf in cfg.known_features:
            s = st.add_known_feature(s, kf.y, kf.xp_org, read_pgm(kf.patch_path))
        return s._replace(rng=jnp.asarray(pack_state(srand48(seed))))

    # single-stream reference runs
    step1 = jax.jit(step_mod.make_step(params_single))
    singles = []
    for k in range(LANES):
        s = build(lane_cfgs[k], params_single, seed=k)
        outs = []
        for t in range(1, T + 1):
            s, o = step1(s, jnp.asarray(lane_frames[k][t], jnp.uint8), True)
            outs.append(o)
        singles.append((s, outs))

    # batched run
    stepb = step_mod.make_step(params_batch)
    vstep = jax.jit(jax.vmap(stepb, in_axes=(0, 0, None)))
    states = [build(lane_cfgs[k], params_batch, seed=k) for k in range(LANES)]
    sb = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *states)
    bouts = []
    for t in range(1, T + 1):
        fb = jnp.stack([jnp.asarray(lane_frames[k][t], jnp.uint8) for k in range(LANES)])
        sb, ob = vstep(sb, fb, True)
        bouts.append(ob)

    for k in range(LANES):
        s_end, outs = singles[k]
        for t in range(T):
            for field in ("n_matched", "n_active", "n_partial", "did_init", "did_convert"):
                a = np.asarray(getattr(outs[t], field))
                b = np.asarray(getattr(bouts[t], field))[k]
                assert np.array_equal(a, b), (k, t, field, a, b)
        np.testing.assert_allclose(
            np.asarray(sb.x)[k], np.asarray(s_end.x), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(sb.P)[k], np.asarray(s_end.P), atol=1e-12
        )
        assert np.array_equal(np.asarray(sb.rng)[k], np.asarray(s_end.rng))
