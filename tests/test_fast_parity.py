"""CI decision-parity for the SCORED fast path (VERDICT r3 items 1+2).

The benchmark runs f32 + the full Pallas kernel set through the
run_sequence/_scan graph (bench.py:34-36,101-105); every other parity proof
runs f64 XLA. These tests put the bridge under CI:

  - the f32+Pallas pipeline (interpret-mode kernels on CPU), driven through
    the EXACT benched artifact (run_sequence's packed lax.scan), must make
    the same per-frame decisions as the f64 pipeline AND the compiled C++
    reference over the full 239-frame std workload, a hires run, and a
    600-frame long-horizon run, with trajectory RMSE vs the reference binary
    within the north-star bound (observed: f32 ~2e-7, f64 ~4e-16)
  - run_sequence's scan graph (packed outputs, unroll=2) must agree with the
    sequential go_one_step path: every DISCRETE field exactly, floats to
    filter-tight tolerance (bitwise is not physical: XLA fuses the scan body
    differently from the standalone jit, and ~1-ulp differences amplify
    chaotically through the covariance feedback — observed 8e-10 on a
    diagnostic by frame 35 with identical decisions throughout)
  - the batch_pallas=True lane-vmapped kernel path must make the same
    per-lane decisions as batch-XLA and as single-stream replays of each
    lane (the 9993-fps batch64 bench claim, previously device-A/B only)

Fast-mode legs run in a subprocess with SCENELIB2_X64=0, like
test_fast_mode.py: fast mode requires x64 disabled at JAX init.

Decision surface being matched: monoslam.cpp:108-180 (GoOneStep stage
ordering), :187-254 (selection), :644-703 (deletion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.pallas]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fields compared exactly between pipelines (per frame); float diagnostics
# (sel_h/sel_S/sel_z/par_h/par_sinv, speed) are compared with tolerance
DECISION_FIELDS = (
    "n_visible", "n_selected", "n_matched", "n_active", "n_partial",
    "did_init", "did_convert", "n_overflow",
)

_FAST_RUNNER = r"""
import os, json, sys
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/scenelib2_test_cache_f32')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
except Exception:
    pass
import numpy as np
from scenelib2_tpu.eval.benchmark import _dataset
from scenelib2_tpu.runtime.slam import MonoSLAM

spec = json.loads(sys.argv[1])
params = None
if spec.get('hires'):
    from scenelib2_tpu.config import Params
    params = Params(cam_width=640, cam_height=480, cam_fku=390.0,
                    cam_fkv=390.0, cam_u0=324.0, cam_v0=250.0,
                    max_features=60, search_win_radius=48,
                    particle_win_radius=52, n_particles=200)
frames, cfg, _ = _dataset(spec['n_frames'], seed=spec.get('seed', 7),
                          params=params, tag=spec['tag'])
slam = MonoSLAM(cfg, use_pallas=True, **spec['overrides'])
outs = slam.run_sequence(frames[1:])        # the benched artifact: packed scan
rec = {k: np.asarray(getattr(outs, k)).astype(int).tolist()
       for k in %r}
rec['r'] = np.asarray(outs.r, np.float64).tolist()
rec['sel_mask'] = np.asarray(outs.sel_mask).astype(int).tolist()
rec['sel_matched'] = np.asarray(outs.sel_matched).astype(int).tolist()
rec['sel_slot'] = np.asarray(outs.sel_slot).astype(int).tolist()
rec['final_labels'] = sorted(
    int(l) for l, a in zip(np.asarray(slam.state.label),
                           np.asarray(slam.state.active)) if a)
print('RESULT ' + json.dumps(rec))
""" % (DECISION_FIELDS,)


def _run_fast(spec: dict, timeout: int = 570) -> dict:
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", _FAST_RUNNER, json.dumps(spec)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def _run_f64(cfg, frames, overrides):
    from scenelib2_tpu.runtime.slam import MonoSLAM

    slam = MonoSLAM(cfg, **overrides)
    outs = slam.run_sequence(frames[1:])
    return slam, outs


def _ref_replay(cfg, frames):
    from tests import refslam

    if refslam.build_lib() is None:
        return None
    ref = refslam.RefSlam(cfg)
    rows = []
    for i in range(1, len(frames)):
        ref.go_one_step(frames[i], True, True)
        rows.append((ref.n_matched, ref.n_features, ref.n_partial, ref.xv))
    return ref, rows


def _assert_fast_matches(fast: dict, outs, n_frames: int):
    """Frame-by-frame decision equality of the f32 record vs f64 outputs."""
    for k in DECISION_FIELDS:
        a = np.asarray(fast[k])
        b = np.asarray(getattr(outs, k)).astype(int)
        bad = np.nonzero(a != b)[0]
        assert len(bad) == 0, (k, bad[:10], a[bad[:10]], b[bad[:10]])
    # selection identity: the same SET of slots picked and the same set
    # matched every frame (slot ids are garbage where !sel_mask — mask them).
    # Rank order within a frame is precision-dependent for near-tied scores
    # (e.g. the first frame, where all known features carry identical zero
    # covariance) and is not consumed downstream: the reference measures the
    # selected set jointly (monoslam.cpp:187-254), so set equality IS the
    # decision.
    BIG = 10 ** 6
    m32 = np.asarray(fast["sel_mask"], bool)
    m64 = np.asarray(outs.sel_mask)
    assert np.array_equal(m32, m64)
    s32 = np.where(m32, np.asarray(fast["sel_slot"]), BIG)
    s64 = np.where(m64, np.asarray(outs.sel_slot), BIG)
    assert np.array_equal(np.sort(s32, axis=1), np.sort(s64, axis=1))
    ok32 = np.where(np.asarray(fast["sel_matched"], bool) & m32, s32, BIG)
    ok64 = np.where(np.asarray(outs.sel_matched) & m64, s64, BIG)
    assert np.array_equal(np.sort(ok32, axis=1), np.sort(ok64, axis=1))
    assert len(fast["n_matched"]) == n_frames - 1


def test_fast_std_decision_parity_vs_f64_and_reference():
    """Full 239-frame std workload (the headline bench config): f32+Pallas
    decisions == f64 decisions == compiled reference decisions, trajectory
    RMSE within the north-star bound."""
    from scenelib2_tpu.eval.benchmark import _dataset

    frames, cfg, _ = _dataset(240)
    fast = _run_fast(dict(n_frames=240, tag="std",
                          overrides=dict(max_features=16)))
    slam, outs = _run_f64(cfg, frames, dict(max_features=16))
    _assert_fast_matches(fast, outs, 240)

    # the workload must be the real thing: mapping active, conversions fired
    assert sum(fast["did_init"]) >= 10, sum(fast["did_init"])
    assert sum(fast["did_convert"]) >= 5, sum(fast["did_convert"])
    assert sum(fast["n_matched"]) >= 1000

    rep = _ref_replay(cfg, frames)
    if rep is None:
        pytest.skip("librefslam.so unavailable")
    ref, rows = rep
    nm64 = np.asarray(outs.n_matched).astype(int)
    na64 = np.asarray(outs.n_active).astype(int)
    np64 = np.asarray(outs.n_partial).astype(int)
    for i, (m, nf, npart, _xv) in enumerate(rows):
        assert (m, nf, npart) == (nm64[i], na64[i], np64[i]), i
    ref_traj = np.stack([xv[:3] for *_ignored, xv in rows])
    r32 = np.asarray(fast["r"])
    r64 = np.asarray(outs.r)
    rmse32 = np.sqrt(np.mean(np.sum((r32 - ref_traj) ** 2, axis=1)))
    rmse64 = np.sqrt(np.mean(np.sum((r64 - ref_traj) ** 2, axis=1)))
    assert rmse64 <= 1e-10, rmse64
    assert rmse32 <= 1e-3, rmse32          # north-star bound
    assert rmse32 <= 1e-5, rmse32          # observed ~2e-7: alert on 100x drift
    assert set(fast["final_labels"]) == {f["label"] for f in ref.features()}


def test_fast_hires_decision_parity_vs_f64_and_reference():
    """640x480/60-feature bench config through the FUSED tiled fast path
    (D=373 -> TD=384 megakernels as of round 5; was the split path)."""
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.eval.benchmark import _dataset

    p = Params(cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
               cam_u0=324.0, cam_v0=250.0, max_features=60,
               search_win_radius=48, particle_win_radius=52, n_particles=200)
    frames, cfg, _ = _dataset(120, params=p, tag="hires")
    overrides = dict(max_features=60, search_win_radius=48,
                     particle_win_radius=52)
    fast = _run_fast(dict(n_frames=120, tag="hires", hires=True,
                          overrides=overrides))
    slam, outs = _run_f64(cfg, frames, overrides)
    _assert_fast_matches(fast, outs, 120)
    assert sum(fast["did_init"]) >= 5

    rep = _ref_replay(cfg, frames)
    if rep is None:
        pytest.skip("librefslam.so unavailable")
    ref, rows = rep
    nm64 = np.asarray(outs.n_matched).astype(int)
    na64 = np.asarray(outs.n_active).astype(int)
    np64 = np.asarray(outs.n_partial).astype(int)
    for i, (m, nf, npart, _xv) in enumerate(rows):
        assert (m, nf, npart) == (nm64[i], na64[i], np64[i]), i
    ref_traj = np.stack([xv[:3] for *_ignored, xv in rows])
    rmse32 = np.sqrt(np.mean(np.sum((np.asarray(fast["r"]) - ref_traj) ** 2,
                                    axis=1)))
    assert rmse32 <= 1e-3, rmse32


def test_fast_long_horizon_600_frames():
    """>=600 frames once: bounds long-horizon f32 drift (decisions must stay
    identical to f64 for the whole run; trajectory drift vs f64 bounded)."""
    from scenelib2_tpu.eval.benchmark import _dataset

    frames, cfg, _ = _dataset(600, tag="std")
    fast = _run_fast(dict(n_frames=600, tag="std",
                          overrides=dict(max_features=16)))
    slam, outs = _run_f64(cfg, frames, dict(max_features=16))
    _assert_fast_matches(fast, outs, 600)
    drift = np.linalg.norm(
        np.asarray(fast["r"]) - np.asarray(outs.r), axis=1
    )
    assert drift.max() <= 1e-3, drift.max()   # worst-frame f32 drift bound

    rep = _ref_replay(cfg, frames)
    if rep is None:
        pytest.skip("librefslam.so unavailable")
    _ref, rows = rep
    nm64 = np.asarray(outs.n_matched).astype(int)
    for i, (m, _nf, _np, _xv) in enumerate(rows):
        assert m == nm64[i], i


def test_scan_path_matches_sequential_steps():
    """run_sequence's packed scan (unroll=2) and the chunked variant must
    reproduce the sequential go_one_step path: discrete outputs exactly,
    floats to filter-tight tolerance, final filter state equivalent
    (VERDICT r3 item 2a). f64, in-process."""
    import jax.numpy as jnp

    from scenelib2_tpu.eval.benchmark import _dataset
    from scenelib2_tpu.runtime import step as step_mod
    from scenelib2_tpu.runtime.slam import MonoSLAM

    frames, cfg, _ = _dataset(41, tag="scan41")
    T = 40

    s_seq = MonoSLAM(cfg, max_features=16)
    seq_outs = []
    for i in range(1, T + 1):
        s_seq.go_one_step(frames[i])
        seq_outs.append(s_seq.last_output)
    stacked = jax.tree_util.tree_map(
        lambda *a: np.stack([np.asarray(x) for x in a]), *seq_outs
    )

    def check(outs, state, label):
        for k in DECISION_FIELDS + ("sel_mask", "sel_matched", "par_mask",
                                    "par_alive"):
            a = np.asarray(getattr(stacked, k))
            b = np.asarray(getattr(outs, k))
            assert np.array_equal(a, b), (label, k)
        m = np.asarray(stacked.sel_mask)
        assert np.array_equal(
            np.where(m, np.asarray(stacked.sel_slot), -1),
            np.where(m, np.asarray(outs.sel_slot), -1),
        ), label
        np.testing.assert_allclose(np.asarray(outs.r), np.asarray(stacked.r),
                                   atol=1e-9, err_msg=label)
        np.testing.assert_allclose(np.asarray(outs.xv), np.asarray(stacked.xv),
                                   atol=1e-9, err_msg=label)
        # final filter state: discrete leaves exact, x/P filter-tight
        for k in ("active", "full", "label", "attempts", "successes", "rng"):
            assert np.array_equal(np.asarray(getattr(s_seq.state, k)),
                                  np.asarray(getattr(state, k))), (label, k)
        np.testing.assert_allclose(np.asarray(state.x),
                                   np.asarray(s_seq.state.x),
                                   atol=1e-9, err_msg=label)
        np.testing.assert_allclose(np.asarray(state.P),
                                   np.asarray(s_seq.state.P),
                                   atol=1e-9, err_msg=label)

    s_scan = MonoSLAM(cfg, max_features=16)
    outs_scan = s_scan.run_sequence(frames[1 : T + 1])
    check(outs_scan, s_scan.state, "scan")

    # chunked: 2 full compiled chunks + 8 frames through the single-step jit
    s_chunk = MonoSLAM(cfg, max_features=16)
    outs_chunk = s_chunk.run_sequence(frames[1 : T + 1], chunk=16)
    check(outs_chunk, s_chunk.state, "chunk16")


def test_batch_pallas_matches_batch_xla_and_single_stream():
    """batch_pallas=True (the 9993-fps batch64 kernel path, interpret mode
    here) must make identical per-lane decisions to batch-XLA and to
    single-stream replays, on >=8 genuinely divergent lanes
    (VERDICT r3 item 2b). All f32, one subprocess."""
    script = r"""
import os, json
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/scenelib2_test_cache_f32')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
except Exception:
    pass
import dataclasses, tempfile
import numpy as np
import jax.numpy as jnp
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.config import load_config
from scenelib2_tpu.rng import pack_state, srand48
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod

LANES, T = 8, 13
# lane k sees its own scene texture AND a (k%2)-frame trajectory phase
# offset (the bench_batch64 recipe, eval/benchmark.py:174-179): with only
# 8 frames all lanes sat in the pre-init lockstep regime — init gates open
# around frame 7, so divergence needs the horizon to reach past it.
lane_frames, lane_cfgs = [], []
for k in range(LANES):
    d = tempfile.mkdtemp(prefix='bp%d_' % k)
    frames, rs, qs, cfg_path = synthetic.generate_dataset(
        d, n_frames=T + 2, seed=31 + k)
    lane_frames.append(frames[(k % 2):])
    lane_cfgs.append(load_config(cfg_path))

base = dataclasses.replace(lane_cfgs[0].params, max_features=12)
variants = dict(
    single=dataclasses.replace(base, batch_mode=False, use_pallas=True),
    batch_xla=dataclasses.replace(base, batch_mode=True, use_pallas=False),
    batch_pallas=dataclasses.replace(base, batch_mode=True, use_pallas=True,
                                     batch_pallas=True),
)

def build(cfg, params, seed):
    s = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s = st.add_known_feature(s, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    return s._replace(rng=jnp.asarray(pack_state(srand48(seed))))

FIELDS = ('n_matched', 'n_active', 'n_partial', 'did_init', 'did_convert')
results = {}

params = variants['single']
step1 = jax.jit(step_mod.make_step(params))
dec = []
for k in range(LANES):
    s = build(lane_cfgs[k], params, seed=k)
    lane = []
    for t in range(1, T + 1):
        s, o = step1(s, jnp.asarray(lane_frames[k][t], jnp.uint8), True)
        lane.append([int(np.asarray(getattr(o, f))) for f in FIELDS])
    dec.append(lane)
results['single'] = dec

for name in ('batch_xla', 'batch_pallas'):
    params = variants[name]
    vstep = jax.jit(jax.vmap(step_mod.make_step(params), in_axes=(0, 0, None)))
    states = [build(lane_cfgs[k], params, seed=k) for k in range(LANES)]
    sb = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *states)
    dec = [[] for _ in range(LANES)]
    for t in range(1, T + 1):
        fb = jnp.stack([jnp.asarray(lane_frames[k][t], jnp.uint8)
                        for k in range(LANES)])
        sb, ob = vstep(sb, fb, True)
        for k in range(LANES):
            dec[k].append([int(np.asarray(getattr(ob, f))[k]) for f in FIELDS])
    results[name] = dec

print('RESULT ' + json.dumps(results))
"""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=570, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    assert res["single"] == res["batch_xla"], "batch-XLA diverged"
    assert res["single"] == res["batch_pallas"], "batch-Pallas diverged"
    # the lanes must be genuinely divergent for the equality to mean anything
    assert len({json.dumps(lane) for lane in res["single"]}) >= 4
