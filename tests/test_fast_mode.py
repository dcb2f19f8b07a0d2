"""Fast (f32) mode regression guard.

Runs a tiny end-to-end pipeline in a subprocess with SCENELIB2_X64=0 (the
mode the TPU benchmark uses) — catches x64-only constructs (uint64, int64
keys, f64-only ops) sneaking back into the step."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy end-to-end (full-suite/CI selection)


def test_fast_mode_pipeline_runs_and_tracks(tmp_path):
    script = r"""
import os, json, tempfile
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import scenelib2_tpu
from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st, step as step_mod
import jax.numpy as jnp

params = Params(cam_width=160, cam_height=120, cam_fku=98.0, cam_fkv=98.0,
                cam_u0=80.0, cam_v0=60.0, max_features=8, n_particles=16,
                n_features_to_select=4, n_features_to_keep_visible=4,
                min_particles=4)
rng = np.random.default_rng(3)
tex = synthetic.make_texture(rng, size=1024)
scale = 0.6 / params.cam_fku
rs, qs = synthetic.default_trajectory(8, params.delta_t)
frames = np.stack([synthetic.render_frame(params, tex, rs[i], qs[i], scale) for i in range(8)])

xv0 = np.zeros(13); xv0[:3] = rs[0]; xv0[3:7] = qs[0]; xv0[12] = 0.01
pxx0 = np.zeros((13,13))
for i in (0,1,2,7,8,9,10,11,12): pxx0[i,i] = 0.0004
s = st.init_state(params, xv0, pxx0)
half = (params.boxsize-1)//2
for y in [[0.08,0.05,0],[-0.08,0.05,0],[0.08,-0.05,0],[-0.08,-0.05,0]]:
    h = synthetic.project_point(params, np.asarray(y), rs[0], qs[0])
    uu, vv = int(round(h[0])), int(round(h[1]))
    s = st.add_known_feature(s, y, np.concatenate([rs[0], qs[0]]),
                             frames[0][vv-half:vv+half+1, uu-half:uu+half+1])
step = jax.jit(step_mod.make_step(params))
matched = []
for i in range(1, 8):
    s, o = step(s, jnp.asarray(frames[i]), True)
    matched.append(int(o.n_matched))
assert s.x.dtype == jnp.float32, s.x.dtype
err = float(np.linalg.norm(np.asarray(o.r, np.float64) - rs[7]))
print(json.dumps(dict(matched=matched, err=err, finite=bool(np.isfinite(np.asarray(s.x)).all()))))
"""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=570,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["finite"]
    assert min(res["matched"][:4]) >= 3, res
    assert res["err"] < 0.1, res


@pytest.mark.pallas
def test_fast_mode_pallas_pipeline_runs_and_tracks(tmp_path):
    """Same tiny pipeline with use_pallas=True (interpret mode on CPU):
    guards the fused predict+measure+select kernel path end-to-end,
    including the D>128 fallback gate (a 20-slot config must route through
    the split predict+measure path instead of asserting)."""
    script = r"""
import os, json
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import scenelib2_tpu
from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st, step as step_mod
import jax.numpy as jnp

def run(max_features, n_frames):
    params = Params(cam_width=160, cam_height=120, cam_fku=98.0, cam_fkv=98.0,
                    cam_u0=80.0, cam_v0=60.0, max_features=max_features,
                    n_particles=16, n_features_to_select=4,
                    n_features_to_keep_visible=4, min_particles=4,
                    use_pallas=True)
    rng = np.random.default_rng(3)
    tex = synthetic.make_texture(rng, size=1024)
    scale = 0.6 / params.cam_fku
    rs, qs = synthetic.default_trajectory(n_frames, params.delta_t)
    frames = np.stack([synthetic.render_frame(params, tex, rs[i], qs[i], scale)
                       for i in range(n_frames)])
    xv0 = np.zeros(13); xv0[:3] = rs[0]; xv0[3:7] = qs[0]; xv0[12] = 0.01
    pxx0 = np.zeros((13,13))
    for i in (0,1,2,7,8,9,10,11,12): pxx0[i,i] = 0.0004
    s = st.init_state(params, xv0, pxx0)
    half = (params.boxsize-1)//2
    for y in [[0.08,0.05,0],[-0.08,0.05,0],[0.08,-0.05,0],[-0.08,-0.05,0]]:
        h = synthetic.project_point(params, np.asarray(y), rs[0], qs[0])
        uu, vv = int(round(h[0])), int(round(h[1]))
        s = st.add_known_feature(s, y, np.concatenate([rs[0], qs[0]]),
                                 frames[0][vv-half:vv+half+1, uu-half:uu+half+1])
    step = jax.jit(step_mod.make_step(params))
    matched = []
    for i in range(1, n_frames):
        s, o = step(s, jnp.asarray(frames[i]), True)
        matched.append(int(o.n_matched))
    err = float(np.linalg.norm(np.asarray(o.r, np.float64) - rs[n_frames-1]))
    return dict(matched=matched, err=err,
                finite=bool(np.isfinite(np.asarray(s.x)).all()))

small = run(8, 5)                       # D=61: fused predict+measure+select
big = run(20, 2)                        # D=133: must fall back, not assert
print(json.dumps(dict(small=small, big=big)))
"""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=570,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["small"]["finite"] and res["big"]["finite"], res
    assert min(res["small"]["matched"]) >= 3, res
    assert res["small"]["err"] < 0.1, res
    assert min(res["big"]["matched"]) >= 3, res


@pytest.mark.pallas
def test_fast_mode_pallas_maxp2_runs(tmp_path):
    """max_features_to_init_at_once=2 on the fast f32+Pallas single-stream
    path: heavy() hands the non-fused search+bayes arm PADDED score maps
    (return_padded=not batch_mode), which must be declared via corr_padded —
    previously this asserted at trace time (advisor r4, step.py:1056)."""
    script = r"""
import os, json
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import scenelib2_tpu
from scenelib2_tpu.config import Params
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st, step as step_mod
import jax.numpy as jnp

params = Params(cam_width=160, cam_height=120, cam_fku=98.0, cam_fkv=98.0,
                cam_u0=80.0, cam_v0=60.0, max_features=8, n_particles=16,
                n_features_to_select=4, n_features_to_keep_visible=4,
                min_particles=4, use_pallas=True,
                max_features_to_init_at_once=2)
rng = np.random.default_rng(3)
tex = synthetic.make_texture(rng, size=1024)
scale = 0.6 / params.cam_fku
rs, qs = synthetic.default_trajectory(6, params.delta_t)
frames = np.stack([synthetic.render_frame(params, tex, rs[i], qs[i], scale)
                   for i in range(6)])
xv0 = np.zeros(13); xv0[:3] = rs[0]; xv0[3:7] = qs[0]; xv0[12] = 0.01
pxx0 = np.zeros((13,13))
for i in (0,1,2,7,8,9,10,11,12): pxx0[i,i] = 0.0004
s = st.init_state(params, xv0, pxx0)
half = (params.boxsize-1)//2
for y in [[0.08,0.05,0],[-0.08,0.05,0],[0.08,-0.05,0],[-0.08,-0.05,0]]:
    h = synthetic.project_point(params, np.asarray(y), rs[0], qs[0])
    uu, vv = int(round(h[0])), int(round(h[1]))
    s = st.add_known_feature(s, y, np.concatenate([rs[0], qs[0]]),
                             frames[0][vv-half:vv+half+1, uu-half:uu+half+1])
step = jax.jit(step_mod.make_step(params))
matched = []
for i in range(1, 6):
    s, o = step(s, jnp.asarray(frames[i]), True)
    matched.append(int(o.n_matched))
print(json.dumps(dict(matched=matched,
                      finite=bool(np.isfinite(np.asarray(s.x)).all()))))
"""
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=570,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["finite"], res
    assert min(res["matched"]) >= 3, res
