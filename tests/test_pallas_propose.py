"""Fused auto-init proposal kernel vs the XLA fast-mode chain.

pallas_propose_init must reproduce runtime/step._auto_initialise's proposal
pipeline (rollforward, future-point projection, safe box, occupancy
projections, drand48 draws, region tries, Shi-Tomasi pick) output-for-output
in f32: identical did_init / region box / rng stream / inserted slot state.
Runs in a subprocess with SCENELIB2_X64=0 like the other fast-mode guards.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.pallas]

_SCRIPT = r"""
import dataclasses, json, os
os.environ['SCENELIB2_X64'] = '0'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
import scenelib2_tpu
from scenelib2_tpu.config import Params
from scenelib2_tpu.core.camera import CameraParams
from scenelib2_tpu.eval import synthetic
from scenelib2_tpu.runtime import state as st, step as step_mod

params = Params(max_features=16)
cam = CameraParams.from_params(params)
lam0 = jnp.asarray(st.lambda_grid(params))
params_xla = dataclasses.replace(params, use_pallas=False)
params_pl = dataclasses.replace(params, use_pallas=True)

rngnp = np.random.default_rng(11)
tex = synthetic.make_texture(rngnp, size=1024)
scale = 0.6 / params.cam_fku

results = []
for case in range(6):
    rs, qs = synthetic.default_trajectory(4, params.delta_t)
    frame = synthetic.render_frame(params, tex, rs[2], qs[2], scale)
    xv0 = np.zeros(13)
    xv0[:3] = rs[2]
    xv0[3:7] = qs[2]
    xv0[7:10] = rngnp.normal(0, 0.3, 3)          # speed (gates ignored here)
    xv0[10:13] = rngnp.normal(0, 0.2, 3)
    pxx0 = np.eye(13) * 4e-4
    s0 = st.init_state(params, xv0, pxx0, seed=case)
    # scatter some full features (case 4: many, to force clashes)
    nfeat = (case % 3) + 2 if case != 4 else 10
    half = (params.boxsize - 1) // 2
    for k in range(nfeat):
        y = np.array([
            0.2 * rngnp.uniform(-1, 1), 0.15 * rngnp.uniform(-1, 1),
            rngnp.uniform(-0.1, 0.4),
        ])
        s0 = st.add_known_feature(
            s0, y, np.concatenate([rs[0], qs[0]]),
            (rngnp.integers(0, 255, (11, 11))).astype(np.uint8),
        )
    # advance the rng stream a case-dependent amount
    from scenelib2_tpu.rng import drand48_many
    if case:
        sts, _ = drand48_many(s0.rng, 2 * case)
        s0 = s0._replace(rng=sts[-1])
    want = jnp.asarray(case != 5)                 # case 5: want=False no-op

    outs = []
    for p in (params_pl, params_xla):
        st1, did, box = step_mod._auto_initialise(
            s0, jnp.asarray(frame, jnp.uint8), cam, p, lam0, want
        )
        outs.append((st1, did, box))
    (s_a, did_a, box_a), (s_b, did_b, box_b) = outs
    results.append(dict(
        case=case,
        did=[bool(did_a), bool(did_b)],
        box=[np.asarray(box_a).tolist(), np.asarray(box_b).tolist()],
        rng_eq=bool(np.array_equal(np.asarray(s_a.rng), np.asarray(s_b.rng))),
        x_eq=bool(np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))),
        P_eq=bool(np.array_equal(np.asarray(s_a.P), np.asarray(s_b.P))),
        active_eq=bool(np.array_equal(np.asarray(s_a.active), np.asarray(s_b.active))),
        prob_eq=bool(np.array_equal(np.asarray(s_a.prob), np.asarray(s_b.prob))),
        patches_eq=bool(np.array_equal(np.asarray(s_a.patches), np.asarray(s_b.patches))),
    ))
print(json.dumps(results))
"""


def test_propose_kernel_matches_xla_chain():
    env = dict(os.environ)
    env["SCENELIB2_X64"] = "0"
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        env=env, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    results = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(results) == 6
    any_init = False
    for r in results:
        assert r["did"][0] == r["did"][1], r
        assert r["box"][0] == r["box"][1], r
        assert r["rng_eq"] and r["x_eq"] and r["P_eq"], r
        assert r["active_eq"] and r["prob_eq"] and r["patches_eq"], r
        any_init |= r["did"][0]
    assert any_init, "no case exercised an actual insertion"
