"""Long-horizon + large-map f32 drift study (VERDICT r4 item 7).

Quantifies how far the f32+Pallas fast pipeline drifts from the f64 parity
pipeline over horizons far beyond the CI bounds (600 frames std in
tests/test_fast_parity.py), and at the hires operating point:

  std  : 2000 frames, 320x240, 16 slots
  hires:  360 frames, 640x480, 60 slots, 200 particles

For each leg it asserts frame-exact DECISION equality (the eight counters +
selected/matched slot sets, the same surface as the CI tests) and records
the camera-position divergence curve |r_f32 - r_f64| summarized per
250-frame window. Results are printed as a markdown table for
BENCH_SUITE.md and written to /tmp/scenelib2_drift_study.json.

Run on CPU (both pipelines deterministic there); the fast leg runs in a
subprocess with SCENELIB2_X64=0 exactly like the benched artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# force CPU for the f64 legs (the session env pins JAX_PLATFORMS=axon; the
# env var alone is also not enough once jax is imported — set the config too)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

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
outs = slam.run_sequence(frames[1:])
rec = {k: np.asarray(getattr(outs, k)).astype(int).tolist()
       for k in %r}
rec['r'] = np.asarray(outs.r, np.float64).tolist()
rec['sel_mask'] = np.asarray(outs.sel_mask).astype(int).tolist()
rec['sel_matched'] = np.asarray(outs.sel_matched).astype(int).tolist()
rec['sel_slot'] = np.asarray(outs.sel_slot).astype(int).tolist()
print('RESULT ' + json.dumps(rec))
""" % (DECISION_FIELDS,)


def run_fast(spec: dict, timeout: int = 3000) -> dict:
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", _FAST_RUNNER, json.dumps(spec)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def run_f64(n_frames, tag, params, overrides):
    from scenelib2_tpu.eval.benchmark import _dataset
    from scenelib2_tpu.runtime.slam import MonoSLAM

    frames, cfg, _ = _dataset(n_frames, params=params, tag=tag)
    slam = MonoSLAM(cfg, **overrides)
    outs = slam.run_sequence(frames[1:])
    return outs


def check_decisions(fast, outs):
    bad_fields = []
    for k in DECISION_FIELDS:
        a = np.asarray(fast[k])
        b = np.asarray(getattr(outs, k)).astype(int)
        n_bad = int(np.sum(a != b))
        if n_bad:
            first = int(np.nonzero(a != b)[0][0])
            bad_fields.append((k, n_bad, first))
    BIG = 10 ** 6
    m32 = np.asarray(fast["sel_mask"], bool)
    m64 = np.asarray(outs.sel_mask)
    sel_ok = np.array_equal(m32, m64)
    if sel_ok:
        s32 = np.where(m32, np.asarray(fast["sel_slot"]), BIG)
        s64 = np.where(m64, np.asarray(outs.sel_slot), BIG)
        sel_ok = np.array_equal(np.sort(s32, axis=1), np.sort(s64, axis=1))
        ok32 = np.where(np.asarray(fast["sel_matched"], bool) & m32, s32, BIG)
        ok64 = np.where(np.asarray(outs.sel_matched) & m64, s64, BIG)
        sel_ok &= np.array_equal(np.sort(ok32, axis=1), np.sort(ok64, axis=1))
    return bad_fields, sel_ok


def drift_windows(fast, outs, win=250):
    d = np.linalg.norm(np.asarray(fast["r"]) - np.asarray(outs.r), axis=1)
    rows = []
    for s in range(0, len(d), win):
        seg = d[s : s + win]
        rows.append((s, min(s + win, len(d)), float(seg.max()),
                     float(np.median(seg))))
    return d, rows


def leg(name, n_frames, tag, hires=False, overrides=None):
    overrides = overrides or {}
    params = None
    if hires:
        from scenelib2_tpu.config import Params

        params = Params(
            cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
            cam_u0=324.0, cam_v0=250.0, max_features=60,
            search_win_radius=48, particle_win_radius=52, n_particles=200,
        )
    print(f"== {name}: {n_frames} frames ==", flush=True)
    fast = run_fast(dict(n_frames=n_frames, tag=tag, hires=hires,
                         overrides=overrides))
    outs = run_f64(n_frames, tag, params, overrides)
    bad, sel_ok = check_decisions(fast, outs)
    d, rows = drift_windows(fast, outs)
    print(f"decisions: {'IDENTICAL' if not bad and sel_ok else ('DIVERGED ' + repr(bad))}"
          f"  (selection sets {'ok' if sel_ok else 'MISMATCH'})", flush=True)
    print("| frames | max |r32-r64| (m) | median (m) |")
    print("|---|---|---|")
    for s, e, mx, md in rows:
        print(f"| {s}-{e} | {mx:.2e} | {md:.2e} |")
    print(f"whole-run max drift {d.max():.3e} m at frame {int(d.argmax())}",
          flush=True)
    return dict(name=name, n_frames=n_frames,
                decisions_identical=(not bad and sel_ok),
                bad_fields=[list(b) for b in bad],
                max_drift=float(d.max()), argmax=int(d.argmax()),
                windows=[list(r) for r in rows])


def main():
    results = [
        leg("std-2000", 2000, "std", overrides=dict(max_features=16)),
        leg("hires-360", 360, "hires", hires=True,
            overrides=dict(max_features=60)),
    ]
    with open("/tmp/scenelib2_drift_study.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote /tmp/scenelib2_drift_study.json")


if __name__ == "__main__":
    main()
