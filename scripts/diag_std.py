"""Diagnose the standard 320x240 config on CPU: map growth + matching."""

from __future__ import annotations

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("SCENELIB2_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scenelib2_tpu import MonoSLAM  # noqa: E402
from scenelib2_tpu.eval.synthetic import DATASET_VERSION, generate_dataset  # noqa: E402


def main():
    n_frames = int(os.environ.get("FRAMES", "120"))
    cache = os.path.join(tempfile.gettempdir(), f"scenelib2_diag_std_v{DATASET_VERSION}_{n_frames}")
    fr = os.path.join(cache, "frames.npy")
    if not os.path.exists(fr):
        os.makedirs(cache, exist_ok=True)
        frames, rs, qs, cfg = generate_dataset(cache, n_frames=n_frames)
        np.save(fr, frames)
    frames = np.load(fr)
    cfg = os.path.join(cache, "synthetic.cfg")
    gt = np.load(os.path.join(cache, "ground_truth.npz"))

    slam = MonoSLAM(cfg, max_features=16)
    for i, f in enumerate(frames[1:]):
        slam.go_one_step(f)
        o = slam.last_output
        if i % 5 == 0 or i > n_frames - 8:
            print(
                f"frame {i:3d}: active={int(o.n_active)} matched={int(o.n_matched)} "
                f"visible={int(o.n_visible)} partial={int(o.n_partial)} "
                f"init={int(o.did_init)} conv={int(o.did_convert)} "
                f"overflow={int(o.n_overflow)} speed={float(o.speed):.3f}"
            )
    traj = slam.trajectory()
    err = traj - gt["r"][1 : 1 + len(traj)]
    print(f"traj RMSE vs ground truth: {np.sqrt((err**2).mean()):.4e}")
    tbl = slam.feature_table()
    print(f"final map: {len(tbl)} features")
    for row in tbl:
        print(f"  slot {row['slot']} label {row['label']} full={row['fully_initialised']} "
              f"att={row['attempts']} succ={row['successes']}")


if __name__ == "__main__":
    main()
