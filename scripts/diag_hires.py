"""Diagnose the hires 640x480 config on CPU: why does the map shrink?

Tracks per-frame n_active / n_matched / init / convert counters and the
visibility gates so the dataset or window parameters can be tuned.
"""

from __future__ import annotations

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("SCENELIB2_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scenelib2_tpu import MonoSLAM  # noqa: E402
from scenelib2_tpu.config import Params  # noqa: E402
from scenelib2_tpu.eval.synthetic import generate_dataset  # noqa: E402


def main():
    n_frames = int(os.environ.get("FRAMES", "60"))
    p = Params(
        cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
        cam_u0=324.0, cam_v0=250.0, max_features=60,
        search_win_radius=48, particle_win_radius=52, n_particles=200,
    )
    from scenelib2_tpu.eval.synthetic import DATASET_VERSION

    cache = os.path.join(
        tempfile.gettempdir(), f"scenelib2_diag_hires_v{DATASET_VERSION}_{n_frames}"
    )
    fr = os.path.join(cache, "frames.npy")
    if not os.path.exists(fr):
        os.makedirs(cache, exist_ok=True)
        frames, rs, qs, cfg = generate_dataset(cache, n_frames=n_frames, params=p)
        np.save(fr, frames)
    frames = np.load(fr)
    cfg = os.path.join(cache, "synthetic.cfg")

    slam = MonoSLAM(cfg, max_features=60)
    for i, f in enumerate(frames[1:]):
        slam.go_one_step(f)
        o = slam.last_output
        s = slam.state
        # particle stats of the first live partial slot, if any
        part = np.asarray(s.active & ~s.full)
        pinfo = ""
        if part.any():
            j = int(np.nonzero(part)[0][0])
            alive = np.asarray(s.palive[j])
            prob = np.asarray(s.prob[j])
            lam = np.asarray(s.lam[j])
            n_alive = int(alive.sum())
            if n_alive and prob[alive].sum() > 0:
                w = prob[alive] / prob[alive].sum()
                mu = float((lam[alive] * w).sum())
                sd = float(np.sqrt(max(((lam[alive] - mu) ** 2 * w).sum(), 0.0)))
                pinfo = (f" | part slot {j}: n={n_alive} lam={mu:.2f}+-{sd:.2f} "
                         f"ratio={sd/max(mu,1e-9):.3f} att={int(s.match_attempts[j])}")
        print(
            f"frame {i:3d}: active={int(o.n_active)} matched={int(o.n_matched)} "
            f"visible={int(o.n_visible)} init={int(o.did_init)} conv={int(o.did_convert)} "
            f"overflow={int(o.n_overflow)}{pinfo}"
        )
    tbl = slam.feature_table()
    print(f"final map: {len(tbl)} features")
    for row in tbl:
        print(f"  slot {row['slot']} label {row['label']} full={row['fully_initialised']} "
              f"att={row['attempts']} succ={row['successes']}")


if __name__ == "__main__":
    main()
