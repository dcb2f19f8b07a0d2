"""Run the NumPy reference-semantics oracle on the hires dataset.

Decides whether partial features dying at 640x480 is an implementation
deviation (ours) or workload physics (the reference would do the same).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scenelib2_tpu.config import load_config
from scenelib2_tpu.eval.synthetic import DATASET_VERSION
from scenelib2_tpu.io.pgm import read_pgm
from tests.oracle_monoslam import Cam, Feat, OracleMonoSLAM


def main():
    n_frames = int(os.environ.get("FRAMES", "50"))
    cache = os.path.join(
        tempfile.gettempdir(), f"scenelib2_diag_hires_v{DATASET_VERSION}_100"
    )
    frames = np.load(os.path.join(cache, "frames.npy"))[: n_frames + 1]
    cfg = load_config(os.path.join(cache, "synthetic.cfg"))
    p = __import__("dataclasses").replace(
        cfg.params, max_features=60, search_win_radius=48, particle_win_radius=52
    )

    cam = Cam(p.cam_width, p.cam_height, p.cam_fku, p.cam_fkv, p.cam_u0, p.cam_v0,
              p.cam_kd1, p.cam_sd)
    oracle = OracleMonoSLAM(cam, p, cfg.xv0, cfg.pxx0, seed=0)
    for kf in cfg.known_features:
        oracle.feats.append(
            Feat(
                y=np.asarray(kf.y, float).copy(),
                pxy=np.zeros((13, 3)),
                pyy=np.zeros((3, 3)),
                cross=[np.zeros((3, 3)) for _ in range(len(oracle.feats))],
                patch=read_pgm(kf.patch_path).copy(),
                xp_org=np.asarray(kf.xp_org, float).copy(),
                label=oracle.next_label,
                fully=True,
            )
        )
        oracle.next_label += 1

    for i in range(1, n_frames + 1):
        stats = oracle.go_one_step(frames[i], True)
        pinfo = ""
        for pi in oracle.partials:
            keep = pi.prob > 0
            n = int(keep.sum())
            if n:
                w = pi.prob[keep] / pi.prob[keep].sum()
                lam = pi.lam[keep]
                mu = float((lam * w).sum())
                sd = float(np.sqrt(max(((lam - mu) ** 2 * w).sum(), 0)))
                pinfo += (f" | part lab{pi.feat.label}: n={n} lam={mu:.2f}+-{sd:.2f} "
                          f"att={pi.attempts}")
        nfull = sum(1 for f in oracle.feats if f.fully)
        print(f"frame {i:3d}: active={len(oracle.feats)} full={nfull} "
              f"matched={stats.get('n_matched', '?')}{pinfo}")


if __name__ == "__main__":
    main()
