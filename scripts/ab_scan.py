"""A/B scan measurement on the current device (the round-4 methodology).

Prints, for the benched fast-mode scan artifact (bench.py's exact graph):
  (a) the decisions fingerprint — matched_sum / inits / conversions /
      active_end — which must be IDENTICAL across any accepted perf change,
  (b) best-of-N wall time for one compiled replay,
  (c) the xplane device module time (the tunnel-jitter-free metric).

Run on a QUIET device: the axon tunnel serializes clients, so never run two
TPU processes at once (see BENCH_SUITE.md methodology notes).

Env: FRAMES (default 240), REPEATS (default 20), CONFIG (std | hires —
hires is the 640x480 / 60-slot / D=373 operating point of bench_hires),
SCENELIB2_* flags pass through to the package (e.g.
SCENELIB2_FORCE_BRANCHES for the cond-boundary ablation).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("SCENELIB2_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.scenelib2_jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

import scenelib2_tpu  # noqa: F401,E402
from scenelib2_tpu import MonoSLAM  # noqa: E402
from scenelib2_tpu.eval.synthetic import DATASET_VERSION, generate_dataset  # noqa: E402


def main():
    conf = os.environ.get("CONFIG", "std")
    if conf == "hires":
        from scenelib2_tpu.config import Params
        from scenelib2_tpu.eval.benchmark import _dataset

        n_frames = int(os.environ.get("FRAMES", "120"))
        p = Params(
            cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
            cam_u0=324.0, cam_v0=250.0, max_features=60,
            search_win_radius=48, particle_win_radius=52, n_particles=200,
        )
        frames, cfg, _ = _dataset(n_frames, params=p, tag="hires")
        max_features = 60
    else:
        n_frames = int(os.environ.get("FRAMES", "240"))
        cache = os.path.join(
            tempfile.gettempdir(), f"scenelib2_bench_v{DATASET_VERSION}_{n_frames}"
        )
        if not os.path.exists(os.path.join(cache, "frames.npy")):
            os.makedirs(cache, exist_ok=True)
            frames, _rs, _qs, _ = generate_dataset(cache, n_frames=n_frames)
            np.save(os.path.join(cache, "frames.npy"), frames)
        else:
            frames = np.load(os.path.join(cache, "frames.npy"))
        cfg = os.path.join(cache, "synthetic.cfg")
        max_features = 16

    slam = MonoSLAM(cfg, max_features=max_features, use_pallas=True)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    seq = jax.device_put(jnp.asarray(frames[1:], jnp.uint8))
    jax.block_until_ready(seq)

    t0 = time.perf_counter()
    slam.run_sequence(seq, enable_mapping=True, chunk=0)
    print(f"# compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    slam.reset()
    s0 = slam.state
    em = jnp.asarray(True)
    times = []
    flat = None
    for _ in range(int(os.environ.get("REPEATS", "20"))):
        t0 = time.perf_counter()
        _s1, flat = slam._scan(s0, seq, em)
        np.asarray(flat[-1][0])  # scalar fetch-sync
        times.append(time.perf_counter() - t0)

    from scenelib2_tpu.runtime import step as step_mod

    outs = step_mod.unpack_outputs(
        flat, slam.params.n_features_to_select,
        max(1, slam.params.max_features_to_init_at_once), slam.params.n_particles,
    )
    fp = dict(
        matched_sum=int(np.asarray(outs.n_matched).sum()),
        inits=int(np.asarray(outs.did_init).sum()),
        convs=int(np.asarray(outs.did_convert).sum()),
        active_end=int(np.asarray(outs.n_active)[-1]),
    )
    print(f"FINGERPRINT {fp}")
    wall_ms = min(times) * 1000
    print(
        f"WALL best-of-{len(times)} {wall_ms:.1f} ms "
        f"(median {np.median(times)*1000:.1f}) -> "
        f"{len(seq)/min(times):.0f} fps"
    )

    import bench

    dev_ms = bench._device_time_ms(slam, seq)
    if dev_ms is not None:
        print(
            f"DEVICE {dev_ms:.2f} ms total, {dev_ms/len(seq)*1000:.1f} us/frame"
        )


if __name__ == "__main__":
    main()
