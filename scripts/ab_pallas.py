"""A/B the fused Pallas search kernel vs the XLA windowed search, one process.

Builds two MonoSLAM instances (identical config, use_pallas on/off), warms
both full-sequence scans, then times interleaved replays so tunnel jitter
hits both arms equally. Also cross-checks trajectories/decisions agree.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SCENELIB2_X64", "0")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.scenelib2_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import scenelib2_tpu  # noqa: F401
from scenelib2_tpu import MonoSLAM
from scenelib2_tpu.eval.synthetic import DATASET_VERSION, generate_dataset


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "240"))
    cache = os.path.join(
        tempfile.gettempdir(), f"scenelib2_bench_v{DATASET_VERSION}_{n_frames}"
    )
    if not os.path.exists(os.path.join(cache, "frames.npy")):
        os.makedirs(cache, exist_ok=True)
        frames, rs, qs, cfg = generate_dataset(cache, n_frames=n_frames)
        np.save(os.path.join(cache, "frames.npy"), frames)
    else:
        frames = np.load(os.path.join(cache, "frames.npy"))
        cfg = os.path.join(cache, "synthetic.cfg")

    seq = jax.device_put(jnp.asarray(frames[1:], jnp.uint8))
    jax.block_until_ready(seq)

    arms = {}
    for name, flag in [("xla", False), ("pallas", True)]:
        t0 = time.perf_counter()
        slam = MonoSLAM(cfg, max_features=16, use_pallas=flag)
        outs = slam.run_sequence(seq, enable_mapping=True, chunk=0)
        jax.block_until_ready(outs.r)
        print(f"# {name}: compile+first run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        arms[name] = slam

    # decision/trajectory cross-check
    res = {}
    for name, slam in arms.items():
        slam.reset()
        outs = slam.run_sequence(seq, enable_mapping=True, chunk=0)
        jax.block_until_ready(outs.r)
        res[name] = (np.asarray(outs.r), np.asarray(outs.n_matched), np.asarray(outs.n_active))
    rmse = float(np.sqrt(np.mean((res["xla"][0] - res["pallas"][0]) ** 2)))
    match_agree = float(np.mean(res["xla"][1] == res["pallas"][1]))
    active_agree = float(np.mean(res["xla"][2] == res["pallas"][2]))
    print(f"# traj RMSE pallas-vs-xla: {rmse:.3e}; n_matched agree {match_agree:.3f}; "
          f"n_active agree {active_agree:.3f}", file=sys.stderr)

    reps = int(os.environ.get("BENCH_REPEATS", "5"))
    best = {k: float("inf") for k in arms}
    times = {k: [] for k in arms}
    for _ in range(reps):
        for name, slam in arms.items():
            slam.reset()
            t0 = time.perf_counter()
            outs = slam.run_sequence(seq, enable_mapping=True, chunk=0)
            jax.block_until_ready(outs.r)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            best[name] = min(best[name], dt)
    n = len(seq)
    for name in arms:
        ts = ", ".join(f"{t*1000:.0f}" for t in times[name])
        print(f"{name}: best {best[name]*1000:.1f} ms ({n/best[name]:.0f} fps)  runs[ms]: {ts}")
    print(f"speedup pallas vs xla (best/best): {best['xla']/best['pallas']:.3f}x")


if __name__ == "__main__":
    main()
