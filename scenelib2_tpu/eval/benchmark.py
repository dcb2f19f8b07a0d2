"""Benchmark harness covering the five BASELINE.json configs.

  1. testseq   — TestSeqMonoSLAM-style 320x240 with known features (CPU-ref
                 config), mapping on: frames/sec via the lax.scan path
  2. autoinit  — same sequence, full auto-init + particle depth filtering
                 (mapping exercised from a 4-feature start)
  3. hires     — 640x480, larger map (60-feature capacity)
  4. batch64   — vmap over 64 independent sequences (datagen throughput)
  5. stress500 — 500-feature map: dense-covariance EKF predict+update
                 latency fully on device (~3k-dim state)

Each returns {"metric", "value", "unit", plus details}. `run_all` prints one
JSON line per config.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def _stage(frames):
    """Pre-stage a frame stack on the device: offline-replay throughput
    measures compute, not the tunnel upload (bench.py does the same)."""
    import jax
    import jax.numpy as jnp

    staged = jax.device_put(jnp.asarray(frames, jnp.uint8))
    jax.block_until_ready(staged)
    return staged


def _fast_mode() -> bool:
    return os.environ.get("SCENELIB2_X64", "1") == "0"


def _dataset(n_frames: int, seed: int = 7, params=None, tag: str = "std"):
    from scenelib2_tpu.eval.synthetic import DATASET_VERSION, generate_dataset

    cache = os.path.join(
        tempfile.gettempdir(), f"scenelib2_ds_v{DATASET_VERSION}_{tag}_{n_frames}_{seed}"
    )
    fr = os.path.join(cache, "frames.npy")
    if not os.path.exists(fr):
        os.makedirs(cache, exist_ok=True)
        frames, rs, qs, cfg = generate_dataset(cache, n_frames=n_frames, seed=seed, params=params)
        np.save(fr, frames)
    frames = np.load(fr)
    return frames, os.path.join(cache, "synthetic.cfg"), cache


def bench_testseq(n_frames: int = 240, warmup: int = 8):
    import jax

    from scenelib2_tpu import MonoSLAM

    frames, cfg, _ = _dataset(n_frames)
    slam = MonoSLAM(cfg, max_features=16, use_pallas=_fast_mode())
    rest = _stage(frames[1:])
    outs = slam.run_sequence(rest)  # compile (same shape as the timed run)
    jax.block_until_ready(outs.r)
    dt = float("inf")
    for _ in range(3):
        slam.reset()
        t0 = time.perf_counter()
        outs = slam.run_sequence(rest)
        jax.block_until_ready(outs.r)
        dt = min(dt, time.perf_counter() - t0)
    matched = float(np.asarray(outs.n_matched).mean())
    return dict(
        metric="fps_testseq_320x240",
        value=round(len(rest) / dt, 2),
        unit="frames/sec",
        mean_matched=round(matched, 2),
        frames=len(rest),
    )


def bench_autoinit(n_frames: int = 240, warmup: int = 8):
    """Same as testseq but reported separately with init/convert counts."""
    import jax

    from scenelib2_tpu import MonoSLAM

    frames, cfg, _ = _dataset(n_frames)
    slam = MonoSLAM(cfg, max_features=24, use_pallas=_fast_mode())
    rest = _stage(frames[1:])
    outs = slam.run_sequence(rest)
    jax.block_until_ready(outs.r)
    dt = float("inf")
    for _ in range(3):
        slam.reset()
        t0 = time.perf_counter()
        outs = slam.run_sequence(rest)
        jax.block_until_ready(outs.r)
        dt = min(dt, time.perf_counter() - t0)
    return dict(
        metric="fps_autoinit_320x240",
        value=round(len(rest) / dt, 2),
        unit="frames/sec",
        inits=int(np.asarray(outs.did_init).sum()),
        conversions=int(np.asarray(outs.did_convert).sum()),
        final_map=int(np.asarray(outs.n_active)[-1]),
    )


def bench_hires(n_frames: int = 120, warmup: int = 8):
    from scenelib2_tpu.config import Params

    import jax

    from scenelib2_tpu import MonoSLAM

    # window caps scale with resolution (pixels per radian doubles)
    p = Params(
        cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
        cam_u0=324.0, cam_v0=250.0, max_features=60,
        search_win_radius=48, particle_win_radius=52, n_particles=200,
    )
    frames, cfg, _ = _dataset(n_frames, params=p, tag="hires")
    slam = MonoSLAM(cfg, max_features=60, use_pallas=_fast_mode())
    rest = _stage(frames[1:])
    outs = slam.run_sequence(rest)
    jax.block_until_ready(outs.r)
    dt = float("inf")
    for _ in range(2):
        slam.reset()
        t0 = time.perf_counter()
        outs = slam.run_sequence(rest)
        jax.block_until_ready(outs.r)
        dt = min(dt, time.perf_counter() - t0)
    return dict(
        metric="fps_640x480_60feat",
        value=round(len(rest) / dt, 2),
        unit="frames/sec",
        final_map=int(np.asarray(outs.n_active)[-1]),
    )


def bench_batch64(n_frames: int = 64, batch: int = 64, warmup: int = 4):
    """vmap over independent sequences: aggregate frames/sec."""
    import jax
    import jax.numpy as jnp

    from scenelib2_tpu.config import load_config
    from scenelib2_tpu.parallel import mesh as pmesh
    from scenelib2_tpu.runtime import state as st
    from scenelib2_tpu.runtime import step as step_mod
    from scenelib2_tpu.io.pgm import read_pgm

    frames, cfg_path, _ = _dataset(n_frames)
    cfg = load_config(cfg_path)
    params = __import__("dataclasses").replace(
        cfg.params, max_features=16, use_pallas=_fast_mode(), batch_mode=True
    )
    state = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        state = st.add_known_feature(state, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    states = pmesh.replicate_states(state, batch)
    fb = jnp.broadcast_to(jnp.asarray(frames[1:], jnp.uint8), (batch,) + frames[1:].shape)
    fb = jnp.swapaxes(fb, 0, 1)  # [T, B, H, W]

    step = step_mod.make_step(params)
    vstep = jax.vmap(step, in_axes=(0, 0, None))

    def scan_fn(s, fr):
        s, o = vstep(s, fr, True)
        return s, o.r

    run = jax.jit(lambda s, f: jax.lax.scan(scan_fn, s, f))
    s1, _ = run(states, fb)
    jax.block_until_ready(s1.x)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s2, rs = run(states, fb)
        jax.block_until_ready(rs)
        dt = min(dt, time.perf_counter() - t0)
    total_frames = fb.shape[0] * batch
    return dict(
        metric="fps_batch64_aggregate",
        value=round(total_frames / dt, 2),
        unit="frames/sec",
        batch=batch,
    )


def bench_stress500(n_steps: int = 50, n_feat: int = 500):
    """Dense-covariance EKF predict + 10-measurement joint update at a
    500-feature map (D = 13+6*500 = 3013), f64 fully on device."""
    import jax
    import jax.numpy as jnp

    from scenelib2_tpu.core import ekf

    D = 13 + 6 * n_feat
    rng = np.random.default_rng(0)
    A = rng.normal(size=(D, D)) * 0.01
    P = jnp.asarray(A @ A.T + np.eye(D))
    x = jnp.asarray(rng.normal(size=D))
    M = 20
    H = jnp.zeros((M, D)).at[:, 13 : 13 + M].set(jnp.eye(M))
    H = H.at[:, :13].set(jnp.asarray(rng.normal(size=(M, 13))))
    nu = jnp.asarray(rng.normal(size=M))
    R = jnp.eye(M)

    def step(x, P):
        x, P = ekf.predict(x, P, jnp.zeros(3), 1 / 30.0, 4.0, 6.0)
        x, P, _ = ekf.joint_update(x, P, H, nu * 0.01, R)
        P = ekf.symmetrize(P)
        return x, P

    run = jax.jit(lambda x, P, n: jax.lax.fori_loop(0, n, lambda i, c: step(*c), (x, P)))
    x1, P1 = run(x, P, 3)
    jax.block_until_ready(P1)
    t0 = time.perf_counter()
    x2, P2 = run(x1, P1, n_steps)
    jax.block_until_ready(P2)
    dt = time.perf_counter() - t0
    return dict(
        metric="ekf_predict_update_ms_500feat",
        value=round(dt / n_steps * 1000, 3),
        unit="ms/step",
        state_dim=D,
    )


def bench_ekf100(n_steps: int = 200):
    """EKF update latency at a 100-feature map (BASELINE.md reporting item)."""
    import jax
    import jax.numpy as jnp

    from scenelib2_tpu.core import ekf

    D = 13 + 6 * 100
    rng = np.random.default_rng(0)
    A = rng.normal(size=(D, D)) * 0.01
    P = jnp.asarray(A @ A.T + np.eye(D))
    x = jnp.asarray(rng.normal(size=D))
    M = 20
    H = jnp.zeros((M, D)).at[:, 13 : 13 + M].set(jnp.eye(M))
    nu = jnp.asarray(rng.normal(size=M))
    R = jnp.eye(M)

    run = jax.jit(
        lambda x, P, n: jax.lax.fori_loop(
            0, n, lambda i, c: ekf.joint_update(c[0], c[1], H, nu * 0.01, R)[:2], (x, P)
        )
    )
    x1, P1 = run(x, P, 3)
    jax.block_until_ready(P1)
    t0 = time.perf_counter()
    x2, P2 = run(x1, P1, n_steps)
    jax.block_until_ready(P2)
    dt = time.perf_counter() - t0
    return dict(
        metric="ekf_update_ms_100feat", value=round(dt / n_steps * 1000, 3), unit="ms/step",
        state_dim=D,
    )


ALL_BENCHES = {
    "testseq": bench_testseq,
    "autoinit": bench_autoinit,
    "hires": bench_hires,
    "batch64": bench_batch64,
    "ekf100": bench_ekf100,
    "stress500": bench_stress500,
}


def run_all(names=None):
    results = []
    for name, fn in ALL_BENCHES.items():
        if names and name not in names:
            continue
        r = fn()
        results.append(r)
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    import sys

    run_all(sys.argv[1:] or None)
