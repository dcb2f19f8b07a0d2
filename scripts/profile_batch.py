"""Ablation timing of the batch64 (vmapped) step on the current device.

The round-2 verdict flagged batch64 at 894 aggregate fps (~71 ms per
64-lane scan iteration) vs 0.183 ms single-stream — a ~390x per-lane
penalty. This script times the vmapped scan under component toggles to
attribute that cost. One scene replicated across lanes (decisions
near-lockstep) — fine for HLO time attribution since under vmap both cond
branches execute for all lanes regardless of divergence.

Usage: python scripts/profile_batch.py [batch] [frames]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SCENELIB2_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.scenelib2_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import scenelib2_tpu  # noqa: F401
from scenelib2_tpu.config import load_config
from scenelib2_tpu.eval.benchmark import _dataset, _sync
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.rng import pack_state, srand48
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def build_states(params, cfg, batch):
    s = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s = st.add_known_feature(s, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    states = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), s
    )
    return states._replace(
        rng=jnp.asarray(np.stack([pack_state(srand48(i)) for i in range(batch)]))
    )


def timeit(name, params, cfg, fb, mapping=True):
    states = build_states(params, cfg, BATCH)
    step = step_mod.make_step(params)
    vstep = jax.vmap(step, in_axes=(0, 0, None))

    def scan_fn(s, fr):
        s, o = vstep(s, fr, mapping)
        return s, (o.n_matched, o.n_active)

    run = jax.jit(lambda s, f: jax.lax.scan(scan_fn, s, f))
    t0 = time.perf_counter()
    s1, _ = run(states, fb)
    _sync(s1.x)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s2, (nm, na) = run(states, fb)
        _sync(s2.x)
        best = min(best, time.perf_counter() - t0)
    per_it = best / FRAMES * 1000
    agg = BATCH * FRAMES / best
    print(
        f"{name:34s} {per_it:8.2f} ms/64-frame-it  {agg:9.0f} agg fps   "
        f"matched={float(np.asarray(nm).mean()):.2f} map={int(np.asarray(na)[-1].max())} "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_it


def trace_top_ops(params, cfg, fb, mapping=True, top=30):
    """Capture an xplane trace of one replay and print the hottest HLO ops."""
    import glob
    from collections import defaultdict

    states = build_states(params, cfg, BATCH)
    step = step_mod.make_step(params)
    vstep = jax.vmap(step, in_axes=(0, 0, None))

    def scan_fn(s, fr):
        s, o = vstep(s, fr, mapping)
        return s, (o.n_matched, o.n_active)

    run = jax.jit(lambda s, f: jax.lax.scan(scan_fn, s, f))
    s1, _ = run(states, fb)
    _sync(s1.x)
    out_dir = "/tmp/scenelib2_batch_profile"
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    s2, _ = run(states, fb)
    _sync(s2.x)
    jax.profiler.stop_trace()
    files = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9
                counts[name] += 1
            if not totals:
                continue
            print(
                f"\n== plane: {plane.name} | line: {line.name or line.id} "
                f"(total {sum(totals.values()):.2f} ms) =="
            )
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {ms:8.3f} ms  x{counts[name]:<5d} {name[:110]}")


def main():
    frames, cfg_path, _ = _dataset(FRAMES + 1, seed=7)
    cfg = load_config(cfg_path)
    fb = jnp.broadcast_to(
        jnp.asarray(frames[1 : FRAMES + 1], jnp.uint8)[:, None],
        (FRAMES, BATCH) + frames.shape[1:],
    )
    fb = jax.device_put(fb)
    _sync(fb)

    base = dict(max_features=16)
    P = lambda **kw: dataclasses.replace(cfg.params, **{**base, **kw})

    if os.environ.get("TRACE", "0") == "1":
        trace_top_ops(P(use_pallas=True, batch_mode=True), cfg, fb)
        return
    timeit("batch: pallas (r2 default)", P(use_pallas=True, batch_mode=True), cfg, fb)
    timeit("batch: pure XLA", P(use_pallas=False, batch_mode=True), cfg, fb)
    timeit("batch: XLA index_gather", P(use_pallas=False, batch_mode=True, index_gather=True), cfg, fb)
    timeit("batch: XLA mapping OFF", P(use_pallas=False, batch_mode=True), cfg, fb, mapping=False)


if __name__ == "__main__":
    main()
