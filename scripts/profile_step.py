"""Capture a jax.profiler device trace of the scan and aggregate op times.

Prints the top HLO ops by total self-duration so heavy-branch attribution
comes from the device timeline instead of dynamics-confounded stub
ablations.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("SCENELIB2_X64", "0")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.scenelib2_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import scenelib2_tpu  # noqa: F401
from scenelib2_tpu.config import load_config
from scenelib2_tpu.eval.synthetic import DATASET_VERSION
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod


def main():
    n = int(os.environ.get("FRAMES", "48"))
    use_pallas = os.environ.get("PROFILE_PALLAS", "1") == "1"
    if os.environ.get("PROFILE_CONFIG", "std") == "hires":
        # mirror eval.benchmark.bench_hires
        from scenelib2_tpu.config import Params
        from scenelib2_tpu.eval import benchmark as B

        p = Params(
            cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
            cam_u0=324.0, cam_v0=250.0, max_features=60,
            search_win_radius=48, particle_win_radius=52, n_particles=200,
        )
        frames, cfg_path, _ = B._dataset(n + 1, params=p, tag="hires")
        frames = frames[1 : n + 1]
        cfg = load_config(cfg_path)
        params = dataclasses.replace(cfg.params, use_pallas=use_pallas)
    else:
        cache = f"/tmp/scenelib2_bench_v{DATASET_VERSION}_240"
        frames = np.load(os.path.join(cache, "frames.npy"))[1 : n + 1]
        cfg = load_config(os.path.join(cache, "synthetic.cfg"))
        params = dataclasses.replace(cfg.params, max_features=16, use_pallas=use_pallas)
    s0 = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s0 = st.add_known_feature(s0, kf.y, kf.xp_org, read_pgm(kf.patch_path))

    step = step_mod.make_step(params)
    scan = jax.jit(lambda s, f: jax.lax.scan(
        lambda c, x: (lambda ns, o: (ns, step_mod.pack_outputs(o)))(*step(c, x, True)),
        s, f))
    fstack = jax.device_put(jnp.asarray(frames, jnp.uint8))
    s1, _ = scan(s0, fstack)
    jax.block_until_ready(s1.x)

    out_dir = "/tmp/scenelib2_profile"
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    s2, _ = scan(s0, fstack)
    jax.block_until_ready(s2.x)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"# traced run: {dt*1000:.1f} ms for {n} frames ({dt/n*1e3:.2f} ms/frame)")

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
                   key=os.path.getmtime)
    if not files:
        print("no xplane files found under", out_dir)
        return
    path = files[-1]
    print("# parsing", path)

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for plane in xs.planes:
        is_device = "TPU" in plane.name or "device" in plane.name.lower()
        if not is_device:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        # aggregate PER LINE: module/op/DMA lines overlap; summing across
        # them double-counts nested events and async copy windows
        for line in plane.lines:
            totals = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
            if not totals:
                continue
            print(
                f"\n== plane: {plane.name} | line: {line.name or line.id} "
                f"(total {sum(totals.values()):.2f} ms) =="
            )
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
                print(f"{ms:9.3f} ms  x{counts[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
