"""Per-op device-time attribution for the HIRES (640x480 / 60-slot / D=373)
scan — the profile_step + attr_profile pair in one script, at the hires
operating point, so the large-map fast path can be optimized with the same
methodology as std. Caveat (BENCH_SUITE methodology): cond/while event
durations include their children; use end-to-end ab_scan CONFIG=hires for
accept/reject decisions.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import sys
import tempfile
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
from scenelib2_tpu.config import Params, load_config
from scenelib2_tpu.eval.benchmark import _dataset
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod


def main():
    n = int(os.environ.get("FRAMES", "120"))
    p = Params(
        cam_width=640, cam_height=480, cam_fku=390.0, cam_fkv=390.0,
        cam_u0=324.0, cam_v0=250.0, max_features=60,
        search_win_radius=48, particle_win_radius=52, n_particles=200,
    )
    frames, cfg_path, _ = _dataset(n, params=p, tag="hires")
    cfg = load_config(cfg_path)
    params = dataclasses.replace(cfg.params, max_features=60, use_pallas=True)
    s0 = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s0 = st.add_known_feature(s0, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    step = step_mod.make_step(params, dtype=jnp.float32)
    seq = jax.device_put(jnp.asarray(frames[1:], jnp.uint8))

    scan = jax.jit(lambda s, f: jax.lax.scan(
        lambda c, x: (lambda ns, o: (ns, step_mod.pack_outputs(o)))(*step(c, x, True)),
        s, f, unroll=2))
    lowered = scan.lower(s0, seq)
    compiled = lowered.compile()
    txt = compiled.as_text()

    names = {}
    for ln in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", ln)
        if not m:
            continue
        nm = m.group(1)
        op = re.search(r'op_name="([^"]*)"', ln)
        src = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', ln)
        if op:
            tag = op.group(1)
            if src:
                sf = src.group(1).split("/")[-1]
                tag = f"{sf}:{src.group(2)} {tag.split('/')[-1]}"
            names[nm] = tag

    out = jax.block_until_ready(compiled(s0, seq))
    out_dir = tempfile.mkdtemp(prefix="scenelib2_hires_prof_")
    jax.profiler.start_trace(out_dir)
    outv = compiled(s0, seq)
    np.asarray(outv[1][-1][0])
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
    xs.ParseFromString(open(files[-1], "rb").read())

    depth = int(os.environ.get("DEPTH", "4"))
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            by_path = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                raw = meta.get(ev.metadata_id, "")
                m = re.match(r"%?([\w.-]+) =", raw)
                nm = m.group(1) if m else raw
                ms = ev.duration_ps / 1e9
                path = names.get(nm)
                if path is None:
                    if nm.startswith(("while", "cond", "jit_")):
                        continue
                    by_path[f"<raw> {nm[:60]}"] += ms
                    counts[f"<raw> {nm[:60]}"] += 1
                    continue
                parts = [
                    q for q in path.split("/")
                    if not q.startswith("jit(")
                    and q not in ("while", "body", "closed_call", "branch_0_fun",
                                  "branch_1_fun", "cond")
                ]
                key = "/".join(parts[:depth])
                if "/cond/" in path or path.endswith("/cond"):
                    key = "COND| " + key
                by_path[key] += ms
                counts[key] += 1
            total = sum(by_path.values())
            print(f"\n== attributed device time: {total:.2f} ms over {n-1} frames ==")
            top = int(os.environ.get("TOP", "40"))
            for k, ms in sorted(by_path.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ms:9.3f} ms  x{counts[k]:<7d} {k[:100]}")
            by_file = defaultdict(float)
            file_counts = defaultdict(int)
            for k, ms in by_path.items():
                f = k.split(":")[0] if ":" in k.split(" ")[0] else k.split(" ")[0]
                by_file[f] += ms
                file_counts[f] += counts[k]
            print("\n== by source file ==")
            for k, ms in sorted(by_file.items(), key=lambda kv: -kv[1])[:25]:
                print(f"{ms:9.3f} ms  x{file_counts[k]:<7d} {k}")


if __name__ == "__main__":
    main()
