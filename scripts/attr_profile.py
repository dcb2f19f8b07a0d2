"""Attribute device time to jax source paths.

Joins the latest xplane device trace (per-HLO-op totals) with the
TPU-compiled HLO text (op metadata op_name="jit(..)/<path>/<prim>") so hot
spots are reported by *source construct* instead of fusion numbers. The scan
module is recompiled here with the same shapes as scripts/profile_step.py.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import sys
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


def hlo_op_paths() -> dict[str, str]:
    """name -> jax op_name path for every instruction in the TPU module."""
    cache = f"/tmp/scenelib2_bench_v{DATASET_VERSION}_240"
    cfg = load_config(os.path.join(cache, "synthetic.cfg"))
    use_pallas = os.environ.get("PROFILE_PALLAS", "1") == "1"
    params = dataclasses.replace(cfg.params, max_features=16, use_pallas=use_pallas)
    s0 = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s0 = st.add_known_feature(s0, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    step = step_mod.make_step(params)
    n = int(os.environ.get("FRAMES", "239"))
    frames = jnp.zeros((n, params.cam_height, params.cam_width), jnp.uint8)
    scan = jax.jit(lambda s, f: jax.lax.scan(
        lambda c, x: (lambda ns, o: (ns, step_mod.pack_outputs(o)))(*step(c, x, True)),
        s, f))
    txt = scan.lower(s0, frames).compile().as_text()

    names = {}
    cur = []
    for ln in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", ln)
        if not m:
            if ln.lstrip().startswith(("fused_computation", "%fused_computation")):
                cur = []
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
    # fusions: attribute to their root op_name if the fusion instr itself
    # lacks metadata (roots carry it)
    return names


def main():
    names = hlo_op_paths()
    out_dir = "/tmp/scenelib2_profile"
    files = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("run scripts/profile_step.py first (no xplane trace found)")
        return
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
            unattributed = 0.0
            for ev in line.events:
                raw = meta.get(ev.metadata_id, "")
                m = re.match(r"%?([\w.-]+) =", raw)
                nm = m.group(1) if m else raw
                ms = ev.duration_ps / 1e9
                path = names.get(nm)
                if path is None:
                    # while/cond wrappers double-count their bodies; skip them
                    if nm.startswith(("while", "cond", "jit_")):
                        continue
                    unattributed += ms
                    counts[f"<raw> {nm[:60]}"] += 1
                    by_path[f"<raw> {nm[:60]}"] += ms
                    continue
                parts = [
                    p
                    for p in path.split("/")
                    if not p.startswith("jit(")
                    and p not in ("while", "body", "closed_call", "branch_0_fun",
                                  "branch_1_fun", "cond")
                ]
                key = "/".join(parts[:depth])
                if "/cond/" in path or path.endswith("/cond"):
                    key = "COND| " + key
                by_path[key] += ms
                counts[key] += 1
            total = sum(by_path.values())
            print(f"\n== attributed device time: {total:.2f} ms ==")
            top = int(os.environ.get("TOP", "50"))
            for k, ms in sorted(by_path.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ms:9.3f} ms  x{counts[k]:<7d} {k[:100]}")
            # aggregate by source file (or raw bucket) for the long tail
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
