"""Hardware selftest: run the benched scan on the CURRENT device and compare
the decisions fingerprint against the committed expected file.

Interpret-mode CI (kernels/compat.py) structurally cannot catch
Mosaic-compile bugs — bf16 MXU defaults, f32<->u32 cast bans, layout
regressions — because those only exist when the kernels actually compile for
TPU. This command makes such a regression fail a command instead of an
eyeball (VERDICT r4 item 6):

    python -m scenelib2_tpu.cli selftest            # compare, exit 1 on drift
    python -m scenelib2_tpu.cli selftest --update   # re-baseline (deliberate)

The fingerprint covers every discrete per-frame decision of the standard
240-frame synthetic workload (the bench.py artifact): the eight decision
counters plus the per-frame selection as a canonical (slot, matched) SET,
hashed; floats are excluded (they legitimately differ by backend/fusion
order), and so is top-k lane ORDER within a frame (ties at f32 may resolve
differently per backend; the joint update is row-permutation-invariant).
The expected file data/expected_fingerprint.json is generated on the real
TPU and verified identical on CPU f32 — any backend that disagrees is wrong.

Decision surface being pinned: monoslam.cpp:108-180 (GoOneStep ordering),
:187-254 (selection), :644-703 (deletion) — via the JAX/Pallas pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

import numpy as np

# per-frame discrete fields hashed into the fingerprint (all integer/bool)
DECISION_FIELDS = (
    "n_visible", "n_selected", "n_matched", "n_active", "n_partial",
    "did_init", "did_convert", "n_overflow",
)


def _selection_set(outs) -> np.ndarray:
    """Per-frame selection as a canonical sorted (slot, matched) set.

    Selection is `lax.top_k` over trace(S) (runtime/step.py) and the
    measured-vs-compiled-reference SET of selected slots; top-k TIES (e.g.
    the symmetric bootstrap geometry at frame 1) may legitimately order
    differently across backends at f32. Hash the set, not the lane order —
    the joint update is permutation-invariant over measurement rows.
    """
    sel = np.asarray(outs.sel_slot).astype(np.int64)        # [T, NSEL]
    mat = np.asarray(outs.sel_matched).astype(np.int64)     # [T, NSEL]
    nsel = np.asarray(outs.n_selected).astype(np.int64)     # [T]
    lane = np.arange(sel.shape[1], dtype=np.int64)[None, :]
    pad = np.int64(1) << 40
    key = np.where(lane < nsel[:, None], sel * 2 + mat, pad)
    key = np.sort(key, axis=1)
    return np.where(key == pad, np.int64(-1), key)

EXPECTED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "..", "data", "expected_fingerprint.json",
)


def decisions_fingerprint(outs, n_frames: int) -> dict:
    """Summary scalars + a sha256 over every discrete per-frame decision."""
    h = hashlib.sha256()
    for name in DECISION_FIELDS:
        arr = np.asarray(getattr(outs, name)).astype(np.int64)
        h.update(name.encode())
        h.update(arr.tobytes())
    h.update(b"sel_set")
    h.update(_selection_set(outs).tobytes())
    return dict(
        n_frames=int(n_frames),
        matched_sum=int(np.asarray(outs.n_matched).sum()),
        inits=int(np.asarray(outs.did_init).sum()),
        convs=int(np.asarray(outs.did_convert).sum()),
        active_end=int(np.asarray(outs.n_active)[-1]),
        decisions_sha256=h.hexdigest(),
    )


def run_selftest(expected_path: str | None = None, n_frames: int = 240,
                 update: bool = False, cpu: bool = False) -> int:
    """Returns a process exit code (0 = fingerprint matches)."""
    import jax

    if cpu:
        # best-effort: only effective if the backend is not yet initialised —
        # the cli subcommand pins the platform in a bootstrap -c for this
        # reason (a plain `python -m` import of the package initialises PJRT)
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.scenelib2_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from scenelib2_tpu import MonoSLAM
    from scenelib2_tpu.eval.synthetic import DATASET_VERSION, generate_dataset
    from scenelib2_tpu.runtime import step as step_mod

    if jnp.zeros(()).dtype != jnp.float32:
        print("selftest: needs fast (f32) mode — run with SCENELIB2_X64=0 "
              "or via `python -m scenelib2_tpu.cli selftest`", file=sys.stderr)
        return 2

    expected_path = expected_path or os.path.abspath(EXPECTED_PATH)
    cache = os.path.join(
        tempfile.gettempdir(), f"scenelib2_bench_v{DATASET_VERSION}_{n_frames}"
    )
    if not os.path.exists(os.path.join(cache, "frames.npy")):
        os.makedirs(cache, exist_ok=True)
        frames, _rs, _qs, _cfg = generate_dataset(cache, n_frames=n_frames)
        np.save(os.path.join(cache, "frames.npy"), frames)
    else:
        frames = np.load(os.path.join(cache, "frames.npy"))
    cfg = os.path.join(cache, "synthetic.cfg")

    dev = jax.devices()[0]
    print(f"# selftest device: {dev}", file=sys.stderr)
    slam = MonoSLAM(cfg, max_features=16, use_pallas=True)
    seq = jax.device_put(jnp.asarray(frames[1:], jnp.uint8))
    jax.block_until_ready(seq)
    t0 = time.perf_counter()
    slam.run_sequence(seq, enable_mapping=True, chunk=0)
    print(f"# compile+run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    slam.reset()
    _s1, flat = slam._scan(slam.state, seq, jnp.asarray(True))
    outs = step_mod.unpack_outputs(
        flat, slam.params.n_features_to_select,
        max(1, slam.params.max_features_to_init_at_once),
        slam.params.n_particles,
    )
    got = decisions_fingerprint(outs, len(seq))
    got["dataset_version"] = DATASET_VERSION
    print(f"# fingerprint: {json.dumps(got)}", file=sys.stderr)

    if update:
        with open(expected_path, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"selftest: wrote {expected_path}")
        return 0

    if not os.path.exists(expected_path):
        print(f"selftest: no expected file at {expected_path} — run with "
              "--update on a known-good device first", file=sys.stderr)
        return 2
    with open(expected_path) as f:
        want = json.load(f)
    diffs = {k: (want[k], got.get(k)) for k in want if got.get(k) != want[k]}
    if diffs:
        print("selftest: FINGERPRINT MISMATCH — the compiled pipeline on "
              f"{dev} makes different decisions than the committed baseline:",
              file=sys.stderr)
        for k, (w, g) in sorted(diffs.items()):
            print(f"  {k}: expected {w}, got {g}", file=sys.stderr)
        print("selftest: FAIL")
        return 1
    print(f"selftest: OK ({got['matched_sum']} matches, {got['inits']} inits, "
          f"{got['convs']} conversions over {got['n_frames']} frames on {dev})")
    return 0


def _cli_main():
    import argparse

    p = argparse.ArgumentParser(prog="scenelib2_tpu.eval.selftest")
    p.add_argument("--expected", default=None)
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--update", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (interpret-mode kernels)")
    a = p.parse_args()
    sys.exit(run_selftest(a.expected, a.frames, a.update, a.cpu))


if __name__ == "__main__":
    # fast mode is fixed at package import (before __main__ runs under -m),
    # so this entry point requires the env var; `cli.py selftest` sets it
    _cli_main()
