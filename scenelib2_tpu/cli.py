"""Headless CLI driver — the example app's TPU-native replacement.

The reference ships a Pangolin GUI binary (examples/MonoSlamSceneLib1.cpp:
Continuous/Next/Stop buttons, Toggle Tracking, Enable Mapping, manual init,
state printing, frame dumps). This driver runs the same workflows headless:

  run        replay a sequence (tracking +/- mapping), dump trajectory,
             per-frame metrics JSONL, optional checkpoints
  bench      run the benchmark suite (scenelib2_tpu.eval.benchmark)
  visualize  render a tracked run to a trajectory/map plot (matplotlib)
  print-state  load a checkpoint and print xv / Pxx (print_robot_state)

Usage:
  python -m scenelib2_tpu.cli run --config data/SceneLib2.cfg --seq <dir> \
      --frames 200 --out run_out --mapping
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def cmd_run(args):
    from scenelib2_tpu import MonoSLAM
    from scenelib2_tpu.io.sequence import ImageSequence

    slam = MonoSLAM(args.config, max_features=args.max_features)
    if args.camera is not None:
        # live input (reference input.mode=1, UsbCamGrabber)
        from scenelib2_tpu.io.camera import CameraGrabber

        seq = CameraGrabber(
            width=slam.params.cam_width, height=slam.params.cam_height,
            device=args.camera,
        )
    else:
        if args.seq is None:
            raise SystemExit("run: provide --seq <dir> or --camera <index>")
        seq = ImageSequence(args.seq)
    os.makedirs(args.out, exist_ok=True)
    profiler_ctx = None
    if args.profile:
        import jax

        profile_dir = os.path.join(args.out, "profile")
        jax.profiler.start_trace(profile_dir)
        profiler_ctx = profile_dir
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    t_start = time.perf_counter()
    n = 0
    with open(metrics_path, "w") as mf:
        for i, frame in enumerate(seq):
            if args.frames and i >= args.frames:
                break
            if i == 0 and args.skip_first:
                continue
            t0 = time.perf_counter()
            slam.go_one_step(frame, save_trajectory=True, enable_mapping=args.mapping)
            o = slam.last_output
            rec = dict(
                frame=i,
                ms=round((time.perf_counter() - t0) * 1e3, 3),
                n_visible=int(o.n_visible),
                n_selected=int(o.n_selected),
                n_matched=int(o.n_matched),
                n_active=int(o.n_active),
                n_partial=int(o.n_partial),
                did_init=bool(o.did_init),
                did_convert=bool(o.did_convert),
                speed=round(float(o.speed), 4),
                r=[round(float(v), 6) for v in np.asarray(o.r)],
            )
            mf.write(json.dumps(rec) + "\n")
            n += 1
            if args.verbose and i % 10 == 0:
                print(json.dumps(rec), file=sys.stderr)
    if profiler_ctx:
        import jax

        jax.profiler.stop_trace()
        print(f"# profile trace: {profiler_ctx}", file=sys.stderr)
    traj = slam.trajectory()
    np.savez(os.path.join(args.out, "trajectory.npz"), r=traj)
    if args.checkpoint:
        slam.save_checkpoint(os.path.join(args.out, "final_state.npz"))
    dt = time.perf_counter() - t_start
    print(
        json.dumps(
            dict(frames=n, seconds=round(dt, 2), fps=round(n / dt, 2), out=args.out)
        )
    )


def cmd_bench(args):
    from scenelib2_tpu.eval.benchmark import run_all

    run_all(args.names or None)


def cmd_visualize(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(os.path.join(args.run, "trajectory.npz"))
    traj = data["r"]
    fig = plt.figure(figsize=(10, 4))
    ax = fig.add_subplot(121, projection="3d")
    ax.plot(traj[:, 0], traj[:, 1], traj[:, 2], "b-")
    ax.scatter(traj[0, 0], traj[0, 1], traj[0, 2], c="g", label="start")
    ax.scatter(traj[-1, 0], traj[-1, 1], traj[-1, 2], c="r", label="end")
    ax.set_title("camera trajectory")
    ax.legend()
    ax2 = fig.add_subplot(122)
    metrics = [json.loads(l) for l in open(os.path.join(args.run, "metrics.jsonl"))]
    ax2.plot([m["frame"] for m in metrics], [m["n_matched"] for m in metrics], label="matched")
    ax2.plot([m["frame"] for m in metrics], [m["n_active"] for m in metrics], label="map size")
    ax2.set_xlabel("frame")
    ax2.legend()
    out = args.out or os.path.join(args.run, "run.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(out)


def cmd_ar(args):
    """AR replay (reference GraphicTool::DrawAR / Draw3dScene analog):
    re-run a sequence and dump per-frame overlays — search ellipses, match
    boxes, partial-feature particle-ellipse clouds, auto-init region boxes —
    plus a final 3-D map with true 3-sigma covariance ellipsoids."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax

    from scenelib2_tpu import MonoSLAM
    from scenelib2_tpu.eval import viz
    from scenelib2_tpu.io.sequence import ImageSequence

    slam = MonoSLAM(args.config, max_features=args.max_features)
    seq = ImageSequence(args.seq)
    frames = []
    for i, f in enumerate(seq):
        if args.frames and i >= args.frames:
            break
        frames.append(f)
    frames = np.stack(frames)
    outs = slam.run_sequence(frames[1:], enable_mapping=args.mapping)
    os.makedirs(args.out, exist_ok=True)
    region = (slam.params.init_search_width, slam.params.init_search_height)
    paths = []
    for t in range(0, len(frames) - 1, args.every):
        o_t = jax.tree_util.tree_map(lambda a: np.asarray(a)[t], outs)
        fig, ax = plt.subplots(figsize=(6, 4.5))
        viz.render_ar_frame(ax, frames[t + 1], o_t, slam.params.boxsize, region)
        p = os.path.join(args.out, f"ar_{t:04d}.png")
        fig.savefig(p, dpi=110, bbox_inches="tight")
        plt.close(fig)
        paths.append(p)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    viz.render_map_3d(ax, slam.state, np.asarray(outs.r))
    map_path = os.path.join(args.out, "map3d.png")
    fig.savefig(map_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(json.dumps(dict(ar_frames=len(paths), map=map_path, out=args.out)))


def cmd_selftest(args):
    """One-command hardware selftest (VERDICT r4 item 6): run the benched
    scan on the current device and compare the decisions fingerprint against
    data/expected_fingerprint.json. Mosaic-compile regressions (which
    interpret-mode CI cannot see) fail this command with exit 1.

    Runs in a subprocess because fast (f32) mode must be fixed before the
    package imports jax — this parent process already imported it."""
    import subprocess

    env = dict(os.environ, SCENELIB2_X64="0")
    env.pop("JAX_ENABLE_X64", None)
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    # bootstrap -c: the platform must be pinned BEFORE the package import
    # initialises the PJRT backend (python -m imports the package first)
    boot = (
        "import os, sys, jax\n"
        + ("jax.config.update('jax_platforms','cpu')\n" if args.cpu else "")
        + "from scenelib2_tpu.eval.selftest import run_selftest\n"
        f"sys.exit(run_selftest({args.expected!r} or None, {args.frames}, "
        f"{args.update}))\n"
    )
    raise SystemExit(subprocess.run([sys.executable, "-c", boot], env=env).returncode)


def cmd_print_state(args):
    from scenelib2_tpu import MonoSLAM

    slam = MonoSLAM(args.config)
    slam.load_checkpoint(args.checkpoint)
    slam.print_robot_state()
    for row in slam.feature_table():
        print(row)


def main(argv=None):
    p = argparse.ArgumentParser(prog="scenelib2_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="replay a sequence")
    pr.add_argument("--config", required=True)
    pr.add_argument("--seq", default=None)
    pr.add_argument("--camera", type=int, default=None,
                    help="live cv2 camera device index (instead of --seq)")
    pr.add_argument("--frames", type=int, default=0)
    pr.add_argument("--out", default="run_out")
    pr.add_argument("--max-features", type=int, default=16)
    pr.add_argument("--mapping", action="store_true")
    pr.add_argument("--no-skip-first", dest="skip_first", action="store_false")
    pr.add_argument("--checkpoint", action="store_true")
    pr.add_argument("--verbose", action="store_true")
    pr.add_argument("--profile", action="store_true", help="write a jax.profiler trace")
    pr.set_defaults(func=cmd_run, skip_first=True)

    pb = sub.add_parser("bench", help="run benchmark suite")
    pb.add_argument("names", nargs="*")
    pb.set_defaults(func=cmd_bench)

    pv = sub.add_parser("visualize", help="plot a finished run")
    pv.add_argument("--run", required=True)
    pv.add_argument("--out", default="")
    pv.set_defaults(func=cmd_visualize)

    pa = sub.add_parser("ar", help="AR overlay + 3-D map replay (DrawAR analog)")
    pa.add_argument("--config", required=True)
    pa.add_argument("--seq", required=True)
    pa.add_argument("--frames", type=int, default=0)
    pa.add_argument("--out", default="ar_out")
    pa.add_argument("--max-features", type=int, default=16)
    pa.add_argument("--mapping", action="store_true")
    pa.add_argument("--every", type=int, default=1)
    pa.set_defaults(func=cmd_ar)

    pt = sub.add_parser(
        "selftest", help="device decisions-fingerprint selftest (exit 1 on drift)"
    )
    pt.add_argument("--frames", type=int, default=240)
    pt.add_argument("--expected", default="")
    pt.add_argument("--update", action="store_true",
                    help="re-baseline the expected fingerprint (deliberate)")
    pt.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode kernels)")
    pt.set_defaults(func=cmd_selftest)

    ps = sub.add_parser("print-state", help="print xv/Pxx from a checkpoint")
    ps.add_argument("--config", required=True)
    ps.add_argument("--checkpoint", required=True)
    ps.set_defaults(func=cmd_print_state)

    args = p.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
