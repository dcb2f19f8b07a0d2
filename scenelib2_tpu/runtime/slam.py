"""MonoSLAM facade: the reference's public API around the jitted step.

Mirrors the MonoSLAM class surface (reference monoslam.h:76-156):
  Init (constructor)        — config load, camera/motion/feature models,
                              known features, srand48(0)
  GoOneStep                 — one frame (jitted; state stays on device)
  InitialiseAutoFeature     — manual auto-init trigger (no speed/count gates)
  AddNewKnownFeature        — add a feature with known position, zero cov
  mark/toggle/delete_feature, SavePatch, print_robot_state
  trajectory_store_         — ring of the last 1000 camera positions

Plus capabilities the reference lacks but SURVEY.md flags as required
generalisations: whole-state checkpoint save/load and a high-throughput
run_sequence (lax.scan over pre-staged frames, zero host round-trips).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.config import Params, SlamConfig, load_config
from scenelib2_tpu.core.camera import CameraParams
from scenelib2_tpu.io.pgm import read_pgm, write_pgm
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod
from scenelib2_tpu.runtime.state import SlamState


class MonoSLAM:
    def __init__(self, config: str | SlamConfig, seed: int = 0, **param_overrides):
        if isinstance(config, str):
            config = load_config(config, **param_overrides)
        elif param_overrides:
            import dataclasses

            config = dataclasses.replace(
                config, params=dataclasses.replace(config.params, **param_overrides)
            )
        self.config = config
        self.params: Params = config.params
        self.cam = CameraParams.from_params(self.params)
        self.state: SlamState = st.init_from_config(config, seed=seed)
        self._step = jax.jit(step_mod.make_step(self.params))
        self._scan = None
        self.trajectory_store: list[np.ndarray] = []
        self.marked_feature_label = -1
        self.selected_labels: set[int] = set()
        self.last_output: step_mod.StepOutputs | None = None

    # ------------------------------------------------------------------ API

    def go_one_step(self, frame: np.ndarray, save_trajectory: bool = True,
                    enable_mapping: bool = True) -> bool:
        """One SLAM step (reference GoOneStep, monoslam.cpp:108-180)."""
        frame = jnp.asarray(frame, jnp.uint8)
        self.state, out = self._step(self.state, frame, enable_mapping)
        self.last_output = out
        if save_trajectory:
            self.trajectory_store.append(np.asarray(out.r))
            if len(self.trajectory_store) > 1000:
                self.trajectory_store.pop(0)
        return True

    # reference-style aliases
    GoOneStep = go_one_step

    def reset(self, seed: int = 0) -> None:
        """Reinitialise the filter from the config (keeps compiled graphs)."""
        self.state = st.init_from_config(self.config, seed=seed)
        self.trajectory_store = []
        self.marked_feature_label = -1

    def run_sequence(self, frames: np.ndarray, enable_mapping: bool = True,
                     chunk: int = 0):
        """Offline fast path: lax.scan over a [T,H,W] frame stack.

        Returns StepOutputs with a leading time axis. State stays on device
        for the whole run; this is the 500+ fps benchmark path. With
        chunk > 0 the scan is compiled once for the chunk length and reused
        (plus one extra compile for the remainder), so arbitrary sequence
        lengths don't trigger fresh compiles.
        """
        frames = jnp.asarray(frames, jnp.uint8)
        nsel = self.params.n_features_to_select
        maxp = max(1, self.params.max_features_to_init_at_once)
        npart = self.params.n_particles
        if self._scan is None:
            step = step_mod.make_step(self.params)

            def scan_fn(s, f, em):
                # pack per-frame outputs into ONE vector: scan stacking does
                # one dynamic-update-slice per leaf per frame otherwise.
                # unroll=2: the step body is ~100 small ops whose sequencer
                # overhead dominates; unrolling lets XLA overlap consecutive
                # frames' op streams (~2-3% device time, negligible compile)
                carry, flat = jax.lax.scan(
                    lambda s_, fr: (lambda ns, o: (ns, step_mod.pack_outputs(o)))(
                        *step(s_, fr, em)
                    ),
                    s,
                    f,
                    unroll=2,
                )
                return carry, flat

            self._scan = jax.jit(scan_fn)
        em = jnp.asarray(enable_mapping)
        if chunk and len(frames) >= chunk:
            # full chunks through one compiled scan; remainder via the
            # (already compiled) single-step jit
            flat_list = []
            n_full = (len(frames) // chunk) * chunk
            for pos in range(0, n_full, chunk):
                self.state, fl = self._scan(self.state, frames[pos : pos + chunk], em)
                flat_list.append(fl)
            for i in range(n_full, len(frames)):
                self.state, o = self._step(self.state, frames[i], em)
                flat_list.append(step_mod.pack_outputs(o)[None])
            outs = step_mod.unpack_outputs(jnp.concatenate(flat_list, axis=0), nsel, maxp, npart)
        else:
            self.state, flat = self._scan(self.state, frames, em)
            outs = step_mod.unpack_outputs(flat, nsel, maxp, npart)
        self.last_output = jax.tree_util.tree_map(lambda a: a[-1], outs)
        rs = np.asarray(outs.r)
        self.trajectory_store.extend(list(rs))
        self.trajectory_store = self.trajectory_store[-1000:]
        return outs

    def initialise_auto_feature(self, frame: np.ndarray) -> None:
        """Manual auto-init (reference InitialiseAutoFeature,
        monoslam.cpp:1526-1532): runs the region proposal + Shi-Tomasi + ray
        insertion with no speed/visibility gates."""
        if not hasattr(self, "_init_fn"):
            params, cam = self.params, self.cam
            lam0 = jnp.asarray(st.lambda_grid(params))

            def init_only(state, frame_u8):
                state, did, _box = step_mod._auto_initialise(
                    state, frame_u8, cam, params, lam0, jnp.asarray(True)
                )
                return state, did

            self._init_fn = jax.jit(init_only)
        self.state, did = self._init_fn(self.state, jnp.asarray(frame, jnp.uint8))
        return bool(did)

    InitialiseAutoFeature = initialise_auto_feature

    def initialise_feature(self, frame: np.ndarray, uu: int, vv: int) -> bool:
        """Manual feature init at a picked pixel (reference InitialiseFeature,
        monoslam.cpp:1211-1235: copy_into_patch at (uu, vv) + partial ray
        insertion with the uniform lambda particle grid). The reference's GUI
        sets (uu, vv) from a mouse click (pangolin_util.cpp:57-81)."""
        B = self.params.boxsize
        half = (B - 1) // 2
        W, H = self.params.cam_width, self.params.cam_height
        uu, vv = int(uu), int(vv)
        if not (half <= uu < W - half and half <= vv < H - half):
            return False
        frame = np.asarray(frame, np.uint8)
        patch = frame[vv - half : vv + half + 1, uu - half : uu + half + 1]
        if not hasattr(self, "_manual_init_fn"):
            params, cam = self.params, self.cam
            lam0 = jnp.asarray(st.lambda_grid(params))

            def add_only(state, z, patch_u8):
                return st.add_partial_feature(
                    state, cam, z, patch_u8, lam0, jnp.asarray(True)
                )

            self._manual_init_fn = jax.jit(add_only)
        n_before = int(jnp.sum(self.state.active))
        self.state = self._manual_init_fn(
            self.state,
            jnp.asarray([float(uu), float(vv)], self.state.x.dtype),
            jnp.asarray(patch, jnp.uint8),
        )
        return int(jnp.sum(self.state.active)) > n_before

    InitialiseFeature = initialise_feature

    def add_new_known_feature(self, y, xp_org, patch) -> None:
        """Reference AddNewKnownFeature (monoslam.cpp:1278-1291)."""
        if isinstance(patch, str):
            patch = read_pgm(patch)
        self.state = st.add_known_feature(self.state, y, xp_org, patch)

    AddNewKnownFeature = add_new_known_feature

    # ------------------------------------------------- feature bookkeeping

    def _slot_of_label(self, label: int) -> int | None:
        labels = np.asarray(self.state.label)
        active = np.asarray(self.state.active)
        hits = np.nonzero(active & (labels == label))[0]
        return int(hits[0]) if len(hits) else None

    def mark_feature_by_lab(self, label: int) -> None:
        """Reference mark_feature_by_lab (monoslam.cpp:742-766), including
        its quirk: the existence search runs only for lab > 0, so ANY
        non-positive label (0, -2, ...) is accepted whenever the feature
        list is non-empty, and -1 ("no selection") is always accepted."""
        label = int(label)
        if label > 0:
            if self._slot_of_label(label) is None:
                return
        elif label != -1 and not bool(np.asarray(self.state.active).any()):
            return
        self.marked_feature_label = label

    def toggle_feature_lab(self, label: int) -> bool:
        """Manual (de)selection bookkeeping (reference monoslam.cpp:710-724).

        As in the reference, auto-selection clears the selected set at the
        start of every GoOneStep, so manual toggles only matter for
        inspection flows between steps.
        """
        slot = self._slot_of_label(label)
        if slot is None:
            return False
        if label in self.selected_labels:
            self.selected_labels.discard(label)
        else:
            self.selected_labels.add(label)
        return True

    def delete_feature(self, label: int | None = None) -> bool:
        """Delete the marked (or given-label) feature (monoslam.cpp:770-812)."""
        if label is None:
            label = self.marked_feature_label
        slot = self._slot_of_label(label)
        if slot is None:
            return False
        kill = np.zeros(self.params.max_features, bool)
        kill[slot] = True
        self.state = st.delete_mask(self.state, jnp.asarray(kill))
        self.marked_feature_label = -1
        return True

    def save_patch(self, path: str = "patch.pgm") -> bool:
        """Reference SavePatch (monoslam.cpp:1551-1572)."""
        slot = self._slot_of_label(self.marked_feature_label)
        if slot is None:
            return False
        write_pgm(path, np.asarray(self.state.patches[slot]))
        return True

    SavePatch = save_patch

    # ------------------------------------------------------- introspection

    @property
    def xv(self) -> np.ndarray:
        return np.asarray(self.state.x[:13])

    @property
    def pxx(self) -> np.ndarray:
        return np.asarray(self.state.P[:13, :13])

    def print_robot_state(self) -> str:
        s = f"[Robot state]\n{self.xv}\n[Robot covariance]\n{self.pxx}"
        print(s)
        return s

    def feature_table(self) -> list[dict]:
        s = self.state
        out = []
        for i in range(self.params.max_features):
            if not bool(s.active[i]):
                continue
            off = st.slot_offset(i)
            out.append(
                dict(
                    slot=i,
                    label=int(s.label[i]),
                    fully_initialised=bool(s.full[i]),
                    y=np.asarray(s.x[off : off + (3 if bool(s.full[i]) else 6)]),
                    attempts=int(s.attempts[i]),
                    successes=int(s.successes[i]),
                )
            )
        return out

    # --------------------------------------------------------- checkpoints

    def save_checkpoint(self, path: str) -> None:
        """Whole-SLAM-state checkpoint (generalises the reference's
        cfg-only init path; SURVEY.md §5 checkpoint/resume)."""
        arrays = {f"state_{k}": np.asarray(v) for k, v in self.state._asdict().items()}
        np.savez_compressed(path, **arrays)
        meta = dict(params=self.params.__dict__, marked=self.marked_feature_label)
        with open(path + ".json", "w") as f:
            json.dump(meta, f, default=float)

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        fields = {k[len("state_"):]: jnp.asarray(v) for k, v in data.items()}
        # older checkpoints predate the persistent scheduled-for-termination
        # flag; features saved mid-schedule are vanishingly rare, default off
        fields.setdefault("sched", jnp.zeros(self.params.max_features, bool))
        # ... and the precomputed kernel patch rows: derive from the patches
        if "patch_rows" not in fields:
            fields["patch_rows"] = jnp.stack(
                [st.patch_row(p) for p in fields["patches"]]
            )
        # validate against this instance's capacity config up front — a
        # mismatched checkpoint must fail with a clear error here, not deep
        # inside the jitted step
        tmpl = self.state._asdict()
        unknown = sorted(set(fields) - set(tmpl))
        if unknown:
            raise ValueError(
                f"checkpoint {path!r} has unknown state fields {unknown} "
                "(written by a newer scenelib2_tpu?)"
            )
        missing = sorted(set(tmpl) - set(fields))
        if missing:
            raise ValueError(
                f"checkpoint {path!r} is missing state fields {missing}"
            )
        for k, want in tmpl.items():
            got = fields[k]
            if tuple(got.shape) != tuple(want.shape):
                raise ValueError(
                    f"checkpoint field '{k}' has shape {tuple(got.shape)} but "
                    f"this configuration (max_features={self.params.max_features}, "
                    f"n_particles={self.params.n_particles}, "
                    f"max_features_to_init_at_once="
                    f"{self.params.max_features_to_init_at_once}) expects "
                    f"{tuple(want.shape)} — was the checkpoint written with a "
                    "different capacity config?"
                )
            if got.dtype != want.dtype:
                # e.g. an f64 parity checkpoint loaded into an f32 fast-mode
                # run (or vice versa): cast rather than fail
                fields[k] = got.astype(want.dtype)
        self.state = SlamState(**fields)

    # --------------------------------------------------------------- misc

    def trajectory(self) -> np.ndarray:
        return np.asarray(self.trajectory_store)
