"""SlamState: fixed-capacity masked SoA state + covariance surgery.

Replaces the reference's pointer-linked per-feature objects (feature.h:79-142,
monoslam.h member lists) with one packed state vector and ONE dense joint
covariance over fixed feature slots:

  x[D], P[D,D] with D = 13 + 6*MAX_F.

Each feature slot owns a fixed 6-wide stride (rays need 6 dims; 3D points use
the first 3 and keep exact zeros in the rest — zero rows/cols of P are
invariant under every EKF operation, so live-dim arithmetic equals the
reference's packed layout). Feature insertion order is tracked via monotone
labels so selection-order semantics survive slot reuse.

Covariance surgery (all pure functions):
  add_known   — Feature known ctor (feature.cpp:108-149): zero covariance
  add_partial — Feature partial ctor (feature.cpp:45-104): rows from J_x P
  convert     — convert_from_partially_to_fully_initialised
                (feature.cpp:204-269): slot reparameterised through
                dyfi_by_dypi / dyfi_by_dlambda
  delete_mask — delete_feature (monoslam.cpp:770-812): rows/cols zeroed,
                slot freed

Note: the reference has a bookkeeping bug when converting a feature that is
not last in the list (position offsets decremented by 6 instead of 3,
feature.cpp:254); it never fires in real runs because at most one partial
feature exists at a time and it is always last. The dense-slot layout has no
positional offsets, so the behaviour here is the bug-free semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

import jax

from scenelib2_tpu.config import Params, SlamConfig
from scenelib2_tpu.core import models
from scenelib2_tpu.core.camera import CameraParams, measurement_noise
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.rng import pack_state, srand48

CAM_DIM = 13
SLOT_DIM = 6


def patch_row(patch_u8: jnp.ndarray) -> jnp.ndarray:
    """[128] f32 SMEM row for one patch: pixels | sum | sum-of-squares.

    Matches the layout the score-map / search kernels read (integer sums are
    exact in f32 for 11x11 u8 patches)."""
    B = patch_u8.shape[-1]
    p32 = patch_u8.astype(jnp.int32)
    row = jnp.zeros(128, jnp.float32)
    row = row.at[: B * B].set(patch_u8.reshape(-1).astype(jnp.float32))
    row = row.at[B * B].set(p32.sum().astype(jnp.float32))
    row = row.at[B * B + 1].set((p32 * p32).sum().astype(jnp.float32))
    return row


def slot_offset(i):
    return CAM_DIM + SLOT_DIM * i


class SlamState(NamedTuple):
    # filter state
    x: jnp.ndarray          # [D] f64 packed state
    P: jnp.ndarray          # [D,D] f64 joint covariance
    # per-slot feature records
    active: jnp.ndarray     # [MF] bool
    full: jnp.ndarray       # [MF] bool (fully-initialised flag)
    label: jnp.ndarray      # [MF] i32 insertion-order label (-1 free)
    patches: jnp.ndarray    # [MF,B,B] u8 stored 11x11 patches
    xp_org: jnp.ndarray     # [MF,7] camera position at acquisition
    attempts: jnp.ndarray   # [MF] i32 attempted measurements
    successes: jnp.ndarray  # [MF] i32 successful measurements
    # per-slot precomputed Pallas patch row: lanes 0..B*B-1 = patch pixels
    # (f32, row-major), B*B = sum, B*B+1 = sum of squares. Computed once at
    # patch write time so the per-frame kernel wrappers do one gather
    # instead of rebuilding conversions/reductions/scatters every frame.
    patch_rows: jnp.ndarray  # [MF,128] f32
    # partial-feature particle filter (per slot; only meaningful when !full)
    lam: jnp.ndarray            # [MF,NP] f64 depth hypotheses
    prob: jnp.ndarray           # [MF,NP] f64 particle probabilities
    palive: jnp.ndarray         # [MF,NP] bool particle alive mask
    match_attempts: jnp.ndarray  # [MF] i32 FeatureInitInfo::number_of_match_attempts_
    # Feature::scheduled_for_termination_flag_ (feature.h:134). Persistent
    # across frames: the reference's exterminate_features erases from the
    # vector mid-iteration, so a scheduled feature list-adjacent after a
    # deleted one is SKIPPED that frame and keeps its flag — it dies on the
    # next exterminate pass even if its match ratio recovered.
    sched: jnp.ndarray          # [MF] bool
    # misc
    rng: jnp.ndarray        # [3] u32 16-bit-limb drand48 state
    next_label: jnp.ndarray  # [] i32
    frame_no: jnp.ndarray   # [] i32

    @property
    def n_active(self):
        return jnp.sum(self.active)


def init_state(params: Params, xv0, pxx0, seed: int = 0) -> SlamState:
    MF, NP, B = params.max_features, params.n_particles, params.boxsize
    D = params.state_dim
    x = jnp.zeros(D, jnp.float64).at[:CAM_DIM].set(jnp.asarray(xv0, jnp.float64))
    P = jnp.zeros((D, D), jnp.float64).at[:CAM_DIM, :CAM_DIM].set(
        jnp.asarray(pxx0, jnp.float64)
    )
    return SlamState(
        x=x,
        P=P,
        active=jnp.zeros(MF, bool),
        full=jnp.zeros(MF, bool),
        label=jnp.full(MF, -1, jnp.int32),
        patches=jnp.zeros((MF, B, B), jnp.uint8),
        patch_rows=jnp.zeros((MF, 128), jnp.float32),
        xp_org=jnp.zeros((MF, 7), jnp.float64),
        attempts=jnp.zeros(MF, jnp.int32),
        successes=jnp.zeros(MF, jnp.int32),
        lam=jnp.zeros((MF, NP), jnp.float64),
        prob=jnp.zeros((MF, NP), jnp.float64),
        palive=jnp.zeros((MF, NP), bool),
        match_attempts=jnp.zeros(MF, jnp.int32),
        sched=jnp.zeros(MF, bool),
        rng=jnp.asarray(pack_state(srand48(seed))),
        next_label=jnp.int32(0),
        frame_no=jnp.int32(0),
    )


def lambda_grid(params: Params) -> np.ndarray:
    """Initial particle depth grid, replicated with the reference's repeated
    addition (monoslam.cpp:1223-1234: lambda += step in a loop, NOT min+i*step
    — the accumulated rounding is part of the parity surface)."""
    step = (1.0 / float(params.n_particles)) * (params.max_lambda - params.min_lambda)
    vals = np.empty(params.n_particles, np.float64)
    lam = params.min_lambda
    for i in range(params.n_particles):
        vals[i] = lam
        lam += step
    return vals


def add_known_feature(state: SlamState, y, xp_org, patch_u8) -> SlamState:
    """Known feature with zero covariance (host-side init path)."""
    slot = int(np.argmin(np.asarray(state.active)))
    assert not bool(state.active[slot]), "feature capacity exhausted"
    off = slot_offset(slot)
    x = state.x.at[off : off + 3].set(jnp.asarray(y, jnp.float64))
    return state._replace(
        x=x,
        active=state.active.at[slot].set(True),
        full=state.full.at[slot].set(True),
        label=state.label.at[slot].set(state.next_label),
        patches=state.patches.at[slot].set(jnp.asarray(patch_u8, jnp.uint8)),
        patch_rows=state.patch_rows.at[slot].set(
            patch_row(jnp.asarray(patch_u8, jnp.uint8))
        ),
        xp_org=state.xp_org.at[slot].set(jnp.asarray(xp_org, jnp.float64)),
        next_label=state.next_label + 1,
    )


def init_from_config(cfg: SlamConfig, seed: int = 0) -> SlamState:
    state = init_state(cfg.params, cfg.xv0, cfg.pxx0, seed=seed)
    for kf in cfg.known_features:
        state = add_known_feature(state, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    return state


def free_slot(state: SlamState):
    """Index of the first free slot and whether one exists."""
    any_free = ~jnp.all(state.active)
    slot = jnp.argmin(state.active.astype(jnp.int32))
    return slot, any_free


def add_partial_feature(
    state: SlamState,
    cam: CameraParams,
    h: jnp.ndarray,          # [2] measured image location (uu, vv as f64)
    patch_u8: jnp.ndarray,   # [B,B]
    lam0: jnp.ndarray,       # [NP] initial lambda grid
    enable: jnp.ndarray,     # [] bool — masked no-op when False
    onehot: bool = False,
) -> SlamState:
    """Partial (ray) feature insertion inside jit (feature.cpp:45-104).

    New slot rows of P are J_x P[cam,:] with J_x = dypi_by_dxp dxp_by_dxv, and
    the slot diagonal gets + dypi_by_dhi R dypi_by_dhi'.

    onehot=True uses one-hot placement instead of dynamic slices (for the
    batch-mode step; see convert_feature).
    """
    slot, any_free = free_slot(state)
    doit = enable & any_free
    off = slot_offset(slot)
    xp = state.x[:7]

    ypi, dypi_by_dxp, dypi_by_dhi = models.part_init_ray(cam, h, xp)
    R = measurement_noise(cam, h)
    # J_x = dypi_by_dxp @ dxp_by_dxv: pad the 7 position-state cols to 13
    Jx = jnp.pad(dypi_by_dxp, ((0, 0), (0, CAM_DIM - 7)))       # [6, 13]
    new_rows = Jx @ state.P[:CAM_DIM, :]                        # [6, D]
    pyy = new_rows[:, :CAM_DIM] @ Jx.T + dypi_by_dhi @ R @ dypi_by_dhi.T

    # Disabled inserts must be exact no-ops; writes carry value-selected
    # content (new vs the slot's current content) so no state-wide `where`
    # is needed — this function runs UNCONDITIONALLY every frame in the step
    # (the auto-init cond returns only the proposal).
    zero = jnp.zeros_like(off)
    D = state.P.shape[0]
    P = state.P
    if onehot:
        ar = jnp.arange(D, dtype=off.dtype)
        E = (ar[None, :] == (off + jnp.arange(SLOT_DIM, dtype=off.dtype))[:, None]
             ).astype(P.dtype)                                  # [6,D]
        slotmask = (ar >= off) & (ar < off + SLOT_DIM)
        # a free slot's rows/cols and x entries are exact zeros already, so
        # the masked clear is a no-op placement, not a value change
        rows0 = jnp.where(slotmask[None, :], 0.0, new_rows)     # diag via pyy
        P_new = (
            jnp.where(slotmask[:, None] | slotmask[None, :], 0.0, P)
            + E.T @ rows0 + rows0.T @ E + E.T @ pyy @ E
        )
        x_new = jnp.where(slotmask, E.T @ ypi, state.x)
        P = jnp.where(doit, P_new, P)
        x = jnp.where(doit, x_new, state.x)
    else:
        old_rows = lax.dynamic_slice(P, (off, zero), (SLOT_DIM, D))
        rows = jnp.where(doit, new_rows, old_rows)
        pyy_w = jnp.where(doit, pyy, lax.dynamic_slice(P, (off, off), (SLOT_DIM, SLOT_DIM)))
        P = lax.dynamic_update_slice(P, rows, (off, zero))
        P = lax.dynamic_update_slice(P, rows.T, (zero, off))
        P = lax.dynamic_update_slice(P, pyy_w, (off, off))
        x = lax.dynamic_update_slice(
            state.x,
            jnp.where(doit, ypi, lax.dynamic_slice(state.x, (off,), (SLOT_DIM,))),
            (off,),
        )

    NP = state.lam.shape[1]
    uniform = jnp.full(NP, 1.0 / NP, jnp.float64)

    def sel_row(new, old_arr):
        return jnp.where(doit, new, old_arr[slot])

    return state._replace(
        x=x,
        P=P,
        active=state.active.at[slot].set(sel_row(True, state.active)),
        full=state.full.at[slot].set(sel_row(False, state.full)),
        label=state.label.at[slot].set(sel_row(state.next_label, state.label)),
        patches=state.patches.at[slot].set(
            sel_row(patch_u8.astype(jnp.uint8), state.patches)
        ),
        patch_rows=state.patch_rows.at[slot].set(
            sel_row(patch_row(patch_u8.astype(jnp.uint8)), state.patch_rows)
        ),
        xp_org=state.xp_org.at[slot].set(sel_row(xp, state.xp_org)),
        attempts=state.attempts.at[slot].set(sel_row(0, state.attempts)),
        successes=state.successes.at[slot].set(sel_row(0, state.successes)),
        lam=state.lam.at[slot].set(sel_row(lam0, state.lam)),
        prob=state.prob.at[slot].set(sel_row(uniform, state.prob)),
        palive=state.palive.at[slot].set(sel_row(True, state.palive)),
        match_attempts=state.match_attempts.at[slot].set(
            sel_row(0, state.match_attempts)
        ),
        sched=state.sched.at[slot].set(sel_row(False, state.sched)),
        next_label=state.next_label + jnp.where(doit, 1, 0).astype(state.next_label.dtype),
    )


def delete_mask(state: SlamState, kill: jnp.ndarray, zero_xp: bool = True) -> SlamState:
    """Delete all slots where kill[i] (monoslam.cpp:770-812 semantics: the
    feature's covariance rows/cols vanish; here they are zeroed and the slot
    freed for reuse). zero_xp=False skips the x/P zeroing when the caller
    already zeroed them (the fused update kernel does)."""
    MF = kill.shape[0]
    if zero_xp:
        keep_dims = jnp.concatenate(
            [jnp.ones(CAM_DIM, bool), jnp.repeat(~kill, SLOT_DIM)]
        )
        P = jnp.where(keep_dims[:, None] & keep_dims[None, :], state.P, 0.0)
        x = jnp.where(keep_dims, state.x, 0.0)
    else:
        P = state.P
        x = state.x
    return state._replace(
        x=x,
        P=P,
        active=state.active & ~kill,
        full=state.full & ~kill,
        label=jnp.where(kill, -1, state.label),
        attempts=jnp.where(kill, 0, state.attempts),
        successes=jnp.where(kill, 0, state.successes),
        palive=state.palive & ~kill[:, None],
        match_attempts=jnp.where(kill, 0, state.match_attempts),
        sched=state.sched & ~kill,
    )


def convert_feature(
    state: SlamState,
    slot: jnp.ndarray,        # [] i32
    lam_mean: jnp.ndarray,    # [] f64
    lam_cov: jnp.ndarray,     # [] f64
    enable: jnp.ndarray,      # [] bool
    onehot: bool = False,
) -> SlamState:
    """Ray -> 3D point conversion (feature.cpp:204-269) on the dense P.

    P rows for the slot become T P[slot6,:] with T = dyfi_by_dypi, the slot
    diagonal becomes T Pyy T' + b Plambda b', and the now-unused 3 dims are
    zeroed.

    onehot=True replaces every dynamic slice/update with one-hot matmuls and
    masked selects (bit-identical placement: E is 0/1 so each contraction
    sum has exactly one term). Used by the batch-mode step — a vmapped
    dynamic_update_slice lowers to a serial per-lane while on TPU.
    """
    off = slot_offset(slot)
    D = state.P.shape[0]

    if onehot:
        ar = jnp.arange(D, dtype=off.dtype)
        E = (ar[None, :] == (off + jnp.arange(SLOT_DIM, dtype=off.dtype))[:, None]
             ).astype(state.P.dtype)                          # [6,D]
        slotmask = (ar >= off) & (ar < off + SLOT_DIM)        # [D]
        y6 = E @ state.x
        yfi, T, b = models.part_convert_to_full(y6, lam_mean)
        old_rows = E @ state.P                                # [6,D]
        old_pyy = old_rows @ E.T                              # [6,6]
        new_rows3 = T @ old_rows
        new_pyy3 = T @ old_pyy @ T.T + b @ (lam_cov.reshape(1, 1)) @ b.T
        rows6 = jnp.zeros((SLOT_DIM, D), state.P.dtype).at[:3].set(new_rows3)
        rows6 = jnp.where(slotmask[None, :], 0.0, rows6)      # diag via pyy6
        pyy6 = jnp.zeros((SLOT_DIM, SLOT_DIM), state.P.dtype).at[:3, :3].set(new_pyy3)
        cleared = jnp.where(slotmask[:, None] | slotmask[None, :], 0.0, state.P)
        P_new = cleared + E.T @ rows6 + rows6.T @ E + E.T @ pyy6 @ E
        x6 = jnp.zeros(SLOT_DIM, state.x.dtype).at[:3].set(yfi)
        x_new = jnp.where(slotmask, E.T @ x6, state.x)
        P = jnp.where(enable, P_new, state.P)
        x = jnp.where(enable, x_new, state.x)
    else:
        zero = jnp.zeros_like(off)
        y6 = lax.dynamic_slice(state.x, (off,), (SLOT_DIM,))
        yfi, T, b = models.part_convert_to_full(y6, lam_mean)

        old_rows = lax.dynamic_slice(state.P, (off, zero), (SLOT_DIM, D))
        old_pyy = lax.dynamic_slice(state.P, (off, off), (SLOT_DIM, SLOT_DIM))

        new_rows3 = T @ old_rows                                  # [3, D]
        new_pyy3 = T @ old_pyy @ T.T + b @ (lam_cov.reshape(1, 1)) @ b.T

        # disabled conversions are exact no-ops via value-selected writes
        # (this runs unconditionally in the step; no state-wide `where`)
        rows6 = jnp.zeros((SLOT_DIM, D), state.P.dtype).at[:3].set(new_rows3)
        rows6 = jnp.where(enable, rows6, old_rows)
        P = lax.dynamic_update_slice(state.P, rows6, (off, zero))
        P = lax.dynamic_update_slice(P, rows6.T, (zero, off))
        pyy6 = jnp.zeros((SLOT_DIM, SLOT_DIM), state.P.dtype).at[:3, :3].set(new_pyy3)
        pyy6 = jnp.where(enable, pyy6, old_pyy)
        P = lax.dynamic_update_slice(P, pyy6, (off, off))

        x6 = jnp.zeros(SLOT_DIM, state.x.dtype).at[:3].set(yfi)
        old_x6 = lax.dynamic_slice(state.x, (off,), (SLOT_DIM,))
        x = lax.dynamic_update_slice(state.x, jnp.where(enable, x6, old_x6), (off,))

    return state._replace(
        x=x,
        P=P,
        full=state.full.at[slot].set(jnp.where(enable, True, state.full[slot])),
        palive=state.palive.at[slot].set(
            jnp.where(enable, jnp.zeros_like(state.palive[slot]), state.palive[slot])
        ),
    )


# -------------------- block accessors (for the step) --------------------


def slot_pxy(P: jnp.ndarray, MF: int) -> jnp.ndarray:
    """All camera-feature cross blocks: [MF, 13, 6]."""
    return P[:CAM_DIM, CAM_DIM:].reshape(CAM_DIM, MF, SLOT_DIM).transpose(1, 0, 2)


def slot_pyy(P: jnp.ndarray, MF: int) -> jnp.ndarray:
    """All feature diagonal blocks: [MF, 6, 6].

    (A flat 576-element index gather was measured SLOWER than this
    advanced-indexing form on v5e — 4.1us vs 3.7us/frame at MF=16 — despite
    the layout-transposing [MF,6,MF,6] copy the latter forces.)"""
    feat = P[CAM_DIM:, CAM_DIM:].reshape(MF, SLOT_DIM, MF, SLOT_DIM)
    idx = jnp.arange(MF)
    return feat[idx, :, idx, :]


def slot_states(x: jnp.ndarray, MF: int) -> jnp.ndarray:
    """All slot state vectors: [MF, 6]."""
    return x[CAM_DIM:].reshape(MF, SLOT_DIM)
