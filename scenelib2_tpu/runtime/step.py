"""go_one_step: the whole per-frame MonoSLAM pipeline as ONE jitted graph.

Stage order replicates MonoSLAM::GoOneStep (reference monoslam.cpp:108-180):

  1. EKF predict                                 kalman.cpp:50-69
  2. predict h,S for all features; visibility;   monoslam.cpp:187-308
     select up to 10 by largest trace(S)
  3. NSSD elliptical search for selected         monoslam.cpp:336-477
  4. joint EKF update + quaternion 'normalise'   kalman.cpp:72-119, :616-637
  5. delete consistently-failing features        monoslam.cpp:644-703
  6. covariance symmetrization                   monoslam.cpp:145-150
  7. if fast + mapping + map thin: auto-init     monoslam.cpp:823-1032
     (future-pose region proposal, drand48 tries, Shi-Tomasi patch)
  8. partial-feature particle matching, Bayes    monoslam.cpp:1299-1517
     update, prune, ray->point conversion, sell-by-date deletion

Everything is fixed-shape and masked: no recompiles across frames, no host
round-trips. Data-dependent structure (feature counts, selected sets,
ellipse extents, particle survival, drand48 consumption) is handled by masks
and state selection so a whole sequence can run under one lax.scan.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import ekf, models, motion
from scenelib2_tpu.core.camera import (
    CameraParams,
    measurement_noise,
    project as camera_project,
    project_jacobian as camera_project_jacobian,
)
from scenelib2_tpu.core.quaternion import quat_to_rotation_matrix
from scenelib2_tpu.kernels import correlate, shi_tomasi
from scenelib2_tpu.kernels.pallas_ekf import (
    pallas_joint_update_norm,
    pallas_joint_update_norm_compact,
)
from scenelib2_tpu.kernels.pallas_particle import (
    pallas_particle_predict_fused,
)
from scenelib2_tpu.kernels.pallas_score_map import pallas_score_maps
from scenelib2_tpu.kernels.pallas_search import (
    fused_search_img_pad,
    gather_windows_u8,
    pallas_elliptical_search,
    pallas_elliptical_search_fused,
)
from scenelib2_tpu.rng import drand48_many
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime.state import CAM_DIM, SLOT_DIM, SlamState

_NEG_INF = -jnp.inf

# ablation hook (scripts only): "init" / "heavy" force those lax.cond branch
# bodies to run EVERY frame with their gates as data — the bodies are exact
# no-ops when the gates are false, so decisions are identical and the
# device-time delta vs the gated build is the branch's true marginal cost in
# the benched scan graph
_ABLATE_FORCE = os.environ.get("SCENELIB2_FORCE_BRANCHES", "")


class StepOutputs(NamedTuple):
    r: jnp.ndarray            # [3] camera position (posterior)
    q: jnp.ndarray            # [4] camera quaternion
    xv: jnp.ndarray           # [13] full camera state
    speed: jnp.ndarray        # [] m/s estimate used for the mapping gate
    n_visible: jnp.ndarray    # [] i32
    n_selected: jnp.ndarray   # [] i32
    n_matched: jnp.ndarray    # [] i32
    n_active: jnp.ndarray     # [] i32
    n_partial: jnp.ndarray    # [] i32
    did_init: jnp.ndarray     # [] bool — new partial feature created
    did_convert: jnp.ndarray  # [] bool — some ray became a 3D point
    n_overflow: jnp.ndarray   # [] i32 — searches that hit the window cap
    # per-frame AR diagnostics (GraphicTool::DrawAR analog inputs)
    sel_slot: jnp.ndarray     # [NSEL] i32 selected slot ids (garbage where !sel)
    sel_mask: jnp.ndarray     # [NSEL] bool
    sel_h: jnp.ndarray        # [NSEL,2] predicted image positions
    sel_S: jnp.ndarray        # [NSEL,2,2] innovation covariances
    sel_z: jnp.ndarray        # [NSEL,2] matched pixel (valid where matched)
    sel_matched: jnp.ndarray  # [NSEL] bool
    # partial-feature / init observability (GraphicTool draws every partial
    # feature's per-particle search ellipses and the auto-init region box —
    # graphictool.cpp:704-797)
    init_box: jnp.ndarray     # [2] i32 (us, vs) of the init region (valid when did_init)
    par_slot: jnp.ndarray     # [MAXP] i32 partial slot ids
    par_mask: jnp.ndarray     # [MAXP] bool — slot particle-searched this frame
    par_h: jnp.ndarray        # [MAXP,NP,2] per-particle predicted positions
    par_sinv: jnp.ndarray     # [MAXP,NP,2,2] per-particle S^-1
    par_alive: jnp.ndarray    # [MAXP,NP] bool — particles searched


def pack_outputs(out: StepOutputs) -> jnp.ndarray:
    """Flatten StepOutputs into ONE 1-D float vector for lax.scan stacking.

    A scan emits one dynamic-update-slice per output leaf per iteration;
    with ~20 leaves that is ~10-15 us/frame of pure stacking overhead on
    TPU. Packing makes it a single slice. Lossless: every integer field is
    far below the float mantissa (slot ids < MF, counts < 2^16)."""
    dt = out.r.dtype
    parts = [
        out.r, out.q, out.xv,
        jnp.stack([
            out.speed.astype(dt),
            out.n_visible.astype(dt), out.n_selected.astype(dt),
            out.n_matched.astype(dt), out.n_active.astype(dt),
            out.n_partial.astype(dt), out.did_init.astype(dt),
            out.did_convert.astype(dt), out.n_overflow.astype(dt),
        ]),
        out.sel_slot.astype(dt), out.sel_mask.astype(dt),
        out.sel_h.reshape(-1).astype(dt), out.sel_S.reshape(-1).astype(dt),
        out.sel_z.reshape(-1).astype(dt), out.sel_matched.astype(dt),
        out.init_box.astype(dt),
        out.par_slot.astype(dt), out.par_mask.astype(dt),
        out.par_h.reshape(-1).astype(dt), out.par_sinv.reshape(-1).astype(dt),
        out.par_alive.reshape(-1).astype(dt),
    ]
    return jnp.concatenate(parts)


def unpack_outputs(flat: jnp.ndarray, nsel: int, maxp: int = 1, npart: int = 0) -> StepOutputs:
    """Inverse of pack_outputs; works on [K] or stacked [T, K] arrays.

    maxp/npart are the partial-slot capacity (max_features_to_init_at_once)
    and particle count of the Params the outputs were produced with."""
    def take(start, n):
        return flat[..., start : start + n]

    o = 0
    r = take(o, 3); o += 3
    q = take(o, 4); o += 4
    xv = take(o, 13); o += 13
    scal = take(o, 9); o += 9
    sel_slot = take(o, nsel); o += nsel
    sel_mask = take(o, nsel); o += nsel
    sel_h = take(o, 2 * nsel).reshape(*flat.shape[:-1], nsel, 2); o += 2 * nsel
    sel_S = take(o, 4 * nsel).reshape(*flat.shape[:-1], nsel, 2, 2); o += 4 * nsel
    sel_z = take(o, 2 * nsel).reshape(*flat.shape[:-1], nsel, 2); o += 2 * nsel
    sel_matched = take(o, nsel); o += nsel
    init_box = take(o, 2); o += 2
    par_slot = take(o, maxp); o += maxp
    par_mask = take(o, maxp); o += maxp
    par_h = take(o, 2 * maxp * npart).reshape(*flat.shape[:-1], maxp, npart, 2); o += 2 * maxp * npart
    par_sinv = take(o, 4 * maxp * npart).reshape(*flat.shape[:-1], maxp, npart, 2, 2); o += 4 * maxp * npart
    par_alive = take(o, maxp * npart).reshape(*flat.shape[:-1], maxp, npart); o += maxp * npart
    i32 = jnp.int32
    return StepOutputs(
        r=r, q=q, xv=xv,
        speed=scal[..., 0],
        n_visible=scal[..., 1].astype(i32),
        n_selected=scal[..., 2].astype(i32),
        n_matched=scal[..., 3].astype(i32),
        n_active=scal[..., 4].astype(i32),
        n_partial=scal[..., 5].astype(i32),
        did_init=scal[..., 6] > 0.5,
        did_convert=scal[..., 7] > 0.5,
        n_overflow=scal[..., 8].astype(i32),
        sel_slot=sel_slot.astype(i32),
        sel_mask=sel_mask > 0.5,
        sel_h=sel_h,
        sel_S=sel_S,
        sel_z=sel_z,
        sel_matched=sel_matched > 0.5,
        init_box=init_box.astype(i32),
        par_slot=par_slot.astype(i32),
        par_mask=par_mask > 0.5,
        par_h=par_h,
        par_sinv=par_sinv,
        par_alive=par_alive > 0.5,
    )


def make_step(params: Params, dtype=jnp.float64):
    """Build the jitted per-frame step for a given static configuration."""
    cam = CameraParams.from_params(params)
    MF = params.max_features
    NSEL = params.n_features_to_select
    NP = params.n_particles
    B = params.boxsize
    half = (B - 1) // 2
    W, H = params.cam_width, params.cam_height
    lam0 = jnp.asarray(st.lambda_grid(params))
    dxp_pad = ((0, 0), (0, CAM_DIM - 7))

    def step(state: SlamState, frame_u8: jnp.ndarray, enable_mapping) -> tuple[SlamState, StepOutputs]:
        enable_mapping = jnp.asarray(enable_mapping, bool)
        prev_r = state.x[0:3]

        # ---- 1. EKF predict + 2. predict measurements + select --------------
        fast_kpath = (
            (jnp.zeros((), jnp.float64).dtype == jnp.float32)
            and params.use_pallas
            and (not params.batch_mode or params.batch_pallas)
        )
        MAXP = max(1, params.max_features_to_init_at_once)
        # the fused kernel works on one zero-padded TDxTD block with TD the
        # 128-multiple >= D, up to D=384 (hires' 60 slots = D 373); truly
        # large maps (stress configs) keep the split predict + measure path
        fused_pm = (
            fast_kpath
            and not params.batch_mode
            and CAM_DIM + SLOT_DIM * MF <= 384
        )
        if fused_pm:
            # stages 1+2 fused: EKF predict (blockdiag F~ P F~'+Q~ on one
            # 128x128 tile) + the whole per-slot measurement chain with slot
            # blocks extracted in-kernel + top-NSEL selection and the
            # partial-slot pick — ONE dispatch instead of the ~70-op
            # motion/quaternion/scatter/slice/top_k/gather chain
            from scenelib2_tpu.kernels import pallas_measure as pmeas
            from scenelib2_tpu.kernels.pallas_predict_measure import (
                pallas_predict_measure,
            )

            (meas32, sel32, x, P, top_idx, top_score, n_visible,
             pidx, pmask) = pallas_predict_measure(
                state.x, state.P, state.xp_org, state.active & state.full,
                state.active & ~state.full, nsel=NSEL, maxp=MAXP,
                dt=params.delta_t, sd_a=params.sd_a, sd_alpha=params.sd_alpha,
                cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
                sd0=cam.sd, image_shape=(H, W),
                boundary=params.image_search_boundary,
                max_length_ratio=params.max_length_ratio,
                max_angle_difference=params.max_angle_difference,
            )
            meas = meas32.astype(dtype)
            sel = sel32.astype(dtype)
            # a pick is real iff its rank is below the visible count AND its
            # score survived the kernel's clamp (the kernel maps -inf AND any
            # non-finite score to exactly -3e38 for the one-hot contraction;
            # without the second clause a visible slot with degenerate S —
            # NaN score — would be demoted by the in-kernel ranking while
            # n_visible still counts it, letting a sanitized garbage column
            # pass as a real pick). n_visible itself stays the raw visible
            # count: it feeds the auto-init gate with reference semantics.
            sel_mask = (
                jnp.arange(NSEL, dtype=jnp.int32) < n_visible
            ) & (top_score > jnp.float32(-3e38))
            h_sel = sel[pmeas.O_H : pmeas.O_H + 2].T
            hx_sel = sel[pmeas.O_HX : pmeas.O_HX + 14].T.reshape(NSEL, 2, 7)
            hy_sel = sel[pmeas.O_HY : pmeas.O_HY + 6].T.reshape(NSEL, 2, 3)
            Rd_sel = sel[pmeas.O_RD]
            S_sel = jnp.stack(
                [sel[pmeas.O_S], sel[pmeas.O_S + 1],
                 sel[pmeas.O_S + 1], sel[pmeas.O_S + 2]], axis=1
            ).reshape(NSEL, 2, 2)
            sinv_sel = jnp.stack(
                [sel[pmeas.O_SINV], sel[pmeas.O_SINV + 1],
                 sel[pmeas.O_SINV + 1], sel[pmeas.O_SINV + 2]], axis=1
            ).reshape(NSEL, 2, 2)
            xp = x[:7]
            Pxx = P[:CAM_DIM, :CAM_DIM]
        elif fast_kpath:
            # batch mode (lane vmap) and large-D single-stream: separate XLA
            # predict + lane-parallel measurement kernel; per-slot chain
            # (rotation, projection, Jacobians, S_i, noise, visibility, 2x2
            # inverse, score) in ONE kernel; selection then gathers one
            # [NOUT, NSEL] column block
            from scenelib2_tpu.kernels import pallas_measure as pmeas

            u = jnp.zeros(3, dtype)
            x, P = ekf.predict(
                state.x, state.P, u, params.delta_t, params.sd_a, params.sd_alpha
            )
            xp = x[:7]
            pyy3 = st.slot_pyy(P, MF)[:, :3, :3]
            Pxx = P[:CAM_DIM, :CAM_DIM]
            ys3 = st.slot_states(x, MF)[:, :3]
            meas = pmeas.pallas_measure_predict(
                xp, Pxx[:7, :7], ys3, state.xp_org,
                st.slot_pxy(P, MF)[:, :7, :3], pyy3,
                state.active & state.full,
                cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
                sd0=cam.sd, image_shape=(H, W),
                boundary=params.image_search_boundary,
                max_length_ratio=params.max_length_ratio,
                max_angle_difference=params.max_angle_difference,
            ).astype(dtype)
            visible = state.active & state.full & (meas[pmeas.O_VIS] == 0.0)
            n_visible = jnp.sum(visible).astype(jnp.int32)
            score = meas[pmeas.O_SCORE]
            top_score, top_idx = lax.top_k(score, NSEL)
            sel_mask = top_score > _NEG_INF
            sel = meas[:, top_idx]                          # [NOUT, NSEL]
            h_sel = sel[pmeas.O_H : pmeas.O_H + 2].T
            hx_sel = sel[pmeas.O_HX : pmeas.O_HX + 14].T.reshape(NSEL, 2, 7)
            hy_sel = sel[pmeas.O_HY : pmeas.O_HY + 6].T.reshape(NSEL, 2, 3)
            Rd_sel = sel[pmeas.O_RD]
            S_sel = jnp.stack(
                [sel[pmeas.O_S], sel[pmeas.O_S + 1],
                 sel[pmeas.O_S + 1], sel[pmeas.O_S + 2]], axis=1
            ).reshape(NSEL, 2, 2)
            sinv_sel = jnp.stack(
                [sel[pmeas.O_SINV], sel[pmeas.O_SINV + 1],
                 sel[pmeas.O_SINV + 1], sel[pmeas.O_SINV + 2]], axis=1
            ).reshape(NSEL, 2, 2)
        else:
            u = jnp.zeros(3, dtype)
            x, P = ekf.predict(
                state.x, state.P, u, params.delta_t, params.sd_a, params.sd_alpha
            )
            xp = x[:7]
            ys3 = st.slot_states(x, MF)[:, :3]
            pxy3 = st.slot_pxy(P, MF)[:, :, :3]
            pyy3 = st.slot_pyy(P, MF)[:, :3, :3]
            Pxx = P[:CAM_DIM, :CAM_DIM]

            def per_slot(y, pxy_i, pyy_i, xp_org):
                h, hx7, hy, zeroed = models.full_predict_measurement(cam, y, xp)
                R = measurement_noise(cam, h)
                S = models.innovation_covariance(
                    Pxx, pxy_i, pyy_i, jnp.pad(hx7, dxp_pad), hy, R
                )
                vis = models.full_visibility_test(
                    cam, xp, y, xp_org, h,
                    params.image_search_boundary, params.max_length_ratio,
                    params.max_angle_difference,
                )
                return h, hx7, hy, R, S, vis

            h_all, hx_all, hy_all, R_all, S_all, vis_all = jax.vmap(per_slot)(
                ys3, pxy3, pyy3, state.xp_org
            )
            visible = state.active & state.full & (vis_all == 0)
            n_visible = jnp.sum(visible).astype(jnp.int32)
            score = jnp.where(visible, S_all[:, 0, 0] + S_all[:, 1, 1], _NEG_INF)
            top_score, top_idx = lax.top_k(score, NSEL)
            sel_mask = top_score > _NEG_INF
            h_sel = h_all[top_idx]
            hx_sel = hx_all[top_idx]
            hy_sel = hy_all[top_idx]
            Rd_sel = R_all[top_idx][:, 0, 0]
            S_sel = S_all[top_idx]
            sinv_sel = jax.vmap(ekf.inv2x2_via_chol)(S_sel)
        n_selected = jnp.sum(sel_mask).astype(jnp.int32)

        # ---- 3. integer sums + windowed search -------------------------------
        # Selected features get window-local cross sums (one small grouped
        # int32 conv over ~10% of the frame); only the MAXP partial slots
        # need full-image maps (their particle clouds span wide regions).
        # Partials are identified up front; a feature initialised later this
        # frame is never searched on its first frame (monoslam.cpp:1366).
        if not fused_pm:
            pvals, pidx = lax.top_k(
                (state.active & ~state.full).astype(jnp.int32), MAXP
            )
            pmask = pvals > 0
        u0_sel, v0_sel, _, _ = correlate.search_window_origin(
            h_sel, params.search_win_radius, W, H, B, round_half=True
        )
        img32 = None
        if fast_kpath and not params.batch_mode:
            # ONE padded f32 frame shared by every image kernel this frame
            # (each wrapper otherwise pads its own copy)
            ph1, pw1 = fused_search_img_pad(
                (H, W), boxsize=B, win_radius=params.search_win_radius
            )
            ph = max(ph1, (H + 7) // 8 * 8)
            pw = max(pw1, (W + 127) // 128 * 128)
            img32 = jnp.pad(
                frame_u8.astype(jnp.float32), ((0, ph - H), (0, pw - W))
            )
        if params.use_pallas and (not params.batch_mode or params.batch_pallas):
            s_found, s_u, s_v, s_best, s_over = pallas_elliptical_search_fused(
                frame_u8, None, u0_sel, v0_sel,
                h_sel, sinv_sel, sel_mask,
                image_shape=(H, W), boxsize=B,
                win_radius=params.search_win_radius,
                no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
                corr_sigma_thresh=params.corr_sigma_thresh,
                patch_rows=state.patch_rows[top_idx],
                img_f32=img32,
            )
            search = correlate.SearchResult(
                found=s_found, u=s_u, v=s_v, best=s_best, overflow=s_over
            )
        elif params.use_pallas:
            # batch mode: the fused variant would materialize a padded f32
            # frame PER vmapped lane; the pre-gathered-window kernel keeps
            # per-lane inputs at [NSEL, sw, sw]. (Index-grid gathers were
            # measured 4x slower under the outer vmap — keep dynamic slices.)
            wins = gather_windows_u8(
                frame_u8, u0_sel, v0_sel, params.search_win_radius, B
            )
            s_found, s_u, s_v, s_best, s_over = pallas_elliptical_search(
                wins, state.patches[top_idx], u0_sel, v0_sel,
                h_sel, sinv_sel, sel_mask,
                image_shape=(H, W), boxsize=B,
                win_radius=params.search_win_radius,
                no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
                corr_sigma_thresh=params.corr_sigma_thresh,
            )
            search = correlate.SearchResult(
                found=s_found, u=s_u, v=s_v, best=s_best, overflow=s_over
            )
        else:
            fsums = correlate.frame_sums(frame_u8, B)
            cross_win = correlate.cross_sum_windows(
                frame_u8, state.patches[top_idx], u0_sel, v0_sel,
                params.search_win_radius, B, index_gather=params.index_gather,
            )
            sg0_sel, sg0sq_sel = correlate.patch_stats(state.patches[top_idx])
            search = correlate.elliptical_search_batch(
                fsums, cross_win, sg0_sel, sg0sq_sel, u0_sel, v0_sel,
                h_sel, sinv_sel, sel_mask, B,
                win_radius=params.search_win_radius,
                no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
                corr_sigma_thresh=params.corr_sigma_thresh,
                index_gather=params.index_gather,
            )
        succ = search.found                                   # [NSEL]
        z_sel = jnp.stack([search.u, search.v], axis=1).astype(dtype)
        nu_sel = jnp.where(succ[:, None], z_sel - h_sel, 0.0)
        n_matched = jnp.sum(succ).astype(jnp.int32)

        # ---- 4. joint EKF update + normalise (masked) ------------------------
        D = x.shape[0]
        offs = CAM_DIM + SLOT_DIM * top_idx
        any_succ = n_matched > 0

        fast_mode = jnp.zeros((), jnp.float64).dtype == jnp.float32
        fused_update = (
            fast_mode and params.use_pallas and not params.batch_mode and D <= 384
        )

        def _xla_bookkeeping():
            # ---- 5./6. bad-feature deletion mask (XLA form) ----------------
            attempts = state.attempts.at[top_idx].add(sel_mask.astype(jnp.int32))
            successes = state.successes.at[top_idx].add(succ.astype(jnp.int32))
            ratio = jnp.where(
                attempts > 0,
                successes.astype(dtype) / attempts.astype(dtype), 1.0,
            )
            bad = (
                state.active
                & (attempts >= params.min_attempted_measurements)
                & (ratio < params.successful_match_fraction)
            )
            # exterminate_features iterator-skip replication: delete_feature's
            # vector::erase invalidates the already-incremented loop iterator
            # (monoslam.cpp:663-703), so the feature at the list position
            # right after a deleted one is SKIPPED that frame. It keeps its
            # persistent scheduled_for_termination_flag_ (feature.h:134) and
            # dies on a later pass even if its match ratio recovered. Closed
            # form: in list order (ascending label among active slots,
            # partials included), within each maximal run of consecutively-
            # scheduled positions only even run-offsets die this frame.
            sched1 = (state.sched | bad) & state.active
            pos = jnp.arange(MF, dtype=jnp.int32)
            order = jnp.argsort(
                jnp.where(state.active, state.label, jnp.int32(1 << 30))
            )
            S = sched1[order]
            run_start = jax.lax.cummax(jnp.where(S, 0, pos + 1))
            kill_pos = S & ((pos - run_start) % 2 == 0)
            kill = jnp.zeros(MF, bool).at[order].set(kill_pos)
            return attempts, successes, kill, sched1 & ~kill

        if fused_update and fast_kpath:
            # update + normalise + gate + delete-zeroing + symmetrize as ONE
            # kernel (pallas_ekf.py); H/R/nu are assembled IN-KERNEL from the
            # measurement kernel's selected-column block, and the feature
            # bookkeeping (counter scatter-adds, failure-ratio test, the
            # exterminate argsort/cummax closed form, keep-dims expansion)
            # runs in the same kernel. delete_mask then only flips flags.
            (x, P, attempts, successes, sched_after, kill) = (
                pallas_joint_update_norm_compact(
                    x, P, sel, z_sel, succ, offs.astype(jnp.int32), None,
                    meas_rows=(pmeas.O_HX, pmeas.O_HY, pmeas.O_RD, pmeas.O_H),
                    bookkeeping=(
                        state.attempts, state.successes, state.sched,
                        state.active, state.label,
                    ),
                    sel_mask=sel_mask, top_idx=top_idx.astype(jnp.int32),
                    mina=float(params.min_attempted_measurements),
                    frac=float(params.successful_match_fraction),
                )
            )
            mid_state = state._replace(
                x=x, P=P, attempts=attempts, successes=successes,
                sched=sched_after,
            )
            mid_state = st.delete_mask(mid_state, kill, zero_xp=False)
        else:
            attempts, successes, kill, sched_after = _xla_bookkeeping()
            # Scatter the 2x3 feature blocks via a one-hot contraction (a
            # vmapped dynamic_update_slice lowers to a serial while on TPU).
            col_ids = offs[:, None] + jnp.arange(3, dtype=top_idx.dtype)[None, :]
            onehot = (col_ids[:, :, None] == jnp.arange(D)[None, None, :]).astype(dtype)
            hy_masked = jnp.where(succ[:, None, None], hy_sel, 0.0)
            H_rows = jnp.einsum("kij,kjd->kid", hy_masked, onehot)
            H_rows = H_rows.at[:, :, :7].set(
                jnp.where(succ[:, None, None], hx_sel, 0.0)
            )
            H_tot = H_rows.reshape(2 * NSEL, D)
            R_blocks = jnp.where(
                succ[:, None, None],
                Rd_sel[:, None, None] * jnp.eye(2, dtype=dtype),
                jnp.eye(2, dtype=dtype),
            )
            R_tot = (
                jnp.zeros((NSEL, 2, NSEL, 2), dtype)
                .at[jnp.arange(NSEL), :, jnp.arange(NSEL), :]
                .set(R_blocks)
                .reshape(2 * NSEL, 2 * NSEL)
            )
            nu_tot = nu_sel.reshape(2 * NSEL)
            if fused_update:
                keep_dims = jnp.concatenate(
                    [jnp.ones(CAM_DIM, bool), jnp.repeat(~kill, SLOT_DIM)]
                )
                x, P = pallas_joint_update_norm(
                    x, P, H_tot, nu_tot, R_tot, any_succ, keep_dims
                )
                mid_state = state._replace(
                    x=x, P=P, attempts=attempts, successes=successes,
                    sched=sched_after,
                )
                mid_state = st.delete_mask(mid_state, kill, zero_xp=False)
            else:
                x_upd, P_upd, _ = ekf.joint_update(
                    x, P, H_tot, nu_tot, R_tot, pallas_chol=not params.batch_mode
                )
                x_upd, P_upd = ekf.normalise(x_upd, P_upd)
                x = jnp.where(any_succ, x_upd, x)
                P = jnp.where(any_succ, P_upd, P)
                mid_state = state._replace(
                    x=x, P=P, attempts=attempts, successes=successes,
                    sched=sched_after,
                )
                mid_state = st.delete_mask(mid_state, kill)
                mid_state = mid_state._replace(P=ekf.symmetrize(mid_state.P))
        x, P = mid_state.x, mid_state.P

        # ---- 7. speed gate + auto feature initialisation ----------------------
        r_now = x[0:3]
        vel = (r_now - prev_r) / params.delta_t
        speed = jnp.sqrt(jnp.sum(vel * vel))
        n_partial = jnp.sum(mid_state.active & ~mid_state.full).astype(jnp.int32)
        want_init = (
            (speed > params.min_speed_for_init)
            & enable_mapping
            & (n_visible < params.n_features_to_keep_visible)
            & (n_partial < params.max_features_to_init_at_once)
        )

        # (A round-5 restructure — small-carry proposal cond + the ray
        # insertion deferred into stage 8's surgery cond — was measured
        # SLOWER on device: 98.0 vs 91.7 us/frame with the fingerprint
        # unchanged. The full-state cond pair below stays; see BENCH_SUITE
        # negative results.)
        # the whole proposal+detection pipeline is skipped via lax.cond on
        # frames that fail the cheap gates (steady-state maps rarely init)
        if "init" in _ABLATE_FORCE:
            # ablation: run the branch body every frame with want_init as
            # data (the body is an exact no-op when the gate is false), so
            # device-time deltas measure the branch's marginal cost with
            # decisions unchanged
            mid_state, did_init, init_box = _auto_initialise(
                mid_state, frame_u8, cam, params, lam0, want_init, img32
            )
        else:
            mid_state, did_init, init_box = lax.cond(
                want_init,
                lambda s: _auto_initialise(
                    s, frame_u8, cam, params, lam0, jnp.asarray(True), img32
                ),
                lambda s: (s, jnp.asarray(False), jnp.zeros(2, jnp.int32)),
                mid_state,
            )
        x, P = mid_state.x, mid_state.P

        # ---- 8. match partially-initialised features --------------------------
        # Heavy particle work (full-image conv for the partial patch,
        # per-particle predictions, search, Bayes) runs under lax.cond only
        # when some partial feature is actually measurable this frame; the
        # always-on part is just the match_attempts increment
        # (monoslam.cpp:1366 semantics preserved in both branches).
        making_any = jnp.any(
            mid_state.active & ~mid_state.full & (mid_state.match_attempts != 0)
        )

        def heavy(s: SlamState):
            if (params.use_pallas and fast_mode and not params.batch_mode
                    and MAXP == 1):
                # frame mode: the fused search+bayes kernel builds the
                # penalized score map in-kernel over ONLY the union-box
                # blocks — no whole-frame score kernel at all
                corr_maps = img32
            elif params.use_pallas and fast_mode and (not params.batch_mode or params.batch_pallas):
                # one fused VMEM-resident kernel (box sums + cross-corr +
                # NSSD + penalty); bit-identical to the XLA f32 map
                corr_maps = pallas_score_maps(
                    frame_u8, None, boxsize=B,
                    corr_sigma_thresh=params.corr_sigma_thresh,
                    low_sigma_penalty=params.low_sigma_penalty,
                    patch_rows=s.patch_rows[pidx],
                    img_f32=img32,
                    return_padded=not params.batch_mode,
                ).astype(dtype)
            else:
                fsums_p = correlate.frame_sums(frame_u8, B)
                cross_part = correlate.cross_sum_maps(frame_u8, s.patches[pidx], B)
                sg0_part, sg0sq_part = correlate.patch_stats(s.patches[pidx])

                def score_map(cross_j, sg0_j, sg0sq_j):
                    return correlate.penalized_score_map(
                        fsums_p, cross_j, sg0_j, sg0sq_j, B,
                        params.corr_sigma_thresh, params.low_sigma_penalty,
                    )

                corr_maps = jax.vmap(score_map)(cross_part, sg0_part, sg0sq_part)
            return _match_partial_features(
                s, corr_maps, pidx, pmask, cam, params, dtype
            )

        def light(s: SlamState):
            is_p = s.active & ~s.full
            return (
                s._replace(
                    match_attempts=jnp.where(is_p, s.match_attempts + 1, s.match_attempts)
                ),
                jnp.asarray(False),
                jnp.int32(0),
                (
                    jnp.zeros((MAXP, NP, 2), dtype),
                    jnp.zeros((MAXP, NP, 2, 2), dtype),
                    jnp.zeros((MAXP, NP), bool),
                ),
            )

        # Fast single-stream SMALL-MAP mode runs the particle branch EVERY
        # frame with `making` as data instead of gating it behind lax.cond:
        # the body is an exact no-op when no partial feature is measurable
        # (masked kernels; sell-by/convert gates all false), and the
        # device-time ablation measured the ungated form at no extra cost at
        # 320x240 — the cond boundary is a scheduling barrier worth as much
        # as the body (BENCH_SUITE.md). At hires the always-on score map is
        # no longer free (~45us/frame measured at 640x480/60 slots), so
        # large-map configs keep the cond, as do f64 parity and batch modes.
        heavy_always = (
            fast_mode and params.use_pallas and not params.batch_mode
            and CAM_DIM + SLOT_DIM * MF <= 128
        ) or ("heavy" in _ABLATE_FORCE)
        if heavy_always:
            mid_state, did_convert, n_p_overflow, (par_h, par_sinv, par_alive) = heavy(
                mid_state
            )
        else:
            mid_state, did_convert, n_p_overflow, (par_h, par_sinv, par_alive) = lax.cond(
                making_any, heavy, light, mid_state
            )

        out = StepOutputs(
            r=mid_state.x[0:3],
            q=mid_state.x[3:7],
            xv=mid_state.x[:CAM_DIM],
            speed=speed,
            n_visible=n_visible,
            n_selected=n_selected,
            n_matched=n_matched,
            n_active=jnp.sum(mid_state.active).astype(jnp.int32),
            n_partial=jnp.sum(mid_state.active & ~mid_state.full).astype(jnp.int32),
            did_init=did_init,
            did_convert=did_convert,
            n_overflow=jnp.sum(search.overflow).astype(jnp.int32) + n_p_overflow,
            sel_slot=top_idx.astype(jnp.int32),
            sel_mask=sel_mask,
            sel_h=h_sel,
            sel_S=S_sel,
            sel_z=z_sel,
            sel_matched=succ,
            init_box=init_box,
            par_slot=pidx.astype(jnp.int32),
            par_mask=jnp.any(par_alive, axis=1),
            par_h=par_h,
            par_sinv=par_sinv,
            par_alive=par_alive,
        )
        return mid_state._replace(frame_no=mid_state.frame_no + 1), out

    return step


# ---------------------------------------------------------------------------
# Stage 7: auto feature initialisation (monoslam.cpp:823-1032, 1211-1276)
# ---------------------------------------------------------------------------


def _auto_initialise(state: SlamState, frame_u8, cam: CameraParams, params: Params,
                     lam0, want_init, img32=None):
    MF = params.max_features
    B = params.boxsize
    half = (B - 1) // 2
    W, H = params.cam_width, params.cam_height
    RW, RH = params.init_search_width, params.init_search_height
    x = state.x

    if (x.dtype == jnp.float32 and params.use_pallas and not params.batch_mode
            and MF <= 128):
        # (MF <= 128: the proposal kernel lays slots out on one 128-lane row
        # — larger capacities fall through to the XLA chain below)
        # the WHOLE proposal chain (rollforward, future-point projection,
        # safe box, occupancy projections, drand48 draws, region tries,
        # Shi-Tomasi) as ONE kernel — it was ~500 compiled ops of mostly
        # scalar math (pallas_propose.py; op-for-op f32 mirror, verified
        # against this XLA chain in tests/test_pallas_propose.py). Running it
        # for batch lanes too was measured a wash (16725 vs 16882 aggregate
        # fps, decisions identical): the vmapped XLA chain already amortizes
        # its op count across 64 lanes — batch keeps the XLA form.
        from scenelib2_tpu.kernels.pallas_propose import pallas_propose_init
        from scenelib2_tpu.kernels.pallas_shi_tomasi import (
            pallas_shi_tomasi_region,
        )

        region_us, region_vs, any_ok, rng_new = pallas_propose_init(
            x, state.rng, state.active & state.full, want_init,
            image_shape=(H, W), region_w_cfg=RW, region_h_cfg=RH, boxsize=B,
            tries=params.init_region_tries, sep=params.feature_separation_min,
            dtN=params.init_steps_to_predict * params.delta_t,
            depth=params.init_depth_hypothesis,
            cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
        )
        state = state._replace(rng=rng_new)
        # patch pick on the picked region: the separate Element-DMA'd kernel
        # fetches only the ~90KB window (a whole-frame VMEM operand in the
        # proposal kernel measured ~20us of block DMA per call)
        ru, rv, ruf, rvf = shi_tomasi.clamp_region(
            region_us, region_vs, region_us + RW, region_vs + RH, W, H, B
        )
        ubest, vbest, evbest = pallas_shi_tomasi_region(
            frame_u8, ru, rv, ruf, rvf, boxsize=B, image_shape=(H, W),
            region_w=RW, region_h=RH, img_f32=img32,
        )
        do_init = any_ok & (evbest > params.init_patch_score_thresh)

        def _insert_k(s: SlamState) -> SlamState:
            patch = lax.dynamic_slice(
                frame_u8, (vbest - half, ubest - half), (B, B)
            )
            z = jnp.stack([ubest, vbest]).astype(x.dtype)
            return st.add_partial_feature(
                s, cam, z, patch, lam0, do_init, onehot=False
            )

        state = lax.cond(do_init, _insert_k, lambda s: s, state)
        return state, do_init, jnp.stack([region_us, region_vs]).astype(jnp.int32)

    # roll the motion model forward (monoslam.cpp:880-883); unrolled — a
    # 10-iteration lax.scan of 13-dim ops costs ~0.8 ms/frame as a TPU while.
    # Jacobian-free, exactly like the reference's func_fv-only rollforward.
    # Fast mode: with u=0, v and omega are constant across the rollforward,
    # so ten steps collapse to r + N*dt*v and one rotation by N*dt*omega
    # (same axis => q(w*dt)^N == q(N*w*dt) exactly in reals; ULP differences
    # only perturb the region proposal at trunc() boundaries). The f64
    # parity path keeps the literal 10-step loop.
    if x.dtype == jnp.float32:
        from scenelib2_tpu.core.quaternion import quat_from_angular_velocity, quat_mul

        dtN = params.init_steps_to_predict * params.delta_t
        xv_fut = jnp.concatenate(
            [
                x[0:3] + x[7:10] * dtN,
                quat_mul(x[3:7], quat_from_angular_velocity(x[10:13] * dtN)),
                x[7:CAM_DIM],
            ]
        )
    else:
        xv_fut = x[:CAM_DIM]
        u_zero = jnp.zeros(3, x.dtype)
        for _ in range(params.init_steps_to_predict):
            xv_fut = motion.func_fv(xv_fut, u_zero, params.delta_t)
    yW = xv_fut[0:3] + quat_to_rotation_matrix(xv_fut[3:7]) @ jnp.array(
        [0.0, 0.0, params.init_depth_hypothesis], x.dtype
    )
    xp = x[:7]
    hi_fut, _, _, _ = models.full_predict_measurement(cam, yW, xp)
    pm_u = W / 2.0 - hi_fut[0]
    pm_v = H / 2.0 - hi_fut[1]
    safe_us = jnp.trunc(-pm_u).astype(jnp.int32)
    safe_vs = jnp.trunc(-pm_v).astype(jnp.int32)
    safe_uf = jnp.trunc(W - pm_u).astype(jnp.int32)
    safe_vf = jnp.trunc(H - pm_v).astype(jnp.int32)
    lo = half + 1
    safe_us = jnp.maximum(safe_us, lo)
    safe_uf = jnp.minimum(safe_uf, W - half - 1)
    safe_vs = jnp.maximum(safe_vs, lo)
    safe_vf = jnp.minimum(safe_vf, H - half - 1)
    room = (safe_uf - safe_us > RW) & (safe_vf - safe_vs > RH)

    # current projections of fully-initialised features (monoslam.cpp:962-984)
    ys3 = st.slot_states(x, MF)[:, :3]

    def proj(y):
        h, _, _, zeroed = models.full_predict_measurement(cam, y, xp)
        return h, zeroed[2]

    h_now, zz = jax.vmap(proj)(ys3)
    occupied = state.active & state.full & (zz > 0)

    # up to 5 random tries, 2 drand48 draws each (monoslam.cpp:986-1021)
    tries = params.init_region_tries
    states_r, vals_r = drand48_many(state.rng, 2 * tries)
    sep = params.feature_separation_min

    def try_region(i):
        u_off = jnp.trunc((safe_uf - safe_us - RW).astype(jnp.float64) * vals_r[2 * i]).astype(jnp.int32)
        v_off = jnp.trunc((safe_vf - safe_vs - RH).astype(jnp.float64) * vals_r[2 * i + 1]).astype(jnp.int32)
        us = safe_us + u_off
        vs = safe_vs + v_off
        clash = jnp.any(
            occupied
            & (h_now[:, 0] >= us - sep)
            & (h_now[:, 0] < us + RW + sep)
            & (h_now[:, 1] >= vs - sep)
            & (h_now[:, 1] < vs + RH + sep)
        )
        return us, vs, ~clash

    us_all, vs_all, ok_all = jax.vmap(try_region)(jnp.arange(tries))
    attempt_search = want_init & room
    any_ok = jnp.any(ok_all) & attempt_search
    first_ok = jnp.argmax(ok_all)
    # drand48 stream consumption (0 / 2*(i+1) / 2*tries draws)
    consumed = jnp.where(
        attempt_search, jnp.where(jnp.any(ok_all), 2 * (first_ok + 1), 2 * tries), 0
    )
    rng_new = jnp.where(
        consumed == 0, state.rng, states_r[jnp.maximum(consumed - 1, 0)]
    )  # state.rng is [3] u32 limbs; broadcast over limbs

    region_us = us_all[first_ok]
    region_vs = vs_all[first_ok]

    # Shi-Tomasi best patch inside the region (monoslam.cpp:1043-1205);
    # gradients + integer box sums + f64 eigen math all on the sliced
    # region window only (~12x less than full-frame maps)
    ru, rv, ruf, rvf = shi_tomasi.clamp_region(
        region_us, region_vs, region_us + RW, region_vs + RH, W, H, B
    )
    if x.dtype == jnp.float32 and params.use_pallas and (
        not params.batch_mode or params.batch_pallas
    ):
        from scenelib2_tpu.kernels.pallas_shi_tomasi import pallas_shi_tomasi_region

        ubest, vbest, evbest = pallas_shi_tomasi_region(
            frame_u8, ru, rv, ruf, rvf, boxsize=B, image_shape=(H, W),
            region_w=RW, region_h=RH,
        )
    else:
        ubest, vbest, evbest = shi_tomasi.find_best_patch_in_image_window(
            frame_u8, B, ru, rv, ruf, rvf, region_w=RW, region_h=RH
        )

    do_init = any_ok & (evbest > params.init_patch_score_thresh)

    state = state._replace(rng=rng_new)
    # the ray insertion (patch crop, unprojection + quaternion Jacobians,
    # covariance-row surgery — ~400 compiled ops of mostly scalar math) only
    # matters when the Shi-Tomasi score clears the threshold; add_partial is
    # an exact no-op when disabled, so skipping it via a real cond is
    # decision-identical. Batch mode keeps the unconditional masked form (a
    # vmapped cond evaluates both arms as selects).
    def _insert(s: SlamState) -> SlamState:
        patch = lax.dynamic_slice(frame_u8, (vbest - half, ubest - half), (B, B))
        z = jnp.stack([ubest, vbest]).astype(x.dtype)
        return st.add_partial_feature(
            s, cam, z, patch, lam0, do_init, onehot=params.batch_mode
        )

    if params.batch_mode:
        state = _insert(state)
    else:
        state = lax.cond(do_init, _insert, lambda s: s, state)
    return state, do_init, jnp.stack([region_us, region_vs]).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Stage 8: partial feature particle matching (monoslam.cpp:1299-1517)
# ---------------------------------------------------------------------------


def _match_partial_features(state: SlamState, corr_maps,
                            pidx, pmask, cam: CameraParams, params: Params, dtype):
    """Particle matching on the compact partial-slot set.

    pidx/pmask identify the (at most max_features_to_init_at_once) partial
    slots as of the START of the frame; a feature auto-initialised THIS frame
    is deliberately absent — the reference never measures a partial feature
    on its first frame (monoslam.cpp:1366) and its fresh counters cannot
    trigger deletion. corr_maps are its rows of the penalized score maps
    (the reference's correlation-cache analog).
    """
    MF = params.max_features
    NP = params.n_particles
    MAXP = pidx.shape[0]
    x, P = state.x, state.P
    xp = x[:7]
    Pxx = P[:CAM_DIM, :CAM_DIM]

    is_partial = state.active & ~state.full
    making_all = is_partial & (state.match_attempts != 0)
    match_attempts = jnp.where(is_partial, state.match_attempts + 1, state.match_attempts)

    making = pmask & making_all[pidx]                   # [MAXP]

    fast_mode = jnp.zeros((), jnp.float64).dtype == jnp.float32
    fused_sb = (
        fast_mode and params.use_pallas and not params.batch_mode and MAXP == 1
    )
    if fused_sb:
        # one-hot MXU extraction of the slot blocks: rows6 = E P, pyy = E P E'
        # (exact under the package-wide HIGHEST matmul precision — 0/1
        # contractions have exactly one term). The build-all-slots-then-
        # gather forms cost ~5us/frame of gather work at MF=16; a plain
        # dynamic_slice was measured worse still (BENCH_SUITE negative list).
        off = CAM_DIM + SLOT_DIM * pidx[0]
        D = x.shape[0]
        E6 = (
            (off + jnp.arange(SLOT_DIM, dtype=pidx.dtype))[:, None]
            == jnp.arange(D, dtype=pidx.dtype)[None, :]
        ).astype(P.dtype)                               # [6, D]
        rows6 = E6 @ P                                  # [6, D]
        ys6 = (E6 @ x)[None]                            # [1, 6]
        pxy6 = rows6[:, :CAM_DIM].T[None]               # [1, 13, 6]
        pyy6 = (rows6 @ E6.T)[None]                     # [1, 6, 6]
        prob_c = None                                   # stays full-width
    else:
        ys6 = st.slot_states(x, MF)[pidx]               # [MAXP,6]
        pxy6 = st.slot_pxy(P, MF)[pidx]                 # [MAXP,13,6]
        pyy6 = st.slot_pyy(P, MF)[pidx]                 # [MAXP,6,6]
        prob_c = state.prob[pidx]
    lam_c = state.lam[pidx]                             # [MAXP,NP]
    palive_c = state.palive[pidx]

    # per-(slot, particle) predicted measurement + innovation covariance;
    # the lambda-independent ray geometry (part_zeroedyi: quaternion rotation
    # + Jacobians) is hoisted OUT of the particle vmap — XLA does not CSE
    # broadcast-invariant work across a vmapped axis (~0.7 ms/frame saved)
    Pxx7 = Pxx[:7, :7]
    # fast (f32) mode: the measurement Jacobian factors as
    #   [hx7|hy6] = A(lam) @ (N1 + lam*N2)   with A = dproject/dhLR,
    # so S = A (N1+lam N2) C (N1+lam N2)' A' + R = A (K0 + lam Ksym + lam^2 K2) A' + R
    # with K0/Ksym/K2 lambda-INDEPENDENT 3x3 blocks: ~10 per-particle batched
    # matmuls collapse into 2. The f64 parity path keeps the reference's
    # exact operation order (part_feature_model.cpp:231-265).
    fast = jnp.zeros((), jnp.float64).dtype == jnp.float32

    if fast:
        # lambda-independent per-slot geometry only; the per-particle chain
        # runs as ONE lane-parallel Pallas kernel (pallas_particle.py — the
        # vmapped form is ~300 [1,NP]-shaped micro-fusions of pure
        # instruction overhead). Batch mode keeps the K-form but evaluates
        # the per-particle tail as vmapped XLA (a single-invocation Pallas
        # kernel serializes across a vmapped batch axis).
        def slot_geom(y6, pxy_i, pyy_i):
            zeroed, dz_by_dxp, dz_by_dyi = models.part_zeroedyi(y6, xp)
            pxy7 = pxy_i[:7]
            Ctop = jnp.concatenate([Pxx7, pxy7], axis=1)             # [7,13]
            Cbot = jnp.concatenate([pxy7.T, pyy_i], axis=1)          # [6,13]
            C = jnp.concatenate([Ctop, Cbot], axis=0)                # [13,13]
            N1 = jnp.concatenate([dz_by_dxp[0:3], dz_by_dyi[0:3]], axis=1)  # [3,13]
            N2 = jnp.concatenate([dz_by_dxp[3:6], dz_by_dyi[3:6]], axis=1)
            CN1 = C @ N1.T                                           # [13,3]
            CN2 = C @ N2.T
            K0 = N1 @ CN1
            K12 = N1 @ CN2
            K2 = N2 @ CN2
            return zeroed, K0, K12 + K12.T, K2

        if fused_sb:
            # merged predict: the whole per-particle chain runs INSIDE
            # pallas_search_bayes (one dispatch instead of two and no HBM
            # round-trip for the pred rows); here only its SMEM operand rows
            # are packed (same layout as the predict kernel wrapper). hpi /
            # sinv for the AR outputs are rebuilt from the returned rows.
            hpi = sinv = dets = pred_raw = None
            sb_shared = jnp.concatenate(
                [xp.astype(jnp.float32), Pxx7.reshape(49).astype(jnp.float32)]
            ).reshape(1, -1)
            sb_slot = jnp.concatenate(
                [
                    ys6.astype(jnp.float32),
                    pxy6[:, :7, :].reshape(MAXP, 42).astype(jnp.float32),
                    pyy6.reshape(MAXP, 36).astype(jnp.float32),
                ],
                axis=1,
            )
        elif (params.batch_mode and not params.batch_pallas) or not params.use_pallas:
            zeroed_c, K0c, Ksymc, K2c = jax.vmap(slot_geom)(ys6, pxy6, pyy6)

            def kform_slot(zeroed, K0, Ksym, K2, lam_row):
                def kform_particle(lam_p):
                    hLR = zeroed[0:3] + lam_p * zeroed[3:6]
                    hpi = camera_project(cam, hLR)
                    A = camera_project_jacobian(cam, hLR)
                    Kl = K0 + lam_p * Ksym + (lam_p * lam_p) * K2
                    S = A @ Kl @ A.T + measurement_noise(cam, hpi)
                    sinv = ekf.inv2x2_via_chol(S)
                    det = S[0, 0] * S[1, 1] - S[1, 0] * S[0, 1]
                    return hpi, sinv, det

                return jax.vmap(kform_particle)(lam_row)

            hpi, sinv, dets = jax.vmap(kform_slot)(
                zeroed_c, K0c, Ksymc, K2c, lam_c
            )
            pred_raw = None
        else:
            # slot geometry fused into the kernel prologue: the quaternion /
            # N / K-form chain is ~30 tiny XLA dispatches otherwise; the raw
            # padded rows feed pallas_bayes_update directly (no re-stack)
            hpi, sinv, dets, _, _, pred_raw = pallas_particle_predict_fused(
                ys6, pxy6, pyy6, xp, Pxx7, lam_c,
                fku=cam.fku, fkv=cam.fkv, u0c=cam.u0, v0c=cam.v0,
                kd1=cam.kd1, sd0=cam.sd, no_sigma=params.no_sigma,
                return_raw=True,
            )
    else:

        def per_slot(y6, pxy_i, pyy_i, lam_row):
            zeroed, dz_by_dxp, dz_by_dyi = models.part_zeroedyi(y6, xp)
            pxy7 = pxy_i[:7]

            def per_particle(lam_p):
                hpi, hx7, hy6 = models.part_predict_from_zeroed(
                    cam, zeroed, dz_by_dxp, dz_by_dyi, lam_p
                )
                R = measurement_noise(cam, hpi)
                # S with the camera block restricted to the 7 position-state
                # columns hx actually has (the 13-wide form zero-pads hx: the
                # velocity-block terms are exact zeros)
                t = hx7 @ pxy7 @ hy6.T
                S = hx7 @ Pxx7 @ hx7.T + t + t.T + hy6 @ pyy_i @ hy6.T + R
                sinv = ekf.inv2x2_via_chol(S)
                dets = S[0, 0] * S[1, 1] - S[1, 0] * S[0, 1]
                return hpi, sinv, dets

            return jax.vmap(per_particle)(lam_row)

        hpi, sinv, dets = jax.vmap(per_slot)(ys6, pxy6, pyy6, lam_c)
        pred_raw = None
    # hpi [MAXP,NP,2], sinv [MAXP,NP,2,2], dets [MAXP,NP]

    # the shared penalized score map per patch (the reference's correlation
    # cache) is computed by the caller; the reductions over it never
    # materialize per-particle bands (per-particle window GATHERS and the
    # materialized rowband were both measured slower on TPU).
    searchable = palive_c & making[:, None]

    if fast and params.use_pallas and (
        not params.batch_mode
        or (params.batch_pallas
            and os.environ.get("SCENELIB2_BATCH_SB", "1") != "0")
    ):
        # union-box search + Bayes + decisions as ONE kernel
        # (pallas_search_bayes.py): replaces the lax.cond band ladder, its
        # masked reduces, and the bayes-prep glue — ~150 small XLA ops per
        # firing frame of pure sequencer cost. Decisions bit-equal to the
        # ladder + pallas_bayes_update pipeline (tests/test_pallas_search_bayes).
        # batch_pallas lanes take the compact (per-slot-rows) mode under the
        # lane vmap — one grid step per lane — replacing the separate
        # multi-ellipse-search kernel + Bayes kernel pair and their glue
        # (SCENELIB2_BATCH_SB=0 restores the pair for A/B).
        from scenelib2_tpu.kernels.pallas_search_bayes import pallas_search_bayes

        kw = dict(
            image_shape=(params.cam_height, params.cam_width),
            win_radius=params.particle_win_radius, no_sigma=params.no_sigma,
            corr_thresh2=params.corr_thresh2,
            prune_prob_thresh=params.prune_prob_thresh,
            sd_depth_ratio=params.sd_depth_ratio,
            min_particles=params.min_particles,
            erase_partial_after_attempts=params.erase_partial_after_attempts,
        )
        if fused_sb:
            # full-width mode: the kernel picks row pidx in-kernel and hands
            # back whole prob/palive arrays (pass-through for other rows) —
            # no gather/scatter around the call. corr_maps is either the
            # padded f32 FRAME (frame mode: the kernel builds the penalized
            # score map in-kernel over the union-box blocks only) or a
            # possibly-padded precomputed score map.
            frame_mode = corr_maps.ndim == 2
            pre_padded = (not frame_mode) and corr_maps.shape[1:] != (
                params.cam_height, params.cam_width
            )
            (prob_full, palive_full, mean, cov, convert_mask, kill_c,
             n_over_slot, _found, _z, _best, sb_pred) = pallas_search_bayes(
                corr_maps.astype(jnp.float32), None, state.prob,
                state.lam, state.palive, making, pmask, match_attempts[pidx],
                pidx=pidx[0], corr_padded=pre_padded,
                patch_row=state.patch_rows[pidx[0]] if frame_mode else None,
                boxsize=params.boxsize,
                corr_sigma_thresh=params.corr_sigma_thresh,
                low_sigma_penalty=params.low_sigma_penalty,
                shared=sb_shared, slot_rows=sb_slot,
                cam_static=(cam.fku, cam.fkv, cam.u0, cam.v0, cam.kd1),
                sd0=cam.sd, **kw,
            )
            # AR diagnostics from the merged kernel's pred rows (same slices
            # as the predict wrapper)
            from scenelib2_tpu.kernels.pallas_particle import (
                ROW_HU, ROW_HV, ROW_S00, ROW_S01, ROW_S11,
            )

            pr = sb_pred[:, :, :NP]
            hpi = jnp.stack([pr[:, ROW_HU], pr[:, ROW_HV]], axis=-1)
            sinv = jnp.stack(
                [pr[:, ROW_S00], pr[:, ROW_S01], pr[:, ROW_S01],
                 pr[:, ROW_S11]], axis=-1
            ).reshape(MAXP, NP, 2, 2)
        else:
            # MAXP > 1: heavy() hands over padded score maps in single-stream
            # mode (return_padded=not batch_mode) — tell the kernel so its
            # shape assert takes the padded branch
            pre_padded = corr_maps.shape[1:] != (
                params.cam_height, params.cam_width
            )
            (prob_f, palive_f, mean, cov, convert_mask, kill_c, n_over_slot,
             _found, _z, _best) = pallas_search_bayes(
                corr_maps.astype(jnp.float32), pred_raw, prob_c, lam_c,
                palive_c, making, pmask, match_attempts[pidx],
                corr_padded=pre_padded, **kw,
            )
            prob_full = state.prob.at[pidx].set(prob_f)
            palive_full = state.palive.at[pidx].set(palive_f)
        n_p_overflow = jnp.sum(n_over_slot).astype(jnp.int32)
        state = state._replace(
            prob=prob_full, palive=palive_full, match_attempts=match_attempts
        )

        def do_surgery(s: SlamState) -> SlamState:
            for j in range(MAXP):
                s = st.convert_feature(
                    s, pidx[j], mean[j], cov[j], convert_mask[j],
                    onehot=params.batch_mode,
                )
            kill = jnp.zeros(MF, bool).at[pidx].set(kill_c & pmask)
            kill = kill & s.active & ~s.full
            return st.delete_mask(s, kill)

        did_convert = jnp.any(convert_mask)
        any_surgery = did_convert | jnp.any(kill_c & pmask)
        state = lax.cond(any_surgery, do_surgery, lambda s: s, state)
        ar = (hpi.astype(dtype), sinv.astype(dtype), searchable)
        return state, did_convert, n_p_overflow, ar

    if params.batch_mode:
        if fast and params.use_pallas and params.batch_pallas:
            # aligned-sub-block kernel: the dense form's full-map reduce per
            # particle was the largest op in the 64-lane scan (~55% of the
            # iteration); bit-equal decisions, scans <=BHxBW per particle
            from scenelib2_tpu.kernels.pallas_particle_search import (
                pallas_multi_ellipse_search,
            )

            found, zu, zv, p_over = pallas_multi_ellipse_search(
                corr_maps.astype(jnp.float32), hpi, sinv, searchable,
                win_radius=params.particle_win_radius,
                no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
            )
        else:
            # cond-free dense broadcast — vmapping the union-box ladder
            # would evaluate EVERY rung on every lane. (A rowband gather was
            # measured ~10% SLOWER than this under the lane vmap:
            # [B,P,side_v,W] advanced gathers beat streaming reads only on
            # paper — scripts/profile_batch.py.)
            def search_slot(cm, h_f, sinv_f, alive_f):
                return correlate.multi_ellipse_search_dense(
                    cm, h_f, sinv_f, alive_f,
                    win_radius=params.particle_win_radius,
                    no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
                )

            found, zu, zv, p_over = jax.vmap(search_slot)(
                corr_maps, hpi, sinv, searchable
            )
    else:
        # unrolled python loop over the (tiny, static) partial-slot count so
        # the union-box lax.cond stays a real cond. (Routing the aligned-
        # block Pallas kernel here instead was measured SLOWER single-stream:
        # 170 vs 149 us/frame — the ladder's conds skip converged work.)
        res = [
            correlate.multi_ellipse_search_unionbox(
                corr_maps[j], hpi[j], sinv[j], searchable[j],
                win_radius=params.particle_win_radius,
                no_sigma=params.no_sigma, corr_thresh2=params.corr_thresh2,
            )
            for j in range(MAXP)
        ]
        found, zu, zv, p_over = (
            jnp.stack([r[i] for r in res]) for i in range(4)
        )
    z = jnp.stack([zu, zv], axis=-1).astype(dtype)          # [MAXP,NP,2]

    # Bayes update of particle probabilities (monoslam.cpp:1446-1493).
    # A particle whose 3-sigma ellipse exceeded the static window cap AND
    # found no match inside the searched part is inconclusive — the reference
    # would have scanned the full ellipse — so it keeps its prior weight
    # (likelihood 1) rather than being zeroed and pruned. When no window
    # overflows (the stock workload) this is exactly the reference rule.
    if fast and params.use_pallas:
        # whole chain (likelihood -> Bayes -> prune -> moments -> decisions)
        # as ONE lane-parallel kernel (pallas_bayes.py): ~45 [1,NP] XLA
        # micro-fusions otherwise
        from scenelib2_tpu.kernels.pallas_bayes import pallas_bayes_update

        prob_f, palive_f, mean, cov, convert_mask, kill_c, n_over_slot = (
            pallas_bayes_update(
                prob_c, lam_c, palive_c, found, p_over, z, hpi, sinv, dets,
                making, pmask, match_attempts[pidx],
                pred_rows=pred_raw,
                prune_prob_thresh=params.prune_prob_thresh,
                sd_depth_ratio=params.sd_depth_ratio,
                min_particles=params.min_particles,
                erase_partial_after_attempts=params.erase_partial_after_attempts,
            )
        )
        n_p_overflow = jnp.sum(n_over_slot).astype(jnp.int32)
    else:
        n_p_overflow = jnp.sum(p_over).astype(jnp.int32)
        nu = z - hpi
        quad = jnp.einsum("fpi,fpij,fpj->fp", nu, sinv, nu)
        gauss = (1.0 / jnp.sqrt(2.0 * jnp.pi * dets)) * jnp.exp(-0.5 * quad)
        likelihood = jnp.where(found, gauss, jnp.where(p_over, 1.0, 0.0))
        upd = making[:, None] & palive_c
        prob = jnp.where(upd, prob_c * likelihood, prob_c)

        total = jnp.sum(jnp.where(palive_c, prob, 0.0), axis=1)      # [MAXP]
        all_zero = making & (total == 0.0)

        safe_total = jnp.where(total > 0.0, total, 1.0)
        prob_n = jnp.where(making[:, None], prob / safe_total[:, None], prob)

        # prune below thresh/N_current, renormalise (feature_init_info.cpp:128-144)
        n_alive = jnp.sum(palive_c, axis=1)
        thresh = params.prune_prob_thresh / jnp.maximum(n_alive, 1).astype(dtype)
        keep = palive_c & ~(making[:, None] & (prob_n < thresh[:, None]))
        prob_k = jnp.where(keep, prob_n, 0.0)
        total2 = jnp.sum(prob_k, axis=1)
        prob_f = jnp.where(
            making[:, None] & (total2[:, None] > 0.0),
            prob_k / jnp.where(total2 > 0, total2, 1.0)[:, None],
            prob_k,
        )
        palive_f = jnp.where(making[:, None], keep, palive_c)
        n_alive_f = jnp.sum(palive_f, axis=1)

        # lambda mean / cov over particles (feature_init_info.cpp:154-174)
        mean = jnp.sum(lam_c * prob_f, axis=1)
        exp2 = jnp.sum(lam_c * lam_c * prob_f, axis=1)
        cov = exp2 - mean * mean

        ratio = jnp.sqrt(cov) / mean
        convert_mask = (
            making
            & ~all_zero
            & (ratio < params.sd_depth_ratio)
            & (n_alive_f > params.min_particles)
        )
        # deletions: all-zero-probability features (monoslam.cpp:1486-1493)
        # and past-sell-by-date (monoslam.cpp:1502-1517)
        sell_by_c = (
            pmask
            & ~convert_mask
            & (
                (match_attempts[pidx] > params.erase_partial_after_attempts)
                | (n_alive_f <= params.min_particles)
            )
        )
        kill_c = all_zero | sell_by_c

    # scatter compact particle state back to the full-width arrays
    # (top_k indices are distinct; padding rows write their own values back)
    prob_full = state.prob.at[pidx].set(prob_f)
    palive_full = state.palive.at[pidx].set(palive_f)
    state = state._replace(
        prob=prob_full, palive=palive_full, match_attempts=match_attempts
    )

    # conversions, one compact row at a time (disjoint slots; MAXP is tiny —
    # unrolled python loop, no device loop machinery)
    def do_surgery(s: SlamState) -> SlamState:
        for j in range(MAXP):
            s = st.convert_feature(
                s, pidx[j], mean[j], cov[j], convert_mask[j],
                onehot=params.batch_mode,
            )
        kill = jnp.zeros(MF, bool).at[pidx].set(kill_c & pmask)
        kill = kill & s.active & ~s.full
        return st.delete_mask(s, kill)

    did_convert = jnp.any(convert_mask)
    any_surgery = did_convert | jnp.any(kill_c & pmask)
    if params.batch_mode:
        # under the lane vmap a cond is a select that evaluates both arms —
        # keep the unconditional value-selected no-op form
        state = do_surgery(state)
    else:
        # conversions/kills happen on a handful of frames; the surgery is an
        # exact no-op when all masks are false (value-selected writes), so
        # skipping it via a real cond is decision-identical
        state = lax.cond(any_surgery, do_surgery, lambda s: s, state)
    ar = (hpi.astype(dtype), sinv.astype(dtype), searchable)
    return state, did_convert, n_p_overflow, ar
