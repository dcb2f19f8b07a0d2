"""Union-box particle search + Bayes depth update as ONE Pallas kernel.

The single-stream heavy particle branch (runtime/step.py stage 8) was ~97 us
per firing frame on device, of which only ~25 us was kernel/reduce work: the
union-box ladder (correlate.multi_ellipse_search_unionbox — nested lax.conds
over static band sizes, masked [P, bh, bw] min + tie-key reduces) plus the
glue feeding pallas_bayes_update issued ~150 small XLA ops whose per-op
sequencer cost dominated. This kernel replaces the WHOLE chain after the
score map:

  per-particle search geometry -> union box (in-kernel rank-0 reduces) ->
  a fori_loop over ONLY the union box's rows (dynamic trip count; static
  128-lane column chunks gated by pl.when) -> masked min + last-tie key ->
  Gaussian likelihood -> Bayes -> prune -> lambda moments -> conversion /
  kill decisions (the pallas_bayes tail, shared code).

Decisions are bit-equal to the ladder + pallas_bayes_update pipeline: the
mask arithmetic replicates the ladder's exact f32 expression trees (see the
op-order comments), the scanned region contains every alive particle's full
masked candidate set by construction, min / tie-key max are comparison-based
(order-independent), and the Bayes tail is literally the same code. Verified
against the XLA ladder in tests/test_pallas_search_bayes.py and end-to-end
by the decision-parity suites.

Frame mode (patch_row given) goes one step further: the kernel takes the
padded f32 FRAME instead of a precomputed score map and builds the
penalized NSSD rows for each visited 8-row block in-kernel (24-row slab,
the same roll-based integer box sums and shared nssd_corr_f32 formula as
pallas_score_map — values bit-identical at valid centres), so non-firing
frames do no score work at all and the whole-frame score kernel disappears
from the single-stream path.

Layout: particle rows arrive lane-parallel (as produced by
pallas_particle_predict_fused); the search needs them as per-particle
COLUMNS against band columns on lanes, so the kernel transposes them once
via an exact 0/1 identity dot (bit-preserving), and transposes the three
search results back the same way.

Reference semantics: SearchMultipleOverlappingEllipses
(improc/search_multiple_overlapping_ellipses.cpp:106-196) + particle weight
update (monoslam.cpp:1446-1517, feature_init_info.cpp:99-174), with the
framework's documented static window cap (docs/PARITY.md).
f32 fast-mode only; the f64 parity path keeps the XLA forms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST

from scenelib2_tpu.kernels.pallas_bayes import _bayes_tail
from scenelib2_tpu.kernels.pallas_score_map import nssd_corr_f32

# pred_rows layout (pallas_particle.py output) + the in-kernel predict
# chain for merged mode (pred_rows=None): the slot geometry prologue and the
# per-particle tail run in THIS kernel, removing the separate predict
# dispatch and its HBM round-trip from the single-stream fast path
from scenelib2_tpu.kernels.pallas_particle import (
    _NSHARED, _NSLOT, _geometry_prologue, _particle_tail,
    ROW_DET, ROW_HH, ROW_HU, ROW_HV, ROW_HW, ROW_S00, ROW_S01, ROW_S11,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# particle-rows input layout ([F, 3, NP_pad])
_PL_PROB, _PL_LAM, _PL_ALIVE = range(3)

# output row layout ([F, 8, NP_pad]); rows 0-2 match pallas_bayes
ROW_PROB, ROW_ALIVE, ROW_SCAL = 0, 1, 2
ROW_FOUND, ROW_ZU, ROW_ZV, ROW_BEST, ROW_OVER = 3, 4, 5, 6, 7
(LANE_MEAN, LANE_COV, LANE_CONVERT, LANE_ALLZERO, LANE_KILL, LANE_NOVER) = range(6)

_BIG = float(1 << 24)   # coordinate sentinel (ladder uses 1 << 24), f32-exact
_MISS = 1e6             # masked-cell score sentinel (ladder's value)


def _kernel(smem_ref, corr_ref, *refs,
            NP, NP_pad, P_sub, H, W, W_pad, win_radius, no_sigma,
            corr_thresh2, prune_prob_thresh, sd_depth_ratio, min_particles,
            erase_partial_after_attempts, MF_pad=None, compute_score=False,
            boxsize=11, corr_sigma_thresh=10.0, low_sigma_penalty=5.0,
            pred_geom=None):
    if pred_geom is None:
        pred_ref, pl_ref = refs[:2]
        rest = refs[2:]
    else:
        shared_ref, slot_ref, pl_ref = refs[:3]
        rest = refs[3:]
    if MF_pad is None:
        if pred_geom is None:
            out_ref, cb_ref, ck_ref = rest
        else:
            out_ref, pred_out_ref, cb_ref, ck_ref = rest
    else:
        # full-width mode: pl_ref is [3, MF_pad, NP_pad] whole-state rows,
        # the slot row is picked in-kernel by pidx (smem lane 3), and the
        # updated prob/palive are written back full-width (pass-through copy
        # for every other row) — no XLA gathers/scatters around the kernel
        if pred_geom is None:
            out_ref, prob_out_ref, alive_out_ref, cb_ref, ck_ref = rest
        else:
            (out_ref, pred_out_ref, prob_out_ref, alive_out_ref,
             cb_ref, ck_ref) = rest
    lane = jax.lax.broadcasted_iota(jnp.int32, (NP_pad,), 0)
    zero = jnp.zeros((NP_pad,), jnp.float32)

    def vec(s):
        return zero + s

    valid = lane < NP
    making = vec(smem_ref[0, 0, 0]) > 0.0

    if MF_pad is None:
        prob_in = pl_ref[0, _PL_PROB, :]
        lam_in = pl_ref[0, _PL_LAM, :]
        alive_in = pl_ref[0, _PL_ALIVE, :]
    else:
        pidx_s = smem_ref[0, 0, 3].astype(jnp.int32)
        rowoh = (
            jax.lax.broadcasted_iota(jnp.int32, (MF_pad, NP_pad), 0) == pidx_s
        )
        zeros_mf = jnp.zeros((MF_pad, NP_pad), jnp.float32)

        def pick(i):
            return jnp.sum(jnp.where(rowoh, pl_ref[i], zeros_mf), axis=0)

        prob_in = pick(_PL_PROB)
        lam_in = pick(_PL_LAM)
        alive_in = pick(_PL_ALIVE)
    palive = (alive_in > 0.0) & valid

    if pred_geom is None:

        def prow(i):
            return pred_ref[0, i, :]

    else:
        # merged predict: the slot geometry prologue + per-particle tail of
        # pallas_particle_predict_fused run here — identical op order and
        # the same lambda-padding convention (1.0 beyond NP keeps the math
        # finite), so the 8 rows are bit-equal to the separate kernel's
        def sh(i):
            return shared_ref[0, i]

        def sl(i):
            return slot_ref[0, i]

        zr, zh, K0g, Ksg, K2g = _geometry_prologue(sh, sl)
        lam_tail = jnp.where(valid, lam_in, 1.0)
        pred = _particle_tail(
            lam_tail, zr, zh, K0g, Ksg, K2g, no_sigma=no_sigma, **pred_geom
        )
        pred_out_ref[0] = pred

        def prow(i):
            return pred[i]

    hu = prow(ROW_HU)
    hv = prow(ROW_HV)
    s00 = prow(ROW_S00)
    s01 = prow(ROW_S01)
    s11 = prow(ROW_S11)
    hw = prow(ROW_HW)
    hh = prow(ROW_HH)

    R = float(win_radius)
    side_u = float(min(2 * win_radius + 1, W))
    side_v = float(min(2 * win_radius + 1, H))

    # search geometry, replicating multi_ellipse_search_unionbox's integer
    # arithmetic in exact-small-integer f32 (correlate.py:495-521)
    uc = jnp.trunc(hu)
    vc = jnp.trunc(hv)
    u0 = jnp.minimum(jnp.maximum(uc - R, 0.0), float(W) - side_u)
    v0 = jnp.minimum(jnp.maximum(vc - R, 0.0), float(H) - side_v)
    over_l = (hw > R) | (hh > R)
    searchable = palive & making

    r_v_lo = jnp.maximum(v0, vc - hh)
    r_v_hi = jnp.minimum(v0 + side_v, vc + hh + 1.0)
    r_u_lo = jnp.maximum(u0, uc - hw)
    r_u_hi = jnp.minimum(u0 + side_u, uc + hw + 1.0)
    nonempty = searchable & (r_v_lo < r_v_hi) & (r_u_lo < r_u_hi)

    v_lo_s = jnp.min(jnp.where(nonempty, r_v_lo, _BIG))
    v_hi_s = jnp.max(jnp.where(nonempty, r_v_hi, -_BIG))
    u_lo_s = jnp.min(jnp.where(nonempty, r_u_lo, _BIG))
    u_hi_s = jnp.max(jnp.where(nonempty, r_u_hi, -_BIG))
    n_rows = jnp.clip(v_hi_s, 0.0, float(H)) - jnp.clip(v_lo_s, 0.0, float(H))
    n_rows = jnp.maximum(n_rows, 0.0).astype(jnp.int32)
    v_lo_i = jnp.clip(v_lo_s, 0.0, float(H)).astype(jnp.int32)

    # one exact 0/1 identity-dot transpose: 9 lane rows -> [P_sub, 16] columns
    rowi16 = jax.lax.broadcasted_iota(jnp.int32, (16, NP_pad), 0)
    zeros16 = jnp.zeros((16, NP_pad), jnp.float32)

    def put(i, v):
        return jnp.where(rowi16 == i, v[None, :] + zeros16, zeros16)

    # in_win & box folds exactly into the per-particle effective bounds:
    # u ∈ [u0, u0+side) ∩ [uc-hw, uc+hw] == [r_u_lo, r_u_hi) (same for v),
    # so the loop tests 2 compares per axis instead of 4
    pack = (
        put(0, uc) + put(1, vc) + put(2, r_u_lo) + put(3, r_u_hi)
        + put(4, r_v_lo) + put(5, r_v_hi) + put(6, s00) + put(7, 2.0 * s01)
        + put(8, s11)
    )
    eye_pn = (
        jax.lax.broadcasted_iota(jnp.int32, (P_sub, NP_pad), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (P_sub, NP_pad), 1)
    ).astype(jnp.float32)
    cols = jax.lax.dot_general(
        eye_pn, pack, (((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )                                                    # [P_sub, 16]
    uc_c = cols[:, 0:1]
    vc_c = cols[:, 1:2]
    ulo_c = cols[:, 2:3]
    uhi_c = cols[:, 3:4]
    vlo_c = cols[:, 4:5]
    vhi_c = cols[:, 5:6]
    a_c = cols[:, 6:7]
    bu2_c = cols[:, 7:8]                                 # 2.0 * b, ladder op order
    c_c = cols[:, 8:9]

    cb_ref[:] = jnp.full((P_sub, W_pad), _MISS, jnp.float32)
    ck_ref[:] = jnp.full((P_sub, W_pad), -1.0, jnp.float32)

    n_chunks = W_pad // 128
    # chunk k needed iff [128k, 128k+127] intersects [u_lo, u_hi)
    need = [
        (float(128 * k) <= u_hi_s - 1.0) & (float(128 * k + 127) >= u_lo_s)
        for k in range(n_chunks)
    ]
    lane_iota_f = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
        jnp.float32
    )
    uu_chunks = [float(128 * k) + lane_iota_f for k in range(n_chunks)]
    no_sigma2 = float(no_sigma) * float(no_sigma)

    # loop over aligned 8-row blocks (an in-kernel fori iteration costs ~500
    # cycles of Mosaic loop overhead — pallas_linalg.py — so the rows inside
    # a block are a STATIC unroll behind cheap scalar pl.when guards).
    # (16-row blocks on a 32-row slab were measured: ~neutral at 320x240 but
    # +10 us/frame at hires — union boxes there are usually one block tall,
    # so the wider slab's extra 8 rows of score work dominate the saved
    # overlap. 8-row/24-slab stays.)
    BR = 8
    SB = 24
    v_hi_i = v_lo_i + n_rows
    b_lo = v_lo_i // BR
    n_blocks = jnp.where(n_rows > 0, (v_hi_i - 1) // BR - b_lo + 1, 0)

    def block_body(bi, _):
        v_al = (b_lo + bi) * BR
        if not compute_score:
            block = corr_ref[0, pl.ds(v_al, 8), :]       # [8, W_pad] aligned
            corr24 = None
            sstart = None
        else:
            # corr_ref holds the padded f32 FRAME; build this block's BR rows
            # of the penalized NSSD score map in-kernel from an SB-row slab
            # (output row v needs image rows v-half..v+half; half=5 < 8).
            # Exact mirror of pallas_score_map's whole-frame kernel: integer
            # sums are order-independent-exact in f32 and the score formula
            # is the shared nssd_corr_f32, so values are bit-identical.
            Hp = corr_ref.shape[1]
            half = (boxsize - 1) // 2
            sstart = jnp.clip(v_al - 8, 0, Hp - SB)
            slab = corr_ref[0, pl.ds(pl.multiple_of(sstart, 8), SB), :]
            slab2 = slab * slab

            def shift0(x, dy):
                return x if dy == 0 else pltpu.roll(x, SB - dy, 0)

            def shift1(x, dx):
                return x if dx == 0 else pltpu.roll(x, W_pad - dx, 1)

            colsum = slab
            colsum2 = slab2
            for dy in range(1, boxsize):
                colsum = colsum + shift0(slab, dy)
                colsum2 = colsum2 + shift0(slab2, dy)
            sg1 = colsum
            sg1sq = colsum2
            for dx in range(1, boxsize):
                sg1 = sg1 + shift1(colsum, dx)
                sg1sq = sg1sq + shift1(colsum2, dx)
            cross = jnp.zeros_like(slab)
            for dx in range(boxsize):
                t = smem_ref[0, 1, dx] * slab
                for dy in range(1, boxsize):
                    t = t + smem_ref[0, 1, dy * boxsize + dx] * shift0(slab, dy)
                cross = cross + shift1(t, dx)
            sg0 = smem_ref[0, 1, boxsize * boxsize]
            sg0sq = smem_ref[0, 1, boxsize * boxsize + 1]
            corr24, _sd0, sd1 = nssd_corr_f32(
                sg0, sg0sq, sg1, sg1sq, cross, float(boxsize * boxsize)
            )
            corr24 = jnp.where(
                sd1 < corr_sigma_thresh, corr24 + low_sigma_penalty, corr24
            )
            uu24 = jax.lax.broadcasted_iota(jnp.int32, (SB, W_pad), 1)
            vv24 = sstart + jax.lax.broadcasted_iota(jnp.int32, (SB, W_pad), 0)
            # tl-indexed -> centre-indexed: lanes shift by half here; rows
            # are picked per output row below at tl = v - half - sstart
            valid24 = (
                (uu24 >= 0) & (uu24 <= W - 1 - 2 * half)
                & (vv24 + half >= half) & (vv24 + half <= H - 1 - half)
            )
            corr24 = jnp.where(valid24, corr24, _MISS)
            corr24 = pltpu.roll(corr24, half, 1)
            block = None
        for r8 in range(BR):
            v = v_al + r8

            @pl.when((v >= v_lo_i) & (v < v_hi_i))
            def _(r8=r8, v=v):
                if not compute_score:
                    vals = block[r8 : r8 + 1, :]         # [1, W_pad] static
                else:
                    tl = v - (boxsize - 1) // 2 - sstart
                    rowoh = (
                        jax.lax.broadcasted_iota(jnp.int32, (SB, W_pad), 0)
                        == tl
                    )
                    picked = jnp.sum(
                        jnp.where(rowoh, corr24, jnp.zeros_like(corr24)),
                        axis=0, keepdims=True,
                    )
                    # rows whose window escapes the slab only occur at the
                    # image top border, where the real map holds the invalid-
                    # centre sentinel for every column
                    vals = jnp.where(tl >= 0, picked, _MISS)
                vf = v.astype(jnp.float32)
                vrel_c = vf - vc_c                       # [P_sub, 1]
                rowok_c = (vf >= vlo_c) & (vf < vhi_c)
                vterm_c = (c_c * vrel_c) * vrel_c        # ((c*vrel)*vrel)
                for k in range(n_chunks):
                    @pl.when(need[k])
                    def _(k=k):
                        uu = uu_chunks[k]                # [1, 128]
                        valsk = vals[:, 128 * k : 128 * (k + 1)]
                        urel = uu - uc_c                 # [P_sub, 128]
                        in_u = (uu >= ulo_c) & (uu < uhi_c)
                        t1 = (a_c * urel) * urel         # ((a*urel)*urel)
                        t2 = (bu2_c * urel) * vrel_c     # (((2b)*urel)*vrel)
                        ell = ((t1 + t2) + vterm_c) < no_sigma2
                        mask = rowok_c & in_u & ell
                        cand = jnp.where(
                            mask, valsk + jnp.zeros_like(urel), _MISS
                        )
                        key = uu * float(H) + vf         # ladder key = u*H + v
                        cb = cb_ref[:, 128 * k : 128 * (k + 1)]
                        ck = ck_ref[:, 128 * k : 128 * (k + 1)]
                        lt = cand < cb
                        # a masked cell (cand == MISS) must never record a
                        # key: the ladder's tie set is (vals == best) & mask
                        eq = (cand == cb) & (cand < _MISS)
                        keyb = key + jnp.zeros_like(urel)
                        ck_ref[:, 128 * k : 128 * (k + 1)] = jnp.where(
                            lt, keyb, jnp.where(eq, jnp.maximum(ck, keyb), ck)
                        )
                        cb_ref[:, 128 * k : 128 * (k + 1)] = jnp.minimum(cb, cand)
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)

    colbest = cb_ref[:]
    colkey = ck_ref[:]
    best_c = jnp.min(colbest, axis=1, keepdims=True)     # [P_sub, 1]
    tie_c = colbest == best_c
    kbest_c = jnp.max(
        jnp.where(tie_c, colkey, jnp.full((P_sub, W_pad), -1.0, jnp.float32)),
        axis=1, keepdims=True,
    )

    # transpose (best, kbest) back to lane layout with the same 0/1 dot
    coli8 = jax.lax.broadcasted_iota(jnp.int32, (P_sub, 8), 1)
    zeros8 = jnp.zeros((P_sub, 8), jnp.float32)
    pack2 = (
        jnp.where(coli8 == 0, best_c + zeros8, zeros8)
        + jnp.where(coli8 == 1, kbest_c + zeros8, zeros8)
    )
    back = jax.lax.dot_general(
        pack2, eye_pn, (((0,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32,
    )                                                    # [8, NP_pad]
    best_l = back[0, :]
    kbest_l = back[1, :]

    found = searchable & (best_l <= float(corr_thresh2))
    p_over = over_l & searchable
    # exact f32 divmod of the tie key (kbest < 2^17; (k+0.5)/H lands strictly
    # inside (q, q+1), so trunc is exact — see tests)
    zu = jnp.trunc((kbest_l + 0.5) / float(H))
    zv = kbest_l - float(H) * zu

    prob_f, palive_f, scal = _bayes_tail(
        prob_c=prob_in,
        lam=lam_in,
        palive=palive,
        found=found,
        p_over=p_over,
        zu=zu, zv=zv,
        hu=hu, hv=hv, a=s00, b=s01, c=s11, det=prow(ROW_DET),
        making=making,
        pmask=vec(smem_ref[0, 0, 1]) > 0.0,
        match_attempts=vec(smem_ref[0, 0, 2]),
        valid=valid, lane=lane, zero=zero, NP_pad=NP_pad,
        prune_prob_thresh=prune_prob_thresh,
        sd_depth_ratio=sd_depth_ratio, min_particles=min_particles,
        erase_partial_after_attempts=erase_partial_after_attempts,
    )

    def sel(x):
        return jnp.where(x, zero + 1.0, zero)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, NP_pad), 0)
    zeros2 = jnp.zeros((8, NP_pad), jnp.float32)

    def put_out(i, v):
        return jnp.where(rowi == i, v[None, :] + zeros2, zeros2)

    out_ref[0] = (
        put_out(ROW_PROB, prob_f)
        + put_out(ROW_ALIVE, sel(palive_f))
        + put_out(ROW_SCAL, scal)
        + put_out(ROW_FOUND, sel(found))
        + put_out(ROW_ZU, zu)
        + put_out(ROW_ZV, zv)
        + put_out(ROW_BEST, best_l)
        + put_out(ROW_OVER, sel(p_over))
    )
    if MF_pad is not None:
        prob_out_ref[...] = jnp.where(
            rowoh, prob_f[None, :] + zeros_mf, pl_ref[_PL_PROB]
        )
        alive_out_ref[...] = jnp.where(
            rowoh, sel(palive_f)[None, :] + zeros_mf, pl_ref[_PL_ALIVE]
        )


@functools.partial(
    jax.jit,
    static_argnames=("win_radius", "no_sigma", "corr_thresh2",
                     "prune_prob_thresh", "sd_depth_ratio", "min_particles",
                     "erase_partial_after_attempts", "image_shape",
                     "interpret", "corr_padded", "boxsize",
                     "corr_sigma_thresh", "low_sigma_penalty",
                     "cam_static", "sd0"),
)
def pallas_search_bayes(
    corr_maps: jnp.ndarray,       # [F,H,W] f32 penalized score maps
    pred_rows,                    # [F,8,NP_pad] raw particle-predict rows,
                                  # or None: merged mode — the predict chain
                                  # runs in-kernel from shared/slot_rows
    prob: jnp.ndarray,            # [F,NP]
    lam: jnp.ndarray,             # [F,NP]
    palive: jnp.ndarray,          # [F,NP] bool
    making: jnp.ndarray,          # [F] bool
    pmask: jnp.ndarray,           # [F] bool
    match_attempts: jnp.ndarray,  # [F] i32 (already incremented this frame)
    image_shape: tuple[int, int] = (240, 320),
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    prune_prob_thresh: float = 0.05,
    sd_depth_ratio: float = 0.3,
    min_particles: int = 20,
    erase_partial_after_attempts: int = 10,
    interpret: bool | None = None,
    pidx: jnp.ndarray | None = None,  # [] i32: full-width mode (F must be 1)
    corr_padded: bool = False,
    patch_row: jnp.ndarray | None = None,  # [128] state.patch_row layout:
                                # frame mode — corr_maps is the padded f32
                                # FRAME [ph,pw] and the penalized score map
                                # is built in-kernel over only the union-box
                                # blocks (F must be 1)
    boxsize: int = 11,
    corr_sigma_thresh: float = 10.0,
    low_sigma_penalty: float = 5.0,
    shared: jnp.ndarray | None = None,     # [1,_NSHARED] merged-mode camera row
    slot_rows: jnp.ndarray | None = None,  # [F,_NSLOT] merged-mode slot rows
    cam_static: tuple | None = None,       # (fku,fkv,u0,v0,kd1) merged mode
    sd0: float | None = None,              # measurement noise sd, merged mode
):
    """Returns (prob_f, palive_f bool, mean [F], cov [F], convert [F] bool,
    kill [F] bool, n_over [F] i32, found [F,NP] bool, z [F,NP,2],
    best [F,NP]) — the pallas_bayes_update outputs plus the search results
    (for diagnostics/tests). Merged mode (pred_rows=None) appends the
    in-kernel particle-predict rows pred [F,8,NP_pad] as an 11th element.

    Compact mode (pidx=None): prob/lam/palive are the [F,NP] slot rows and
    prob_f/palive_f come back [F,NP]. Full-width mode (pidx given, F==1):
    prob/lam/palive are the WHOLE [MF,NP] state arrays; the kernel picks row
    pidx in-kernel and returns updated full-width prob_f [MF,NP] /
    palive_f [MF,NP] (other rows passed through bit-exactly), so the step
    needs no gather/scatter around the call."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F = making.shape[0]
    NP = prob.shape[-1]
    full = pidx is not None
    if full:
        assert F == 1, "full-width mode handles a single partial slot"
        MF = prob.shape[0]
        MF_pad = _round_up(MF, 8)
    NP_pad = max(_round_up(NP, 128), 128)
    P_sub = _round_up(NP, 8)
    H, W = image_shape
    merged = pred_rows is None
    if merged:
        assert shared is not None and slot_rows is not None
        assert cam_static is not None and sd0 is not None
        assert shared.shape == (1, _NSHARED)
        assert slot_rows.shape == (F, _NSLOT)
        import numpy as _np

        fku, fkv, u0c, v0c, kd1 = cam_static
        maxdist = float(_np.sqrt(
            _np.float32(u0c) * _np.float32(u0c)
            + _np.float32(v0c) * _np.float32(v0c)
        ))
        pred_geom = dict(
            fku=float(fku), fkv=float(fkv), u0c=float(u0c), v0c=float(v0c),
            kd1=float(kd1), sd0=float(sd0), maxdist=maxdist,
        )
    else:
        pred_geom = None
        assert pred_rows.shape[1:] == (8, NP_pad), pred_rows.shape
    frame_mode = patch_row is not None
    if frame_mode:
        assert F == 1, "frame mode handles a single partial slot"
        assert corr_maps.ndim == 2  # the padded f32 frame
        H_pad, W_pad = corr_maps.shape
        assert H_pad >= _round_up(H, 8) and W_pad >= _round_up(W, 128)
        assert H_pad >= 24
        corr_p = corr_maps[None]
    elif corr_padded:
        # pre-padded map (pallas_score_maps return_padded=True): cells beyond
        # H/W are never read — the scan bounds clamp to [0,H)x[0,W)
        H_pad, W_pad = corr_maps.shape[1:]
        assert H_pad >= _round_up(H, 8) and W_pad >= _round_up(W, 128)
        corr_p = corr_maps
    else:
        H_pad = _round_up(H, 8)
        W_pad = _round_up(W, 128)
        assert corr_maps.shape == (F, H, W), corr_maps.shape
        corr_p = jnp.pad(
            corr_maps.astype(jnp.float32),
            ((0, 0), (0, H_pad - H), (0, W_pad - W)),
        )

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, NP_pad - NP)))

    if full:
        pl_rows = jnp.stack(
            [pad(prob), pad(lam), pad(palive)], axis=0
        )                                   # [3, MF, NP_pad]
        pl_rows = jnp.pad(pl_rows, ((0, 0), (0, MF_pad - MF), (0, 0)))
    else:
        pl_rows = jnp.stack([pad(prob), pad(lam), pad(palive)], axis=1)
    smem_rows = 2 if frame_mode else 1
    smem = jnp.zeros((F, smem_rows, 128), jnp.float32)
    smem = smem.at[:, 0, 0].set(making.astype(jnp.float32))
    smem = smem.at[:, 0, 1].set(pmask.astype(jnp.float32))
    smem = smem.at[:, 0, 2].set(match_attempts.astype(jnp.float32))
    if full:
        smem = smem.at[0, 0, 3].set(pidx.astype(jnp.float32))
    if frame_mode:
        smem = smem.at[0, 1, :].set(patch_row.astype(jnp.float32))

    kernel = functools.partial(
        _kernel,
        NP=NP, NP_pad=NP_pad, P_sub=P_sub, H=H, W=W, W_pad=W_pad,
        win_radius=win_radius, no_sigma=float(no_sigma),
        corr_thresh2=float(corr_thresh2),
        prune_prob_thresh=prune_prob_thresh, sd_depth_ratio=sd_depth_ratio,
        min_particles=min_particles,
        erase_partial_after_attempts=erase_partial_after_attempts,
        MF_pad=MF_pad if full else None,
        compute_score=frame_mode, boxsize=boxsize,
        corr_sigma_thresh=float(corr_sigma_thresh),
        low_sigma_penalty=float(low_sigma_penalty),
        pred_geom=pred_geom,
    )
    in_specs = [
        pl.BlockSpec((1, smem_rows, 128), lambda f: (f, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, H_pad, W_pad), lambda f: (f, 0, 0)),
    ]
    if merged:
        in_specs += [
            pl.BlockSpec((1, _NSHARED), lambda f: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _NSLOT), lambda f: (f, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = (smem, corr_p, shared.astype(jnp.float32),
                    slot_rows.astype(jnp.float32), pl_rows)
    else:
        in_specs.append(pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0)))
        operands = (smem, corr_p, pred_rows.astype(jnp.float32), pl_rows)
    in_specs.append(
        pl.BlockSpec((3, MF_pad, NP_pad), lambda f: (0, 0, 0))
        if full
        else pl.BlockSpec((1, 3, NP_pad), lambda f: (f, 0, 0))
    )
    misc_spec = pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0))
    misc_shape = jax.ShapeDtypeStruct((F, 8, NP_pad), jnp.float32)
    out_specs = [misc_spec]
    out_shape = [misc_shape]
    if merged:
        out_specs.append(pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((F, 8, NP_pad), jnp.float32))
    if full:
        out_specs += [
            pl.BlockSpec((MF_pad, NP_pad), lambda f: (0, 0)),
            pl.BlockSpec((MF_pad, NP_pad), lambda f: (0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((MF_pad, NP_pad), jnp.float32),
            jax.ShapeDtypeStruct((MF_pad, NP_pad), jnp.float32),
        ]
    res = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((P_sub, W_pad), jnp.float32),
            pltpu.VMEM((P_sub, W_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    res = res if isinstance(res, (tuple, list)) else (res,)
    out = res[0]
    pred_out = res[1] if merged else None
    if full:
        prob_full, alive_full = res[-2], res[-1]
        prob_f = prob_full[:MF, :NP].astype(prob.dtype)
        palive_f = alive_full[:MF, :NP] > 0.0
    else:
        prob_f = out[:, ROW_PROB, :NP].astype(prob.dtype)
        palive_f = out[:, ROW_ALIVE, :NP] > 0.0
    mean = out[:, ROW_SCAL, LANE_MEAN].astype(prob.dtype)
    cov = out[:, ROW_SCAL, LANE_COV].astype(prob.dtype)
    convert = out[:, ROW_SCAL, LANE_CONVERT] > 0.0
    kill = out[:, ROW_SCAL, LANE_KILL] > 0.0
    n_over = out[:, ROW_SCAL, LANE_NOVER].astype(jnp.int32)
    found = out[:, ROW_FOUND, :NP] > 0.0
    z = jnp.stack([out[:, ROW_ZU, :NP], out[:, ROW_ZV, :NP]], axis=-1)
    best = out[:, ROW_BEST, :NP]
    base = (prob_f, palive_f, mean, cov, convert, kill, n_over, found, z, best)
    if merged:
        return base + (pred_out,)
    return base
