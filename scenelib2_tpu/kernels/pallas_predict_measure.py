"""Fused EKF predict + per-slot measurement prediction as ONE Pallas kernel.

Stage 1 + stage 2 of the step (reference kalman.cpp:50-69 then
monoslam.cpp:187-308) as a single dispatch. As XLA ops the predict alone is
~45 dispatches (the quaternion/Jacobian chain of motion_model.cpp:84-217
plus covariance row/column scatters) and feeding the measurement kernel
costs another ~15 (slot-block slicing + input-matrix assembly); per-op
sequencer overhead at D~109 dwarfs the arithmetic. Here:

  predict — x' and P' = F~ P F~' + Q~ with F~ = blockdiag(F, I),
    Q~ = blockdiag(Q, 0) on one zero-padded TDxTD block, TD = the 128-
    multiple >= D (std D=109 -> 128; hires D=373 -> 384 — Mosaic tiles the
    larger dots internally) (two MXU dots;
    multiplying by the exact-identity feature block reproduces those P
    entries bit-for-bat, so this equals the reference's partial transform
    Pxx<-F Pxx F'+Q, Pxy<-F Pxy, Pyy untouched). F and Q entries are built
    from ~30 scalar-core values placed by iota masks.
  slot extraction — the measurement chain's per-slot inputs (y, pxy7, pyy3)
    are pulled out of x'/P' IN-KERNEL with constant 0/1 selector masks
    M_j[d,k] = [d == 13+6k+j]: y_j = x' M_j, C_j = P' M_j gives the pxy
    rows, and masked sublane sums of C_j give pyy — all exact (0/1
    contractions), no XLA gather/scatter glue.
  measure — the shared lane-parallel chain (kernels/pallas_measure.py
    _measure_math: project/Jacobians/S_i/noise/visibility/score,
    full_feature_model.cpp:67-195, feature_model.cpp:99-116,
    camera.cpp:90-300) on the predicted state.

f32 fast mode, single-stream path only (batch mode keeps the separate
ekf.predict + pallas_measure_predict under the lane vmap); the f64 parity
path keeps core.ekf / core.motion.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scenelib2_tpu.kernels.pallas_measure import (
    NOUT,
    O_SCORE,
    O_VIS,
    _measure_math,
)

_HI = jax.lax.Precision.HIGHEST

CAM_DIM = 13
SLOT_DIM = 6


def _predict_measure_kernel(smem_ref, x_ref, P_ref, lanes_ref,
                            meas_ref, ox_ref, oP_ref, sel_ref, aux_ref, *,
                            D, TD, MF, NSEL, MAXP, dt, lin_var, ang_var,
                            fku, fkv, u0c, v0c, kd1, sd0,
                            W, H, bnd, max_len_ratio, cos_max_angle):
    f32 = jnp.float32
    one = f32(1.0)
    zero = f32(0.0)

    def s(i):
        return smem_ref[0, i]

    r0, r1, r2 = s(0), s(1), s(2)
    qw, qx, qy, qz = s(3), s(4), s(5), s(6)
    v0, v1, v2 = s(7), s(8), s(9)
    w0, w1, w2 = s(10), s(11), s(12)

    # ---- fv (motion_model.cpp:84-117; u = 0 on this pipeline) ------------
    rn0, rn1, rn2 = r0 + v0 * dt, r1 + v1 * dt, r2 + v2 * dt
    av0, av1, av2 = w0 * dt, w1 * dt, w2 * dt
    angle = jnp.sqrt(av0 * av0 + av1 * av1 + av2 * av2)
    ok_a = angle > 0.0
    safe = jnp.where(ok_a, angle, one)
    sfac = jnp.where(ok_a, jnp.sin(angle / 2.0) / safe, zero)
    qt_w = jnp.where(ok_a, jnp.cos(angle / 2.0), one)
    qt_x, qt_y, qt_z = sfac * av0, sfac * av1, sfac * av2
    # qnew = q x q(omega dt) (Hamilton, wxyz)
    qn_w = qw * qt_w - qx * qt_x - qy * qt_y - qz * qt_z
    qn_x = qw * qt_x + qx * qt_w + qy * qt_z - qz * qt_y
    qn_y = qw * qt_y - qx * qt_z + qy * qt_w + qz * qt_x
    qn_z = qw * qt_z + qx * qt_y - qy * qt_x + qz * qt_w

    # ---- dqomegadt_by_domega (motion_model.cpp:290-349, w->0 guarded) ----
    wmod = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
    okw = wmod > 0.0
    wn = jnp.where(okw, wmod, one)
    half = dt / 2.0
    s_ = jnp.sin(wn * half)
    c_ = jnp.cos(wn * half)

    def dq0_by_dA(wA):
        return jnp.where(okw, -half * (wA / wn) * s_, zero)

    def dqA_by_dA(wA):
        val = half * (wA * wA) / (wn * wn) * c_ + (1.0 / wn) * (
            1.0 - wA * wA / (wn * wn)
        ) * s_
        return jnp.where(okw, val, f32(half))

    def dqA_by_dB(wA, wB):
        return jnp.where(okw, (wA * wB / (wn * wn)) * (half * c_ - (1.0 / wn) * s_), zero)

    dOm = [
        [dq0_by_dA(w0), dq0_by_dA(w1), dq0_by_dA(w2)],
        [dqA_by_dA(w0), dqA_by_dB(w0, w1), dqA_by_dB(w0, w2)],
        [dqA_by_dB(w1, w0), dqA_by_dA(w1), dqA_by_dB(w1, w2)],
        [dqA_by_dB(w2, w0), dqA_by_dB(w2, w1), dqA_by_dA(w2)],
    ]
    # M = dq3_by_dq1(q) @ dOm (the dq/domega block)
    D1 = [
        [qw, -qx, -qy, -qz],
        [qx, qw, -qz, qy],
        [qy, qz, qw, -qx],
        [qz, -qy, qx, qw],
    ]
    M = [
        [sum(D1[i][k] * dOm[k][j] for k in range(4)) for j in range(3)]
        for i in range(4)
    ]

    # P-space (state-dim) iotas are [TD, TD] with TD a 128-multiple >= D;
    # lane-space (per-slot) math below stays on one 128-lane row (MF <= 128).
    # At TD == 128 this is byte-identical to the original single-tile kernel.
    rI = jax.lax.broadcasted_iota(jnp.int32, (TD, TD), 0)
    lI = jax.lax.broadcasted_iota(jnp.int32, (TD, TD), 1)

    # ---- F~ = blockdiag(dfv_by_dxv, I_features) --------------------------
    Ft = jnp.where((rI == lI) & (lI < D), one, zero)
    Ft = jnp.where((rI < 3) & (lI == rI + 7), f32(dt), Ft)
    # dq3_by_dq2(qwt) block
    qb = [
        [qt_w, -qt_x, -qt_y, -qt_z],
        [qt_x, qt_w, qt_z, -qt_y],
        [qt_y, -qt_z, qt_w, qt_x],
        [qt_z, qt_y, -qt_x, qt_w],
    ]
    for i in range(4):
        for j in range(4):
            Ft = jnp.where((rI == 3 + i) & (lI == 3 + j), qb[i][j], Ft)
    for i in range(4):
        for j in range(3):
            Ft = jnp.where((rI == 3 + i) & (lI == 10 + j), M[i][j], Ft)

    # ---- Q~ = blockdiag(G Pnn G', 0) (motion_model.cpp:148-217) ----------
    Gm = jnp.where((rI < 3) & (lI == rI), f32(dt), zero)
    for i in range(4):
        for j in range(3):
            Gm = jnp.where((rI == 3 + i) & (lI == 3 + j), M[i][j], Gm)
    Gm = jnp.where((rI >= 7) & (rI < 10) & (lI == rI - 7), one, Gm)
    Gm = jnp.where((rI >= 10) & (rI < 13) & (lI == rI - 7), one, Gm)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lrowT = jax.lax.broadcasted_iota(jnp.int32, (1, TD), 1)
    pnn_row = jnp.where(lrowT < 3, f32(lin_var), jnp.where(lrowT < 6, f32(ang_var), zero))
    Gp = Gm * pnn_row
    Qm = jax.lax.dot_general(Gp, Gm, (((1,), (1,)), ((), ())), precision=_HI)

    # ---- P' = F~ P F~' + Q~; x' = fv ++ x[13:] ---------------------------
    P = P_ref[...]
    top = jax.lax.dot_general(Ft, P, (((1,), (0,)), ((), ())), precision=_HI)
    Pn = jax.lax.dot_general(top, Ft, (((1,), (1,)), ((), ())), precision=_HI) + Qm
    # explicit symmetrization, mirroring ekf.predict's P[:, :CAM_DIM] = top.T
    # (ekf.py:43-45): P' here is two MXU dots, so Pxy/Pyx agree only up to
    # dot determinism. Transpose via an exact 0/1 identity contraction and
    # average — where Pn[i,j] == Pn[j,i] already, 0.5*(x+x) = x bit-for-bit
    # (the symmetric feature block passes through unchanged); only ULP
    # asymmetry in the fresh camera rows/cols is removed.
    eyeT = jnp.where(rI == lI, one, zero)
    PnT = jax.lax.dot_general(eyeT, Pn, (((1,), (1,)), ((), ())), precision=_HI)
    Pn = f32(0.5) * (Pn + PnT)
    oP_ref[...] = Pn

    xn = x_ref[...]
    for i, vv in enumerate([rn0, rn1, rn2, qn_w, qn_x, qn_y, qn_z]):
        xn = jnp.where(lrowT == i, vv, xn)
    ox_ref[...] = xn

    # ---- in-kernel slot extraction (exact 0/1 contractions) --------------
    # selector matrices are [TD, 128]: row = state dim, lane = slot index
    rM = jax.lax.broadcasted_iota(jnp.int32, (TD, 128), 0)
    lM = jax.lax.broadcasted_iota(jnp.int32, (TD, 128), 1)
    Ms = [
        jnp.where((rM == CAM_DIM + SLOT_DIM * lM + j) & (lM < MF), one, zero)
        for j in range(3)
    ]
    y_rows = [
        jax.lax.dot_general(xn, Ms[j], (((1,), (0,)), ((), ())), precision=_HI)
        for j in range(3)
    ]
    Cs = [
        jax.lax.dot_general(Pn, Ms[j], (((1,), (0,)), ((), ())), precision=_HI)
        for j in range(3)
    ]
    pxy = [[Cs[j][a : a + 1, :] for j in range(3)] for a in range(7)]
    pyy = [
        [
            jnp.sum(jnp.where(Ms[i] > 0, Cs[j], zero), axis=0, keepdims=True)
            for j in range(3)
        ]
        for i in range(3)
    ]
    pxx = [[Pn[i : i + 1, j : j + 1] for j in range(7)] for i in range(7)]

    valid = lrow < MF
    meas = _measure_math(
        r=[rn0, rn1, rn2],
        q4=(qn_w, qn_x, qn_y, qn_z),
        pxx=pxx,
        y=y_rows,
        xp_org_rows=[lanes_ref[j : j + 1, :] for j in range(7)],
        pxy=pxy,
        pyy=pyy,
        act_row=lanes_ref[7:8, :],
        valid=valid,
        fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1, sd0=sd0, W=W, H=H,
        bnd=bnd, max_len_ratio=max_len_ratio, cos_max_angle=cos_max_angle,
    )
    meas_ref[...] = meas

    # ---- in-kernel selection (monoslam.cpp:187-254 top-NSEL by score) ----
    # lax.top_k-equivalent loop: descending, stable (ties -> lowest lane).
    # Builds a one-hot column matrix so the selected [NOUT, NSEL] block falls
    # out of ONE dot, replacing the XLA top_k + column gather + per-field
    # reshape chain (~12 dispatches).
    score_row = meas[O_SCORE : O_SCORE + 1, :]
    act_r = lanes_ref[7:8, :]
    vis_lane = (act_r > 0.0) & (meas[O_VIS : O_VIS + 1, :] == 0.0) & valid
    n_visible = jnp.sum(
        jnp.where(vis_lane, jnp.float32(1.0) + zero, zero), axis=1, keepdims=True
    )

    # rank-based top-NSEL (equals lax.top_k: descending, stable): lane k's
    # rank = #{k2: s[k2] > s[k]  or  s[k2] == s[k] and k2 < k}, computed from
    # one pairwise compare matrix — constant op depth instead of an NSEL-
    # iteration max/argmax loop.
    # clamp -inf to a finite sentinel FIRST: 0 * -inf = NaN would poison the
    # transpose/one-hot dots. Monotone, so the ranking is unchanged (-inf
    # lanes were all tied; the sentinel keeps them tied).
    work = jnp.where(valid & jnp.isfinite(score_row), score_row, f32(-3e38))
    lanef = lrow.astype(jnp.float32)
    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    eye128 = jnp.where(r128 == l128, one, zero)
    s_col = jax.lax.dot_general(
        eye128, work, (((1,), (1,)), ((), ())), precision=_HI
    )                                                        # [128,1]: s[k2]
    A = jnp.broadcast_to(s_col, (128, 128))                  # A[k2,k] = s[k2]
    B = jnp.broadcast_to(work, (128, 128))                   # B[k2,k] = s[k]
    beats = (A > B) | ((A == B) & (r128 < l128))
    rank = jnp.sum(jnp.where(beats, one, zero), axis=0, keepdims=True)  # [1,128]
    rank_col = jax.lax.dot_general(
        eye128, rank, (((1,), (1,)), ((), ())), precision=_HI
    )                                                        # [128,1]: rank[k]
    Ocols = jnp.where(
        (jnp.broadcast_to(rank_col, (128, 128)) == l128.astype(f32)) & (l128 < NSEL),
        one, zero,
    )                                                        # [k, j] one-hot
    idx_row = jax.lax.dot_general(
        lanef, Ocols, (((1,), (0,)), ((), ())), precision=_HI
    )
    smax_row = jax.lax.dot_general(
        work, Ocols, (((1,), (0,)), ((), ())), precision=_HI
    )

    # sanitize non-finite lanes before the one-hot contraction: a NaN/inf at
    # an UNpicked lane would still poison every output column (NaN * 0)
    meas_dot = jnp.where(jnp.isfinite(meas) & valid, meas, zero)
    sel_ref[...] = jax.lax.dot_general(
        meas_dot, Ocols, (((1,), (0,)), ((), ())), precision=_HI
    )

    # partial-slot pick (the step's second top_k): first MAXP set lanes of
    # the active&partial mask, lowest lane first
    par_r = lanes_ref[8:9, :]
    pwork = jnp.where(valid & (par_r > 0.0), one, zero)
    pidx_row = jnp.zeros((1, 128), f32)
    pval_row = jnp.zeros((1, 128), f32)
    ptaken = jnp.zeros((1, 128), f32)
    for j in range(MAXP):
        pfree = ptaken == 0.0
        pw = jnp.where(pfree, pwork, zero - one)
        m = jnp.max(pw, axis=1, keepdims=True)
        pick = (pw == m) & pfree
        min_lane = jnp.min(jnp.where(pick, lanef, f32(1e9)), axis=1, keepdims=True)
        onehot = pick & (lanef == min_lane)
        pidx_row = pidx_row + jnp.where(lrow == j, min_lane, zero)
        pval_row = pval_row + jnp.where(lrow == j, m, zero)
        ptaken = ptaken + jnp.where(onehot, one, zero)

    aux_ref[...] = jnp.concatenate(
        [
            idx_row,
            smax_row,
            jnp.where(lrow == 0, n_visible, zero),
            pidx_row,
            pval_row,
            jnp.zeros((3, 128), f32),
        ],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nsel", "maxp", "dt", "sd_a", "sd_alpha", "cam_static",
                     "sd0", "image_shape", "boundary", "max_length_ratio",
                     "max_angle_difference", "interpret"),
)
def pallas_predict_measure(
    x: jnp.ndarray,          # [D] packed state (camera + 6-wide slots)
    P: jnp.ndarray,          # [D,D]
    xp_org: jnp.ndarray,     # [MF,7]
    act_full: jnp.ndarray,   # [MF] bool (active & fully-initialised)
    act_part: jnp.ndarray,   # [MF] bool (active & partial)
    nsel: int,
    maxp: int,
    dt: float,
    sd_a: float,
    sd_alpha: float,
    cam_static: tuple,       # (fku, fkv, u0, v0, kd1)
    sd0: float,
    image_shape=(240, 320),
    boundary: float = 20.0,
    max_length_ratio: float = 2.0,
    max_angle_difference: float = 0.7853981633974483,
    interpret: bool | None = None,
):
    """Returns (meas [NOUT, MF], sel [NOUT, nsel], x' [D], P' [D,D],
    top_idx [nsel] i32, top_score [nsel], n_visible [] i32,
    pidx [maxp] i32, pmask [maxp] bool).

    meas is the pallas_measure row layout (O_* constants) computed on the
    PREDICTED state; sel is its top-nsel column block by selection score
    (lax.top_k order); x'/P' are the EKF-predicted state and covariance."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    D = x.shape[0]
    MF = xp_org.shape[0]
    # P-space ops tile to TD (a 128-multiple): hires (60 slots, D=373) runs
    # in one kernel on a 384-wide P. 384 caps in-kernel VMEM at ~5 MB of
    # [TD,TD] f32 intermediates; larger maps keep the split path.
    TD = ((D + 127) // 128) * 128
    assert D <= 384, "tiled kernel: D beyond 384 exceeds the VMEM budget"
    assert MF <= 128, "slot math is lane-parallel on one 128-lane row"
    f32 = jnp.float32

    xp_pad = jnp.zeros((1, TD), f32).at[0, :D].set(x.astype(f32))
    Pp = jnp.zeros((TD, TD), f32).at[:D, :D].set(P.astype(f32))
    lanes = jnp.zeros((16, 128), f32)
    lanes = lanes.at[:7, :MF].set(xp_org.T.astype(f32))
    lanes = lanes.at[7, :MF].set(act_full.astype(f32))
    lanes = lanes.at[8, :MF].set(act_part.astype(f32))
    smem = jnp.zeros((1, 16), f32).at[0, :CAM_DIM].set(x[:CAM_DIM].astype(f32))

    lin_var = sd_a * sd_a * dt * dt
    ang_var = sd_alpha * sd_alpha * dt * dt
    H, W = image_shape
    fku, fkv, u0c, v0c, kd1 = cam_static

    kernel = functools.partial(
        _predict_measure_kernel,
        D=D, TD=TD, MF=MF, NSEL=int(nsel), MAXP=int(maxp),
        dt=float(dt), lin_var=float(lin_var), ang_var=float(ang_var),
        fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1, sd0=sd0,
        W=float(W), H=float(H), bnd=float(boundary),
        max_len_ratio=float(max_length_ratio),
        cos_max_angle=float(math.cos(max_angle_difference)),
    )
    meas, ox, oP, sel, aux = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NOUT, 128), f32),
            jax.ShapeDtypeStruct((1, TD), f32),
            jax.ShapeDtypeStruct((TD, TD), f32),
            jax.ShapeDtypeStruct((NOUT, 128), f32),
            jax.ShapeDtypeStruct((8, 128), f32),
        ],
        interpret=interpret,
    )(smem, xp_pad, Pp, lanes)
    return (
        meas[:, :MF],
        sel[:, :nsel],
        ox[0, :D].astype(x.dtype),
        oP[:D, :D].astype(P.dtype),
        aux[0, :nsel].astype(jnp.int32),
        aux[1, :nsel],
        aux[2, 0].astype(jnp.int32),
        aux[3, :maxp].astype(jnp.int32),
        aux[4, :maxp] > 0.0,
    )
