"""Fused EKF joint update + quaternion-normalise + delete + symmetrize.

One Pallas kernel replaces the whole fast-mode filter-algebra block of the
step (reference kalman.cpp:72-119, monoslam.cpp:616-637, :644-703, :145-150):

  S = H P H' + R            (masked rows: H=0, nu=0, R=I)
  L, L^-1 via in-kernel Cholesky (same recurrences as pallas_linalg)
  W = P H' S^-1;  x' = x + W nu;  P' = P - W S W'
  covariance transform by the quaternion-norm Jacobian (built in-kernel
  from x' with vector math — the reference quirk formulas, see
  core.quaternion._norm_jac)
  select posterior vs prior by the any-success gate
  zero deleted slots' rows/cols (keep mask), P <- (P + P')/2

As XLA ops this block is ~35 dispatches incl. a separate chol kernel launch
(~25-35us/frame of mostly per-op overhead at D=109); fused it is a handful
of MXU dots plus short VPU chains. f32 fast mode only (Mosaic has no f64);
the parity path keeps core.ekf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scenelib2_tpu.kernels.pallas_linalg import chol_linv_body

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _update_kernel(smem_ref, x_ref, P_ref, H_ref, nu_ref, R_ref, keep_ref,
                   ox_ref, oP_ref, *, D, M, pad_d, pad_m):
    P = P_ref[..., :pad_d]                      # [pad_d, pad_d]
    H = H_ref[...]                              # [pad_m, 128]
    Hd = H[:, :pad_d]

    # S = H P H' + R on the leading MxM block (pads are zero)
    PHt = jax.lax.dot_general(P, Hd, (((1,), (1,)), ((), ())), precision=_HI)
    S = jax.lax.dot_general(Hd, PHt, (((1,), (0,)), ((), ())), precision=_HI)
    S = S + R_ref[..., :pad_m]                  # [pad_m, pad_m]

    S128 = jnp.concatenate(
        [S, jnp.zeros((pad_m, 128 - pad_m), jnp.float32)], axis=1
    )
    Linv = chol_linv_body(S128, M, pad_m)[:, :pad_m]            # [pad_m, pad_m]
    Sinv = jax.lax.dot_general(Linv, Linv, (((0,), (0,)), ((), ())), precision=_HI)

    W = jax.lax.dot_general(PHt, Sinv, (((1,), (0,)), ((), ())), precision=_HI)
    nu = nu_ref[..., :pad_m]                    # [1, pad_m]
    Wnu = jax.lax.dot_general(nu, W, (((1,), (1,)), ((), ())), precision=_HI)  # [1, pad_d]
    x = x_ref[..., :pad_d]
    x_upd = x + Wnu

    WS = jax.lax.dot_general(W, S, (((1,), (0,)), ((), ())), precision=_HI)
    WSWt = jax.lax.dot_general(WS, W, (((1,), (1,)), ((), ())), precision=_HI)
    P_upd = P - WSWt                            # [pad_d, pad_d]

    # quaternion-'normalisation' covariance transform (monoslam.cpp:616-637)
    # with the reference's qq=|q|^2 quirk Jacobian; built with vector math
    qrow = x_upd[:, 3:7]                                        # [1, 4]
    qq = jnp.sum(qrow * qrow, axis=1, keepdims=True)            # [1, 1]
    Q1 = jnp.broadcast_to(qrow, (4, 4))                         # rows = q
    eye4 = jnp.eye(4, dtype=jnp.float32)
    Q2 = jax.lax.dot_general(Q1, eye4, (((0,), (0,)), ((), ())), precision=_HI)
    # Q2 = Q1' (cols = q) via a dot so no small-array transpose is needed
    outer = Q1 * Q2
    diag_v = (1.0 - qrow * qrow / (qq * qq)) / qq               # [1, 4]
    Dg = jnp.broadcast_to(diag_v, (4, 4))
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    l4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
    J = jnp.where(r4 == l4, Dg, -outer / (qq * qq * qq))

    rowd = jax.lax.broadcasted_iota(jnp.int32, (pad_d, pad_d), 0)
    laned = jax.lax.broadcasted_iota(jnp.int32, (pad_d, pad_d), 1)
    Jpad = jnp.pad(J, ((3, pad_d - 7), (3, pad_d - 7)))
    in_q = (rowd >= 3) & (rowd < 7) & (laned >= 3) & (laned < 7)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ident = jnp.where((rowd == laned) & (rowd < D), one, zero)
    T = jnp.where(in_q, Jpad, ident)

    PT = jax.lax.dot_general(P_upd, T, (((1,), (1,)), ((), ())), precision=_HI)
    P_norm = jax.lax.dot_general(T, PT, (((1,), (0,)), ((), ())), precision=_HI)

    # any-success gate, deleted-slot zeroing, symmetrization
    anyv = jnp.zeros((1, 1), jnp.float32) + smem_ref[0, 0]
    any_m = jnp.broadcast_to(anyv > 0.0, (pad_d, pad_d))
    P_sel = jnp.where(any_m, P_norm, P)
    x_sel = jnp.where(jnp.broadcast_to(anyv > 0.0, (1, pad_d)), x_upd, x)

    keep = keep_ref[..., :pad_d]                                # [1, pad_d]
    keep2 = jax.lax.dot_general(keep, keep, (((0,), (0,)), ((), ())), precision=_HI)
    P_del = P_sel * keep2
    x_del = x_sel * keep

    Pt = jax.lax.dot_general(
        P_del, jnp.where(rowd == laned, one, zero),
        (((0,), (0,)), ((), ())), precision=_HI,
    )                                                           # P_del'
    P_out = P_del * 0.5 + Pt * 0.5

    zx = jnp.zeros((1, 128 - pad_d), jnp.float32)
    ox_ref[...] = jnp.concatenate([x_del, zx], axis=1)
    zP = jnp.zeros((pad_d, 128 - pad_d), jnp.float32)
    oP_ref[...] = jnp.concatenate([P_out, zP], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_joint_update_norm(
    x: jnp.ndarray,          # [D]
    P: jnp.ndarray,          # [D,D]
    H: jnp.ndarray,          # [M,D]
    nu: jnp.ndarray,         # [M]
    R: jnp.ndarray,          # [M,M]
    any_succ: jnp.ndarray,   # [] bool
    keep_dims: jnp.ndarray,  # [D] bool (False rows/cols are zeroed — deletes)
    interpret: bool | None = None,
):
    """Fused joint update + normalise + select + delete + symmetrize.

    Returns (x_out [D], P_out [D,D])."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    D = x.shape[0]
    M = nu.shape[0]
    assert D <= 128, "single-tile kernel: D must fit one lane row"
    pad_d = _round_up(D, 8)
    pad_m = _round_up(M, 8)

    f32 = jnp.float32
    xp = jnp.zeros((1, 128), f32).at[0, :D].set(x.astype(f32))
    Pp = jnp.zeros((pad_d, 128), f32).at[:D, :D].set(P.astype(f32))
    Hp = jnp.zeros((pad_m, 128), f32).at[:M, :D].set(H.astype(f32))
    nup = jnp.zeros((1, 128), f32).at[0, :M].set(nu.astype(f32))
    Rp = jnp.zeros((pad_m, 128), f32).at[:M, :M].set(R.astype(f32))
    keepp = jnp.zeros((1, 128), f32).at[0, :D].set(keep_dims.astype(f32))
    smem = jnp.zeros((1, 1), f32).at[0, 0].set(any_succ.astype(f32))

    kernel = functools.partial(_update_kernel, D=D, M=M, pad_d=pad_d, pad_m=pad_m)
    ox, oP = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 128), f32),
            jax.ShapeDtypeStruct((pad_d, 128), f32),
        ],
        interpret=interpret,
    )(smem, xp, Pp, Hp, nup, Rp, keepp)
    return ox[0, :D].astype(x.dtype), oP[:D, :D].astype(P.dtype)


def _update_kernel_compact(smem_ref, seli_ref, x_ref, P_ref, keep_ref,
                           ox_ref, oP_ref, obk_ref=None, *, D, NSEL, HXO, HYO,
                           RDO, HO, ZO, pad_d, pad_m, bk=False, mina=0.0,
                           frac=0.0):
    # pad_d is the 128-multiple >= D (std 128; hires 384): state-dim operands
    # are [pad_d, pad_d] blocks and Mosaic tiles the larger dots internally.
    """Compact-input variant: H, R and nu are BUILT IN-KERNEL from the
    measurement kernel's selected-column matrix instead of being assembled
    (one-hot einsum + scatters + pad copies) on the XLA side.

    smem_ref (SMEM f32 [NOUT+3, NSEL]): rows HXO.. = hx[2,7] row-major,
    HYO.. = hy[2,3], RDO = noise var, HO.. = predicted h (u,v); extra rows
    NOUT+0/1 = matched z (u,v), NOUT+2 = succ flag.
    seli_ref (SMEM i32 [NSEL]): slot state offsets. keep_ref (VMEM [1,128])
    f32 keep mask; smem any-success flag lives in its lane... passed as
    keep_ref[0, 127] is NOT used — any_succ is smem row NOUT+2 reduced by
    the caller into succ flags (any_succ == any(succ))."""
    TD = _round_up(pad_d, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TD), 1)
    zrow = jnp.zeros((1, TD), jnp.float32)

    rows = []
    nu_row = zrow
    rd_row = zrow
    any_succ_f = jnp.float32(0.0)
    for k in range(NSEL):
        succ = smem_ref[ZO + 2, k]                     # 1.0 / 0.0
        any_succ_f = jnp.maximum(any_succ_f, succ)
        off = seli_ref[k]
        for i in range(2):
            row = zrow
            for a in range(7):
                row = row + jnp.where(
                    lane == a, succ * smem_ref[HXO + i * 7 + a, k], 0.0
                )
            for j in range(3):
                row = row + jnp.where(
                    lane == off + j, succ * smem_ref[HYO + i * 3 + j, k], 0.0
                )
            rows.append(row)
            nu_k = succ * (smem_ref[ZO + i, k] - smem_ref[HO + i, k])
            nu_row = nu_row + jnp.where(lane == 2 * k + i, nu_k, 0.0)
            rv = jnp.where(succ > 0.0, smem_ref[RDO, k], jnp.float32(1.0))
            rd_row = rd_row + jnp.where(lane == 2 * k + i, rv, 0.0)
    rows += [zrow] * (pad_m - 2 * NSEL)
    Hm = jnp.concatenate(rows, axis=0)                 # [pad_m, TD]

    P = P_ref[..., :pad_d]
    Hd = Hm[:, :pad_d]
    PHt = jax.lax.dot_general(P, Hd, (((1,), (1,)), ((), ())), precision=_HI)
    S = jax.lax.dot_general(Hd, PHt, (((1,), (0,)), ((), ())), precision=_HI)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (pad_m, pad_m), 0)
    lanem = jax.lax.broadcasted_iota(jnp.int32, (pad_m, pad_m), 1)
    S = S + jnp.where(
        rowm == lanem, jnp.broadcast_to(rd_row[:, :pad_m], (pad_m, pad_m)), 0.0
    )

    M = 2 * NSEL
    S128 = jnp.concatenate([S, jnp.zeros((pad_m, 128 - pad_m), jnp.float32)], axis=1)
    Linv = chol_linv_body(S128, M, pad_m)[:, :pad_m]
    Sinv = jax.lax.dot_general(Linv, Linv, (((0,), (0,)), ((), ())), precision=_HI)

    W = jax.lax.dot_general(PHt, Sinv, (((1,), (0,)), ((), ())), precision=_HI)
    nu = nu_row[:, :pad_m]
    Wnu = jax.lax.dot_general(nu, W, (((1,), (1,)), ((), ())), precision=_HI)
    x = x_ref[..., :pad_d]
    x_upd = x + Wnu

    WS = jax.lax.dot_general(W, S, (((1,), (0,)), ((), ())), precision=_HI)
    WSWt = jax.lax.dot_general(WS, W, (((1,), (1,)), ((), ())), precision=_HI)
    P_upd = P - WSWt

    qrow = x_upd[:, 3:7]
    qq = jnp.sum(qrow * qrow, axis=1, keepdims=True)
    Q1 = jnp.broadcast_to(qrow, (4, 4))
    eye4 = jnp.eye(4, dtype=jnp.float32)
    Q2 = jax.lax.dot_general(Q1, eye4, (((0,), (0,)), ((), ())), precision=_HI)
    outer = Q1 * Q2
    diag_v = (1.0 - qrow * qrow / (qq * qq)) / qq
    Dg = jnp.broadcast_to(diag_v, (4, 4))
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    l4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
    J = jnp.where(r4 == l4, Dg, -outer / (qq * qq * qq))

    rowd = jax.lax.broadcasted_iota(jnp.int32, (pad_d, pad_d), 0)
    laned = jax.lax.broadcasted_iota(jnp.int32, (pad_d, pad_d), 1)
    Jpad = jnp.pad(J, ((3, pad_d - 7), (3, pad_d - 7)))
    in_q = (rowd >= 3) & (rowd < 7) & (laned >= 3) & (laned < 7)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ident = jnp.where((rowd == laned) & (rowd < D), one, zero)
    T = jnp.where(in_q, Jpad, ident)

    PT = jax.lax.dot_general(P_upd, T, (((1,), (1,)), ((), ())), precision=_HI)
    P_norm = jax.lax.dot_general(T, PT, (((1,), (0,)), ((), ())), precision=_HI)

    anyv = jnp.zeros((1, 1), jnp.float32) + any_succ_f
    any_m = jnp.broadcast_to(anyv > 0.0, (pad_d, pad_d))
    P_sel = jnp.where(any_m, P_norm, P)
    x_sel = jnp.where(jnp.broadcast_to(anyv > 0.0, (1, pad_d)), x_upd, x)

    if bk:
        # ---- in-kernel feature bookkeeping (monoslam.cpp:644-703) --------
        # keep_ref here is the [8,128] bookkeeping block: rows 0..4 =
        # attempts, successes, sched, active, label (f32). Replaces the XLA
        # scatter-add / ratio / argsort(label) / cummax / scatter chain.
        bkr = keep_ref[...]
        att = bkr[0:1]
        suc = bkr[1:2]
        sch = bkr[2:3]
        act = bkr[3:4]
        lab = bkr[4:5]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for k in range(NSEL):
            is_k = (lane1 == seli_ref[NSEL + k]).astype(jnp.float32)
            att = att + is_k * smem_ref[ZO + 3, k]
            suc = suc + is_k * smem_ref[ZO + 2, k]
        ratio = jnp.where(att > 0.0, suc / jnp.maximum(att, 1.0), 1.0)
        bad = (act > 0.0) & (att >= jnp.float32(mina)) & (ratio < jnp.float32(frac))
        sched1 = ((sch > 0.0) | bad) & (act > 0.0)
        sched1f = sched1.astype(jnp.float32)                     # [1,128]
        # stable rank by (label if active else 2^30, slot index): the
        # exterminate-skip closed form needs slots in reference list order
        key = jnp.where(act > 0.0, lab, jnp.float32(1 << 30))
        r8 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        l8 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        I128 = jnp.where(r8 == l8, one, zero)
        B = jnp.broadcast_to(key, (128, 128))                    # B[r,c]=key_c
        Tm = jax.lax.dot_general(B, I128, (((0,), (0,)), ((), ())),
                                 precision=_HI)                  # Tm[r,c]=key_r
        cmpT = ((Tm < B) | ((Tm == B) & (r8 < l8))).astype(jnp.float32)
        rank_row = jnp.sum(cmpT, axis=0, keepdims=True)          # [1,128]
        # Perm[p,i] = (rank_i == p)
        Perm = (jnp.broadcast_to(rank_row, (128, 128))
                == r8.astype(jnp.float32)).astype(jnp.float32)
        s_sorted = jax.lax.dot_general(
            sched1f, Perm, (((1,), (1,)), ((), ())), precision=_HI
        )                                                        # [1,128] over p
        pos_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
        t_row = jnp.where(s_sorted > 0.0, 0.0, pos_row + 1.0)
        TQ = jnp.broadcast_to(t_row, (128, 128))                 # TQ[p,q]=t_q
        run_start = jnp.max(
            jnp.where(l8 <= r8, TQ, -1.0), axis=1, keepdims=True
        )                                                        # [128,1]
        s_sorted_c = jax.lax.dot_general(
            Perm, sched1f, (((1,), (1,)), ((), ())), precision=_HI
        )                                                        # [128,1]
        pos_col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0).astype(jnp.float32)
        dcol = pos_col - run_start
        even = (dcol - 2.0 * jnp.floor(dcol * 0.5)) == 0.0
        kill_pos = ((s_sorted_c > 0.0) & even).astype(jnp.float32)
        kill_row = jax.lax.dot_general(
            kill_pos, Perm, (((0,), (0,)), ((), ())), precision=_HI
        )                                                        # [1,128]
        sched_after = sched1f * (1.0 - kill_row)
        # expand slot kills to state dims: E[i,d] = d in [13+6i, 19+6i)
        ri = jax.lax.broadcasted_iota(jnp.int32, (128, pad_d), 0)
        ld = jax.lax.broadcasted_iota(jnp.int32, (128, pad_d), 1)
        ES = ((ld >= 13 + 6 * ri) & (ld < 19 + 6 * ri)).astype(jnp.float32)
        keep = 1.0 - jax.lax.dot_general(
            kill_row, ES, (((1,), (0,)), ((), ())), precision=_HI
        )                                                        # [1,pad_d]
        obk_ref[...] = jnp.concatenate(
            [att, suc, sched_after, kill_row,
             jnp.zeros((4, 128), jnp.float32)], axis=0
        )
    else:
        keep = keep_ref[..., :pad_d]
    keep2 = jax.lax.dot_general(keep, keep, (((0,), (0,)), ((), ())), precision=_HI)
    P_del = P_sel * keep2
    x_del = x_sel * keep

    Pt = jax.lax.dot_general(
        P_del, jnp.where(rowd == laned, one, zero),
        (((0,), (0,)), ((), ())), precision=_HI,
    )
    P_out = P_del * 0.5 + Pt * 0.5

    zx = jnp.zeros((1, TD - pad_d), jnp.float32)
    ox_ref[...] = jnp.concatenate([x_del, zx], axis=1) if TD > pad_d else x_del
    zP = jnp.zeros((pad_d, TD - pad_d), jnp.float32)
    oP_ref[...] = jnp.concatenate([P_out, zP], axis=1) if TD > pad_d else P_out


@functools.partial(
    jax.jit, static_argnames=("interpret", "meas_rows", "mina", "frac")
)
def pallas_joint_update_norm_compact(
    x: jnp.ndarray,          # [D]
    P: jnp.ndarray,          # [D,D]
    sel: jnp.ndarray,        # [NOUT, NSEL] measurement-kernel column block
    z: jnp.ndarray,          # [NSEL, 2] matched pixels
    succ: jnp.ndarray,       # [NSEL] bool
    offs: jnp.ndarray,       # [NSEL] i32 slot state offsets
    keep_dims,               # [D] bool, or None with bookkeeping
    meas_rows: tuple,        # (HXO, HYO, RDO, HO) row indices into sel
    interpret: bool | None = None,
    bookkeeping=None,        # (attempts, successes, sched, active, label)
    sel_mask=None,           # [NSEL] bool (required with bookkeeping)
    top_idx=None,            # [NSEL] i32 slot ids (required with bookkeeping)
    mina: float = 0.0,       # min_attempted_measurements (static)
    frac: float = 0.0,       # successful_match_fraction (static)
):
    """Fused update with in-kernel H/R/nu assembly from the measurement
    kernel's selected columns. Returns (x_out [D], P_out [D,D]).

    With bookkeeping=(attempts, successes, sched, active, label) the kernel
    also absorbs the per-frame feature bookkeeping (scatter-add the
    attempt/success counters, the failure-ratio test, the exterminate
    iterator-skip closed form incl. its label argsort, and the keep-dims
    expansion — monoslam.cpp:644-703): keep_dims must be None and the return
    becomes (x, P, attempts', successes', sched', kill[MF])."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    D = x.shape[0]
    NSEL = sel.shape[1]
    NOUT = sel.shape[0]
    # TD = 128-multiple >= D: hires (D=373) runs fused on [376, 384] blocks;
    # at D <= 128 the compiled kernel is byte-identical to the single-tile
    # original (TD == 128).
    TD = _round_up(D, 128)
    assert D <= 384 and 2 * NSEL <= 128
    pad_d = _round_up(D, 8)
    pad_m = _round_up(2 * NSEL, 8)
    HXO, HYO, RDO, HO = meas_rows
    bk = bookkeeping is not None

    f32 = jnp.float32
    rows = [
        sel.astype(f32),
        z.T.astype(f32),                       # rows NOUT, NOUT+1
        succ.astype(f32)[None, :],             # row NOUT+2
    ]
    if bk:
        rows.append(sel_mask.astype(f32)[None, :])   # row NOUT+3
    smem = jnp.concatenate(rows, axis=0)
    xp = jnp.zeros((1, TD), f32).at[0, :D].set(x.astype(f32))
    Pp = jnp.zeros((pad_d, TD), f32).at[:D, :D].set(P.astype(f32))
    if bk:
        att, suc_c, sch, act, lab = bookkeeping
        MF = att.shape[0]
        assert MF <= 128
        bkrows = jnp.stack(
            [att.astype(f32), suc_c.astype(f32), sch.astype(f32),
             act.astype(f32), lab.astype(f32)], axis=0
        )                                            # [5, MF]
        keepp = jnp.zeros((8, 128), f32).at[:5, :MF].set(bkrows)
        seli = jnp.concatenate(
            [offs.astype(jnp.int32), top_idx.astype(jnp.int32)]
        )
    else:
        keepp = jnp.zeros((1, TD), f32).at[0, :D].set(keep_dims.astype(f32))
        seli = offs.astype(jnp.int32)

    kernel = functools.partial(
        _update_kernel_compact,
        D=D, NSEL=NSEL, HXO=HXO, HYO=HYO, RDO=RDO, HO=HO, ZO=NOUT,
        pad_d=pad_d, pad_m=pad_m, bk=bk, mina=mina, frac=frac,
    )
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, TD), f32),
        jax.ShapeDtypeStruct((pad_d, TD), f32),
    ]
    if bk:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, 128), f32))
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(smem, seli, xp, Pp, keepp)
    x_out = outs[0][0, :D].astype(x.dtype)
    P_out = outs[1][:D, :D].astype(P.dtype)
    if not bk:
        return x_out, P_out
    obk = outs[2]
    return (
        x_out, P_out,
        obk[0, :MF].astype(bookkeeping[0].dtype),
        obk[1, :MF].astype(bookkeeping[1].dtype),
        obk[2, :MF] > 0.5,
        obk[3, :MF] > 0.5,
    )
