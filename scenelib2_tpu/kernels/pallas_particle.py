"""Per-particle measurement prediction as one lane-parallel Pallas kernel.

The particle depth filter predicts, for every depth hypothesis lambda, the
image point hpi = project(zeroedri + lambda*zeroedhhat), the innovation
covariance S(lambda) = A(lambda) K(lambda) A(lambda)' + R (K-form, see
runtime/step.py), its Cholesky inverse + determinant, and the 3-sigma search
extents (reference: part_feature_model.cpp:231-265, feature_init_info.cpp:
57-65, search_multiple_overlapping_ellipses.cpp:41-48).

Under vmap this chain lowers to ~300 [1,NP]-shaped XLA micro-fusions whose
per-instruction overhead (~0.15 us each) dominates the TPU step. Here the
whole chain is ONE kernel with particles on vector lanes: ~120 single-vreg
VPU ops (~1 us). f32 fast-mode only; the parity path keeps the vmapped form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# SMEM parameter row layout
_ZR = 0          # zeroed[0:3]
_ZH = 3          # zeroed[3:6]
_K0 = 6          # K0 row-major [9]
_KS = 15         # Ksym row-major [9]
_K2 = 24         # K2 row-major [9]
_NPARAM = 33

# output row layout
ROW_HU, ROW_HV, ROW_S00, ROW_S01, ROW_S11, ROW_DET, ROW_HW, ROW_HH = range(8)


def _particle_tail(lam, zr, zh, K0, Ks, K2, *, fku, fkv, u0c, v0c,
                   kd1, sd0, maxdist, no_sigma):
    """Per-particle vector chain shared by both kernels.

    zr/zh are 3-lists of scalars; K0/Ks/K2 are 3x3 nested lists of scalars.
    Identical op order to the original in-kernel body, so the SMEM-parameter
    kernel stays bit-equal to its previous form.
    """
    x = zr[0] + lam * zh[0]
    y = zr[1] + lam * zh[1]
    z = zr[2] + lam * zh[2]
    invz = 1.0 / z

    ucx = -fku * x * invz
    ucy = -fkv * y * invz
    r2 = ucx * ucx + ucy * ucy
    d = 1.0 + 2.0 * kd1 * r2
    d12 = jnp.sqrt(d)
    hu = ucx / d12 + u0c
    hv = ucy / d12 + v0c

    # A = dh_by_duc @ duc_by_dy (camera.cpp:183-215)
    c1 = 1.0 / d12
    c3 = -2.0 * kd1 / (d12 * d)
    m00 = ucx * ucx * c3 + c1
    m01 = ucx * ucy * c3
    m11 = ucy * ucy * c3 + c1
    j00 = -fku * invz
    j11 = -fkv * invz
    j02 = fku * x * invz * invz
    j12 = fkv * y * invz * invz
    a00 = m00 * j00
    a01 = m01 * j11
    a02 = m00 * j02 + m01 * j12
    a10 = m01 * j00
    a11 = m11 * j11
    a12 = m01 * j02 + m11 * j12

    # Kl = K0 + lam*Ksym + lam^2*K2 (symmetric)
    lam2 = lam * lam

    def kl(i, j):
        return K0[i][j] + lam * Ks[i][j] + lam2 * K2[i][j]

    k00, k01, k02 = kl(0, 0), kl(0, 1), kl(0, 2)
    k11, k12, k22 = kl(1, 1), kl(1, 2), kl(2, 2)

    # S = A Kl A' + R
    t00 = a00 * k00 + a01 * k01 + a02 * k02
    t01 = a00 * k01 + a01 * k11 + a02 * k12
    t02 = a00 * k02 + a01 * k12 + a02 * k22
    t10 = a10 * k00 + a11 * k01 + a12 * k02
    t11 = a10 * k01 + a11 * k11 + a12 * k12
    t12 = a10 * k02 + a11 * k12 + a12 * k22
    s00 = t00 * a00 + t01 * a01 + t02 * a02
    s01 = t00 * a10 + t01 * a11 + t02 * a12
    s11 = t10 * a10 + t11 * a11 + t12 * a12

    du = hu - u0c
    dv = hv - v0c
    dist = jnp.sqrt(du * du + dv * dv)
    sd = sd0 * (1.0 + dist / maxdist)
    r = sd * sd
    s00 = s00 + r
    s11 = s11 + r

    det = s00 * s11 - s01 * s01

    # S^-1 via 2x2 LLT (monoslam.cpp:371-374 / feature_init_info.cpp:57-65)
    l11 = jnp.sqrt(s00)
    l21 = s01 / l11
    l22 = jnp.sqrt(s11 - l21 * l21)
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i21 = -l21 * i11 * i22
    q00 = i11 * i11 + i21 * i21
    q01 = i21 * i22
    q11 = i22 * i22

    hw = jnp.floor(no_sigma / jnp.sqrt(q00 - q01 * q01 / q11))
    hh = jnp.floor(no_sigma / jnp.sqrt(q11 - q01 * q01 / q00))

    return jnp.stack([hu, hv, q00, q01, q11, det, hw, hh])      # [8, NP_pad]


def _predict_kernel(par_ref, lam_ref, out_ref, *, NP_pad, fku, fkv, u0c, v0c,
                    kd1, sd0, maxdist, no_sigma):
    lam = lam_ref[0, 0, :]                                     # [NP_pad]

    def p(i):
        return par_ref[0, i]

    zr = [p(_ZR + i) for i in range(3)]
    zh = [p(_ZH + i) for i in range(3)]
    K0 = [[p(_K0 + 3 * i + j) for j in range(3)] for i in range(3)]
    Ks = [[p(_KS + 3 * i + j) for j in range(3)] for i in range(3)]
    K2 = [[p(_K2 + 3 * i + j) for j in range(3)] for i in range(3)]
    out_ref[0] = _particle_tail(
        lam, zr, zh, K0, Ks, K2, fku=fku, fkv=fkv, u0c=u0c, v0c=v0c,
        kd1=kd1, sd0=sd0, maxdist=maxdist, no_sigma=no_sigma,
    )


@functools.partial(
    jax.jit,
    static_argnames=("fku", "fkv", "u0c", "v0c", "kd1", "sd0", "no_sigma", "interpret"),
)
def pallas_particle_predict(
    zeroed: jnp.ndarray,    # [F, 6] lambda-independent ray geometry
    K0: jnp.ndarray,        # [F, 3, 3]
    Ksym: jnp.ndarray,      # [F, 3, 3]
    K2: jnp.ndarray,        # [F, 3, 3]
    lam: jnp.ndarray,       # [F, NP]
    fku: float = 195.0,
    fkv: float = 195.0,
    u0c: float = 162.0,
    v0c: float = 125.0,
    kd1: float = 9e-6,
    sd0: float = 1.0,
    no_sigma: float = 3.0,
    interpret: bool | None = None,
):
    """Returns (hpi [F,NP,2], sinv [F,NP,2,2], dets [F,NP], hw [F,NP], hh [F,NP])."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F, NP = lam.shape
    NP_pad = max(_round_up(NP, 128), 128)
    import numpy as _np

    maxdist = float(
        _np.sqrt(_np.float32(u0c) * _np.float32(u0c) + _np.float32(v0c) * _np.float32(v0c))
    )

    par = jnp.concatenate(
        [
            zeroed.astype(jnp.float32),
            K0.reshape(F, 9).astype(jnp.float32),
            Ksym.reshape(F, 9).astype(jnp.float32),
            K2.reshape(F, 9).astype(jnp.float32),
        ],
        axis=1,
    )                                                           # [F, 33]
    # lambda 1.0 in padding lanes keeps all the in-kernel math finite
    lam_p = jnp.full((F, 1, NP_pad), 1.0, jnp.float32).at[:, 0, :NP].set(
        lam.astype(jnp.float32)
    )

    kernel = functools.partial(
        _predict_kernel,
        NP_pad=NP_pad, fku=float(fku), fkv=float(fkv), u0c=float(u0c),
        v0c=float(v0c), kd1=float(kd1), sd0=float(sd0), maxdist=maxdist,
        no_sigma=float(no_sigma),
    )
    out = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, _NPARAM), lambda f: (f, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NP_pad), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 8, NP_pad), jnp.float32),
        interpret=interpret,
    )(par, lam_p)

    out = out[:, :, :NP]
    hpi = jnp.stack([out[:, ROW_HU], out[:, ROW_HV]], axis=-1)
    sinv = jnp.stack(
        [out[:, ROW_S00], out[:, ROW_S01], out[:, ROW_S01], out[:, ROW_S11]], axis=-1
    ).reshape(F, NP, 2, 2)
    return hpi, sinv, out[:, ROW_DET], out[:, ROW_HW], out[:, ROW_HH]


# ---------------------------------------------------------------------------
# Fused variant: slot geometry computed IN-KERNEL from raw state blocks
# ---------------------------------------------------------------------------
#
# The K-form prologue (quaternion inverse -> rotation matrix -> the two
# dRq_times_a_by_dq Jacobians -> N1/N2 assembly -> K0/Ksym/K2 = N C N'
# block products, runtime/step.py slot_geom) is ~30 tiny XLA fusions per
# heavy frame whose dispatch overhead dominates their FLOPs. Here the whole
# chain runs as unrolled scalar math in the kernel prologue (~1.5k scalar
# FMAs, sub-microsecond on the scalar core), so the step hands the kernel
# raw state blocks and no XLA graphlet remains.

# shared SMEM row: xp[7] + Pxx7 row-major [49]
_SH_XP = 0
_SH_PXX = 7
_NSHARED = 56
# per-slot SMEM row: y6[6] + pxy7 row-major [42] + pyy row-major [36]
_SL_Y = 0
_SL_PXY = 6
_SL_PYY = 48
_NSLOT = 84


def _is_zero(v) -> bool:
    return isinstance(v, float) and v == 0.0


def _dot_row(a_row, b_row):
    """Sum_k a[k]*b[k] over scalar lists, skipping literal zeros."""
    acc = None
    for a, b in zip(a_row, b_row):
        if _is_zero(a) or _is_zero(b):
            continue
        term = a * b
        acc = term if acc is None else acc + term
    return 0.0 if acc is None else acc


def _mat_mul_t(A, B):
    """A [m][k] @ B' for B [n][k] -> [m][n] scalar lists."""
    return [[_dot_row(ar, br) for br in B] for ar in A]


def _drq_dqbar(qw, qx, qy, qz, a):
    """dRq_times_a_by_dq(q, a) @ dqbar_by_dq as a [3][4] scalar list.

    Columns are dR_by_dq{0,x,y,z} @ a (feature_model.cpp:167-237) with the
    conjugation Jacobian's column sign flips folded in.
    """
    a0, a1, a2 = a
    col0 = [
        2.0 * (qw * a0 - qz * a1 + qy * a2),
        2.0 * (qz * a0 + qw * a1 - qx * a2),
        2.0 * (-qy * a0 + qx * a1 + qw * a2),
    ]
    col1 = [
        2.0 * (qx * a0 + qy * a1 + qz * a2),
        2.0 * (qy * a0 - qx * a1 - qw * a2),
        2.0 * (qz * a0 + qw * a1 - qx * a2),
    ]
    col2 = [
        2.0 * (-qy * a0 + qx * a1 + qw * a2),
        2.0 * (qx * a0 + qy * a1 + qz * a2),
        2.0 * (-qw * a0 + qz * a1 - qy * a2),
    ]
    col3 = [
        2.0 * (-qz * a0 - qw * a1 + qx * a2),
        2.0 * (qw * a0 - qz * a1 + qy * a2),
        2.0 * (qx * a0 + qy * a1 + qz * a2),
    ]
    # @ dqbar = diag(1,-1,-1,-1): negate the x/y/z columns
    return [
        [col0[i], -col1[i], -col2[i], -col3[i]] for i in range(3)
    ]


def _geometry_prologue(sh, sl):
    """Scalar slot geometry: returns (zr, zh, K0, Ksym, K2) scalar lists.

    Mirrors runtime/step.py slot_geom + core/models.part_zeroedyi
    (part_feature_model.cpp:80-144) in f32, with the N C N' products
    evaluated through the same N1 C N1' factorisation.
    """
    r = [sh(_SH_XP + i) for i in range(3)]
    q = [sh(_SH_XP + 3 + i) for i in range(4)]
    P11 = [[sh(_SH_PXX + 7 * i + j) for j in range(7)] for i in range(7)]
    ri = [sl(_SL_Y + i) for i in range(3)]
    hh = [sl(_SL_Y + 3 + i) for i in range(3)]
    P12 = [[sl(_SL_PXY + 6 * i + j) for j in range(6)] for i in range(7)]
    P22 = [[sl(_SL_PYY + 6 * i + j) for j in range(6)] for i in range(6)]

    # qRW = conj(q)/|q|^2 (Eigen inverse(); near-unit, never renormalised)
    w, x, y, z = q
    inv_n2 = 1.0 / (w * w + x * x + y * y + z * z)
    qw, qx, qy, qz = w * inv_n2, -x * inv_n2, -y * inv_n2, -z * inv_n2

    # Eigen toRotationMatrix() unit-assumption formula
    s = 2.0
    wx, wy, wz = s * qw * qx, s * qw * qy, s * qw * qz
    xx, xy, xz = s * qx * qx, s * qx * qy, s * qx * qz
    yy, yz, zz = s * qy * qy, s * qy * qz, s * qz * qz
    R = [
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ]

    ym = [ri[i] - r[i] for i in range(3)]
    zr = [_dot_row(R[i], ym) for i in range(3)]
    zh = [_dot_row(R[i], hh) for i in range(3)]

    B1 = _drq_dqbar(qw, qx, qy, qz, ym)     # [3][4]
    B2 = _drq_dqbar(qw, qx, qy, qz, hh)

    # N1/N2 [3][13] over state cols [r(3) | q(4) | y_ri(3) | y_hhat(3)]
    N1 = [
        [-R[i][0], -R[i][1], -R[i][2]] + B1[i] + R[i] + [0.0, 0.0, 0.0]
        for i in range(3)
    ]
    N2 = [
        [0.0, 0.0, 0.0] + B2[i] + [0.0, 0.0, 0.0] + R[i]
        for i in range(3)
    ]

    # C [13][13] = [[Pxx7, Pxy7], [Pxy7', Pyy]]
    C = [P11[i] + P12[i] for i in range(7)] + [
        [P12[j][i] for j in range(7)] + P22[i] for i in range(6)
    ]

    CN1t = _mat_mul_t(C, N1)                # C @ N1' : [13][3]
    CN2t = _mat_mul_t(C, N2)
    # columns of C@N' as rows so K = N @ (C@N') falls out of _mat_mul_t
    CN1c = [[CN1t[k][i] for k in range(13)] for i in range(3)]
    CN2c = [[CN2t[k][i] for k in range(13)] for i in range(3)]
    K0 = _mat_mul_t(N1, CN1c)               # N1 C N1' : [3][3]
    K12 = _mat_mul_t(N1, CN2c)              # N1 C N2'
    K2 = _mat_mul_t(N2, CN2c)               # N2 C N2'
    Ks = [[K12[i][j] + K12[j][i] for j in range(3)] for i in range(3)]
    return zr, zh, K0, Ks, K2


def _predict_geom_kernel(shared_ref, slot_ref, lam_ref, out_ref, *, NP_pad,
                         fku, fkv, u0c, v0c, kd1, sd0, maxdist, no_sigma):
    lam = lam_ref[0, 0, :]

    def sh(i):
        return shared_ref[0, i]

    def sl(i):
        return slot_ref[0, i]

    zr, zh, K0, Ks, K2 = _geometry_prologue(sh, sl)
    out_ref[0] = _particle_tail(
        lam, zr, zh, K0, Ks, K2, fku=fku, fkv=fkv, u0c=u0c, v0c=v0c,
        kd1=kd1, sd0=sd0, maxdist=maxdist, no_sigma=no_sigma,
    )


@functools.partial(
    jax.jit,
    static_argnames=("fku", "fkv", "u0c", "v0c", "kd1", "sd0", "no_sigma",
                     "interpret", "return_raw"),
)
def pallas_particle_predict_fused(
    ys6: jnp.ndarray,       # [F, 6] raw ray slot states
    pxy: jnp.ndarray,       # [F, 13, 6] camera-slot cross blocks
    pyy: jnp.ndarray,       # [F, 6, 6] slot diagonal blocks
    xp: jnp.ndarray,        # [7] camera position state
    pxx7: jnp.ndarray,      # [7, 7] camera covariance (position block)
    lam: jnp.ndarray,       # [F, NP]
    fku: float = 195.0,
    fkv: float = 195.0,
    u0c: float = 162.0,
    v0c: float = 125.0,
    kd1: float = 9e-6,
    sd0: float = 1.0,
    no_sigma: float = 3.0,
    interpret: bool | None = None,
    return_raw: bool = False,
):
    """pallas_particle_predict with the slot geometry fused in-kernel.

    Same returns: (hpi [F,NP,2], sinv [F,NP,2,2], dets [F,NP], hw, hh).
    """
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F, NP = lam.shape
    NP_pad = max(_round_up(NP, 128), 128)
    import numpy as _np

    maxdist = float(
        _np.sqrt(_np.float32(u0c) * _np.float32(u0c) + _np.float32(v0c) * _np.float32(v0c))
    )

    shared = jnp.concatenate(
        [xp.astype(jnp.float32), pxx7.reshape(49).astype(jnp.float32)]
    ).reshape(1, _NSHARED)
    slot = jnp.concatenate(
        [
            ys6.astype(jnp.float32),
            pxy[:, :7, :].reshape(F, 42).astype(jnp.float32),
            pyy.reshape(F, 36).astype(jnp.float32),
        ],
        axis=1,
    )                                                           # [F, 84]
    lam_p = jnp.full((F, 1, NP_pad), 1.0, jnp.float32).at[:, 0, :NP].set(
        lam.astype(jnp.float32)
    )

    kernel = functools.partial(
        _predict_geom_kernel,
        NP_pad=NP_pad, fku=float(fku), fkv=float(fkv), u0c=float(u0c),
        v0c=float(v0c), kd1=float(kd1), sd0=float(sd0), maxdist=maxdist,
        no_sigma=float(no_sigma),
    )
    out = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, _NSHARED), lambda f: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _NSLOT), lambda f: (f, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NP_pad), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 8, NP_pad), jnp.float32),
        interpret=interpret,
    )(shared, slot, lam_p)

    raw = out
    out = out[:, :, :NP]
    hpi = jnp.stack([out[:, ROW_HU], out[:, ROW_HV]], axis=-1)
    sinv = jnp.stack(
        [out[:, ROW_S00], out[:, ROW_S01], out[:, ROW_S01], out[:, ROW_S11]], axis=-1
    ).reshape(F, NP, 2, 2)
    if return_raw:
        # the padded [F,8,NP_pad] rows feed pallas_bayes_update's pred_rows
        # input verbatim (no re-pad/re-stack)
        return hpi, sinv, out[:, ROW_DET], out[:, ROW_HW], out[:, ROW_HH], raw
    return hpi, sinv, out[:, ROW_DET], out[:, ROW_HW], out[:, ROW_HH]
