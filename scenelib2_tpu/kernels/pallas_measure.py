"""Per-slot measurement prediction as one lane-parallel Pallas kernel.

Stage 2 of the step predicts, for every feature slot, the image measurement
h, its Jacobians hx/hy, the measurement noise, the innovation covariance
S_i, its Cholesky 2x2 inverse, the visibility bit-flags, and the selection
score (reference full_feature_model.cpp:67-195 + feature_model.cpp:99-116 +
camera.cpp:90-300). Vmapped over 16 slots this lowers to ~80 batched XLA
micro-ops; here the whole chain runs with slots on vector lanes in ONE
kernel (~450 short VPU ops), and the caller reads per-slot results as rows
of one [NROWS, 128] output — so the downstream top-k gather touches a
single array.

f32 fast mode only; the parity path keeps the vmapped form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input row layout ([NIN, 128]): per-slot columns
ROW_Y = 0            # y[3]                rows 0..2
ROW_XPO = 3          # xp_org[7]           rows 3..9
ROW_PXY = 10         # pxy7[7,3] row-major rows 10..30
ROW_PYY = 31         # pyy3[3,3] row-major rows 31..39
ROW_ACT = 40         # active & full mask
NIN = 41

# output row layout ([NOUT, 128])
O_H = 0              # hu, hv              rows 0..1
O_HX = 2             # hx7[2,7] row-major  rows 2..15
O_HY = 16            # hy[2,3] row-major   rows 16..21
O_RD = 22            # measurement noise variance (R = var*I2)
O_S = 23             # S00, S01, S11       rows 23..25
O_SINV = 26          # Sinv a, b, c        rows 26..28
O_VIS = 29           # visibility bit-flags (float)
O_ZZ = 30            # zeroed z (camera-frame depth)
O_SCORE = 31         # trace(S) where visible else -inf
NOUT = 32


def _rotmat(w, x, y, z):
    """Eigen toRotationMatrix with the unit-quaternion assumption (s=2)."""
    xx, yy, zz = 2 * x * x, 2 * y * y, 2 * z * z
    xy, xz, yz = 2 * x * y, 2 * x * z, 2 * y * z
    wx, wy, wz = 2 * w * x, 2 * w * y, 2 * w * z
    return [
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ]


def _drq_times_a(w, x, y, z, a):
    """dRq_times_a_by_dq: G[i][c] = (dR_c @ a)[i] (feature_model.cpp:167-237).

    a is a list of 3 lane vectors; w..z may be scalars or lane vectors."""
    a0, a1, a2 = a
    dR = [
        # dR0 @ a
        [2 * (w * a0 - z * a1 + y * a2),
         2 * (z * a0 + w * a1 - x * a2),
         2 * (-y * a0 + x * a1 + w * a2)],
        # dRx @ a
        [2 * (x * a0 + y * a1 + z * a2),
         2 * (y * a0 - x * a1 - w * a2),
         2 * (z * a0 + w * a1 - x * a2)],
        # dRy @ a
        [2 * (-y * a0 + x * a1 + w * a2),
         2 * (x * a0 + y * a1 + z * a2),
         2 * (-w * a0 + z * a1 - y * a2)],
        # dRz @ a
        [2 * (-z * a0 - w * a1 + x * a2),
         2 * (w * a0 - z * a1 + y * a2),
         2 * (x * a0 + y * a1 + z * a2)],
    ]
    # G[i][c] = dR[c][i]
    return [[dR[c][i] for c in range(4)] for i in range(3)]


def _measure_math(r, q4, pxx, y, xp_org_rows, pxy, pyy, act_row, valid, *,
                  fku, fkv, u0c, v0c, kd1, sd0, W, H, bnd, max_len_ratio,
                  cos_max_angle):
    """The whole per-slot measurement-prediction chain on lane vectors.

    r (3) / q4 (4) / pxx (7x7 nested) are scalar-like (broadcastable against
    [1,128] lanes); y (3), xp_org_rows (7), pxy ([7][3]), pyy ([3][3]) and
    act_row are [1,128] per-slot lane rows; valid is the [1,128] slot mask.
    Returns the [NOUT, 128] stacked result (see the O_* row constants).
    Shared by the plain measure kernel and the fused predict+measure kernel.
    """
    qw, qx, qy, qz = q4

    # qRW = conj(q) / |q|^2 (Eigen inverse; q is near-unit, not unit)
    qq = qw * qw + qx * qx + qy * qy + qz * qz
    aw, ax, ay, az = qw / qq, -qx / qq, -qy / qq, -qz / qq
    RRW = _rotmat(aw, ax, ay, az)
    ymr = [y[j] - r[j] for j in range(3)]
    zed = [sum(RRW[i][j] * ymr[j] for j in range(3)) for i in range(3)]

    # project (camera.cpp:90-114)
    invz = 1.0 / zed[2]
    ucx = -fku * zed[0] * invz
    ucy = -fkv * zed[1] * invz
    rad2 = ucx * ucx + ucy * ucy
    dist = 1.0 + 2.0 * kd1 * rad2
    d12 = jnp.sqrt(dist)
    hu = ucx / d12 + u0c
    hv = ucy / d12 + v0c

    # projection Jacobian (camera.cpp:183-215)
    d32 = d12 * dist
    cdi = -2.0 * kd1 / d32
    A00 = ucx * ucx * cdi + 1.0 / d12
    A01 = ucx * ucy * cdi
    A11 = ucy * ucy * cdi + 1.0 / d12
    fkuz = fku * invz
    fkvz = fkv * invz
    du = [[-fkuz, 0.0, fkuz * zed[0] * invz], [0.0, -fkvz, fkvz * zed[1] * invz]]
    dh = [
        [A00 * du[0][k] + A01 * du[1][k] for k in range(3)],
        [A01 * du[0][k] + A11 * du[1][k] for k in range(3)],
    ]

    # dzeroed/dxp: cols 0:3 = -RRW, cols 3:7 = dRq(qRW, ymr) @ diag(1,-1,-1,-1)
    G = _drq_times_a(aw, ax, ay, az, ymr)
    # hx7[i][a]
    hx = [[None] * 7 for _ in range(2)]
    for i in range(2):
        for a in range(3):
            hx[i][a] = -sum(dh[i][k] * RRW[k][a] for k in range(3))
        for c in range(4):
            sgn = 1.0 if c == 0 else -1.0
            hx[i][3 + c] = sgn * sum(dh[i][k] * G[k][c] for k in range(3))
    # hy[i][j] = dh[i][:] . RRW[:,j]
    hy = [[sum(dh[i][k] * RRW[k][j] for k in range(3)) for j in range(3)]
          for i in range(2)]

    # measurement noise (camera.cpp:282-300)
    du_c = hu - u0c
    dv_c = hv - v0c
    dc = jnp.sqrt(du_c * du_c + dv_c * dv_c)
    maxd = float((u0c * u0c + v0c * v0c) ** 0.5)
    sd = sd0 * (1.0 + dc / maxd)
    Rd = sd * sd

    # S_i = Hx Pxx Hx' + Hx Pxy Hy' + (.)' + Hy Pyy Hy' + R
    S = [[None, None], [None, None]]
    for b in range(2):
        v_b = [sum(pxx[i][j] * hx[b][j] for j in range(7)) for i in range(7)]
        w_b = [sum(pxy[a][j] * hy[b][j] for j in range(3)) for a in range(7)]
        p_b = [sum(pyy[i][j] * hy[b][j] for j in range(3)) for i in range(3)]
        for a in range(b, 2):
            Sab = sum(hx[a][i] * v_b[i] for i in range(7))
            Tab = sum(hx[a][i] * w_b[i] for i in range(7))
            Tba = sum(hy[a][j] * sum(pxy[i][j] * hx[b][i] for i in range(7))
                      for j in range(3))
            Pab = sum(hy[a][i] * p_b[i] for i in range(3))
            S[a][b] = Sab + Tab + Tba + Pab
    S00 = S[0][0] + Rd
    S01 = S[1][0]
    S11 = S[1][1] + Rd

    # 2x2 inverse via Cholesky (monoslam.cpp:371-374 order)
    l11 = jnp.sqrt(S00)
    l21 = S01 / l11
    l22 = jnp.sqrt(S11 - l21 * l21)
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i21 = -l21 * i11 * i22
    sinv_a = i11 * i11 + i21 * i21
    sinv_b = i21 * i22
    sinv_c = i22 * i22

    # visibility (full_feature_model.cpp:103-170)
    fl_lr = (hu < bnd) | (hu > W - 1 - bnd)
    fl_ud = (hv < bnd) | (hv > H - 1 - bnd)
    fl_behind = zed[2] <= 0.0

    RWR = _rotmat(qw, qx, qy, qz)
    hLW = [sum(RWR[i][k] * zed[k] for k in range(3)) for i in range(3)]

    ro = [xp_org_rows[j] for j in range(3)]
    qo = [xp_org_rows[3 + j] for j in range(4)]
    qqo = qo[0] * qo[0] + qo[1] * qo[1] + qo[2] * qo[2] + qo[3] * qo[3]
    bw, bx, by, bz = qo[0] / qqo, -qo[1] / qqo, -qo[2] / qqo, -qo[3] / qqo
    RRWo = _rotmat(bw, bx, by, bz)
    ymro = [y[j] - ro[j] for j in range(3)]
    zo = [sum(RRWo[i][j] * ymro[j] for j in range(3)) for i in range(3)]
    RWRo = _rotmat(qo[0], qo[1], qo[2], qo[3])
    hLWo = [sum(RWRo[i][k] * zo[k] for k in range(3)) for i in range(3)]

    mod = jnp.sqrt(hLW[0] ** 2 + hLW[1] ** 2 + hLW[2] ** 2)
    modo = jnp.sqrt(hLWo[0] ** 2 + hLWo[1] ** 2 + hLWo[2] ** 2)
    lr = mod / modo
    fl_dist = (lr > max_len_ratio) | (lr < 1.0 / max_len_ratio)
    dotp = hLW[0] * hLWo[0] + hLW[1] * hLWo[1] + hLW[2] * hLWo[2]
    cosang = jnp.clip(dotp / (mod * modo), -1.0, 1.0)
    # angle > max_angle  <=>  cos(angle) < cos(max_angle) on [0, pi]
    fl_ang = cosang < cos_max_angle

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def fsel(c, v):
        return jnp.where(c, jnp.float32(v), zero)

    vis = (
        fsel(fl_lr, 1.0) + fsel(fl_ud, 2.0) + fsel(fl_dist, 4.0)
        + fsel(fl_ang, 8.0) + fsel(fl_behind, 16.0)
    )

    act = act_row > 0.0
    visible = act & (vis == 0.0) & valid
    score = jnp.where(visible, S00 + S11, jnp.float32(-jnp.inf))

    rows = [hu, hv]
    rows += [hx[i][a] for i in range(2) for a in range(7)]
    rows += [hy[i][j] for i in range(2) for j in range(3)]
    rows += [Rd, S00, S01, S11, sinv_a, sinv_b, sinv_c, vis, zed[2], score]
    return jnp.concatenate(rows, axis=0)


def _measure_kernel(smem_ref, in_ref, out_ref, *, MF, fku, fkv, u0c, v0c, kd1,
                    sd0, W, H, bnd, max_len_ratio, cos_max_angle):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    valid = lane < MF

    def srow(i):
        return smem_ref[0, i]

    def row(i):
        return in_ref[i : i + 1, :]                     # [1,128]

    out_ref[...] = _measure_math(
        r=[srow(0), srow(1), srow(2)],
        q4=(srow(3), srow(4), srow(5), srow(6)),
        pxx=[[srow(7 + 7 * i + j) for j in range(7)] for i in range(7)],
        y=[row(ROW_Y + j) for j in range(3)],
        xp_org_rows=[row(ROW_XPO + j) for j in range(7)],
        pxy=[[row(ROW_PXY + 3 * a + j) for j in range(3)] for a in range(7)],
        pyy=[[row(ROW_PYY + 3 * i + j) for j in range(3)] for i in range(3)],
        act_row=row(ROW_ACT),
        valid=valid,
        fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1, sd0=sd0, W=W, H=H,
        bnd=bnd, max_len_ratio=max_len_ratio, cos_max_angle=cos_max_angle,
    )


@functools.partial(
    jax.jit,
    static_argnames=("image_shape", "boundary", "max_length_ratio",
                     "max_angle_difference", "sd0", "cam_static", "interpret"),
)
def pallas_measure_predict(
    xp: jnp.ndarray,         # [7]
    Pxx7: jnp.ndarray,       # [7,7]
    ys3: jnp.ndarray,        # [MF,3]
    xp_org: jnp.ndarray,     # [MF,7]
    pxy7_3: jnp.ndarray,     # [MF,7,3]
    pyy3: jnp.ndarray,       # [MF,3,3]
    act_full: jnp.ndarray,   # [MF] bool
    cam_static: tuple,       # (fku, fkv, u0, v0, kd1)
    sd0: float,
    image_shape=(240, 320),
    boundary: float = 20.0,
    max_length_ratio: float = 2.0,
    max_angle_difference: float = 0.7853981633974483,
    interpret: bool | None = None,
):
    """Returns the [NOUT, MF] result matrix (see the O_* row constants)."""
    import math

    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    MF = ys3.shape[0]
    assert MF <= 128
    f32 = jnp.float32
    H, W = image_shape
    fku, fkv, u0c, v0c, kd1 = cam_static

    inm = jnp.zeros((NIN, 128), f32)
    inm = inm.at[ROW_Y : ROW_Y + 3, :MF].set(ys3.T.astype(f32))
    inm = inm.at[ROW_XPO : ROW_XPO + 7, :MF].set(xp_org.T.astype(f32))
    inm = inm.at[ROW_PXY : ROW_PXY + 21, :MF].set(
        pxy7_3.reshape(MF, 21).T.astype(f32)
    )
    inm = inm.at[ROW_PYY : ROW_PYY + 9, :MF].set(
        pyy3.reshape(MF, 9).T.astype(f32)
    )
    inm = inm.at[ROW_ACT, :MF].set(act_full.astype(f32))

    smem = jnp.zeros((1, 64), f32)
    smem = smem.at[0, :7].set(xp.astype(f32))
    smem = smem.at[0, 7:56].set(Pxx7.reshape(-1).astype(f32))

    kernel = functools.partial(
        _measure_kernel,
        MF=MF, fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1, sd0=sd0,
        W=float(W), H=float(H), bnd=float(boundary),
        max_len_ratio=float(max_length_ratio),
        cos_max_angle=float(math.cos(max_angle_difference)),
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NOUT, 128), f32),
        interpret=interpret,
    )(smem, inm)
    return out[:, :MF]
