"""Auto-init region proposal + Shi-Tomasi detection as ONE Pallas kernel.

The auto-init branch body (runtime/step._auto_initialise fast mode) was the
largest remaining dispatch cluster in the scan: ~500 compiled XLA ops of
mostly scalar math — motion rollforward, future-point projection, safe-box
arithmetic, per-slot occupancy projections, drand48 draws, the 5-try random
region search — followed by the (already-kerneled) Shi-Tomasi scan. This
kernel runs the WHOLE chain in one dispatch: the scalar geometry on the
scalar core, the occupancy projections lane-parallel over feature slots,
the LCG draws as in-kernel integer limb math. The Shi-Tomasi scan of the
picked region stays in the separate Element-DMA'd pallas_shi_tomasi_region
kernel: a whole-frame VMEM operand here would cost ~20us of block DMA per
invocation (measured), while the split pair fetches only the 90KB window.

Exactness: every f32 expression mirrors the XLA fast-mode chain op for op
(quaternion product / rotation formulas from core/quaternion.py, the camera
model from core/camera.py, the try/clash integer comparisons from
runtime/step.py). Verified against the XLA chain output-for-output in
tests/test_pallas_propose.py and end-to-end by the decision-parity suites.

Reference semantics: AutoInitialiseFeature / FindNonOverlappingRegion(+
NoPredict) / set_image_selection_automatically (monoslam.cpp:823-1205),
srand48 stream lockstep included. f32 fast mode only; the f64 parity path
keeps the XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_A48 = 0x5DEECE66D
_C48 = 0xB

# output lane layout ([1,128] f32)
(L_REG_US, L_REG_VS, L_ANY_OK, L_RNG0, L_RNG1, L_RNG2, L_ROOM) = range(7)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return (
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    )


def _rot_rows(q):
    """Eigen toRotationMatrix unit-assumption formula (quaternion.py)."""
    w, x, y, z = q
    s = 2.0
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return (
        (1.0 - (yy + zz), xy - wz, xz + wy),
        (xy + wz, 1.0 - (xx + zz), yz - wx),
        (xz - wy, yz + wx, 1.0 - (xx + yy)),
    )


def _project(z0, z1, z2, *, fku, fkv, u0c, v0c, kd1):
    """camera.project mirrored (works on scalars or lane vectors)."""
    uc0 = -fku * z0 / z2
    uc1 = -fkv * z1 / z2
    radius2 = uc0 * uc0 + uc1 * uc1
    factor = jnp.sqrt(1.0 + 2.0 * kd1 * radius2)
    return uc0 / factor + u0c, uc1 / factor + v0c


def _kernel(smem_ref, ys_ref, out_ref, *, MF, W, H, RW, RH, B,
            tries, sep, dtN, depth, fku, fkv, u0c, v0c, kd1):
    """smem_ref (SMEM [1,32]) f32: 0..12 xv, 13..15 rng limbs, 16 want flag.
    ys_ref (VMEM [4, MF_pad]): rows 0..2 slot y components, row 3
    active&full. out_ref (VMEM [1,128]): L_* lane layout."""
    half = (B - 1) // 2
    off = 1 + half

    def sm(i):
        return smem_ref[0, i]

    r0, r1, r2 = sm(0), sm(1), sm(2)
    q = (sm(3), sm(4), sm(5), sm(6))
    v0_, v1_, v2_ = sm(7), sm(8), sm(9)
    om0, om1, om2 = sm(10), sm(11), sm(12)
    want = sm(16) > 0.0

    # ---- collapsed constant-velocity rollforward (step.py fast form) ----
    av0, av1, av2 = om0 * dtN, om1 * dtN, om2 * dtN
    angle = jnp.sqrt(av0 ** 2 + av1 ** 2 + av2 ** 2)
    safe = jnp.where(angle > 0.0, angle, 1.0)
    s_ = jnp.where(angle > 0.0, jnp.sin(angle / 2.0) / safe, 0.0)
    c_ = jnp.where(angle > 0.0, jnp.cos(angle / 2.0), 1.0)
    qf = _quat_mul(q, (c_, s_ * av0, s_ * av1, s_ * av2))
    rf0, rf1, rf2 = r0 + v0_ * dtN, r1 + v1_ * dtN, r2 + v2_ * dtN

    # yW = rf + R(qf) @ [0,0,depth]  (zero terms of the matvec are exact)
    Rf = _rot_rows(qf)
    yW0 = rf0 + Rf[0][2] * depth
    yW1 = rf1 + Rf[1][2] * depth
    yW2 = rf2 + Rf[2][2] * depth

    # hi_fut = project(R_RW(q) @ (yW - r))  (models.full_zeroedyi + project)
    inv_n2 = 1.0 / (q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    qi = (q[0] * inv_n2, -q[1] * inv_n2, -q[2] * inv_n2, -q[3] * inv_n2)
    Ri = _rot_rows(qi)

    def rot_i(y0, y1, y2):
        m0, m1, m2 = y0 - r0, y1 - r1, y2 - r2
        return (
            (Ri[0][0] * m0 + Ri[0][1] * m1) + Ri[0][2] * m2,
            (Ri[1][0] * m0 + Ri[1][1] * m1) + Ri[1][2] * m2,
            (Ri[2][0] * m0 + Ri[2][1] * m1) + Ri[2][2] * m2,
        )

    z0, z1, z2 = rot_i(yW0, yW1, yW2)
    hf_u, hf_v = _project(z0, z1, z2, fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1)

    pm_u = float(W) / 2.0 - hf_u
    pm_v = float(H) / 2.0 - hf_v
    lo = float(half + 1)
    safe_us = jnp.maximum(jnp.trunc(-pm_u), lo)
    safe_uf = jnp.minimum(jnp.trunc(float(W) - pm_u), float(W - half - 1))
    safe_vs = jnp.maximum(jnp.trunc(-pm_v), lo)
    safe_vf = jnp.minimum(jnp.trunc(float(H) - pm_v), float(H - half - 1))
    room = (safe_uf - safe_us > float(RW)) & (safe_vf - safe_vs > float(RH))

    # ---- occupancy projections, lane-parallel over feature slots ----
    y0l = ys_ref[0, :]
    y1l = ys_ref[1, :]
    y2l = ys_ref[2, :]
    occ_mask = ys_ref[3, :] > 0.0
    zz0, zz1, zz2 = rot_i(y0l, y1l, y2l)
    hn_u, hn_v = _project(zz0, zz1, zz2, fku=fku, fkv=fkv, u0c=u0c, v0c=v0c, kd1=kd1)
    occupied = occ_mask & (zz2 > 0.0)

    # ---- drand48 draws (sequential 48-bit LCG on 16-bit limbs) ----
    a0 = jnp.uint32(_A48 & 0xFFFF)
    a1 = jnp.uint32((_A48 >> 16) & 0xFFFF)
    a2 = jnp.uint32((_A48 >> 32) & 0xFFFF)
    M16 = jnp.uint32(0xFFFF)
    # Mosaic has no f32->u32 cast; go through i32 (limbs <= 0xFFFF, exact)
    s0 = sm(13).astype(jnp.int32).astype(jnp.uint32)
    s1 = sm(14).astype(jnp.int32).astype(jnp.uint32)
    s2 = sm(15).astype(jnp.int32).astype(jnp.uint32)
    states = []
    vals = []
    for _ in range(2 * tries):
        p0 = s0 * a0 + jnp.uint32(_C48)
        r0_ = p0 & M16
        carry = p0 >> jnp.uint32(16)
        p1 = s0 * a1 + s1 * a0 + carry
        r1_ = p1 & M16
        carry = p1 >> jnp.uint32(16)
        p2 = s0 * a2 + s1 * a1 + s2 * a0 + carry
        r2_ = p2 & M16
        s0, s1, s2 = r0_, r1_, r2_
        states.append((r0_, r1_, r2_))

        def f32_(u):
            # u32 -> i32 (same width; limbs <= 0xFFFF) -> f32
            return u.astype(jnp.int32).astype(jnp.float32)

        vals.append(
            (
                f32_(r2_) * (65536.0 * 65536.0)
                + f32_(r1_) * 65536.0
                + f32_(r0_)
            )
            * jnp.float32(1.0 / float(1 << 48))
        )

    # ---- up-to-5 random region tries (monoslam.cpp:986-1021) ----
    span_u = safe_uf - safe_us - float(RW)
    span_v = safe_vf - safe_vs - float(RH)
    us_all, vs_all, ok_all = [], [], []
    for i in range(tries):
        us_i = safe_us + jnp.trunc(span_u * vals[2 * i])
        vs_i = safe_vs + jnp.trunc(span_v * vals[2 * i + 1])
        clash = jnp.max(
            jnp.where(
                occupied
                & (hn_u >= us_i - float(sep))
                & (hn_u < us_i + float(RW + sep))
                & (hn_v >= vs_i - float(sep))
                & (hn_v < vs_i + float(RH + sep)),
                1.0,
                0.0,
            )
        ) > 0.0
        us_all.append(us_i)
        vs_all.append(vs_i)
        ok_all.append(~clash)

    attempt = want & room
    any_ok_raw = ok_all[0]
    for o in ok_all[1:]:
        any_ok_raw = any_ok_raw | o
    any_ok = any_ok_raw & attempt
    first_ok = jnp.int32(0)
    for i in reversed(range(tries)):
        first_ok = jnp.where(ok_all[i], jnp.int32(i), first_ok)
    region_us = us_all[0]
    region_vs = vs_all[0]
    for i in range(1, tries):
        take = first_ok == i
        region_us = jnp.where(take, us_all[i], region_us)
        region_vs = jnp.where(take, vs_all[i], region_vs)

    consumed = jnp.where(
        attempt,
        jnp.where(any_ok_raw, 2 * (first_ok + 1), jnp.int32(2 * tries)),
        jnp.int32(0),
    )
    rng_out = []
    for limb in range(3):
        cur = sm(13 + limb)
        for k, st in enumerate(states):
            cur = jnp.where(
                consumed >= k + 1,
                st[limb].astype(jnp.int32).astype(jnp.float32),
                cur,
            )
        rng_out.append(cur)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    zero = jnp.zeros((1, 128), jnp.float32)

    def put(i, s):
        return jnp.where(lane == i, zero + s, zero)

    out_ref[...] = (
        put(L_REG_US, region_us)
        + put(L_REG_VS, region_vs)
        + put(L_ANY_OK, jnp.where(any_ok, 1.0, 0.0))
        + put(L_RNG0, rng_out[0])
        + put(L_RNG1, rng_out[1])
        + put(L_RNG2, rng_out[2])
        + put(L_ROOM, jnp.where(room, 1.0, 0.0))
    )


@functools.partial(
    jax.jit,
    static_argnames=("image_shape", "region_w_cfg", "region_h_cfg", "boxsize",
                     "tries", "sep", "dtN", "depth", "cam_static",
                     "interpret"),
)
def pallas_propose_init(
    x: jnp.ndarray,          # [D] state (camera part read)
    rng: jnp.ndarray,        # [3] u32 drand48 limbs
    occ_flags: jnp.ndarray,  # [MF] bool: active & full
    want: jnp.ndarray,       # [] bool (True under the auto-init cond)
    image_shape=(240, 320),
    region_w_cfg: int = 80,
    region_h_cfg: int = 60,
    boxsize: int = 11,
    tries: int = 5,
    sep: int = 10,
    dtN: float = 10 * 0.033333333,
    depth: float = 2.5,
    cam_static=(195.0, 195.0, 162.0, 125.0, 9e-6),
    interpret: bool | None = None,
):
    """Returns (region_us, region_vs [i32], any_ok [bool], rng_new [3 u32])
    — the _auto_initialise region-proposal outputs; the caller feeds the
    region to pallas_shi_tomasi_region for the patch pick."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    H, W = image_shape
    B = boxsize
    MF = occ_flags.shape[0]

    fku, fkv, u0c, v0c, kd1 = cam_static
    smem = jnp.zeros((1, 32), jnp.float32)
    smem = smem.at[0, :13].set(x[:13].astype(jnp.float32))
    smem = smem.at[0, 13:16].set(rng.astype(jnp.float32))
    smem = smem.at[0, 16].set(want.astype(jnp.float32))

    ys3 = x[13:].reshape(MF, 6)[:, :3].astype(jnp.float32).T   # [3, MF]
    ys_rows = jnp.concatenate(
        [ys3, occ_flags.astype(jnp.float32)[None, :]], axis=0
    )                                                           # [4, MF]
    ys_rows = jnp.pad(ys_rows, ((0, 0), (0, 128 - MF)))

    kernel = functools.partial(
        _kernel,
        MF=MF, W=W, H=H, RW=region_w_cfg, RH=region_h_cfg, B=B,
        tries=tries, sep=sep, dtN=float(dtN), depth=float(depth),
        fku=float(fku), fkv=float(fkv), u0c=float(u0c), v0c=float(v0c),
        kd1=float(kd1),
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(smem, ys_rows)

    row = out[0]
    return (
        row[L_REG_US].astype(jnp.int32),
        row[L_REG_VS].astype(jnp.int32),
        row[L_ANY_OK] > 0.0,
        jnp.stack([row[L_RNG0], row[L_RNG1], row[L_RNG2]]).astype(jnp.uint32),
    )
