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


def _predict_kernel(par_ref, lam_ref, out_ref, *, NP_pad, fku, fkv, u0c, v0c,
                    kd1, sd0, maxdist, no_sigma):
    lam = lam_ref[0, 0, :]                                     # [NP_pad]

    def p(i):
        return par_ref[0, i]

    x = p(_ZR + 0) + lam * p(_ZH + 0)
    y = p(_ZR + 1) + lam * p(_ZH + 1)
    z = p(_ZR + 2) + lam * p(_ZH + 2)
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
        k = 3 * i + j
        return p(_K0 + k) + lam * p(_KS + k) + lam2 * p(_K2 + k)

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

    rows = jnp.stack([hu, hv, q00, q01, q11, det, hw, hh])      # [8, NP_pad]
    out_ref[0] = rows


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
