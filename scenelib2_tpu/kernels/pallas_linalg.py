"""Small dense linear-algebra Pallas kernels (fast/f32 mode).

The EKF joint update inverts the MxM innovation covariance through its
Cholesky factor (kalman.cpp:104-107: LLT, invert L, S^-1 = L^-T L^-1). With
M = 2*n_selected = 20 the XLA choices are both bad on TPU: the library
cholesky lowers to a serial while (~0.5 ms), and the unrolled form becomes
~120 micro-ops (60 tiny dots + 60 scatters, ~30-40 us/frame of pure op
overhead). This kernel runs the whole factor+invert as ONE fused program on
a VMEM-resident (pad_m, 128) tile using row/lane iota masks; the M-step
recurrences become ~20 short vector-op chains.

f32 only (Mosaic has no f64); the parity path keeps the unrolled XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def chol_linv_body(S, M: int, pad_m: int):
    """L^-1 for the leading MxM block of S [pad_m, 128] (zero outside).

    Cholesky stored transposed (U = L'): right-looking rank-1 updates keep A
    symmetric, so pivot rows/columns are plain masked reductions; then
    forward substitution L X = I. Fully UNROLLED over the static M — an
    in-kernel fori_loop costs ~500 cycles/iteration of Mosaic loop overhead
    (measured; 2*M iterations would eat the fusion win). Shared by the
    standalone kernel below and the fused EKF update (pallas_ekf)."""
    shape = (pad_m, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    in_block = (row < M) & (lane < M)

    # pad outside the MxM block with the identity so sqrt/div stay finite
    A = jnp.where(in_block, S, jnp.where(row == lane, 1.0, 0.0))

    U = jnp.zeros(shape, jnp.float32)
    for j in range(M):
        drow = jnp.sum(jnp.where(row == j, A, 0.0), axis=0, keepdims=True)  # [1,128]
        dcol = jnp.sum(jnp.where(lane == j, A, 0.0), axis=1, keepdims=True)  # [pad,1]
        d = jnp.sum(jnp.where((row == j) & (lane == j), A, 0.0))
        inv_sqrt = 1.0 / jnp.sqrt(d)
        U = jnp.where((row == j) & (lane >= j), drow * inv_sqrt, U)
        A = A - jnp.where((row > j) & (lane > j), dcol * (drow / d), 0.0)

    X = jnp.zeros(shape, jnp.float32)
    for i in range(M):
        lcol = jnp.sum(jnp.where(lane == i, U, 0.0), axis=1, keepdims=True)  # [pad,1]
        lii = jnp.sum(jnp.where((row == i) & (lane == i), U, 0.0))
        contrib = jnp.sum(
            jnp.where(row < i, lcol * X, 0.0), axis=0, keepdims=True
        )                                                                   # [1,128]
        ei = jnp.where(lane == i, 1.0, 0.0)
        X = jnp.where(row == i, (ei - contrib) / lii, X)
    return jnp.where(in_block, X, 0.0)


def _chol_inv_kernel(s_ref, out_ref, *, M, pad_m):
    out_ref[...] = chol_linv_body(s_ref[...], M, pad_m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_inv_lower(S: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """L^-1 (lower triangular) for SPD S [M,M] f32; M <= 128."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    M = S.shape[0]
    assert S.shape == (M, M) and M <= 128
    pad_m = _round_up(M, 8)
    Sp = jnp.zeros((pad_m, 128), jnp.float32).at[:M, :M].set(S.astype(jnp.float32))
    kernel = functools.partial(_chol_inv_kernel, M=M, pad_m=pad_m)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_m, 128), jnp.float32),
        interpret=interpret,
    )(Sp)
    return out[:M, :M].astype(S.dtype)
