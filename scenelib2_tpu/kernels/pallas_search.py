"""Fused NSSD elliptical search as a Pallas TPU kernel (fast-mode path).

One kernel instance per searched feature fuses the whole candidate pipeline
that the XLA path spreads over many ops:

  image window (u8) -> separable 11x11 integer box sums (VPU adds, exact in
  f32) -> patch cross-correlation (boxsize^2 shifted FMAs) -> NSSD score ->
  ellipse/box/sigma masks -> masked min with the reference tie-break ->
  (best, u, v, overflow).

Numerics: integer sums are exact (i32-range values in f32 adds); the score
formula runs in f32, matching the fast mode's precision everywhere else
(Mosaic has no f64). The parity (x64) mode keeps the XLA implementation.

Grid: (K,). Each program reads its [SWIN, SWIN] image window (pre-gathered
and lane-padded by the caller), an SMEM param row, and the SMEM-flattened
patch, and writes an [8,128] result tile. Reference semantics:
monoslam.cpp:401-477 + improc.cpp:55-134.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _search_kernel(smem_ref, win_ref, out_ref, *, side_v, side_u,
                   boxsize, no_sigma, corr_sigma_thresh, pad_v, pad_u, W, H):
    """smem_ref (SMEM [1,2,128]): row 0 = patch row-major in lanes
    0..boxsize^2-1; row 1 = params u0 v0 uc vc a b c active sg0 sg0sq.
    win_ref    (VMEM [1,pad_v,pad_u]) f32 image window
    out_ref    (VMEM [1,8,128]) f32: lanes 0..3 of row 0 = best,u,v,overflow
    """
    n = float(boxsize * boxsize)
    win = win_ref[0]

    # pltpu.roll requires non-negative shifts: roll by (size - d) == roll by -d
    def row_sum(img):
        acc = img
        for dx in range(1, boxsize):
            acc = acc + pltpu.roll(img, pad_u - dx, 1)
        return acc

    def col_sum(img):
        acc = img
        for dy in range(1, boxsize):
            acc = acc + pltpu.roll(img, pad_v - dy, 0)
        return acc

    sg1 = col_sum(row_sum(win))                       # top-left indexed sums
    sg1sq = col_sum(row_sum(win * win))

    cross = jnp.zeros_like(win)
    for dy in range(boxsize):
        rolled_r = pltpu.roll(win, (pad_v - dy) % pad_v, 0)
        for dx in range(boxsize):
            pval = smem_ref[0, 0, dy * boxsize + dx]
            cross = cross + pval * pltpu.roll(rolled_r, (pad_u - dx) % pad_u, 1)

    sg0 = smem_ref[0, 1, 8]
    sg0sq = smem_ref[0, 1, 9]

    g0bar = sg0 / n
    g1bar = sg1 / n
    varg0 = sg0sq / n - g0bar * g0bar
    varg1 = sg1sq / n - g1bar * g1bar
    sd0 = jnp.sqrt(varg0)
    sd1 = jnp.sqrt(varg1)
    v1s = jnp.where(varg1 == 0.0, 1.0, varg1)
    s1 = jnp.sqrt(v1s)
    v0s = jnp.where(varg0 == 0.0, 1.0, varg0)
    s0 = jnp.sqrt(v0s)
    k = g0bar / s0 - g1bar / s1
    corr = (
        sg0sq / v0s + sg1sq / v1s + n * (k * k)
        - cross * 2.0 / (s0 * s1) - sg0 * 2.0 * k / s0 + sg1 * 2.0 * k / s1
    ) / n
    both_zero = (sd0 == 0.0) & (sd1 == 0.0)
    corr = jnp.where((sd0 != 0.0) & (sd1 != 0.0), corr, jnp.where(both_zero, 0.0, 1.0))

    u0 = smem_ref[0, 1, 0].astype(jnp.int32)
    v0 = smem_ref[0, 1, 1].astype(jnp.int32)
    uc = smem_ref[0, 1, 2].astype(jnp.int32)
    vc = smem_ref[0, 1, 3].astype(jnp.int32)
    a = smem_ref[0, 1, 4]
    b = smem_ref[0, 1, 5]
    c = smem_ref[0, 1, 6]
    half = (boxsize - 1) // 2

    uu = u0 + jax.lax.broadcasted_iota(jnp.int32, (pad_v, pad_u), 1)
    vv = v0 + jax.lax.broadcasted_iota(jnp.int32, (pad_v, pad_u), 0)
    in_side = (uu < u0 + side_u) & (vv < v0 + side_v)
    urel = (uu - uc).astype(jnp.float32)
    vrel = (vv - vc).astype(jnp.float32)
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c))
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a))
    box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
    ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
    centre_ok = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    mask = in_side & box & ellipse & centre_ok & (sd1 >= corr_sigma_thresh) & (
        sd0 >= corr_sigma_thresh
    )

    vals = jnp.where(mask, corr, 1e6)
    best = jnp.min(vals)
    key = uu * jnp.int32(H) + vv                     # (u, v) lexicographic
    tie = (vals == best) & mask
    kbest = jnp.max(jnp.where(tie, key, -1))
    over = (halfwidth > float(side_u // 2)) | (halfheight > float(side_v // 2))

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ub = jnp.where(kbest >= 0, kbest // H, -1).astype(jnp.float32)
    vb = jnp.where(kbest >= 0, kbest % H, -1).astype(jnp.float32)
    res = jnp.where(
        (row == 0) & (lane == 0), best,
        jnp.where(
            (row == 0) & (lane == 1), ub,
            jnp.where(
                (row == 0) & (lane == 2), vb,
                jnp.where((row == 0) & (lane == 3), over.astype(jnp.float32), 0.0),
            ),
        ),
    )
    out_ref[0] = res


@functools.partial(
    jax.jit,
    static_argnames=("boxsize", "win_radius", "no_sigma", "corr_thresh2",
                     "corr_sigma_thresh", "image_shape", "interpret"),
)
def pallas_elliptical_search(
    windows_u8: jnp.ndarray,   # [K, SWIN_v, SWIN_u] pre-gathered image windows
    patches_u8: jnp.ndarray,   # [K, B, B]
    u0: jnp.ndarray,           # [K] centre-window origins
    v0: jnp.ndarray,           # [K]
    h_centre: jnp.ndarray,     # [K, 2]
    sinv: jnp.ndarray,         # [K, 2, 2]
    active: jnp.ndarray,       # [K]
    image_shape=(240, 320),
    boxsize: int = 11,
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    corr_sigma_thresh: float = 10.0,
    interpret: bool | None = None,
):
    """Fused search over K features; returns (found, u, v, best, overflow)."""
    if interpret is None:
        # Mosaic only targets TPU; fall back to the (slow) interpreter so the
        # use_pallas config keeps working on CPU test backends
        interpret = jax.default_backend() != "tpu" and "axon" not in str(
            jax.devices()[0].platform
        ).lower()
    H, W = image_shape
    K = windows_u8.shape[0]
    side_u = min(2 * win_radius + 1, W - boxsize + 1)
    side_v = min(2 * win_radius + 1, H - boxsize + 1)
    pad_u = _round_up(windows_u8.shape[2], 128)
    pad_v = _round_up(windows_u8.shape[1], 8)

    win_f32 = jnp.pad(
        windows_u8.astype(jnp.float32),
        ((0, 0), (0, pad_v - windows_u8.shape[1]), (0, pad_u - windows_u8.shape[2])),
    )
    p32 = patches_u8.astype(jnp.int32)
    sg0 = p32.sum(axis=(1, 2)).astype(jnp.float32)
    sg0sq = (p32 * p32).sum(axis=(1, 2)).astype(jnp.float32)
    uc = jnp.floor(h_centre[:, 0] + 0.5).astype(jnp.float32)
    vc = jnp.floor(h_centre[:, 1] + 0.5).astype(jnp.float32)
    params = jnp.stack(
        [
            u0.astype(jnp.float32), v0.astype(jnp.float32), uc, vc,
            sinv[:, 0, 0].astype(jnp.float32), sinv[:, 0, 1].astype(jnp.float32),
            sinv[:, 1, 1].astype(jnp.float32), active.astype(jnp.float32),
            sg0, sg0sq,
        ],
        axis=1,
    )
    smem_in = jnp.zeros((K, 2, 128), jnp.float32)
    smem_in = smem_in.at[:, 0, : boxsize * boxsize].set(
        patches_u8.reshape(K, -1).astype(jnp.float32)
    )
    smem_in = smem_in.at[:, 1, :10].set(params)

    kernel = functools.partial(
        _search_kernel,
        side_v=side_v, side_u=side_u, boxsize=boxsize, no_sigma=no_sigma,
        corr_sigma_thresh=corr_sigma_thresh, pad_v=pad_v, pad_u=pad_u, W=W, H=H,
    )
    out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda k: (k, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, pad_v, pad_u), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, 8, 128), jnp.float32),
        interpret=interpret,
    )(smem_in, win_f32)

    best = out[:, 0, 0].astype(h_centre.dtype)
    u = out[:, 0, 1].astype(jnp.int32)
    v = out[:, 0, 2].astype(jnp.int32)
    over = out[:, 0, 3] > 0
    found = active & (best <= corr_thresh2)
    return found, u, v, best, over & active


def gather_windows_u8(image_u8, u0, v0, win_radius: int, boxsize: int):
    """Pre-gather the [K, SWIN, SWIN] u8 image windows for the kernel."""
    from jax import lax

    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    side_u = min(2 * win_radius + 1, W - boxsize + 1)
    side_v = min(2 * win_radius + 1, H - boxsize + 1)
    sw_u = side_u + boxsize - 1
    sw_v = side_v + boxsize - 1

    def g(u0_k, v0_k):
        return lax.dynamic_slice(image_u8, (v0_k - half, u0_k - half), (sw_v, sw_u))

    return jax.vmap(g)(u0, v0)
