"""Windowed Shi-Tomasi best-patch detection as one Pallas TPU kernel.

Replaces the fast-mode XLA chain of find_best_patch_in_image_window
(reference monoslam.cpp:1070-1205): dynamic window slice, central-difference
gradients, 11x11 box sums of (gx^2, gy^2, gx*gy), smallest eigenvalue of the
structure tensor, and the masked argmax with the reference's
first-in-scan-order tie-break — ~30 XLA dispatches per auto-init frame
collapse into one kernel whose pipeline fetches the aligned region block
(Element-indexed) straight from the shared padded f32 frame.

Exactness: gradients are integer differences, products and box sums stay
< 2^23 so the f32 sums are exact; the eigenvalue formula runs in f32 (the
fast mode's precision; the f64 parity path keeps the XLA form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def st_region_body(w, ustart, vstart, ufinish, vfinish, u0, v0, *, B, W, H,
                   pad_v, pad_u, region_w, region_h):
    """Shared Shi-Tomasi region scan on an origin-aligned window w
    [pad_v, pad_u] whose (0,0) is image pixel (v0-off, u0-off). Returns
    (best eigenvalue, kbest scan-order key) scalars. Used by the standalone
    region kernel and the fused auto-init proposal kernel
    (pallas_propose.py)."""
    half = (B - 1) // 2
    off = 1 + half

    def shift(x, dy, dx):
        if dy:
            x = pltpu.roll(x, pad_v - dy, 0)
        if dx:
            x = pltpu.roll(x, pad_u - dx, 1)
        return x

    # doubled central-difference gradients at interior point (i+1, j+1):
    # gx2[i,j] = w[i+1, j+2] - w[i+1, j], gy2[i,j] = w[i+2, j+1] - w[i, j+1]
    gx2 = shift(w, 1, 2) - shift(w, 1, 0)
    gy2 = shift(w, 2, 1) - shift(w, 0, 1)

    # 11x11 box sums (top-left indexed over the interior grid)
    def box(x):
        acc = x
        for dy in range(1, B):
            acc = acc + shift(x, dy, 0)
        out = acc
        for dx in range(1, B):
            out = out + shift(acc, 0, dx)
        return out

    sxx4 = box(gx2 * gx2)
    syy4 = box(gy2 * gy2)
    sxy4 = box(gx2 * gy2)

    # centre (u,v) in absolute image coords for top-left index (i,j):
    # centre = (v0 - off + i + 1 + half, u0 - off + j + 1 + half) = (v0+i, u0+j)
    A = sxx4 * 0.25
    C = syy4 * 0.25
    Bq = sxy4 * 0.25
    BB = jnp.sqrt((A + C) * (A + C) - 4.0 * (A * C - Bq * Bq))
    ev = (A + C - BB) / 2.0

    uu = u0 + jax.lax.broadcasted_iota(jnp.int32, (pad_v, pad_u), 1)
    vv = v0 + jax.lax.broadcasted_iota(jnp.int32, (pad_v, pad_u), 0)
    uuf = uu.astype(jnp.float32)
    vvf = vv.astype(jnp.float32)
    mask = (
        (uuf >= ustart) & (uuf < ufinish) & (vvf >= vstart) & (vvf < vfinish)
        & (uu < u0 + region_w) & (vv < v0 + region_h)
        & (uu >= off) & (uu <= W - 1 - off) & (vv >= off) & (vv <= H - 1 - off)
    )
    vals = jnp.where(mask, ev, -jnp.inf)
    best = jnp.max(vals)
    key = vv * jnp.int32(W) + uu                       # scan order (v outer)
    tie = (vals == best) & mask
    kbest = jnp.min(jnp.where(tie, key, jnp.int32(2**31 - 1)))
    return best, kbest


def _st_kernel(offs_ref, smem_ref, win_ref, out_ref, *, B, W, H, blk_v, blk_u,
               pad_v, pad_u, region_w, region_h):
    """offs_ref (prefetch [2] i32): aligned block (row, lane) origin.
    smem_ref (SMEM [1,8]) f32: ustart vstart ufinish vfinish u0 v0 dv du.
    win_ref (VMEM [blk_v, blk_u]): f32 frame block. out_ref (VMEM [8,128]):
    row 0 lanes 0..2 = ubest, vbest, evbest."""
    ustart = smem_ref[0, 0]
    vstart = smem_ref[0, 1]
    ufinish = smem_ref[0, 2]
    vfinish = smem_ref[0, 3]
    u0 = smem_ref[0, 4].astype(jnp.int32)
    v0 = smem_ref[0, 5].astype(jnp.int32)
    dv = smem_ref[0, 6].astype(jnp.int32)
    du = smem_ref[0, 7].astype(jnp.int32)

    w = win_ref[...]
    w = pltpu.roll(w, blk_u - du, 1)[:, :pad_u]
    w = pltpu.roll(w, blk_v - dv, 0)[:pad_v, :]        # origin = (v0-off, u0-off)

    best, kbest = st_region_body(
        w, ustart, vstart, ufinish, vfinish, u0, v0,
        B=B, W=W, H=H, pad_v=pad_v, pad_u=pad_u,
        region_w=region_w, region_h=region_h,
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zero = jnp.float32(0.0)
    res = (
        jnp.where((rowi == 0) & (lane == 0), (kbest % W).astype(jnp.float32), zero)
        + jnp.where((rowi == 0) & (lane == 1), (kbest // W).astype(jnp.float32), zero)
        + jnp.where((rowi == 0) & (lane == 2), best, zero)
    )
    out_ref[...] = res


@functools.partial(
    jax.jit,
    static_argnames=("boxsize", "image_shape", "region_w", "region_h", "interpret"),
)
def pallas_shi_tomasi_region(
    frame_u8: jnp.ndarray,      # [H, W]
    ustart, vstart, ufinish, vfinish,   # traced ints (already clamped)
    boxsize: int = 11,
    image_shape=(240, 320),
    region_w: int = 80,
    region_h: int = 60,
    interpret: bool | None = None,
    img_f32: jnp.ndarray | None = None,   # shared padded f32 frame
):
    """Returns (ubest, vbest, evbest) with find_best_patch_in_image_window
    semantics (f32 eigenvalues; fast mode only)."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    H, W = image_shape
    B = boxsize
    half = (B - 1) // 2
    off = 1 + half
    region_w = min(region_w, W - 2 * off)
    region_h = min(region_h, H - 2 * off)
    sw_v = region_h + 2 * off
    sw_u = region_w + 2 * off
    pad_v = _round_up(sw_v, 8)
    pad_u = _round_up(sw_u, 128)
    blk_v = pad_v + 8
    blk_u = pad_u + 128

    u0 = jnp.clip(ustart, off, W - region_w - off).astype(jnp.int32)
    v0 = jnp.clip(vstart, off, H - region_h - off).astype(jnp.int32)

    va_max = ((H - sw_v) // 8) * 8
    ua_max = ((W - sw_u) // 128) * 128
    pad_h_img = max(_round_up(H, 8), va_max + blk_v)
    pad_w_img = max(_round_up(W, 128), ua_max + blk_u)
    if img_f32 is not None:
        assert img_f32.shape[0] >= pad_h_img and img_f32.shape[1] >= pad_w_img
        img = img_f32
    else:
        img = jnp.pad(
            frame_u8.astype(jnp.float32), ((0, pad_h_img - H), (0, pad_w_img - W))
        )

    vs = v0 - off
    us = u0 - off
    va = (vs // 8) * 8
    ua = (us // 128) * 128
    offs = jnp.stack([va, ua]).astype(jnp.int32)

    f32 = jnp.float32
    smem = jnp.stack(
        [
            ustart.astype(f32), vstart.astype(f32),
            ufinish.astype(f32), vfinish.astype(f32),
            u0.astype(f32), v0.astype(f32),
            (vs - va).astype(f32), (us - ua).astype(f32),
        ]
    )[None, :]

    kernel = functools.partial(
        _st_kernel,
        B=B, W=W, H=H, blk_v=blk_v, blk_u=blk_u, pad_v=pad_v, pad_u=pad_u,
        region_w=region_w, region_h=region_h,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(blk_v), pl.Element(blk_u)),
                lambda g, offs: (
                    pl.multiple_of(offs[0], 8),
                    pl.multiple_of(offs[1], 128),
                ),
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        interpret=interpret,
    )(offs, smem, img)

    best = out[0, 2]
    found = best > 0.0
    ubest = jnp.where(found, out[0, 0].astype(jnp.int32), ustart.astype(jnp.int32))
    vbest = jnp.where(found, out[0, 1].astype(jnp.int32), vstart.astype(jnp.int32))
    evbest = jnp.where(found, best, 0.0)
    return ubest, vbest, evbest
