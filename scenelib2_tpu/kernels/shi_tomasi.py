"""Shi-Tomasi best-patch detection over a region (XLA conv form).

Replaces find_best_patch_inside_region (reference monoslam.cpp:1070-1205):
central-difference gradients, 11x11 box sums of (gx^2, gy^2, gx*gy), smallest
eigenvalue of the 2x2 structure tensor, argmax over the search region with
first-in-scan-order tie-break (strict '>' comparison, v outer / u inner).

Exactness: the reference accumulates doubles whose values are exact multiples
of 0.25 (gradients are integer differences / 2). We accumulate 4*gx*4*gy
integer products in f32 convolutions (max |sum| = 121*254^2 < 2^23, exact)
and divide by 4 in f64 at the end, giving bit-identical eigenvalue inputs.

Region semantics: the whole-image maps are computed once; the region
[ustart, ufinish) x [vstart, vfinish) (after the reference's border clamping)
is applied as a mask, so any number of candidate regions reuse one launch.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _box_sum_valid(img_f32: jnp.ndarray, boxsize: int) -> jnp.ndarray:
    """VALID box sum via reduce_window — exact f32 integer adds on TPU
    (unlike MXU f32 convolutions, which round through bf16 passes)."""
    return lax.reduce_window(img_f32, 0.0, lax.add, (boxsize, boxsize), (1, 1), "VALID")


def structure_tensor_maps(image_u8: jnp.ndarray, boxsize: int):
    """Box-summed gradient products per patch centre.

    Returns (TSgxsq, TSgysq, TSgxgy) as [H,W] f64 maps (centre-indexed; only
    centres with full gradient support + box support are meaningful) and the
    validity mask for centres where the reference could evaluate them.
    """
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)

    # doubled gradients: 2*gx(r,c) = img[r,c+1]-img[r,c-1] (integers)
    gx2 = img[:, 2:] - img[:, :-2]          # [H, W-2] at columns 1..W-2
    gy2 = img[2:, :] - img[:-2, :]          # [H-2, W] at rows 1..H-2
    # align both to the common interior grid (rows 1..H-2, cols 1..W-2)
    gx2i = gx2[1:-1, :]                     # [H-2, W-2]
    gy2i = gy2[:, 1:-1]                     # [H-2, W-2]

    # products <= 255^2 are exact in f32; box sums <= 121*255^2 < 2^24 exact
    sxx4 = _box_sum_valid(gx2i * gx2i, boxsize)   # 4*sum(gx^2)
    syy4 = _box_sum_valid(gy2i * gy2i, boxsize)
    sxy4 = _box_sum_valid(gx2i * gy2i, boxsize)

    # centre of an 11x11 box over the interior grid: interior index + half,
    # interior grid itself starts at image index 1
    off = 1 + half
    pad = lambda m: jnp.pad(
        m.astype(jnp.float64) * 0.25,
        ((off, H - m.shape[0] - off), (off, W - m.shape[1] - off)),
    )
    uu = jnp.arange(W)[None, :]
    vv = jnp.arange(H)[:, None]
    valid = (uu >= off) & (uu <= W - 1 - off) & (vv >= off) & (vv <= H - 1 - off)
    return pad(sxx4), pad(syy4), pad(sxy4), valid


def structure_tensor_sums_f32(image_u8: jnp.ndarray, boxsize: int):
    """Raw 4x box-summed gradient products as centre-padded f32 maps (exact
    integers; the f64 /4 + eigenvalue math is applied later on gathered
    windows only). Returns (sxx4, syy4, sxy4) each [H,W] f32."""
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)
    gx2 = img[:, 2:] - img[:, :-2]
    gy2 = img[2:, :] - img[:-2, :]
    gx2i = gx2[1:-1, :]
    gy2i = gy2[:, 1:-1]
    sxx4 = _box_sum_valid(gx2i * gx2i, boxsize)
    syy4 = _box_sum_valid(gy2i * gy2i, boxsize)
    sxy4 = _box_sum_valid(gx2i * gy2i, boxsize)
    off = 1 + half
    pad = lambda m: jnp.pad(m, ((off, H - m.shape[0] - off), (off, W - m.shape[1] - off)))
    return pad(sxx4), pad(syy4), pad(sxy4)


def find_best_patch_in_image_window(
    image_u8: jnp.ndarray,    # [H,W]
    boxsize: int,
    ustart, vstart, ufinish, vfinish,  # traced ints, already clamped
    region_w: int, region_h: int,      # static max region extents
):
    """Shi-Tomasi argmax computed entirely on a sliced image window.

    Slices the image once around the candidate region (region + gradient and
    box support margins) and runs gradients, box sums, and the f64 eigenvalue
    formula on the [region_h + 2*off, region_w + 2*off] window instead of the
    whole frame — ~12x less work at the stock 80x60 region on 320x240, more
    at high resolution. Bit-identical to the full-map path: the integer sums
    and scan-order tie-break (v outer, u inner, strict '>') are unchanged.
    """
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    off = 1 + half                      # gradient (1) + box (half) support
    region_w = min(region_w, W - 2 * off)
    region_h = min(region_h, H - 2 * off)
    # window origin: centres [u0, u0+region_w) with full support in-image;
    # clamp_region guarantees ustart >= off, and u0 <= ustart keeps every
    # candidate centre in [ustart, ufinish) covered
    u0 = jnp.clip(ustart, off, W - region_w - off).astype(jnp.int32)
    v0 = jnp.clip(vstart, off, H - region_h - off).astype(jnp.int32)

    win = lax.dynamic_slice(
        image_u8, (v0 - off, u0 - off), (region_h + 2 * off, region_w + 2 * off)
    ).astype(jnp.float32)

    gx2 = win[:, 2:] - win[:, :-2]
    gy2 = win[2:, :] - win[:-2, :]
    gx2i = gx2[1:-1, :]
    gy2i = gy2[:, 1:-1]
    sxx4 = _box_sum_valid(gx2i * gx2i, boxsize)   # [region_h, region_w]
    syy4 = _box_sum_valid(gy2i * gy2i, boxsize)
    sxy4 = _box_sum_valid(gx2i * gy2i, boxsize)

    A = sxx4.astype(jnp.float64) * 0.25
    C = syy4.astype(jnp.float64) * 0.25
    Bq = sxy4.astype(jnp.float64) * 0.25
    BB = jnp.sqrt((A + C) * (A + C) - 4.0 * (A * C - Bq * Bq))
    ev = (A + C - BB) / 2.0

    uu = u0 + jnp.arange(region_w, dtype=jnp.int32)[None, :]
    vv = v0 + jnp.arange(region_h, dtype=jnp.int32)[:, None]
    mask = (
        (uu >= ustart) & (uu < ufinish) & (vv >= vstart) & (vv < vfinish)
        & (uu >= off) & (uu <= W - 1 - off) & (vv >= off) & (vv <= H - 1 - off)
    )
    vals = jnp.where(mask, ev, -jnp.inf)
    best = vals.max()
    key = vv.astype(jnp.int32) * jnp.int32(W) + uu.astype(jnp.int32)
    tie = (vals == best) & mask
    kbest = jnp.where(tie, key, jnp.iinfo(jnp.int32).max).min()
    found = best > 0.0
    ubest = jnp.where(found, (kbest % W).astype(jnp.int32), ustart.astype(jnp.int32))
    vbest = jnp.where(found, (kbest // W).astype(jnp.int32), vstart.astype(jnp.int32))
    evbest = jnp.where(found, best, 0.0)
    return ubest, vbest, evbest


def find_best_patch_region_windowed(
    sums_f32,                 # (sxx4, syy4, sxy4) from structure_tensor_sums_f32
    image_shape,              # (H, W)
    boxsize: int,
    ustart, vstart, ufinish, vfinish,  # traced ints, already clamped
    region_w: int, region_h: int,      # static max region extents
):
    """Windowed Shi-Tomasi argmax: the f64 eigenvalue formula runs only on a
    static [region_h, region_w] window gathered at the region origin.
    Semantics identical to find_best_patch_in_region."""
    from jax import lax

    H, W = image_shape
    half = (boxsize - 1) // 2
    off = 1 + half
    region_w = min(region_w, W)
    region_h = min(region_h, H)
    u0 = jnp.clip(ustart, 0, max(W - region_w, 0)).astype(jnp.int32)
    v0 = jnp.clip(vstart, 0, max(H - region_h, 0)).astype(jnp.int32)
    sxx4, syy4, sxy4 = sums_f32
    gw = lambda m: lax.dynamic_slice(m, (v0, u0), (region_h, region_w))
    A = gw(sxx4).astype(jnp.float64) * 0.25
    C = gw(syy4).astype(jnp.float64) * 0.25
    Bq = gw(sxy4).astype(jnp.float64) * 0.25
    BB = jnp.sqrt((A + C) * (A + C) - 4.0 * (A * C - Bq * Bq))
    ev = (A + C - BB) / 2.0

    uu = u0 + jnp.arange(region_w, dtype=jnp.int32)[None, :]
    vv = v0 + jnp.arange(region_h, dtype=jnp.int32)[:, None]
    mask = (
        (uu >= ustart) & (uu < ufinish) & (vv >= vstart) & (vv < vfinish)
        & (uu >= off) & (uu <= W - 1 - off) & (vv >= off) & (vv <= H - 1 - off)
    )
    vals = jnp.where(mask, ev, -jnp.inf)
    best = vals.max()
    key = vv.astype(jnp.int32) * jnp.int32(W) + uu.astype(jnp.int32)
    tie = (vals == best) & mask
    kbest = jnp.where(tie, key, jnp.iinfo(jnp.int32).max).min()
    found = best > 0.0
    ubest = jnp.where(found, (kbest % W).astype(jnp.int32), ustart.astype(jnp.int32))
    vbest = jnp.where(found, (kbest // W).astype(jnp.int32), vstart.astype(jnp.int32))
    evbest = jnp.where(found, best, 0.0)
    return ubest, vbest, evbest


def min_eigenvalue_map(sxx: jnp.ndarray, syy: jnp.ndarray, sxy: jnp.ndarray) -> jnp.ndarray:
    """Smaller eigenvalue of [[A,B],[B,C]] (monoslam.cpp:1198-1205)."""
    A, B, C = sxx, sxy, syy
    BB = jnp.sqrt((A + C) * (A + C) - 4.0 * (A * C - B * B))
    return (A + C - BB) / 2.0


def clamp_region(ustart, vstart, ufinish, vfinish, width, height, boxsize):
    """Border clamping as in monoslam.cpp:1081-1091 (works on traced ints)."""
    half = (boxsize - 1) // 2
    ustart = jnp.maximum(ustart, half + 1)
    ufinish = jnp.minimum(ufinish, width - half - 1)
    vstart = jnp.maximum(vstart, half + 1)
    vfinish = jnp.minimum(vfinish, height - half - 1)
    return ustart, vstart, ufinish, vfinish


def find_best_patch_in_region(
    ev_map: jnp.ndarray,   # [H,W] min-eigenvalue map (f64)
    valid: jnp.ndarray,    # [H,W]
    ustart, vstart, ufinish, vfinish,  # traced ints, already clamped
):
    """Masked argmax with first-in-scan-order tie-break (v outer, u inner).

    Returns (ubest, vbest, evbest). Matches the reference: strict '>' with
    evbest initialised to 0 — if no candidate exceeds 0 the result is
    (ustart, vstart, 0) (the reference leaves u/v uninitialised there; we
    define them deterministically). Empty regions return evbest = 0
    (monoslam.cpp:1093-1099).
    """
    H, W = ev_map.shape
    uu = jnp.arange(W, dtype=jnp.int32)[None, :]
    vv = jnp.arange(H, dtype=jnp.int32)[:, None]
    region = (uu >= ustart) & (uu < ufinish) & (vv >= vstart) & (vv < vfinish)
    mask = region & valid
    vals = jnp.where(mask, ev_map, -jnp.inf)
    best = vals.max()
    key = vv.astype(jnp.int32) * jnp.int32(W) + uu.astype(jnp.int32)  # scan order (v, u)
    tie = (vals == best) & mask
    kbest = jnp.where(tie, key, jnp.iinfo(jnp.int32).max).min()
    found = best > 0.0
    ubest = jnp.where(found, (kbest % W).astype(jnp.int32), ustart.astype(jnp.int32))
    vbest = jnp.where(found, (kbest // W).astype(jnp.int32), vstart.astype(jnp.int32))
    evbest = jnp.where(found, best, 0.0)
    return ubest, vbest, evbest
