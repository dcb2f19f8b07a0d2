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

from scenelib2_tpu.kernels.pallas_score_map import nssd_corr_f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# small-regime slab tiers: a band that fits a tier's output rows
# (SLAB - boxsize + 1) is scored on that dynamically-positioned slab alone;
# taller bands fall through to the next tier / the full window. Converged
# features sit at halfheight 3-10 px (the R >= sd^2 noise floor makes
# halfheight >= 3), so the 32-row tier (22 output rows) is the steady state
# and the 48-row tier catches mid-convergence ellipses. A tier only exists
# where its slab is meaningfully smaller than the window (<= 0.7*pad_v).
# (A 64-row tier for hires-class windows measured a wash — 143.9 vs 144.0
# us/frame — and is not kept.)
_SLABS = (32, 48)


def _score_and_select(smem_ref, win, rows, row_off, *, side_v, side_u,
                      boxsize, no_sigma, corr_sigma_thresh, pad_u, W, H):
    """NSSD + masks + masked min/tie over `rows` window rows starting at
    window-row `row_off` (traced scalar). Returns (best, kbest, over) scalars.

    win [rows, pad_u] f32; cells beyond the true window may hold arbitrary
    finite values — every candidate the masks admit reads only true-window
    cells, and the per-cell corr values are grouping-independent (integer u8
    sums, exact in f32), so any row restriction that covers the mask's row
    support yields identical (best, kbest).
    """
    n = float(boxsize * boxsize)
    rows_pad = win.shape[0]

    def shift0(x, dy):
        return x if dy == 0 else pltpu.roll(x, rows_pad - dy, 0)

    def shift1(x, dx):
        return x if dx == 0 else pltpu.roll(x, pad_u - dx, 1)

    # Top-left indexed sums, column (sublane) direction first so the
    # shift0(win, dy) copies are shared with the cross loop below; lane rolls
    # (the expensive shuffle on v5e) stay at B-1 per reduced array. All
    # values are integer-valued u8 sums < 2^24, so every f32 sum is EXACT
    # regardless of accumulation order (same trick as pallas_score_map).
    win2 = win * win
    colsum = win
    colsum2 = win2
    for dy in range(1, boxsize):
        colsum = colsum + shift0(win, dy)
        colsum2 = colsum2 + shift0(win2, dy)
    sg1 = colsum
    sg1sq = colsum2
    for dx in range(1, boxsize):
        sg1 = sg1 + shift1(colsum, dx)
        sg1sq = sg1sq + shift1(colsum2, dx)

    # cross-correlation: dx-outer keeps lane rolls to B-1 (the dy-inner
    # sublane-rolled copies of win are CSE-shared with colsum above)
    cross = jnp.zeros_like(win)
    for dx in range(boxsize):
        t = smem_ref[0, 0, dx] * win
        for dy in range(1, boxsize):
            t = t + smem_ref[0, 0, dy * boxsize + dx] * shift0(win, dy)
        cross = cross + shift1(t, dx)

    sg0 = smem_ref[0, 1, 8]
    sg0sq = smem_ref[0, 1, 9]

    corr, sd0, sd1 = nssd_corr_f32(sg0, sg0sq, sg1, sg1sq, cross, n)

    u0 = smem_ref[0, 1, 0].astype(jnp.int32)
    v0 = smem_ref[0, 1, 1].astype(jnp.int32)
    uc = smem_ref[0, 1, 2].astype(jnp.int32)
    vc = smem_ref[0, 1, 3].astype(jnp.int32)
    a = smem_ref[0, 1, 4]
    b = smem_ref[0, 1, 5]
    c = smem_ref[0, 1, 6]
    half = (boxsize - 1) // 2

    uu = u0 + jax.lax.broadcasted_iota(jnp.int32, (rows_pad, pad_u), 1)
    vv = (v0 + row_off) + jax.lax.broadcasted_iota(
        jnp.int32, (rows_pad, pad_u), 0
    )
    valid_row = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, pad_u), 0) < rows
    in_side = (uu < u0 + side_u) & (vv < v0 + side_v)
    urel = (uu - uc).astype(jnp.float32)
    vrel = (vv - vc).astype(jnp.float32)
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c))
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a))
    box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
    ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
    centre_ok = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    mask = valid_row & in_side & box & ellipse & centre_ok & (
        sd1 >= corr_sigma_thresh
    ) & (sd0 >= corr_sigma_thresh)

    vals = jnp.where(mask, corr, 1e6)
    best = jnp.min(vals)
    key = uu * jnp.int32(H) + vv                     # (u, v) lexicographic
    tie = (vals == best) & mask
    kbest = jnp.max(jnp.where(tie, key, -1))
    over = (halfwidth > float(side_u // 2)) | (halfheight > float(side_v // 2))
    return best, kbest, over


def _write_result(out_ref, best, kbest, over, *, H):
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


def _search_body(smem_ref, win, out_ref, *, side_v, side_u,
                 boxsize, no_sigma, corr_sigma_thresh, pad_v, pad_u, W, H):
    """Shared search pipeline on an in-register window value.

    smem_ref (SMEM [1,2,128]): row 0 = patch row-major in lanes
    0..boxsize^2-1; row 1 = params u0 v0 uc vc a b c active sg0 sg0sq.
    win        [pad_v,pad_u] f32 image window (cells beyond the
               (side+boxsize-1)^2 true window may hold arbitrary values —
               every candidate the masks admit reads only true-window cells)
    out_ref    (VMEM [1,8,128]) f32: lanes 0..3 of row 0 = best,u,v,overflow

    Tiered regimes: when the ellipse's row band (box_v cap intersect side
    and centre-validity — the exact row support of the candidate mask) fits
    a tier's output rows, only that dynamically-positioned slab is scored
    (the steady-state case: converged features have halfheight 3-10 px);
    otherwise the whole window is scored as before. Cell-for-cell identical
    scores, so (best, tie-key, overflow) are bit-equal in every regime.
    """
    kw = dict(side_v=side_v, side_u=side_u, boxsize=boxsize,
              no_sigma=no_sigma, corr_sigma_thresh=corr_sigma_thresh,
              pad_u=pad_u, W=W, H=H)
    slabs = [s for s in _SLABS if s <= 0.7 * pad_v]
    if not slabs:
        # window too small for the tiered split to pay
        best, kbest, over = _score_and_select(
            smem_ref, win, pad_v, jnp.int32(0), **kw
        )
        _write_result(out_ref, best, kbest, over, H=H)
        return

    v0 = smem_ref[0, 1, 1].astype(jnp.int32)
    vc = smem_ref[0, 1, 3].astype(jnp.int32)
    a = smem_ref[0, 1, 4]
    b = smem_ref[0, 1, 5]
    c = smem_ref[0, 1, 6]
    half = (boxsize - 1) // 2
    hh_f = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a))
    # clamp to the window extent so int cast and the band arithmetic stay
    # exact (NaN/huge hh from degenerate S falls through to the full path)
    hh_ok = (hh_f >= 0.0) & (hh_f < 1e6)
    hh = jnp.where(hh_ok, hh_f, float(pad_v)).astype(jnp.int32)
    # row support of the mask, window-relative: vv in [vc-hh, vc+hh] cap
    # [v0, v0+side_v-1] cap [half, H-1-half]
    r_lo = jnp.maximum(jnp.maximum(vc - hh, v0), half) - v0
    r_hi = jnp.minimum(jnp.minimum(vc + hh, v0 + side_v - 1), H - 1 - half) - v0
    start8 = (r_lo // 8) * 8

    fits = []
    for s in slabs:
        start_s = jnp.clip(start8, 0, pad_v - s)
        fits.append(hh_ok & (r_hi <= start_s + (s - boxsize)))

    prev_fit = None
    for s, fit in zip(slabs, fits):
        tier_on = fit if prev_fit is None else (fit & ~prev_fit)
        prev_fit = fit if prev_fit is None else (prev_fit | fit)

        @pl.when(tier_on)
        def _(s=s):
            start_s = jnp.clip(start8, 0, pad_v - s)
            slab = pltpu.roll(win, pad_v - start_s, 0)[:s, :]
            best, kbest, over = _score_and_select(
                smem_ref, slab, s - boxsize + 1, start_s, **kw
            )
            _write_result(out_ref, best, kbest, over, H=H)

    @pl.when(jnp.logical_not(prev_fit))
    def _():
        best, kbest, over = _score_and_select(
            smem_ref, win, pad_v, jnp.int32(0), **kw
        )
        _write_result(out_ref, best, kbest, over, H=H)


def _search_kernel(smem_ref, win_ref, out_ref, **kw):
    _search_body(smem_ref, win_ref[0], out_ref, **kw)


def _search_kernel_fused(offs_ref, smem_ref, win_ref, out_ref, *, blk_v, blk_u,
                         **kw):
    """Pre-gathered-window variant minus the gather: the pipeline fetches an
    aligned [blk_v, blk_u] block around the window (Element-indexed specs,
    auto double-buffered), and two dynamic rotates line the true window up
    at the origin."""
    k = pl.program_id(0)
    dv = offs_ref[k, 2]
    du = offs_ref[k, 3]
    pad_v = kw["pad_v"]
    pad_u = kw["pad_u"]
    w = win_ref[...]                                   # [blk_v, blk_u]
    w = pltpu.roll(w, blk_u - du, 1)[:, :pad_u]
    w = pltpu.roll(w, blk_v - dv, 0)[:pad_v, :]
    _search_body(smem_ref, w, out_ref, **kw)


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
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
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


def fused_search_img_pad(image_shape, boxsize: int = 11, win_radius: int = 32):
    """(pad_h, pad_w) of the padded f32 frame this wrapper builds — for
    callers that share one padded frame across the image kernels."""
    H, W = image_shape
    B = boxsize
    side_u = min(2 * win_radius + 1, W - B + 1)
    side_v = min(2 * win_radius + 1, H - B + 1)
    sw_u = side_u + B - 1
    sw_v = side_v + B - 1
    blk_u = _round_up(sw_u, 128) + 128
    blk_v = _round_up(sw_v, 8) + 8
    va_max = ((H - sw_v) // 8) * 8
    ua_max = ((W - sw_u) // 128) * 128
    return (
        max(_round_up(H, 8), va_max + blk_v),
        max(_round_up(W, 128), ua_max + blk_u),
    )


@functools.partial(
    jax.jit,
    static_argnames=("boxsize", "win_radius", "no_sigma", "corr_thresh2",
                     "corr_sigma_thresh", "image_shape", "interpret"),
)
def pallas_elliptical_search_fused(
    frame_u8: jnp.ndarray,     # [H, W] the whole frame
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
    patch_rows: jnp.ndarray | None = None,  # [K,128] precomputed SMEM rows
    img_f32: jnp.ndarray | None = None,     # shared padded f32 frame
                                            # (>= fused_search_img_pad dims)
):
    """pallas_elliptical_search without the host-graph window gather.

    The vmapped dynamic_slice gather lowers to a serial 10-iteration while
    loop (~26us/frame on v5e); here the kernel's own pipeline DMAs an
    8/128-aligned block around each window straight from the frame
    (Element-indexed in_specs, double-buffered across grid steps) and two
    dynamic rotates align it in-register. Decisions are identical to
    pallas_elliptical_search: cells outside the true window differ (image
    content instead of zero padding) but every mask-admitted candidate reads
    true-window cells only.
    """
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    H, W = image_shape
    K = patch_rows.shape[0] if patch_rows is not None else patches_u8.shape[0]
    B = boxsize
    half = (B - 1) // 2
    side_u = min(2 * win_radius + 1, W - B + 1)
    side_v = min(2 * win_radius + 1, H - B + 1)
    sw_u = side_u + B - 1
    sw_v = side_v + B - 1
    pad_u = _round_up(sw_u, 128)
    pad_v = _round_up(sw_v, 8)
    blk_u = pad_u + 128
    blk_v = pad_v + 8

    # pad the frame so every aligned block stays in bounds; window starts
    # are clamped to [0, dim - sw] by search_window_origin
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

    vs = v0 - half
    us = u0 - half
    va = (vs // 8) * 8
    ua = (us // 128) * 128
    offs = jnp.stack([va, ua, vs - va, us - ua], axis=1).astype(jnp.int32)

    if patch_rows is not None:
        sg0 = patch_rows[:, B * B]
        sg0sq = patch_rows[:, B * B + 1]
    else:
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
    if patch_rows is not None:
        # precomputed row 0 (pixels | sums at 121/122 — unread extra lanes)
        smem_in = jnp.stack(
            [patch_rows, jnp.zeros((K, 128), jnp.float32).at[:, :10].set(params)],
            axis=1,
        )
    else:
        smem_in = jnp.zeros((K, 2, 128), jnp.float32)
        smem_in = smem_in.at[:, 0, : B * B].set(
            patches_u8.reshape(K, -1).astype(jnp.float32)
        )
        smem_in = smem_in.at[:, 1, :10].set(params)

    kernel = functools.partial(
        _search_kernel_fused,
        blk_v=blk_v, blk_u=blk_u,
        side_v=side_v, side_u=side_u, boxsize=B, no_sigma=no_sigma,
        corr_sigma_thresh=corr_sigma_thresh, pad_v=pad_v, pad_u=pad_u, W=W, H=H,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda k, offs: (k, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(blk_v), pl.Element(blk_u)),
                lambda k, offs: (
                    pl.multiple_of(offs[k, 0], 8),
                    pl.multiple_of(offs[k, 1], 128),
                ),
            ),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda k, offs: (k, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 8, 128), jnp.float32),
        interpret=interpret,
    )(offs, smem_in, img)

    best = out[:, 0, 0].astype(h_centre.dtype)
    u = out[:, 0, 1].astype(jnp.int32)
    v = out[:, 0, 2].astype(jnp.int32)
    over = out[:, 0, 3] > 0
    found = active & (best <= corr_thresh2)
    return found, u, v, best, over & active


def _particle_kernel(params_ref, map_ref, out_ref, *, NP, side_u, side_v,
                     pad_h, pad_w, no_sigma, W, H):
    """Particle-cloud search over ONE shared score map (VMEM-resident).

    params_ref (SMEM [1, NP, 8]) per-particle f32 rows:
        uc vc a b c alive
    map_ref    (VMEM [1, pad_h, pad_w]) penalized score map (1e6-padded)
    out_ref    (VMEM [1, NP_pad, 128]) rows: lane0 best, lane1 key, lane2 over

    Replaces the dense [P,H,W] broadcast masked-min: each particle reads only
    its (side_v x 256)-lane band of the map from VMEM instead of scanning the
    whole image, with identical masks and tie-break (reference semantics:
    search_multiple_overlapping_ellipses.cpp:106-196).
    """
    ns2 = no_sigma * no_sigma

    def body(p, _):
        uc = params_ref[0, p, 0].astype(jnp.int32)
        vc = params_ref[0, p, 1].astype(jnp.int32)
        a = params_ref[0, p, 2]
        b = params_ref[0, p, 3]
        c = params_ref[0, p, 4]
        alive = params_ref[0, p, 5]

        halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c))
        halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a))
        R_u = side_u // 2
        R_v = side_v // 2
        u0 = jnp.clip(uc - R_u, 0, W - side_u)
        v0 = jnp.clip(vc - R_v, 0, H - side_v)
        # Mosaic requires aligned dynamic starts: 8-aligned rows / 128-aligned
        # lanes, over-reading enough to cover the window, masked below.
        band_v = _round_up(side_v, 8) + 8
        va = jnp.minimum((v0 // 8) * 8, pad_h - band_v)
        ua = jnp.minimum((u0 // 128) * 128, pad_w - 256)

        band = map_ref[
            0,
            pl.ds(pl.multiple_of(va, 8), band_v),
            pl.ds(pl.multiple_of(ua, 128), 256),
        ]                                                      # [band_v, 256]

        uu = ua + jax.lax.broadcasted_iota(jnp.int32, (band_v, 256), 1)
        vv = va + jax.lax.broadcasted_iota(jnp.int32, (band_v, 256), 0)
        in_win = (
            (uu >= u0) & (uu < u0 + side_u) & (vv >= v0) & (vv < v0 + side_v)
        )
        urel = (uu - uc).astype(jnp.float32)
        vrel = (vv - vc).astype(jnp.float32)
        box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
        ell = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < ns2
        mask = in_win & box & ell & (uu < W)

        vals = jnp.where(mask, band, 1e6)
        best = jnp.min(vals)
        key = uu * jnp.int32(H) + vv                           # (u,v) lexicographic
        tie = (vals == best) & mask
        kbest = jnp.max(jnp.where(tie, key, -1))
        over = (halfwidth > float(R_u)) | (halfheight > float(R_v))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, best,
            jnp.where(
                lane == 1, kbest.astype(jnp.float32),
                jnp.where(lane == 2, jnp.where(over, 1.0, 0.0) * alive, 0.0),
            ),
        )
        out_ref[0, pl.ds(p, 1), :] = row
        return _

    jax.lax.fori_loop(0, NP, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("win_radius", "no_sigma", "corr_thresh2", "interpret"),
)
def pallas_multi_ellipse_search(
    corr_maps: jnp.ndarray,    # [F, H, W] penalized score maps (one per patch)
    h_centres: jnp.ndarray,    # [F, P, 2]
    sinv: jnp.ndarray,         # [F, P, 2, 2]
    alive: jnp.ndarray,        # [F, P] bool (already includes the making gate)
    win_radius: int = 16,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    interpret: bool | None = None,
):
    """multi_ellipse_search_dense semantics as one Pallas launch.

    Returns (found, u, v, overflow) each [F, P] — bit-identical decisions to
    the dense XLA form (same map values, same f32 mask arithmetic, same
    tie-break)."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F, H, W = corr_maps.shape
    P = h_centres.shape[1]
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)
    pad_w = max(_round_up(W, 128), 256)
    pad_h = _round_up(H, 8)
    NP_pad = _round_up(P, 8)

    maps = jnp.pad(
        corr_maps.astype(jnp.float32),
        ((0, 0), (0, pad_h - H), (0, pad_w - W)),
        constant_values=1e6,
    )
    uc = jnp.trunc(h_centres[..., 0]).astype(jnp.float32)
    vc = jnp.trunc(h_centres[..., 1]).astype(jnp.float32)
    params = jnp.stack(
        [
            uc, vc,
            sinv[..., 0, 0].astype(jnp.float32), sinv[..., 0, 1].astype(jnp.float32),
            sinv[..., 1, 1].astype(jnp.float32), alive.astype(jnp.float32),
            jnp.zeros_like(uc), jnp.zeros_like(uc),
        ],
        axis=-1,
    )                                                   # [F, P, 8]

    kernel = functools.partial(
        _particle_kernel,
        NP=P, side_u=side_u, side_v=side_v, pad_h=pad_h, pad_w=pad_w,
        no_sigma=no_sigma, W=W, H=H,
    )
    out = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, P, 8), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, pad_h, pad_w), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NP_pad, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, NP_pad, 128), jnp.float32),
        interpret=interpret,
    )(params, maps)

    best = out[:, :P, 0].astype(h_centres.dtype)
    kbest = out[:, :P, 1].astype(jnp.int32)
    u = kbest // H
    v = kbest % H
    over = (out[:, :P, 2] > 0) & alive
    found = alive & (best <= corr_thresh2)
    return found, u, v, over


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
