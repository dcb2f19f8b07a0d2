"""Batched NSSD patch correlation + elliptical active search (TPU-exact).

Replaces the reference's per-pixel scalar scans (improc/improc.cpp:55-134,
monoslam.cpp:401-477, search_multiple_overlapping_ellipses.cpp:106-196) with
batched integer-sum maps + masked windowed reductions.

TPU exactness strategy (measured on v5e):
  - f32 convolutions on the MXU are NOT integer-exact (bf16 passes), so all
    integer sums use ops that are: `lax.reduce_window` adds for box sums
    (sg1, sg1sq) and an int32 grouped convolution for the patch cross sums
    (sg0g1). Both are bit-exact and compile ~100x faster than f32 convs on
    the axon backend.
  - the final NSSD score formula runs in f64 with the same operation order
    as the C++ double code, so scores are bit-identical given the (exact)
    integer sums.

Cost strategy: integer sum MAPS are computed once per frame over the full
image (cheap, VPU/MXU-friendly); the f64 score formula + ellipse masks are
evaluated only on small gathered windows around each candidate centre
(the full-image f64 variant cost ~2 GF64op/frame at 100 particles — the
windowed form is ~100x less). Window radii are static caps; candidates the
reference would scan beyond the cap are dropped and counted in `overflow`
(never observed in the stock workload where 3-sigma extents are <15 px).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class FrameSums(NamedTuple):
    """Per-centre integer window sums for one image (centre-indexed, padded).

    Entries at invalid centres (window would leave the image) are zero; use
    the centre-validity bounds [half, dim-1-half].
    """

    sg1: jnp.ndarray    # [H,W] f32 window sums (exact integers)
    sg1sq: jnp.ndarray  # [H,W] f32 window sums of squares
    valid: jnp.ndarray  # [H,W] bool centre validity


def _box_sum(img_f32: jnp.ndarray, boxsize: int) -> jnp.ndarray:
    """VALID box sum via reduce_window (exact f32 adds), centre-padded."""
    H, W = img_f32.shape
    half = (boxsize - 1) // 2
    s = lax.reduce_window(img_f32, 0.0, lax.add, (boxsize, boxsize), (1, 1), "VALID")
    return jnp.pad(s, ((half, H - s.shape[0] - half), (half, W - s.shape[1] - half)))


def frame_sums(image_u8: jnp.ndarray, boxsize: int) -> FrameSums:
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)
    uu = jnp.arange(W)[None, :]
    vv = jnp.arange(H)[:, None]
    valid = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    return FrameSums(_box_sum(img, boxsize), _box_sum(img * img, boxsize), valid)


def cross_sum_maps(image_u8: jnp.ndarray, patches_u8: jnp.ndarray, boxsize: int) -> jnp.ndarray:
    """Sg0g1 for every patch at every centre: [F,H,W] i32.

    Computed as boxsize^2 statically-shifted f32 FMAs (exact: u8*u8 products
    accumulate to <= 121*255^2 < 2^24, representable in f32). An int32
    grouped convolution gives the same integers but does NOT run on the MXU —
    profiled at 1.7 ms per 320x240 call on v5e (the single most expensive op
    in the whole step); the shifted-FMA form fuses on the VPU."""
    H, W = image_u8.shape
    F = patches_u8.shape[0]
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)
    p = patches_u8.astype(jnp.float32)
    oh, ow = H - boxsize + 1, W - boxsize + 1
    acc = jnp.zeros((F, oh, ow), jnp.float32)
    for dy in range(boxsize):
        for dx in range(boxsize):
            win = lax.slice(img, (dy, dx), (dy + oh, dx + ow))
            acc = acc + p[:, dy, dx][:, None, None] * win[None]
    out = acc.astype(jnp.int32)
    pad = ((0, 0), (half, H - oh - half), (half, W - ow - half))
    return jnp.pad(out, pad)


def patch_stats(patches_u8: jnp.ndarray):
    """Per-patch (Sg0, Sg0sq): [F],[F] i32->f64-exact f32."""
    p = patches_u8.astype(jnp.int32)
    return (
        p.sum(axis=(1, 2)).astype(jnp.float32),
        (p * p).sum(axis=(1, 2)).astype(jnp.float32),
    )


def nssd_score(sg0, sg0sq, sg1, sg1sq, sg0g1, n: float):
    """The correlate2_warning score + both sigmas (f64, same op order as the
    C++ double code). Returns (corr, sd0, sd1) with the 0/1 zero-variance
    special cases (improc.cpp:117-125)."""
    sg0 = sg0.astype(jnp.float64)
    sg0sq = sg0sq.astype(jnp.float64)
    sg1 = sg1.astype(jnp.float64)
    sg1sq = sg1sq.astype(jnp.float64)
    sg0g1 = sg0g1.astype(jnp.float64)

    g0bar = sg0 / n
    g1bar = sg1 / n
    varg0 = sg0sq / n - g0bar * g0bar
    varg1 = sg1sq / n - g1bar * g1bar
    sd0 = jnp.sqrt(varg0)
    sd1 = jnp.sqrt(varg1)

    ok = (sd0 != 0.0) & (sd1 != 0.0)
    v0 = jnp.where(varg0 == 0.0, 1.0, varg0)
    v1 = jnp.where(varg1 == 0.0, 1.0, varg1)
    s0 = jnp.sqrt(v0)
    s1 = jnp.sqrt(v1)
    k = g0bar / s0 - g1bar / s1
    C = (
        sg0sq / v0
        + sg1sq / v1
        + n * (k * k)
        - sg0g1 * 2.0 / (s0 * s1)
        - sg0 * 2.0 * k / s0
        + sg1 * 2.0 * k / s1
    ) / n
    both_zero = (sd0 == 0.0) & (sd1 == 0.0)
    corr = jnp.where(ok, C, jnp.where(both_zero, 0.0, 1.0))
    return corr, sd0, sd1


# ---------------------------------------------------------------------------
# full-image maps (test/reference path; the step uses the windowed variants)
# ---------------------------------------------------------------------------


def correlation_maps(image_u8: jnp.ndarray, patches_u8: jnp.ndarray, boxsize: int):
    """Full-image NSSD maps for every patch.

    Returns (corr [F,H,W] f64, sd_patch [F] f64, sd_image [H,W] f64,
    valid [H,W] bool). Reduce only under `valid`.
    """
    n = float(boxsize * boxsize)
    fs = frame_sums(image_u8, boxsize)
    sg0g1 = cross_sum_maps(image_u8, patches_u8, boxsize)
    sg0, sg0sq = patch_stats(patches_u8)
    corr, sd0, sd1 = nssd_score(
        sg0[:, None, None], sg0sq[:, None, None], fs.sg1[None], fs.sg1sq[None], sg0g1, n
    )
    return corr, sd0[:, 0, 0], sd1[0], fs.valid


def search_window_origin(h_centre, R: int, W: int, H: int, boxsize: int, round_half: bool):
    """Centre-window origins (u0[K], v0[K]) for windowed searches.

    Clamped so the underlying (side + boxsize - 1)^2 image window stays fully
    inside the image: u0 in [half, W - side - half]. All candidates the
    reference would scan (valid centres within R of the centre) stay covered.
    round_half selects int(c+0.5) (single search) vs int(c) (particle search).
    """
    half = (boxsize - 1) // 2
    side_u = min(2 * R + 1, W - boxsize + 1)
    side_v = min(2 * R + 1, H - boxsize + 1)
    if round_half:
        uc = jnp.floor(h_centre[..., 0] + 0.5).astype(jnp.int32)
        vc = jnp.floor(h_centre[..., 1] + 0.5).astype(jnp.int32)
    else:
        uc = jnp.trunc(h_centre[..., 0]).astype(jnp.int32)
        vc = jnp.trunc(h_centre[..., 1]).astype(jnp.int32)
    u0 = jnp.clip(uc - R, half, W - side_u - half)
    v0 = jnp.clip(vc - R, half, H - side_v - half)
    return u0, v0, uc, vc


def cross_sum_windows(
    image_u8: jnp.ndarray,     # [H,W]
    patches_u8: jnp.ndarray,   # [K,B,B]
    u0: jnp.ndarray,           # [K] centre-window origins (from search_window_origin)
    v0: jnp.ndarray,           # [K]
    win_radius: int,
    boxsize: int,
    index_gather: bool = False,
) -> jnp.ndarray:
    """Sg0g1 evaluated only on each feature's search window: [K, side, side].

    ~13x less int-conv work than full-image maps for the selected-feature
    search (the windows cover <10% of the frame).
    """
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    side_u = min(2 * win_radius + 1, W - boxsize + 1)
    side_v = min(2 * win_radius + 1, H - boxsize + 1)
    K = patches_u8.shape[0]
    sw_u = side_u + boxsize - 1
    sw_v = side_v + boxsize - 1
    img = image_u8.astype(jnp.int32)

    def gather(u0_k, v0_k):
        return _gather_window(img, v0_k - half, u0_k - half, sw_v, sw_u, index_gather)

    wins = jax.vmap(gather)(u0, v0)                      # [K, sw_v, sw_u]
    out = lax.conv_general_dilated(
        wins[None],                                       # [1, K, sw_v, sw_u]
        patches_u8.astype(jnp.int32)[:, None],            # [K, 1, B, B]
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=K,
        preferred_element_type=jnp.int32,
    )[0]
    return out                                            # [K, side_v, side_u]


class SearchResult(NamedTuple):
    found: jnp.ndarray    # [K] bool
    u: jnp.ndarray        # [K] i32 best-match patch centre
    v: jnp.ndarray        # [K] i32
    best: jnp.ndarray     # [K] f64 best corr (1e6 if no candidate)
    overflow: jnp.ndarray  # [K] bool: reference search box exceeded the window cap


def _masked_min_last_tie_win(corr, mask, uu, vv, H: int):
    """Masked min with the reference tie-break (u-outer/v-inner scan,
    `corr <= corrmax` keeps later candidates => largest (u,v) lexicographic)."""
    big = jnp.float64(1e6)
    vals = jnp.where(mask, corr, big)
    m = vals.min()
    key = uu.astype(jnp.int32) * jnp.int32(H) + vv.astype(jnp.int32)
    tie = (vals == m) & mask
    kbest = jnp.where(tie, key, -1).max()
    return m, kbest // H, kbest % H


def _window_coords(ucentre, vcentre, R: int, W: int, H: int):
    """Static-size window (clamped to image dims) with clamped start; returns
    absolute coordinate grids + start indices."""
    side_u = min(2 * R + 1, W)
    side_v = min(2 * R + 1, H)
    u0 = jnp.clip(ucentre - R, 0, W - side_u)
    v0 = jnp.clip(vcentre - R, 0, H - side_v)
    uu = u0 + jnp.arange(side_u, dtype=jnp.int32)[None, :]
    vv = v0 + jnp.arange(side_v, dtype=jnp.int32)[:, None]
    return u0, v0, uu, vv


def _gather_window(map2d, v0, u0, side_v: int, side_u: int, index_gather: bool = False):
    """Window gather.

    Default: dynamic_slice. Under vmap it lowers to a serial while-loop on
    TPU, yet for single-sequence workloads it is 2.4 ms/frame FASTER than an
    advanced-indexing gather (measured A/B on v5e: 1.65 vs 4.04 ms/frame).
    index_gather=True uses one index-grid gather instead — slower
    single-stream but it batches cleanly under a second vmap (the
    64-sequence data-generation config), where serial slice loops multiply
    across lanes.
    """
    if index_gather:
        vv = v0 + jnp.arange(side_v, dtype=jnp.int32)[:, None]
        uu = u0 + jnp.arange(side_u, dtype=jnp.int32)[None, :]
        return map2d[vv, uu]
    return lax.dynamic_slice(map2d, (v0, u0), (side_v, side_u))


def elliptical_search_batch(
    fsums: FrameSums,
    cross_win: jnp.ndarray,    # [K, side, side] i32 from cross_sum_windows
    sg0: jnp.ndarray,          # [K]
    sg0sq: jnp.ndarray,        # [K]
    u0: jnp.ndarray,           # [K] window origins (search_window_origin)
    v0: jnp.ndarray,           # [K]
    h_centre: jnp.ndarray,     # [K,2]
    sinv: jnp.ndarray,         # [K,2,2]
    active: jnp.ndarray,       # [K]
    boxsize: int,
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    corr_sigma_thresh: float = 10.0,
    index_gather: bool = False,
) -> SearchResult:
    """Reference elliptical_search (monoslam.cpp:401-477), all features in
    one launch; scores evaluated on precomputed [2R+1]^2 windows only."""
    H, W = fsums.sg1.shape
    half = (boxsize - 1) // 2
    n = float(boxsize * boxsize)
    side_u = min(2 * win_radius + 1, W - boxsize + 1)
    side_v = min(2 * win_radius + 1, H - boxsize + 1)

    def per_feature(cross_w, sg0_k, sg0sq_k, u0_k, v0_k, h_f, sinv_f):
        a, b, c = sinv_f[0, 0], sinv_f[0, 1], sinv_f[1, 1]
        halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
        halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
        ucentre = jnp.floor(h_f[0] + 0.5).astype(jnp.int32)
        vcentre = jnp.floor(h_f[1] + 0.5).astype(jnp.int32)
        uu = u0_k + jnp.arange(side_u, dtype=jnp.int32)[None, :]
        vv = v0_k + jnp.arange(side_v, dtype=jnp.int32)[:, None]

        sg1_w = _gather_window(fsums.sg1, v0_k, u0_k, side_v, side_u, index_gather)
        sg1sq_w = _gather_window(fsums.sg1sq, v0_k, u0_k, side_v, side_u, index_gather)

        corr, sd0, sd1 = nssd_score(sg0_k, sg0sq_k, sg1_w, sg1sq_w, cross_w, n)

        urel = (uu - ucentre).astype(corr.dtype)
        vrel = (vv - vcentre).astype(corr.dtype)
        box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
        ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
        centre_ok = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
        mask = box & ellipse & centre_ok & (sd1 >= corr_sigma_thresh) & (
            sd0 >= corr_sigma_thresh
        )
        best, ub, vb = _masked_min_last_tie_win(corr, mask, uu, vv, H)
        over = (halfwidth > win_radius) | (halfheight > win_radius)
        return best, ub, vb, over

    best, u, v, over = jax.vmap(per_feature)(cross_win, sg0, sg0sq, u0, v0, h_centre, sinv)
    found = active & (best <= corr_thresh2)
    return SearchResult(found=found, u=u, v=v, best=best, overflow=over & active)


def penalized_score_map(
    fsums: FrameSums,
    cross_map: jnp.ndarray,    # [H,W] i32 for this patch
    sg0: jnp.ndarray,
    sg0sq: jnp.ndarray,
    boxsize: int,
    corr_sigma_thresh: float = 10.0,
    low_sigma_penalty: float = 5.0,
) -> jnp.ndarray:
    """Full-image NSSD score for one patch with the particle-search rules
    baked in: +low_sigma_penalty where image sigma is low (no skip, matching
    search_multiple_overlapping_ellipses.h:56) and 1e6 at invalid centres.
    The shared 'correlation cache' both the XLA and Pallas particle searches
    reduce over."""
    n = float(boxsize * boxsize)
    corr_map, _, sd1_map = nssd_score(sg0, sg0sq, fsums.sg1, fsums.sg1sq, cross_map, n)
    corr_map = jnp.where(sd1_map < corr_sigma_thresh, corr_map + low_sigma_penalty, corr_map)
    return jnp.where(fsums.valid, corr_map, jnp.asarray(1e6, corr_map.dtype))


def multi_ellipse_search_dense(
    corr_map: jnp.ndarray,     # [H,W] penalized_score_map output
    h_centres: jnp.ndarray,    # [P,2]
    sinv: jnp.ndarray,         # [P,2,2]
    alive: jnp.ndarray,        # [P]
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
):
    """Particle-cloud search as one fused broadcast masked-min over the
    shared score map — no per-particle window gathers (vmapped dynamic_slice
    lowers to a serial loop on TPU). Decisions are bit-identical to
    multi_ellipse_search: the per-particle window clamp, ellipse test, and
    last-in-(u,v)-scan-order tie-break are applied as masks against absolute
    coordinates. Returns (found, u, v, overflow) each [P]."""
    H, W = corr_map.shape
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)

    uc = jnp.trunc(h_centres[:, 0]).astype(jnp.int32)       # [P]
    vc = jnp.trunc(h_centres[:, 1]).astype(jnp.int32)
    a = sinv[:, 0, 0]
    b = sinv[:, 0, 1]
    c = sinv[:, 1, 1]
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
    u0 = jnp.clip(uc - win_radius, 0, W - side_u)
    v0 = jnp.clip(vc - win_radius, 0, H - side_v)

    uu = jnp.arange(W, dtype=jnp.int32)[None, None, :]       # [1,1,W]
    vv = jnp.arange(H, dtype=jnp.int32)[None, :, None]       # [1,H,1]
    urel = (uu - uc[:, None, None]).astype(corr_map.dtype)   # [P,H,W]
    vrel = (vv - vc[:, None, None]).astype(corr_map.dtype)
    in_win = (
        (uu >= u0[:, None, None]) & (uu < (u0 + side_u)[:, None, None])
        & (vv >= v0[:, None, None]) & (vv < (v0 + side_v)[:, None, None])
    )
    box = (jnp.abs(urel) <= halfwidth[:, None, None]) & (
        jnp.abs(vrel) <= halfheight[:, None, None]
    )
    ell = (
        a[:, None, None] * urel * urel
        + 2.0 * b[:, None, None] * urel * vrel
        + c[:, None, None] * vrel * vrel
    ) < no_sigma * no_sigma
    mask = in_win & box & ell

    big = jnp.asarray(1e6, corr_map.dtype)
    vals = jnp.where(mask, corr_map[None], big)              # [P,H,W]
    best = vals.min(axis=(1, 2))
    key = (uu * jnp.int32(H) + vv).astype(jnp.int32)         # scan order (u outer)
    tie = (vals == best[:, None, None]) & mask
    kbest = jnp.where(tie, key, -1).max(axis=(1, 2))
    u = kbest // H
    v = kbest % H
    over = (halfwidth > win_radius) | (halfheight > win_radius)
    found = alive & (best <= corr_thresh2)
    return found, u, v, over & alive


def multi_ellipse_search_rowband(
    corr_map: jnp.ndarray,     # [H,W] penalized_score_map output
    h_centres: jnp.ndarray,    # [P,2]
    sinv: jnp.ndarray,         # [P,2,2]
    alive: jnp.ndarray,        # [P]
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
):
    """multi_ellipse_search_dense restricted to each particle's row band.

    One batched row gather pulls [P, side_v, W] from the shared map, then the
    same masks/min/tie-break run on 7x less data than the full-image dense
    broadcast (win_radius=16 on 240 rows). The masked candidate set is
    IDENTICAL to the dense form (the v-window test selects exactly these
    rows), so results are bit-equal in either precision. Measured on v5e:
    ~30% faster than the dense form and ~20% faster than a Pallas
    per-particle band kernel (serial in-kernel particle loop). A further
    take_along_axis COLUMN gather (narrowing to [P, side_v, side_u]) was 3x
    faster standalone but 6% slower in the full step — XLA inserts a
    layout-transposing copy of the band first; do not retry.
    Returns (found, u, v, overflow) each [P]."""
    H, W = corr_map.shape
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)

    uc = jnp.trunc(h_centres[:, 0]).astype(jnp.int32)
    vc = jnp.trunc(h_centres[:, 1]).astype(jnp.int32)
    a = sinv[:, 0, 0]
    b = sinv[:, 0, 1]
    c = sinv[:, 1, 1]
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
    u0 = jnp.clip(uc - win_radius, 0, W - side_u)
    v0 = jnp.clip(vc - win_radius, 0, H - side_v)

    rows = corr_map[v0[:, None] + jnp.arange(side_v)[None, :]]   # [P,side_v,W]
    uu = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    vv = (v0[:, None] + jnp.arange(side_v, dtype=jnp.int32)[None, :])[:, :, None]
    urel = (uu - uc[:, None, None]).astype(corr_map.dtype)
    vrel = (vv - vc[:, None, None]).astype(corr_map.dtype)
    in_win = (uu >= u0[:, None, None]) & (uu < (u0 + side_u)[:, None, None])
    box = (jnp.abs(urel) <= halfwidth[:, None, None]) & (
        jnp.abs(vrel) <= halfheight[:, None, None]
    )
    ell = (
        a[:, None, None] * urel * urel
        + 2.0 * b[:, None, None] * urel * vrel
        + c[:, None, None] * vrel * vrel
    ) < no_sigma * no_sigma
    mask = in_win & box & ell

    vals = jnp.where(mask, rows, jnp.asarray(1e6, corr_map.dtype))
    best = vals.min(axis=(1, 2))
    key = (uu * jnp.int32(H) + vv).astype(jnp.int32)             # scan order
    tie = (vals == best[:, None, None]) & mask
    kbest = jnp.where(tie, key, -1).max(axis=(1, 2))
    over = (halfwidth > win_radius) | (halfheight > win_radius)
    found = alive & (best <= corr_thresh2)
    return found, kbest // H, kbest % H, over & alive


def multi_ellipse_search_unionbox(
    corr_map: jnp.ndarray,     # [H,W] penalized_score_map output
    h_centres: jnp.ndarray,    # [P,2]
    sinv: jnp.ndarray,         # [P,2,2]
    alive: jnp.ndarray,        # [P]
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    band_h: int | None = None,
    band_w: int | None = None,
):
    """Particle search over ONE dynamically-sliced union box of all alive
    windows, with a lax.cond fallback to the full-image dense broadcast when
    the union exceeds the static (band_h, band_w) cap (defaults: window side
    + 63 rows / + 127 cols, i.e. 128x192 at the stock radius 32).

    Depth particles lie along a projected ray, so after the first few Bayes
    updates their windows cluster tightly: the fused mask+min then scans
    [P, band_h, band_w] instead of [P, H, W] (5x less at 320x240) while
    never materializing per-particle bands (the rowband gather's weakness).
    Decisions are bit-equal to the dense form in either precision: the
    union box contains every alive particle's full window by construction,
    values are read from the same map, and min/max reductions are
    comparison-based (order-independent).
    Returns (found, u, v, overflow) each [P]."""
    H, W = corr_map.shape
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)
    bh = min(side_v + 63 if band_h is None else band_h, H)
    bw = min(side_u + 127 if band_w is None else band_w, W)

    uc = jnp.trunc(h_centres[:, 0]).astype(jnp.int32)
    vc = jnp.trunc(h_centres[:, 1]).astype(jnp.int32)
    a = sinv[:, 0, 0]
    b = sinv[:, 0, 1]
    c = sinv[:, 1, 1]
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
    u0 = jnp.clip(uc - win_radius, 0, W - side_u)
    v0 = jnp.clip(vc - win_radius, 0, H - side_v)
    over = (halfwidth > win_radius) | (halfheight > win_radius)

    big = jnp.int32(1 << 24)
    # Tight per-particle effective region: the mask below is
    # in_win & box & ell, so every pixel a particle can test lies inside
    # intersect(its clipped window, its ellipse bounding box). After the
    # first few Bayes updates the ellipses shrink far below the window
    # side, so the union of INTERSECTIONS is typically a small fraction of
    # the union of windows — worth a ladder of static band sizes.
    r_v_lo = jnp.maximum(v0, vc - halfheight)
    r_v_hi = jnp.minimum(v0 + side_v, vc + halfheight + 1)
    r_u_lo = jnp.maximum(u0, uc - halfwidth)
    r_u_hi = jnp.minimum(u0 + side_u, uc + halfwidth + 1)
    nonempty = alive & (r_v_lo < r_v_hi) & (r_u_lo < r_u_hi)
    v_lo = jnp.min(jnp.where(nonempty, r_v_lo, big))
    v_hi = jnp.max(jnp.where(nonempty, r_v_hi, -big))
    u_lo = jnp.min(jnp.where(nonempty, r_u_lo, big))
    u_hi = jnp.max(jnp.where(nonempty, r_u_hi, -big))

    def _masks(uu, vv):
        urel = (uu - uc[:, None, None]).astype(corr_map.dtype)
        vrel = (vv - vc[:, None, None]).astype(corr_map.dtype)
        # the window test cannot be folded into a radius-clamped box test:
        # an overflowing particle whose window is border-clipped searches
        # window cells beyond its R-box in the dense form
        in_win = (
            (uu >= u0[:, None, None]) & (uu < (u0 + side_u)[:, None, None])
            & (vv >= v0[:, None, None]) & (vv < (v0 + side_v)[:, None, None])
        )
        box = (jnp.abs(urel) <= halfwidth[:, None, None]) & (
            jnp.abs(vrel) <= halfheight[:, None, None]
        )
        ell = (
            a[:, None, None] * urel * urel
            + 2.0 * b[:, None, None] * urel * vrel
            + c[:, None, None] * vrel * vrel
        ) < no_sigma * no_sigma
        return in_win & box & ell

    def _reduce(vals_src, mask, uu, vv):
        vals = jnp.where(mask, vals_src, jnp.asarray(1e6, corr_map.dtype))
        best = vals.min(axis=(1, 2))
        key = (uu * jnp.int32(H) + vv).astype(jnp.int32)
        tie = (vals == best[:, None, None]) & mask
        kbest = jnp.where(tie, key, -1).max(axis=(1, 2))
        return best, kbest

    def make_banded(bh_i, bw_i):
        def banded(_):
            bv0 = jnp.clip(v_lo, 0, H - bh_i)
            bu0 = jnp.clip(u_lo, 0, W - bw_i)
            sub = lax.dynamic_slice(corr_map, (bv0, bu0), (bh_i, bw_i))
            uu = (bu0 + jnp.arange(bw_i, dtype=jnp.int32))[None, None, :]
            vv = (bv0 + jnp.arange(bh_i, dtype=jnp.int32))[None, :, None]
            mask = _masks(uu, vv)
            return _reduce(sub[None], mask, uu, vv)

        return banded

    def full(_):
        uu = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        vv = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        mask = _masks(uu, vv)
        return _reduce(corr_map[None], mask, uu, vv)

    # ladder of union-box sizes, smallest first; converged particle clouds
    # take the cheapest rung and only that rung executes (nested lax.cond:
    # the false branch traces the next rung, it does not pre-compute it).
    # Decisions stay bit-equal on every rung: same map values, same masks,
    # comparison-based reductions.
    rungs = []
    for bh_i, bw_i in ((16, 128), (48, 192), (bh, bw)):
        bh_i, bw_i = min(bh_i, H), min(bw_i, W)
        if (bh_i, bw_i) not in rungs and (bh_i < H or bw_i < W):
            rungs.append((bh_i, bw_i))

    def eval_rung(k):
        if k == len(rungs):
            return full(None)
        bh_i, bw_i = rungs[k]
        fits_i = (v_hi - v_lo <= bh_i) & (u_hi - u_lo <= bw_i)
        return lax.cond(
            fits_i, make_banded(bh_i, bw_i), lambda _: eval_rung(k + 1), None
        )

    best, kbest = eval_rung(0)
    found = alive & (best <= corr_thresh2)
    return found, kbest // H, kbest % H, over & alive


def multi_ellipse_search(
    fsums: FrameSums,
    cross_map: jnp.ndarray,    # [H,W] i32 for this patch
    sg0: jnp.ndarray,          # [] scalar
    sg0sq: jnp.ndarray,        # []
    h_centres: jnp.ndarray,    # [P,2]
    sinv: jnp.ndarray,         # [P,2,2]
    alive: jnp.ndarray,        # [P]
    boxsize: int,
    win_radius: int = 16,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    corr_sigma_thresh: float = 10.0,
    low_sigma_penalty: float = 5.0,
    index_gather: bool = False,
):
    """SearchMultipleOverlappingEllipses for one particle cloud.

    Matching the reference: low image-sigma adds +5.0 (no skip), no
    patch-sigma gate, centre via plain int truncation
    (search_multiple_overlapping_ellipses.cpp:126-127).

    The NSSD score depends only on (patch, image), not on the particle, so —
    exactly like the reference's image-wide correlation cache
    (search_multiple_overlapping_ellipses.cpp:106-196) — the score map is
    computed ONCE over the full image and each particle does a cheap masked
    argmin over a window gathered from the shared map. This replaced a
    per-particle windowed rescore: 100 overlapping f64 score evaluations
    collapse into one map, and the window radius can be generous (particle
    ellipses early in a ray's life exceed 16 px; dropping their candidates
    deviated from the reference).

    Returns (found [P], u, v, overflow [P]).
    """
    H, W = fsums.sg1.shape
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)

    corr_map = penalized_score_map(
        fsums, cross_map, sg0, sg0sq, boxsize, corr_sigma_thresh, low_sigma_penalty
    )

    def per_particle(h_p, sinv_p):
        a, b, c = sinv_p[0, 0], sinv_p[0, 1], sinv_p[1, 1]
        halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
        halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
        ucentre = jnp.trunc(h_p[0]).astype(jnp.int32)
        vcentre = jnp.trunc(h_p[1]).astype(jnp.int32)
        u0, v0, uu, vv = _window_coords(ucentre, vcentre, win_radius, W, H)

        corr = _gather_window(corr_map, v0, u0, side_v, side_u, index_gather)

        urel = (uu - ucentre).astype(jnp.float64)
        vrel = (vv - vcentre).astype(jnp.float64)
        box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
        ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
        mask = box & ellipse
        best, ub, vb = _masked_min_last_tie_win(corr, mask, uu, vv, H)
        over = (halfwidth > win_radius) | (halfheight > win_radius)
        return best, ub, vb, over

    best, u, v, over = jax.vmap(per_particle)(h_centres, sinv)
    found = alive & (best <= corr_thresh2)
    return found, u, v, over & alive
