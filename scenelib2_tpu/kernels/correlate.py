"""Batched NSSD patch correlation + elliptical active search (XLA conv form).

Replaces the reference's per-pixel scalar scans with full-image correlation
maps computed for all features in one launch:

  - correlate2_warning (improc/improc.cpp:55-134): zero-mean unit-variance
    normalised SSD between an 11x11 patch and an image window, computed from
    five integer sums. All sums fit exactly in f32 (max 121*255^2 < 2^24), so
    conv accumulations are exact; the final score formula is evaluated in f64,
    which reproduces the C++ double arithmetic bit-for-bit.
  - elliptical_search (monoslam.cpp:401-477): 3-sigma ellipse bounded by the
    conditional-variance box, low-sigma skip, min-score with last-in-scan-order
    tie-break, success iff min <= 0.40.
  - SearchMultipleOverlappingEllipses (improc/search_multiple_overlapping_
    ellipses.cpp:106-196): shared correlation map over the particle cloud with
    a +5.0 penalty where the image window sigma is low, per-particle masked
    min within each particle's own ellipse.

Design note (TPU-first): rather than replicate the reference's dynamic
bounding boxes, we compute the correlation map over ALL valid patch centres
of the image (a handful of 11x11 convolutions — microseconds on the MXU) and
reduce under masks. That keeps every shape static, removes the data-dependent
window extents entirely, and makes the per-feature search a pure masked
argmin. The candidate SET per feature is identical to the reference's loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv_valid(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """2-D VALID cross-correlation, f32. img [H,W], kernel [kh,kw] -> [H-kh+1, W-kw+1]."""
    out = lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    return out[0, 0]


class CorrSums(NamedTuple):
    """Integer sums underlying the NSSD score, per valid patch-centre.

    Maps are indexed by the patch CENTRE pixel (u, v); entries whose 11x11
    window would leave the image are only produced for valid centres
    [half, W-1-half] x [half, H-1-half]; arrays are padded back to full image
    size with zeros for static shapes.
    """

    sg1: jnp.ndarray     # window sum            [H, W] f32 (exact ints)
    sg1sq: jnp.ndarray   # window sum of squares [H, W] f32
    sg0g1: jnp.ndarray   # patch.window          [F, H, W] f32
    valid: jnp.ndarray   # centre validity mask  [H, W] bool


def image_window_sums(image_u8: jnp.ndarray, boxsize: int):
    """Per-centre window sums Sg1, Sg1sq for one image. Returns ([H,W],[H,W],valid)."""
    H, W = image_u8.shape
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)
    ones = jnp.ones((boxsize, boxsize), jnp.float32)
    sg1 = _conv_valid(img, ones)
    sg1sq = _conv_valid(img * img, ones)
    # pad VALID output (indexed by window top-left) back to centre-indexed full size
    pad = ((half, H - sg1.shape[0] - half), (half, W - sg1.shape[1] - half))
    sg1 = jnp.pad(sg1, pad)
    sg1sq = jnp.pad(sg1sq, pad)
    uu = jnp.arange(W)[None, :]
    vv = jnp.arange(H)[:, None]
    valid = (uu >= half) & (uu <= W - 1 - (boxsize - 1 - half)) & (vv >= half) & (
        vv <= H - 1 - (boxsize - 1 - half)
    )
    return sg1, sg1sq, valid


def patch_cross_sums(image_u8: jnp.ndarray, patches_u8: jnp.ndarray, boxsize: int) -> jnp.ndarray:
    """Sg0g1 for every feature patch at every centre: [F, H, W] (one grouped conv)."""
    H, W = image_u8.shape
    F = patches_u8.shape[0]
    half = (boxsize - 1) // 2
    img = image_u8.astype(jnp.float32)
    kernels = patches_u8.astype(jnp.float32)[:, None, :, :]  # [F,1,k,k]
    out = lax.conv_general_dilated(
        jnp.broadcast_to(img[None, None], (1, F, H, W)),
        kernels,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=F,
        preferred_element_type=jnp.float32,
    )[0]
    pad = ((0, 0), (half, H - out.shape[1] - half), (half, W - out.shape[2] - half))
    return jnp.pad(out, pad)


def patch_stats(patches_u8: jnp.ndarray):
    """Per-patch integer sums (Sg0, Sg0sq): [F], [F] in f64-exact f32."""
    p = patches_u8.astype(jnp.float32)
    return p.sum(axis=(1, 2)), (p * p).sum(axis=(1, 2))


def nssd_score(
    sg0: jnp.ndarray,      # [...]: patch sum
    sg0sq: jnp.ndarray,    # [...]: patch sum sq
    sg1: jnp.ndarray,      # [...]: window sum
    sg1sq: jnp.ndarray,    # [...]: window sum sq
    sg0g1: jnp.ndarray,    # [...]: cross sum
    n: float,
):
    """The correlate2_warning score + both sigmas, broadcast over any shape.

    Evaluated in f64 with the same operation order as the C++ double code so
    results are bit-identical given identical integer sums. Returns
    (corr, sd0, sd1); the sd==0 special cases return 0/1 as in the reference.
    """
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
    # guard the divisions; value replaced by the special cases below
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


def correlation_maps(image_u8: jnp.ndarray, patches_u8: jnp.ndarray, boxsize: int):
    """Full-image NSSD maps for every patch.

    Returns (corr [F,H,W] f64, sd_patch [F] f64, sd_image [H,W] f64,
    valid [H,W] bool). corr at invalid centres is garbage — always reduce
    under `valid`.
    """
    n = float(boxsize * boxsize)
    sg1, sg1sq, valid = image_window_sums(image_u8, boxsize)
    sg0g1 = patch_cross_sums(image_u8, patches_u8, boxsize)
    sg0, sg0sq = patch_stats(patches_u8)
    corr, sd0, sd1 = nssd_score(
        sg0[:, None, None], sg0sq[:, None, None], sg1[None], sg1sq[None], sg0g1, n
    )
    return corr, sd0[:, 0, 0], sd1[0], valid


class SearchResult(NamedTuple):
    found: jnp.ndarray  # [F] bool
    u: jnp.ndarray      # [F] int32 (patch centre of best match)
    v: jnp.ndarray      # [F] int32
    best: jnp.ndarray   # [F] f64 best corr (1e6 where no candidate)


def _masked_min_last_tie(corr: jnp.ndarray, mask: jnp.ndarray):
    """Masked min over [H,W] with the reference tie-break (last visited wins,
    scan order: u outer, v inner => largest (u, v) lexicographic).

    Returns (min_value (1e6 if empty), u, v).
    """
    H, W = corr.shape
    big = jnp.float64(1e6)
    vals = jnp.where(mask, corr, big)
    m = vals.min()
    uu = jnp.arange(W, dtype=jnp.int32)[None, :]
    vv = jnp.arange(H, dtype=jnp.int32)[:, None]
    key = uu * jnp.int32(H) + vv  # lexicographic (u, v)
    tie = (vals == m) & mask
    kbest = jnp.where(tie, key, -1).max()
    return m, kbest // H, kbest % H


def elliptical_search_batch(
    corr: jnp.ndarray,        # [F,H,W] from correlation_maps
    sd_patch: jnp.ndarray,    # [F]
    sd_image: jnp.ndarray,    # [H,W]
    valid: jnp.ndarray,       # [H,W]
    h_centre: jnp.ndarray,    # [F,2] predicted image positions (f64)
    sinv: jnp.ndarray,        # [F,2,2] inverse innovation covariances
    active: jnp.ndarray,      # [F] bool: perform search for this feature
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    corr_sigma_thresh: float = 10.0,
) -> SearchResult:
    """Reference elliptical_search (monoslam.cpp:401-477) for all features at once.

    Candidate set per feature: |urel| <= halfwidth, |vrel| <= halfheight
    (halfsizes int-truncated from the conditional 3-sigma extents), centre
    valid in image, inside the ellipse quadratic < 9, image-window sigma >= 10.
    A patch sigma < 10 fails the whole feature (no candidate ever accepted).
    """
    F, H, W = corr.shape
    uu = jnp.arange(W, dtype=jnp.float64)[None, :]
    vv = jnp.arange(H, dtype=jnp.float64)[:, None]

    def per_feature(corr_f, sd0_f, h_f, sinv_f):
        a, b, c = sinv_f[0, 0], sinv_f[0, 1], sinv_f[1, 1]
        halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
        halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
        ucentre = jnp.floor(h_f[0] + 0.5).astype(jnp.int32)
        vcentre = jnp.floor(h_f[1] + 0.5).astype(jnp.int32)
        urel = uu - ucentre
        vrel = vv - vcentre
        box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
        ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
        mask = box & ellipse & valid & (sd_image >= corr_sigma_thresh) & (
            sd0_f >= corr_sigma_thresh
        )
        best, u, v = _masked_min_last_tie(corr_f, mask)
        return best, u, v

    best, u, v = jax.vmap(per_feature)(corr, sd_patch, h_centre, sinv)
    found = active & (best <= corr_thresh2)
    return SearchResult(found=found, u=u, v=v, best=best)


def multi_ellipse_search(
    corr: jnp.ndarray,      # [H,W] correlation map for ONE patch (f64)
    sd_image: jnp.ndarray,  # [H,W]
    valid: jnp.ndarray,     # [H,W]
    h_centres: jnp.ndarray, # [P,2] per-particle predicted positions
    sinv: jnp.ndarray,      # [P,2,2]
    alive: jnp.ndarray,     # [P] bool
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    corr_sigma_thresh: float = 10.0,
    low_sigma_penalty: float = 5.0,
):
    """SearchMultipleOverlappingEllipses for one particle cloud.

    Differences from the single-feature search, matching the reference:
      - low image sigma adds +5.0 to the score instead of skipping
      - no patch-sigma gate
      - the ellipse centre uses plain int truncation (int(c), NOT int(c+0.5))
        — search_multiple_overlapping_ellipses.cpp:126-127.
    Returns (found [P], u [P], v [P]).
    """
    P = h_centres.shape[0]
    H, W = corr.shape
    corr_pen = jnp.where(sd_image < corr_sigma_thresh, corr + low_sigma_penalty, corr)
    uu = jnp.arange(W, dtype=jnp.float64)[None, :]
    vv = jnp.arange(H, dtype=jnp.float64)[:, None]

    def per_particle(h_p, sinv_p):
        a, b, c = sinv_p[0, 0], sinv_p[0, 1], sinv_p[1, 1]
        halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
        halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
        # int truncation toward zero of the (positive) centre coordinates
        ucentre = jnp.trunc(h_p[0]).astype(jnp.int32)
        vcentre = jnp.trunc(h_p[1]).astype(jnp.int32)
        urel = uu - ucentre
        vrel = vv - vcentre
        box = (jnp.abs(urel) <= halfwidth) & (jnp.abs(vrel) <= halfheight)
        ellipse = a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel < no_sigma * no_sigma
        mask = box & ellipse & valid
        best, u, v = _masked_min_last_tie(corr_pen, mask)
        return best, u, v

    best, u, v = jax.vmap(per_particle)(h_centres, sinv)
    found = alive & (best <= corr_thresh2)
    return found, u, v
