"""Fused full-image penalized NSSD score map as one Pallas TPU kernel.

The XLA fast-mode path builds each partial-feature score map from ~140
separate [H,W] passes (121 partially-fused shifted cross-correlation FMAs,
two reduce_window box sums, and the NSSD formula chain) — profiled at
~60us/frame at 320x240 on v5e (4x that at 640x480), almost all of it HBM
round-trips between micro-fusions. This kernel does box sums, patch
cross-correlation, the NSSD score, the low-sigma penalty and the
centre-validity mask in a single fused pass.

The grid runs over (patch, row-band): each step reads an 8-aligned
(BAND+16)-row input block (Element-indexed, auto double-buffered) and
writes one BAND-row output block, so peak VMEM stays ~2MB at any image
size (the whole-frame variant kept ~26 frame-sized temporaries live and
blew the 16MB scoped-vmem limit at 640x480).

Bit-exactness: all integer sums (Sg1, Sg1sq, Sg0g1) are exact in f32
(values < 2^24), and the f32 score formula mirrors correlate.nssd_score op
for op, so the output map is bit-identical to the XLA fast-mode map —
verified by tests/test_pallas_search.py. Reference semantics:
improc.cpp:55-134 + search_multiple_overlapping_ellipses.h:56 (+5
low-sigma penalty, no skip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BAND = 64          # output rows per grid step
_HALO = 16          # extra input rows (8-aligned slack + boxsize-1 lookahead)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def nssd_corr_f32(sg0, sg0sq, sg1, sg1sq, cross, n):
    """f32 NSSD score, op-for-op as correlate.nssd_score (improc.cpp:55-134)
    incl. the 0/1 zero-variance specials. Shared by the score-map kernels and
    the fused selected-feature search; bit-identical to the XLA f32 form on
    TPU (verified on hardware)."""
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
    corr = jnp.where((sd0 != 0.0) & (sd1 != 0.0), corr,
                     jnp.where(both_zero, 0.0, 1.0))
    return corr, sd0, sd1


def _score_map_kernel(st_ref, smem_ref, img_ref, out_ref, *, B, H, W, pad_w,
                      corr_sigma_thresh, low_sigma_penalty, in_rows, n_bands):
    """st_ref (scalar prefetch [n_bands] i32): per-band 8-aligned input start
    rows. smem_ref (SMEM [1,1,128]): lanes 0..B*B-1 patch row-major, B*B =
    Sg0, B*B+1 = Sg0sq. img_ref (VMEM [in_rows, pad_w]) f32 rows around this
    band, zero-padded. out_ref (VMEM [1, BAND, pad_w]) centre-indexed
    penalized scores for this band."""
    n = float(B * B)
    half = (B - 1) // 2
    band = pl.program_id(1)
    o0 = band * _BAND
    in_start = st_ref[band]
    img = img_ref[...]
    img2 = img * img

    # top-left-indexed sums via rolls: out[i] = x[i+d] == roll(x, n-d)
    def shift0(x, dy):
        return x if dy == 0 else pltpu.roll(x, in_rows - dy, 0)

    def shift1(x, dx):
        return x if dx == 0 else pltpu.roll(x, pad_w - dx, 1)

    colsum = img
    colsum2 = img2
    for dy in range(1, B):
        colsum = colsum + shift0(img, dy)
        colsum2 = colsum2 + shift0(img2, dy)

    sg1 = colsum
    sg1sq = colsum2
    for dx in range(1, B):
        sg1 = sg1 + shift1(colsum, dx)
        sg1sq = sg1sq + shift1(colsum2, dx)

    # cross-correlation: dx-outer keeps lane rolls to B-1; the B*(B-1)
    # sublane rolls are cheap VPU shuffles
    cross = jnp.zeros_like(img)
    for dx in range(B):
        t = smem_ref[0, 0, dx] * img
        for dy in range(1, B):
            t = t + smem_ref[0, 0, dy * B + dx] * shift0(img, dy)
        cross = cross + shift1(t, dx)

    # local row of tl for output row j (absolute v = o0+j):
    # tl_local[(o0 - in_start - half) + j] -> dynamic roll + slice
    dv = o0 - in_start
    shift = (half - dv) % in_rows              # roll(x, s)[i] = x[i - s]

    def band_rows(x):
        return pltpu.roll(pltpu.roll(x, shift, 0)[:_BAND, :], half, 1)

    sg1 = band_rows(sg1)
    sg1sq = band_rows(sg1sq)
    cross = band_rows(cross)

    sg0 = smem_ref[0, 0, B * B]
    sg0sq = smem_ref[0, 0, B * B + 1]

    corr, sd0, sd1 = nssd_corr_f32(sg0, sg0sq, sg1, sg1sq, cross, n)

    # low image-sigma penalty (search_multiple_overlapping_ellipses.h:56) and
    # 1e6 at invalid centres, exactly as correlate.penalized_score_map
    corr = jnp.where(sd1 < corr_sigma_thresh, corr + low_sigma_penalty, corr)
    uu = jax.lax.broadcasted_iota(jnp.int32, (_BAND, pad_w), 1)
    vv = o0 + jax.lax.broadcasted_iota(jnp.int32, (_BAND, pad_w), 0)
    valid = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    out_ref[0] = jnp.where(valid, corr, 1e6)


def _score_map_kernel_whole(smem_ref, img_ref, out_ref, *, B, H, W, pad_h,
                            pad_w, corr_sigma_thresh, low_sigma_penalty):
    """Whole-frame variant (no banding): cheaper per frame when the ~26
    frame-sized temporaries Mosaic keeps live fit VMEM (measured 1.70ms vs
    2.13ms per 154 heavy frames at 320x240); the banded kernel takes over
    above ~150k pixels where this one blows the 16MB scoped-vmem limit."""
    n = float(B * B)
    half = (B - 1) // 2
    img = img_ref[...]
    img2 = img * img

    def shift0(x, dy):
        return x if dy == 0 else pltpu.roll(x, pad_h - dy, 0)

    def shift1(x, dx):
        return x if dx == 0 else pltpu.roll(x, pad_w - dx, 1)

    colsum = img
    colsum2 = img2
    for dy in range(1, B):
        colsum = colsum + shift0(img, dy)
        colsum2 = colsum2 + shift0(img2, dy)

    sg1 = colsum
    sg1sq = colsum2
    for dx in range(1, B):
        sg1 = sg1 + shift1(colsum, dx)
        sg1sq = sg1sq + shift1(colsum2, dx)

    cross = jnp.zeros_like(img)
    for dx in range(B):
        t = smem_ref[0, 0, dx] * img
        for dy in range(1, B):
            t = t + smem_ref[0, 0, dy * B + dx] * shift0(img, dy)
        cross = cross + shift1(t, dx)

    def centre(x):
        return pltpu.roll(pltpu.roll(x, half, 0), half, 1)

    sg1 = centre(sg1)
    sg1sq = centre(sg1sq)
    cross = centre(cross)

    sg0 = smem_ref[0, 0, B * B]
    sg0sq = smem_ref[0, 0, B * B + 1]

    corr, sd0, sd1 = nssd_corr_f32(sg0, sg0sq, sg1, sg1sq, cross, n)

    corr = jnp.where(sd1 < corr_sigma_thresh, corr + low_sigma_penalty, corr)
    uu = jax.lax.broadcasted_iota(jnp.int32, (pad_h, pad_w), 1)
    vv = jax.lax.broadcasted_iota(jnp.int32, (pad_h, pad_w), 0)
    valid = (uu >= half) & (uu <= W - 1 - half) & (vv >= half) & (vv <= H - 1 - half)
    out_ref[0] = jnp.where(valid, corr, 1e6)


@functools.partial(
    jax.jit,
    static_argnames=("boxsize", "corr_sigma_thresh", "low_sigma_penalty",
                     "interpret", "force_banded", "return_padded"),
)
def pallas_score_maps(
    frame_u8: jnp.ndarray,     # [H,W]
    patches_u8: jnp.ndarray,   # [F,B,B]; ignored when patch_rows given
    boxsize: int = 11,
    corr_sigma_thresh: float = 10.0,
    low_sigma_penalty: float = 5.0,
    interpret: bool | None = None,
    force_banded: bool = False,
    patch_rows: jnp.ndarray | None = None,  # [F,128] precomputed SMEM rows
                                            # (state.patch_row layout)
    img_f32: jnp.ndarray | None = None,     # shared padded f32 frame (>= the
                                            # pad this wrapper would build)
    return_padded: bool = False,            # skip the [:H,:W] slice (cells
                                            # beyond H/W hold 1e6, never read
                                            # by the masked consumers)
) -> jnp.ndarray:
    """Penalized NSSD score map for every patch: [F,H,W] f32."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    H, W = frame_u8.shape
    B = boxsize
    assert B * B + 2 <= 128, "patch stats must fit one SMEM row"
    pad_w = _round_up(W, 128)

    if patch_rows is not None:
        F = patch_rows.shape[0]
        smem = patch_rows[:, None, :]
    else:
        F = patches_u8.shape[0]
        p32 = patches_u8.astype(jnp.int32)
        sg0 = p32.sum(axis=(1, 2)).astype(jnp.float32)
        sg0sq = (p32 * p32).sum(axis=(1, 2)).astype(jnp.float32)
        smem = jnp.zeros((F, 1, 128), jnp.float32)
        smem = smem.at[:, 0, : B * B].set(patches_u8.reshape(F, -1).astype(jnp.float32))
        smem = smem.at[:, 0, B * B].set(sg0)
        smem = smem.at[:, 0, B * B + 1].set(sg0sq)

    # whole-frame kernel while its ~26 live temporaries fit scoped VMEM
    # (15MB/26 per buffer); banded (BAND+16-row blocks) above that
    if not force_banded and _round_up(H, 8) * pad_w * 4 * 26 < 15_000_000:
        if img_f32 is not None:
            # shared padded frame (possibly taller/wider than this wrapper
            # would build — the kernel's H/W validity mask is unaffected,
            # and the rolls wrap over zero padding that never enters a
            # valid centre's window)
            img = img_f32
            pad_hw, pad_ww = img.shape
            assert pad_hw >= _round_up(H, 8) and pad_ww >= pad_w
        else:
            pad_hw = _round_up(H, 8)
            pad_ww = pad_w
            img = jnp.pad(frame_u8.astype(jnp.float32), ((0, pad_hw - H), (0, pad_ww - W)))
        kernel = functools.partial(
            _score_map_kernel_whole,
            B=B, H=H, W=W, pad_h=pad_hw, pad_w=pad_ww,
            corr_sigma_thresh=corr_sigma_thresh,
            low_sigma_penalty=low_sigma_penalty,
        )
        out = pl.pallas_call(
            kernel,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, 1, 128), lambda f: (f, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((pad_hw, pad_ww), lambda f: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, pad_hw, pad_ww), lambda f: (f, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((F, pad_hw, pad_ww), jnp.float32),
            interpret=interpret,
        )(smem, img)
        return out if return_padded else out[:, :H, :W]

    n_bands = -(-H // _BAND)
    in_rows = _BAND + _HALO
    pad_h = max(_round_up(H, 8), in_rows, (n_bands - 1) * _BAND - 8 + in_rows)
    img = jnp.pad(frame_u8.astype(jnp.float32), ((0, pad_h - H), (0, pad_w - W)))
    # per-band 8-aligned input start rows (static table)
    starts = [min(max(b * _BAND - 8, 0), pad_h - in_rows) for b in range(n_bands)]
    starts_j = jnp.asarray(starts, jnp.int32)

    kernel = functools.partial(
        _score_map_kernel,
        B=B, H=H, W=W, pad_w=pad_w,
        corr_sigma_thresh=corr_sigma_thresh, low_sigma_penalty=low_sigma_penalty,
        in_rows=in_rows, n_bands=n_bands,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda f, b, st: (f, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(in_rows), pl.Element(pad_w)),
                lambda f, b, st: (pl.multiple_of(st[b], 8), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, _BAND, pad_w), lambda f, b, st: (f, b, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, n_bands * _BAND, pad_w), jnp.float32),
        interpret=interpret,
    )(starts_j, smem, img)
    return out if return_padded else out[:, :H, :W]
