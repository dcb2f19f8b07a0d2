"""Batched particle-cloud search as one Pallas TPU kernel.

The batch-mode (vmapped) step's particle search was the single largest op in
the 64-lane scan: the dense XLA form reduces the ENTIRE [H,W] score map once
per particle (masked min + tie key), ~6 ms of an 11 ms iteration at 64 lanes
x 100 particles (scripts/profile_batch.py trace). The union-box ladder that
fixes this single-stream is built from lax.conds, which a vmapped lane axis
turns into run-every-rung selects — useless there.

This kernel keeps the per-slot score map VMEM-resident (one grid step per
slot; an outer vmap adds the lane grid dim) and scans, per particle, only an
(8,128)-aligned sub-block around the particle's EFFECTIVE region — the
intersection of its clamped search window and its ellipse bounding box,
precomputed host-graph-side — never the whole map. An in-kernel scalar-core
ladder picks the cheapest covering block: (SHORT,128) for converged
ellipses, (SHORT,BW), then (TALL,BW). Decisions are bit-equal to
correlate.multi_ellipse_search_dense: every block covers the particle's full
masked candidate set by construction, the mask arithmetic is identical, and
min / last-tie-key max are comparison-based (order-independent). Verified by
tests/test_pallas_particle_search.py.

Reference semantics: SearchMultipleOverlappingEllipses
(improc/search_multiple_overlapping_ellipses.cpp:106-196) with the
framework's documented static window cap (docs/PARITY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(iref, fref, img_ref, out_ref, *, P, H, BH, BW, SH, pad_h, pad_w,
            no_sigma):
    """iref (SMEM [1,P,8] i32): 0:uc 1:vc 2:v_lo 3:v_hi 4:u_lo 5:u_hi
    6:alive. fref (SMEM [1,P,8] f32): 0:a 1:b 2:c (S^-1 entries).
    img_ref (VMEM [1, pad_h, pad_w] f32): the slot's penalized score map.
    out_ref (VMEM [1, 2, n_rows, 128] f32): [0] = best, [1] = tie key (f32)
    for particle k at (k // 128, k % 128)."""
    n_rows = out_ref.shape[2]
    big = jnp.float32(1e6)

    def scan_block(p, v0a, u0a, bh: int, bw: int):
        """Masked min + last-tie key over the aligned (bh, bw) block."""
        sub = img_ref[0, pl.ds(v0a, bh), pl.ds(u0a, bw)]
        uc = iref[0, p, 0]
        vc = iref[0, p, 1]
        v_lo = iref[0, p, 2]
        v_hi = iref[0, p, 3]
        u_lo = iref[0, p, 4]
        u_hi = iref[0, p, 5]
        a = fref[0, p, 0]
        b = fref[0, p, 1]
        c = fref[0, p, 2]
        uu = u0a + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        vv = v0a + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        urel = (uu - uc).astype(jnp.float32)
        vrel = (vv - vc).astype(jnp.float32)
        inb = (uu >= u_lo) & (uu < u_hi) & (vv >= v_lo) & (vv < v_hi)
        ell = (a * urel * urel + 2.0 * b * urel * vrel + c * vrel * vrel) < (
            no_sigma * no_sigma
        )
        mask = inb & ell
        vals = jnp.where(mask, sub, big)
        best = jnp.min(vals)
        key = uu * jnp.int32(H) + vv
        tie = (vals == best) & mask
        kbest = jnp.max(jnp.where(tie, key, -1))
        return best, kbest

    def body(p, carry):
        best_rows, key_rows = carry
        v_lo = iref[0, p, 2]
        v_hi = iref[0, p, 3]
        u_lo = iref[0, p, 4]
        u_hi = iref[0, p, 5]
        v_loa_s = jnp.clip((v_lo // 8) * 8, 0, pad_h - SH)
        v_loa_t = jnp.clip((v_lo // 8) * 8, 0, pad_h - BH)
        u0a = jnp.clip((u_lo // 128) * 128, 0, pad_w - BW)
        u0n = jnp.clip((u_lo // 128) * 128, 0, pad_w - 128)
        fits_v = (v_hi - v_loa_s <= SH) & (v_loa_s <= v_lo)
        fits_u = (u_hi - u0n <= 128) & (u0n <= u_lo)

        def narrow(_):
            return scan_block(
                p, pl.multiple_of(v_loa_s, 8), pl.multiple_of(u0n, 128), SH, 128
            )

        def short_case(_):
            return scan_block(
                p, pl.multiple_of(v_loa_s, 8), pl.multiple_of(u0a, 128), SH, BW
            )

        def tall_case(_):
            return scan_block(
                p, pl.multiple_of(v_loa_t, 8), pl.multiple_of(u0a, 128), BH, BW
            )

        best, kbest = jax.lax.cond(
            fits_v & fits_u,
            narrow,
            lambda _: jax.lax.cond(fits_v, short_case, tall_case, None),
            None,
        )
        alive = iref[0, p, 6] != 0
        best = jnp.where(alive, best, big)
        kbest = jnp.where(alive, kbest, -1)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
        hit = (lanes == p % 128) & (rows == p // 128)
        best_rows = jnp.where(hit, best, best_rows)
        key_rows = jnp.where(hit, kbest.astype(jnp.float32), key_rows)
        return best_rows, key_rows

    init = (
        jnp.full((n_rows, 128), big, jnp.float32),
        jnp.full((n_rows, 128), -1.0, jnp.float32),
    )
    best_rows, key_rows = jax.lax.fori_loop(0, P, body, init)
    out_ref[0, 0] = best_rows
    out_ref[0, 1] = key_rows


@functools.partial(
    jax.jit,
    static_argnames=("win_radius", "no_sigma", "corr_thresh2", "interpret"),
)
def pallas_multi_ellipse_search(
    corr_maps: jnp.ndarray,    # [F,H,W] penalized score maps (f32)
    h_centres: jnp.ndarray,    # [F,P,2]
    sinv: jnp.ndarray,         # [F,P,2,2]
    alive: jnp.ndarray,        # [F,P]
    win_radius: int = 32,
    no_sigma: float = 3.0,
    corr_thresh2: float = 0.40,
    interpret: bool | None = None,
):
    """Drop-in for correlate.multi_ellipse_search_dense (same returns:
    found/u/v/overflow, each [F,P]) with per-particle aligned-block scans."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F, H, W = corr_maps.shape
    P = h_centres.shape[1]
    side_u = min(2 * win_radius + 1, W)
    side_v = min(2 * win_radius + 1, H)

    # same per-particle geometry as the dense form
    uc = jnp.trunc(h_centres[..., 0]).astype(jnp.int32)
    vc = jnp.trunc(h_centres[..., 1]).astype(jnp.int32)
    a = sinv[..., 0, 0].astype(jnp.float32)
    b = sinv[..., 0, 1].astype(jnp.float32)
    c = sinv[..., 1, 1].astype(jnp.float32)
    halfwidth = jnp.floor(no_sigma / jnp.sqrt(a - b * b / c)).astype(jnp.int32)
    halfheight = jnp.floor(no_sigma / jnp.sqrt(c - b * b / a)).astype(jnp.int32)
    u0 = jnp.clip(uc - win_radius, 0, W - side_u)
    v0 = jnp.clip(vc - win_radius, 0, H - side_v)
    over = (halfwidth > win_radius) | (halfheight > win_radius)

    # effective candidate region = window INTERSECT ellipse bounding box;
    # the dense form's in_win & box mask passes exactly the pixels in
    # [v_lo,v_hi) x [u_lo,u_hi) (may be empty)
    v_lo = jnp.maximum(v0, vc - halfheight)
    v_hi = jnp.minimum(v0 + side_v, vc + halfheight + 1)
    u_lo = jnp.maximum(u0, uc - halfwidth)
    u_hi = jnp.minimum(u0 + side_u, uc + halfwidth + 1)

    # block geometry: TALL rows cover any effective v-range after 8-align
    # round-down (its span <= side_v); BW lanes cover any u-range after
    # 128-align round-down
    BH = min(_round_up(side_v + 7, 8), _round_up(H, 8))
    SH = min(24, BH)                       # short block for converged rows
    BW = min(_round_up(side_u + 127, 128), _round_up(W, 128))
    pad_h = max(_round_up(H, 8), BH)
    u0a_max = max(((W - side_u) // 128) * 128, 0)
    pad_w = max(_round_up(W, 128), u0a_max + BW, BW)

    maps = jnp.pad(
        corr_maps.astype(jnp.float32),
        ((0, 0), (0, pad_h - H), (0, pad_w - W)),
        constant_values=1e6,
    )
    zi = jnp.zeros_like(uc)
    iargs = jnp.stack(
        [uc, vc, v_lo, v_hi, u_lo, u_hi, alive.astype(jnp.int32), zi],
        axis=-1,
    )                                       # [F,P,8] i32
    zf = jnp.zeros_like(a)
    fargs = jnp.stack([a, b, c, zf, zf, zf, zf, zf], axis=-1)   # [F,P,8] f32

    n_rows = -(-P // 128)
    kernel = functools.partial(
        _kernel, P=P, H=H, BH=BH, BW=BW, SH=SH, pad_h=pad_h, pad_w=pad_w,
        no_sigma=no_sigma,
    )
    out = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, P, 8), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, 8), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, pad_h, pad_w), lambda f: (f, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, n_rows, 128), lambda f: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, 2, n_rows, 128), jnp.float32),
        interpret=interpret,
    )(iargs, fargs, maps)

    best = out[:, 0].reshape(F, n_rows * 128)[:, :P]
    kbest = out[:, 1].reshape(F, n_rows * 128)[:, :P].astype(jnp.int32)
    found = alive & (best <= corr_thresh2)
    return found, kbest // H, kbest % H, over & alive
