"""Particle-weight Bayes update + prune + depth moments as ONE Pallas kernel.

After the particle search returns per-particle matches, the reference updates
each depth particle's probability with a Gaussian innovation likelihood,
renormalises, prunes low-weight particles, renormalises again, and takes the
weighted mean/variance of lambda to decide ray->point conversion and sell-by
deletion (monoslam.cpp:1446-1517, feature_init_info.cpp:99-174).

As XLA ops this is ~45 [1,NP]-shaped micro-fusions (~0.2-0.4us each of pure
dispatch on TPU). Here the whole chain runs lane-parallel in one kernel:
particles on vector lanes, six lane reductions, scalars out via lane masks.
f32 fast-mode only; the f64 parity path keeps the XLA form (Mosaic has no
f64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# input row layout ([F, 13, NP_pad]); when fed pred_rows (the raw
# particle-predict kernel output) the block is [F, 15, NP_pad] with rows
# 13-14 = HW, HH window half-sizes, which this kernel ignores
(_PROB, _LAM, _ALIVE, _FOUND, _OVER, _ZU, _ZV, _HU, _HV,
 _S00, _S01, _S11, _DET) = range(13)
_NROWS = 13

# output row layout ([F, 8, NP_pad]): rows 0/1 are per-particle, row 2 holds
# scalars in lanes 0..5
ROW_PROB, ROW_ALIVE, ROW_SCAL = 0, 1, 2
(LANE_MEAN, LANE_COV, LANE_CONVERT, LANE_ALLZERO, LANE_KILL, LANE_NOVER) = range(6)


def _bayes_tail(*, prob_c, lam, palive, found, p_over, zu, zv, hu, hv,
                a, b, c, det, making, pmask, match_attempts, valid, lane,
                zero, NP_pad, prune_prob_thresh, sd_depth_ratio,
                min_particles, erase_partial_after_attempts):
    """Likelihood -> Bayes -> prune -> moments -> decisions on lane vectors.

    Shared between _bayes_kernel and the fused search+bayes kernel
    (pallas_search_bayes.py) so both paths are literally the same code.
    Returns (prob_f [NP_pad], palive_f bool [NP_pad], scal [NP_pad] with the
    LANE_* scalar layout)."""

    def vec(s):
        return zero + s

    # Gaussian innovation likelihood (monoslam.cpp:1459-1462); overflowed
    # unsearched particles keep their prior (step.py policy)
    nu_u = zu - hu
    nu_v = zv - hv
    quad = a * nu_u * nu_u + 2.0 * b * nu_u * nu_v + c * nu_v * nu_v
    gauss = (1.0 / jnp.sqrt(2.0 * jnp.pi * det)) * jnp.exp(-0.5 * quad)
    likelihood = jnp.where(found, gauss, jnp.where(p_over, 1.0, 0.0))

    upd = making & palive
    prob = jnp.where(upd, prob_c * likelihood, prob_c)

    total = vec(jnp.sum(jnp.where(palive, prob, zero)))
    all_zero = making & (total == 0.0)
    safe_total = jnp.where(total > 0.0, total, 1.0)
    prob_n = jnp.where(making, prob / safe_total, prob)

    # prune below thresh/N then renormalise (feature_init_info.cpp:128-144)
    n_alive = vec(jnp.sum(jnp.where(palive, zero + 1.0, zero)))
    thresh = prune_prob_thresh / jnp.maximum(n_alive, 1.0)
    keep = palive & ~(making & (prob_n < thresh))
    prob_k = jnp.where(keep, prob_n, zero)
    total2 = vec(jnp.sum(prob_k))
    prob_f = jnp.where(
        making & (total2 > 0.0), prob_k / jnp.where(total2 > 0.0, total2, 1.0), prob_k
    )
    palive_f = (making & keep) | (~making & palive)  # i1 select is illegal in Mosaic
    n_alive_f = vec(jnp.sum(jnp.where(palive_f, zero + 1.0, zero)))

    # weighted lambda moments (feature_init_info.cpp:154-174)
    mean = vec(jnp.sum(lam * prob_f))
    exp2 = vec(jnp.sum(lam * lam * prob_f))
    cov = exp2 - mean * mean

    ratio = jnp.sqrt(cov) / mean
    convert = (
        making & ~all_zero & (ratio < sd_depth_ratio)
        & (n_alive_f > float(min_particles))
    )
    sell_by = (
        pmask & ~convert
        & (
            (match_attempts > float(erase_partial_after_attempts))
            | (n_alive_f <= float(min_particles))
        )
    )
    kill = all_zero | sell_by
    n_over = vec(jnp.sum(jnp.where(p_over & valid, zero + 1.0, zero)))

    def sel(x):
        return jnp.where(x, zero + 1.0, zero)

    scal = (
        jnp.where(lane == LANE_MEAN, mean, zero)
        + jnp.where(lane == LANE_COV, cov, zero)
        + jnp.where(lane == LANE_CONVERT, sel(convert), zero)
        + jnp.where(lane == LANE_ALLZERO, sel(all_zero), zero)
        + jnp.where(lane == LANE_KILL, sel(kill), zero)
        + jnp.where(lane == LANE_NOVER, n_over, zero)
    )
    return prob_f, palive_f, scal


def _bayes_kernel(smem_ref, in_ref, out_ref, *, NP, NP_pad,
                  prune_prob_thresh, sd_depth_ratio, min_particles,
                  erase_partial_after_attempts):
    """smem_ref (SMEM [1,1,128]): lane 0 = making, 1 = pmask,
    2 = match_attempts (post-increment). in_ref (VMEM [1,13,NP_pad]; or
    [1,15,NP_pad] in the pred_rows form, whose trailing HW/HH rows are
    unused here). out_ref (VMEM [1,8,NP_pad])."""
    # Mosaic cannot legalize selects with scalar predicates/operands on the
    # vector path, so every scalar (SMEM params, lane reductions) is
    # broadcast to an [NP_pad] vector before use.
    lane = jax.lax.broadcasted_iota(jnp.int32, (NP_pad,), 0)
    zero = jnp.zeros((NP_pad,), jnp.float32)

    def vec(s):
        return zero + s

    valid = lane < NP

    def row(i):
        return in_ref[0, i, :]

    prob_f, palive_f, scal = _bayes_tail(
        prob_c=row(_PROB), lam=row(_LAM), palive=(row(_ALIVE) > 0.0) & valid,
        found=row(_FOUND) > 0.0, p_over=row(_OVER) > 0.0,
        zu=row(_ZU), zv=row(_ZV), hu=row(_HU), hv=row(_HV),
        a=row(_S00), b=row(_S01), c=row(_S11), det=row(_DET),
        making=vec(smem_ref[0, 0, 0]) > 0.0,
        pmask=vec(smem_ref[0, 0, 1]) > 0.0,
        match_attempts=vec(smem_ref[0, 0, 2]),
        valid=valid, lane=lane, zero=zero, NP_pad=NP_pad,
        prune_prob_thresh=prune_prob_thresh, sd_depth_ratio=sd_depth_ratio,
        min_particles=min_particles,
        erase_partial_after_attempts=erase_partial_after_attempts,
    )

    def sel(x):
        return jnp.where(x, zero + 1.0, zero)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, NP_pad), 0)
    zeros2 = jnp.zeros((8, NP_pad), jnp.float32)
    out_ref[0] = (
        jnp.where(rowi == ROW_PROB, prob_f[None, :] + zeros2, zeros2)
        + jnp.where(rowi == ROW_ALIVE, sel(palive_f)[None, :] + zeros2, zeros2)
        + jnp.where(rowi == ROW_SCAL, scal[None, :] + zeros2, zeros2)
    )


@functools.partial(
    jax.jit,
    static_argnames=("prune_prob_thresh", "sd_depth_ratio", "min_particles",
                     "erase_partial_after_attempts", "interpret"),
)
def pallas_bayes_update(
    prob: jnp.ndarray,            # [F,NP] f32 particle probabilities
    lam: jnp.ndarray,             # [F,NP]
    palive: jnp.ndarray,          # [F,NP] bool
    found: jnp.ndarray,           # [F,NP] bool
    p_over: jnp.ndarray,          # [F,NP] bool
    z: jnp.ndarray,               # [F,NP,2]
    hpi: jnp.ndarray,             # [F,NP,2] (ignored when pred_rows given)
    sinv: jnp.ndarray,            # [F,NP,2,2] (ignored when pred_rows given)
    dets: jnp.ndarray,            # [F,NP] (ignored when pred_rows given)
    making: jnp.ndarray,          # [F] bool
    pmask: jnp.ndarray,           # [F] bool
    match_attempts: jnp.ndarray,  # [F] i32 (already incremented this frame)
    prune_prob_thresh: float = 0.05,
    sd_depth_ratio: float = 0.3,
    min_particles: int = 20,
    erase_partial_after_attempts: int = 10,
    interpret: bool | None = None,
    pred_rows: jnp.ndarray | None = None,  # [F,8,NP_pad] raw particle-predict
                                           # kernel output (HU,HV,S00,S01,
                                           # S11,DET,HW,HH) — its first six
                                           # rows ARE this kernel's
                                           # _HU.._DET layout, so it concats
                                           # straight in with no re-padding
):
    """Returns (prob_f [F,NP], palive_f [F,NP] bool, mean [F], cov [F],
    convert [F] bool, all_zero_kill... kill [F] bool, n_over [F] i32)."""
    if interpret is None:
        from scenelib2_tpu.kernels.compat import default_interpret

        interpret = default_interpret()
    F, NP = prob.shape
    NP_pad = max(_round_up(NP, 128), 128)

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, NP_pad - NP)))

    head = jnp.stack(
        [
            pad(prob), pad(lam), pad(palive), pad(found), pad(p_over),
            pad(z[..., 0]), pad(z[..., 1]),
        ],
        axis=1,
    )                                                  # [F, 7, NP_pad]
    if pred_rows is not None:
        assert pred_rows.shape[1:] == (8, NP_pad), pred_rows.shape
        rows = jnp.concatenate([head, pred_rows.astype(jnp.float32)], axis=1)
    else:
        rows = jnp.concatenate(
            [
                head,
                jnp.stack(
                    [
                        pad(hpi[..., 0]), pad(hpi[..., 1]),
                        pad(sinv[..., 0, 0]), pad(sinv[..., 0, 1]),
                        pad(sinv[..., 1, 1]), pad(dets),
                    ],
                    axis=1,
                ),
            ],
            axis=1,
        )                                              # [F, 13, NP_pad]
    nrows_in = rows.shape[1]
    smem = jnp.zeros((F, 1, 128), jnp.float32)
    smem = smem.at[:, 0, 0].set(making.astype(jnp.float32))
    smem = smem.at[:, 0, 1].set(pmask.astype(jnp.float32))
    smem = smem.at[:, 0, 2].set(match_attempts.astype(jnp.float32))

    kernel = functools.partial(
        _bayes_kernel,
        NP=NP, NP_pad=NP_pad,
        prune_prob_thresh=prune_prob_thresh, sd_depth_ratio=sd_depth_ratio,
        min_particles=min_particles,
        erase_partial_after_attempts=erase_partial_after_attempts,
    )
    out = pl.pallas_call(
        kernel,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nrows_in, NP_pad), lambda f: (f, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, NP_pad), lambda f: (f, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, 8, NP_pad), jnp.float32),
        interpret=interpret,
    )(smem, rows)

    prob_f = out[:, ROW_PROB, :NP].astype(prob.dtype)
    palive_f = out[:, ROW_ALIVE, :NP] > 0.0
    mean = out[:, ROW_SCAL, LANE_MEAN].astype(prob.dtype)
    cov = out[:, ROW_SCAL, LANE_COV].astype(prob.dtype)
    convert = out[:, ROW_SCAL, LANE_CONVERT] > 0.0
    kill = out[:, ROW_SCAL, LANE_KILL] > 0.0
    n_over = out[:, ROW_SCAL, LANE_NOVER].astype(jnp.int32)
    return prob_f, palive_f, mean, cov, convert, kill, n_over
