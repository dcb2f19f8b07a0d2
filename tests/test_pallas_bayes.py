"""Lane-parallel Bayes/prune/moments kernel vs the XLA reference block
(interpret mode on CPU; f32 tolerances — the kernel is fast-mode only)."""

import numpy as np
import jax.numpy as jnp

from scenelib2_tpu.kernels.pallas_bayes import pallas_bayes_update

import pytest

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow; deselect with -m 'not pallas'


def _xla_reference(prob_c, lam_c, palive_c, found, p_over, z, hpi, sinv, dets,
                   making, pmask, ma, prune=0.05, sd_ratio=0.3, min_part=4,
                   erase_after=10):
    """f64 NumPy transcription of the step.py XLA block."""
    nu = z - hpi
    quad = np.einsum("fpi,fpij,fpj->fp", nu, sinv, nu)
    gauss = (1.0 / np.sqrt(2.0 * np.pi * dets)) * np.exp(-0.5 * quad)
    likelihood = np.where(found, gauss, np.where(p_over, 1.0, 0.0))
    upd = making[:, None] & palive_c
    prob = np.where(upd, prob_c * likelihood, prob_c)
    total = np.sum(np.where(palive_c, prob, 0.0), axis=1)
    all_zero = making & (total == 0.0)
    safe_total = np.where(total > 0.0, total, 1.0)
    prob_n = np.where(making[:, None], prob / safe_total[:, None], prob)
    n_alive = np.sum(palive_c, axis=1)
    thresh = prune / np.maximum(n_alive, 1)
    keep = palive_c & ~(making[:, None] & (prob_n < thresh[:, None]))
    prob_k = np.where(keep, prob_n, 0.0)
    total2 = np.sum(prob_k, axis=1)
    prob_f = np.where(
        making[:, None] & (total2[:, None] > 0.0),
        prob_k / np.where(total2 > 0, total2, 1.0)[:, None],
        prob_k,
    )
    palive_f = np.where(making[:, None], keep, palive_c)
    n_alive_f = np.sum(palive_f, axis=1)
    mean = np.sum(lam_c * prob_f, axis=1)
    exp2 = np.sum(lam_c * lam_c * prob_f, axis=1)
    cov = exp2 - mean * mean
    with np.errstate(all="ignore"):
        ratio = np.sqrt(cov) / mean
    convert = making & ~all_zero & (ratio < sd_ratio) & (n_alive_f > min_part)
    sell_by = pmask & ~convert & ((ma > erase_after) | (n_alive_f <= min_part))
    kill = all_zero | sell_by
    return prob_f, palive_f.astype(bool), mean, cov, convert, kill


def _scenario(rng, F=2, NP=40, mostly_found=True):
    prob = rng.uniform(0.0, 1.0, (F, NP))
    prob /= prob.sum(axis=1, keepdims=True)
    lam = np.tile(np.linspace(0.5, 5.0, NP), (F, 1))
    palive = rng.uniform(size=(F, NP)) > 0.2
    found = (rng.uniform(size=(F, NP)) > (0.2 if mostly_found else 0.95)) & palive
    p_over = (rng.uniform(size=(F, NP)) > 0.9) & ~found
    hpi = rng.uniform(20, 200, (F, NP, 2))
    z = hpi + rng.normal(0, 1.5, (F, NP, 2))
    sinv = np.zeros((F, NP, 2, 2))
    for f in range(F):
        for p in range(NP):
            a, c = rng.uniform(0.05, 0.5, 2)
            b = rng.uniform(-0.5, 0.5) * np.sqrt(a * c)
            sinv[f, p] = [[a, b], [b, c]]
    dets = 1.0 / (sinv[..., 0, 0] * sinv[..., 1, 1] - sinv[..., 0, 1] ** 2)
    making = np.array([True, False])[:F]
    pmask = np.ones(F, bool)
    ma = np.array([3, 12])[:F]
    return prob, lam, palive, found, p_over, z, hpi, sinv, dets, making, pmask, ma


def test_bayes_kernel_matches_xla_block(rng):
    args = _scenario(rng)
    want = _xla_reference(*args)
    got = pallas_bayes_update(
        *[jnp.asarray(a) for a in args],
        prune_prob_thresh=0.05, sd_depth_ratio=0.3, min_particles=4,
        erase_partial_after_attempts=10, interpret=True,
    )
    prob_f, palive_f, mean, cov, convert, kill, n_over = got
    np.testing.assert_allclose(np.asarray(prob_f), want[0], rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(palive_f), want[1])
    np.testing.assert_allclose(np.asarray(mean), want[2], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), want[3], rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(convert), want[4])
    np.testing.assert_array_equal(np.asarray(kill), want[5])
    assert int(np.asarray(n_over).sum()) == int(args[4].sum())


def test_bayes_kernel_all_zero_likelihood(rng):
    """No matches anywhere -> total == 0 -> the slot is marked for deletion
    (monoslam.cpp:1486-1493)."""
    args = list(_scenario(rng, F=1, NP=24, mostly_found=False))
    args[3] = np.zeros_like(args[3])           # found: none
    args[4] = np.zeros_like(args[4])           # no overflow either
    want = _xla_reference(*args)
    got = pallas_bayes_update(
        *[jnp.asarray(a) for a in args],
        prune_prob_thresh=0.05, sd_depth_ratio=0.3, min_particles=4,
        erase_partial_after_attempts=10, interpret=True,
    )
    assert bool(got[5][0]) and bool(want[5][0])        # kill
    assert not bool(got[4][0])                          # no convert


def test_bayes_kernel_pred_rows_input_equivalent(rng):
    """The pred_rows fast path (raw particle-predict kernel rows passed
    verbatim) must produce identical results to the unpacked-argument
    form."""
    args = _scenario(rng)
    prob, lam, palive, found, p_over, z, hpi, sinv, dets, making, pmask, ma = args
    F, NP = prob.shape
    NP_pad = max(((NP + 127) // 128) * 128, 128)
    raw = np.zeros((F, 8, NP_pad), np.float32)
    raw[:, 0, :NP] = hpi[..., 0]
    raw[:, 1, :NP] = hpi[..., 1]
    raw[:, 2, :NP] = sinv[..., 0, 0]
    raw[:, 3, :NP] = sinv[..., 0, 1]
    raw[:, 4, :NP] = sinv[..., 1, 1]
    raw[:, 5, :NP] = dets
    # finite garbage in the padding lanes (the real kernel pads with lam=1
    # results, not zeros) — outputs must not depend on them
    raw[:, :, NP:] = 7.25

    kw = dict(prune_prob_thresh=0.05, sd_depth_ratio=0.3, min_particles=4,
              erase_partial_after_attempts=10, interpret=True)
    base = pallas_bayes_update(*[jnp.asarray(a) for a in args], **kw)
    fast = pallas_bayes_update(
        *[jnp.asarray(a) for a in args], pred_rows=jnp.asarray(raw), **kw
    )
    for b, f in zip(base, fast):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(f))
