"""Windowed Shi-Tomasi kernel vs the XLA windowed detector (interpret mode;
both f32-level — the kernel is fast-mode only)."""

import numpy as np
import jax.numpy as jnp

from scenelib2_tpu.kernels import shi_tomasi
from scenelib2_tpu.kernels.pallas_shi_tomasi import pallas_shi_tomasi_region

import pytest

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow; deselect with -m 'not pallas'

B = 11


def _run_case(rng, img, us, vs, RW=80, RH=60):
    H, W = img.shape
    ru, rv, ruf, rvf = shi_tomasi.clamp_region(
        jnp.asarray(us), jnp.asarray(vs), jnp.asarray(us + RW),
        jnp.asarray(vs + RH), W, H, B,
    )
    u_x, v_x, ev_x = shi_tomasi.find_best_patch_in_image_window(
        jnp.asarray(img), B, ru, rv, ruf, rvf, region_w=RW, region_h=RH
    )
    u_k, v_k, ev_k = pallas_shi_tomasi_region(
        jnp.asarray(img), ru, rv, ruf, rvf, boxsize=B, image_shape=(H, W),
        region_w=RW, region_h=RH, interpret=True,
    )
    return (int(u_x), int(v_x), float(ev_x)), (int(u_k), int(v_k), float(ev_k))


def test_shi_tomasi_kernel_matches_xla(rng):
    img = rng.integers(0, 256, size=(240, 320), dtype=np.uint8)
    for us, vs in [(40, 30), (6, 6), (230, 170), (120, 90)]:
        (u_x, v_x, ev_x), (u_k, v_k, ev_k) = _run_case(rng, img, us, vs)
        # the f64-vs-f32 eigen rounding can flip exact ties; on a random
        # texture the max is unique, so positions must agree exactly
        assert (u_k, v_k) == (u_x, v_x), (us, vs)
        np.testing.assert_allclose(ev_k, ev_x, rtol=2e-4)


def test_shi_tomasi_kernel_flat_region(rng):
    img = np.full((240, 320), 17, np.uint8)
    (u_x, v_x, ev_x), (u_k, v_k, ev_k) = _run_case(rng, img, 100, 80)
    assert ev_k == 0.0 and ev_x == 0.0
    assert (u_k, v_k) == (u_x, v_x)
