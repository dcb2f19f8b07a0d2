"""pallas_multi_ellipse_search vs the dense broadcast form: identical
decisions and pixels (the kernel scans aligned sub-blocks covering exactly
the same masked candidate set)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.kernels import correlate
from scenelib2_tpu.kernels.pallas_particle_search import pallas_multi_ellipse_search

pytestmark = pytest.mark.pallas


def make_case(rng, F=2, P=40, H=120, W=160, converged_frac=0.5):
    maps = rng.uniform(0.0, 2.0, size=(F, H, W)).astype(np.float32)
    # sprinkle sharp minima incl. duplicates for tie-break coverage
    for _ in range(30):
        maps[rng.integers(0, F), rng.integers(0, H), rng.integers(0, W)] = 0.05
    maps[:, 10, 10] = 0.01
    maps[:, 10, 40] = 0.01
    centres = np.stack(
        [rng.uniform(-6, W + 6, size=(F, P)), rng.uniform(-6, H + 6, size=(F, P))],
        axis=-1,
    )
    sinvs = np.zeros((F, P, 2, 2))
    for f in range(F):
        for p in range(P):
            if rng.uniform() < converged_frac:
                a, c = rng.uniform(0.5, 3.0, 2)      # tiny ellipse
            else:
                a, c = rng.uniform(0.01, 0.08, 2)    # wide (window-limited)
            b = rng.uniform(-0.5, 0.5) * np.sqrt(a * c)
            sinvs[f, p] = [[a, b], [b, c]]
    alive = rng.uniform(size=(F, P)) < 0.9
    return (
        jnp.asarray(maps),
        jnp.asarray(centres),
        jnp.asarray(sinvs),
        jnp.asarray(alive),
    )


@pytest.mark.parametrize("radius", [16, 32])
def test_matches_dense(rng, radius):
    maps, centres, sinvs, alive = make_case(rng)
    import jax

    f_d, u_d, v_d, o_d = jax.vmap(
        lambda m, h, s, al: correlate.multi_ellipse_search_dense(
            m, h, s, al, win_radius=radius
        )
    )(maps.astype(jnp.float64), centres, sinvs, alive)
    f_k, u_k, v_k, o_k = pallas_multi_ellipse_search(
        maps, centres.astype(jnp.float32), sinvs.astype(jnp.float32), alive,
        win_radius=radius,
    )
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f_d))
    np.testing.assert_array_equal(np.asarray(o_k), np.asarray(o_d))
    m = np.asarray(f_d)
    np.testing.assert_array_equal(np.asarray(u_k)[m], np.asarray(u_d)[m])
    np.testing.assert_array_equal(np.asarray(v_k)[m], np.asarray(v_d)[m])


def test_matches_dense_small_image(rng):
    maps, centres, sinvs, alive = make_case(rng, F=1, P=12, H=48, W=64)
    import jax

    f_d, u_d, v_d, o_d = jax.vmap(
        lambda m, h, s, al: correlate.multi_ellipse_search_dense(
            m, h, s, al, win_radius=32
        )
    )(maps.astype(jnp.float64), centres, sinvs, alive)
    f_k, u_k, v_k, o_k = pallas_multi_ellipse_search(
        maps, centres.astype(jnp.float32), sinvs.astype(jnp.float32), alive,
        win_radius=32,
    )
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f_d))
    m = np.asarray(f_d)
    np.testing.assert_array_equal(np.asarray(u_k)[m], np.asarray(u_d)[m])
    np.testing.assert_array_equal(np.asarray(v_k)[m], np.asarray(v_d)[m])
