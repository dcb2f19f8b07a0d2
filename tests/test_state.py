"""SlamState covariance surgery vs a NumPy oracle of the reference block
algebra (feature.cpp ctors + conversion, monoslam.cpp delete_feature)."""

import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.config import Params
from scenelib2_tpu.core.camera import CameraParams
from scenelib2_tpu.runtime import state as st

P0 = Params(max_features=4, n_particles=10)
CAM = CameraParams.from_params(P0)
D = P0.state_dim


def make_state(rng):
    s = st.init_state(P0, rng.normal(size=13), np.eye(13) * 1e-3)
    return s


def test_init_state_shapes(rng):
    s = make_state(rng)
    assert s.x.shape == (D,)
    assert s.P.shape == (D, D)
    assert not bool(s.active.any())


def test_add_known_feature(rng):
    s = make_state(rng)
    patch = rng.integers(0, 256, size=(11, 11), dtype=np.uint8)
    s = st.add_known_feature(s, [0.1, 0.2, 0.3], np.zeros(7), patch)
    assert bool(s.active[0]) and bool(s.full[0])
    off = st.slot_offset(0)
    np.testing.assert_array_equal(np.asarray(s.x[off : off + 3]), [0.1, 0.2, 0.3])
    # zero covariance rows for the known feature
    assert np.abs(np.asarray(s.P[off : off + 6, :])).max() == 0.0
    assert int(s.next_label) == 1


def test_add_partial_feature_covariance_oracle(rng):
    """New-slot covariance rows must equal the reference partial ctor math:
    Pxy = Pxx J', Pyy = J Pxx J' + B R B', cross = J Pxj (feature.cpp:45-104)."""
    s = make_state(rng)
    # add one known feature with nonzero covariance by hand to exercise cross terms
    patch = rng.integers(0, 256, size=(11, 11), dtype=np.uint8)
    s = st.add_known_feature(s, [0.1, 0.2, 0.9], np.zeros(7), patch)
    A = rng.normal(size=(D, D)) * 0.01
    Pfull = A @ A.T
    # zero out slots 1.. (inactive) rows to keep the masked invariant
    keep = np.zeros(D, bool)
    keep[:13] = True
    keep[13 : 13 + 6] = True
    Pfull = np.where(keep[:, None] & keep[None, :], Pfull, 0.0)
    s = s._replace(P=jnp.asarray(Pfull))

    h = jnp.asarray([150.0, 110.0])
    lam0 = jnp.asarray(st.lambda_grid(P0))
    s2 = st.add_partial_feature(s, CAM, h, jnp.asarray(patch), lam0, jnp.asarray(True))

    assert bool(s2.active[1]) and not bool(s2.full[1])
    off = st.slot_offset(1)

    # oracle
    from scenelib2_tpu.core import models
    from scenelib2_tpu.core.camera import measurement_noise

    xp = np.asarray(s.x[:7])
    ypi, dxp, dhi = models.part_init_ray(CAM, h, jnp.asarray(xp))
    J = np.zeros((6, 13))
    J[:, :7] = np.asarray(dxp)
    R = np.asarray(measurement_noise(CAM, h))
    Pxx = Pfull[:13, :13]
    np.testing.assert_allclose(np.asarray(s2.x[off : off + 6]), np.asarray(ypi), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s2.P[:13, off : off + 6]), (J @ Pfull[:13, :13]).T, rtol=1e-10, atol=1e-18
    )
    expect_pyy = J @ Pxx @ J.T + np.asarray(dhi) @ R @ np.asarray(dhi).T
    np.testing.assert_allclose(
        np.asarray(s2.P[off : off + 6, off : off + 6]), expect_pyy, rtol=1e-10, atol=1e-18
    )
    # cross-cov with the earlier feature: (J Pxy_j)' stored at (j, new)
    off0 = st.slot_offset(0)
    expect_cross = (J @ Pfull[:13, off0 : off0 + 6]).T
    np.testing.assert_allclose(
        np.asarray(s2.P[off0 : off0 + 6, off : off + 6]), expect_cross, rtol=1e-10, atol=1e-18
    )
    # particles initialised
    np.testing.assert_allclose(np.asarray(s2.prob[1]), 1.0 / P0.n_particles)
    assert bool(s2.palive[1].all())


def test_add_partial_feature_disabled_is_noop(rng):
    s = make_state(rng)
    patch = jnp.zeros((11, 11), jnp.uint8)
    lam0 = jnp.asarray(st.lambda_grid(P0))
    s2 = st.add_partial_feature(s, CAM, jnp.asarray([100.0, 100.0]), patch, lam0, jnp.asarray(False))
    for a, b in zip(s2, s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_delete_mask(rng):
    s = make_state(rng)
    patch = rng.integers(0, 256, size=(11, 11), dtype=np.uint8)
    s = st.add_known_feature(s, [0.1, 0.2, 0.9], np.zeros(7), patch)
    s = st.add_known_feature(s, [-0.1, 0.2, 0.9], np.zeros(7), patch)
    A = rng.normal(size=(D, D)) * 0.01
    s = s._replace(P=jnp.asarray(A @ A.T))
    kill = np.array([True, False, False, False])
    s2 = st.delete_mask(s, jnp.asarray(kill))
    off = st.slot_offset(0)
    assert not bool(s2.active[0])
    assert bool(s2.active[1])
    assert np.abs(np.asarray(s2.P[off : off + 6, :])).max() == 0.0
    assert np.abs(np.asarray(s2.P[:, off : off + 6])).max() == 0.0
    # survivor blocks untouched
    off1 = st.slot_offset(1)
    np.testing.assert_array_equal(
        np.asarray(s2.P[off1 : off1 + 6, off1 : off1 + 6]),
        np.asarray(s.P[off1 : off1 + 6, off1 : off1 + 6]),
    )
    # label freed, slot reusable
    assert int(s2.label[0]) == -1
    s3 = st.add_known_feature(s2, [0.0, 0.0, 1.0], np.zeros(7), patch)
    assert bool(s3.active[0]) and int(s3.label[0]) == int(s2.next_label)


def test_convert_feature_oracle(rng):
    """Conversion must match feature.cpp:204-269 block algebra."""
    s = make_state(rng)
    patch = rng.integers(0, 256, size=(11, 11), dtype=np.uint8)
    s = st.add_known_feature(s, [0.1, 0.2, 0.9], np.zeros(7), patch)
    # make slot 1 a partial feature manually
    lam0 = jnp.asarray(st.lambda_grid(P0))
    s = st.add_partial_feature(s, CAM, jnp.asarray([150.0, 110.0]), jnp.asarray(patch), lam0, jnp.asarray(True))
    A = rng.normal(size=(D, D)) * 0.01
    Pfull = A @ A.T
    keep = np.zeros(D, bool)
    keep[: 13 + 12] = True
    Pfull = np.where(keep[:, None] & keep[None, :], Pfull, 0.0)
    s = s._replace(P=jnp.asarray(Pfull))

    lam_mean, lam_cov = 2.3, 0.04
    s2 = st.convert_feature(s, jnp.int32(1), jnp.float64(lam_mean), jnp.float64(lam_cov), jnp.asarray(True))

    off = st.slot_offset(1)
    y6 = np.asarray(s.x[off : off + 6])
    T = np.concatenate([np.eye(3), lam_mean * np.eye(3)], axis=1)
    bvec = y6[3:6].reshape(3, 1)
    yfi = y6[:3] + lam_mean * y6[3:6]
    np.testing.assert_allclose(np.asarray(s2.x[off : off + 3]), yfi, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(s2.x[off + 3 : off + 6]), 0.0)
    # Pxy' = Pxy T'
    np.testing.assert_allclose(
        np.asarray(s2.P[:13, off : off + 3]), Pfull[:13, off : off + 6] @ T.T, rtol=1e-10
    )
    # Pyy' = T Pyy T' + b Plambda b'
    expect = T @ Pfull[off : off + 6, off : off + 6] @ T.T + bvec @ np.array([[lam_cov]]) @ bvec.T
    np.testing.assert_allclose(np.asarray(s2.P[off : off + 3, off : off + 3]), expect, rtol=1e-10)
    # cross with earlier feature: Pyjyi' = Pyjypi T'
    off0 = st.slot_offset(0)
    np.testing.assert_allclose(
        np.asarray(s2.P[off0 : off0 + 6, off : off + 3]),
        Pfull[off0 : off0 + 6, off : off + 6] @ T.T,
        rtol=1e-10,
    )
    # unused dims zeroed
    assert np.abs(np.asarray(s2.P[off + 3 : off + 6, :])).max() == 0.0
    assert bool(s2.full[1])


def test_lambda_grid_repeated_addition():
    g = st.lambda_grid(Params(n_particles=100))
    assert g[0] == 0.5
    assert len(g) == 100
    # repeated addition, not min + i*step: compare the accumulation explicitly
    acc = 0.5
    step = 0.045
    for i in range(100):
        assert g[i] == acc
        acc += step
