import jax
import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.config import Params
from scenelib2_tpu.core import camera as C

CAM = C.CameraParams.from_params(Params())


def test_project_known_point():
    # Point on optic axis projects to the principal point
    h = np.asarray(C.project(CAM, jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(h, [162.0, 125.0], atol=1e-12)


def test_negated_focal_convention():
    # +x in camera frame moves the image point LEFT (negated fku)
    h = np.asarray(C.project(CAM, jnp.array([0.1, 0.0, 1.0])))
    assert h[0] < 162.0


def test_project_formula_literal():
    y = jnp.array([0.2, -0.1, 1.5])
    uc = np.array([-195.0 * 0.2 / 1.5, -195.0 * (-0.1) / 1.5])
    r2 = uc @ uc
    expected = uc / np.sqrt(1 + 2 * 9e-6 * r2) + np.array([162.0, 125.0])
    np.testing.assert_allclose(np.asarray(C.project(CAM, y)), expected, rtol=1e-14)


def test_unproject_roundtrip():
    y = jnp.array([0.2, -0.1, 1.0])
    h = C.project(CAM, y)
    back = np.asarray(C.unproject(CAM, h))
    np.testing.assert_allclose(back, np.asarray(y), rtol=1e-10)


def test_projection_jacobian_vs_autodiff(rng):
    y = jnp.asarray(rng.normal(size=3) * 0.3 + np.array([0, 0, 2.0]))
    J = C.project_jacobian(CAM, y)
    J_auto = jax.jacfwd(lambda p: C.project(CAM, p))(y)
    np.testing.assert_allclose(J, J_auto, rtol=1e-9, atol=1e-12)


def test_unprojection_jacobian_vs_autodiff(rng):
    h = jnp.asarray(np.array([162.0, 125.0]) + rng.normal(size=2) * 40)
    J = C.unproject_jacobian(CAM, h)
    J_auto = jax.jacfwd(lambda p: C.unproject(CAM, p))(h)
    np.testing.assert_allclose(J, J_auto, rtol=1e-9, atol=1e-12)


def test_measurement_noise_radial_growth():
    R0 = np.asarray(C.measurement_noise(CAM, jnp.array([162.0, 125.0])))
    np.testing.assert_allclose(R0, np.eye(2), atol=1e-12)  # sd=1 at centre
    # At the corner-distance the sd doubles -> variance 4
    corner = jnp.array([0.0, 0.0])
    Rc = np.asarray(C.measurement_noise(CAM, corner))
    np.testing.assert_allclose(Rc, np.eye(2) * 4.0, rtol=1e-12)


def test_vmap_project(rng):
    ys = jnp.asarray(rng.normal(size=(5, 3)) * 0.2 + np.array([0, 0, 2.0]))
    hs = jax.vmap(lambda y: C.project(CAM, y))(ys)
    for i in range(5):
        np.testing.assert_allclose(hs[i], C.project(CAM, ys[i]), rtol=1e-14)
