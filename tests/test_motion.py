import jax
import jax.numpy as jnp
import numpy as np

from scenelib2_tpu.core import motion as M
from scenelib2_tpu.core.quaternion import quat_from_angular_velocity, quat_mul

DT = 1 / 30.0


def sample_xv(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return jnp.asarray(np.concatenate([rng.normal(size=3), q, rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.2]))


def test_fv_value(rng):
    xv = sample_xv(rng)
    u = jnp.zeros(3)
    fv, _ = M.func_fv_and_dfv_by_dxv(xv, u, DT)
    r, q, v, w = xv[0:3], xv[3:7], xv[7:10], xv[10:13]
    np.testing.assert_allclose(fv[0:3], r + v * DT, rtol=1e-14)
    np.testing.assert_allclose(fv[3:7], quat_mul(q, quat_from_angular_velocity(w * DT)), rtol=1e-14)
    np.testing.assert_allclose(fv[7:10], v, rtol=1e-14)
    np.testing.assert_allclose(fv[10:13], w, rtol=1e-14)


def test_dfv_by_dxv_vs_autodiff(rng):
    xv = sample_xv(rng)
    u = jnp.zeros(3)
    _, F = M.func_fv_and_dfv_by_dxv(xv, u, DT)
    F_auto = jax.jacfwd(lambda x: M.func_fv_and_dfv_by_dxv(x, u, DT)[0])(xv)
    np.testing.assert_allclose(F, F_auto, atol=1e-10)


def test_Q_psd_and_structure(rng):
    xv = sample_xv(rng)
    Q = np.asarray(M.func_Q(xv, DT, 4.0, 6.0))
    np.testing.assert_allclose(Q, Q.T, atol=1e-15)
    eig = np.linalg.eigvalsh(Q)
    assert eig.min() > -1e-12
    # v-v block is sd_a^2 dt^2 I
    np.testing.assert_allclose(Q[7:10, 7:10], np.eye(3) * 16 * DT * DT, atol=1e-14)
    # omega-omega block is sd_alpha^2 dt^2 I
    np.testing.assert_allclose(Q[10:13, 10:13], np.eye(3) * 36 * DT * DT, atol=1e-14)
    # r-v cross block: dt * I * lin_var
    np.testing.assert_allclose(Q[0:3, 7:10], np.eye(3) * DT * 16 * DT * DT, atol=1e-14)


def test_xvnorm_does_not_normalise(rng):
    # Reference quirk: Tempqb = Tempqa with no .normalize() (motion_model.cpp:254)
    xv = sample_xv(rng) * 1.05  # quaternion not unit
    xvn, J = M.func_xvnorm_and_dxvnorm_by_dxv(xv)
    np.testing.assert_array_equal(np.asarray(xvn), np.asarray(xv))
    assert not np.allclose(np.asarray(J)[3:7, 3:7], np.eye(4))
    np.testing.assert_array_equal(np.asarray(J)[0:3, 0:3], np.eye(3))
    np.testing.assert_array_equal(np.asarray(J)[7:13, 7:13], np.eye(6))
