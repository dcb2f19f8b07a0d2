"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_sharded_joint_update_matches_dense(devices_ok, rng):
    m = pmesh.make_mesh((4, 2), ("row", "col"))
    D, M = 128, 8
    A = rng.normal(size=(D, D))
    P = jnp.asarray(A @ A.T + np.eye(D))
    x = jnp.asarray(rng.normal(size=D))
    H = jnp.asarray(rng.normal(size=(M, D)))
    nu = jnp.asarray(rng.normal(size=M))
    R = jnp.eye(M) * 1.2

    upd = pmesh.sharded_joint_update(m, D, M)
    with m:
        x2, P2 = upd(x, P, H, nu, R)
        x2, P2 = np.asarray(x2), np.asarray(P2)

    from scenelib2_tpu.core import ekf

    x_ref, P_ref, _ = ekf.joint_update(x, P, H, nu, R)
    np.testing.assert_allclose(x2, np.asarray(x_ref), rtol=1e-10)
    np.testing.assert_allclose(P2, np.asarray(P_ref), rtol=1e-8, atol=1e-10)


def test_batched_step_shards_and_runs(devices_ok):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", __file__.replace("tests/test_parallel.py", "__graft_entry__.py")
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)


def test_replicate_states_rng_offsets(devices_ok):
    from scenelib2_tpu.config import Params
    from scenelib2_tpu.runtime import state as st

    p = Params(max_features=2, n_particles=4)
    s = st.init_state(p, np.zeros(13), np.eye(13))
    sb = pmesh.replicate_states(s, 4)
    assert sb.x.shape == (4, p.state_dim)
    assert len({tuple(r) for r in np.asarray(sb.rng)}) == 4  # distinct streams
