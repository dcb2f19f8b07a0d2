"""Fused EKF update kernel vs the XLA update+normalise+delete+symmetrize
sequence (interpret mode on CPU; f32-level tolerances)."""

import numpy as np
import jax.numpy as jnp

from scenelib2_tpu.core import ekf
from scenelib2_tpu.kernels.pallas_ekf import pallas_joint_update_norm

import pytest

pytestmark = pytest.mark.pallas  # interpret-mode on CPU: slow; deselect with -m 'not pallas'

CAM_DIM = 13
SLOT_DIM = 6


def _xla_sequence(x, P, H, nu, R, any_succ, keep_dims):
    x_upd, P_upd, _ = ekf.joint_update(x, P, H, nu, R, pallas_chol=False)
    x_upd, P_upd = ekf.normalise(x_upd, P_upd)
    x1 = jnp.where(any_succ, x_upd, x)
    P1 = jnp.where(any_succ, P_upd, P)
    P1 = jnp.where(keep_dims[:, None] & keep_dims[None, :], P1, 0.0)
    x1 = jnp.where(keep_dims, x1, 0.0)
    return x1, ekf.symmetrize(P1)


def _problem(rng, MF=4, NSEL=3, n_bad=1):
    D = CAM_DIM + SLOT_DIM * MF
    M = 2 * NSEL
    A = rng.normal(size=(D, D))
    P = A @ A.T / D * 1e-3 + np.eye(D) * 1e-4
    x = rng.normal(size=D) * 0.1
    x[3:7] = rng.normal(size=4)
    x[3:7] /= np.linalg.norm(x[3:7]) * (1.0 + 1e-3)   # near-unit quaternion
    H = np.zeros((M, D))
    for k in range(NSEL):
        H[2 * k : 2 * k + 2, :7] = rng.normal(size=(2, 7))
        off = CAM_DIM + SLOT_DIM * k
        H[2 * k : 2 * k + 2, off : off + 3] = rng.normal(size=(2, 3))
    nu = rng.normal(size=M) * 0.5
    R = np.eye(M) * 1.0
    keep = np.ones(D, bool)
    for k in range(n_bad):
        off = CAM_DIM + SLOT_DIM * (MF - 1 - k)
        keep[off : off + SLOT_DIM] = False
    return x, P, H, nu, R, keep


def test_fused_update_matches_xla(rng):
    x, P, H, nu, R, keep = _problem(rng)
    args = [jnp.asarray(a) for a in (x, P, H, nu, R)]
    keep_j = jnp.asarray(keep)
    want_x, want_P = _xla_sequence(*args, jnp.asarray(True), keep_j)
    got_x, got_P = pallas_joint_update_norm(
        *args, jnp.asarray(True), keep_j, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got_P), np.asarray(want_P),
                               rtol=5e-3, atol=5e-7)
    # symmetry + exact zeroing of deleted dims
    np.testing.assert_array_equal(np.asarray(got_P), np.asarray(got_P).T)
    assert np.all(np.asarray(got_P)[~keep, :] == 0.0)
    assert np.all(np.asarray(got_x)[~keep] == 0.0)


def test_fused_update_no_success_keeps_prior(rng):
    x, P, H, nu, R, keep = _problem(rng, n_bad=0)
    args = [jnp.asarray(a) for a in (x, P, H, nu, R)]
    keep_j = jnp.asarray(keep)
    got_x, got_P = pallas_joint_update_norm(
        *args, jnp.asarray(False), keep_j, interpret=True
    )
    # prior state survives untouched (up to the f32 symmetrize)
    np.testing.assert_allclose(np.asarray(got_x), x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got_P), (P + P.T) / 2, rtol=1e-6, atol=1e-9
    )


def test_compact_update_matches_v1(rng):
    """The compact-input variant (in-kernel H/R/nu assembly from the
    measurement kernel's column layout) must match the explicit-matrix
    kernel given the same underlying quantities."""
    import jax.numpy as jnp

    from scenelib2_tpu.kernels import pallas_measure as pm
    from scenelib2_tpu.kernels.pallas_ekf import pallas_joint_update_norm_compact

    MF, NSEL = 4, 3
    D = CAM_DIM + SLOT_DIM * MF
    M = 2 * NSEL
    A = rng.normal(size=(D, D))
    P = A @ A.T / D * 1e-3 + np.eye(D) * 1e-4
    x = rng.normal(size=D) * 0.1
    x[3:7] = rng.normal(size=4)
    x[3:7] /= np.linalg.norm(x[3:7]) * (1.0 + 1e-3)

    # compact per-selected data in the measurement-kernel row layout
    sel = np.zeros((pm.NOUT, NSEL), np.float32)
    hx = rng.normal(size=(NSEL, 2, 7)).astype(np.float32)
    hy = rng.normal(size=(NSEL, 2, 3)).astype(np.float32)
    Rd = rng.uniform(1.0, 2.0, NSEL).astype(np.float32)
    h = rng.uniform(20, 200, (NSEL, 2)).astype(np.float32)
    z = (h + rng.normal(0, 1.0, (NSEL, 2))).astype(np.float32)
    succ = np.array([True, False, True])
    slots = np.array([0, 2, 3], np.int32)
    offs = CAM_DIM + SLOT_DIM * slots
    sel[pm.O_HX : pm.O_HX + 14] = hx.reshape(NSEL, 14).T
    sel[pm.O_HY : pm.O_HY + 6] = hy.reshape(NSEL, 6).T
    sel[pm.O_RD] = Rd
    sel[pm.O_H : pm.O_H + 2] = h.T

    # explicit H/R/nu for the v1 kernel
    H = np.zeros((M, D))
    nu = np.zeros(M)
    R = np.eye(M)
    for k in range(NSEL):
        if not succ[k]:
            continue
        for i in range(2):
            H[2 * k + i, :7] = hx[k, i]
            H[2 * k + i, offs[k] : offs[k] + 3] = hy[k, i]
            nu[2 * k + i] = z[k, i] - h[k, i]
            R[2 * k + i, 2 * k + i] = Rd[k]
    keep = np.ones(D, bool)
    keep[CAM_DIM + SLOT_DIM : CAM_DIM + 2 * SLOT_DIM] = False

    want_x, want_P = pallas_joint_update_norm(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(H), jnp.asarray(nu),
        jnp.asarray(R), jnp.asarray(True), jnp.asarray(keep), interpret=True,
    )
    got_x, got_P = pallas_joint_update_norm_compact(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(sel), jnp.asarray(z),
        jnp.asarray(succ), jnp.asarray(offs), jnp.asarray(keep),
        meas_rows=(pm.O_HX, pm.O_HY, pm.O_RD, pm.O_H), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_P), np.asarray(want_P),
                               rtol=1e-4, atol=1e-7)


def test_compact_update_large_d(rng):
    """Compact kernel at the hires operating point (MF=60, D=373 -> TD=384):
    the multi-tile P block must match the XLA update sequence."""
    import jax.numpy as jnp

    from scenelib2_tpu.kernels import pallas_measure as pm
    from scenelib2_tpu.kernels.pallas_ekf import pallas_joint_update_norm_compact

    MF, NSEL = 60, 10
    D = CAM_DIM + SLOT_DIM * MF
    M = 2 * NSEL
    A = rng.normal(size=(D, D))
    P = A @ A.T / D * 1e-3 + np.eye(D) * 1e-4
    x = rng.normal(size=D) * 0.1
    x[3:7] = rng.normal(size=4)
    x[3:7] /= np.linalg.norm(x[3:7]) * (1.0 + 1e-3)

    sel = np.zeros((pm.NOUT, NSEL), np.float32)
    hx = rng.normal(size=(NSEL, 2, 7)).astype(np.float32)
    hy = rng.normal(size=(NSEL, 2, 3)).astype(np.float32)
    Rd = rng.uniform(1.0, 2.0, NSEL).astype(np.float32)
    h = rng.uniform(20, 200, (NSEL, 2)).astype(np.float32)
    z = (h + rng.normal(0, 1.0, (NSEL, 2))).astype(np.float32)
    succ = rng.uniform(size=NSEL) > 0.3
    succ[0] = True
    slots = rng.choice(MF, NSEL, replace=False).astype(np.int32)
    offs = CAM_DIM + SLOT_DIM * slots
    sel[pm.O_HX : pm.O_HX + 14] = hx.reshape(NSEL, 14).T
    sel[pm.O_HY : pm.O_HY + 6] = hy.reshape(NSEL, 6).T
    sel[pm.O_RD] = Rd
    sel[pm.O_H : pm.O_H + 2] = h.T

    H = np.zeros((M, D))
    nu = np.zeros(M)
    R = np.eye(M)
    for k in range(NSEL):
        if not succ[k]:
            continue
        for i in range(2):
            H[2 * k + i, :7] = hx[k, i]
            H[2 * k + i, offs[k] : offs[k] + 3] = hy[k, i]
            nu[2 * k + i] = z[k, i] - h[k, i]
            R[2 * k + i, 2 * k + i] = Rd[k]
    keep = np.ones(D, bool)
    keep[CAM_DIM + 5 * SLOT_DIM : CAM_DIM + 6 * SLOT_DIM] = False

    want_x, want_P = _xla_sequence(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(H), jnp.asarray(nu),
        jnp.asarray(R), jnp.asarray(True), jnp.asarray(keep),
    )
    got_x, got_P = pallas_joint_update_norm_compact(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(sel), jnp.asarray(z),
        jnp.asarray(succ), jnp.asarray(offs), jnp.asarray(keep),
        meas_rows=(pm.O_HX, pm.O_HY, pm.O_RD, pm.O_H), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(got_P), np.asarray(want_P),
                               rtol=5e-3, atol=5e-7)
    np.testing.assert_array_equal(np.asarray(got_P), np.asarray(got_P).T)
    assert np.all(np.asarray(got_P)[~keep, :] == 0.0)
    assert np.all(np.asarray(got_x)[~keep] == 0.0)


def test_compact_update_bookkeeping(rng):
    """The in-kernel bookkeeping (counter scatter-adds, failure-ratio test,
    exterminate iterator-skip closed form, keep-dims expansion) must equal
    the XLA chain it replaces (runtime/step.py _xla_bookkeeping)."""
    import jax
    import jax.numpy as jnp

    from scenelib2_tpu.kernels import pallas_measure as pm
    from scenelib2_tpu.kernels.pallas_ekf import pallas_joint_update_norm_compact

    MF, NSEL = 12, 5
    D = CAM_DIM + SLOT_DIM * MF
    MINA, FRAC = 10, 0.5

    for trial in range(6):
        A = rng.normal(size=(D, D))
        P = A @ A.T / D * 1e-3 + np.eye(D) * 1e-4
        x = rng.normal(size=D) * 0.1
        x[3:7] = rng.normal(size=4)
        x[3:7] /= np.linalg.norm(x[3:7]) * (1.0 + 1e-3)

        sel = np.zeros((pm.NOUT, NSEL), np.float32)
        hx = rng.normal(size=(NSEL, 2, 7)).astype(np.float32)
        hy = rng.normal(size=(NSEL, 2, 3)).astype(np.float32)
        Rd = rng.uniform(1.0, 2.0, NSEL).astype(np.float32)
        h = rng.uniform(20, 200, (NSEL, 2)).astype(np.float32)
        z = (h + rng.normal(0, 1.0, (NSEL, 2))).astype(np.float32)
        sel[pm.O_HX : pm.O_HX + 14] = hx.reshape(NSEL, 14).T
        sel[pm.O_HY : pm.O_HY + 6] = hy.reshape(NSEL, 6).T
        sel[pm.O_RD] = Rd
        sel[pm.O_H : pm.O_H + 2] = h.T

        active = rng.uniform(size=MF) > 0.2
        sel_mask = rng.uniform(size=NSEL) > 0.2
        succ = sel_mask & (rng.uniform(size=NSEL) > 0.4)
        top_idx = rng.choice(MF, NSEL, replace=False).astype(np.int32)
        offs = CAM_DIM + SLOT_DIM * top_idx
        active[top_idx[sel_mask]] = True
        attempts = rng.integers(0, 14, MF).astype(np.int32) * active
        successes = (attempts * rng.uniform(0.0, 1.0, MF)).astype(np.int32)
        sched = (rng.uniform(size=MF) > 0.6) & active
        # distinct labels among active, stable-ties irrelevant for kill
        label = np.where(active, rng.permutation(MF).astype(np.int32), -1)

        # XLA reference chain (runtime/step.py)
        att2 = jnp.asarray(attempts).at[jnp.asarray(top_idx)].add(
            jnp.asarray(sel_mask, jnp.int32))
        suc2 = jnp.asarray(successes).at[jnp.asarray(top_idx)].add(
            jnp.asarray(succ, jnp.int32))
        ratio = jnp.where(att2 > 0, suc2.astype(jnp.float32) / att2.astype(jnp.float32), 1.0)
        bad = jnp.asarray(active) & (att2 >= MINA) & (ratio < FRAC)
        sched1 = (jnp.asarray(sched) | bad) & jnp.asarray(active)
        pos = jnp.arange(MF, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(jnp.asarray(active), jnp.asarray(label),
                                      jnp.int32(1 << 30)))
        S = sched1[order]
        run_start = jax.lax.cummax(jnp.where(S, 0, pos + 1))
        kill_pos = S & ((pos - run_start) % 2 == 0)
        want_kill = np.asarray(jnp.zeros(MF, bool).at[order].set(kill_pos))
        want_sched = np.asarray(sched1 & ~jnp.asarray(want_kill))
        keep = np.ones(D, bool)
        for i in np.where(want_kill)[0]:
            keep[CAM_DIM + SLOT_DIM * i : CAM_DIM + SLOT_DIM * (i + 1)] = False

        want_x, want_P = pallas_joint_update_norm_compact(
            jnp.asarray(x), jnp.asarray(P), jnp.asarray(sel), jnp.asarray(z),
            jnp.asarray(succ), jnp.asarray(offs), jnp.asarray(keep),
            meas_rows=(pm.O_HX, pm.O_HY, pm.O_RD, pm.O_H), interpret=True,
        )
        got_x, got_P, got_att, got_suc, got_sched, got_kill = (
            pallas_joint_update_norm_compact(
                jnp.asarray(x), jnp.asarray(P), jnp.asarray(sel),
                jnp.asarray(z), jnp.asarray(succ), jnp.asarray(offs), None,
                meas_rows=(pm.O_HX, pm.O_HY, pm.O_RD, pm.O_H), interpret=True,
                bookkeeping=(
                    jnp.asarray(attempts), jnp.asarray(successes),
                    jnp.asarray(sched), jnp.asarray(active), jnp.asarray(label),
                ),
                sel_mask=jnp.asarray(sel_mask),
                top_idx=jnp.asarray(top_idx),
                mina=float(MINA), frac=float(FRAC),
            )
        )
        np.testing.assert_array_equal(np.asarray(got_kill), want_kill)
        np.testing.assert_array_equal(np.asarray(got_sched), want_sched)
        np.testing.assert_array_equal(np.asarray(got_att), np.asarray(att2))
        np.testing.assert_array_equal(np.asarray(got_suc), np.asarray(suc2))
        np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
        np.testing.assert_array_equal(np.asarray(got_P), np.asarray(want_P))


def test_compact_update_bookkeeping_large_mf(rng):
    """In-kernel bookkeeping at the hires scale (MF=60, D=373, TD=384):
    the 128-lane rank/permutation machinery must match the XLA chain with
    many interacting scheduled runs."""
    import jax
    import jax.numpy as jnp

    from scenelib2_tpu.kernels import pallas_measure as pm
    from scenelib2_tpu.kernels.pallas_ekf import pallas_joint_update_norm_compact

    MF, NSEL = 60, 10
    D = CAM_DIM + SLOT_DIM * MF
    MINA, FRAC = 10, 0.5

    P = np.eye(D) * 1e-3
    x = rng.normal(size=D).astype(np.float64) * 0.1
    x[3:7] = rng.normal(size=4)
    x[3:7] /= np.linalg.norm(x[3:7]) * (1.0 + 1e-3)
    sel = np.zeros((pm.NOUT, NSEL), np.float32)
    sel[pm.O_RD] = 1.0
    z = rng.uniform(20, 200, (NSEL, 2)).astype(np.float32)
    sel[pm.O_H : pm.O_H + 2] = z.T

    active = np.ones(MF, bool)
    active[rng.choice(MF, 10, replace=False)] = False
    sel_mask = np.ones(NSEL, bool)
    succ = rng.uniform(size=NSEL) > 0.5
    top_idx = rng.choice(np.nonzero(active)[0], NSEL, replace=False).astype(np.int32)
    offs = CAM_DIM + SLOT_DIM * top_idx
    # force long runs of consecutively-scheduled features so the run-parity
    # closed form has real work (kill every other position within runs)
    attempts = np.where(active, 12, 0).astype(np.int32)
    successes = np.where(rng.uniform(size=MF) > 0.55, 12, 2).astype(np.int32) * active
    sched = (rng.uniform(size=MF) > 0.5) & active
    label = np.where(active, rng.permutation(MF).astype(np.int32), -1)

    att2 = jnp.asarray(attempts).at[jnp.asarray(top_idx)].add(
        jnp.asarray(sel_mask, jnp.int32))
    suc2 = jnp.asarray(successes).at[jnp.asarray(top_idx)].add(
        jnp.asarray(succ, jnp.int32))
    ratio = jnp.where(att2 > 0, suc2.astype(jnp.float32) / att2.astype(jnp.float32), 1.0)
    bad = jnp.asarray(active) & (att2 >= MINA) & (ratio < FRAC)
    sched1 = (jnp.asarray(sched) | bad) & jnp.asarray(active)
    pos = jnp.arange(MF, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(jnp.asarray(active), jnp.asarray(label),
                                  jnp.int32(1 << 30)))
    S = sched1[order]
    run_start = jax.lax.cummax(jnp.where(S, 0, pos + 1))
    kill_pos = S & ((pos - run_start) % 2 == 0)
    want_kill = np.asarray(jnp.zeros(MF, bool).at[order].set(kill_pos))
    want_sched = np.asarray(sched1 & ~jnp.asarray(want_kill))
    assert want_kill.sum() >= 3   # the scenario must actually exercise kills

    got = pallas_joint_update_norm_compact(
        jnp.asarray(x), jnp.asarray(P), jnp.asarray(sel), jnp.asarray(z),
        jnp.asarray(succ), jnp.asarray(offs), None,
        meas_rows=(pm.O_HX, pm.O_HY, pm.O_RD, pm.O_H), interpret=True,
        bookkeeping=(
            jnp.asarray(attempts), jnp.asarray(successes),
            jnp.asarray(sched), jnp.asarray(active), jnp.asarray(label),
        ),
        sel_mask=jnp.asarray(sel_mask), top_idx=jnp.asarray(top_idx),
        mina=float(MINA), frac=float(FRAC),
    )
    _x_out, P_out, got_att, got_suc, got_sched, got_kill = got
    np.testing.assert_array_equal(np.asarray(got_kill), want_kill)
    np.testing.assert_array_equal(np.asarray(got_sched), want_sched)
    np.testing.assert_array_equal(np.asarray(got_att), np.asarray(att2))
    np.testing.assert_array_equal(np.asarray(got_suc), np.asarray(suc2))
    # killed slots' dims zeroed in the D=373 multi-tile P
    for i in np.nonzero(want_kill)[0]:
        o = CAM_DIM + SLOT_DIM * i
        assert np.all(np.asarray(P_out)[o : o + SLOT_DIM, :] == 0.0)
