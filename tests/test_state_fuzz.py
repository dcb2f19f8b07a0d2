"""Property fuzz of the covariance surgery: random interleavings of
add_partial / add_known / convert / delete (with slot reuse) must preserve
the structural invariants of the single dense P that the reference maintains
implicitly through its per-feature block lists (feature.cpp:45-104,204-269,
monoslam.cpp:770-812):

  1. P stays symmetric to roundoff (cross rows/cols are written as exact
     transposes; the diagonal blocks J P J' / T P T' are symmetric only to
     f64 roundoff — the reference re-symmetrizes every frame for the same
     reason, monoslam.cpp:145-150).
  2. P stays PSD (each op is an affine re-parameterisation plus independent
     noise: J P J' + B R B' rows, T P T' + b cov b' conversion, principal
     submatrix zeroing on delete).
  3. Freed / never-used slots keep exactly-zero x entries and P rows/cols —
     the invariant that makes 6-wide-slot arithmetic equal the reference's
     packed layout, and that add_partial relies on when it reuses a slot.
  4. Converted (full) slots keep exact zeros in their trailing 3 dims.
  5. Masks stay consistent: full => active; no particles alive on full or
     inactive slots; freed labels are -1 and labels stay unique/monotone.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scenelib2_tpu.config import Params
from scenelib2_tpu.core.camera import CameraParams
from scenelib2_tpu.runtime import state as st

P0 = Params(max_features=4, n_particles=10)
CAM = CameraParams.from_params(P0)
D = P0.state_dim
MF = P0.max_features


def check_invariants(s):
    P = np.asarray(s.P)
    x = np.asarray(s.x)
    active = np.asarray(s.active)
    full = np.asarray(s.full)
    palive = np.asarray(s.palive)
    label = np.asarray(s.label)

    # 1. symmetry to roundoff (diagonal blocks are J P J' forms)
    scaleP = max(1.0, float(np.abs(P).max()))
    np.testing.assert_allclose(P, P.T, rtol=0.0, atol=1e-13 * scaleP)

    # 2. PSD up to roundoff
    w = np.linalg.eigvalsh((P + P.T) / 2.0)
    scale = max(1.0, float(w[-1]))
    assert w[0] >= -1e-10 * scale, f"negative eigenvalue {w[0]} (scale {scale})"

    # 3./4. dead dims are exactly zero
    dead = np.zeros(D, bool)
    for i in range(MF):
        off = st.slot_offset(i)
        if not active[i]:
            dead[off : off + 6] = True
        elif full[i]:
            dead[off + 3 : off + 6] = True
    assert np.abs(x[dead]).max(initial=0.0) == 0.0
    assert np.abs(P[dead, :]).max(initial=0.0) == 0.0
    assert np.abs(P[:, dead]).max(initial=0.0) == 0.0

    # 5. mask/bookkeeping consistency
    assert not np.any(full & ~active)
    assert not np.any(palive[full | ~active])
    assert np.all(label[~active] == -1)
    live = label[active]
    assert len(set(live.tolist())) == len(live)
    assert live.max(initial=-1) < int(s.next_label)


def random_psd_cam_state(rng):
    A = rng.normal(size=(13, 13)) * 0.05
    return st.init_state(P0, rng.normal(size=13), A @ A.T + np.eye(13) * 1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_surgery_random_sequences(seed):
    rng = np.random.default_rng(seed)
    s = random_psd_cam_state(rng)
    lam0 = jnp.asarray(st.lambda_grid(P0))
    patch = rng.integers(0, 256, size=(11, 11), dtype=np.uint8)
    n_partial_added = 0

    for step in range(60):
        active = np.asarray(s.active)
        full = np.asarray(s.full)
        partial_slots = np.nonzero(active & ~full)[0]
        op = rng.choice(["add_partial", "add_known", "convert", "delete", "noop_add", "noop_convert"])

        if op == "add_partial":
            h = jnp.asarray(
                [rng.uniform(20, P0.cam_width - 20), rng.uniform(20, P0.cam_height - 20)]
            )
            # runs unconditionally in the step even at full capacity — the
            # any_free gate inside must make it a no-op then
            s = st.add_partial_feature(s, CAM, h, jnp.asarray(patch), lam0, jnp.asarray(True))
            n_partial_added += 1
        elif op == "add_known" and not active.all():
            s = st.add_known_feature(
                s, rng.normal(size=3), np.concatenate([rng.normal(size=3), [1, 0, 0, 0]]), patch
            )
        elif op == "convert" and len(partial_slots):
            slot = int(rng.choice(partial_slots))
            s = st.convert_feature(
                s,
                jnp.int32(slot),
                jnp.float64(rng.uniform(0.5, 5.0)),
                jnp.float64(rng.uniform(0.0, 0.1)),
                jnp.asarray(True),
            )
        elif op == "delete" and active.any():
            kill = rng.random(MF) < 0.5
            s = st.delete_mask(s, jnp.asarray(kill & active))
        elif op == "noop_add":
            before = s
            s = st.add_partial_feature(
                s, CAM, jnp.asarray([100.0, 100.0]), jnp.asarray(patch), lam0, jnp.asarray(False)
            )
            for a, b in zip(s, before):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        elif op == "noop_convert" and len(partial_slots):
            before = s
            s = st.convert_feature(
                s, jnp.int32(int(partial_slots[0])), jnp.float64(2.0), jnp.float64(0.01),
                jnp.asarray(False),
            )
            for a, b in zip(s, before):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        check_invariants(s)

    # the sequence must actually have exercised insertion (sanity on the fuzz itself)
    assert n_partial_added > 0
