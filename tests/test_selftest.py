"""The selftest fingerprint must be invariant to top-k lane order within a
frame (backends may break f32 score ties differently) but sensitive to any
real decision change. See eval/selftest.py."""

from types import SimpleNamespace

import numpy as np

from scenelib2_tpu.eval.selftest import decisions_fingerprint


def _outs(sel_slot, sel_matched, n_selected, bump=0):
    t = len(sel_slot)
    z = np.zeros(t, np.int32)
    return SimpleNamespace(
        n_visible=z + 4, n_selected=np.asarray(n_selected, np.int32),
        n_matched=z + 3 + bump, n_active=z + 4, n_partial=z,
        did_init=z.astype(bool), did_convert=z.astype(bool), n_overflow=z,
        sel_slot=np.asarray(sel_slot, np.int32),
        sel_matched=np.asarray(sel_matched, bool),
    )


def test_fingerprint_ignores_tie_order():
    a = _outs([[1, 3, 0]], [[True, False, True]], [3])
    b = _outs([[3, 1, 0]], [[False, True, True]], [3])  # same (slot, matched) set
    fa = decisions_fingerprint(a, 1)
    fb = decisions_fingerprint(b, 1)
    assert fa == fb


def test_fingerprint_ignores_padding_lanes():
    # lanes >= n_selected are top-k padding; their content must not matter
    a = _outs([[1, 3, 7]], [[True, True, False]], [2])
    b = _outs([[1, 3, 2]], [[True, True, True]], [2])
    assert decisions_fingerprint(a, 1) == decisions_fingerprint(b, 1)


def test_fingerprint_catches_real_changes():
    base = _outs([[1, 3, 0]], [[True, False, True]], [3])
    h0 = decisions_fingerprint(base, 1)["decisions_sha256"]
    # different slot selected
    assert decisions_fingerprint(
        _outs([[1, 2, 0]], [[True, False, True]], [3]), 1
    )["decisions_sha256"] != h0
    # same slots, one match flipped
    assert decisions_fingerprint(
        _outs([[1, 3, 0]], [[True, True, True]], [3]), 1
    )["decisions_sha256"] != h0
    # a counter changed
    assert decisions_fingerprint(
        _outs([[1, 3, 0]], [[True, False, True]], [3], bump=1), 1
    )["decisions_sha256"] != h0
