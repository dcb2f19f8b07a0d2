"""Native C++ frame grabber vs the Python loader."""

import os

import numpy as np
import pytest

from scenelib2_tpu.io import native
from scenelib2_tpu.io.pgm import write_pgm
from scenelib2_tpu.io.sequence import ImageSequence


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(7, 24, 32), dtype=np.uint8)
    # nested dir to exercise the recursive scan; names chosen so the global
    # path sort matches frame order
    sub = d / "a_sub"
    sub.mkdir()
    for i, f in enumerate(frames[:3]):
        write_pgm(str(sub / f"img{i:03d}.pgm"), f)
    for i, f in enumerate(frames[3:], start=3):
        write_pgm(str(d / f"zimg{i:03d}.pgm"), f)
    return str(d), frames


def test_native_builds_and_loads(seq_dir):
    if not native.available():
        pytest.skip("native grabber did not build")
    d, frames = seq_dir
    g = native.NativeGrabber(d, prefetch=3)
    assert len(g) == 7
    got = np.stack(list(g))
    np.testing.assert_array_equal(got, frames)
    g.close()


def test_native_random_access(seq_dir):
    if not native.available():
        pytest.skip("native grabber did not build")
    d, frames = seq_dir
    g = native.NativeGrabber(d)
    np.testing.assert_array_equal(g.get(5), frames[5])
    np.testing.assert_array_equal(g.get(0), frames[0])
    with pytest.raises(IndexError):
        g.get(99)
    g.close()


def test_native_missing_dir():
    if not native.available():
        pytest.skip("native grabber did not build")
    with pytest.raises(FileNotFoundError):
        native.NativeGrabber("/nonexistent/dir/xyz")


def test_sequence_uses_native_and_matches_python(seq_dir):
    d, frames = seq_dir
    seq_native = ImageSequence(d, use_native=True)
    seq_py = ImageSequence(d, use_native=False)
    a = seq_native.load_all()
    b = seq_py.load_all()
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, frames)
    if native.available():
        assert seq_native._native is not None
