import os
import subprocess
import tempfile

import numpy as np
import pytest

from scenelib2_tpu.config import load_config, parse_cfg_file
from scenelib2_tpu.io.pgm import read_pgm, write_pgm
from scenelib2_tpu.rng import Drand48, host_drand48_sequence, srand48


def test_parse_stock_cfg(data_dir):
    cfg = load_config(os.path.join(data_dir, "SceneLib2.cfg"), data_dir=data_dir)
    p = cfg.params
    assert p.cam_width == 320 and p.cam_height == 240
    assert p.cam_fku == 195.0 and p.cam_u0 == 162.0 and p.cam_v0 == 125.0
    assert p.cam_kd1 == 9e-6
    np.testing.assert_allclose(p.delta_t, 0.033333333)
    assert p.n_features_to_select == 10
    assert p.n_features_to_keep_visible == 12
    assert p.max_features_to_init_at_once == 1
    assert p.n_particles == 100 and p.min_particles == 20
    assert p.min_lambda == 0.5 and p.max_lambda == 5.0
    assert p.prune_prob_thresh == 0.05
    assert p.erase_partial_after_attempts == 10
    # initial state
    np.testing.assert_allclose(cfg.xv0[2], -0.60)
    np.testing.assert_allclose(cfg.xv0[3], 1.0)  # qw
    np.testing.assert_allclose(cfg.xv0[9], -0.1)  # vz
    np.testing.assert_allclose(cfg.xv0[12], 0.01)  # wz
    np.testing.assert_allclose(cfg.pxx0[0, 0], 0.0004)
    assert cfg.pxx0.shape == (13, 13)
    # 4 known features with patches that exist
    assert len(cfg.known_features) == 4
    np.testing.assert_allclose(cfg.known_features[0].y, (0.105, 0.07425, 0.0))
    np.testing.assert_allclose(cfg.known_features[1].y, (-0.105, 0.07425, 0.0))
    for kf in cfg.known_features:
        assert os.path.exists(kf.patch_path)
        assert kf.xp_org[2] == -0.60 and kf.xp_org[3] == 1.0


def test_known_patches_load(data_dir):
    for i in range(4):
        img = read_pgm(os.path.join(data_dir, f"known_patch{i}.pgm"))
        assert img.shape == (11, 11)
        assert img.dtype == np.uint8


def test_pgm_roundtrip(rng):
    img = rng.integers(0, 256, size=(24, 32)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.pgm")
        write_pgm(path, img)
        np.testing.assert_array_equal(read_pgm(path), img)


def test_cfg_comments_and_semicolons(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("# comment\n a.b = 3.5;  # trailing\nc.d = hello;\n e.f = 2\n")
    d = parse_cfg_file(str(p))
    assert d["a.b"] == "3.5" and d["c.d"] == "hello" and d["e.f"] == "2"


def test_srand48_state():
    assert srand48(0) == 0x330E
    assert srand48(1) == (1 << 16) | 0x330E


def test_drand48_vs_libc():
    """Compare against the real glibc drand48 via a tiny C program."""
    c_src = r"""
#include <stdio.h>
#include <stdlib.h>
int main() { srand48(0); for (int i = 0; i < 20; ++i) printf("%.17g\n", drand48()); }
"""
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "t.c")
        exe = os.path.join(d, "t")
        with open(src, "w") as f:
            f.write(c_src)
        try:
            subprocess.run(["gcc", "-O0", src, "-o", exe], check=True, capture_output=True)
        except (FileNotFoundError, subprocess.CalledProcessError):
            pytest.skip("no C compiler available")
        out = subprocess.run([exe], check=True, capture_output=True, text=True).stdout
    expected = np.array([float(x) for x in out.split()])
    got = host_drand48_sequence(0, 20)
    np.testing.assert_array_equal(got, expected)


def test_drand48_device_matches_host():
    import jax.numpy as jnp

    from scenelib2_tpu.rng import drand48_many, pack_state, unpack_state

    states, vals = drand48_many(jnp.asarray(pack_state(srand48(0))), 10)
    host = Drand48(0)
    for i in range(10):
        hv = host.next()
        assert float(vals[i]) == hv
        assert unpack_state(states[i]) == host.state()
