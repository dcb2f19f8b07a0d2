"""Stage-ablation timing of go_one_step on the current device.

Monkeypatches stages out of the step to attribute per-frame time. Run on a
QUIET device (the axon tunnel serializes clients).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import scenelib2_tpu  # noqa: F401
from scenelib2_tpu.config import load_config
from scenelib2_tpu.io.pgm import read_pgm
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod


def build_state(params, cfg):
    s = st.init_state(params, cfg.xv0, cfg.pxx0)
    for kf in cfg.known_features:
        s = st.add_known_feature(s, kf.y, kf.xp_org, read_pgm(kf.patch_path))
    return s


def time_variant(name, params, s0, frames, patches):
    step = step_mod.make_step(params)
    scan = jax.jit(lambda s, f: jax.lax.scan(lambda c, x: step(c, x, True), s, f))
    fstack = jnp.asarray(frames, jnp.uint8)
    s1, _ = scan(s0, fstack)  # same-shape warmup (compile)
    jax.block_until_ready(s1.x)
    t0 = time.perf_counter()
    s2, outs = scan(s0, fstack)
    jax.block_until_ready(s2.x)
    dt = (time.perf_counter() - t0) / len(frames) * 1000
    print(
        f"{name:28s} {dt:7.2f} ms/frame   matched={float(np.asarray(outs.n_matched).mean()):.2f}",
        flush=True,
    )
    return dt


def main():
    from scenelib2_tpu.eval.synthetic import DATASET_VERSION

    cache = f"/tmp/scenelib2_bench_v{DATASET_VERSION}_240"
    frames = np.load(os.path.join(cache, "frames.npy"))[1:49]
    cfg = load_config(os.path.join(cache, "synthetic.cfg"))
    params = dataclasses.replace(cfg.params, max_features=16)
    s0 = build_state(params, cfg)
    print("device:", jax.devices()[0],
          "mode:", "f64" if os.environ.get("SCENELIB2_X64", "1") == "1" else "f32")

    if os.environ.get("SCENELIB2_X64", "1") == "0":
        pparams = dataclasses.replace(params, use_pallas=True)
        time_variant("full_pallas", pparams, s0, frames, None)
    time_variant("full", params, s0, frames, None)

    # particle-stage internals: stub the per-particle prediction math
    from scenelib2_tpu.core import models as models_mod

    orig_ppm = models_mod.part_predict_measurement
    models_mod.part_predict_measurement = lambda cam, y6, xp, lam: (
        jnp.asarray([160.0, 120.0]) + lam,
        jnp.zeros((2, 7)).at[0, 0].set(1e-3),
        jnp.zeros((2, 6)).at[0, 0].set(1e-3),
    )
    time_variant("cheap_part_predict", params, s0, frames, None)
    models_mod.part_predict_measurement = orig_ppm

    from scenelib2_tpu.runtime import state as st_state2

    orig_conv = st_state2.convert_feature
    st_state2.convert_feature = lambda state, idx, mean, cov, m: state
    time_variant("no_convert", params, s0, frames, None)
    st_state2.convert_feature = orig_conv

    # auto-init sub-stage attribution: stub insertion, then detection too
    from scenelib2_tpu.kernels import shi_tomasi as st_mod_k
    from scenelib2_tpu.runtime import state as st_state

    orig_add = st_state.add_partial_feature
    st_state.add_partial_feature = lambda state, cam, h, patch, lam0, enable: state
    time_variant("no_partial_insert", params, s0, frames, None)

    orig_window = st_mod_k.find_best_patch_in_image_window
    st_mod_k.find_best_patch_in_image_window = (
        lambda img, b, ru, rv, ruf, rvf, region_w, region_h: (
            ru + 5, rv + 5, jnp.asarray(30000.0, jnp.float64)
        )
    )
    time_variant("no_insert_no_shitomasi", params, s0, frames, None)
    st_mod_k.find_best_patch_in_image_window = orig_window
    st_state.add_partial_feature = orig_add

    # no auto-init (skip stage 7 heavy work)
    orig_auto = step_mod._auto_initialise
    step_mod._auto_initialise = lambda state, f, cam, p, lam0, want: (state, jnp.asarray(False))
    time_variant("no_auto_init", params, s0, frames, None)

    # also no partial matching
    orig_match = step_mod._match_partial_features
    step_mod._match_partial_features = lambda state, *a, **kw: (
        state, jnp.asarray(False), jnp.int32(0)
    )
    time_variant("no_init_no_partial", params, s0, frames, None)

    # also no cross conv (zero cross maps) and no searches: stub correlate use
    from scenelib2_tpu.kernels import correlate as corr_mod

    orig_cross = corr_mod.cross_sum_maps
    corr_mod.cross_sum_maps = lambda img, patches, b: jnp.zeros(
        (patches.shape[0],) + img.shape, jnp.int32
    )
    time_variant("no_conv_too", params, s0, frames, None)
    corr_mod.cross_sum_maps = orig_cross

    orig_search = corr_mod.elliptical_search_batch
    def no_search(fsums, cross, sg0, sg0sq, u0, v0, h, sinv, act, b, **kw):
        K = u0.shape[0]
        return corr_mod.SearchResult(
            found=jnp.zeros(K, bool), u=jnp.zeros(K, jnp.int32),
            v=jnp.zeros(K, jnp.int32), best=jnp.full(K, 1e6),
            overflow=jnp.zeros(K, bool),
        )
    corr_mod.elliptical_search_batch = no_search
    time_variant("no_search_either", params, s0, frames, None)
    corr_mod.elliptical_search_batch = orig_search

    step_mod._match_partial_features = orig_match
    step_mod._auto_initialise = orig_auto

    # predict+select only is implied by the deltas above
    print("done")


if __name__ == "__main__":
    main()
