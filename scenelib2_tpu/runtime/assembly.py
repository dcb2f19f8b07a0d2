"""Large-map joint measurement assembly: the construct_total_measurement_stuff
analog (reference monoslam.cpp:548-572) on the packed 13 + slot_dim*n_feat
state layout.

Per-slot measurement prediction (projection + Jacobians + S_i + noise,
full_feature_model.cpp:67-195), top-k selection by trace(S)
(monoslam.cpp:187-254), and the one-hot H/R packing — the exact stage
sequence of runtime/step.py stages 2+4 without the image search / masking
machinery (every selected feature is treated as measured; the live masked
variant lives in step.py). Shared by the stress500 benchmark
(eval/benchmark.py) and the sharded-covariance scale path (parallel/mesh.py),
so the multi-chip dryrun exercises the same assembly the benches time.

Works on mesh-padded states: only the [13 : 13 + slot_dim*n_feat] live range
is read, and H columns beyond it are zero, so padding dims never couple in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scenelib2_tpu.core import models
from scenelib2_tpu.core.camera import measurement_noise

CAM_DIM = 13


def measurement_assembly(cam, x, P, n_feat: int, slot_dim: int, n_sel: int):
    """Returns (H_tot [2*n_sel, D], R_tot [2*n_sel, 2*n_sel], top_idx
    [n_sel] i32, h_sel [n_sel, 2]) for the joint EKF update, with every
    matrix assembled exactly as in the live step (one-hot contraction — a
    vmapped dynamic_update_slice lowers to a serial while on TPU)."""
    D = x.shape[0]
    dxp_pad = ((0, 0), (0, CAM_DIM - 7))
    xp = x[:7]
    lo, hi = CAM_DIM, CAM_DIM + slot_dim * n_feat
    # reshape-based slot gathers (same finding as runtime/state.py:304-317);
    # explicit live-range slices so mesh-padded D works
    ys3 = x[lo:hi].reshape(n_feat, slot_dim)[:, :3]
    pxy3 = (
        P[:CAM_DIM, lo:hi]
        .reshape(CAM_DIM, n_feat, slot_dim)
        .transpose(1, 0, 2)[:, :, :3]
    )
    feat = P[lo:hi, lo:hi].reshape(n_feat, slot_dim, n_feat, slot_dim)
    idxf = jnp.arange(n_feat, dtype=jnp.int32)
    pyy3 = feat[idxf, :, idxf, :][:, :3, :3]
    Pxx = P[:CAM_DIM, :CAM_DIM]

    def per_slot(y, pxy_i, pyy_i):
        h, hx7, hy, zeroed = models.full_predict_measurement(cam, y, xp)
        R = measurement_noise(cam, h)
        S = models.innovation_covariance(
            Pxx, pxy_i, pyy_i, jnp.pad(hx7, dxp_pad), hy, R
        )
        # cast back to the state dtype: the camera constants are f64 under
        # x64, which would silently promote an f32 run
        dt = x.dtype
        return (h.astype(dt), hx7.astype(dt), hy.astype(dt),
                R[0, 0].astype(dt), S.astype(dt))

    h_all, hx_all, hy_all, Rd_all, S_all = jax.vmap(per_slot)(ys3, pxy3, pyy3)
    score = S_all[:, 0, 0] + S_all[:, 1, 1]
    _, top_idx = jax.lax.top_k(score, n_sel)
    offs = CAM_DIM + slot_dim * top_idx
    col_ids = offs[:, None] + jnp.arange(3, dtype=top_idx.dtype)[None, :]
    onehot = (
        col_ids[:, :, None] == jnp.arange(D, dtype=jnp.int32)[None, None, :]
    ).astype(x.dtype)
    H_rows = jnp.einsum("kij,kjd->kid", hy_all[top_idx], onehot)
    H_rows = H_rows.at[:, :, :7].set(hx_all[top_idx])
    H_tot = H_rows.reshape(2 * n_sel, D)
    R_tot = (
        jnp.zeros((n_sel, 2, n_sel, 2), x.dtype)
        .at[jnp.arange(n_sel, dtype=jnp.int32), :, jnp.arange(n_sel, dtype=jnp.int32), :]
        .set(Rd_all[top_idx][:, None, None] * jnp.eye(2, dtype=x.dtype))
        .reshape(2 * n_sel, 2 * n_sel)
    )
    return H_tot, R_tot, top_idx, h_all[top_idx]
