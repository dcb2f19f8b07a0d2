"""Multi-chip scaling: batch parallelism + 2-D sharded dense-covariance EKF.

The reference is strictly single-process/single-camera (SURVEY.md §2 audit:
no distributed machinery exists). The TPU-native scale paths built here are:

  1. Batch parallelism (the DP analog): vmap the full go_one_step over B
     independent sequences and shard the batch axis over a 1-D device mesh.
     No collectives are required — XLA keeps every per-sequence state local.
     This is the BASELINE.json "vmap over 64 independent sequences" config.

  2. Sharded-covariance EKF (the TP analog, optional scale path for the
     500-feature stress config): the joint covariance P[D,D] carries a
     NamedSharding over a ('row','col') mesh and the EKF predict/update are
     expressed as plain matmuls with sharding constraints — XLA's SPMD
     partitioner inserts the all-gathers/reduce-scatters over ICI
     (the "annotate shardings, let XLA insert collectives" recipe).

Everything here works identically on a virtual CPU mesh
(xla_force_host_platform_device_count) and a real TPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenelib2_tpu.config import Params
from scenelib2_tpu.runtime import state as st
from scenelib2_tpu.runtime import step as step_mod


def make_mesh(shape, axis_names) -> Mesh:
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, axis_names)


# ------------------------------------------------------------------ batch DP


def make_batched_step(params: Params, mesh: Mesh, axis: str = "data"):
    """vmapped go_one_step with the batch axis sharded over `axis`.

    Returns step_fn(states_b, frames_b, enable_mapping) -> (states_b, outs_b)
    where every pytree leaf of states_b/frames_b has a leading batch dim.
    """
    import dataclasses

    # single-invocation Pallas kernels serialize across a vmapped batch axis;
    # force the vmap-friendly XLA implementations
    step = step_mod.make_step(dataclasses.replace(params, batch_mode=True))
    vstep = jax.vmap(step, in_axes=(0, 0, None))
    batch_sharding = NamedSharding(mesh, P(axis))

    def shard_batch(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*([axis] + [None] * (a.ndim - 1))))
            ),
            tree,
        )

    fn = jax.jit(vstep)
    return fn, shard_batch


def replicate_states(state: st.SlamState, batch: int) -> st.SlamState:
    """Stack B copies of a state with per-sequence RNG offsets."""
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), state
    )
    from scenelib2_tpu.rng import pack_state, srand48

    rngs = jnp.asarray(np.stack([pack_state(srand48(i)) for i in range(batch)]))
    return stacked._replace(rng=rngs)


# --------------------------------------------------------- 2-D sharded EKF


CAM = 13


def sharded_joint_update(mesh: Mesh, D: int, M: int):
    """Build a jitted EKF joint update with P 2-D sharded over ('row','col').

    The small operands (H[M,D] row-replicated, nu, R) stay replicated; the
    heavy O(D^2) products P H' and W S W' run sharded with XLA-inserted
    collectives over ICI.
    """
    row_col = NamedSharding(mesh, P("row", "col"))
    row_vec = NamedSharding(mesh, P("row"))
    repl = NamedSharding(mesh, P())

    def update(x, Pm, H, nu, R):
        S = H @ Pm @ H.T + R
        L = jnp.linalg.cholesky(S)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(L.shape[0], dtype=L.dtype), lower=True
        )
        Sinv = Linv.T @ Linv
        PHt = jax.lax.with_sharding_constraint(Pm @ H.T, NamedSharding(mesh, P("row", None)))
        W = PHt @ Sinv
        x_new = x + W @ nu
        P_new = Pm - W @ S @ W.T
        P_new = jax.lax.with_sharding_constraint(P_new, row_col)
        return x_new, P_new

    return jax.jit(
        update,
        in_shardings=(row_vec, row_col, repl, repl, repl),
        out_shardings=(row_vec, row_col),
    )


def sharded_predict(mesh: Mesh, D: int, delta_t: float = 1 / 30.0,
                    sd_a: float = 4.0, sd_alpha: float = 6.0):
    """Sharded EKF predict with the REAL constant-velocity motion model
    (kalman.cpp:50-69 semantics: xv<-fv, Pxx<-F Pxx F'+Q, Pxy_i<-F Pxy_i).

    F and Q are computed on-device from xv via motion.func_fv_and_dfv_by_dxv /
    func_Q (motion_model.cpp:84-217); only the 13 camera rows/cols transform,
    through one [13,D] matmul XLA partitions over the column axis."""
    from scenelib2_tpu.core import motion

    row_col = NamedSharding(mesh, P("row", "col"))
    row_vec = NamedSharding(mesh, P("row"))
    repl = NamedSharding(mesh, P())

    def predict(x, Pm, u):
        fv, F = motion.func_fv_and_dfv_by_dxv(x[:CAM], u, delta_t)
        Q = motion.func_Q(x[:CAM], delta_t, sd_a, sd_alpha)
        top = F @ Pm[:CAM, :]
        pxx = top[:, :CAM] @ F.T + Q
        Pm = Pm.at[:CAM, :].set(top)
        Pm = Pm.at[:, :CAM].set(top.T)
        Pm = Pm.at[:CAM, :CAM].set(pxx)
        x = x.at[:CAM].set(fv)
        return x, jax.lax.with_sharding_constraint(Pm, row_col)

    return jax.jit(
        predict,
        in_shardings=(row_vec, row_col, repl),
        out_shardings=(row_vec, row_col),
    )


def sharded_slam_frame(mesh: Mesh, D: int, M: int, delta_t: float = 1 / 30.0,
                       sd_a: float = 4.0, sd_alpha: float = 6.0):
    """One full EKF frame on a 2-D sharded covariance: predict (real motion
    model) + joint update + quaternion-normalise + symmetrize — the sharded
    variant of the stress500 step (monoslam.cpp:108-150 filter stages).

    Numerically identical to composing core.ekf.predict / joint_update /
    normalise / symmetrize on an unsharded P (asserted by
    tests/test_parallel.py::test_sharded_frame_matches_dense); the Cholesky of
    the small replicated S uses the same reference-op-order unrolled factor as
    the dense path. XLA's SPMD partitioner inserts all collectives.

    For the real stress500 config (D = 13+6*500 = 3013), pad D up to the next
    mesh-divisible size with identity diagonal rows in P and zero columns in
    H — padding provably leaves the live block bit-identical (zero cross-
    covariance rows stay zero through every product).
    """
    from scenelib2_tpu.core import ekf, motion

    row_col = NamedSharding(mesh, P("row", "col"))
    row_vec = NamedSharding(mesh, P("row"))
    repl = NamedSharding(mesh, P())

    def frame(x, Pm, u, H, nu, R):
        # --- predict (kalman.cpp:50-69) ---
        fv, F = motion.func_fv_and_dfv_by_dxv(x[:CAM], u, delta_t)
        Q = motion.func_Q(x[:CAM], delta_t, sd_a, sd_alpha)
        top = F @ Pm[:CAM, :]
        pxx = top[:, :CAM] @ F.T + Q
        Pm = Pm.at[:CAM, :].set(top)
        Pm = Pm.at[:, :CAM].set(top.T)
        Pm = Pm.at[:CAM, :CAM].set(pxx)
        x = x.at[:CAM].set(fv)
        Pm = jax.lax.with_sharding_constraint(Pm, row_col)

        # --- joint update (kalman.cpp:72-119), S inverted via its Cholesky
        # factor in the reference's op order on the replicated small block ---
        S = H @ Pm @ H.T + R
        Linv = ekf.tril_inv_unrolled(ekf.chol_unrolled(S))
        Sinv = Linv.T @ Linv
        PHt = jax.lax.with_sharding_constraint(
            Pm @ H.T, NamedSharding(mesh, P("row", None))
        )
        W = PHt @ Sinv
        x = x + W @ nu
        Pm = Pm - W @ S @ W.T

        # --- normalise (monoslam.cpp:616-637, covariance-only quirk) ---
        xvn, J = motion.func_xvnorm_and_dxvnorm_by_dxv(x[:CAM])
        topn = J @ Pm[:CAM, :]
        pxxn = topn[:, :CAM] @ J.T
        Pm = Pm.at[:CAM, :].set(topn)
        Pm = Pm.at[:, :CAM].set(topn.T)
        Pm = Pm.at[:CAM, :CAM].set(pxxn)
        x = x.at[:CAM].set(xvn)

        # --- symmetrize (monoslam.cpp:145-150) ---
        Pm = Pm * 0.5 + Pm.T * 0.5
        return x, jax.lax.with_sharding_constraint(Pm, row_col)

    return jax.jit(
        frame,
        in_shardings=(row_vec, row_col, repl, repl, repl, repl),
        out_shardings=(row_vec, row_col),
    )


def sharded_stress_frame(mesh: Mesh, params: Params, n_feat: int,
                         slot_dim: int = 6, n_sel: int = 10):
    """One stress500-scale mapping frame with the REAL measurement stage on a
    2-D sharded covariance: predict (real motion model) + per-slot
    measurement prediction / top-k selection / one-hot H,R packing (the
    shared runtime.assembly.measurement_assembly — the
    construct_total_measurement_stuff analog, monoslam.cpp:548-572) + joint
    update + quaternion-normalise + symmetrize (kalman.cpp:72-119,
    monoslam.cpp:616-637, :145-150).

    Unlike sharded_slam_frame (which takes caller-supplied H/nu/R), H is
    assembled IN the sharded graph from the sharded P's own slot blocks —
    the gathers of Pxx / pxy / pyy and the replicated per-slot chain are part
    of the partitioned computation, so this is the full filter data path a
    stress500 mapping user would run. Measurements are synthetic (z = h +
    0.5 px, every selected feature measured) exactly like the stress500
    bench; decisions (top-k selection) and numerics are asserted equal to
    the unsharded eval.benchmark._make_realistic_ekf_step in
    tests/test_parallel.py::test_sharded_stress_frame_matches_dense.

    Accepts mesh-padded D (pad_for_mesh): the assembly reads only the live
    slot range and pad dims stay exactly zero through every product.

    Returns frame(x, Pm, u) -> (x, Pm, top_idx)."""
    from scenelib2_tpu.core import ekf, motion
    from scenelib2_tpu.core.camera import CameraParams
    from scenelib2_tpu.runtime.assembly import measurement_assembly

    cam = CameraParams.from_params(params)
    row_col = NamedSharding(mesh, P("row", "col"))
    row_vec = NamedSharding(mesh, P("row"))
    repl = NamedSharding(mesh, P())

    def frame(x, Pm, u):
        # --- predict (kalman.cpp:50-69) ---
        fv, F = motion.func_fv_and_dfv_by_dxv(x[:CAM], u, params.delta_t)
        Q = motion.func_Q(x[:CAM], params.delta_t, params.sd_a, params.sd_alpha)
        top = F @ Pm[:CAM, :]
        pxx = top[:, :CAM] @ F.T + Q
        Pm = Pm.at[:CAM, :].set(top)
        Pm = Pm.at[:, :CAM].set(top.T)
        Pm = Pm.at[:CAM, :CAM].set(pxx)
        x = x.at[:CAM].set(fv)
        Pm = jax.lax.with_sharding_constraint(Pm, row_col)

        # --- REAL measurement assembly on the sharded P (monoslam.cpp:548-572)
        # — the slot-block gathers read the sharded array; the small per-slot
        # chain and H/R run replicated ---
        H, R, top_idx, h_sel = measurement_assembly(
            cam, x, Pm, n_feat, slot_dim, n_sel
        )
        H = jax.lax.with_sharding_constraint(H, repl)
        nu = jnp.full((n_sel, 2), 0.5, x.dtype).reshape(2 * n_sel)

        # --- joint update (kalman.cpp:72-119) ---
        S = H @ Pm @ H.T + R
        Linv = ekf.tril_inv_unrolled(ekf.chol_unrolled(S))
        Sinv = Linv.T @ Linv
        PHt = jax.lax.with_sharding_constraint(
            Pm @ H.T, NamedSharding(mesh, P("row", None))
        )
        W = PHt @ Sinv
        x = x + W @ nu
        Pm = Pm - W @ S @ W.T

        # --- normalise (monoslam.cpp:616-637, covariance-only quirk) ---
        xvn, J = motion.func_xvnorm_and_dxvnorm_by_dxv(x[:CAM])
        topn = J @ Pm[:CAM, :]
        pxxn = topn[:, :CAM] @ J.T
        Pm = Pm.at[:CAM, :].set(topn)
        Pm = Pm.at[:, :CAM].set(topn.T)
        Pm = Pm.at[:CAM, :CAM].set(pxxn)
        x = x.at[:CAM].set(xvn)

        # --- symmetrize (monoslam.cpp:145-150) ---
        Pm = Pm * 0.5 + Pm.T * 0.5
        return x, jax.lax.with_sharding_constraint(Pm, row_col), top_idx

    return jax.jit(
        frame,
        in_shardings=(row_vec, row_col, repl),
        out_shardings=(row_vec, row_col, repl),
    )


def pad_for_mesh(D: int, rows: int, cols: int) -> int:
    """Smallest Dp >= D divisible by both mesh axis sizes."""
    import math

    lcm = rows * cols // math.gcd(rows, cols)
    return ((D + lcm - 1) // lcm) * lcm
