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


def sharded_predict(mesh: Mesh, D: int):
    """Sharded EKF predict: only the 13 camera rows/cols transform; the
    (D-13)-wide remainder is touched only through one [13,D] matmul that XLA
    partitions over the column axis."""
    row_col = NamedSharding(mesh, P("row", "col"))
    row_vec = NamedSharding(mesh, P("row"))
    repl = NamedSharding(mesh, P())

    CAM = 13

    def predict(x, Pm, F, Q):
        top = F @ Pm[:CAM, :]
        pxx = top[:, :CAM] @ F.T + Q
        Pm = Pm.at[:CAM, :].set(top)
        Pm = Pm.at[:, :CAM].set(top.T)
        Pm = Pm.at[:CAM, :CAM].set(pxx)
        x = x.at[:CAM].set(F @ x[:CAM])  # placeholder linear motion for bench
        return x, jax.lax.with_sharding_constraint(Pm, row_col)

    return jax.jit(
        predict,
        in_shardings=(row_vec, row_col, repl, repl),
        out_shardings=(row_vec, row_col),
    )
