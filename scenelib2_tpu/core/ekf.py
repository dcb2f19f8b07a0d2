"""Dense-covariance EKF on the packed (camera + feature-slot) state.

The reference scatters the joint covariance across per-feature objects
(Pxx/Pxy_/Pyy_/matrix_block_list_) and gathers it into one dense matrix twice
per frame (monoslam.cpp:501-546, kalman.cpp:85-95). Here the dense matrix IS
the storage: one P[D,D] with D = 13 + 6*MAX_F, each feature slot owning a
fixed 6-wide stride (3D points use the first 3 dims; unused dims hold exact
zeros, which propagate as zeros through every EKF operation, so the live-dim
arithmetic is identical to the reference's packed form).

  predict   — kalman.cpp:50-69:   xv<-fv, Pxx<-F Pxx F'+Q, Pxy_i<-F Pxy_i
  update    — kalman.cpp:72-119:  S = H P H' + R, chol-inverse, W = P H' S^-1,
              x += W nu, P -= W S W'; missing/failed measurement rows are
              masked with H=0, nu=0, R=I which provably leaves x,P identical
              to the reference's packed (successes-only) update.
  normalise — monoslam.cpp:616-637 via the quirk Jacobian (see core.motion)
  symmetrize— monoslam.cpp:145-150: P <- P/2 + P'/2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scenelib2_tpu.core import motion

CAM_DIM = 13


def predict(x: jnp.ndarray, P: jnp.ndarray, u: jnp.ndarray, delta_t: float,
            sd_a: float, sd_alpha: float):
    """EKF predict on packed state. Feature rows/cols other than the camera
    cross-terms are untouched (as in the reference)."""
    xv = x[:CAM_DIM]
    fv, F = motion.func_fv_and_dfv_by_dxv(xv, u, delta_t)
    Q = motion.func_Q(xv, delta_t, sd_a, sd_alpha)
    # keep the caller's dtype: under x64 the motion-model literals are f64,
    # which would silently promote an f32 state/covariance
    fv, F, Q = fv.astype(x.dtype), F.astype(x.dtype), Q.astype(x.dtype)

    top = F @ P[:CAM_DIM, :]                      # new [Pxx*, Pxy_0, ...] rows
    pxx = top[:, :CAM_DIM] @ F.T + Q
    P = P.at[:CAM_DIM, :].set(top)
    P = P.at[:, :CAM_DIM].set(top.T)
    P = P.at[:CAM_DIM, :CAM_DIM].set(pxx)
    x = x.at[:CAM_DIM].set(fv)
    return x, P


def normalise(x: jnp.ndarray, P: jnp.ndarray):
    """Quaternion-normalisation covariance transform (state itself unchanged —
    reference quirk, see motion.func_xvnorm_and_dxvnorm_by_dxv)."""
    xv, J = motion.func_xvnorm_and_dxvnorm_by_dxv(x[:CAM_DIM])
    xv, J = xv.astype(x.dtype), J.astype(x.dtype)  # see predict: dtype-preserving
    top = J @ P[:CAM_DIM, :]
    pxx = top[:, :CAM_DIM] @ J.T
    P = P.at[:CAM_DIM, :].set(top)
    P = P.at[:, :CAM_DIM].set(top.T)
    P = P.at[:CAM_DIM, :CAM_DIM].set(pxx)
    return x.at[:CAM_DIM].set(xv), P


def chol2x2(S: jnp.ndarray):
    """Cholesky L of a 2x2 SPD matrix, lower triangular (Eigen LLT order)."""
    l11 = jnp.sqrt(S[0, 0])
    l21 = S[1, 0] / l11
    l22 = jnp.sqrt(S[1, 1] - l21 * l21)
    return jnp.array([[l11, 0.0], [l21, l22]])


def inv2x2_via_chol(S: jnp.ndarray) -> jnp.ndarray:
    """S^-1 = L^-T L^-1 as the reference computes it (monoslam.cpp:371-374)."""
    L = chol2x2(S)
    linv11 = 1.0 / L[0, 0]
    linv22 = 1.0 / L[1, 1]
    linv21 = -L[1, 0] * linv11 * linv22
    Linv = jnp.array([[linv11, 0.0], [linv21, linv22]])
    return Linv.T @ Linv


def chol_unrolled(S: jnp.ndarray) -> jnp.ndarray:
    """Right-looking Cholesky fully unrolled over the (static, small) size.

    XLA's library cholesky lowers to a serial while-loop that costs ~0.5 ms
    per call for a 20x20 f64 on TPU (latency-bound); unrolling turns it into
    a short fused op chain. Same column-order arithmetic as Eigen's LLT.
    """
    M = S.shape[0]
    L = jnp.zeros_like(S)
    for j in range(M):
        if j == 0:
            d = jnp.sqrt(S[0, 0])
            L = L.at[:, 0].set(S[:, 0] / d)
            L = L.at[0, 0].set(d)
        else:
            d = jnp.sqrt(S[j, j] - L[j, :j] @ L[j, :j])
            col = (S[j + 1 :, j] - L[j + 1 :, :j] @ L[j, :j]) / d
            L = L.at[j, j].set(d)
            L = L.at[j + 1 :, j].set(col)
    return L


def tril_inv_unrolled(L: jnp.ndarray) -> jnp.ndarray:
    """Unrolled forward substitution: X = L^-1 for lower-triangular L."""
    M = L.shape[0]
    X = jnp.zeros_like(L)
    eye = jnp.eye(M, dtype=L.dtype)
    for i in range(M):
        if i == 0:
            X = X.at[0, :].set(eye[0] / L[0, 0])
        else:
            X = X.at[i, :].set((eye[i] - L[i, :i] @ X[:i, :]) / L[i, i])
    return X


def joint_update(
    x: jnp.ndarray,       # [D]
    P: jnp.ndarray,       # [D,D]
    H: jnp.ndarray,       # [M,D] measurement Jacobian (zero rows for misses)
    nu: jnp.ndarray,      # [M]   innovations (zero for misses)
    R: jnp.ndarray,       # [M,M] block-diag noise (identity rows for misses)
    pallas_chol: bool = True,
):
    """Joint EKF update (kalman.cpp:96-119).

    S is inverted through its Cholesky factor exactly as the reference does
    (L, L^-1, S^-1 = L^-T L^-1) rather than cho_solve, to stay numerically
    close. Masked rows (H=0, nu=0, R=I) contribute exactly nothing.

    Parity (f64) mode unrolls the factorisation (chol_unrolled) in the
    reference's column order; fast (f32) mode runs factor+invert as one
    Pallas kernel — the unrolled form is ~120 tiny serial ops (~30 us/frame
    of op dispatch on TPU).
    """
    S = H @ P @ H.T + R
    if pallas_chol and S.dtype == jnp.float32:
        from scenelib2_tpu.kernels.pallas_linalg import pallas_chol_inv_lower

        Linv = pallas_chol_inv_lower(S)
    else:
        L = chol_unrolled(S)
        Linv = tril_inv_unrolled(L)
    Sinv = Linv.T @ Linv
    W = P @ H.T @ Sinv
    x_new = x + W @ nu
    P_new = P - W @ S @ W.T
    return x_new, P_new, S


def symmetrize(P: jnp.ndarray) -> jnp.ndarray:
    """P <- 0.5*P + 0.5*P' (monoslam.cpp:145-150)."""
    return P * 0.5 + P.T * 0.5
