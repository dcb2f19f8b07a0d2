"""scenelib2_tpu — TPU-native JAX rebuild of the SceneLib2 MonoSLAM pipeline.

Capability parity target: hanmekim/SceneLib2 (C++/Eigen/OpenCV reference,
mounted read-only for study at /root/reference). The per-frame
MonoSLAM::GoOneStep loop (reference scenelib2/monoslam.cpp:108-180) is rebuilt
as a single jitted graph over fixed-capacity masked state: the EKF runs as
fused dense XLA ops on one joint covariance, and patch detection/correlation
run as batched full-image kernels that score every candidate at once.

Precision modes:
  - parity mode (default): x64 enabled at import; the EKF core and NSSD
    scoring run in float64, matching the reference's doubles bit-for-bit in
    the integer/decision paths (the parity test suite runs in this mode).
  - fast mode (SCENELIB2_X64=0): x64 stays off and every float64 request
    canonicalizes to float32, cutting the TPU's f64 software-emulation cost.
    All integer image sums remain exact (reduce_window / int32 convs) and the
    drand48 stream is uint32-limb exact in both modes; only fp rounding of
    scores/state differs. Use for throughput; validate with eval.metrics.
"""

import os as _os

import jax as _jax

if _os.environ.get("SCENELIB2_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)
else:
    # fast mode: f32 matmuls must NOT drop to the TPU's default bf16 MXU
    # passes — the EKF covariance products need true f32 (measured: bf16
    # matmuls break matching entirely)
    _jax.config.update("jax_default_matmul_precision", "highest")

from scenelib2_tpu.config import Params, SlamConfig, load_config, parse_cfg_file  # noqa: E402
from scenelib2_tpu.runtime.slam import MonoSLAM  # noqa: E402

__all__ = [
    "Params",
    "SlamConfig",
    "load_config",
    "parse_cfg_file",
    "MonoSLAM",
]

__version__ = "0.1.0"
