"""scenelib2_tpu — TPU-native JAX rebuild of the SceneLib2 MonoSLAM pipeline.

Capability parity target: hanmekim/SceneLib2 (C++/Eigen/OpenCV reference,
mounted read-only for study at /root/reference). The per-frame
MonoSLAM::GoOneStep loop (reference scenelib2/monoslam.cpp:108-180) is rebuilt
as a single jitted graph over fixed-capacity masked state: the EKF runs as
fused dense XLA ops on one joint covariance, and patch detection/correlation
run as batched full-image kernels that score every candidate at once.

The EKF core is float64 (the reference is double throughout and the parity
bar is trajectory RMSE <= 1e-3); x64 mode is enabled at import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

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
