"""Shared Mosaic-compile gating for the Pallas kernel wrappers."""

from __future__ import annotations

import jax


def default_interpret() -> bool:
    """True when the Mosaic compile path must be avoided and the kernel should
    run in interpret mode (plain XLA lowering, semantics-preserving):

    - non-TPU backends (CPU tests), and
    - ANY process with jax_enable_x64 set: Mosaic custom calls abort the
      axon TPU compiler's layout check (`bitwidth_ <= 32`, layout.h:205)
      whenever x64 is enabled, even for all-f32 kernels — reproduced
      deterministically on 2026-08-17. The live fast mode always runs with
      x64 off, so this only affects benches/tests that mix modes.
    """
    if jax.config.jax_enable_x64:
        return True
    return jax.default_backend() != "tpu" and "axon" not in str(
        jax.devices()[0].platform
    ).lower()
