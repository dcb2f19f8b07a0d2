"""drand48-compatible 48-bit LCG, host (numpy) and device (jax) variants.

The reference seeds ``srand48(0)`` once at init (reference
scenelib2/monoslam.cpp:1968) and consumes two ``drand48()`` values per random
feature-init region try (monoslam.cpp:988-989). Trajectory parity with mapping
enabled therefore requires replicating the exact glibc LCG:

    x_{n+1} = (0x5DEECE66D * x_n + 0xB) mod 2^48,   drand48 -> x_{n+1} / 2^48

``srand48(s)`` sets x = (s << 16) | 0x330E.

The device variant keeps the LCG state inside the jitted step (uint64 under
x64 mode) so the whole per-frame step stays on-device with data-dependent
numbers of draws handled by masked state selection.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_A = 0x5DEECE66D
_C = 0xB
_MASK = (1 << 48) - 1


def srand48(seed: int) -> int:
    """Return the LCG state set by srand48(seed)."""
    return ((seed << 16) | 0x330E) & _MASK


class Drand48:
    """Host-side exact drand48 stream (for oracles and host-driven paths)."""

    def __init__(self, seed: int = 0):
        self.x = srand48(seed)

    def next(self) -> float:
        self.x = (_A * self.x + _C) & _MASK
        return self.x / float(1 << 48)

    def state(self) -> int:
        return self.x


def drand48_step(state: jnp.ndarray):
    """One device-side draw: returns (new_state, value in [0,1))."""
    state = state.astype(jnp.uint64)
    new = (state * jnp.uint64(_A) + jnp.uint64(_C)) & jnp.uint64(_MASK)
    # Exact: 48-bit integers are exactly representable in float64.
    val = new.astype(jnp.float64) * (1.0 / float(1 << 48))
    return new, val


def drand48_many(state: jnp.ndarray, n: int):
    """Draw n values; returns (states[n], values[n]).

    states[i] is the LCG state after i+1 draws, so callers that consume a
    data-dependent number k of draws can select states[k-1] (or the original
    state for k=0) to keep the stream in lockstep with the reference.
    """
    states = []
    vals = []
    s = state
    for _ in range(n):
        s, v = drand48_step(s)
        states.append(s)
        vals.append(v)
    return jnp.stack(states), jnp.stack(vals)


def host_drand48_sequence(seed: int, n: int) -> np.ndarray:
    r = Drand48(seed)
    return np.array([r.next() for _ in range(n)], np.float64)
