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

__all__ = [
    "srand48",
    "Drand48",
    "pack_state",
    "unpack_state",
    "drand48_step",
    "drand48_many",
    "host_drand48_sequence",
]

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


def pack_state(x: int) -> np.ndarray:
    """48-bit LCG state as three 16-bit limbs in a uint32[3] array
    (works identically with and without x64 mode)."""
    return np.array([x & 0xFFFF, (x >> 16) & 0xFFFF, (x >> 32) & 0xFFFF], np.uint32)


def unpack_state(limbs) -> int:
    l = [int(v) for v in np.asarray(limbs)]
    return l[0] | (l[1] << 16) | (l[2] << 32)


def drand48_step(state: jnp.ndarray):
    """One device-side draw on uint32 16-bit limbs: (new_state[3], value).

    16x16-bit partial products fit uint32 exactly, so the 48-bit LCG is exact
    without uint64 (which JAX lacks when x64 is disabled — the fast f32 mode).
    The returned value is new_state / 2^48 in the default float dtype.
    """
    s0 = state[0]
    s1 = state[1]
    s2 = state[2]
    a0 = jnp.uint32(_A & 0xFFFF)
    a1 = jnp.uint32((_A >> 16) & 0xFFFF)
    a2 = jnp.uint32((_A >> 32) & 0xFFFF)
    M16 = jnp.uint32(0xFFFF)

    p0 = s0 * a0 + jnp.uint32(_C)
    r0 = p0 & M16
    carry = p0 >> jnp.uint32(16)
    p1 = s0 * a1 + s1 * a0 + carry
    r1 = p1 & M16
    carry = p1 >> jnp.uint32(16)
    p2 = s0 * a2 + s1 * a1 + s2 * a0 + carry
    r2 = p2 & M16
    new = jnp.stack([r0, r1, r2]).astype(jnp.uint32)
    # exact in f64 (x64 mode); in f32 fast mode the value rounds, which only
    # shifts the random init region by <=1 px — documented fast-mode delta
    val = (
        r2.astype(jnp.float64) * (65536.0 * 65536.0)
        + r1.astype(jnp.float64) * 65536.0
        + r0.astype(jnp.float64)
    ) * (1.0 / float(1 << 48))
    return new, val


def _jump_constants(n: int):
    """Host-precomputed (A^{i+1} mod 2^48, C*(A^i+...+A+1) mod 2^48) limb
    tables for i = 0..n-1, so n sequential LCG steps collapse to one
    vectorized affine map x_i = Ai*x0 + Ci (exact Python ints here)."""
    ai, ci = [], []
    a, c = _A, _C
    for _ in range(n):
        ai.append(a)
        ci.append(c)
        c = (_A * c + _C) & _MASK
        a = (a * _A) & _MASK
    limbs = lambda xs, sh: np.array([(x >> sh) & 0xFFFF for x in xs], np.uint32)
    return (
        limbs(ai, 0), limbs(ai, 16), limbs(ai, 32),
        limbs(ci, 0), limbs(ci, 16), limbs(ci, 32),
    )


def drand48_many(state: jnp.ndarray, n: int):
    """Draw n values; returns (states[n,3], values[n]).

    states[i] is the LCG state after i+1 draws, so callers that consume a
    data-dependent number k of draws can select states[k-1] (or the original
    state for k=0) to keep the stream in lockstep with the reference.

    All n draws are computed in parallel via the closed form
    x_i = A^{i+1} x_0 + C_i mod 2^48 (host-precomputed jump constants):
    ~15 vector ops instead of ~30n sequential scalar ops — the sequential
    form was the largest op cluster in the compiled auto-init branch. Limb
    arithmetic is exact under u32 wraparound for the same reason as
    drand48_step: each output limb only needs the exact low bits of its
    column sum, and u32 addition preserves bits 0..31.
    """
    a0, a1, a2, c0, c1, c2 = (jnp.asarray(v) for v in _jump_constants(n))
    s0, s1, s2 = state[0], state[1], state[2]
    M16 = jnp.uint32(0xFFFF)
    p0 = a0 * s0 + c0
    r0 = p0 & M16
    carry = p0 >> jnp.uint32(16)
    p1 = a0 * s1 + a1 * s0 + c1 + carry
    r1 = p1 & M16
    carry = p1 >> jnp.uint32(16)
    p2 = a0 * s2 + a1 * s1 + a2 * s0 + c2 + carry
    r2 = p2 & M16
    states = jnp.stack([r0, r1, r2], axis=1)                     # [n,3]
    vals = (
        r2.astype(jnp.float64) * (65536.0 * 65536.0)
        + r1.astype(jnp.float64) * 65536.0
        + r0.astype(jnp.float64)
    ) * (1.0 / float(1 << 48))
    return states, vals


def host_drand48_sequence(seed: int, n: int) -> np.ndarray:
    r = Drand48(seed)
    return np.array([r.next() for _ in range(n)], np.float64)
