"""Vectorized LCG noise with the reference's exact integer semantics.

The reference advances a 32-bit LCG ``rng = 1664525·rng + 1013904223`` once
per sample inside its sequential loops (JuicyTexture/PluginProcessor.cpp:239,
JuicyMotion/PluginProcessor.cpp:87-92, seeds 0x12345678 / 0x93ab12f0). An LCG
is an affine map on u32, so the k-th state has the closed form
``rng_k = A_k·rng_0 + B_k (mod 2³²)`` — the whole per-block noise sequence is
computed in parallel on the VPU with zero sequential steps, bit-exact with the
serial C++ loop.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

LCG_A = np.uint32(1664525)
LCG_C = np.uint32(1013904223)


@lru_cache(maxsize=64)
def _jump_coefficients(n: int):
    """(A_k, B_k) for k = 1..n such that rng_k = A_k·rng_0 + B_k (mod 2³²)."""
    a = np.empty(n, dtype=np.uint32)
    b = np.empty(n, dtype=np.uint32)
    ak, bk = 1, 0
    mul, add = int(LCG_A), int(LCG_C)
    for k in range(n):                    # python ints, masked mod 2³²
        ak = (ak * mul) & 0xFFFFFFFF
        bk = (bk * mul + add) & 0xFFFFFFFF
        a[k] = ak
        b[k] = bk
    return a, b


def lcg_sequence(rng0, n: int):
    """All n successor states of `rng0` (uint32 array or scalar), in parallel.

    Returns ``states`` with shape ``rng0.shape + (n,)`` where
    ``states[..., k]`` is the LCG state after k+1 sequential advances.
    """
    a_np, b_np = _jump_coefficients(n)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    rng0 = jnp.asarray(rng0, jnp.uint32)[..., None]
    return rng0 * a + b          # uint32 wraparound == mod 2³²


def lcg_advance(rng0, n: int):
    """The LCG state after exactly n sequential advances (closed form)."""
    if n == 0:
        return jnp.asarray(rng0, jnp.uint32)
    a_np, b_np = _jump_coefficients(n)
    return jnp.asarray(rng0, jnp.uint32) * jnp.uint32(a_np[n - 1]) + jnp.uint32(b_np[n - 1])


def white_from_bits(states, shift: int = 8, mask: int = 0xFFFF,
                    scale: float = 1.0 / 32768.0):
    """Map LCG states to floats the way the reference does.

    JuicyTexture: ``((rng >> 8) & 0xFFFF)/32768 − 1``  (PluginProcessor.cpp:240).
    JuicyMotion:  ``((rng >> s) & 0x7FFF)/16384 − 1``  with s ∈ {7, 9, 11}
    (PluginProcessor.cpp:88-92); pass mask=0x7FFF, scale=1/16384.
    """
    bits = (states >> jnp.uint32(shift)) & jnp.uint32(mask)
    return bits.astype(jnp.float32) * jnp.float32(scale) - jnp.float32(1.0)
