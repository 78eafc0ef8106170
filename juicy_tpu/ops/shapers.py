"""Stateless waveshaping / matrixing primitives (pure XLA elementwise ops).

These fuse into neighbouring kernels for free; they exist as named helpers so
processors read like the reference math they implement.
"""

from __future__ import annotations

import jax.numpy as jnp


def mid_side_encode(left, right):
    """mid = (L+R)/2, side = (L−R)/2 (reference JuicyWidth/PluginProcessor.cpp:114-115)."""
    half = jnp.float32(0.5)
    return half * (left + right), half * (left - right)


def mid_side_decode(mid, side):
    """L = mid + side, R = mid − side."""
    return mid + side, mid - side
