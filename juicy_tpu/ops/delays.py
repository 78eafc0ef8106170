"""Block-parallel delay lines.

The reference implements delays as ring buffers advanced one sample per loop
iteration (JuicyWidth's 60 ms Haas buffer, JuicyWidth/PluginProcessor.cpp:119-137).
On TPU the same semantics are a *window carry*: the carry holds the last D
samples written; reading a fixed integer delay d within a block is a static
slice of ``concat(carry, block)`` — fully parallel, no per-sample loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def block_delay_read(window, x, delay_samples, axis: int = -1):
    """Read x delayed by `delay_samples` (may be traced, 0 ≤ d ≤ D).

    `window` holds the previous D samples of the delayed signal (oldest
    first) along `axis`; `x` is the current block. Returns the delayed block
    (same shape as x). Equivalent to a ring buffer primed with `window`.
    """
    import jax.lax as lax
    x = jnp.asarray(x, jnp.float32)
    window = jnp.asarray(window, jnp.float32)
    d = window.shape[axis]
    ext = jnp.concatenate([window, x], axis=axis)
    n = x.shape[axis]
    ax = axis % ext.ndim
    starts = [0] * ext.ndim
    starts[ax] = d - delay_samples     # traced ok: dynamic slice
    sizes = list(ext.shape)
    sizes[ax] = n
    return lax.dynamic_slice(ext, starts, sizes)


def update_tail_window(window, x, axis: int = -1):
    """New window = last D samples of concat(window, x) along `axis`."""
    window = jnp.asarray(window, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    d = window.shape[axis]
    ext = jnp.concatenate([window, x], axis=axis)
    idx = [slice(None)] * ext.ndim
    idx[axis % ext.ndim] = slice(ext.shape[axis] - d, None)
    return ext[tuple(idx)]
