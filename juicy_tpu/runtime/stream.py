"""Block-streaming helpers: padding, automation curves, metric streams."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def pad_to_blocks(audio, block_size: int):
    """Zero-pad [..., T] so T is a multiple of block_size; returns (padded, T)."""
    t = audio.shape[-1]
    rem = t % block_size
    if rem == 0:
        return audio, t
    pad = block_size - rem
    widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
    return jnp.pad(jnp.asarray(audio, jnp.float32), widths), t


def automation_curve(values, num_blocks: int):
    """Resample a parameter automation curve to one value per block.

    The reference analog: the host writing APVTS values between processBlock
    calls (parameters are read once per block,
    JuicyPunch/PluginProcessor.cpp:74-80).
    """
    values = np.asarray(values, np.float32)
    if values.ndim == 0:
        return jnp.broadcast_to(jnp.float32(values), (num_blocks,))
    idx = np.linspace(0, len(values) - 1, num_blocks)
    return jnp.asarray(np.interp(idx, np.arange(len(values)), values)
                       .astype(np.float32))


def metrics_to_rows(metrics: Dict[str, jnp.ndarray]):
    """[nb]-per-field metric pytree → list of per-block dicts (for JSONL)."""
    keys = sorted(metrics)
    arrs = {k: np.asarray(metrics[k]) for k in keys}
    nb = len(next(iter(arrs.values())))
    return [{k: float(arrs[k][i]) for k in keys} for i in range(nb)]
