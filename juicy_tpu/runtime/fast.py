"""Fused batch execution path.

`fused_step` replaces the two analyzer scans of a plugin step — the dominant
per-block cost, present in every one of the reference's processBlocks — with
the Pallas VMEM-resident kernel (kernels/analyzer_kernel.py), keeping the
processor DSP in plain XLA where it fuses into a handful of elementwise
kernels. For saturator/punch/width/cohere/infer the DSP has no sequential
scan at all, so this path removes every XLA loop from the block.

Requires batch % 1024 == 0 (one (8,128) VPU tile per analyzer grid step).
Semantics are identical to Plugin.batch_step (same oracle suite applies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from juicy_tpu.kernels.analyzer_kernel import TILE, analyze_fused
from juicy_tpu.runtime.plugin import Plugin, _default_finalize


def fused_step(plugin: Plugin, params, states, blocks, interpret: bool = False):
    """One batched step: fused pre-analyze → vmapped DSP → fused post-analyze.

    `blocks`: [B, C, N]; `states`: batched state pytree (leaves [B, ...]).
    Returns (out, new_states, metrics) like vmap(plugin.step).
    """
    b = blocks.shape[0]
    if b % TILE:
        raise ValueError(f"fused path needs batch % {TILE} == 0, got {b}")
    p = plugin.full_params(params)
    sr = plugin.sr

    pre_state, pre = analyze_fused(states["analyzer"], blocks, sr,
                                   interpret=interpret)
    out, dsp = jax.vmap(
        lambda st, blk: plugin.defn.process(p, st, blk, sr))(states["dsp"], blocks)
    post_state, post = analyze_fused(pre_state, out, sr, interpret=interpret)

    finalize = plugin.defn.finalize_metrics or _default_finalize
    metrics = finalize(p, pre, post, dsp)
    return out, {"analyzer": post_state, "dsp": dsp}, metrics


def fused_run(plugin: Plugin, params, states, clips, interpret: bool = False):
    """Stream a [B, C, T] corpus through fused_step in block_size chunks."""
    clips = jnp.asarray(clips, jnp.float32)
    b, c, t = clips.shape
    n = plugin.block_size
    if t % n:
        raise ValueError(f"clip length {t} not divisible by block size {n}")
    nb = t // n
    blocks = jnp.moveaxis(clips.reshape(b, c, nb, n), 2, 0)   # [nb, B, C, n]

    def scan_step(st, blk):
        out, st, metrics = fused_step(plugin, params, st, blk,
                                      interpret=interpret)
        return st, (out, metrics)

    states, (outs, metrics) = jax.lax.scan(scan_step, states, blocks)
    out = jnp.moveaxis(outs, 0, 2).reshape(b, c, t)
    return out, states, metrics


def fused_chain_run(chain, states, clips, interpret: bool = False):
    """Stream a [B, C, T] corpus through a Chain with every stage on the
    fused path. Stage-major like Chain.batched_run: each stage's block scan
    carries only its own state."""
    out = jnp.asarray(clips, jnp.float32)
    new_states, metrics = [], []
    for plug, params, st in zip(chain.plugins, chain.params, states):
        out, st2, m = fused_run(plug, params, st, out, interpret=interpret)
        new_states.append(st2)
        metrics.append(m)
    return out, new_states, metrics
