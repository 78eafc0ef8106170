"""Heterogeneous-config batching: group clips by static code path.

JuicyTexture's material index selects a compiled code path (gel/metal/wood/
plastic/flesh are different programs, models/texture.py), so a corpus with
mixed materials is processed as one sub-batch per material — each sub-batch
fully vectorized — and scattered back into corpus order. The same helper
serves any processor with `static_params`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def run_grouped(plugin, params: Dict[str, Any], clips,
                static_values: Sequence[int], static_param: str = "material",
                runner: Callable = None):
    """Process [B, C, T] clips where clip i uses static_values[i] for
    `static_param`. Returns (out [B, C, T], per-clip final scores [B]).

    `runner(plugin, params, sub_clips) -> (out, scores)` defaults to a fresh
    streaming run per clip group via Plugin.batched_run.
    """
    clips = jnp.asarray(clips, jnp.float32)
    values = np.asarray(static_values)
    if values.shape[0] != clips.shape[0]:
        raise ValueError("static_values must have one entry per clip")

    if runner is None:
        def runner(plug, p, sub):
            states = jax.vmap(lambda _: plug.init_state())(
                jnp.arange(sub.shape[0]))
            out, _, metrics = plug.batched_run(p, states, sub)
            return out, metrics["score"][-1]

    out = np.zeros(np.asarray(clips).shape, np.float32)
    scores = np.zeros((clips.shape[0],), np.float32)
    for v in np.unique(values):
        idx = np.nonzero(values == v)[0]
        sub_plugin = plugin.with_static(**{static_param: int(v)})
        sub_out, sub_scores = runner(sub_plugin, params, clips[idx])
        out[idx] = np.asarray(sub_out)
        scores[idx] = np.asarray(sub_scores)
    return out, scores
