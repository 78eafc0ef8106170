"""Corpus-scale batch runner: shard clips over the mesh, aggregate metrics.

The reference meters one track at a time (20 Hz UI poll,
JuicyPluginEditor.cpp:85-90); the framework's serving mode is *offline
juicing / scoring of clip corpora*: thousands of clips per chip, batch
sharded over the ``data`` mesh axis, with corpus-level metric reduction as
the only collective (a jnp.mean over the sharded batch — XLA inserts the
psum over ICI).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from juicy_tpu.analyzer import METRIC_FIELDS
from juicy_tpu.parallel.mesh import batch_sharding, make_mesh
from juicy_tpu.runtime.plugin import Plugin


def corpus_metrics(per_clip_metrics: Dict[str, jnp.ndarray]) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Corpus aggregation of per-clip metric arrays: mean/min/max.

    Under a sharded batch, these reductions become ICI collectives — the
    framework analog of the meter panel's running stats
    (JuicyMeterPanel.cpp:54-71).
    """
    out = {}
    for k, v in per_clip_metrics.items():
        out[k] = {"mean": jnp.mean(v), "min": jnp.min(v), "max": jnp.max(v)}
    return out


def run_corpus(plugin: Plugin, params, clips, mesh: Optional[Mesh] = None,
               automation=None):
    """Process a [B, C, T] corpus; B sharded over the mesh's data axis.

    Returns (out [B, C, T], per-clip final-block metrics, corpus aggregates).
    """
    if mesh is None:
        mesh = make_mesh()
    clips = jnp.asarray(clips, jnp.float32)
    sharding = batch_sharding(mesh, clips.ndim)
    clips = jax.device_put(clips, sharding)

    def one_clip(clip):
        state = plugin.init_state()
        out, state, metrics = plugin.run(params, state, clip,
                                         automation=automation)
        # final-block metrics per clip
        last = {k: v[-1] for k, v in metrics.items()}
        return out, last

    @jax.jit
    def batched(cs):
        out, last = jax.vmap(one_clip)(cs)
        return out, last, corpus_metrics(last)

    return batched(clips)
