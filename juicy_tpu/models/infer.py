"""JuicyInfer — analysis hub ("metering plugin").

Capability rebuild of reference src/plugins/JuicyInfer/PluginProcessor.cpp.
The audio path is a trim gain only (cpp:74-79); the analyzer runs pre-trim and
post-trim and the post score is scaled by `sensitivity` and clamped to 0..100
(cpp:80-81). The reference reuses its five feature atomics to carry the
triangle metrics (emphasis/coherence/synesthesia/fatigue/repetition) and maps
them back in getLatestMetrics (cpp:85-89,164-181) — reproduced here in
``finalize_metrics`` so a meter consumer sees identical values.
"""

from __future__ import annotations

import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.utils.convert import db_to_gain, jlimit

PARAMS = (
    base.ParamSpec("trim", "Output Trim (dB)", -18.0, 18.0, 0.0),
    base.ParamSpec("sensitivity", "Sensitivity", 0.5, 2.0, 1.0),
    base.juiciness_param(),
    base.ParamSpec("emphasis", "Emphasis", 0.0, 1.0, 0.0, readonly=True),
    base.ParamSpec("coherence", "Coherence", 0.0, 1.0, 0.0, readonly=True),
    base.ParamSpec("synesthesia", "Synesthesia", 0.0, 1.0, 0.0, readonly=True),
    base.ParamSpec("fatigue", "Fatigue Risk", 0.0, 1.0, 0.0, readonly=True),
    base.ParamSpec("repetition", "Repetition Density", 0.0, 1.0, 0.0, readonly=True),
)

# Reference cpp:14-20.
PRESETS = (
    ("Reference Lens",  dict(trim=0.0,  sensitivity=1.0)),
    ("Detail Hunter",   dict(trim=0.0,  sensitivity=1.45)),
    ("Macro Meter",     dict(trim=-6.0, sensitivity=1.7)),
    ("Subtle Scout",    dict(trim=0.0,  sensitivity=0.75)),
    ("Overdrive Audit", dict(trim=-9.0, sensitivity=2.0)),
)


def init(sr: float, channels: int):
    del sr, channels
    return {}


def process(params, carry, block, sr: float):
    del sr
    gain = db_to_gain(params["trim"])
    if jnp.asarray(gain).ndim:
        gain = jnp.asarray(gain)[..., None, None]
    return jnp.asarray(block, jnp.float32) * gain, carry


def finalize_metrics(params, pre, post, carry=None):
    """score = clamp(post.score · sensitivity); feature slots carry the
    triangle metrics (cpp:81,85-89,175-179)."""
    m = dict(post)
    score = jlimit(0.0, 100.0,
                   post["score"] * jnp.asarray(params["sensitivity"], jnp.float32))
    m["score"] = score
    m["pre_score"] = pre["score"]
    m["post_score"] = score
    # getLatestMetrics remap: punch←emphasis, richness←coherence,
    # clarity←synesthesia, width←fatigueRisk, monoSafety←repetitionDensity.
    m["punch"] = post["emphasis"]
    m["richness"] = post["coherence"]
    m["clarity"] = post["synesthesia"]
    m["width"] = post["fatigue_risk"]
    m["mono_safety"] = post["repetition_density"]
    return m


base.register(base.ProcessorDef(
    name="infer",
    title="Juicy Infer",
    code="JINF",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
    finalize_metrics=finalize_metrics,
    show_ghost_stats=True,
    show_triangle_metrics=True,
))
