"""JuicySaturator — harmonic saturator.

Capability rebuild of reference src/plugins/JuicySaturator/PluginProcessor.cpp.
Per sample (cpp:87-97): drive gain → asymmetric skew ``x + a·x²`` → tanh →
one-pole tone lowpass (cutoff mapped tone∈[0,1] → 2500..16000 Hz, cpp:80-81)
→ output gain → dry/wet mix.

TPU design: everything except the tone filter is stateless elementwise math
(pure XLA, fuses into one kernel); the tone one-pole is linear, so it runs as
an O(log N) associative scan — the whole processor is parallel over time with
NO sequential sample loop at all.
"""

from __future__ import annotations

import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.precise import tanh32
from juicy_tpu.ops.scan_utils import onepole_lowpass
from juicy_tpu.utils.convert import db_to_gain, jmap, onepole_coeff

PARAMS = (
    base.ParamSpec("drive", "Drive (dB)", 0.0, 24.0, 6.0),
    base.ParamSpec("asymmetry", "Asymmetry", -0.5, 0.5, 0.1),
    base.ParamSpec("tone", "Tone", 0.0, 1.0, 0.55),
    base.mix_param(1.0),
    base.output_param(-18.0, 18.0, -3.0),
    base.juiciness_param(),
)

# Reference cpp:17-23.
PRESETS = (
    ("Amber Heat",    dict(drive=6.0,  asymmetry=0.1,   tone=0.55, mix=1.0,  output=-3.0)),
    ("Velvet Burn",   dict(drive=11.0, asymmetry=0.2,   tone=0.4,  mix=0.85, output=-6.0)),
    ("Mirror Glow",   dict(drive=8.0,  asymmetry=-0.15, tone=0.75, mix=0.7,  output=-4.0)),
    ("Grain Reactor", dict(drive=18.0, asymmetry=0.35,  tone=0.32, mix=1.0,  output=-10.0)),
    ("Crystal Edge",  dict(drive=4.0,  asymmetry=-0.05, tone=0.9,  mix=0.55, output=-1.0)),
)


def init(sr: float, channels: int):
    """Per-channel tone filter state (cpp:38: toneState zeroed)."""
    del sr
    return {"tone_state": jnp.zeros((channels,), jnp.float32)}


def sat_consts(params, sr):
    """Per-block constants (cpp:74-81)."""
    return dict(
        in_gain=db_to_gain(params["drive"]),
        out_gain=db_to_gain(params["output"]),
        asym=jnp.asarray(params["asymmetry"], jnp.float32),
        mix=jnp.asarray(params["mix"], jnp.float32),
        tone_coeff=onepole_coeff(jmap(params["tone"], 2500.0, 16000.0), sr))


def sat_pre(dry, k, b=lambda v: v):
    """Stateless drive→skew→tanh front (cpp:89-92); rank-polymorphic."""
    driven = dry * b(k["in_gain"])
    skewed = driven + b(k["asym"]) * driven * driven
    return tanh32(skewed)   # pinned: XLA:TPU tanh is 4.4e-5 off libm


def sat_post(dry, toned, k, b=lambda v: v):
    """Output gain + dry/wet after the tone filter (cpp:94-96)."""
    wet = toned * b(k["out_gain"])
    return dry + b(k["mix"]) * (wet - dry)


def process(params, carry, block, sr: float):
    """block [..., C, N] → (out, carry'). Fully parallel over time."""
    dry = jnp.asarray(block, jnp.float32)
    k = sat_consts(params, sr)
    b = lambda v: _bcast(v, dry)  # noqa: E731
    soft = sat_pre(dry, k, b)
    toned = onepole_lowpass(soft, _bcast(k["tone_coeff"], dry), carry["tone_state"])
    out = sat_post(dry, toned, k, b)
    return out, {"tone_state": toned[..., -1]}


def _bcast(v, like):
    """Broadcast a scalar or batched-scalar param against [..., C, N] audio."""
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return v
    return v[..., None, None]


base.register(base.ProcessorDef(
    name="saturator",
    title="Juicy Saturator",
    code="JSAT",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
))
