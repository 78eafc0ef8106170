"""JuicyWidth — mid/side widener + Haas decorrelation, mono-safe.

Capability rebuild of reference src/plugins/JuicyWidth/PluginProcessor.cpp.
Stereo only; mono input is an analyzed passthrough (cpp:76-89). Per sample
(cpp:104-138): instantaneous correlation proxy ``clamp(L·R·12, ±1)``; whenever
it dips below −0.1 the *block-local* width copy is multiplied by the
mono-safety limit — a cumulative shrink that resets every block (cpp:93,
109-112; a documented quirk we reproduce exactly). Then M/S widen, a 60 ms
ring-buffer Haas delay on the right channel (cpp:119-130), mix and output gain.

TPU design: the cumulative width shrink is ``width·limit^cumsum(dip)`` — a
parallel prefix sum, not a loop. The ring buffer becomes a window carry of the
last D samples of the wet right channel, so the Haas read is a dynamic slice.
The whole processor is parallel over time.
"""

from __future__ import annotations

import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.delays import block_delay_read, update_tail_window
from juicy_tpu.ops.precise import pow32
from juicy_tpu.utils.convert import db_to_gain, jlimit, jmap

PARAMS = (
    base.ParamSpec("width", "Stereo Width", 0.0, 1.0, 0.45),
    base.ParamSpec("haasMs", "Haas Delay (ms)", 0.0, 35.0, 12.0),
    base.ParamSpec("monoSafe", "Mono Safety", 0.0, 1.0, 0.7),
    base.mix_param(1.0),
    base.output_param(-18.0, 18.0, 0.0),
    base.juiciness_param(),
)

# Reference cpp:17-23.
PRESETS = (
    ("Prism Arc",     dict(width=0.45, haasMs=12.0, monoSafe=0.7,  mix=1.0,  output=0.0)),
    ("Outer Halo",    dict(width=0.9,  haasMs=22.0, monoSafe=0.35, mix=1.0,  output=-1.5)),
    ("Studio Spine",  dict(width=0.35, haasMs=8.0,  monoSafe=0.95, mix=0.8,  output=0.0)),
    ("Ribbon Drift",  dict(width=0.7,  haasMs=16.0, monoSafe=0.55, mix=0.65, output=-0.5)),
    ("Monolith Wide", dict(width=1.0,  haasMs=30.0, monoSafe=0.2,  mix=1.0,  output=-3.0)),
)


def delay_buffer_size(sr: float) -> int:
    """Haas history window size.

    The reference allocates a 60 ms ring (cpp:38-39) but the read head
    never trails the write head by more than ``int(sr·0.035)`` samples
    (haasMs ≤ 35 ms, cpp:92); the window carry only needs that reachable
    history. Sized with headroom and rounded to a multiple of 8 so the
    kernel path's row tiles stay store-aligned (kernels/chain_kernel.py).
    """
    d = int(sr * 0.035) + 16
    return max(8, (d + 7) // 8 * 8)


def init(sr: float, channels: int):
    """Carry = last D samples of the wet right channel (zeros, cpp:40-41).

    The reference also stores wet-left in its ring buffer but never reads it
    (cpp:119,127), so only the right window is state.
    """
    del channels
    return {"haas_window": jnp.zeros((delay_buffer_size(sr),), jnp.float32)}


def process(params, carry, block, sr: float):
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    if channels < 2:
        # Mono early-exit: pure passthrough (cpp:76-89).
        return block, carry

    dry_l = block[..., 0, :]
    dry_r = block[..., 1, :]

    width0 = jnp.asarray(params["width"], jnp.float32)
    mono_safe = jnp.asarray(params["monoSafe"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    out_gain = db_to_gain(params["output"])
    # delaySamples = int(sr * (haasMs · 0.001f))  (cpp:92) — float32 product,
    # truncated toward zero.
    delay_samples = (jnp.float32(sr) * (jnp.asarray(params["haasMs"], jnp.float32)
                                        * jnp.float32(0.001))).astype(jnp.int32)

    def b(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None]

    # Block-local cumulative width shrink (cpp:109-112):
    corr_proxy = jlimit(-1.0, 1.0, dry_l * dry_r * jnp.float32(12.0))
    dynamic_limit = jmap(mono_safe, 1.0, 0.35)
    dips = (corr_proxy < jnp.float32(-0.1)).astype(jnp.float32)
    shrink_pow = jnp.cumsum(dips, axis=-1)        # inclusive: shrink applies
    width_seq = b(width0) * pow32(b(dynamic_limit), shrink_pow)

    mid = jnp.float32(0.5) * (dry_l + dry_r)
    side = jnp.float32(0.5) * (dry_l - dry_r) * (jnp.float32(1.0) + width_seq)
    wet_l = mid + side
    wet_r_pre = mid - side

    # Haas: right channel reads `delay_samples` behind the write head
    # (cpp:119-130); left stays un-delayed.
    wet_r = block_delay_read(carry["haas_window"], wet_r_pre, delay_samples)
    new_window = update_tail_window(carry["haas_window"], wet_r_pre)

    out_l = (dry_l + b(mix) * (wet_l - dry_l)) * b(out_gain)
    out_r = (dry_r + b(mix) * (wet_r - dry_r)) * b(out_gain)
    out = jnp.stack([out_l, out_r], axis=-2)
    if channels > 2:
        out = jnp.concatenate([out, block[..., 2:, :]], axis=-2)
    return out, {"haas_window": new_window}


base.register(base.ProcessorDef(
    name="width",
    title="Juicy Width",
    code="JWID",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
))
