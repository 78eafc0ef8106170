"""JuicyPunch — transient/impact shaper.

Capability rebuild of reference src/plugins/JuicyPunch/PluginProcessor.cpp.
Per channel, per sample (cpp:92-111): fast (τ=1.5 ms) and slow (τ=110 ms)
one-pole followers of |x| (cpp:83-84,96-97); ``transient = max(0, fast−slow)``;
``transientCurve = transient^map(slam, 0.95→0.55)``; punch and sustain gains;
then a soft(tanh)/hard-clip blend and dry/wet mix.

TPU design: only the two |x| followers are sequential — *unbranched* linear
one-poles (same coefficient rising or falling, cpp:96-97). They run as ONE
fused batched scan with a 2-scalar-per-channel carry (sequential beats the
O(N·logN) associative form at corpus batch sizes and is bit-exact vs the
serial C++); everything after the envelopes is stateless elementwise math
that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.precise import pow32, tanh32
from juicy_tpu.ops.scan_utils import default_unroll
from juicy_tpu.utils.convert import db_to_gain, jlimit, jmap, tau_coeff

PARAMS = (
    base.ParamSpec("punch", "Punch", 0.0, 1.5, 0.9),
    base.ParamSpec("sustain", "Sustain", 0.0, 1.5, 0.35),
    base.ParamSpec("slam", "Slam", 0.0, 1.0, 0.65),
    base.ParamSpec("clip", "Clip", 0.0, 1.0, 0.25),
    base.mix_param(1.0),
    base.output_param(-24.0, 18.0, -4.0),
    base.juiciness_param(),
)

# Reference cpp:18-24.
PRESETS = (
    ("Solar Snap",     dict(punch=0.9, sustain=0.35, slam=0.65, clip=0.25, mix=1.0,  output=-4.0)),
    ("Crater Impact",  dict(punch=1.4, sustain=0.2,  slam=0.95, clip=0.65, mix=1.0,  output=-8.0)),
    ("Elastic Slam",   dict(punch=1.1, sustain=0.8,  slam=0.8,  clip=0.4,  mix=0.85, output=-6.0)),
    ("Steel Bounce",   dict(punch=0.7, sustain=0.55, slam=0.45, clip=0.1,  mix=0.75, output=-2.0)),
    ("Apocalypse Tap", dict(punch=1.5, sustain=1.1,  slam=1.0,  clip=1.0,  mix=1.0,  output=-12.0)),
)


def init(sr: float, channels: int):
    """Per-channel fast/slow envelope states (cpp:40-41)."""
    del sr
    z = jnp.zeros((channels,), jnp.float32)
    return {"fast_env": z, "slow_env": z}


def punch_shape(dry, f_env, s_env, params, b=lambda v: v):
    """Stateless per-sample shaping after the envelopes (cpp:99-110).

    Polymorphic over array rank: process() applies it to whole blocks, the
    fused chain executor (runtime/chain_fused.py) to single samples. `b`
    broadcasts batched params against the audio rank."""
    one = jnp.float32(1.0)
    punch_amt = jnp.asarray(params["punch"], jnp.float32)
    sustain_amt = jnp.asarray(params["sustain"], jnp.float32)
    slam_amt = jnp.asarray(params["slam"], jnp.float32)
    clip_amt = jnp.asarray(params["clip"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    out_gain = db_to_gain(params["output"])

    transient = jnp.maximum(jnp.float32(0.0), f_env - s_env)
    curve_exp = jmap(slam_amt, 0.95, 0.55)
    # pow32/tanh32: libm-class pinned transcendentals (ops/precise.py) —
    # XLA:TPU's fast tanh/pow are 4.4e-5/5e-6 off glibc, which alone put
    # the on-chip chain at ~-80 dBFS vs the C++ oracle.
    transient_curve = pow32(transient, b(curve_exp))
    punch_gain = one + (b(punch_amt) * jnp.float32(12.0)
                        + b(slam_amt) * jnp.float32(22.0)) * transient_curve
    sustain_gain = one + (b(sustain_amt) * jnp.float32(4.0)
                          + b(slam_amt) * jnp.float32(1.5)) * \
        jnp.maximum(jnp.float32(0.0), s_env - transient * jnp.float32(0.6))

    wet = dry * punch_gain * sustain_gain
    drive = one + b(clip_amt) * jnp.float32(8.0) + b(slam_amt) * jnp.float32(4.0)
    soft = tanh32(wet * drive) / tanh32(drive)
    hard = jlimit(-0.95, 0.95, wet * (one + b(clip_amt) * jnp.float32(2.0)))
    wet = soft + b(clip_amt) * (hard - soft)

    return (dry + b(mix) * (wet - dry)) * b(out_gain)


def env_coeffs(sr):
    """Fast/slow follower coefficients (cpp:83-84)."""
    return tau_coeff(0.0015, sr), tau_coeff(0.110, sr)


def process(params, carry, block, sr: float):
    dry = jnp.asarray(block, jnp.float32)
    adry = jnp.abs(dry)

    def b(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None, None]

    # Linear envelope followers (cpp:96-97): env' = (1−c)|x| + c·env.
    # One fused sequential scan (exact reference op order); at corpus batch
    # sizes a batched sequential scan outruns the O(N·logN) associative form
    # and is bit-exact vs the serial C++.
    fast_c, slow_c = env_coeffs(sr)
    one = jnp.float32(1.0)

    def env_step(c, a):
        f, s = c
        f = (one - fast_c) * a + fast_c * f
        s = (one - slow_c) * a + slow_c * s
        return (f, s), (f, s)

    (_, _), (f_env_t, s_env_t) = jax.lax.scan(
        env_step, (jnp.broadcast_to(carry["fast_env"], adry.shape[:-1]),
                   jnp.broadcast_to(carry["slow_env"], adry.shape[:-1])),
        jnp.moveaxis(adry, -1, 0), unroll=default_unroll())
    f_env = jnp.moveaxis(f_env_t, 0, -1)
    s_env = jnp.moveaxis(s_env_t, 0, -1)

    out = punch_shape(dry, f_env, s_env, params, b)
    return out, {"fast_env": f_env[..., -1], "slow_env": s_env[..., -1]}


base.register(base.ProcessorDef(
    name="punch",
    title="Juicy Punch",
    code="JPCH",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
))
