"""Scalar conversion helpers mirroring the JUCE utility semantics.

These reproduce (in float32) the handful of JUCE helpers the reference suite
leans on, so processor math can cite the same formulas:

  * ``db_to_gain``  = juce::Decibels::decibelsToGain  (−100 dB floor)
  * ``gain_to_db``  = juce::Decibels::gainToDecibels  (−100 dB floor)
  * ``jmap``        = juce::jmap(v01, lo, hi)              (3-arg form)
  * ``jmap5``       = juce::jmap(v, smin, smax, tmin, tmax) (5-arg form)
  * ``jlimit``      = juce::jlimit(lo, hi, v)
  * ``onepole_coeff``: 1 − exp(−2π·f/sr), the one-pole smoothing coefficient
    used throughout the reference (e.g. reference
    src/shared/JuicinessAnalyzer.cpp:8-9).
  * ``tau_coeff``: exp(−1/(sr·τ)), the envelope-follower coefficient
    (e.g. reference src/plugins/JuicyPunch/PluginProcessor.cpp:83-84).

All helpers are jnp-traceable and float32-exact with respect to the C++.
"""

from __future__ import annotations

import jax.numpy as jnp

_MINUS_INFINITY_DB = -100.0


def db_to_gain(db):
    """10^(db/20) with the JUCE −100 dB ⇒ 0 gain floor.

    Evaluated as exp2(db·log2(10)/20) through the drift-pinned exp2_32
    (ops/precise.py): XLA:TPU's pow is ~5e-6 rel off glibc powf, which on a
    full-scale output gain alone is a −106 dBFS null floor."""
    from juicy_tpu.ops.precise import exp2_32
    import math
    db = jnp.asarray(db, jnp.float32)
    gain = exp2_32(db * jnp.float32(math.log2(10.0) / 20.0))
    return jnp.where(db > _MINUS_INFINITY_DB, gain, jnp.float32(0.0))


def gain_to_db(gain):
    """20·log10(gain), floored at −100 dB for non-positive gains.

    Evaluated as (20/log2 10)·log2_32(gain) (pinned; XLA:TPU log is ~1e-4
    abs off libm). The chain kernel's lane finalize uses the identical
    form (kernels/chain_kernel.py g2db) so kernel ≡ fused holds."""
    from juicy_tpu.ops.precise import log2_32
    import math
    gain = jnp.asarray(gain, jnp.float32)
    safe = jnp.maximum(gain, jnp.float32(1e-30))
    db = jnp.float32(20.0 / math.log2(10.0)) * log2_32(safe)
    return jnp.where(gain > 0.0, jnp.maximum(db, _MINUS_INFINITY_DB),
                     jnp.float32(_MINUS_INFINITY_DB))


def jmap(v01, lo, hi):
    """Map a 0..1 value into [lo, hi] (juce::jmap 3-arg form)."""
    v01 = jnp.asarray(v01, jnp.float32)
    return jnp.float32(lo) + v01 * (jnp.float32(hi) - jnp.float32(lo))


def jmap5(v, smin, smax, tmin, tmax):
    """Map v from [smin, smax] into [tmin, tmax] (juce::jmap 5-arg form)."""
    v = jnp.asarray(v, jnp.float32)
    return jnp.float32(tmin) + (jnp.float32(tmax) - jnp.float32(tmin)) * (
        (v - jnp.float32(smin)) / (jnp.float32(smax) - jnp.float32(smin))
    )


def jlimit(lo, hi, v):
    """Clamp v into [lo, hi] (juce::jlimit argument order)."""
    return jnp.clip(jnp.asarray(v, jnp.float32), lo, hi)


def onepole_coeff(freq_hz, sr):
    """1 − exp(−2π·f/sr): one-pole lowpass smoothing coefficient.

    Evaluated through the drift-pinned exp32 (ops/precise.py) so coefficients
    are bit-identical across XLA/numpy — onset-threshold comparisons and
    resonant feedback paths otherwise amplify 1-ulp libm/XLA differences.
    """
    from juicy_tpu.ops.precise import exp32
    freq_hz = jnp.asarray(freq_hz, jnp.float32)
    two_pi = jnp.float32(2.0 * 3.14159265358979323846)
    return jnp.float32(1.0) - exp32(-two_pi * freq_hz / jnp.float32(sr))


def tau_coeff(tau_seconds, sr):
    """exp(−1/(sr·τ)): envelope attack/release coefficient (drift-pinned)."""
    from juicy_tpu.ops.precise import exp32
    return exp32(jnp.float32(-1.0) / jnp.float32(sr * tau_seconds))
