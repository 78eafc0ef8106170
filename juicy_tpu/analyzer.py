"""JuicinessAnalyzer: stateful per-sample feature extractor + 0–100 scorer.

Functional rebuild of the reference's shared analyzer
(src/shared/JuicinessAnalyzer.{h,cpp}, 199 LoC C++). The C++ runs one
sequential loop per block doing envelopes, onset detection, band splits and
M/S accumulation together; here the block is decomposed TPU-style:

  * the *nonlinear* part (dual attack/release envelopes + onset counter with
    cooldown, JuicinessAnalyzer.cpp:57-75) runs as one ``lax.scan`` with a
    5-scalar carry — batch-parallel across clips;
  * the *linear* band-split one-poles (cpp:79-84) run as O(log N)
    associative scans;
  * every pure reduction (RMS/peak/crest cpp:95-96, mid/side/correlation
    cpp:86-91,102-109) is a plain vectorized reduction XLA fuses for free.

State threading replaces the C++ mutable members: ``analyze(state, block)``
returns ``(new_state, metrics)``. The same state must be passed through the
pre- and post-DSP calls of a block, exactly like the single analyzer instance
each reference plugin calls twice (e.g. JuicyPunch/PluginProcessor.cpp:82,114).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from juicy_tpu.ops.scan_utils import default_unroll as _default_unroll
from juicy_tpu.utils.convert import jlimit, onepole_coeff, tau_coeff

# Metrics pytree: the 13 floats of the reference JuicinessMetrics struct
# (JuicinessAnalyzer.h:6-21). `score` == postScore for plain analyze() calls;
# pre/post are filled in by the runtime step wrapper.
JuicinessMetrics = Dict[str, jnp.ndarray]

METRIC_FIELDS = (
    "score", "pre_score", "post_score",
    "emphasis", "coherence", "synesthesia", "fatigue_risk",
    "repetition_density",
    "punch", "richness", "clarity", "width", "mono_safety",
)


def zero_metrics() -> JuicinessMetrics:
    m = {k: jnp.float32(0.0) for k in METRIC_FIELDS}
    m["mono_safety"] = jnp.float32(1.0)
    return m


def analyzer_init() -> Dict[str, jnp.ndarray]:
    """Fresh analyzer state (== prepare()/reset(), JuicinessAnalyzer.cpp:13-22)."""
    return {
        "short_env": jnp.float32(0.0),
        "long_env": jnp.float32(0.0),
        "low_state": jnp.float32(0.0),
        "high_state": jnp.float32(0.0),
        "repetition_ema": jnp.float32(0.0),
        "fatigue_ema": jnp.float32(0.0),
        "onset_cooldown": jnp.int32(0),
    }


def _envelope_onset_scan(abs_mono, state, sr: float):
    """Sequential part: dual envelopes + cooldown-gated onset counting.

    Mirrors JuicinessAnalyzer.cpp:57-75 exactly (decrement cooldown, update
    both envelopes, transient = max(0, short−long), onset when transient >
    0.045 with a 35 ms cooldown). Returns final envelope states plus the
    block's serial transient sum and onset count.
    """
    attack_short = tau_coeff(0.003, sr)
    release_short = tau_coeff(0.030, sr)
    attack_long = tau_coeff(0.050, sr)
    release_long = tau_coeff(0.300, sr)
    cooldown_samples = jnp.int32(int(sr * 0.035))
    one = jnp.float32(1.0)

    def step(carry, x):
        s_env, l_env, cooldown, count, accum = carry
        cs = jnp.where(x > s_env, attack_short, release_short)
        s_env = (one - cs) * x + cs * s_env
        cl = jnp.where(x > l_env, attack_long, release_long)
        l_env = (one - cl) * x + cl * l_env
        transient = jnp.maximum(jnp.float32(0.0), s_env - l_env)
        accum = accum + transient
        cooldown = jnp.maximum(cooldown - 1, 0)
        onset = (transient > jnp.float32(0.045)) & (cooldown <= 0)
        count = count + onset.astype(jnp.int32)
        cooldown = jnp.where(onset, cooldown_samples, cooldown)
        return (s_env, l_env, cooldown, count, accum), None

    batch_shape = abs_mono.shape[:-1]
    init = (jnp.broadcast_to(state["short_env"], batch_shape),
            jnp.broadcast_to(state["long_env"], batch_shape),
            jnp.broadcast_to(state["onset_cooldown"], batch_shape),
            jnp.zeros(batch_shape, jnp.int32),
            jnp.zeros(batch_shape, jnp.float32))
    (s_env, l_env, cooldown, count, accum), _ = jax.lax.scan(
        step, init, jnp.moveaxis(abs_mono, -1, 0),
        unroll=_default_unroll())
    return s_env, l_env, cooldown, count, accum


# ---------------------------------------------------------------------------
# Fused-lane form: the analyzer's sequential per-sample work as a composable
# scan body, so the chain executor (runtime/chain_fused.py) can run many
# analyzer instances (one per chain stage, pre and post) inside a handful of
# shared scans instead of one scan per analyze() call.
#
# Carry per lane: (s_env, l_env, cooldown, t_accum, count,
#                  low_state, high_state, low_acc, high_acc)
# The band-energy accumulators run serially in the carry — exactly the C++
# summation order (JuicinessAnalyzer.cpp:79-84) — while the stateless
# reductions (rms/peak/side/corr, cpp:76-96,102-109) are computed vectorized
# from the materialized stream by `stream_stats`.
# ---------------------------------------------------------------------------

def lane_init(state: Dict[str, jnp.ndarray], batch_shape):
    z = jnp.zeros(batch_shape, jnp.float32)
    return (jnp.broadcast_to(state["short_env"], batch_shape),
            jnp.broadcast_to(state["long_env"], batch_shape),
            jnp.broadcast_to(state["onset_cooldown"], batch_shape),
            z, jnp.zeros(batch_shape, jnp.int32),
            jnp.broadcast_to(state["low_state"], batch_shape),
            jnp.broadcast_to(state["high_state"], batch_shape), z, z)


def make_lane_body(sr: float):
    """Per-sample lane body: (carry, l, r) -> carry'. Exact op order of
    JuicinessAnalyzer.cpp:57-92 (envelopes, onset w/ cooldown, band splits,
    serial band-energy accumulation)."""
    attack_short = tau_coeff(0.003, sr)
    release_short = tau_coeff(0.030, sr)
    attack_long = tau_coeff(0.050, sr)
    release_long = tau_coeff(0.300, sr)
    low_coeff = onepole_coeff(250.0, sr)
    high_coeff = onepole_coeff(2500.0, sr)
    cooldown_samples = jnp.int32(int(sr * 0.035))
    one = jnp.float32(1.0)

    def body(c, l, r):
        s_env, l_env, cooldown, accum, count, lo, hi, lo_acc, hi_acc = c
        mono = jnp.float32(0.5) * (l + r)
        x = jnp.abs(mono)
        cs = jnp.where(x > s_env, attack_short, release_short)
        s_env = (one - cs) * x + cs * s_env
        cl = jnp.where(x > l_env, attack_long, release_long)
        l_env = (one - cl) * x + cl * l_env
        transient = jnp.maximum(jnp.float32(0.0), s_env - l_env)
        accum = accum + transient
        cooldown = jnp.maximum(cooldown - 1, 0)
        onset = (transient > jnp.float32(0.045)) & (cooldown <= 0)
        count = count + onset.astype(jnp.int32)
        cooldown = jnp.where(onset, cooldown_samples, cooldown)
        lo = lo + low_coeff * (mono - lo)
        hi = hi + high_coeff * (mono - hi)
        low_v = lo
        high_v = mono - hi
        lo_acc = lo_acc + low_v * low_v
        hi_acc = hi_acc + high_v * high_v
        return (s_env, l_env, cooldown, accum, count, lo, hi, lo_acc, hi_acc)

    return body


def stream_stats(block: jnp.ndarray, channels: int) -> Dict[str, jnp.ndarray]:
    """Stateless per-block reductions of one audio stream [..., C, N]
    (cpp:76-96,102-109). Shared by the pre-lane of stage i+1 and the
    post-lane of stage i, which analyze the same stream."""
    left = block[..., 0, :]
    right = block[..., 1, :] if channels > 1 else left
    mono = jnp.float32(0.5) * (left + right)
    inv_n = jnp.float32(1.0 / block.shape[-1])
    side = jnp.float32(0.5) * (left - right)
    return {
        "rms_accum": jnp.sum(mono * mono, axis=-1),
        "peak": jnp.max(jnp.abs(mono), axis=-1),
        "side_accum": jnp.sum(side * side, axis=-1),
        "corr_accum": jnp.sum(left * right, axis=-1),
        "l_energy": jnp.sqrt(jnp.sum(left * left, axis=-1) * inv_n),
        "r_energy": jnp.sqrt(jnp.sum(right * right, axis=-1) * inv_n),
    }


def lane_finalize(c, state: Dict[str, jnp.ndarray], stats: Dict[str, jnp.ndarray],
                  n: int, sr: float):
    """(final lane carry, prior state, stream stats) -> (state', metrics)."""
    s_env, l_env, cooldown, accum, count, lo, hi, lo_acc, hi_acc = c
    return _finalize_metrics(
        state, s_env, l_env, lo, hi, cooldown, accum, count,
        stats["rms_accum"], stats["peak"], lo_acc, hi_acc,
        stats["side_accum"], stats["rms_accum"], stats["corr_accum"],
        stats["l_energy"], stats["r_energy"], n, sr)


def analyze(state: Dict[str, jnp.ndarray], block: jnp.ndarray, sr: float
            ) -> Tuple[Dict[str, jnp.ndarray], JuicinessMetrics]:
    """Analyze one block [C, N] (or [..., C, N] under vmap); returns (state', metrics).

    Formula-for-formula rebuild of JuicinessAnalyzer::analyze
    (JuicinessAnalyzer.cpp:31-155).
    """
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]
    left = block[..., 0, :]
    right = block[..., 1, :] if channels > 1 else left
    mono = jnp.float32(0.5) * (left + right)
    abs_mono = jnp.abs(mono)

    # --- sequential envelopes + onsets (cpp:57-75) ---
    s_env, l_env, cooldown, onset_count, transient_accum = \
        _envelope_onset_scan(abs_mono, state, sr)

    # --- linear band splits as associative scans (cpp:79-84) ---
    from juicy_tpu.ops.scan_utils import onepole_lowpass
    low_coeff = onepole_coeff(250.0, sr)
    high_coeff = onepole_coeff(2500.0, sr)
    low_seq = onepole_lowpass(mono, low_coeff, state["low_state"])
    high_state_seq = onepole_lowpass(mono, high_coeff, state["high_state"])
    high_seq = mono - high_state_seq

    # --- pure reductions (cpp:76-96, 102-109) ---
    inv_n = jnp.float32(1.0 / n)
    rms_accum = jnp.sum(mono * mono, axis=-1)
    peak = jnp.max(abs_mono, axis=-1)
    low_accum = jnp.sum(low_seq * low_seq, axis=-1)
    high_accum = jnp.sum(high_seq * high_seq, axis=-1)
    # mid == mono (cpp:86); side energy:
    side = jnp.float32(0.5) * (left - right)
    mid_accum = rms_accum
    side_accum = jnp.sum(side * side, axis=-1)
    corr_accum = jnp.sum(left * right, axis=-1)
    l_energy = jnp.sqrt(jnp.sum(left * left, axis=-1) * inv_n)
    r_energy = jnp.sqrt(jnp.sum(right * right, axis=-1) * inv_n)

    return _finalize_metrics(state, s_env, l_env, low_seq[..., -1],
                             high_state_seq[..., -1], cooldown,
                             transient_accum, onset_count, rms_accum, peak,
                             low_accum, high_accum, side_accum, mid_accum,
                             corr_accum, l_energy, r_energy, n, sr)


def _lane_stateless(s_env, l_env, low_state, high_state, cooldown,
                    transient_accum, onset_count, rms_accum, peak,
                    low_accum, high_accum, side_accum, mid_accum,
                    corr_accum, l_energy, r_energy, n: int, sr: float):
    """EMA-independent slice of the score formulas (cpp:94-154): every
    feature/metric that depends only on THIS block's lane accumulators.
    Returns (metrics-without-EMA-fields, ema inputs). Split out so the
    stream finalize can vectorize it over all blocks at once
    (kernels/chain_kernel._finalize_stream); _finalize_metrics composes it
    back with _ema_update for identical results."""
    inv_n = jnp.float32(1.0 / n)
    rms = jnp.sqrt(rms_accum * inv_n + jnp.float32(1.0e-12))
    crest = peak / (rms + jnp.float32(1.0e-6))
    low_energy = low_accum * inv_n
    high_energy = high_accum * inv_n
    low_high_ratio = low_energy / (high_energy + jnp.float32(1.0e-8))
    width_ratio = side_accum / (mid_accum + side_accum + jnp.float32(1.0e-8))

    # correlation normalized by the product of per-channel RMS (cpp:102-109 —
    # note: not a true Pearson correlation, reproduced as-is).
    corr = jlimit(-1.0, 1.0,
                  corr_accum * inv_n / (l_energy * r_energy + jnp.float32(1.0e-6)))

    # --- features (cpp:111-122) ---
    transient_mean = transient_accum * inv_n
    punch = jlimit(0.0, 1.0, jnp.float32(6.0) * transient_mean / (rms + jnp.float32(1.0e-5)))
    richness = jlimit(0.0, 1.0, (jnp.float32(2.3) - crest) * jnp.float32(0.65)
                      + rms * jnp.float32(2.0))

    clarity = jnp.float32(1.0) - jnp.where(
        low_high_ratio > 2.5,
        jlimit(0.0, 0.6, (low_high_ratio - jnp.float32(2.5)) * jnp.float32(0.15)),
        jnp.float32(0.0))
    clarity = clarity - jnp.where(
        high_energy > 0.03,
        jlimit(0.0, 0.5, (high_energy - jnp.float32(0.03)) * jnp.float32(8.0)),
        jnp.float32(0.0))
    clarity = jlimit(0.0, 1.0, clarity)

    width = jlimit(0.0, 1.0, width_ratio * jnp.float32(2.0))
    mono_safety = jlimit(0.0, 1.0, jnp.float32(0.5) * (corr + jnp.float32(1.0)))

    block_seconds = jnp.float32(n / sr)
    onset_rate = onset_count.astype(jnp.float32) / block_seconds

    emphasis = jlimit(0.0, 1.0, jnp.float32(0.62) * punch + jnp.float32(0.38)
                      * jlimit(0.0, 1.0, transient_mean * jnp.float32(8.5)))
    coherence = jlimit(0.0, 1.0, jnp.float32(0.50) * clarity
                       + jnp.float32(0.30) * mono_safety
                       + jnp.float32(0.20) * (jnp.float32(1.0)
                                              - jnp.abs(width - jnp.float32(0.45))))
    synesthesia = jlimit(0.0, 1.0, jnp.float32(0.45) * richness
                         + jnp.float32(0.30) * jlimit(0.0, 1.0, low_high_ratio / jnp.float32(3.5))
                         + jnp.float32(0.25) * jlimit(0.0, 1.0, transient_mean * jnp.float32(5.0)))

    crest_penalty = jlimit(0.0, 1.0, (jnp.float32(1.8) - crest) * jnp.float32(1.1))
    harsh_penalty = jlimit(0.0, 1.0, high_energy * jnp.float32(12.0))

    # --- final score (cpp:139-141) ---
    score = jnp.float32(100.0) * (jnp.float32(0.30) * punch
                                  + jnp.float32(0.25) * richness
                                  + jnp.float32(0.25) * clarity
                                  + jnp.float32(0.20) * width)
    score = score * (jnp.float32(0.6) + jnp.float32(0.4) * mono_safety)
    score = jlimit(0.0, 100.0, score)

    metrics = {
        "score": score,
        "pre_score": jnp.zeros_like(score),
        "post_score": jnp.zeros_like(score),
        "emphasis": emphasis,
        "coherence": coherence,
        "synesthesia": synesthesia,
        "punch": punch,
        "richness": richness,
        "clarity": clarity,
        "width": width,
        "mono_safety": mono_safety,
    }
    ema_in = {"onset_rate": onset_rate, "crest_penalty": crest_penalty,
              "harsh_penalty": harsh_penalty}
    return metrics, ema_in


def _ema_update(repetition_ema, fatigue_ema, ema_in):
    """The only cross-block analyzer recurrence: the repetition/fatigue
    EMA pair, advanced once per analyze()/finalize (cpp:124-137)."""
    repetition_ema = repetition_ema + \
        (ema_in["onset_rate"] - repetition_ema) * jnp.float32(0.08)
    repetition_density = jlimit(0.0, 1.0, repetition_ema / jnp.float32(12.0))

    instant_fatigue = jlimit(0.0, 1.0, jnp.float32(0.35) * ema_in["crest_penalty"]
                             + jnp.float32(0.35) * ema_in["harsh_penalty"]
                             + jnp.float32(0.30) * repetition_density)
    fatigue_ema = fatigue_ema + \
        (instant_fatigue - fatigue_ema) * jnp.float32(0.06)
    fatigue_risk = jlimit(0.0, 1.0, fatigue_ema)
    return repetition_ema, fatigue_ema, repetition_density, fatigue_risk


def _finalize_metrics(state, s_env, l_env, low_state, high_state, cooldown,
                      transient_accum, onset_count, rms_accum, peak,
                      low_accum, high_accum, side_accum, mid_accum,
                      corr_accum, l_energy, r_energy, n: int, sr: float):
    """Score formulas from the block accumulators (cpp:94-154). Shared by the
    scan implementation above, the fused Pallas kernel
    (kernels/analyzer_kernel.py) and — split into _lane_stateless +
    _ema_update — the chain kernel's vectorized stream finalize."""
    metrics, ema_in = _lane_stateless(
        s_env, l_env, low_state, high_state, cooldown, transient_accum,
        onset_count, rms_accum, peak, low_accum, high_accum, side_accum,
        mid_accum, corr_accum, l_energy, r_energy, n, sr)
    repetition_ema, fatigue_ema, repetition_density, fatigue_risk = \
        _ema_update(state["repetition_ema"], state["fatigue_ema"], ema_in)

    new_state = {
        "short_env": s_env,
        "long_env": l_env,
        "low_state": low_state,
        "high_state": high_state,
        "repetition_ema": repetition_ema,
        "fatigue_ema": fatigue_ema,
        "onset_cooldown": cooldown,
    }
    metrics = dict(metrics)
    metrics["repetition_density"] = repetition_density
    metrics["fatigue_risk"] = fatigue_risk
    return new_state, metrics
