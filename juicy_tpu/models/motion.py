"""JuicyMotion — anti-repetition variation engine.

Capability rebuild of reference src/plugins/JuicyMotion/PluginProcessor.cpp.
Two-pass block processing:

Pass 1 (mono, cpp:75-95): envelope-gated onset detector (|x| > env·1.35+0.02,
40 ms cooldown); each onset rolls three LCG variation targets (tone /
transient / tail, shifts 7/9/11, cpp:87-92) scaled by microvar; a repetition
accumulator decays ×0.997 per sample. Block level (cpp:97-99):
``repetitionScale`` and ``recovery``.

Pass 2 per channel (cpp:101-142): 20 ms slew of the variation values, a sine
LFO, an LFO/variation-modulated one-pole lowpass (cutoff clamped 120..4200 Hz),
first-difference transient boost, tail feedback, and a contrast-budget
limiter (80 ms envelope).

Reproduced quirks: the slew/LFO state is shared mono state advanced inside
each channel's loop, so stereo advances it twice per block (cpp:108-115); and
the phase wrap subtracts ``2·twoPi`` = 4π when the phase passes 2π
(cpp:114-115) — both preserved exactly.

TPU design: pass 1 and the slew/phase accumulators run as one tiny-carry
``lax.scan`` (bit-faithful sequential float32 op order — the phase integrator
is non-contractive, so closed forms would drift from the reference); the
lowpass / tail / budget-envelope recurrences are linear (some time-varying)
and run as associative scans; all waveshaping is fused elementwise XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.scan_utils import linear_scan
from juicy_tpu.utils.convert import db_to_gain, jlimit, jmap, jmap5, onepole_coeff, tau_coeff

PARAMS = (
    base.ParamSpec("microvar", "Micro Variation", 0.0, 1.0, 0.55),
    base.ParamSpec("motiondepth", "Motion Depth", 0.0, 2.0, 1.0),
    base.ParamSpec("repeatctrl", "Repetition Control", 0.0, 1.0, 0.65),
    base.ParamSpec("budget", "Contrast Budget", 0.0, 1.0, 0.5),
    base.mix_param(1.0),
    base.output_param(-18.0, 18.0, -2.0),
    base.juiciness_param(),
)

PRESETS = ()  # the reference declares no presets for Motion

TWO_PI = jnp.float32(2.0 * 3.14159265358979323846)
FOUR_PI = jnp.float32(4.0 * 3.14159265358979323846)
RNG_SEED = 0x93AB12F0  # PluginProcessor.h:65


def init(sr: float, channels: int):
    """All scalar state zeroed at prepareToPlay (cpp:12-29)."""
    del sr
    z = jnp.float32(0.0)
    return {
        "env": z, "repetition": z, "budget_env": z,
        "variation_tone": z, "variation_transient": z, "variation_tail": z,
        "variation_tone_target": z, "variation_transient_target": z,
        "variation_tail_target": z,
        "onset_cooldown": jnp.int32(0),
        "rng": jnp.uint32(RNG_SEED),
        "tail": jnp.zeros((channels,), jnp.float32),
        "lp": jnp.zeros((channels,), jnp.float32),
        "prev": jnp.zeros((channels,), jnp.float32),
        "motion_phase": z,
    }


def _detection_pass(mono_abs, carry, micro_var, sr):
    """Pass 1 (cpp:75-95): sequential onset detection + RNG target rolls."""
    env_coeff = tau_coeff(0.015, sr)
    cooldown_samples = jnp.int32(int(sr * 0.04))
    one = jnp.float32(1.0)

    def step(c, x):
        env, cooldown, repetition, rng, vt, vtr, vtl = c
        env = env_coeff * env + (one - env_coeff) * x
        cooldown = jnp.maximum(cooldown - 1, 0)
        onset = (x > env * jnp.float32(1.35) + jnp.float32(0.02)) & (cooldown <= 0)
        cooldown = jnp.where(onset, cooldown_samples, cooldown)
        repetition = jnp.where(onset, repetition + one, repetition)
        # Three sequential LCG draws on onset (cpp:87-92).
        r1 = rng * jnp.uint32(1664525) + jnp.uint32(1013904223)
        r2 = r1 * jnp.uint32(1664525) + jnp.uint32(1013904223)
        r3 = r2 * jnp.uint32(1664525) + jnp.uint32(1013904223)

        def draw(r, shift):
            bits = (r >> jnp.uint32(shift)) & jnp.uint32(0x7FFF)
            return bits.astype(jnp.float32) * jnp.float32(1.0 / 16384.0) - one

        vt = jnp.where(onset, draw(r1, 7) * micro_var * jnp.float32(0.9), vt)
        vtr = jnp.where(onset, draw(r2, 9) * micro_var * jnp.float32(0.8), vtr)
        vtl = jnp.where(onset, draw(r3, 11) * micro_var * jnp.float32(0.8), vtl)
        rng = jnp.where(onset, r3, rng)
        repetition = repetition * jnp.float32(0.997)
        return (env, cooldown, repetition, rng, vt, vtr, vtl), None

    batch = mono_abs.shape[:-1]
    init_c = (jnp.broadcast_to(carry["env"], batch),
              jnp.broadcast_to(carry["onset_cooldown"], batch),
              jnp.broadcast_to(carry["repetition"], batch),
              jnp.broadcast_to(carry["rng"], batch),
              jnp.broadcast_to(carry["variation_tone_target"], batch),
              jnp.broadcast_to(carry["variation_transient_target"], batch),
              jnp.broadcast_to(carry["variation_tail_target"], batch))
    final, _ = jax.lax.scan(step, init_c, jnp.moveaxis(mono_abs, -1, 0), unroll=4)
    return final


def _slew_phase_pass(carry_vals, targets, motion_inc, total_steps, var_slew):
    """Shared slew + phase accumulator over C·N steps (cpp:110-115),
    bit-faithful sequential float32 op order."""
    vt_t, vtr_t, vtl_t = targets
    one = jnp.float32(1.0)

    def step(c, _):
        vt, vtr, vtl, phase = c
        vt = var_slew * vt + (one - var_slew) * vt_t
        vtr = var_slew * vtr + (one - var_slew) * vtr_t
        vtl = var_slew * vtl + (one - var_slew) * vtl_t
        phase = phase + motion_inc
        phase = jnp.where(phase > TWO_PI, phase - FOUR_PI, phase)
        return (vt, vtr, vtl, phase), (vt, vtr, vtl, phase)

    final, seqs = jax.lax.scan(step, carry_vals, None, length=total_steps,
                               unroll=8)
    return final, seqs


def process(params, carry, block, sr: float):
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]

    micro_var = jnp.asarray(params["microvar"], jnp.float32)
    motion_depth = jnp.asarray(params["motiondepth"], jnp.float32)
    repeat_ctrl = jnp.asarray(params["repeatctrl"], jnp.float32)
    contrast_budget = jnp.asarray(params["budget"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    out_gain = db_to_gain(params["output"])

    budget_coeff = tau_coeff(0.080, sr)
    tail_feedback = jmap(repeat_ctrl, 0.15, 0.88)
    depth = jlimit(0.0, 2.0, motion_depth)
    motion_rate = jmap(micro_var, 0.25, 2.0) * jmap5(depth, 0.0, 2.0, 0.75, 1.6)
    motion_inc = TWO_PI * motion_rate / jnp.float32(sr)
    var_slew = tau_coeff(0.020, sr)
    one = jnp.float32(1.0)

    # --- pass 1: mono detection (cpp:75-95) ---
    ch1 = min(1, channels - 1)
    mono = jnp.float32(0.5) * (block[..., 0, :] + block[..., ch1, :])
    env, cooldown, repetition, rng, vt_t, vtr_t, vtl_t = _detection_pass(
        jnp.abs(mono), carry, micro_var, sr)

    rep_norm = jlimit(0.0, 1.0, repetition * jnp.float32(0.08))
    repetition_scale = one - repeat_ctrl * rep_norm * jnp.float32(0.65)
    recovery = one + repeat_ctrl * (one - rep_norm) * jnp.float32(0.25)

    # --- shared slew/phase over C·N steps (quirk: advances once per channel
    # per sample, cpp:108-115) ---
    batch = mono.shape[:-1]
    slew_init = (jnp.broadcast_to(carry["variation_tone"], batch),
                 jnp.broadcast_to(carry["variation_transient"], batch),
                 jnp.broadcast_to(carry["variation_tail"], batch),
                 jnp.broadcast_to(carry["motion_phase"], batch))
    (vt_f, vtr_f, vtl_f, phase_f), (vt_s, vtr_s, vtl_s, phase_s) = \
        _slew_phase_pass(slew_init, (vt_t, vtr_t, vtl_t), motion_inc,
                         channels * n, var_slew)
    # scan emits along axis 0: [C·N, ...] -> [..., C, N]
    def resh(s):
        s = jnp.moveaxis(s, 0, -1)
        return s.reshape(s.shape[:-1] + (channels, n))
    vt_s, vtr_s, vtl_s, phase_s = map(resh, (vt_s, vtr_s, vtl_s, phase_s))

    def b(v):   # block-constant scalar -> broadcast over [..., C, N]
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None, None]

    # --- pass 2 rendering (cpp:101-142), parallel over time ---
    dry = block[..., :channels, :]
    ch_offset = jnp.array([0.0, 0.85] + [0.85] * max(0, channels - 2),
                          jnp.float32)[:channels][:, None]
    # Drift-pinned sin/exp (ops/precise.py): the LFO feeds a near-unity tail
    # feedback, so libm-vs-XLA ulps would otherwise amplify past −80 dBFS.
    from juicy_tpu.ops.precise import onepole_coeff32, sin32
    motion_lfo = sin32(phase_s + ch_offset)
    lfo_depth = (jnp.float32(250.0) + jnp.float32(550.0) * b(micro_var)) * \
        (jnp.float32(0.5) + jnp.float32(0.9) * b(depth))
    cutoff = jlimit(120.0, 4200.0,
                    jnp.float32(900.0)
                    + vt_s * jnp.float32(1100.0) * (jnp.float32(0.6) + jnp.float32(0.6) * b(depth))
                    + motion_lfo * lfo_depth)
    lp_coeff = onepole_coeff32(cutoff, sr)

    # Time-varying one-pole lowpass per channel (cpp:122) — associative scan.
    lp = linear_scan(one - lp_coeff, lp_coeff * dry, carry["lp"])
    hp = dry - lp
    prev = jnp.concatenate([jnp.expand_dims(carry["prev"], -1),
                            dry[..., :-1]], axis=-1)
    transient = dry - prev

    transient_boost = one + vtr_s * jnp.float32(1.2) * (jnp.float32(0.6) + jnp.float32(0.7) * b(depth)) \
        + jnp.float32(0.35) * b(micro_var) * motion_lfo * (jnp.float32(0.6) + jnp.float32(0.8) * b(depth))
    tone_shift = lp * (one + vt_s * jnp.float32(0.65) * (jnp.float32(0.55) + jnp.float32(0.7) * b(depth))) \
        + hp * transient_boost \
        + transient * (jnp.float32(0.12) + jnp.float32(0.30) * b(micro_var)) * (jnp.float32(0.5) + jnp.float32(0.8) * b(depth))

    # Time-varying tail feedback (cpp:131) — associative scan.
    fb_seq = jlimit(0.0, 0.93, b(tail_feedback) + vtl_s * jnp.float32(0.06))
    tail = linear_scan(fb_seq, tone_shift, carry["tail"])

    wet = tone_shift * b(repetition_scale) * b(recovery) \
        + (jnp.float32(0.26) + jnp.float32(0.24) * b(micro_var)) \
        * (jnp.float32(0.6) + jnp.float32(0.7) * b(depth)) * tail

    # Contrast-budget limiter env (cpp:134-137): SHARED mono state advanced
    # through ch0's block then ch1's block — thread the scan across channels.
    budget_init = jnp.broadcast_to(carry["budget_env"], batch)
    be_rows = []
    be = budget_init
    for ch in range(channels):
        row = linear_scan(budget_coeff,
                          (one - budget_coeff) * jnp.abs(wet[..., ch, :]),
                          be)
        be = row[..., -1]
        be_rows.append(row)
    budget_env = jnp.stack(be_rows, axis=-2)

    budget_target = jmap(contrast_budget, 0.8, 0.25)
    limiter_gain = jnp.where(budget_env > b(budget_target),
                             b(budget_target) / (budget_env + jnp.float32(1.0e-5)),
                             one)
    wet = wet * limiter_gain

    wet_boost = one + jnp.float32(0.9) * b(micro_var) * (jnp.float32(0.55) + jnp.float32(0.9) * b(depth))
    out = (dry + b(mix) * (wet * wet_boost - dry)) * b(out_gain)

    new_carry = {
        "env": env, "repetition": repetition, "budget_env": be,
        "variation_tone": vt_f, "variation_transient": vtr_f,
        "variation_tail": vtl_f,
        "variation_tone_target": vt_t, "variation_transient_target": vtr_t,
        "variation_tail_target": vtl_t,
        "onset_cooldown": cooldown, "rng": rng,
        "tail": tail[..., -1], "lp": lp[..., -1], "prev": dry[..., -1],
        "motion_phase": phase_f,
    }
    return out, new_carry


base.register(base.ProcessorDef(
    name="motion",
    title="Juicy Motion",
    code="JMOT",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
))
