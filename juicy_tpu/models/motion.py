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

TPU design: pass 1 is a tiny-carry ``lax.scan``; pass 2 runs as one fused
batched scan per channel, threading the shared slew/phase/budget state
ch0 → ch1 exactly like the C++ channel loop (bit-faithful f32 op order — the
phase integrator is non-contractive, so reassociated/closed forms would drift
from the reference). Per-sample sin/exp go through the drift-pinned
polynomials in ops/precise.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.scan_utils import default_unroll
from juicy_tpu.utils.convert import db_to_gain, jlimit, jmap, jmap5, tau_coeff

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


def make_p1_step(micro_var, sr):
    """Pass-1 per-sample body (cpp:75-95): envelope-gated onset detection +
    conditional LCG target rolls. Shared by :func:`process` and the fused
    chain executor (runtime/chain_fused.py).

    Carry: (env, cooldown, repetition, rng, vt, vtr, vtl)."""
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

    return step


def p1_init(carry, batch):
    """Pass-1 scan carry from the state dict."""
    return (jnp.broadcast_to(carry["env"], batch),
            jnp.broadcast_to(carry["onset_cooldown"], batch),
            jnp.broadcast_to(carry["repetition"], batch),
            jnp.broadcast_to(carry["rng"], batch),
            jnp.broadcast_to(carry["variation_tone_target"], batch),
            jnp.broadcast_to(carry["variation_transient_target"], batch),
            jnp.broadcast_to(carry["variation_tail_target"], batch))


def block_scales(repetition, repeat_ctrl):
    """Block-level repetition scale + recovery boost (cpp:97-99)."""
    one = jnp.float32(1.0)
    rep_norm = jlimit(0.0, 1.0, repetition * jnp.float32(0.08))
    repetition_scale = one - repeat_ctrl * rep_norm * jnp.float32(0.65)
    recovery = one + repeat_ctrl * (one - rep_norm) * jnp.float32(0.25)
    return repetition_scale, recovery


def _detection_pass(mono_abs, carry, micro_var, sr):
    """Pass 1 (cpp:75-95): sequential onset detection + RNG target rolls."""
    step = make_p1_step(micro_var, sr)
    init_c = p1_init(carry, mono_abs.shape[:-1])
    final, _ = jax.lax.scan(step, init_c, jnp.moveaxis(mono_abs, -1, 0),
                            unroll=default_unroll(4))
    return final





def make_p2_step(consts, targets, scales, ch_offset, sr):
    """Pass-2 per-sample body for one channel (cpp:101-142), threading the
    SHARED slew/LFO/budget state (cpp:108-115 quirk). Shared by
    :func:`process` and the fused chain executor (runtime/chain_fused.py).

    Carry: (vt, vtr, vtl, phase, lp, tail, prev, budget_env)."""
    from juicy_tpu.ops.precise import onepole_coeff32, sin32

    var_slew = consts["var_slew"]
    motion_inc = consts["motion_inc"]
    lfo_depth = consts["lfo_depth"]
    depth = consts["depth"]
    micro_var = consts["micro_var"]
    tail_feedback = consts["tail_feedback"]
    mix = consts["mix"]
    out_gain = consts["out_gain"]
    budget_coeff = consts["budget_coeff"]
    budget_target = consts["budget_target"]
    vt_t, vtr_t, vtl_t = targets
    repetition_scale, recovery = scales
    one = jnp.float32(1.0)
    # local literals (module-level jnp constants would be captured device
    # arrays, which Pallas kernels reject); bit-identical values
    two_pi = jnp.float32(2.0 * 3.14159265358979323846)
    four_pi = jnp.float32(4.0 * 3.14159265358979323846)

    def step(c, d):
        vt, vtr, vtl, phase, lp, tail, prev, be = c
        vt = var_slew * vt + (one - var_slew) * vt_t
        vtr = var_slew * vtr + (one - var_slew) * vtr_t
        vtl = var_slew * vtl + (one - var_slew) * vtl_t
        phase = phase + motion_inc
        phase = jnp.where(phase > two_pi, phase - four_pi, phase)

        lfo = sin32(phase + ch_offset)
        cutoff = jlimit(120.0, 4200.0,
                        jnp.float32(900.0)
                        + vt * jnp.float32(1100.0) * (jnp.float32(0.6) + jnp.float32(0.6) * depth)
                        + lfo * lfo_depth)
        lp_c = onepole_coeff32(cutoff, sr, max_hz=4200.0)
        lp = lp + lp_c * (d - lp)
        hp = d - lp
        transient = d - prev
        prev = d

        transient_boost = one + vtr * jnp.float32(1.2) * (jnp.float32(0.6) + jnp.float32(0.7) * depth) \
            + jnp.float32(0.35) * micro_var * lfo * (jnp.float32(0.6) + jnp.float32(0.8) * depth)
        tone_shift = lp * (one + vt * jnp.float32(0.65) * (jnp.float32(0.55) + jnp.float32(0.7) * depth)) \
            + hp * transient_boost \
            + transient * (jnp.float32(0.12) + jnp.float32(0.30) * micro_var) * (jnp.float32(0.5) + jnp.float32(0.8) * depth)
        tail = tone_shift + tail * jlimit(0.0, 0.93, tail_feedback + vtl * jnp.float32(0.06))

        wet = tone_shift * repetition_scale * recovery \
            + (jnp.float32(0.26) + jnp.float32(0.24) * micro_var) \
            * (jnp.float32(0.6) + jnp.float32(0.7) * depth) * tail
        be = budget_coeff * be + (one - budget_coeff) * jnp.abs(wet)
        limiter_gain = jnp.where(be > budget_target,
                                 budget_target / (be + jnp.float32(1.0e-5)),
                                 one)
        wet = wet * limiter_gain

        wet_boost = one + jnp.float32(0.9) * micro_var * (jnp.float32(0.55) + jnp.float32(0.9) * depth)
        y = (d + mix * (wet * wet_boost - d)) * out_gain
        return (vt, vtr, vtl, phase, lp, tail, prev, be), y

    return step


def p2_consts(params, sr):
    """Pass-2 scalar constants from params (cpp:64-73)."""
    micro_var = jnp.asarray(params["microvar"], jnp.float32)
    motion_depth = jnp.asarray(params["motiondepth"], jnp.float32)
    repeat_ctrl = jnp.asarray(params["repeatctrl"], jnp.float32)
    contrast_budget = jnp.asarray(params["budget"], jnp.float32)
    depth = jlimit(0.0, 2.0, motion_depth)
    motion_rate = jmap(micro_var, 0.25, 2.0) * jmap5(depth, 0.0, 2.0, 0.75, 1.6)
    return dict(
        var_slew=tau_coeff(0.020, sr),
        motion_inc=TWO_PI * motion_rate / jnp.float32(sr),
        lfo_depth=(jnp.float32(250.0) + jnp.float32(550.0) * micro_var)
        * (jnp.float32(0.5) + jnp.float32(0.9) * depth),
        depth=depth, micro_var=micro_var,
        tail_feedback=jmap(repeat_ctrl, 0.15, 0.88),
        mix=jnp.asarray(params["mix"], jnp.float32),
        out_gain=db_to_gain(params["output"]),
        budget_coeff=tau_coeff(0.080, sr),
        budget_target=jmap(contrast_budget, 0.8, 0.25))


def process(params, carry, block, sr: float):
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]

    micro_var = jnp.asarray(params["microvar"], jnp.float32)
    repeat_ctrl = jnp.asarray(params["repeatctrl"], jnp.float32)

    # --- pass 1: mono detection (cpp:75-95) ---
    ch1 = min(1, channels - 1)
    mono = jnp.float32(0.5) * (block[..., 0, :] + block[..., ch1, :])
    env, cooldown, repetition, rng, vt_t, vtr_t, vtl_t = _detection_pass(
        jnp.abs(mono), carry, micro_var, sr)

    repetition_scale, recovery = block_scales(repetition, repeat_ctrl)

    # --- pass 2 (cpp:101-142): per-channel fused scans, threading the SHARED
    # slew/LFO/budget state ch0 → ch1 exactly like the C++ channel loop.
    # Drift-pinned sin/exp (ops/precise.py): the LFO feeds a near-unity tail
    # feedback, so libm-vs-XLA ulps would otherwise amplify past −80 dBFS.
    batch = mono.shape[:-1]
    dry = block[..., :channels, :]
    consts = p2_consts(params, sr)

    def make_step(ch_offset):
        return make_p2_step(consts, (vt_t, vtr_t, vtl_t),
                            (repetition_scale, recovery), ch_offset, sr)


    vt = jnp.broadcast_to(carry["variation_tone"], batch)
    vtr = jnp.broadcast_to(carry["variation_transient"], batch)
    vtl = jnp.broadcast_to(carry["variation_tail"], batch)
    phase = jnp.broadcast_to(carry["motion_phase"], batch)
    be = jnp.broadcast_to(carry["budget_env"], batch)
    lp_f, tail_f, prev_f, outs = [], [], [], []
    for ch in range(channels):
        off = jnp.float32(0.0) if ch == 0 else jnp.float32(0.85)
        lp0 = jnp.broadcast_to(carry["lp"][..., ch], batch)
        tail0 = jnp.broadcast_to(carry["tail"][..., ch], batch)
        prev0 = jnp.broadcast_to(carry["prev"][..., ch], batch)
        (vt, vtr, vtl, phase, lp_c, tail_c, prev_c, be), y_t = jax.lax.scan(
            make_step(off), (vt, vtr, vtl, phase, lp0, tail0, prev0, be),
            jnp.moveaxis(dry[..., ch, :], -1, 0), unroll=default_unroll())
        lp_f.append(lp_c)
        tail_f.append(tail_c)
        prev_f.append(prev_c)
        outs.append(jnp.moveaxis(y_t, 0, -1))
    out = jnp.stack(outs, axis=-2)

    new_carry = {
        "env": env, "repetition": repetition, "budget_env": be,
        "variation_tone": vt, "variation_transient": vtr,
        "variation_tail": vtl,
        "variation_tone_target": vt_t, "variation_transient_target": vtr_t,
        "variation_tail_target": vtl_t,
        "onset_cooldown": cooldown, "rng": rng,
        "tail": jnp.stack(tail_f, axis=-1), "lp": jnp.stack(lp_f, axis=-1),
        "prev": jnp.stack(prev_f, axis=-1),
        "motion_phase": phase,
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
