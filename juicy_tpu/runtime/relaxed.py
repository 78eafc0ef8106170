"""``fidelity="relaxed"`` — the block-parallel executor tier.

The exact executors (models/*.py scans, kernels/chain_kernel.py) reproduce
the reference's per-sample C++ loops bit-faithfully, which makes every
block a length-N dependent chain: BASELINE.md's measured conclusion is
that the chain kernel saturates VPU issue on those chains and "the next
lever is relaxing per-sample bit-faithfulness". This module is that
lever: each stage's block is solved with O(log N)-depth parallel
primitives instead of a length-N scan, trading a bounded, *measured*
numeric deviation for parallelism:

  * every LINEAR recurrence (one-poles, band splits, tail integrators,
    DC blockers, modal resonators, spring systems, punch's followers)
    solves exactly (reassociation ulps only) via ``ops.scan_utils``
    associative scans — including time-varying coefficients
    (``linear_matrix_scan`` for the 2×2/4×4 material systems);
  * the branching attack/release envelope followers (analyzer
    cpp:57-75, texture cpp:120-124/252-257) use the iterative
    ``ar_envelope_relaxed`` (branch pattern fixed from the previous
    iterate, AR_ITERS refinement passes) — the tier's one true
    approximation (the matrix scans add reassociation noise scaled by
    the resonator Q — metal's floor, measured −66 dBFS);
  * onset detection with cooldown (analyzer cpp:71-75, motion
    cpp:75-95) is solved EXACTLY in parallel: with cooldown ≥ block
    length (35/40 ms vs 512 samples) at most one onset can fire per
    block, so "first qualifying sample" arithmetic replaces the scan;
  * texture's peak-protection limiter (cpp:267-275) composes exactly
    under the (min, affine) semiring: g ↦ min(cap, a·g + b) maps are
    closed under composition, so ``lax.associative_scan`` solves the
    engage/recover recurrence with NO approximation.

Everything here preserves the block-granular semantics (state carried
across blocks, per-block EMAs/quirks); only within-block sample order is
reassociated/approximated. Fidelity is certified against the exact
executor by tests/test_relaxed.py (audio residual and score deltas) and
measured in BENCH_DETAILS.json ``full_chain_relaxed``.

Stage coverage: punch, saturator, width, infer, cohere, motion, and
texture's non-waveguide materials (gel/metal/flesh) run block-parallel;
texture wood/plastic (ring-delay waveguides, in-block feedback through a
knob-dependent lag) falls back to the exact sequential process, as does
any stage not in the registry.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from juicy_tpu import analyzer as _an
from juicy_tpu.ops.envelopes import ar_envelope_relaxed
from juicy_tpu.ops.scan_utils import (leaky_integrator, linear_matrix_scan,
                                      linear_scan, onepole_lowpass)
from juicy_tpu.utils.convert import jlimit, onepole_coeff, tau_coeff

AR_ITERS = 4        # refinement passes for the relaxed a/r envelopes


# ---------------------------------------------------------------------------
# shared parallel helpers
# ---------------------------------------------------------------------------

def _first_onset(eligible, entry_cooldown, n: int, cooldown_samples: int):
    """EXACT parallel onset-with-cooldown for cooldown >= block length.

    `eligible` [..., N] bool: the per-sample trigger condition ignoring the
    cooldown. The exact loop decrements the cooldown BEFORE testing, so
    sample t may fire iff t+1 >= entry_cooldown; after a hit the cooldown
    reloads to `cooldown_samples` >= N, silencing the rest of the block.
    Returns (count [0/1], exit_cooldown, t_onset or n)."""
    t = jnp.arange(n, dtype=jnp.int32)
    ok = eligible & (t + 1 >= entry_cooldown[..., None])
    any_onset = jnp.any(ok, axis=-1)
    t_onset = jnp.argmax(ok, axis=-1).astype(jnp.int32)      # first True
    exit_cd = jnp.where(
        any_onset,
        jnp.int32(cooldown_samples) - (jnp.int32(n) - 1 - t_onset),
        jnp.maximum(entry_cooldown - jnp.int32(n), 0))
    return any_onset.astype(jnp.int32), exit_cd, jnp.where(any_onset, t_onset,
                                                           jnp.int32(n))


def _minaffine_compose(f, g):
    """Compose g∘f for maps x ↦ min(c, a·x + b) with a > 0 (texture's
    peak limiter: engage = min-cap, recover = affine toward 1)."""
    c1, a1, b1 = f
    c2, a2, b2 = g
    return jnp.minimum(c2, a2 * c1 + b2), a2 * a1, a2 * b1 + b2


def min_affine_scan(caps, coeffs, offsets, init, axis: int = 0):
    """Solve g[t] = min(caps[t], coeffs[t]·g[t−1] + offsets[t]) exactly in
    O(log N) depth (associative: the (min, affine) maps are closed under
    composition)."""
    C, A, B = jax.lax.associative_scan(
        _minaffine_compose, (caps, coeffs, offsets), axis=axis)
    return jnp.minimum(C, A * init + B)


# ---------------------------------------------------------------------------
# analyzer
# ---------------------------------------------------------------------------

def analyze_relaxed(state, block, sr: float):
    """Block-parallel JuicinessAnalyzer (same contract as analyzer.analyze).

    Envelopes via ar_envelope_relaxed; onset count exact; band splits were
    already associative in the exact path; score formulas shared."""
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]
    left = block[..., 0, :]
    right = block[..., 1, :] if channels > 1 else left
    mono = jnp.float32(0.5) * (left + right)
    abs_mono = jnp.abs(mono)

    s_env_seq = ar_envelope_relaxed(abs_mono, tau_coeff(0.003, sr),
                                    tau_coeff(0.030, sr),
                                    jnp.broadcast_to(state["short_env"],
                                                     abs_mono.shape[:-1]),
                                    iters=AR_ITERS)
    l_env_seq = ar_envelope_relaxed(abs_mono, tau_coeff(0.050, sr),
                                    tau_coeff(0.300, sr),
                                    jnp.broadcast_to(state["long_env"],
                                                     abs_mono.shape[:-1]),
                                    iters=AR_ITERS)
    transient = jnp.maximum(jnp.float32(0.0), s_env_seq - l_env_seq)
    transient_accum = jnp.sum(transient, axis=-1)
    cooldown_samples = int(sr * 0.035)
    onset_count, cooldown, _ = _first_onset(
        transient > jnp.float32(0.045),
        jnp.broadcast_to(state["onset_cooldown"], abs_mono.shape[:-1]),
        n, cooldown_samples)

    low_coeff = onepole_coeff(250.0, sr)
    high_coeff = onepole_coeff(2500.0, sr)
    low_seq = onepole_lowpass(mono, low_coeff, state["low_state"])
    high_state_seq = onepole_lowpass(mono, high_coeff, state["high_state"])
    high_seq = mono - high_state_seq

    inv_n = jnp.float32(1.0 / n)
    rms_accum = jnp.sum(mono * mono, axis=-1)
    peak = jnp.max(abs_mono, axis=-1)
    low_accum = jnp.sum(low_seq * low_seq, axis=-1)
    high_accum = jnp.sum(high_seq * high_seq, axis=-1)
    side = jnp.float32(0.5) * (left - right)
    side_accum = jnp.sum(side * side, axis=-1)
    corr_accum = jnp.sum(left * right, axis=-1)
    l_energy = jnp.sqrt(jnp.sum(left * left, axis=-1) * inv_n)
    r_energy = jnp.sqrt(jnp.sum(right * right, axis=-1) * inv_n)

    return _an._finalize_metrics(
        state, s_env_seq[..., -1], l_env_seq[..., -1], low_seq[..., -1],
        high_state_seq[..., -1], cooldown, transient_accum, onset_count,
        rms_accum, peak, low_accum, high_accum, side_accum, rms_accum,
        corr_accum, l_energy, r_energy, n, sr)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def _punch_relaxed(params, carry, block, sr: float, static):
    """Punch (cpp:86-112): the two |x| followers are UNBRANCHED one-poles —
    exact associative scans; the shaping is stateless (models/punch.py)."""
    from juicy_tpu.models import punch as _p
    dry = jnp.asarray(block, jnp.float32)
    adry = jnp.abs(dry)
    fast_c, slow_c = _p.env_coeffs(sr)
    one = jnp.float32(1.0)
    f_env = linear_scan(fast_c, (one - fast_c) * adry, carry["fast_env"])
    s_env = linear_scan(slow_c, (one - slow_c) * adry, carry["slow_env"])

    def b(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None, None]

    out = _p.punch_shape(dry, f_env, s_env, params, b)
    return out, {"fast_env": f_env[..., -1], "slow_env": s_env[..., -1]}


def _cohere_relaxed(params, carry, block, sr: float, static):
    """Cohere (cpp:62-118): every recurrence is linear — analysis one-poles
    with persistent state, per-channel split filters re-zeroed each block
    (quirk cpp:103-104), tail leaky integrator. Block-level gains shared
    with the exact path (models/cohere.block_gains)."""
    from juicy_tpu.models import cohere as _c
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]
    tail_amt = jnp.asarray(params["tail"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    from juicy_tpu.utils.convert import db_to_gain
    out_gain = db_to_gain(params["output"])

    ch1 = min(1, channels - 1)
    mono = jnp.float32(0.5) * (block[..., 0, :] + block[..., ch1, :])
    low_coeff = onepole_coeff(220.0, sr)
    high_coeff = onepole_coeff(2400.0, sr)
    lo_seq = onepole_lowpass(mono, low_coeff, carry["analysis_low"])
    hi_seq = onepole_lowpass(mono, high_coeff, carry["analysis_high"])
    low_v = lo_seq
    high_v = mono - hi_seq
    mid_v = mono - low_v - high_v
    inv_n = jnp.float32(1.0 / max(1, n))
    low_e = jnp.sum(low_v * low_v, axis=-1) * inv_n
    mid_e = jnp.sum(mid_v * mid_v, axis=-1) * inv_n
    high_e = jnp.sum(high_v * high_v, axis=-1) * inv_n

    (t_low, t_mid, t_high), context_fit, comps, fb = _c.block_gains(
        carry, low_e, mid_e, high_e, params)

    def bb(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None, None]

    dry = block
    lp_a = onepole_lowpass(dry, low_coeff, jnp.zeros(dry.shape[:-1],
                                                     jnp.float32))
    lp_b = onepole_lowpass(dry, high_coeff, jnp.zeros(dry.shape[:-1],
                                                      jnp.float32))
    low_r = lp_a * bb(comps[0])
    high_r = (dry - lp_b) * bb(comps[2])
    mid_r = (dry - lp_a - (dry - lp_b)) * bb(comps[1])
    matched = low_r + mid_r + high_r
    tail = leaky_integrator(matched, bb(fb), carry["tail"])
    wet = matched + bb(tail_amt) * jnp.float32(0.35) * tail
    out = (dry + bb(mix) * (wet - dry)) * bb(out_gain)

    new_carry = dict(carry)
    new_carry.update({
        "target_low": t_low, "target_mid": t_mid, "target_high": t_high,
        "analysis_low": lo_seq[..., -1], "analysis_high": hi_seq[..., -1],
        "tail": tail[..., -1], "context_fit": context_fit,
    })
    return out, new_carry


def _motion_relaxed(params, carry, block, sr: float, static):
    """Motion (cpp:60-142) block-parallel.

    Pass 1: the gate envelope is an unbranched one-pole (linear_scan);
    onset-with-cooldown solves exactly (40 ms >= block); the repetition
    accumulator is linear; the LCG rolls happen at most once per block so
    the three draws select directly. Pass 2: the slews are one-poles toward
    block-constant targets, the LFO phase advances deterministically
    (closed-form multiply + exact wrap count — the one reassociation vs the
    exact path's serial adds), the modulated-cutoff lowpass is a
    time-varying linear_scan, tail and budget envelopes are linear; the
    shared-state double advance (stereo quirk cpp:108-115) is preserved by
    running ch0 then ch1 with offset closed forms."""
    from juicy_tpu.models import motion as _m
    from juicy_tpu.ops.precise import onepole_coeff32, sin32
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]
    one = jnp.float32(1.0)

    micro_var = jnp.asarray(params["microvar"], jnp.float32)
    repeat_ctrl = jnp.asarray(params["repeatctrl"], jnp.float32)

    # ---- pass 1 ----
    ch1 = min(1, channels - 1)
    mono = jnp.float32(0.5) * (block[..., 0, :] + block[..., ch1, :])
    x = jnp.abs(mono)
    batch = x.shape[:-1]
    env_coeff = tau_coeff(0.015, sr)
    env_seq = linear_scan(env_coeff, (one - env_coeff) * x,
                          jnp.broadcast_to(carry["env"], batch))
    eligible = x > env_seq * jnp.float32(1.35) + jnp.float32(0.02)
    cooldown_samples = int(sr * 0.04)
    count, cooldown, t_onset = _first_onset(
        eligible, jnp.broadcast_to(carry["onset_cooldown"], batch),
        n, cooldown_samples)
    onset_any = count > 0

    # repetition: rep[t] = 0.997·(rep[t−1] + onset[t]) — final value only
    decay = jnp.float32(0.997)
    decay_n = jnp.power(decay, jnp.float32(n))
    # contribution of the single onset at t1: 0.997^(n−t1)
    contrib = jnp.where(
        onset_any,
        jnp.power(decay, (jnp.int32(n) - t_onset).astype(jnp.float32)),
        jnp.float32(0.0))
    repetition = jnp.broadcast_to(carry["repetition"], batch) * decay_n \
        + contrib

    # LCG rolls: exactly three draws at the (single) onset
    rng0 = jnp.broadcast_to(carry["rng"], batch)
    r1 = rng0 * jnp.uint32(1664525) + jnp.uint32(1013904223)
    r2 = r1 * jnp.uint32(1664525) + jnp.uint32(1013904223)
    r3 = r2 * jnp.uint32(1664525) + jnp.uint32(1013904223)

    def draw(r, shift):
        bits = (r >> jnp.uint32(shift)) & jnp.uint32(0x7FFF)
        return bits.astype(jnp.float32) * jnp.float32(1.0 / 16384.0) - one

    vt_t = jnp.where(onset_any, draw(r1, 7) * micro_var * jnp.float32(0.9),
                     jnp.broadcast_to(carry["variation_tone_target"], batch))
    vtr_t = jnp.where(onset_any, draw(r2, 9) * micro_var * jnp.float32(0.8),
                      jnp.broadcast_to(carry["variation_transient_target"],
                                       batch))
    vtl_t = jnp.where(onset_any, draw(r3, 11) * micro_var * jnp.float32(0.8),
                      jnp.broadcast_to(carry["variation_tail_target"], batch))
    rng = jnp.where(onset_any, r3, rng0)

    repetition_scale, recovery = _m.block_scales(repetition, repeat_ctrl)
    consts = _m.p2_consts(params, sr)

    # ---- pass 2 (shared slew/phase/budget advanced ch0 then ch1) ----
    var_slew = consts["var_slew"]
    t_idx = jnp.arange(n, dtype=jnp.float32)

    def slewed(v0, target, step0):
        # v[k] = a^k·v0 + (1−a^k)·target, k = step0+1 … step0+n
        k = t_idx + jnp.float32(step0 + 1)
        ak = jnp.power(var_slew, k)
        return ak * v0[..., None] + (one - ak) * target[..., None]

    def phase_seq(p0, step0):
        # serial: phase += inc; if phase > 2π: phase −= 4π. inc·n << 2π per
        # block for all rates, so at most one wrap per block; replicate the
        # wrap exactly on the closed-form ramp.
        k = t_idx + jnp.float32(step0 + 1)
        u = p0[..., None] + consts["motion_inc"] * k
        two_pi, four_pi = _m.TWO_PI, _m.FOUR_PI
        wraps = jnp.cumsum((u > two_pi).astype(jnp.float32), axis=-1)
        wraps = jnp.minimum(wraps, jnp.float32(1.0))
        # after a wrap the ramp continues 4π lower; further wraps would
        # need u > 2π + 4π which inc·n cannot reach in one block
        return u - four_pi * wraps

    dry = block[..., :channels, :]
    vt0 = jnp.broadcast_to(carry["variation_tone"], batch)
    vtr0 = jnp.broadcast_to(carry["variation_transient"], batch)
    vtl0 = jnp.broadcast_to(carry["variation_tail"], batch)
    phase0 = jnp.broadcast_to(carry["motion_phase"], batch)
    be0 = jnp.broadcast_to(carry["budget_env"], batch)

    lp_f, tail_f, prev_f, outs = [], [], [], []
    for ch in range(channels):
        off = jnp.float32(0.0) if ch == 0 else jnp.float32(0.85)
        step0 = ch * n
        vt = slewed(vt0, vt_t, step0)
        vtr = slewed(vtr0, vtr_t, step0)
        vtl = slewed(vtl0, vtl_t, step0)
        phase = phase_seq(phase0, step0)
        d = dry[..., ch, :]

        lfo = sin32(phase + off)
        depth = consts["depth"]
        cutoff = jlimit(120.0, 4200.0,
                        jnp.float32(900.0)
                        + vt * jnp.float32(1100.0) * (jnp.float32(0.6)
                                                      + jnp.float32(0.6) * depth)
                        + lfo * consts["lfo_depth"])
        lp_c = onepole_coeff32(cutoff, sr, max_hz=4200.0)
        lp = linear_scan(one - lp_c, lp_c * d,
                         jnp.broadcast_to(carry["lp"][..., ch], batch))
        hp = d - lp
        prev0 = jnp.broadcast_to(carry["prev"][..., ch], batch)
        transient = d - jnp.concatenate([prev0[..., None], d[..., :-1]],
                                        axis=-1)

        mv = consts["micro_var"]
        transient_boost = one + vtr * jnp.float32(1.2) * (jnp.float32(0.6) + jnp.float32(0.7) * depth) \
            + jnp.float32(0.35) * mv * lfo * (jnp.float32(0.6) + jnp.float32(0.8) * depth)
        tone_shift = lp * (one + vt * jnp.float32(0.65) * (jnp.float32(0.55) + jnp.float32(0.7) * depth)) \
            + hp * transient_boost \
            + transient * (jnp.float32(0.12) + jnp.float32(0.30) * mv) * (jnp.float32(0.5) + jnp.float32(0.8) * depth)
        tail_fb = jlimit(0.0, 0.93, consts["tail_feedback"]
                         + vtl * jnp.float32(0.06))
        tail = linear_scan(tail_fb, tone_shift,
                           jnp.broadcast_to(carry["tail"][..., ch], batch))

        wet_pre = tone_shift * repetition_scale[..., None] * recovery[..., None] \
            + (jnp.float32(0.26) + jnp.float32(0.24) * mv) \
            * (jnp.float32(0.6) + jnp.float32(0.7) * depth) * tail
        bc = consts["budget_coeff"]
        be = linear_scan(bc, (one - bc) * jnp.abs(wet_pre), be0)
        limiter_gain = jnp.where(be > consts["budget_target"],
                                 consts["budget_target"] / (be + jnp.float32(1.0e-5)),
                                 one)
        wet = wet_pre * limiter_gain
        wet_boost = one + jnp.float32(0.9) * mv * (jnp.float32(0.55) + jnp.float32(0.9) * depth)
        y = (d + consts["mix"] * (wet * wet_boost - d)) * consts["out_gain"]

        outs.append(y)
        lp_f.append(lp[..., -1])
        tail_f.append(tail[..., -1])
        prev_f.append(d[..., -1])
        vt0f, vtr0f, vtl0f = vt[..., -1], vtr[..., -1], vtl[..., -1]
        phase0f = phase[..., -1]
        be0 = be[..., -1]

    out = jnp.stack(outs, axis=-2)
    new_carry = dict(carry)
    new_carry.update({
        "env": env_seq[..., -1], "repetition": repetition,
        "budget_env": be0,
        "variation_tone": vt0f, "variation_transient": vtr0f,
        "variation_tail": vtl0f,
        "variation_tone_target": vt_t,
        "variation_transient_target": vtr_t,
        "variation_tail_target": vtl_t,
        "onset_cooldown": cooldown, "rng": rng,
        "tail": jnp.stack(tail_f, axis=-1),
        "lp": jnp.stack(lp_f, axis=-1),
        "prev": jnp.stack(prev_f, axis=-1),
        "motion_phase": phase0f,
    })
    return out, new_carry


def _texture_relaxed(params, carry, block, sr: float, static):
    """Texture (cpp:107-277) block-parallel for the non-waveguide
    materials (gel=0, metal=1, flesh=4). Envelopes relax; the material
    spring/modal systems are (time-varying) linear → matrix scans; tail /
    DC / noise-HP are linear; the peak limiter solves exactly in the
    (min, affine) semiring. Wood/plastic raise (the ring-delay feedback
    has a knob-dependent in-block lag — callers fall back to exact)."""
    from juicy_tpu.models import texture as _t
    from juicy_tpu.ops.precise import tanh32
    mode = static if static is not None else _t.static_material(params)
    if mode not in (0, 1, 4):
        raise NotImplementedError(
            "relaxed texture supports gel/metal/flesh; waveguide materials "
            "(wood/plastic) use the exact executor")
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]
    one = jnp.float32(1.0)
    L = _t.waveguide_size(sr)
    kc, _extract, _mstep, _pack = _t.block_consts(params, sr, mode, L)

    d = block
    batch = d.shape[:-1]                       # [..., C]

    # exact per-channel LCG noise (same draws as the exact executor)
    w, rng_f = _t.block_noise(carry["rng"], channels, n)
    w = jnp.broadcast_to(w, batch + (n,))

    driven = d * kc["in_trim"]
    adry = jnp.abs(d)
    env = ar_envelope_relaxed(adry, kc["env_atk"], kc["env_rel"],
                              jnp.broadcast_to(carry["env"], batch),
                              iters=AR_ITERS)
    impact = jlimit(0.0, 1.0,
                    jnp.maximum(jnp.float32(0.0), adry - env) * jnp.float32(10.0))
    body = jlimit(0.0, 1.0, env * jnp.float32(3.2))
    trail = jlimit(0.0, 1.0, one - impact) * kc["tail_shape"]

    lp = onepole_lowpass(driven, kc["split_low"],
                         jnp.broadcast_to(carry["lp"], batch))
    hp = onepole_lowpass(driven, kc["split_high"],
                         jnp.broadcast_to(carry["hp"], batch))
    low = lp * kc["low_boost"]
    high = driven - hp
    mid = driven - lp - high
    core = low + mid + high * (jnp.float32(0.9)
                               + kc["texture"] * jnp.float32(1.3))

    from juicy_tpu.utils.convert import jmap as _jm
    damping_amt = jlimit(0.0, 1.0, jnp.asarray(params["damping"],
                                               jnp.float32))
    mp = dict(texture=kc["texture"], tailshape=kc["tail_shape"],
              damping_amt=damping_amt,
              damping_mul=_jm(damping_amt, 1.35, 0.40),
              weight=jnp.asarray(params["weight"], jnp.float32))
    mc = _t.material_consts(mode, mp, sr, L)
    if mode == 0:       # gel: time-varying 2×2 spring (cdamp from trail)
        zeta = jnp.float32(0.62) + trail * (jnp.float32(1.45) - jnp.float32(0.62))
        cdamp = jnp.float32(2.0) * zeta * mc["omega"]
        k = mc["k"]
        force = core * (jnp.float32(0.52) + jnp.float32(0.62) * body)
        # state [vel, pos]: vel' = (1−cdamp)·vel − k·pos + k·force;
        #                   pos' = vel' + pos
        a11 = one - cdamp
        a12 = jnp.broadcast_to(-k, a11.shape)
        mats = jnp.stack([jnp.stack([a11, a12], axis=-1),
                          jnp.stack([a11, one - k + jnp.zeros_like(a11)],
                                    axis=-1)], axis=-2)
        vec = k * force
        vecs = jnp.stack([vec, vec], axis=-1)
        init = jnp.stack([jnp.broadcast_to(carry["spring_vel"], batch),
                          jnp.broadcast_to(carry["spring_pos"], batch)],
                         axis=-1)
        xs = linear_matrix_scan(jnp.moveaxis(mats, -3, 0),
                                jnp.moveaxis(vecs, -2, 0), init)
        vel_seq = jnp.moveaxis(xs[..., 0], 0, -1)
        pos_seq = jnp.moveaxis(xs[..., 1], 0, -1)
        shaped = jnp.float32(0.48) * core + jnp.float32(1.85) * pos_seq
        shaped = tanh32(shaped * (jnp.float32(0.96)
                                  + jnp.float32(0.28) * kc["texture"]))
        mat_updates = {"spring_pos": pos_seq[..., -1],
                       "spring_vel": vel_seq[..., -1]}
    elif mode == 1:     # metal: 4 modes, per-sample a1 via bend
        exc = core * (jnp.float32(0.19) + jnp.float32(0.52) * impact)
        bend = one + jnp.float32(0.09) * impact
        a1, a2 = _t._modal_coeffs(mc["f0"] * mc["ratios"] * bend[..., None],
                                  mc["t60s"], sr)
        # bend [..., C, N] → a1 [..., C, N, 4]; a2 = −r² is per-mode only
        a2 = jnp.broadcast_to(a2, a1.shape)
        z = jnp.zeros_like(a1)
        mats = jnp.stack([jnp.stack([a1, a2], axis=-1),
                          jnp.stack([jnp.ones_like(a1), z], axis=-1)],
                         axis=-2)                      # [..., C, N, 4, 2, 2]
        vec = exc[..., None] * mc["gains"]             # [..., C, N, 4]
        vecs = jnp.stack([vec, jnp.zeros_like(vec)], axis=-1)
        init = jnp.stack([jnp.broadcast_to(carry["modal_y1"],
                                           batch + (4,)),
                          jnp.broadcast_to(carry["modal_y2"],
                                           batch + (4,))], axis=-1)
        xs = linear_matrix_scan(jnp.moveaxis(mats, -4, 0),
                                jnp.moveaxis(vecs, -3, 0), init)
        y_seq = jnp.moveaxis(xs[..., 0], 0, -2)        # [..., C, N, 4]
        y1_seq = jnp.moveaxis(xs[..., 1], 0, -2)
        modes = _t._serial_mode_sum(y_seq)
        bright = jnp.float32(0.03) * impact * (core - hp)
        shaped = (jnp.float32(0.44) * core + jnp.float32(0.42) * modes
                  + bright) * (jnp.float32(0.78)
                               + jnp.float32(0.10) * kc["texture"])
        mat_updates = {"modal_y1": y_seq[..., -1, :],
                       "modal_y2": y1_seq[..., -1, :]}
    else:               # flesh: constant 4×4 two-mass system
        k_a, k_b = mc["k_a"], mc["k_b"]
        c_a, c_b, k_cp = mc["c_a"], mc["c_b"], mc["k_couple"]
        force = core * (jnp.float32(0.55) + jnp.float32(0.65) * body)
        # state [va, pa, vb, pb]
        # va' = va + k_a(force−pa) − c_a·va − k_cp(pa−pb)
        # vb' = vb + k_b(pa−pb) − c_b·vb ;  pa' = pa+va' ; pb' = pb+vb'
        z = jnp.float32(0.0)
        a_va = jnp.stack([one - c_a, -(k_a + k_cp), z * one, k_cp * one])
        a_pa = jnp.stack([one - c_a, one - (k_a + k_cp), z * one,
                          k_cp * one])
        a_vb = jnp.stack([z * one, k_b, one - c_b, -k_b])
        a_pb = jnp.stack([z * one, k_b, one - c_b, one - k_b])
        A = jnp.stack([a_va, a_pa, a_vb, a_pb], axis=0)     # [4, 4]
        bvec = jnp.stack([k_a * force, k_a * force,
                          jnp.zeros_like(force), jnp.zeros_like(force)],
                         axis=-1)                            # [..., C, N, 4]
        mats = jnp.broadcast_to(A, bvec.shape[:-1] + (4, 4))
        init = jnp.stack([jnp.broadcast_to(carry["flesh_vel_a"], batch),
                          jnp.broadcast_to(carry["flesh_pos_a"], batch),
                          jnp.broadcast_to(carry["flesh_vel_b"], batch),
                          jnp.broadcast_to(carry["flesh_pos_b"], batch)],
                         axis=-1)
        xs = linear_matrix_scan(jnp.moveaxis(mats, -3, 0),
                                jnp.moveaxis(bvec, -2, 0), init)
        pa_seq = jnp.moveaxis(xs[..., 1], 0, -1)
        pb_seq = jnp.moveaxis(xs[..., 3], 0, -1)
        tissue = jnp.float32(0.92) * pa_seq + jnp.float32(0.58) * pb_seq
        nl = tissue - jnp.float32(0.19) * tissue * tissue * tissue
        shaped = tanh32((jnp.float32(0.50) * core + jnp.float32(1.34) * nl)
                        * (jnp.float32(0.98)
                           + jnp.float32(0.16) * kc["texture"]))
        mat_updates = {"flesh_pos_a": pa_seq[..., -1],
                       "flesh_vel_a": jnp.moveaxis(xs[..., 0], 0, -1)[..., -1],
                       "flesh_pos_b": pb_seq[..., -1],
                       "flesh_vel_b": jnp.moveaxis(xs[..., 2], 0, -1)[..., -1]}

    # roughness noise (cpp:239-243)
    noise_hp = onepole_lowpass(w, jnp.float32(0.08),
                               jnp.broadcast_to(carry["noise_hp"], batch))
    rough = w - noise_hp
    shaped = shaped + rough * (jnp.float32(0.004)
                               + jnp.float32(0.022) * kc["texture"]) \
        * (jnp.float32(0.14) + jnp.float32(0.64) * impact)

    dynamics = one + impact * (jnp.float32(0.18)
                               + kc["texture"] * jnp.float32(0.12)) \
        + body * jnp.float32(0.06)
    shaped = shaped * dynamics * kc["mat_trim"]

    tail_input = jlimit(-2.0, 2.0, shaped) * (jnp.float32(0.45)
                                              + jnp.float32(0.55) * trail)
    tail = leaky_integrator(tail_input, kc["decay"],
                            jnp.broadcast_to(carry["tail"], batch))
    wet = shaped + tail * (jnp.float32(0.30) + jnp.float32(0.45) * trail)

    wet_abs = jnp.abs(wet)
    wet_env = ar_envelope_relaxed(wet_abs, kc["wet_atk"], kc["wet_rel"],
                                  jnp.broadcast_to(carry["wet_env"], batch),
                                  iters=AR_ITERS)
    auto_comp = kc["auto_gain_base"] / (one + jnp.float32(1.8) * wet_env)
    wet = wet * jlimit(0.18, 1.0, auto_comp)

    mixed = d + kc["mix"] * (wet - d)
    pre_dc = mixed * kc["out_gain"]

    # DC blocker: dc[t] = pre_dc[t] − pre_dc[t−1] + R·dc[t−1]
    prev_in = jnp.concatenate(
        [jnp.broadcast_to(carry["dc_in"], batch)[..., None],
         pre_dc[..., :-1]], axis=-1)
    dc = linear_scan(kc["dc_r"], pre_dc - prev_in,
                     jnp.broadcast_to(carry["dc_out"], batch))

    # peak limiter (cpp:267-275) — EXACT (min, affine) associative scan:
    # engaged: g ↦ min(g, 0.98·0.88/peak); released: g ↦ (1−r)·g + r
    peak = jnp.abs(dc)
    over = peak > jnp.float32(0.88)
    r = jnp.float32(0.0028)
    big = jnp.float32(1.0e9)
    caps = jnp.where(over, (jnp.float32(0.88) / peak) * jnp.float32(0.98), big)
    coeffs = jnp.where(over, one, one - r)
    offsets = jnp.where(over, jnp.float32(0.0), r)
    pg = min_affine_scan(jnp.moveaxis(caps, -1, 0),
                         jnp.moveaxis(coeffs, -1, 0),
                         jnp.moveaxis(offsets, -1, 0),
                         jnp.broadcast_to(carry["protect_gain"], batch))
    pg = jnp.moveaxis(pg, 0, -1)
    out = jlimit(-0.98, 0.98, dc * jlimit(0.2, 1.0, pg))

    new_carry = dict(carry)
    new_carry.update(mat_updates)
    new_carry.update({
        "env": env[..., -1], "lp": lp[..., -1], "hp": hp[..., -1],
        "noise_hp": noise_hp[..., -1], "tail": tail[..., -1],
        "wet_env": wet_env[..., -1], "dc_in": pre_dc[..., -1],
        "dc_out": dc[..., -1], "protect_gain": pg[..., -1],
        "rng": rng_f,
    })
    return out, new_carry


#: stage name -> relaxed process fn (params, carry, block, sr, static) ->
#: (out, carry'). Stages absent here (or raising NotImplementedError) fall
#: back to the exact defn.process inside relaxed_step.
RELAXED_PROCESS = {
    "punch": _punch_relaxed,
    "cohere": _cohere_relaxed,
    "motion": _motion_relaxed,
    "texture": _texture_relaxed,
    # saturator / width / infer processes are already block-parallel
    # (models/*.py) — the exact fallback IS the relaxed form for them
}


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

def relaxed_step(plugin, params, state, block):
    """One processBlock on the relaxed tier (same contract as Plugin.step)."""
    block = jnp.asarray(block, jnp.float32)
    p = plugin.full_params(params)
    sr = plugin.sr
    pre_state, pre = analyze_relaxed(state["analyzer"], block, sr)
    fn = RELAXED_PROCESS.get(plugin.defn.name)
    if fn is None:
        out, dsp = plugin.defn.process(p, state["dsp"], block, sr)
    else:
        static = None
        if plugin.defn.name == "texture":
            from juicy_tpu.models import texture as _t
            static = _t.static_material(p)
            if static not in (0, 1, 4):
                fn = None
        if fn is None:
            out, dsp = plugin.defn.process(p, state["dsp"], block, sr)
        else:
            out, dsp = fn(p, state["dsp"], block, sr, static)
    post_state, post = analyze_relaxed(pre_state, out, sr)
    finalize = plugin.defn.finalize_metrics or _default_finalize
    metrics = finalize(p, pre, post, dsp)
    return out, {"analyzer": post_state, "dsp": dsp}, metrics


def _default_finalize(params, pre, post, carry=None):
    m = dict(post)
    m["pre_score"] = pre["score"]
    m["post_score"] = post["score"]
    m["score"] = post["score"]
    return m


def relaxed_chain_stream(chain, states, clips):
    """Stream a [B, C, T] corpus through the chain on the relaxed tier,
    stage-major (same shape contract as Chain.batched_run): returns
    (out [B, C, T], new_states, metrics list-per-stage of [nb, ...])."""
    from juicy_tpu.ops.scan_utils import default_unroll
    out = jnp.asarray(clips, jnp.float32)
    b, c, t = out.shape
    n = chain.block_size
    nb = t // n
    new_states, metrics = [], []
    for plug, params, st in zip(chain.plugins, chain.params, states):
        blocks = jnp.moveaxis(out.reshape(b, c, nb, n), 2, 0)

        def scan_step(s, blk, _plug=plug, _params=params):
            o, s2, m = jax.vmap(
                lambda ss, bb: relaxed_step(_plug, _params, ss, bb)
            )(s, blk)
            return s2, (o, m)

        st2, (outs, ms) = jax.lax.scan(scan_step, st, blocks,
                                       unroll=default_unroll(1))
        out = jnp.moveaxis(outs, 0, 2).reshape(b, c, t)
        new_states.append(st2)
        metrics.append(ms)
    return out, new_states, metrics
