"""Pallas TPU kernel: the ENTIRE JuicySaturator step fused.

The reference's processBlock runs three sample loops over the block —
analyzer-pre, DSP, analyzer-post (JuicySaturator/PluginProcessor.cpp:77-100
calling shared/JuicinessAnalyzer.cpp:31-155 twice). This kernel runs all
three inside one pallas_call with the audio resident in VMEM:

  loop 1: pre-analyzer state update fused with the saturator DSP
          (drive → x+a·x² → tanh → one-pole tone → mix), writing the wet
          block to the output VMEM buffer;
  loop 2: post-analyzer over the just-written output (the analyzer state
          threads pre→post exactly like the single C++ analyzer instance).

HBM traffic: read the block once, write it once, plus a few (8,128) state
and accumulator tiles — the unfused fast path pays 3 extra block passes.
Batch layout: (8,128) = 1024 clips per grid step, time-major.

tanh inside the loop is the drift-pinned tanh32 (ops/precise.py): XLA:TPU's
built-in f32 tanh is a fast 4.4e-5-abs-error approximation (−87 dBFS on its
own); tanh32 restores the libm-class 1e-7 the compiled C++ reference gets
from glibc tanhf (validated in tests/test_kernels.py against the scan path
and on-chip in tools/certify_onchip.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from juicy_tpu.ops.precise import tanh32
from juicy_tpu.utils.convert import db_to_gain, jmap, onepole_coeff, tau_coeff

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE


def _analyzer_substep(coeff, carry, mono):
    """One analyzer sample step (shared by both loops)."""
    (att_s, rel_s, att_l, rel_l, low_c, high_c, cooldown_n) = coeff
    (s_env, l_env, low_s, high_s, cd, tacc, onsets, rms, peak, lowe, highe) = carry
    one = jnp.float32(1.0)
    a = jnp.abs(mono)
    cs = jnp.where(a > s_env, att_s, rel_s)
    s_env = (one - cs) * a + cs * s_env
    cl = jnp.where(a > l_env, att_l, rel_l)
    l_env = (one - cl) * a + cl * l_env
    transient = jnp.maximum(jnp.float32(0.0), s_env - l_env)
    tacc = tacc + transient
    cd = jnp.maximum(cd - 1, 0)
    onset = (transient > jnp.float32(0.045)) & (cd <= 0)
    onsets = onsets + onset.astype(jnp.int32)
    cd = jnp.where(onset, cooldown_n, cd)
    rms = rms + mono * mono
    peak = jnp.maximum(peak, a)
    low_s = low_s + low_c * (mono - low_s)
    high_s = high_s + high_c * (mono - high_s)
    high_v = mono - high_s
    lowe = lowe + low_s * low_s
    highe = highe + high_v * high_v
    return (s_env, l_env, low_s, high_s, cd, tacc, onsets, rms, peak, lowe, highe)


def _zero_accums():
    zf = jnp.zeros((SUB, LANE), jnp.float32)
    zi = jnp.zeros((SUB, LANE), jnp.int32)
    return (zf, zi, zf, zf, zf, zf)


def _make_kernel(channels: int):
    def kernel(coeff_ref, x_ref,
               senv_ref, lenv_ref, low_ref, high_ref, cd_ref, tone_ref,
               y_ref, senv_o, lenv_o, low_o, high_o, cd_o, tone_o,
               pre_tacc, pre_onset, pre_rms, pre_peak, pre_lowe, pre_highe,
               post_tacc, post_onset, post_rms, post_peak, post_lowe,
               post_highe):
        n = x_ref.shape[2]
        acoeff = tuple(coeff_ref[0, k] for k in range(6)) + \
            (coeff_ref[0, 6].astype(jnp.int32),)
        in_gain = coeff_ref[0, 8]
        asym = coeff_ref[0, 9]
        tone_c = coeff_ref[0, 10]
        out_gain = coeff_ref[0, 11]
        mix = coeff_ref[0, 12]
        half = jnp.float32(0.5)

        # ---- loop 1: pre-analyze + DSP ----
        def body1(i, carry):
            astate, tone = carry
            xl = x_ref[0, 0, i]
            xr = x_ref[0, channels - 1, i]
            astate = _analyzer_substep(acoeff, astate, half * (xl + xr))

            new_tone = []
            for ch in range(channels):
                dry = x_ref[0, ch, i]
                driven = dry * in_gain
                skewed = driven + asym * driven * driven
                soft = tanh32(skewed)
                t = tone[ch] + tone_c * (soft - tone[ch])
                new_tone.append(t)
                wet = t * out_gain
                y_ref[0, ch, i] = dry + mix * (wet - dry)
            return astate, tuple(new_tone)

        astate0 = (senv_ref[0], lenv_ref[0], low_ref[0], high_ref[0],
                   cd_ref[0]) + _zero_accums()
        tone0 = tuple(tone_ref[0, ch] for ch in range(channels))
        astate, tone = jax.lax.fori_loop(0, n, body1, (astate0, tone0))
        pre_tacc[0], pre_onset[0], pre_rms[0] = astate[5], astate[6], astate[7]
        pre_peak[0], pre_lowe[0], pre_highe[0] = astate[8], astate[9], astate[10]

        # ---- loop 2: post-analyze over the written output ----
        def body2(i, carry):
            yl = y_ref[0, 0, i]
            yr = y_ref[0, channels - 1, i]
            return _analyzer_substep(acoeff, carry, half * (yl + yr))

        astate2 = astate[:5] + _zero_accums()
        astate2 = jax.lax.fori_loop(0, n, body2, astate2)

        senv_o[0], lenv_o[0], low_o[0], high_o[0], cd_o[0] = astate2[:5]
        post_tacc[0], post_onset[0], post_rms[0] = astate2[5], astate2[6], astate2[7]
        post_peak[0], post_lowe[0], post_highe[0] = astate2[8], astate2[9], astate2[10]
        for ch in range(channels):
            tone_o[0, ch] = tone[ch]

    return kernel


@functools.partial(jax.jit, static_argnames=("channels", "sr", "interpret"))
def _run(x_tiles, senv, lenv, low, high, cd, tone, params_vec,
         channels: int, sr: float, interpret: bool = False):
    num_tiles, _, n = x_tiles.shape[0], x_tiles.shape[1], x_tiles.shape[2]
    coeffs = jnp.concatenate([
        jnp.stack([tau_coeff(0.003, sr), tau_coeff(0.030, sr),
                   tau_coeff(0.050, sr), tau_coeff(0.300, sr),
                   onepole_coeff(250.0, sr), onepole_coeff(2500.0, sr),
                   jnp.float32(int(sr * 0.035)), jnp.float32(0.0)]),
        params_vec,
    ]).astype(jnp.float32).reshape(1, 16)

    tile_f = jax.ShapeDtypeStruct((num_tiles, SUB, LANE), jnp.float32)
    tile_i = jax.ShapeDtypeStruct((num_tiles, SUB, LANE), jnp.int32)
    tone_f = jax.ShapeDtypeStruct((num_tiles, channels, SUB, LANE), jnp.float32)
    y_f = jax.ShapeDtypeStruct(x_tiles.shape, jnp.float32)

    state_spec = pl.BlockSpec((1, SUB, LANE), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    tone_spec = pl.BlockSpec((1, channels, SUB, LANE), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, channels, n, SUB, LANE),
                          lambda t: (t, 0, 0, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(channels),
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((1, 16), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  x_spec, state_spec, state_spec, state_spec, state_spec,
                  state_spec, tone_spec],
        out_specs=[x_spec, state_spec, state_spec, state_spec, state_spec,
                   state_spec, tone_spec] + [state_spec] * 12,
        out_shape=[y_f, tile_f, tile_f, tile_f, tile_f, tile_i, tone_f,
                   tile_f, tile_i, tile_f, tile_f, tile_f, tile_f,
                   tile_f, tile_i, tile_f, tile_f, tile_f, tile_f],
        interpret=interpret,
    )(coeffs, x_tiles, senv, lenv, low, high, cd, tone)


def saturator_step_fused(plugin, params, states, blocks,
                         interpret: bool = False):
    """Fully-fused saturator step: [B, C, N] blocks, B % 1024 == 0.

    Drop-in equivalent of Plugin.batch_step for the saturator,
    with both analyzer passes and the DSP in ONE kernel.
    """
    from juicy_tpu.analyzer import _finalize_metrics
    from juicy_tpu.runtime.plugin import _default_finalize

    b, channels, n = blocks.shape
    if b % TILE:
        raise ValueError(f"batch {b} must be a multiple of {TILE}")
    num_tiles = b // TILE
    sr = plugin.sr
    p = plugin.full_params(params)

    cutoff = jmap(p["tone"], 2500.0, 16000.0)
    params_vec = jnp.stack([
        db_to_gain(p["drive"]), jnp.asarray(p["asymmetry"], jnp.float32),
        onepole_coeff(cutoff, sr), db_to_gain(p["output"]),
        jnp.asarray(p["mix"], jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)])

    # time-major tiles: [B, C, N] -> [T, C, N, 8, 128]
    x_tiles = blocks.reshape(num_tiles, SUB, LANE, channels, n) \
        .transpose(0, 3, 4, 1, 2)

    ast = states["analyzer"]
    tiles = lambda x, dt=jnp.float32: jnp.broadcast_to(
        jnp.asarray(x, dt), (b,)).reshape(num_tiles, SUB, LANE)
    tone = states["dsp"]["tone_state"]          # [B, C]
    tone_tiles = tone.T.reshape(channels, num_tiles, SUB, LANE) \
        .transpose(1, 0, 2, 3)

    (y, senv, lenv, low, high, cd, tone_o, *acc) = _run(
        x_tiles, tiles(ast["short_env"]), tiles(ast["long_env"]),
        tiles(ast["low_state"]), tiles(ast["high_state"]),
        tiles(ast["onset_cooldown"], jnp.int32), tone_tiles, params_vec,
        channels, sr, interpret)

    out = y.transpose(0, 3, 4, 1, 2).reshape(b, channels, n)
    flat = lambda x: x.reshape(b)

    # stereo/cross-channel reductions (cheap, fused by XLA)
    def finalize(block, accums, base_state):
        left = block[:, 0, :]
        right = block[:, 1, :] if channels > 1 else left
        mono = jnp.float32(0.5) * (left + right)
        inv_n = jnp.float32(1.0 / n)
        side = jnp.float32(0.5) * (left - right)
        tacc, onsets, rms, peak, lowe, highe = accums
        return _finalize_metrics(
            base_state["analyzer_state"], base_state["s_env"],
            base_state["l_env"], base_state["low"], base_state["high"],
            base_state["cd"], flat(tacc), flat(onsets), flat(rms), flat(peak),
            flat(lowe), flat(highe),
            jnp.sum(side * side, axis=-1), jnp.sum(mono * mono, axis=-1),
            jnp.sum(left * right, axis=-1),
            jnp.sqrt(jnp.sum(left * left, axis=-1) * inv_n),
            jnp.sqrt(jnp.sum(right * right, axis=-1) * inv_n), n, sr)

    # The kernel emits only FINAL (post-both-passes) envelope states plus the
    # per-pass accumulators; metric VALUES depend only on accumulators and
    # the EMA states, so threading state→pre→post below reproduces the exact
    # two-analyze sequence. (pre_state_mid's env fields are final-state
    # values, but only its EMAs are consumed by the post pass.)
    pre_state_mid, pre = finalize(blocks, acc[0:6], {
        "analyzer_state": ast, "s_env": flat(senv), "l_env": flat(lenv),
        "low": flat(low), "high": flat(high), "cd": flat(cd)})
    post_state, post = finalize(out, acc[6:12], {
        "analyzer_state": pre_state_mid, "s_env": flat(senv),
        "l_env": flat(lenv), "low": flat(low), "high": flat(high),
        "cd": flat(cd)})

    new_tone = tone_o.transpose(1, 0, 2, 3).reshape(channels, b).T
    finalize_m = plugin.defn.finalize_metrics or _default_finalize
    dsp_state = {"tone_state": new_tone}
    metrics = finalize_m(p, pre, post, dsp_state)
    return out, {"analyzer": post_state, "dsp": dsp_state}, metrics
