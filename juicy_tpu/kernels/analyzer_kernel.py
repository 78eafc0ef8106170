"""Pallas TPU kernel: fused JuicinessAnalyzer block pass.

The analyzer's sequential loop (envelopes + onset counter + band-split
one-poles, reference JuicinessAnalyzer.cpp:57-92) is the dominant per-block
cost — it runs twice per plugin step. The lax.scan version pays per-iteration
loop overhead on tiny operands; this kernel keeps the whole block in VMEM and
runs the per-sample loop entirely on-chip:

  * layout: the clip batch is tiled to (8, 128) = 1024 lanes — one full VPU
    register per per-sample op; audio arrives time-major [tiles, N, 8, 128];
  * the loop carries envelopes/band states and all block accumulators in
    registers/VMEM (never touching HBM between samples);
  * HBM traffic = read the block once + write a few [8,128] outputs.

The score formulas (pure per-clip scalar math, cpp:94-154) stay in plain XLA
via the shared analyzer._finalize_metrics, so both paths emit identical
metrics. The loop body uses the same f32 op order as the scan implementation,
and the oracle null suite covers it (tests/test_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from juicy_tpu.utils.convert import onepole_coeff, tau_coeff

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

SUB, LANE = 8, 128
TILE = SUB * LANE


def analyze_fused_available() -> bool:
    return _PALLAS_OK


def _kernel(coeff_ref, mono_ref, senv_ref, lenv_ref, low_ref, high_ref,
            cd_ref, senv_o, lenv_o, low_o, high_o, cd_o,
            tacc_o, onset_o, rms_o, peak_o, lowe_o, highe_o):
    n = mono_ref.shape[1]
    sub = mono_ref.shape[2]
    att_s = coeff_ref[0, 0]
    rel_s = coeff_ref[0, 1]
    att_l = coeff_ref[0, 2]
    rel_l = coeff_ref[0, 3]
    low_c = coeff_ref[0, 4]
    high_c = coeff_ref[0, 5]
    cooldown_n = coeff_ref[0, 6].astype(jnp.int32)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def body(i, carry):
        (s_env, l_env, low_s, high_s, cd,
         tacc, onsets, rms, peak, lowe, highe) = carry
        mono = mono_ref[0, i]
        a = jnp.abs(mono)

        # dual attack/release envelopes (cpp:57-66)
        cs = jnp.where(a > s_env, att_s, rel_s)
        s_env = (one - cs) * a + cs * s_env
        cl = jnp.where(a > l_env, att_l, rel_l)
        l_env = (one - cl) * a + cl * l_env

        # transient + cooldown-gated onset count (cpp:67-75)
        transient = jnp.maximum(zero, s_env - l_env)
        tacc = tacc + transient
        cd = jnp.maximum(cd - 1, 0)
        onset = (transient > jnp.float32(0.045)) & (cd <= 0)
        onsets = onsets + onset.astype(jnp.int32)
        cd = jnp.where(onset, cooldown_n, cd)

        # RMS/peak accumulators (cpp:76-77)
        rms = rms + mono * mono
        peak = jnp.maximum(peak, a)

        # band-split one-poles + energies (cpp:79-84)
        low_s = low_s + low_c * (mono - low_s)
        high_s = high_s + high_c * (mono - high_s)
        high_v = mono - high_s
        lowe = lowe + low_s * low_s
        highe = highe + high_v * high_v

        return (s_env, l_env, low_s, high_s, cd,
                tacc, onsets, rms, peak, lowe, highe)

    zf = jnp.zeros((sub, LANE), jnp.float32)
    zi = jnp.zeros((sub, LANE), jnp.int32)
    init = (senv_ref[0], lenv_ref[0], low_ref[0], high_ref[0], cd_ref[0],
            zf, zi, zf, zf, zf, zf)

    # Manual inner unroll: amortize per-iteration loop overhead; U must
    # divide the block size (block sizes are powers of two ≥ 64).
    U = 8 if n % 8 == 0 else 1

    def body_u(k, carry):
        for j in range(U):
            carry = body(k * U + j, carry)
        return carry

    (s_env, l_env, low_s, high_s, cd,
     tacc, onsets, rms, peak, lowe, highe) = jax.lax.fori_loop(
        0, n // U, body_u, init)

    senv_o[0] = s_env
    lenv_o[0] = l_env
    low_o[0] = low_s
    high_o[0] = high_s
    cd_o[0] = cd
    tacc_o[0] = tacc
    onset_o[0] = onsets
    rms_o[0] = rms
    peak_o[0] = peak
    lowe_o[0] = lowe
    highe_o[0] = highe


@functools.partial(jax.jit, static_argnames=("sr", "interpret"))
def _run_kernel(mono_tiles, senv, lenv, low, high, cd, sr: float,
                interpret: bool = False):
    """mono_tiles [G, N, S, 128]; state tiles [G, S, 128] (S = 8·tiles/group,
    multiple (8,128) VPU tiles per grid step for instruction-level
    parallelism in the sequential loop)."""
    num_tiles, n, sub = (mono_tiles.shape[0], mono_tiles.shape[1],
                         mono_tiles.shape[2])
    coeffs = jnp.stack([
        tau_coeff(0.003, sr), tau_coeff(0.030, sr),
        tau_coeff(0.050, sr), tau_coeff(0.300, sr),
        onepole_coeff(250.0, sr), onepole_coeff(2500.0, sr),
        jnp.float32(int(sr * 0.035)),
        jnp.float32(0.0),
    ]).astype(jnp.float32).reshape(1, 8)

    tile_f = jax.ShapeDtypeStruct((num_tiles, sub, LANE), jnp.float32)
    tile_i = jax.ShapeDtypeStruct((num_tiles, sub, LANE), jnp.int32)
    state_spec = pl.BlockSpec((1, sub, LANE), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, sub, LANE), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec, state_spec, state_spec,
        ],
        out_specs=[state_spec] * 11,
        out_shape=[tile_f, tile_f, tile_f, tile_f, tile_i,
                   tile_f, tile_i, tile_f, tile_f, tile_f, tile_f],
        interpret=interpret,
    )(coeffs, mono_tiles, senv, lenv, low, high, cd)


def analyze_fused(state: Dict[str, jnp.ndarray], block: jnp.ndarray,
                  sr: float, interpret: bool = False
                  ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Batched fused analyzer: block [B, C, N], analyzer-state leaves [B].

    B must be a multiple of 1024 (one (8,128) VPU tile per grid step).
    Returns (new_state, metrics) matching jax.vmap(analyze) over B.
    """
    b, channels, n = block.shape
    if b % TILE:
        raise ValueError(f"batch {b} must be a multiple of {TILE}")
    num_tiles = b // TILE
    # group several (8,128) tiles per grid step (ILP in the sample loop),
    # bounded by VMEM: audio blocks are double-buffered across grid steps,
    # so cap at ~4 MB of audio per grid step (16 MB VMEM on v5e).
    group = 1
    for g in (8, 4, 2):
        if num_tiles % g == 0 and n * g * TILE * 4 <= (1 << 22):
            group = g
            break
    num_groups = num_tiles // group
    sub = SUB * group

    left = block[:, 0, :]
    right = block[:, 1, :] if channels > 1 else left
    mono = jnp.float32(0.5) * (left + right)
    mono_tiles = mono.reshape(num_groups, sub, LANE, n).transpose(0, 3, 1, 2)

    def tiles(x, dtype=jnp.float32):
        return jnp.broadcast_to(jnp.asarray(x, dtype), (b,)) \
            .reshape(num_groups, sub, LANE)

    (s_env, l_env, low_s, high_s, cd,
     tacc, onsets, rms_acc, peak, lowe, highe) = _run_kernel(
        mono_tiles, tiles(state["short_env"]), tiles(state["long_env"]),
        tiles(state["low_state"]), tiles(state["high_state"]),
        tiles(state["onset_cooldown"], jnp.int32), sr, interpret)

    flat = lambda x: x.reshape(b)
    inv_n = jnp.float32(1.0 / n)
    side = jnp.float32(0.5) * (left - right)
    side_acc = jnp.sum(side * side, axis=-1)
    mid_acc = jnp.sum(mono * mono, axis=-1)
    corr_acc = jnp.sum(left * right, axis=-1)
    l_energy = jnp.sqrt(jnp.sum(left * left, axis=-1) * inv_n)
    r_energy = jnp.sqrt(jnp.sum(right * right, axis=-1) * inv_n)

    from juicy_tpu.analyzer import _finalize_metrics
    return _finalize_metrics(
        state, flat(s_env), flat(l_env), flat(low_s), flat(high_s),
        flat(cd), flat(tacc), flat(onsets), flat(rms_acc), flat(peak),
        flat(lowe), flat(highe), side_acc, mid_acc, corr_acc,
        l_energy, r_energy, n, sr)
