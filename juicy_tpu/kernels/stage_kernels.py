"""Full-stage Pallas kernels: pre-analyze + DSP + post-analyze per block.

Each reference plugin's processBlock runs three sample-rate passes
(pre-analyzer, DSP, post-analyzer — e.g. JuicyPunch/PluginProcessor.cpp:
82,86-112,114). The XLA path runs each as a `lax.scan`, and on TPU every
scan step costs ~1 µs of loop machinery regardless of body size — the loop
*count* bounds throughput, not the arithmetic.

These kernels run a whole stage-block as ONE `pallas_call`: the per-sample
loops live inside the kernel as `fori_loop`s over VMEM-resident tiles, so
per-step cost collapses to the actual VPU work. The analyzer's per-sample
state (envelopes, onset counter, band filters) and all block accumulators
(rms/peak/side/corr, transient/onsets, band energies) advance inside the
kernel in the exact float32 op order of the C++; the block-level score
formulas run outside in plain XLA (cheap, once per block).

Layout: one sample of one clip-tile is a full ``(SUB, 128)`` vreg tile —
``TILE = 512`` clips × 2 channels = 1024 lanes = ``(8, 128)`` — so every
per-sample op runs at 100% VPU lane utilization (a ``[1, 1024]`` row layout
would idle 7 of 8 sublanes). Streams are stored ``[G, N·SUB, 128]``: grid
step g owns rows ``[t·SUB, (t+1)·SUB)`` for sample t; channel slices are the
sublane halves. Pallas double-buffers the HBM↔VMEM stream transfers across
grid steps.

Numerics match the scan paths (same body formulas, same op order); kernels
are null-tested against the scan implementations and the compiled C++
oracle (tests/test_stage_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from juicy_tpu import analyzer as _an
from juicy_tpu.models import punch as _punch
from juicy_tpu.utils.convert import db_to_gain, onepole_coeff, tau_coeff

TILE = 512          # clips per grid step
LANES = 128
MSUB = TILE // LANES            # sublane rows per mono ([TILE]) quantity: 4


def _csub(c):                   # sublane rows per stereo sample tile
    return c * MSUB


# ---------------------------------------------------------------------------
# Stream / state layout helpers
# ---------------------------------------------------------------------------

def to_stream(block):
    """[B, C, N] -> [G, N*C*MSUB, 128] (sample t of tile g = rows
    [t*CSUB, (t+1)*CSUB), channel-major within the sample tile)."""
    b, c, n = block.shape
    g = b // TILE
    x = jnp.moveaxis(block, -1, 0)                 # [N, B, C]
    x = x.reshape(n, g, TILE, c)
    x = jnp.swapaxes(x, 2, 3)                      # [N, g, C, TILE]
    x = x.reshape(n, g, c * MSUB, LANES)
    x = jnp.moveaxis(x, 1, 0)                      # [g, N, CSUB, 128]
    return x.reshape(g, n * c * MSUB, LANES)


def from_stream(x, b, c):
    """[G, N*C*MSUB, 128] -> [B, C, N]."""
    g = x.shape[0]
    n = x.shape[1] // (c * MSUB)
    y = x.reshape(g, n, c, TILE)
    y = jnp.moveaxis(y, 1, 3)                      # [g, C, TILE, N]
    y = jnp.swapaxes(y, 1, 2)                      # [g, TILE, C, N]
    return y.reshape(b, c, n)


def state_to_tiles(leaves):
    """K per-channel state leaves [B, C] -> [G, K*C*MSUB, 128]."""
    rows = []
    for s in leaves:
        b, c = s.shape
        g = b // TILE
        r = s.reshape(g, TILE, c)
        r = jnp.swapaxes(r, 1, 2).reshape(g, 1, c * MSUB, LANES)
        rows.append(r)
    return jnp.concatenate(rows, axis=1).reshape(
        rows[0].shape[0], len(leaves) * rows[0].shape[2], LANES)


def tiles_to_state(x, b, c, k):
    """[G, K*C*MSUB, 128] -> list of K [B, C] leaves."""
    g = x.shape[0]
    y = x.reshape(g, k, c, TILE)
    return [jnp.swapaxes(y[:, i], 1, 2).reshape(b, c) for i in range(k)]


def mono_to_tiles(leaves):
    """K per-clip leaves [B] (f32) -> [G, K*MSUB, 128]."""
    rows = [v.reshape(-1, 1, MSUB, LANES) for v in leaves]
    r = jnp.concatenate(rows, axis=1)
    return r.reshape(r.shape[0], len(leaves) * MSUB, LANES)


def tiles_to_mono(x, b, k):
    """[G, K*MSUB, 128] -> list of K [B] leaves."""
    g = x.shape[0]
    y = x.reshape(g, k, TILE)
    return [y[:, i].reshape(b) for i in range(k)]


# ---------------------------------------------------------------------------
# Analyzer lane (in-kernel form). All lane quantities are [MSUB, 128] tiles.
# ---------------------------------------------------------------------------

def _lane_consts(sr: float):
    return (tau_coeff(0.003, sr), tau_coeff(0.030, sr),
            tau_coeff(0.050, sr), tau_coeff(0.300, sr),
            onepole_coeff(250.0, sr), onepole_coeff(2500.0, sr),
            jnp.float32(int(sr * 0.035)))


def _lane_step(lane, l, r, k):
    """One analyzer sample; exact op order of JuicinessAnalyzer.cpp:57-92
    plus the stateless accumulators."""
    (atk_s, rel_s, atk_l, rel_l, low_c, high_c, cd_samples) = k
    one = jnp.float32(1.0)
    (s_env, l_env, cooldown, t_acc, count, lo, hi, lo_acc, hi_acc,
     rms_acc, peak, side_acc, corr_acc, l_acc, r_acc) = lane
    mono = jnp.float32(0.5) * (l + r)
    x = jnp.abs(mono)
    cs = jnp.where(x > s_env, atk_s, rel_s)
    s_env = (one - cs) * x + cs * s_env
    cl = jnp.where(x > l_env, atk_l, rel_l)
    l_env = (one - cl) * x + cl * l_env
    transient = jnp.maximum(jnp.float32(0.0), s_env - l_env)
    t_acc = t_acc + transient
    cooldown = jnp.maximum(cooldown - one, jnp.float32(0.0))
    onset = (transient > jnp.float32(0.045)) & (cooldown <= jnp.float32(0.0))
    count = count + onset.astype(jnp.float32)
    cooldown = jnp.where(onset, cd_samples, cooldown)
    rms_acc = rms_acc + mono * mono
    peak = jnp.maximum(peak, x)
    lo = lo + low_c * (mono - lo)
    hi = hi + high_c * (mono - hi)
    low_v = lo
    high_v = mono - hi
    lo_acc = lo_acc + low_v * low_v
    hi_acc = hi_acc + high_v * high_v
    side = jnp.float32(0.5) * (l - r)
    side_acc = side_acc + side * side
    corr_acc = corr_acc + l * r
    l_acc = l_acc + l * l
    r_acc = r_acc + r * r
    return [s_env, l_env, cooldown, t_acc, count, lo, hi, lo_acc, hi_acc,
            rms_acc, peak, side_acc, corr_acc, l_acc, r_acc]


# lane persistent-state order in the [5·MSUB, 128] kernel input/outputs
_LANE_FIN = (0, 1, 5, 6, 2)     # s_env, l_env, low, high, cooldown
# accumulator order in the [10·MSUB, 128] kernel outputs
_LANE_ACC = (3, 4, 7, 8, 9, 10, 11, 12, 13, 14)


def pack_lane(state: Dict[str, jnp.ndarray], b: int):
    """Analyzer state dict -> [G, 5*MSUB, 128] kernel input."""
    rows = [jnp.broadcast_to(jnp.asarray(state[k], jnp.float32), (b,))
            for k in ("short_env", "long_env", "low_state", "high_state")]
    rows.append(jnp.broadcast_to(
        jnp.asarray(state["onset_cooldown"]).astype(jnp.float32), (b,)))
    return mono_to_tiles(rows)


def _lane_from_ref(ref):
    """Kernel lane-init ref [5*MSUB, 128] -> 15-var lane (accums zeroed)."""
    fin = [ref[i * MSUB:(i + 1) * MSUB, :] for i in range(5)]
    z = jnp.zeros_like(fin[0])
    return [fin[0], fin[1], fin[4], z, z, fin[2], fin[3],
            z, z, z, z, z, z, z, z]


def _lane_reset(lane):
    """Fresh accumulators, persistent state carried (pre -> post lane)."""
    z = jnp.zeros_like(lane[0])
    return [lane[0], lane[1], lane[2], z, z, lane[5], lane[6],
            z, z, z, z, z, z, z, z]


def _store_lane(lane, fin_ref, acc_ref):
    for i, j in enumerate(_LANE_FIN):
        fin_ref[i * MSUB:(i + 1) * MSUB, :] = lane[j]
    for i, j in enumerate(_LANE_ACC):
        acc_ref[i * MSUB:(i + 1) * MSUB, :] = lane[j]


def finalize_lane(fin_t, acc_t, state, b: int, n: int, sr: float):
    """Kernel outputs [G, 5*MSUB, 128] / [G, 10*MSUB, 128] ->
    (analyzer state', metrics) via the shared score formulas."""
    fin = tiles_to_mono(fin_t, b, 5)
    acc = tiles_to_mono(acc_t, b, 10)
    inv_n = jnp.float32(1.0 / n)
    stats = {
        "rms_accum": acc[4], "peak": acc[5], "side_accum": acc[6],
        "corr_accum": acc[7],
        "l_energy": jnp.sqrt(acc[8] * inv_n),
        "r_energy": jnp.sqrt(acc[9] * inv_n),
    }
    carry = (fin[0], fin[1], fin[4].astype(jnp.int32), acc[0],
             acc[1].astype(jnp.int32), fin[2], fin[3], acc[2], acc[3])
    return _an.lane_finalize(carry, state, stats, n, sr)


def metrics_from_lanes(pre_fin, pre_acc, post_fin, post_acc, an_state,
                       b: int, n: int, sr: float):
    pre_state, pre_m = finalize_lane(pre_fin, pre_acc, an_state, b, n, sr)
    post_state, post_m = finalize_lane(post_fin, post_acc, pre_state, b, n, sr)
    m = dict(post_m)
    m["pre_score"] = pre_m["score"]
    m["post_score"] = post_m["score"]
    m["score"] = post_m["score"]
    return post_state, m, pre_m


# ---------------------------------------------------------------------------
# Punch full-stage kernel
# ---------------------------------------------------------------------------

_PUNCH_PKEYS = ("punch", "sustain", "slam", "clip", "mix")


def _punch_shape_gain(dry, f_env, s_env, p, out_gain):
    """punch.punch_shape with a precomputed linear output gain (db_to_gain
    runs outside the kernel); formulas identical to cpp:99-110."""
    one = jnp.float32(1.0)
    transient = jnp.maximum(jnp.float32(0.0), f_env - s_env)
    curve_exp = jnp.float32(0.95) + p["slam"] * (jnp.float32(0.55)
                                                 - jnp.float32(0.95))
    transient_curve = jnp.power(transient, curve_exp)
    punch_gain = one + (p["punch"] * jnp.float32(12.0)
                        + p["slam"] * jnp.float32(22.0)) * transient_curve
    sustain_gain = one + (p["sustain"] * jnp.float32(4.0)
                          + p["slam"] * jnp.float32(1.5)) * \
        jnp.maximum(jnp.float32(0.0), s_env - transient * jnp.float32(0.6))
    wet = dry * punch_gain * sustain_gain
    drive = one + p["clip"] * jnp.float32(8.0) + p["slam"] * jnp.float32(4.0)
    soft = jnp.tanh(wet * drive) / jnp.tanh(drive)
    hard = jnp.clip(wet * (one + p["clip"] * jnp.float32(2.0)),
                    jnp.float32(-0.95), jnp.float32(0.95))
    wet = soft + p["clip"] * (hard - soft)
    return (dry + p["mix"] * (wet - dry)) * out_gain


def _punch_kernel(n, c, unroll, params_ref, x_ref, dsp_ref, lane_ref,
                  out_ref, dsp_out_ref, pre_fin_ref, pre_acc_ref,
                  post_fin_ref, post_acc_ref):
    csub = _csub(c)
    lane_k = tuple(params_ref[0, i] for i in range(7))
    p = {key: params_ref[0, 7 + i] for i, key in enumerate(_PUNCH_PKEYS)}
    out_gain = params_ref[0, 7 + len(_PUNCH_PKEYS)]
    fast_c = params_ref[0, 8 + len(_PUNCH_PKEYS)]
    slow_c = params_ref[0, 9 + len(_PUNCH_PKEYS)]
    one = jnp.float32(1.0)

    fast0 = dsp_ref[0:csub, :]
    slow0 = dsp_ref[csub:2 * csub, :]
    lane0 = _lane_from_ref(lane_ref)

    def split(s):
        l = s[0:MSUB, :]
        r = s[MSUB:2 * MSUB, :] if c > 1 else l
        return l, r

    def body(t, carry):
        fast, slow, lane = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        ys = []
        for u in range(unroll):
            x = chunk[u * csub:(u + 1) * csub, :]    # [CSUB, 128]
            l, r = split(x)
            lane = _lane_step(lane, l, r, lane_k)
            a = jnp.abs(x)
            fast = (one - fast_c) * a + fast_c * fast
            slow = (one - slow_c) * a + slow_c * slow
            ys.append(_punch_shape_gain(x, fast, slow, p, out_gain))
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(ys, axis=0)
        return fast, slow, lane

    fast, slow, lane = jax.lax.fori_loop(0, n // unroll, body,
                                         (fast0, slow0, lane0))
    dsp_out_ref[0:csub, :] = fast
    dsp_out_ref[csub:2 * csub, :] = slow
    _store_lane(lane, pre_fin_ref, pre_acc_ref)

    lane2 = _lane_reset(lane)

    def body2(t, lane2):
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane2 = _lane_step(lane2, l, r, lane_k)
        return lane2

    lane2 = jax.lax.fori_loop(0, n // unroll, body2, lane2)
    _store_lane(lane2, post_fin_ref, post_acc_ref)


def _tilespec(rows):
    return pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _squeeze_kernel(kernel):
    """Adapt a kernel written for [rows, 128] refs to the [1, rows, 128]
    blocks produced by the grid BlockSpecs."""
    def wrapped(params_ref, *refs):
        kernel(params_ref, *[r.at[0] for r in refs])
    return wrapped


def punch_stage_step(params, state, block, sr: float, unroll: int = 8,
                     interpret: bool = False):
    """Full punch step (pre-analyze → DSP → post-analyze) as one kernel.

    `block`: [B, C, N] with batched `state` (leaves [B, ...]), like
    vmap(plugin.step). Returns (out, new_state, metrics).
    """
    block = jnp.asarray(block, jnp.float32)
    bsz, c, n = block.shape
    if bsz % TILE:
        raise ValueError(f"batch {bsz} must be a multiple of {TILE}")
    csub = _csub(c)

    x = to_stream(block)
    fast_c, slow_c = _punch.env_coeffs(sr)
    pvec = jnp.stack([*_lane_consts(sr),
                      *[jnp.asarray(params[k], jnp.float32)
                        for k in _PUNCH_PKEYS],
                      db_to_gain(params["output"]), fast_c, slow_c])[None]

    dsp0 = state_to_tiles([state["dsp"]["fast_env"], state["dsp"]["slow_env"]])
    lane0 = pack_lane(state["analyzer"], bsz)

    grid = bsz // TILE
    kernel = _squeeze_kernel(functools.partial(_punch_kernel, n, c, unroll))

    out, dsp_f, pre_fin, pre_acc, post_fin, post_acc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pvec.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            _tilespec(n * csub),
            _tilespec(2 * csub),
            _tilespec(5 * MSUB),
        ],
        out_specs=[
            _tilespec(n * csub),
            _tilespec(2 * csub),
            _tilespec(5 * MSUB),
            _tilespec(10 * MSUB),
            _tilespec(5 * MSUB),
            _tilespec(10 * MSUB),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n * csub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, 2 * csub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(pvec, x, dsp0, lane0)

    out_bcn = from_stream(out, bsz, c)
    post_state, m, _pre = metrics_from_lanes(pre_fin, pre_acc, post_fin,
                                             post_acc, state["analyzer"],
                                             bsz, n, sr)
    fast_f, slow_f = tiles_to_state(dsp_f, bsz, c, 2)
    return out_bcn, {"analyzer": post_state,
                     "dsp": {"fast_env": fast_f, "slow_env": slow_f}}, m
