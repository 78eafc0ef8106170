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

Layout: one sample of one clip-tile spans full ``(SUB, 128)`` vreg tiles —
``TILE = 1024`` clips × 2 channels = 2048 lanes = ``(16, 128)`` — so every
per-sample op runs at 100% VPU lane utilization (a ``[1, 1024]`` row layout
would idle 7 of 8 sublanes), and the doubled tile (vs the original
``(8, 128)``/TILE=512 layout) fills the issue slots the serial sample
recurrences leave idle: measured +23% on the full chain at B=4096,
plateauing at TILE=2048 (issue-throughput saturated). The wider streams
need the raised scoped-VMEM ceiling (chain_kernel.VMEM_LIMIT_BYTES).
Streams are stored ``[G, N·SUB, 128]``: grid
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
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from juicy_tpu import analyzer as _an
from juicy_tpu.models import punch as _punch
from juicy_tpu.ops.precise import pow32, tanh32
from juicy_tpu.utils.convert import db_to_gain, onepole_coeff, tau_coeff

TILE = 1024         # clips per grid step ((16,128) stereo sample tiles)
LANES = 128
MSUB = TILE // LANES            # sublane rows per mono ([TILE]) quantity


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
    transient_curve = pow32(transient, curve_exp)
    punch_gain = one + (p["punch"] * jnp.float32(12.0)
                        + p["slam"] * jnp.float32(22.0)) * transient_curve
    sustain_gain = one + (p["sustain"] * jnp.float32(4.0)
                          + p["slam"] * jnp.float32(1.5)) * \
        jnp.maximum(jnp.float32(0.0), s_env - transient * jnp.float32(0.6))
    wet = dry * punch_gain * sustain_gain
    drive = one + p["clip"] * jnp.float32(8.0) + p["slam"] * jnp.float32(4.0)
    soft = tanh32(wet * drive) / tanh32(drive)
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



# ---------------------------------------------------------------------------
# Texture full-stage kernel (the chain's heaviest stage).
#
# Waveguide materials (wood=2, plastic=3) keep the delay line in VMEM as a
# sliding window: the last H samples of history (H = ceil(max delay)+2,
# static per material) DMA in from an un-staged (pl.ANY) ref, new samples
# append inside the window scratch, and the last H samples DMA back out as
# the next block's history. The interpolated read reproduces the scan path's
# EXACT float32 fraction math by carrying the ring write index and
# evaluating pos = f32(widx_t) − delay in ring coordinates
# (JuicyTexture/PluginProcessor.cpp:91-105).
#
# The shared-LCG roughness noise (cpp:239-243) is generated in-kernel from
# per-sample jump coefficients (SMEM tables) — bit-identical to the serial
# C++ draws (ch0 takes draws 1..N, ch1 takes N+1..2N).
# ---------------------------------------------------------------------------

_TEX_COMMON = ("tail_shape", "texture", "mix", "out_gain", "decay",
               "low_boost", "split_low", "split_high", "env_atk", "env_rel",
               "wet_atk", "wet_rel", "dc_r", "auto_gain_base", "in_trim",
               "mat_trim")
_TEX_NMODES = 4
#: Pseudo-material for the chain kernel's PACKED NONWAVE lane: clips of
#: materials {0 gel, 1 metal, 4 flesh} share one tile, selected per lane by
#: a mode-word state tile (the in-kernel analog of
#: texture._material_substep_traced). Waveguide materials cannot pack —
#: their ring delay depends on knobs (texture/weight, cpp:174/189), and a
#: per-lane delay would need per-lane row gathers Mosaic doesn't do.
TEX_PACKED = 5
#: Pseudo-material for the chain kernel's MERGED WAVE launch: wood and
#: plastic tiles share ONE pallas_call, each grid row reading its own
#: material's constant row (incl. the structural ring delay) from a
#: per-grid-row SMEM pvec — the two materials' kernel bodies are the
#: SAME code after the shared-injection unification above, so no per-lane
#: select is needed; the row's consts ARE the material. Rows must be
#: single-material (TILE-aligned grouping, parallel/corpus.py).
TEX_WAVE_ROWS = 6
#: modes that run the waveguide body (sliding history window machinery)
WAVE_MODES = (2, 3, TEX_WAVE_ROWS)
# np scalar: module-level jnp constants are device arrays, which
# pallas kernels reject as captured consts
TWO_PI32 = _np.float32(2.0 * 3.14159265358979323846)


def _tex_hist_len(mode: int, sr: float) -> int:
    """Static history depth >= the max possible waveguide delay + 2.
    TEX_WAVE_ROWS carries BOTH materials, so it sizes for the larger
    (wood) delay; plastic rows simply keep more history than they read."""
    if mode in (2, TEX_WAVE_ROWS):
        return int(sr / 92.0) + 4      # cavity_hz >= 92 (cpp:174)
    return int(sr / 210.0) + 4         # tube_hz >= 210 (cpp:189)


def _mat_state_keys(mode: int):
    if mode == 0:
        return ("spring_pos", "spring_vel")
    if mode == 4:
        return ("flesh_pos_a", "flesh_vel_a", "flesh_pos_b", "flesh_vel_b")
    return None   # modal materials handled separately


def tex_unpack(nextp, mode: int, nexts=None):
    """Read the texture constants (everything after the 7 lane consts) from
    an SMEM cursor. Returns (kc, mc): the _TEX_COMMON dict and the
    mode-specific consts dict. Shared by the texture stage kernel and the
    multi-stage chain kernel (chain_kernel.py).

    `nexts` reads STRUCTURAL entries — values consumed as scalar row/ring
    indices (the waveguide delay and write index), which must stay SMEM
    scalars even when `nextp` yields per-clip parameter-row tiles
    (chain_kernel rows mode). Defaults to `nextp` (the shared-params and
    per-block-automation paths, where both cursors are the same SMEM row).
    """
    if nexts is None:
        nexts = nextp
    kc = {key: nextp() for key in _TEX_COMMON}
    nm = _TEX_NMODES
    mc = {}
    if mode == 0:
        mc["omega"], mc["kspring"] = nextp(2)
    elif mode == TEX_PACKED:
        # gel + metal + flesh const sets; the per-lane mode word selects
        mc["omega"], mc["kspring"] = nextp(2)
        mc["freqs"] = nextp(nm)
        mc["rs"] = nextp(nm)
        mc["a2s"] = nextp(nm)
        mc["gains"] = nextp(nm)
        mc["hz_cap"] = nextp()
        mc["th_scale"] = nextp()
        (mc["k_a"], mc["k_b"], mc["c_a"], mc["c_b"],
         mc["k_couple"]) = nextp(5)
    elif mode == 1:
        mc["freqs"] = nextp(nm)    # f0 * ratios
        mc["rs"] = nextp(nm)       # pole radii (constant: t60s static)
        mc["a2s"] = nextp(nm)
        mc["gains"] = nextp(nm)
        mc["hz_cap"] = nextp()
        mc["th_scale"] = nextp()
    elif mode in WAVE_MODES:
        mc["a1s"] = nextp(nm)
        mc["a2s"] = nextp(nm)
        mc["gains"] = nextp(nm)
        mc["delay"] = nexts()
        mc["damp"] = nextp()
        mc["wg_m0"], mc["wg_m1"] = nextp(2)
        mc["exc_s0"], mc["exc_s1"] = nextp(2)
        # wood: (0.09, 0.04); plastic: (0.14, 0)
        mc["exc_b0"], mc["exc_b1"] = nextp(2)
        (mc["om0"], mc["om1"], mc["om2"], mc["om3"],
         mc["om4"]) = nextp(5)
        mc["widx0_f"] = nextp()
    else:
        (mc["k_a"], mc["k_b"], mc["c_a"], mc["c_b"],
         mc["k_couple"]) = nextp(5)
    return kc, mc


def make_white_at(lcg_a_ref, lcg_b_ref, rng_rows, c: int, n: int):
    """In-kernel LCG roughness noise: per-sample jump coefficients (SMEM
    tables) applied to the per-clip states — bit-identical to the serial C++
    draws (ch0 takes draws 1..N, ch1 takes N+1..2N)."""
    one = jnp.float32(1.0)

    def white_at(t):
        """Roughness draws for sample t, both channels ([CSUB, 128])."""
        halves = []
        for ch in range(c):
            a = lcg_a_ref[0, ch * n + t]
            b = lcg_b_ref[0, ch * n + t]
            s = rng_rows * a + b
            bits = (s >> jnp.uint32(8)) & jnp.uint32(0xFFFF)
            # Mosaic lacks a direct u32->f32 cast; values fit in i32
            halves.append(bits.astype(jnp.int32).astype(jnp.float32)
                          * jnp.float32(1.0 / 32768.0) - one)
        return jnp.concatenate(halves, axis=0)

    return white_at


def make_tex_sample(mode: int, kc, mc, c: int, window_ref, H: int, L: int):
    """Build the in-kernel texture per-sample body.

    Returns ``tex_sample(d, w, st, t) -> (y, st')`` where st is the 10-tuple
    (env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, protect_gain, mat)
    of [CSUB, 128] tiles (mat = material-state list). Formulas/order
    identical to texture.make_sample_step (JuicyTexture cpp:107-277).
    `window_ref` is the VMEM sliding waveguide window (wave modes only)."""
    csub = _csub(c)
    wave = mode in WAVE_MODES
    one = jnp.float32(1.0)
    nm = _TEX_NMODES
    if wave:
        widx0 = mc["widx0_f"].astype(jnp.int32)
        delay, damp = mc["delay"], mc["damp"]
        wg_m0, wg_m1 = mc["wg_m0"], mc["wg_m1"]
        exc_s0, exc_s1 = mc["exc_s0"], mc["exc_s1"]
        exc_b0, exc_b1 = mc["exc_b0"], mc["exc_b1"]
        om0, om1, om2, om3, om4 = (mc["om0"], mc["om1"], mc["om2"],
                                   mc["om3"], mc["om4"])
        a1s, a2s, gains = mc["a1s"], mc["a2s"], mc["gains"]
    elif mode == 0:
        omega, kspring = mc["omega"], mc["kspring"]
    elif mode == 1:
        freqs, rs, a2s = mc["freqs"], mc["rs"], mc["a2s"]
        gains, hz_cap, th_scale = mc["gains"], mc["hz_cap"], mc["th_scale"]
    elif mode == TEX_PACKED:
        omega, kspring = mc["omega"], mc["kspring"]
        freqs, rs, a2s = mc["freqs"], mc["rs"], mc["a2s"]
        gains, hz_cap, th_scale = mc["gains"], mc["hz_cap"], mc["th_scale"]
        k_a, k_b = mc["k_a"], mc["k_b"]
        c_a, c_b, k_couple = mc["c_a"], mc["c_b"], mc["k_couple"]
        mode_t = mc["mode_t"]                  # per-lane mode word tile
        is_gel = mode_t == jnp.float32(0.0)
        is_metal = mode_t == jnp.float32(1.0)
        is_flesh = mode_t == jnp.float32(4.0)
        # per-lane material trims (cpp:117/167): metal 0.58/0.62,
        # gel/flesh 1.0 (the kc placeholders carry the gel value)
        from juicy_tpu.models import texture as _texm
        kc = dict(kc,
                  in_trim=jnp.where(
                      is_metal,
                      jnp.float32(_texm.MATERIAL_INPUT_TRIM[1]), one),
                  mat_trim=jnp.where(
                      is_metal, jnp.float32(_texm.MATERIAL_TRIM[1]), one))
    else:
        k_a, k_b = mc["k_a"], mc["k_b"]
        c_a, c_b, k_couple = mc["c_a"], mc["c_b"], mc["k_couple"]

    def mat_step(mat, core, impact, body, trail, hp_state, t):
        if mode == TEX_PACKED:
            # all three nonwave substeps per sample, selected per lane —
            # each branch's formulas/order identical to its static-mode
            # branch below (and to texture._material_substep_traced), so
            # every lane is bit-identical to a static-material run
            pos, vel = mat[0], mat[1]
            y1, y2 = mat[2:2 + nm], mat[2 + nm:2 + 2 * nm]
            pa, va, pb, vb = mat[2 + 2 * nm:6 + 2 * nm]
            # gel (cpp:137-151)
            zeta = jnp.float32(0.62) + trail * (jnp.float32(1.45)
                                                - jnp.float32(0.62))
            cdamp = jnp.float32(2.0) * zeta * omega
            force = core * (jnp.float32(0.52) + jnp.float32(0.62) * body)
            acc = kspring * (force - pos) - cdamp * vel
            vel_g = vel + acc
            pos_g = pos + vel_g
            shaped_gel = jnp.float32(0.48) * core + jnp.float32(1.85) * pos_g
            shaped_gel = tanh32(shaped_gel * (jnp.float32(0.96)
                                              + jnp.float32(0.28)
                                              * kc["texture"]))
            # metal (cpp:152-169)
            from juicy_tpu.ops.precise import cos32
            exc = core * (jnp.float32(0.19) + jnp.float32(0.52) * impact)
            bend = one + jnp.float32(0.09) * impact
            ys = []
            for k in range(nm):
                f = freqs[k] * bend
                f = jnp.where(f < jnp.float32(20.0), jnp.float32(20.0), f)
                f = jnp.where(hz_cap < f, hz_cap, f)
                theta = f * th_scale   # one shared 2pi/sr constant (texture.theta_scale)
                a1 = jnp.float32(2.0) * rs[k] * cos32(theta)
                ys.append(exc * gains[k] + a1 * y1[k] + a2s[k] * y2[k])
            modes_sum = ((ys[0] + ys[1]) + ys[2]) + ys[3]
            bright = jnp.float32(0.03) * impact * (core - hp_state)
            shaped_metal = (jnp.float32(0.44) * core
                            + jnp.float32(0.42) * modes_sum + bright) \
                * (jnp.float32(0.78) + jnp.float32(0.10) * kc["texture"])
            # flesh (cpp:214-236)
            force_f = core * (jnp.float32(0.55) + jnp.float32(0.65) * body)
            acc_a = k_a * (force_f - pa) - c_a * va - k_couple * (pa - pb)
            acc_b = k_b * (pa - pb) - c_b * vb
            va_f = va + acc_a
            vb_f = vb + acc_b
            pa_f = pa + va_f
            pb_f = pb + vb_f
            tissue = jnp.float32(0.92) * pa_f + jnp.float32(0.58) * pb_f
            nl = tissue - jnp.float32(0.19) * tissue * tissue * tissue
            shaped_flesh = tanh32((jnp.float32(0.50) * core
                                   + jnp.float32(1.34) * nl)
                                  * (jnp.float32(0.98)
                                     + jnp.float32(0.16) * kc["texture"]))
            shaped = jnp.where(is_gel, shaped_gel,
                               jnp.where(is_metal, shaped_metal,
                                         shaped_flesh))
            new_mat = ([jnp.where(is_gel, pos_g, pos),
                        jnp.where(is_gel, vel_g, vel)]
                       + [jnp.where(is_metal, ys[k], y1[k])
                          for k in range(nm)]
                       + [jnp.where(is_metal, y1[k], y2[k])
                          for k in range(nm)]
                       + [jnp.where(is_flesh, pa_f, pa),
                          jnp.where(is_flesh, va_f, va),
                          jnp.where(is_flesh, pb_f, pb),
                          jnp.where(is_flesh, vb_f, vb),
                          mode_t])
            return shaped, new_mat

        if mode == 0:    # gel (cpp:137-151)
            pos, vel = mat
            zeta = jnp.float32(0.62) + trail * (jnp.float32(1.45)
                                                - jnp.float32(0.62))
            cdamp = jnp.float32(2.0) * zeta * omega
            force = core * (jnp.float32(0.52) + jnp.float32(0.62) * body)
            acc = kspring * (force - pos) - cdamp * vel
            vel = vel + acc
            pos = pos + vel
            shaped = jnp.float32(0.48) * core + jnp.float32(1.85) * pos
            shaped = tanh32(shaped * (jnp.float32(0.96)
                                        + jnp.float32(0.28) * kc["texture"]))
            return shaped, [pos, vel]

        if mode == 1:    # metal (cpp:152-169): only theta varies per sample
            from juicy_tpu.ops.precise import cos32
            y1, y2 = mat[:nm], mat[nm:]
            exc = core * (jnp.float32(0.19) + jnp.float32(0.52) * impact)
            bend = one + jnp.float32(0.09) * impact
            ys = []
            for k in range(nm):
                f = freqs[k] * bend
                f = jnp.where(f < jnp.float32(20.0), jnp.float32(20.0), f)
                f = jnp.where(hz_cap < f, hz_cap, f)
                theta = f * th_scale   # one shared 2pi/sr constant (texture.theta_scale)
                a1 = jnp.float32(2.0) * rs[k] * cos32(theta)
                ys.append(exc * gains[k] + a1 * y1[k] + a2s[k] * y2[k])
            modes_sum = ((ys[0] + ys[1]) + ys[2]) + ys[3]
            bright = jnp.float32(0.03) * impact * (core - hp_state)
            shaped = (jnp.float32(0.44) * core
                      + jnp.float32(0.42) * modes_sum + bright) \
                * (jnp.float32(0.78) + jnp.float32(0.10) * kc["texture"])
            return shaped, ys + y1

        if wave:         # wood / plastic (cpp:170-212)
            y1, y2 = mat[:nm], mat[nm:2 * nm]
            prev_wave = mat[2 * nm]
            exc = core * (exc_s0 + exc_s1 * impact)
            # ring-coordinate fractional read — exact scan-path float math
            widx_t = widx0 + t
            widx_t = jnp.where(widx_t >= L, widx_t - L, widx_t)
            pos = widx_t.astype(jnp.float32) - delay
            pos = jnp.where(pos < jnp.float32(0.0), pos + jnp.float32(L), pos)
            i0 = pos.astype(jnp.int32)
            frac = pos - i0.astype(jnp.float32)
            tau = i0 - widx0
            tau = jnp.where(tau > t, tau - L, tau)
            tau = jnp.where(tau < -H, tau + L, tau)
            slot = H + tau
            base = pl.multiple_of(slot * csub, 8)
            v0 = window_ref[pl.ds(base, csub), :]
            v1 = window_ref[pl.ds(base + csub, csub), :]
            delayed = v0 + frac * (v1 - v0)
            # one shared injection form for BOTH waveguide materials:
            # wood passes (0.09, 0.04) (cpp:180), plastic passes
            # (exc_in_scale, 0.0) (cpp:196) — with exc_b1 = 0 this is
            # bit-identical to the plastic scan path's exc_b0 * exc
            # (x + (+/-0.0) == x and f32 multiply commutes), which is what
            # lets wood and plastic rows share ONE kernel body in the
            # merged wave launch (TEX_WAVE_ROWS)
            new_wave = damp * (wg_m0 * delayed + wg_m1 * prev_wave) \
                + exc * (exc_b0 + exc_b1 * body)
            wbase = pl.multiple_of((H + t) * csub, 8)
            window_ref[pl.ds(wbase, csub), :] = new_wave

            ys = []
            for k in range(nm):
                ys.append(exc * gains[k] + a1s[k] * y1[k] + a2s[k] * y2[k])
            modes_sum = ((ys[0] + ys[1]) + ys[2]) + ys[3]
            shaped = (om0 * core + om1 * delayed + om2 * modes_sum) \
                * (om3 + om4 * kc["texture"])
            return shaped, ys + y1 + [delayed]

        # flesh (cpp:214-236)
        pa, va, pb, vb = mat
        force = core * (jnp.float32(0.55) + jnp.float32(0.65) * body)
        acc_a = k_a * (force - pa) - c_a * va - k_couple * (pa - pb)
        acc_b = k_b * (pa - pb) - c_b * vb
        va = va + acc_a
        vb = vb + acc_b
        pa = pa + va
        pb = pb + vb
        tissue = jnp.float32(0.92) * pa + jnp.float32(0.58) * pb
        nl = tissue - jnp.float32(0.19) * tissue * tissue * tissue
        shaped = tanh32((jnp.float32(0.50) * core + jnp.float32(1.34) * nl)
                          * (jnp.float32(0.98)
                             + jnp.float32(0.16) * kc["texture"]))
        return shaped, [pa, va, pb, vb]

    def tex_sample(d, w, st, t):
        """The full C++ inner loop (cpp:107-277), identical formulas/order to
        texture.make_sample_step."""
        (env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg, mat) = st
        driven = d * kc["in_trim"]
        adry = jnp.abs(d)
        env_c = jnp.where(adry > env, kc["env_atk"], kc["env_rel"])
        env = env_c * env + (one - env_c) * adry
        impact = jnp.clip(jnp.maximum(jnp.float32(0.0), adry - env)
                          * jnp.float32(10.0), jnp.float32(0.0), one)
        body = jnp.clip(env * jnp.float32(3.2), jnp.float32(0.0), one)
        trail = jnp.clip(one - impact, jnp.float32(0.0), one) * kc["tail_shape"]

        lp = lp + kc["split_low"] * (driven - lp)
        hp = hp + kc["split_high"] * (driven - hp)
        low = lp * kc["low_boost"]
        high = driven - hp
        mid = driven - lp - high
        core = low + mid + high * (jnp.float32(0.9)
                                   + kc["texture"] * jnp.float32(1.3))

        shaped, mat = mat_step(mat, core, impact, body, trail, hp, t)

        noise_hp = noise_hp + jnp.float32(0.08) * (w - noise_hp)
        rough = w - noise_hp
        shaped = shaped + rough * (jnp.float32(0.004)
                                   + jnp.float32(0.022) * kc["texture"]) \
            * (jnp.float32(0.14) + jnp.float32(0.64) * impact)

        dynamics = one + impact * (jnp.float32(0.18)
                                   + kc["texture"] * jnp.float32(0.12)) \
            + body * jnp.float32(0.06)
        shaped = shaped * dynamics * kc["mat_trim"]

        tail_input = jnp.clip(shaped, jnp.float32(-2.0), jnp.float32(2.0)) \
            * (jnp.float32(0.45) + jnp.float32(0.55) * trail)
        tail = tail_input + tail * kc["decay"]
        wet = shaped + tail * (jnp.float32(0.30) + jnp.float32(0.45) * trail)

        wet_abs = jnp.abs(wet)
        wet_c = jnp.where(wet_abs > wet_env, kc["wet_atk"], kc["wet_rel"])
        wet_env = wet_c * wet_env + (one - wet_c) * wet_abs
        auto_comp = kc["auto_gain_base"] / (one + jnp.float32(1.8) * wet_env)
        wet = wet * jnp.clip(auto_comp, jnp.float32(0.18), one)

        mixed = d + kc["mix"] * (wet - d)
        pre_dc = mixed * kc["out_gain"]

        dc = pre_dc - dc_in + kc["dc_r"] * dc_out
        dc_in = pre_dc
        dc_out = dc

        peak = jnp.abs(dc)
        over = peak > jnp.float32(0.88)
        pg = jnp.where(over,
                       jnp.minimum(pg, (jnp.float32(0.88) / peak)
                                   * jnp.float32(0.98)),
                       pg + (one - pg) * jnp.float32(0.0028))
        o = dc * jnp.clip(pg, jnp.float32(0.2), one)
        y = jnp.clip(o, jnp.float32(-0.98), jnp.float32(0.98))
        return y, (env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg,
                   mat)

    return tex_sample


def _texture_kernel(mode, n, c, unroll, H, L, sr,
                    params_ref, lcg_a_ref, lcg_b_ref,
                    x_ref, rng_ref, dsp_ref, lane_ref, mat_ref, hist_ref,
                    out_ref, dsp_out_ref, mat_out_ref, newhist_ref,
                    pre_fin_ref, pre_acc_ref, post_fin_ref, post_acc_ref,
                    window_ref, dma_sem):
    csub = _csub(c)
    wave = mode in (2, 3)
    P = [0]

    def nextp(k=1):
        vals = tuple(params_ref[0, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    lane_k = tuple(nextp(7))
    kc, mc = tex_unpack(nextp, mode)

    g = pl.program_id(0)
    if wave:
        cp = pltpu.make_async_copy(hist_ref.at[g],
                                   window_ref.at[pl.ds(0, H * csub), :],
                                   dma_sem)
        cp.start()
        cp.wait()

    (env0, lp0, hp0, nhp0, tail0, wet0, dcin0, dcout0, pg0) = [
        dsp_ref[i * csub:(i + 1) * csub, :] for i in range(9)]
    lane = _lane_from_ref(lane_ref)
    nmat = mat_ref.shape[0] // csub
    mat = [mat_ref[i * csub:(i + 1) * csub, :] for i in range(nmat)]
    white_at = make_white_at(lcg_a_ref, lcg_b_ref, rng_ref[...], c, n)
    tex_sample = make_tex_sample(mode, kc, mc, c, window_ref, H, L)

    def split(s):
        l = s[0:MSUB, :]
        r = s[MSUB:2 * MSUB, :] if c > 1 else l
        return l, r

    def body_fn(tt, carry):
        st, lane = carry
        base = pl.multiple_of(tt * unroll * csub, 8)
        xchunk = x_ref[pl.ds(base, unroll * csub), :]
        ys = []
        for u in range(unroll):
            t = tt * unroll + u
            d = xchunk[u * csub:(u + 1) * csub, :]
            w = white_at(t)
            l, r = split(d)
            lane = _lane_step(lane, l, r, lane_k)
            y, st = tex_sample(d, w, st, t)
            ys.append(y)
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(ys, axis=0)
        return st, lane

    st0 = (env0, lp0, hp0, nhp0, tail0, wet0, dcin0, dcout0, pg0, mat)
    st, lane = jax.lax.fori_loop(0, n // unroll, body_fn, (st0, lane))
    for i, v in enumerate(st[:9]):
        dsp_out_ref[i * csub:(i + 1) * csub, :] = v
    for i, v in enumerate(st[9]):
        mat_out_ref[i * csub:(i + 1) * csub, :] = v
    _store_lane(lane, pre_fin_ref, pre_acc_ref)

    if wave:
        cp = pltpu.make_async_copy(
            window_ref.at[pl.ds(n * csub, H * csub), :], newhist_ref.at[g],
            dma_sem)
        cp.start()
        cp.wait()

    lane2 = _lane_reset(lane)

    def body2(tt, lane2):
        base = pl.multiple_of(tt * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane2 = _lane_step(lane2, l, r, lane_k)
        return lane2

    lane2 = jax.lax.fori_loop(0, n // unroll, body2, lane2)
    _store_lane(lane2, post_fin_ref, post_acc_ref)


def _u32_to_tiles(v):
    """[B] uint32 -> [G, MSUB, 128]."""
    return v.reshape(-1, MSUB, LANES)


def texture_kernel_state(state, sr: float, mode: int):
    """Standard texture state -> kernel-path state: the waveguide ring
    becomes a sliding history window of the last H samples (newest-last).
    Ring entries older than H are unreachable (delay <= H by construction,
    cpp:174/189), so no audio-relevant information is lost."""
    if mode not in WAVE_MODES:
        return state
    st = dict(state)
    wg = state["waveguide"]
    H = _tex_hist_len(mode, sr)
    widx = jnp.asarray(state["wave_idx"]).reshape(-1)[0]
    rolled = jnp.roll(wg, H - widx, axis=-1)
    st["waveguide"] = rolled[..., :H]
    return st


def texture_ring_state(state, sr: float, mode: int, L: int):
    """Kernel-path state -> standard ring state (unreachable ring entries
    zeroed — never read since delay <= H)."""
    if mode not in WAVE_MODES:
        return state
    st = dict(state)
    hist = state["waveguide"]
    H = hist.shape[-1]
    widx = jnp.asarray(state["wave_idx"]).reshape(-1)[0]
    pad = [(0, 0)] * (hist.ndim - 1) + [(0, L - H)]
    tmp = jnp.pad(hist, pad)
    st["waveguide"] = jnp.roll(tmp, widx - H, axis=-1)
    return st


_TEX_DSP_KEYS = ("env", "lp", "hp", "noise_hp", "tail", "wet_env",
                 "dc_in", "dc_out", "protect_gain")


def tex_param_list(params, dsp, sr: float, mode: int):
    """Texture kernel scalar constants (everything after the 7 lane consts),
    in the exact order tex_unpack reads them. `dsp` supplies the waveguide
    write index for wave modes."""
    from juicy_tpu.models import texture as _tex
    import numpy as np

    wave = mode in (2, 3)
    L = _tex.waveguide_size(sr)
    # PACKED: the shared kc body is material-independent except the
    # in/mat trims, which the kernel selects per lane from the mode word
    # (gel/flesh = 1.0, metal = the cpp:117/167 trims); block_consts(0)
    # supplies the gel/flesh value
    kc, _extract, _mstep, _pack = _tex.block_consts(
        params, sr, 0 if mode == TEX_PACKED else mode, L)
    mp = dict(texture=kc["texture"], tailshape=kc["tail_shape"],
              damping_amt=None, damping_mul=None, weight=None)
    # material_consts needs the damping intermediates; rebuild like
    # block_consts does (same helpers, same order)
    from juicy_tpu.utils.convert import jlimit as _jl, jmap as _jm
    damping_amt = _jl(0.0, 1.0, jnp.asarray(params["damping"], jnp.float32))
    mp.update(damping_amt=damping_amt,
              damping_mul=_jm(damping_amt, 1.35, 0.40),
              weight=jnp.asarray(params["weight"], jnp.float32))
    mc = _tex.material_consts(0 if mode == TEX_PACKED else mode, mp, sr, L)

    def metal_pv():
        from juicy_tpu.ops.precise import exp32
        mc1 = _tex.material_consts(1, mp, sr, L)
        freqs = mc1["f0"] * mc1["ratios"]
        t = jnp.maximum(jnp.float32(0.02), mc1["t60s"])
        rs = exp32(jnp.float32(np.log(np.float32(0.001)))
                   / (t * jnp.float32(sr)))
        return [*freqs, *rs, *(-rs * rs), *mc1["gains"],
                jnp.float32(0.45 * sr), jnp.float32(_tex.theta_scale(sr))]

    pv = [kc[k] for k in _TEX_COMMON]
    if mode == 0:
        pv += [mc["omega"], mc["k"]]
    elif mode == TEX_PACKED:
        mc4 = _tex.material_consts(4, mp, sr, L)
        pv += [mc["omega"], mc["k"], *metal_pv(),
               mc4["k_a"], mc4["k_b"], mc4["c_a"], mc4["c_b"],
               mc4["k_couple"]]
    elif mode == 1:
        pv += metal_pv()
    elif wave:
        exc_b = ((jnp.float32(0.09), jnp.float32(0.04)) if mode == 2
                 else (mc["exc_in_scale"], jnp.float32(0.0)))
        widx0 = jnp.asarray(dsp["wave_idx"]).reshape(-1)[0]
        pv += [*mc["a1"], *mc["a2"], *mc["gains"], mc["delay_samp"],
               mc["damp"], *mc["wg_mix"], *mc["exc_scale"], *exc_b,
               *mc["out_mix"], widx0.astype(jnp.float32)]
    else:
        pv += [mc["k_a"], mc["k_b"], mc["c_a"], mc["c_b"], mc["k_couple"]]
    return pv


def tex_mat_leaves(dsp, mode: int):
    """Material-state leaves ([B, C] each) in kernel mat-tile order.

    TEX_PACKED: the union of the three nonwave material states (14
    leaves); the chain-kernel packers append the per-clip mode-word tile
    as leaf 15."""
    nm = _TEX_NMODES
    if mode == TEX_PACKED:
        return ([dsp["spring_pos"], dsp["spring_vel"]]
                + [dsp["modal_y1"][..., k] for k in range(nm)]
                + [dsp["modal_y2"][..., k] for k in range(nm)]
                + [dsp["flesh_pos_a"], dsp["flesh_vel_a"],
                   dsp["flesh_pos_b"], dsp["flesh_vel_b"]])
    if mode == 0:
        return [dsp["spring_pos"], dsp["spring_vel"]]
    if mode == 1:
        return [dsp["modal_y1"][..., k] for k in range(nm)] + \
               [dsp["modal_y2"][..., k] for k in range(nm)]
    if mode in WAVE_MODES:
        return [dsp["modal_y1"][..., k] for k in range(nm)] + \
               [dsp["modal_y2"][..., k] for k in range(nm)] + \
               [dsp["prev_wave"]]
    return [dsp["flesh_pos_a"], dsp["flesh_vel_a"],
            dsp["flesh_pos_b"], dsp["flesh_vel_b"]]


def tex_rebuild_dsp(dsp, dsp_leaves, mat_out, mode: int, newhist, bsz: int,
                    c: int, n: int, sr: float):
    """Assemble the new texture dsp-state dict from kernel output leaves.
    The LCG advances by the closed-form jump (draw count is static)."""
    from juicy_tpu.models import texture as _tex
    from juicy_tpu.ops.noise import lcg_advance

    nm = _TEX_NMODES
    new_dsp = dict(dsp)
    for key, v in zip(_TEX_DSP_KEYS, dsp_leaves):
        new_dsp[key] = v
    if mode == TEX_PACKED:
        new_dsp["spring_pos"], new_dsp["spring_vel"] = mat_out[0], mat_out[1]
        new_dsp["modal_y1"] = jnp.stack(mat_out[2:2 + nm], axis=-1)
        new_dsp["modal_y2"] = jnp.stack(mat_out[2 + nm:2 + 2 * nm], axis=-1)
        (new_dsp["flesh_pos_a"], new_dsp["flesh_vel_a"],
         new_dsp["flesh_pos_b"], new_dsp["flesh_vel_b"]) = \
            mat_out[2 + 2 * nm:6 + 2 * nm]
        # mat_out[14] is the mode-word passthrough — not a state leaf
        new_dsp["rng"] = lcg_advance(dsp["rng"], c * n)
        return new_dsp
    if mode == 0:
        new_dsp["spring_pos"], new_dsp["spring_vel"] = mat_out
    elif mode == 1:
        new_dsp["modal_y1"] = jnp.stack(mat_out[:nm], axis=-1)
        new_dsp["modal_y2"] = jnp.stack(mat_out[nm:], axis=-1)
    elif mode in WAVE_MODES:
        new_dsp["modal_y1"] = jnp.stack(mat_out[:nm], axis=-1)
        new_dsp["modal_y2"] = jnp.stack(mat_out[nm:2 * nm], axis=-1)
        new_dsp["prev_wave"] = mat_out[2 * nm]
        new_dsp["waveguide"] = from_stream(newhist, bsz, c)
        new_dsp["wave_idx"] = jnp.mod(dsp["wave_idx"] + n,
                                      _tex.waveguide_size(sr))
    else:
        (new_dsp["flesh_pos_a"], new_dsp["flesh_vel_a"],
         new_dsp["flesh_pos_b"], new_dsp["flesh_vel_b"]) = mat_out
    new_dsp["rng"] = lcg_advance(dsp["rng"], c * n)
    return new_dsp


def texture_stage_step(params, state, block, sr: float, unroll: int = 8,
                       interpret: bool = False):
    """Full texture step (pre-analyze → DSP → post-analyze) as one kernel.

    `block`: [B, C, N]; `state` as from vmap(plugin.init_state) but with the
    waveguide in kernel (history-window) form — see texture_kernel_state.
    Returns (out, new_state, metrics).
    """
    from juicy_tpu.models import texture as _tex
    from juicy_tpu.ops.noise import _jump_coefficients

    block = jnp.asarray(block, jnp.float32)
    bsz, c, n = block.shape
    if bsz % TILE:
        raise ValueError(f"batch {bsz} must be a multiple of {TILE}")
    csub = _csub(c)
    mode = _tex.static_material(params)
    if mode is None:
        raise NotImplementedError("texture kernel needs a static material")
    mode = max(0, min(4, mode))
    wave = mode in (2, 3)
    L = _tex.waveguide_size(sr)
    H = _tex_hist_len(mode, sr) if wave else 0

    dsp = state["dsp"]
    pvec = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                      [*_lane_consts(sr),
                       *tex_param_list(params, dsp, sr, mode)]])[None]

    a_np, b_np = _jump_coefficients(c * n)
    lcg_a = jnp.asarray(a_np)[None]
    lcg_b = jnp.asarray(b_np)[None]

    x = to_stream(block)
    rng_t = _u32_to_tiles(jnp.asarray(dsp["rng"], jnp.uint32))
    dsp_rows = state_to_tiles([dsp[k] for k in _TEX_DSP_KEYS])
    lane0 = pack_lane(state["analyzer"], bsz)

    mat_leaves = tex_mat_leaves(dsp, mode)
    mat0 = state_to_tiles(mat_leaves)
    nmat = len(mat_leaves)

    grid = bsz // TILE
    if wave:
        hist = to_stream(dsp["waveguide"])      # [G, H*CSUB, 128]
        win_rows = (H + n) * csub
    else:
        hist = jnp.zeros((grid, 8, LANES), jnp.float32)
        win_rows = 8

    kernel = functools.partial(_texture_kernel, mode, n, c, unroll, H, L, sr)

    def wrapped(params_ref, lcg_a_ref, lcg_b_ref, x_ref, rng_ref, dsp_ref,
                lane_ref, mat_ref, hist_ref, out_ref, dsp_out_ref,
                mat_out_ref, newhist_ref, pre_fin_ref, pre_acc_ref,
                post_fin_ref, post_acc_ref, window_ref, dma_sem):
        kernel(params_ref, lcg_a_ref, lcg_b_ref,
               x_ref.at[0], rng_ref.at[0], dsp_ref.at[0], lane_ref.at[0],
               mat_ref.at[0], hist_ref,
               out_ref.at[0], dsp_out_ref.at[0], mat_out_ref.at[0],
               newhist_ref,
               pre_fin_ref.at[0], pre_acc_ref.at[0], post_fin_ref.at[0],
               post_acc_ref.at[0], window_ref, dma_sem)

    smem = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0),  # noqa: E731
                                  memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    out, dsp_f, mat_f, newhist, pre_fin, pre_acc, post_fin, post_acc = \
        pl.pallas_call(
            wrapped,
            grid=(grid,),
            in_specs=[
                smem(pvec.shape[1]), smem(c * n), smem(c * n),
                _tilespec(n * csub), _tilespec(MSUB), _tilespec(9 * csub),
                _tilespec(5 * MSUB), _tilespec(nmat * csub), anyspec,
            ],
            out_specs=[
                _tilespec(n * csub), _tilespec(9 * csub),
                _tilespec(nmat * csub), anyspec,
                _tilespec(5 * MSUB), _tilespec(10 * MSUB),
                _tilespec(5 * MSUB), _tilespec(10 * MSUB),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid, n * csub, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 9 * csub, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, nmat * csub, LANES), jnp.float32),
                jax.ShapeDtypeStruct(hist.shape, jnp.float32),
                jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((win_rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(pvec, lcg_a, lcg_b, x, rng_t, dsp_rows, lane0, mat0, hist)

    out_bcn = from_stream(out, bsz, c)
    post_state, m, _pre = metrics_from_lanes(pre_fin, pre_acc, post_fin,
                                             post_acc, state["analyzer"],
                                             bsz, n, sr)
    dsp_leaves = tiles_to_state(dsp_f, bsz, c, 9)
    mat_out = tiles_to_state(mat_f, bsz, c, nmat)
    new_dsp = tex_rebuild_dsp(dsp, dsp_leaves, mat_out, mode, newhist,
                              bsz, c, n, sr)
    return out_bcn, {"analyzer": post_state, "dsp": new_dsp}, m


# ---------------------------------------------------------------------------
# Saturator full-stage kernel
# ---------------------------------------------------------------------------

def _sat_kernel(n, c, unroll, params_ref, x_ref, dsp_ref, lane_ref,
                out_ref, dsp_out_ref, pre_fin_ref, pre_acc_ref,
                post_fin_ref, post_acc_ref):
    csub = _csub(c)
    lane_k = tuple(params_ref[0, i] for i in range(7))
    in_gain = params_ref[0, 7]
    asym = params_ref[0, 8]
    tone_c = params_ref[0, 9]
    out_gain = params_ref[0, 10]
    mix = params_ref[0, 11]

    tone0 = dsp_ref[0:csub, :]
    lane0 = _lane_from_ref(lane_ref)

    def split(s):
        l = s[0:MSUB, :]
        r = s[MSUB:2 * MSUB, :] if c > 1 else l
        return l, r

    def body(t, carry):
        tone, lane = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        ys = []
        for u in range(unroll):
            d = chunk[u * csub:(u + 1) * csub, :]
            l, r = split(d)
            lane = _lane_step(lane, l, r, lane_k)
            # cpp:89-96: drive -> asym skew -> tanh -> tone one-pole -> mix
            driven = d * in_gain
            skewed = driven + asym * driven * driven
            soft = tanh32(skewed)
            tone = tone + tone_c * (soft - tone)
            wet = tone * out_gain
            ys.append(d + mix * (wet - d))
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(ys, axis=0)
        return tone, lane

    tone, lane = jax.lax.fori_loop(0, n // unroll, body, (tone0, lane0))
    dsp_out_ref[0:csub, :] = tone
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


def saturator_stage_step(params, state, block, sr: float, unroll: int = 8,
                         interpret: bool = False):
    """Full saturator step (pre-analyze → DSP → post-analyze) as one kernel.
    Same contract as punch_stage_step. NOTE: the tone one-pole runs in the
    C++'s serial op order (tone += c*(soft - tone)); the XLA path's
    associative form differs by reassociation ulps only."""
    from juicy_tpu.models import saturator as _sat2

    block = jnp.asarray(block, jnp.float32)
    bsz, c, n = block.shape
    if bsz % TILE:
        raise ValueError(f"batch {bsz} must be a multiple of {TILE}")
    csub = _csub(c)

    k = _sat2.sat_consts(params, sr)
    pvec = jnp.stack([*_lane_consts(sr), k["in_gain"], k["asym"],
                      k["tone_coeff"], k["out_gain"], k["mix"]])[None]
    x = to_stream(block)
    dsp0 = state_to_tiles([state["dsp"]["tone_state"]])
    lane0 = pack_lane(state["analyzer"], bsz)
    grid = bsz // TILE
    kernel = _squeeze_kernel(functools.partial(_sat_kernel, n, c, unroll))

    out, dsp_f, pre_fin, pre_acc, post_fin, post_acc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pvec.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            _tilespec(n * csub),
            _tilespec(csub),
            _tilespec(5 * MSUB),
        ],
        out_specs=[
            _tilespec(n * csub),
            _tilespec(csub),
            _tilespec(5 * MSUB),
            _tilespec(10 * MSUB),
            _tilespec(5 * MSUB),
            _tilespec(10 * MSUB),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n * csub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, csub, LANES), jnp.float32),
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
    (tone_f,) = tiles_to_state(dsp_f, bsz, c, 1)
    return out_bcn, {"analyzer": post_state,
                     "dsp": {"tone_state": tone_f}}, m


# ---------------------------------------------------------------------------
# Motion full-stage kernel: pass 1 (onset/RNG) + pass 2 per channel
# (channel-serial shared state) + both analyzer lanes — five sequential
# loops in ONE pallas_call (the XLA path runs five separate scans).
# Reuses motion.make_p1_step / make_p2_step verbatim for the bodies.
# ---------------------------------------------------------------------------

# mono ([B]-scalar) motion state rows, in kernel tile order; the f32-cast
# onset cooldown rides as an 11th row.
MOTION_MONO_KEYS = ("env", "repetition", "budget_env", "variation_tone",
                    "variation_transient", "variation_tail",
                    "variation_tone_target", "variation_transient_target",
                    "variation_tail_target", "motion_phase")


def make_motion_p1_body(micro_var, tau15, cd_samples):
    """In-kernel motion pass-1 per-sample body. Mirrors motion.make_p1_step
    exactly (JuicyMotion cpp:75-95) with the cooldown counter as f32 rows
    (int in the scan path; values are whole numbers either way)."""
    one = jnp.float32(1.0)

    def p1_body(carry, x):
        env, cooldown, repetition, rng, vt, vtr, vtl = carry
        env = tau15 * env + (one - tau15) * x
        cooldown = jnp.maximum(cooldown - one, jnp.float32(0.0))
        onset = (x > env * jnp.float32(1.35) + jnp.float32(0.02)) & \
            (cooldown <= jnp.float32(0.0))
        cooldown = jnp.where(onset, cd_samples, cooldown)
        repetition = jnp.where(onset, repetition + one, repetition)
        r1 = rng * jnp.uint32(1664525) + jnp.uint32(1013904223)
        r2 = r1 * jnp.uint32(1664525) + jnp.uint32(1013904223)
        r3 = r2 * jnp.uint32(1664525) + jnp.uint32(1013904223)

        def draw(r, shift):
            bits = (r >> jnp.uint32(shift)) & jnp.uint32(0x7FFF)
            return bits.astype(jnp.int32).astype(jnp.float32) \
                * jnp.float32(1.0 / 16384.0) - one

        vt = jnp.where(onset, draw(r1, 7) * micro_var * jnp.float32(0.9), vt)
        vtr = jnp.where(onset, draw(r2, 9) * micro_var * jnp.float32(0.8),
                        vtr)
        vtl = jnp.where(onset, draw(r3, 11) * micro_var * jnp.float32(0.8),
                        vtl)
        rng = jnp.where(onset, r3, rng)
        repetition = repetition * jnp.float32(0.997)
        return (env, cooldown, repetition, rng, vt, vtr, vtl)

    return p1_body


def motion_mono_tiles(dsp, b: int):
    """Motion mono state dict -> [G, 11*MSUB, 128] kernel input."""
    leaves = [jnp.broadcast_to(jnp.asarray(dsp[k], jnp.float32), (b,))
              for k in MOTION_MONO_KEYS]
    leaves.append(jnp.broadcast_to(
        jnp.asarray(dsp["onset_cooldown"]).astype(jnp.float32), (b,)))
    return mono_to_tiles(leaves)


def motion_rebuild_dsp(mono_out, rng_leaf, lp_f, tail_f, prev_f):
    """Kernel output leaves -> motion dsp-state dict."""
    new_dsp = {k: mono_out[i] for i, k in enumerate(MOTION_MONO_KEYS)}
    new_dsp["onset_cooldown"] = mono_out[10].astype(jnp.int32)
    new_dsp["rng"] = rng_leaf
    new_dsp["lp"] = lp_f
    new_dsp["tail"] = tail_f
    new_dsp["prev"] = prev_f
    return new_dsp

def _motion_kernel(n, c, unroll, sr, params_ref, x_ref, mono_ref, chan_ref,
                   rng_ref, lane_ref,
                   out_ref, mono_out_ref, chan_out_ref, rng_out_ref,
                   tgt_out_ref, pre_fin_ref, pre_acc_ref, post_fin_ref,
                   post_acc_ref, *ch_scratch):
    from juicy_tpu.models import motion as _motion

    csub = _csub(c)
    lane_k = tuple(params_ref[0, i] for i in range(7))
    micro_var = params_ref[0, 7]
    repeat_ctrl = params_ref[0, 8]
    kc = {key: params_ref[0, 9 + i] for i, key in enumerate(
        ("var_slew", "motion_inc", "lfo_depth", "depth", "micro_var",
         "tail_feedback", "mix", "out_gain", "budget_coeff",
         "budget_target"))}

    # mono state rows: env, repetition, budget_env, vt, vtr, vtl,
    #                  vt_t, vtr_t, vtl_t, phase, cooldown(f32)
    ms = [mono_ref[i * MSUB:(i + 1) * MSUB, :] for i in range(11)]
    (env0, rep0, be0, vt0, vtr0, vtl0, vtt0, vtrt0, vtlt0, phase0, cd0) = ms
    rng0 = rng_ref[...]
    lane = _lane_from_ref(lane_ref)

    def split(s):
        l = s[0:MSUB, :]
        r = s[MSUB:2 * MSUB, :] if c > 1 else l
        return l, r

    # ---- loop 1: pre-lane + pass 1 (cpp:75-95) ----
    one = jnp.float32(1.0)
    p1_body = make_motion_p1_body(micro_var, params_ref[0, 19],
                                  jnp.float32(int(sr * 0.04)))

    def loop1(t, carry):
        p1c, lane = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            d = chunk[u * csub:(u + 1) * csub, :]
            l, r = split(d)
            lane = _lane_step(lane, l, r, lane_k)
            mono = jnp.float32(0.5) * (l + r)
            p1c = p1_body(p1c, jnp.abs(mono))
        return p1c, lane

    p1c0 = (env0, cd0, rep0, rng0, vtt0, vtrt0, vtlt0)
    p1c, lane = jax.lax.fori_loop(0, n // unroll, loop1, (p1c0, lane))
    env_f, cd_f, rep_f, rng_f, vtt_f, vtrt_f, vtlt_f = p1c
    _store_lane(lane, pre_fin_ref, pre_acc_ref)

    # block-level scales (cpp:97-99)
    rep_norm = jnp.clip(rep_f * jnp.float32(0.08), jnp.float32(0.0), one)
    repetition_scale = one - repeat_ctrl * rep_norm * jnp.float32(0.65)
    recovery = one + repeat_ctrl * (one - rep_norm) * jnp.float32(0.25)

    from juicy_tpu.models.motion import make_p2_step
    shared = (vt0, vtr0, vtl0, phase0)
    be = be0
    for ch in range(c):
        off = jnp.float32(0.0) if ch == 0 else jnp.float32(0.85)
        p2 = make_p2_step(kc, (vtt_f, vtrt_f, vtlt_f),
                          (repetition_scale, recovery), off, sr)
        lp = chan_ref[(0 * c + ch) * MSUB:(0 * c + ch + 1) * MSUB, :]
        tail = chan_ref[(1 * c + ch) * MSUB:(1 * c + ch + 1) * MSUB, :]
        prev = chan_ref[(2 * c + ch) * MSUB:(2 * c + ch + 1) * MSUB, :]
        carry0 = shared[:3] + (shared[3], lp, tail, prev, be)

        def loop2(t, carry, ch=ch, p2=p2):
            base = pl.multiple_of(t * unroll * csub, 8)
            chunk = x_ref[pl.ds(base, unroll * csub), :]
            ys = []
            for u in range(unroll):
                d = chunk[u * csub + ch * MSUB:u * csub + (ch + 1) * MSUB, :]
                carry, y = p2(carry, d)
                ys.append(y)
            # per-channel scratch keeps dynamic stores 8-row aligned
            # (interleaved per-sample offsets would sit at 4 mod 8); only
            # claim alignment when the chunk stride actually provides it
            sbase = t * unroll * MSUB
            if (unroll * MSUB) % 8 == 0:
                sbase = pl.multiple_of(sbase, 8)
            ch_scratch[ch][pl.ds(sbase, unroll * MSUB), :] = \
                jnp.concatenate(ys, axis=0)
            return carry

        carry = jax.lax.fori_loop(0, n // unroll, loop2, carry0)
        vt_s, vtr_s, vtl_s, phase_s, lp_f, tail_f, prev_f, be = \
            carry[0], carry[1], carry[2], carry[3], carry[4], carry[5], \
            carry[6], carry[7]
        shared = (vt_s, vtr_s, vtl_s, phase_s)
        chan_out_ref[(0 * c + ch) * MSUB:(0 * c + ch + 1) * MSUB, :] = lp_f
        chan_out_ref[(1 * c + ch) * MSUB:(1 * c + ch + 1) * MSUB, :] = tail_f
        chan_out_ref[(2 * c + ch) * MSUB:(2 * c + ch + 1) * MSUB, :] = prev_f

    # merge the per-channel scratches into interleaved sample tiles
    merge_u = max(1, 8 // MSUB)

    def merge(t, _):
        base = pl.multiple_of(t * merge_u * MSUB, 8)
        obase = pl.multiple_of(t * merge_u * csub, 8)
        chunks = [ch_scratch[ch][pl.ds(base, merge_u * MSUB), :]
                  for ch in range(c)]
        rows = []
        for u in range(merge_u):
            for ch in range(c):
                rows.append(chunks[ch][u * MSUB:(u + 1) * MSUB, :])
        out_ref[pl.ds(obase, merge_u * csub), :] = jnp.concatenate(rows, 0)
        return 0

    jax.lax.fori_loop(0, n // merge_u, merge, 0)

    # mono state out
    outs = [env_f, rep_f, be, shared[0], shared[1], shared[2],
            vtt_f, vtrt_f, vtlt_f, shared[3], cd_f]
    for i, v in enumerate(outs):
        mono_out_ref[i * MSUB:(i + 1) * MSUB, :] = v
    rng_out_ref[...] = rng_f
    tgt_out_ref[...] = vtt_f  # placeholder row (targets already in mono out)

    # ---- post lane over the rendered output ----
    lane2 = _lane_reset(lane)

    def loop4(t, lane2):
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane2 = _lane_step(lane2, l, r, lane_k)
        return lane2

    lane2 = jax.lax.fori_loop(0, n // unroll, loop4, lane2)
    _store_lane(lane2, post_fin_ref, post_acc_ref)


def motion_stage_step(params, state, block, sr: float, unroll: int = 8,
                      interpret: bool = False):
    """Full motion step (pre-analyze → pass1 → pass2 ch-serial →
    post-analyze) as one kernel. Same contract as punch_stage_step."""
    from juicy_tpu.models import motion as _motion
    from juicy_tpu.utils.convert import tau_coeff

    block = jnp.asarray(block, jnp.float32)
    bsz, c, n = block.shape
    if bsz % TILE:
        raise ValueError(f"batch {bsz} must be a multiple of {TILE}")
    csub = _csub(c)
    dsp = state["dsp"]

    kc = _motion.p2_consts(params, sr)
    pvec = jnp.stack([*_lane_consts(sr),
                      jnp.asarray(params["microvar"], jnp.float32),
                      jnp.asarray(params["repeatctrl"], jnp.float32),
                      kc["var_slew"], kc["motion_inc"], kc["lfo_depth"],
                      kc["depth"], kc["micro_var"], kc["tail_feedback"],
                      kc["mix"], kc["out_gain"], kc["budget_coeff"],
                      kc["budget_target"],
                      tau_coeff(0.015, sr)])[None]

    x = to_stream(block)
    b = bsz
    mono0 = motion_mono_tiles(dsp, b)
    chan0 = state_to_tiles([dsp["lp"], dsp["tail"], dsp["prev"]])
    rng0 = _u32_to_tiles(jnp.broadcast_to(jnp.asarray(dsp["rng"], jnp.uint32),
                                          (b,)))
    lane0 = pack_lane(state["analyzer"], bsz)
    grid = bsz // TILE

    def wrapped(params_ref, x_ref, mono_ref, chan_ref, rng_ref, lane_ref,
                out_ref, mono_out_ref, chan_out_ref, rng_out_ref,
                tgt_out_ref, pre_fin_ref, pre_acc_ref, post_fin_ref,
                post_acc_ref, *scratches):
        _motion_kernel(n, c, unroll, sr, params_ref,
                       x_ref.at[0], mono_ref.at[0], chan_ref.at[0],
                       rng_ref.at[0], lane_ref.at[0],
                       out_ref.at[0], mono_out_ref.at[0], chan_out_ref.at[0],
                       rng_out_ref.at[0], tgt_out_ref.at[0],
                       pre_fin_ref.at[0], pre_acc_ref.at[0],
                       post_fin_ref.at[0], post_acc_ref.at[0], *scratches)

    out, mono_f, chan_f, rng_f, _tgt, pre_fin, pre_acc, post_fin, post_acc = \
        pl.pallas_call(
            wrapped,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, pvec.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                _tilespec(n * csub), _tilespec(11 * MSUB),
                _tilespec(3 * csub), _tilespec(MSUB), _tilespec(5 * MSUB),
            ],
            out_specs=[
                _tilespec(n * csub), _tilespec(11 * MSUB),
                _tilespec(3 * csub), _tilespec(MSUB), _tilespec(MSUB),
                _tilespec(5 * MSUB), _tilespec(10 * MSUB),
                _tilespec(5 * MSUB), _tilespec(10 * MSUB),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid, n * csub, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 11 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 3 * csub, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, MSUB, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((grid, MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 5 * MSUB, LANES), jnp.float32),
                jax.ShapeDtypeStruct((grid, 10 * MSUB, LANES), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((n * MSUB, LANES), jnp.float32)
                            for _ in range(c)],
            interpret=interpret,
        )(pvec, x, mono0, chan0, rng0, lane0)

    out_bcn = from_stream(out, bsz, c)
    post_state, m, _pre = metrics_from_lanes(pre_fin, pre_acc, post_fin,
                                             post_acc, state["analyzer"],
                                             bsz, n, sr)
    mono_out = tiles_to_mono(mono_f, bsz, 11)
    lp_f, tail_f, prev_f = tiles_to_state(chan_f, bsz, c, 3)
    new_dsp = motion_rebuild_dsp(mono_out, tiles_to_mono(rng_f, bsz, 1)[0],
                                 lp_f, tail_f, prev_f)
    return out_bcn, {"analyzer": post_state, "dsp": new_dsp}, m
