"""Multi-stage VMEM-resident chain kernels: the whole 7-plugin suite as
TWO ``pallas_call``s per block (plus width's time-parallel XLA pass between
them), with every inter-stage audio stream living in VMEM.

Why: the fused chain executor (runtime/chain_fused.py) is bound by
inter-stage HBM traffic — ~9 intermediate streams × 16 MB (B=4096)
written + re-read per block ≈ 380 MB at the measured effective rate
(BASELINE.md "where the remaining time goes"), with analyzer bodies and
loop count measured *not* to matter. These kernels keep the punch →
saturator → texture → motion intermediates (and cohere → infer) entirely
in VMEM scratch, so per block the front kernel reads ONE stream from HBM
and writes ONE; same for the back kernel.

Front kernel (per block, per (8,128)-tiled clip batch):
  loop 1: pre-analyzer lanes for punch/saturator/texture/motion + punch DSP
          + saturator DSP + texture DSP (incl. in-kernel LCG roughness)
          + motion pass-1 — ONE pass over the samples, audio flowing
          stage-to-stage inside the loop body (stage i+1 at sample t needs
          only stage i at t — the same dependency structure chain_fused
          exploits, now at register level);
  loop 2: post lanes for punch/sat/texture (their pre lanes finished at the
          end of loop 1 — one shared analyzer instance per plugin threads
          pre → post, JuicinessAnalyzer.h:33-43) + motion pass-2 ch0;
  loop 3: motion pass-2 ch1 (channel-serial shared state,
          JuicyMotion/PluginProcessor.cpp:108-115) + channel merge;
  loop 4: motion post lane + width PRE lane over the kernel's output.

Width itself (cumsum width-shrink + Haas window read) is parallel over
time — it runs as plain XLA between the kernels (models/width.py).

Back kernel:
  loop 1: width POST lane + cohere PRE lane + cohere mono 3-band analysis
          (JuicyCohere/PluginProcessor.cpp:62-76);
  block:  learn EMA + context-fit + band compensation gains in-kernel
          (cpp:78-96; pow/log via exp/log — ulp-level vs the XLA path);
  loop 2: cohere render (cpp:99-118, split filters zeroed per block — the
          reference quirk) + cohere POST lane + infer PRE lane + infer trim
          (JuicyInfer/PluginProcessor.cpp:74-79);
  loop 3: infer POST lane over the trimmed output.

All per-sample bodies are the proven in-kernel forms from
kernels/stage_kernels.py (texture/motion) or direct transcriptions of the
models' per-sample bodies (punch/saturator/cohere) in the exact float32 op
order of the C++. Score formulas run outside in XLA via finalize_lane.

Unsupported layouts (non-canonical stage order, mono, waveguide texture
materials wood/plastic — their VMEM sliding window would overflow the
~16 MB/core budget on top of the four stream scratches, traced materials)
raise ChainKernelUnsupported; callers fall back to the XLA fused executor.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from juicy_tpu.kernels import stage_kernels as sk
from juicy_tpu.models import (motion as _motion, punch as _punch,
                              saturator as _sat, texture as _texture,
                              width as _width)
from juicy_tpu.utils.convert import db_to_gain, onepole_coeff, tau_coeff

CHAIN_ORDER = ("punch", "saturator", "texture", "motion", "width",
               "cohere", "infer")

# front-kernel lane slots (width rides only its PRE lane here; its input is
# the front kernel's output)
_F_LANES = ("punch_pre", "punch_post", "sat_pre", "sat_post", "tex_pre",
            "tex_post", "motion_pre", "motion_post", "width_pre")
# back-kernel lane slots
_B_LANES = ("width_post", "cohere_pre", "cohere_post", "infer_pre",
            "infer_post")

_MOTION_KC_KEYS = ("var_slew", "motion_inc", "lfo_depth", "depth",
                   "micro_var", "tail_feedback", "mix", "out_gain",
                   "budget_coeff", "budget_target")


class ChainKernelUnsupported(Exception):
    """Raised when a chain layout cannot run on the kernel path."""


def supports_chain_kernel(chain) -> bool:
    try:
        _check_chain(chain)
        return True
    except ChainKernelUnsupported:
        return False


def _check_chain(chain) -> int:
    names = tuple(p.defn.name for p in chain.plugins)
    if names != CHAIN_ORDER:
        raise ChainKernelUnsupported(f"stage order {names} != {CHAIN_ORDER}")
    if chain.channels != 2:
        raise ChainKernelUnsupported("chain kernel is stereo-only")
    tex_params = chain.plugins[2].full_params(chain.params[2])
    mode = _texture.static_material(tex_params)
    if mode is None:
        raise ChainKernelUnsupported("texture material must be static")
    mode = max(0, min(4, mode))
    if mode in (2, 3):
        raise ChainKernelUnsupported(
            "waveguide materials (wood/plastic) exceed the VMEM budget in "
            "the multi-stage kernel; use the XLA fused executor")
    return mode


# ---------------------------------------------------------------------------
# In-kernel lane helpers at a slot offset (the stage kernels use one lane
# per ref; here 9/5 lanes share two refs).
# ---------------------------------------------------------------------------

def _lane_init_at(lanes_ref, idx: int):
    msub = sk.MSUB
    base = idx * 5
    fin = [lanes_ref[(base + i) * msub:(base + i + 1) * msub, :]
           for i in range(5)]
    z = jnp.zeros_like(fin[0])
    return [fin[0], fin[1], fin[4], z, z, fin[2], fin[3],
            z, z, z, z, z, z, z, z]


def _store_lane_at(lane, fin_ref, acc_ref, idx: int):
    msub = sk.MSUB
    for i, j in enumerate(sk._LANE_FIN):
        r = idx * 5 + i
        fin_ref[r * msub:(r + 1) * msub, :] = lane[j]
    for i, j in enumerate(sk._LANE_ACC):
        r = idx * 10 + i
        acc_ref[r * msub:(r + 1) * msub, :] = lane[j]


def _lane_slices(fin_t, acc_t, idx: int):
    msub = sk.MSUB
    return (fin_t[:, idx * 5 * msub:(idx + 1) * 5 * msub, :],
            acc_t[:, idx * 10 * msub:(idx + 1) * 10 * msub, :])


# ---------------------------------------------------------------------------
# Front kernel: punch -> saturator -> texture -> motion
# ---------------------------------------------------------------------------

def _front_kernel(mode, n, c, unroll, sr,
                  params_ref, lcg_a_ref, lcg_b_ref,
                  x_ref, pdsp_ref, sdsp_ref, tdsp_ref, tmat_ref, trng_ref,
                  mmono_ref, mchan_ref, mrng_ref, lanes_ref,
                  out_ref, pdsp_out, sdsp_out, tdsp_out, tmat_out,
                  mmono_out, mchan_out, mrng_out, fin_ref, acc_ref,
                  y1_ref, y2_ref, *ch_scratch):
    msub = sk.MSUB
    csub = c * msub
    one = jnp.float32(1.0)
    P = [0]

    def nextp(k=1):
        vals = tuple(params_ref[0, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    lane_k = tuple(nextp(7))
    # punch consts (JuicyPunch cpp:74-110)
    pp = {key: nextp() for key in sk._PUNCH_PKEYS}
    p_out_gain, fast_c, slow_c = nextp(3)
    # saturator consts (JuicySaturator cpp:74-96)
    s_in, s_asym, s_tone_c, s_out, s_mix = nextp(5)
    # motion consts (JuicyMotion cpp:64-99)
    mo_micro_var, mo_repeat_ctrl = nextp(2)
    mo_kc = {key: nextp() for key in _MOTION_KC_KEYS}
    mo_tau15 = nextp()
    # texture consts (variable length -> last)
    tex_kc, tex_mc = sk.tex_unpack(nextp, mode)

    white_at = sk.make_white_at(lcg_a_ref, lcg_b_ref, trng_ref[...], c, n)
    tex_sample = sk.make_tex_sample(mode, tex_kc, tex_mc, c, None, 0, 0)
    p1_body = sk.make_motion_p1_body(mo_micro_var, mo_tau15,
                                     jnp.float32(int(sr * 0.04)))

    def split(s):
        l = s[0:msub, :]
        r = s[msub:2 * msub, :] if c > 1 else l
        return l, r

    # --- initial states ---
    fast0 = pdsp_ref[0:csub, :]
    slow0 = pdsp_ref[csub:2 * csub, :]
    tone0 = sdsp_ref[0:csub, :]
    tex_core0 = tuple(tdsp_ref[i * csub:(i + 1) * csub, :] for i in range(9))
    nmat = tmat_ref.shape[0] // csub
    tex_mat0 = [tmat_ref[i * csub:(i + 1) * csub, :] for i in range(nmat)]
    ms = [mmono_ref[i * msub:(i + 1) * msub, :] for i in range(11)]
    (menv0, mrep0, mbe0, mvt0, mvtr0, mvtl0, mvtt0, mvtrt0, mvtlt0,
     mphase0, mcd0) = ms
    mrng0 = mrng_ref[...]

    lane_p = _lane_init_at(lanes_ref, 0)
    lane_s = _lane_init_at(lanes_ref, 1)
    lane_t = _lane_init_at(lanes_ref, 2)
    lane_m = _lane_init_at(lanes_ref, 3)

    # ---- loop 1: four pre lanes + punch + sat + texture DSP + motion p1 ----
    def loop1(tt, carry):
        (fast, slow, tone, tex_st, p1c, lane_p, lane_s, lane_t,
         lane_m) = carry
        base = pl.multiple_of(tt * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        y1s, y2s, y3s = [], [], []
        for u in range(unroll):
            t = tt * unroll + u
            d0 = chunk[u * csub:(u + 1) * csub, :]
            l, r = split(d0)
            lane_p = sk._lane_step(lane_p, l, r, lane_k)
            # punch DSP (cpp:83-110)
            a = jnp.abs(d0)
            fast = (one - fast_c) * a + fast_c * fast
            slow = (one - slow_c) * a + slow_c * slow
            d1 = sk._punch_shape_gain(d0, fast, slow, pp, p_out_gain)
            l, r = split(d1)
            lane_s = sk._lane_step(lane_s, l, r, lane_k)
            # saturator DSP (cpp:89-96; serial tone op order)
            driven = d1 * s_in
            skewed = driven + s_asym * driven * driven
            soft = jnp.tanh(skewed)
            tone = tone + s_tone_c * (soft - tone)
            d2 = d1 + s_mix * (tone * s_out - d1)
            l, r = split(d2)
            lane_t = sk._lane_step(lane_t, l, r, lane_k)
            # texture DSP (cpp:107-277)
            w = white_at(t)
            d3, tex_st = tex_sample(d2, w, tex_st, t)
            l3, r3 = split(d3)
            lane_m = sk._lane_step(lane_m, l3, r3, lane_k)
            # motion pass 1 (cpp:75-95) on |mono|
            mono = jnp.float32(0.5) * (l3 + r3)
            p1c = p1_body(p1c, jnp.abs(mono))
            y1s.append(d1)
            y2s.append(d2)
            y3s.append(d3)
        y1_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y1s, axis=0)
        y2_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y2s, axis=0)
        # out_ref holds the texture stream (motion's input) until the
        # channel merge overwrites it with motion's output
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y3s, axis=0)
        return (fast, slow, tone, tex_st, p1c, lane_p, lane_s, lane_t,
                lane_m)

    tex_st0 = tex_core0 + (tex_mat0,)
    p1c0 = (menv0, mcd0, mrep0, mrng0, mvtt0, mvtrt0, mvtlt0)
    (fast, slow, tone, tex_st, p1c, lane_p, lane_s, lane_t, lane_m) = \
        jax.lax.fori_loop(0, n // unroll, loop1,
                          (fast0, slow0, tone0, tex_st0, p1c0,
                           lane_p, lane_s, lane_t, lane_m))

    pdsp_out[0:csub, :] = fast
    pdsp_out[csub:2 * csub, :] = slow
    sdsp_out[0:csub, :] = tone
    for i in range(9):
        tdsp_out[i * csub:(i + 1) * csub, :] = tex_st[i]
    for i, v in enumerate(tex_st[9]):
        tmat_out[i * csub:(i + 1) * csub, :] = v
    _store_lane_at(lane_p, fin_ref, acc_ref, 0)
    _store_lane_at(lane_s, fin_ref, acc_ref, 2)
    _store_lane_at(lane_t, fin_ref, acc_ref, 4)
    _store_lane_at(lane_m, fin_ref, acc_ref, 6)

    env_f, cd_f, rep_f, rng_f, vtt_f, vtrt_f, vtlt_f = p1c
    # motion block scales (cpp:97-99)
    rep_norm = jnp.clip(rep_f * jnp.float32(0.08), jnp.float32(0.0), one)
    repetition_scale = one - mo_repeat_ctrl * rep_norm * jnp.float32(0.65)
    recovery = one + mo_repeat_ctrl * (one - rep_norm) * jnp.float32(0.25)

    lane_p2 = sk._lane_reset(lane_p)
    lane_s2 = sk._lane_reset(lane_s)
    lane_t2 = sk._lane_reset(lane_t)

    # ---- loop 2: punch/sat/texture post lanes + motion p2 ch0 ----
    # ---- loop 3: motion p2 ch1 (channel-serial shared state) ----
    shared = (mvt0, mvtr0, mvtl0, mphase0)
    be = mbe0
    for ch in range(c):
        off = jnp.float32(0.0) if ch == 0 else jnp.float32(0.85)
        p2 = _motion.make_p2_step(mo_kc, (vtt_f, vtrt_f, vtlt_f),
                                  (repetition_scale, recovery), off, sr)
        lp = mchan_ref[(0 * c + ch) * msub:(0 * c + ch + 1) * msub, :]
        tail = mchan_ref[(1 * c + ch) * msub:(1 * c + ch + 1) * msub, :]
        prev = mchan_ref[(2 * c + ch) * msub:(2 * c + ch + 1) * msub, :]
        carry0 = shared[:3] + (shared[3], lp, tail, prev, be)
        if ch == 0:
            carry0 = carry0 + (lane_p2, lane_s2, lane_t2)

        def loop23(t, carry, ch=ch, p2=p2):
            if ch == 0:
                p2c = carry[:8]
                lanes = list(carry[8:])
            else:
                p2c = carry
            base = pl.multiple_of(t * unroll * csub, 8)
            y3chunk = out_ref[pl.ds(base, unroll * csub), :]
            if ch == 0:
                y1chunk = y1_ref[pl.ds(base, unroll * csub), :]
                y2chunk = y2_ref[pl.ds(base, unroll * csub), :]
            ys = []
            for u in range(unroll):
                if ch == 0:
                    l, r = split(y1chunk[u * csub:(u + 1) * csub, :])
                    lanes[0] = sk._lane_step(lanes[0], l, r, lane_k)
                    l, r = split(y2chunk[u * csub:(u + 1) * csub, :])
                    lanes[1] = sk._lane_step(lanes[1], l, r, lane_k)
                    l, r = split(y3chunk[u * csub:(u + 1) * csub, :])
                    lanes[2] = sk._lane_step(lanes[2], l, r, lane_k)
                d = y3chunk[u * csub + ch * msub:u * csub + (ch + 1) * msub,
                            :]
                p2c, y = p2(p2c, d)
                ys.append(y)
            sbase = t * unroll * msub
            if (unroll * msub) % 8 == 0:
                sbase = pl.multiple_of(sbase, 8)
            ch_scratch[ch][pl.ds(sbase, unroll * msub), :] = \
                jnp.concatenate(ys, axis=0)
            if ch == 0:
                return p2c + tuple(lanes)
            return p2c

        carry = jax.lax.fori_loop(0, n // unroll, loop23, carry0)
        if ch == 0:
            lane_p2, lane_s2, lane_t2 = carry[8], carry[9], carry[10]
            carry = carry[:8]
        vt_s, vtr_s, vtl_s, phase_s, lp_f, tail_f, prev_f, be = carry
        shared = (vt_s, vtr_s, vtl_s, phase_s)
        mchan_out[(0 * c + ch) * msub:(0 * c + ch + 1) * msub, :] = lp_f
        mchan_out[(1 * c + ch) * msub:(1 * c + ch + 1) * msub, :] = tail_f
        mchan_out[(2 * c + ch) * msub:(2 * c + ch + 1) * msub, :] = prev_f

    _store_lane_at(lane_p2, fin_ref, acc_ref, 1)
    _store_lane_at(lane_s2, fin_ref, acc_ref, 3)
    _store_lane_at(lane_t2, fin_ref, acc_ref, 5)

    # ---- merge the per-channel scratches into interleaved sample tiles ----
    merge_u = max(1, 8 // msub)

    def merge(t, _):
        base = pl.multiple_of(t * merge_u * msub, 8)
        obase = pl.multiple_of(t * merge_u * csub, 8)
        chunks = [ch_scratch[ch][pl.ds(base, merge_u * msub), :]
                  for ch in range(c)]
        rows = []
        for u in range(merge_u):
            for ch in range(c):
                rows.append(chunks[ch][u * msub:(u + 1) * msub, :])
        out_ref[pl.ds(obase, merge_u * csub), :] = jnp.concatenate(rows, 0)
        return 0

    jax.lax.fori_loop(0, n // merge_u, merge, 0)

    outs = [env_f, rep_f, be, shared[0], shared[1], shared[2],
            vtt_f, vtrt_f, vtlt_f, shared[3], cd_f]
    for i, v in enumerate(outs):
        mmono_out[i * msub:(i + 1) * msub, :] = v
    mrng_out[...] = rng_f

    # ---- loop 4: motion post lane + width PRE lane over the output ----
    lane_m2 = sk._lane_reset(lane_m)
    lane_w = _lane_init_at(lanes_ref, 4)

    def loop4(t, carry):
        lane_m2, lane_w = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane_m2 = sk._lane_step(lane_m2, l, r, lane_k)
            lane_w = sk._lane_step(lane_w, l, r, lane_k)
        return lane_m2, lane_w

    lane_m2, lane_w = jax.lax.fori_loop(0, n // unroll, loop4,
                                        (lane_m2, lane_w))
    _store_lane_at(lane_m2, fin_ref, acc_ref, 7)
    _store_lane_at(lane_w, fin_ref, acc_ref, 8)


def _front_step(chain, states, block, mode: int, unroll: int,
                interpret: bool):
    """Run the front kernel; returns (x4, new-dsp leaves dict, fin, acc)."""
    msub, tile, lanes_n = sk.MSUB, sk.TILE, sk.LANES
    bsz, c, n = block.shape
    csub = c * msub
    sr = chain.sr
    params = [p.full_params(pr) for p, pr in zip(chain.plugins, chain.params)]

    fast_c, slow_c = _punch.env_coeffs(sr)
    satk = _sat.sat_consts(params[1], sr)
    mo_kc = _motion.p2_consts(params[3], sr)
    pv = [*sk._lane_consts(sr),
          *[jnp.asarray(params[0][k], jnp.float32) for k in sk._PUNCH_PKEYS],
          db_to_gain(params[0]["output"]), fast_c, slow_c,
          satk["in_gain"], satk["asym"], satk["tone_coeff"],
          satk["out_gain"], satk["mix"],
          jnp.asarray(params[3]["microvar"], jnp.float32),
          jnp.asarray(params[3]["repeatctrl"], jnp.float32),
          *[mo_kc[k] for k in _MOTION_KC_KEYS],
          tau_coeff(0.015, sr),
          *sk.tex_param_list(params[2], states[2]["dsp"], sr, mode)]
    pvec = jnp.stack([jnp.asarray(v, jnp.float32) for v in pv])[None]

    from juicy_tpu.ops.noise import _jump_coefficients
    a_np, b_np = _jump_coefficients(c * n)
    lcg_a = jnp.asarray(a_np)[None]
    lcg_b = jnp.asarray(b_np)[None]

    x = sk.to_stream(block)
    pdsp = sk.state_to_tiles([states[0]["dsp"]["fast_env"],
                              states[0]["dsp"]["slow_env"]])
    sdsp = sk.state_to_tiles([states[1]["dsp"]["tone_state"]])
    tdsp = sk.state_to_tiles([states[2]["dsp"][k] for k in sk._TEX_DSP_KEYS])
    mat_leaves = sk.tex_mat_leaves(states[2]["dsp"], mode)
    tmat = sk.state_to_tiles(mat_leaves)
    nmat = len(mat_leaves)
    trng = sk._u32_to_tiles(jnp.asarray(states[2]["dsp"]["rng"], jnp.uint32))
    mmono = sk.motion_mono_tiles(states[3]["dsp"], bsz)
    mchan = sk.state_to_tiles([states[3]["dsp"]["lp"],
                               states[3]["dsp"]["tail"],
                               states[3]["dsp"]["prev"]])
    mrng = sk._u32_to_tiles(jnp.broadcast_to(
        jnp.asarray(states[3]["dsp"]["rng"], jnp.uint32), (bsz,)))
    lanes0 = jnp.concatenate(
        [sk.pack_lane(states[i]["analyzer"], bsz) for i in range(5)], axis=1)

    grid = bsz // tile
    kernel = functools.partial(_front_kernel, mode, n, c, unroll, sr)

    def wrapped(params_ref, lcg_a_ref, lcg_b_ref, *refs):
        tiled, rest = refs[:-(2 + c)], refs[-(2 + c):]
        kernel(params_ref, lcg_a_ref, lcg_b_ref,
               *[r.at[0] for r in tiled], *rest)

    def smem(w):
        return pl.BlockSpec((1, w), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    ts = sk._tilespec
    out, pdsp_f, sdsp_f, tdsp_f, tmat_f, mmono_f, mchan_f, mrng_f, fin, acc \
        = pl.pallas_call(
            wrapped,
            grid=(grid,),
            in_specs=[
                smem(pvec.shape[1]), smem(c * n), smem(c * n),
                ts(n * csub), ts(2 * csub), ts(csub), ts(9 * csub),
                ts(nmat * csub), ts(msub), ts(11 * msub), ts(3 * csub),
                ts(msub), ts(25 * msub),
            ],
            out_specs=[
                ts(n * csub), ts(2 * csub), ts(csub), ts(9 * csub),
                ts(nmat * csub), ts(11 * msub), ts(3 * csub), ts(msub),
                ts(45 * msub), ts(90 * msub),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid, n * csub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, 2 * csub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, csub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, 9 * csub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, nmat * csub, lanes_n),
                                     jnp.float32),
                jax.ShapeDtypeStruct((grid, 11 * msub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, 3 * csub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, msub, lanes_n), jnp.uint32),
                jax.ShapeDtypeStruct((grid, 45 * msub, lanes_n), jnp.float32),
                jax.ShapeDtypeStruct((grid, 90 * msub, lanes_n), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n * csub, lanes_n), jnp.float32),
                pltpu.VMEM((n * csub, lanes_n), jnp.float32),
            ] + [pltpu.VMEM((n * msub, lanes_n), jnp.float32)
                 for _ in range(c)],
            interpret=interpret,
        )(pvec, lcg_a, lcg_b, x, pdsp, sdsp, tdsp, tmat, trng, mmono,
          mchan, mrng, lanes0)

    x4 = sk.from_stream(out, bsz, c)
    fast_f, slow_f = sk.tiles_to_state(pdsp_f, bsz, c, 2)
    (tone_f,) = sk.tiles_to_state(sdsp_f, bsz, c, 1)
    tex_leaves = sk.tiles_to_state(tdsp_f, bsz, c, 9)
    tex_mat_out = sk.tiles_to_state(tmat_f, bsz, c, nmat)
    mono_out = sk.tiles_to_mono(mmono_f, bsz, 11)
    lp_f, tail_f, prev_f = sk.tiles_to_state(mchan_f, bsz, c, 3)
    dsp_states = {
        "punch": {"fast_env": fast_f, "slow_env": slow_f},
        "saturator": {"tone_state": tone_f},
        "texture": sk.tex_rebuild_dsp(states[2]["dsp"], tex_leaves,
                                      tex_mat_out, mode, None, bsz, c, n, sr),
        "motion": sk.motion_rebuild_dsp(
            mono_out, sk.tiles_to_mono(mrng_f, bsz, 1)[0], lp_f, tail_f,
            prev_f),
    }
    return x4, dsp_states, fin, acc


# ---------------------------------------------------------------------------
# Back kernel: cohere + infer
# ---------------------------------------------------------------------------

def _back_kernel(n, c, unroll, params_ref, x_ref, cmono_ref, ctail_ref,
                 lanes_ref, out_ref, cmono_out, ctail_out, fin_ref, acc_ref):
    msub = sk.MSUB
    csub = c * msub
    one = jnp.float32(1.0)
    P = [0]

    def nextp(k=1):
        vals = tuple(params_ref[0, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    lane_k = tuple(nextp(7))
    low_c, high_c = nextp(2)
    match_amt, learn_f, decay, tail_amt, co_mix, co_out = nextp(6)
    trim_gain, inv_n = nextp(2)

    def split(s):
        l = s[0:msub, :]
        r = s[msub:2 * msub, :] if c > 1 else l
        return l, r

    lane_w = _lane_init_at(lanes_ref, 0)
    lane_c = _lane_init_at(lanes_ref, 1)
    a_low0 = cmono_ref[0:msub, :]
    a_high0 = cmono_ref[msub:2 * msub, :]
    t_low0 = cmono_ref[2 * msub:3 * msub, :]
    t_mid0 = cmono_ref[3 * msub:4 * msub, :]
    t_high0 = cmono_ref[4 * msub:5 * msub, :]
    z = jnp.zeros_like(a_low0)

    # ---- loop 1: width post + cohere pre lanes + mono 3-band analysis ----
    def loop1(t, carry):
        lane_w, lane_c, lo, hi, le, me, he = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane_w = sk._lane_step(lane_w, l, r, lane_k)
            lane_c = sk._lane_step(lane_c, l, r, lane_k)
            # cohere analysis (cpp:62-76), exact serial op/summation order
            m = jnp.float32(0.5) * (l + r)
            lo = lo + low_c * (m - lo)
            hi = hi + high_c * (m - hi)
            low_v = lo
            high_v = m - hi
            mid_v = m - low_v - high_v
            le = le + low_v * low_v
            me = me + mid_v * mid_v
            he = he + high_v * high_v
        return lane_w, lane_c, lo, hi, le, me, he

    lane_w, lane_c, a_low, a_high, le, me, he = jax.lax.fori_loop(
        0, n // unroll, loop1, (lane_w, lane_c, a_low0, a_high0, z, z, z))
    _store_lane_at(lane_w, fin_ref, acc_ref, 0)
    _store_lane_at(lane_c, fin_ref, acc_ref, 1)

    # ---- block-level learn EMA + context fit + band gains (cpp:78-96) ----
    le = le * inv_n
    me = me * inv_n
    he = he * inv_n
    eps = jnp.float32(1.0e-6)
    a02 = jnp.float32(0.02)
    learn = learn_f > jnp.float32(0.5)
    t_low = jnp.where(learn, t_low0 + (le - t_low0) * a02, t_low0)
    t_mid = jnp.where(learn, t_mid0 + (me - t_mid0) * a02, t_mid0)
    t_high = jnp.where(learn, t_high0 + (he - t_high0) * a02, t_high0)

    inv_ln10_20 = jnp.float32(20.0 / np.log(10.0))

    def g2db(x):
        db = inv_ln10_20 * jnp.log(jnp.maximum(x, jnp.float32(1e-30)))
        return jnp.maximum(db, jnp.float32(-100.0))

    low_err = jnp.abs(g2db((le + eps) / (t_low + eps)))
    mid_err = jnp.abs(g2db((me + eps) / (t_mid + eps)))
    high_err = jnp.abs(g2db((he + eps) / (t_high + eps)))
    deviation = (low_err + mid_err + high_err) / jnp.float32(3.0)
    context_fit = jnp.clip(jnp.float32(100.0) - deviation * jnp.float32(10.0),
                           jnp.float32(0.0), jnp.float32(100.0))

    expo = jnp.float32(0.25) * match_amt

    def comp(tgt, e):
        p = jnp.exp(expo * jnp.log((tgt + eps) / (e + eps)))
        return jnp.clip(p, jnp.float32(0.5), jnp.float32(1.8))

    low_comp = comp(t_low, le)
    mid_comp = comp(t_mid, me)
    high_comp = comp(t_high, he)
    fb = jnp.clip(decay, jnp.float32(0.0), jnp.float32(0.93))

    cmono_out[0:msub, :] = a_low
    cmono_out[msub:2 * msub, :] = a_high
    cmono_out[2 * msub:3 * msub, :] = t_low
    cmono_out[3 * msub:4 * msub, :] = t_mid
    cmono_out[4 * msub:5 * msub, :] = t_high
    cmono_out[5 * msub:6 * msub, :] = context_fit

    def perchan(v):
        return jnp.concatenate([v] * c, axis=0)

    cc_low, cc_mid, cc_high = perchan(low_comp), perchan(mid_comp), \
        perchan(high_comp)

    # ---- loop 2: cohere render + cohere post + infer pre lanes + trim ----
    lane_c2 = sk._lane_reset(lane_c)
    lane_i = _lane_init_at(lanes_ref, 2)
    zc = jnp.zeros_like(ctail_ref[...])

    def loop2(t, carry):
        lane_c2, lane_i, lp_a, lp_b, tail = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        ys = []
        for u in range(unroll):
            d = chunk[u * csub:(u + 1) * csub, :]
            # cohere render (cpp:99-118); split filters start from zero
            lp_a = lp_a + low_c * (d - lp_a)
            lp_b = lp_b + high_c * (d - lp_b)
            low_v = lp_a * cc_low
            high_v = (d - lp_b) * cc_high
            mid_v = (d - lp_a - (d - lp_b)) * cc_mid
            matched = low_v + mid_v + high_v
            tail = matched + tail * fb
            wet = matched + tail_amt * jnp.float32(0.35) * tail
            y6 = (d + co_mix * (wet - d)) * co_out
            l, r = split(y6)
            lane_c2 = sk._lane_step(lane_c2, l, r, lane_k)
            lane_i = sk._lane_step(lane_i, l, r, lane_k)
            # infer trim (JuicyInfer cpp:74-79)
            ys.append(y6 * trim_gain)
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(ys, axis=0)
        return lane_c2, lane_i, lp_a, lp_b, tail

    lane_c2, lane_i, _lp_a, _lp_b, tail_f = jax.lax.fori_loop(
        0, n // unroll, loop2, (lane_c2, lane_i, zc, zc, ctail_ref[...]))
    _store_lane_at(lane_c2, fin_ref, acc_ref, 2)
    _store_lane_at(lane_i, fin_ref, acc_ref, 3)
    ctail_out[...] = tail_f

    # ---- loop 3: infer post lane over the trimmed output ----
    lane_i2 = sk._lane_reset(lane_i)

    def loop3(t, lane_i2):
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane_i2 = sk._lane_step(lane_i2, l, r, lane_k)
        return lane_i2

    lane_i2 = jax.lax.fori_loop(0, n // unroll, loop3, lane_i2)
    _store_lane_at(lane_i2, fin_ref, acc_ref, 4)


def _back_step(chain, states, x5, width_pre_fin, unroll: int,
               interpret: bool):
    """Run the back kernel; returns (out, cohere dsp', fin, acc)."""
    msub, tile, lanes_n = sk.MSUB, sk.TILE, sk.LANES
    bsz, c, n = x5.shape
    csub = c * msub
    sr = chain.sr
    co_params = chain.plugins[5].full_params(chain.params[5])
    in_params = chain.plugins[6].full_params(chain.params[6])
    co = states[5]["dsp"]

    pv = [*sk._lane_consts(sr),
          onepole_coeff(220.0, sr), onepole_coeff(2400.0, sr),
          jnp.asarray(co_params["match"], jnp.float32),
          jnp.asarray(co_params["learn"], jnp.float32),
          jnp.asarray(co_params["decay"], jnp.float32),
          jnp.asarray(co_params["tail"], jnp.float32),
          jnp.asarray(co_params["mix"], jnp.float32),
          db_to_gain(co_params["output"]),
          db_to_gain(in_params["trim"]),
          jnp.float32(1.0 / max(1, n))]
    pvec = jnp.stack([jnp.asarray(v, jnp.float32) for v in pv])[None]

    x = sk.to_stream(x5)
    cmono = sk.mono_to_tiles([
        jnp.broadcast_to(jnp.asarray(co[k], jnp.float32), (bsz,))
        for k in ("analysis_low", "analysis_high", "target_low",
                  "target_mid", "target_high")])
    ctail = sk.state_to_tiles([jnp.broadcast_to(
        jnp.asarray(co["tail"], jnp.float32), (bsz, c))])
    lanes0 = jnp.concatenate(
        [width_pre_fin,
         sk.pack_lane(states[5]["analyzer"], bsz),
         sk.pack_lane(states[6]["analyzer"], bsz)], axis=1)

    grid = bsz // tile
    kernel = functools.partial(_back_kernel, n, c, unroll)

    def wrapped(params_ref, *refs):
        kernel(params_ref, *[r.at[0] for r in refs])

    def smem(w):
        return pl.BlockSpec((1, w), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    ts = sk._tilespec
    out, cmono_f, ctail_f, fin, acc = pl.pallas_call(
        wrapped,
        grid=(grid,),
        in_specs=[smem(pvec.shape[1]), ts(n * csub), ts(5 * msub), ts(csub),
                  ts(15 * msub)],
        out_specs=[ts(n * csub), ts(6 * msub), ts(csub), ts(25 * msub),
                   ts(50 * msub)],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 6 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 25 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 50 * msub, lanes_n), jnp.float32),
        ],
        interpret=interpret,
    )(pvec, x, cmono, ctail, lanes0)

    out_bcn = sk.from_stream(out, bsz, c)
    mono = sk.tiles_to_mono(cmono_f, bsz, 6)
    (tail_leaf,) = sk.tiles_to_state(ctail_f, bsz, c, 1)
    co_dsp = {
        "analysis_low": mono[0], "analysis_high": mono[1],
        "target_low": mono[2], "target_mid": mono[3],
        "target_high": mono[4], "tail": tail_leaf,
        "context_fit": mono[5],
    }
    return out_bcn, co_dsp, fin, acc


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def chain_kernel_step(chain, states: Sequence[Dict[str, Any]],
                      block: jnp.ndarray, unroll: int = 8,
                      interpret: bool = False):
    """One block [B, C, N] through the whole 7-plugin chain on the kernel
    path. Same contract as runtime.chain_fused.fused_chain_step with
    metrics="blocks": returns (out, new_states, metrics_list)."""
    from juicy_tpu.runtime.plugin import _default_finalize

    mode = _check_chain(chain)
    block = jnp.asarray(block, jnp.float32)
    if block.ndim != 3:
        raise ChainKernelUnsupported(
            f"chain kernel needs a single [B, C, N] batch axis, got "
            f"shape {block.shape}")
    bsz, c, n = block.shape
    if bsz % sk.TILE:
        raise ChainKernelUnsupported(
            f"batch {bsz} must be a multiple of {sk.TILE}")
    if n % unroll:
        raise ChainKernelUnsupported(f"block {n} not divisible by "
                                     f"unroll {unroll}")
    sr = chain.sr

    x4, front_dsp, ffin, facc = _front_step(chain, states, block, mode,
                                            unroll, interpret)
    width_params = chain.plugins[4].full_params(chain.params[4])
    x5, width_dsp = _width.process(width_params, states[4]["dsp"], x4, sr)
    wfin, _wacc = _lane_slices(ffin, facc, 8)
    out, co_dsp, bfin, bacc = _back_step(chain, states, x5, wfin, unroll,
                                         interpret)

    dsp_list = [front_dsp["punch"], front_dsp["saturator"],
                front_dsp["texture"], front_dsp["motion"],
                width_dsp, co_dsp, states[6]["dsp"]]

    # (fin, acc, pre-slot, post-slot) per stage
    lane_map = [
        (ffin, facc, 0, 1), (ffin, facc, 2, 3), (ffin, facc, 4, 5),
        (ffin, facc, 6, 7),
        None,                       # width: pre in front, post in back
        (bfin, bacc, 1, 2), (bfin, bacc, 3, 4),
    ]
    new_states: List[Dict[str, Any]] = []
    metrics_list = []
    for i, plug in enumerate(chain.plugins):
        an_state = states[i]["analyzer"]
        if i == 4:
            pre = _lane_slices(ffin, facc, 8)
            post = _lane_slices(bfin, bacc, 0)
        else:
            fin, acc, pre_idx, post_idx = lane_map[i]
            pre = _lane_slices(fin, acc, pre_idx)
            post = _lane_slices(fin, acc, post_idx)
        pre_state, pre_m = sk.finalize_lane(pre[0], pre[1], an_state,
                                            bsz, n, sr)
        post_state, post_m = sk.finalize_lane(post[0], post[1], pre_state,
                                              bsz, n, sr)
        new_states.append({"analyzer": post_state, "dsp": dsp_list[i]})
        finalize = plug.defn.finalize_metrics or _default_finalize
        metrics_list.append(finalize(plug.full_params(chain.params[i]),
                                     pre_m, post_m, dsp_list[i]))
    return out, new_states, metrics_list


def chain_kernel_stream(chain, states, clips, metrics: str = "blocks",
                        unroll: int = 8, interpret: bool = False):
    """Stream a [B, C, T] corpus through the kernel chain block-major.
    Same contract as runtime.chain_fused.fused_chain_stream."""
    clips = jnp.asarray(clips, jnp.float32)
    t = clips.shape[-1]
    n = chain.block_size
    if t % n:
        raise ValueError(f"clip length {t} not divisible by block size {n}")
    nb = t // n
    blocks = jnp.moveaxis(clips.reshape(clips.shape[:-1] + (nb, n)), -2, 0)

    def step(sts, blk):
        return chain_kernel_step(chain, sts, blk, unroll=unroll,
                                 interpret=interpret)

    if metrics == "blocks":
        def scan_step(sts, blk):
            out, sts, m = step(sts, blk)
            return sts, (out, m)
        states, (outs, ms) = jax.lax.scan(scan_step, list(states), blocks)
    elif metrics == "final":
        out0, states, m0 = step(list(states), blocks[0])

        def scan_step(carry, blk):
            sts, _ = carry
            out, sts, m = step(sts, blk)
            return (sts, m), out
        (states, ms), outs_rest = jax.lax.scan(scan_step, (states, m0),
                                               blocks[1:])
        outs = jnp.concatenate([out0[None], outs_rest], axis=0)
    else:   # "none": lanes still run in-kernel (they are ~free); drop them
        def scan_step(sts, blk):
            out, sts, _ = step(sts, blk)
            return sts, out
        states, outs = jax.lax.scan(scan_step, list(states), blocks)
        ms = None
    out = jnp.moveaxis(outs, 0, -2).reshape(clips.shape)
    return out, states, ms
