"""Multi-stage VMEM-resident chain kernel: the whole 7-plugin suite as
ONE ``pallas_call`` per block, every inter-stage audio stream living in
VMEM and the analyzer lane state threading block-to-block inside the
kernel's own fin tiles.

Why: the fused chain executor (runtime/chain_fused.py) is bound by the
sequential per-sample structure of the reference semantics — and measured
profiling (BASELINE.md round 3) shows the chain is issue-bound on the
serial sample loops, with inter-stage HBM traffic second. These kernels
attack both:

  * inter-stage streams never touch HBM — per block the kernel reads the
    input stream and writes the output, with the width handoff (x5) in a
    VMEM scratch between the front and back halves;
  * the 14 analyzer-lane instances run PACKED: lanes are stacked along the
    sublane axis so one lane-body update advances up to four lanes at full
    VPU width, and every *stateless* lane accumulator (rms/peak/side/corr/
    L²/R²) is hoisted out of the serial loops into wide vectorized
    reductions over the VMEM-resident streams (same tree-sum order as the
    fused executor's stream_stats);
  * width's whole DSP folds into the back kernel: its only serial state is
    the block-local width shrink (a ~6-op loop); the Haas read is ONE
    dynamic slice of the VMEM window and everything else is vectorized.

Front half (per block, per (16,128)-tiled clip batch):
  loop 1: punch DSP + saturator DSP + texture DSP (in-kernel LCG noise)
          + motion pass-1 chained at register level, plus the four PRE
          lanes packed into one body;
  loop 2: packed punch/sat/texture POST lanes (their pre lanes finished at
          the end of loop 1 — one shared analyzer instance per plugin
          threads pre → post, JuicinessAnalyzer.h:33-43) + motion pass-2
          ch0;
  loop 3: motion pass-2 ch1 (channel-serial shared state,
          JuicyMotion/PluginProcessor.cpp:108-115), fused with the channel
          merge (one aligned stereo store per sample) and the packed
          motion-POST + width-PRE lanes over the assembled output.

Back half (same call; x5 stays in VMEM):
  loop W: serial width shrink (the block-local ``width *= limit`` quirk,
          JuicyWidth/PluginProcessor.cpp:109-112, in the exact C++
          repeated-multiplication order) storing wet-L and the Haas window;
  vector: Haas delayed read (one dynamic slice) + width mix/output
          (cpp:119-133);
  loop 1: packed width-POST + cohere-PRE lanes + cohere mono 3-band
          analysis (JuicyCohere/PluginProcessor.cpp:62-76);
  block:  learn EMA + context-fit + band compensation gains in-kernel
          (cpp:78-96; pow/log via exp/log — ulp-level vs the XLA path);
  loop 2: cohere render (cpp:99-118, split filters zeroed per block — the
          reference quirk) + packed cohere-POST + infer-PRE lanes + infer
          trim (JuicyInfer/PluginProcessor.cpp:74-79);
  loop 3: infer POST lane over the trimmed output.

All per-sample bodies are the proven in-kernel forms from
kernels/stage_kernels.py (texture/motion) or direct transcriptions of the
models' per-sample bodies (punch/saturator/width/cohere) in the exact
float32 op order of the C++. Lane state crosses blocks in fin-tile form
(each pre lane inits from the previous block's post-lane rows), so a
streamed corpus runs kernel-only inside the scan; ALL score formulas run
afterwards in one nb-parallel pass (_finalize_stream), with the
repetition/fatigue EMA pair — the only cross-block analyzer recurrence —
as an O(log) associative prefix scan. The single-block step
(chain_kernel_step, the serving tick) finalizes per block via
_finalize_block.

Fidelity vs the XLA fused executor: bit-clean on CPU (front kernel
bit-exact; full chain −98…−108 dBFS, non-accumulating). On real TPUs
Mosaic and XLA contract FMAs differently through the tanh chains, so
threshold comparators (motion's onset detector) occasionally land 1 ulp
apart and flip: measured over 512 clips × 94 blocks, median per-clip null
−90.3 dBFS, with 3/512 clips above −80 (single flipped onset events) —
the same divergence class the reference's own two C++ builds show against
each other (−47.5 dBFS, CPP_NULL_REPORT.json). See BASELINE.md round 3.

Waveguide texture materials (wood/plastic) fit the VMEM budget by
trading the full-stereo y1/y2 stream scratches for MONO ones (the post
lanes only consume mono; those two streams' stateless stats accumulate
serially in loop 1) — freeing room for the waveguide's sliding history
window (DMA'd in/out like the texture stage kernel, with the write index
threaded through a per-block SMEM word).

Corpus layout: the kernels work on [nb, G, N*C*MSUB, 128] tile streams;
`chain_kernel_stream` converts a [B, C, T] corpus with ONE 6-D transpose
each way (corpus_to_tiles / tiles_to_corpus), or skips both under
``layout="tiles"`` when the caller already holds tile data — the native
loader (runtime/native.py:load_corpus_tiles) writes that layout straight
from the WAV decode on host threads, so a scoring/serving pipeline never
pays the device-side repack (~45 ms of a 234 ms wall at B=8192).

Unsupported layouts (non-canonical stage order, mono chains, traced/mixed
materials) raise ChainKernelUnsupported; callers fall back to the XLA
fused executor.
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
from juicy_tpu.ops.precise import log2_32, pow32, tanh32
from juicy_tpu.models import (motion as _motion, punch as _punch,
                              saturator as _sat, texture as _texture)
from juicy_tpu.utils.convert import (db_to_gain, jlimit, jmap,
                                     onepole_coeff,
                                     tau_coeff)

CHAIN_ORDER = ("punch", "saturator", "texture", "motion", "width",
               "cohere", "infer")

# front-kernel lane slots in fin/acc outputs (width rides only its PRE lane
# here; its input is the front kernel's output)
_F_LANES = ("punch_pre", "punch_post", "sat_pre", "sat_post", "tex_pre",
            "tex_post", "motion_pre", "motion_post", "width_pre")
# back-kernel lane slots
_B_LANES = ("width_post", "cohere_pre", "cohere_post", "infer_pre",
            "infer_post")

_MOTION_KC_KEYS = ("var_slew", "motion_inc", "lfo_depth", "depth",
                   "micro_var", "tail_feedback", "mix", "out_gain",
                   "budget_coeff", "budget_target")


# Mosaic's default scoped-VMEM budget is ~16 MB; v5e cores physically have
# 128 MiB of VMEM, and the multi-stage kernels legitimately hold the block's
# streams + scratches resident.  Raise the ceiling so wider tiles fit.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


class ChainKernelUnsupported(Exception):
    """Raised when a chain layout cannot run on the kernel path."""


def corpus_to_tiles(clips, block_size: int):
    """[B, C, T] corpus -> [nb, G, N*C*MSUB, 128] kernel-tile layout.

    ONE 6-D transpose over the whole corpus — measured 1.6x faster on TPU
    than the per-block vmap(to_stream) composition (same element mapping:
    clip b = g*TILE + m*LANES + lane, tile row = (s*C + ch)*MSUB + m).
    `chain_kernel_stream(layout="tiles")` consumes/produces this layout
    directly so a corpus pipeline never pays the transpose on-device (the
    native loader emits it straight from the WAV decode,
    runtime/native.py:load_corpus_tiles)."""
    bsz, c, t = clips.shape
    n = block_size
    msub, lanes_n = sk.MSUB, sk.LANES
    grid = bsz // sk.TILE
    nb = t // n
    return clips.reshape(grid, msub, lanes_n, c, nb, n).transpose(
        4, 0, 5, 3, 1, 2).reshape(nb, grid, n * c * msub, lanes_n)


def tiles_to_corpus(tiles, channels: int):
    """Inverse of corpus_to_tiles: [nb, G, N*C*MSUB, 128] -> [B, C, T]."""
    msub, lanes_n = sk.MSUB, sk.LANES
    nb, grid, rows, _ = tiles.shape
    c = channels
    n = rows // (c * msub)
    bsz = grid * sk.TILE
    return tiles.reshape(nb, grid, n, c, msub, lanes_n).transpose(
        1, 4, 5, 3, 0, 2).reshape(bsz, c, nb * n)


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
        # traced/mixed materials: NONWAVE mixes ({gel, metal, flesh}) run
        # as the PACKED per-lane kernel lane (sk.TEX_PACKED); anything
        # touching a waveguide material runs on the XLA fused executor
        # (its ring delay is knob-dependent — per-lane row gathers)
        mat = chain.params[2].get("material")
        if mat is None or isinstance(mat, jax.core.Tracer):
            raise ChainKernelUnsupported(
                "traced-material chain without concrete material values "
                "cannot select a kernel code path")
        matv = np.asarray(jax.device_get(mat)).astype(np.int32).ravel()
        vals = set(np.unique(matv).tolist())
        if vals <= {0, 1, 4}:
            return sk.TEX_PACKED
        if vals <= {2, 3}:
            # MERGED WAVE launch: wood + plastic tiles share one
            # pallas_call, each grid row reading its own material's
            # constant row (incl. the structural ring delay) from a
            # per-grid-row SMEM pvec. Requires every clip TILE to be
            # single-material (the grouped corpus runner sorts/pads so).
            if matv.shape[0] % sk.TILE:
                raise ChainKernelUnsupported(
                    f"merged wave materials need a {sk.TILE}-aligned "
                    f"batch (got {matv.shape[0]} clips)")
            rows = matv.reshape(-1, sk.TILE)
            if not (rows == rows[:, :1]).all():
                raise ChainKernelUnsupported(
                    "merged wave materials must be uniform within each "
                    f"{sk.TILE}-clip tile (sort clips by material)")
            return sk.TEX_WAVE_ROWS
        raise ChainKernelUnsupported(
            "mixed materials spanning wave and nonwave sets run on the "
            "XLA fused executor (per-lane wave/nonwave selection is a "
            "traced-material code path)")
    return max(0, min(4, mode))


# ---------------------------------------------------------------------------
# Packed serial analyzer lanes.
#
# The full 15-var in-kernel lane (stage_kernels._lane_step) carries six
# accumulators that are pure stateless reductions of the stream (rms, peak,
# side, corr, L², R²). Here the serial lane keeps only the 9 genuinely
# sequential vars (envelopes, onset counter, band filters and their energy
# sums — the band outputs exist only sample-by-sample); the stateless six
# are computed vectorized from the VMEM streams after the loops. K lanes
# stack along the sublane axis ([K·MSUB, 128] per var) so one body update
# advances all K.
# ---------------------------------------------------------------------------

def _lane9_step(lane, mono, k):
    """One packed lane sample; serial op order of JuicinessAnalyzer.cpp:
    57-84 (envelopes, onset counting, band splits + band energies).

    `k` entries are SMEM scalars on the shared-params path, or per-clip
    (MSUB, 128) tiles on the parameter-rows path — tiled here to the
    packed-lane height (loop-invariant: vreg renaming, not a real copy)."""
    if getattr(k[0], "ndim", 0) == 2 and k[0].shape[0] != mono.shape[0]:
        rep = mono.shape[0] // k[0].shape[0]
        k = tuple(jnp.concatenate([v] * rep, axis=0) for v in k)
    (atk_s, rel_s, atk_l, rel_l, low_c, high_c, cd_samples) = k
    one = jnp.float32(1.0)
    s_env, l_env, cooldown, t_acc, count, lo, hi, lo_acc, hi_acc = lane
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
    lo = lo + low_c * (mono - lo)
    hi = hi + high_c * (mono - hi)
    low_v = lo
    high_v = mono - hi
    lo_acc = lo_acc + low_v * low_v
    hi_acc = hi_acc + high_v * high_v
    return [s_env, l_env, cooldown, t_acc, count, lo, hi, lo_acc, hi_acc]


def _lane9_init_at(lanes_ref, slots):
    """Packed lane init from the [S·5·MSUB, 128] lane-state input ref.
    fin row order per slot: s_env, l_env, low, high, cooldown."""
    msub = sk.MSUB

    def row(s, i):
        return lanes_ref[(s * 5 + i) * msub:(s * 5 + i + 1) * msub, :]

    def var(i):
        vs = [row(s, i) for s in slots]
        return vs[0] if len(vs) == 1 else jnp.concatenate(vs, axis=0)

    z = jnp.zeros_like(var(0))
    return [var(0), var(1), var(4), z, z, var(2), var(3), z, z]


def _lane9_pack(lanes):
    """Stack K single lanes -> one packed lane."""
    if len(lanes) == 1:
        return [v for v in lanes[0]]
    return [jnp.concatenate(vs, axis=0) for vs in zip(*lanes)]


def _lane9_unpack(lane, k):
    msub = sk.MSUB
    out = []
    for i in range(k):
        out.append([v[i * msub:(i + 1) * msub, :] for v in lane])
    return out


def _lane9_reset(lane):
    """Fresh accumulators, persistent state carried (pre -> post lane)."""
    z = jnp.zeros_like(lane[0])
    return [lane[0], lane[1], lane[2], z, z, lane[5], lane[6], z, z]


def _store_lane9(lane, stats, fin_ref, acc_ref, idx: int):
    """Write one lane + its vectorized stateless stats in the v1 layout
    (stage_kernels._LANE_FIN/_LANE_ACC order) so finalize_lane is shared."""
    msub = sk.MSUB
    fin_rows = (lane[0], lane[1], lane[5], lane[6], lane[2])
    acc_rows = (lane[3], lane[4], lane[7], lane[8]) + tuple(stats)
    for i, v in enumerate(fin_rows):
        r = idx * 5 + i
        fin_ref[r * msub:(r + 1) * msub, :] = v
    for i, v in enumerate(acc_rows):
        r = idx * 10 + i
        acc_ref[r * msub:(r + 1) * msub, :] = v


def _stats_from_rows(ref, n, c, chunk: int = 64):
    """Stateless lane accumulators of a [n·CSUB, 128] VMEM stream ref:
    (rms_acc, peak, side_acc, corr_acc, l², r²), each [MSUB, 128].
    Tree-sum order like the fused executor's stream_stats; chunked so the
    vectorized temporaries stay within the scoped-VMEM stack budget."""
    msub = sk.MSUB
    csub = c * msub
    chunk = min(chunk, n)
    while n % chunk:
        chunk //= 2
    z = jnp.zeros((msub, sk.LANES), jnp.float32)

    def body(i, accs):
        rms, peak, side_a, corr, l2, r2 = accs
        base = pl.multiple_of(i * chunk * csub, 8)
        a = ref[pl.ds(base, chunk * csub), :].reshape(chunk, csub, sk.LANES)
        l = a[:, 0:msub, :]
        r = a[:, msub:2 * msub, :] if c > 1 else l
        mono = jnp.float32(0.5) * (l + r)
        side = jnp.float32(0.5) * (l - r)
        return (rms + jnp.sum(mono * mono, axis=0),
                jnp.maximum(peak, jnp.max(jnp.abs(mono), axis=0)),
                side_a + jnp.sum(side * side, axis=0),
                corr + jnp.sum(l * r, axis=0),
                l2 + jnp.sum(l * l, axis=0),
                r2 + jnp.sum(r * r, axis=0))

    return jax.lax.fori_loop(0, n // chunk, body, (z, z, z, z, z, z))


def _lane_slices(fin_t, acc_t, idx: int):
    msub = sk.MSUB
    return (fin_t[:, idx * 5 * msub:(idx + 1) * 5 * msub, :],
            acc_t[:, idx * 10 * msub:(idx + 1) * 10 * msub, :])


# ---------------------------------------------------------------------------
# Front kernel: punch -> saturator -> texture -> motion
# ---------------------------------------------------------------------------

def _front_kernel(mode, n, c, unroll, sr, H, L,
                  params_ref, lcg_a_ref, lcg_b_ref, widx_ref,
                  x_ref, pdsp_ref, sdsp_ref, tdsp_ref, tmat_ref, trng_ref,
                  mmono_ref, mchan_ref, mrng_ref, pffin_ref, pbfin_ref,
                  hist_ref,
                  out_ref, pdsp_out, sdsp_out, tdsp_out, tmat_out,
                  mmono_out, mchan_out, mrng_out, fin_ref, acc_ref,
                  newhist_ref, y1_ref, y2_ref, ch_scratch, window_ref,
                  dma_sem, rows_ref=None):
    # Lane state threads block-to-block ENTIRELY in fin-tile form: each
    # pre lane inits from the previous block's POST lane rows (one shared
    # analyzer instance per plugin threads pre -> post -> next pre,
    # JuicinessAnalyzer.h:33-43). pffin_ref/pbfin_ref are the previous
    # block's fin outputs (or the seed tiles, _lane_seed_tiles).
    #
    # rows_ref (PER-STREAM PARAMETER ROWS, the per-track-knob analog —
    # every reference instance reads its own APVTS atomics,
    # JuicyPunch/PluginProcessor.cpp:74-80): a [W*MSUB, 128] VMEM block
    # holding each pvec entry as a per-clip (MSUB, 128) tile in the same
    # index space as the SMEM pvec. When present, `nextp` yields tiles and
    # the DSP math runs vector*vector instead of scalar*vector — the SAME
    # VPU op count, so per-stream knobs cost ~nothing on the kernel tick.
    # Structural entries (scalar row/ring indices) still read the SMEM
    # pvec via `nexts`.
    msub = sk.MSUB
    csub = c * msub
    wave = mode in sk.WAVE_MODES
    one = jnp.float32(1.0)
    half = jnp.float32(0.5)
    P = [0]
    rowp = rows_ref is not None
    # MERGED wave launch: the pvec arrives as the FULL [G, W] SMEM array
    # (Mosaic rejects sub-8 per-row SMEM blocks) and each grid step reads
    # its own tile's material row; every other mode reads row 0 of [1, W]
    prow = pl.program_id(0) if mode == sk.TEX_WAVE_ROWS else 0

    def nextp(k=1):
        if rowp:
            vals = tuple(rows_ref[pl.ds((P[0] + i) * msub, msub), :]
                         for i in range(k))
        else:
            vals = tuple(params_ref[prow, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    def nexts(k=1):
        """Structural entries: always the SMEM scalar (uniform by
        contract — serve/step eligibility enforces it; per-ROW in the
        merged wave launch, where the row is the material)."""
        vals = tuple(params_ref[prow, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    def xc(p):
        """Channel-tiled view for stereo-tile ([CSUB, 128]) use sites."""
        return jnp.concatenate([p] * c, axis=0) if (rowp and c > 1) else p

    # analyzer lane consts are functions of sr alone (sk._lane_consts) —
    # never per-stream — so they stay SMEM scalars in rows mode too
    lane_k = tuple(nexts(7))
    # punch consts (JuicyPunch cpp:74-110)
    pp = {key: xc(nextp()) for key in sk._PUNCH_PKEYS}
    p_out_gain, fast_c, slow_c = map(xc, nextp(3))
    # saturator consts (JuicySaturator cpp:74-96)
    s_in, s_asym, s_tone_c, s_out, s_mix = map(xc, nextp(5))
    # motion consts (JuicyMotion cpp:64-99) — mono ([MSUB, 128]) sites
    mo_micro_var, mo_repeat_ctrl = nextp(2)
    mo_kc = {key: nextp() for key in _MOTION_KC_KEYS}
    mo_tau15 = nextp()
    # texture consts (variable length -> last); stereo sites, so
    # channel-tile everything except the structural waveguide indices
    tex_kc, tex_mc = sk.tex_unpack(nextp, mode, nexts=nexts)
    tex_kc = {k: xc(v) for k, v in tex_kc.items()}
    tex_mc = {k: (v if k in ("delay", "widx0_f")
                  else (tuple(xc(e) for e in v) if isinstance(v, tuple)
                        else xc(v)))
              for k, v in tex_mc.items()}
    if wave:
        # the waveguide write index advances per block: it rides its own
        # SMEM input (the main param vector is stream-constant)
        tex_mc = dict(tex_mc, widx0_f=widx_ref[0, 0])
        g = pl.program_id(0)
        cp = pltpu.make_async_copy(hist_ref.at[g],
                                   window_ref.at[pl.ds(0, H * csub), :],
                                   dma_sem)
        cp.start()
        cp.wait()

    if mode == sk.TEX_PACKED:
        # the per-clip mode word rides as material-state leaf 15
        # (constant; written back unchanged by the packed mat_step)
        tex_mc = dict(tex_mc, mode_t=tmat_ref[14 * csub:15 * csub, :])
    white_at = sk.make_white_at(lcg_a_ref, lcg_b_ref, trng_ref[...], c, n)
    tex_sample = sk.make_tex_sample(mode, tex_kc, tex_mc, c, window_ref,
                                    H, L)
    p1_body = sk.make_motion_p1_body(mo_micro_var, mo_tau15,
                                     jnp.float32(int(sr * 0.04)))

    def split(s):
        l = s[0:msub, :]
        r = s[msub:2 * msub, :] if c > 1 else l
        return l, r

    def mono_of(s):
        l, r = split(s)
        return half * (l + r)

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

    lane_pre = _lane9_init_at(pffin_ref, (1, 3, 5, 7))

    # ---- loop 1: punch + sat + texture DSP + motion p1 + packed pre lanes
    # Wave (waveguide) materials trade the full-stereo y1/y2 scratches for
    # MONO ones to fit the VMEM window: the post lanes only consume mono,
    # and the y1/y2 stateless stats accumulate serially here (packed pair,
    # ~11 extra ops/sample) instead of vectorized afterwards.
    zp = jnp.zeros((2 * msub, sk.LANES), jnp.float32)
    stats12_0 = (zp, zp, zp, zp, zp, zp) if wave else ()

    def loop1(tt, carry):
        (fast, slow, tone, tex_st, p1c, lane_pre, stats12) = carry
        base = pl.multiple_of(tt * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        y1s, y2s, y3s = [], [], []
        for u in range(unroll):
            t = tt * unroll + u
            d0 = chunk[u * csub:(u + 1) * csub, :]
            # punch DSP (cpp:83-110)
            a = jnp.abs(d0)
            fast = (one - fast_c) * a + fast_c * fast
            slow = (one - slow_c) * a + slow_c * slow
            d1 = sk._punch_shape_gain(d0, fast, slow, pp, p_out_gain)
            # saturator DSP (cpp:89-96; serial tone op order)
            driven = d1 * s_in
            skewed = driven + s_asym * driven * driven
            soft = tanh32(skewed)
            tone = tone + s_tone_c * (soft - tone)
            d2 = d1 + s_mix * (tone * s_out - d1)
            # texture DSP (cpp:107-277)
            w = white_at(t)
            d3, tex_st = tex_sample(d2, w, tex_st, t)
            m3 = mono_of(d3)
            # motion pass 1 (cpp:75-95) on |mono|
            p1c = p1_body(p1c, jnp.abs(m3))
            if wave:
                l1, r1 = split(d1)
                l2_, r2_ = split(d2)
                lp2 = jnp.concatenate([l1, l2_], axis=0)
                rp2 = jnp.concatenate([r1, r2_], axis=0)
                mono12 = half * (lp2 + rp2)
                side12 = half * (lp2 - rp2)
                rms, peak, side_a, corr, l2a, r2a = stats12
                stats12 = (rms + mono12 * mono12,
                           jnp.maximum(peak, jnp.abs(mono12)),
                           side_a + side12 * side12,
                           corr + lp2 * rp2,
                           l2a + lp2 * lp2, r2a + rp2 * rp2)
                # (stats12 stays an empty tuple in non-wave mode so the
                # loop carry holds no dead accumulators)
                mono_pack = jnp.concatenate([mono_of(d0), mono12, m3],
                                            axis=0)
                y1s.append(mono12[0:msub, :])
                y2s.append(mono12[msub:2 * msub, :])
            else:
                mono_pack = jnp.concatenate(
                    [mono_of(d0), mono_of(d1), mono_of(d2), m3], axis=0)
                y1s.append(d1)
                y2s.append(d2)
            lane_pre = _lane9_step(lane_pre, mono_pack, lane_k)
            y3s.append(d3)
        yrows = msub if wave else csub
        ybase = tt * unroll * yrows
        if (unroll * yrows) % 8 == 0:
            ybase = pl.multiple_of(ybase, 8)
        y1_ref[pl.ds(ybase, unroll * yrows), :] = jnp.concatenate(y1s, 0)
        y2_ref[pl.ds(ybase, unroll * yrows), :] = jnp.concatenate(y2s, 0)
        # out_ref holds the texture stream (motion's input) until the
        # channel merge overwrites it with motion's output
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y3s, axis=0)
        return (fast, slow, tone, tex_st, p1c, lane_pre, stats12)

    tex_st0 = tex_core0 + (tex_mat0,)
    p1c0 = (menv0, mcd0, mrep0, mrng0, mvtt0, mvtrt0, mvtlt0)
    (fast, slow, tone, tex_st, p1c, lane_pre, stats12) = jax.lax.fori_loop(
        0, n // unroll, loop1, (fast0, slow0, tone0, tex_st0, p1c0,
                                lane_pre, stats12_0))

    pdsp_out[0:csub, :] = fast
    pdsp_out[csub:2 * csub, :] = slow
    sdsp_out[0:csub, :] = tone
    for i in range(9):
        tdsp_out[i * csub:(i + 1) * csub, :] = tex_st[i]
    for i, v in enumerate(tex_st[9]):
        tmat_out[i * csub:(i + 1) * csub, :] = v
    if wave:
        cp = pltpu.make_async_copy(
            window_ref.at[pl.ds(n * csub, H * csub), :], newhist_ref.at[g],
            dma_sem)
        cp.start()
        cp.wait()

    # stateless stats of every materialized stream (vectorized; y1/y2 from
    # the serial pair accumulators in wave mode)
    s_x0 = _stats_from_rows(x_ref, n, c)
    if wave:
        s_y1 = tuple(v[0:msub, :] for v in stats12)
        s_y2 = tuple(v[msub:2 * msub, :] for v in stats12)
    else:
        s_y1 = _stats_from_rows(y1_ref, n, c)
        s_y2 = _stats_from_rows(y2_ref, n, c)
    s_y3 = _stats_from_rows(out_ref, n, c)

    lp_p, lp_s, lp_t, lp_m = _lane9_unpack(lane_pre, 4)
    _store_lane9(lp_p, s_x0, fin_ref, acc_ref, 0)
    _store_lane9(lp_s, s_y1, fin_ref, acc_ref, 2)
    _store_lane9(lp_t, s_y2, fin_ref, acc_ref, 4)
    _store_lane9(lp_m, s_y3, fin_ref, acc_ref, 6)

    env_f, cd_f, rep_f, rng_f, vtt_f, vtrt_f, vtlt_f = p1c
    # motion block scales (cpp:97-99)
    rep_norm = jnp.clip(rep_f * jnp.float32(0.08), jnp.float32(0.0), one)
    repetition_scale = one - mo_repeat_ctrl * rep_norm * jnp.float32(0.65)
    recovery = one + mo_repeat_ctrl * (one - rep_norm) * jnp.float32(0.25)

    lane_post3 = _lane9_reset(_lane9_pack([lp_p, lp_s, lp_t]))

    def mchan_row(kind, ch):
        return mchan_ref[(kind * c + ch) * msub:(kind * c + ch + 1) * msub,
                         :]

    # ---- loop 2: packed punch/sat/texture post lanes + motion p2 ch0 ----
    p2_0 = _motion.make_p2_step(mo_kc, (vtt_f, vtrt_f, vtlt_f),
                                (repetition_scale, recovery),
                                jnp.float32(0.0), sr)
    carry0 = (mvt0, mvtr0, mvtl0, mphase0, mchan_row(0, 0), mchan_row(1, 0),
              mchan_row(2, 0), mbe0, lane_post3)

    def loop2(t, carry):
        p2c = carry[:8]
        lane3 = carry[8]
        base = pl.multiple_of(t * unroll * csub, 8)
        y3chunk = out_ref[pl.ds(base, unroll * csub), :]
        yrows = msub if wave else csub
        ybase = t * unroll * yrows
        if (unroll * yrows) % 8 == 0:
            ybase = pl.multiple_of(ybase, 8)
        y1chunk = y1_ref[pl.ds(ybase, unroll * yrows), :]
        y2chunk = y2_ref[pl.ds(ybase, unroll * yrows), :]
        ys = []
        for u in range(unroll):
            if wave:   # mono scratches: rows ARE the mono streams
                m1 = y1chunk[u * msub:(u + 1) * msub, :]
                m2 = y2chunk[u * msub:(u + 1) * msub, :]
            else:
                m1 = mono_of(y1chunk[u * csub:(u + 1) * csub, :])
                m2 = mono_of(y2chunk[u * csub:(u + 1) * csub, :])
            mono_pack = jnp.concatenate(
                [m1, m2,
                 mono_of(y3chunk[u * csub:(u + 1) * csub, :])], axis=0)
            lane3 = _lane9_step(lane3, mono_pack, lane_k)
            d = y3chunk[u * csub:u * csub + msub, :]
            p2c, y = p2_0(p2c, d)
            ys.append(y)
        sbase = t * unroll * msub
        if (unroll * msub) % 8 == 0:
            sbase = pl.multiple_of(sbase, 8)
        ch_scratch[pl.ds(sbase, unroll * msub), :] = \
            jnp.concatenate(ys, axis=0)
        return p2c + (lane3,)

    carry = jax.lax.fori_loop(0, n // unroll, loop2, carry0)
    vt_s, vtr_s, vtl_s, phase_s, lp_f0, tail_f0, prev_f0, be = carry[:8]
    lane_post3 = carry[8]
    mchan_out[0 * c * msub:(0 * c + 1) * msub, :] = lp_f0
    mchan_out[(1 * c) * msub:(1 * c + 1) * msub, :] = tail_f0
    mchan_out[(2 * c) * msub:(2 * c + 1) * msub, :] = prev_f0

    pp_p, pp_s, pp_t = _lane9_unpack(lane_post3, 3)
    _store_lane9(pp_p, s_y1, fin_ref, acc_ref, 1)
    _store_lane9(pp_s, s_y2, fin_ref, acc_ref, 3)
    _store_lane9(pp_t, s_y3, fin_ref, acc_ref, 5)

    # ---- loop 3: motion p2 ch1 (channel-serial shared state,
    # cpp:108-115), fused with the channel merge (ch0 from scratch + ch1
    # just computed -> one aligned stereo store) and the packed
    # motion-POST + width-PRE lanes over the assembled output ----
    p2_1 = _motion.make_p2_step(mo_kc, (vtt_f, vtrt_f, vtlt_f),
                                (repetition_scale, recovery),
                                jnp.float32(0.85), sr) if c > 1 else None
    lane_mw0 = _lane9_pack([_lane9_reset(lp_m),
                            _lane9_init_at(pbfin_ref, (0,))])
    carry0 = (vt_s, vtr_s, vtl_s, phase_s, mchan_row(0, c - 1),
              mchan_row(1, c - 1), mchan_row(2, c - 1), be, lane_mw0)

    def loop3(t, carry):
        p2c = carry[:8]
        lane_mw = carry[8]
        base = pl.multiple_of(t * unroll * csub, 8)
        y3chunk = out_ref[pl.ds(base, unroll * csub), :]
        sbase = t * unroll * msub
        if (unroll * msub) % 8 == 0:
            sbase = pl.multiple_of(sbase, 8)
        m0chunk = ch_scratch[pl.ds(sbase, unroll * msub), :]
        rows = []
        for u in range(unroll):
            y0 = m0chunk[u * msub:(u + 1) * msub, :]
            if c > 1:
                d = y3chunk[u * csub + msub:u * csub + 2 * msub, :]
                p2c, y1ch = p2_1(p2c, d)
                rows.append(y0)
                rows.append(y1ch)
                m = half * (y0 + y1ch)
            else:
                rows.append(y0)
                m = y0
            lane_mw = _lane9_step(
                lane_mw, jnp.concatenate([m, m], axis=0), lane_k)
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(rows, 0)
        return p2c + (lane_mw,)

    carry = jax.lax.fori_loop(0, n // unroll, loop3, carry0)
    vt_s, vtr_s, vtl_s, phase_s, lp_f1, tail_f1, prev_f1, be = carry[:8]
    lane_mw = carry[8]
    if c > 1:
        mchan_out[(0 * c + 1) * msub:(0 * c + 2) * msub, :] = lp_f1
        mchan_out[(1 * c + 1) * msub:(1 * c + 2) * msub, :] = tail_f1
        mchan_out[(2 * c + 1) * msub:(2 * c + 2) * msub, :] = prev_f1

    outs = [env_f, rep_f, be, vt_s, vtr_s, vtl_s,
            vtt_f, vtrt_f, vtlt_f, phase_s, cd_f]
    for i, v in enumerate(outs):
        mmono_out[i * msub:(i + 1) * msub, :] = v
    mrng_out[...] = rng_f

    s_x4 = _stats_from_rows(out_ref, n, c)
    lm_post, lw_pre = _lane9_unpack(lane_mw, 2)
    _store_lane9(lm_post, s_x4, fin_ref, acc_ref, 7)
    _store_lane9(lw_pre, s_x4, fin_ref, acc_ref, 8)


# ---------------------------------------------------------------------------
# Back half (same call; x5 stays in VMEM): width -> cohere -> infer
# ---------------------------------------------------------------------------

def _back_kernel(n, c, unroll, D, params_ref, x_ref, win_ref, cmono_ref,
                 ctail_ref, lanes_ref, out_ref, newwin_ref, cmono_out,
                 ctail_out, fin_ref, acc_ref, x5_ref, window_ref, dma_sem,
                 rows_ref=None):
    msub = sk.MSUB
    csub = c * msub
    one = jnp.float32(1.0)
    half = jnp.float32(0.5)
    P = [0]
    rowp = rows_ref is not None

    def nextp(k=1):
        if rowp:
            vals = tuple(rows_ref[pl.ds((P[0] + i) * msub, msub), :]
                         for i in range(k))
        else:
            vals = tuple(params_ref[0, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    def nexts(k=1):
        vals = tuple(params_ref[0, P[0] + i] for i in range(k))
        P[0] += k
        return vals if k > 1 else vals[0]

    def xc(p):
        return jnp.concatenate([p] * c, axis=0) if (rowp and c > 1) else p

    lane_k = tuple(nexts(7))          # sr-only consts: SMEM either way
    w_width0, w_limit, w_mix, w_out = nextp(4)
    # the Haas delay is a scalar window ROW OFFSET — structural, uniform
    # by contract (serve's eligibility check keeps per-stream haasMs edits
    # off the kernel rows path)
    w_delay_f = nexts()
    low_c, high_c = nextp(2)          # mono form (loop 1)
    low_cc, high_cc = xc(low_c), xc(high_c)   # stereo form (loop 2)
    match_amt, learn_f, decay, tail_amt, co_mix, co_out = nextp(6)
    tail_amt, co_mix, co_out = xc(tail_amt), xc(co_mix), xc(co_out)
    trim_gain, inv_n = nextp(2)
    trim_gain = xc(trim_gain)

    g = pl.program_id(0)
    cp = pltpu.make_async_copy(win_ref.at[g],
                               window_ref.at[pl.ds(0, D * msub), :],
                               dma_sem)
    cp.start()
    cp.wait()

    def split(s):
        l = s[0:msub, :]
        r = s[msub:2 * msub, :] if c > 1 else l
        return l, r

    # ---- width (JuicyWidth cpp:92-133): serial block-local width shrink
    # (the exact C++ repeated-multiplication order, cpp:109-112), wet-L to a
    # temp region of out_ref, wet-R-pre into the Haas window; everything
    # else vectorized below.
    w0 = jnp.zeros((msub, sk.LANES), jnp.float32) + w_width0

    def loopw(tt, w):
        base = pl.multiple_of(tt * unroll * csub, 8)
        chunk = x_ref[pl.ds(base, unroll * csub), :]
        wls, wrs = [], []
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            corr = jnp.clip(l * r * jnp.float32(12.0), jnp.float32(-1.0),
                            jnp.float32(1.0))
            dip = corr < jnp.float32(-0.1)
            w = jnp.where(dip, w * w_limit, w)
            mid = half * (l + r)
            side = half * (l - r) * (one + w)
            wls.append(mid + side)
            wrs.append(mid - side)
        mbase = tt * unroll * msub
        if (unroll * msub) % 8 == 0:
            mbase = pl.multiple_of(mbase, 8)
        out_ref[pl.ds(mbase, unroll * msub), :] = jnp.concatenate(wls, 0)
        wbase = D * msub + tt * unroll * msub
        if (unroll * msub) % 8 == 0:
            wbase = pl.multiple_of(wbase, 8)
        window_ref[pl.ds(wbase, unroll * msub), :] = jnp.concatenate(wrs, 0)
        return w

    jax.lax.fori_loop(0, n // unroll, loopw, w0)

    # vectorized Haas read + mix/output (cpp:119-133), chunked over time so
    # the wide temporaries stay within the scoped-VMEM stack budget
    delay = w_delay_f.astype(jnp.int32)
    csize = 64
    while n % csize:
        csize //= 2

    def vec_chunk(i, _):
        xb = pl.multiple_of(i * csize * csub, 8)
        a3 = x_ref[pl.ds(xb, csize * csub), :].reshape(csize, csub,
                                                       sk.LANES)
        dl = a3[:, 0:msub, :]
        dr = a3[:, msub:2 * msub, :]
        mb = i * csize * msub
        if (csize * msub) % 8 == 0:
            mb = pl.multiple_of(mb, 8)
        wet_l = out_ref[pl.ds(mb, csize * msub), :].reshape(
            csize, msub, sk.LANES)
        base_rows = (D - delay + i * csize) * msub
        aligned = (base_rows // 8) * 8
        frac = base_rows - aligned
        big = window_ref[pl.ds(aligned, csize * msub + 8), :]
        wet_r_rows = big[0:csize * msub, :]
        # frac is a multiple of MSUB (base_rows is), so only those
        # candidate shifts can occur
        for f in range(msub, 8, msub):
            wet_r_rows = jnp.where(frac == f, big[f:csize * msub + f, :],
                                   wet_r_rows)
        wet_r = wet_r_rows.reshape(csize, msub, sk.LANES)
        x5_l = (dl + w_mix * (wet_l - dl)) * w_out
        x5_r = (dr + w_mix * (wet_r - dr)) * w_out
        x5_ref[pl.ds(xb, csize * csub), :] = jnp.concatenate(
            [x5_l, x5_r], axis=1).reshape(csize * csub, sk.LANES)
        return 0

    jax.lax.fori_loop(0, n // csize, vec_chunk, 0)

    # updated window = last D rows
    cp = pltpu.make_async_copy(
        window_ref.at[pl.ds(n * msub, D * msub), :], newwin_ref.at[g],
        dma_sem)
    cp.start()
    cp.wait()

    s_x5 = _stats_from_rows(x5_ref, n, c)

    # ---- loop 1: packed width-post + cohere-pre lanes + cohere analysis
    lane_wc = _lane9_init_at(lanes_ref, (0, 1))
    a_low0 = cmono_ref[0:msub, :]
    a_high0 = cmono_ref[msub:2 * msub, :]
    t_low0 = cmono_ref[2 * msub:3 * msub, :]
    t_mid0 = cmono_ref[3 * msub:4 * msub, :]
    t_high0 = cmono_ref[4 * msub:5 * msub, :]
    z = jnp.zeros_like(a_low0)

    def loop1(t, carry):
        lane_wc, lo, hi, le, me, he = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x5_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            m = half * (l + r)
            lane_wc = _lane9_step(
                lane_wc, jnp.concatenate([m, m], axis=0), lane_k)
            # cohere analysis (cpp:62-76), exact serial op/summation order
            lo = lo + low_c * (m - lo)
            hi = hi + high_c * (m - hi)
            low_v = lo
            high_v = m - hi
            mid_v = m - low_v - high_v
            le = le + low_v * low_v
            me = me + mid_v * mid_v
            he = he + high_v * high_v
        return lane_wc, lo, hi, le, me, he

    lane_wc, a_low, a_high, le, me, he = jax.lax.fori_loop(
        0, n // unroll, loop1, (lane_wc, a_low0, a_high0, z, z, z))
    lw_post, lc_pre = _lane9_unpack(lane_wc, 2)
    _store_lane9(lw_post, s_x5, fin_ref, acc_ref, 0)
    _store_lane9(lc_pre, s_x5, fin_ref, acc_ref, 1)

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

    db_per_log2 = jnp.float32(20.0 / np.log2(10.0))

    def g2db(x):
        # pinned log2 (ops/precise.py) — matches convert.gain_to_db exactly
        db = db_per_log2 * log2_32(jnp.maximum(x, jnp.float32(1e-30)))
        return jnp.maximum(db, jnp.float32(-100.0))

    low_err = jnp.abs(g2db((le + eps) / (t_low + eps)))
    mid_err = jnp.abs(g2db((me + eps) / (t_mid + eps)))
    high_err = jnp.abs(g2db((he + eps) / (t_high + eps)))
    deviation = (low_err + mid_err + high_err) / jnp.float32(3.0)
    context_fit = jnp.clip(jnp.float32(100.0) - deviation * jnp.float32(10.0),
                           jnp.float32(0.0), jnp.float32(100.0))

    expo = jnp.float32(0.25) * match_amt

    def comp(tgt, e):
        p = pow32((tgt + eps) / (e + eps), expo)
        return jnp.clip(p, jnp.float32(0.5), jnp.float32(1.8))

    low_comp = comp(t_low, le)
    mid_comp = comp(t_mid, me)
    high_comp = comp(t_high, he)
    fb = xc(jnp.clip(decay, jnp.float32(0.0), jnp.float32(0.93)))

    cmono_out[0:msub, :] = a_low
    cmono_out[msub:2 * msub, :] = a_high
    cmono_out[2 * msub:3 * msub, :] = t_low
    cmono_out[3 * msub:4 * msub, :] = t_mid
    cmono_out[4 * msub:5 * msub, :] = t_high
    cmono_out[5 * msub:6 * msub, :] = context_fit

    def perchan(v):
        return jnp.concatenate([v] * c, axis=0)

    cc_low, cc_mid, cc_high = (perchan(low_comp), perchan(mid_comp),
                               perchan(high_comp))

    # ---- loop 2: cohere render + packed cohere-post/infer-pre lanes +
    # infer trim; y6 overwrites the x5 scratch rows in place
    lane_ci = _lane9_pack([_lane9_reset(lc_pre),
                           _lane9_init_at(lanes_ref, (2,))])
    zc = jnp.zeros_like(ctail_ref[...])

    def loop2(t, carry):
        lane_ci, lp_a, lp_b, tail = carry
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = x5_ref[pl.ds(base, unroll * csub), :]
        y6s, y7s = [], []
        for u in range(unroll):
            d = chunk[u * csub:(u + 1) * csub, :]
            # cohere render (cpp:99-118); split filters start from zero
            lp_a = lp_a + low_cc * (d - lp_a)
            lp_b = lp_b + high_cc * (d - lp_b)
            low_v = lp_a * cc_low
            high_v = (d - lp_b) * cc_high
            mid_v = (d - lp_a - (d - lp_b)) * cc_mid
            matched = low_v + mid_v + high_v
            tail = matched + tail * fb
            wet = matched + tail_amt * jnp.float32(0.35) * tail
            y6 = (d + co_mix * (wet - d)) * co_out
            m = half * (y6[0:msub, :] + (y6[msub:2 * msub, :]
                                         if c > 1 else y6[0:msub, :]))
            lane_ci = _lane9_step(
                lane_ci, jnp.concatenate([m, m], axis=0), lane_k)
            y6s.append(y6)
            # infer trim (JuicyInfer cpp:74-79)
            y7s.append(y6 * trim_gain)
        x5_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y6s, axis=0)
        out_ref[pl.ds(base, unroll * csub), :] = jnp.concatenate(y7s, axis=0)
        return lane_ci, lp_a, lp_b, tail

    lane_ci, _lp_a, _lp_b, tail_f = jax.lax.fori_loop(
        0, n // unroll, loop2, (lane_ci, zc, zc, ctail_ref[...]))
    s_y6 = _stats_from_rows(x5_ref, n, c)
    lc_post, li_pre = _lane9_unpack(lane_ci, 2)
    _store_lane9(lc_post, s_y6, fin_ref, acc_ref, 2)
    _store_lane9(li_pre, s_y6, fin_ref, acc_ref, 3)
    ctail_out[...] = tail_f

    # ---- loop 3: infer post lane over the trimmed output ----
    lane_i2 = _lane9_reset(li_pre)

    def loop3(t, lane_i2):
        base = pl.multiple_of(t * unroll * csub, 8)
        chunk = out_ref[pl.ds(base, unroll * csub), :]
        for u in range(unroll):
            l, r = split(chunk[u * csub:(u + 1) * csub, :])
            lane_i2 = _lane9_step(lane_i2, half * (l + r), lane_k)
        return lane_i2

    lane_i2 = jax.lax.fori_loop(0, n // unroll, loop3, lane_i2)
    s_y7 = _stats_from_rows(out_ref, n, c)
    _store_lane9(lane_i2, s_y7, fin_ref, acc_ref, 4)


# ---------------------------------------------------------------------------
# Mono kernel: the whole 7-plugin chain in ONE pallas_call — the front and
# back bodies run back-to-back with the width input stream (x5) held in a
# VMEM scratch, so the only HBM round trip left per block is in/out audio.
# The width analyzer's pre->post lane handoff (one shared instance threads
# pre to post, JuicinessAnalyzer.h:33-43) happens in-kernel: the front
# stores the width-pre lane at fin slot 8 in the same 5-row format the
# back's lane init reads.
# ---------------------------------------------------------------------------

def _mono_kernel(mode, n, c, unroll, sr, H, L, D,
                 fp_ref, lcg_a_ref, lcg_b_ref, widx_ref, bp_ref,
                 x_ref, pdsp_ref, sdsp_ref, tdsp_ref, tmat_ref, trng_ref,
                 mmono_ref, mchan_ref, mrng_ref, pffin_ref, hist_ref,
                 win_ref, cmono_ref, ctail_ref, pbfin_ref,
                 out_ref, pdsp_out, sdsp_out, tdsp_out, tmat_out,
                 mmono_out, mchan_out, mrng_out, ffin_ref, facc_ref,
                 newhist_ref, newwin_ref, cmono_out, ctail_out,
                 bfin_ref, bacc_ref,
                 y1_ref, y2_ref, m0_ref, fwin_ref, x4_ref, x5_ref,
                 bwin_ref, bl_ref, dma_sem, frows_ref=None, brows_ref=None):
    msub = sk.MSUB
    _front_kernel(mode, n, c, unroll, sr, H, L,
                  fp_ref, lcg_a_ref, lcg_b_ref, widx_ref,
                  x_ref, pdsp_ref, sdsp_ref, tdsp_ref, tmat_ref, trng_ref,
                  mmono_ref, mchan_ref, mrng_ref, pffin_ref, pbfin_ref,
                  hist_ref,
                  x4_ref, pdsp_out, sdsp_out, tdsp_out, tmat_out,
                  mmono_out, mchan_out, mrng_out, ffin_ref, facc_ref,
                  newhist_ref, y1_ref, y2_ref, m0_ref, fwin_ref, dma_sem,
                  rows_ref=frows_ref)
    # back lane inits, all in the shared 5-row fin format: slot 0 = THIS
    # block's width-pre final (front fin slot 8); slots 1/2 = previous
    # block's cohere/infer POST lanes (prev bfin slots 2/4)
    bl_ref[0:5 * msub, :] = ffin_ref[8 * 5 * msub:9 * 5 * msub, :]
    bl_ref[5 * msub:10 * msub, :] = pbfin_ref[2 * 5 * msub:3 * 5 * msub, :]
    bl_ref[10 * msub:15 * msub, :] = pbfin_ref[4 * 5 * msub:5 * 5 * msub, :]
    _back_kernel(n, c, unroll, D,
                 bp_ref, x4_ref, win_ref, cmono_ref, ctail_ref, bl_ref,
                 out_ref, newwin_ref, cmono_out, ctail_out, bfin_ref,
                 bacc_ref, x5_ref, bwin_ref, dma_sem, rows_ref=brows_ref)




# ---------------------------------------------------------------------------
# Orchestration: pack once -> scan in kernel-tile layout -> unpack once.
#
# All DSP state (including the Haas window) and the audio stream stay in the
# kernels' [G, rows, 128] tile layout across blocks — the layout transposes
# (to_stream/from_stream/state_to_tiles) run exactly once per corpus, not
# once per block. Only the analyzer states thread as small [B]-leaf dicts
# (their per-block finalize math is the score formulas, shared with the
# stage kernels via finalize_lane).
# ---------------------------------------------------------------------------

_TEX_NMAT = {0: 2, 1: 8, 2: 9, 3: 9, 4: 4,
             # PACKED nonwave: gel(2) + metal(8) + flesh(4) union states
             # + the per-clip mode-word tile (leaf 15, passthrough)
             sk.TEX_PACKED: 15,
             # MERGED WAVE rows: wood and plastic share the wave state
             # layout exactly (modal y1/y2 + prev_wave) — the material
             # lives in the per-grid-row pvec, not in state
             sk.TEX_WAVE_ROWS: 9}


def _front_pvec(params, states0, sr, mode: int):
    """The front kernel's stream-constant parameter row from FULL param
    dicts — a pure jnp function of the param leaves, so per-block
    automation can vmap it over stacked curves."""
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
          *sk.tex_param_list(params[2], states0[2]["dsp"], sr, mode)]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in pv])


def _front_setup(chain, states0, mode: int):
    """Stream-constant inputs + dims shared by the front and mono
    machineries: (pvec, lcg_a, lcg_b, dims dict)."""
    msub = sk.MSUB
    c, n, sr = chain.channels, chain.block_size, chain.sr
    csub = c * msub
    nmat = _TEX_NMAT[mode]
    params = [p.full_params(pr) for p, pr in zip(chain.plugins, chain.params)]
    if mode == sk.TEX_WAVE_ROWS:
        # one pvec ROW PER GRID TILE: the wood and plastic const rows are
        # identical in layout (tex_unpack's wave branch), so the merged
        # launch just gathers the right row per tile — the row's consts
        # (incl. the structural ring delay, read via `nexts`) ARE the
        # material. _kernel_mode validated tile-uniformity.
        matv = np.asarray(jax.device_get(
            chain.params[2]["material"])).astype(np.int32).ravel()
        rowmat = jnp.asarray(matv.reshape(-1, sk.TILE)[:, 0] == 2)
        row_w = _front_pvec(params, states0, sr, 2)
        row_p = _front_pvec(params, states0, sr, 3)
        pvec = jnp.where(rowmat[:, None], row_w[None], row_p[None])
    else:
        pvec = _front_pvec(params, states0, sr, mode)[None]

    from juicy_tpu.ops.noise import _jump_coefficients
    a_np, b_np = _jump_coefficients(c * n)
    lcg_a = jnp.asarray(a_np)[None]
    lcg_b = jnp.asarray(b_np)[None]

    wave = mode in sk.WAVE_MODES
    L = _texture.waveguide_size(sr) if wave else 0
    H = sk._tex_hist_len(mode, sr) if wave else 0
    dims = dict(wave=wave, L=L, H=H, nmat=nmat,
                hist_rows=H * csub if wave else 8,
                yrows=n * (msub if wave else csub),
                win_rows=(H + n) * csub if wave else 8)
    return pvec, lcg_a, lcg_b, dims


def _back_pvec(params, sr, n):
    """The back kernel's stream-constant parameter row from FULL param
    dicts (pure jnp function — vmappable for per-block automation)."""
    w_params, co_params, in_params = params[4], params[5], params[6]
    # delaySamples = int(sr * (haasMs · 0.001f)) — float32 product,
    # truncated toward zero (cpp:92), matching models/width.py
    delay = (jnp.float32(sr) * (jnp.asarray(w_params["haasMs"], jnp.float32)
                                * jnp.float32(0.001))).astype(jnp.int32)
    pv = [*sk._lane_consts(sr),
          jnp.asarray(w_params["width"], jnp.float32),
          jmap(w_params["monoSafe"], 1.0, 0.35),
          jnp.asarray(w_params["mix"], jnp.float32),
          db_to_gain(w_params["output"]),
          delay.astype(jnp.float32),
          onepole_coeff(220.0, sr), onepole_coeff(2400.0, sr),
          jnp.asarray(co_params["match"], jnp.float32),
          jnp.asarray(co_params["learn"], jnp.float32),
          jnp.asarray(co_params["decay"], jnp.float32),
          jnp.asarray(co_params["tail"], jnp.float32),
          jnp.asarray(co_params["mix"], jnp.float32),
          db_to_gain(co_params["output"]),
          db_to_gain(in_params["trim"]),
          jnp.float32(1.0 / max(1, n))]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in pv])


def _back_setup(chain, states0):
    """Stream-constant back-kernel inputs: (pvec, D)."""
    msub = sk.MSUB
    n, sr = chain.block_size, chain.sr
    params = [p.full_params(pr) for p, pr in zip(chain.plugins, chain.params)]
    D = states0[4]["dsp"]["haas_window"].shape[-1]
    if (D * msub) % 8:
        raise ChainKernelUnsupported(
            f"haas window size {D} breaks row alignment (D*MSUB % 8 != 0)")
    if D < n:
        raise ChainKernelUnsupported(
            f"haas window {D} shorter than block {n}")
    pvec = _back_pvec(params, sr, n)[None]
    return pvec, D


def _front_packers(chain, states0, mode: int, bsz: int):
    """Front-state layout packers: pack(states) -> tiles;
    unpack(tiles, states0) -> dsp dicts. (The pallas plumbing lives in
    _mono_machinery.)"""
    tile, lanes_n = sk.TILE, sk.LANES
    c, n, sr = chain.channels, chain.block_size, chain.sr
    grid = bsz // tile

    _pvec, _lcg_a, _lcg_b, dims = _front_setup(chain, states0, mode)
    wave, L, nmat = dims["wave"], dims["L"], dims["nmat"]

    def pack(states):
        tdsp = states[2]["dsp"]
        if wave:
            tdsp = sk.texture_kernel_state(tdsp, sr, mode)
        mat_leaves = sk.tex_mat_leaves(tdsp, mode)
        if mode == sk.TEX_PACKED:
            # per-clip mode word (from the traced material param) as the
            # 15th material-state leaf — constant through the run
            matv = jnp.broadcast_to(jnp.asarray(
                chain.params[2]["material"], jnp.float32), (bsz,))
            mat_leaves = mat_leaves + [
                jnp.broadcast_to(matv[:, None], (bsz, c))]
        tiles = {
            "pdsp": sk.state_to_tiles([states[0]["dsp"]["fast_env"],
                                       states[0]["dsp"]["slow_env"]]),
            "sdsp": sk.state_to_tiles([states[1]["dsp"]["tone_state"]]),
            "tdsp": sk.state_to_tiles([tdsp[k] for k in sk._TEX_DSP_KEYS]),
            "tmat": sk.state_to_tiles(mat_leaves),
            "trng": sk._u32_to_tiles(jnp.asarray(tdsp["rng"], jnp.uint32)),
            "mmono": sk.motion_mono_tiles(states[3]["dsp"], bsz),
            "mchan": sk.state_to_tiles([states[3]["dsp"]["lp"],
                                        states[3]["dsp"]["tail"],
                                        states[3]["dsp"]["prev"]]),
            "mrng": sk._u32_to_tiles(jnp.broadcast_to(
                jnp.asarray(states[3]["dsp"]["rng"], jnp.uint32), (bsz,))),
        }
        if wave:
            tiles["thist"] = sk.to_stream(tdsp["waveguide"])
            widx0 = jnp.asarray(tdsp["wave_idx"]).reshape(-1)[0]
            tiles["twidx"] = widx0.astype(jnp.float32).reshape(1, 1)
        else:
            tiles["thist"] = jnp.zeros((grid, 8, lanes_n), jnp.float32)
            tiles["twidx"] = jnp.zeros((1, 1), jnp.float32)
        return tiles

    def unpack(tiles, states0):
        fast_f, slow_f = sk.tiles_to_state(tiles["pdsp"], bsz, c, 2)
        (tone_f,) = sk.tiles_to_state(tiles["sdsp"], bsz, c, 1)
        tex_leaves = sk.tiles_to_state(tiles["tdsp"], bsz, c, 9)
        mat_out = sk.tiles_to_state(tiles["tmat"], bsz, c, nmat)
        if wave:
            # rebuild the window-form dsp, then convert back to ring form
            nm = 4
            tex_dsp = {k: v for k, v in zip(sk._TEX_DSP_KEYS, tex_leaves)}
            tex_dsp["modal_y1"] = jnp.stack(mat_out[:nm], axis=-1)
            tex_dsp["modal_y2"] = jnp.stack(mat_out[nm:2 * nm], axis=-1)
            tex_dsp["prev_wave"] = mat_out[2 * nm]
            tex_dsp["waveguide"] = sk.from_stream(tiles["thist"], bsz, c)
            widx = tiles["twidx"][0, 0].astype(jnp.int32)
            tex_dsp["wave_idx"] = jnp.broadcast_to(
                widx, jnp.shape(states0[2]["dsp"]["wave_idx"]))
            tex_dsp = sk.texture_ring_state(tex_dsp, sr, mode, L)
        else:
            tex_dsp = sk.tex_rebuild_dsp(states0[2]["dsp"], tex_leaves,
                                         mat_out, mode, None, bsz, c, n, sr)
        # the tiled carry already advanced the LCG once per block
        tex_dsp["rng"] = sk.tiles_to_mono(tiles["trng"], bsz, 1)[0]
        mono_out = sk.tiles_to_mono(tiles["mmono"], bsz, 11)
        lp_f, tail_f, prev_f = sk.tiles_to_state(tiles["mchan"], bsz, c, 3)
        return {
            "punch": {"fast_env": fast_f, "slow_env": slow_f},
            "saturator": {"tone_state": tone_f},
            "texture": tex_dsp,
            "motion": sk.motion_rebuild_dsp(
                mono_out, sk.tiles_to_mono(tiles["mrng"], bsz, 1)[0],
                lp_f, tail_f, prev_f),
        }

    return pack, unpack


def _back_packers(chain, states0, bsz: int):
    """Back-state layout packers (width -> cohere -> infer)."""
    c = chain.channels
    _back_setup(chain, states0)          # layout checks (D alignment)

    def pack(states):
        window = jnp.asarray(states[4]["dsp"]["haas_window"], jnp.float32)
        co = states[5]["dsp"]
        return {
            "win": sk.to_stream(window[:, None, :]),
            "cmono": sk.mono_to_tiles([
                jnp.broadcast_to(jnp.asarray(co[k], jnp.float32), (bsz,))
                for k in ("analysis_low", "analysis_high", "target_low",
                          "target_mid", "target_high")]),
            "ctail": sk.state_to_tiles([jnp.broadcast_to(
                jnp.asarray(co["tail"], jnp.float32), (bsz, c))]),
        }

    def unpack(tiles, cmono_full):
        new_window = sk.from_stream(tiles["win"], bsz, 1)[:, 0, :]
        mono = sk.tiles_to_mono(cmono_full, bsz, 6)
        (tail_leaf,) = sk.tiles_to_state(tiles["ctail"], bsz, c, 1)
        width_dsp = {"haas_window": new_window}
        co_dsp = {
            "analysis_low": mono[0], "analysis_high": mono[1],
            "target_low": mono[2], "target_mid": mono[3],
            "target_high": mono[4], "tail": tail_leaf,
            "context_fit": mono[5],
        }
        return width_dsp, co_dsp

    return pack, unpack


def _mono_machinery(chain, states0, mode: int, bsz: int, unroll: int,
                    interpret: bool, rows: bool = False):
    """Static setup for the single-call (front+back merged) kernel.

    Returns (fpack, bpack, call, funpack, bunpack):
    call(x_tile, ftiles, btiles, prev_ffin, prev_bfin) ->
    (out_tile, ftiles', btiles', cmono_full, ffin, facc, bfin, bacc).
    Lane state threads block-to-block through the fin tiles themselves
    (seed the first block with _lane_seed_tiles).

    `rows=True` builds the PER-STREAM PARAMETER variant: `call` takes two
    extra inputs (frows, brows — [G, W*MSUB, 128] per-clip parameter-row
    tiles from `_pvec_row_tiles`) and the kernels read every non-structural
    pvec entry per-clip. The SMEM pvecs still ride along for the
    structural scalars (Haas delay, waveguide indices)."""
    msub, tile, lanes_n = sk.MSUB, sk.TILE, sk.LANES
    c, n, sr = chain.channels, chain.block_size, chain.sr
    csub = c * msub
    grid = bsz // tile
    from juicy_tpu.ops.noise import lcg_advance

    fpvec, lcg_a, lcg_b, dims = _front_setup(chain, states0, mode)
    bpvec, D = _back_setup(chain, states0)
    wave, L, H, nmat = dims["wave"], dims["L"], dims["H"], dims["nmat"]
    hist_rows, yrows, win_rows = (dims["hist_rows"], dims["yrows"],
                                  dims["win_rows"])

    fpack, funpack = _front_packers(chain, states0, mode, bsz)
    bpack, bunpack = _back_packers(chain, states0, bsz)

    kernel = functools.partial(_mono_kernel, mode, n, c, unroll, sr, H, L,
                               D)

    def wrapped(fp_ref, lcg_a_ref, lcg_b_ref, widx_ref, bp_ref,
                x_ref, pdsp_ref, sdsp_ref, tdsp_ref, tmat_ref, trng_ref,
                mmono_ref, mchan_ref, mrng_ref, pffin_ref, hist_ref,
                win_ref, cmono_ref, ctail_ref, pbfin_ref, *rest):
        if rows:
            frows_ref, brows_ref = rest[0].at[0], rest[1].at[0]
            rest = rest[2:]
        else:
            frows_ref = brows_ref = None
        (out_ref, pdsp_out, sdsp_out, tdsp_out, tmat_out,
         mmono_out, mchan_out, mrng_out, ffin_ref, facc_ref,
         newhist_ref, newwin_ref, cmono_out, ctail_out,
         bfin_ref, bacc_ref,
         y1_ref, y2_ref, m0_ref, fwin_ref, x4_ref, x5_ref,
         bwin_ref, bl_ref, dma_sem) = rest
        kernel(fp_ref, lcg_a_ref, lcg_b_ref, widx_ref, bp_ref,
               x_ref.at[0], pdsp_ref.at[0], sdsp_ref.at[0], tdsp_ref.at[0],
               tmat_ref.at[0], trng_ref.at[0], mmono_ref.at[0],
               mchan_ref.at[0], mrng_ref.at[0], pffin_ref.at[0], hist_ref,
               win_ref, cmono_ref.at[0], ctail_ref.at[0], pbfin_ref.at[0],
               out_ref.at[0], pdsp_out.at[0], sdsp_out.at[0],
               tdsp_out.at[0], tmat_out.at[0], mmono_out.at[0],
               mchan_out.at[0], mrng_out.at[0], ffin_ref.at[0],
               facc_ref.at[0], newhist_ref, newwin_ref, cmono_out.at[0],
               ctail_out.at[0], bfin_ref.at[0], bacc_ref.at[0],
               y1_ref, y2_ref, m0_ref, fwin_ref, x4_ref, x5_ref,
               bwin_ref, bl_ref, dma_sem, frows_ref=frows_ref,
               brows_ref=brows_ref)

    def smem(w, rows_n=1):
        # rows_n > 1: the merged-wave launch ships the FULL [G, W] pvec
        # as one SMEM block (Mosaic requires whole-array SMEM blocks) and
        # the kernel indexes its row by pl.program_id
        return pl.BlockSpec((rows_n, w), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)

    fp_rows = fpvec.shape[0]
    if fp_rows > 1 and fp_rows != grid:
        raise ChainKernelUnsupported(
            f"per-row pvec has {fp_rows} rows for a {grid}-tile "
            f"grid (batch {bsz}) — material rows must match the batch")
    ts = sk._tilespec
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    row_specs = ([ts(fpvec.shape[1] * msub), ts(bpvec.shape[1] * msub)]
                 if rows else [])
    pcall = functools.partial(
        pl.pallas_call, wrapped,
        grid=(grid,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        in_specs=[
            smem(fpvec.shape[1], rows_n=fp_rows), smem(c * n),
            smem(c * n), smem(1),
            smem(bpvec.shape[1]),
            ts(n * csub), ts(2 * csub), ts(csub), ts(9 * csub),
            ts(nmat * csub), ts(msub), ts(11 * msub), ts(3 * csub),
            ts(msub), ts(45 * msub), anyspec,
            anyspec, ts(5 * msub), ts(csub), ts(25 * msub),
        ] + row_specs,
        out_specs=[
            ts(n * csub), ts(2 * csub), ts(csub), ts(9 * csub),
            ts(nmat * csub), ts(11 * msub), ts(3 * csub), ts(msub),
            ts(45 * msub), ts(90 * msub), anyspec,
            anyspec, ts(6 * msub), ts(csub), ts(25 * msub), ts(50 * msub),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, n * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 2 * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 9 * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, nmat * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 11 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 3 * csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, msub, lanes_n), jnp.uint32),
            jax.ShapeDtypeStruct((grid, 45 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 90 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, hist_rows, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, D * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 6 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, csub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 25 * msub, lanes_n), jnp.float32),
            jax.ShapeDtypeStruct((grid, 50 * msub, lanes_n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((yrows, lanes_n), jnp.float32),
            pltpu.VMEM((yrows, lanes_n), jnp.float32),
            pltpu.VMEM((n * msub, lanes_n), jnp.float32),
            pltpu.VMEM((win_rows, lanes_n), jnp.float32),
            pltpu.VMEM((n * csub, lanes_n), jnp.float32),
            pltpu.VMEM((n * csub, lanes_n), jnp.float32),
            pltpu.VMEM(((D + n) * msub + 8, lanes_n), jnp.float32),
            pltpu.VMEM((15 * msub, lanes_n), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )

    def call(x_tile, ftiles, btiles, pffin, pbfin, fpv=None, bpv=None,
             frows=None, brows=None):
        extra = (frows, brows) if rows else ()
        (out, pdsp_f, sdsp_f, tdsp_f, tmat_f, mmono_f, mchan_f, mrng_f,
         ffin, facc, newhist, newwin, cmono_f, ctail_f, bfin,
         bacc) = pcall()(
            fpvec if fpv is None else fpv[None],
            lcg_a, lcg_b, ftiles["twidx"],
            bpvec if bpv is None else bpv[None], x_tile,
            ftiles["pdsp"], ftiles["sdsp"], ftiles["tdsp"], ftiles["tmat"],
            ftiles["trng"], ftiles["mmono"], ftiles["mchan"],
            ftiles["mrng"], pffin, ftiles["thist"], btiles["win"],
            btiles["cmono"], btiles["ctail"], pbfin, *extra)
        ftiles2 = {"pdsp": pdsp_f, "sdsp": sdsp_f, "tdsp": tdsp_f,
                   "tmat": tmat_f,
                   # draw count per block is static: closed-form LCG jump
                   "trng": lcg_advance(ftiles["trng"], c * n),
                   "mmono": mmono_f, "mchan": mchan_f, "mrng": mrng_f,
                   "thist": newhist if wave else ftiles["thist"],
                   "twidx": (jnp.mod(ftiles["twidx"] + n, L) if wave
                             else ftiles["twidx"])}
        btiles2 = {"win": newwin, "cmono": cmono_f[:, :5 * msub, :],
                   "ctail": ctail_f}
        return out, ftiles2, btiles2, cmono_f, ffin, facc, bfin, bacc

    return fpack, bpack, call, funpack, bunpack


def _pvec_row_tiles(chain, states0, mode: int, bsz: int, params_rows):
    """Per-slot parameter rows -> the kernels' per-clip row tiles.

    `params_rows`: one dict per stage with [B]-stacked traced-param leaves
    (scalar leaves broadcast) — the StreamServer._params shape. Returns
    (frows [G, FW*MSUB, 128], brows [G, BW*MSUB, 128], full_b), where the
    tile layout puts pvec entry w at rows w*MSUB..(w+1)*MSUB with clip
    (g*MSUB + m)*128 + lane at [g, w*MSUB + m, lane] — the same clip
    mapping as the audio stream tiles (corpus_to_tiles)."""
    msub, lanes_n = sk.MSUB, sk.LANES
    grid = bsz // sk.TILE
    n, sr = chain.block_size, chain.sr
    full_b = []
    for plug, rows in zip(chain.plugins, params_rows):
        fp = plug.full_params(rows)
        full_b.append({k: jnp.broadcast_to(jnp.asarray(v, jnp.float32),
                                           (bsz,))
                       for k, v in fp.items()})
    fr = jax.vmap(lambda p: _front_pvec(p, states0, sr, mode))(full_b)
    br = jax.vmap(lambda p: _back_pvec(p, sr, n))(full_b)

    def tiles(v):                     # [B, W] -> [G, W*MSUB, 128]
        w = v.shape[1]
        return v.reshape(grid, msub, lanes_n, w).transpose(
            0, 3, 1, 2).reshape(grid, w * msub, lanes_n)

    return tiles(fr), tiles(br), full_b


#: (stage index, param) pairs whose pvec entries are STRUCTURAL on the
#: kernel rows path — consumed as scalar row/ring indices, so they must be
#: uniform across the pool (callers fall back to the fused executor when a
#: slot edits one). Texture knobs in wave modes feed the material consts
#: that include the waveguide delay, hence the whole stage is structural
#: there.
def rows_ineligible_params(chain) -> set:
    mode = _check_chain(chain)
    bad = {(4, "haasMs")}
    if mode in sk.WAVE_MODES:
        bad |= {(2, k) for k in chain.plugins[2].full_params(
            chain.params[2])}
    if mode == sk.TEX_PACKED:
        # the mode-word tile bakes from chain.params at machinery build;
        # per-slot material edits need a fused-rows tick
        bad |= {(2, "material")}
    return bad


#: (fin-tile slot holding each plugin's POST lane, which fin tensor) —
#: where the NEXT block's pre lane reads its analyzer state from.
_POST_SLOTS_F = {0: 1, 1: 3, 2: 5, 3: 7}     # punch/sat/texture/motion
_POST_SLOTS_B = {4: 0, 5: 2, 6: 4}           # width/cohere/infer


def _lane_seed_tiles(an_states, bsz):
    """Initial prev-fin tiles for the mono kernel: each analyzer state's
    5 carry rows placed at the POST-lane slot its pre lane inits from."""
    msub, lanes_n = sk.MSUB, sk.LANES
    grid = bsz // sk.TILE
    ffin0 = jnp.zeros((grid, 45 * msub, lanes_n), jnp.float32)
    bfin0 = jnp.zeros((grid, 25 * msub, lanes_n), jnp.float32)
    for i, slot in _POST_SLOTS_F.items():
        ffin0 = ffin0.at[:, slot * 5 * msub:(slot + 1) * 5 * msub, :].set(
            sk.pack_lane(an_states[i], bsz))
    for i, slot in _POST_SLOTS_B.items():
        bfin0 = bfin0.at[:, slot * 5 * msub:(slot + 1) * 5 * msub, :].set(
            sk.pack_lane(an_states[i], bsz))
    return ffin0, bfin0


def _finalize_block(chain, an_states, ffin, facc, bfin, bacc, cohere_cf,
                    bsz, n, sr, params_list=None):
    """Per-block lane finalize: analyzer states advance, metrics emerge.
    `cohere_cf` is the block's context-fit tile row ([B]). `params_list`
    (per-stream rows): full param dicts with [B] leaves — the finalize
    formulas broadcast them against the [B] metric leaves."""
    from juicy_tpu.runtime.plugin import _default_finalize

    lane_map = [
        (ffin, facc, 0, 1), (ffin, facc, 2, 3), (ffin, facc, 4, 5),
        (ffin, facc, 6, 7), None, (bfin, bacc, 1, 2), (bfin, bacc, 3, 4),
    ]
    new_an, metrics_list = [], []
    for i, plug in enumerate(chain.plugins):
        if i == 4:
            pre = _lane_slices(ffin, facc, 8)
            post = _lane_slices(bfin, bacc, 0)
        else:
            fin, acc, pre_idx, post_idx = lane_map[i]
            pre = _lane_slices(fin, acc, pre_idx)
            post = _lane_slices(fin, acc, post_idx)
        pre_state, pre_m = sk.finalize_lane(pre[0], pre[1], an_states[i],
                                            bsz, n, sr)
        post_state, post_m = sk.finalize_lane(post[0], post[1], pre_state,
                                              bsz, n, sr)
        new_an.append(post_state)
        finalize = plug.defn.finalize_metrics or _default_finalize
        carry = {"context_fit": cohere_cf} if i == 5 else None
        fparams = (plug.full_params(chain.params[i]) if params_list is None
                   else params_list[i])
        metrics_list.append(finalize(fparams, pre_m, post_m, carry))
    return new_an, metrics_list


def _finalize_stream(chain, an0, ffin_s, facc_s, bfin_s, bacc_s, cms,
                     bsz, n, sr, params_list=None):
    """Vectorized lane finalize over a whole stream's stacked fin/acc
    tiles ([nb, G, rows, 128]): the EMA-independent score formulas run
    ONCE over all 14 lane instances x nb blocks in tile layout (the
    [G, MSUB, 128] <-> [B] mapping is a contiguous reshape, so no
    transposes); the only cross-block recurrence — the repetition/fatigue
    EMA pair, advanced once per pre and once per post finalize — runs as
    ONE lax.scan over 2*nb steps for all 7 analyzer instances at once
    (same serial op order as the per-block path: bit-identical results).

    Returns (new analyzer states, per-block metrics list — leaves
    [nb, B])."""
    from juicy_tpu import analyzer as _an
    from juicy_tpu.runtime.plugin import _default_finalize

    msub, lanes_n = sk.MSUB, sk.LANES
    nb, grid = ffin_s.shape[0], ffin_s.shape[1]

    # lane axis: 0-8 = front fin slots, 9-13 = back fin slots
    fin_v = jnp.concatenate(
        [ffin_s.reshape(nb, grid, 9, 5, msub, lanes_n),
         bfin_s.reshape(nb, grid, 5, 5, msub, lanes_n)], axis=2)
    acc_v = jnp.concatenate(
        [facc_s.reshape(nb, grid, 9, 10, msub, lanes_n),
         bacc_s.reshape(nb, grid, 5, 10, msub, lanes_n)], axis=2)

    # row slices on the size-5/10 axis are whole-(8,128)-tile strides —
    # cheap, unlike a transpose of the tiled layout (measured 27 ms)
    def frow(i):
        return fin_v[:, :, :, i]              # [nb, G, 14, m, 128]

    def arow(i):
        return acc_v[:, :, :, i]

    inv_n = jnp.float32(1.0 / n)
    mets, ema_in = _an._lane_stateless(
        frow(0), frow(1), frow(2), frow(3), frow(4),
        arow(0), arow(1), arow(4), arow(5), arow(2), arow(3), arow(6),
        arow(4), arow(7), jnp.sqrt(arow(8) * inv_n),
        jnp.sqrt(arow(9) * inv_n), n, sr)
    # every leaf: [nb, G, 14, m, 128]

    pre_idx = (0, 2, 4, 6, 8, 10, 12)
    post_idx = (1, 3, 5, 7, 9, 11, 13)

    def interleave(v):
        # [nb, G, 14, m, 128] -> [2nb, G, 7, m, 128], step 2b = pre(b)
        pre = v[:, :, pre_idx, :, :]
        post = v[:, :, post_idx, :, :]
        return jnp.stack([pre, post], axis=1).reshape(
            2 * nb, grid, 7, msub, lanes_n)

    ema_seq = jax.tree.map(interleave, ema_in)

    def ema_tiles(key):
        return jnp.stack([sk.mono_to_tiles([jnp.broadcast_to(
            jnp.asarray(an0[i][key], jnp.float32), (bsz,))])
            for i in range(7)], axis=1)          # [G, 7, m, 128]

    rep0, fat0 = ema_tiles("repetition_ema"), ema_tiles("fatigue_ema")

    # Both EMAs are contractive one-poles (coeff 0.08 / 0.06) — the class
    # this codebase reassociates throughout (README design rule #1) — so
    # the 2*nb-step chains run as O(log) associative prefix scans instead
    # of a serial lax.scan (whose ~0.15 ms/step loop overhead dominated).
    # fatigue depends on repetition_density of the SAME step, so the
    # repetition chain resolves first. Residual vs the serial order is
    # ~1e-6 (same bound as the analyzer's associative band splits).
    def ema_chain(coeff, x, e0):
        # e_j = (1-coeff)*e_{j-1} + coeff*x_j, prefix over axis 0
        def comb(l, r):
            al, bl = l
            ar, br = r
            return al * ar, br + ar * bl
        a = jnp.full_like(x, jnp.float32(1.0 - coeff))
        aa, bb = jax.lax.associative_scan(
            comb, (a, jnp.float32(coeff) * x), axis=0)
        return bb + aa * e0[None]

    rep = ema_chain(0.08, ema_seq["onset_rate"], rep0)
    density = jlimit(0.0, 1.0, rep / jnp.float32(12.0))
    instant = jlimit(0.0, 1.0, jnp.float32(0.35) * ema_seq["crest_penalty"]
                     + jnp.float32(0.35) * ema_seq["harsh_penalty"]
                     + jnp.float32(0.30) * density)
    fat = ema_chain(0.06, instant, fat0)
    risk = jlimit(0.0, 1.0, fat)
    rep_f, fat_f = rep[-1], fat[-1]

    def to_b(v):                                 # [nb, G, m, 128] -> [nb, B]
        return v.reshape(nb, bsz)

    cf_s = to_b(cms[:, :, 5 * msub:6 * msub, :])

    new_an, metrics_list = [], []
    for i, plug in enumerate(chain.plugins):
        pre_m = {k: to_b(v[:, :, pre_idx[i]]) for k, v in mets.items()}
        post_m = {k: to_b(v[:, :, post_idx[i]]) for k, v in mets.items()}
        pre_m["repetition_density"] = to_b(density[0::2, :, i])
        pre_m["fatigue_risk"] = to_b(risk[0::2, :, i])
        post_m["repetition_density"] = to_b(density[1::2, :, i])
        post_m["fatigue_risk"] = to_b(risk[1::2, :, i])
        finalize = plug.defn.finalize_metrics or _default_finalize
        carry = {"context_fit": cf_s} if i == 5 else None
        if params_list is None:
            fparams = plug.full_params(chain.params[i])
        else:
            # automated leaves are [nb]; lift to [nb, 1] so the finalize
            # formulas broadcast against the [nb, B] metric leaves
            fparams = {k: (v[:, None] if jnp.ndim(v) == 1 else v)
                       for k, v in params_list[i].items()}
        metrics_list.append(finalize(fparams, pre_m, post_m, carry))
        last = fin_v[-1, :, post_idx[i]]         # [G, 5, m, 128]
        new_an.append({
            "short_env": last[:, 0].reshape(bsz),
            "long_env": last[:, 1].reshape(bsz),
            "low_state": last[:, 2].reshape(bsz),
            "high_state": last[:, 3].reshape(bsz),
            "onset_cooldown": last[:, 4].reshape(bsz).astype(
                jnp.asarray(an0[i]["onset_cooldown"]).dtype),
            "repetition_ema": rep_f[:, i].reshape(bsz),
            "fatigue_ema": fat_f[:, i].reshape(bsz),
        })
    return new_an, metrics_list


def chain_kernel_step(chain, states: Sequence[Dict[str, Any]],
                      block: jnp.ndarray, unroll: int = 16,
                      interpret: bool = False, layout: str = "bct",
                      params_rows=None):
    """One block [B, C, N] through the whole 7-plugin chain on the kernel
    path. Same contract as runtime.chain_fused.fused_chain_step with
    metrics="blocks": returns (out, new_states, metrics_list).

    `layout="tiles"`: the block arrives (and the render returns) in the
    kernel's stream-tile layout [G, N*C*MSUB, 128] (stage_kernels
    .to_stream) — the serving-tick analog of chain_kernel_stream's tile
    corpora: a bridge that assembles its batch in tile layout skips the
    per-tick device transposes.

    `params_rows`: PER-STREAM parameters at kernel speed — one dict per
    stage with [B]-stacked traced-param leaves (StreamServer._params
    shape; scalar leaves broadcast). Every pvec entry becomes a per-clip
    (MSUB, 128) tile read inside the kernels, so per-track knobs cost the
    same VPU ops as shared ones (each reference instance reads its own
    APVTS atomics, JuicyPunch/PluginProcessor.cpp:74-80). Structural
    entries must stay uniform — callers keep edits listed by
    `rows_ineligible_params(chain)` off this path (StreamServer falls
    back to the vmapped fused executor for those)."""
    mode = _check_chain(chain)
    block = jnp.asarray(block, jnp.float32)
    c = chain.channels
    n = chain.block_size
    if layout == "tiles":
        if (block.ndim != 3 or block.shape[2] != sk.LANES
                or block.shape[1] != n * c * sk.MSUB):
            raise ChainKernelUnsupported(
                f"layout='tiles' needs [G, {n * c * sk.MSUB}, {sk.LANES}] "
                f"stream tiles, got {block.shape}")
        bsz = block.shape[0] * sk.TILE
    elif layout == "bct":
        if block.ndim != 3:
            raise ChainKernelUnsupported(
                f"chain kernel needs a single [B, C, N] batch axis, got "
                f"shape {block.shape}")
        bsz, c, n = block.shape
        if bsz % sk.TILE:
            raise ChainKernelUnsupported(
                f"batch {bsz} must be a multiple of {sk.TILE}")
    else:
        raise ValueError(f"unknown layout {layout!r} (bct | tiles)")
    if n % unroll:
        raise ChainKernelUnsupported(f"block {n} not divisible by "
                                     f"unroll {unroll}")
    sr = chain.sr
    states = list(states)

    rows = params_rows is not None
    if rows and mode == sk.TEX_WAVE_ROWS:
        raise ChainKernelUnsupported(
            "per-stream parameter rows are unsupported on a MERGED wave "
            "launch (texture knobs are structural in wave modes)")
    fpack, bpack, mcall, funpack, bunpack = _mono_machinery(
        chain, states, mode, bsz, unroll, interpret, rows=rows)
    an_states = [states[i]["analyzer"] for i in range(7)]

    if rows:
        frows, brows, full_b = _pvec_row_tiles(chain, states, mode, bsz,
                                               params_rows)
    else:
        frows = brows = full_b = None
    ftiles = fpack(states)
    btiles = bpack(states)
    ffin0, bfin0 = _lane_seed_tiles(an_states, bsz)
    x_t = block if layout == "tiles" else sk.to_stream(block)
    (out_t, ftiles, btiles, cmono_full, ffin, facc, bfin,
     bacc) = mcall(x_t, ftiles, btiles, ffin0, bfin0,
                   frows=frows, brows=brows)

    front_dsp = funpack(ftiles, states)
    width_dsp, co_dsp = bunpack(btiles, cmono_full)
    dsp_list = [front_dsp["punch"], front_dsp["saturator"],
                front_dsp["texture"], front_dsp["motion"],
                width_dsp, co_dsp, states[6]["dsp"]]
    new_an, metrics_list = _finalize_block(
        chain, an_states, ffin, facc, bfin, bacc, co_dsp["context_fit"],
        bsz, n, sr, params_list=full_b)
    new_states = [{"analyzer": a, "dsp": d}
                  for a, d in zip(new_an, dsp_list)]
    out = out_t if layout == "tiles" else sk.from_stream(out_t, bsz, c)
    return out, new_states, metrics_list


def chain_kernel_stream(chain, states, clips, metrics: str = "blocks",
                        unroll: int = 16, interpret: bool = False,
                        automation=None, return_audio: bool = True,
                        layout: str = "bct"):
    """Stream a [B, C, T] corpus through the kernel chain block-major,
    entirely in kernel-tile layout (states and audio repack exactly once).
    Same contract as runtime.chain_fused.fused_chain_stream.

    `layout="tiles"` takes `clips` already in the kernel-tile layout
    [nb, G, N*C*MSUB, 128] (see corpus_to_tiles) and returns the audio in
    the same layout: the device-side corpus transposes — the largest
    non-loop cost of the kernel path (~45 ms of a 234 ms wall at B=8192,
    BASELINE.md) — are skipped entirely. The native loader writes this
    layout straight from the WAV decode (native.load_corpus_tiles), so a
    scoring/serving pipeline never pays them.

    `automation`: optional {stage index: {param: curve}} with one value
    per block ([nb] arrays) — the host-automation analog (the reference's
    APVTS writes land between processBlocks). Every parameter rides the
    kernels' per-block parameter row, so automation runs at full kernel
    speed; only texture's `material` is structural (it selects the
    compiled code path) and raises ChainKernelUnsupported.

    `return_audio=False` is the scoring-only mode (the JuicyInfer batch
    use case — score a corpus, keep the meters, drop the render): the
    per-block output tiles are not stacked across the scan and the
    corpus-sized inverse layout transpose is skipped entirely, so the
    only full-corpus HBM traffic is the input read. Returns None for
    `out`."""
    mode = _check_chain(chain)
    clips = jnp.asarray(clips, jnp.float32)
    n = chain.block_size
    sr = chain.sr
    c = chain.channels
    if layout == "tiles":
        if clips.ndim != 4:
            raise ChainKernelUnsupported(
                "layout='tiles' needs [nb, G, N*C*MSUB, 128] tiles, got "
                f"{clips.shape}")
        nb, grid, rows, lanes = clips.shape
        if lanes != sk.LANES or rows != n * c * sk.MSUB:
            raise ChainKernelUnsupported(
                f"tile shape {clips.shape} != [nb, G, "
                f"{n * c * sk.MSUB}, {sk.LANES}] for block {n}, "
                f"{c} channels")
        bsz, t = grid * sk.TILE, nb * n
    elif layout == "bct":
        if clips.ndim != 3:
            raise ChainKernelUnsupported(
                f"chain kernel needs [B, C, T] clips, got {clips.shape}")
        bsz, c, t = clips.shape
        if t % n:
            raise ValueError(
                f"clip length {t} not divisible by block size {n}")
        if bsz % sk.TILE:
            raise ChainKernelUnsupported(
                f"batch {bsz} must be a multiple of {sk.TILE}")
        nb = t // n
    else:
        raise ValueError(f"unknown layout {layout!r} (bct | tiles)")
    if n % unroll:
        raise ChainKernelUnsupported(f"block {n} not divisible by "
                                     f"unroll {unroll}")
    states = list(states)

    fpack, bpack, mcall, funpack, bunpack = _mono_machinery(
        chain, states, mode, bsz, unroll, interpret)

    # ONE layout pass over the whole corpus (or zero, when the caller
    # already holds kernel-tile data): [B, C, T] -> [nb, G, rows, 128]
    x_tiles = clips if layout == "tiles" else corpus_to_tiles(clips, n)

    an0 = [states[i]["analyzer"] for i in range(7)]
    ffin0, bfin0 = _lane_seed_tiles(an0, bsz)
    carry0 = (fpack(states), bpack(states), ffin0, bfin0)

    pvec_rows = None
    if automation:
        if 2 in automation and "material" in automation[2]:
            raise ChainKernelUnsupported(
                "texture material is structural (selects the compiled "
                "code path) and cannot be automated on the kernel path")
        if mode == sk.TEX_WAVE_ROWS:
            raise ChainKernelUnsupported(
                "per-block automation is unsupported on a MERGED wave "
                "launch (the per-grid-row pvec already occupies the "
                "parameter row) — run wave materials as separate "
                "single-material groups to automate them")
        full = [dict(p.full_params(pr))
                for p, pr in zip(chain.plugins, chain.params)]
        for i, curves in automation.items():
            for k, v in curves.items():
                if k not in full[int(i)]:
                    raise KeyError(
                        f"stage {i} has no parameter {k!r} to automate")
                v = jnp.asarray(v, jnp.float32)
                if v.shape != (nb,):
                    raise ValueError(
                        f"automation curve for stage {i}:{k} must have "
                        f"one value per block, shape ({nb},), got "
                        f"{v.shape}")
                full[int(i)][k] = v
        full_b = [{k: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (nb,))
                   for k, v in st.items()} for st in full]
        pvec_rows = (
            jax.vmap(lambda pr: _front_pvec(pr, states, sr, mode))(full_b),
            jax.vmap(lambda pr: _back_pvec(pr, sr, n))(full_b))

    # The audio scan is kernel-only: lane state threads block-to-block
    # through the fin tiles themselves, raw fin/acc stack per block, and
    # ALL score formulas run afterwards in one nb-parallel pass
    # (_finalize_stream) — no per-block XLA work in the hot loop.
    def body(carry, xs):
        ftiles, btiles, pffin, pbfin = carry
        if pvec_rows is None:
            x_t, fpv, bpv = xs, None, None
        else:
            x_t, fpv, bpv = xs
        (out_t, ftiles, btiles, cmono_full, ffin, facc, bfin,
         bacc) = mcall(x_t, ftiles, btiles, pffin, pbfin, fpv, bpv)
        ys = (ffin, facc, bfin, bacc, cmono_full)
        return ((ftiles, btiles, ffin, bfin),
                (out_t,) + ys if return_audio else ys)

    xs = x_tiles if pvec_rows is None else (x_tiles, *pvec_rows)
    carry, ys = jax.lax.scan(body, carry0, xs)
    if return_audio:
        out_tiles, ffin_s, facc_s, bfin_s, bacc_s, cms = ys
    else:
        ffin_s, facc_s, bfin_s, bacc_s, cms = ys
    ftiles, btiles, _ffin_l, _bfin_l = carry
    cmono_full = jax.tree.map(lambda v: v[-1], cms)

    an_f, ms = _finalize_stream(chain, an0, ffin_s, facc_s, bfin_s, bacc_s,
                                cms, bsz, n, sr,
                                params_list=(full if automation else None))
    if metrics == "final":
        ms = jax.tree.map(lambda v: v[-1], ms)
    elif metrics == "none":
        ms = None

    front_dsp = funpack(ftiles, states)
    width_dsp, co_dsp = bunpack(btiles, cmono_full)
    dsp_list = [front_dsp["punch"], front_dsp["saturator"],
                front_dsp["texture"], front_dsp["motion"],
                width_dsp, co_dsp, states[6]["dsp"]]
    new_states = [{"analyzer": a, "dsp": d}
                  for a, d in zip(an_f, dsp_list)]

    if not return_audio:
        return None, new_states, ms
    # ONE layout pass back (skipped under layout="tiles")
    out = out_tiles if layout == "tiles" else tiles_to_corpus(out_tiles, c)
    return out, new_states, ms
