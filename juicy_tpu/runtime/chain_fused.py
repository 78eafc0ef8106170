"""Block-major fused chain executor.

The reference chain (plugins stacked on one DAW track) runs, per 512-sample
block, 3 sample-rate passes per plugin: pre-analyze → DSP → post-analyze
(e.g. JuicyPunch/PluginProcessor.cpp:82-114). Executed naively that is ~21
sequential sample loops per block for the 7-plugin suite; on TPU each
``lax.scan`` step costs ~0.3-1 µs of loop overhead regardless of body size,
so the loop *count* — not the arithmetic — bounds throughput.

This module fuses the chain into a handful of shared scans per block by
exploiting the dependency structure:

  * DSP passes chain per-sample: stage i+1 at time t needs only stage i's
    output at time t, so punch → saturator → texture → motion-pass-1 all run
    inside ONE scan step (audio flows through the body).
  * A stage's PRE-analyzer consumes the same stream the previous stage
    produces — it rides in the scan that produces that stream.
  * A stage's POST-analyzer must wait for its PRE to finish the whole block
    (one shared analyzer instance per plugin, JuicinessAnalyzer.h:33-43), so
    it rides in any LATER scan — of which the block has several (motion's
    two-pass structure and Cohere's block-level gain computation force scan
    breaks anyway, JuicyMotion/PluginProcessor.cpp:75-142,
    JuicyCohere/PluginProcessor.cpp:62-119).

For the 7-plugin bench chain this schedules 6 scans per block (≈3.5× fewer
sequential steps than stage-major execution), all states carried across
blocks exactly as in Chain.batched_run. Audio semantics are identical to the
per-stage paths (same per-sample body functions, imported from the models);
null-tested against both the stage-major runner and the compiled C++ oracle.

Metrics modes:
  * "blocks" (default): per-block metrics for every stage, like Chain.run.
  * "final": analyzer state advances every block (bit-identical to "blocks")
    but only the LAST block's metrics are returned — avoids materializing
    [nb, ...] metric arrays.
  * "none": analyzers are skipped entirely. ~2x faster; NOT
    reference-faithful (no metrics, analyzer state frozen) — an opt-in fast
    path for render-only workloads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from juicy_tpu import analyzer as _an
from juicy_tpu.models import (cohere as _cohere, infer as _infer,
                              motion as _motion, punch as _punch,
                              saturator as _sat, texture as _texture,
                              width as _width)
from juicy_tpu.runtime.plugin import Chain, _default_finalize


class _Pass:
    """One per-sample body scheduled into a scan.

    step(carry, live) -> (carry', produced) where `live` maps stream name to
    the current sample ([..., C] stereo or [...] mono).
    """

    def __init__(self, init, step, inputs, produces=(), finalize=None):
        self.init = init
        self.step = step
        self.inputs = tuple(inputs)
        self.produces = tuple(produces)
        self.finalize = finalize
        self.result = None


class _Executor:
    """Builds and flushes scans at trace time (the schedule is implicit in
    the stage order + barrier structure)."""

    def __init__(self, n: int, unroll: int = 4):
        self.n = n
        self.unroll = unroll
        self.streams: Dict[str, jnp.ndarray] = {}
        self.pending: List[_Pass] = []
        self.scan_index = 0

    def add_stream(self, name: str, array: jnp.ndarray):
        self.streams[name] = array

    def add_pass(self, p: _Pass):
        self.pending.append(p)

    def stream_ready(self, name: str) -> bool:
        return name in self.streams

    def stream_live(self, name: str) -> bool:
        return any(name in p.produces for p in self.pending)

    def can_attach(self, names) -> bool:
        return all(self.stream_ready(n) or self.stream_live(n) for n in names)

    def flush(self):
        """Execute the pending scan (if any)."""
        passes, self.pending = self.pending, []
        if not passes:
            return
        produced = {n for p in passes for n in p.produces}
        needed = sorted({n for p in passes for n in p.inputs} - produced)
        xs = {name: jnp.moveaxis(self.streams[name], -1, 0) for name in needed}

        def step(carries, xt):
            live = dict(xt)
            new_carries = []
            for p, c in zip(passes, carries):
                c2, prod = p.step(c, live)
                live.update(prod)
                new_carries.append(c2)
            return tuple(new_carries), {n: live[n] for n in produced}

        finals, ys = jax.lax.scan(step, tuple(p.init for p in passes), xs,
                                  unroll=self.unroll)
        for name in produced:
            self.streams[name] = jnp.moveaxis(ys[name], 0, -1)
        for p, c in zip(passes, finals):
            p.result = c
            if p.finalize is not None:
                p.finalize(c)
        self.scan_index += 1


# --------------------------------------------------------------------------
# Analyzer lanes: one per chain stage; pre rides the scan producing the
# stage's input stream, post rides a later scan.
# --------------------------------------------------------------------------

class _AnalyzerLane:
    def __init__(self, stage_index: int, state: Dict[str, jnp.ndarray],
                 in_stream: str, out_stream: str, channels: int, sr: float,
                 n: int, batch_shape):
        self.in_stream = in_stream
        self.out_stream = out_stream
        self.channels = channels
        self.sr = sr
        self.n = n
        self.batch_shape = batch_shape
        self.state0 = state
        self.body = _an.make_lane_body(sr)
        self.pre_scan: Optional[int] = None
        self.pre_state = None       # analyzer state after the pre pass
        self.pre_metrics = None
        self.post_state = None
        self.post_metrics = None
        self._pre_pass: Optional[_Pass] = None
        self._post_pass: Optional[_Pass] = None

    def _mk_pass(self, stream: str, state: Dict[str, jnp.ndarray]) -> _Pass:
        body, channels = self.body, self.channels

        def step(c, live):
            s = live[stream]
            l = s[..., 0]
            r = s[..., 1] if channels > 1 else l
            return body(c, l, r), {}

        return _Pass(_an.lane_init(state, self.batch_shape), step, (stream,))

    def try_attach_pre(self, ex: _Executor, stats_cache) -> bool:
        if self._pre_pass is not None:
            return True
        if not ex.can_attach([self.in_stream]):
            return False
        self._pre_pass = self._mk_pass(self.in_stream, self.state0)
        lane = self

        def fin(c):
            stats = stats_cache(lane.in_stream)
            lane.pre_state, lane.pre_metrics = _an.lane_finalize(
                c, lane.state0, stats, lane.n, lane.sr)

        self._pre_pass.finalize = fin
        self.pre_scan = ex.scan_index
        ex.add_pass(self._pre_pass)
        return True

    def try_attach_post(self, ex: _Executor, stats_cache) -> bool:
        if self._post_pass is not None:
            return True
        # post must start strictly after the pre pass's scan has flushed
        if self.pre_state is None or not ex.can_attach([self.out_stream]):
            return False
        self._post_pass = self._mk_pass(self.out_stream, self.pre_state)
        lane = self

        def fin(c):
            stats = stats_cache(lane.out_stream)
            lane.post_state, lane.post_metrics = _an.lane_finalize(
                c, lane.pre_state, stats, lane.n, lane.sr)

        self._post_pass.finalize = fin
        ex.add_pass(self._post_pass)
        return True


# --------------------------------------------------------------------------
# Per-stage DSP fusers. Each takes (executor, params, dsp_state, in_stream,
# out_stream, channels, sr) and returns a thunk that yields the new dsp state
# after the relevant scans have flushed.
# --------------------------------------------------------------------------

def _fuse_punch(ex, params, state, in_s, out_s, channels, sr):
    fast_c, slow_c = _punch.env_coeffs(sr)
    one = jnp.float32(1.0)

    def step(c, live):
        f, s = c
        d = live[in_s]
        a = jnp.abs(d)
        f = (one - fast_c) * a + fast_c * f
        s = (one - slow_c) * a + slow_c * s
        return (f, s), {out_s: _punch.punch_shape(d, f, s, params)}

    def fin(c):
        pass

    p = _Pass((state["fast_env"], state["slow_env"]), step, (in_s,), (out_s,))
    ex.add_pass(p)

    def new_state():
        return {"fast_env": p.result[0], "slow_env": p.result[1]}
    return new_state


def _fuse_saturator(ex, params, state, in_s, out_s, channels, sr):
    k = _sat.sat_consts(params, sr)
    tone_c = k["tone_coeff"]

    def step(c, live):
        (tone,) = c
        d = live[in_s]
        soft = _sat.sat_pre(d, k)
        tone = tone + tone_c * (soft - tone)   # cpp:93 op order
        return (tone,), {out_s: _sat.sat_post(d, tone, k)}

    p = _Pass((state["tone_state"],), step, (in_s,), (out_s,))
    ex.add_pass(p)
    return lambda: {"tone_state": p.result[0]}


def _fuse_texture(ex, params, state, in_s, out_s, channels, sr):
    mode = _texture.static_material(params)
    n = ex.n
    if jnp.ndim(state["rng"]) == 0:
        white, new_rng = _texture.block_noise(state["rng"], channels, n)
    else:   # batched corpus: one LCG stream per clip
        white, new_rng = jax.vmap(
            lambda r: _texture.block_noise(r, channels, n))(state["rng"])
    L = state["waveguide"].shape[-1]
    if mode is None:
        # TRACED material (Plugin.with_traced("material")): every material
        # substep computed per sample, lane-selected per clip — one jit
        # serves mixed-material batches (each DAW track picks its own
        # material, JuicyTexture/PluginProcessor.cpp:325-337).
        # Group-by-material (parallel/grouping.py) stays the fast path for
        # static corpora.
        consts, extract, mat_step, pack = _texture.traced_block_consts(
            params, sr, L)
    else:
        mode = max(0, min(4, mode))
        consts, extract, mat_step, pack = _texture.block_consts(
            params, sr, mode, L)
    tex_step = _texture.make_sample_step(consts, mat_step)
    white_s = out_s + "_white"
    ex.add_stream(white_s, white)

    def step(c, live):
        c2, out = tex_step(c, (live[in_s], live[white_s]))
        return c2, {out_s: out}

    p = _Pass(_texture.extract_scan_carry(state, extract), step,
              (in_s, white_s), (out_s,))
    ex.add_pass(p)

    def new_state():
        st = _texture.pack_scan_carry(p.result, state, pack)
        st["rng"] = new_rng
        return st
    return new_state


def _fuse_motion(ex, params, state, in_s, out_s, channels, sr):
    micro_var = jnp.asarray(params["microvar"], jnp.float32)
    repeat_ctrl = jnp.asarray(params["repeatctrl"], jnp.float32)
    p1_step = _motion.make_p1_step(micro_var, sr)
    batch = state["env"].shape if hasattr(state["env"], "shape") else ()
    ch1 = min(1, channels - 1)

    def p1_step_live(c, live):
        d = live[in_s]
        mono = jnp.float32(0.5) * (d[..., 0] + d[..., ch1])
        c2, _ = p1_step(c, jnp.abs(mono))
        return c2, {}

    p1 = _Pass(_motion.p1_init(state, batch), p1_step_live, (in_s,))
    ex.add_pass(p1)
    ex.flush()   # barrier: pass 2 needs the block-level repetition values

    env, cooldown, repetition, rng, vt_t, vtr_t, vtl_t = p1.result
    scales = _motion.block_scales(repetition, repeat_ctrl)
    consts = _motion.p2_consts(params, sr)

    # pass 2: channel-serial scans (shared slew/LFO/budget state threaded
    # ch0 -> ch1, the cpp:108-115 quirk)
    shared = (jnp.broadcast_to(state["variation_tone"], batch),
              jnp.broadcast_to(state["variation_transient"], batch),
              jnp.broadcast_to(state["variation_tail"], batch),
              jnp.broadcast_to(state["motion_phase"], batch))
    be = jnp.broadcast_to(state["budget_env"], batch)
    ch_passes = []
    for ch in range(channels):
        off = jnp.float32(0.0) if ch == 0 else jnp.float32(0.85)
        step_fn = _motion.make_p2_step(consts, (vt_t, vtr_t, vtl_t), scales,
                                       off, sr)

        def mk(step_fn=step_fn, ch=ch):
            def step(c, live):
                c2, y = step_fn(c, live[in_s][..., ch])
                return c2, {f"{out_s}_c{ch}": y}
            return step

        init = shared + (state["lp"][..., ch], state["tail"][..., ch],
                         state["prev"][..., ch], be)
        p = _Pass(init, mk(), (in_s,), (f"{out_s}_c{ch}",))
        ex.add_pass(p)
        ex.flush()   # channel-serial: ch1's shared state starts from ch0's
        vt, vtr, vtl, phase, lp_c, tail_c, prev_c, be = p.result
        shared = (vt, vtr, vtl, phase)
        ch_passes.append(p)

    out = jnp.stack([ex.streams[f"{out_s}_c{ch}"] for ch in range(channels)],
                    axis=-2)
    ex.add_stream(out_s, out)

    def new_state():
        lps, tails, prevs = [], [], []
        for p in ch_passes:
            _, _, _, _, lp_c, tail_c, prev_c, _ = p.result
            lps.append(lp_c)
            tails.append(tail_c)
            prevs.append(prev_c)
        vt, vtr, vtl, phase, _, _, _, be_f = ch_passes[-1].result
        return {
            "env": env, "repetition": repetition, "budget_env": be_f,
            "variation_tone": vt, "variation_transient": vtr,
            "variation_tail": vtl,
            "variation_tone_target": vt_t,
            "variation_transient_target": vtr_t,
            "variation_tail_target": vtl_t,
            "onset_cooldown": cooldown, "rng": rng,
            "tail": jnp.stack(tails, axis=-1),
            "lp": jnp.stack(lps, axis=-1),
            "prev": jnp.stack(prevs, axis=-1),
            "motion_phase": phase,
        }
    return new_state


def _fuse_width(ex, params, state, in_s, out_s, channels, sr):
    """Width is parallel over time (cumsum width shrink + window delay) —
    run it vectorized between scans. Only forces a flush if its input is
    still live in the pending scan."""
    if not ex.stream_ready(in_s):
        ex.flush()
    out, st = _width.process(params, state, ex.streams[in_s], sr)
    ex.add_stream(out_s, out)
    return lambda: st


def _fuse_infer(ex, params, state, in_s, out_s, channels, sr):
    if not ex.stream_ready(in_s):
        ex.flush()
    out, st = _infer.process(params, state, ex.streams[in_s], sr)
    ex.add_stream(out_s, out)
    return lambda: st


def _fuse_cohere(ex, params, state, in_s, out_s, channels, sr):
    a_step = _cohere.make_analysis_step(sr)
    batch = state["analysis_low"].shape if hasattr(state["analysis_low"], "shape") else ()
    ch1 = min(1, channels - 1)
    z = jnp.zeros(batch, jnp.float32)

    def a_step_live(c, live):
        d = live[in_s]
        mono = jnp.float32(0.5) * (d[..., 0] + d[..., ch1])
        c2, _ = a_step(c, mono)
        return c2, {}

    pa = _Pass((jnp.broadcast_to(state["analysis_low"], batch),
                jnp.broadcast_to(state["analysis_high"], batch), z, z, z),
               a_step_live, (in_s,))
    ex.add_pass(pa)
    ex.flush()   # barrier: render needs the block-level band gains

    a_low, a_high, low_e, mid_e, high_e = pa.result
    inv_n = jnp.float32(1.0 / max(1, ex.n))
    targets, context_fit, comps, fb = _cohere.block_gains(
        state, low_e * inv_n, mid_e * inv_n, high_e * inv_n, params)
    tail_amt = jnp.asarray(params["tail"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    from juicy_tpu.utils.convert import db_to_gain
    out_gain = db_to_gain(params["output"])

    def bb(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None]

    r_step = _cohere.make_render_step(sr, comps, fb, tail_amt, bb)

    def render_live(c, live):
        d = live[in_s]
        c2, wet = r_step(c, d)
        y = (d + bb(mix) * (wet - d)) * bb(out_gain)
        return c2, {out_s: y}

    zero_c = jnp.zeros(batch + (channels,), jnp.float32)
    pr = _Pass((zero_c, zero_c, state["tail"]), render_live, (in_s,), (out_s,))
    ex.add_pass(pr)

    def new_state():
        t_low, t_mid, t_high = targets
        return {
            "target_low": t_low, "target_mid": t_mid, "target_high": t_high,
            "analysis_low": a_low, "analysis_high": a_high,
            "tail": pr.result[2], "context_fit": context_fit,
        }
    return new_state


_FUSERS = {
    "punch": _fuse_punch,
    "saturator": _fuse_saturator,
    "texture": _fuse_texture,
    "motion": _fuse_motion,
    "width": _fuse_width,
    "infer": _fuse_infer,
    "cohere": _fuse_cohere,
}


def fused_chain_step(chain: Chain, states: Sequence[Dict[str, Any]],
                     block: jnp.ndarray, metrics: str = "blocks",
                     unroll: Optional[int] = None, params: Sequence = None):
    """One block [..., C, N] through the whole chain with fused scans.

    Returns (out [..., C, N], new_states, metrics_list) — same contract as
    running Chain.step (pre-analyze → DSP → post-analyze per stage).

    `params` overrides chain.params (same per-stage structure) — e.g. a
    vmapped caller passing per-stream parameter rows (runtime/serve.py).
    """
    block = jnp.asarray(block, jnp.float32)
    channels = chain.channels
    n = block.shape[-1]
    batch_shape = block.shape[:-2]
    sr = chain.sr
    if params is None:
        params = chain.params

    from juicy_tpu.ops.scan_utils import default_unroll
    ex = _Executor(n, unroll=default_unroll(4) if unroll is None else unroll)
    ex.add_stream("x0", block)

    lanes: List[Optional[_AnalyzerLane]] = []
    stats_memo: Dict[str, Dict[str, jnp.ndarray]] = {}

    def stats_cache(name):
        if name not in stats_memo:
            stats_memo[name] = _an.stream_stats(ex.streams[name], channels)
        return stats_memo[name]

    def attach_lanes():
        for lane in lanes:
            if lane is not None:
                lane.try_attach_pre(ex, stats_cache)
                lane.try_attach_post(ex, stats_cache)

    orig_flush = ex.flush

    def flush_with_lanes():
        orig_flush()
        attach_lanes()
    ex.flush = flush_with_lanes

    state_thunks = []
    for i, (plug, stage_params) in enumerate(zip(chain.plugins, params)):
        in_s, out_s = f"x{i}", f"x{i + 1}"
        p = plug.full_params(stage_params)
        st = states[i]
        if metrics != "none":
            lane = _AnalyzerLane(i, st["analyzer"], in_s, out_s, channels,
                                 sr, n, batch_shape)
            lanes.append(lane)
            lane.try_attach_pre(ex, stats_cache)
        else:
            lanes.append(None)
        fuser = _FUSERS.get(plug.defn.name)
        if fuser is None:
            # fallback for custom-registered processors without a fuser:
            # rank-agnostic like the fused paths — one vmap per leading
            # batch dimension (param-sweep axes etc. compose)
            ex.flush()
            proc = lambda s, b: plug.defn.process(p, s, b, sr)
            for _ in batch_shape:
                proc = jax.vmap(proc, in_axes=(0, 0))
            out, new_dsp = proc(st["dsp"], ex.streams[in_s])
            ex.add_stream(out_s, out)
            state_thunks.append(lambda new_dsp=new_dsp: new_dsp)
        else:
            state_thunks.append(fuser(ex, p, st["dsp"], in_s, out_s,
                                      channels, sr))
        attach_lanes()

    ex.flush()
    # trailing scans for any posts that could not ride an existing scan
    for _ in range(4):
        if all(lane is None or lane.post_metrics is not None for lane in lanes):
            break
        attach_lanes()
        ex.flush()

    out = ex.streams[f"x{len(chain.plugins)}"]
    new_states, metric_list = [], []
    for i, (plug, lane) in enumerate(zip(chain.plugins, lanes)):
        dsp_state = state_thunks[i]()
        if lane is None:
            new_states.append({"analyzer": states[i]["analyzer"],
                               "dsp": dsp_state})
            metric_list.append(None)
        else:
            assert lane.post_metrics is not None, "post lane never scheduled"
            new_states.append({"analyzer": lane.post_state, "dsp": dsp_state})
            finalize = plug.defn.finalize_metrics or _default_finalize
            metric_list.append(finalize(plug.full_params(params[i]),
                                        lane.pre_metrics, lane.post_metrics,
                                        dsp_state))
    return out, new_states, metric_list


def fused_chain_stream(chain: Chain, states, clips, metrics: str = "blocks",
                       unroll: Optional[int] = 4, params: Sequence = None,
                       return_audio: bool = True, automation=None):
    """Stream a [..., C, T] corpus through the fused chain block-major.

    One outer scan over blocks; all stage states ride the carry, so the
    corpus audio makes exactly one HBM round trip (vs one per stage for
    Chain.batched_run). Returns (out, states, metrics_list) shaped like
    Chain.batched_run (metrics leaves [nb, ...], or final-block only for
    metrics="final", or None for "none").

    `return_audio=False` (scoring-only mode): per-block outputs are not
    stacked across the scan, so the processed corpus is never written
    back to HBM — `out` is returned as None.

    `automation`: optional {stage index: {param: curve}} with one value
    per block ([nb] arrays) — same contract as chain_kernel_stream's
    automation. The per-block param rows ride the scan's xs, so
    NON-CANONICAL chains (mono, reordered, traced/mixed materials) get
    host-automation too, not just the kernel executor
    (the reference host can automate any instance,
    JuicyPunch/PluginProcessor.cpp:74-80). Mutually exclusive with
    `params`.
    """
    clips = jnp.asarray(clips, jnp.float32)
    t = clips.shape[-1]
    n = chain.block_size
    if t % n:
        raise ValueError(f"clip length {t} not divisible by block size {n}")
    nb = t // n
    blocks = jnp.moveaxis(clips.reshape(clips.shape[:-1] + (nb, n)), -2, 0)

    params_b = None
    if automation:
        if params is not None:
            raise ValueError("pass either params or automation, not both")
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
        params_b = [{k: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (nb,))
                     for k, v in st.items()} for st in full]

    def step(sts, xs, m):
        if params_b is None:
            blk, pr = xs, params
        else:
            blk, pr = xs
        return fused_chain_step(chain, sts, blk, metrics=m, unroll=unroll,
                                params=pr)

    xs = blocks if params_b is None else (blocks, params_b)

    if metrics == "blocks":
        def scan_step(sts, x):
            out, sts, m = step(sts, x, metrics)
            return sts, ((out, m) if return_audio else m)
        states, ys = jax.lax.scan(scan_step, states, xs)
        outs, ms = ys if return_audio else (None, ys)
    elif metrics == "final":
        # Analyzer state advances every block exactly as in "blocks" mode;
        # only the last block's metrics survive (threaded through the carry,
        # seeded by running block 0 outside the scan).
        xs0 = jax.tree.map(lambda v: v[0], xs)
        xs_rest = jax.tree.map(lambda v: v[1:], xs)
        out0, states, m0 = step(states, xs0, "blocks")

        def scan_step(carry, x):
            sts, _ = carry
            out, sts, m = step(sts, x, "blocks")
            return (sts, m), (out if return_audio else ())
        (states, ms), outs_rest = jax.lax.scan(scan_step, (states, m0),
                                               xs_rest)
        outs = (jnp.concatenate([out0[None], outs_rest], axis=0)
                if return_audio else None)
    else:   # "none"
        def scan_step(sts, x):
            out, sts, _ = step(sts, x, "none")
            return sts, (out if return_audio else ())
        states, outs = jax.lax.scan(scan_step, states, xs)
        if not return_audio:
            outs = None
        ms = None
    if not return_audio:
        return None, states, ms
    out = jnp.moveaxis(outs, 0, -2)          # [..., C, nb, n]
    out = out.reshape(clips.shape)
    return out, states, ms
