"""JuicyCohere — spectral context-fit matcher.

Capability rebuild of reference src/plugins/JuicyCohere/PluginProcessor.cpp.
Per block: mono 3-band energy analysis with persistent one-poles at 220/2400 Hz
(cpp:16-17,62-76); learn mode EMA targets with α=0.02/block (cpp:78-84);
context-fit readout ``100 − meanAbsDbError·10`` (cpp:86-92); per-band
compensation gains ``clamp(pow(target/energy, 0.25·match), 0.5..1.8)``
(cpp:94-96); then a per-channel re-split + recombine with those gains and a
tail feedback ``tail = matched + tail·decay`` (cpp:99-118).

Reproduced quirk: the per-channel split filters lpA/lpB are zero-reinitialized
every block (cpp:103-104) while the analysis filters persist.

TPU design: two fused batched scans (mono analysis; per-channel render) with
tiny carries and the exact serial op/summation order of the C++ — at corpus
batch sizes a batched sequential scan outruns stacked associative passes and
nulls bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from juicy_tpu.models import base
from juicy_tpu.ops.precise import pow32
from juicy_tpu.ops.scan_utils import default_unroll
from juicy_tpu.utils.convert import db_to_gain, gain_to_db, jlimit, onepole_coeff

PARAMS = (
    base.ParamSpec("match", "Spectral Match", 0.0, 1.0, 0.65),
    base.ParamSpec("learn", "Learn Target", 0.0, 1.0, 0.0, boolean=True),
    base.ParamSpec("tail", "Tail Coherence", 0.0, 1.0, 0.45),
    base.ParamSpec("decay", "Tail Decay", 0.1, 0.95, 0.65),
    base.mix_param(1.0),
    base.output_param(-18.0, 18.0, 0.0),
    base.ParamSpec("contextfit", "Context Fit", 0.0, 100.0, 0.0, readonly=True),
    base.juiciness_param(),
)

PRESETS = ()  # the reference declares no presets for Cohere


def init(sr: float, channels: int):
    """Persistent: learned band targets (0.2 defaults, PluginProcessor.h:55-57),
    analysis one-poles, per-channel tails, and the last context-fit readout."""
    del sr
    return {
        "target_low": jnp.float32(0.2),
        "target_mid": jnp.float32(0.2),
        "target_high": jnp.float32(0.2),
        "analysis_low": jnp.float32(0.0),
        "analysis_high": jnp.float32(0.0),
        "tail": jnp.zeros((channels,), jnp.float32),
        "context_fit": jnp.float32(0.0),
    }


def make_analysis_step(sr):
    """Per-sample mono 3-band analysis body (cpp:62-76). Carry =
    (low_state, high_state, low_e, mid_e, high_e) with the exact serial
    op/summation order of the C++ loop. Shared by :func:`process` and the
    fused chain executor (runtime/chain_fused.py)."""
    low_coeff = onepole_coeff(220.0, sr)
    high_coeff = onepole_coeff(2400.0, sr)

    def step(c, m):
        lo, hi, le, me, he = c
        lo = lo + low_coeff * (m - lo)
        hi = hi + high_coeff * (m - hi)
        low_v = lo
        high_v = m - hi
        mid_v = m - low_v - high_v
        return (lo, hi, le + low_v * low_v, me + mid_v * mid_v,
                he + high_v * high_v), None

    return step


def block_gains(carry, low_e, mid_e, high_e, params):
    """Block-level learn EMA + context fit + per-band compensation gains
    (cpp:78-96). Returns (targets', context_fit, (low/mid/high comp), fb)."""
    match_amt = jnp.asarray(params["match"], jnp.float32)
    learn = jnp.asarray(params["learn"], jnp.float32) > jnp.float32(0.5)
    decay = jnp.asarray(params["decay"], jnp.float32)
    eps = jnp.float32(1.0e-6)
    a = jnp.float32(0.02)
    t_low = jnp.where(learn, carry["target_low"] + (low_e - carry["target_low"]) * a,
                      carry["target_low"])
    t_mid = jnp.where(learn, carry["target_mid"] + (mid_e - carry["target_mid"]) * a,
                      carry["target_mid"])
    t_high = jnp.where(learn, carry["target_high"] + (high_e - carry["target_high"]) * a,
                       carry["target_high"])

    low_err = jnp.abs(gain_to_db((low_e + eps) / (t_low + eps)))
    mid_err = jnp.abs(gain_to_db((mid_e + eps) / (t_mid + eps)))
    high_err = jnp.abs(gain_to_db((high_e + eps) / (t_high + eps)))
    deviation = (low_err + mid_err + high_err) / jnp.float32(3.0)
    context_fit = jlimit(0.0, 100.0, jnp.float32(100.0) - deviation * jnp.float32(10.0))

    expo = jnp.float32(0.25) * match_amt
    low_comp = jlimit(0.5, 1.8, pow32((t_low + eps) / (low_e + eps), expo))
    mid_comp = jlimit(0.5, 1.8, pow32((t_mid + eps) / (mid_e + eps), expo))
    high_comp = jlimit(0.5, 1.8, pow32((t_high + eps) / (high_e + eps), expo))
    fb = jlimit(0.0, 0.93, decay)
    return (t_low, t_mid, t_high), context_fit, (low_comp, mid_comp, high_comp), fb


def make_render_step(sr, comps, fb, tail_amt, bcast):
    """Per-sample per-channel render body (cpp:99-118). Carry =
    (lp_a, lp_b, tail); the split filters start from zero each block (quirk,
    cpp:103-104). `bcast` adapts block-level arrays to the carry rank."""
    low_coeff = onepole_coeff(220.0, sr)
    high_coeff = onepole_coeff(2400.0, sr)
    low_comp, mid_comp, high_comp = comps

    def step(c, d):
        lp_a, lp_b, tail = c
        lp_a = lp_a + low_coeff * (d - lp_a)
        lp_b = lp_b + high_coeff * (d - lp_b)
        low_v = lp_a * bcast(low_comp)
        high_v = (d - lp_b) * bcast(high_comp)
        mid_v = (d - lp_a - (d - lp_b)) * bcast(mid_comp)
        matched = low_v + mid_v + high_v
        tail = matched + tail * bcast(fb)
        wet = matched + bcast(tail_amt) * jnp.float32(0.35) * tail
        return (lp_a, lp_b, tail), wet

    return step


def process(params, carry, block, sr: float):
    block = jnp.asarray(block, jnp.float32)
    channels = block.shape[-2]
    n = block.shape[-1]

    tail_amt = jnp.asarray(params["tail"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    out_gain = db_to_gain(params["output"])

    # --- block-level mono 3-band analysis (cpp:62-76), persistent filters.
    # One fused scan: filter states AND energy accumulators in the carry —
    # the exact serial op order and summation order of the C++ loop.
    ch1 = min(1, channels - 1)
    mono = jnp.float32(0.5) * (block[..., 0, :] + block[..., ch1, :])
    batch_shape = mono.shape[:-1]

    z = jnp.zeros(batch_shape, jnp.float32)
    (a_low, a_high, low_e, mid_e, high_e), _ = jax.lax.scan(
        make_analysis_step(sr),
        (jnp.broadcast_to(carry["analysis_low"], batch_shape),
         jnp.broadcast_to(carry["analysis_high"], batch_shape), z, z, z),
        jnp.moveaxis(mono, -1, 0), unroll=default_unroll())
    inv_n = jnp.float32(1.0 / max(1, n))
    low_e = low_e * inv_n
    mid_e = mid_e * inv_n
    high_e = high_e * inv_n

    # --- learn EMA + context fit + compensation gains (cpp:78-96) ---
    (t_low, t_mid, t_high), context_fit, comps, fb = block_gains(
        carry, low_e, mid_e, high_e, params)

    # --- per-channel render (cpp:99-118) ---
    def bb(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None]

    dry = block
    render_batch = block.shape[:-1]          # [..., C]
    zero_c = jnp.zeros(render_batch, jnp.float32)
    render_step = make_render_step(sr, comps, fb, tail_amt, bb)

    (_, _, tail_f), wet_t = jax.lax.scan(
        render_step,
        (zero_c, zero_c, jnp.broadcast_to(carry["tail"], render_batch)),
        jnp.moveaxis(dry, -1, 0), unroll=default_unroll())
    wet = jnp.moveaxis(wet_t, 0, -1)

    def bbn(v):
        v = jnp.asarray(v, jnp.float32)
        return v if v.ndim == 0 else v[..., None, None]

    out = (dry + bbn(mix) * (wet - dry)) * bbn(out_gain)

    new_carry = {
        "target_low": t_low,
        "target_mid": t_mid,
        "target_high": t_high,
        "analysis_low": a_low,
        "analysis_high": a_high,
        "tail": tail_f,
        "context_fit": context_fit,
    }
    return out, new_carry


def finalize_metrics(params, pre, post, carry=None):
    m = dict(post)
    m["pre_score"] = pre["score"]
    m["post_score"] = post["score"]
    if carry is not None:
        m["context_fit"] = carry["context_fit"]
    return m


base.register(base.ProcessorDef(
    name="cohere",
    title="Juicy Cohere",
    code="JCOH",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
    finalize_metrics=finalize_metrics,
))
