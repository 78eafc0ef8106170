"""JuicyTexture — physically-inspired material resonator (the largest DSP).

Capability rebuild of reference src/plugins/JuicyTexture/PluginProcessor.cpp
(426 LoC C++). Signal chain per channel, per sample (cpp:114-277):

  band split 140/2600 Hz → impact/body/trail envelopes (atk 2.5 ms, rel 80 ms)
  → one of 5 material models (Gel mass-spring, Metal inharmonic modal plate,
  Wood waveguide cavity + modes, Plastic tube + modes, Flesh coupled masses
  with cubic nonlinearity) → LCG surface-roughness noise → dynamics scaling →
  tail integrator → wet auto-gain → DC blocker (R=0.995) → peak-protection
  limiter (ceiling 0.88, recovery 0.0028) → clamp ±0.98.

Reproduced quirk: ONE uint32 LCG (seed 0x12345678) is shared across channels
and advanced inside the channel loop, so in stereo channel 0 consumes draws
1..N of the block and channel 1 draws N+1..2N (cpp:239).

TPU decomposition:
  * noise: closed-form LCG jump → the entire block's draws in parallel,
    bit-exact with the serial C++ (ops/noise.py); its highpass pre-filter is
    folded into the fused scan;
  * everything else: ONE channel-vectorized ``lax.scan`` carrying the full
    per-channel state, in the exact serial float32 op order of the C++ inner
    loop. One fused scan (instead of stacked envelope/band/tail/DC/limiter
    passes) both maximizes throughput at corpus batch sizes and keeps the
    high-Q modal inputs bit-exact (reassociation noise would be amplified
    ~Q× past the −80 dBFS null budget — see ops/precise.py).
  * modal pole coefficients evaluate through the drift-pinned exp32/cos32.

`material` selects the compiled code path and must be static; group
heterogeneous batches by material (PARITY.md, known limitations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from juicy_tpu.models import base
from juicy_tpu.ops.noise import lcg_advance, lcg_sequence, white_from_bits
from juicy_tpu.ops.precise import tanh32
from juicy_tpu.utils.convert import db_to_gain, jlimit, jmap, onepole_coeff, tau_coeff

PARAMS = (
    base.ParamSpec("material", "Material", 0.0, 4.0, 0.0,
                   choices=("Gel", "Metal", "Wood", "Plastic", "Flesh-like")),
    base.ParamSpec("tailshape", "Tail Shape", 0.0, 1.0, 0.55),
    base.ParamSpec("damping", "Damping", 0.0, 1.0, 0.5),
    base.ParamSpec("weight", "Low-end Weight", 0.0, 1.0, 0.45),
    base.ParamSpec("texture", "Texture Layer", 0.0, 1.0, 0.5),
    base.mix_param(1.0),
    base.output_param(-18.0, 18.0, -2.0),
    base.juiciness_param(),
)

PRESETS = ()  # single program (PluginProcessor.h:28-32)

RNG_SEED = 0x12345678  # PluginProcessor.h:81
PI = 3.14159265358979323846
MATERIAL_INPUT_TRIM = (1.0, 0.58, 0.62, 0.60, 1.0)   # cpp:117
MATERIAL_TRIM = (1.0, 0.62, 0.54, 0.62, 1.0)          # cpp:167,190,211


def waveguide_size(sr: float) -> int:
    """max(2048, sr·0.08) samples (cpp:18)."""
    return max(2048, int(sr * 0.08))


def init(sr: float, channels: int):
    c = channels
    zc = jnp.zeros((c,), jnp.float32)
    return {
        "tail": zc, "lp": zc, "hp": zc, "env": zc, "wet_env": zc,
        "noise_hp": zc, "dc_in": zc, "dc_out": zc,
        "protect_gain": jnp.ones((c,), jnp.float32),
        "spring_pos": zc, "spring_vel": zc,
        "flesh_pos_a": zc, "flesh_vel_a": zc,
        "flesh_pos_b": zc, "flesh_vel_b": zc,
        "prev_wave": zc,
        "modal_y1": jnp.zeros((c, 4), jnp.float32),
        "modal_y2": jnp.zeros((c, 4), jnp.float32),
        "waveguide": jnp.zeros((c, waveguide_size(sr)), jnp.float32),
        "wave_idx": jnp.zeros((c,), jnp.int32),
        "rng": jnp.uint32(RNG_SEED),
    }


def theta_scale(sr) -> np.float32:
    """2π/sr as one f32 constant, rounded once in numpy (eager, exact bits).

    The modal angle is evaluated as ``theta = f * theta_scale(sr)`` instead
    of ``2π·f/sr``: XLA rewrites division by a compile-time constant into a
    reciprocal multiply when the operands are literals (the scan executor)
    but not when the denominator is a runtime scalar (the Pallas kernel's
    SMEM params), so the two paths rounded theta differently by 1 ulp —
    which the near-unity modal poles amplified to ~−90 dBFS. Baking the
    reciprocal into ONE shared constant makes both paths a single identical
    multiply."""
    return np.float32(np.float32(2.0 * PI) / np.float32(sr))


def _modal_coeffs(freq_hz, t60, sr):
    """2-pole modal resonator coefficients (cpp:77-89).

    Uses the drift-pinned exp32/cos32 (ops/precise.py): pole radius/angle
    ulps otherwise turn into linearly-growing phase drift between backends.
    """
    from juicy_tpu.ops.precise import cos32, exp32
    f = jlimit(20.0, 0.45 * sr, freq_hz)
    t = jnp.maximum(jnp.float32(0.02), t60)
    r = exp32(jnp.float32(np.log(np.float32(0.001))) / (t * jnp.float32(sr)))
    theta = f * theta_scale(sr)
    a1 = jnp.float32(2.0) * r * cos32(theta)
    a2 = -r * r
    return a1, a2


def _modal_bank_step(y1, y2, exc, a1, a2, gains):
    """One step of 4 parallel modal resonators. y1/y2: [..., 4]."""
    y = exc[..., None] * gains + a1 * y1 + a2 * y2
    return y, y1  # (new y1, new y2)


def _serial_mode_sum(y):
    """m0+m1+m2+m3 in the C++'s serial add order (pairwise reassociation
    noise gets amplified by the waveguide feedback loop past −80 dBFS)."""
    return ((y[..., 0] + y[..., 1]) + y[..., 2]) + y[..., 3]


def material_consts(mode: int, p, sr: float, L: int):
    """Numeric constants of the material models (cpp:135-237), exposed so
    the Pallas stage kernel (kernels/stage_kernels.py) and the scan substep
    below share one derivation."""
    texture = p["texture"]
    tail_shape = p["tailshape"]
    damping_amt = p["damping_amt"]
    damping_mul = p["damping_mul"]
    weight = p["weight"]

    if mode == 0:   # Gel (cpp:137-151)
        f0 = jnp.float32(42.0) + texture * jnp.float32(88.0)
        omega = jnp.float32(2.0 * PI) * f0 / jnp.float32(sr)
        return dict(omega=omega, k=omega * omega)

    if mode == 1:   # Metal (cpp:152-169)
        f0 = jnp.float32(320.0) + jnp.float32(140.0) * texture
        metal_damp = jmap(damping_amt, 1.0, 0.55)
        t_scale = jmap(tail_shape, 0.18, 0.72) * damping_mul * metal_damp
        return dict(
            f0=f0,
            ratios=jnp.array([1.00, 2.31, 4.18, 6.87], jnp.float32),
            t60s=jnp.array([0.56, 0.40, 0.26, 0.17], jnp.float32) * t_scale,
            gains=jnp.array([0.34, 0.20, 0.13, 0.09], jnp.float32))

    if mode in (2, 3):   # Wood (cpp:170-192) / Plastic (cpp:193-212)
        if mode == 2:
            cavity_hz = jnp.float32(92.0) + jnp.float32(95.0) * (
                jnp.float32(0.5) * weight + jnp.float32(0.5) * texture)
            delay_samp = jlimit(16.0, float(L - 2), jnp.float32(sr) / cavity_hz)
            damp = jmap(tail_shape, 0.26, 0.90) * jmap(damping_amt, 1.0, 0.72)
            wg_mix = (jnp.float32(0.62), jnp.float32(0.38))
            exc_scale = (jnp.float32(0.10), jnp.float32(0.34))
            body_damp = jmap(damping_amt, 1.0, 0.64)
            t_scale = jmap(tail_shape, 0.18, 0.62) * damping_mul * body_damp
            freqs = jnp.array([155.0, 355.0, 690.0, 1130.0], jnp.float32)
            t60s = jnp.array([0.40, 0.27, 0.16, 0.10], jnp.float32) * t_scale
            gains = jnp.array([0.32, 0.18, 0.10, 0.06], jnp.float32)
            out_mix = (jnp.float32(0.56), jnp.float32(0.24), jnp.float32(0.30),
                       jnp.float32(0.74), jnp.float32(0.08))
            exc_in_scale = None
        else:
            tube_hz = jnp.float32(210.0) + jnp.float32(340.0) * texture
            delay_samp = jlimit(8.0, float(L - 2), jnp.float32(sr) / tube_hz)
            damp = jmap(tail_shape, 0.22, 0.91) * jmap(damping_amt, 1.0, 0.82)
            wg_mix = (jnp.float32(0.76), jnp.float32(0.24))
            exc_scale = (jnp.float32(0.20), jnp.float32(0.60))
            t_scale = jmap(tail_shape, 0.16, 0.72) * damping_mul
            freqs = jnp.array([280.0, 690.0, 1320.0, 2360.0], jnp.float32)
            t60s = jnp.array([0.28, 0.18, 0.11, 0.07], jnp.float32) * t_scale
            gains = jnp.array([0.34, 0.22, 0.16, 0.11], jnp.float32)
            out_mix = (jnp.float32(0.52), jnp.float32(0.36), jnp.float32(0.40),
                       jnp.float32(0.80), jnp.float32(0.10))
            exc_in_scale = jnp.float32(0.14)
        a1, a2 = _modal_coeffs(freqs, t60s, sr)
        return dict(delay_samp=delay_samp, damp=damp, wg_mix=wg_mix,
                    exc_scale=exc_scale, freqs=freqs, t60s=t60s, gains=gains,
                    out_mix=out_mix, exc_in_scale=exc_in_scale, a1=a1, a2=a2)

    # mode 4: Flesh-like (cpp:214-236)
    w_a = jnp.float32(2.0 * PI) * (jnp.float32(38.0) + jnp.float32(52.0) * texture) / jnp.float32(sr)
    w_b = jnp.float32(2.0 * PI) * (jnp.float32(88.0) + jnp.float32(72.0) * texture) / jnp.float32(sr)
    return dict(
        w_a=w_a, w_b=w_b, k_a=w_a * w_a, k_b=w_b * w_b,
        c_a=jnp.float32(2.0) * jmap(tail_shape, 0.56, 1.18) * w_a,
        c_b=jnp.float32(2.0) * jmap(tail_shape, 0.70, 1.34) * w_b,
        k_couple=jnp.float32(0.14) + jnp.float32(0.24) * texture)


def _material_substep(mode: int, p, sr: float, L: int):
    """Per-sample material update for static `mode` (cpp:135-237).

    Returns (extract, step, pack): extract(carry_dict) -> mat state tuple;
    step(mat, core, impact, body, trail, hp_state) -> (shaped, mat');
    pack(mat, carry_dict) -> updated dict entries.
    """
    texture = p["texture"]
    tail_shape = p["tailshape"]
    damping_amt = p["damping_amt"]
    damping_mul = p["damping_mul"]
    weight = p["weight"]
    one = jnp.float32(1.0)

    mc = material_consts(mode, p, sr, L)

    if mode == 0:   # Gel (cpp:137-151)
        omega, k = mc["omega"], mc["k"]

        def step(mat, core, impact, body, trail, hp_state):
            pos, vel = mat
            zeta = jmap(trail, 0.62, 1.45)
            cdamp = jnp.float32(2.0) * zeta * omega
            force = core * (jnp.float32(0.52) + jnp.float32(0.62) * body)
            acc = k * (force - pos) - cdamp * vel
            vel = vel + acc
            pos = pos + vel
            shaped = jnp.float32(0.48) * core + jnp.float32(1.85) * pos
            shaped = tanh32(shaped * (jnp.float32(0.96) + jnp.float32(0.28) * texture))
            return shaped, (pos, vel)

        return (lambda c: (c["spring_pos"], c["spring_vel"]), step,
                lambda m: {"spring_pos": m[0], "spring_vel": m[1]})

    if mode == 1:   # Metal (cpp:152-169) — per-sample coefficients via `bend`
        f0, ratios, t60s, gains = mc["f0"], mc["ratios"], mc["t60s"], mc["gains"]

        def step(mat, core, impact, body, trail, hp_state):
            y1, y2 = mat
            exc = core * (jnp.float32(0.19) + jnp.float32(0.52) * impact)
            bend = one + jnp.float32(0.09) * impact
            a1, a2 = _modal_coeffs(f0 * ratios * bend[..., None], t60s, sr)
            y, y1_old = _modal_bank_step(y1, y2, exc, a1, a2, gains)
            modes = _serial_mode_sum(y)
            bright = jnp.float32(0.03) * impact * (core - hp_state)
            shaped = (jnp.float32(0.44) * core + jnp.float32(0.42) * modes + bright) \
                * (jnp.float32(0.78) + jnp.float32(0.10) * texture)
            return shaped, (y, y1)

        return (lambda c: (c["modal_y1"], c["modal_y2"]), step,
                lambda m: {"modal_y1": m[0], "modal_y2": m[1]})

    if mode in (2, 3):   # Wood (cpp:170-192) / Plastic (cpp:193-212)
        delay_samp, damp = mc["delay_samp"], mc["damp"]
        wg_mix, exc_scale = mc["wg_mix"], mc["exc_scale"]
        gains, out_mix = mc["gains"], mc["out_mix"]
        exc_in_scale = mc["exc_in_scale"]
        a1, a2 = mc["a1"], mc["a2"]

        def step(mat, core, impact, body, trail, hp_state):
            y1, y2, wg, widx, prev_wave = mat
            exc = core * (exc_scale[0] + exc_scale[1] * impact)
            # interpolated circular waveguide read (cpp:91-105)
            pos = widx.astype(jnp.float32) - delay_samp
            pos = jnp.where(pos < 0, pos + jnp.float32(L), pos)
            i0 = pos.astype(jnp.int32)
            i1 = jnp.mod(i0 + 1, L)
            frac = pos - i0.astype(jnp.float32)
            v0 = jnp.take_along_axis(wg, i0[..., None], axis=-1)[..., 0]
            v1 = jnp.take_along_axis(wg, i1[..., None], axis=-1)[..., 0]
            delayed = v0 + frac * (v1 - v0)
            if mode == 2:
                new_wave = damp * (wg_mix[0] * delayed + wg_mix[1] * prev_wave) \
                    + exc * (jnp.float32(0.09) + jnp.float32(0.04) * body)
            else:
                new_wave = damp * (wg_mix[0] * delayed + wg_mix[1] * prev_wave) \
                    + exc_in_scale * exc
            # rank-agnostic per-row scatter (wg may be [C, L] standalone or
            # [B, C, L] inside the fused chain executor)
            wg = jnp.put_along_axis(wg, widx[..., None], new_wave[..., None],
                                    axis=-1, inplace=False)
            widx = jnp.mod(widx + 1, L)

            y, y1_old = _modal_bank_step(y1, y2, exc, a1, a2, gains)
            modes = _serial_mode_sum(y)
            shaped = (out_mix[0] * core + out_mix[1] * delayed
                      + out_mix[2] * modes) * (out_mix[3] + out_mix[4] * texture)
            return shaped, (y, y1, wg, widx, delayed)

        return (lambda c: (c["modal_y1"], c["modal_y2"], c["waveguide"],
                           c["wave_idx"], c["prev_wave"]), step,
                lambda m: {"modal_y1": m[0], "modal_y2": m[1],
                           "waveguide": m[2], "wave_idx": m[3],
                           "prev_wave": m[4]})

    # mode 4: Flesh-like (cpp:214-236)
    k_a, k_b, c_a, c_b = mc["k_a"], mc["k_b"], mc["c_a"], mc["c_b"]
    k_couple = mc["k_couple"]

    def step(mat, core, impact, body, trail, hp_state):
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
                          * (jnp.float32(0.98) + jnp.float32(0.16) * texture))
        return shaped, (pa, va, pb, vb)

    return (lambda c: (c["flesh_pos_a"], c["flesh_vel_a"],
                       c["flesh_pos_b"], c["flesh_vel_b"]), step,
            lambda m: {"flesh_pos_a": m[0], "flesh_vel_a": m[1],
                       "flesh_pos_b": m[2], "flesh_vel_b": m[3]})


def make_sample_step(consts, mat_step):
    """The complete C++ inner loop (cpp:107-277) as one per-sample body.

    `c` = (env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg, mat);
    `xs` = (dry sample, white-noise draw). Shared verbatim by the standalone
    scan in :func:`process` and by the fused chain executor
    (runtime/chain_fused.py) so both paths carry identical float32 op order.
    """
    tail_shape = consts["tail_shape"]
    texture = consts["texture"]
    mix = consts["mix"]
    out_gain = consts["out_gain"]
    decay = consts["decay"]
    low_boost = consts["low_boost"]
    split_low = consts["split_low"]
    split_high = consts["split_high"]
    env_atk = consts["env_atk"]
    env_rel = consts["env_rel"]
    wet_atk = consts["wet_atk"]
    wet_rel = consts["wet_rel"]
    dc_r = consts["dc_r"]
    auto_gain_base = consts["auto_gain_base"]
    in_trim = consts["in_trim"]
    mat_trim = consts["mat_trim"]
    one = jnp.float32(1.0)

    def step(c, xs):
        env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg, mat = c
        d, w = xs                     # [C] dry sample, white draw

        driven = d * in_trim
        adry = jnp.abs(d)
        env_c = jnp.where(adry > env, env_atk, env_rel)
        env = env_c * env + (one - env_c) * adry
        impact = jlimit(0.0, 1.0, jnp.maximum(jnp.float32(0.0), adry - env)
                        * jnp.float32(10.0))
        body = jlimit(0.0, 1.0, env * jnp.float32(3.2))
        trail = jlimit(0.0, 1.0, one - impact) * tail_shape

        lp = lp + split_low * (driven - lp)
        hp = hp + split_high * (driven - hp)
        low = lp * low_boost
        high = driven - hp
        mid = driven - lp - high
        core = low + mid + high * (jnp.float32(0.9) + texture * jnp.float32(1.3))

        shaped, mat = mat_step(mat, core, impact, body, trail, hp)

        # roughness noise (cpp:239-243)
        noise_hp = noise_hp + jnp.float32(0.08) * (w - noise_hp)
        rough = w - noise_hp
        shaped = shaped + rough * (jnp.float32(0.004) + jnp.float32(0.022) * texture) \
            * (jnp.float32(0.14) + jnp.float32(0.64) * impact)

        dynamics = one + impact * (jnp.float32(0.18) + texture * jnp.float32(0.12)) \
            + body * jnp.float32(0.06)
        shaped = shaped * dynamics * mat_trim

        # tail integrator (cpp:248-250)
        tail_input = jlimit(-2.0, 2.0, shaped) * (jnp.float32(0.45)
                                                  + jnp.float32(0.55) * trail)
        tail = tail_input + tail * decay
        wet = shaped + tail * (jnp.float32(0.30) + jnp.float32(0.45) * trail)

        # wet auto-gain (cpp:252-257)
        wet_abs = jnp.abs(wet)
        wet_c = jnp.where(wet_abs > wet_env, wet_atk, wet_rel)
        wet_env = wet_c * wet_env + (one - wet_c) * wet_abs
        auto_comp = auto_gain_base / (one + jnp.float32(1.8) * wet_env)
        wet = wet * jlimit(0.18, 1.0, auto_comp)

        mixed = d + mix * (wet - d)
        pre_dc = mixed * out_gain

        # DC blocker (cpp:263-265)
        dc = pre_dc - dc_in + dc_r * dc_out
        dc_in = pre_dc
        dc_out = dc

        # protect limiter (cpp:267-275)
        peak = jnp.abs(dc)
        over = peak > jnp.float32(0.88)
        pg = jnp.where(over,
                       jnp.minimum(pg, (jnp.float32(0.88) / peak) * jnp.float32(0.98)),
                       pg + (one - pg) * jnp.float32(0.0028))
        o = dc * jlimit(0.2, 1.0, pg)
        out = jlimit(-0.98, 0.98, o)

        return (env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg,
                mat), out

    return step


def extract_scan_carry(carry, extract):
    """Scan-carry tuple from the state dict (shared by process/chain_fused)."""
    return (carry["env"], carry["lp"], carry["hp"], carry["noise_hp"],
            carry["tail"], carry["wet_env"], carry["dc_in"],
            carry["dc_out"], carry["protect_gain"], extract(carry))


def pack_scan_carry(c, carry, pack):
    """State dict updates from the final scan carry."""
    env, lp, hp, noise_hp, tail, wet_env, dc_in, dc_out, pg, mat = c
    new_carry = dict(carry)
    new_carry.update(pack(mat))
    new_carry.update({
        "env": env, "lp": lp, "hp": hp, "noise_hp": noise_hp, "tail": tail,
        "wet_env": wet_env, "dc_in": dc_in, "dc_out": dc_out,
        "protect_gain": pg,
    })
    return new_carry


def static_material(params) -> int:
    """Material index if statically known, else None."""
    m = params.get("material", 0)
    if isinstance(m, (int, float)):
        return int(m)
    try:
        return int(jax.device_get(m))  # concrete array
    except Exception:
        return None


def block_consts(params, sr: float, mode: int, L: int):
    """All per-block constants + the material substep for a static `mode`.

    Returns (consts, extract, mat_step, pack). Shared verbatim by
    :func:`process` and the fused chain executor (runtime/chain_fused.py)."""
    tail_shape = jnp.asarray(params["tailshape"], jnp.float32)
    damping = jnp.asarray(params["damping"], jnp.float32)
    weight = jnp.asarray(params["weight"], jnp.float32)
    texture = jnp.asarray(params["texture"], jnp.float32)
    mix = jnp.asarray(params["mix"], jnp.float32)
    out_gain = db_to_gain(params["output"])

    damping_amt = jlimit(0.0, 1.0, damping)
    damping_mul = jmap(damping_amt, 1.35, 0.40)           # cpp:65
    decay = jmap(tail_shape, 0.30, 0.985) * jmap(damping_amt, 1.0, 0.80)  # cpp:66

    consts = dict(
        tail_shape=tail_shape, texture=texture, mix=mix, out_gain=out_gain,
        decay=decay, low_boost=jnp.float32(1.0) + weight,  # cpp:67
        split_low=onepole_coeff(140.0, sr),
        split_high=onepole_coeff(2600.0, sr),
        env_atk=tau_coeff(0.0025, sr), env_rel=tau_coeff(0.080, sr),
        wet_atk=tau_coeff(0.005, sr), wet_rel=tau_coeff(0.090, sr),
        dc_r=jnp.float32(0.995),
        auto_gain_base=jmap(texture, 0.78, 0.54),          # cpp:75
        in_trim=jnp.float32(MATERIAL_INPUT_TRIM[mode]),
        mat_trim=jnp.float32(MATERIAL_TRIM[mode]))

    extract, mat_step, pack = _material_substep(
        mode, dict(texture=texture, tailshape=tail_shape,
                   damping_amt=damping_amt, damping_mul=damping_mul,
                   weight=weight), sr, L)
    return consts, extract, mat_step, pack


def block_noise(rng, channels: int, n: int):
    """The block's LCG roughness draws (cpp:239-243), closed-form parallel.

    Returns (white [C, n], rng')."""
    states = lcg_sequence(rng, channels * n).reshape(channels, n)
    return white_from_bits(states), lcg_advance(rng, channels * n)


def process(params, carry, block, sr: float):
    """block [C, N] → (out, carry'). `material` must be static (a Python or
    concrete scalar); heterogeneous-material batches should be grouped by
    material by the caller (the runtime does this)."""
    block = jnp.asarray(block, jnp.float32)
    if block.ndim != 2:
        raise ValueError("texture.process operates on [C, N] blocks; use vmap "
                         "for batching (material state is channel-structured)")
    channels, n = block.shape
    mode = static_material(params)
    if mode is None:
        # traced material: one compiled step serves mixed-material batches
        return process_traced(params, carry, block, sr)
    mode = max(0, min(4, mode))

    white, new_rng = block_noise(carry["rng"], channels, n)
    consts, extract, mat_step, pack = block_consts(
        params, sr, mode, carry["waveguide"].shape[-1])
    step = make_sample_step(consts, mat_step)

    init_c = extract_scan_carry(carry, extract)
    xs = (jnp.moveaxis(block, -1, 0), jnp.moveaxis(white, -1, 0))
    from juicy_tpu.ops.scan_utils import default_unroll
    unroll = default_unroll(4) if mode in (0, 4) else 1
    c_final, out_t = jax.lax.scan(step, init_c, xs, unroll=unroll)
    out = jnp.moveaxis(out_t, 0, -1)

    new_carry = pack_scan_carry(c_final, carry, pack)
    new_carry["rng"] = new_rng
    return out, new_carry


base.register(base.ProcessorDef(
    name="texture",
    title="Juicy Texture",
    code="JTXT",
    params=PARAMS,
    presets=PRESETS,
    init=init,
    process=process,
    static_params=("material",),
))


def _material_substep_traced(p, sr: float, L: int):
    """Traced-material variant: computes ALL 5 material substeps per sample
    and selects per lane by the (traced) material index. The shared body
    (envelopes, band split, noise, tail, DC, limiter — ~60% of the work) is
    common, so a mixed-material batch costs ~2x a single-material run
    instead of 5x (VERDICT round-1 item 7).

    `material` may be a scalar or a per-clip batched array; each selected
    value is bit-identical to the corresponding static-material branch."""
    mats = [material_consts(m, p, sr, L) for m in range(5)]
    texture = p["texture"]
    one = jnp.float32(1.0)
    mc0, mc1, mc2, mc3, mc4 = mats
    a1_w, a2_w = mc2["a1"], mc2["a2"]
    a1_p, a2_p = mc3["a1"], mc3["a2"]

    def extract(c):
        return (c["spring_pos"], c["spring_vel"],
                c["modal_y1"], c["modal_y2"],
                c["waveguide"], c["wave_idx"], c["prev_wave"],
                c["flesh_pos_a"], c["flesh_vel_a"],
                c["flesh_pos_b"], c["flesh_vel_b"])

    def pack(m):
        return {"spring_pos": m[0], "spring_vel": m[1],
                "modal_y1": m[2], "modal_y2": m[3],
                "waveguide": m[4], "wave_idx": m[5], "prev_wave": m[6],
                "flesh_pos_a": m[7], "flesh_vel_a": m[8],
                "flesh_pos_b": m[9], "flesh_vel_b": m[10]}

    def step(mat, core, impact, body, trail, hp_state, material):
        (pos, vel, y1, y2, wg, widx, prev_wave, pa, va, pb, vb) = mat
        mm = jnp.asarray(material, jnp.int32)
        is_gel = mm == 0
        is_metal = mm == 1
        is_wood = mm == 2
        is_plastic = mm == 3
        is_wg = is_wood | is_plastic
        is_flesh = mm == 4

        # --- gel (cpp:137-151) ---
        zeta = jmap(trail, 0.62, 1.45)
        cdamp = jnp.float32(2.0) * zeta * mc0["omega"]
        force_g = core * (jnp.float32(0.52) + jnp.float32(0.62) * body)
        acc = mc0["k"] * (force_g - pos) - cdamp * vel
        vel_n = vel + acc
        pos_n = pos + vel_n
        shaped_gel = jnp.float32(0.48) * core + jnp.float32(1.85) * pos_n
        shaped_gel = tanh32(shaped_gel * (jnp.float32(0.96)
                                            + jnp.float32(0.28) * texture))

        # --- metal (cpp:152-169), per-sample coefficients ---
        exc_m = core * (jnp.float32(0.19) + jnp.float32(0.52) * impact)
        bend = one + jnp.float32(0.09) * impact
        a1_m, a2_m = _modal_coeffs(mc1["f0"] * mc1["ratios"] * bend[..., None],
                                   mc1["t60s"], sr)
        y_metal, _ = _modal_bank_step(y1, y2, exc_m, a1_m, a2_m, mc1["gains"])
        modes_m = _serial_mode_sum(y_metal)
        bright = jnp.float32(0.03) * impact * (core - hp_state)
        shaped_metal = (jnp.float32(0.44) * core + jnp.float32(0.42) * modes_m
                        + bright) * (jnp.float32(0.78)
                                     + jnp.float32(0.10) * texture)

        # --- wood / plastic (cpp:170-212) ---
        delay = jnp.where(is_wood, mc2["delay_samp"], mc3["delay_samp"])
        damp = jnp.where(is_wood, mc2["damp"], mc3["damp"])
        wgm0 = jnp.where(is_wood, mc2["wg_mix"][0], mc3["wg_mix"][0])
        wgm1 = jnp.where(is_wood, mc2["wg_mix"][1], mc3["wg_mix"][1])
        excs0 = jnp.where(is_wood, mc2["exc_scale"][0], mc3["exc_scale"][0])
        excs1 = jnp.where(is_wood, mc2["exc_scale"][1], mc3["exc_scale"][1])
        exc_w = core * (excs0 + excs1 * impact)
        pos_f = widx.astype(jnp.float32) - delay
        pos_f = jnp.where(pos_f < 0, pos_f + jnp.float32(L), pos_f)
        i0 = pos_f.astype(jnp.int32)
        i1 = jnp.mod(i0 + 1, L)
        frac = pos_f - i0.astype(jnp.float32)
        v0 = jnp.take_along_axis(wg, i0[..., None], axis=-1)[..., 0]
        v1 = jnp.take_along_axis(wg, i1[..., None], axis=-1)[..., 0]
        delayed = v0 + frac * (v1 - v0)
        inject = jnp.where(is_wood,
                           exc_w * (jnp.float32(0.09)
                                    + jnp.float32(0.04) * body),
                           jnp.float32(0.14) * exc_w)
        new_wave = damp * (wgm0 * delayed + wgm1 * prev_wave) + inject
        cur = jnp.take_along_axis(wg, widx[..., None], axis=-1)[..., 0]
        wg_n = jnp.put_along_axis(wg, widx[..., None],
                                  jnp.where(is_wg, new_wave, cur)[..., None],
                                  axis=-1, inplace=False)
        widx_n = jnp.where(is_wg, jnp.mod(widx + 1, L), widx)
        a1_wp = jnp.where(is_wood[..., None], a1_w, a1_p)
        a2_wp = jnp.where(is_wood[..., None], a2_w, a2_p)
        g_wp = jnp.where(is_wood[..., None], mc2["gains"], mc3["gains"])
        y_wp, _ = _modal_bank_step(y1, y2, exc_w, a1_wp, a2_wp, g_wp)
        modes_w = _serial_mode_sum(y_wp)
        om = [jnp.where(is_wood, mc2["out_mix"][i], mc3["out_mix"][i])
              for i in range(5)]
        shaped_wg = (om[0] * core + om[1] * delayed + om[2] * modes_w) \
            * (om[3] + om[4] * texture)

        # --- flesh (cpp:214-236) ---
        force_f = core * (jnp.float32(0.55) + jnp.float32(0.65) * body)
        acc_a = mc4["k_a"] * (force_f - pa) - mc4["c_a"] * va \
            - mc4["k_couple"] * (pa - pb)
        acc_b = mc4["k_b"] * (pa - pb) - mc4["c_b"] * vb
        va_n = va + acc_a
        vb_n = vb + acc_b
        pa_n = pa + va_n
        pb_n = pb + vb_n
        tissue = jnp.float32(0.92) * pa_n + jnp.float32(0.58) * pb_n
        nl = tissue - jnp.float32(0.19) * tissue * tissue * tissue
        shaped_flesh = tanh32((jnp.float32(0.50) * core
                                 + jnp.float32(1.34) * nl)
                                * (jnp.float32(0.98)
                                   + jnp.float32(0.16) * texture))

        # --- select shaped output + state updates per lane ---
        shaped = jnp.where(is_gel, shaped_gel,
                           jnp.where(is_metal, shaped_metal,
                                     jnp.where(is_wg, shaped_wg,
                                               shaped_flesh)))
        is_modal = (is_metal | is_wg)[..., None]
        y1_n = jnp.where(is_modal,
                         jnp.where(is_metal[..., None], y_metal, y_wp), y1)
        y2_n = jnp.where(is_modal, y1, y2)
        new_mat = (jnp.where(is_gel, pos_n, pos),
                   jnp.where(is_gel, vel_n, vel),
                   y1_n, y2_n, wg_n, widx_n,
                   jnp.where(is_wg, delayed, prev_wave),
                   jnp.where(is_flesh, pa_n, pa),
                   jnp.where(is_flesh, va_n, va),
                   jnp.where(is_flesh, pb_n, pb),
                   jnp.where(is_flesh, vb_n, vb))
        return shaped, new_mat

    return extract, step, pack


def traced_block_consts(params, sr: float, L: int):
    """:func:`block_consts` analog for a TRACED (possibly per-clip batched)
    material index: returns (consts, extract, mat_step, pack). Per-clip
    trims and the material selector broadcast against the trailing channel
    axis, so the body works both per-clip (vmap / process_traced) and on
    [B, C] sample lanes (the fused chain executor's mixed-material lane)."""
    material = jnp.clip(jnp.asarray(params.get("material", 0), jnp.int32),
                        0, 4)

    def bb(v):
        return v[..., None] if jnp.ndim(v) else v

    in_trim = bb(jnp.take(jnp.asarray(MATERIAL_INPUT_TRIM, jnp.float32),
                          material))
    mat_trim = bb(jnp.take(jnp.asarray(MATERIAL_TRIM, jnp.float32),
                           material))

    tail_shape = jnp.asarray(params["tailshape"], jnp.float32)
    damping = jnp.asarray(params["damping"], jnp.float32)
    weight = jnp.asarray(params["weight"], jnp.float32)
    texture = jnp.asarray(params["texture"], jnp.float32)
    damping_amt = jlimit(0.0, 1.0, damping)

    consts = dict(
        tail_shape=tail_shape, texture=texture,
        mix=jnp.asarray(params["mix"], jnp.float32),
        out_gain=db_to_gain(params["output"]),
        decay=jmap(tail_shape, 0.30, 0.985) * jmap(damping_amt, 1.0, 0.80),
        low_boost=jnp.float32(1.0) + weight,
        split_low=onepole_coeff(140.0, sr),
        split_high=onepole_coeff(2600.0, sr),
        env_atk=tau_coeff(0.0025, sr), env_rel=tau_coeff(0.080, sr),
        wet_atk=tau_coeff(0.005, sr), wet_rel=tau_coeff(0.090, sr),
        dc_r=jnp.float32(0.995),
        auto_gain_base=jmap(texture, 0.78, 0.54),
        in_trim=in_trim, mat_trim=mat_trim)

    mp = dict(texture=texture, tailshape=tail_shape, damping_amt=damping_amt,
              damping_mul=jmap(damping_amt, 1.35, 0.40), weight=weight)
    extract, mat_step0, pack = _material_substep_traced(mp, sr, L)
    mm = bb(material)

    def mat_step(mat, core, impact, body, trail, hp):
        return mat_step0(mat, core, impact, body, trail, hp, mm)

    return consts, extract, mat_step, pack


def process_traced(params, carry, block, sr: float):
    """Texture with a TRACED material index — one compiled step serves
    mixed-material corpora (vmap `material` over the batch, or pass a
    per-clip array). Selected values are bit-identical to the corresponding
    static-material branches; costs ~2x a single material (all substeps
    computed, shared body amortized)."""
    block = jnp.asarray(block, jnp.float32)
    channels, n = block.shape[-2], block.shape[-1]

    consts, extract, mat_step, pack = traced_block_consts(
        params, sr, carry["waveguide"].shape[-1])
    white, new_rng = block_noise(carry["rng"], channels, n)
    base_step = make_sample_step(consts, mat_step)

    init_c = extract_scan_carry(carry, extract)
    xs = (jnp.moveaxis(block, -1, 0), jnp.moveaxis(white, -1, 0))
    c_final, out_t = jax.lax.scan(base_step, init_c, xs, unroll=1)
    out = jnp.moveaxis(out_t, 0, -1)

    new_carry = pack_scan_carry(c_final, carry, pack)
    new_carry["rng"] = new_rng
    return out, new_carry
