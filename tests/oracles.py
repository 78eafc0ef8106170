"""Serial float32 NumPy oracles for the reference processors.

These re-derive the reference DSP sample-by-sample from the formulas cited in
SURVEY.md §2 (reference file:line in each class docstring), with strict
float32 discipline, preserving the C++ op order. They are deliberately written
in the *serial* style of the C++ so they fail differently than the vectorized
JAX implementations — golden null tests run JAX output against these oracles
with a ≤ −80 dBFS residual budget (BASELINE.json north star).

NumPy ≥ 2.0 (NEP 50) keeps float32 scalars float32 under python-scalar mixing.
"""

from __future__ import annotations

import numpy as np

# Drift-pinned transcendentals shared with the implementation: resonator pole
# coefficients and the Motion LFO amplify 1-ulp libm/XLA differences into
# linearly growing phase drift (any two independent builds of the C++ would
# drift the same way), so both sides evaluate these through one fixed f32
# polynomial (juicy_tpu/ops/precise.py). Accuracy vs true libm ≤ ~1e-7 —
# the same class as libm-vs-libm variation. Everything else in these oracles
# uses plain numpy/libm, independent of the implementation under test.
from juicy_tpu.ops.precise import cos32, exp32, onepole_coeff32, sin32

F = np.float32
PI = F(np.pi)


def jmap(v, a, b):
    return F(a) + F(v) * (F(b) - F(a))


def jmap5(v, smin, smax, tmin, tmax):
    return F(tmin) + (F(tmax) - F(tmin)) * ((F(v) - F(smin)) / (F(smax) - F(smin)))


def jlimit(lo, hi, v):
    return min(F(hi), max(F(lo), F(v)))


def db_to_gain(db):
    return F(10.0) ** (F(db) / F(20.0))


def gain_to_db(gain):
    if gain <= 0.0:
        return F(-100.0)
    return max(F(-100.0), F(20.0) * np.log10(F(gain)))


def onepole_coeff(freq, sr):
    # exp32: drift-pinned, shared with the implementation (see module note).
    return F(1.0) - exp32(F(-2.0) * PI * F(freq) / F(sr))


def tau_coeff(tau, sr):
    return exp32(F(-1.0) / F(sr * tau))


class AnalyzerOracle:
    """JuicinessAnalyzer (src/shared/JuicinessAnalyzer.cpp:31-155)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.channels = max(1, channels)
        self.low_coeff = onepole_coeff(250.0, sr)
        self.high_coeff = onepole_coeff(2500.0, sr)
        self.reset()

    def reset(self):
        self.short_env = F(0.0)
        self.long_env = F(0.0)
        self.low_state = F(0.0)
        self.high_state = F(0.0)
        self.repetition_ema = F(0.0)
        self.fatigue_ema = F(0.0)
        self.onset_cooldown = 0

    def _update_env(self, x, attack, release, env):
        c = attack if x > env else release
        return (F(1.0) - c) * x + c * env

    def analyze(self, buffer):
        n = buffer.shape[1]
        sr = self.sr
        attack_short = tau_coeff(0.003, sr)
        release_short = tau_coeff(0.030, sr)
        attack_long = tau_coeff(0.050, sr)
        release_long = tau_coeff(0.300, sr)

        transient_accum = F(0.0)
        onset_count = 0
        rms_accum = F(0.0)
        peak = F(0.0)
        low_accum = F(0.0)
        high_accum = F(0.0)
        side_accum = F(0.0)
        mid_accum = F(0.0)
        corr_accum = F(0.0)

        left = buffer[0]
        right = buffer[1] if self.channels > 1 else buffer[0]
        for i in range(n):
            l = F(left[i])
            r = F(right[i])
            mono = F(0.5) * (l + r)
            abs_mono = abs(mono)

            self.short_env = self._update_env(abs_mono, attack_short,
                                              release_short, self.short_env)
            self.long_env = self._update_env(abs_mono, attack_long,
                                             release_long, self.long_env)
            transient = max(F(0.0), self.short_env - self.long_env)
            transient_accum += transient
            if self.onset_cooldown > 0:
                self.onset_cooldown -= 1
            if transient > F(0.045) and self.onset_cooldown <= 0:
                onset_count += 1
                self.onset_cooldown = int(sr * 0.035)
            rms_accum += mono * mono
            peak = max(peak, abs(mono))

            self.low_state += self.low_coeff * (mono - self.low_state)
            self.high_state += self.high_coeff * (mono - self.high_state)
            low = self.low_state
            high = mono - self.high_state
            low_accum += low * low
            high_accum += high * high

            mid = F(0.5) * (l + r)
            side = F(0.5) * (l - r)
            mid_accum += mid * mid
            side_accum += side * side
            corr_accum += l * r

        inv_n = F(1.0) / F(n)
        rms = np.sqrt(rms_accum * inv_n + F(1.0e-12))
        crest = peak / (rms + F(1.0e-6))
        low_energy = low_accum * inv_n
        high_energy = high_accum * inv_n
        low_high_ratio = low_energy / (high_energy + F(1.0e-8))
        width_ratio = side_accum / (mid_accum + side_accum + F(1.0e-8))

        l_energy = np.sqrt(np.mean(left.astype(np.float32) ** 2, dtype=np.float32))
        r_energy = np.sqrt(np.mean(right.astype(np.float32) ** 2, dtype=np.float32)) \
            if self.channels > 1 else l_energy
        corr = corr_accum * inv_n / (l_energy * r_energy + F(1.0e-6))
        corr = jlimit(-1.0, 1.0, corr)

        punch = jlimit(0.0, 1.0, F(6.0) * transient_accum * inv_n / (rms + F(1.0e-5)))
        richness = jlimit(0.0, 1.0, (F(2.3) - crest) * F(0.65) + rms * F(2.0))

        clarity = F(1.0)
        if low_high_ratio > F(2.5):
            clarity -= jlimit(0.0, 0.6, (low_high_ratio - F(2.5)) * F(0.15))
        if high_energy > F(0.03):
            clarity -= jlimit(0.0, 0.5, (high_energy - F(0.03)) * F(8.0))
        clarity = jlimit(0.0, 1.0, clarity)

        width = jlimit(0.0, 1.0, width_ratio * F(2.0))
        mono_safety = jlimit(0.0, 1.0, F(0.5) * (corr + F(1.0)))

        block_seconds = F(n) / F(sr)
        onset_rate = F(onset_count) / block_seconds if block_seconds > 0 else F(0.0)
        self.repetition_ema += (onset_rate - self.repetition_ema) * F(0.08)
        repetition_density = jlimit(0.0, 1.0, self.repetition_ema / F(12.0))

        emphasis = jlimit(0.0, 1.0, F(0.62) * punch
                          + F(0.38) * jlimit(0.0, 1.0, transient_accum * inv_n * F(8.5)))
        coherence = jlimit(0.0, 1.0, F(0.50) * clarity + F(0.30) * mono_safety
                           + F(0.20) * (F(1.0) - abs(width - F(0.45))))
        synesthesia = jlimit(0.0, 1.0, F(0.45) * richness
                             + F(0.30) * jlimit(0.0, 1.0, low_high_ratio / F(3.5))
                             + F(0.25) * jlimit(0.0, 1.0, transient_accum * inv_n * F(5.0)))

        crest_penalty = jlimit(0.0, 1.0, (F(1.8) - crest) * F(1.1))
        harsh_penalty = jlimit(0.0, 1.0, high_energy * F(12.0))
        instant_fatigue = jlimit(0.0, 1.0, F(0.35) * crest_penalty
                                 + F(0.35) * harsh_penalty
                                 + F(0.30) * repetition_density)
        self.fatigue_ema += (instant_fatigue - self.fatigue_ema) * F(0.06)
        fatigue_risk = jlimit(0.0, 1.0, self.fatigue_ema)

        score = F(100.0) * (F(0.30) * punch + F(0.25) * richness
                            + F(0.25) * clarity + F(0.20) * width)
        score *= (F(0.6) + F(0.4) * mono_safety)
        score = jlimit(0.0, 100.0, score)

        return dict(score=score, punch=punch, richness=richness,
                    clarity=clarity, width=width, mono_safety=mono_safety,
                    emphasis=emphasis, coherence=coherence,
                    synesthesia=synesthesia, fatigue_risk=fatigue_risk,
                    repetition_density=repetition_density)


class SaturatorOracle:
    """JuicySaturator DSP loop (JuicySaturator/PluginProcessor.cpp:77-98)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.tone_state = [F(0.0)] * channels

    def process(self, buffer, drive, asymmetry, tone, mix, output):
        out = buffer.copy()
        in_gain = db_to_gain(drive)
        out_gain = db_to_gain(output)
        cutoff = jmap5(tone, 0.0, 1.0, 2500.0, 16000.0)
        tone_coeff = onepole_coeff(cutoff, self.sr)
        mix = F(mix)
        asym = F(asymmetry)
        for ch in range(buffer.shape[0]):
            state = self.tone_state[ch]
            x = out[ch]
            for i in range(buffer.shape[1]):
                dry = F(x[i])
                driven = dry * in_gain
                skewed = driven + asym * driven * driven
                soft = np.tanh(skewed)
                state += tone_coeff * (soft - state)
                wet = state * out_gain
                x[i] = dry + mix * (wet - dry)
            self.tone_state[ch] = state
        return out


class PunchOracle:
    """JuicyPunch DSP loop (JuicyPunch/PluginProcessor.cpp:83-112)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.fast_env = [F(0.0)] * channels
        self.slow_env = [F(0.0)] * channels

    def process(self, buffer, punch, sustain, slam, clip, mix, output):
        out = buffer.copy()
        out_gain = db_to_gain(output)
        fast_c = tau_coeff(0.0015, self.sr)
        slow_c = tau_coeff(0.110, self.sr)
        punch, sustain, slam, clip, mix = map(F, (punch, sustain, slam, clip, mix))
        for ch in range(buffer.shape[0]):
            f_env = self.fast_env[ch]
            s_env = self.slow_env[ch]
            x = out[ch]
            for i in range(buffer.shape[1]):
                dry = F(x[i])
                adry = abs(dry)
                f_env = (F(1.0) - fast_c) * adry + fast_c * f_env
                s_env = (F(1.0) - slow_c) * adry + slow_c * s_env
                transient = max(F(0.0), f_env - s_env)
                curve = transient ** jmap5(slam, 0.0, 1.0, 0.95, 0.55)
                punch_gain = F(1.0) + (punch * F(12.0) + slam * F(22.0)) * curve
                sustain_gain = F(1.0) + (sustain * F(4.0) + slam * F(1.5)) * \
                    max(F(0.0), s_env - transient * F(0.6))
                wet = dry * punch_gain * sustain_gain
                drive = F(1.0) + clip * F(8.0) + slam * F(4.0)
                soft = np.tanh(wet * drive) / np.tanh(drive)
                hard = jlimit(-0.95, 0.95, wet * (F(1.0) + clip * F(2.0)))
                wet = soft + clip * (hard - soft)
                x[i] = (dry + mix * (wet - dry)) * out_gain
            self.fast_env[ch] = f_env
            self.slow_env[ch] = s_env
        return out


class WidthOracle:
    """JuicyWidth DSP loop (JuicyWidth/PluginProcessor.cpp:91-138)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.channels = channels
        size = max(1, int(sr * 0.060))
        self.delay = np.zeros((2, size), np.float32)
        self.write_pos = 0

    def process(self, buffer, width, haas_ms, mono_safe, mix, output):
        if self.channels < 2:
            return buffer.copy()
        out = buffer.copy()
        size = self.delay.shape[1]
        delay_samples = int(F(self.sr) * (F(haas_ms) * F(0.001)))
        width = F(width)
        mono_safe, mix = F(mono_safe), F(mix)
        out_gain = db_to_gain(output)
        left, right = out[0], out[1]
        for i in range(buffer.shape[1]):
            dry_l = F(left[i])
            dry_r = F(right[i])
            corr_proxy = jlimit(-1.0, 1.0, dry_l * dry_r * F(12.0))
            dynamic_limit = jmap5(mono_safe, 0.0, 1.0, 1.0, 0.35)
            if corr_proxy < F(-0.1):
                width *= dynamic_limit
            mid = F(0.5) * (dry_l + dry_r)
            side = F(0.5) * (dry_l - dry_r) * (F(1.0) + width)
            wet_l = mid + side
            wet_r = mid - side
            self.delay[0, self.write_pos] = wet_l
            self.delay[1, self.write_pos] = wet_r
            read_pos = self.write_pos - delay_samples
            if read_pos < 0:
                read_pos += size
            haas_r = F(self.delay[1, read_pos])
            left[i] = (dry_l + mix * (wet_l - dry_l)) * out_gain
            right[i] = (dry_r + mix * (haas_r - dry_r)) * out_gain
            self.write_pos += 1
            if self.write_pos >= size:
                self.write_pos = 0
        return out


class InferOracle:
    """JuicyInfer audio path: trim gain only (JuicyInfer/PluginProcessor.cpp:74-79)."""

    def __init__(self, sr, channels):
        pass

    def process(self, buffer, trim, sensitivity):
        return buffer * db_to_gain(trim)


class CohereOracle:
    """JuicyCohere (JuicyCohere/PluginProcessor.cpp:42-131)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.channels = channels
        self.low_coeff = onepole_coeff(220.0, sr)
        self.high_coeff = onepole_coeff(2400.0, sr)
        self.target_low = F(0.2)
        self.target_mid = F(0.2)
        self.target_high = F(0.2)
        self.tail = [F(0.0), F(0.0)]
        self.low_lp = F(0.0)
        self.high_lp = F(0.0)
        self.context_fit = F(0.0)

    def process(self, buffer, match, learn, tail, decay, mix, output):
        out = buffer.copy()
        n = buffer.shape[1]
        match, tail_amt, decay, mix = map(F, (match, tail, decay, mix))
        out_gain = db_to_gain(output)
        ch1 = min(1, self.channels - 1)

        low_e = F(0.0); mid_e = F(0.0); high_e = F(0.0)
        for i in range(n):
            mono = F(0.5) * (F(out[0, i]) + F(out[ch1, i]))
            self.low_lp += self.low_coeff * (mono - self.low_lp)
            self.high_lp += self.high_coeff * (mono - self.high_lp)
            low = self.low_lp
            high = mono - self.high_lp
            mid = mono - low - high
            low_e += low * low
            mid_e += mid * mid
            high_e += high * high
        inv_n = F(1.0) / F(max(1, n))
        low_e *= inv_n; mid_e *= inv_n; high_e *= inv_n

        if learn > 0.5:
            a = F(0.02)
            self.target_low += (low_e - self.target_low) * a
            self.target_mid += (mid_e - self.target_mid) * a
            self.target_high += (high_e - self.target_high) * a

        eps = F(1.0e-6)
        low_err = abs(gain_to_db((low_e + eps) / (self.target_low + eps)))
        mid_err = abs(gain_to_db((mid_e + eps) / (self.target_mid + eps)))
        high_err = abs(gain_to_db((high_e + eps) / (self.target_high + eps)))
        deviation = (low_err + mid_err + high_err) / F(3.0)
        self.context_fit = jlimit(0.0, 100.0, F(100.0) - deviation * F(10.0))

        expo = F(0.25) * match
        low_comp = jlimit(0.5, 1.8, ((self.target_low + eps) / (low_e + eps)) ** expo)
        mid_comp = jlimit(0.5, 1.8, ((self.target_mid + eps) / (mid_e + eps)) ** expo)
        high_comp = jlimit(0.5, 1.8, ((self.target_high + eps) / (high_e + eps)) ** expo)
        fb = jlimit(0.0, 0.93, decay)

        for ch in range(self.channels):
            t = self.tail[ch]
            lp_a = F(0.0)
            lp_b = F(0.0)
            x = out[ch]
            for i in range(n):
                dry = F(x[i])
                lp_a += self.low_coeff * (dry - lp_a)
                lp_b += self.high_coeff * (dry - lp_b)
                low = lp_a * low_comp
                high = (dry - lp_b) * high_comp
                mid = (dry - lp_a - (dry - lp_b)) * mid_comp
                matched = low + mid + high
                t = matched + t * fb
                wet = matched + tail_amt * F(0.35) * t
                x[i] = (dry + mix * (wet - dry)) * out_gain
            self.tail[ch] = t
        return out


class MotionOracle:
    """JuicyMotion (JuicyMotion/PluginProcessor.cpp:47-154)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.channels = channels
        self.env = F(0.0)
        self.repetition = F(0.0)
        self.budget_env = F(0.0)
        self.variation = [F(0.0)] * 3
        self.targets = [F(0.0)] * 3
        self.onset_cooldown = 0
        self.rng = np.uint32(0x93AB12F0)
        self.tail = [F(0.0), F(0.0)]
        self.lp = [F(0.0), F(0.0)]
        self.prev = [F(0.0), F(0.0)]
        self.motion_phase = F(0.0)

    def _lcg(self):
        self.rng = np.uint32(np.uint32(1664525) * self.rng + np.uint32(1013904223))
        return self.rng

    def process(self, buffer, microvar, motiondepth, repeatctrl, budget, mix, output):
        out = buffer.copy()
        n = buffer.shape[1]
        sr = self.sr
        micro_var, repeat_ctrl, contrast_budget, mix = map(
            F, (microvar, repeatctrl, budget, mix))
        out_gain = db_to_gain(output)

        env_coeff = tau_coeff(0.015, sr)
        budget_coeff = tau_coeff(0.080, sr)
        tail_feedback = jmap5(repeat_ctrl, 0.0, 1.0, 0.15, 0.88)
        depth = jlimit(0.0, 2.0, F(motiondepth))
        motion_rate = jmap5(micro_var, 0.0, 1.0, 0.25, 2.0) * jmap5(depth, 0.0, 2.0, 0.75, 1.6)
        motion_inc = (F(2.0) * PI * motion_rate) / F(sr)
        var_slew = tau_coeff(0.020, sr)
        ch1 = min(1, self.channels - 1)

        # pass 1
        for i in range(n):
            mono = F(0.5) * (F(out[0, i]) + F(out[ch1, i]))
            abs_mono = abs(mono)
            self.env = env_coeff * self.env + (F(1.0) - env_coeff) * abs_mono
            if self.onset_cooldown > 0:
                self.onset_cooldown -= 1
            if abs_mono > self.env * F(1.35) + F(0.02) and self.onset_cooldown <= 0:
                self.onset_cooldown = int(sr * 0.04)
                self.repetition += F(1.0)
                r = self._lcg()
                self.targets[0] = (F((r >> np.uint32(7)) & np.uint32(0x7FFF)) / F(16384.0) - F(1.0)) * micro_var * F(0.9)
                r = self._lcg()
                self.targets[1] = (F((r >> np.uint32(9)) & np.uint32(0x7FFF)) / F(16384.0) - F(1.0)) * micro_var * F(0.8)
                r = self._lcg()
                self.targets[2] = (F((r >> np.uint32(11)) & np.uint32(0x7FFF)) / F(16384.0) - F(1.0)) * micro_var * F(0.8)
            self.repetition *= F(0.997)

        rep_norm = jlimit(0.0, 1.0, self.repetition * F(0.08))
        repetition_scale = F(1.0) - repeat_ctrl * rep_norm * F(0.65)
        recovery = F(1.0) + repeat_ctrl * (F(1.0) - rep_norm) * F(0.25)

        two_pi = F(2.0) * PI
        four_pi = F(2.0) * (F(2.0) * PI)
        for ch in range(self.channels):
            tail = self.tail[ch]
            lp = self.lp[ch]
            prev = self.prev[ch]
            x = out[ch]
            for i in range(n):
                self.variation[0] = var_slew * self.variation[0] + (F(1.0) - var_slew) * self.targets[0]
                self.variation[1] = var_slew * self.variation[1] + (F(1.0) - var_slew) * self.targets[1]
                self.variation[2] = var_slew * self.variation[2] + (F(1.0) - var_slew) * self.targets[2]
                self.motion_phase += motion_inc
                if self.motion_phase > two_pi:
                    self.motion_phase -= four_pi

                dry = F(x[i])
                lfo = sin32(self.motion_phase + (F(0.0) if ch == 0 else F(0.85)))
                lfo_depth = (F(250.0) + F(550.0) * micro_var) * (F(0.5) + F(0.9) * depth)
                cutoff = jlimit(120.0, 4200.0,
                                F(900.0) + self.variation[0] * F(1100.0) * (F(0.6) + F(0.6) * depth)
                                + lfo * lfo_depth)
                lp_coeff = onepole_coeff32(cutoff, sr, max_hz=4200.0)
                lp += lp_coeff * (dry - lp)
                hp = dry - lp
                transient = dry - prev
                prev = dry

                transient_boost = F(1.0) + self.variation[1] * F(1.2) * (F(0.6) + F(0.7) * depth) \
                    + F(0.35) * micro_var * lfo * (F(0.6) + F(0.8) * depth)
                tone_shift = lp * (F(1.0) + self.variation[0] * F(0.65) * (F(0.55) + F(0.7) * depth)) \
                    + hp * transient_boost \
                    + transient * (F(0.12) + F(0.30) * micro_var) * (F(0.5) + F(0.8) * depth)
                tail = tone_shift + tail * jlimit(0.0, 0.93, tail_feedback + self.variation[2] * F(0.06))

                wet = tone_shift * repetition_scale * recovery \
                    + (F(0.26) + F(0.24) * micro_var) * (F(0.6) + F(0.7) * depth) * tail
                self.budget_env = budget_coeff * self.budget_env + (F(1.0) - budget_coeff) * abs(wet)
                budget_target = jmap5(contrast_budget, 0.0, 1.0, 0.8, 0.25)
                limiter_gain = budget_target / (self.budget_env + F(1.0e-5)) \
                    if self.budget_env > budget_target else F(1.0)
                wet *= limiter_gain

                wet_boost = F(1.0) + F(0.9) * micro_var * (F(0.55) + F(0.9) * depth)
                x[i] = (dry + mix * (wet * wet_boost - dry)) * out_gain
            self.tail[ch] = tail
            self.lp[ch] = lp
            self.prev[ch] = prev
        return out


class TextureOracle:
    """JuicyTexture (JuicyTexture/PluginProcessor.cpp:43-290)."""

    def __init__(self, sr, channels):
        self.sr = float(sr)
        self.channels = channels
        self.rng = np.uint32(0x12345678)
        self.max_delay = max(2048, int(sr * 0.08))
        self.ch = []
        for _ in range(2):
            self.ch.append(dict(
                tail=F(0.0), lp=F(0.0), hp=F(0.0), env=F(0.0), wet_env=F(0.0),
                noise_hp=F(0.0), dc_in=F(0.0), dc_out=F(0.0),
                protect_gain=F(1.0), spring_pos=F(0.0), spring_vel=F(0.0),
                flesh_pos_a=F(0.0), flesh_vel_a=F(0.0),
                flesh_pos_b=F(0.0), flesh_vel_b=F(0.0), prev_wave=F(0.0),
                modal_y1=np.zeros(4, np.float32), modal_y2=np.zeros(4, np.float32),
                waveguide=np.zeros(self.max_delay, np.float32), wave_idx=0))

    def _mode_step(self, st, mode_idx, excitation, freq_hz, t60, gain):
        sr = F(self.sr)
        f = jlimit(20.0, 0.45 * self.sr, F(freq_hz))
        t = max(F(0.02), F(t60))
        r = exp32(np.log(F(0.001)) / (t * sr))
        theta = F(2.0) * PI * f / sr
        a1 = F(2.0) * r * cos32(theta)
        a2 = -r * r
        y = F(excitation) * F(gain) + a1 * st["modal_y1"][mode_idx] + a2 * st["modal_y2"][mode_idx]
        st["modal_y2"][mode_idx] = st["modal_y1"][mode_idx]
        st["modal_y1"][mode_idx] = y
        return y

    def _waveguide_read(self, line, write_idx, delay_samples):
        size = len(line)
        pos = F(write_idx) - F(delay_samples)
        while pos < 0.0:
            pos += F(size)
        while pos >= size:
            pos -= F(size)
        i0 = int(pos)
        i1 = (i0 + 1) % size
        frac = pos - F(i0)
        return F(line[i0]) + frac * (F(line[i1]) - F(line[i0]))

    def process(self, buffer, material, tailshape, damping, weight, texture,
                mix, output):
        out = buffer.copy()
        sr = F(self.sr)
        mode = int(material)
        tail_shape, weight, texture, mix = map(F, (tailshape, weight, texture, mix))
        out_gain = db_to_gain(output)

        damping_amt = jlimit(0.0, 1.0, F(damping))
        damping_mul = jmap5(damping_amt, 0.0, 1.0, 1.35, 0.40)
        decay = jmap5(tail_shape, 0.0, 1.0, 0.30, 0.985) * jmap5(damping_amt, 0.0, 1.0, 1.0, 0.80)
        low_boost = F(1.0) + weight * F(1.0)
        split_low = onepole_coeff(140.0, self.sr)
        split_high = onepole_coeff(2600.0, self.sr)
        env_atk = tau_coeff(0.0025, self.sr)
        env_rel = tau_coeff(0.080, self.sr)
        wet_atk = tau_coeff(0.005, self.sr)
        wet_rel = tau_coeff(0.090, self.sr)
        dc_r = F(0.995)
        auto_gain_base = jmap5(texture, 0.0, 1.0, 0.78, 0.54)

        for ch in range(self.channels):
            st = self.ch[min(1, ch)]
            x = out[ch]
            for i in range(buffer.shape[1]):
                dry = F(x[i])
                trim_in = F(0.58) if mode == 1 else (F(0.62) if mode == 2 else (F(0.60) if mode == 3 else F(1.0)))
                driven = dry * trim_in
                adry = abs(dry)
                env_coeff = env_atk if adry > st["env"] else env_rel
                st["env"] = env_coeff * st["env"] + (F(1.0) - env_coeff) * adry
                impact = jlimit(0.0, 1.0, max(F(0.0), adry - st["env"]) * F(10.0))
                body = jlimit(0.0, 1.0, st["env"] * F(3.2))
                trail = jlimit(0.0, 1.0, F(1.0) - impact) * tail_shape

                st["lp"] += split_low * (driven - st["lp"])
                st["hp"] += split_high * (driven - st["hp"])
                low = st["lp"] * low_boost
                high = driven - st["hp"]
                mid = driven - st["lp"] - high
                core = low + mid + high * (F(0.9) + texture * F(1.3))

                shaped = core
                material_trim = F(1.0)
                if mode == 0:  # Gel
                    f0 = F(42.0) + texture * F(88.0)
                    omega = F(2.0) * PI * f0 / sr
                    k = omega * omega
                    zeta = jmap(trail, 0.62, 1.45)
                    c = F(2.0) * zeta * omega
                    force = core * (F(0.52) + F(0.62) * body)
                    acc = k * (force - st["spring_pos"]) - c * st["spring_vel"]
                    st["spring_vel"] += acc
                    st["spring_pos"] += st["spring_vel"]
                    shaped = F(0.48) * core + F(1.85) * st["spring_pos"]
                    shaped = np.tanh(shaped * (F(0.96) + F(0.28) * texture))
                elif mode == 1:  # Metal
                    exc = core * (F(0.19) + F(0.52) * impact)
                    f0 = F(320.0) + F(140.0) * texture
                    bend = F(1.0) + F(0.09) * impact
                    metal_damp = jmap5(damping_amt, 0.0, 1.0, 1.0, 0.55)
                    t_scale = jmap(tail_shape, 0.18, 0.72) * damping_mul * metal_damp
                    m0 = self._mode_step(st, 0, exc, f0 * F(1.00) * bend, F(0.56) * t_scale, 0.34)
                    m1 = self._mode_step(st, 1, exc, f0 * F(2.31) * bend, F(0.40) * t_scale, 0.20)
                    m2 = self._mode_step(st, 2, exc, f0 * F(4.18) * bend, F(0.26) * t_scale, 0.13)
                    m3 = self._mode_step(st, 3, exc, f0 * F(6.87) * bend, F(0.17) * t_scale, 0.09)
                    modes = m0 + m1 + m2 + m3
                    bright = F(0.03) * impact * (core - st["hp"])
                    shaped = (F(0.44) * core + F(0.42) * modes + bright) * (F(0.78) + F(0.10) * texture)
                    material_trim = F(0.62)
                elif mode == 2:  # Wood
                    exc = core * (F(0.10) + F(0.34) * impact)
                    cavity_hz = F(92.0) + F(95.0) * (F(0.5) * weight + F(0.5) * texture)
                    delay_samp = jlimit(16.0, float(len(st["waveguide"]) - 2), sr / cavity_hz)
                    delayed = self._waveguide_read(st["waveguide"], st["wave_idx"], delay_samp)
                    damp = jmap(tail_shape, 0.26, 0.90) * jmap5(damping_amt, 0.0, 1.0, 1.0, 0.72)
                    new_wave = damp * (F(0.62) * delayed + F(0.38) * st["prev_wave"]) \
                        + exc * (F(0.09) + F(0.04) * body)
                    st["waveguide"][st["wave_idx"]] = new_wave
                    st["wave_idx"] = (st["wave_idx"] + 1) % len(st["waveguide"])
                    st["prev_wave"] = delayed
                    wood_damp = jmap5(damping_amt, 0.0, 1.0, 1.0, 0.64)
                    t_scale = jmap(tail_shape, 0.18, 0.62) * damping_mul * wood_damp
                    w0 = self._mode_step(st, 0, exc, 155.0, F(0.40) * t_scale, 0.32)
                    w1 = self._mode_step(st, 1, exc, 355.0, F(0.27) * t_scale, 0.18)
                    w2 = self._mode_step(st, 2, exc, 690.0, F(0.16) * t_scale, 0.10)
                    w3 = self._mode_step(st, 3, exc, 1130.0, F(0.10) * t_scale, 0.06)
                    shaped = (F(0.56) * core + F(0.24) * delayed + F(0.30) * (w0 + w1 + w2 + w3)) \
                        * (F(0.74) + F(0.08) * texture)
                    material_trim = F(0.54)
                elif mode == 3:  # Plastic
                    exc = core * (F(0.20) + F(0.60) * impact)
                    tube_hz = F(210.0) + F(340.0) * texture
                    delay_samp = jlimit(8.0, float(len(st["waveguide"]) - 2), sr / tube_hz)
                    delayed = self._waveguide_read(st["waveguide"], st["wave_idx"], delay_samp)
                    damp = jmap(tail_shape, 0.22, 0.91) * jmap5(damping_amt, 0.0, 1.0, 1.0, 0.82)
                    new_wave = damp * (F(0.76) * delayed + F(0.24) * st["prev_wave"]) + F(0.14) * exc
                    st["waveguide"][st["wave_idx"]] = new_wave
                    st["wave_idx"] = (st["wave_idx"] + 1) % len(st["waveguide"])
                    st["prev_wave"] = delayed
                    t_scale = jmap(tail_shape, 0.16, 0.72) * damping_mul
                    p0 = self._mode_step(st, 0, exc, 280.0, F(0.28) * t_scale, 0.34)
                    p1 = self._mode_step(st, 1, exc, 690.0, F(0.18) * t_scale, 0.22)
                    p2 = self._mode_step(st, 2, exc, 1320.0, F(0.11) * t_scale, 0.16)
                    p3 = self._mode_step(st, 3, exc, 2360.0, F(0.07) * t_scale, 0.11)
                    shaped = (F(0.52) * core + F(0.36) * delayed + F(0.40) * (p0 + p1 + p2 + p3)) \
                        * (F(0.80) + F(0.10) * texture)
                    material_trim = F(0.62)
                else:  # Flesh-like
                    force = core * (F(0.55) + F(0.65) * body)
                    w_a = F(2.0) * PI * (F(38.0) + F(52.0) * texture) / sr
                    w_b = F(2.0) * PI * (F(88.0) + F(72.0) * texture) / sr
                    k_a = w_a * w_a
                    k_b = w_b * w_b
                    c_a = F(2.0) * jmap(tail_shape, 0.56, 1.18) * w_a
                    c_b = F(2.0) * jmap(tail_shape, 0.70, 1.34) * w_b
                    k_couple = F(0.14) + F(0.24) * texture
                    acc_a = k_a * (force - st["flesh_pos_a"]) - c_a * st["flesh_vel_a"] \
                        - k_couple * (st["flesh_pos_a"] - st["flesh_pos_b"])
                    acc_b = k_b * (st["flesh_pos_a"] - st["flesh_pos_b"]) - c_b * st["flesh_vel_b"]
                    st["flesh_vel_a"] += acc_a
                    st["flesh_vel_b"] += acc_b
                    st["flesh_pos_a"] += st["flesh_vel_a"]
                    st["flesh_pos_b"] += st["flesh_vel_b"]
                    tissue = F(0.92) * st["flesh_pos_a"] + F(0.58) * st["flesh_pos_b"]
                    nl = tissue - F(0.19) * tissue * tissue * tissue
                    shaped = np.tanh((F(0.50) * core + F(1.34) * nl) * (F(0.98) + F(0.16) * texture))

                self.rng = np.uint32(np.uint32(1664525) * self.rng + np.uint32(1013904223))
                white = F((self.rng >> np.uint32(8)) & np.uint32(0xFFFF)) / F(32768.0) - F(1.0)
                st["noise_hp"] += F(0.08) * (white - st["noise_hp"])
                rough = white - st["noise_hp"]
                shaped += rough * (F(0.004) + F(0.022) * texture) * (F(0.14) + F(0.64) * impact)

                dynamics = F(1.0) + impact * (F(0.18) + texture * F(0.12)) + body * F(0.06)
                shaped *= dynamics * material_trim

                tail_input = jlimit(-2.0, 2.0, shaped) * (F(0.45) + F(0.55) * trail)
                st["tail"] = tail_input + st["tail"] * decay
                wet = shaped + st["tail"] * (F(0.30) + F(0.45) * trail)

                wet_abs = abs(wet)
                wet_coeff = wet_atk if wet_abs > st["wet_env"] else wet_rel
                st["wet_env"] = wet_coeff * st["wet_env"] + (F(1.0) - wet_coeff) * wet_abs
                auto_comp = auto_gain_base / (F(1.0) + F(1.8) * st["wet_env"])
                wet *= jlimit(0.18, 1.0, auto_comp)

                mixed = dry + mix * (wet - dry)
                o = mixed * out_gain

                dc_blocked = o - st["dc_in"] + dc_r * st["dc_out"]
                st["dc_in"] = o
                st["dc_out"] = dc_blocked

                peak = abs(dc_blocked)
                if peak > F(0.88):
                    st["protect_gain"] = min(st["protect_gain"], (F(0.88) / peak) * F(0.98))
                else:
                    st["protect_gain"] += (F(1.0) - st["protect_gain"]) * F(0.0028)
                o = dc_blocked * jlimit(0.2, 1.0, st["protect_gain"])
                x[i] = jlimit(-0.98, 0.98, o)
        return out
