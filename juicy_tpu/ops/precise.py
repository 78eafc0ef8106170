"""Consistency-first float32 transcendentals for recurrence coefficients.

Why this exists: libm (numpy/C++) and XLA evaluate exp/cos/sin with different
polynomial kernels, so results differ by ~1 ulp. For *contractive* recurrences
(envelopes, one-poles) that is irrelevant — errors decay. But resonator pole
coefficients (JuicyTexture's modal banks, reference
JuicyTexture/PluginProcessor.cpp:77-89) convert a 1-ulp radius/angle
difference into amplitude/phase drift that grows linearly with time, and
JuicyMotion's per-sample LFO sin + cutoff exp
(JuicyMotion/PluginProcessor.cpp:118-122) feed a near-unity feedback path.
Any reimplementation — even a second C++ build against a different libm —
drifts the same way; the fix is to pin ONE evaluation.

These are plain-f32 Horner polynomials using only IEEE mul/add. numpy and
eager-jnp evaluation are BIT-identical — which covers the two places that
matter for drift: the test oracles, and XLA's trace-time *constant folding*
of every block-constant coefficient (resonator radii/angles). Fully-jitted
vector evaluation may still differ by a few ulps (XLA contracts/schedules
the chain in compiled loops); the only in-jit per-sample uses (Motion's LFO
sin and cutoff exp) feed contractive paths where ulps decay. Validated in
tests/test_ops_precise.py. They work on numpy scalars/arrays and jnp tracers
alike; absolute accuracy is libm-class over the documented domains, so
fidelity to the C++ reference is unchanged while null tests become stable.

Domains:
  exp32: x ∈ [−2.5, 0]     (pole radii, envelope/one-pole coefficients)
  cos32: |z| ≤ 2.9          (modal angles θ = 2πf/sr, f ≤ 0.45·sr)
  sin32: |x| ≤ 7.2          (LFO phase in (−2π, 2π] plus channel offset)

Round-4 addition — libm-class PER-SAMPLE transcendentals for the TPU hot
path (tanh32 / exp2_32 / log2_32 / pow32 / exp_pos32 / log32). Measured on
TPU v5 lite: XLA's built-in f32 kernels are fast approximations — tanh
4.4e-5 abs error (−87 dBFS by itself), log 1.1e-4 abs, pow/exp ~5e-6 rel —
while the compiled reference C++ (glibc tanhf/powf,
e.g. JuicyPunch/PluginProcessor.cpp:105-108) is correctly rounded. That
single gap put BOTH on-chip executors at ~−80 dBFS median vs the C++ oracle
(CPP_NULL_REPORT.json: chain_onchip_smoke) while kernel-vs-fused sat at −93:
the error is the math library, not the kernels. These implementations use
only IEEE mul/add/div plus exact int bit manipulation (exponent
scaling/extraction), all of which are bit-identical between XLA:TPU and
Mosaic, and reach ~1e-7 absolute (tanh; −139 dBFS) / ~6e-7 relative
(pow/exp/log) — restoring libm-class fidelity on-chip at a handful of extra
VPU ops per call.

Wide-domain accuracy (validated in tests/test_ops_precise.py):
  tanh32 : |x| ≤ 88        max abs err ≤ 2e-7 vs float64
  exp2_32: |x| ≤ 125       max rel err ≤ 1e-6
  log2_32: x ∈ (1e-38, 3e38)  max abs err ≤ 4e-7 (in log2 units)
  pow32  : a > 0           max rel err ≈ |b·log2 a|·2e-7 + 1e-6
"""

from __future__ import annotations

import numpy as np

F = np.float32
_PI = F(3.14159265358979323846)
_TWO_PI = F(2.0 * 3.14159265358979323846)
_HALF_PI = F(0.5 * 3.14159265358979323846)


def _where(cond, a, b):
    """Backend-dispatching where (jnp for traced/jax arrays, numpy otherwise)."""
    try:
        import jax
        import jax.numpy as jnp
        if isinstance(cond, jax.Array) or isinstance(cond, jax.core.Tracer):
            return jnp.where(cond, a, b)
    except ImportError:
        pass
    return np.where(cond, a, b)


# Taylor coefficients in float32 (exact rationals rounded once).
import math as _math

_EXP_C = [F(1.0 / _math.factorial(k)) for k in range(19)]          # deg 18
_COS_C = [F((-1.0) ** k / _math.factorial(2 * k)) for k in range(11)]   # deg 20
_SIN_C = [F((-1.0) ** k / _math.factorial(2 * k + 1)) for k in range(7)]  # deg 13


def exp32(x):
    """exp(x) for x ∈ [−2.5, 0], f32 Horner (error ≲ 2e-6 rel at −2.5,
    < 1e-7 for |x| < 1 — the envelope/one-pole coefficient domain)."""
    acc = _EXP_C[-1]
    for c in _EXP_C[-2::-1]:
        acc = acc * x + c
    return acc


def cos32(z):
    """cos(z) for |z| ≤ 2.9, f32 even-Horner in u = z²."""
    u = z * z
    acc = _COS_C[-1]
    for c in _COS_C[-2::-1]:
        acc = acc * u + c
    return acc


def _sin_kernel(x):
    u = x * x
    acc = _SIN_C[-1]
    for c in _SIN_C[-2::-1]:
        acc = acc * u + c
    return x * acc


def sin32(x):
    """sin(x) for |x| ≤ 7.2, with branch-free f32 range reduction."""
    # reduce to [−π, π]
    x = _where(x > _PI, x - _TWO_PI, x)
    x = _where(x > _PI, x - _TWO_PI, x)
    x = _where(x < -_PI, x + _TWO_PI, x)
    x = _where(x < -_PI, x + _TWO_PI, x)
    # fold to [−π/2, π/2]: sin(π − x) = sin(x)
    x = _where(x > _HALF_PI, _PI - x, x)
    x = _where(x < -_HALF_PI, -_PI - x, x)
    return _sin_kernel(x)


def exp32_narrow(x):
    """exp(x) for x ∈ [−0.7, 0]: degree-9 truncation of the same Taylor
    family as exp32. The first dropped term (x¹⁰/10! ≈ 8e-9 at −0.7) is
    below one f32 ulp on this domain, so the narrow form agrees with
    exp32/libm at the ≤1-ulp level while costing half the FMAs — this is
    the per-sample hot path of motion's modulated cutoff coefficient."""
    acc = _EXP_C[9]
    for c in _EXP_C[8::-1]:
        acc = acc * x + c
    return acc


# ---------------------------------------------------------------------------
# Wide-domain per-sample transcendentals (round 4). Backend-dispatching bit
# manipulation: numpy uses .view, jax uses lax.bitcast_convert_type — the
# integer ops themselves are exact, so both backends agree bit-for-bit up to
# FMA contraction of the Horner chains (a few output ulps).

def _is_jax(x) -> bool:
    try:
        import jax
        return isinstance(x, (jax.Array, jax.core.Tracer))
    except ImportError:  # pragma: no cover
        return False


def _f2i(x):
    if _is_jax(x):
        import jax
        import jax.numpy as jnp
        return jax.lax.bitcast_convert_type(x, jnp.int32)
    return np.asarray(x, np.float32).view(np.int32)


def _i2f(i):
    if _is_jax(i):
        import jax
        import jax.numpy as jnp
        return jax.lax.bitcast_convert_type(i, jnp.float32)
    return np.asarray(i, np.int32).view(np.float32)


def _rint(x):
    """Round to nearest (half-even), returned as float32."""
    if _is_jax(x):
        import jax.numpy as jnp
        return jnp.round(x)
    return np.rint(np.asarray(x, np.float32)).astype(np.float32)


def _i32(x):
    if _is_jax(x):
        import jax.numpy as jnp
        return x.astype(jnp.int32)
    return np.asarray(x).astype(np.int32)


def _f32c(x):
    if _is_jax(x):
        import jax.numpy as jnp
        return x.astype(jnp.float32)
    return np.asarray(x).astype(np.float32)


def _clip(x, lo, hi):
    if _is_jax(x):
        import jax.numpy as jnp
        return jnp.clip(x, lo, hi)
    return np.clip(x, lo, hi)


_LOG2E = F(1.4426950408889634)          # log2(e), rounded once to f32
_LN2 = F(0.6931471805599453)
_SQRT2 = F(_math.sqrt(2.0))
# 2^r = exp(r·ln2), Taylor degree 8 on r ∈ [−0.5, 0.5] (trunc error ≈ 5e-10)
_EXP2_C = [F(_math.log(2.0) ** k / _math.factorial(k)) for k in range(9)]
# log2(m) = (2/ln2)·atanh(s), s = (m−1)/(m+1) ∈ [−0.172, 0.172]
_LOG2_C = [F(2.0 / _math.log(2.0) / (2 * k + 1)) for k in range(6)]
# Power-of-two ladder steps 64..1 for the bitcast-free SCALAR paths below.
# Mosaic's tpu.bitcast only lowers for vectors; scalar operands (SMEM
# params, e.g. tanh32(drive) in the punch shaper) take these ladders
# instead. Every step multiplies/divides by an exact power of two, so the
# ladder is EXACT — scalar and vector paths agree bit-for-bit.
_POW2_STEPS = [(F(2.0 ** s), s) for s in (64, 32, 16, 8, 4, 2, 1)]


def _is_scalar_jax(x) -> bool:
    return _is_jax(x) and getattr(x, "ndim", 1) == 0


def _exp2_int_scalar(k):
    """Exact 2^k for integer-valued f32 scalar k ∈ [−125, 125], computed
    as a 7-step binary ladder of exact power-of-two multiplies (no int
    bitcast, which Mosaic rejects on scalars)."""
    import jax.numpy as jnp
    n = k.astype(jnp.int32)
    neg = n < 0
    a = jnp.where(neg, -n, n)
    p = jnp.float32(1.0)
    for f, s in _POW2_STEPS:
        p = jnp.where((a & s) != 0, p * f, p)
    return jnp.where(neg, jnp.float32(1.0) / p, p)


def _frexp_scalar(x):
    """(m, e) with x = m·2^e, m ∈ [1, 2), for f32 scalar x ≥ 1e-35 —
    binary-search normalization by exact power-of-two multiplies (no
    bitcast). Same result as the vector exponent-extraction path."""
    import jax.numpy as jnp
    sub = x < F(1.0)
    e = jnp.where(sub, jnp.int32(-120), jnp.int32(0))
    m = jnp.where(sub, x * F(2.0 ** 120), x)
    for f, s in _POW2_STEPS:
        big = m >= f
        m = jnp.where(big, m * (F(1.0) / f), m)
        e = e + jnp.where(big, jnp.int32(s), jnp.int32(0))
    return m, e


def exp2_32(x):
    """2^x for |x| ≤ 125, ≤ ~1e-6 rel err: exact exponent scale via int
    bits (vector) or the power-of-two ladder (scalar), degree-8 f32 Horner
    for the fractional part."""
    x = _clip(x, F(-125.0), F(125.0))
    k = _rint(x)
    r = x - k
    acc = _EXP2_C[-1]
    for c in _EXP2_C[-2::-1]:
        acc = acc * r + c
    if _is_scalar_jax(x):
        two_k = _exp2_int_scalar(k)
    else:
        two_k = _i2f((_i32(k) + 127) << 23)
    return acc * two_k


def log2_32(x):
    """log2(x) for normal positive x, ≤ ~4e-7 abs err (in log2 units):
    exact exponent extraction (int bits for vectors, power-of-two ladder
    for scalars) + atanh-series mantissa on [√2/2, √2]."""
    if _is_scalar_jax(x):
        m, e = _frexp_scalar(x)
    else:
        bits = _f2i(x)
        e = ((bits >> 23) & 0xFF) - 127
        m = _i2f((bits & 0x7FFFFF) | 0x3F800000)
    big = m > _SQRT2
    m = _where(big, m * F(0.5), m)
    e = e + _i32(big)
    s = (m - F(1.0)) / (m + F(1.0))
    u = s * s
    acc = _LOG2_C[-1]
    for c in _LOG2_C[-2::-1]:
        acc = acc * u + c
    return _f32c(e) + s * acc


def pow32(a, b):
    """a^b for a > 0 via exp2(b·log2 a). Matches glibc powf within
    ~1e-6 rel for the suite's domains (curve exponents, band compensation,
    dB→gain). a = 0 returns ~2^−125 ≈ 0 on the audio scale."""
    return exp2_32(b * log2_32(a))


def exp_pos32(x):
    """exp(x) over the full f32-representable domain via exp2."""
    return exp2_32(x * _LOG2E)


def log32(x):
    """Natural log via log2 (≤ ~6e-7 abs err)."""
    return log2_32(x) * _LN2


def tanh32(x):
    """tanh(x), max abs err ≤ 2e-7 (−134 dBFS) on |x| ≤ 88 — the
    drift-pinned replacement for XLA:TPU's 4.4e-5-error fast tanh.
    Formula: sign(x)·(1 − 2/(e^{2|x|} + 1)); saturates exactly to ±1
    beyond |x| > 9.1 (where tanhf rounds to 1.0f)."""
    if _is_jax(x):
        import jax.numpy as jnp
        ax, sign = jnp.abs(x), jnp.sign(x)
    else:
        ax, sign = np.abs(x), np.sign(np.asarray(x, np.float32))
    e2 = exp2_32(ax * (F(2.0) * _LOG2E))
    t = F(1.0) - F(2.0) / (e2 + F(1.0))
    t = _where(ax > F(9.1), F(1.0), t)
    return sign * t


def onepole_coeff32(freq_hz, sr, max_hz: float = None):
    """1 − exp(−2π·f/sr): drift-pinned one-pole coefficient (for
    per-sample-modulated cutoffs, e.g. JuicyMotion cpp:121).

    When the caller's cutoff is statically bounded (`max_hz`) and the
    sample rate keeps the argument inside [−0.7, 0], the half-cost
    narrow-domain exp is used (≤1 ulp from the wide form)."""
    if max_hz is not None and _TWO_PI * float(max_hz) / float(sr) <= 0.7:
        return F(1.0) - exp32_narrow(-_TWO_PI * freq_hz / F(sr))
    return F(1.0) - exp32(-_TWO_PI * freq_hz / F(sr))
