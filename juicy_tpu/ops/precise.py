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


def onepole_coeff32(freq_hz, sr, max_hz: float = None):
    """1 − exp(−2π·f/sr): drift-pinned one-pole coefficient (for
    per-sample-modulated cutoffs, e.g. JuicyMotion cpp:121).

    When the caller's cutoff is statically bounded (`max_hz`) and the
    sample rate keeps the argument inside [−0.7, 0], the half-cost
    narrow-domain exp is used (≤1 ulp from the wide form)."""
    if max_hz is not None and _TWO_PI * float(max_hz) / float(sr) <= 0.7:
        return F(1.0) - exp32_narrow(-_TWO_PI * freq_hz / F(sr))
    return F(1.0) - exp32(-_TWO_PI * freq_hz / F(sr))
