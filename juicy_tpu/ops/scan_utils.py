"""Parallel (associative-scan) forms of first-order linear recurrences.

Every *linear* per-sample recurrence in the reference suite is an affine map
``y[n] = a[n]·y[n−1] + b[n]``; composing affine maps is associative, so the
whole block solves in O(log N) depth on the VPU instead of a length-N
sequential loop — the TPU-native replacement for the reference's per-sample
C++ loops (e.g. the one-pole tone filter at reference
src/plugins/JuicySaturator/PluginProcessor.cpp:93, the tail integrators at
JuicyCohere/PluginProcessor.cpp:115, and the band-split one-poles at
shared/JuicinessAnalyzer.cpp:79-84).

Numerically this reassociates the float32 recurrence; for the decay factors
used here (|a| ≤ 0.999) the drift is far below the −80 dBFS null-test budget
(validated in tests/test_ops.py against serial float32 oracles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_compose(f, g):
    """Compose affine maps applied in sequence: g∘f where f=(a1,b1) first."""
    a1, b1 = f
    a2, b2 = g
    return a2 * a1, a2 * b1 + b2


def linear_scan(a, b, init, axis: int = -1, reverse: bool = False):
    """Solve y[n] = a[n]·y[n−1] + b[n] along `axis` with y[−1] = init.

    `a` may be a scalar (broadcast) or an array matching `b`. Returns the
    full sequence of y values (same shape as `b`).
    """
    b = jnp.asarray(b, jnp.float32)
    a = jnp.broadcast_to(jnp.asarray(a, jnp.float32), b.shape)
    A, B = jax.lax.associative_scan(_affine_compose, (a, b), axis=axis,
                                    reverse=reverse)
    init = jnp.asarray(init, jnp.float32)
    if init.ndim < b.ndim:
        init = jnp.expand_dims(init, axis)
    return A * init + B


def onepole_lowpass(x, coeff, init, axis: int = -1):
    """One-pole smoother  y[n] = y[n−1] + coeff·(x[n] − y[n−1]).

    The ubiquitous reference primitive (band splits, tone filters, noise
    highpass pre-filters). `coeff` may be scalar or per-sample.
    """
    x = jnp.asarray(x, jnp.float32)
    coeff = jnp.asarray(coeff, jnp.float32)
    return linear_scan(jnp.float32(1.0) - coeff, coeff * x, init, axis=axis)


def leaky_integrator(x, decay, init, axis: int = -1):
    """Tail integrator  y[n] = x[n] + decay·y[n−1].

    Used by JuicyTexture's tail (reference JuicyTexture/PluginProcessor.cpp:249),
    JuicyCohere's tail (JuicyCohere/PluginProcessor.cpp:115) and JuicyMotion's
    tail feedback (JuicyMotion/PluginProcessor.cpp:131).
    """
    return linear_scan(decay, x, init, axis=axis)


def _matrix_affine_compose(f, g):
    """Compose affine maps x ↦ A·x + b applied in sequence (f first).

    precision=HIGHEST: TPU matmuls otherwise run at reduced (bf16-pass)
    precision, which the resonator Q amplifies.
    """
    a1, b1 = f
    a2, b2 = g
    hi = jax.lax.Precision.HIGHEST
    a = jnp.einsum("...ij,...jk->...ik", a2, a1, precision=hi)
    b = jnp.einsum("...ij,...j->...i", a2, b1, precision=hi) + b2
    return a, b


def linear_matrix_scan(mats, vecs, init):
    """Solve x[n] = A[n]·x[n−1] + b[n] in O(log N) depth.

    `mats`: [N, ..., d, d], `vecs`: [N, ..., d], `init`: [..., d] (time first).
    Returns xs [N, ..., d]. This is the parallel-in-time form for 2-pole
    resonators (state [y, y₋₁], reference JuicyTexture/PluginProcessor.cpp:77-89)
    and the gel/flesh spring systems.

    Accuracy note: companion-matrix products have entries up to ~1/sin(θ)
    (θ = pole angle), so f32 reassociation error scales like
    ε·Q/sin(θ) — fine for moderate-Q/mid-frequency modes (≲1e-5 at Q≈50),
    but the reference's high-Q low-frequency modal banks exceed the −80 dBFS
    budget, which is why texture's production path keeps the sequential
    channel-vectorized scan (models/texture.py). Use this form for
    throughput-over-fidelity workloads or lower-Q systems.
    """
    mats = jnp.asarray(mats, jnp.float32)
    vecs = jnp.asarray(vecs, jnp.float32)
    A, B = jax.lax.associative_scan(_matrix_affine_compose, (mats, vecs),
                                    axis=0)
    init = jnp.asarray(init, jnp.float32)
    return jnp.einsum("n...ij,...j->n...i", A, init,
                      precision=jax.lax.Precision.HIGHEST) + B


def default_unroll(fallback: int = 8) -> int:
    """Scan unroll factor. Unrolling speeds up TPU scans ~2x but inflates
    trace/compile time ~linearly; the test suite sets JUICY_SCAN_UNROLL=1
    (semantics are unroll-independent) so the 1-core CI box traces fast."""
    import os
    try:
        return max(1, int(os.environ.get("JUICY_SCAN_UNROLL", fallback)))
    except ValueError:
        return fallback
