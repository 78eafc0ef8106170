"""Nonlinear per-sample envelope recurrences.

Attack/release envelope followers branch on ``input > env`` per sample
(reference src/shared/JuicinessAnalyzer.cpp:24-29, and the fast/slow pair at
src/plugins/JuicyPunch/PluginProcessor.cpp:96-97), so unlike the linear
one-poles they cannot be associatively scanned exactly. They run as a
``lax.scan`` over time with a tiny carry; all leading axes (batch, channels)
stay vectorized, so on TPU each scan step is a full-width VPU op across the
batch — throughput comes from clip parallelism, exactly as the reference gets
parallelism from independent plugin instances across DAW tracks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ar_envelope(x, attack_coeff, release_coeff, init, axis: int = -1,
                unroll: "int | None" = None):
    """env[n] = (1−c)·x[n] + c·env[n−1],  c = attack if x[n] > env[n−1] else release.

    Returns the full envelope sequence (same shape as x). `x` is expected
    non-negative (callers pass |x|). `init` has the shape of x without `axis`.
    """
    x = jnp.asarray(x, jnp.float32)
    x_t = jnp.moveaxis(x, axis, 0)
    attack_coeff = jnp.float32(attack_coeff)
    release_coeff = jnp.float32(release_coeff)

    def step(env, xi):
        c = jnp.where(xi > env, attack_coeff, release_coeff)
        env2 = (jnp.float32(1.0) - c) * xi + c * env
        return env2, env2

    from juicy_tpu.ops.scan_utils import default_unroll
    _, envs = jax.lax.scan(step, jnp.asarray(init, jnp.float32), x_t,
                           unroll=default_unroll() if unroll is None else unroll)
    return jnp.moveaxis(envs, 0, axis)


def ar_envelope_relaxed(x, attack_coeff, release_coeff, init, axis: int = -1,
                        iters: int = 2):
    """Block-parallel attack/release envelope (the ``fidelity="relaxed"``
    tier of :func:`ar_envelope`): O(iters·log N) depth instead of a
    length-N sequential scan.

    The exact recurrence branches on ``x[n] > env[n−1]`` per sample, which
    breaks associativity. Relaxation: fix the branch pattern from the
    previous iterate and solve the resulting LINEAR time-varying recurrence
    with an associative scan, then refine:

      env⁰ = assoc-scan with c = release everywhere   (slowest coefficient:
             env⁰ ≤ exact env wherever attack is faster, so the x>env test
             errs toward ATTACK — the aggressive side)
      envᵏ = assoc-scan with c[n] = attack if x[n] > envᵏ⁻¹[n−1] else release

    The branch pattern stabilizes except within a few samples of each
    attack/release crossing; with iters=2 the measured error on program
    material is below −60 dBFS of envelope amplitude (test_ops.py
    ``test_ar_envelope_relaxed``), and both coefficients contract, so
    errors decay instead of accumulating across blocks. Exact when
    attack == release (single linear scan).
    """
    from juicy_tpu.ops.scan_utils import linear_scan
    x = jnp.asarray(x, jnp.float32)
    x_t = jnp.moveaxis(x, axis, 0)
    attack_coeff = jnp.float32(attack_coeff)
    release_coeff = jnp.float32(release_coeff)
    init = jnp.asarray(init, jnp.float32)
    one = jnp.float32(1.0)

    env = linear_scan(release_coeff, (one - release_coeff) * x_t, init,
                      axis=0)
    for _ in range(max(1, iters)):
        prev = jnp.concatenate([init[None], env[:-1]], axis=0)
        c = jnp.where(x_t > prev, attack_coeff, release_coeff)
        env = linear_scan(c, (one - c) * x_t, init, axis=0)
    return jnp.moveaxis(env, 0, axis)


def ar_envelope_final(x, attack_coeff, release_coeff, init, axis: int = -1,
                      unroll: "int | None" = None):
    """Like :func:`ar_envelope` but returns only the final envelope state."""
    x = jnp.asarray(x, jnp.float32)
    x_t = jnp.moveaxis(x, axis, 0)
    attack_coeff = jnp.float32(attack_coeff)
    release_coeff = jnp.float32(release_coeff)

    def step(env, xi):
        c = jnp.where(xi > env, attack_coeff, release_coeff)
        return (jnp.float32(1.0) - c) * xi + c * env, None

    from juicy_tpu.ops.scan_utils import default_unroll
    env, _ = jax.lax.scan(step, jnp.asarray(init, jnp.float32), x_t,
                          unroll=default_unroll() if unroll is None else unroll)
    return env
