"""Drift-pinned transcendentals: cross-backend consistency + accuracy.

Guarantees (see ops/precise.py):
  * numpy and eager-jnp evaluation are BIT-identical — this covers the test
    oracles and XLA's trace-time constant folding, i.e. every block-constant
    resonator coefficient (the drift-critical use);
  * fully-jitted vector evaluation may differ by a few ulps (XLA's CPU/TPU
    codegen contracts/schedules the Horner chain differently) — the in-jit
    per-sample uses (Motion's LFO/cutoff) only feed contractive paths;
  * absolute accuracy matches libm class over the documented domains.
"""

import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.ops.precise import cos32, exp32, onepole_coeff32, sin32

F = np.float32


def test_exp32_numpy_eager_bit_identical():
    x = np.random.default_rng(0).uniform(-2.5, 0.0, 50000).astype(np.float32)
    np.testing.assert_array_equal(exp32(x), np.asarray(exp32(jnp.asarray(x))))


def test_cos32_numpy_eager_bit_identical():
    z = np.random.default_rng(1).uniform(0.0, 2.9, 50000).astype(np.float32)
    np.testing.assert_array_equal(cos32(z), np.asarray(cos32(jnp.asarray(z))))


def test_sin32_numpy_eager_bit_identical():
    x = np.random.default_rng(2).uniform(-7.1, 7.1, 50000).astype(np.float32)
    np.testing.assert_array_equal(sin32(x), np.asarray(sin32(jnp.asarray(x))))


def test_jit_within_ulps():
    """Jitted vector codegen may contract the Horner chain — bound the gap."""
    x = np.random.default_rng(3).uniform(-2.5, 0.0, 50000).astype(np.float32)
    je = np.asarray(jax.jit(exp32)(jnp.asarray(x))).astype(np.float64)
    ne = exp32(x).astype(np.float64)
    assert (np.abs(je - ne) / ne).max() < 1e-5
    z = np.random.default_rng(4).uniform(0.0, 2.9, 50000).astype(np.float32)
    jc = np.asarray(jax.jit(cos32)(jnp.asarray(z))).astype(np.float64)
    assert np.abs(jc - cos32(z).astype(np.float64)).max() < 2e-6


def test_accuracy_vs_float64():
    x = np.random.default_rng(5).uniform(-2.5, 0.0, 50000).astype(np.float32)
    rel = np.abs(exp32(x).astype(np.float64) - np.exp(x.astype(np.float64))) \
        / np.exp(x.astype(np.float64))
    assert rel.max() < 6e-6            # f32 cancellation at x≈−2.5
    assert rel[x > -1.0].max() < 3e-7

    z = np.random.default_rng(6).uniform(0.0, 2.9, 50000).astype(np.float32)
    err = np.abs(cos32(z).astype(np.float64) - np.cos(z.astype(np.float64)))
    assert err[z < 0.6].max() < 2e-7      # modal-angle domain
    assert err.max() < 2e-6               # extended domain

    y = np.random.default_rng(7).uniform(-7.1, 7.1, 50000).astype(np.float32)
    serr = np.abs(sin32(y).astype(np.float64) - np.sin(y.astype(np.float64)))
    assert serr.max() < 1e-6


def test_onepole_coeff32_domain():
    for sr in (44100.0, 48000.0):
        f = np.linspace(120.0, 16000.0, 200).astype(np.float32)
        c = onepole_coeff32(f, sr)
        ref = 1.0 - np.exp(-2.0 * np.pi * f.astype(np.float64) / sr)
        np.testing.assert_allclose(np.asarray(c, np.float64), ref,
                                   rtol=5e-6, atol=1e-7)
        assert np.all(np.asarray(c) > 0) and np.all(np.asarray(c) < 1)


def test_scalar_numpy_use():
    """Oracles feed np.float32 scalars — results must stay float32."""
    v = exp32(F(-0.01))
    assert np.asarray(v).dtype == np.float32
    s = sin32(F(3.3))
    assert abs(float(s) - np.sin(3.3)) < 1e-6
