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


# --- round-4 wide-domain per-sample transcendentals ------------------------

from juicy_tpu.ops.precise import exp2_32, exp_pos32, log2_32, log32, pow32, tanh32


def test_tanh32_accuracy_and_saturation():
    x = np.random.default_rng(8).uniform(-88.0, 88.0, 200000).astype(np.float32)
    err = np.abs(tanh32(x).astype(np.float64) - np.tanh(x.astype(np.float64)))
    assert err.max() < 2e-7              # −134 dBFS; XLA:TPU builtin is 4.4e-5
    assert tanh32(F(0.0)) == 0.0
    assert tanh32(F(50.0)) == 1.0 and tanh32(F(-50.0)) == -1.0


def test_pow32_accuracy():
    rng = np.random.default_rng(9)
    a = rng.uniform(1e-6, 4.0, 200000).astype(np.float32)
    b = rng.uniform(0.25, 1.0, 200000).astype(np.float32)
    ref = np.power(a.astype(np.float64), b.astype(np.float64))
    rel = np.abs(pow32(a, b).astype(np.float64) - ref) / ref
    assert rel.max() < 1e-6
    # a == 0 underflows to ~2^-125 ≈ 0 on the audio scale (C++ powf gives 0)
    assert pow32(F(0.0), F(0.7)) < 1e-26


def test_exp2_log2_accuracy():
    rng = np.random.default_rng(10)
    x = rng.uniform(-20.0, 20.0, 200000).astype(np.float32)
    ref = np.exp2(x.astype(np.float64))
    assert (np.abs(exp2_32(x).astype(np.float64) - ref) / ref).max() < 1e-6
    e = rng.uniform(-18.0, 0.0, 200000).astype(np.float32)
    r = np.exp(e.astype(np.float64))
    assert (np.abs(exp_pos32(e).astype(np.float64) - r) / r).max() < 2e-6
    l = rng.uniform(1e-6, 1e4, 200000).astype(np.float32)
    assert np.abs(log2_32(l).astype(np.float64)
                  - np.log2(l.astype(np.float64))).max() < 1e-6
    assert np.abs(log32(l).astype(np.float64)
                  - np.log(l.astype(np.float64))).max() < 1e-6


def test_scalar_jax_path_matches_vector_path():
    # Mosaic rejects tpu.bitcast on scalars, so jax scalars take the exact
    # power-of-two-ladder path — results must be bit-identical to the
    # vector bit-manipulation path.
    import jax
    vals = np.array([-9.5, -1.0, -0.03, 0.0, 0.7, 3.1, 17.0, 88.0],
                    np.float32)
    vec_t = np.asarray(tanh32(jnp.asarray(vals)))
    for i, v in enumerate(vals):
        s = jax.jit(tanh32)(jnp.float32(v))
        assert float(s) == float(vec_t[i]), v
    pos = np.array([1e-30, 1e-20, 0.3, 0.9999, 1.0, 1.5, 7.0, 1e20],
                   np.float32)
    vec_l = np.asarray(log2_32(jnp.asarray(pos)))
    for i, v in enumerate(pos):
        s = jax.jit(log2_32)(jnp.float32(v))
        assert float(s) == float(vec_l[i]), v


def test_scalar_ops_lower_in_pallas_kernel():
    # tanh32/pow32 on SMEM scalars inside a Pallas kernel (the punch
    # shaper's tanh32(drive) shape) must lower — interpret mode here;
    # compiled lowering is exercised by tools/certify_onchip.py.
    import jax
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        drive = x_ref[0, 0] * jnp.float32(3.0) + jnp.float32(1.0)
        o_ref[...] = (tanh32(x_ref[...] * drive) / tanh32(drive)
                      + pow32(x_ref[0, 1] + jnp.float32(1.2), drive))

    x = np.linspace(-0.9, 0.9, 8 * 128, dtype=np.float32).reshape(8, 128)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True)(jnp.asarray(x))
    drive = np.float32(x[0, 0] * np.float32(3.0) + np.float32(1.0))
    ref = (np.asarray(tanh32(jnp.asarray(x * drive)))
           / float(jax.jit(tanh32)(jnp.float32(drive)))
           + float(jax.jit(pow32)(jnp.float32(x[0, 1] + np.float32(1.2)),
                                  jnp.float32(drive))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_round4_ops_numpy_eager_bit_identical():
    rng = np.random.default_rng(11)
    x = rng.uniform(-12.0, 12.0, 50000).astype(np.float32)
    np.testing.assert_array_equal(tanh32(x), np.asarray(tanh32(jnp.asarray(x))))
    a = rng.uniform(1e-6, 4.0, 50000).astype(np.float32)
    b = rng.uniform(0.25, 1.0, 50000).astype(np.float32)
    np.testing.assert_array_equal(
        pow32(a, b), np.asarray(pow32(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_array_equal(log2_32(a), np.asarray(log2_32(jnp.asarray(a))))
