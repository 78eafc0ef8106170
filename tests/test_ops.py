"""Unit tests: DSP primitives vs serial float32 references (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from juicy_tpu.ops.scan_utils import linear_scan, onepole_lowpass, leaky_integrator
from juicy_tpu.ops.envelopes import ar_envelope, ar_envelope_final
from juicy_tpu.ops.noise import lcg_sequence, lcg_advance, white_from_bits
from juicy_tpu.ops.delays import block_delay_read, update_tail_window

F = np.float32


def test_linear_scan_matches_serial():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(999).astype(np.float32)
    a = rng.uniform(0.3, 0.99, 999).astype(np.float32)
    init = F(0.7)
    y = np.empty_like(x)
    prev = init
    for i in range(len(x)):
        prev = a[i] * prev + x[i]
        y[i] = prev
    got = np.asarray(linear_scan(jnp.asarray(a), jnp.asarray(x), init))
    np.testing.assert_allclose(got, y, rtol=2e-5, atol=2e-6)


def test_onepole_matches_serial():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048).astype(np.float32)
    coeff = F(0.032)   # ~250 Hz @ 48k
    init = F(0.1)
    y = np.empty_like(x)
    s = init
    for i in range(len(x)):
        s += coeff * (x[i] - s)
        y[i] = s
    got = np.asarray(onepole_lowpass(jnp.asarray(x), coeff, init))
    np.testing.assert_allclose(got, y, rtol=1e-5, atol=1e-6)


def test_leaky_integrator_matches_serial():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(512).astype(np.float32)
    decay = F(0.93)
    y = np.empty_like(x)
    t = F(0.0)
    for i in range(len(x)):
        t = x[i] + t * decay
        y[i] = t
    got = np.asarray(leaky_integrator(jnp.asarray(x), decay, 0.0))
    np.testing.assert_allclose(got, y, rtol=2e-5, atol=1e-5)


def test_ar_envelope_matches_serial():
    rng = np.random.default_rng(4)
    x = np.abs(rng.standard_normal(1024)).astype(np.float32)
    atk, rel = F(0.8), F(0.99)
    env = F(0.0)
    ref = np.empty_like(x)
    for i in range(len(x)):
        c = atk if x[i] > env else rel
        env = (F(1.0) - c) * x[i] + c * env
        ref[i] = env
    got = np.asarray(ar_envelope(jnp.asarray(x), atk, rel, 0.0))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    final = np.asarray(ar_envelope_final(jnp.asarray(x), atk, rel, 0.0))
    np.testing.assert_allclose(final, ref[-1], rtol=1e-6)


def test_ar_envelope_batched():
    rng = np.random.default_rng(5)
    x = np.abs(rng.standard_normal((3, 2, 256))).astype(np.float32)
    got = np.asarray(ar_envelope(jnp.asarray(x), 0.5, 0.9, np.zeros((3, 2), np.float32)))
    assert got.shape == x.shape
    single = np.asarray(ar_envelope(jnp.asarray(x[1, 1]), 0.5, 0.9, 0.0))
    np.testing.assert_allclose(got[1, 1], single, rtol=1e-6)


def test_lcg_bit_exact():
    seed = np.uint32(0x12345678)
    n = 300
    ref_states = []
    r = seed
    for _ in range(n):
        r = np.uint32(np.uint32(1664525) * r + np.uint32(1013904223))
        ref_states.append(r)
    got = np.asarray(lcg_sequence(seed, n))
    np.testing.assert_array_equal(got, np.array(ref_states, np.uint32))
    assert np.uint32(np.asarray(lcg_advance(seed, n))) == ref_states[-1]
    # texture white mapping
    white = np.asarray(white_from_bits(jnp.asarray(got)))
    ref_white = np.array([F((s >> np.uint32(8)) & np.uint32(0xFFFF)) / F(32768.0) - F(1.0)
                          for s in ref_states], np.float32)
    np.testing.assert_array_equal(white, ref_white)


def test_block_delay_matches_ring_buffer():
    rng = np.random.default_rng(6)
    d_buf = 97
    n = 64
    delay = 23
    ring = np.zeros(d_buf, np.float32)
    wpos = 0
    window = np.zeros(d_buf, np.float32)
    outs, refs = [], []
    for _ in range(5):
        x = rng.standard_normal(n).astype(np.float32)
        ref = np.empty_like(x)
        for i in range(n):
            ring[wpos] = x[i]
            rp = wpos - delay
            if rp < 0:
                rp += d_buf
            ref[i] = ring[rp]
            wpos = (wpos + 1) % d_buf
        got = np.asarray(block_delay_read(jnp.asarray(window), jnp.asarray(x), delay))
        window = np.asarray(update_tail_window(jnp.asarray(window), jnp.asarray(x)))
        outs.append(got)
        refs.append(ref)
    np.testing.assert_array_equal(np.concatenate(outs), np.concatenate(refs))


def test_linear_matrix_scan_modal_resonator():
    """2x2 matrix scan == serial 2-pole modal resonator."""
    from juicy_tpu.ops.scan_utils import linear_matrix_scan
    rng = np.random.default_rng(9)
    n = 400
    exc = rng.standard_normal(n).astype(np.float32) * 0.3
    # moderate-Q mid-frequency mode (see linear_matrix_scan accuracy note)
    r, theta = 0.98, 0.3
    a1, a2, g = F(2 * r * np.cos(theta)), F(-(r * r)), F(0.34)
    # serial reference: y = g*e + a1*y1 + a2*y2
    y1 = y2 = F(0.0)
    ref = np.empty(n, np.float32)
    for i in range(n):
        y = g * exc[i] + a1 * y1 + a2 * y2
        y2, y1 = y1, y
        ref[i] = y
    mats = np.broadcast_to(np.array([[a1, a2], [1.0, 0.0]], np.float32),
                           (n, 2, 2))
    vecs = np.stack([g * exc, np.zeros(n, np.float32)], axis=-1)
    xs = np.asarray(linear_matrix_scan(jnp.asarray(mats), jnp.asarray(vecs),
                                       jnp.zeros(2)))
    np.testing.assert_allclose(xs[:, 0], ref, rtol=2e-4, atol=2e-5)


def test_block_delay_zero_delay_is_identity():
    x = np.arange(32, dtype=np.float32)
    window = np.full(8, -1.0, np.float32)
    got = np.asarray(block_delay_read(jnp.asarray(window), jnp.asarray(x), 0))
    np.testing.assert_array_equal(got, x)
