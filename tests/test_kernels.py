"""Pallas fused-kernel equivalence tests (interpret mode on the CPU mesh).

The scan implementations are the oracles here: each fused kernel must match
its lax.scan counterpart, which is itself golden-tested against the C++
formula oracles (tests/test_analyzer.py, tests/test_processors.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from juicy_tpu.analyzer import analyze, analyzer_init
from juicy_tpu.kernels.analyzer_kernel import TILE, analyze_fused
from tests.conftest import make_clip

SR = 48000.0
BLOCK = 256


def _batched_state(b):
    return jax.vmap(lambda _: analyzer_init())(jnp.arange(b))


def test_fused_analyzer_matches_scan(rng):
    b = TILE
    clips = np.stack([make_clip(rng, 2, BLOCK) for _ in range(8)] * (b // 8))
    state = _batched_state(b)
    st_ref, m_ref = jax.vmap(lambda s, x: analyze(s, x, SR))(state, jnp.asarray(clips))
    st_k, m_k = analyze_fused(state, jnp.asarray(clips), SR, interpret=True)
    for f in ("score", "punch", "clarity", "width", "mono_safety",
              "repetition_density", "fatigue_risk"):
        np.testing.assert_allclose(np.asarray(m_k[f]), np.asarray(m_ref[f]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"metric {f}")
    for f in ("short_env", "long_env", "low_state", "high_state"):
        np.testing.assert_allclose(np.asarray(st_k[f]), np.asarray(st_ref[f]),
                                   rtol=1e-6, atol=1e-7, err_msg=f"state {f}")
    np.testing.assert_array_equal(np.asarray(st_k["onset_cooldown"]),
                                  np.asarray(st_ref["onset_cooldown"]))


def test_fused_analyzer_state_carry(rng):
    """Two consecutive fused blocks == two consecutive scan blocks."""
    b = TILE
    clip = np.stack([make_clip(rng, 2, BLOCK * 2) for _ in range(4)] * (b // 4))
    state_k = _batched_state(b)
    state_r = _batched_state(b)
    for k in range(2):
        blk = jnp.asarray(clip[:, :, k * BLOCK:(k + 1) * BLOCK])
        state_k, m_k = analyze_fused(state_k, blk, SR, interpret=True)
        state_r, m_r = jax.vmap(lambda s, x: analyze(s, x, SR))(state_r, blk)
    np.testing.assert_allclose(np.asarray(m_k["score"]),
                               np.asarray(m_r["score"]), rtol=1e-5, atol=1e-4)


def test_fused_analyzer_rejects_bad_batch():
    state = _batched_state(4)
    with pytest.raises(ValueError):
        analyze_fused(state, jnp.zeros((4, 2, BLOCK)), SR, interpret=True)


def test_saturator_full_step_kernel_matches(rng):
    """The single-kernel saturator step == the reference scan step."""
    from juicy_tpu.runtime.plugin import Plugin
    from juicy_tpu.kernels.saturator_kernel import saturator_step_fused

    plug = Plugin("saturator", SR, 2, BLOCK)
    params = plug.default_params()
    b = TILE
    blocks = jnp.asarray(
        np.stack([make_clip(rng, 2, BLOCK) for _ in range(8)] * (b // 8)))
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))

    out_k, st_k, m_k = saturator_step_fused(plug, params, states, blocks,
                                            interpret=True)
    out_r, st_r, m_r = plug.batch_step(params, states, blocks)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-6, atol=1e-7)
    for f in ("score", "pre_score", "post_score", "punch", "mono_safety"):
        np.testing.assert_allclose(np.asarray(m_k[f]), np.asarray(m_r[f]),
                                   rtol=1e-5, atol=1e-4, err_msg=f)
    np.testing.assert_allclose(
        np.asarray(st_k["dsp"]["tone_state"]),
        np.asarray(st_r["dsp"]["tone_state"]), rtol=1e-6, atol=1e-7)
    for f in ("short_env", "long_env", "repetition_ema", "fatigue_ema"):
        np.testing.assert_allclose(
            np.asarray(st_k["analyzer"][f]), np.asarray(st_r["analyzer"][f]),
            rtol=1e-5, atol=1e-6, err_msg=f)
