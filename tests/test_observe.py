"""Observability, guards, and resumable-corpus tests (SURVEY.md §5 subsystems)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from juicy_tpu.runtime.observe import (ThroughputMeter, guarded_step,
                                       sanitize_block, validate_block)
from juicy_tpu.runtime.plugin import Plugin
from tests.conftest import make_clip

SR = 48000.0


def test_validate_and_sanitize():
    with pytest.raises(ValueError):
        validate_block(jnp.zeros((8,)))
    with pytest.raises(ValueError):
        validate_block(jnp.zeros((4, 8)), channels=2)
    x = jnp.array([[jnp.nan, jnp.inf, 9.0, -9.0, 0.5]])
    y = np.asarray(sanitize_block(x))
    np.testing.assert_array_equal(y, [[0.0, 0.0, 4.0, -4.0, 0.5]])


def test_guarded_step_passes_clean_audio(rng):
    clip = make_clip(rng, 2, 512)
    plug = Plugin("saturator", SR, 2, 512)
    params = plug.default_params()
    state = plug.init_state()
    g = guarded_step(plug.step)
    out, st, m, fault = g(params, state, jnp.asarray(clip))
    out_ref, st_ref, m_ref = plug.step(params, state, jnp.asarray(clip))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-7)
    assert not bool(fault)


def test_guarded_step_sanitizes_nan_input(rng):
    clip = make_clip(rng, 2, 512).copy()
    clip[0, 100] = np.nan
    clip[1, 200] = np.inf
    plug = Plugin("saturator", SR, 2, 512)
    g = guarded_step(plug.step)
    out, st, m, fault = g(plug.default_params(), plug.init_state(),
                          jnp.asarray(clip))
    assert np.all(np.isfinite(np.asarray(out)))


def test_guarded_step_rolls_back_state_on_fault(rng):
    """A step that produces non-finite output must not advance state."""
    plug = Plugin("saturator", SR, 2, 512)
    params = plug.default_params()
    state = plug.init_state()

    def bad_step(p, s, b):
        out, s2, m = plug.step(p, s, b)
        return out.at[0, 0].set(jnp.nan), s2, m

    g = guarded_step(bad_step)
    clip = make_clip(rng, 2, 512)
    out, st, m, fault = g(params, state, jnp.asarray(clip))
    assert bool(fault)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(
        np.asarray(st["dsp"]["tone_state"]),
        np.asarray(state["dsp"]["tone_state"]))


def test_guarded_step_rolls_back_scalar_state_leaves(rng):
    """Scalar/shared state leaves (motion's slew/phase/LCG) must roll back
    too: a faulted clip in a batched block restores its FULL pre-fault
    state, including leaves the step kept shared across the batch — these
    get promoted to per-clip rows so healthy clips still advance."""
    import jax

    plug = Plugin("motion", SR, 2, 512)
    params = plug.default_params()
    state = plug.init_state()        # unbatched: scalar slew/phase/rng

    def bad_step(p, s, b):
        out, s2, m = plug.step(p, s, b)
        # poison clip 1 only
        return out.at[1, 0, 0].set(jnp.nan), s2, m

    g = guarded_step(bad_step)
    clips = np.stack([make_clip(rng, 2, 512), make_clip(rng, 2, 512) * 0.5,
                      make_clip(rng, 2, 512) * 0.25])
    out, st, m, fault = g(params, state, jnp.asarray(clips))
    np.testing.assert_array_equal(np.asarray(fault), [False, True, False])

    # reference: the same step without the poison, per clip
    ref_out, ref_st, _ = plug.step(params, state, jnp.asarray(clips))
    for key in ("motion_phase", "variation_tone", "budget_env", "rng",
                "onset_cooldown", "env", "tail", "lp"):
        got = np.asarray(st["dsp"][key])
        want_new = np.broadcast_to(np.asarray(ref_st["dsp"][key]),
                                   got.shape)
        want_old = np.broadcast_to(np.asarray(state["dsp"][key]), got.shape)
        np.testing.assert_array_equal(got[1], want_old[1],
                                      err_msg=f"{key} not rolled back")
        np.testing.assert_array_equal(got[0], want_new[0],
                                      err_msg=f"{key} wrongly rolled back")
        np.testing.assert_array_equal(got[2], want_new[2])
    # analyzer state rolls back the same way
    an = np.asarray(st["analyzer"]["short_env"])
    np.testing.assert_array_equal(
        an[1], np.broadcast_to(np.asarray(state["analyzer"]["short_env"]),
                               an.shape)[1])


def test_throughput_meter():
    meter = ThroughputMeter(SR)
    with meter.stage("analyze", samples=48000, batch=4):
        pass
    rep = meter.report()
    assert rep["analyze"]["audio_s"] == pytest.approx(4.0)
    assert rep["analyze"]["x_realtime"] > 0


def test_resumable_corpus(tmp_path, rng):
    from juicy_tpu.parallel.corpus import run_corpus_resumable
    clips = np.stack([make_clip(rng, 2, 1024) for _ in range(6)])
    plug = Plugin("infer", SR, 2, 512)
    params = plug.default_params()
    path = os.path.join(tmp_path, "corpus.ckpt")

    full = run_corpus_resumable(plug, params, clips, path, macro_batch=2)
    assert full.shape == (6,)

    # simulate preemption: rewind the cursor and resume
    from juicy_tpu.runtime.state import load_state, save_state
    cur, saved, _ = load_state(path, {"done": jnp.int32(0)},
                               {"scores": jnp.zeros((6,), jnp.float32)})
    partial = np.asarray(saved["scores"]).copy()
    partial[4:] = -1.0
    save_state(path, {"done": jnp.int32(4)},
               {"scores": jnp.asarray(partial)}, meta={"total": 6})
    resumed = run_corpus_resumable(plug, params, clips, path, macro_batch=2)
    np.testing.assert_allclose(resumed, full, rtol=1e-6)
