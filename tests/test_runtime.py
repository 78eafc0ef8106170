"""Runtime tests: streaming semantics, checkpointing, metrics quirks, WAV IO."""

import os

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.runtime.plugin import Plugin, Chain
from juicy_tpu.runtime.state import save_state, load_state
from juicy_tpu.runtime.stream import pad_to_blocks, automation_curve
from juicy_tpu.runtime.wav import read_wav, write_wav
from tests.conftest import make_clip, residual_dbfs

SR = 48000.0


def _run(plug, params, clip):
    state = plug.init_state()
    out, state, metrics = plug.run(params, state, jnp.asarray(clip))
    return np.asarray(out), state, metrics


@pytest.mark.slow
def test_block_size_invariance_streaming(rng):
    """Processors without block-level adaptation must be block-size
    invariant when state streams across calls (SURVEY.md §4). Width, Cohere
    and Motion are documented block-granular exceptions (§2.2 quirks)."""
    clip = make_clip(rng, 2, 2048)
    for name in ("saturator", "punch"):
        big = Plugin(name, SR, 2, 1024)
        small = Plugin(name, SR, 2, 256)
        p = big.default_params()
        out_big, _, _ = _run(big, p, clip)
        out_small, _, _ = _run(small, p, clip)
        res = residual_dbfs(out_big, out_small)
        assert res <= -100.0, f"{name}: block-size variance {res:.1f} dBFS"


def test_texture_block_size_invariance_mono(rng):
    """Mono texture is block-size invariant. Stereo is NOT — by reference
    design: the shared LCG interleaves channel draws per block (channel 0
    consumes draws 1..N, channel 1 draws N+1..2N within each processBlock,
    JuicyTexture/PluginProcessor.cpp:239), so the noise stream assignment
    depends on the host block size."""
    clip = make_clip(rng, 1, 2048)
    outs = []
    for block in (256, 1024):
        plug = Plugin("texture", SR, 1, block)
        p = plug.default_params()
        outs.append(_run(plug, p, clip)[0])
    assert residual_dbfs(outs[0], outs[1]) <= -80.0


def test_texture_stereo_block_size_noise_quirk(rng):
    """Documents the stereo LCG block-interleave quirk: different block sizes
    give (slightly) different noise placement, as in the reference."""
    clip = make_clip(rng, 2, 2048)
    outs = []
    for block in (256, 1024):
        plug = Plugin("texture", SR, 2, block)
        outs.append(_run(plug, plug.default_params(), clip)[0])
    assert not np.array_equal(outs[0], outs[1])


def test_metrics_pre_post_flow(rng):
    clip = make_clip(rng, 2, 1024)
    plug = Plugin("saturator", SR, 2, 512)
    out, state, metrics = _run(plug, plug.default_params(), clip)
    assert np.asarray(metrics["score"]).shape == (2,)
    # post score should differ from pre (the DSP does something)
    assert not np.allclose(np.asarray(metrics["pre_score"]),
                           np.asarray(metrics["post_score"]))


def test_infer_metric_remap_quirk(rng):
    """JuicyInfer carries triangle metrics in the feature slots
    (JuicyInfer/PluginProcessor.cpp:85-89,164-181)."""
    clip = make_clip(rng, 2, 1024)
    plug = Plugin("infer", SR, 2, 512)
    _, _, m = _run(plug, plug.default_params(), clip)
    np.testing.assert_array_equal(np.asarray(m["punch"]), np.asarray(m["emphasis"]))
    np.testing.assert_array_equal(np.asarray(m["width"]), np.asarray(m["fatigue_risk"]))
    np.testing.assert_array_equal(np.asarray(m["mono_safety"]),
                                  np.asarray(m["repetition_density"]))


def test_infer_sensitivity_scaling(rng):
    clip = make_clip(rng, 2, 1024)
    plug = Plugin("infer", SR, 2, 512)
    p1 = dict(plug.default_params(), sensitivity=jnp.float32(1.0))
    p2 = dict(plug.default_params(), sensitivity=jnp.float32(2.0))
    _, _, m1 = _run(plug, p1, clip)
    _, _, m2 = _run(plug, p2, clip)
    np.testing.assert_allclose(np.asarray(m2["score"]),
                               np.minimum(np.asarray(m1["score"]) * 2.0, 100.0),
                               rtol=1e-5)


def test_cohere_context_fit_reported(rng):
    clip = make_clip(rng, 2, 1024)
    plug = Plugin("cohere", SR, 2, 512)
    _, _, m = _run(plug, plug.default_params(), clip)
    cf = np.asarray(m["context_fit"])
    assert cf.shape == (2,) and np.all(cf >= 0.0) and np.all(cf <= 100.0)


def test_checkpoint_roundtrip(tmp_path, rng):
    clip = make_clip(rng, 2, 2048)
    plug = Plugin("texture", SR, 2, 512)
    params = plug.default_params()
    state = plug.init_state()
    out1, state, _ = plug.run(params, state, jnp.asarray(clip))

    path = os.path.join(tmp_path, "ckpt.msgpack")
    save_state(path, params, state, meta={"plugin": "texture"})
    p2, s2, meta = load_state(path, params, state)
    assert meta["plugin"] == "texture"
    # resuming from the checkpoint must continue bit-identically
    out_a, _, _ = plug.run(params, state, jnp.asarray(clip))
    out_b, _, _ = plug.run(p2, s2, jnp.asarray(clip))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_checkpoint_preserves_learned_targets(rng):
    """Unlike the reference (which silently drops JuicyCohere's learned
    targets, SURVEY.md §3.5), checkpoints capture them."""
    clip = make_clip(rng, 2, 2048)
    plug = Plugin("cohere", SR, 2, 512)
    params = dict(plug.default_params(), learn=jnp.float32(1.0))
    state = plug.init_state()
    _, state, _ = plug.run(params, state, jnp.asarray(clip))
    assert not np.allclose(float(state["dsp"]["target_low"]), 0.2)


def test_presets_match_reference_tables():
    plug = Plugin("punch", SR, 2, 512)
    assert plug.defn.preset_names() == (
        "Solar Snap", "Crater Impact", "Elastic Slam", "Steel Bounce",
        "Apocalypse Tap")
    p = plug.preset("Crater Impact")
    assert float(p["punch"]) == np.float32(1.4)
    assert float(p["output"]) == np.float32(-8.0)


def test_param_normalization_roundtrip():
    plug = Plugin("saturator", SR, 2, 512)
    spec = plug.defn.param("drive")
    v = spec.from_normalized(spec.to_normalized(13.7))
    assert abs(float(v) - 13.7) < 1e-5
    assert plug.defn.param("juiciness").readonly


def test_params_batched_sweep(rng):
    """Per-clip parameter grids (§2.4 param-sweep parallelism): batching the
    drive across clips == per-clip runs with those drives."""
    import jax
    clip = make_clip(rng, 2, 512)
    plug = Plugin("saturator", SR, 2, 512)
    base = plug.default_params()
    drives = jnp.asarray([0.0, 6.0, 12.0, 24.0], jnp.float32)
    params_b = {k: jnp.broadcast_to(v, (4,)) for k, v in base.items()}
    params_b["drive"] = drives
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(4))
    blocks = jnp.broadcast_to(jnp.asarray(clip), (4, 2, 512))
    out_b, _, m_b = plug.batch_step(params_b, states, blocks,
                                    params_batched=True)
    for i, d in enumerate(drives):
        p = dict(base, drive=jnp.float32(d))
        out_i, _, _ = plug.step(p, plug.init_state(), jnp.asarray(clip))
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_i),
                                   rtol=1e-6, atol=1e-7)


def test_automation_curve_streaming(rng):
    """Per-block parameter automation (BASELINE config #3)."""
    clip = make_clip(rng, 2, 4096)
    plug = Plugin("punch", SR, 2, 512)
    params = plug.default_params()
    nb = 4096 // 512
    curve = automation_curve(np.linspace(0.0, 1.5, 32), nb)
    state = plug.init_state()
    out_auto, _, _ = plug.run(params, state, jnp.asarray(clip),
                              automation={"punch": curve})
    out_flat, _, _ = plug.run(params, plug.init_state(), jnp.asarray(clip))
    assert not np.allclose(np.asarray(out_auto), np.asarray(out_flat))


def test_pad_to_blocks():
    x = jnp.ones((2, 1000))
    padded, t = pad_to_blocks(x, 512)
    assert padded.shape == (2, 1024) and t == 1000
    assert float(padded[0, 1000]) == 0.0


def test_chain_runs_and_scores(rng):
    clip = make_clip(rng, 2, 1024)
    chain = Chain([("punch", "Solar Snap"), ("saturator", "Amber Heat"),
                   ("width", "Prism Arc")], sr=SR, channels=2, block_size=512)
    out, states, metrics = chain.run(chain.init_state(), jnp.asarray(clip))
    assert np.asarray(out).shape == clip.shape
    assert len(metrics) == 3
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_batched_run_matches_per_clip(rng):
    """Batch-major streaming == per-clip streaming (same math, faster code)."""
    import jax
    clips = np.stack([make_clip(rng, 2, 1024) for _ in range(3)])
    plug = Plugin("punch", SR, 2, 512)
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(3))
    out_b, st_b, m_b = plug.batched_run(params, states, jnp.asarray(clips))
    for i in range(3):
        out_i, _, m_i = plug.run(params, plug.init_state(),
                                 jnp.asarray(clips[i]))
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_i),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_chain_batched_run_matches(rng):
    import jax
    clips = np.stack([make_clip(rng, 2, 1024) for _ in range(2)])
    chain = Chain([("saturator", "Amber Heat"), ("width", "Prism Arc")],
                  sr=SR, channels=2, block_size=512)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(2))
    out_b, _, _ = chain.batched_run(states, jnp.asarray(clips))
    out_0, _, _ = chain.run(chain.init_state(), jnp.asarray(clips[0]))
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_0),
                               rtol=1e-6, atol=1e-7)


def test_wav_roundtrip(tmp_path, rng):
    clip = make_clip(rng, 2, 4000)
    path = os.path.join(tmp_path, "x.wav")
    write_wav(path, clip, 48000)
    back, sr = read_wav(path)
    assert sr == 48000
    np.testing.assert_array_equal(back, clip)
    # PCM16 path
    write_wav(path, clip, 44100, float32=False)
    back16, sr16 = read_wav(path)
    assert sr16 == 44100
    assert residual_dbfs(back16, clip) < -80.0


def test_program_api():
    """getNumPrograms/getCurrentProgram/setCurrentProgram/get+changeProgramName
    analogs (JuicyPunch/PluginProcessor.cpp:147-187)."""
    from juicy_tpu.runtime.plugin import Plugin
    plug = Plugin("punch")
    assert plug.num_programs == 5
    assert plug.current_program == 0
    assert plug.program_name(0) == "Solar Snap"
    assert plug.program_name(99) == "Apocalypse Tap"   # reference clamping
    assert plug.program_name(-3) == "Solar Snap"
    p = plug.set_program(2)
    assert plug.current_program == 2
    assert float(p["punch"]) == pytest.approx(1.1)
    plug.set_program(99)
    assert plug.current_program == 4
    plug.change_program_name(2, "My Slam")
    assert plug.program_name(2) == "My Slam"
    # single-program plugins report one program named after the plugin
    tex = Plugin("texture")
    assert tex.num_programs == 1
    assert tex.program_name(0) == "Juicy Texture"


def test_program_in_checkpoint(tmp_path):
    from juicy_tpu.runtime.plugin import Plugin
    from juicy_tpu.runtime.state import load_plugin_state, save_plugin_state
    plug = Plugin("saturator")
    params = plug.set_program(3)
    plug.change_program_name(3, "Custom Grain")
    state = plug.init_state()
    path = str(tmp_path / "ck.msgpack")
    save_plugin_state(path, plug, params, state)

    plug2 = Plugin("saturator")
    p2, s2, meta = load_plugin_state(path, plug2, plug.default_params(),
                                     plug2.init_state())
    assert plug2.current_program == 3
    assert plug2.program_name(3) == "Custom Grain"
    assert float(p2["drive"]) == pytest.approx(18.0)


def test_plugin_static_split_is_pure():
    """_split_static returns the split without mutating the instance (a
    preset dict containing `material` must not silently re-pin the plugin —
    with_static is the only binding path)."""
    from juicy_tpu.runtime.plugin import Chain, Plugin
    plug = Plugin("texture", sr=48000.0, channels=2, block_size=512)
    base = dict(plug._static)
    plug.default_params()
    assert plug._static == base
    p = dict(plug.defn.default_params())
    p["material"] = 3
    traced, static = plug._split_static(p)
    assert static == {"material": 3} and "material" not in traced
    assert plug._static == base          # still unbound
    # Chain construction binds a dict preset's static params explicitly
    chain = Chain([("texture", {"material": 2})], 48000.0, 2, 512)
    assert chain.plugins[0]._static["material"] == 2
    assert "material" not in chain.params[0]
