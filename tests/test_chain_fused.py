"""Fused chain executor vs the stage-major runner and the compiled C++.

The fused executor (runtime/chain_fused.py) reschedules the chain's ~21
sequential sample loops per block into ~6 shared scans; these tests pin its
semantics to (a) Chain.batched_run and (b) the compiled reference C++
processors stacked in series (the ground truth for "plugins on one track").
"""

import shutil
import subprocess

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from juicy_tpu.runtime.plugin import Chain
from juicy_tpu.runtime.chain_fused import fused_chain_step, fused_chain_stream
from tests.conftest import make_clip, residual_dbfs
from tests import cpp_ref

SR = 48000.0
BLOCK = 512
STAGES = [("punch", "Solar Snap"), ("saturator", "Amber Heat"),
          ("texture", None), ("motion", None), ("width", "Prism Arc"),
          ("cohere", None), ("infer", "Reference Lens")]


@pytest.fixture(scope="module")
def chain():
    return Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)


def _clips(rng, b=3, nb=4):
    return np.stack([make_clip(rng, 2, BLOCK * nb) for _ in range(b)]).astype(
        np.float32)


@pytest.mark.slow
def test_fused_matches_stage_major(chain, rng):
    clips = _clips(rng)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(clips.shape[0]))
    out_ref, st_ref, m_ref = chain.batched_run(states, clips)
    out_f, st_f, m_f = fused_chain_stream(chain, states, jnp.asarray(clips), unroll=1)
    res = residual_dbfs(np.asarray(out_f), np.asarray(out_ref))
    assert res <= -95.0, f"fused vs stage-major audio residual {res:.1f} dBFS"
    for i in range(len(STAGES)):
        for key in ("score", "pre_score", "punch", "width", "mono_safety",
                    "fatigue_risk", "repetition_density"):
            a = np.asarray(m_ref[i][key])
            b = np.asarray(m_f[i][key])
            scale = 100.0 if "score" in key else 1.0
            assert np.max(np.abs(a - b)) <= 2e-3 * scale, (i, key)
    # carried states agree (streaming resumes identically)
    for i in range(len(STAGES)):
        for leaf_r, leaf_f in zip(jax.tree_util.tree_leaves(st_ref[i]["dsp"]),
                                  jax.tree_util.tree_leaves(st_f[i]["dsp"])):
            np.testing.assert_allclose(np.asarray(leaf_r, np.float64),
                                       np.asarray(leaf_f, np.float64),
                                       atol=5e-5)


@pytest.mark.slow
@pytest.mark.parametrize("material", [1.0, 2.0, 3.0])
def test_fused_waveguide_materials_batched(material, rng):
    """Regression: wood/plastic waveguide scatter must be rank-agnostic
    (fused chain runs texture on batched [B, C, L] state without vmap)."""
    ch = Chain([("punch", "Solar Snap"), ("texture", dict(material=material)),
                ("cohere", None)], sr=SR, channels=2, block_size=BLOCK)
    clips = _clips(rng, b=2, nb=3)
    states = jax.vmap(lambda _: ch.init_state())(jnp.arange(2))
    out_ref, _, _ = ch.batched_run(states, clips)
    out_f, _, _ = fused_chain_stream(ch, states, jnp.asarray(clips), unroll=1)
    # path-vs-path residual only (the high-Q resonators amplify ulp-level
    # fusion-context differences); true fidelity is anchored vs the compiled
    # C++ in test_fused_chain_vs_cpp_oracle. A rank bug here would crash or
    # give garbage, not -70 dB.
    assert residual_dbfs(np.asarray(out_f), np.asarray(out_ref)) <= -70.0


@pytest.mark.slow
def test_fused_single_clip_unbatched(chain, rng):
    """Works without a batch axis too ([C, T])."""
    clip = make_clip(rng, 2, BLOCK * 3)
    states = chain.init_state()
    out_ref, _, _ = chain.run(states, clip)
    out_f, _, _ = fused_chain_stream(chain, states, jnp.asarray(clip), unroll=1)
    assert residual_dbfs(np.asarray(out_f), np.asarray(out_ref)) <= -95.0


@pytest.mark.slow
def test_fused_metrics_modes(chain, rng):
    clips = _clips(rng, b=2, nb=3)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(2))
    out_b, st_b, m_b = fused_chain_stream(chain, states, jnp.asarray(clips),
                                          metrics="blocks", unroll=1)
    out_f, st_f, m_f = fused_chain_stream(chain, states, jnp.asarray(clips),
                                          metrics="final", unroll=1)
    out_n, st_n, m_n = fused_chain_stream(chain, states, jnp.asarray(clips),
                                          metrics="none", unroll=1)
    # block 0 compiles outside the scan in "final" mode -> ulp-level
    # fusion-context differences only
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f), atol=2e-5)
    assert m_n is None
    # "final" metrics == last block of "blocks" metrics
    for i in range(len(STAGES)):
        np.testing.assert_allclose(np.asarray(m_f[i]["score"]),
                                   np.asarray(m_b[i]["score"])[-1], rtol=1e-6)
    # "none" audio matches (analyzers don't touch audio)
    assert residual_dbfs(np.asarray(out_n), np.asarray(out_b)) <= -95.0
    # analyzer state advanced identically in blocks/final
    for i in range(len(STAGES)):
        for k in ("short_env", "repetition_ema", "fatigue_ema"):
            np.testing.assert_allclose(
                np.asarray(st_b[i]["analyzer"][k]),
                np.asarray(st_f[i]["analyzer"][k]), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_block_step_equals_stream(chain, rng):
    """Block-by-block fused_chain_step == one fused_chain_stream call."""
    clip = make_clip(rng, 2, BLOCK * 3)
    states = chain.init_state()
    out_s, st_s, _ = fused_chain_stream(chain, states, jnp.asarray(clip), unroll=1)
    st = states
    outs = []
    for k in range(3):
        blk = jnp.asarray(clip[:, k * BLOCK:(k + 1) * BLOCK])
        out, st, _ = fused_chain_step(chain, st, blk, unroll=1)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=-1)
    # eager per-block vs in-scan compile contexts differ at ulp level only
    np.testing.assert_allclose(got, np.asarray(out_s), atol=1e-5)


@pytest.mark.skipif(
    not cpp_ref.reference_available() or shutil.which("make") is None,
    reason="reference sources or native toolchain unavailable")
def test_fused_chain_vs_cpp_oracle(chain, rng):
    """The gold test: the fused chain vs the 7 compiled reference plugins
    stacked in series on one track, streamed block by block."""
    try:
        cpp_ref.load("off")
    except (subprocess.CalledProcessError, OSError) as e:
        pytest.skip(f"oracle build failed: {e}")
    clip = make_clip(rng, 2, BLOCK * 6)

    procs = []
    for name, preset in STAGES:
        p = cpp_ref.CppProcessor(name, "off", SR, BLOCK, 2)
        if preset is not None:
            names = [p.program_name(i) for i in range(p.num_programs())]
            p.set_program(names.index(preset))
        procs.append(p)
    ref = clip.astype(np.float32)
    for p in procs:
        ref = p.run(ref, BLOCK)
    cpp_scores = [p.get_param("juiciness") for p in procs]
    for p in procs:
        p.close()

    states = chain.init_state()
    out, _, m = fused_chain_stream(chain, states, jnp.asarray(clip), unroll=1)
    res = residual_dbfs(np.asarray(out), ref)
    assert res <= -80.0, f"fused chain vs compiled C++ chain: {res:.1f} dBFS"
    for i, cs in enumerate(cpp_scores):
        ours = float(np.asarray(m[i]["score"])[-1])
        assert abs(ours - cs) <= 0.2, (STAGES[i][0], ours, cs)


@pytest.mark.parametrize("name", ["punch", "saturator", "texture", "motion",
                                  "width", "cohere", "infer"])
@pytest.mark.slow
def test_fused_single_stage_chains(name, rng):
    """The scheduler handles every single-stage chain (each stage type's
    pass/barrier structure alone)."""
    ch = Chain([(name, None)], sr=SR, channels=2, block_size=BLOCK)
    clip = make_clip(rng, 2, BLOCK * 2)
    out_ref, _, m_ref = ch.run(ch.init_state(), clip)
    out_f, _, m_f = fused_chain_stream(ch, ch.init_state(),
                                       jnp.asarray(clip), unroll=1)
    assert residual_dbfs(np.asarray(out_f), np.asarray(out_ref)) <= -90.0
    np.testing.assert_allclose(np.asarray(m_f[0]["score"]),
                               np.asarray(m_ref[0]["score"]), atol=1e-3)


@pytest.mark.slow
def test_fused_mono_chain(rng):
    """Mono (1-channel) chains: motion runs one channel pass, width is a
    passthrough, analyzer uses l==r."""
    ch = Chain([("punch", None), ("motion", None), ("width", None),
                ("infer", None)], sr=SR, channels=1, block_size=BLOCK)
    clip = make_clip(rng, 1, BLOCK * 2)
    out_ref, _, _ = ch.run(ch.init_state(), clip)
    out_f, _, _ = fused_chain_stream(ch, ch.init_state(), jnp.asarray(clip),
                                     unroll=1)
    assert residual_dbfs(np.asarray(out_f), np.asarray(out_ref)) <= -90.0


def test_fused_mixed_materials(rng):
    """Mixed-material batch through the fused executor: a traced-material
    texture stage (Plugin.with_traced) renders each clip with ITS OWN
    material in one jit, matching per-material static runs — each DAW track
    picks its own material (JuicyTexture/PluginProcessor.cpp:325-337)."""
    mats = [0, 1, 4, 2]          # gel, metal, flesh, wood in one batch
    b = len(mats)
    ch = Chain([("punch", "Solar Snap"), ("texture", None),
                ("infer", None)], sr=SR, channels=2, block_size=BLOCK)
    ch.plugins[1] = ch.plugins[1].with_traced("material")
    ch.params[1]["material"] = jnp.asarray(mats, jnp.float32)
    clips = _clips(rng, b=b, nb=3)
    states = jax.vmap(lambda _: ch.init_state())(jnp.arange(b))
    out_mixed, _, ms = fused_chain_stream(ch, states, jnp.asarray(clips),
                                          unroll=1)

    # reference: one static-material chain per clip
    for i, m in enumerate(mats):
        ch_i = Chain([("punch", "Solar Snap"),
                      ("texture", dict(material=float(m))),
                      ("infer", None)], sr=SR, channels=2, block_size=BLOCK)
        st_i = jax.vmap(lambda _: ch_i.init_state())(jnp.arange(1))
        want, _, _ = fused_chain_stream(ch_i, st_i,
                                        jnp.asarray(clips[i:i + 1]),
                                        unroll=1)
        db = residual_dbfs(np.asarray(out_mixed[i]), np.asarray(want[0]))
        assert db <= -90.0, f"material {m} diverges in mixed batch: {db:.1f}"


def _toy_lowpass_def():
    """Custom ProcessorDef WITHOUT a registered fuser: a stateful one-pole
    gain stage. Exercises fused_chain_step's vmap fallback path."""
    from juicy_tpu.models.base import ParamSpec, ProcessorDef

    def init(sr, channels):
        return {"z": jnp.zeros((channels,), jnp.float32)}

    def process(params, carry, block, sr):
        g = jnp.asarray(params["gain"], jnp.float32)
        a = jnp.float32(0.2)

        def step(z, xt):
            y = z + a * (xt - z)
            return y, y * g
        z, y = jax.lax.scan(step, carry["z"],
                            jnp.moveaxis(block, -1, 0))
        return jnp.moveaxis(y, 0, -1), {"z": z}

    return ProcessorDef(
        name="toylp", title="Toy LP", code="TOYL",
        params=(ParamSpec("gain", "Gain", 0.0, 2.0, 1.0),),
        presets=(), init=init, process=process)


def test_fused_fallback_custom_processor_multidim_batch(rng):
    """A custom processor with no fuser must run through fused_chain_step's
    vmap fallback at ANY batch rank (rank-agnostic like the fused paths):
    unbatched, [B], and [B1, B2] all agree with the stage-major runner."""
    toy = _toy_lowpass_def()
    ch = Chain([("punch", None), (toy, None), ("saturator", None)],
               sr=SR, channels=2, block_size=BLOCK)
    nb = 2
    clips = np.stack([make_clip(rng, 2, BLOCK * nb) for _ in range(4)]) \
        .astype(np.float32).reshape(2, 2, 2, BLOCK * nb)

    # reference: stage-major over the flattened batch
    flat = clips.reshape(4, 2, BLOCK * nb)
    st_flat = jax.vmap(lambda _: ch.init_state())(jnp.arange(4))
    out_ref, st_ref, _ = ch.batched_run(st_flat, jnp.asarray(flat))

    # [B1, B2] through the fallback
    st2 = jax.vmap(jax.vmap(lambda _: ch.init_state()))(
        jnp.arange(4).reshape(2, 2))
    out2, st2_f, _ = fused_chain_stream(ch, st2, jnp.asarray(clips), unroll=1)
    res = residual_dbfs(np.asarray(out2).reshape(4, 2, -1), np.asarray(out_ref))
    assert res <= -120.0, f"multi-dim fallback residual {res:.1f} dBFS"
    np.testing.assert_allclose(
        np.asarray(st2_f[1]["dsp"]["z"]).reshape(4, 2),
        np.asarray(st_ref[1]["dsp"]["z"]), atol=1e-6)

    # unbatched (batch_shape == ()) through the same fallback
    out0, _, _ = fused_chain_stream(ch, ch.init_state(),
                                    jnp.asarray(clips[0, 0]), unroll=1)
    res0 = residual_dbfs(np.asarray(out0), np.asarray(out_ref[0]))
    assert res0 <= -120.0, f"unbatched fallback residual {res0:.1f} dBFS"
