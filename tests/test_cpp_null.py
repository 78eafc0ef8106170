"""Null tests against the *compiled reference C++* (the ground-truth oracle).

Round 1 validated the JAX DSP against hand-derived Python oracles
(tests/oracles.py), which shared a possible-misreading failure mode with the
implementation under test. These tests close that gap: the reference sources
under /root/reference/src are compiled verbatim (tests/cpp_oracle) into two
shared libraries differing only in FP contraction —

  * off : -ffp-contract=off          (plain mul/add)
  * fma : -mfma -ffp-contract=fast   (like the reference's own arm64 clang
                                      release binaries, which contract)

and every processor + the analyzer is streamed block-by-block through both.

Acceptance (per case):
  * best-of-two-modes audio residual ≤ −90 dBFS (stricter than the −80 north
    star), and
  * the worse mode is within 3 dB of the C++'s own cross-build ambiguity
    (off-vs-fma residual) or under −80 dBFS — i.e. any remaining gap is the
    reference's own compiler-realization ambiguity, not ours.

Measured on this box (full-length mixed clips, 6×512 @48 kHz stereo):
punch −92.5, saturator −99.4, width −156, texture gel/metal/flesh −94…−108,
texture wood/plastic −112 (vs off) with C++ off-vs-fma itself at −78.6/−87.9,
motion −103…−107, infer −124, cohere −123.5. Post-DSP juiciness scores match
to ≤1e-3 (0–100 scale).
"""

import json
import shutil
import subprocess
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from juicy_tpu.runtime.plugin import Plugin
from tests.conftest import make_clip, residual_dbfs
from tests import cpp_ref

SR = 48000.0
BLOCK = 512
NBLOCKS = 6

pytestmark = pytest.mark.skipif(
    not cpp_ref.reference_available() or shutil.which("make") is None,
    reason="reference sources or native toolchain unavailable",
)


@pytest.fixture(scope="module", autouse=True)
def built_oracle():
    try:
        cpp_ref.load("off")
        cpp_ref.load("fma")
    except (subprocess.CalledProcessError, OSError) as e:
        pytest.skip(f"oracle build failed: {e}")


_REPORT = {}


@pytest.fixture(scope="module", autouse=True)
def report_writer():
    yield
    if _REPORT:
        out = Path(__file__).resolve().parent.parent / "CPP_NULL_REPORT.json"
        existing = {}
        if out.is_file():
            existing = json.loads(out.read_text())
        existing.update(_REPORT)
        out.write_text(json.dumps(existing, indent=1, sort_keys=True) + "\n")


def run_jax(name, params, clip, channels=2):
    plug = Plugin(name, SR, channels, BLOCK)
    p = plug.default_params()
    for k, v in params.items():
        if k in plug.defn.static_params:
            plug._static = getattr(plug, "_static", {})
            plug._static[k] = int(v)
        else:
            p[k] = jnp.float32(v)
    state = plug.init_state()
    outs, metrics = [], None
    for k in range(clip.shape[1] // BLOCK):
        blk = jnp.asarray(clip[:, k * BLOCK:(k + 1) * BLOCK])
        out, state, metrics = plug.jit_step(p, state, blk)
        outs.append(np.asarray(out))
    last = {k: float(np.ravel(v)[-1]) for k, v in metrics.items()}
    return np.concatenate(outs, axis=1), last


def cpp_run(name, params, clip, channels=2, contract="off"):
    proc = cpp_ref.CppProcessor(name, contract, SR, BLOCK, channels)
    proc.set_params(params)
    out = proc.run(clip.astype(np.float32), BLOCK)
    m = proc.metrics()
    m["juiciness_param"] = proc.get_param("juiciness")
    proc.close()
    return out, m


def null_check(case_id, name, params, clip, channels=2, score_tol=2e-3):
    ours, jax_metrics = run_jax(name, params, clip, channels)
    ref_off, m_off = cpp_run(name, params, clip, channels, "off")
    ref_fma, m_fma = cpp_run(name, params, clip, channels, "fma")
    res_off = residual_dbfs(ours, ref_off)
    res_fma = residual_dbfs(ours, ref_fma)
    ambiguity = residual_dbfs(ref_off, ref_fma)  # the C++'s own build spread
    best, worst = min(res_off, res_fma), max(res_off, res_fma)
    _REPORT[case_id] = {  # clamp -inf (bit-identical) to keep strict JSON
        "vs_cpp_off_dbfs": round(max(res_off, -200.0), 1),
        "vs_cpp_fma_dbfs": round(max(res_fma, -200.0), 1),
        "cpp_off_vs_fma_dbfs": round(max(ambiguity, -200.0), 1),
        "score_jax": round(jax_metrics["score"], 4),
        "score_cpp": round(m_off["score"], 4),
    }
    assert best <= -90.0, (
        f"{case_id}: best-mode residual {best:.1f} dBFS vs compiled C++")
    assert worst <= max(-80.0, ambiguity + 3.0), (
        f"{case_id}: worst-mode residual {worst:.1f} dBFS exceeds both the "
        f"-80 bar and the C++'s own build ambiguity {ambiguity:.1f}")
    # Post-DSP juiciness score parity (0-100 scale).
    assert abs(jax_metrics["score"] - m_off["score"]) <= score_tol * 100.0
    return best


# --- the seven processors, default-ish params on full mixed material -------

def test_punch_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("punch", "punch",
               dict(punch=0.9, sustain=0.35, slam=0.65, clip=0.25, mix=1.0,
                    output=-4.0), clip)


def test_punch_extreme_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * 4)
    null_check("punch_extreme", "punch",
               dict(punch=1.5, sustain=1.1, slam=1.0, clip=1.0, mix=1.0,
                    output=-12.0), clip)


def test_saturator_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("saturator", "saturator",
               dict(drive=6.0, asymmetry=0.1, tone=0.55, mix=1.0, output=-3.0),
               clip)


def test_saturator_presets_cpp_null(rng):
    """Audio null for every factory preset, applied through the C++'s own
    program API (setCurrentProgram → normalized round-trip), mirrored by the
    JAX preset tables."""
    clip = make_clip(rng, 2, BLOCK * 3)
    from juicy_tpu.models.saturator import PRESETS
    for i, (_, p) in enumerate(PRESETS):
        proc = cpp_ref.CppProcessor("saturator", "off", SR, BLOCK, 2)
        proc.set_program(i)
        ref = proc.run(clip.astype(np.float32), BLOCK)
        proc.close()
        ours, _ = run_jax("saturator", dict(p), clip)
        res = residual_dbfs(ours, ref)
        assert res <= -90.0, f"saturator preset {i}: {res:.1f} dBFS"


def test_width_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("width", "width",
               dict(width=0.45, haasMs=12.0, monoSafe=0.7, mix=1.0,
                    output=0.0), clip)


def test_width_anticorrelated_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * 4, kind="anticorrelated")
    null_check("width_anticorrelated", "width",
               dict(width=1.0, haasMs=30.0, monoSafe=0.2, mix=1.0,
                    output=-3.0), clip)


@pytest.mark.parametrize("material", [0, 1, 2, 3, 4])
def test_texture_materials_cpp_null(material):
    local_rng = np.random.default_rng(0xA0D10 + material)
    clip = make_clip(local_rng, 2, BLOCK * 4)
    null_check(f"texture_mat{material}", "texture",
               dict(material=material, tailshape=0.55, damping=0.5,
                    weight=0.45, texture=0.5, mix=1.0, output=-2.0), clip)


def test_texture_long_ring_cpp_null():
    clip = make_clip(np.random.default_rng(0xA0D10 + 99), 2, BLOCK * NBLOCKS)
    null_check("texture_long_ring", "texture",
               dict(material=1, tailshape=1.0, damping=0.0, weight=1.0,
                    texture=1.0, mix=1.0, output=0.0), clip)


def test_motion_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("motion", "motion",
               dict(microvar=0.55, motiondepth=1.0, repeatctrl=0.65,
                    budget=0.5, mix=1.0, output=-2.0), clip)


def test_motion_extreme_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * 4)
    null_check("motion_extreme", "motion",
               dict(microvar=1.0, motiondepth=2.0, repeatctrl=1.0, budget=1.0,
                    mix=1.0, output=0.0), clip)


def test_infer_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * 3)
    null_check("infer", "infer", dict(trim=-6.0, sensitivity=1.7), clip)


def test_infer_pushed_params_cpp(rng):
    """Infer publishes its 6 metric readouts as host-visible params
    (JuicyInfer/PluginProcessor.cpp:91-101); compare against our metrics."""
    clip = make_clip(rng, 2, BLOCK * 3)
    proc = cpp_ref.CppProcessor("infer", "off", SR, BLOCK, 2)
    proc.set_params(dict(trim=-6.0, sensitivity=1.7))
    proc.run(clip.astype(np.float32), BLOCK)
    _, jm = run_jax("infer", dict(trim=-6.0, sensitivity=1.7), clip)
    for cpp_id, ours_key in [("juiciness", "score"), ("emphasis", "emphasis"),
                             ("coherence", "coherence"),
                             ("synesthesia", "synesthesia"),
                             ("fatigue", "fatigue_risk"),
                             ("repetition", "repetition_density")]:
        ref = proc.get_param(cpp_id)
        scale = 100.0 if cpp_id == "juiciness" else 1.0
        assert abs(jm[ours_key] - ref) <= 2e-3 * scale, (cpp_id, jm[ours_key], ref)
    proc.close()


def test_cohere_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("cohere", "cohere",
               dict(match=0.65, learn=0.0, tail=0.45, decay=0.65, mix=1.0,
                    output=0.0), clip)


def test_cohere_learn_cpp_null(rng):
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    null_check("cohere_learn", "cohere",
               dict(match=1.0, learn=1.0, tail=0.8, decay=0.9, mix=1.0,
                    output=0.0), clip)


def test_cohere_contextfit_param(rng):
    """contextfit readout param (JuicyCohere/PluginProcessor.cpp:86-92)."""
    clip = make_clip(rng, 2, BLOCK * 4)
    proc = cpp_ref.CppProcessor("cohere", "off", SR, BLOCK, 2)
    params = dict(match=0.65, learn=0.0, tail=0.45, decay=0.65, mix=1.0,
                  output=0.0)
    proc.set_params(params)
    proc.run(clip.astype(np.float32), BLOCK)
    _, jm = run_jax("cohere", params, clip)
    assert abs(jm["context_fit"] - proc.get_param("contextfit")) <= 0.2
    proc.close()


# --- analyzer: all 13 metrics per block, streamed ---------------------------

def test_analyzer_cpp_metrics(rng):
    from juicy_tpu.analyzer import analyze, analyzer_init
    clip = make_clip(rng, 2, BLOCK * NBLOCKS)
    ca = cpp_ref.CppAnalyzer("off", SR, BLOCK, 2)
    state = analyzer_init()
    worst = {}
    for k in range(NBLOCKS):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        ref = ca.analyze(blk)
        state, ours = analyze(state, jnp.asarray(blk), SR)
        for key in cpp_ref.METRIC_NAMES:
            if key in ("pre_score", "post_score"):
                continue
            scale = 100.0 if key == "score" else 1.0
            d = abs(float(ours[key]) - ref[key]) / scale
            worst[key] = max(worst.get(key, 0.0), d)
    ca.close()
    _REPORT["analyzer_max_abs_err"] = {k: round(v, 7) for k, v in worst.items()}
    for key, d in worst.items():
        assert d <= 2e-4, f"analyzer metric {key}: max err {d:.2e} vs C++"


def test_analyzer_cpp_mono(rng):
    from juicy_tpu.analyzer import analyze, analyzer_init
    clip = make_clip(rng, 1, BLOCK * 3)
    ca = cpp_ref.CppAnalyzer("off", SR, BLOCK, 1)
    state = analyzer_init()
    for k in range(3):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        ref = ca.analyze(blk)
        state, ours = analyze(state, jnp.asarray(blk), SR)
        assert abs(float(ours["score"]) - ref["score"]) <= 2e-2
    ca.close()


# --- program API parity ------------------------------------------------------

@pytest.mark.parametrize("name", ["punch", "saturator", "width", "infer"])
def test_program_names_and_values(name):
    """Preset tables match the C++ program API (names + resulting params)."""
    from juicy_tpu.models import base
    defn = base.get_processor(name)
    proc = cpp_ref.CppProcessor(name, "off", SR, BLOCK, 2)
    assert proc.num_programs() == len(defn.presets)
    for i, (pname, pvals) in enumerate(defn.presets):
        assert proc.program_name(i) == pname
        proc.set_program(i)
        assert proc.current_program() == i
        for key, val in pvals.items():
            got = proc.get_param(key)
            # values pass through the normalized round-trip in the C++
            assert abs(got - float(val)) <= 2e-5 * max(1.0, abs(float(val))), (
                name, i, key, got, val)
    proc.close()


@pytest.mark.parametrize("sr2", [44100.0, 96000.0])
def test_sample_rate_robustness_cpp(sr2, rng):
    """Coefficients derive from sr everywhere (tau/onepole/waveguide sizes);
    null vs the compiled C++ at non-48k rates too. The high-Q waveguide's
    acceptance is ambiguity-aware like null_check: at 44.1/96 kHz the C++'s
    own two fp-contraction builds differ at −76/−71 dBFS, and we only demand
    to sit inside that spread."""
    clip = make_clip(rng, 2, BLOCK * 3)
    for name, params in (("saturator", dict(drive=9.0, asymmetry=0.2,
                                            tone=0.4, mix=1.0, output=-3.0)),
                         ("texture", dict(material=2, tailshape=0.6,
                                          damping=0.4, weight=0.5,
                                          texture=0.5, mix=1.0, output=-2.0))):
        plug = Plugin(name, sr2, 2, BLOCK)
        p = plug.default_params()
        for k, v in params.items():
            if k in plug.defn.static_params:
                plug._static[k] = int(v)
            else:
                p[k] = jnp.float32(v)
        state = plug.init_state()
        outs = []
        for k in range(3):
            out, state, _ = plug.jit_step(
                p, state, jnp.asarray(clip[:, k * BLOCK:(k + 1) * BLOCK]))
            outs.append(np.asarray(out))
        ours = np.concatenate(outs, axis=1)

        refs = {}
        for mode in ("off", "fma"):
            proc = cpp_ref.CppProcessor(name, mode, sr2, BLOCK, 2)
            proc.set_params(params)
            refs[mode] = proc.run(clip.astype(np.float32), BLOCK)
            proc.close()
        res = {m: residual_dbfs(ours, r) for m, r in refs.items()}
        ambiguity = residual_dbfs(refs["off"], refs["fma"])
        best = min(res.values())
        assert best <= max(-85.0, ambiguity + 3.0), (
            f"{name}@{sr2:.0f}Hz: best {best:.1f} dBFS "
            f"(C++ own build spread {ambiguity:.1f})")
