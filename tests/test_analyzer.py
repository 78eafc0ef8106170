"""Golden tests: JAX analyzer vs the serial float32 oracle, with state carry."""

import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.analyzer import analyze, analyzer_init
from tests.conftest import make_clip
from tests.oracles import AnalyzerOracle

SR = 48000.0
BLOCK = 512

FIELDS = ("score", "punch", "richness", "clarity", "width", "mono_safety",
          "emphasis", "coherence", "synesthesia", "fatigue_risk",
          "repetition_density")


def _run_both(clip, channels):
    oracle = AnalyzerOracle(SR, channels)
    state = analyzer_init()
    n_blocks = clip.shape[1] // BLOCK
    jit_analyze = jax.jit(lambda s, b: analyze(s, b, SR))
    ours, theirs = [], []
    for k in range(n_blocks):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        state, m = jit_analyze(state, jnp.asarray(blk))
        ours.append({f: float(m[f]) for f in FIELDS})
        theirs.append({f: float(v) for f, v in oracle.analyze(blk).items()})
    return ours, theirs


def _assert_close(ours, theirs):
    for k, (a, b) in enumerate(zip(ours, theirs)):
        for f in FIELDS:
            scale = 100.0 if f == "score" else 1.0
            assert abs(a[f] - b[f]) < 1e-4 * scale + 1e-5, \
                f"block {k} field {f}: {a[f]} vs {b[f]}"


def test_analyzer_stereo(rng):
    clip = make_clip(rng, channels=2, samples=BLOCK * 8)
    _assert_close(*_run_both(clip, 2))


def test_analyzer_mono(rng):
    clip = make_clip(rng, channels=1, samples=BLOCK * 8)
    _assert_close(*_run_both(clip, 1))


def test_analyzer_anticorrelated(rng):
    """Exercises the corr clamp and mono-safety penalty paths."""
    clip = make_clip(rng, channels=2, samples=BLOCK * 6, kind="anticorrelated")
    ours, theirs = _run_both(clip, 2)
    _assert_close(ours, theirs)
    assert ours[-1]["mono_safety"] < 0.3   # strongly decorrelated program


def test_analyzer_silence():
    clip = np.zeros((2, BLOCK * 2), np.float32)
    ours, theirs = _run_both(clip, 2)
    _assert_close(ours, theirs)


def test_analyzer_batched_matches_single(rng):
    """vmap over a clips axis == per-clip analysis (§2.4 batch parallelism)."""
    clips = np.stack([make_clip(rng, 2, BLOCK * 2) for _ in range(4)])
    states = jax.vmap(lambda _: analyzer_init())(jnp.arange(4))
    batched = jax.vmap(lambda s, b: analyze(s, b, SR))
    st, m = batched(states, jnp.asarray(clips[:, :, :BLOCK]))
    for i in range(4):
        s1, m1 = analyze(analyzer_init(), jnp.asarray(clips[i, :, :BLOCK]), SR)
        for f in FIELDS:
            np.testing.assert_allclose(np.asarray(m[f])[i], np.asarray(m1[f]),
                                       rtol=1e-5, atol=1e-6)
