"""fidelity="relaxed" — the block-parallel executor tier (runtime/relaxed.py).

Certifies the tier's numeric envelope against the EXACT executors: audio
residual bars per stage, score deltas, cross-block state carry, and the
exactness claims (parallel onset-with-cooldown, (min, affine) limiter,
wood/plastic fallback). Bars reflect measured floors: the linear stages
sit at reassociation level (<= -100 dBFS), texture's modal materials at
the matrix-scan reassociation floor (metal ~-66 dBFS at Q~400)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_clip, residual_dbfs

from juicy_tpu.runtime.plugin import Chain, Plugin
from juicy_tpu.runtime import relaxed as rx

SR = 48000.0
BLOCK = 512

STAGE_BARS = [
    ("punch", None, -100.0),
    ("saturator", None, -100.0),
    ("width", None, -100.0),
    ("infer", None, -100.0),
    ("cohere", None, -100.0),
    ("motion", None, -100.0),
    ("texture", {"material": 0}, -80.0),
    ("texture", {"material": 1}, -60.0),
    ("texture", {"material": 4}, -60.0),
]


def _run_relaxed(plug, params, clip):
    nb = clip.shape[-1] // BLOCK
    blocks = jnp.moveaxis(jnp.asarray(clip).reshape(2, nb, BLOCK), 1, 0)
    st = plug.init_state()
    outs, last = [], None
    for k in range(nb):
        o, st, last = rx.relaxed_step(plug, params, st, blocks[k])
        outs.append(np.asarray(o))
    return np.concatenate(outs, axis=-1), last, st


@pytest.mark.parametrize("name,static,bar", STAGE_BARS,
                         ids=[f"{n}{'' if s is None else s['material']}"
                              for n, s, _ in STAGE_BARS])
def test_stage_relaxed_matches_exact(name, static, bar, rng):
    clip = make_clip(np.random.default_rng(0xA0D10), 2, BLOCK * 4)
    plug = Plugin(name, SR, 2, BLOCK)
    if static:
        plug = plug.with_static(**static)
    params = plug.full_params(plug.default_params())
    out_e, _, m_e = plug.run(params, plug.init_state(), clip)
    out_r, last_r, _ = _run_relaxed(plug, params, clip)
    db = residual_dbfs(out_r, np.asarray(out_e))
    assert db <= bar, f"{name} relaxed audio {db:.1f} dBFS vs bar {bar}"
    sc_e = float(np.asarray(m_e["score"]).ravel()[-1])
    sc_r = float(np.asarray(last_r["score"]))
    assert abs(sc_e - sc_r) <= 0.15, f"{name} score {sc_r} vs exact {sc_e}"


def test_full_chain_relaxed_matches_exact(rng):
    """The canonical 7-stage chain: relaxed executor within -90 dBFS of the
    exact batched executor, scores within 0.01 (measured: -104.8 / 5e-5)."""
    local = np.random.default_rng(0xA0D10)
    B = 4
    clips = np.stack([make_clip(local, 2, BLOCK * 4)
                      for _ in range(B)]).astype(np.float32)
    stages = [("punch", None), ("saturator", None), ("texture", None),
              ("motion", None), ("width", None), ("cohere", None),
              ("infer", None)]
    chain = Chain(stages, sr=SR, channels=2, block_size=BLOCK)
    st_e = [jax.vmap(lambda _: p.init_state())(jnp.arange(B))
            for p in chain.plugins]
    out_e, _, m_e = chain.batched_run(st_e, clips)
    st_r = [jax.vmap(lambda _: p.init_state())(jnp.arange(B))
            for p in chain.plugins]
    out_r, _, m_r = rx.relaxed_chain_stream(chain, st_r, clips)
    db = residual_dbfs(np.asarray(out_r), np.asarray(out_e))
    assert db <= -90.0, f"full-chain relaxed residual {db:.1f} dBFS"
    se = np.asarray(m_e[-1]["score"][-1])
    sr_ = np.asarray(m_r[-1]["score"][-1])
    np.testing.assert_allclose(sr_, se, atol=0.01)


def test_relaxed_texture_waveguide_falls_back_exact(rng):
    """Wood (material=2) has no relaxed path: relaxed_step runs the exact
    sequential process (fallback, not approximation) — residual vs the
    exact executor is compilation-context ulps only (measured -121.6, far
    below the -60 relaxed-tier class), with the relaxed ANALYZER the one
    shared approximation left in the step."""
    clip = make_clip(np.random.default_rng(0xA0D11), 2, BLOCK * 2)
    plug = Plugin("texture", SR, 2, BLOCK).with_static(material=2)
    params = plug.full_params(plug.default_params())
    out_e, _, _ = plug.run(params, plug.init_state(), clip)
    out_r, _, _ = _run_relaxed(plug, params, clip)
    assert residual_dbfs(out_r, np.asarray(out_e)) <= -110.0


def test_ar_envelope_relaxed_bounds(rng):
    """ops-level: iterative envelope within -60 dBFS of the exact scan on
    onset-rich material, exact (reassociation-level) when attack==release."""
    from juicy_tpu.ops.envelopes import ar_envelope, ar_envelope_relaxed
    from juicy_tpu.utils.convert import tau_coeff
    local = np.random.default_rng(7)
    x = np.abs(make_clip(local, 1, 2048)[0])
    atk, rel = tau_coeff(0.003, SR), tau_coeff(0.030, SR)
    e = np.asarray(ar_envelope(x, atk, rel, np.float32(0.0)))
    r = np.asarray(ar_envelope_relaxed(x, atk, rel, np.float32(0.0),
                                       iters=rx.AR_ITERS))
    assert residual_dbfs(r, e) <= -60.0
    # same coefficient both ways -> a single linear recurrence, ulp-level
    e2 = np.asarray(ar_envelope(x, rel, rel, np.float32(0.0)))
    r2 = np.asarray(ar_envelope_relaxed(x, rel, rel, np.float32(0.0)))
    assert residual_dbfs(r2, e2) <= -120.0


def test_parallel_onset_matches_scan_across_blocks(rng):
    """The parallel onset-with-cooldown is EXACT: analyzer state after
    several blocks (count path + cooldown carry) matches the sequential
    scan bit-for-bit when fed the same envelopes. Validated end-to-end:
    identical onset_cooldown trajectories imply identical repetition
    EMAs, which the full-chain score parity test already pins; here we
    check the cooldown state directly on a click train."""
    from juicy_tpu import analyzer as an
    local = np.random.default_rng(3)
    # loud click every ~20 ms -> onsets throttled by the 35 ms cooldown
    clip = np.zeros((2, BLOCK * 6), np.float32)
    clip[:, ::960] = 0.9
    clip += 0.01 * local.standard_normal(clip.shape).astype(np.float32)
    st_e = an.analyzer_init()
    st_r = an.analyzer_init()
    nb = clip.shape[-1] // BLOCK
    for k in range(nb):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        st_e, m_e = an.analyze(st_e, blk, SR)
        st_r, m_r = rx.analyze_relaxed(st_r, blk, SR)
        # same cooldown class: the relaxed envelopes may flip a borderline
        # onset by one sample, but the click train is far from borderline
        assert int(st_e["onset_cooldown"]) == int(st_r["onset_cooldown"]), k
        assert abs(float(m_e["repetition_density"])
                   - float(m_r["repetition_density"])) < 1e-5
