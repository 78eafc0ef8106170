"""Multi-stage VMEM chain kernel vs the XLA fused executor (interpret mode).

The chain kernel (kernels/chain_kernel.py) runs the whole 7-plugin suite as
ONE pallas_call per block; these tests pin it against
runtime.chain_fused.fused_chain_step/stream — which is itself null-tested
against the compiled C++ oracle (test_chain_fused.py, test_cpp_null.py) —
on small shapes via the Pallas interpreter.

Observed tolerances: the front kernel (punch→sat→texture→motion) is
bit-exact vs the fused executor; the back kernel's cohere band gains go
through exp/log instead of XLA's pow, so the full chain nulls at ≈−108 dBFS
(non-accumulating — verified over multi-block streams)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import juicy_tpu.kernels.stage_kernels as sk
from juicy_tpu.runtime.plugin import Chain
from juicy_tpu.runtime.chain_fused import fused_chain_step, fused_chain_stream
from tests.conftest import residual_dbfs

SR = 48000.0

CHAIN = [("punch", "Solar Snap"), ("saturator", "Amber Heat"),
         ("texture", None), ("motion", None), ("width", "Prism Arc"),
         ("cohere", None), ("infer", "Reference Lens")]


@pytest.fixture(autouse=True)
def small_tile():
    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    yield
    sk.TILE, sk.MSUB = tile, msub


def _clips(rng, b, t):
    tt = np.arange(t)
    sig = 0.25 * np.sin(2 * np.pi * 220.0 * tt / SR)
    for onset in range(0, t, 700):
        seg = np.arange(onset, min(t, onset + 300))
        sig[seg] += 0.5 * np.exp(-(seg - onset) / 90.0)
    clip = np.stack([sig, np.roll(sig, 7) * 0.9])
    clips = np.tile(clip[None], (b, 1, 1)) + \
        0.02 * rng.standard_normal((b, 2, t))
    return np.clip(clips, -0.99, 0.99).astype(np.float32)


def _mk(stages, n):
    chain = Chain(stages, sr=SR, channels=2, block_size=n)
    return chain


def test_chain_kernel_step_matches_fused(rng):
    from juicy_tpu.kernels import chain_kernel as ck

    b, n = 128, 128
    chain = _mk(CHAIN, n)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    blk = jnp.asarray(_clips(rng, b, n))
    out_f, st_f, m_f = fused_chain_step(chain, states, blk, unroll=1)
    out_k, st_k, m_k = ck.chain_kernel_step(chain, states2, blk, unroll=4,
                                            interpret=True)
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_f)) <= -90.0
    for i in range(7):
        assert float(np.max(np.abs(np.asarray(m_k[i]["score"])
                                   - np.asarray(m_f[i]["score"])))) <= 1e-3
    # punch envelope state is bit-exact (mul/add only, same op order);
    # saturator's tone filter passes through tanh whose compile-context
    # fusion differs by 1 ulp on a handful of samples
    for key in ("fast_env", "slow_env"):
        np.testing.assert_array_equal(np.asarray(st_k[0]["dsp"][key]),
                                      np.asarray(st_f[0]["dsp"][key]))
    np.testing.assert_allclose(np.asarray(st_k[1]["dsp"]["tone_state"]),
                               np.asarray(st_f[1]["dsp"]["tone_state"]),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_k[3]["dsp"]["rng"]),
                                  np.asarray(st_f[3]["dsp"]["rng"]))
    # analyzer onset counters are integer-exact
    for i in range(7):
        np.testing.assert_array_equal(
            np.asarray(st_k[i]["analyzer"]["onset_cooldown"]),
            np.asarray(st_f[i]["analyzer"]["onset_cooldown"]))
    # cohere learned targets / context fit track the fused path
    for key in ("target_low", "context_fit", "tail"):
        np.testing.assert_allclose(np.asarray(st_k[5]["dsp"][key]),
                                   np.asarray(st_f[5]["dsp"][key]),
                                   atol=2e-4)


@pytest.mark.parametrize("mode", [1, 2, 4])
def test_chain_kernel_materials(mode, rng):
    from juicy_tpu.kernels import chain_kernel as ck

    b, n = 128, 64
    stages = list(CHAIN)
    chain = _mk(stages, n)
    chain.plugins[2] = chain.plugins[2].with_static(material=mode)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    blk = jnp.asarray(_clips(rng, b, n))
    out_f, _, _ = fused_chain_step(chain, states, blk, unroll=1)
    out_k, _, _ = ck.chain_kernel_step(chain, states2, blk, unroll=4,
                                       interpret=True)
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_f)) <= -90.0


@pytest.mark.slow
def test_chain_kernel_stream_matches_fused(rng):
    """Multi-block: state carries across blocks; drift must not accumulate."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n, nb = 128, 128, 6
    chain = _mk(CHAIN, n)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    clips = jnp.asarray(_clips(rng, b, n * nb))
    out_f, st_f, m_f = fused_chain_stream(chain, states, clips, unroll=1)
    out_k, st_k, m_k = ck.chain_kernel_stream(chain, states2, clips,
                                              unroll=4, interpret=True)
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_f)) <= -90.0
    for i in range(7):
        assert float(np.max(np.abs(np.asarray(m_k[i]["score"])
                                   - np.asarray(m_f[i]["score"])))) <= 2e-3
        # the EMA-derived metrics thread the repetition/fatigue pair
        # across ALL blocks through the kernel path's associative prefix
        # scan — pin them (and the carried EMA state) against the fused
        # executor's serial order
        for key in ("repetition_density", "fatigue_risk"):
            np.testing.assert_allclose(np.asarray(m_k[i][key]),
                                       np.asarray(m_f[i][key]), atol=1e-5)
        for key in ("repetition_ema", "fatigue_ema"):
            np.testing.assert_allclose(
                np.asarray(st_k[i]["analyzer"][key]),
                np.asarray(st_f[i]["analyzer"][key]), atol=1e-4)


def test_chain_kernel_unsupported_layouts():
    import jax.numpy as jnp
    from juicy_tpu.kernels import chain_kernel as ck

    n = 64
    assert not ck.supports_chain_kernel(_mk([("punch", None)], n))
    wood = _mk(CHAIN, n)
    wood.plugins[2] = wood.plugins[2].with_static(material=2)
    assert ck.supports_chain_kernel(wood)   # wave materials supported
    mono = Chain(CHAIN, sr=SR, channels=1, block_size=n)
    assert not ck.supports_chain_kernel(mono)
    # NONWAVE mixed materials ride the PACKED kernel lane (round 4)
    mixed = _mk(CHAIN, n)
    mixed.plugins[2] = mixed.plugins[2].with_traced("material")
    mixed.params[2]["material"] = jnp.asarray([0.0, 1.0], jnp.float32)
    assert ck.supports_chain_kernel(mixed)
    # ... but any waveguide material in the mix -> fused executor
    wavemix = _mk(CHAIN, n)
    wavemix.plugins[2] = wavemix.plugins[2].with_traced("material")
    wavemix.params[2]["material"] = jnp.asarray([0.0, 2.0], jnp.float32)
    assert not ck.supports_chain_kernel(wavemix)
    assert ck.supports_chain_kernel(_mk(CHAIN, n))


@pytest.mark.slow
def test_chain_kernel_wave_stream(rng):
    """Waveguide material across MULTIPLE blocks: the sliding history
    window and write index must carry block-to-block (mono-scratch mode +
    hist DMA + per-block SMEM widx).

    Path-vs-path nulls through the full chain are CLASS guards for wave
    materials: 1-ulp fusion-context differences ring through the high-Q
    waveguide (content-dependent: per-clip medians measured −75 to −90
    dBFS across input seeds) and can flip motion's onset comparator on
    clips whose transients land within an ulp of threshold — the same
    divergence class as the reference's own two C++ builds (−47.5 dBFS on
    wave long rings; even the XLA fused path sits at ~−64 vs the C++ on
    onset-rich multi-block wave content). Real layout/state bugs read as
    ~0..−30 dBFS. Exactness evidence lives elsewhere: the single-block
    materials test nulls at ≤−90 and the carried waveguide ring is
    BIT-EXACT vs the fused path (verified in the mode-2 debug harness)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n, nb = 128, 128, 3
    chain = _mk(CHAIN, n)
    chain.plugins[2] = chain.plugins[2].with_static(material=3)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    clips = jnp.asarray(_clips(rng, b, n * nb))
    out_f, st_f, _ = fused_chain_stream(chain, states, clips, unroll=1)
    out_k, st_k, _ = ck.chain_kernel_stream(chain, states2, clips,
                                            unroll=4, interpret=True)
    res = np.max(np.abs(np.asarray(out_k) - np.asarray(out_f)), axis=(1, 2))
    db = 20.0 * np.log10(np.maximum(res, 1e-12))
    assert float(np.median(db)) <= -60.0, f"median {np.median(db):.1f} dBFS"
    assert float(db.max()) <= -35.0, f"worst clip {db.max():.1f} dBFS"
    # ring state reconstructs equivalently (wave_idx advanced nb blocks)
    np.testing.assert_array_equal(
        np.asarray(st_k[2]["dsp"]["wave_idx"]),
        np.asarray(st_f[2]["dsp"]["wave_idx"]))


@pytest.mark.slow
def test_chain_kernel_vs_cpp_oracle(rng):
    """Direct ground-truth anchor: the kernel chain (interpret) vs the
    compiled reference C++ stacked serially — not just vs the fused
    executor. Null budget ≤ −80 dBFS (BASELINE.json)."""
    from tests import cpp_ref
    from juicy_tpu.kernels import chain_kernel as ck

    if not cpp_ref.reference_available():
        pytest.skip("C++ oracle toolchain unavailable")
    b, nb = 128, 4
    chain = _mk(CHAIN, 512)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    clips = _clips(rng, b, 512 * nb)
    out_k, _, ms = ck.chain_kernel_stream(chain, states, jnp.asarray(clips),
                                          unroll=4, interpret=True)

    procs = []
    for (name, preset) in CHAIN:
        p = cpp_ref.CppProcessor(name, "off", SR, 512, 2)
        if preset is not None:
            # every named preset in CHAIN is index 0 (the ctor default)
            p.set_program(0)
        procs.append(p)
    ref = np.asarray(clips[0])
    for p in procs:
        ref = p.run(ref)
    db = residual_dbfs(np.asarray(out_k[0]), ref)
    assert db <= -80.0, f"kernel chain vs C++ oracle: {db:.1f} dBFS"


def test_chain_kernel_automation_matches_fused(rng):
    """Per-block parameter automation on the kernel path (every param
    rides the per-block pvec row) must match the fused executor driven
    block-by-block with the same parameter values — the host-automation
    analog (APVTS writes land between processBlocks)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n, nb = 128, 128, 4
    chain = _mk(CHAIN, n)
    curves = {
        0: {"mix": np.linspace(1.0, 0.4, nb).astype(np.float32)},
        1: {"drive": np.linspace(2.0, 14.0, nb).astype(np.float32)},
        4: {"width": np.linspace(0.2, 0.9, nb).astype(np.float32)},
        6: {"sensitivity": np.linspace(0.8, 1.4, nb).astype(np.float32)},
    }
    clips = jnp.asarray(_clips(rng, b, n * nb))
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    out_k, _st_k, m_k = ck.chain_kernel_stream(
        chain, states, clips, unroll=4, interpret=True, automation=curves)

    states_f = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    outs, scores = [], []
    for k in range(nb):
        params = [dict(p) for p in chain.params]
        for i, cs in curves.items():
            for key, curve in cs.items():
                params[i][key] = curve[k]
        blk = clips[:, :, k * n:(k + 1) * n]
        o, states_f, m = fused_chain_step(chain, states_f, blk, unroll=1,
                                          params=params)
        outs.append(np.asarray(o))
        scores.append(np.asarray(m[-1]["score"]))
    out_f = np.concatenate(outs, axis=-1)
    assert residual_dbfs(np.asarray(out_k), out_f) <= -90.0
    # infer's automated sensitivity scales the score per block
    np.testing.assert_allclose(np.asarray(m_k[-1]["score"]),
                               np.stack(scores), atol=2e-3)
    # the curves really changed the render across blocks
    assert residual_dbfs(out_f[..., :n], out_f[..., -n:]) > -40.0

    with pytest.raises(ck.ChainKernelUnsupported):
        ck.chain_kernel_stream(chain, states, clips, interpret=True,
                               automation={2: {"material": np.ones(nb)}})


def test_chain_kernel_tiles_layout_matches_bct(rng):
    """layout="tiles" (corpus already in kernel-tile layout; the
    device-side corpus transposes skipped) must be BIT-exact vs the
    [B, C, T] path: same kernel, same element mapping, only the repack
    moves to the caller (corpus_to_tiles / the native loader)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n, nb = 128, 128, 3
    chain = _mk(CHAIN, n)
    clips = jnp.asarray(_clips(rng, b, n * nb))
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    out_b, st_b, ms_b = ck.chain_kernel_stream(chain, states, clips,
                                               unroll=4, interpret=True)

    tiles = ck.corpus_to_tiles(clips, n)
    # round-trip sanity: the helpers are exact inverses
    np.testing.assert_array_equal(
        np.asarray(ck.tiles_to_corpus(tiles, 2)), np.asarray(clips))

    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    out_t, st_t, ms_t = ck.chain_kernel_stream(chain, states2, tiles,
                                               unroll=4, interpret=True,
                                               layout="tiles")
    assert out_t.shape == tiles.shape
    np.testing.assert_array_equal(
        np.asarray(ck.tiles_to_corpus(out_t, 2)), np.asarray(out_b))
    for a, bm in zip(ms_t, ms_b):
        jax.tree.map(lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)), a, bm)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), st_t, st_b)

    with pytest.raises(ck.ChainKernelUnsupported):
        ck.chain_kernel_stream(chain, states, clips, interpret=True,
                               layout="tiles")   # 3-D data, tiles layout


def test_chain_kernel_step_tiles_layout_matches_bct(rng):
    """The serving-tick analog: chain_kernel_step(layout="tiles") takes a
    [G, rows, 128] stream tile (a bridge that batches in tile layout) and
    must be bit-exact vs the [B, C, N] tick."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n = 128, 128
    chain = _mk(CHAIN, n)
    blk = jnp.asarray(_clips(rng, b, n))
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    out_b, st_b, ms_b = ck.chain_kernel_step(chain, states, blk, unroll=4,
                                             interpret=True)
    out_t, st_t, ms_t = ck.chain_kernel_step(chain, states,
                                             sk.to_stream(blk), unroll=4,
                                             interpret=True, layout="tiles")
    np.testing.assert_array_equal(
        np.asarray(sk.from_stream(out_t, b, 2)), np.asarray(out_b))
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), (st_t, ms_t), (st_b, ms_b))


@pytest.mark.slow
def test_chain_kernel_step_params_rows_matches_fused(rng):
    """PER-STREAM parameter rows on the kernel path (VERDICT r3 item 3):
    every clip carries its own knob values through the kernels' per-clip
    pvec tiles; results must match the vmapped fused executor fed the
    same per-slot params — the DAW per-track-knob analog
    (JuicyPunch/PluginProcessor.cpp:74-80, one APVTS per instance)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n = 128, 128
    chain = _mk(CHAIN, n)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    blk = jnp.asarray(_clips(rng, b, n))

    # per-slot rows: defaults broadcast, then scatter distinct edits
    # across stages and slots (incl. cohere learn toggles per slot)
    rows = [{k: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (b,))
             for k, v in pr.items()}
            for pr in chain.params]
    ed = rng.uniform(0.1, 0.9, b).astype(np.float32)
    rows[0] = dict(rows[0], punch=jnp.asarray(ed),
                   clip=jnp.asarray(ed[::-1].copy()))
    rows[1] = dict(rows[1], drive=jnp.asarray(24.0 * ed),
                   tone=jnp.asarray(1.0 - ed))
    rows[2] = dict(rows[2], texture=jnp.asarray(1.0 - ed))
    rows[3] = dict(rows[3], microvar=jnp.asarray(0.5 * ed))
    rows[4] = dict(rows[4], width=jnp.asarray(0.4 + ed))
    rows[5] = dict(rows[5], learn=jnp.asarray(
        (np.arange(b) % 2).astype(np.float32)))
    rows[6] = dict(rows[6], trim=jnp.asarray(6.0 * ed - 3.0),
                   sensitivity=jnp.asarray(0.5 + ed))

    def one(st, x, pr):
        return fused_chain_step(chain, st, x, params=pr, unroll=1)
    out_f, st_f, m_f = jax.vmap(one)(
        states, blk, rows)

    out_k, st_k, m_k = ck.chain_kernel_step(chain, states2, blk, unroll=4,
                                            interpret=True,
                                            params_rows=rows)
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_f)) <= -90.0
    for i in range(7):
        assert float(np.max(np.abs(np.asarray(m_k[i]["score"])
                                   - np.asarray(m_f[i]["score"])))) <= 1e-3
    # the rows really differentiated the streams
    o = np.asarray(out_k)
    assert np.abs(o[0] - o[1]).max() > 1e-3
    # learn toggles landed per slot: learned targets (init 0.2) moved only
    # on the odd (learn=1) slots
    t0 = np.asarray(st_k[5]["dsp"]["target_low"])
    np.testing.assert_array_equal(t0[0::2], np.float32(0.2))
    assert np.abs(t0[1::2] - 0.2).max() > 1e-6


@pytest.mark.slow
def test_chain_kernel_packed_nonwave_materials(rng):
    """PACKED per-lane materials (VERDICT r3 item 5): a gel/metal/flesh
    mix runs as ONE kernel tile, each lane selected by its mode word —
    results must match the traced-material fused executor AND, per lane,
    the static-material kernel runs (each packed branch is the same code
    as its static branch, so agreement is exact up to the usual
    kernel-vs-fused class)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n = 128, 128
    mats = np.asarray(([0.0, 1.0, 4.0] * 43)[:128], np.float32)   # [128]
    chain = _mk(CHAIN, n)
    chain.plugins[2] = chain.plugins[2].with_traced("material")
    chain.params[2]["material"] = jnp.asarray(mats)
    assert ck._check_chain(chain) == sk.TEX_PACKED

    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    states2 = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    blk = jnp.asarray(_clips(rng, b, n))
    out_f, st_f, m_f = fused_chain_step(chain, states, blk, unroll=1)
    out_k, st_k, m_k = ck.chain_kernel_step(chain, states2, blk, unroll=4,
                                            interpret=True)
    # -80 class, not -90: the packed kernel uses the STATIC branches'
    # precomputed modal constants while the traced fused path recomputes
    # them per sample — two approximation classes cross (observed ~-85)
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_f)) <= -80.0
    for i in range(7):
        assert float(np.max(np.abs(np.asarray(m_k[i]["score"])
                                   - np.asarray(m_f[i]["score"])))) <= 1e-3

    # per-lane parity vs STATIC-material kernel runs. The formulas are
    # identical per branch, but packed and static are two different
    # compiled programs — compile-context FMA contraction differs by
    # ulps, which the motion onset comparator can amplify into single
    # flipped transients (the suite's standard path-vs-path class);
    # the budget is the -80 dBFS null bar, observed ~-85.
    for mode in (0, 1, 4):
        solo = _mk(CHAIN, n)
        solo.plugins[2] = solo.plugins[2].with_static(material=mode)
        st3 = jax.vmap(lambda _: solo.init_state())(jnp.arange(b))
        out_s, _, _ = ck.chain_kernel_step(solo, st3, blk, unroll=4,
                                           interpret=True)
        lanes = mats == float(mode)
        db = residual_dbfs(np.asarray(out_k)[lanes],
                           np.asarray(out_s)[lanes])
        assert db <= -80.0, f"packed lane != static mode {mode}: {db:.1f}"


@pytest.mark.slow
def test_chain_kernel_merged_wave_rows(rng):
    """MERGED WAVE launch (VERDICT r4 item 4, sk.TEX_WAVE_ROWS): wood and
    plastic clip tiles share ONE pallas_call, each grid row reading its
    own material's constant row (incl. the structural ring delay) from
    the per-grid-row SMEM pvec. The wave kernel body is the SAME code for
    both materials (shared-injection form, stage_kernels make_tex_sample),
    so each row must reproduce its static-material kernel run — same
    formulas in two compiled programs, the -80 dBFS path-vs-path class
    (observed much tighter: the bodies are op-for-op identical)."""
    from juicy_tpu.kernels import chain_kernel as ck

    b, n, nb = 256, 64, 2
    mats = np.concatenate([np.full(128, 2.0, np.float32),
                           np.full(128, 3.0, np.float32)])
    chain = _mk(CHAIN, n)
    chain.plugins[2] = chain.plugins[2].with_traced("material")
    chain.params[2]["material"] = mats
    assert ck._check_chain(chain) == sk.TEX_WAVE_ROWS

    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(b))
    clips = jnp.asarray(_clips(rng, b, n * nb))
    out_m, st_m, m_m = ck.chain_kernel_stream(chain, states, clips,
                                              unroll=4, interpret=True)
    for mode in (2, 3):
        solo = _mk(CHAIN, n)
        solo.plugins[2] = solo.plugins[2].with_static(material=mode)
        st_s = jax.vmap(lambda _: solo.init_state())(jnp.arange(b))
        out_s, st_ss, m_s = ck.chain_kernel_stream(solo, st_s, clips,
                                                   unroll=4,
                                                   interpret=True)
        lanes = mats == float(mode)
        db = residual_dbfs(np.asarray(out_m)[lanes],
                           np.asarray(out_s)[lanes])
        assert db <= -80.0, f"merged row != static mode {mode}: {db:.1f}"
        assert float(np.max(np.abs(
            np.asarray(m_m[-1]["score"])[:, lanes]
            - np.asarray(m_s[-1]["score"])[:, lanes]))) <= 1e-3

    # a non-tile-aligned material row must NOT select the merged path
    bad = _mk(CHAIN, n)
    bad.plugins[2] = bad.plugins[2].with_traced("material")
    bad.params[2]["material"] = np.asarray([2.0, 3.0] * 128, np.float32)
    with pytest.raises(ck.ChainKernelUnsupported):
        ck._check_chain(bad)
