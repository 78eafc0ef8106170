"""Multi-chip tests on the simulated 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from juicy_tpu.ops.scan_utils import linear_scan
from juicy_tpu.parallel.mesh import make_mesh, shard_clips, batch_sharding
from juicy_tpu.parallel.timeshard import sequence_parallel_linear_scan
from juicy_tpu.runtime.plugin import Plugin
from tests.conftest import make_clip, residual_dbfs

import pytest

SR = 48000.0

# Multi-chip tests need the virtual 8-device CPU mesh; under JUICY_TEST_TPU=1
# the suite runs on the single real chip and these are skipped.
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_batch_matches_single_device(rng):
    """dp over clips: sharded batch result == per-clip result."""
    mesh = make_mesh()
    clips = np.stack([make_clip(rng, 2, 512) for _ in range(8)])
    plug = Plugin("saturator", SR, 2, 512)
    params = plug.default_params()

    def one(clip):
        state = plug.init_state()
        out, _, m = plug.step(params, state, clip)
        return out, m["score"]

    sharded = shard_clips(mesh, jnp.asarray(clips))
    out_sh, scores_sh = jax.jit(jax.vmap(one))(sharded)
    out_1, scores_1 = jax.jit(jax.vmap(one))(jnp.asarray(clips))
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(scores_sh), np.asarray(scores_1),
                               rtol=1e-5)


def test_corpus_mean_collective(rng):
    """Corpus metric aggregation over a sharded batch (psum over the mesh)."""
    mesh = make_mesh()
    clips = np.stack([make_clip(rng, 2, 512) for _ in range(8)])
    plug = Plugin("infer", SR, 2, 512)
    params = plug.default_params()

    def one(clip):
        out, _, m = plug.step(params, plug.init_state(), clip)
        return m["score"]

    @jax.jit
    def corpus_mean(cs):
        return jnp.mean(jax.vmap(one)(cs))

    got = float(corpus_mean(shard_clips(mesh, jnp.asarray(clips))))
    want = float(np.mean(np.asarray(jax.vmap(one)(jnp.asarray(clips)))))
    assert abs(got - want) < 1e-3


def test_sequence_parallel_linear_scan_matches_local(rng):
    """sp over time: Blelloch two-level scan across devices == local scan."""
    mesh = make_mesh(axis_sizes=(1, 8), axis_names=("data", "seq"))
    t = 8 * 64
    x = rng.standard_normal((4, t)).astype(np.float32)
    a = rng.uniform(0.5, 0.99, (4, t)).astype(np.float32)
    init = rng.standard_normal(4).astype(np.float32)

    y_sp = sequence_parallel_linear_scan(mesh, jnp.asarray(a), jnp.asarray(x),
                                         jnp.asarray(init), seq_axis="seq")
    y_ref = linear_scan(jnp.asarray(a), jnp.asarray(x), jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dp_sp_mesh_full_chain_dryrun():
    """The driver's multi-chip dry run must pass on the 8-device CPU mesh.

    Runs in a SUBPROCESS like the driver does: dryrun_multichip mutates
    global jax config (platform/device count), which must not leak into
    the rest of this session."""
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    code = ("import importlib.util;"
            f"spec = importlib.util.spec_from_file_location('graft_entry',"
            f" r'{root / '__graft_entry__.py'}');"
            "mod = importlib.util.module_from_spec(spec);"
            "spec.loader.exec_module(mod);"
            "mod.dryrun_multichip(8)")
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900, cwd=root, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip ok" in r.stdout


@pytest.mark.slow
def test_grouped_materials_match_single(rng):
    """Mixed-material corpus == per-clip runs with static materials."""
    from juicy_tpu.parallel.grouping import run_grouped
    clips = np.stack([make_clip(rng, 2, 1024) for _ in range(4)])
    materials = [0, 3, 0, 1]
    plug = Plugin("texture", SR, 2, 512)
    params = plug.default_params()
    out, scores = run_grouped(plug, params, clips, materials)
    for i, m in enumerate(materials):
        solo = Plugin("texture", SR, 2, 512)
        p = solo.default_params()
        solo._static["material"] = m
        o, _, met = solo.run(p, solo.init_state(), jnp.asarray(clips[i]))
        np.testing.assert_allclose(out[i], np.asarray(o), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(scores[i], np.asarray(met["score"][-1]),
                                   rtol=1e-5, atol=1e-4)


def test_entry_compiles():
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out, states, metrics = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_run_corpus_chain_fused():
    """run_corpus_chain (fused executor + mesh sharding) matches the
    stage-major chain and aggregates the last stage's metrics."""
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain
    chain = Chain([("punch", "Solar Snap"), ("saturator", "Amber Heat"),
                   ("infer", None)], sr=48000.0, channels=2, block_size=512)
    rng = np.random.default_rng(11)
    clips = np.stack([make_clip(rng, 2, 512 * 3) for _ in range(8)]).astype(
        np.float32)
    out, ms, agg = run_corpus_chain(chain, clips)
    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(8))
    out_ref, _, m_ref = chain.batched_run(states, clips)
    assert residual_dbfs(np.asarray(out), np.asarray(out_ref)) <= -95.0
    np.testing.assert_allclose(np.asarray(ms[-1]["score"]),
                               np.asarray(m_ref[-1]["score"])[-1], atol=2e-3)
    assert 0.0 <= float(agg["score"]["mean"]) <= 100.0


@pytest.mark.slow
def test_sharded_kernel_corpus_matches_single_device(rng):
    """The multi-stage chain kernel under shard_map on the 8-device mesh:
    per-shard kernel streams must reproduce the single-device run
    (embarrassingly clip-parallel; only the metric aggregation reduces)."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", "Solar Snap"), ("saturator", None),
                  ("texture", None), ("motion", None), ("width", None),
                  ("cohere", None), ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        b, nb = 1024, 2          # 8 devices x 128 clips (one tile each)
        clips = np.stack([make_clip(rng, 2, 128 * nb)
                          for _ in range(8)] * (b // 8)).astype(np.float32)
        mesh = make_mesh()
        out_sh, ms_sh, agg = run_corpus_chain(
            chain, clips, mesh=mesh, metrics="final", use_kernel="always",
            _interpret=True)
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        out_1, ms_1, _ = run_corpus_chain(
            chain, clips, mesh=single, metrics="final", use_kernel="always",
            _interpret=True)
        # per-shard vs monolithic compilation contexts differ by ulps only
        assert residual_dbfs(np.asarray(out_sh), np.asarray(out_1)) <= -100.0
        np.testing.assert_allclose(np.asarray(ms_sh[-1]["score"]),
                                   np.asarray(ms_1[-1]["score"]), atol=1e-3)
        assert 0.0 <= float(agg["score"]["mean"]) <= 100.0
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_stage_kernel_corpus_matches_xla(rng):
    """run_corpus(use_kernel=) routes single-plugin corpora onto the winning
    full-stage Pallas kernels (texture/saturator): kernel output must match
    the XLA batch-major path. The 8-device shard_map variant runs in a
    SUBPROCESS: two different interpret-mode Pallas kernels under shard_map
    in one process trip an XLA-CPU abort (same class the dp/sp dryrun test
    isolates)."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.parallel.corpus import run_corpus
    from juicy_tpu.runtime.plugin import Plugin

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        for name, static in (("saturator", None), ("texture", {"material": 1})):
            plug = Plugin(name, 48000.0, 2, 128)
            if static:
                plug = plug.with_static(**static)
            params = plug.full_params(plug.default_params())
            clips = np.stack([make_clip(rng, 2, 128 * 2)
                              for _ in range(8)] * 16).astype(np.float32)
            out_k, last_k, agg_k = run_corpus(
                plug, params, clips, mesh=single, use_kernel="always",
                _interpret=True)
            out_x, last_x, _ = run_corpus(plug, params, clips, mesh=single,
                                          use_kernel="never")
            db = residual_dbfs(np.asarray(out_k), np.asarray(out_x))
            assert db <= -100.0, f"{name} kernel corpus diverges: {db:.1f}"
            np.testing.assert_allclose(np.asarray(last_k["score"]),
                                       np.asarray(last_x["score"]), atol=1e-3)
            assert 0.0 <= float(agg_k["score"]["mean"]) <= 100.0

        # punch has no winning stage kernel: "always" must refuse
        plug = Plugin("punch", 48000.0, 2, 128)
        with pytest.raises(ValueError):
            run_corpus(plug, plug.full_params(plug.default_params()),
                       clips, mesh=single, use_kernel="always",
                       _interpret=True)
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_stage_kernel_corpus_sharded_subprocess():
    """The mesh-sharded (shard_map) stage-kernel corpus, isolated in a
    subprocess; asserts sharded == single-device output."""
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    code = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax
import juicy_tpu.kernels.stage_kernels as sk
sk.TILE, sk.MSUB = 128, 1
from juicy_tpu.parallel.corpus import run_corpus
from juicy_tpu.parallel.mesh import make_mesh
from jax.sharding import Mesh
from juicy_tpu.runtime.plugin import Plugin

plug = Plugin("saturator", 48000.0, 2, 128)
params = plug.full_params(plug.default_params())
rng = np.random.default_rng(0)
clips = (rng.standard_normal((1024, 2, 256)) * 0.1).astype(np.float32)
out_sh, last_sh, agg = run_corpus(plug, params, clips, mesh=make_mesh(),
                                  use_kernel="always", _interpret=True)
single = Mesh(np.array(jax.devices()[:1]), ("data",))
out_1, last_1, _ = run_corpus(plug, params, clips, mesh=single,
                              use_kernel="always", _interpret=True)
res = float(np.max(np.abs(np.asarray(out_sh) - np.asarray(out_1))))
assert res < 1e-6, res
assert 0.0 <= float(agg["score"]["mean"]) <= 100.0
print("sharded stage-kernel corpus ok")
"""
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900, cwd=root, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded stage-kernel corpus ok" in r.stdout


@pytest.mark.slow
def test_corpus_chain_automation(rng):
    """run_corpus_chain(automation=) works on BOTH executors (VERDICT r3
    item 7): the kernel's per-block pvec rows and the fused executor's
    per-block param xs must agree, and non-canonical chains (which can
    never ride the kernel) automate on the fused path like any reference
    host instance (JuicyPunch/PluginProcessor.cpp:74-80)."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", None), ("saturator", None), ("texture", None),
                  ("motion", None), ("width", None), ("cohere", None),
                  ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        nb = 2
        clips = np.stack([make_clip(rng, 2, 128 * nb)
                          for _ in range(8)] * 16).astype(np.float32)
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        curves = {1: {"drive": np.linspace(3.0, 15.0, nb)}}
        out_a, ms_a, agg_a = run_corpus_chain(
            chain, clips, mesh=single, use_kernel="always",
            automation=curves, _interpret=True)
        out_0, _, _ = run_corpus_chain(chain, clips, mesh=single,
                                       use_kernel="always", _interpret=True)
        # the curve actually changed the render, and scores stay valid
        assert residual_dbfs(np.asarray(out_a), np.asarray(out_0)) > -40.0
        assert 0.0 <= float(agg_a["score"]["mean"]) <= 100.0

        # fused-executor automation matches the kernel executor
        out_f, _, agg_f = run_corpus_chain(
            chain, clips, mesh=single, use_kernel="never",
            automation=curves, _interpret=True)
        assert residual_dbfs(np.asarray(out_f), np.asarray(out_a)) <= -90.0
        np.testing.assert_allclose(float(agg_f["score"]["mean"]),
                                   float(agg_a["score"]["mean"]), atol=1e-3)

        # a NON-canonical chain (reordered, kernel-ineligible) automates
        # on the fused executor
        mini = Chain([("saturator", None), ("punch", None)],
                     sr=48000.0, channels=2, block_size=128)
        out_m, _, agg_m = run_corpus_chain(
            mini, clips[:16], mesh=single, use_kernel="never",
            automation={0: {"drive": np.linspace(0.0, 20.0, nb)}})
        out_m0, _, _ = run_corpus_chain(mini, clips[:16], mesh=single,
                                        use_kernel="never")
        assert residual_dbfs(np.asarray(out_m), np.asarray(out_m0)) > -40.0
        assert 0.0 <= float(agg_m["score"]["mean"]) <= 100.0
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_corpus_program_cache(rng):
    """run_corpus_chain caches its jitted program across calls: equivalent
    chains built FRESH (the grouped mixed-material runner does exactly that
    every call) reuse one traced program instead of re-tracing the whole
    chain scan, while any semantic change — a param value, a metrics mode —
    is a miss and runs its own program (wrong-aliasing would silently
    return the old chain's audio, so parity is asserted both ways)."""
    from juicy_tpu.parallel import corpus as cp
    from juicy_tpu.runtime.plugin import Chain

    stages = [("punch", None), ("saturator", None)]

    def mk(**over):
        chain = Chain(stages, sr=SR, channels=2, block_size=128)
        if over:
            chain.params[0] = dict(chain.params[0], **over)
        return chain

    clips = np.stack([make_clip(rng, 2, 256) for _ in range(8)])
    single = Mesh(np.array(jax.devices()[:1]), ("data",))

    cp._CORPUS_PROGRAM_CACHE.clear()
    out1, _, _ = cp.run_corpus_chain(mk(), clips, mesh=single,
                                     metrics="final", use_kernel="never")
    assert len(cp._CORPUS_PROGRAM_CACHE) == 1
    out2, _, _ = cp.run_corpus_chain(mk(), clips, mesh=single,
                                     metrics="final", use_kernel="never")
    assert len(cp._CORPUS_PROGRAM_CACHE) == 1         # fresh equal chain: hit
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # a changed param VALUE is a different program (params are baked into
    # the trace as constants) — must miss and actually change the render
    out3, _, _ = cp.run_corpus_chain(mk(punch=0.95), clips, mesh=single,
                                     metrics="final", use_kernel="never")
    assert len(cp._CORPUS_PROGRAM_CACHE) == 2
    assert np.max(np.abs(np.asarray(out3) - np.asarray(out1))) > 1e-6

    # a different metrics mode is a miss too
    _, ms4, _ = cp.run_corpus_chain(mk(), clips, mesh=single,
                                    metrics="blocks", use_kernel="never")
    assert len(cp._CORPUS_PROGRAM_CACHE) == 3
    assert np.asarray(ms4[-1]["score"]).ndim == 2     # [nb, B]

    # single-plugin runner caches the same way
    plug = Plugin("saturator", SR, 2, 128)
    params = plug.default_params()
    n0 = len(cp._CORPUS_PROGRAM_CACHE)
    o1, _, _ = cp.run_corpus(plug, params, clips, mesh=single,
                             use_kernel="never")
    o2, _, _ = cp.run_corpus(plug, dict(params), clips, mesh=single,
                             use_kernel="never")
    assert len(cp._CORPUS_PROGRAM_CACHE) == n0 + 1
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_corpus_chain_score_only(rng):
    """return_audio=False (the scoring-only corpus mode, the JuicyInfer
    batch use case): metrics identical to the audio-returning run, out is
    None — the render is never stacked or transposed back."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", None), ("saturator", None), ("texture", None),
                  ("motion", None), ("width", None), ("cohere", None),
                  ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        clips = np.stack([make_clip(rng, 2, 128 * 2)
                          for _ in range(8)] * 16).astype(np.float32)
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        for use_kernel in ("always", "never"):
            out_a, ms_a, agg_a = run_corpus_chain(
                chain, clips, mesh=single, metrics="final",
                use_kernel=use_kernel, _interpret=True)
            out_n, ms_n, agg_n = run_corpus_chain(
                chain, clips, mesh=single, metrics="final",
                use_kernel=use_kernel, return_audio=False, _interpret=True)
            assert out_n is None
            assert out_a is not None
            np.testing.assert_array_equal(np.asarray(ms_n[-1]["score"]),
                                          np.asarray(ms_a[-1]["score"]))
            np.testing.assert_array_equal(np.asarray(agg_n["score"]["mean"]),
                                          np.asarray(agg_a["score"]["mean"]))
    finally:
        sk.TILE, sk.MSUB = tile, msub


@pytest.mark.slow
def test_corpus_chain_grouped_materials(rng):
    """materials=[B] groups a mixed-material corpus by texture material and
    runs each group fully vectorized on its own compiled (kernel) path —
    per-clip output and score must match the per-material static runs,
    including groups padded up to the clip tile."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", None), ("saturator", None), ("texture", None),
                  ("motion", None), ("width", None), ("cohere", None),
                  ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        b = 192
        # nonwave mix (gel/metal/flesh): PACKS into ONE kernel sub-run
        # (round 4, sk.TEX_PACKED) — one tile-granule padding total,
        # instead of one per material
        mats = np.array([0, 1, 4] * (b // 3))
        clips = np.stack([make_clip(rng, 2, 128 * 2)
                          for _ in range(8)] * (b // 8)).astype(np.float32)
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        out_g, ms_g, agg_g = run_corpus_chain(
            chain, clips, mesh=single, metrics="final", materials=mats,
            _interpret=True)
        assert 0.0 <= float(agg_g["score"]["mean"]) <= 100.0

        # oracle: one static-material kernel run per material. The packed
        # lane and the static branch are the same formulas in two
        # different compiled programs, so parity is the -80 dBFS
        # path-vs-path class (compile-context FMA contraction can flip
        # single onset events), not the bit-level -100 of same-program
        # grouping.
        for m in (0, 1, 4):
            idx = np.nonzero(mats == m)[0]
            sub = np.concatenate(
                [clips[idx], np.zeros((128 - len(idx) % 128,) +
                                      clips.shape[1:], np.float32)])
            ch_m = Chain([("punch", None), ("saturator", None),
                          ("texture", {"material": float(m)}),
                          ("motion", None), ("width", None),
                          ("cohere", None), ("infer", None)],
                         sr=48000.0, channels=2, block_size=128)
            out_m, ms_m, _ = run_corpus_chain(
                ch_m, sub, mesh=single, metrics="final",
                use_kernel="always", _interpret=True)
            db = residual_dbfs(np.asarray(out_g)[idx],
                               np.asarray(out_m)[:len(idx)])
            assert db <= -80.0, f"material {m} grouped run diverges: {db}"
            np.testing.assert_allclose(
                np.asarray(ms_g[-1]["score"])[idx],
                np.asarray(ms_m[-1]["score"])[:len(idx)], atol=1e-3)

        # wave materials in the mix fall back to per-material grouping and
        # still reproduce the static run at same-program exactness
        mats_w = np.array([0, 2] * (b // 2))
        out_w, ms_w, agg_w = run_corpus_chain(
            chain, clips, mesh=single, metrics="final", materials=mats_w,
            _interpret=True)
        assert 0.0 <= float(agg_w["score"]["mean"]) <= 100.0
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_corpus_chain_grouped_materials_fused(rng):
    """Grouped materials on the fused-executor fallback (use_kernel="never"):
    matches per-clip static-material chains; padding granule stays 1."""
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    stages = [("punch", "Solar Snap"), ("texture", None), ("infer", None)]
    chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
    mats = np.array([0, 4, 1, 0])
    clips = np.stack([make_clip(rng, 2, 128 * 2)
                      for _ in range(4)]).astype(np.float32)
    single = Mesh(np.array(jax.devices()[:1]), ("data",))
    out_g, ms_g, agg_g = run_corpus_chain(
        chain, clips, mesh=single, metrics="final", materials=mats,
        use_kernel="never")
    for i, m in enumerate(mats):
        ch_m = Chain([("punch", "Solar Snap"),
                      ("texture", {"material": float(m)}),
                      ("infer", None)], sr=48000.0, channels=2,
                     block_size=128)
        out_m, ms_m, _ = run_corpus_chain(
            ch_m, clips[i:i + 1], mesh=single, metrics="final",
            use_kernel="never")
        db = residual_dbfs(np.asarray(out_g)[i], np.asarray(out_m)[0])
        assert db <= -100.0, f"clip {i} (material {m}) diverges: {db}"
        np.testing.assert_allclose(np.asarray(ms_g[-1]["score"])[i],
                                   np.asarray(ms_m[-1]["score"])[0],
                                   atol=1e-4)


def test_sharded_tiles_layout_corpus_matches_bct(rng):
    """run_corpus_chain(layout="tiles") — corpus already in kernel-tile
    layout, sharded over the GRID axis of the 8-device mesh — must
    bit-match the clip-major path (same kernel; only the device-side
    corpus transposes are skipped)."""
    import juicy_tpu.kernels.stage_kernels as sk
    from juicy_tpu.kernels import chain_kernel as ck
    from juicy_tpu.parallel.corpus import run_corpus_chain
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", "Solar Snap"), ("saturator", None),
                  ("texture", None), ("motion", None), ("width", None),
                  ("cohere", None), ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        b, nb = 1024, 2          # 8 devices x one grid tile each
        clips = np.stack([make_clip(rng, 2, 128 * nb)
                          for _ in range(8)] * (b // 8)).astype(np.float32)
        mesh = make_mesh()
        out_b, ms_b, _ = run_corpus_chain(
            chain, clips, mesh=mesh, metrics="final", use_kernel="always",
            _interpret=True)
        tiles = np.asarray(ck.corpus_to_tiles(jnp.asarray(clips), 128))
        out_t, ms_t, agg = run_corpus_chain(
            chain, tiles, mesh=mesh, metrics="final", use_kernel="always",
            layout="tiles", _interpret=True)
        assert out_t.shape == tiles.shape
        np.testing.assert_array_equal(
            np.asarray(ck.tiles_to_corpus(out_t, 2)), np.asarray(out_b))
        np.testing.assert_array_equal(np.asarray(ms_t[-1]["score"]),
                                      np.asarray(ms_b[-1]["score"]))
        assert 0.0 <= float(agg["score"]["mean"]) <= 100.0
        # tiles layout is kernel-only: the fused executor cannot take it
        with pytest.raises(ck.ChainKernelUnsupported):
            run_corpus_chain(chain, tiles, mesh=mesh, use_kernel="never",
                             layout="tiles", _interpret=True)
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_corpus_grouped_planner_wave_rows(rng):
    """Grouped-corpus PLANNER contract (no device work — the executor is
    stubbed): a 5-material mix builds exactly TWO kernel sub-runs — the
    packed nonwave group and the MERGED wave group (wood tiles then
    plastic tiles, each segment padded to the clip tile) — and the
    run-aware scatter maps every real clip back to its corpus slot while
    padding rows never leak."""
    import juicy_tpu.kernels.stage_kernels as sk
    import juicy_tpu.parallel.corpus as pc
    from juicy_tpu.runtime.plugin import Chain

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    real_run = pc.run_corpus_chain
    try:
        stages = [("punch", None), ("saturator", None), ("texture", None),
                  ("motion", None), ("width", None), ("cohere", None),
                  ("infer", None)]
        chain = Chain(stages, sr=48000.0, channels=2, block_size=128)
        b = 500
        clips = np.arange(b * 2 * 128, dtype=np.float32).reshape(b, 2, 128)
        mats = (np.arange(b) % 5).astype(np.int64)
        calls = []

        def stub(gchain, sub, **kw):
            mat = np.asarray(gchain.params[2].get("material", -1.0))
            calls.append((mat.copy() if mat.ndim else float(mat),
                          tuple(sub.shape)))
            return jnp.asarray(sub), None, None   # identity executor

        pc.run_corpus_chain = stub
        single = Mesh(np.array(jax.devices()[:1]), ("data",))
        out, ms, agg = pc._run_corpus_chain_grouped(
            chain, jnp.asarray(clips), mats, mesh=single, metrics=None,
            use_kernel="auto", automation=None, return_audio=True,
            _interpret=True)
    finally:
        pc.run_corpus_chain = real_run
        sk.TILE, sk.MSUB = tile, msub

    # exactly two kernel sub-runs: packed nonwave + merged wave
    assert len(calls) == 2, [c[1] for c in calls]
    packed_mat, packed_shape = calls[0]
    wave_mat, wave_shape = calls[1]
    # nonwave group: 300 clips of {0,1,4} padded to the tile
    assert packed_shape[0] == 384 and set(np.unique(packed_mat)) <= {0, 1, 4}
    # merged wave group: wood segment (100 -> 128) then plastic
    # (100 -> 128), every 128-clip tile single-material
    assert wave_shape[0] == 256
    rows = np.asarray(wave_mat).reshape(-1, 128)
    assert (rows == rows[:, :1]).all()
    assert list(rows[:, 0]) == [2.0, 3.0]
    # identity executor + run-aware scatter == the original corpus rows
    np.testing.assert_array_equal(np.asarray(out), clips)
