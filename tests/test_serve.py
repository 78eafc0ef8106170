"""StreamServer: K-slot batched realtime serving (runtime/serve.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from juicy_tpu.runtime.plugin import Chain
from juicy_tpu.runtime.serve import StreamServer
from tests.conftest import make_clip, residual_dbfs

SR = 48000.0
BLOCK = 512
STAGES = [("punch", "Solar Snap"), ("saturator", "Amber Heat"),
          ("infer", None)]


def test_stream_server_matches_solo_run(rng):
    """Two concurrent streams through the batched server produce the same
    audio as two independent Chain.run calls."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=4)
    clip_a = make_clip(rng, 2, BLOCK * 3)
    clip_b = make_clip(rng, 2, BLOCK * 3) * 0.5

    a = server.open_stream()
    b = server.open_stream()
    assert server.active_streams == 2
    got_a, got_b = [], []
    for k in range(3):
        server.submit(a, clip_a[:, k * BLOCK:(k + 1) * BLOCK])
        server.submit(b, clip_b[:, k * BLOCK:(k + 1) * BLOCK])
        res = server.tick()
        got_a.append(res[a]["audio"])
        got_b.append(res[b]["audio"])
        assert 0.0 <= res[a]["score"] <= 100.0

    for clip, got in ((clip_a, got_a), (clip_b, got_b)):
        want, _, _ = chain.run(chain.init_state(), jnp.asarray(clip))
        res_db = residual_dbfs(np.concatenate(got, -1), np.asarray(want))
        assert res_db <= -95.0, f"served stream diverges: {res_db:.1f} dBFS"


def test_stream_server_warmup(rng):
    """warmup() pre-compiles every tick path without advancing slot state:
    a warmed server's first tick matches an unwarmed one's exactly, on
    both the shared and the per-stream-rows paths."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    warmed = StreamServer(chain, max_streams=2)
    cold = StreamServer(chain, max_streams=2)
    warmed.warmup()
    clip = make_clip(rng, 2, BLOCK)

    a_w, a_c = warmed.open_stream(), cold.open_stream()
    warmed.submit(a_w, clip)
    cold.submit(a_c, clip)
    np.testing.assert_array_equal(warmed.tick()[a_w]["audio"],
                                  cold.tick()[a_c]["audio"])

    # a knob edit flips both pools to the rows path — already compiled on
    # the warmed one; results still identical
    warmed.set_params(a_w, "punch", punch=0.9)
    cold.set_params(a_c, "punch", punch=0.9)
    warmed.submit(a_w, clip)
    cold.submit(a_c, clip)
    np.testing.assert_array_equal(warmed.tick()[a_w]["audio"],
                                  cold.tick()[a_c]["audio"])


def test_stream_server_slot_recycling(rng):
    """Closing a stream frees its slot; reopening resets state (a new tenant
    does not inherit the previous stream's envelopes)."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=1)
    clip = make_clip(rng, 2, BLOCK)

    a = server.open_stream()
    with pytest.raises(RuntimeError):
        server.open_stream()
    server.submit(a, clip)
    first = server.tick()[a]["audio"].copy()
    server.close_stream(a)

    b = server.open_stream()          # recycled slot, fresh state
    server.submit(b, clip)
    again = server.tick()[b]["audio"]
    np.testing.assert_allclose(again, first, atol=2e-6)


def test_stream_server_double_close_rejected(rng):
    """Double close (or closing a never-opened sid) raises instead of
    corrupting the free list with a duplicate slot."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=2)
    a = server.open_stream()
    server.close_stream(a)
    with pytest.raises(KeyError):
        server.close_stream(a)
    with pytest.raises(KeyError):
        server.close_stream(99)
    # the pool still hands out exactly max_streams distinct slots
    s1, s2 = server.open_stream(), server.open_stream()
    assert s1 != s2
    with pytest.raises(RuntimeError):
        server.open_stream()


def test_stream_server_bulk_api_matches_scalar(rng):
    """submit_many + tick_arrays produce the same audio/scores as the
    per-stream submit/tick dict API."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    clip_a = make_clip(rng, 2, BLOCK)
    clip_b = make_clip(rng, 2, BLOCK) * 0.5

    ref = StreamServer(chain, max_streams=4)
    ra, rb = ref.open_stream(), ref.open_stream()
    ref.submit(ra, clip_a)
    ref.submit(rb, clip_b)
    want = ref.tick()

    srv = StreamServer(chain, max_streams=4)
    a, b = srv.open_stream(), srv.open_stream()
    srv.submit_many([a, b], np.stack([clip_a, clip_b]))
    sids, audio, scores, pre = srv.tick_arrays()
    np.testing.assert_array_equal(sids, sorted([a, b]))
    by_sid = {int(s): k for k, s in enumerate(sids)}
    for sid, w in ((a, want[ra]), (b, want[rb])):
        np.testing.assert_allclose(audio[by_sid[sid]], w["audio"], atol=1e-7)
        assert scores[by_sid[sid]] == pytest.approx(w["score"], abs=1e-5)
        assert pre[by_sid[sid]] == pytest.approx(w["pre_score"], abs=1e-5)


def test_stream_server_idle_stream_advances(rng):
    """A stream that submits nothing processes silence but keeps its state
    moving (like an idle DAW track), and is not in the results."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=2)
    a = server.open_stream()
    b = server.open_stream()
    server.submit(a, make_clip(rng, 2, BLOCK))
    res = server.tick()
    assert a in res and b not in res


def test_stream_server_rejects_bad_block_shape(rng):
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=1)
    a = server.open_stream()
    with pytest.raises(ValueError):
        server.submit(a, np.zeros((2, BLOCK // 2), np.float32))
    with pytest.raises(KeyError):
        server.submit(99, np.zeros((2, BLOCK), np.float32))


def test_stream_server_per_stream_presets(rng):
    """Two streams with DIFFERENT per-slot presets each match a solo
    Chain.run configured with that preset — the per-DAW-track knob analog
    (each reference instance reads its own APVTS,
    JuicyPunch/PluginProcessor.cpp:74-80)."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=4)
    clip = make_clip(rng, 2, BLOCK * 3)

    a = server.open_stream()
    b = server.open_stream()
    server.set_preset(b, "punch", "Crater Impact")
    server.set_params(b, "saturator", drive=13.5)
    got_a, got_b = [], []
    for k in range(3):
        server.submit(a, clip[:, k * BLOCK:(k + 1) * BLOCK])
        server.submit(b, clip[:, k * BLOCK:(k + 1) * BLOCK])
        res = server.tick()
        got_a.append(res[a]["audio"])
        got_b.append(res[b]["audio"])

    want_a, _, _ = chain.run(chain.init_state(), jnp.asarray(clip))
    chain_b = Chain([("punch", "Crater Impact"),
                     ("saturator", "Amber Heat"), ("infer", None)],
                    sr=SR, channels=2, block_size=BLOCK)
    chain_b.params[1]["drive"] = np.float32(13.5)
    want_b, _, _ = chain_b.run(chain_b.init_state(), jnp.asarray(clip))
    res_a = residual_dbfs(np.concatenate(got_a, -1), np.asarray(want_a))
    res_b = residual_dbfs(np.concatenate(got_b, -1), np.asarray(want_b))
    assert res_a <= -95.0, f"default-params stream diverges: {res_a:.1f}"
    assert res_b <= -95.0, f"per-slot-preset stream diverges: {res_b:.1f}"
    # the two streams really did render differently
    assert residual_dbfs(np.concatenate(got_a, -1),
                         np.concatenate(got_b, -1)) > -40.0
    # slot recycling restores defaults
    server.close_stream(b)
    c = server.open_stream()
    assert c == b
    assert server.get_params(c, "punch")["punch"] == \
        pytest.approx(float(chain.params[0]["punch"]))


def test_stream_server_fast_path_recovers_after_custom_tenant(rng):
    """The shared-params fast path (and with it the kernel tick) comes back
    once every custom-params tenant closes its stream — an edited pool is
    not degraded to the vmapped-rows tick forever."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=2)
    clip = make_clip(rng, 2, BLOCK)

    a = server.open_stream()
    b = server.open_stream()
    server.submit(a, clip)
    res = server.tick()
    before = res[a]["audio"].copy()
    assert not server._custom_slots

    server.set_params(b, "saturator", drive=13.5)
    assert set(server._custom_slots) == {b}
    server.submit(a, clip)
    server.submit(b, clip)
    server.tick()                      # rows path while b is custom

    server.close_stream(b)             # last custom tenant leaves
    assert not server._custom_slots
    # reopened slot sees default params again
    c = server.open_stream()
    assert server.get_params(c, "saturator")["drive"] == pytest.approx(
        float(chain.params[1]["drive"]))
    # fresh default stream on the recovered fast path matches the original
    server.close_stream(a)
    d = server.open_stream()
    server.submit(d, clip)
    after = server.tick()[d]["audio"]
    np.testing.assert_allclose(after, before, atol=2e-6)


def test_stream_server_all_stage_metrics(rng):
    """stage_metrics='all' returns every stage's metric dict per stream."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=2, stage_metrics="all")
    a = server.open_stream()
    server.submit(a, make_clip(rng, 2, BLOCK))
    res = server.tick()
    stages = res[a]["stages"]
    assert len(stages) == len(STAGES)
    for row in stages:
        assert 0.0 <= row["score"] <= 100.0
    assert res[a]["score"] == pytest.approx(stages[-1]["score"])


def test_stream_server_per_stream_materials(rng):
    """Tenants pick their own texture material: a traced-material texture
    stage makes `material` a regular per-slot parameter row."""
    import jax
    chain = Chain([("punch", None), ("texture", None), ("infer", None)],
                  sr=SR, channels=2, block_size=BLOCK)
    chain.plugins[1] = chain.plugins[1].with_traced("material")
    chain.params[1]["material"] = jnp.float32(0.0)
    server = StreamServer(chain, max_streams=2)
    clip = make_clip(rng, 2, BLOCK * 2)

    a = server.open_stream()        # gel (default)
    b = server.open_stream()
    server.set_params(b, "texture", material=1.0)   # metal
    got_a, got_b = [], []
    for k in range(2):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        server.submit(a, blk)
        server.submit(b, blk)
        res = server.tick()
        got_a.append(res[a]["audio"])
        got_b.append(res[b]["audio"])

    for mat, got in ((0.0, got_a), (1.0, got_b)):
        ch = Chain([("punch", None), ("texture", dict(material=mat)),
                    ("infer", None)], sr=SR, channels=2, block_size=BLOCK)
        want, _, _ = ch.run(ch.init_state(), jnp.asarray(clip))
        db = residual_dbfs(np.concatenate(got, -1), np.asarray(want))
        assert db <= -90.0, f"material {mat} stream diverges: {db:.1f} dBFS"
    assert residual_dbfs(np.concatenate(got_a, -1),
                         np.concatenate(got_b, -1)) > -40.0


def test_stream_server_mesh_sharded(rng):
    """A StreamServer sharded over the 8-device mesh bit-matches the
    single-device server: slots are the SPMD axis, so serving capacity
    scales linearly with chips (runtime/serve.py `mesh=`)."""
    from juicy_tpu.parallel.mesh import make_mesh

    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    mesh = make_mesh()
    sharded = StreamServer(chain, max_streams=8, mesh=mesh)
    solo = StreamServer(chain, max_streams=8)
    clip = make_clip(rng, 2, BLOCK * 2)

    sids = [(sharded.open_stream(), solo.open_stream()) for _ in range(3)]
    # a per-slot edit on one stream exercises the sharded params rows too
    sharded.set_params(sids[1][0], "saturator", drive=13.5)
    solo.set_params(sids[1][1], "saturator", drive=13.5)
    for k in range(2):
        blk = clip[:, k * BLOCK:(k + 1) * BLOCK]
        for ss, so in sids:
            sharded.submit(ss, blk * (1.0 + 0.1 * ss))
            solo.submit(so, blk * (1.0 + 0.1 * so))
        res_s, res_o = sharded.tick(), solo.tick()
        for ss, so in sids:
            np.testing.assert_allclose(res_s[ss]["audio"],
                                       res_o[so]["audio"], atol=2e-6)
            assert res_s[ss]["score"] == pytest.approx(
                res_o[so]["score"], abs=1e-3)

    with pytest.raises(ValueError):
        StreamServer(chain, max_streams=9, mesh=mesh)


def test_stream_server_kernel_tick_matches_fused(rng):
    """The kernel tick (tile-layout batch assembly + chain_kernel_step
    layout="tiles") must serve the same audio/scores as the XLA fused
    tick, and as a solo Chain.run — interpret mode stands in for the
    TPU-only eligibility."""
    import juicy_tpu.kernels.stage_kernels as sk

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", "Solar Snap"), ("saturator", None),
                  ("texture", None), ("motion", None), ("width", None),
                  ("cohere", None), ("infer", None)]
        chain = Chain(stages, sr=SR, channels=2, block_size=128)
        kserver = StreamServer(chain, max_streams=128, _interpret=True)
        assert kserver._kernel_tick
        fserver = StreamServer(chain, max_streams=128)
        assert not fserver._kernel_tick
        clip_a = make_clip(rng, 2, 128 * 3)
        clip_b = make_clip(rng, 2, 128 * 3) * 0.5

        outs, scores = [], []
        for server in (kserver, fserver):
            a = server.open_stream()
            b = server.open_stream()
            got_a, got_b, sc = [], [], []
            for k in range(3):
                server.submit(a, clip_a[:, k * 128:(k + 1) * 128])
                server.submit(b, clip_b[:, k * 128:(k + 1) * 128])
                res = server.tick()
                got_a.append(res[a]["audio"])
                got_b.append(res[b]["audio"])
                sc.append((res[a]["score"], res[b]["score"]))
            outs.append((np.concatenate(got_a, -1),
                         np.concatenate(got_b, -1)))
            scores.append(np.asarray(sc))
        for ka, fa in zip(outs[0], outs[1]):
            db = residual_dbfs(ka, fa)
            assert db <= -90.0, f"kernel tick diverges from fused: {db:.1f}"
        np.testing.assert_allclose(scores[0], scores[1], atol=2e-3)
    finally:
        sk.TILE, sk.MSUB = tile, msub


def test_stream_server_i16_wire_matches_f32(rng):
    """wire="i16" moves PCM16 over the link but processes float32 on
    device: serving the PRE-QUANTIZED clip through an f32-wire server must
    match the i16-wire output to within one output-quantization step
    (1/32768). Float submits are quantized on the host; int16 submits pass
    through as-is."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    f32 = StreamServer(chain, max_streams=2)
    i16 = StreamServer(chain, max_streams=2, wire="i16")
    clip = make_clip(rng, 2, BLOCK * 2)
    pcm = np.clip(np.round(clip * 32768.0), -32768, 32767).astype(np.int16)

    a_f, a_i = f32.open_stream(), i16.open_stream()
    for k in range(2):
        sl = np.s_[:, k * BLOCK:(k + 1) * BLOCK]
        f32.submit(a_f, pcm[sl].astype(np.float32) / 32768.0)
        # alternate float and raw-int16 submits on the i16 wire
        i16.submit(a_i, clip[sl] if k == 0 else pcm[sl])
        want = f32.tick()[a_f]["audio"]
        got = i16.tick()[a_i]["audio"]
        assert got.dtype == np.int16
        np.testing.assert_allclose(got.astype(np.float32) / 32768.0, want,
                                   atol=1.01 / 32768.0)

    with pytest.raises(ValueError):
        StreamServer(chain, max_streams=2, wire="i24")


def test_stream_server_async_ticks_match_sync(rng):
    """tick_arrays_async() pipelined two-deep (dispatch k+1 before fetching
    k) returns exactly what blocking tick_arrays() returns, in order."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    sync = StreamServer(chain, max_streams=2)
    pipe = StreamServer(chain, max_streams=2)
    clip = make_clip(rng, 2, BLOCK * 4)

    a_s, a_p = sync.open_stream(), pipe.open_stream()
    want = []
    for k in range(4):
        sync.submit(a_s, clip[:, k * BLOCK:(k + 1) * BLOCK])
        want.append(sync.tick_arrays())

    handles, got = [], []
    for k in range(4):
        pipe.submit(a_p, clip[:, k * BLOCK:(k + 1) * BLOCK])
        handles.append(pipe.tick_arrays_async())
        if len(handles) > 2:                   # fetch k-2 after dispatching k
            got.append(handles.pop(0).result())
    assert pipe._inflight == handles
    got.extend(h.result() for h in handles)
    assert not pipe._inflight

    for (ws, wa, wsc, wp), (gs, ga, gsc, gp) in zip(want, got):
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_allclose(ga, wa, atol=1e-7)
        np.testing.assert_allclose(gsc, wsc, atol=1e-5)
        np.testing.assert_allclose(gp, wp, atol=1e-5)


def test_stream_server_async_inflight_capped(rng):
    """Fire-and-forget tick_arrays_async() must not pin device arrays
    without bound: past MAX_INFLIGHT the oldest handle is resolved at
    dispatch time, and its later .result() still returns the right tick."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    srv = StreamServer(chain, max_streams=2)
    sid = srv.open_stream()
    clip = make_clip(rng, 2, BLOCK)
    handles = []
    for _ in range(srv.MAX_INFLIGHT + 3):       # never call .result()
        srv.submit(sid, clip)
        handles.append(srv.tick_arrays_async())
    assert len(srv._inflight) <= srv.MAX_INFLIGHT
    # force-resolved handles still serve their cached result
    first = handles[0].result()
    assert first[0].tolist() == [sid]
    for h in handles:
        h.result()
    assert not srv._inflight


def test_stream_server_metering_rail(rng):
    """audio_out=False: ticks return the same scores as a full server but
    no audio (the render never leaves the jit) — the monitoring-pool
    analog of JuicyInfer's pure-analysis shape."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    full = StreamServer(chain, max_streams=2)
    meter = StreamServer(chain, max_streams=2, audio_out=False,
                         wire="i16")   # input-only wire decode
    clip = make_clip(rng, 2, BLOCK * 2)
    pcm = np.clip(np.round(clip * 32768.0), -32768, 32767).astype(np.int16)

    a_f, a_m = full.open_stream(), meter.open_stream()
    for k in range(2):
        sl = np.s_[:, k * BLOCK:(k + 1) * BLOCK]
        full.submit(a_f, pcm[sl].astype(np.float32) / 32768.0)
        meter.submit(a_m, pcm[sl])
        want = full.tick()[a_f]
        got = meter.tick()[a_m]
        assert "audio" not in got
        assert got["score"] == pytest.approx(want["score"], abs=1e-3)
        assert got["pre_score"] == pytest.approx(want["pre_score"],
                                                 abs=1e-3)
    # bulk/async forms return None audio
    meter.submit(a_m, pcm[:, :BLOCK])
    sids, audio, scores, pre = meter.tick_arrays()
    assert audio is None and scores is not None

    with pytest.raises(ValueError):
        StreamServer(chain, max_streams=2, audio_out=False, metrics="none")


def test_stream_server_staging_semantics(rng):
    """Direct-assembly staging: resubmitting before a tick overwrites (last
    write wins), a slot that stops submitting goes back to silence the next
    tick, and closing a staged-but-unticked stream leaves the pool clean."""
    chain = Chain(STAGES, sr=SR, channels=2, block_size=BLOCK)
    server = StreamServer(chain, max_streams=2)
    clip = make_clip(rng, 2, BLOCK)

    a = server.open_stream()
    server.submit(a, clip * 3.0)              # overwritten before the tick
    server.submit(a, clip)
    first = server.tick()[a]["audio"].copy()

    ref = StreamServer(chain, max_streams=2)
    b = ref.open_stream()
    ref.submit(b, clip)
    np.testing.assert_array_equal(first, ref.tick()[b]["audio"])

    # a now goes idle: its next tick processes silence, not the stale block
    res = server.tick()
    assert a not in res
    ref.tick()                                # advance ref's idle state too
    server.submit(a, clip)
    ref.submit(b, clip)
    np.testing.assert_array_equal(server.tick()[a]["audio"],
                                  ref.tick()[b]["audio"])

    # closing a stream with a staged (never ticked) block zeroes its row
    c = server.open_stream()
    server.submit(c, clip * 5.0)
    server.close_stream(c)
    assert not np.any(server._assembly[c])


@pytest.mark.slow
def test_stream_server_per_stream_params_stay_on_kernel_tick(rng):
    """VERDICT r3 item 3: per-slot knob edits ride the chain kernel's
    per-clip pvec row tiles — the pool must NOT cliff to the fused
    executor when a tenant touches an eligible knob. Structural edits
    (width haasMs) still fall back, and closing the editing tenants
    recovers the shared kernel tick (rows -> kernel round trip,
    ADVICE r3 item 1)."""
    import juicy_tpu.kernels.stage_kernels as sk

    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    try:
        stages = [("punch", None), ("saturator", None), ("texture", None),
                  ("motion", None), ("width", None), ("cohere", None),
                  ("infer", None)]
        chain = Chain(stages, sr=SR, channels=2, block_size=128)
        kserver = StreamServer(chain, max_streams=128, _interpret=True)
        assert kserver._kernel_tick
        fserver = StreamServer(chain, max_streams=128)
        clip_a = make_clip(rng, 2, 128 * 2)
        clip_b = make_clip(rng, 2, 128 * 2) * 0.6

        calls = {"kernel_rows": 0, "fused_rows": 0, "shared": 0}
        for name, key in (("_tick_rows_kernel", "kernel_rows"),
                          ("_tick_rows", "fused_rows"),
                          ("_tick_shared", "shared")):
            orig = getattr(kserver, name)

            def spy(*a, _orig=orig, _key=key, **kw):
                calls[_key] += 1
                return _orig(*a, **kw)
            setattr(kserver, name, spy)

        outs, scores = [], []
        for server in (kserver, fserver):
            a = server.open_stream()
            b = server.open_stream()
            server.set_params(a, "punch", punch=0.85, clip=0.4)
            server.set_params(b, "infer", trim=-4.0)
            got_a, got_b, sc = [], [], []
            for k in range(2):
                server.submit(a, clip_a[:, k * 128:(k + 1) * 128])
                server.submit(b, clip_b[:, k * 128:(k + 1) * 128])
                res = server.tick()
                got_a.append(res[a]["audio"])
                got_b.append(res[b]["audio"])
                sc.append((res[a]["score"], res[b]["score"]))
            outs.append((np.concatenate(got_a, -1),
                         np.concatenate(got_b, -1)))
            scores.append(np.asarray(sc))
            if server is kserver:
                # eligible edits stayed on the kernel rows tick
                assert calls == {"kernel_rows": 2, "fused_rows": 0,
                                 "shared": 0}
                # a structural edit (haasMs = scalar window row offset)
                # falls back to the vmapped fused executor
                server.set_params(a, "width", haasMs=9.0)
                server.submit(a, clip_a[:, :128])
                server.tick()
                assert calls["fused_rows"] == 1
                # closing the tenants recovers the shared kernel tick
                server.close_stream(a)
                server.close_stream(b)
                sid = server.open_stream()
                server.submit(sid, clip_a[:, :128])
                server.tick()
                assert calls == {"kernel_rows": 2, "fused_rows": 1,
                                 "shared": 1}
                server.close_stream(sid)

        for ka, fa in zip(outs[0], outs[1]):
            db = residual_dbfs(ka, fa)
            assert db <= -90.0, f"kernel rows diverge from fused: {db:.1f}"
        np.testing.assert_allclose(scores[0], scores[1], atol=2e-3)
        # the edits actually differentiated the streams from defaults
        assert np.abs(outs[0][0] - outs[0][1]).max() > 1e-4
    finally:
        sk.TILE, sk.MSUB = tile, msub
