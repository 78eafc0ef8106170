"""Realtime host-bridge test: ring-fed streaming == offline streaming."""

import numpy as np
import jax.numpy as jnp
import pytest

from juicy_tpu.runtime import native
from juicy_tpu.runtime.host_bridge import HostBridge
from juicy_tpu.runtime.plugin import Plugin
from tests.conftest import make_clip

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

SR = 48000.0
BLOCK = 512


def test_bridge_matches_offline(rng):
    clip = make_clip(rng, 2, BLOCK * 4)
    plug = Plugin("saturator", SR, 2, BLOCK)
    bridge = HostBridge(plug)

    rendered = []
    for k in range(4):
        assert bridge.push_block(clip[:, k * BLOCK:(k + 1) * BLOCK])
        bridge.process_available()
        out = bridge.pop_block()
        assert out is not None
        rendered.append(out)
    bridge.stop()
    got = np.concatenate(rendered, axis=1)

    offline_plug = Plugin("saturator", SR, 2, BLOCK)
    state = offline_plug.init_state()
    want, _, _ = offline_plug.run(offline_plug.default_params(), state,
                                  jnp.asarray(clip))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-7)


def test_bridge_metrics_snapshot(rng):
    plug = Plugin("infer", SR, 2, BLOCK)
    bridge = HostBridge(plug)
    bridge.push_block(make_clip(rng, 2, BLOCK))
    bridge.process_available()
    m = bridge.latest_metrics()
    assert 0.0 <= m["score"] <= 100.0
    assert "emphasis" in m
    bridge.stop()


def test_bridge_background_pump(rng):
    import time
    plug = Plugin("saturator", SR, 2, BLOCK)
    bridge = HostBridge(plug)
    bridge.start(poll_s=0.001)
    for k in range(3):
        bridge.push_block(make_clip(rng, 2, BLOCK))
    deadline = time.time() + 30.0
    got = 0
    while got < 3 and time.time() < deadline:
        if bridge.pop_block() is not None:
            got += 1
        else:
            time.sleep(0.005)
    bridge.stop()
    assert got == 3


def test_host_bridge_sustained_load(rng):
    """Throughput/latency under load: stream many blocks through the SPSC
    rings with the background pump running, measure end-to-end block
    latency and verify nothing is dropped or reordered (round-1 review
    item: the bridge's realtime story was asserted, never measured)."""
    import time
    from juicy_tpu.runtime import native
    from juicy_tpu.runtime.host_bridge import HostBridge
    from juicy_tpu.runtime.plugin import Plugin
    if not native.available():
        pytest.skip("native juicyio unavailable")

    plug = Plugin("saturator", 48000.0, 2, 512)
    bridge = HostBridge(plug, ring_blocks=64)
    nblocks = 200
    clip = make_clip(rng, 2, 512 * nblocks).astype(np.float32)
    blocks = [clip[:, k * 512:(k + 1) * 512] for k in range(nblocks)]

    # warm the jit before timing
    bridge.push_block(blocks[0])
    t0 = time.perf_counter()
    while bridge.pop_block() is None:
        bridge.process_available()
        if time.perf_counter() - t0 > 120:
            raise TimeoutError("first block never came back")

    bridge.start(poll_s=0.0005)
    got = []
    lat = []
    t_start = time.perf_counter()
    pushed = 0
    dropped = 0
    push_t = {}
    while len(got) < nblocks - 1 or pushed < nblocks - 1:
        if pushed < nblocks - 1:
            if bridge.push_block(blocks[pushed + 1]):
                push_t[pushed] = time.perf_counter()
                pushed += 1
            else:
                dropped += 1  # ring full: backpressure, retry
        out = bridge.pop_block()
        if out is not None:
            lat.append(time.perf_counter() - push_t.get(len(got), t_start))
            got.append(out)
        if time.perf_counter() - t_start > 300:
            break
    bridge.stop()

    assert len(got) == nblocks - 1, f"lost blocks: {len(got)}/{nblocks - 1}"
    wall = time.perf_counter() - t_start
    audio_sec = len(got) * 512 / 48000.0
    x_rt = audio_sec / wall
    lat.sort()
    p95_ms = 1e3 * lat[int(len(lat) * 0.95)]
    # sanity floor only (CI machines vary; the bench reports real numbers):
    # the bridge must sustain at least realtime for a single stream and the
    # output must be the correct audio in order.
    assert x_rt > 1.0, f"bridge slower than realtime: {x_rt:.2f}x"
    state = plug.init_state()
    import jax.numpy as jnp
    want, _, _ = plug.run(plug.default_params(), state,
                          jnp.asarray(clip[:, :512 * 8]))
    gotcat = np.concatenate([blocks[0]] * 0 + got[:7], axis=-1)
    np.testing.assert_allclose(gotcat, np.asarray(want)[:, 512:512 * 8],
                               atol=2e-6)
    print(f"bridge sustained {x_rt:.1f}x realtime, p95 latency {p95_ms:.2f} ms,"
          f" ring-full backpressure events: {dropped}")


def test_native_host_shim_roundtrip(rng, tmp_path):
    """End-to-end ring-protocol capstone: the NATIVE C++ host shim
    (juicy_host_stream) streams a WAV through the SPSC rings from its own
    thread while HostBridge pumps the TPU side — C++ → rings → TPU step →
    rings → C++ → WAV — and the result nulls against a direct Plugin.run.
    This proves the advertised 'a thin JUCE shim would only need
    juicy_ring_push/pop from its processBlock' claim with real native code
    on the callback side (the Standalone-format analog,
    reference CMakeLists.txt:34)."""
    import os
    import threading
    from juicy_tpu.runtime.wav import read_wav, write_wav

    if not native.available():
        pytest.skip("native toolchain unavailable")
    sr, block, nb = 48000, 512, 6
    clip = make_clip(rng, 2, block * nb)
    src = os.path.join(tmp_path, "in.wav")
    dst = os.path.join(tmp_path, "out.wav")
    write_wav(src, clip, sr)

    plug = Plugin("saturator", float(sr), 2, block)
    bridge = HostBridge(plug, ring_blocks=4)   # small rings: backpressure
    bridge.start()
    result = {}

    def run_host():
        result["stats"] = native.host_stream(
            bridge.in_ring, bridge.out_ring, src, dst, 2, block, sr,
            realtime=False, timeout_s=120.0)

    t = threading.Thread(target=run_host)
    t.start()
    t.join(timeout=180.0)
    bridge.stop()
    assert not t.is_alive(), "native host shim did not finish"
    stats = result["stats"]
    assert stats["blocks_pushed"] == nb and stats["blocks_popped"] == nb

    got, got_sr = read_wav(dst)
    assert got_sr == sr and got.shape == clip.shape
    want, _, _ = plug.run(plug.default_params(), plug.init_state(),
                          jnp.asarray(clip))
    res = float(np.max(np.abs(got - np.asarray(want))))
    db = 20.0 * np.log10(max(res, 1e-12))
    assert db <= -100.0, f"native host shim round trip residual {db:.1f} dBFS"


def test_native_host_shim_realtime_pacing(rng, tmp_path):
    """realtime=1 paces pushes at the host-callback cadence (1x audio)."""
    import os
    import threading
    from juicy_tpu.runtime.wav import write_wav

    if not native.available():
        pytest.skip("native toolchain unavailable")
    sr, block, nb = 48000, 512, 10
    clip = make_clip(rng, 2, block * nb)
    src = os.path.join(tmp_path, "in.wav")
    dst = os.path.join(tmp_path, "out.wav")
    write_wav(src, clip, sr)
    plug = Plugin("infer", float(sr), 2, block)
    bridge = HostBridge(plug, ring_blocks=16)
    bridge.start()
    result = {}

    def run_host():
        result["stats"] = native.host_stream(
            bridge.in_ring, bridge.out_ring, src, dst, 2, block, sr,
            realtime=True, timeout_s=120.0)

    t = threading.Thread(target=run_host)
    t.start()
    t.join(timeout=180.0)
    bridge.stop()
    assert not t.is_alive()
    stats = result["stats"]
    audio_s = nb * block / sr
    # paced at 1x: elapsed covers at least the audio duration minus one block
    assert stats["elapsed_s"] >= audio_s - block / sr
    assert stats["blocks_popped"] == nb


def test_pipelined_stream_matches_sync(rng):
    """PipelinedStream returns the same audio as synchronous stepping,
    delayed by `depth` blocks (the reported latency)."""
    from juicy_tpu.runtime.host_bridge import PipelinedStream
    from juicy_tpu.runtime.plugin import Chain

    block, nb, depth = 512, 6, 2
    chain = Chain([("punch", "Solar Snap"), ("saturator", None)],
                  sr=48000.0, channels=2, block_size=block)
    clip = make_clip(rng, 2, block * nb)
    want, _, _ = chain.run(chain.init_state(), jnp.asarray(clip))

    ps = PipelinedStream(chain, depth=depth)
    assert ps.latency_samples == depth * block
    got = []
    for k in range(nb):
        res = ps.tick(clip[:, k * block:(k + 1) * block])
        if k < depth:
            assert res is None      # pipeline filling
        else:
            audio, metrics = res
            got.append(audio)
            assert 0.0 <= metrics["score"] <= 100.0
    got.extend(a for a, _ in ps.flush())
    np.testing.assert_allclose(np.concatenate(got, axis=-1),
                               np.asarray(want), atol=1e-6)


def test_pipelined_stream_plugin_and_depth0(rng):
    from juicy_tpu.runtime.host_bridge import PipelinedStream
    from juicy_tpu.runtime.plugin import Plugin

    block = 512
    plug = Plugin("saturator", 48000.0, 2, block)
    clip = make_clip(rng, 2, block)
    ps = PipelinedStream(plug, depth=0)        # synchronous mode
    audio, metrics = ps.tick(clip)
    want, _, _ = plug.run(plug.default_params(), plug.init_state(),
                          jnp.asarray(clip))
    np.testing.assert_allclose(audio, np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_pipelined_stream_kernel_path(rng):
    """The kernel-path tick (one chain-kernel tile, one live lane) renders
    the same audio as the fused-executor tick for the canonical chain —
    the configuration that makes the single-stream realtime deadline
    (BENCH_DETAILS.json pipelined_latency, BASELINE.md)."""
    from juicy_tpu.runtime.host_bridge import PipelinedStream
    from juicy_tpu.runtime.plugin import Chain

    block, nb = 128, 3
    stages = [("punch", None), ("saturator", None), ("texture", None),
              ("motion", None), ("width", None), ("cohere", None),
              ("infer", None)]
    chain = Chain(stages, sr=48000.0, channels=2, block_size=block)
    clip = make_clip(rng, 2, block * nb)
    want, _, wms = chain.run(chain.init_state(), jnp.asarray(clip))

    ps = PipelinedStream(chain, depth=0, use_kernel=True, _interpret=True)
    assert ps.kernel_path
    got, scores = [], []
    for k in range(nb):
        audio, metrics = ps.tick(clip[:, k * block:(k + 1) * block])
        got.append(audio)
        scores.append(metrics["score"])
        assert 0.0 <= metrics["score"] <= 100.0
    np.testing.assert_allclose(np.concatenate(got, axis=-1),
                               np.asarray(want), atol=2e-5)
    # final-stage score matches the fused executor's last-stage metrics
    want_scores = np.asarray(wms[-1]["score"]).reshape(-1)
    np.testing.assert_allclose(scores[-1], float(want_scores[-1]), atol=1e-3)


def test_pipelined_stream_kernel_flag_rejects_unsupported(rng):
    from juicy_tpu.runtime.host_bridge import PipelinedStream
    from juicy_tpu.runtime.plugin import Chain

    chain = Chain([("punch", None), ("saturator", None)],
                  sr=48000.0, channels=2, block_size=512)
    with pytest.raises(ValueError):
        PipelinedStream(chain, use_kernel=True, _interpret=True)
    ps = PipelinedStream(chain, depth=0, use_kernel="auto")  # falls back
    assert not ps.kernel_path
