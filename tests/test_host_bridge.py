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
