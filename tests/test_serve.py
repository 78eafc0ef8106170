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
