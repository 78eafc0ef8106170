"""Multi-stream realtime serving: K live streams batched per device tick.

The reference serves one stream per plugin instance inside a DAW callback
(1× realtime each). One TPU chip sustains thousands of such streams when
their blocks are batched per dispatch (measured: 4 096 concurrent 48 kHz
stereo streams inside the 10.67 ms AU/VST3 deadline on one v5e —
`bench.py:bench_realtime_streams`, BENCH_DETAILS.json). This module is that
topology as an API: a fixed pool of stream slots, each carrying its own
full chain state; every `tick()` runs ONE batched fused-chain step over all
slots and returns each active stream's rendered block and metrics.

Slots are independent — opening/closing a stream resets just its state
row (a jitted scatter into the batched state pytree), so tenants come and
go without recompiling or disturbing neighbours.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from juicy_tpu.runtime.chain_fused import fused_chain_step
from juicy_tpu.runtime.plugin import Chain


class StreamServer:
    def __init__(self, chain: Chain, max_streams: int, metrics: str = "blocks"):
        self.chain = chain
        self.max_streams = int(max_streams)
        self.metrics = metrics
        self._free = list(range(self.max_streams))[::-1]
        self._active: Dict[int, bool] = {}
        self._pending: Dict[int, np.ndarray] = {}
        self._fresh = chain.init_state()             # single-slot template
        self._states = jax.vmap(lambda _: chain.init_state())(
            jnp.arange(self.max_streams))

        def _reset_slot(states, idx, fresh):
            return jax.tree.map(
                lambda batched, single: batched.at[idx].set(single),
                states, fresh)
        self._reset_slot = jax.jit(_reset_slot)

        def _tick(states, blocks):
            out, states, metrics_list = fused_chain_step(
                chain, states, blocks, metrics=self.metrics)
            return out, states, metrics_list
        self._tick = jax.jit(_tick)

    # -- stream lifecycle --------------------------------------------------

    def open_stream(self) -> int:
        """Claim a slot (fresh chain state). Raises when the pool is full."""
        if not self._free:
            raise RuntimeError(f"all {self.max_streams} stream slots in use")
        sid = self._free.pop()
        self._states = self._reset_slot(self._states, sid, self._fresh)
        self._active[sid] = True
        return sid

    def close_stream(self, sid: int) -> None:
        self._active.pop(sid, None)
        self._pending.pop(sid, None)
        self._free.append(sid)

    @property
    def active_streams(self) -> int:
        return len(self._active)

    # -- the serving loop --------------------------------------------------

    def submit(self, sid: int, block: np.ndarray) -> None:
        """Stage one [C, N] block for stream `sid` for the next tick."""
        if sid not in self._active:
            raise KeyError(f"stream {sid} is not open")
        c, n = block.shape
        assert (c, n) == (self.chain.channels, self.chain.block_size)
        self._pending[sid] = np.asarray(block, np.float32)

    def tick(self) -> Dict[int, Dict[str, np.ndarray]]:
        """One batched device step over every submitted block.

        Returns {stream id: {"audio": [C, N], "score": float, ...last-stage
        metrics...}}. Streams that submitted nothing process silence (their
        state still advances, like a DAW feeding an idle track)."""
        blocks = np.zeros((self.max_streams, self.chain.channels,
                           self.chain.block_size), np.float32)
        for sid, blk in self._pending.items():
            blocks[sid] = blk
        submitted = [sid for sid in self._active if sid in self._pending]
        self._pending.clear()

        out, self._states, metrics_list = self._tick(self._states,
                                                     jnp.asarray(blocks))
        out_np = np.asarray(out)
        results: Dict[int, Dict[str, np.ndarray]] = {}
        last = metrics_list[-1] if metrics_list is not None else None
        scores = np.asarray(last["score"]) if last is not None else None
        for sid in submitted:
            entry = {"audio": out_np[sid]}
            if scores is not None:
                entry["score"] = float(scores[sid])
                entry["pre_score"] = float(np.asarray(last["pre_score"])[sid])
            results[sid] = entry
        return results
