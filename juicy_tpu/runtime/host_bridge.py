"""Realtime host bridge: ring-buffered block streaming into the TPU runtime.

The reference's plugins live inside a host audio callback; its thread
boundary is a set of relaxed atomics (SURVEY.md §2.3). The framework analog
for live use is a pair of lock-free SPSC rings (native/juicyio.cpp): an audio
host (or any producer) pushes interleaved blocks into the input ring; the
bridge pops, runs the jitted step, pushes rendered audio to the output ring
and publishes the latest metrics snapshot — the atomics analog — for a UI
poller (ui/meters.py at ~20 Hz).

This is the offline-first framework's realtime story; a thin C++ JUCE shim
would only need juicy_ring_push/pop from its processBlock.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np

from juicy_tpu.runtime import native
from juicy_tpu.runtime.plugin import Plugin


class HostBridge:
    def __init__(self, plugin: Plugin, params=None,
                 ring_blocks: int = 64):
        if not native.available():
            raise RuntimeError("native juicyio library unavailable")
        self.plugin = plugin
        self.params = params if params is not None else plugin.default_params()
        self.state = plugin.init_state()
        n = plugin.block_size * plugin.channels
        self.in_ring = native.RingBuffer(n * ring_blocks)
        self.out_ring = native.RingBuffer(n * ring_blocks)
        self._latest_metrics: Dict[str, float] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- producer side (the "audio callback") --------------------------------

    def push_block(self, block: np.ndarray) -> bool:
        """Push one [C, N] block (interleaved into the ring). Non-blocking."""
        c, n = block.shape
        assert (c, n) == (self.plugin.channels, self.plugin.block_size)
        return self.in_ring.push(np.ascontiguousarray(block.T, np.float32))

    def pop_block(self) -> Optional[np.ndarray]:
        """Pop one rendered [C, N] block, or None if not ready."""
        n = self.plugin.block_size * self.plugin.channels
        flat = self.out_ring.pop(n)
        if flat is None:
            return None
        return flat.reshape(self.plugin.block_size, self.plugin.channels).T

    # -- consumer side (the TPU feeder) ---------------------------------------

    def process_available(self) -> int:
        """Drain the input ring: run the step for every complete block."""
        import jax.numpy as jnp
        n = self.plugin.block_size * self.plugin.channels
        processed = 0
        while self.in_ring.readable() >= n:
            flat = self.in_ring.pop(n)
            block = flat.reshape(self.plugin.block_size,
                                 self.plugin.channels).T
            out, self.state, metrics = self.plugin.jit_step(
                self.params, self.state, jnp.asarray(block))
            self.out_ring.push(np.ascontiguousarray(np.asarray(out).T))
            with self._lock:
                self._latest_metrics = {k: float(np.asarray(v))
                                        for k, v in metrics.items()}
            processed += 1
        return processed

    def latest_metrics(self) -> Dict[str, float]:
        """The 20 Hz-poll analog of getLatestMetrics (atomics snapshot)."""
        with self._lock:
            return dict(self._latest_metrics)

    # -- background pump -------------------------------------------------------

    def start(self, poll_s: float = 0.001):
        def pump():
            while not self._stop.is_set():
                if not self.process_available():
                    self._stop.wait(poll_s)

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5.0)
        self.in_ring.close()
        self.out_ring.close()
