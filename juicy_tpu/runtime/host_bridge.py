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


class PipelinedStream:
    """Single-stream live client with PIPELINED dispatch.

    The synchronous single-block round trip (dispatch → device compute →
    device→host transfer) is dominated by transfer latency in
    tunnel-fronted environments (BENCH_DETAILS.json realtime_latency).
    This client overlaps them: ``tick(block_k)`` dispatches block k's step
    asynchronously, starts its device→host copy immediately
    (``copy_to_host_async``), and returns block ``k − depth``'s finished
    audio — whose transfer has had `depth` block periods to complete. The
    effective per-tick cost approaches the device step time; the price is
    ``depth · block_size`` samples of reported latency, exactly what a
    JUCE host absorbs via setLatencySamples.

    Works with a Plugin (single [C, N] stream) or a Chain (each stage's
    state threads block-to-block like a DAW insert chain).

    ``blocks_per_tick`` (k > 1) is the DEVICE-RESIDENT MULTI-BLOCK tick:
    each ``tick`` takes [C, k·N] samples and one dispatch scans k blocks
    on-device (state threading in the scan carry), so the per-dispatch
    overhead (tunnel RPC in this environment, ~14 ms floor) amortizes over
    k block periods. The callback deadline per tick becomes k·N/sr while
    the dispatch cost stays ~flat — this is what makes a hard-realtime
    configuration possible over a network-attached device. The price is
    k× coarser latency granularity: latency_samples = depth · k · N.

    ``use_kernel="auto"`` (Chain targets): tick through the multi-stage
    VMEM chain kernel instead of the XLA fused executor. The fused
    executor's per-sample lax.scan is ISSUE-BOUND, not batch-bound — a
    B=1 block costs the same ~14 ms device wall as B=4096 (measured:
    blocks_per_tick=4 took 4× the k=1 wall, so the cost is per-block
    compute, not the dispatch). The chain kernel runs the sample loop
    in-VMEM at ~0.26 ms/block, so a single live stream rides one
    1024-clip tile with one active lane: the [C, N] block expands to the
    kernel's stream-tile layout ON-DEVICE (16 KB over the wire, not the
    4 MB tile), and the other 1023 lanes process silence. This is the
    configuration that makes the 10.67 ms AU/VST3 callback deadline.
    """

    def __init__(self, target, params=None, depth: int = 2,
                 blocks_per_tick: int = 1, use_kernel: str = "auto",
                 _interpret: bool = False):
        import collections
        import jax
        import jax.numpy as jnp
        from juicy_tpu.runtime.plugin import Chain

        self.depth = max(0, int(depth))
        self.blocks_per_tick = max(1, int(blocks_per_tick))
        self.block_size = target.block_size
        self.channels = target.channels
        self._q = collections.deque()
        self._jnp = jnp
        # metrics leave the device as ONE stacked array: per-field host
        # reads would each pay a transfer round trip (tunnel-dominated)
        self._metric_keys = None
        k = self.blocks_per_tick

        def pack_metrics(m):
            keys = tuple(sorted(m))
            self._metric_keys = keys
            return jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])

        from juicy_tpu.kernels import chain_kernel as ck
        from juicy_tpu.kernels import stage_kernels as sk
        self.kernel_path = bool(
            use_kernel in ("auto", True) and isinstance(target, Chain)
            and params is None and ck.supports_chain_kernel(target)
            and (jax.devices()[0].platform == "tpu" or _interpret))
        if use_kernel is True and not self.kernel_path:
            raise ValueError("use_kernel=True but this target/platform "
                             "cannot ride the chain kernel")

        if self.kernel_path:
            # one kernel tile, one live lane (clip 0); states for the full
            # tile pool thread block-to-block like any kernel corpus
            c, n = self.channels, self.block_size
            rows = n * c * sk.MSUB
            self._state = jax.vmap(lambda _: target.init_state())(
                jnp.arange(sk.TILE))

            @jax.jit
            def tick_fn(states, blocks):
                xs = blocks.reshape(c, k, n).transpose(1, 2, 0)  # [k, n, c]
                tiles = jnp.zeros((k, 1, n, c, sk.MSUB, sk.LANES),
                                  jnp.float32)
                tiles = tiles.at[:, 0, :, :, 0, 0].set(xs).reshape(
                    k, 1, rows, sk.LANES)
                out_t, states, ms = ck.chain_kernel_stream(
                    target, states, tiles, metrics="final", layout="tiles",
                    interpret=_interpret)
                y = out_t.reshape(k, 1, n, c, sk.MSUB,
                                  sk.LANES)[:, 0, :, :, 0, 0]
                out = y.transpose(2, 0, 1).reshape(c, k * n)
                m0 = {key: v[0] for key, v in ms[-1].items()}
                return out, states, pack_metrics(m0)
            self._tick_fn = tick_fn
            return

        if isinstance(target, Chain):
            self._state = target.init_state()
            chain_params = params if params is not None else target.params
            step = lambda st, blk: target.step(chain_params, st, blk)
            last = lambda ms: ms[-1]
        else:
            self._state = target.init_state()
            plug_params = params if params is not None \
                else target.default_params()
            step = lambda st, blk: target.step(plug_params, st, blk)
            last = lambda ms: ms

        if k == 1:
            @jax.jit
            def tick_fn(state, block):
                out, state, ms = step(state, block)
                return out, state, pack_metrics(last(ms))
        else:
            c, n = self.channels, self.block_size

            @jax.jit
            def tick_fn(state, blocks):
                xs = blocks.reshape(c, k, n).transpose(1, 0, 2)

                def body(st, blk):
                    out, st, ms = step(st, blk)
                    return st, (out, pack_metrics(last(ms)))
                state, (outs, mvecs) = jax.lax.scan(body, state, xs)
                return (outs.transpose(1, 0, 2).reshape(c, k * n), state,
                        mvecs[-1])
        self._tick_fn = tick_fn

    @property
    def latency_samples(self) -> int:
        """What the host reports upstream (setLatencySamples analog)."""
        return self.depth * self.blocks_per_tick * self.block_size

    def _unpack(self, o, mvec):
        m = np.asarray(mvec)
        return np.asarray(o), {k: float(m[i])
                               for i, k in enumerate(self._metric_keys)}

    def tick(self, block: np.ndarray):
        """Dispatch one [C, N] block; return (audio, metrics) for the block
        `depth` ticks ago, or None while the pipeline fills."""
        out, self._state, mvec = self._tick_fn(
            self._state, self._jnp.asarray(block, self._jnp.float32))
        for arr in (out, mvec):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        self._q.append((out, mvec))
        if len(self._q) > self.depth:
            return self._unpack(*self._q.popleft())
        return None

    def flush(self):
        """Drain the in-flight tail (end of stream)."""
        outs = []
        while self._q:
            outs.append(self._unpack(*self._q.popleft()))
        return outs
