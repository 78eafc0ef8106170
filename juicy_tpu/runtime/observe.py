"""Observability: tracing, throughput counters, and failure guards.

The reference has no tracing or sanitizers (SURVEY.md §5) — its only hygiene
is ScopedNoDenormals (e.g. JuicyPunch/PluginProcessor.cpp:67) and
JuicyTexture's runaway-protection chain (auto-gain → DC block → limiter →
clamp, JuicyTexture/PluginProcessor.cpp:252-276). The framework provides:

  * `trace()` — jax.profiler trace context for TensorBoard-compatible dumps;
  * `ThroughputMeter` — per-stage audio-sec/sec counters (the BASELINE
    metric) with jsonl output;
  * `validate_block` / `sanitize_block` — input validation + NaN/Inf guards
    (the isBusesLayoutSupported + denormal-hygiene analog);
  * `guarded_step` — wraps any step fn: sanitizes input, zeroes non-finite
    outputs, and returns a per-clip fault flag so a corpus job can quarantine
    bad clips instead of dying (failure detection / elastic recovery).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/juicy_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def enable_nan_checks(enabled: bool = True):
    """Turn on jax_debug_nans — the sanitizer analog (SURVEY.md §5): the
    functional design eliminates the reference's data-race class, so the
    remaining hazard is numeric; this traps the first NaN-producing op."""
    jax.config.update("jax_debug_nans", enabled)


class ThroughputMeter:
    """Running audio-sec/sec counters per pipeline stage."""

    def __init__(self, sr: float = 48000.0):
        self.sr = sr
        self.stages: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, samples: int, batch: int = 1):
        t0 = time.perf_counter()
        yield
        wall = time.perf_counter() - t0
        s = self.stages.setdefault(name, {"audio_s": 0.0, "wall_s": 0.0,
                                          "calls": 0})
        s["audio_s"] += batch * samples / self.sr
        s["wall_s"] += wall
        s["calls"] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {**v, "x_realtime": (v["audio_s"] / v["wall_s"]
                                        if v["wall_s"] else 0.0)}
                for k, v in self.stages.items()}

    def write_jsonl(self, path: str):
        with open(path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **self.report()}) + "\n")


def validate_block(block, channels: Optional[int] = None):
    """Static validation (the isBusesLayoutSupported analog): shape/dtype."""
    block = jnp.asarray(block)
    if block.ndim < 2:
        raise ValueError(f"block must be [..., C, N], got shape {block.shape}")
    if channels is not None and block.shape[-2] != channels:
        raise ValueError(f"expected {channels} channels, got {block.shape[-2]}")
    if block.dtype != jnp.float32:
        block = block.astype(jnp.float32)
    return block


def sanitize_block(block, limit: float = 4.0):
    """NaN/Inf → 0, hard-limit |x| (denormal/runaway hygiene, traceable)."""
    block = jnp.asarray(block, jnp.float32)
    block = jnp.where(jnp.isfinite(block), block, jnp.float32(0.0))
    return jnp.clip(block, -limit, limit)


def guarded_step(step_fn: Callable) -> Callable:
    """Wrap a step fn with fault detection.

    Returns (out, state, metrics, fault) where `fault` is a per-clip bool:
    True when the raw output contained non-finite samples (which are zeroed).
    State is rolled back to the input state for faulted clips so a stream
    can skip a poisoned block and continue — the framework's elastic-recovery
    primitive.
    """
    def wrapped(params, state, block):
        block = sanitize_block(validate_block(block))
        out, new_state, metrics = step_fn(params, state, block)
        finite = jnp.all(jnp.isfinite(out), axis=(-2, -1))
        fault = ~finite
        out = jnp.where(finite[..., None, None], out, jnp.float32(0.0))

        def roll(new, old):
            new = jnp.asarray(new)
            old = jnp.asarray(old)
            extra = new.ndim - fault.ndim
            if extra < 0:
                # A leaf the step kept SHARED across the fault batch (e.g. a
                # scalar LCG advanced once for all clips): promote it to
                # per-clip so each faulted clip restores its own pre-fault
                # value while healthy clips keep the advanced one.
                new = jnp.broadcast_to(new, fault.shape + new.shape)
                extra = 0
            old = jnp.broadcast_to(old, new.shape)
            mask = jnp.reshape(fault, fault.shape + (1,) * extra)
            return jnp.where(mask, old, new)

        rolled = jax.tree.map(roll, new_state, state)
        return out, rolled, metrics, fault

    return wrapped
