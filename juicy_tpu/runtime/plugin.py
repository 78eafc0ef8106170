"""Plugin runtime: the JUCE processor lifecycle as pure functions.

Maps the reference lifecycle onto a streaming functional API:

  =====================  =======================================
  JUCE (reference)        juicy_tpu
  =====================  =======================================
  createPluginFilter()    ``Plugin(name, sr, channels, block)``
  prepareToPlay           ``plugin.init_state()``
  processBlock            ``plugin.step(params, state, block)``
  getLatestMetrics        metrics pytree returned by ``step``
  get/setStateInformation ``runtime.state.save_state/load_state``
  setCurrentProgram       ``plugin.preset(name_or_index)``
  =====================  =======================================

``step`` fuses the reference's three sample-rate passes per block — pre
analyze, DSP, post analyze (e.g. JuicyPunch/PluginProcessor.cpp:82,86-112,114)
— into one jitted function; the analyzer state threads pre→post exactly like
the single shared analyzer instance in the C++.

Batching: ``step`` is written for one clip ([C, N]); ``batch_step`` vmaps it
over a leading clips axis — the TPU analog of one plugin instance per DAW
track. ``run`` scans over a long clip in host-block-size steps so the
block-granular semantics (width reset, Cohere filter reset, per-block EMAs)
match the reference bit-for-bit at a given block size.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from juicy_tpu.analyzer import analyze, analyzer_init
from juicy_tpu.models.base import ProcessorDef, get_processor


def _default_finalize(params, pre, post, carry=None):
    m = dict(post)
    m["pre_score"] = pre["score"]
    m["post_score"] = post["score"]
    m["score"] = post["score"]
    return m


class Plugin:
    """One processor instance bound to (sample rate, channels, block size)."""

    def __init__(self, defn: Union[str, ProcessorDef], sr: float = 48000.0,
                 channels: int = 2, block_size: int = 512,
                 static: Optional[Dict[str, int]] = None):
        if isinstance(defn, str):
            defn = get_processor(defn)
        self.defn = defn
        self.sr = float(sr)
        self.channels = int(channels)
        self.block_size = int(block_size)
        # static (code-path-selecting) params, e.g. texture's material.
        # Explicit constructor state — not a mutation side channel.
        self._static: Dict[str, int] = dict(static or {})

    _traced: frozenset = frozenset()

    def with_static(self, **static) -> "Plugin":
        """A new Plugin bound to updated static params (e.g.
        ``plug.with_static(material=2)``) — the immutable alternative to
        mutating an instance between calls."""
        merged = dict(self._static)
        merged.update({k: int(v) for k, v in static.items()})
        plug = Plugin(self.defn, self.sr, self.channels, self.block_size,
                      static=merged)
        plug._traced = self._traced
        return plug

    def with_traced(self, *names: str) -> "Plugin":
        """A new Plugin whose listed static params stay TRACED: they remain
        in the params dict instead of being split into compile-time
        constants. E.g. ``Plugin("texture").with_traced("material")`` lets a
        batched caller (corpus vmap, StreamServer param rows) pick the
        material per clip/stream through the traced-material texture path
        (models/texture.py process_traced)."""
        plug = Plugin(self.defn, self.sr, self.channels, self.block_size,
                      static={k: v for k, v in self._static.items()
                              if k not in names})
        plug._traced = self._traced | frozenset(names)
        return plug

    # -- lifecycle ---------------------------------------------------------

    def init_state(self) -> Dict[str, Any]:
        return {
            "analyzer": analyzer_init(),
            "dsp": self.defn.init(self.sr, self.channels),
        }

    def default_params(self) -> Dict[str, jnp.ndarray]:
        return self._split_static(self.defn.default_params())[0]

    def preset(self, preset) -> Dict[str, jnp.ndarray]:
        params = self._split_static(self.defn.preset_params(preset))[0]
        # track the current program like setCurrentProgram does
        # (JuicyPunch/PluginProcessor.cpp:157-177)
        if self.defn.presets:
            if isinstance(preset, str):
                self._current_program = self.defn.preset_names().index(preset)
            else:
                self._current_program = max(
                    0, min(len(self.defn.presets) - 1, int(preset)))
        return params

    # -- program API (JuicyPunch/PluginProcessor.cpp:147-187) --------------

    @property
    def num_programs(self) -> int:
        """getNumPrograms: preset count, min 1 (single-program plugins like
        Texture report 1, PluginProcessor.h:28-32)."""
        return max(1, len(self.defn.presets))

    @property
    def current_program(self) -> int:
        """getCurrentProgram: index last applied via preset()/set_program."""
        return getattr(self, "_current_program", 0)

    def set_program(self, index: int) -> Dict[str, jnp.ndarray]:
        """setCurrentProgram: clamps the index, returns the preset params."""
        return self.preset(int(index))

    def program_name(self, index: int) -> str:
        """getProgramName with the reference's index clamping (cpp:179-183)."""
        names = getattr(self, "_program_names", None) or \
            list(self.defn.preset_names()) or [self.defn.title]
        return names[max(0, min(len(names) - 1, int(index)))]

    def change_program_name(self, index: int, name: str) -> None:
        """changeProgramName: a no-op in the reference (cpp:185-188); here it
        renames the in-memory program table (persisted via checkpoint meta)."""
        names = list(getattr(self, "_program_names", None)
                     or self.defn.preset_names() or [self.defn.title])
        if 0 <= int(index) < len(names):
            names[int(index)] = str(name)
            self._program_names = names

    def _split_static(self, params):
        """Pull static_params out as concrete python values (params marked
        traced via with_traced stay in the traced dict). Pure: the returned
        static dict is NOT applied to this instance — callers that want the
        split to bind (e.g. Chain construction) go through with_static."""
        traced = dict(params)
        static = {}
        for key in self.defn.static_params:
            if key in traced and key not in self._traced:
                static[key] = int(jax.device_get(traced.pop(key)))
        return traced, static

    def full_params(self, params):
        merged = dict(params)
        merged.update({k: v for k, v in self._static.items()
                       if k not in self._traced})
        return merged

    # -- the hot path ------------------------------------------------------

    def step(self, params, state, block):
        """One processBlock: pre-analyze → DSP → post-analyze → metrics."""
        block = jnp.asarray(block, jnp.float32)
        p = self.full_params(params)
        pre_state, pre = analyze(state["analyzer"], block, self.sr)
        out, dsp = self.defn.process(p, state["dsp"], block, self.sr)
        post_state, post = analyze(pre_state, out, self.sr)
        finalize = self.defn.finalize_metrics or _default_finalize
        metrics = finalize(p, pre, post, dsp)
        new_state = {"analyzer": post_state, "dsp": dsp}
        return out, new_state, metrics

    @functools.cached_property
    def jit_step(self):
        return jax.jit(self.step)

    def batch_step(self, params, state, blocks, params_batched: bool = False):
        """vmap over a leading clips axis of `blocks` and `state`.

        `params` is shared across the batch unless `params_batched`, in which
        case every leaf carries a leading batch dim (per-clip parameter grids,
        the §2.4 "param-sweep parallelism" axis).
        """
        ax = 0 if params_batched else None
        return jax.vmap(self.step, in_axes=(ax, 0, 0))(params, state, blocks)

    # -- streaming ---------------------------------------------------------

    def run(self, params, state, audio, automation: Optional[Dict[str, Any]] = None):
        """Stream a [C, T] clip through `step` in block_size chunks.

        `automation` maps param ids to per-block arrays [T // block_size]
        (parameter automation curves — the reference equivalent of the host
        changing APVTS values between processBlock calls). Returns
        (out [C, T], final_state, metrics-per-block pytree [nb, ...]).
        """
        audio = jnp.asarray(audio, jnp.float32)
        c, t = audio.shape[-2], audio.shape[-1]
        n = self.block_size
        if t % n:
            raise ValueError(f"clip length {t} not divisible by block size {n}"
                             " — pad first (runtime.stream.pad_to_blocks)")
        nb = t // n
        blocks = audio.reshape(audio.shape[:-1] + (nb, n))
        blocks = jnp.moveaxis(blocks, -2, 0)          # [nb, C, n]
        automation = automation or {}

        def scan_step(st, xs):
            blk, auto = xs
            p = dict(params)
            p.update(auto)
            out, st, metrics = self.step(p, st, blk)
            return st, (out, metrics)

        state, (outs, metrics) = jax.lax.scan(scan_step, state,
                                              (blocks, automation))
        out = jnp.moveaxis(outs, 0, -2).reshape(audio.shape)
        return out, state, metrics

    def batched_run(self, params, states, clips,
                    params_batched: bool = False):
        """Stream a [B, C, T] corpus, batch-major: scan over blocks outside,
        vmapped step inside. Compiles to much better TPU code than
        vmap(run) — the sequential sample scans see the whole batch per
        step instead of being nested per clip."""
        clips = jnp.asarray(clips, jnp.float32)
        b, c, t = clips.shape
        n = self.block_size
        if t % n:
            raise ValueError(f"clip length {t} not divisible by block size {n}")
        nb = t // n
        blocks = jnp.moveaxis(clips.reshape(b, c, nb, n), 2, 0)

        def scan_step(st, blk):
            out, st, metrics = self.batch_step(params, st, blk,
                                               params_batched=params_batched)
            return st, (out, metrics)

        states, (outs, metrics) = jax.lax.scan(scan_step, states, blocks)
        out = jnp.moveaxis(outs, 0, 2).reshape(b, c, t)
        return out, states, metrics


class Chain:
    """Serial insert chain of plugins (a DAW channel strip).

    Each stage keeps its own analyzer+DSP state and reports its own metrics,
    exactly like stacking the reference plugins on one track.
    """

    def __init__(self, stages: Sequence[Tuple[Union[str, ProcessorDef], Any]],
                 sr: float = 48000.0, channels: int = 2, block_size: int = 512):
        self.plugins = []
        self.params = []
        for defn, preset in stages:
            plug = Plugin(defn, sr, channels, block_size)
            if isinstance(preset, dict):
                p, static = plug._split_static(
                    dict(plug.defn.default_params(), **preset))
                if static:        # bind explicitly (e.g. texture material)
                    plug = plug.with_static(**static)
                self.params.append(p)
            elif preset is None:
                self.params.append(plug.default_params())
            else:
                self.params.append(plug.preset(preset))
            self.plugins.append(plug)
        self.sr = float(sr)
        self.channels = int(channels)
        self.block_size = int(block_size)

    def init_state(self):
        return [p.init_state() for p in self.plugins]

    def step(self, params_list, states, block):
        outs = block
        new_states = []
        metrics = []
        for plug, params, st in zip(self.plugins, params_list, states):
            outs, st, m = plug.step(params, st, outs)
            new_states.append(st)
            metrics.append(m)
        return outs, new_states, metrics

    @functools.cached_property
    def jit_step(self):
        return jax.jit(self.step)

    def run(self, states, audio):
        audio = jnp.asarray(audio, jnp.float32)
        t = audio.shape[-1]
        n = self.block_size
        if t % n:
            raise ValueError(f"clip length {t} not divisible by block size {n}")
        nb = t // n
        blocks = jnp.moveaxis(audio.reshape(audio.shape[:-1] + (nb, n)), -2, 0)

        def scan_step(sts, blk):
            out, sts, metrics = self.step(self.params, sts, blk)
            return sts, (out, metrics)

        states, (outs, metrics) = jax.lax.scan(scan_step, states, blocks)
        out = jnp.moveaxis(outs, 0, -2).reshape(audio.shape)
        return out, states, metrics

    def batched_run(self, states, clips):
        """Batch-major corpus streaming, stage-major across the chain.

        Each stage streams the whole corpus through its own block scan before
        the next stage starts (semantically identical to interleaving —
        stages only communicate through the audio), so every stage's state
        stays inside its own scan: the block scan never carries the combined
        state of all plugins (texture's waveguide alone is ~100 MB at corpus
        batch sizes and would ride the carry of every block step otherwise).
        """
        out = jnp.asarray(clips, jnp.float32)
        new_states, metrics = [], []
        for plug, params, st in zip(self.plugins, self.params, states):
            out, st2, m = plug.batched_run(params, st, out)
            new_states.append(st2)
            metrics.append(m)
        return out, new_states, metrics
