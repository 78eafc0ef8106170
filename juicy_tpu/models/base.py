"""Processor registry and parameter specs.

The reference declares parameters with JUCE's AudioProcessorValueTreeState
(typed params with ranges/defaults, e.g. JuicyPunch/PluginProcessor.cpp:204-215)
plus constexpr preset tables (cpp:18-24). Here that becomes a declarative
:class:`ParamSpec` registry per processor: names, ranges, defaults, a
``readonly`` flag (replacing the editor's hardcoded skip-list,
JuicyPluginEditor.cpp:104-110), choice/bool kinds, and preset dicts.

Each processor module registers a :class:`ProcessorDef` with:
  * ``init(sr, channels) -> carry``      (= prepareToPlay allocations)
  * ``process(params, carry, block, sr) -> (out, carry')``  (= the DSP of
    processBlock, *without* the analyzer passes — the runtime fuses those)
  * optional ``finalize_metrics`` to reproduce per-plugin metric quirks
    (JuicyInfer's sensitivity scaling + triangle-metric remap, JuicyCohere's
    context-fit output).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """One host-visible parameter (JUCE RangedAudioParameter analog)."""
    id: str
    name: str
    lo: float
    hi: float
    default: float
    readonly: bool = False          # read-only metric outputs (skip in UIs)
    choices: Tuple[str, ...] = ()   # non-empty => AudioParameterChoice analog
    boolean: bool = False           # AudioParameterBool analog

    def to_normalized(self, value):
        return (jnp.asarray(value, jnp.float32) - self.lo) / (self.hi - self.lo)

    def from_normalized(self, norm):
        return self.lo + jnp.asarray(norm, jnp.float32) * (self.hi - self.lo)

    def clamp(self, value):
        return jnp.clip(jnp.asarray(value, jnp.float32), self.lo, self.hi)


@dataclasses.dataclass(frozen=True)
class ProcessorDef:
    """A registered processor (juce::AudioProcessor subclass analog)."""
    name: str                       # registry key, e.g. "saturator"
    title: str                      # display title, e.g. "Juicy Saturator"
    code: str                       # 4-char plugin code (CMakeLists.txt:63-69)
    params: Tuple[ParamSpec, ...]
    presets: Tuple[Tuple[str, Dict[str, float]], ...]
    init: Callable[..., Any]        # (sr, channels) -> dsp carry pytree
    process: Callable[..., Any]     # (params, carry, block, sr) -> (out, carry)
    finalize_metrics: Optional[Callable[..., Any]] = None
    show_ghost_stats: bool = False
    show_triangle_metrics: bool = False
    # Parameters that select compiled code paths (e.g. texture's material
    # index); the runtime holds them static across jit instead of tracing.
    static_params: Tuple[str, ...] = ()

    def param(self, pid: str) -> ParamSpec:
        for p in self.params:
            if p.id == pid:
                return p
        raise KeyError(f"{self.name}: no parameter {pid!r}")

    def default_params(self) -> Dict[str, jnp.ndarray]:
        """Defaults, then preset 0 applied on top — matching the reference
        constructors that call setCurrentProgram(0) at build time
        (e.g. JuicyPunch/PluginProcessor.cpp:33)."""
        out = {p.id: jnp.float32(p.default) for p in self.params
               if not p.readonly}
        if self.presets:
            out.update({k: jnp.float32(v) for k, v in self.presets[0][1].items()})
        return out

    def preset_params(self, preset) -> Dict[str, jnp.ndarray]:
        """Params for a preset by index or name (setCurrentProgram analog)."""
        if not self.presets:
            return self.default_params()
        if isinstance(preset, str):
            for nm, values in self.presets:
                if nm == preset:
                    break
            else:
                raise KeyError(f"{self.name}: no preset {preset!r}")
        else:
            idx = max(0, min(len(self.presets) - 1, int(preset)))
            values = self.presets[idx][1]
        out = self.default_params()
        out.update({k: jnp.float32(v) for k, v in values.items()})
        return out

    def preset_names(self) -> Tuple[str, ...]:
        return tuple(nm for nm, _ in self.presets)


registry: Dict[str, ProcessorDef] = {}


def register(defn: ProcessorDef) -> ProcessorDef:
    registry[defn.name] = defn
    return defn


def get_processor(name: str) -> ProcessorDef:
    # Import the model modules lazily so `import juicy_tpu` stays light.
    import juicy_tpu.models  # noqa: F401  (populates the registry)
    if name not in registry:
        raise KeyError(f"unknown processor {name!r}; have {sorted(registry)}")
    return registry[name]


# Shared parameter builders (every plugin repeats these):

def mix_param(default: float = 1.0) -> ParamSpec:
    return ParamSpec("mix", "Mix", 0.0, 1.0, default)


def output_param(lo: float, hi: float, default: float) -> ParamSpec:
    return ParamSpec("output", "Output (dB)", lo, hi, default)


def juiciness_param() -> ParamSpec:
    return ParamSpec("juiciness", "Juiciness Score", 0.0, 100.0, 0.0,
                     readonly=True)
