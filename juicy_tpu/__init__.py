"""juicy_tpu — a TPU-native batched audio-effects framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the JuicySuite
plugin collection (reference: maetyu-d/juicy-audio-plugins, 7 JUCE/C++ realtime
audio plugins sharing a per-sample "juiciness" analyzer).

Design stance (idiomatic TPU, not a port):
  * Processors are pure functions ``(params, carry, block[C, N]) -> (out, carry')``.
  * The JUCE lifecycle maps to ``spec()`` (param registry), ``init()``
    (= prepareToPlay), ``process()`` (= processBlock DSP), and msgpack state
    (= XML state chunks).
  * Linear per-sample recurrences (one-pole filters, tail integrators, modal
    resonators) run as O(log N) associative scans on the VPU; nonlinear
    recurrences (attack/release envelopes, limiters) run as batch-parallel
    ``lax.scan``/Pallas kernels with tiny carries.
  * The batch (clips) axis is the parallelism unit: ``vmap`` on chip,
    ``jax.sharding`` meshes across chips.
"""

__version__ = "0.1.0"

from juicy_tpu.models.base import ParamSpec, ProcessorDef, get_processor, registry
from juicy_tpu.analyzer import JuicinessMetrics, analyzer_init, analyze

__all__ = [
    "ParamSpec",
    "ProcessorDef",
    "get_processor",
    "registry",
    "JuicinessMetrics",
    "analyzer_init",
    "analyze",
    "__version__",
]
