"""Test harness config: run on a simulated 8-device CPU mesh.

Multi-chip sharding is tested without a cluster via
``--xla_force_host_platform_device_count=8`` (the standard JAX fake-backend
analog, SURVEY.md §4). Must be set before jax initializes.
"""

import os

# Force CPU (the driver environment pins JAX_PLATFORMS=axon — the real TPU —
# which has only one chip; the multi-chip tests need the virtual mesh).
# Set JUICY_TEST_TPU=1 to run the suite on the real chip instead: the golden
# null tests pass there too (the drift-pinned transcendentals hold on TPU).
# Persistent compile cache: repeated pytest runs skip recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
# Unrolled scans trace ~8x slower on this 1-core box; unroll only affects
# throughput, never semantics, so the suite traces with unroll=1.
os.environ.setdefault("JUICY_SCAN_UNROLL", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

if not os.environ.get("JUICY_TEST_TPU"):
    # The env may be pinned to the real TPU by a sitecustomize hook, so the
    # env var alone is not enough — force the config at jax import time.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA0D10)


def make_clip(rng, channels=2, samples=4096, kind="mixed"):
    """Synthesized test material with transients, tone and stereo content."""
    t = np.arange(samples, dtype=np.float64)
    sr = 48000.0
    sig = 0.25 * np.sin(2 * np.pi * 220.0 * t / sr)
    sig = sig + 0.15 * np.sin(2 * np.pi * 3100.0 * t / sr + 0.3)
    # Transient clicks every ~60 ms.
    env = np.zeros(samples)
    for onset in range(0, samples, 2880):
        seg = np.arange(onset, min(samples, onset + 480))
        env[seg] += np.exp(-(seg - onset) / 180.0)
    sig = sig * (0.4 + 0.6 * env)
    noise = rng.standard_normal(samples) * 0.02
    left = sig + noise
    right = np.roll(sig, 7) * 0.9 + rng.standard_normal(samples) * 0.02
    if kind == "mono":
        clip = np.stack([left] * channels)
    elif kind == "anticorrelated":
        clip = np.stack([left, -left * 0.95] + [left] * (channels - 2))
    else:
        clip = np.stack(([left, right] + [left] * (channels - 2))[:channels])
    return np.clip(clip, -0.99, 0.99).astype(np.float32)


@pytest.fixture
def stereo_clip(rng):
    return make_clip(rng, channels=2, samples=4096)


@pytest.fixture
def mono_clip(rng):
    return make_clip(rng, channels=1, samples=4096)


def residual_dbfs(a, b):
    """Null-test residual in dBFS (full scale = 1.0)."""
    diff = np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))
    return -np.inf if diff == 0 else 20.0 * np.log10(diff)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight compile/oracle tests; `-m 'not slow'` is the "
        "quick gate (<5 min on this box), the full suite is the bar")
    config.addinivalue_line(
        "markers",
        "smoke: tiny iteration tier (`-m smoke`, target <2 min): one null "
        "per plugin, one kernel-interpret step, one serve tick")


# The smoke tier is an auto-marked subset — one representative per
# subsystem — so iteration doesn't pay the full quick gate. Keep this list
# small and fast; it is a sanity tier, not a correctness bar.
_SMOKE_PREFIXES = (
    "test_processors.py::test_saturator_null",
    "test_processors.py::test_punch_null",
    "test_processors.py::test_width_null",
    "test_processors.py::test_infer_null",
    "test_processors.py::test_cohere_null",
    "test_processors.py::test_motion_null",
    "test_processors.py::test_texture_materials_null[0-",
    "test_analyzer.py::test_analyzer_stereo",
    "test_kernels.py::test_saturator_full_step_kernel_matches",
    "test_serve.py::test_stream_server_matches_solo_run",
    "test_runtime.py::test_checkpoint_roundtrip",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("tests/")[-1]
        if any(key.startswith(p) for p in _SMOKE_PREFIXES):
            item.add_marker(pytest.mark.smoke)
