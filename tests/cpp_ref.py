"""ctypes binding to the compiled reference C++ DSP (the ground-truth oracle).

The reference sources under /root/reference/src are compiled *verbatim*
(included by absolute path, never copied) against the minimal JUCE stub in
tests/cpp_oracle/juce_stub, producing two shared libraries that differ only
in FP contraction:

  * "off": -ffp-contract=off  — every mul/add rounded separately
  * "fma": -mfma -ffp-contract=fast — mul+add contracted, like the
    reference's own arm64 clang release binaries

Comparing the two bounds the reference's *own* build ambiguity; null tests
in tests/test_cpp_null.py compare the JAX implementation against both.

Loaded with RTLD_LAZY because the (never-instantiated) editor classes leave
deliberately-undefined symbols in the library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_ORACLE_DIR = _HERE / "cpp_oracle"
_REF_ROOT = Path(os.environ.get("JUICY_REF_ROOT", "/root/reference"))

METRIC_NAMES = (
    "score", "pre_score", "post_score", "emphasis", "coherence",
    "synesthesia", "fatigue_risk", "repetition_density", "punch",
    "richness", "clarity", "width", "mono_safety",
)

_libs: dict[str, ctypes.CDLL] = {}


def reference_available() -> bool:
    return (_REF_ROOT / "src" / "shared" / "JuicinessAnalyzer.cpp").is_file()


def _build() -> None:
    subprocess.run(
        ["make", "-j", "2"], cwd=_ORACLE_DIR, check=True,
        capture_output=True, text=True,
    )


def load(contract: str = "off") -> ctypes.CDLL:
    """Load (building if needed) the oracle library for a contraction mode."""
    assert contract in ("off", "fma"), contract
    if contract in _libs:
        return _libs[contract]
    so = _ORACLE_DIR / "build" / f"liboracle_{contract}.so"
    if not so.is_file():
        _build()
    lib = ctypes.CDLL(str(so), mode=os.RTLD_LAZY | os.RTLD_LOCAL)

    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_float_pp = ctypes.POINTER(c_float_p)

    lib.oracle_create.restype = ctypes.c_void_p
    lib.oracle_create.argtypes = [ctypes.c_char_p]
    lib.oracle_prepare.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_int, ctypes.c_int]
    lib.oracle_set_param.restype = ctypes.c_int
    lib.oracle_set_param.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_float]
    lib.oracle_set_param_notifying.restype = ctypes.c_int
    lib.oracle_set_param_notifying.argtypes = lib.oracle_set_param.argtypes
    lib.oracle_get_param.restype = ctypes.c_float
    lib.oracle_get_param.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.oracle_process.argtypes = [ctypes.c_void_p, c_float_pp,
                                   ctypes.c_int, ctypes.c_int]
    lib.oracle_metrics.argtypes = [ctypes.c_void_p, c_float_p]
    lib.oracle_num_programs.restype = ctypes.c_int
    lib.oracle_num_programs.argtypes = [ctypes.c_void_p]
    lib.oracle_get_program.restype = ctypes.c_int
    lib.oracle_get_program.argtypes = [ctypes.c_void_p]
    lib.oracle_set_program.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.oracle_program_name.restype = ctypes.c_int
    lib.oracle_program_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_char_p, ctypes.c_int]
    lib.oracle_state_save.restype = ctypes.c_int
    lib.oracle_state_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.oracle_state_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
    lib.oracle_destroy.argtypes = [ctypes.c_void_p]

    lib.analyzer_create.restype = ctypes.c_void_p
    lib.analyzer_create.argtypes = [ctypes.c_double, ctypes.c_int, ctypes.c_int]
    lib.analyzer_reset.argtypes = [ctypes.c_void_p]
    lib.analyzer_analyze.argtypes = [ctypes.c_void_p, c_float_pp,
                                     ctypes.c_int, ctypes.c_int, c_float_p]
    lib.analyzer_destroy.argtypes = [ctypes.c_void_p]

    _libs[contract] = lib
    return lib


def _channel_ptrs(block: np.ndarray):
    """[C, N] float32 C-contiguous array -> float** for the C API."""
    assert block.dtype == np.float32 and block.flags.c_contiguous
    c = block.shape[0]
    arr = (ctypes.POINTER(ctypes.c_float) * c)()
    for ch in range(c):
        arr[ch] = block[ch].ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    return arr


class CppProcessor:
    """One compiled reference plugin instance."""

    def __init__(self, name: str, contract: str = "off",
                 sample_rate: float = 48000.0, block_size: int = 512,
                 channels: int = 2):
        self._lib = load(contract)
        self._h = self._lib.oracle_create(name.encode())
        if not self._h:
            raise ValueError(f"unknown oracle plugin {name!r}")
        self._lib.oracle_prepare(self._h, sample_rate, block_size, channels)
        self.channels = channels

    def set_params(self, params: dict, notifying: bool = False) -> None:
        fn = (self._lib.oracle_set_param_notifying if notifying
              else self._lib.oracle_set_param)
        for key, value in params.items():
            rc = fn(self._h, key.encode(), float(value))
            if rc != 0:
                raise KeyError(key)

    def get_param(self, key: str) -> float:
        return float(self._lib.oracle_get_param(self._h, key.encode()))

    def process(self, block: np.ndarray) -> np.ndarray:
        """In-place processBlock on a [C, N] float32 block; returns output."""
        out = np.ascontiguousarray(block, dtype=np.float32).copy()
        self._lib.oracle_process(self._h, _channel_ptrs(out),
                                 out.shape[0], out.shape[1])
        return out

    def run(self, signal: np.ndarray, block_size: int = 512) -> np.ndarray:
        """Stream a [C, T] signal through processBlock in block_size chunks."""
        sig = np.ascontiguousarray(signal, dtype=np.float32)
        out = np.empty_like(sig)
        for start in range(0, sig.shape[1], block_size):
            out[:, start:start + block_size] = self.process(
                sig[:, start:start + block_size])
        return out

    def metrics(self) -> dict:
        buf = (ctypes.c_float * 13)()
        self._lib.oracle_metrics(self._h, buf)
        return dict(zip(METRIC_NAMES, [float(v) for v in buf]))

    # program / preset API
    def num_programs(self) -> int:
        return self._lib.oracle_num_programs(self._h)

    def current_program(self) -> int:
        return self._lib.oracle_get_program(self._h)

    def set_program(self, index: int) -> None:
        self._lib.oracle_set_program(self._h, index)

    def program_name(self, index: int) -> str:
        buf = ctypes.create_string_buffer(256)
        self._lib.oracle_program_name(self._h, index, buf, 256)
        return buf.value.decode()

    def state_save(self) -> bytes:
        buf = ctypes.create_string_buffer(1 << 16)
        n = self._lib.oracle_state_save(self._h, buf, 1 << 16)
        assert n >= 0
        return buf.raw[:n]

    def state_load(self, data: bytes) -> None:
        self._lib.oracle_state_load(self._h, data, len(data))

    def close(self) -> None:
        if self._h:
            self._lib.oracle_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class CppAnalyzer:
    """The compiled reference JuicinessAnalyzer (stateful across blocks)."""

    def __init__(self, contract: str = "off", sample_rate: float = 48000.0,
                 block_size: int = 512, channels: int = 2):
        self._lib = load(contract)
        self._h = self._lib.analyzer_create(sample_rate, block_size, channels)

    def reset(self) -> None:
        self._lib.analyzer_reset(self._h)

    def analyze(self, block: np.ndarray) -> dict:
        blk = np.ascontiguousarray(block, dtype=np.float32)
        buf = (ctypes.c_float * 13)()
        self._lib.analyzer_analyze(self._h, _channel_ptrs(blk),
                                   blk.shape[0], blk.shape[1], buf)
        return dict(zip(METRIC_NAMES, [float(v) for v in buf]))

    def run(self, signal: np.ndarray, block_size: int = 512) -> list[dict]:
        sig = np.ascontiguousarray(signal, dtype=np.float32)
        return [self.analyze(sig[:, s:s + block_size])
                for s in range(0, sig.shape[1], block_size)]

    def close(self) -> None:
        if self._h:
            self._lib.analyzer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
