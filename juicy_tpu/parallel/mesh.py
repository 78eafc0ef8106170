"""Device meshes and clip sharding.

The reference's parallelism story is one plugin instance per DAW track, one
CPU core each (SURVEY.md §2.4). The TPU equivalent: the clip batch is the
parallel axis, sharded over a mesh whose ``data`` axis rides ICI within a pod
slice (and DCN across slices for corpus-scale runs). The workload is
embarrassingly parallel — no cross-chip traffic in the hot path; collectives
appear only for corpus-level metric aggregation (parallel/corpus.py) and for
optional sequence parallelism (parallel/timeshard.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """A mesh over all (or the given) devices.

    Default: 1-D ``data`` mesh over every device. Pass
    ``axis_names=("data", "seq")`` with matching sizes for a dp×sp layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def shard_clips(mesh: Mesh, batch, axis: str = "data"):
    """Place a [B, ...] clip batch with B sharded over `axis`."""
    spec = P(axis)
    return jax.device_put(batch, NamedSharding(mesh, spec))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """NamedSharding for a [B, ...] array: batch axis sharded, rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
