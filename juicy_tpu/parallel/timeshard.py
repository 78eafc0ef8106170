"""Sequence parallelism for linear recurrences (the audio analog of
ring-attention/Ulysses, SURVEY.md §5 "long-context").

A first-order linear recurrence ``y[n] = a[n]·y[n−1] + b[n]`` over a sequence
sharded across devices on mesh axis ``seq`` is solved with the classic
two-level (Blelloch) decomposition:

  1. each device runs a *local* associative scan over its shard and reduces
     its shard to one affine map (A_d, B_d);
  2. the per-device maps are ``all_gather``-ed over ICI (K tiny scalars) and
     prefix-composed locally to get each device's incoming boundary state;
  3. each device applies its boundary state to its local scan — O(T/K) work,
     O(K) communication.

This makes even the *stateful* parts of the pipeline scale with sequence
length across chips; nonlinear recurrences fall back to replicated time with
sharded batch (the default layout, parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from juicy_tpu.ops.scan_utils import _affine_compose, linear_scan


def _local_scan_block(a, b, init, axis_name: str):
    """Per-shard body: local scan + cross-device boundary composition."""
    # Local inclusive scan of affine maps (no init applied yet).
    A, B = jax.lax.associative_scan(_affine_compose, (a, b), axis=-1)
    # This shard's total map:
    A_tot = A[..., -1]
    B_tot = B[..., -1]
    # Gather every shard's total map (tiny: K scalars per lane).
    A_all = jax.lax.all_gather(A_tot, axis_name)     # [K, ...]
    B_all = jax.lax.all_gather(B_tot, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # Prefix-compose maps of shards strictly before this one, applied to init.
    def compose_step(carry, ab):
        a_d, b_d, d = ab
        take = d < idx
        y = jnp.where(take, a_d * carry + b_d, carry)
        return y, None

    k = A_all.shape[0]
    init_b = jnp.broadcast_to(jnp.asarray(init, jnp.float32), A_tot.shape)
    # the composed boundary is device-varying (depends on axis_index);
    # mark the carry as varying over the sequence axis up front.
    init_b = jax.lax.pvary(init_b, (axis_name,))
    boundary, _ = jax.lax.scan(compose_step, init_b,
                               (A_all, B_all, jnp.arange(k)))
    return A * boundary[..., None] + B


def sequence_parallel_linear_scan(mesh: Mesh, a, b, init,
                                  seq_axis: str = "seq"):
    """Solve y[n] = a[n]·y[n−1] + b[n] with time sharded over `seq_axis`.

    `a`, `b`: [..., T] with T sharded over the mesh's `seq_axis`;
    `init`: [...] replicated. Returns y with the same sharding as `b`.
    """
    b = jnp.asarray(b, jnp.float32)
    a = jnp.broadcast_to(jnp.asarray(a, jnp.float32), b.shape)
    ndim = b.ndim
    in_spec = P(*([None] * (ndim - 1) + [seq_axis]))
    init_spec = P(*([None] * (ndim - 1)))

    fn = shard_map(
        lambda aa, bb, ii: _local_scan_block(aa, bb, ii, seq_axis),
        mesh=mesh,
        in_specs=(in_spec, in_spec, init_spec),
        out_specs=in_spec,
    )
    init_arr = jnp.broadcast_to(jnp.asarray(init, jnp.float32), b.shape[:-1])
    return fn(a, b, init_arr)
