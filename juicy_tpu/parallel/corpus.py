"""Corpus-scale batch runner: shard clips over the mesh, aggregate metrics.

The reference meters one track at a time (20 Hz UI poll,
JuicyPluginEditor.cpp:85-90); the framework's serving mode is *offline
juicing / scoring of clip corpora*: thousands of clips per chip, batch
sharded over the ``data`` mesh axis, with corpus-level metric reduction as
the only collective (a jnp.mean over the sharded batch — XLA inserts the
psum over ICI).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from juicy_tpu.parallel.mesh import batch_sharding, make_mesh
from juicy_tpu.runtime.plugin import Plugin


def corpus_metrics(per_clip_metrics: Dict[str, jnp.ndarray]) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Corpus aggregation of per-clip metric arrays: mean/min/max.

    Under a sharded batch, these reductions become ICI collectives — the
    framework analog of the meter panel's running stats
    (JuicyMeterPanel.cpp:54-71).
    """
    out = {}
    for k, v in per_clip_metrics.items():
        out[k] = {"mean": jnp.mean(v), "min": jnp.min(v), "max": jnp.max(v)}
    return out


#: single-stage Pallas kernels measured FASTER than their XLA stage at
#: corpus batch sizes (BASELINE.md round 2/3: texture +25%, saturator +7%;
#: punch/motion kernels were parity/slower and stay XLA here — their
#: kernel bodies live on inside the multi-stage chain kernel instead).
_WINNING_STAGE_KERNELS = ("texture", "saturator")


def _stage_kernel_step(plugin: Plugin, params):
    """The plugin's full-stage Pallas kernel step, or None when the stage
    has no winning kernel / the layout cannot run it."""
    from juicy_tpu.kernels import stage_kernels as sk
    from juicy_tpu.models import texture as _tex

    name = plugin.defn.name
    if name not in _WINNING_STAGE_KERNELS:
        return None
    if name == "texture" and _tex.static_material(params) is None:
        return None
    return {"texture": sk.texture_stage_step,
            "saturator": sk.saturator_stage_step}[name]


def run_corpus(plugin: Plugin, params, clips, mesh: Optional[Mesh] = None,
               automation=None, use_kernel: str = "auto",
               _interpret: bool = False):
    """Process a [B, C, T] corpus; B sharded over the mesh's data axis.

    `use_kernel`: "auto" runs the plugin's full-stage Pallas kernel
    (kernels/stage_kernels.py) when the stage has one that beats its XLA
    stage (texture with a static material, saturator) and the batch layout
    allows; "never" forces the XLA batch-major path; "always" raises if no
    kernel path can run. Automation always uses the XLA path (per-block
    param updates re-enter the kernel's static parameter vector).

    Returns (out [B, C, T], per-clip final-block metrics, corpus aggregates).
    """
    if mesh is None:
        mesh = make_mesh()
    clips = jnp.asarray(clips, jnp.float32)
    sharding = batch_sharding(mesh, clips.ndim)
    clips = jax.device_put(clips, sharding)

    kstep = None
    if automation is None and use_kernel != "never":
        from juicy_tpu.kernels import stage_kernels as sk
        n_dev = mesh.devices.size
        per_dev = clips.shape[0] // max(1, n_dev)
        platform_ok = jax.devices()[0].platform == "tpu" or _interpret
        if (clips.shape[0] % max(1, n_dev) == 0 and per_dev % sk.TILE == 0
                and clips.shape[2] % plugin.block_size == 0 and platform_ok):
            kstep = _stage_kernel_step(plugin, params)
    if use_kernel == "always" and kstep is None:
        raise ValueError(
            f"no stage-kernel path for {plugin.defn.name!r} with this "
            "batch/material layout")
    if kstep is not None:
        return _run_corpus_stage_kernel(plugin, params, clips, mesh, kstep,
                                        _interpret)

    if automation is not None:
        # automation curves apply per clip; keep the per-clip nesting
        def one_clip(clip):
            state = plugin.init_state()
            out, state, metrics = plugin.run(params, state, clip,
                                             automation=automation)
            return out, {k: v[-1] for k, v in metrics.items()}

        @jax.jit
        def batched(cs):
            out, last = jax.vmap(one_clip)(cs)
            return out, last, corpus_metrics(last)
        return batched(clips)

    # fast path: batch-major streaming (the scans see the whole batch per
    # sample step instead of nesting per clip — ~3x faster, BASELINE.md)
    @jax.jit
    def batched(cs):
        states = jax.vmap(lambda _: plugin.init_state())(
            jnp.arange(cs.shape[0]))
        out, _states, metrics = plugin.batched_run(params, states, cs)
        last = {k: v[-1] for k, v in metrics.items()}
        return out, last, corpus_metrics(last)

    return batched(clips)


def _run_corpus_stage_kernel(plugin: Plugin, params, clips, mesh: Mesh,
                             kstep, interpret: bool):
    """Corpus runner on a full-stage Pallas kernel: per-shard block scans
    under shard_map (same SPMD topology as the chain-kernel corpus)."""
    from juicy_tpu.kernels import stage_kernels as sk
    from juicy_tpu.models import texture as _tex

    n, sr = plugin.block_size, plugin.sr
    _b, c, t = clips.shape
    nb = t // n
    is_texture = plugin.defn.name == "texture"
    mode = _tex.static_material(params) if is_texture else None

    def shard_fn(cs):
        bs = cs.shape[0]
        states = jax.vmap(lambda _: plugin.init_state())(jnp.arange(bs))
        if is_texture:
            # the kernel carries the waveguide as a sliding history window
            states = {"analyzer": states["analyzer"],
                      "dsp": sk.texture_kernel_state(states["dsp"], sr,
                                                     mode)}
        blocks = cs.reshape(bs, c, nb, n).transpose(2, 0, 1, 3)

        def sstep(st, blk):
            out, st2, m = kstep(params, st, blk, sr, interpret=interpret)
            return st2, (out, m)

        _st, (outs, ms) = jax.lax.scan(sstep, states, blocks)
        out = outs.transpose(1, 2, 0, 3).reshape(bs, c, t)
        last = jax.tree.map(lambda v: v[-1], ms)
        return out, last

    if mesh.devices.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        inner = shard_map(shard_fn, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data"), check_vma=False)
    else:
        inner = shard_fn

    # aggregation inside the jit (collectives over the sharded batch)
    @jax.jit
    def batched(cs):
        out, last = inner(cs)
        return out, last, corpus_metrics(last)

    return batched(clips)


def run_corpus_resumable(plugin: Plugin, params, clips, checkpoint_path: str,
                         macro_batch: int = 256, mesh: Optional[Mesh] = None,
                         save_every: int = 1):
    """Corpus scoring with mid-run checkpoint/resume (elastic recovery).

    Processes [B, C, T] clips in macro-batches; after every `save_every`
    macro-batches the cursor and accumulated per-clip scores are persisted,
    so a preempted job resumes exactly where it stopped — strictly beyond the
    reference, whose state chunks are parameter-only (SURVEY.md §3.5).
    Returns the per-clip final-block score array [B].
    """
    import os
    import numpy as np
    from juicy_tpu.runtime.state import load_state, save_state

    clips = jnp.asarray(clips, jnp.float32)
    b = clips.shape[0]
    scores = np.zeros((b,), np.float32)
    cursor = {"done": jnp.int32(0)}
    template = {"scores": jnp.zeros((b,), jnp.float32)}
    if os.path.exists(checkpoint_path):
        saved_params, saved, meta = load_state(checkpoint_path, cursor, template)
        cursor = {"done": saved_params["done"]} if "done" in saved_params else cursor
        scores = np.asarray(saved["scores"]).copy()
    start = int(cursor["done"])

    @jax.jit
    def scorer(chunk):
        states = jax.vmap(lambda _: plugin.init_state())(
            jnp.arange(chunk.shape[0]))
        _out, _states, metrics = plugin.batched_run(params, states, chunk)
        return metrics["score"][-1]
    done = start
    steps_since_save = 0
    while done < b:
        end = min(b, done + macro_batch)
        chunk = clips[done:end]
        pad = macro_batch - chunk.shape[0]
        if pad:
            chunk = jnp.pad(chunk, ((0, pad), (0, 0), (0, 0)))
        s = np.asarray(scorer(chunk))[:end - done]
        scores[done:end] = s
        done = end
        steps_since_save += 1
        if steps_since_save >= save_every or done >= b:
            save_state(checkpoint_path, {"done": jnp.int32(done)},
                       {"scores": jnp.asarray(scores)},
                       meta={"total": b})
            steps_since_save = 0
    return scores


def run_corpus_chain(chain, clips, mesh: Optional[Mesh] = None,
                     metrics: str = "final", use_kernel: str = "auto",
                     automation=None, materials=None,
                     return_audio: bool = True, layout: str = "bct",
                     _interpret: bool = False):
    """Full-chain corpus scoring with mesh batch sharding.

    Executor selection (`use_kernel`): "auto" runs the multi-stage VMEM
    chain kernel (kernels/chain_kernel.py) when the chain layout and batch
    support it (canonical 7-stage order, stereo, static texture material,
    per-device batch a multiple of the clip tile) and falls back to the
    XLA fused executor otherwise; "never" forces the fused executor;
    "always" raises if the kernel path cannot run. On multi-device meshes
    the kernel runs per-shard under ``shard_map`` (the hot path is
    embarrassingly clip-parallel; the only collective is the corpus metric
    aggregation below). `_interpret` runs the kernel through the Pallas
    interpreter (CPU tests / the multichip dryrun).

    `automation`: optional {stage: {param: [nb] curve}} applied per block
    corpus-wide on EITHER executor (the host-automation analog;
    see chain_kernel_stream).

    `materials`: optional per-clip texture material indices [B] (each DAW
    track picks its own material, JuicyTexture/PluginProcessor.cpp:325-337).
    The corpus is grouped by material and each group runs fully vectorized
    on its own compiled path — kernel-speed mixed-material corpora (groups
    are padded up to the kernel's clip tile; the traced-material fused
    executor remains the ungrouped alternative via a with_traced chain).

    `return_audio=False` (scoring-only mode, the JuicyInfer batch use
    case): the processed audio is never stacked or written back to HBM;
    `out` is None.

    `layout="tiles"`: `clips` is already in the chain kernel's tile layout
    [nb, G, N*C*MSUB, 128] (native.load_corpus_tiles writes it straight
    from the WAV decode; chain_kernel.corpus_to_tiles converts on-device)
    and the returned audio stays in it — the device-side corpus
    transposes are skipped. Kernel executor only (raises otherwise);
    mixed `materials` grouping needs clip-major data and is unsupported.

    Returns (out [B, C, T] or None, per-stage final metrics list, corpus
    aggregates of the last stage's metrics).
    """
    from juicy_tpu.kernels import chain_kernel as ck
    from juicy_tpu.kernels import stage_kernels as sk
    from juicy_tpu.runtime.chain_fused import fused_chain_stream

    if layout not in ("bct", "tiles"):
        raise ValueError(f"unknown layout {layout!r} (bct | tiles)")
    if materials is not None:
        if layout == "tiles":
            raise ck.ChainKernelUnsupported(
                "mixed-material grouping needs clip-major [B, C, T] data")
        return _run_corpus_chain_grouped(
            chain, clips, materials, mesh=mesh, metrics=metrics,
            use_kernel=use_kernel, automation=automation,
            return_audio=return_audio, _interpret=_interpret)

    if mesh is None:
        mesh = make_mesh()
    clips = jnp.asarray(clips, jnp.float32)
    n_dev = mesh.devices.size
    batch_axis = 1 if layout == "tiles" else 0   # tiles batch by grid tile
    if layout == "tiles":
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(None, "data", None, None))
    else:
        sharding = batch_sharding(mesh, clips.ndim)
    clips = jax.device_put(clips, sharding)

    platform_ok = jax.devices()[0].platform == "tpu" or _interpret
    shardable = clips.shape[batch_axis] % max(1, n_dev) == 0
    per_dev = clips.shape[batch_axis] // max(1, n_dev)
    tile_ok = (layout == "tiles" or per_dev % sk.TILE == 0)
    kernel_ok = (use_kernel != "never" and ck.supports_chain_kernel(chain)
                 and shardable and tile_ok and platform_ok)
    if layout == "tiles" and not kernel_ok:
        raise ck.ChainKernelUnsupported(
            "layout='tiles' runs on the kernel executor only (needs a "
            "kernel-supported chain, TPU/interpret platform, and a grid "
            "divisible by the mesh)")
    if use_kernel == "always" and not kernel_ok:
        raise ck.ChainKernelUnsupported(
            "chain/batch layout unsupported by the kernel executor")
    # automation rides the kernel's per-block pvec rows when eligible and
    # the fused executor's per-block param xs otherwise — non-canonical
    # chains (mono, reordered, traced/mixed materials) automate too

    if kernel_ok and n_dev > 1:
        # per-shard kernel under shard_map: each device streams its own
        # clip shard; metrics leaves concatenate on the batch axis
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def shard_fn(cs):
            bsz = (cs.shape[1] * sk.TILE if layout == "tiles"
                   else cs.shape[0])
            states = jax.vmap(lambda _: chain.init_state())(jnp.arange(bsz))
            out, _st, ms = ck.chain_kernel_stream(
                chain, states, cs, metrics=metrics, interpret=_interpret,
                automation=automation, return_audio=return_audio,
                layout=layout)
            return (out, ms) if return_audio else ms

        dspec = (P(None, "data", None, None) if layout == "tiles"
                 else P("data"))
        mspec = P(None, "data") if metrics == "blocks" else P("data")
        ospec = (dspec, mspec) if return_audio else mspec
        sharded = shard_map(shard_fn, mesh=mesh, in_specs=dspec,
                            out_specs=ospec, check_vma=False)

        # aggregate INSIDE the jit: the corpus means become XLA
        # collectives over the sharded batch, and no eager dispatch ever
        # touches the shard_map outputs
        @jax.jit
        def batched(cs):
            res = sharded(cs)
            out, ms = res if return_audio else (None, res)
            agg = corpus_metrics(ms[-1]) if ms is not None else None
            return (out, ms, agg) if return_audio else (ms, agg)

        res = batched(clips)
        out, ms, agg = res if return_audio else (None, *res)
    else:
        if kernel_ok:
            def stream(chain, states, cs, metrics):
                return ck.chain_kernel_stream(chain, states, cs,
                                              metrics=metrics,
                                              interpret=_interpret,
                                              automation=automation,
                                              return_audio=return_audio,
                                              layout=layout)
        else:
            def stream(chain, states, cs, metrics):
                return fused_chain_stream(chain, states, cs, metrics=metrics,
                                          return_audio=return_audio,
                                          automation=automation)

        @jax.jit
        def batched(cs):
            bsz = (cs.shape[1] * sk.TILE if layout == "tiles"
                   else cs.shape[0])
            states = jax.vmap(lambda _: chain.init_state())(jnp.arange(bsz))
            out, _st, ms = stream(chain, states, cs, metrics=metrics)
            agg = corpus_metrics(ms[-1]) if ms is not None else None
            return (out, ms, agg) if return_audio else (ms, agg)

        res = batched(clips)
        out, ms, agg = res if return_audio else (None, *res)
    return out, ms, agg


def _chain_with_material(chain, material: int):
    """A shallow Chain copy whose texture stage is pinned to a STATIC
    material (its own compiled code path, models/texture.py)."""
    new = object.__new__(type(chain))
    new.__dict__.update({k: v for k, v in chain.__dict__.items()
                         if k != "jit_step"})
    new.plugins = list(chain.plugins)
    new.params = list(chain.params)
    for i, plug in enumerate(new.plugins):
        if plug.defn.name == "texture":
            new.plugins[i] = Plugin(plug.defn, plug.sr, plug.channels,
                                    plug.block_size,
                                    static=dict(plug._static,
                                                material=int(material)))
            # a traced-material chain keeps `material` in the params row;
            # the static path must not see it twice
            new.params[i] = {k: v for k, v in new.params[i].items()
                             if k != "material"}
            return new
    raise ValueError("chain has no texture stage to group by material")


def _run_corpus_chain_grouped(chain, clips, materials, mesh, metrics,
                              use_kernel, automation, return_audio,
                              _interpret):
    """Mixed-material corpus: one fully-vectorized sub-run per material
    (the heterogeneous-config batching of parallel/grouping.py, lifted to
    the chain executors), scattered back into corpus order.

    Each group is zero-padded up to the kernel layout's granularity
    (n_devices x clip tile) so the chain kernel stays eligible; padding is
    sliced off before the scatter and never reaches the aggregates.
    """
    import numpy as np
    from juicy_tpu.kernels import chain_kernel as ck
    from juicy_tpu.kernels import stage_kernels as sk

    clips = jnp.asarray(clips, jnp.float32)
    values = np.asarray(jax.device_get(materials)).astype(np.int64).ravel()
    if values.shape[0] != clips.shape[0]:
        raise ValueError(
            f"materials must have one entry per clip: {values.shape[0]} "
            f"vs batch {clips.shape[0]}")
    if mesh is None:
        mesh = make_mesh()
    n_dev = max(1, mesh.devices.size)
    platform_ok = jax.devices()[0].platform == "tpu" or _interpret
    kernel_possible = (use_kernel != "never" and platform_ok
                       and ck.supports_chain_kernel(
                           _chain_with_material(chain, int(values[0]))))
    granule = n_dev * sk.TILE if kernel_possible else n_dev

    out = np.zeros(clips.shape, np.float32) if return_audio else None
    ms_groups = []       # (corpus indices, per-stage metrics) per group
    for v in np.unique(values):
        idx = np.nonzero(values == v)[0]
        sub = jnp.take(clips, jnp.asarray(idx), axis=0)
        pad = (-len(idx)) % granule
        if pad:
            sub = jnp.pad(sub, ((0, pad), (0, 0), (0, 0)))
        gchain = _chain_with_material(chain, int(v))
        g_out, g_ms, _agg = run_corpus_chain(
            gchain, sub, mesh=mesh, metrics=metrics, use_kernel=use_kernel,
            automation=automation, return_audio=return_audio,
            _interpret=_interpret)
        if return_audio:
            out[idx] = np.asarray(jax.device_get(g_out))[:len(idx)]
        if g_ms is not None:
            baxis = 1 if metrics == "blocks" else 0
            g_ms = jax.tree.map(
                lambda a: np.asarray(jax.device_get(a)).take(
                    range(len(idx)), axis=baxis), g_ms)
            ms_groups.append((idx, g_ms))

    ms = None
    if ms_groups:
        baxis = 1 if metrics == "blocks" else 0
        template = ms_groups[0][1]

        def scatter(*leaves):
            shape = list(leaves[0].shape)
            shape[baxis] = clips.shape[0]
            full = np.zeros(shape, leaves[0].dtype)
            for (idx, _), leaf in zip(ms_groups, leaves):
                if baxis == 0:
                    full[idx] = leaf
                else:
                    full[:, idx] = leaf
            return jnp.asarray(full)

        ms = jax.tree.map(scatter, template,
                          *[g for _, g in ms_groups[1:]])
    agg = corpus_metrics(ms[-1]) if ms is not None else None
    if return_audio:
        out = jnp.asarray(out)
    return out, ms, agg
