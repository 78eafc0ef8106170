"""Corpus-scale batch runner: shard clips over the mesh, aggregate metrics.

The reference meters one track at a time (20 Hz UI poll,
JuicyPluginEditor.cpp:85-90); the framework's serving mode is *offline
juicing / scoring of clip corpora*: thousands of clips per chip, batch
sharded over the ``data`` mesh axis, with corpus-level metric reduction as
the only collective (a jnp.mean over the sharded batch — XLA inserts the
psum over ICI).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
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

    autokey = (None if automation is None
               else _params_key(automation))
    prog_key = ("run_corpus", _plugin_key(plugin), _params_key(params),
                autokey, clips.shape, str(clips.dtype), _mesh_key(mesh))

    if automation is not None:
        # automation curves apply per clip; keep the per-clip nesting
        def one_clip(clip):
            state = plugin.init_state()
            out, state, metrics = plugin.run(params, state, clip,
                                             automation=automation)
            return out, {k: v[-1] for k, v in metrics.items()}

        def build():
            @jax.jit
            def batched(cs):
                out, last = jax.vmap(one_clip)(cs)
                return out, last, corpus_metrics(last)
            return batched
        return _cached_program(prog_key, build)(clips)

    # fast path: batch-major streaming (the scans see the whole batch per
    # sample step instead of nesting per clip — ~3x faster, BASELINE.md)
    def build():
        @jax.jit
        def batched(cs):
            states = jax.vmap(lambda _: plugin.init_state())(
                jnp.arange(cs.shape[0]))
            out, _states, metrics = plugin.batched_run(params, states, cs)
            last = {k: v[-1] for k, v in metrics.items()}
            return out, last, corpus_metrics(last)
        return batched

    return _cached_program(prog_key, build)(clips)


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

    prog_key = ("stage_kernel", _plugin_key(plugin), _params_key(params),
                clips.shape, str(clips.dtype), _mesh_key(mesh), interpret)

    def build():
        # aggregation inside the jit (collectives over the sharded batch)
        @jax.jit
        def batched(cs):
            out, last = inner(cs)
            return out, last, corpus_metrics(last)
        return batched

    return _cached_program(prog_key, build)(clips)


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


# ---------------------------------------------------------------------------
# Corpus program cache. Each run_corpus_chain call used to define a fresh
# @jax.jit closure, so calling it in a loop (parameter sweeps, the grouped
# mixed-material runner, benches) re-traced the whole ~nb-block chain scan
# every call — seconds of host work per call while the device step is
# milliseconds. The jitted program is cached here instead, keyed on every
# value that is baked into the trace: the chain's full semantic signature
# (stage defns, statics, traced sets, concrete param values), the data
# shape/layout, the mesh, and the runner options. Equivalent chains built
# fresh (e.g. by the grouped runner per call) hit the same entry.
# ---------------------------------------------------------------------------
_CORPUS_PROGRAM_CACHE: OrderedDict = OrderedDict()
_CORPUS_PROGRAM_CACHE_MAX = 32


_HASHABLE = (bool, int, float, str, bytes, type(None))
#: content-hash memo keyed on array identity: param leaves are reused
#: across Chain copies (the grouped runner rebuilds chains per call around
#: the same leaf arrays), so repeat keys skip the device fetch entirely
_LEAF_HASH_MEMO: OrderedDict = OrderedDict()
_LEAF_HASH_MEMO_MAX = 4096


def _hash_arrays(leaves):
    """Content-hash a list of array leaves with ONE batched device fetch
    (a per-leaf jax.device_get would pay a host<->device round trip per
    param — seconds over a remote tunnel)."""
    def lookup(v):
        ent = _LEAF_HASH_MEMO.get(id(v))
        # the entry holds a strong ref to its leaf, so a live entry's id
        # cannot have been recycled; the identity check is belt-and-braces
        return ent[1] if ent is not None and ent[0] is v else None

    out = [lookup(v) for v in leaves]
    todo = [i for i, h in enumerate(out) if h is None]
    if todo:
        fetched = jax.device_get([leaves[i] for i in todo])
        for i, a in zip(todo, fetched):
            a = np.asarray(a)
            h = (a.shape, str(a.dtype),
                 hashlib.sha1(a.tobytes()).hexdigest())
            out[i] = h
            _LEAF_HASH_MEMO[id(leaves[i])] = (leaves[i], h)
        while len(_LEAF_HASH_MEMO) > _LEAF_HASH_MEMO_MAX:
            _LEAF_HASH_MEMO.popitem(last=False)
    return out


def _hash_leaf(v):
    """Hashable token for a param/static leaf (scalars pass through,
    arrays hash by content)."""
    if isinstance(v, _HASHABLE):
        return v
    return _hash_arrays([v])[0]


def _params_key(d):
    items = sorted(d.items())
    arr = [(k, v) for k, v in items if not isinstance(v, _HASHABLE)]
    hashes = dict(zip((k for k, _ in arr),
                      _hash_arrays([v for _, v in arr])))
    return tuple((k, hashes.get(k, v if isinstance(v, _HASHABLE) else None))
                 for k, v in items)


def _plugin_key(plug):
    """A plugin's semantic signature. ``id(defn)`` is conservative (an
    equivalent defn object misses the cache — never aliases distinct
    user-defined stages)."""
    return (plug.defn.name, id(plug.defn), float(plug.sr),
            int(plug.channels), int(plug.block_size),
            tuple(sorted(plug._traced)), _params_key(plug._static))


def _mesh_key(mesh):
    return (tuple(d.id for d in mesh.devices.flat), mesh.devices.shape,
            tuple(mesh.axis_names))


def _chain_key(chain):
    """The chain's semantic signature: everything of it that lands in a
    corpus trace."""
    stages = tuple((_plugin_key(plug), _params_key(params))
                   for plug, params in zip(chain.plugins, chain.params))
    return (float(chain.sr), int(chain.channels), int(chain.block_size),
            stages)


def _cached_program(key, build):
    fn = _CORPUS_PROGRAM_CACHE.get(key)
    if fn is None:
        fn = build()
        _CORPUS_PROGRAM_CACHE[key] = fn
        while len(_CORPUS_PROGRAM_CACHE) > _CORPUS_PROGRAM_CACHE_MAX:
            _CORPUS_PROGRAM_CACHE.popitem(last=False)
    else:
        _CORPUS_PROGRAM_CACHE.move_to_end(key)
    return fn


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

    The jitted corpus program is cached module-wide keyed on the chain's
    full semantic signature + data shape + mesh + options, so calling this
    in a loop (sweeps, the grouped mixed-material runner) costs tracing
    once — later calls are pure device dispatch.

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

    autokey = (None if automation is None else tuple(
        (s, _params_key(p)) for s, p in sorted(automation.items())))
    prog_key = (_chain_key(chain), clips.shape, str(clips.dtype),
                tuple(d.id for d in mesh.devices.flat), mesh.devices.shape,
                tuple(mesh.axis_names), metrics, kernel_ok, autokey,
                return_audio, layout, _interpret)

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

        # aggregate INSIDE the jit: the corpus means become XLA
        # collectives over the sharded batch, and no eager dispatch ever
        # touches the shard_map outputs
        def build():
            sharded = shard_map(shard_fn, mesh=mesh, in_specs=dspec,
                                out_specs=ospec, check_vma=False)

            @jax.jit
            def batched(cs):
                res = sharded(cs)
                out, ms = res if return_audio else (None, res)
                agg = corpus_metrics(ms[-1]) if ms is not None else None
                return (out, ms, agg) if return_audio else (ms, agg)

            return batched

        res = _cached_program(prog_key, build)(clips)
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

        def build():
            @jax.jit
            def batched(cs):
                bsz = (cs.shape[1] * sk.TILE if layout == "tiles"
                       else cs.shape[0])
                states = jax.vmap(lambda _: chain.init_state())(
                    jnp.arange(bsz))
                out, _st, ms = stream(chain, states, cs, metrics=metrics)
                agg = corpus_metrics(ms[-1]) if ms is not None else None
                return (out, ms, agg) if return_audio else (ms, agg)

            return batched

        res = _cached_program(prog_key, build)(clips)
        out, ms, agg = res if return_audio else (None, *res)
    return out, ms, agg


def _chain_with_traced_materials(chain, mats):
    """A shallow Chain copy whose texture stage carries a TRACED per-clip
    material row — the chain kernel runs [B] values in {0, 1, 4} as the
    PACKED per-lane material lane (stage_kernels.TEX_PACKED) and
    TILE-uniform values in {2, 3} as the MERGED wave launch
    (stage_kernels.TEX_WAVE_ROWS: per-grid-row material const rows)."""
    new = object.__new__(type(chain))
    new.__dict__.update({k: v for k, v in chain.__dict__.items()
                         if k != "jit_step"})
    new.plugins = list(chain.plugins)
    new.params = list(chain.params)
    for i, plug in enumerate(new.plugins):
        if plug.defn.name == "texture":
            new.plugins[i] = Plugin(plug.defn, plug.sr, plug.channels,
                                    plug.block_size,
                                    static={k: v for k, v in
                                            plug._static.items()
                                            if k != "material"}
                                    ).with_traced("material")
            # host-side np row: hashable for the program cache without a
            # device round-trip (jit converts it at trace time)
            new.params[i] = dict(
                {k: v for k, v in new.params[i].items() if k != "material"},
                material=np.asarray(mats, np.float32))
            return new
    raise ValueError("chain has no texture stage to pack materials for")


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


def _take_runs(v, runs, axis):
    """Concatenate the static (start, length) runs of `v` along `axis` —
    the real (non-padding) clip rows of a grouped sub-run. A single
    (0, n) run is the old prefix slice; the merged wave group has one run
    per material segment (each segment is padded to the clip tile)."""
    if len(runs) == 1 and runs[0][0] == 0:
        s, n = runs[0]
        return v[:n] if axis == 0 else v[:, :n]
    parts = [jax.lax.slice_in_dim(v, s, s + n, axis=axis)
             for s, n in runs]
    return jnp.concatenate(parts, axis=axis)


@partial(jax.jit, static_argnames=("runs", "baxis", "nclips", "out_shape",
                                   "treedef"))
def _grouped_scatter(idxs, g_outs, ms_leaves, *, runs, baxis, nclips,
                     out_shape, treedef):
    """Reassemble grouped sub-run audio/metrics into corpus order — one
    compiled device dispatch (index-update scatters + in-jit aggregation)
    instead of per-leaf host round trips. Padding lanes (rows outside
    `runs[g]`) never reach the output or the aggregates."""
    out = None
    if out_shape is not None:
        out = jnp.zeros(out_shape, g_outs[0].dtype)
        for ix, g, rn in zip(idxs, g_outs, runs):
            out = out.at[ix].set(_take_runs(g, rn, 0))
    ms = agg = None
    if ms_leaves:
        full_leaves = []
        for j in range(len(ms_leaves[0])):
            leaves = [grp[j] for grp in ms_leaves]
            shape = list(leaves[0].shape)
            shape[baxis] = nclips
            full = jnp.zeros(shape, leaves[0].dtype)
            for ix, leaf, rn in zip(idxs, leaves, runs):
                if baxis == 0:
                    full = full.at[ix].set(_take_runs(leaf, rn, 0))
                else:
                    full = full.at[:, ix].set(_take_runs(leaf, rn, 1))
            full_leaves.append(full)
        ms = jax.tree.unflatten(treedef, full_leaves)
        agg = corpus_metrics(ms[-1])
    return out, ms, agg


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

    # NONWAVE materials ({0 gel, 1 metal, 4 flesh}) PACK into one
    # kernel sub-run: the chain kernel's TEX_PACKED lane selects the
    # material per clip lane (kernels/stage_kernels.py), so a mixed
    # nonwave corpus pays ONE launch and at most `granule`-1 padding
    # clips TOTAL instead of per material — the per-track-material
    # reference analog (JuicyTexture/PluginProcessor.cpp:325-337) at
    # kernel speed. Waveguide materials still group per material (their
    # ring delay is knob-dependent; see stage_kernels.TEX_PACKED).
    nonwave = np.isin(values, (0, 1, 4))
    group_list = []
    if (kernel_possible and nonwave.sum()
            and np.unique(values[nonwave]).size > 1):
        group_list.append(("packed", np.nonzero(nonwave)[0]))
        rest = np.unique(values[~nonwave])
    else:
        rest = np.unique(values)
    rest = [int(v) for v in rest]
    # MERGED WAVE launch (sk.TEX_WAVE_ROWS): wood and plastic tiles share
    # ONE kernel dispatch — clips sort into single-material clip tiles and
    # each grid row reads its own material's const row (incl. the
    # structural ring delay) from a per-grid-row SMEM pvec. Halves the
    # wave-side launches and doubles their batch amortization vs
    # per-material grouping. Single-device like the packed lane (the
    # per-row pvec is built from the global material row; a sharded
    # merged launch would need the rows as a shard_map operand).
    if (kernel_possible and automation is None and n_dev == 1
            and 2 in rest and 3 in rest):
        group_list.append(("wave_rows", None))
        rest = [v for v in rest if v not in (2, 3)]
    group_list += [(int(v), np.nonzero(values == v)[0]) for v in rest]

    # whole-corpus single group in original order (an all-nonwave mix, or
    # a degenerate single-material row): dispatch DIRECTLY — no gather, no
    # padding, no scatter program, aggregation stays in the sub-run's jit
    if (len(group_list) == 1 and clips.shape[0] % granule == 0
            and group_list[0][0] != "wave_rows"):
        v, idx = group_list[0]
        gchain = (_chain_with_traced_materials(chain,
                                               values.astype(np.float32))
                  if v == "packed" else _chain_with_material(chain, int(v)))
        return run_corpus_chain(
            gchain, clips, mesh=mesh, metrics=metrics,
            use_kernel=use_kernel, automation=automation,
            return_audio=return_audio, _interpret=_interpret)

    tile = sk.TILE
    runs = []   # (corpus idx row, device g_out, device g_ms, src runs)
    for v, idx in group_list:
        if v == "wave_rows":
            # wood segment then plastic segment, each padded to the clip
            # tile so every grid row is single-material; the trailing
            # granule pad rides the plastic segment
            idx_w = np.nonzero(values == 2)[0]
            idx_p = np.nonzero(values == 3)[0]
            pad_w = (-len(idx_w)) % tile
            pad_p = (-len(idx_p)) % tile
            pad_p += (-(len(idx_w) + pad_w + len(idx_p) + pad_p)) % granule

            def seg(ixs, pad):
                s = jnp.take(clips, jnp.asarray(ixs), axis=0)
                return (jnp.pad(s, ((0, pad), (0, 0), (0, 0))) if pad
                        else s)

            sub = jnp.concatenate([seg(idx_w, pad_w), seg(idx_p, pad_p)],
                                  axis=0)
            mats = np.concatenate(
                [np.full(len(idx_w) + pad_w, 2.0, np.float32),
                 np.full(len(idx_p) + pad_p, 3.0, np.float32)])
            gchain = _chain_with_traced_materials(chain, mats)
            idx = np.concatenate([idx_w, idx_p])
            g_runs = ((0, len(idx_w)),
                      (len(idx_w) + pad_w, len(idx_p)))
        else:
            sub = jnp.take(clips, jnp.asarray(idx), axis=0)
            pad = (-len(idx)) % granule
            if pad:
                sub = jnp.pad(sub, ((0, pad), (0, 0), (0, 0)))
            if v == "packed":
                mats = np.zeros(len(idx) + pad, np.float32)  # pad = gel
                mats[:len(idx)] = values[idx]
                gchain = _chain_with_traced_materials(chain, mats)
            else:
                gchain = _chain_with_material(chain, int(v))
            g_runs = ((0, len(idx)),)
        g_out, g_ms, _agg = run_corpus_chain(
            gchain, sub, mesh=mesh, metrics=metrics, use_kernel=use_kernel,
            automation=automation, return_audio=return_audio,
            _interpret=_interpret)
        runs.append((idx, g_out, g_ms, g_runs))

    # ONE jitted scatter reassembles corpus order ON DEVICE and computes
    # the aggregate in-jit (cached by jax.jit on shapes/statics, so repeat
    # mixed-corpus calls are pure dispatch). The previous host-side staging
    # paid a tunnel round trip per metric leaf per group (~270 eager RPCs
    # per call — seconds over a remote link, while the device work is
    # hundreds of milliseconds).
    has_ms = runs[0][2] is not None
    if not return_audio and not has_ms:
        return None, None, None
    idxs = tuple(jnp.asarray(idx, jnp.int32) for idx, _, _, _ in runs)
    out, ms, agg = _grouped_scatter(
        idxs,
        tuple(g for _, g, _, _ in runs) if return_audio else (),
        tuple(tuple(jax.tree.leaves(g)) for _, _, g, _ in runs)
        if has_ms else (),
        runs=tuple(rn for _, _, _, rn in runs),
        baxis=1 if metrics == "blocks" else 0,
        nclips=int(clips.shape[0]),
        out_shape=tuple(clips.shape) if return_audio else None,
        treedef=jax.tree.structure(runs[0][2]) if has_ms else None)
    return out, ms, agg
