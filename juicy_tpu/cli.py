"""CLI: the Standalone-host analog (offline, batch-first).

The reference ships a Standalone build per plugin for auditioning
(reference CMakeLists.txt:34); here the standalone is an offline renderer:

  python -m juicy_tpu list
  python -m juicy_tpu process in.wav out.wav --plugin saturator \
      --preset "Amber Heat" --set drive=12 --meters --metrics-jsonl m.jsonl
  python -m juicy_tpu chain in.wav out.wav --stages punch,saturator,width
  python -m juicy_tpu score in.wav            # JuicyInfer-style analysis
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _build_plugin(args, sr, channels):
    from juicy_tpu.runtime.plugin import Plugin
    plug = Plugin(args.plugin, sr, channels, args.block)
    params = plug.preset(args.preset) if args.preset is not None \
        else plug.default_params()
    for kv in args.set or []:
        k, v = kv.split("=", 1)
        if k in plug.defn.static_params:
            plug._static[k] = int(float(v))
        else:
            params[k] = np.float32(float(v))
    return plug, params


def cmd_list(args):
    from juicy_tpu.models.base import registry
    import juicy_tpu.models  # noqa: F401
    for name, defn in sorted(registry.items()):
        presets = ", ".join(defn.preset_names()) or "—"
        print(f"{name:10s} [{defn.code}] {defn.title}")
        for p in defn.params:
            ro = " (read-only)" if p.readonly else ""
            kind = f" choices={list(p.choices)}" if p.choices else \
                (" bool" if p.boolean else f" range=[{p.lo}, {p.hi}]")
            print(f"    {p.id:12s} default={p.default}{kind}{ro}")
        print(f"    presets: {presets}")


def _stream(plug, params, audio, sr, meters=False, jsonl=None,
            triangle=False, ghost=False):
    import jax.numpy as jnp
    from juicy_tpu.runtime.stream import pad_to_blocks, metrics_to_rows
    from juicy_tpu.ui.meters import MeterPanel

    padded, t = pad_to_blocks(jnp.asarray(audio), plug.block_size)
    state = plug.init_state()
    out, state, metrics = plug.run(params, state, padded)
    out = np.asarray(out)[..., :t]
    rows = metrics_to_rows(metrics)
    if jsonl:
        with open(jsonl, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    if meters:
        panel = MeterPanel(plug.defn.title, show_ghost_stats=ghost,
                           show_triangle_metrics=triangle)
        for row in rows:
            panel.set_metrics(row)
        print(panel.render())
    return out, rows


def cmd_process(args):
    from juicy_tpu.runtime.wav import read_wav, write_wav
    audio, sr = read_wav(args.input)
    plug, params = _build_plugin(args, sr, audio.shape[0])
    out, rows = _stream(plug, params, audio, sr, meters=args.meters,
                        jsonl=args.metrics_jsonl,
                        triangle=plug.defn.show_triangle_metrics,
                        ghost=plug.defn.show_ghost_stats)
    write_wav(args.output, out, sr)
    last = rows[-1] if rows else {}
    print(f"wrote {args.output}  juiciness={last.get('score', 0.0):.1f} "
          f"(pre {last.get('pre_score', 0.0):.1f})")


def cmd_chain(args):
    from juicy_tpu.runtime.plugin import Chain
    from juicy_tpu.runtime.stream import pad_to_blocks
    from juicy_tpu.runtime.wav import read_wav, write_wav
    import jax.numpy as jnp

    audio, sr = read_wav(args.input)
    stages = [(s, None) for s in args.stages.split(",")]
    chain = Chain(stages, sr=sr, channels=audio.shape[0],
                  block_size=args.block)
    padded, t = pad_to_blocks(jnp.asarray(audio), args.block)
    out, _, metrics = chain.run(chain.init_state(), padded)
    write_wav(args.output, np.asarray(out)[..., :t], sr)
    scores = [float(np.asarray(m["score"])[-1]) for m in metrics]
    print(f"wrote {args.output}  stage scores: " +
          " → ".join(f"{s:.1f}" for s in scores))


def cmd_score(args):
    from juicy_tpu.runtime.wav import read_wav
    args.plugin = "infer"
    args.preset = None
    args.set = args.set or []
    audio, sr = read_wav(args.input)
    plug, params = _build_plugin(args, sr, audio.shape[0])
    _, rows = _stream(plug, params, audio, sr, meters=args.meters,
                      jsonl=args.metrics_jsonl, triangle=True, ghost=True)
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print(json.dumps(agg, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="juicy_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list processors, params, presets")

    for name, fn in (("process", cmd_process), ("score", cmd_score)):
        p = sub.add_parser(name)
        p.add_argument("input")
        if name == "process":
            p.add_argument("output")
            p.add_argument("--plugin", required=True)
            p.add_argument("--preset")
        p.add_argument("--block", type=int, default=512)
        p.add_argument("--set", action="append", metavar="PARAM=VALUE")
        p.add_argument("--meters", action="store_true")
        p.add_argument("--metrics-jsonl")

    p = sub.add_parser("chain")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--stages", required=True,
                   help="comma-separated processor names")
    p.add_argument("--block", type=int, default=512)

    args = ap.parse_args(argv)
    {"list": cmd_list, "process": cmd_process, "chain": cmd_chain,
     "score": cmd_score}[args.cmd](args)


if __name__ == "__main__":
    main()
