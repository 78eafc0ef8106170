"""On-chip chain-kernel certification against the compiled reference C++.

The production corpus path (`run_corpus_chain(use_kernel="auto")`) selects
the compiled Mosaic chain kernel; its fidelity must be anchored to the
reference ground truth ON THE REAL CHIP, not only via the CPU interpreter
(tests/test_chain_kernel.py runs interpret=True). This tool runs N clips
through

  * the compiled reference C++ stacked serially (both -ffp-contract
    builds, tests/cpp_ref.py — the ground truth and its own build
    ambiguity bound),
  * the compiled chain kernel (kernels/chain_kernel.py) on the TPU,
  * the XLA fused executor (runtime/chain_fused.py) on the TPU,

and records per-clip max-abs null residuals (dBFS) between every pair in
CPP_NULL_REPORT.json under "chain_onchip". Pass/fail bar (BASELINE.json
north star, VERDICT r3 item 1): kernel-vs-C++ median <= -90 dBFS, >=99.9%
of clips <= -80.

Run from /root/repo (the axon TPU hook only fires there):
  python tools/certify_onchip.py [--clips 512] [--blocks 94] [--mode 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 48000.0
BLOCK = 512
CHAIN = [("punch", "Solar Snap"), ("saturator", "Amber Heat"),
         ("texture", None), ("motion", None), ("width", "Prism Arc"),
         ("cohere", None), ("infer", "Reference Lens")]
CPP_NAMES = ["punch", "saturator", "texture", "motion", "width", "cohere",
             "infer"]


def make_clips(n_clips: int, t: int, seed: int = 0xC0FFEE) -> np.ndarray:
    """Onset-rich certification corpus: per-clip randomized tone stack +
    transient clicks + noise. Click rate/level vary per clip so transient
    amplitudes sweep THROUGH the analyzer/motion onset thresholds — the
    divergence-prone content class."""
    rng = np.random.default_rng(seed)
    tt = np.arange(t, dtype=np.float64)
    out = np.empty((n_clips, 2, t), np.float32)
    for b in range(n_clips):
        f0 = rng.uniform(80.0, 400.0)
        f1 = rng.uniform(1500.0, 5000.0)
        sig = (rng.uniform(0.1, 0.3) * np.sin(2 * np.pi * f0 * tt / SR)
               + rng.uniform(0.03, 0.2) * np.sin(2 * np.pi * f1 * tt / SR
                                                 + rng.uniform(0, 6.28)))
        env = np.zeros(t)
        period = int(rng.uniform(1200, 6000))
        amp = rng.uniform(0.15, 0.9)
        for onset in range(rng.integers(0, period), t, period):
            seg = np.arange(onset, min(t, onset + 480))
            env[seg] += amp * np.exp(-(seg - onset) / rng.uniform(60, 240))
        sig = sig * (0.35 + 0.65 * env)
        noise = rng.standard_normal(t) * rng.uniform(0.005, 0.04)
        left = sig + noise
        right = np.roll(sig, rng.integers(0, 24)) * rng.uniform(0.7, 1.0) \
            + rng.standard_normal(t) * 0.01
        out[b] = np.clip(np.stack([left, right]), -0.99, 0.99)
    return out


def cpp_chain(clips: np.ndarray, contract: str, mode: int) -> np.ndarray:
    from tests import cpp_ref
    out = np.empty_like(clips)
    t0 = time.perf_counter()
    for b in range(clips.shape[0]):
        procs = [cpp_ref.CppProcessor(n, contract, SR, BLOCK, 2)
                 for n in CPP_NAMES]
        if mode:
            procs[2].set_params({"material": float(mode)})
        ref = clips[b]
        for p in procs:
            ref = p.run(ref, BLOCK)
        out[b] = ref
        if b % 128 == 127:
            print(f"  cpp[{contract}] {b + 1}/{clips.shape[0]} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return out


def dbfs_per_clip(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    d = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)),
               axis=(1, 2))
    return 20.0 * np.log10(np.maximum(d, 1e-12))


def stats(db: np.ndarray) -> dict:
    return {
        "median_dbfs": round(float(np.median(db)), 1),
        "p95_dbfs": round(float(np.percentile(db, 95)), 1),
        "worst_dbfs": round(float(db.max()), 1),
        "clips_above_m80": int((db > -80.0).sum()),
        "clips": int(db.size),
        "pct_within_m80": round(100.0 * float((db <= -80.0).mean()), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=94)
    ap.add_argument("--mode", type=int, default=0,
                    help="texture material (0=gel default)")
    ap.add_argument("--seed", type=int, default=0xC0FFEE)
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--out", default="CPP_NULL_REPORT.json")
    ap.add_argument("--key", default="chain_onchip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from juicy_tpu.kernels import stage_kernels as sk
    from juicy_tpu.kernels.chain_kernel import chain_kernel_stream
    from juicy_tpu.runtime.chain_fused import fused_chain_stream
    from juicy_tpu.runtime.plugin import Chain

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    t = BLOCK * args.blocks
    clips = make_clips(args.clips, t, args.seed)

    stages = [(n, ({"material": float(args.mode)} if n == "texture"
                   and args.mode else p)) for n, p in CHAIN]
    chain = Chain(stages, sr=SR, channels=2, block_size=BLOCK)

    # pad the device batch to the kernel tile size
    bsz = max(sk.TILE, ((args.clips + sk.TILE - 1) // sk.TILE) * sk.TILE)
    padded = np.zeros((bsz, 2, t), np.float32)
    padded[:args.clips] = clips

    print(f"kernel executor on {dev.platform} (B={bsz}, nb={args.blocks})",
          flush=True)

    @jax.jit
    def run_kernel(cs):
        states = jax.vmap(lambda _: chain.init_state())(
            jnp.arange(cs.shape[0]))
        out, _st, _m = chain_kernel_stream(chain, states, cs, unroll=16,
                                           metrics="none")
        return out

    t0 = time.perf_counter()
    out_k = np.asarray(run_kernel(jnp.asarray(padded)))[:args.clips]
    print(f"  kernel done ({time.perf_counter() - t0:.0f}s incl. compile)",
          flush=True)

    out_f = None
    if not args.skip_fused:
        @jax.jit
        def run_fused(cs):
            states = jax.vmap(lambda _: chain.init_state())(
                jnp.arange(cs.shape[0]))
            out, _st, _m = fused_chain_stream(chain, states, cs, unroll=8,
                                              metrics="none")
            return out

        t0 = time.perf_counter()
        out_f = np.asarray(run_fused(jnp.asarray(padded)))[:args.clips]
        print(f"  fused done ({time.perf_counter() - t0:.0f}s incl. "
              "compile)", flush=True)

    print("C++ oracle (both contraction builds)", flush=True)
    ref_off = cpp_chain(clips, "off", args.mode)
    ref_fma = cpp_chain(clips, "fma", args.mode)

    db_off_fma = dbfs_per_clip(ref_off, ref_fma)
    k_off = dbfs_per_clip(out_k, ref_off)
    k_fma = dbfs_per_clip(out_k, ref_fma)
    k_best = np.minimum(k_off, k_fma)
    # freshness stamp: a stale committed entry once contradicted the
    # headline certification (round-4 VERDICT weak #3); every entry now
    # carries the code identity + date it was derived from
    try:
        import subprocess
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        sha = "unknown"
    report = {
        "device": str(dev),
        "git_sha": sha or "unknown",
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "clips": args.clips,
        "blocks_per_clip": args.blocks,
        "texture_material": args.mode,
        "seed": args.seed,
        "cpp_off_vs_fma": stats(db_off_fma),
        "kernel_vs_cpp_off": stats(k_off),
        "kernel_vs_cpp_best": stats(k_best),
    }
    if out_f is not None:
        f_off = dbfs_per_clip(out_f, ref_off)
        f_best = np.minimum(f_off, dbfs_per_clip(out_f, ref_fma))
        report["fused_vs_cpp_off"] = stats(f_off)
        report["fused_vs_cpp_best"] = stats(f_best)
        report["kernel_vs_fused"] = stats(dbfs_per_clip(out_k, out_f))
    # outlier clip indices for bisection
    report["outlier_clips_vs_cpp_best"] = [
        int(i) for i in np.nonzero(k_best > -80.0)[0][:16]]

    print(json.dumps(report, indent=2))
    try:
        with open(args.out) as f:
            full = json.load(f)
    except Exception:
        full = {}
    full[args.key] = report
    with open(args.out, "w") as f:
        json.dump(full, f, indent=2, sort_keys=True)
    print(f"wrote {args.out}[{args.key!r}]")


if __name__ == "__main__":
    main()
