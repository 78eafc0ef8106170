"""Probe: batch scaling of the scan path + chain structure comparison."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.runtime.plugin import Plugin, Chain

SR, BLOCK, STEPS = 48000.0, 512, 20


def bench_step(plug, B, label):
    params = plug.default_params()
    blocks = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 2, BLOCK)),
        jnp.float32) * 0.1

    @jax.jit
    def run(st):
        def body(s, _):
            out, s2, m = plug.batch_step(params, s, blocks)
            return s2, jnp.sum(out[..., -1])
        st2, sums = jax.lax.scan(body, st, None, length=STEPS)
        return jnp.sum(sums)

    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(B))
    t0 = time.perf_counter(); s = run(states); s.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        s = run(states)
    s.block_until_ready()
    wall = (time.perf_counter() - t0) / 3 / STEPS
    audio = B * BLOCK / SR
    print(f"{label:32s} B={B:6d} step={wall*1e3:8.3f}ms -> {audio/wall:9.0f}x RT"
          f" (compile {compile_s:.0f}s)", flush=True)


stages = [("punch", "Solar Snap"), ("saturator", "Amber Heat"),
          ("texture", None), ("motion", None), ("width", "Prism Arc"),
          ("cohere", None), ("infer", "Reference Lens")]


def bench_chain(B, label):
    chain = Chain(stages, sr=SR, channels=2, block_size=BLOCK)
    blocks = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 2, BLOCK)),
        jnp.float32) * 0.1

    @jax.jit
    def run(sts):
        def body(s, _):
            out, s2, m = jax.vmap(
                lambda st, blk: chain.step(chain.params, st, blk))(s, blocks)
            return s2, jnp.sum(out[..., -1])
        st2, sums = jax.lax.scan(body, sts, None, length=STEPS)
        return jnp.sum(sums)

    states = jax.vmap(lambda _: chain.init_state())(jnp.arange(B))
    t0 = time.perf_counter(); s = run(states); s.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        s = run(states)
    s.block_until_ready()
    wall = (time.perf_counter() - t0) / 3 / STEPS
    audio = B * BLOCK / SR
    print(f"{label:32s} B={B:6d} step={wall*1e3:8.3f}ms -> {audio/wall:9.0f}x RT"
          f" (compile {compile_s:.0f}s)", flush=True)


plug = Plugin("saturator", SR, 2, BLOCK)
for B in (1024, 4096, 16384):
    bench_step(plug, B, "saturator scan step")
for B in (1024, 4096, 8192):
    bench_chain(B, "full chain scan (batch steps)")
