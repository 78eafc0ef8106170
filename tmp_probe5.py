"""Probe: per-plugin batch scaling to find the chain's non-scaling stage."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.runtime.plugin import Plugin

SR, BLOCK, STEPS = 48000.0, 512, 10

for name in ("punch", "texture", "motion", "width", "cohere", "infer"):
    for B in (1024, 4096):
        plug = Plugin(name, SR, 2, BLOCK)
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
        for _ in range(2):
            s = run(states)
        s.block_until_ready()
        wall = (time.perf_counter() - t0) / 2 / STEPS
        audio = B * BLOCK / SR
        print(f"{name:10s} B={B:5d} step={wall*1e3:8.3f}ms -> "
              f"{audio/wall:9.0f}x RT (compile {compile_s:.0f}s)", flush=True)
