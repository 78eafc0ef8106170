"""Probe: fused saturator kernel vs fast path vs scan, dispatch-amortized."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from juicy_tpu.runtime.plugin import Plugin
from juicy_tpu.runtime.fast import fused_step
from juicy_tpu.kernels.saturator_kernel import saturator_step_fused

SR, BLOCK, B, STEPS = 48000.0, 512, 1024, 50


def bench(step_fn, plug, label):
    params = plug.default_params()
    blocks = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 2, BLOCK)),
        jnp.float32) * 0.1

    @jax.jit
    def run(st):
        def body(s, _):
            out, s2, m = step_fn(params, s, blocks)
            return s2, jnp.sum(out[..., -1])
        st2, sums = jax.lax.scan(body, st, None, length=STEPS)
        return jnp.sum(sums)

    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(B))
    t0 = time.perf_counter()
    s = run(states); s.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        s = run(states)
    s.block_until_ready()
    wall = (time.perf_counter() - t0) / 3 / STEPS
    audio = B * BLOCK / SR
    print(f"{label:28s} step={wall*1e3:7.3f}ms -> {audio/wall:9.0f}x RT "
          f"(compile {compile_s:.0f}s)", flush=True)


plug = Plugin("saturator", SR, 2, BLOCK)
bench(lambda p, st, blk: saturator_step_fused(plug, p, st, blk), plug,
      "saturator FULL kernel")
bench(lambda p, st, blk: fused_step(plug, p, st, blk), plug,
      "saturator fast (pallas an.)")
bench(lambda p, st, blk: plug.batch_step(p, st, blk), plug,
      "saturator scan step")

plug_p = Plugin("punch", SR, 2, BLOCK)
bench(lambda p, st, blk: fused_step(plug_p, p, st, blk), plug_p,
      "punch fast (pallas an.)")
bench(lambda p, st, blk: plug_p.batch_step(p, st, blk), plug_p,
      "punch scan step")
