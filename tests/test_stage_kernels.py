"""Full-stage Pallas kernels vs the XLA batch_step path (interpret mode).

The kernels (kernels/stage_kernels.py) run pre-analyze + DSP + post-analyze
as one pallas_call; these tests pin them against Plugin.batch_step on small
shapes via the Pallas interpreter to ulp-level tolerances (compile-context
fusion differs between the paths; observed <=5e-7 relative). On the real
TPU the compiled kernels match to <=1.4e-7 max audio diff (measured).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import juicy_tpu.kernels.stage_kernels as sk
from juicy_tpu.runtime.plugin import Plugin
from tests.conftest import make_clip, residual_dbfs

SR = 48000.0


@pytest.fixture(autouse=True)
def small_tile():
    """Interpret mode is slow: shrink the clip tile (must stay a multiple
    of the 128-lane register width)."""
    tile, msub = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = 128, 1
    yield
    sk.TILE, sk.MSUB = tile, msub


def _blocks(rng, b, n):
    return np.stack([make_clip(rng, 2, n) for _ in range(b)]).astype(
        np.float32)


def test_punch_stage_kernel(rng):
    b, n = 128, 128
    plug = Plugin("punch", SR, 2, n)
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))
    blocks = _blocks(rng, b, n)
    out_ref, st_ref, m_ref = plug.batch_step(params, states,
                                             jnp.asarray(blocks))
    out_k, st_k, m_k = sk.punch_stage_step(plug.full_params(params), states,
                                           jnp.asarray(blocks), SR,
                                           unroll=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_k["dsp"]["fast_env"]),
                               np.asarray(st_ref["dsp"]["fast_env"]),
                               atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(st_k["analyzer"]["onset_cooldown"]),
        np.asarray(st_ref["analyzer"]["onset_cooldown"]))
    assert float(np.max(np.abs(np.asarray(m_k["score"])
                               - np.asarray(m_ref["score"])))) <= 1e-3


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_texture_stage_kernel_materials(mode, rng):
    b, n = 128, 64
    plug = Plugin("texture", SR, 2, n)
    plug._static = {"material": mode}
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))
    blocks = _blocks(rng, b, n)
    out_ref, st_ref, m_ref = plug.batch_step(params, states,
                                             jnp.asarray(blocks))
    kstate = {"analyzer": states["analyzer"],
              "dsp": sk.texture_kernel_state(states["dsp"], SR, mode)}
    out_k, st_k, m_k = sk.texture_stage_step(plug.full_params(params), kstate,
                                             jnp.asarray(blocks), SR,
                                             unroll=4, interpret=True)
    # wave materials (2/3) run a ~0.99-feedback waveguide ring that
    # amplifies FMA-contraction ulps between the kernel and scan paths —
    # the same divergence class that bounds the reference C++'s own two
    # -ffp-contract builds at -47.5 dBFS on long rings (CPP_NULL_REPORT).
    # One block stays ~-100 dBFS; the modal materials are contraction-free.
    atol = 1e-5 if mode in (2, 3) else 2e-6
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=atol)
    assert float(np.max(np.abs(np.asarray(m_k["score"])
                               - np.asarray(m_ref["score"])))) <= 1e-3
    # carried DSP state matches (waveguide compared via ring reconstruction)
    for key in ("env", "tail", "wet_env", "dc_out", "protect_gain"):
        np.testing.assert_allclose(np.asarray(st_k["dsp"][key], np.float64),
                                   np.asarray(st_ref["dsp"][key], np.float64),
                                   atol=5e-6 if mode not in (2, 3) else 2e-5)
    np.testing.assert_array_equal(np.asarray(st_k["dsp"]["rng"]),
                                  np.asarray(st_ref["dsp"]["rng"]))
    if mode in (2, 3):
        L = st_ref["dsp"]["waveguide"].shape[-1]
        ring = sk.texture_ring_state(st_k["dsp"], SR, mode, L)["waveguide"]
        H = st_k["dsp"]["waveguide"].shape[-1]
        widx = int(np.asarray(st_k["dsp"]["wave_idx"]).reshape(-1)[0])
        # only the last H ring samples are reachable (delay <= H)
        idx = (widx - np.arange(1, min(H, L) + 1)) % L
        np.testing.assert_allclose(
            np.asarray(ring)[..., idx],
            np.asarray(st_ref["dsp"]["waveguide"])[..., idx], atol=5e-6)


@pytest.mark.slow
def test_texture_kernel_streaming_blocks(rng):
    """Two consecutive kernel blocks == two scan-path blocks (state carry,
    waveguide window slide, LCG advance)."""
    b, n = 128, 64
    mode = 3
    plug = Plugin("texture", SR, 2, n)
    plug._static = {"material": mode}
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))
    clip = _blocks(rng, b, 2 * n)
    # scan path
    st = states
    outs_ref = []
    for k in range(2):
        o, st, _ = plug.batch_step(params, st,
                                   jnp.asarray(clip[..., k * n:(k + 1) * n]))
        outs_ref.append(np.asarray(o))
    # kernel path
    kst = {"analyzer": states["analyzer"],
           "dsp": sk.texture_kernel_state(states["dsp"], SR, mode)}
    outs_k = []
    for k in range(2):
        o, kst, _ = sk.texture_stage_step(
            plug.full_params(params), kst,
            jnp.asarray(clip[..., k * n:(k + 1) * n]), SR, unroll=4,
            interpret=True)
        outs_k.append(np.asarray(o))
    # plastic's waveguide ring amplifies kernel-vs-scan contraction ulps
    # block over block (see test_texture_stage_kernel_materials); two
    # blocks sit at ~3.5e-5 = -89 dBFS, inside the suite's -80 null budget
    # and far inside the C++'s own -47.5 dBFS cross-build ring ambiguity.
    np.testing.assert_allclose(np.concatenate(outs_k, -1),
                               np.concatenate(outs_ref, -1), atol=1e-4)


def test_saturator_stage_kernel(rng):
    b, n = 128, 128
    plug = Plugin("saturator", SR, 2, n)
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))
    blocks = _blocks(rng, b, n)
    out_ref, st_ref, m_ref = plug.batch_step(params, states,
                                             jnp.asarray(blocks))
    out_k, st_k, m_k = sk.saturator_stage_step(
        plug.full_params(params), states, jnp.asarray(blocks), SR,
        unroll=4, interpret=True)
    # serial tone one-pole (C++ order) vs the XLA path's associative form:
    # reassociation ulps only
    assert residual_dbfs(np.asarray(out_k), np.asarray(out_ref)) <= -110.0
    assert float(np.max(np.abs(np.asarray(m_k["score"])
                               - np.asarray(m_ref["score"])))) <= 1e-3


def test_motion_stage_kernel(rng):
    """p1 + channel-serial p2 + both lanes in one kernel, bit-exact vs the
    five-scan XLA path (incl. the uint32 RNG and shared-state threading)."""
    b, n = 128, 64
    plug = Plugin("motion", SR, 2, n)
    params = plug.default_params()
    states = jax.vmap(lambda _: plug.init_state())(jnp.arange(b))
    blocks = _blocks(rng, b, n)
    out_ref, st_ref, m_ref = plug.batch_step(params, states,
                                             jnp.asarray(blocks))
    out_k, st_k, m_k = sk.motion_stage_step(
        plug.full_params(params), states, jnp.asarray(blocks), SR,
        unroll=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=2e-6)
    for k in ("motion_phase", "budget_env", "repetition", "rng",
              "onset_cooldown", "tail", "lp", "prev"):
        np.testing.assert_allclose(
            np.asarray(st_k["dsp"][k], np.float64),
            np.asarray(st_ref["dsp"][k], np.float64), atol=2e-6)
    assert float(np.max(np.abs(np.asarray(m_k["score"])
                               - np.asarray(m_ref["score"])))) <= 1e-3
