"""Native I/O runtime tests (C++ juicyio via ctypes)."""

import os

import numpy as np
import pytest

from juicy_tpu.runtime import native
from juicy_tpu.runtime.wav import write_wav, read_wav
from tests.conftest import make_clip

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_wav_info_and_read(tmp_path, rng):
    clip = make_clip(rng, 2, 3000)
    path = os.path.join(tmp_path, "a.wav")
    write_wav(path, clip, 48000)
    ch, sr, frames = native.wav_info(path)
    assert (ch, sr, frames) == (2, 48000, 3000)
    arena = native.load_corpus([path], frames=3000, channels=2)
    np.testing.assert_array_equal(arena[0], clip)


def test_native_corpus_pad_truncate_mono(tmp_path, rng):
    long_clip = make_clip(rng, 1, 5000)
    short_clip = make_clip(rng, 2, 1000)
    p1 = os.path.join(tmp_path, "long_mono.wav")
    p2 = os.path.join(tmp_path, "short_stereo.wav")
    write_wav(p1, long_clip, 48000)
    write_wav(p2, short_clip, 48000)
    arena = native.load_corpus([p1, p2], frames=2000, channels=2)
    assert arena.shape == (2, 2, 2000)
    np.testing.assert_array_equal(arena[0, 0], long_clip[0, :2000])
    np.testing.assert_array_equal(arena[0, 1], long_clip[0, :2000])  # mono dup
    np.testing.assert_array_equal(arena[1, :, :1000], short_clip)
    assert np.all(arena[1, :, 1000:] == 0.0)


def test_native_pcm16_decode(tmp_path, rng):
    clip = make_clip(rng, 2, 2048)
    path = os.path.join(tmp_path, "p16.wav")
    write_wav(path, clip, 44100, float32=False)
    arena = native.load_corpus([path], frames=2048, channels=2)
    py_back, _ = read_wav(path)
    np.testing.assert_allclose(arena[0], py_back, atol=1e-4)


def test_ring_buffer_spsc():
    ring = native.RingBuffer(1024)
    blocks = [np.full(256, float(i), np.float32) for i in range(3)]
    assert ring.push(blocks[0])
    assert ring.push(blocks[1])
    assert ring.readable() == 512
    got = ring.pop(256)
    np.testing.assert_array_equal(got, blocks[0])
    assert ring.push(blocks[2])
    np.testing.assert_array_equal(ring.pop(256), blocks[1])
    np.testing.assert_array_equal(ring.pop(256), blocks[2])
    assert ring.pop(1) is None          # empty
    ring.close()


def test_ring_buffer_full_rejects():
    ring = native.RingBuffer(256)
    assert ring.push(np.zeros(256, np.float32))
    assert not ring.push(np.ones(1, np.float32))   # realtime drop, no block
    ring.close()


def test_native_corpus_threaded_matches_serial(tmp_path, rng):
    """juicy_load_corpus_mt (worker pool over an atomic index) decodes the
    same arena as the serial loader, under mixed lengths/channels and with
    more files than threads."""
    import ctypes

    paths = []
    for i in range(13):
        ch = 1 if i % 3 == 0 else 2
        n = 500 + 137 * i
        p = os.path.join(tmp_path, f"c{i}.wav")
        write_wav(p, make_clip(rng, ch, n), 48000)
        paths.append(p)

    arena_mt = native.load_corpus(paths, frames=1500, channels=2, threads=4)

    lib = native.load_library()
    arena_ser = np.zeros_like(arena_mt)
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    ok = lib.juicy_load_corpus(
        c_paths, len(paths),
        arena_ser.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1500, 2)
    assert ok == len(paths)
    np.testing.assert_array_equal(arena_mt, arena_ser)


def test_native_corpus_tiles_matches_python_repack(tmp_path, rng):
    """juicy_load_corpus_tiles (decode + host-thread repack into the chain
    kernel's [nb, G, rows, 128] layout) must equal corpus_to_tiles applied
    to the serial loader's planar arena — including TILE zero-padding of
    the batch and mono duplication."""
    from juicy_tpu.kernels import chain_kernel as ck
    import juicy_tpu.kernels.stage_kernels as sk
    import jax.numpy as jnp

    paths = []
    for i in range(11):                 # pads up to 128 (one tile)
        ch = 1 if i % 4 == 0 else 2
        n = 400 + 101 * i
        p = os.path.join(tmp_path, f"t{i}.wav")
        write_wav(p, make_clip(rng, ch, n), 48000)
        paths.append(p)

    block, frames, tile = 256, 1024, 128
    arena_t = native.load_corpus_tiles(paths, frames=frames, channels=2,
                                       block_size=block, threads=3,
                                       tile=tile)
    assert arena_t.shape == (frames // block, 1, block * 2 * (tile // 128),
                             128)

    planar = np.zeros((tile, 2, frames), np.float32)
    planar[:len(paths)] = native.load_corpus(paths, frames=frames,
                                             channels=2)
    old = sk.TILE, sk.MSUB
    sk.TILE, sk.MSUB = tile, tile // 128
    try:
        want = np.asarray(ck.corpus_to_tiles(jnp.asarray(planar), block))
    finally:
        sk.TILE, sk.MSUB = old
    np.testing.assert_array_equal(arena_t, want)
