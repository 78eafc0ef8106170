"""End-to-end CLI tests: WAV in → processor → WAV out, meters, scoring."""

import json
import os

import numpy as np

from juicy_tpu.cli import main
from juicy_tpu.runtime.wav import read_wav, write_wav
from tests.conftest import make_clip


def test_cli_process_roundtrip(tmp_path, rng, capsys):
    src = os.path.join(tmp_path, "in.wav")
    dst = os.path.join(tmp_path, "out.wav")
    jsonl = os.path.join(tmp_path, "metrics.jsonl")
    write_wav(src, make_clip(rng, 2, 4000), 48000)

    main(["process", src, dst, "--plugin", "saturator",
          "--preset", "Amber Heat", "--set", "drive=12",
          "--meters", "--metrics-jsonl", jsonl, "--block", "512"])
    captured = capsys.readouterr().out
    assert "juiciness=" in captured
    assert "JUICINESS INDEX" in captured

    out, sr = read_wav(dst)
    assert sr == 48000 and out.shape == (2, 4000)
    assert not np.allclose(out, 0.0)
    rows = [json.loads(l) for l in open(jsonl)]
    assert len(rows) == 8 and "score" in rows[0]


def test_cli_chain(tmp_path, rng, capsys):
    src = os.path.join(tmp_path, "in.wav")
    dst = os.path.join(tmp_path, "out.wav")
    write_wav(src, make_clip(rng, 2, 2048), 48000)
    main(["chain", src, dst, "--stages", "punch,width", "--block", "512"])
    assert "stage scores" in capsys.readouterr().out
    out, _ = read_wav(dst)
    assert out.shape == (2, 2048)


def test_cli_chain_matches_stage_major(tmp_path, rng, capsys):
    """cmd_chain rides the fused executor; output must match the
    stage-major Chain.run path to the ulp (same per-sample bodies; tanh
    compile-context fusion differs by 1 ulp on a few samples)."""
    import jax.numpy as jnp
    from juicy_tpu.runtime.plugin import Chain
    from juicy_tpu.runtime.stream import pad_to_blocks

    src = os.path.join(tmp_path, "in.wav")
    dst = os.path.join(tmp_path, "out.wav")
    clip = make_clip(rng, 2, 2048)
    write_wav(src, clip, 48000)
    main(["chain", src, dst, "--stages", "punch:Crater Impact,saturator",
          "--block", "512", "--metrics", "final"])
    captured = capsys.readouterr().out
    assert "stage scores" in captured and "x realtime" in captured
    out, _ = read_wav(dst)

    chain = Chain([("punch", "Crater Impact"), ("saturator", None)],
                  sr=48000.0, channels=2, block_size=512)
    padded, t = pad_to_blocks(jnp.asarray(clip), 512)
    want, _, _ = chain.run(chain.init_state(), padded)
    np.testing.assert_allclose(out, np.asarray(want)[..., :t], atol=1e-6)


def test_cli_corpus_resumable(tmp_path, rng, capsys):
    srcs = []
    for i in range(3):
        p = os.path.join(tmp_path, f"clip{i}.wav")
        write_wav(p, make_clip(rng, 2, 1024) * (0.5 + 0.2 * i), 48000)
        srcs.append(p)
    out_dir = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "cursor.json")
    main(["corpus", *srcs, "--stages", "punch,infer", "--block", "512",
          "--out-dir", out_dir, "--checkpoint", ck, "--batch", "2"])
    captured = capsys.readouterr().out
    assert "mean juiciness" in captured
    assert json.load(open(ck))["done"] == 3
    for i in range(3):
        out, sr = read_wav(os.path.join(out_dir, f"clip{i}.wav"))
        assert out.shape == (2, 1024)
    # resume: nothing left to do
    main(["corpus", *srcs, "--stages", "punch,infer", "--block", "512",
          "--out-dir", out_dir, "--checkpoint", ck, "--batch", "2"])
    assert "resuming at clip 3/3" in capsys.readouterr().out


def test_cli_serve_rejects_mismatched_inputs(tmp_path, rng):
    import pytest
    a = os.path.join(tmp_path, "a.wav")
    b = os.path.join(tmp_path, "b.wav")
    write_wav(a, make_clip(rng, 2, 1024), 48000)
    write_wav(b, make_clip(rng, 2, 1024), 44100)
    with pytest.raises(SystemExit):
        main(["serve", a, b, "--out-prefix", os.path.join(tmp_path, "s_")])


def test_cli_score(tmp_path, rng, capsys):
    src = os.path.join(tmp_path, "in.wav")
    write_wav(src, make_clip(rng, 2, 2048), 48000)
    main(["score", src, "--block", "512"])
    out = capsys.readouterr().out
    agg = json.loads(out[out.index("{"):])
    assert 0.0 <= agg["score"] <= 100.0


def test_cli_list(capsys):
    main(["list"])
    out = capsys.readouterr().out
    for name in ("saturator", "punch", "width", "texture", "motion",
                 "cohere", "infer"):
        assert name in out
    assert "Crater Impact" in out and "read-only" in out


def test_cli_corpus_score_only_and_materials(tmp_path, rng, capsys):
    """--score-only skips the renders; --materials routes each clip through
    its own texture material (grouped corpus)."""
    srcs = []
    for i in range(2):
        p = os.path.join(tmp_path, f"m{i}.wav")
        write_wav(p, make_clip(rng, 2, 512) * 0.4, 48000)
        srcs.append(p)
    out_dir = os.path.join(tmp_path, "out_so")
    main(["corpus", *srcs, "--stages", "punch,texture,infer",
          "--block", "256", "--out-dir", out_dir, "--batch", "2",
          "--score-only", "--materials", "gel,metal"])
    captured = capsys.readouterr().out
    assert "mean juiciness" in captured
    # score-only: no renders written
    assert not os.path.exists(os.path.join(out_dir, "m0.wav"))
