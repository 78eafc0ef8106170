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
